package graft

import graft.config.{FirehoseConfig, StreamsConfig}
import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's config validation matrix
  * (streams/config_test.go:5-51, firehose/config_test.go:5-43). */
class ConfigSpec extends AnyFunSuite {

  test("empty config is rejected") {
    assert(StreamsConfig().validate.isLeft)
    assert(FirehoseConfig().validate.isLeft)
  }

  test("region only is rejected (stream name missing)") {
    assert(StreamsConfig(region = "us-east-1").validate.isLeft)
    assert(FirehoseConfig(region = "us-east-1").validate.isLeft)
  }

  test("region + stream + batch size 50 is accepted") {
    assert(StreamsConfig("us-east-1", "s", batchSize = 50).validate.isRight)
    assert(FirehoseConfig("us-east-1", "s", batchSize = 50).validate.isRight)
  }

  test("batch size 501 exceeds the AWS 500-record cap") {
    assert(StreamsConfig("us-east-1", "s", batchSize = 501).validate.isLeft)
    assert(FirehoseConfig("us-east-1", "s", batchSize = 501).validate.isLeft)
  }

  test("batch size 0 is rejected") {
    assert(StreamsConfig("us-east-1", "s", batchSize = 0).validate.isLeft)
    assert(FirehoseConfig("us-east-1", "s", batchSize = 0).validate.isLeft)
  }

  test("unknown partition key provider 'uuid' is rejected (streams only)") {
    assert(StreamsConfig("us-east-1", "s", partitionKeyProvider = "uuid").validate.isLeft)
    assert(StreamsConfig("us-east-1", "s", partitionKeyProvider = "xid").validate.isRight)
    assert(StreamsConfig("us-east-1", "s", partitionKeyProvider = "").validate.isRight)
  }

  test("defaults mirror the reference (batch 50, retries 3, 90s, 1s→60s)") {
    import scala.concurrent.duration._
    val c = StreamsConfig("us-east-1", "s")
    assert(c.batchSize == 50 && c.maxRetries == 3 && c.timeout == 90.seconds)
    assert(c.backoffInit == 1.second && c.backoffMax == 60.seconds)
    assert(StreamsConfig.MaxBatchSize == 500)
  }

  // -------- untyped front end (cfg.Unpack twin, streams/streams.go:22-29) --

  test("fromOptions: the validation matrix holds on the map path too") {
    assert(StreamsConfig.fromOptions(Map.empty).isLeft)
    assert(StreamsConfig.fromOptions(Map("region" -> "us-east-1")).isLeft)
    assert(StreamsConfig.fromOptions(
      Map("region" -> "us-east-1", "stream_name" -> "s", "batch_size" -> "50")).isRight)
    assert(StreamsConfig.fromOptions(
      Map("region" -> "us-east-1", "stream_name" -> "s", "batch_size" -> "501")).isLeft)
    assert(StreamsConfig.fromOptions(
      Map("region" -> "us-east-1", "stream_name" -> "s", "batch_size" -> "0")).isLeft)
    assert(StreamsConfig.fromOptions(
      Map("region" -> "us-east-1", "stream_name" -> "s",
        "partition_key_provider" -> "uuid")).isLeft)
    assert(FirehoseConfig.fromOptions(Map.empty).isLeft)
    assert(FirehoseConfig.fromOptions(
      Map("region" -> "us-east-1", "stream_name" -> "s")).isRight)
  }

  test("fromOptions: defaults injected only when unset; explicit values win") {
    import scala.concurrent.duration._
    val dflt = StreamsConfig.fromOptions(
      Map("region" -> "us-east-1", "stream_name" -> "s")).toOption.get
    assert(dflt.batchSize == 50 && dflt.maxRetries == 3 && dflt.timeout == 90.seconds)
    assert(dflt.backoffInit == 1.second && dflt.backoffMax == 60.seconds)
    val set = StreamsConfig.fromOptions(Map(
      "region" -> "eu-west-1", "stream_name" -> "evt",
      "partition_key" -> "agent.hostname", "partition_key_provider" -> "xid",
      "batch_size" -> "200", "max_retries" -> "5", "timeout" -> "30s",
      "backoff.init" -> "500ms", "backoff.max" -> "10s")).toOption.get
    assert(set == StreamsConfig("eu-west-1", "evt", "agent.hostname", "xid",
      200, 5, 30.seconds, 500.millis, 10.seconds))
  }

  test("fromOptions: a present-but-malformed value is an error, not a default") {
    val base = Map("region" -> "us-east-1", "stream_name" -> "s")
    assert(StreamsConfig.fromOptions(base + ("batch_size" -> "fifty")).isLeft)
    assert(StreamsConfig.fromOptions(base + ("timeout" -> "ninety")).isLeft)
    assert(StreamsConfig.fromOptions(base + ("timeout" -> "Inf")).isLeft)
    assert(StreamsConfig.fromOptions(base + ("backoff.init" -> "-oops")).isLeft)
  }

  test("fromOptions: zero/negative durations are config errors, not knobs") {
    // '0s' here would mean every put times out instantly (records silently
    // drop after maxRetries) — the opposite of a zero Go http.Client timeout
    // (= no timeout); a negative backoff would throw from Thread.sleep
    // inside the task. Both rejected at unpack time.
    val base = Map("region" -> "us-east-1", "stream_name" -> "s")
    assert(StreamsConfig.fromOptions(base + ("timeout" -> "0s")).isLeft)
    assert(StreamsConfig.fromOptions(base + ("timeout" -> "-90s")).isLeft)
    assert(StreamsConfig.fromOptions(base + ("backoff.init" -> "-1s")).isLeft)
    assert(StreamsConfig.fromOptions(base + ("backoff.max" -> "0ms")).isLeft)
    assert(FirehoseConfig.fromOptions(base + ("timeout" -> "0s")).isLeft)
    assert(StreamsConfig.fromOptions(base + ("timeout" -> "1ms")).isRight)
  }

  test("fromOptions: an unknown key is an error, so typos cannot silently default") {
    val base = Map("region" -> "us-east-1", "stream_name" -> "s")
    val bad = StreamsConfig.fromOptions(base + ("batchsize" -> "100"))
    assert(bad == Left("unrecognized option(s): batchsize"))
    assert(StreamsConfig.fromOptions(base + ("backoff_init" -> "2s")).isLeft)
    assert(FirehoseConfig.fromOptions(
      base + ("partition_key" -> "k")).isLeft) // streams-only key on firehose
    // the caller-owned tolerance (the DSv2 route's putter.* / infra keys)
    assert(StreamsConfig.fromOptions(
      base + ("putter.class" -> "X", "checkpointLocation" -> "/ck"),
      tolerate = k => k.startsWith("putter.") || k == "checkpointlocation").isRight)
  }
}
