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
}
