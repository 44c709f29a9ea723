package graft.config

import scala.concurrent.duration._

/** Typed twins of the reference's output configs, with the exact validation
  * rules and defaults of s12v/awsbeats:
  *   - streams/config.go:8-39 (fields + defaults), :41-59 (Validate)
  *   - firehose/config.go:8-35 (fields + defaults), :37-51 (Validate)
  *
  * Validation happens at pipeline build time (the Spark analogue of libbeat
  * calling Validate() before the output starts — SURVEY.md §3.2), surfacing
  * as Left(reason) exactly where the reference returns `outputs.Fail`.
  */
sealed trait SinkConfig {
  def region: String
  def batchSize: Int
  def maxRetries: Int
  def timeout: FiniteDuration
  def backoffInit: FiniteDuration
  def backoffMax: FiniteDuration
}

/** Kinesis-Streams-shaped sink config (streams/config.go:8-17).
  * `partitionKeyProvider`: "" → field provider (even with empty key field),
  * "xid" → generated time-sortable unique keys (streams/client.go:49-55). */
final case class StreamsConfig(
    region: String = "",
    streamName: String = "",
    partitionKey: String = "",
    partitionKeyProvider: String = "",
    batchSize: Int = StreamsConfig.DefaultBatchSize,
    maxRetries: Int = 3,
    timeout: FiniteDuration = 90.seconds,
    backoffInit: FiniteDuration = 1.second,
    backoffMax: FiniteDuration = 60.seconds) extends SinkConfig {

  /** streams/config.go:41-59 + provider check at streams/client.go:49-55. */
  def validate: Either[String, StreamsConfig] =
    if (region.isEmpty) Left("region is not defined")
    else if (streamName.isEmpty) Left("stream_name is not defined")
    else if (batchSize > StreamsConfig.MaxBatchSize || batchSize < 1)
      Left(s"invalid batch size: $batchSize (must be in [1, ${StreamsConfig.MaxBatchSize}])")
    else if (partitionKeyProvider != "" && partitionKeyProvider != "xid")
      Left(s"invalid partition key provider: $partitionKeyProvider")
    else Right(this)
}

object StreamsConfig {
  /** AWS PutRecords hard cap (streams/config.go:24-28). */
  val MaxBatchSize = 500
  /** Injected only when unset (streams/streams.go:22-24, config.go:25). */
  val DefaultBatchSize = 50
}

/** Firehose-shaped sink config (firehose/config.go:8-15; no partition key). */
final case class FirehoseConfig(
    region: String = "",
    streamName: String = "",
    batchSize: Int = StreamsConfig.DefaultBatchSize,
    maxRetries: Int = 3,
    timeout: FiniteDuration = 90.seconds,
    backoffInit: FiniteDuration = 1.second,
    backoffMax: FiniteDuration = 60.seconds) extends SinkConfig {

  /** firehose/config.go:37-51. */
  def validate: Either[String, FirehoseConfig] =
    if (region.isEmpty) Left("region is not defined")
    else if (streamName.isEmpty) Left("stream_name is not defined")
    else if (batchSize > StreamsConfig.MaxBatchSize || batchSize < 1)
      Left(s"invalid batch size: $batchSize (must be in [1, ${StreamsConfig.MaxBatchSize}])")
    else Right(this)
}
