package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom-aggregation surface (SURVEY.md §2.8 UDF/UDAF row): the
  * engine's extension point for aggregates Spark lacks, as
  * `Aggregator[IN, BUF, OUT]` — partial-aggregating (map-side combine via
  * `merge`), codegen-encoded buffers, usable as a `TypedColumn` or registered
  * for SQL via `functions.udaf`.
  *
  * The reference's only aggregate-like state is its delivery counters
  * (s12v/awsbeats streams/client.go:87-96); these generalize that "fold a
  * batch to a summary" shape to analytics aggregates.
  */
object Aggregators {

  /** Numerically-stable streaming geometric mean: sums logs in the buffer
    * (a plain product overflows at ~1e308 after ~150 values). */
  object GeoMean extends Aggregator[Double, (Double, Long), Double] {
    override def zero: (Double, Long) = (0.0, 0L)
    override def reduce(b: (Double, Long), x: Double): (Double, Long) =
      if (x > 0) (b._1 + math.log(x), b._2 + 1) else b
    override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(b: (Double, Long)): Double =
      if (b._2 == 0) Double.NaN else math.exp(b._1 / b._2)
    override def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Exact streaming range (max − min) with a single (min, max) buffer —
    * demonstrates a buffer type that is not a plain sum. */
  object SpreadAgg extends Aggregator[Double, (Double, Double), Double] {
    override def zero: (Double, Double) = (Double.PositiveInfinity, Double.NegativeInfinity)
    override def reduce(b: (Double, Double), x: Double): (Double, Double) =
      (math.min(b._1, x), math.max(b._2, x))
    override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
      (math.min(a._1, b._1), math.max(a._2, b._2))
    override def finish(b: (Double, Double)): Double =
      if (b._1 > b._2) Double.NaN else b._2 - b._1
    override def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
