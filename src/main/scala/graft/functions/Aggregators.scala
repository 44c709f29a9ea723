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

  /** Bounded top-k by (score DESC, id ASC): the partial-aggregating form of
    * per-group top-k ranking. A window-rank plan shuffles EVERY scored row
    * to its group's partition before ranking — |groups| × |candidates| rows
    * over the wire, the scale killer of brute-force/ADC similarity scans. An
    * Aggregator gets map-side combine, so each map partition contributes at
    * most k rows per group to the shuffle regardless of corpus size.
    *
    * Buffer = ascending-sorted vector of ≤ k (score, id) pairs (worst
    * element first — O(k) insert-drop, k is small); ties on score broken by
    * LOWER id winning, matching the `orderBy(score.desc, id)` window the
    * query twins use. Output = (id, score) structs best-first. */
  final class TopKAgg(k: Int)
      extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Long, Double)]] {
    require(k >= 1)
    // (score asc, id desc): head is always the WEAKEST kept entry
    private def lt(a: (Double, Long), b: (Double, Long)): Boolean =
      a._1 < b._1 || (a._1 == b._1 && a._2 > b._2)
    private def insert(b: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
      if (b.size < k) (b :+ x).sortWith(lt)
      else if (lt(x, b.head)) b
      else (b.tail :+ x).sortWith(lt)
    override def zero: Seq[(Double, Long)] = Vector.empty
    override def reduce(b: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
      insert(b, x)
    override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
      b.foldLeft(a)(insert)
    override def finish(b: Seq[(Double, Long)]): Seq[(Long, Double)] =
      b.reverse.map { case (score, id) => (id, score) }
    override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
    override def outputEncoder: Encoder[Seq[(Long, Double)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
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
