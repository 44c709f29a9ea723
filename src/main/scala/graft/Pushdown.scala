package graft

import org.apache.spark.sql.SparkSession

/** Parquet In-filter pushdown knob shared by the operators that probe a
  * sorted table with a literal value set
  * ([[graft.streaming.CurationStream.nearDedupBatch]],
  * [[graft.ext.Retrieval.bm25Search]]). Spark converts a pushed `In` with
  * more values than `spark.sql.parquet.pushdown.inFilterThreshold`
  * (default 10) into a bare min/max RANGE filter — worthless on
  * hash-uniform keys (measured: a 200-signature probe over a 40k-row
  * sorted index read 39 825 rows under the range form) — so the probes
  * chunk their value lists into ≤[[InChunk]]-value `In`s and raise the
  * threshold just past the chunk size.
  *
  * The raise is STICKY — max(current, needed), never restored. A
  * set-then-restore window raced concurrent probes on the same session
  * (stream A's finally restoring the default while stream B was between
  * planning and scan), silently flipping B's pushdown off. A threshold of
  * a few hundred only changes plans that push that many literals, and the
  * chunk bound keeps the generated parquet Or-chain shallow (measured:
  * 500 values fine, 1000 = task StackOverflowError from the recursive
  * predicate evaluation).
  */
object Pushdown {
  /** Values per pushed `In` chunk. */
  val InChunk = 256

  private val Key = "spark.sql.parquet.pushdown.inFilterThreshold"

  /** Raise the session's In-pushdown threshold to at least `atLeast`
    * (idempotent, monotone, never lowers). */
  def ensureInThreshold(spark: SparkSession, atLeast: Int = InChunk + 1): Unit =
    synchronized {
      val cur = spark.conf.getOption(Key)
        .flatMap(v => scala.util.Try(v.toInt).toOption).getOrElse(10)
      if (cur < atLeast) spark.conf.set(Key, atLeast.toString)
    }
}
