package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.TextOps._

/** Streaming corpus intake with curation — the readStream twin of the batch
  * c05 pipeline, restricted to the stages whose state is streaming-safe:
  *
  *   1. quality gate (token count) — stateless filter;
  *   2. benchmark decontamination — stateless per-row n-gram-hash overlap
  *      against the (small) eval-set hash array, folded into the plan;
  *   3. exact dedup on the md5 digest via `dropDuplicatesWithinWatermark` —
  *      the only stateful stage, state = one digest per distinct doc inside
  *      the watermark horizon.
  *
  * Scale notes: the benchmark hash set of a held-out eval suite is small
  * (thousands of n-grams), so a plan-literal array is the honest shape at
  * spec scale; a 100 TB deployment with a large decontamination corpus
  * replaces stage 2 with a broadcast bloom filter or the batch c01 join on
  * the silver table. Dedup state is bounded by the watermark, not the
  * stream length — the standard trade: only duplicates arriving within the
  * horizon collapse.
  */
object CurationStream {

  /** Apply the three curation stages to a streaming `docs` frame that
    * already carries a watermark (required by the dedup stage). Columns
    * `text` is read; all input columns pass through. */
  def curate(docs: DataFrame, benchHashes: Seq[Long], minTokens: Int,
      n: Int = 8): DataFrame = {
    val bench = typedLit(benchHashes)
    docs
      .withColumn("__tk", toks(col("text")))
      .withColumn("n_tok", size(col("__tk")).cast("long"))
      .filter(col("n_tok") >= minTokens)
      .withColumn("__ghs",
        transform(array_distinct(ngramsExact(col("__tk"), n)), g => h60(g)))
      .filter(size(array_intersect(col("__ghs"), bench)) === 0)
      .withColumn("__digest", md5(col("text")))
      .dropDuplicatesWithinWatermark("__digest")
      .drop("__tk", "__ghs", "__digest")
  }

  /** Driver-side benchmark hash set from a static benchmark table — the
    * c01 n-gram hashing, collected (eval sets are small by construction). */
  def benchmarkHashes(benchmark: DataFrame, textCol: String, n: Int = 8): Seq[Long] = {
    import benchmark.sparkSession.implicits._
    benchmark
      .withColumn("__tk", toks(col(textCol)))
      .select(explode_outer(array_distinct(ngramsExact(col("__tk"), n))).as("__ng"))
      .filter(col("__ng").isNotNull)
      .select(h60(col("__ng"))).distinct().as[Long].collect().toSeq
  }
}
