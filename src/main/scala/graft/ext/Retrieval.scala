package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import TextOps._

/** Corpus-scale text retrieval: BM25 ranking of documents against a (small)
  * query set — the lexical-retrieval twin of [[Similarity]]'s dense kNN, and
  * the operator a training-data pipeline uses for targeted corpus slicing
  * (pull the documents "about" a topic) and RAG-style indexing experiments.
  * LLM-pipeline extension (SURVEY.md §2.8 scope).
  *
  * Scale design: the posting build ([[bm25Index]]) is one doc+term-keyed
  * aggregation over the tokenized corpus (d04's inverted-index shape),
  * materializable as a term-sorted table; ranking ([[bm25Search]]) prunes
  * the postings to the query vocabulary with a pushed literal filter, and
  * the query term set plus the per-term document frequencies OF THOSE TERMS
  * are broadcast (both tiny — |query vocab| rows), so the corpus never
  * shuffles for the join: only documents containing at least one query term
  * leave the scan, and only (query, doc) scored pairs — bounded by the
  * postings of the query terms — reach the ranking exchange. [[bm25TopK]]
  * composes the two inline for one-shot use.
  *
  * Scoring is the standard Robertson/Lucene BM25:
  * `idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))`,
  * `score(q,d) = Σ_t idf·tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl))` —
  * arithmetic kept in a fixed operation order so the DuckDB oracle
  * reproduces it; ranking orders on round(score, 6) with doc-id tie-break
  * (the s01 determinism pattern).
  */
object Retrieval {
  type Q = (SparkSession, String) => DataFrame

  /** A BM25 index: the two relations a deployment materializes ONCE and
    * ranks many query batches against — `postings` is (__did, __dl, __t,
    * __tf), `stats` is the single corpus row (__n, __avgdl). Write
    * `postings` SORTED BY `__t` (and `stats` beside it) as parquet tables:
    * [[bm25Search]] probes the postings with a literal `In` on the query
    * vocabulary, so a term-sorted layout lets row-group min/max stats skip
    * everything outside the queried terms — per-search IO then scales with
    * the query vocabulary's posting lists, not the corpus. */
  final case class Bm25Index(postings: DataFrame, stats: DataFrame)

  /** Build the [[Bm25Index]] relations from a raw corpus: one tokenize +
    * doc/term-keyed aggregation scan for the postings (the d04
    * inverted-index shape), one tokenize scan for the stats row. The stats
    * deliberately come from the corpus, not the postings — a zero-token
    * document contributes to N and avgdl but has no posting rows. */
  def bm25Index(docs: DataFrame, idCol: String, textCol: String): Bm25Index = {
    val d = docs
      .select(col(idCol).as("__did"), toks(col(textCol)).as("__tk"))
      .withColumn("__dl", size(col("__tk")).cast("double"))
    val postings = d
      .select(col("__did"), col("__dl"), explode_outer(col("__tk")).as("__t"))
      .filter(col("__t").isNotNull) // outer: no inferred-filter re-eval (see TextOps)
      .groupBy(col("__did"), col("__dl"), col("__t"))
      .agg(count(lit(1)).cast("double").as("__tf"))
    val stats = d.agg(count(lit(1)).cast("double").as("__n"), avg(col("__dl")).as("__avgdl"))
    Bm25Index(postings, stats)
  }

  /** BM25 top-`k` per query against a prebuilt [[Bm25Index]] — the corpus is
    * never touched. The query vocabulary is collected driver-side (query
    * sets are tiny by contract — they broadcast anyway) and pushed into the
    * postings relation as a literal `In` filter, so a table-backed index is
    * scanned with row-group pruning; document frequencies derive from the
    * SAME pruned postings, never from a corpus-wide dictionary.
    *
    * `materializeProbe` eagerly materializes the pruned postings
    * (localCheckpoint) so the probe is computed once instead of twice (the
    * dfreq broadcast and the scoring stream are separate consumers).
    * [[bm25TopK]] sets it — there the probe's parent is the full
    * tokenize+aggregation, worth running once; on a table-backed index the
    * default (two pruned scans) avoids pinning executor storage. */
  def bm25Search(index: Bm25Index, queries: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      materializeProbe: Boolean = false): DataFrame = {
    require(k >= 1)
    val qterms = queries
      .select(col("qid"), explode_outer(array_distinct(toks(col("qtext")))).as("__t"))
      .filter(col("__t").isNotNull)
    val vocab = qterms.select(col("__t")).distinct().collect().map(_.getString(0)).toSeq
    // chunked In probe (see graft.Pushdown): one ≤256-value In per scan
    // branch with the threshold raised past the chunk size — a single
    // unchunked In beyond the session threshold (default 10) silently
    // degrades to a min/max RANGE filter, which on terms spanning the
    // dictionary reads every row group and voids the term-sorted index's
    // whole IO contract
    val pruned =
      if (vocab.isEmpty) index.postings.filter(lit(false))
      else {
        graft.Pushdown.ensureInThreshold(queries.sparkSession)
        vocab.sorted.grouped(graft.Pushdown.InChunk)
          .map(chunk => index.postings.filter(col("__t").isInCollection(chunk)))
          .reduce(_ union _)
      }
    val qpost = if (materializeProbe) pruned.localCheckpoint(true) else pruned
    val dfreq = qpost.groupBy(col("__t")).agg(count(lit(1)).cast("double").as("__df"))
    val w = Window.partitionBy(col("qid")).orderBy(col("__s6").desc, col("__did"))
    qpost
      .join(broadcast(qterms), Seq("__t"))
      .join(broadcast(dfreq), Seq("__t"))
      .crossJoin(broadcast(index.stats))
      .withColumn("__part",
        log(lit(1.0) + (col("__n") - col("__df") + 0.5) / (col("__df") + 0.5))
          * (col("__tf") * (k1 + 1.0))
          / (col("__tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl"))))
      .groupBy(col("qid"), col("__did"))
      .agg(sum(col("__part")).as("__score"))
      // +1e-9 before round on BOTH engines: the sum accumulates in
      // engine-specific order, so last-ulp noise must not straddle a
      // rounding boundary (the t06/t07 guard)
      .withColumn("__s6", round(col("__score") + 1e-9, 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("__did").as("doc_id"),
        round(col("__score") + 1e-9, 4).as("score"))
  }

  /** BM25 top-`k` documents per query, inline from the raw corpus. `queries`
    * has columns (qid, qtext); both sides tokenize with [[TextOps.toks]].
    * Exactly [[bm25Index]] + [[bm25Search]], with the pruned probe
    * materialized so the corpus pays ONE tokenize+aggregation scan for the
    * postings (plus the one-row stats scan) per call. */
  def bm25TopK(docs: DataFrame, queries: DataFrame, idCol: String,
      textCol: String, k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25Search(bm25Index(docs, idCol, textCol), queries, k, k1, b,
      materializeProbe = true)

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009) —
    * combine any number of per-query rankings into one:
    * `score(q,d) = Σ_r 1/(k0 + rank_r(q,d))` over the rankings that
    * returned `d` for `q` (absent ranks contribute nothing — partial
    * rankings are the normal case: a dense index may not cover every
    * document the lexical index does). The standard hybrid-retrieval
    * combiner: rank-based, so it needs NO score normalization across
    * heterogeneous rankers (BM25 scores vs cosines vs Hamming distances),
    * and `k0` (default 60, the paper's value) damps the head so one
    * ranker's top hit cannot dominate unilaterally.
    *
    * Determinism: each contribution is 1/(k0 + rank) — an exact-integer
    * denominator — and double addition is commutative, so the fused score
    * is bit-identical in any accumulation order; ranking is on
    * round(score, 6) with id tie-break (the s01 contract). Scale: inputs
    * are k·|queries|-row rankings — the fusion never touches a corpus. */
  def rrfFuse(rankings: Seq[DataFrame], queryCol: String, idCol: String,
      rankCol: String, k: Int, k0: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse: need at least one ranking")
    require(k >= 1 && k0 >= 0, s"rrfFuse: need k >= 1 and k0 >= 0, got $k, $k0")
    val contrib = rankings.map(r =>
      r.select(col(queryCol).as("query_id"), col(idCol).as("id"),
        (lit(1.0) / (lit(k0.toDouble) + col(rankCol).cast("double"))).as("__c")))
      .reduce(_ unionAll _)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__s6").desc, col("id"))
    contrib.groupBy(col("query_id"), col("id"))
      .agg(sum(col("__c")).as("__score"))
      .withColumn("__s6", round(col("__score") + 1e-9, 6))
      .withColumn("rrf_rank", row_number().over(w).cast("long"))
      .filter(col("rrf_rank") <= k)
      .select(col("query_id"), col("rrf_rank"), col("id"),
        round(col("__score") + 1e-9, 4).as("rrf_score"))
  }

  /** The s04 query set — three fixed multi-term topics over the testdata's
    * fixed vocabulary (non-vacuous at every SF). */
  private val s04Queries = Seq(
    ("q1", "hash join column"),
    ("q2", "stream window agg"),
    ("q3", "vector scan data"))

  // ---------------------------------------------------------------- s04
  /** Oracle-checked BM25 top-10 per query over `documents`. */
  val s04Bm25: Q = (s, dir) => {
    import s.implicits._
    val q = s04Queries.toDF("qid", "qtext")
    bm25TopK(Tables.loadSpread(s, dir, "documents"), q, "doc_id", "text", k = 10)
      .orderBy($"qid", $"rank")
  }

  val queries: Map[String, Q] = Map("s04_bm25" -> s04Bm25)

  private val qtermValues = s04Queries
    .flatMap { case (qid, text) => text.split(" ").distinct.map(t => s"('$qid', '$t')") }
    .mkString(", ")

  val oracles: Map[String, String] = Map(
    "s04_bm25" ->
      s"""WITH l AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(text, '\\s+'), x -> length(x) > 0) AS toks
         |  FROM documents),
         | d AS (SELECT doc_id, toks, CAST(len(toks) AS DOUBLE) AS dl FROM l),
         | st AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM d),
         | p AS (SELECT doc_id, dl, unnest(toks) AS t FROM d),
         | tfq AS (
         |  SELECT doc_id, dl, t, CAST(count(*) AS DOUBLE) AS tf
         |  FROM p GROUP BY doc_id, dl, t),
         | q AS (SELECT * FROM (VALUES $qtermValues) AS v(qid, t)),
         | dfq AS (
         |  SELECT t, CAST(count(*) AS DOUBLE) AS df FROM tfq
         |  WHERE t IN (SELECT t FROM q) GROUP BY t),
         | sc AS (
         |  SELECT q.qid, tfq.doc_id, sum(
         |    ln(1.0 + (st.n - dfq.df + 0.5) / (dfq.df + 0.5))
         |    * (tfq.tf * (1.2 + 1.0))
         |    / (tfq.tf + 1.2 * (1.0 - 0.75 + 0.75 * tfq.dl / st.avgdl))) AS score
         |  FROM tfq JOIN q ON tfq.t = q.t JOIN dfq ON tfq.t = dfq.t, st
         |  GROUP BY q.qid, tfq.doc_id)
         |SELECT qid, rk AS "rank", doc_id, round(score + 1e-9, 4) AS score FROM (
         | SELECT qid, doc_id, score,
         |  CAST(row_number() OVER (PARTITION BY qid
         |    ORDER BY round(score + 1e-9, 6) DESC, doc_id) AS BIGINT) AS rk
         | FROM sc) t
         |WHERE rk <= 10 ORDER BY qid, rk""".stripMargin)
}
