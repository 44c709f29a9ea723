package graft

import graft.ext.Retrieval
import org.apache.spark.sql.functions._

/** BM25 retrieval: hand-computed scores on a tiny corpus, determinism, and
  * the broadcast-query plan shape (the corpus must never shuffle for the
  * query join). */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("bm25TopK matches a hand-computed score on a tiny corpus") {
    // corpus: 3 docs; query "cat dog"
    //   d1 = "cat cat fish"  (dl=3, tf_cat=2)
    //   d2 = "cat dog"       (dl=2, tf_cat=1, tf_dog=1)
    //   d3 = "fish fish"     (dl=2)
    // N=3, avgdl=7/3; df_cat=2, df_dog=1
    val docs = Seq((1L, "cat cat fish"), (2L, "cat dog"), (3L, "fish fish"))
      .toDF("doc_id", "text")
    val q = Seq(("q1", "cat dog")).toDF("qid", "qtext")
    val got = Retrieval.bm25TopK(docs, q, "doc_id", "text", k = 3)
      .select($"doc_id", $"score").as[(Long, Double)].collect().toMap
    val (k1, b, n, avgdl) = (1.2, 0.75, 3.0, 7.0 / 3.0)
    def idf(df: Double) = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def part(tf: Double, dl: Double, df: Double) =
      idf(df) * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
    val d1 = part(2, 3, 2)
    val d2 = part(1, 2, 2) + part(1, 2, 1)
    def r4(x: Double) = math.round((x + 1e-9) * 1e4) / 1e4
    assert(got.keySet == Set(1L, 2L), s"d3 shares no term with the query: $got")
    assert(math.abs(got(1L) - r4(d1)) < 1e-9, s"d1: $got vs $d1")
    assert(math.abs(got(2L) - r4(d2)) < 1e-9, s"d2: $got vs $d2")
    // d2 matches both terms (one rare) and must outrank d1
    assert(got(2L) > got(1L))
  }

  test("bm25TopK ranks deterministically and caps at k") {
    val out = Retrieval.s04Bm25(spark, dir).collect()
    assert(out.nonEmpty)
    val perQ = out.groupBy(_.getAs[String]("qid"))
    assert(perQ.values.forall(_.length <= 10))
    perQ.values.foreach { rows =>
      val ranks = rows.map(_.getAs[Long]("rank")).sorted.toSeq
      assert(ranks == (1L to rows.length).toSeq, s"dense ranks expected: $ranks")
    }
    // repeatable bit-for-bit
    val again = Retrieval.s04Bm25(spark, dir).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("bm25Search on a written index equals inline bm25TopK; the postings scan is pruned") {
    val docs = Tables.loadSpread(spark, dir, "documents")
    val q = Seq(("q1", "hash join column"), ("q2", "stream window agg"))
      .toDF("qid", "qtext")
    val inline = Retrieval.bm25TopK(docs, q, "doc_id", "text", k = 10)
      .collect().map(_.toString).sorted.toSeq
    // materialize the index the way the scaladoc prescribes: postings
    // term-sorted (row-group-prunable), stats beside it
    val idx = Retrieval.bm25Index(docs, "doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("bm25_idx").toString
    idx.postings.sort($"__t").write.parquet(s"$tmp/postings")
    idx.stats.write.parquet(s"$tmp/stats")
    val stored = Retrieval.Bm25Index(
      spark.read.parquet(s"$tmp/postings"), spark.read.parquet(s"$tmp/stats"))
    val viaIndex = Retrieval.bm25Search(stored, q, k = 10)
    assert(viaIndex.collect().map(_.toString).sorted.toSeq == inline,
      "search-on-index must reproduce the inline ranking exactly")
    // the query vocabulary reaches the postings table scan as a pushed
    // filter — per-search IO scales with the queried terms, not the corpus
    val scan = viaIndex.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [In(__t") || scan.contains("In(__t, ["),
      s"postings scan must carry the pushed query-vocabulary filter:\n$scan")
  }

  test("rrfFuse: hand-computed fusion, partial rankings, consensus beats a single head") {
    // two rankers over one query; doc 30 is mid-ranked by BOTH, doc 10/20
    // each top ONE ranker only. At k0=60: doc30 = 1/62+1/62 ≈ 0.0323 beats
    // doc10 = 1/61 ≈ 0.0164 and doc20 = 1/61 — the consensus property RRF
    // exists for. doc40 appears in ranking A only (partial coverage).
    val ra = Seq((1L, 10L, 1L), (1L, 30L, 2L), (1L, 40L, 3L))
      .toDF("qid", "doc", "rk")
    val rb = Seq((1L, 20L, 1L), (1L, 30L, 2L))
      .toDF("qid", "doc", "rk")
    val got = Retrieval.rrfFuse(Seq(ra, rb), "qid", "doc", "rk", k = 4)
      .select($"rrf_rank", $"id", $"rrf_score")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    def s(ranks: Seq[Long]) =
      BigDecimal(ranks.map(r => 1.0 / (60.0 + r)).sum + 1e-9)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.map(t => (t._1, t._2)) ==
      Seq((1L, 30L), (2L, 10L), (3L, 20L), (4L, 40L)),
      s"consensus doc must fuse on top, ties by id: $got")
    assert(got.map(_._3) == Seq(s(Seq(2, 2)), s(Seq(1)), s(Seq(1)), s(Seq(3))),
      s"scores must be the exact reciprocal-rank sums: $got")
    // doc 10 vs doc 20: identical score 1/61 — the id tie-break ordered them
    assert(got(1)._3 == got(2)._3)
  }

  test("bm25 plan: query side broadcasts, no all-pairs join") {
    val df = Retrieval.s04Bm25(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"query/dfreq joins must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"bm25 must not fall back to an all-pairs product:\n$p")
  }
}
