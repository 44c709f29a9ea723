package graft

import graft.ext.TextAnalysis

/** Hand-computed cases for the text-analysis generic APIs (the t01–t07 query
  * forms are oracle-proven; this pins the arithmetic on inputs small enough
  * to verify by hand). */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("unigramSurprise: mean -ln p(token) under the corpus unigram distribution") {
    // corpus: "a a b" + "b c" -> total 5 instances; p(a)=p(b)=2/5, p(c)=1/5
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = TextAnalysis.unigramSurprise(docs, "doc_id", "text")
      .select($"doc_id", $"n_tok", $"surprise")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val s1 = -math.log(0.4) // all three instances have p = 2/5
    val s2 = (-math.log(0.4) - math.log(0.2)) / 2.0
    def r4(x: Double) = math.round((x + 1e-9) * 1e4) / 1e4
    assert(got == Seq((1L, 3L, r4(s1)), (2L, 2L, r4(s2))), s"got $got")
    // rare-token documents must score strictly higher
    assert(got(1)._3 > got(0)._3)
  }
}
