package graft

import graft.ext.TextAnalysis

/** Hand-computed cases for the text-analysis generic APIs (the t01–t07 query
  * forms are oracle-proven; this pins the arithmetic on inputs small enough
  * to verify by hand). */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("clusterTermLift: hand-computed lifts, rank by lift desc then token") {
    // g0 = "a a b", g1 = "b b c": corpus a:2 b:3 c:1, total 6, gtot 3 each
    // lift(g0,a) = 2*6/(3*2) = 2.0   lift(g0,b) = 1*6/(3*3) = 0.6667
    // lift(g1,c) = 1*6/(3*1) = 2.0   lift(g1,b) = 2*6/(3*3) = 1.3333
    val df = Seq((0L, "a a b"), (1L, "b b c")).toDF("g", "text")
    val got = TextAnalysis.clusterTermLift(df, "g", "text", topN = 2)
      .select($"g", $"term_rank", $"token", $"cnt", $"lift")
      .as[(Long, Long, String, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(
      (0L, 1L, "a", 2L, 2.0), (0L, 2L, "b", 1L, 0.6667),
      (1L, 1L, "c", 1L, 2.0), (1L, 2L, "b", 2L, 1.3333)))
  }

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

  test("scriptProfile: per-block counts, dominant vote, tie-break, und fallback") {
    def r4(x: Double) = math.round((x + 1e-9) * 1e4) / 1e4
    val docs = Seq(
      (1L, "hello world"),        // pure latin: 10 letters
      (2L, "汉字漢字"),            // pure cjk
      (3L, "привет"),             // pure cyrillic
      (4L, "ab 汉字 cd"),          // 4 latin vs 2 cjk -> latin, share 4/6
      (5L, "ab 汉字"),             // 2 vs 2 tie -> declaration order: latin
      (6L, "12345 !?")).          // nothing classified -> und, share 0
      toDF("doc_id", "text")
    val got = TextAnalysis.scriptProfile(docs, "doc_id", "text")
      .select($"doc_id", $"script", $"script_share", $"n_latin", $"n_cjk")
      .as[(Long, String, Double, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, "latin", 1.0, 10L, 0L),
      (2L, "cjk", 1.0, 0L, 4L),
      (3L, "cyrillic", 1.0, 0L, 0L),
      (4L, "latin", r4(4.0 / 6), 4L, 2L),
      (5L, "latin", 0.5, 2L, 2L),
      (6L, "und", 0.0, 0L, 0L)), s"got $got")
  }

  test("sentenceStats: C4 rules — segmentation, terminal ending, keep decision") {
    val docs = Seq(
      (1L, "First one. Second here! Third now?"), // 3 sent, terminal -> keep
      (2L, "Only one sentence."),                 // 1 sent, terminal, no keep
      (3L, "no punctuation at all"),              // 1 segment, unterminated
      (4L, "Tiny. Go. On."),                      // 3 sent but 3 words < 5
      (5L, "Ends mid stream. But then trails"),   // unterminated tail
      (6L, "")).toDF("doc_id", "text")            // degenerate: 0 sentences
    val got = TextAnalysis.sentenceStats(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Double, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 3L, 6L, 1L, 2.0, 1L),
      (2L, 1L, 3L, 1L, 3.0, 0L),
      (3L, 1L, 4L, 0L, 4.0, 0L),
      (4L, 3L, 3L, 1L, 1.0, 0L),
      (5L, 2L, 6L, 0L, 3.0, 0L),
      (6L, 0L, 0L, 0L, 0.0, 0L)), s"got $got")
  }

  test("charEntropy: ln-count identity, head truncation, low-entropy flag") {
    def r4(x: Double) = math.round((x + 1e-9) * 1e4) / 1e4
    val docs = Seq(
      (1L, "aabb"),            // H = ln4 - (2ln2 + 2ln2)/4 = ln2
      (2L, "abcd"),            // uniform: H = ln4
      (3L, "aaaa"),            // degenerate: H = 0 -> low_entropy
      (4L, "xy" + "z" * 100)). // head cap: only the first 4 chars score
      toDF("doc_id", "text")
    val got = TextAnalysis.charEntropy(docs, "doc_id", "text", headChars = 4)
      .as[(Long, Long, Long, Double, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 4L, 2L, r4(math.log(2)), 1L),
      (2L, 4L, 4L, r4(math.log(4)), 1L),
      (3L, 4L, 1L, 0.0, 1L),
      // head "xyzz": H = ln4 - (2 ln 2)/4
      (4L, 4L, 3L, r4(math.log(4) - 2 * math.log(2) / 4), 1L)), s"got $got")
    // a diverse real-text head clears the default bar
    val real = Seq((9L, "The quick brown fox jumps over the lazy dog; " +
      "pack my box with five dozen liquor jugs.")).toDF("doc_id", "text")
    val r = TextAnalysis.charEntropy(real, "doc_id", "text")
      .as[(Long, Long, Long, Double, Long)].collect().head
    assert(r._4 > 2.5 && r._5 == 0L, s"got $r")
  }

  test("stripHtml: script/style drop wholesale, tags strip, entities decode last") {
    val docs = Seq(
      (1L, "a <b>bold</b> text"),
      (2L, "x <script>if (1 < 2) alert('hi')</script> y"),
      // &amp;lt; must decode to the LITERAL '&lt;', not '<' — &amp; decodes
      // last, pinning the classic double-decode ordering bug
      (3L, "keep &amp;lt; literal"),
      (4L, "A&nbsp;B &#39;s&#39;"),
      (5L, "<style>p{a:b}</style>done"),
      (6L, "no markup at all")).toDF("doc_id", "text")
    val got = TextAnalysis.stripHtml(docs, "doc_id", "text")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, "a bold text", 2L),
      (2L, "x y", 2L), // the bare '<' inside the script never leaks out
      (3L, "keep &lt; literal", 0L),
      (4L, "A B 's'", 0L),
      (5L, "done", 2L),
      (6L, "no markup at all", 0L)))
  }

  test("redactPii replaces emails, ips, phones with typed placeholders and counts each") {
    val docs = Seq(
      (1L, "contact bob@test.com or a1.b@ex.org now"),
      (2L, "host 10.0.0.1 and 192.168.255.3 up"),
      (3L, "call 555-123-4567 today"),
      (4L, "clean text with no pii at all"),
      (5L, "octets 1.2.3.4.5 chain"), // IP regex takes the first 4 octets
      (6L, "write Bob.Smith@Example.COM today")) // mixed case still redacts
      .toDF("doc_id", "text")
    val got = TextAnalysis.redactPii(docs, "doc_id", "text")
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, "contact <EMAIL> or <EMAIL> now", 2L, 0L, 0L),
      (2L, "host <IP> and <IP> up", 0L, 2L, 0L),
      (3L, "call <PHONE> today", 0L, 0L, 1L),
      (4L, "clean text with no pii at all", 0L, 0L, 0L),
      (5L, "octets <IP>.5 chain", 0L, 1L, 0L),
      (6L, "write <EMAIL> today", 1L, 0L, 0L)), s"got $got")
  }

  test("scoreLinear: sigmoid of mean token weight, OOV weighs zero, label at 0.5") {
    val w = Seq(("good", 2.0), ("bad", -2.0)).toDF("token", "weight")
    val docs = Seq(
      (1L, "good good"),        // mean 2.0 -> sigmoid 0.8808
      (2L, "bad bad bad"),      // mean -2.0 -> 0.1192
      (3L, "good bad"),         // mean 0 -> 0.5 -> label 1 (>= 0.5)
      (4L, "unknown words only")) // all OOV -> 0.5
      .toDF("doc_id", "text")
    def sig(x: Double) = math.round((1.0 / (1.0 + math.exp(-x)) + 1e-9) * 1e4) / 1e4
    val got = TextAnalysis.scoreLinear(docs, "doc_id", "text", w)
      .as[(Long, Long, Double, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 2L, sig(2.0), 1L), (2L, 3L, sig(-2.0), 0L),
      (3L, 2L, 0.5, 1L), (4L, 3L, 0.5, 1L)), s"got $got")
    // bias shifts every score
    val biased = TextAnalysis.scoreLinear(docs, "doc_id", "text", w, bias = -3.0)
      .as[(Long, Long, Double, Long)].collect().sortBy(_._1).toSeq
    assert(biased.map(_._4) == Seq(0L, 0L, 0L, 0L))
  }

  test("gopherRules: each rule trips independently; clean prose passes") {
    val five = "the and that have with" // 5 tokens, lens 3+3+4+4+4 = 18
    val a = Array.fill(10)(five).mkString(" ") // 50 tokens, mean len 3.6
    val docs = Seq(
      (1L, a),                                      // passes all seven rules
      (2L, five),                                   // 5 tokens < 50
      (3L, a + " # # # # # #"),                     // sym 6/56 > 0.1
      (4L, s"- $five $five\n- $five $five"),        // all lines bullet-start
      (5L, a + "..."),                              // all lines ellipsis-end
      (6L, "the and " + Array.fill(24)("11 22").mkString(" ")), // alpha 2/50
      (7L, a.toUpperCase + " the and that have with")) // caps words ARE alphabetic
      .toDF("doc_id", "text")
    def r4(x: Double) = math.round((x + 1e-9) * 1e4) / 1e4
    val got = TextAnalysis.gopherRules(docs, "doc_id", "text")
      .select($"doc_id", $"n_tok", $"mean_tok_len", $"sym_ratio",
        $"bullet_frac", $"ellipsis_frac", $"alpha_frac", $"n_stop_hit", $"pass")
      .as[(Long, Long, Double, Double, Double, Double, Double, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(got(0) == (1L, 50L, 3.6, 0.0, 0.0, 0.0, 1.0, 5L, 1L), s"got ${got(0)}")
    assert(got(1)._2 == 5L && got(1)._9 == 0L)                 // too short
    assert(got(2)._4 == r4(6.0 / 56) && got(2)._9 == 0L)       // symbol ratio
    assert(got(3)._5 == 1.0 && got(3)._9 == 0L)                // bullet lines
    assert(got(4)._6 == 1.0 && got(4)._9 == 0L)                // ellipsis ends
    assert(got(5)._7 == r4(2.0 / 50) && got(5)._9 == 0L)       // non-alpha words
    // doc 4's alpha fraction stays above the 0.8 bound — the bullet rule is
    // what fails it (2 of 22 tokens are the dashes, carrying no [a-z])
    assert(got(3)._7 == r4(20.0 / 22) && got(3)._8 >= 2L)
    // doc 7: 50 uppercase + 5 lowercase tokens — caps words count as
    // alphabetic (the Gopher rule is case-insensitive), and the lowercase
    // tail supplies the required stopwords, so the doc passes
    assert(got(6)._7 == 1.0 && got(6)._9 == 1L, s"got ${got(6)}")
  }

  test("bigramSurprise: mean -ln P(t2|t1) under the corpus bigram model") {
    // corpus bigrams: "a b"x2, "b a"x1 (doc 1), "a c"x1 (doc 2);
    // prefix counts: a->3, b->1. Doc 3 has no bigram and is absent.
    val docs = Seq((1L, "a b a b"), (2L, "a c"), (3L, "z")).toDF("doc_id", "text")
    def r4(x: Double) = math.round((x + 1e-9) * 1e4) / 1e4
    val got = TextAnalysis.bigramSurprise(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val s1 = 2.0 * math.log(3.0 / 2.0) / 3.0 // two -ln(2/3), one -ln(1/1)
    val s2 = math.log(3.0)                   // -ln(1/3)
    assert(got == Seq((1L, 3L, r4(s1)), (2L, 1L, r4(s2))), s"got $got")
    // the formulaic doc scores lower than the rare-continuation doc
    assert(got(0)._3 < got(1)._3)
  }

  test("knSurprise: interpolated Kneser-Ney probabilities, hand-computed") {
    // corpus bigrams: "a b"x2, "b a"x1 (doc 1), "a c"x1 (doc 2); D = 0.75
    // c(a.)=3 N1+(a.)=2; c(b.)=1 N1+(b.)=1; Pcont: a,b,c each 1/3; T=3
    //   P(b|a) = (2-D)/3 + (D*2/3)*(1/3) = 7/12
    //   P(a|b) = (1-D)/1 + (D*1/1)*(1/3) = 1/2
    //   P(c|a) = (1-D)/3 + (D*2/3)*(1/3) = 1/4
    // unit sum for prefix a over the full vocab {a,b,c}:
    //   7/12 + 1/4 + lambda(a)*Pcont(a) = 7/12 + 3/12 + (1/2)*(1/3) = 1
    val docs = Seq((1L, "a b a b"), (2L, "a c"), (3L, "z")).toDF("doc_id", "text")
    def r4(x: Double) = math.round((x + 1e-9) * 1e4) / 1e4
    val got = TextAnalysis.knSurprise(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val s1 = (2.0 * -math.log(7.0 / 12.0) + -math.log(0.5)) / 3.0
    val s2 = -math.log(0.25)
    assert(got == Seq((1L, 3L, r4(s1)), (2L, 1L, r4(s2))), s"got $got")
    // doc 3 has no bigram and is absent (the t12 contract)
    assert(!got.exists(_._1 == 3L))
  }

  test("knStats: the conditional sums to exactly 1 over the vocabulary") {
    // P over SEEN bigrams plus the interpolated mass lambda(t1)*Pcont(t2)
    // for every UNSEEN (t1, t2) vocab pair must total 1 per prefix.
    val docs = Seq((1L, "a b a b c a"), (2L, "b c a c"), (3L, "c a b a"))
      .toDF("doc_id", "text")
    val inst = docs
      .withColumn("__tk", graft.ext.TextOps.toks($"text"))
      .select(org.apache.spark.sql.functions.explode(
        graft.ext.TextOps.ngramsExact($"__tk", 2)).as("__bg"))
    val d = 0.75
    val p = TextAnalysis.knStats(inst, d)
      .as[(String, Double)].collect().map { case (bg, pr) =>
        val Array(t1, t2) = bg.split(" "); (t1, t2) -> pr
      }.toMap
    val bgs = inst.as[String].collect()
    val cf = bgs.groupBy(_.split(" ")(0)).view.mapValues(_.length.toDouble).toMap
    val nf = p.keys.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val nb = p.keys.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
    val vocab = (p.keys.map(_._1) ++ p.keys.map(_._2)).toSet
    val tTot = p.size.toDouble
    for (t1 <- p.keys.map(_._1).toSet[String]) {
      val sum = vocab.toSeq.map { t2 =>
        p.getOrElse((t1, t2), d * nf(t1) / cf(t1) * (nb.getOrElse(t2, 0.0) / tTot))
      }.sum
      assert(math.abs(sum - 1.0) < 1e-12, s"prefix $t1 sums to $sum")
    }
  }

  test("urlFilter: extracts normalized domains, counts blocklist hits, keeps clean docs") {
    val docs = Seq(
      (1L, "read https://www.Good.Example.com/a and http://bad.spam.net/x now"),
      (2L, "only https://ok.org here"),
      (3L, "no links at all"),
      (4L, "http://bad.spam.net http://bad.spam.net twice"),
      (5L, "see http://bad.spam.net."),            // sentence-ending dot
      (6L, "via https://alice@bad.spam.net/page")) // userinfo prefix
      .toDF("doc_id", "text")
    val doms = TextAnalysis.urlDomains(docs, "doc_id", "text")
      .as[(Long, Seq[String])].collect().sortBy(_._1).toSeq
    // lowercased, www.-stripped, path excluded
    assert(doms(0)._2 == Seq("good.example.com", "bad.spam.net"), s"got ${doms(0)}")
    assert(doms(2)._2.isEmpty)
    // a trailing punctuation dot or a user@ prefix must not hide the host
    assert(doms(4)._2 == Seq("bad.spam.net"), s"got ${doms(4)}")
    assert(doms(5)._2 == Seq("bad.spam.net"), s"got ${doms(5)}")
    val got = TextAnalysis.urlFilter(docs, "doc_id", "text", Seq("bad.spam.net"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 2L, 1L, 0L),  // one clean + one blocked -> dropped
      (2L, 1L, 0L, 1L),
      (3L, 0L, 0L, 1L),  // no URLs is fine
      (4L, 2L, 2L, 0L),
      (5L, 1L, 1L, 0L),
      (6L, 1L, 1L, 0L)), s"got $got")
  }

  test("sourceOverlap computes shingle-set Jaccard per source pair, zero-overlap pairs kept") {
    // A: shingles {x y z, y z w, z w, w}; B: {x y z, y z q, z q, q} -> share 1 of 7
    // C: {c1} -> no overlap with either
    val docs = Seq(("A", "x y z w"), ("B", "x y z q"), ("C", "c1"))
      .toDF("source", "text")
    val got = TextAnalysis.sourceOverlap(docs, "source", "text")
      .as[(String, String, Long, Long, Long, Double)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    def r4(x: Double) = math.round((x + 1e-9) * 1e4) / 1e4
    assert(got == Seq(
      ("A", "B", 4L, 4L, 1L, r4(1.0 / 7.0)),
      ("A", "C", 4L, 1L, 0L, 0.0),
      ("B", "C", 4L, 1L, 0L, 0.0)), s"got $got")
  }

  test("bpeTrain learns the Sennrich toy merges in order with deterministic ties") {
    // the classic corpus: low x5, lower x2, newest x6, widest x3
    val docs = Seq(
      (1L, "low low low low low"),
      (2L, "lower lower"),
      (3L, "newest newest newest newest newest newest"),
      (4L, "widest widest widest")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrain(docs, "text", nMerges = 5)
      .as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq
    // rank 1: es/st tie at 9 -> (e,s) by (left,right) asc; rank 3: lo/ow tie
    // at 7 -> (l,o); rank 5: ew/ne/w-est tie at 6 -> (e,w)
    assert(got == Seq(
      (1L, "e", "s", 9L),
      (2L, "es", "t", 9L),
      (3L, "l", "o", 7L),
      (4L, "lo", "w", 7L),
      (5L, "e", "w", 6L)), s"got $got")
  }

  test("bpeTrain merges overlapping runs greedily left-to-right (l = r)") {
    // "aaaa": pairs a-a x3 -> merge (a,a) folds to [aa, aa], never [aa, a, a]
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrain(docs, "text", nMerges = 2)
      .as[(Long, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "a", "a", 3L), (2L, "aa", "aa", 1L)), s"got $got")
  }

  test("bpeSegment applies merges in rank order; untrained words fall back to finer units") {
    val merges = Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"))
    // lowest -> [low, est] (2); newest -> [n, e, w, est] (4)
    val docs = Seq((1L, "lowest newest"), (2L, "zq")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeSegment(docs, "doc_id", "text", merges)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 2L, 6L), (2L, 1L, 2L)), s"got $got")
  }

  test("lengthBuckets: power-of-2 buckets, ceil-div chunks, padding, cumulative") {
    // token counts 1, 3, 4, 5, 0 at seqLen 4:
    //   1 -> bucket 1, 1 chunk, pad 3;  3 -> bucket 2, 1 chunk, pad 1
    //   4 -> bucket 4, 1 chunk, pad 0;  5 -> bucket 4, 2 chunks, pad 3
    //   "" -> bucket 0, 0 chunks, pad 0
    val docs = Seq((1L, "a"), (2L, "a b c"), (3L, "a b c d"),
      (4L, "a b c d e"), (5L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.lengthBuckets(docs, "text", seqLen = 4)
      .select($"bucket_lo", $"n_docs", $"n_tokens", $"n_chunks", $"n_padding", $"cum_tokens")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (0L, 1L, 0L, 0L, 0L, 0L),
      (1L, 1L, 1L, 1L, 3L, 1L),
      (2L, 1L, 3L, 1L, 1L, 4L),
      (4L, 2L, 9L, 3L, 3L, 13L)), s"got $got")
  }

  test("zipfFit: slope/intercept match the closed-form least squares by hand") {
    // counts 8/4/2/1 at ranks 1..4; expected sums replicate the operator's
    // rank-ordered left-fold exactly (same association, same doubles)
    val text = (Seq.fill(8)("a") ++ Seq.fill(4)("b") ++ Seq.fill(2)("c") ++ Seq("d"))
      .mkString(" ")
    val got = TextAnalysis.zipfFit(Seq((1L, text)).toDF("doc_id", "text"), "text")
      .as[(Long, Double, Double)].head()
    val pts = Seq(8L, 4L, 2L, 1L).zipWithIndex.map { case (c, i) =>
      (math.log((i + 1).toDouble), math.log(c.toDouble)) }
    def fold(vs: Seq[Double]) = vs.foldLeft(0.0d)(_ + _)
    val n = pts.size.toDouble
    val (sx, sy) = (fold(pts.map(_._1)), fold(pts.map(_._2)))
    val (sxx, sxy) = (fold(pts.map(p => p._1 * p._1)), fold(pts.map(p => p._1 * p._2)))
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    def r4(v: Double) = BigDecimal.valueOf(v + 1e-9)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == ((4L, r4(slope), r4((sy - slope * sx) / n))), s"got $got")
    assert(got._2 < 0, "a decaying rank-frequency curve must fit a negative slope")
  }

  test("lexicalDiversity: types, hapax, ttr by hand; empty doc all-zero") {
    // doc 1: "a a b c" -> 4 tokens, 3 types, hapax {b, c} = 2, ttr 0.75
    // doc 2: "x x x"   -> 3 tokens, 1 type,  hapax 0,        ttr 0.3333
    // doc 3: ""        -> zeros, ttr 0.0
    val docs = Seq((1L, "a a b c"), (2L, "x x x"), (3L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.lexicalDiversity(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 4L, 3L, 2L, 0.75),
      (2L, 3L, 1L, 0L, 0.3333),
      (3L, 0L, 0L, 0L, 0.0)), s"got $got")
  }

  test("readability: hand-computed Flesch incl. negative-score and empty docs") {
    // doc 1: "The cat sat. It ran!" -> W=5, S=2, Syl=5 (one vowel run per
    //   word): 206.835 - 1.015*2.5 - 84.6*1.0 = 119.6975
    // doc 2: 300 unpunctuated words, 1 segment, 300 syllables:
    //   206.835 - 304.5 - 84.6 = -182.265 (the negative-score path)
    // doc 3: empty -> all zero counts, score 0.0 by convention
    val docs = Seq(
      (1L, "The cat sat. It ran!"),
      (2L, Seq.fill(300)("a").mkString(" ")),
      (3L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.readability(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 5L, 2L, 5L, 119.6975),
      (2L, 300L, 1L, 300L, -182.265),
      (3L, 0L, 0L, 0L, 0.0)), s"got $got")
  }

  test("ngramNovelty: shared = distinct grams with df >= 2; gram-less docs fully novel") {
    // 3-grams: doc1 "a b c d" -> {abc, bcd}; doc2 "a b c e" -> {abc, bce};
    // doc3 "x y" -> no full 3-gram. Shared gram: abc (df=2).
    val docs = Seq((1L, "a b c d"), (2L, "a b c e"), (3L, "x y")).toDF("doc_id", "text")
    val got = TextAnalysis.ngramNovelty(docs, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 2L, 1L, 0.5), (2L, 2L, 1L, 0.5), (3L, 0L, 0L, 1.0)),
      s"got $got")
  }
}
