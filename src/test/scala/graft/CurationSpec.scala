package graft

import graft.ext.{Curation, CurationOps}
import org.apache.spark.sql.functions._

/** Corpus-curation operators: decontamination, sequence packing, and
  * deterministic stratified sampling — hand-computed small cases plus
  * agreement between the generic APIs and their oracle-checked query twins
  * (c01–c03) on the testdata. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def docs = Tables.load(spark, dir, "documents")

  private val corpus = Seq(
    (1L, "a b c d e f g h i j"), // shares 8-gram "a b c d e f g h" with bench
    (2L, "p q r s t u v w x z"), // clean
    (3L, "short doc")) // < 8 tokens: no 8-grams at all
    .toDF("doc_id", "text")
  private val bench = Seq((100L, "x y a b c d e f g h")).toDF("doc_id", "text")

  test("klDrift: per-source KL against the corpus distribution, hand-computed") {
    def r4(x: Double) = math.round((x + 1e-9) * 1e4) / 1e4
    // source A: "a a b" (p_a=2/3, p_b=1/3); source B: "b c" (1/2, 1/2)
    // corpus: a:2 b:2 c:1, T=5
    val docs = Seq(
      (1L, "a a b", "A"), (2L, "b c", "B")).toDF("doc_id", "text", "source")
    val got = CurationOps.klDrift(docs, "text", "source")
      .as[(String, Long, Long, Double)].collect().sortBy(_._1).toSeq
    val klA = 2.0 / 3 * math.log((2.0 / 3) / (2.0 / 5)) +
      1.0 / 3 * math.log((1.0 / 3) / (2.0 / 5))
    val klB = 1.0 / 2 * math.log((1.0 / 2) / (2.0 / 5)) +
      1.0 / 2 * math.log((1.0 / 2) / (1.0 / 5))
    assert(got == Seq(("A", 3L, 2L, r4(klA)), ("B", 2L, 2L, r4(klB))), s"got $got")
    // Gibbs: KL >= 0, and the more-drifted slice scores higher
    assert(got.forall(_._4 >= 0.0) && klB > klA)
    // a source that IS the corpus has zero drift
    val solo = Seq((1L, "a b", "only")).toDF("doc_id", "text", "source")
    val z = CurationOps.klDrift(solo, "text", "source")
      .as[(String, Long, Long, Double)].collect().head
    assert(z == (("only", 2L, 2L, 0.0)), s"got $z")
  }

  test("corpusReport: rollup lattice with integer stats and (all) subtotals") {
    val docs = Seq(
      (1L, "a b c", "web", "en"),   // 3 tok, 5 chars
      (2L, "d e", "web", "en"),     // 2 tok, 3 chars
      (3L, "f", "web", "de"),       // 1 tok, 1 char
      (4L, "g h i j", "books", "en")) // 4 tok, 7 chars
      .toDF("doc_id", "text", "source", "lang")
    val got = CurationOps.corpusReport(docs, "text", "source", "lang")
      .as[(String, String, Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      ("(all)", "(all)", 4L, 10L, 16L, 4L),
      ("books", "(all)", 1L, 4L, 7L, 4L),
      ("books", "en", 1L, 4L, 7L, 4L),
      ("web", "(all)", 3L, 6L, 9L, 3L),
      ("web", "de", 1L, 1L, 1L, 1L),
      ("web", "en", 2L, 5L, 8L, 3L)), s"got $got")
  }

  test("contaminationCounts flags exactly the overlapping doc") {
    val got = CurationOps.contaminationCounts(corpus, bench, "doc_id", "text", n = 8)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 1L), (2L, 0L), (3L, 0L)))
  }

  test("decontaminate drops flagged rows, passes all columns through") {
    val kept = CurationOps.decontaminate(corpus, bench, "doc_id", "text", n = 8)
    assert(kept.columns.toSeq == corpus.columns.toSeq)
    assert(kept.select($"doc_id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
    // a 13-gram decontamination finds no overlap here — nothing dropped
    assert(CurationOps.decontaminate(corpus, bench, "doc_id", "text").count() == 3)
  }

  test("decontaminate anti-joins the contaminated set without a broadcast hint") {
    // same 100 TB contract as dropNearDuplicatesMinhash: anti against the
    // small contaminated set, no hinted corpus-sized build side
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val res = CurationOps.decontaminate(corpus, bench, "doc_id", "text", n = 8)
    val hinted = res.queryExecution.optimizedPlan.collect {
      case j: Join if j.hint.leftHint.exists(_.strategy.nonEmpty) ||
        j.hint.rightHint.exists(_.strategy.nonEmpty) => j
    }
    assert(hinted.isEmpty)
    assert(res.queryExecution.optimizedPlan.collect {
      case j: Join if j.joinType.toString == "LeftAnti" => j }.nonEmpty)
  }

  test("decontaminate singlePass returns exactly the two-pass result") {
    val kept = CurationOps.decontaminate(corpus, bench, "doc_id", "text",
      n = 8, singlePass = true)
    assert(kept.columns.toSeq == corpus.columns.toSeq)
    assert(kept.select($"doc_id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
    // agreement on the real table, multi-column passthrough included
    val c = docs.filter($"doc_id" % 20 =!= 0)
    val b = docs.filter($"doc_id" % 20 === 0)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id").as[Long].collect().sorted.toSeq
    val two = CurationOps.decontaminate(c, b, "doc_id", "text", n = 8)
    val one = CurationOps.decontaminate(c, b, "doc_id", "text", n = 8, singlePass = true)
    assert(one.columns.toSeq == two.columns.toSeq)
    assert(ids(one) == ids(two))
  }

  test("decontaminate singlePass keeps duplicate-id multiplicity and column order") {
    // duplicate ids must not silently collapse to one row, and the output
    // must keep the corpus's column order even when idCol is not leading
    val c = Seq(
      ("en", 1L, "p q r s t u v w x z"), // clean, duplicated id+text
      ("en", 1L, "p q r s t u v w x z"),
      ("en", 2L, "a b c d e f g h i j")) // contaminated
      .toDF("lang", "doc_id", "text")
    val kept = CurationOps.decontaminate(c, bench, "doc_id", "text",
      n = 8, singlePass = true)
    assert(kept.columns.toSeq == Seq("lang", "doc_id", "text"))
    assert(kept.select($"doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 1L))
  }

  test("decontaminate singlePass reads the corpus chain once, two-pass twice") {
    // the point of the variant: an expensive upstream chain must evaluate
    // once. Count corpus relations in the optimized plan: single-pass is
    // corpus + bench; two-pass reads the corpus THREE times (gram explode,
    // id spine, output scan) + bench.
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    val c = docs.filter($"doc_id" % 20 =!= 0)
    val b = docs.filter($"doc_id" % 20 === 0)
    def rels(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collect { case l: LogicalRelation => l }.size
    assert(rels(CurationOps.decontaminate(c, b, "doc_id", "text", n = 8,
      singlePass = true)) == 2)
    assert(rels(CurationOps.decontaminate(c, b, "doc_id", "text", n = 8)) == 4)
  }

  test("decontaminateBloom returns exactly decontaminate (pre-filter is exact)") {
    // hand case, including the gram-less short doc
    val kept = CurationOps.decontaminateBloom(corpus, bench, "doc_id", "text", n = 8)
    assert(kept.columns.toSeq == corpus.columns.toSeq)
    assert(kept.select($"doc_id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
    // testdata parity on the same id-split the c01 agreement test uses
    val c = docs.filter($"doc_id" % 10 =!= 0)
    val b = docs.filter($"doc_id" % 10 === 0)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id").as[Long].collect().sorted.toSeq
    assert(ids(CurationOps.decontaminateBloom(c, b, "doc_id", "text", n = 8))
      == ids(CurationOps.decontaminate(c, b, "doc_id", "text", n = 8)))
    // a benchmark with no grams at all cannot flag anything
    assert(CurationOps.decontaminateBloom(corpus,
      bench.filter(lit(false)), "doc_id", "text", n = 8).count() == corpus.count())
  }

  test("decontaminateBloom probes a MATERIALIZED gram attribute (no per-gram retokenization)") {
    // predicate pushdown used to substitute the tokenize+gram chain into the
    // probe filter, where the token array inside the n-gram lambda
    // re-evaluates per gram position — 41.6s vs 2.4s for the exact c01 at
    // sf1.0. The Materialize barrier pins the gram array to its Project; the
    // probe must reference that attribute, never an expression tree.
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    val c = docs.filter($"doc_id" % 20 =!= 0)
    val b = docs.filter($"doc_id" % 20 === 0)
    val res = CurationOps.decontaminateBloom(c, b, "doc_id", "text", n = 8)
    val probes = res.queryExecution.optimizedPlan.collect {
      case f: LFilter => f.condition.collect {
        case p: graft.functions.BloomBroadcastContainsAny => p }
    }.flatten
    assert(probes.nonEmpty, "expected a Bloom probe filter in the optimized plan")
    assert(probes.forall(_.values.isInstanceOf[AttributeReference]),
      s"probe must take a materialized attribute, got: ${probes.map(_.values)}")
  }

  test("bloom broadcast probe keeps the sketch out of the plan") {
    import org.apache.spark.util.sketch.BloomFilter
    def bloomBytes(n: Long): Array[Byte] = {
      val bf = BloomFilter.create(n, 0.03)
      bf.putLong(42L)
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos); bos.toByteArray
    }
    val small = bloomBytes(100L)
    val big = bloomBytes(10000000L) // multi-MB sketch
    assert(big.length > 1000000 && small.length < 10000)
    def planLens(bytes: Array[Byte]): (Int, Int) = {
      val bc = spark.sparkContext.broadcast(bytes)
      val df = Seq(Seq(42L), Seq(7L)).toDF("hs")
        .filter(graft.functions.BloomExprs.containsAnyBroadcast(bc, $"hs"))
      (df.queryExecution.optimizedPlan.toString.length,
        df.queryExecution.executedPlan.toString.length)
    }
    // a plan literal would embed the sketch; the broadcast handle must keep
    // both the optimized and the physical plan size-independent
    val (optS, exeS) = planLens(small)
    val (optB, exeB) = planLens(big)
    assert(math.abs(optB - optS) < 500, s"optimized plan grew: $optS -> $optB")
    assert(math.abs(exeB - exeS) < 500, s"executed plan grew: $exeS -> $exeB")
    // and the probe is live through codegen: 42 present, 7 absent, [] clean
    val bc = spark.sparkContext.broadcast(small)
    val got = Seq((1L, Seq(42L)), (2L, Seq(7L)), (3L, Seq.empty[Long]))
      .toDF("id", "hs")
      .filter(graft.functions.BloomExprs.containsAnyBroadcast(bc, $"hs"))
      .select($"id").as[Long].collect().toSeq
    assert(got == Seq(1L))
  }

  test("sampleTemperature: alpha=1 at full budget is the identity; lower alpha flattens") {
    // alpha=1, budgetFrac=1: rate_l = (p_l/Z) * tot / tokens_l = 1 for every
    // stratum (Z = Σ p_l = 1) — nothing is dropped
    val all = CurationOps.sampleTemperature(docs, "lang", "doc_id", "text",
      alpha = 1.0, budgetFrac = 1.0)
    assert(all.count() == docs.count())
    // determinism: the same rows are kept on every run
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id").as[Long].collect().sorted.toSeq
    val s1 = CurationOps.sampleTemperature(docs, "lang", "doc_id", "text", 0.5, 0.5)
    val s2 = CurationOps.sampleTemperature(docs, "lang", "doc_id", "text", 0.5, 0.5)
    assert(ids(s1) == ids(s2))
    // temperature flattening: at alpha=0.5 the SMALLEST language's keep-rate
    // must exceed the largest language's (low-resource upweighting)
    val natural = docs.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = s1.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val smallest = natural.minBy(_._2)._1
    val largest = natural.maxBy(_._2)._1
    val rSmall = kept.getOrElse(smallest, 0L).toDouble / natural(smallest)
    val rLarge = kept.getOrElse(largest, 0L).toDouble / natural(largest)
    assert(rSmall > rLarge,
      s"alpha<1 must upweight the low-resource stratum: $smallest=$rSmall vs $largest=$rLarge")
  }

  test("packSequences computes concat-then-chunk bins and offsets") {
    val df = Seq(
      ("s", 1L, "t t t t"), ("s", 2L, "t t t t t"),
      ("s", 3L, "t t t"), ("s", 4L, "t t t t t t"),
      ("u", 5L, "t t")) // second partition starts its own bins
      .toDF("source", "doc_id", "text")
    val got = CurationOps.packSequences(df, "text", "source", "doc_id", maxLen = 10)
      .select($"doc_id", $"n_tok", $"bin", $"start_off")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 4L, 0L, 0L), (2L, 5L, 0L, 4L), (3L, 3L, 0L, 9L),
      (4L, 6L, 1L, 2L), (5L, 2L, 0L, 0L)))
  }

  test("c02 query agrees with packSequences on the testdata") {
    val q = Curation.c02PackSequences(spark, dir)
      .select($"doc_id", $"bin", $"start_off")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val api = CurationOps.packSequences(docs, "text", "source", "doc_id", maxLen = 512)
      .select($"doc_id", $"bin", $"start_off")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(q.toSeq == api.toSeq)
  }

  test("chunkTokens: boundaries, overlap, ragged tail, and full coverage") {
    // 10 tokens, chunkLen 4, overlap 2 (stride 2): starts 0,2,4,6 —
    // start 8 is NOT emitted (10 - overlap = 8, and chunk@6 covers 6..9)
    val one = Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")).toDF("doc_id", "text")
    val got = CurationOps.chunkTokens(one, "doc_id", "text", chunkLen = 4, overlap = 2)
      .select($"chunk_idx", $"chunk_text", $"n_tok")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (0L, "t0 t1 t2 t3", 4L), (1L, "t2 t3 t4 t5", 4L),
      (2L, "t4 t5 t6 t7", 4L), (3L, "t6 t7 t8 t9", 4L)))
    // ragged tail: 9 tokens -> last chunk shorter
    val ragged = Seq((2L, "t0 t1 t2 t3 t4 t5 t6 t7 t8")).toDF("doc_id", "text")
    val tail = CurationOps.chunkTokens(ragged, "doc_id", "text", 4, 2)
      .orderBy($"chunk_idx").select($"chunk_text").as[String].collect().toSeq
    assert(tail == Seq("t0 t1 t2 t3", "t2 t3 t4 t5", "t4 t5 t6 t7", "t6 t7 t8"))
    // a doc shorter than one chunk emits exactly one chunk; empty emits none
    val shorty = Seq((3L, "a b"), (4L, "   ")).toDF("doc_id", "text")
    val sc = CurationOps.chunkTokens(shorty, "doc_id", "text", 4, 2)
      .select($"doc_id", $"chunk_text").as[(Long, String)].collect().toSeq
    assert(sc == Seq((3L, "a b")))
    // zero overlap reconstructs every document exactly on the testdata
    val rebuilt = CurationOps.chunkTokens(docs, "doc_id", "text", 32, 0)
      .groupBy($"doc_id")
      .agg(array_join(expr(
        "transform(array_sort(collect_list(struct(chunk_idx, chunk_text))), e -> e.chunk_text)"),
        " ").as("re"))
    val mismatch = docs
      .select($"doc_id", array_join(graft.ext.TextOps.toks($"text"), " ").as("norm"))
      .join(rebuilt, Seq("doc_id"))
      .filter($"re" =!= $"norm").count()
    assert(mismatch == 0, "stride == chunkLen must partition every document")
  }

  test("assignShards: deterministic dense positions, hash-balanced shards") {
    val a = CurationOps.assignShards(docs, "doc_id", shards = 8)
      .select($"doc_id", $"shard", $"pos").as[(Long, Long, Long)].collect()
    val b = CurationOps.assignShards(docs, "doc_id", shards = 8)
      .select($"doc_id", $"shard", $"pos").as[(Long, Long, Long)].collect()
    assert(a.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq, "must be reproducible")
    val n = docs.count()
    assert(a.length == n, "every row is assigned exactly once")
    // positions are dense 0..count-1 within each shard
    a.groupBy(_._2).foreach { case (shard, rows) =>
      val pos = rows.map(_._3).sorted.toSeq
      assert(pos == (0L until rows.length).toSeq, s"shard $shard positions: $pos")
    }
    // hash balance: no shard is pathologically loaded (≤ 3x the mean)
    val maxLoad = a.groupBy(_._2).values.map(_.length).max
    assert(maxLoad <= 3 * n / 8, s"worst shard holds $maxLoad of $n rows")
    // a different salt reshuffles membership
    val salted = CurationOps.assignShards(docs, "doc_id", 8, salt = "other")
      .select($"doc_id", $"shard").as[(Long, Long)].collect().toMap
    val same = a.count { case (id, s, _) => salted(id) == s }
    assert(same < n, "an independent salt must not reproduce the same layout")
  }

  test("sampleStratified: deterministic, rate-bounded, missing strata kept") {
    val df = docs.select($"doc_id", $"lang")
    val rates = Map("en" -> 0.5, "de" -> 0.0)
    def run() = CurationOps.sampleStratified(df, "lang", "doc_id", rates)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    val a = run()
    assert(a == run(), "hash-threshold sampling must be reproducible")
    val byLang = CurationOps.sampleStratified(df, "lang", "doc_id", rates)
      .groupBy($"lang").count().as[(String, Long)].collect().toMap
    val full = df.groupBy($"lang").count().as[(String, Long)].collect().toMap
    assert(!byLang.contains("de"), "rate 0.0 must drop the stratum entirely")
    assert(byLang("en") < full("en"), "rate 0.5 must actually downsample")
    // strata not named in the rate map default to keep-everything
    assert(Seq("es", "fr", "zh").forall(l => byLang(l) == full(l)))
    // rate 1.0 ≡ unnamed: every row's hash is under the 1e6 threshold
    assert(CurationOps.sampleStratified(df, "lang", "doc_id",
      Map("en" -> 1.0)).count() == df.count())
  }

  test("sampleBalanced keeps the smallest stratum in full and matches c03") {
    val got = CurationOps.sampleBalanced(docs, "lang", "doc_id")
      .select($"doc_id").as[Long].collect().sorted.toSeq
    val q = Curation.c03StratifiedSample(spark, dir)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(got == q)
    val full = docs.groupBy($"lang").count().as[(String, Long)].collect().toMap
    val smallest = full.minBy(_._2)._1
    val kept = CurationOps.sampleBalanced(docs, "lang", "doc_id")
      .groupBy($"lang").count().as[(String, Long)].collect().toMap
    assert(kept(smallest) == full(smallest),
      "threshold for the smallest stratum is exactly 1e6 — kept in full")
  }

  test("dsirWeights: hand-computed add-lambda unigram log-likelihood ratios") {
    // corpus: doc 1 "a b" (target), doc 2 "a c" (raw). freq: a ca=2 ct=1;
    // b ca=1 ct=1; c ca=1 ct=0. totals ta=4 tt=2 v=3; lambda=0.5.
    val d = Seq((1L, "a b", "en"), (2L, "a c", "de")).toDF("doc_id", "text", "lang")
    def lr(ct: Double, ca: Double) =
      math.log((ct + 0.5) / (2.0 + 0.5 * 3)) - math.log((ca + 0.5) / (4.0 + 0.5 * 3))
    def r4(x: Double) = math.round((x + 1e-9) * 1e4) / 1e4
    val exp1 = r4((lr(1, 2) + lr(1, 1)) / 2) // tokens a, b
    val exp2 = r4((lr(1, 2) + lr(0, 1)) / 2) // tokens a, c
    val got = CurationOps.dsirWeights(d, "doc_id", "text", col("lang") === "en")
      .as[(Long, Long, Double, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 2L, exp1, 1L), (2L, 2L, exp2, 0L)), s"got $got")
    assert(exp1 > 0 && exp2 < 0, "target-slice doc scores positive, raw negative")
  }

  test("coresetSample: per-cluster nearest-m, distance then id tie-break") {
    val df = Seq((1L, 0L, 0.5), (2L, 0L, 0.1), (3L, 0L, 0.1), (4L, 0L, 0.9),
      (5L, 1L, 0.2)).toDF("id", "cluster", "d")
    val got = CurationOps.coresetSample(df, "id", "cluster", "d", 2)
      .select($"id", $"coreset_rank").as[(Long, Long)].collect().toMap
    // cluster 0 keeps its two nearest (tie at 0.1 broken by id), cluster 1
    // keeps its only member; 4 (farthest) is dropped
    assert(got == Map(2L -> 1L, 3L -> 2L, 5L -> 1L))
  }

  test("softDedupWeights: 1/cluster-size, unpaired rows weigh 1.0, mass = #groups") {
    val d = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b")
    val got = CurationOps.softDedupWeights(d, "id", pairs, "a", "b")
      .select($"id", $"dup_group", $"group_size", $"weight")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 1L, 3L, 1.0 / 3), (2L, 1L, 3L, 1.0 / 3), (3L, 1L, 3L, 1.0 / 3),
      (4L, 4L, 1L, 1.0), (5L, 5L, 2L, 0.5), (6L, 5L, 2L, 0.5)))
    // each cluster contributes exactly one document of expected mass
    assert(math.abs(got.map(_._4).sum - 3.0) < 1e-12)
  }

  test("splitLeakageSafe: paired docs share a split, total coverage, deterministic") {
    import graft.ext.DedupOps
    val d = docs
    val pairs = DedupOps.simhashPairs(d, "doc_id", "text",
      bands = 2, bitsPerBand = 15, maxHamming = 1)
    val out = CurationOps.splitLeakageSafe(d, "doc_id", pairs, "id_a", "id_b")
    // every document exactly once, every row assigned
    assert(out.count() == d.count())
    assert(out.filter($"split".isNull || $"split_group".isNull).count() == 0)
    // the leakage contract: both endpoints of every near-dup pair carry the
    // same group AND the same split
    val sp = out.select($"doc_id", $"split_group", $"split")
    val leak = pairs
      .join(sp.select($"doc_id".as("id_a"), $"split_group".as("ga"), $"split".as("sa")), "id_a")
      .join(sp.select($"doc_id".as("id_b"), $"split_group".as("gb"), $"split".as("sb")), "id_b")
      .filter($"sa" =!= $"sb" || $"ga" =!= $"gb").count()
    assert(leak == 0, "a near-dup pair straddled the split boundary")
    // all three splits materialize at 90/5/5 over ~500 groups
    assert(out.select($"split").distinct().as[String].collect().toSet ==
      Set("train", "val", "test"))
    // hash-derived, so a second run is identical
    val again = CurationOps.splitLeakageSafe(d, "doc_id", pairs, "id_a", "id_b")
      .select($"doc_id", $"split_group", $"split")
    assert(sp.except(again).isEmpty && again.except(sp).isEmpty)
    // fractions must sum to 100
    intercept[IllegalArgumentException] {
      CurationOps.splitLeakageSafe(d, "doc_id", pairs, "id_a", "id_b",
        fractions = Seq("train" -> 50))
    }
  }

  test("perplexityBuckets: tercile assignment is tie-safe and integer-exact") {
    val even = (1L to 9L).map(i => (i, ((i - 1) / 3 + 1).toDouble))
      .toDF("doc_id", "ppl") // scores 1,1,1,2,2,2,3,3,3 -> clean terciles
    val gotEven = CurationOps.perplexityBuckets(even, "doc_id", "ppl")
      .select($"doc_id", $"bucket").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(gotEven == Seq(1L -> "head", 2L -> "head", 3L -> "head",
      4L -> "middle", 5L -> "middle", 6L -> "middle",
      7L -> "tail", 8L -> "tail", 9L -> "tail"), s"got $gotEven")
    // a 4-doc tie at the lowest score exceeds a third: the WHOLE group moves
    // to middle together — equal scores never straddle a boundary
    val tied = Seq((1L, 1.0), (2L, 1.0), (3L, 1.0), (4L, 1.0), (5L, 5.0), (6L, 9.0))
      .toDF("doc_id", "ppl")
    val gotTied = CurationOps.perplexityBuckets(tied, "doc_id", "ppl")
      .select($"doc_id", $"bucket").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(gotTied == Seq(1L -> "middle", 2L -> "middle", 3L -> "middle",
      4L -> "middle", 5L -> "tail", 6L -> "tail"), s"got $gotTied")
  }

  test("perplexityBuckets memo: identical re-calls reuse; a different input never serves stale") {
    // the one-entry persisted-base memo (round-15: a plain unpersist-per-
    // call re-paid the upstream scoring every bench sweep; a STRING plan
    // key collided two same-schema LocalRelations). Alternate two inputs
    // that share a schema and re-call each — every answer must match its
    // own input, and repeated identical calls stay stable.
    val a = (1L to 9L).map(i => (i, ((i - 1) / 3 + 1).toDouble))
      .toDF("doc_id", "ppl")
    val b = Seq((1L, 1.0), (2L, 1.0), (3L, 1.0), (4L, 1.0), (5L, 5.0), (6L, 9.0))
      .toDF("doc_id", "ppl")
    def run(df: org.apache.spark.sql.DataFrame) =
      CurationOps.perplexityBuckets(df, "doc_id", "ppl")
        .select($"doc_id", $"bucket").as[(Long, String)].collect()
        .sortBy(_._1).toSeq
    val a1 = run(a); val b1 = run(b); val a2 = run(a); val b2 = run(b)
    assert(a1 == a2 && b1 == b2, "identical re-calls must be stable")
    assert(a1.size == 9 && b1.size == 6,
      s"each answer must match its own input: ${a1.size}/${b1.size}")
    assert(b1 == Seq(1L -> "middle", 2L -> "middle", 3L -> "middle",
      4L -> "middle", 5L -> "tail", 6L -> "tail"), s"stale memo? $b1")
  }

  test("c01 query agrees with contaminationCounts on the id-split testdata") {
    val c = docs.filter($"doc_id" % 20 =!= 0)
    val b = docs.filter($"doc_id" % 20 === 0)
    val api = CurationOps.contaminationCounts(c, b, "doc_id", "text", Curation.ContamN)
      .as[(Long, Long)].collect().sortBy(_._1)
    val q = Curation.c01Decontaminate(spark, dir)
      .select($"doc_id", $"n_bad").as[(Long, Long)].collect().sortBy(_._1)
    assert(api.toSeq == q.toSeq)
  }

  test("sampleTokenBudget keeps exactly the minimal hash-order prefix reaching the budget") {
    import graft.ext.TextOps.h60Local
    val corpus = Seq((1L, "a b c"), (2L, "d e"), (3L, "f g h i"),
      (4L, "j"), (5L, "k l m"), (6L, ""), (7L, "n o p q r"))
      .toDF("doc_id", "text")
    val nTok = Map(1L -> 3L, 2L -> 2L, 3L -> 4L, 4L -> 1L, 5L -> 3L,
      6L -> 0L, 7L -> 5L)
    val total = nTok.values.sum // 18
    val budget = total * 1 / 2  // 9
    // reference model: hash order, exclusive running sum < budget
    val order = nTok.keys.toSeq.sortBy(id => (h60Local("budget" + id), id))
    val expected = order.zip(order.scanLeft(0L)((s, id) => s + nTok(id)))
      .collect { case (id, cumBefore) if cumBefore < budget => id }.toSet
    val got = CurationOps.sampleTokenBudget(corpus, "doc_id", "text", 1L, 2L)
      .as[(Long, Long)].collect().toMap
    assert(got.keySet == expected, s"got ${got.keySet}, expected $expected")
    assert(got.forall { case (id, n) => nTok(id) == n })
    // minimality: kept tokens reach the budget, dropping the LAST kept doc
    // (in hash order) falls under it
    val keptSum = expected.toSeq.map(nTok).sum
    assert(keptSum >= budget)
    val lastKept = order.filter(expected).last
    assert(keptSum - nTok(lastKept) < budget)
    // numer = 0 keeps nothing
    assert(CurationOps.sampleTokenBudget(corpus, "doc_id", "text", 0L, 1L)
      .count() == 0)
    // full fraction: every doc with exclusive cumsum < T (a zero-token doc
    // sorting exactly last would be the one legitimate exclusion)
    val keepAll = order.zip(order.scanLeft(0L)((s, id) => s + nTok(id)))
      .count { case (_, cumBefore) => cumBefore < total }
    assert(CurationOps.sampleTokenBudget(corpus, "doc_id", "text", 1L, 1L)
      .count() == keepAll)
  }

  test("sampleTokenBudgetByCount: a token budget denominated in BPE subword counts") {
    import graft.ext.TextOps.h60Local
    // train merges on a corpus, segment it, budget-sample on n_subwords —
    // the t27 loop feeding c13 (the budget counts what the model will see)
    val corpus = Seq((1L, "low low lower"), (2L, "newest widest newest"),
      (3L, "low widest"), (4L, "newest newest lowest"))
      .toDF("doc_id", "text")
    import graft.ext.TextAnalysis
    val merges = TextAnalysis.bpeTrain(corpus, "text", nMerges = 4)
      .orderBy($"rank").select($"left", $"right")
      .as[(String, String)].collect().toSeq
    val seg = TextAnalysis.bpeSegment(corpus, "doc_id", "text", merges)
    val nSub = seg.select($"doc_id", $"n_subwords").as[(Long, Long)]
      .collect().toMap
    val total = nSub.values.sum
    val budget = total * 1 / 2
    val order = nSub.keys.toSeq.sortBy(id => (h60Local("budget" + id), id))
    val expected = order.zip(order.scanLeft(0L)((s, id) => s + nSub(id)))
      .collect { case (id, cumBefore) if cumBefore < budget => id }.toSet
    val got = CurationOps.sampleTokenBudgetByCount(seg, "doc_id", "n_subwords",
      1L, 2L).select($"doc_id", $"n_tok").as[(Long, Long)].collect().toMap
    assert(got.keySet == expected, s"got ${got.keySet}, expected $expected")
    // the reported n_tok IS the subword count, not whitespace tokens
    assert(got.forall { case (id, n) => nSub(id) == n })
    // and the textCol form is exactly the byCount form over whitespace counts
    val viaText = CurationOps.sampleTokenBudget(corpus, "doc_id", "text", 1L, 2L)
      .as[(Long, Long)].collect().toMap
    val viaCount = CurationOps.sampleTokenBudgetByCount(
      corpus.withColumn("nt", size(split(trim($"text"), "\\s+"))
        .cast("long")).filter($"nt".isNotNull),
      "doc_id", "nt", 1L, 2L).select($"doc_id", $"n_tok")
      .as[(Long, Long)].collect().toMap
    assert(viaText == viaCount)
  }

  test("mixturePlan: epochs + fractional remainder by hand; unweighted plans to zero") {
    // a: 10 tokens, weight 0.5 of budget 100 -> target 50 = 5 full epochs
    // b: 20 tokens, weight 0.25 -> target 25 = 1 epoch + 5/20 = 0.25 rate
    // c: 10 tokens, no weight -> target 0, epochs 0, rate 0.0
    val df = Seq(
      (1L, "a", Seq.fill(10)("w").mkString(" ")),
      (2L, "b", Seq.fill(20)("w").mkString(" ")),
      (3L, "c", Seq.fill(10)("w").mkString(" "))).toDF("doc_id", "source", "text")
    val got = CurationOps.mixturePlan(df, "source", "text",
      Map("a" -> 0.5, "b" -> 0.25), budgetTokens = 100L)
      .as[(String, Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      ("a", 10L, 50L, 5L, 0.0),
      ("b", 20L, 25L, 1L, 0.25),
      ("c", 10L, 0L, 0L, 0.0)), s"got $got")
  }

  test("sampleWeighted: Efraimidis-Spirakis order statistic, hand-replayed; mass follows weight") {
    import graft.ext.{CurationOps, TextOps}
    // ids 0..19 with weight 1.0 (unique docs), ids 100..119 with weight
    // 0.05 (a 20-member near-dup cluster under softDedupWeights' 1/|c|)
    val rows = (0L until 20L).map(i => (i, 1.0)) ++
      (100L until 120L).map(i => (i, 0.05))
    val df = rows.toDF("id", "w")
    def key(id: Long, w: Double): Double = {
      val u = ((TextOps.h60Local(s"ws:$id") % 1048576L) + 1L).toDouble / 1048576.0
      BigDecimal(math.pow(u, 1.0 / w) + 1e-9)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = rows.sortBy { case (id, w) => (-key(id, w), id) }
      .take(12).map(_._1)
    val got = CurationOps.sampleWeighted(df, "id", "w", n = 12)
      .orderBy($"sample_rank").select($"id").as[Long].collect().toSeq
    assert(got == expected, s"selection must replay the E-S key exactly:\n$got\nvs\n$expected")
    // mass-proportionality: the 20x-downweighted cluster contributes ~1
    // doc in expectation to a 12-of-40 draw — far fewer than its 6-member
    // uniform share. Deterministic given the fixed hash, and robust: a
    // w=0.05 key is u^20, astronomically unlikely to crack a top-12 of
    // u^1 keys.
    val heavy = got.count(_ >= 100L)
    assert(heavy <= 2, s"downweighted cluster must be rare in the sample: $got")
  }

  test("sampleWeighted enforces the weight > 0 contract at runtime (ADVICE r16 #1)") {
    import graft.ext.CurationOps
    for (bad <- Seq(0.0, -1.5)) {
      val df = Seq((1L, 1.0), (2L, bad)).toDF("id", "w")
      val ex = intercept[Exception] {
        CurationOps.sampleWeighted(df, "id", "w", n = 1).collect()
      }
      // raise_error surfaces wrapped in Spark's execution exception chain
      val msgs = Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString(" | ")
      assert(msgs.contains("weight must be > 0"), msgs)
    }
    // null weight fails too
    val dfn = Seq((1L, Some(1.0)), (2L, None)).toDF("id", "w")
    val exn = intercept[Exception] {
      CurationOps.sampleWeighted(dfn, "id", "w", n = 1).collect()
    }
    val msgsN = Iterator.iterate(exn: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    assert(msgsN.contains("weight must be > 0"), msgsN)
  }
}
