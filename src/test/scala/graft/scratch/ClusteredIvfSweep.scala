package graft.scratch

import graft.{GraftSession, Tables}
import graft.ext.{DedupOps, LshTuning, Similarity}
import org.apache.spark.sql.functions._

/** One-off measurement harness (round-20, round-19 verdict #1): the IVF
  * probe calibration and the s38-shape serving cost on a CLUSTERED
  * embedding corpus — the witness corpus' mid-cosine (~0.35, nearly
  * uniform directions) neighbors separate WEAKLY into inverted lists
  * (measured β floor 1.6, probe fraction ~0.88 at the 0.95 target), so
  * the round-19 list-table sort bought no pruning there. A production
  * embedding space is clustered; this harness measures what the
  * calibrated model and the round-20 list-id pushdown buy on such data.
  *
  * The corpus is deterministic (id-seeded): `modes` Gaussian modes with
  * unit-norm centers and σ = 0.05 noise; queries (vec_id < 20) sit in 4
  * modes — a realistic query batch clusters, and the probed-list UNION
  * across the batch must be a strict subset of nlist for row-group
  * pruning to exist at all. Ids ≥ 20 cycle through every mode so the
  * deterministic kmeansFit training slice (vec_id < max(256, nlist))
  * sees all of them.
  *
  * Run:
  *   sbt "Test/runMain graft.scratch.ClusteredIvfSweep 5000 16"
  *   sbt "Test/runMain graft.scratch.ClusteredIvfSweep 500000 128"
  */
object ClusteredIvfSweep {

  /** Deterministic clustered embeddings table at `<path>/embeddings.parquet`
    * (vec_id, embedding float[dim]). Pure function of (n, modes, dim,
    * sigma) — per-id seeded RNG, no ambient randomness. */
  def gen(spark: org.apache.spark.sql.SparkSession, path: String, n: Long,
      modes: Int, dim: Int = 64, sigma: Double = 0.05): Unit = {
    import spark.implicits._
    val out = s"$path/embeddings.parquet"
    if (new java.io.File(out, "_SUCCESS").isFile) return
    val centers: Array[Array[Double]] = Array.tabulate(modes) { m =>
      val r = new java.util.Random(0xC1D5EEDL + m)
      val c = Array.fill(dim)(r.nextGaussian())
      val nrm = math.sqrt(c.map(x => x * x).sum)
      c.map(_ / nrm)
    }
    val bc = spark.sparkContext.broadcast(centers)
    spark.range(n).as[Long].mapPartitions { it =>
      val cs = bc.value
      it.map { id =>
        val mode = if (id < 20) (id % 4).toInt else (id % cs.length).toInt
        val r = new java.util.Random(id * 0x9E3779B97F4A7C15L ^ 0x5EEDL)
        val v = Array.tabulate(cs(mode).length)(i =>
          (cs(mode)(i) + sigma * r.nextGaussian()).toFloat)
        (id, v, mode)
      }
    }.toDF("vec_id", "embedding", "label")
      .withColumn("label", col("label").cast("int"))
      .repartition(8).write.mode("overwrite").parquet(out)
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(5000L)
    val modes = args.lift(1).map(_.toInt).getOrElse(16)
    val sigma = args.lift(2).map(_.toDouble).getOrElse(0.05)
    val spark = GraftSession.get()
    import spark.implicits._
    val dir = f"target/clustered_n${n}_m${modes}_s$sigma%.2f"
    gen(spark, dir, n, modes, sigma = sigma)
    val nlist = DedupOps.semanticDedupNlist(
      Tables.cachedCount(spark, dir, "embeddings"))
    val cents = Similarity.ivfLegModel(spark, dir, nlist)
    val e = Tables.loadSpread(spark, dir, "embeddings")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
      .withColumn("nrm", graft.functions.VectorExprs.l2($"v"))
      .localCheckpoint(true)
    val asg = Similarity.kmeansAssign(
        e.select($"vec_id", transform($"v", x => x / $"nrm").as("__u")),
        "vec_id", "__u", cents)
      .select($"vec_id", $"cluster").localCheckpoint(true)
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy($"qid").orderBy($"cos6".desc, $"vec_id")
    val truth10 = broadcast(
        e.filter($"vec_id" < 20)
          .select($"vec_id".as("qid"), $"v".as("qv"), $"nrm".as("qn")))
      .join(e, $"qid" =!= $"vec_id")
      .withColumn("cos6", round(
        graft.functions.VectorExprs.dot($"qv", $"v") / ($"qn" * $"nrm"), 6))
      .withColumn("rk", row_number().over(win).cast("long"))
      .filter($"rk" <= 10).select($"qid", $"vec_id")
      .join(asg, Seq("vec_id")).localCheckpoint(true)
    val qu = e.filter($"vec_id" < 20)
      .select($"vec_id".as("qid"), transform($"v", x => x / $"nrm").as("__u"))
    val ranked = qu
      .select($"qid", posexplode_outer(
        Similarity.centroidProbeArray(cents, $"__u")).as(Seq("pr", "p")))
      .filter($"p".isNotNull)
      .select($"qid", ($"pr" + 1).as("prank"), $"p.c".cast("long").as("cluster"))
      .localCheckpoint(true)
    println(s"== clustered dir=$dir n=$n modes=$modes nlist=$nlist")
    val tTotal = truth10.count().toDouble
    var floorBeta = Double.PositiveInfinity
    val depths = (1 to math.min(8, nlist)) ++
      Seq(nlist / 4, nlist / 2, nlist).filter(_ >= 1).distinct
    for (np <- depths.distinct.sorted if np >= 1) {
      val probes = ranked.filter($"prank" <= np)
      val capture = truth10.join(probes, Seq("qid", "cluster"), "left_semi")
        .count().toDouble / tTotal
      val frac = np.toDouble / nlist
      val beta =
        if (capture >= 1.0) Double.PositiveInfinity
        else math.log(1.0 - capture) / math.log(1.0 - frac)
      if (beta < floorBeta && capture < 1.0) floorBeta = beta
      println(f"nprobe=$np%4d frac=$frac%.4f capture@10=$capture%.4f impliedBeta=$beta%.2f")
    }
    val measured = if (floorBeta.isInfinity) 64.0 else math.floor(floorBeta * 10) / 10
    println(f"measured beta floor (min finite implied, floored to 0.1): $measured%.1f")
    // probed-list union of the query batch at the measured floor's nprobe
    val npM = LshTuning.ivfNprobe(Similarity.S02FusionTargetRecall, nlist, measured)
    val unionCids = ranked.filter($"prank" <= npM)
      .select($"cluster").distinct().count()
    println(f"at target ${Similarity.S02FusionTargetRecall}%.2f: " +
      f"default nprobe=${LshTuning.ivfNprobe(Similarity.S02FusionTargetRecall, nlist)} " +
      f"vs measured-floor nprobe=$npM (probed-union $unionCids of $nlist lists)")
    // s38-shape serving cost: the ivf leg ranked end-to-end, default floor
    // (deep probe, pruning self-disabled when the union covers nlist) vs
    // the measured per-corpus floor via spark.graft.ivf.beta (shallow
    // probe + list-id pushdown on the sorted store)
    Similarity.ivfLegTable(spark, dir).head() // untimed store build
    def timeLeg(tag: String): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        Similarity.ivfRankingTop(spark, dir, k = 10)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"ivfRankingTop[$tag] min=${ts.min}%.3f s (reps ${ts.map(t => f"$t%.3f").mkString(",")})")
    }
    timeLeg("default beta 1.6")
    spark.conf.set("spark.graft.ivf.beta", measured.toString)
    try timeLeg(f"measured beta $measured%.1f")
    finally spark.conf.unset("spark.graft.ivf.beta")
    // capture at the measured-floor nprobe (the honesty check: the model
    // must under-promise on the corpus it was floored on)
    val capM = truth10.join(ranked.filter($"prank" <= npM),
      Seq("qid", "cluster"), "left_semi").count().toDouble / tTotal
    println(f"capture@10 at measured-floor nprobe=$npM: $capM%.4f " +
      f"(target ${Similarity.S02FusionTargetRecall}%.2f)")
  }
}
