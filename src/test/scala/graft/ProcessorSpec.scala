package graft

import graft.functions.Aggregators
import graft.streaming.Pipeline
import org.apache.spark.sql.functions._

/** Specs for the config-declared processors (SURVEY §2.2 P4 / §2.3 F3 /
  * metricbeat top-N) and the typed Aggregator UDAF surface (§2.8). */
class ProcessorSpec extends SparkSpec {
  import spark.implicits._

  private def events = Seq(
    ("web-1", "/proc/stat", 10.0), ("web-1", "/home/app", 25.0),
    ("web-2", "/sys/fs", 5.0), ("web-2", "/var/log", 40.0),
    ("web-2", "/data", 30.0), ("web-3", "/dev/null", 1.0)
  ).toDF("host", "mount_point", "used_pct")

  test("F3 drop-by-regex mirrors the metricbeat mount filter") {
    // example/metricbeat/metricbeat.yml:44-46 pattern, abbreviated
    val kept = Pipeline.dropWhereMatches(events, "mount_point",
      "^/(sys|proc|dev)($|/)").select($"mount_point").as[String].collect().sorted
    assert(kept.toSeq == Seq("/data", "/home/app", "/var/log"))
  }

  test("P4 enrichment adds a constant-folded cloud struct") {
    val out = Pipeline.enrich(events, "aws", "i-0abc")
    val r = out.select($"cloud.provider", $"cloud.instance_id").distinct().collect()
    assert(r.length == 1 && r.head.getString(0) == "aws" && r.head.getString(1) == "i-0abc")
    // constant-folded: no per-row expression beyond the literal struct
    val plan = out.queryExecution.optimizedPlan.toString
    assert(!plan.contains("named_struct") || plan.contains("aws"),
      s"expected folded literal in plan:\n$plan")
  }

  test("top-N per group keeps the n largest rows by the metric") {
    val top = Pipeline.topNPerGroup(events, $"host", $"used_pct", 1)
      .select($"host", $"mount_point").as[(String, String)].collect().toMap
    assert(top == Map("web-1" -> "/home/app", "web-2" -> "/var/log", "web-3" -> "/dev/null"))
  }

  test("typed Aggregator: geometric mean with partial merge across partitions") {
    val ds = spark.range(1, 101).select($"id".cast("double").as("v"))
      .repartition(8).as[Double]
    val gm = ds.select(Aggregators.GeoMean.toColumn).head()
    val expected = math.exp((1 to 100).map(x => math.log(x.toDouble)).sum / 100)
    assert(math.abs(gm - expected) < 1e-9)
  }

  test("TopKAgg equals the window rank and partial-aggregates map-side") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{row_number, struct}
    // deterministic scored rows with score ties (id tie-break must match the
    // window's orderBy(score desc, id asc))
    val df = spark.range(0, 1000).repartition(8)
      .select(($"id" % 7).cast("long").as("grp"), $"id".as("rid"),
        (($"id" * 37 % 100) / 10).cast("double").as("score"))
    val topk = udaf(new Aggregators.TopKAgg(5),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaDouble, org.apache.spark.sql.Encoders.scalaLong))
    val viaAgg = df.groupBy($"grp").agg(topk($"score", $"rid").as("top"))
      .select($"grp", explode($"top").as("t"))
      .select($"grp", $"t._1".as("rid"), $"t._2".as("score"))
    val w = Window.partitionBy($"grp").orderBy($"score".desc, $"rid")
    val viaWindow = df.withColumn("rk", row_number().over(w)).filter($"rk" <= 5)
      .select($"grp", $"rid", $"score")
    assert(viaAgg.as[(Long, Long, Double)].collect().toSet ==
      viaWindow.as[(Long, Long, Double)].collect().toSet)
    // the scale property: partial (map-side) aggregation before the shuffle
    val plan = viaAgg.queryExecution.executedPlan.toString
    assert(plan.contains("partial_topkagg") ||
      plan.toLowerCase.contains("partial"), s"expected map-side combine:\n$plan")
  }

  test("typed Aggregator: registered for SQL via udaf()") {
    spark.udf.register("geo_mean", udaf(Aggregators.GeoMean))
    spark.udf.register("spread", udaf(Aggregators.SpreadAgg))
    val row = spark.sql(
      "SELECT geo_mean(v) AS g, spread(v) AS s FROM (SELECT CAST(id AS DOUBLE) v FROM range(1, 5))")
      .head()
    assert(math.abs(row.getAs[Double]("g") - math.pow(24.0, 0.25)) < 1e-9)
    assert(row.getAs[Double]("s") == 3.0)
  }
}
