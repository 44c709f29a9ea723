package graft.analytics

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The engine's relational analytics surface (SURVEY.md §2.8).
  *
  * The reference pipeline ships events toward Athena (s12v/awsbeats
  * streams/client.go:140-144 documents Kinesis→Firehose→S3→Athena as the
  * destination), so the analytics layer is a first-class part of the engine:
  * aggregations, joins (broadcast/semi/anti/range/as-of), window functions,
  * set ops, rollup/cube, scalar/date/JSON functions.
  *
  * Design rules (scale + oracle):
  *   - declarative DataFrame API only — Catalyst handles pushdown, pruning,
  *     join selection, partial aggregation; AQE re-plans at runtime;
  *   - dimension tables joined via `broadcast()` so the 100 TB fact side
  *     never shuffles for a kB-sized dimension;
  *   - output columns are only BIGINT / DOUBLE / STRING / DATE, floats are
  *     rounded, and every query carries a deterministic total ORDER BY so the
  *     DuckDB oracle compare is stable.
  */
object Queries {
  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------------------------------------------------------------- q01
  /** Pricing summary: grouped aggregation with partial (map-side) combine.
    * Scale note: groupBy on low-cardinality keys -> tiny shuffle after
    * partial aggregation; the filter is pushed into the parquet scan.
    *
    * Determinism note: the scale-4 AVERAGES are integer-cent-staged —
    * `sum(round(x·100)::long) / 100.0 / n` — because the source columns are
    * fixed 2-decimal data, so the long sum is EXACT and order-independent
    * where `avg(double)` reassociates by task-completion order (the c10
    * round-9 flake shape; a boundary-straddling mean here would redden the
    * same way). The round-2 SUMS stay float: their true values are exact
    * multiples of 0.01, a 0.005 half-boundary margin that float noise
    * cannot cross at oracle scale. */
  val q01PricingSummary: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_shipdate" < lit("1998-01-01").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_base_price"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("sum_disc_price"),
        round(sum(round($"l_quantity" * 100).cast("long")) / lit(100.0)
          / count(lit(1)) + 1e-9, 4).as("avg_qty"),
        round(sum(round($"l_discount" * 100).cast("long")) / lit(100.0)
          / count(lit(1)) + 1e-9, 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  // ---------------------------------------------------------------- q02
  /** Multi-way join with broadcast dimensions: fact (lineitem, orders) joined
    * to customer/nation/region. nation+region are broadcast — no shuffle of
    * the fact side for them at any scale. */
  val q02RevenueByNation: Q = (s, dir) => {
    import s.implicits._
    val li = t(s, dir, "lineitem")
    val o  = t(s, dir, "orders")
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
              $"o_orderdate" <  lit("1998-01-01").cast("timestamp"))
    val c  = t(s, dir, "customer")
    val n  = t(s, dir, "nation")
    val r  = t(s, dir, "region")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy($"r_name", $"n_name")
      .agg(
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"r_name", $"n_name")
  }

  // ---------------------------------------------------------------- q03
  /** Top-k by aggregate: Catalyst plans TakeOrderedAndProject — only k rows
    * cross the final exchange, not the whole aggregate. */
  val q03TopOrders: Q = (s, dir) => {
    import s.implicits._
    val li = t(s, dir, "lineitem").filter($"l_shipdate" > lit("1997-01-01").cast("timestamp"))
    val o  = t(s, dir, "orders").filter($"o_orderdate" < lit("1997-01-01").cast("timestamp"))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy($"l_orderkey")
      .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"))
      .select($"l_orderkey".cast("long").as("o_key"), $"revenue")
      .orderBy($"revenue".desc, $"o_key")
      .limit(10)
  }

  // ---------------------------------------------------------------- q04
  /** Window ranking: top-3 parts per brand (reference analogue: metricbeat
    * `process.include_top_n by_cpu: 5`, example/metricbeat/metricbeat.yml:36-38). */
  val q04WindowTopN: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"p_brand").orderBy($"p_retailprice".desc, $"p_partkey")
    t(s, dir, "part")
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= 3)
      .select($"p_brand", $"p_partkey".cast("long").as("p_key"),
        round($"p_retailprice", 2).as("price"), $"rn")
      .orderBy($"p_brand", $"rn")
  }

  // ---------------------------------------------------------------- q05
  /** Window frame: running total per customer (rowsBetween unbounded..current). */
  val q05RunningTotal: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders")
      .withColumn("running", round(sum($"o_totalprice").over(w), 2))
      .select($"o_custkey".cast("long").as("cust"), $"o_orderkey".cast("long").as("okey"), $"running")
      .orderBy($"cust", $"okey")
  }

  // ---------------------------------------------------------------- q06
  /** Left-semi join (EXISTS): customers that placed at least one high-value order. */
  val q06SemiJoin: Q = (s, dir) => {
    import s.implicits._
    val big = t(s, dir, "orders").filter($"o_totalprice" > 50000.0)
    t(s, dir, "customer")
      .join(big, $"c_custkey" === big("o_custkey"), "left_semi")
      .select($"c_custkey".cast("long").as("cust"), $"c_name", $"c_mktsegment")
      .orderBy($"cust")
  }

  // ---------------------------------------------------------------- q07
  /** Left-anti join (NOT EXISTS): customers with no order on/after
    * 1999-01-01 — i.e. recently-inactive customers. Anti-joining against a
    * date-filtered order SUBSET (not all orders) keeps the result non-empty
    * at every SF (every customer has ≥1 order in the driver's testdata, so
    * the unfiltered form passes vacuously with 0 = 0 rows), and the filter
    * pushes down to the orders scan before the join. */
  val q07AntiJoin: Q = (s, dir) => {
    import s.implicits._
    val recent = t(s, dir, "orders")
      .filter($"o_orderdate" >= lit("1999-01-01").cast("timestamp"))
    t(s, dir, "customer")
      .join(recent, $"c_custkey" === recent("o_custkey"), "left_anti")
      .select($"c_custkey".cast("long").as("cust"), $"c_name")
      .orderBy($"cust")
  }

  // ---------------------------------------------------------------- q08
  /** Set operations: union / intersect / except over nation-key domains. */
  val q08SetOps: Q = (s, dir) => {
    import s.implicits._
    val cn = t(s, dir, "customer").select($"c_nationkey".cast("long").as("k")).distinct()
    val sn = t(s, dir, "supplier").select($"s_nationkey".cast("long").as("k")).distinct()
    val u = cn.union(sn).distinct().withColumn("op", lit("union"))
    val i = cn.intersect(sn).withColumn("op", lit("intersect"))
    val e = cn.except(sn).withColumn("op", lit("except"))
    u.unionByName(i).unionByName(e).select($"op", $"k").orderBy($"op", $"k")
  }

  // ---------------------------------------------------------------- q09
  /** Distinct aggregation: exact count-distinct per group (expand-based plan). */
  val q09DistinctAgg: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        countDistinct($"l_suppkey").as("n_supp"),
        countDistinct($"l_partkey").as("n_part"),
        count(lit(1)).as("n_rows"))
      .orderBy($"l_returnflag")
  }

  // ---------------------------------------------------------------- q10
  /** Rollup: hierarchical subtotals (flag, status) -> (flag) -> (). */
  val q10Rollup: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "lineitem")
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(round(sum($"l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce($"l_returnflag", lit("ALL")).as("flag"),
        coalesce($"l_linestatus", lit("ALL")).as("status"),
        $"sum_qty", $"n")
      .orderBy($"flag", $"status")
  }

  // ---------------------------------------------------------------- q11
  /** Cube: all grouping-set combinations of (status, priority). */
  val q11Cube: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "orders")
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(round(sum($"o_totalprice"), 2).as("total"), count(lit(1)).as("n"))
      .select(
        coalesce($"o_orderstatus", lit("ALL")).as("status"),
        coalesce($"o_orderpriority", lit("ALL")).as("priority"),
        $"total", $"n")
      .orderBy($"status", $"priority")
  }

  // ---------------------------------------------------------------- q12
  /** Scalar string/math functions — all codegen'd builtins, no UDFs. */
  val q12ScalarFuncs: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "part")
      .select(
        $"p_partkey".cast("long").as("p_key"),
        upper($"p_brand").as("brand_u"),
        substring($"p_name", 1, 12).as("name12"),
        length($"p_name").cast("long").as("name_len"),
        concat_ws("|", $"p_brand", $"p_type").as("brand_type"),
        round(abs($"p_retailprice" - 1000.0), 2).as("absdiff"),
        ($"p_size" % 7).cast("long").as("size_mod7"))
      .orderBy($"p_key")
  }

  // ---------------------------------------------------------------- q13
  /** Date/time functions over orders. */
  val q13DateFuncs: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "orders")
      .select(
        $"o_orderkey".cast("long").as("okey"),
        year($"o_orderdate").cast("long").as("yr"),
        month($"o_orderdate").cast("long").as("mo"),
        dayofmonth($"o_orderdate").cast("long").as("dom"),
        quarter($"o_orderdate").cast("long").as("qtr"),
        date_format(date_trunc("month", $"o_orderdate"), "yyyy-MM-dd").as("month_start"),
        datediff($"o_orderdate".cast("date"), lit("1995-01-01").cast("date"))
          .cast("long").as("days_since"),
        date_format(add_months($"o_orderdate".cast("date"), 3), "yyyy-MM-dd").as("plus3m"))
      .orderBy($"okey")
  }

  // ---------------------------------------------------------------- q14
  /** Conditional aggregation (CASE WHEN inside agg) over the event stream. */
  val q14ConditionalAgg: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "events")
      .groupBy($"user_id")
      .agg(
        round(sum(when($"event_type" === "purchase", $"value").otherwise(0.0)), 2).as("purchase_value"),
        sum(when($"event_type" === "error", 1L).otherwise(0L)).as("n_errors"),
        round(max($"value"), 2).as("max_value"),
        round(min($"value"), 2).as("min_value"),
        count(lit(1)).as("n_events"))
      .orderBy($"user_id")
  }

  // ---------------------------------------------------------------- q15
  /** JSON extraction from the semi-structured `props` payload — the engine
    * analogue of the reference's dotted-path field access
    * (s12v/awsbeats streams/partition_key.go:26-39). */
  val q15JsonExtract: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "events")
      .withColumn("k", get_json_object($"props", "$.k").cast("long"))
      .groupBy($"k")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_value"))
      .orderBy($"k")
  }

  // ---------------------------------------------------------------- q16
  /** Event-time tumbling window (batch twin of the streaming daily window). */
  val q16TumblingDaily: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "events")
      .groupBy(window($"ts", "1 day").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_value"))
      .select(date_format($"w.start", "yyyy-MM-dd").as("day"), $"event_type", $"n", $"sum_value")
      .orderBy($"day", $"event_type")
  }

  // ---------------------------------------------------------------- q17
  /** Gap-based sessionization with window functions (lag + running sum):
    * a 30-minute inactivity gap starts a new session. Batch twin of the
    * streaming session_window / flatMapGroupsWithState path. */
  val q17Sessionize: Q = (s, dir) => {
    import s.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val run    = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .withColumn("us", unix_micros($"ts"))
      .withColumn("prev_us", lag($"us", 1).over(byUser))
      .withColumn("new_sess",
        when($"prev_us".isNull || ($"us" - $"prev_us") > 1800L * 1000000L, 1L).otherwise(0L))
      .withColumn("sess_idx", sum($"new_sess").over(run))
      .groupBy($"user_id", $"sess_idx")
      .agg(count(lit(1)).as("n_events"), round(sum($"value"), 2).as("sess_value"))
      .orderBy($"user_id", $"sess_idx")
  }

  // ---------------------------------------------------------------- q18
  /** Range join: lineitems shipped within 90 days of their order's date.
    * Equi key (orderkey) + range predicate — Catalyst plans SMJ/hash on the
    * equi part with the range as post-filter, so no BNLJ blowup at scale. */
  val q18RangeJoin: Q = (s, dir) => {
    import s.implicits._
    val li = t(s, dir, "lineitem")
    val o  = t(s, dir, "orders")
    li.join(o,
        li("l_orderkey") === o("o_orderkey") &&
        li("l_shipdate") >= o("o_orderdate") &&
        li("l_shipdate") <= o("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_shipped_90d"))
      .orderBy($"o_orderpriority")
  }

  // ---------------------------------------------------------------- q19
  /** As-of join expressed as a window: for each purchase, the most recent
    * strictly-prior click of the same user. Avoids a self-join shuffle — one
    * sort per user partition covers every purchase at once. */
  val q19AsOfJoin: Q = (s, dir) => {
    import s.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    t(s, dir, "events")
      .withColumn("us", unix_micros($"ts"))
      .withColumn("last_click_us",
        max(when($"event_type" === "click", $"us")).over(byUser))
      .filter($"event_type" === "purchase")
      .select(
        $"event_id",
        $"user_id",
        ($"us" - $"last_click_us").as("us_since_click"))
      .orderBy($"event_id")
  }

  // ---------------------------------------------------------------- q20
  /** Statistical aggregates: stddev / variance / correlation / median. */
  val q20Stats: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "events")
      .withColumn("k", get_json_object($"props", "$.k").cast("double"))
      .groupBy($"event_type")
      .agg(
        round(stddev_samp($"value"), 4).as("sd"),
        round(var_samp($"value"), 4).as("variance"),
        round(corr($"value", $"k"), 4).as("corr_vk"),
        round(expr("percentile(value, 0.5)"), 4).as("median_v"),
        count(lit(1)).as("n"))
      .orderBy($"event_type")
  }

  // ---------------------------------------------------------------- q21
  /** Daily top-5 users by spend — the metricbeat top-N processor
    * (example/metricbeat/metricbeat.yml:36-38) generalized to event analytics. */
  val q21TopUsersDaily: Q = (s, dir) => {
    import s.implicits._
    val daily = t(s, dir, "events")
      .groupBy(date_format($"ts", "yyyy-MM-dd").as("day"), $"user_id")
      .agg(round(sum($"value"), 2).as("total"))
    val w = Window.partitionBy($"day").orderBy($"total".desc, $"user_id")
    daily
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= 5)
      .orderBy($"day", $"rk")
  }

  // ---------------------------------------------------------------- q22
  /** Grouping sets via union of aggregations at chosen granularities
    * (explicit grouping-set list, unlike q10/q11's rollup/cube). */
  val q22GroupingSets: Q = (s, dir) => {
    import s.implicits._
    val e = t(s, dir, "events")
    e.createOrReplaceTempView("graft_events_gs")
    s.sql(
      """SELECT coalesce(event_type, 'ALL') AS etype,
        |       coalesce(CAST(user_id % 10 AS BIGINT), -1) AS user_bucket,
        |       CAST(count(*) AS BIGINT) AS n,
        |       round(sum(value), 2) AS sum_value
        |FROM graft_events_gs
        |GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())
        |ORDER BY etype, user_bucket""".stripMargin)
  }

  // ---------------------------------------------------------------- q23
  /** Pivot: per-user event-type value matrix. Spark plans this as a single
    * hash aggregation with one conditional-sum slot per pivot value — no
    * per-value scan, one shuffle on user_id. */
  val q23Pivot: Q = (s, dir) => {
    import s.implicits._
    val types = Seq("click", "error", "purchase", "signup", "view")
    val pivoted = t(s, dir, "events")
      .groupBy($"user_id")
      .pivot("event_type", types)
      .agg(round(sum($"value"), 2))
    types.foldLeft(pivoted) { (df, ty) =>
      df.withColumn(s"${ty}_v", coalesce(col(ty), lit(0.0))).drop(ty)
    }.orderBy($"user_id")
  }

  // ---------------------------------------------------------------- q24
  /** Lateral view / explode: token frequencies over documents, top-100.
    * The explode is a narrow op; only (token, partial count) rows shuffle,
    * and TakeOrderedAndProject keeps the final exchange at 100 rows. */
  val q24Explode: Q = (s, dir) => {
    import s.implicits._
    Tables.loadSpread(s, dir, "documents")
      .withColumn("tk", graft.ext.TextOps.toks($"text"))
      .select(explode_outer($"tk").as("tok")) // outer: no inferred-filter re-eval
      .filter($"tok".isNotNull)
      .groupBy($"tok")
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"tok")
      .limit(100)
  }

  // ---------------------------------------------------------------- q25
  /** Higher-order array functions over the embedding vectors: element-wise
    * stats via array_max/min, aggregate() folds, filter() counts — all
    * codegen'd builtins, no UDF, no shuffle at all (scan → project). */
  val q25ArrayFuncs: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "embeddings")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
      .select(
        $"vec_id",
        round(array_max($"v"), 4).as("v_max"),
        round(array_min($"v"), 4).as("v_min"),
        // + 0.0 canonicalizes IEEE -0.0 to +0.0 (engines differ on the sign
        // a near-zero mean rounds to)
        (round(aggregate($"v", lit(0.0d), (a, x) => a + x) / size($"v"), 4) + lit(0.0d)).as("v_avg"),
        round(graft.functions.VectorExprs.l2($"v"), 4).as("l2"),
        size(filter($"v", x => x > 0.0d)).cast("long").as("n_pos"))
      .orderBy($"vec_id")
  }

  // ---------------------------------------------------------------- q26
  /** Approximate aggregates: HLL++ distinct counts and quantile sketches —
    * the 100 TB path where exact distinct/percentile would shuffle every
    * value. No oracle (sketch results are engine-specific): rows-only check. */
  val q26ApproxAgg: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        approx_count_distinct($"l_partkey").as("approx_parts"),
        approx_count_distinct($"l_suppkey").as("approx_supps"),
        round(percentile_approx($"l_extendedprice", lit(0.5), lit(10000)), 2).as("approx_median"),
        count(lit(1)).as("n_rows"))
      .orderBy($"l_returnflag")
  }

  // ---------------------------------------------------------------- q27
  /** Full-outer join of two aggregates: BUILDING-segment customers vs
    * high-balance suppliers per nation — either side may be missing. */
  val q27FullOuter: Q = (s, dir) => {
    import s.implicits._
    val cn = t(s, dir, "customer").filter($"c_mktsegment" === "BUILDING")
      .groupBy($"c_nationkey").agg(count(lit(1)).as("n_cust"))
    val sn = t(s, dir, "supplier").filter($"s_acctbal" > 5000.0)
      .groupBy($"s_nationkey").agg(count(lit(1)).as("n_supp"))
    cn.join(sn, cn("c_nationkey") === sn("s_nationkey"), "full_outer")
      .select(
        coalesce(cn("c_nationkey"), sn("s_nationkey")).cast("long").as("nkey"),
        coalesce($"n_cust", lit(0L)).as("n_cust"),
        coalesce($"n_supp", lit(0L)).as("n_supp"))
      .orderBy($"nkey")
  }

  // ---------------------------------------------------------------- q28
  /** Cross join (cartesian) of two tiny sides — the only place a cartesian
    * product is acceptable at scale is dim × dim. */
  val q28CrossJoin: Q = (s, dir) => {
    import s.implicits._
    val st = t(s, dir, "orders").select($"o_orderstatus".as("status")).distinct()
    t(s, dir, "region").select($"r_name")
      .crossJoin(st)
      .select($"r_name", $"status", concat_ws("-", $"r_name", $"status").as("label"))
      .orderBy($"r_name", $"status")
  }

  // ---------------------------------------------------------------- q29
  /** Correlated scalar subquery (decorrelated form): orders priced above
    * 1.5× their customer's average. Expressed as agg + equi-join — exactly
    * the decorrelation Catalyst would apply to the subquery form. The
    * per-customer average is integer-cent-staged (o_totalprice is 2-decimal
    * data): the filter's row MEMBERSHIP depends on the average, so a
    * task-order float reassociation could otherwise flip a near-boundary
    * ratio between runs (the q01/c10 determinism discipline). */
  val q29CorrSubquery: Q = (s, dir) => {
    import s.implicits._
    val o = t(s, dir, "orders")
    val avgc = o.groupBy($"o_custkey".as("k"))
      .agg((sum(round($"o_totalprice" * 100).cast("long")) / lit(100.0)
        / count(lit(1))).as("avg_price"))
    o.join(avgc, o("o_custkey") === avgc("k"))
      .withColumn("ratio", round($"o_totalprice" / $"avg_price", 4))
      .filter($"ratio" > 1.5)
      .select(
        $"o_orderkey".cast("long").as("okey"),
        $"o_custkey".cast("long").as("cust"),
        round($"o_totalprice", 2).as("price"),
        $"ratio")
      .orderBy($"okey")
  }

  // ---------------------------------------------------------------- q30
  /** Analytic window functions: lag / lead / first_value / ntile. */
  val q30AnalyticFuncs: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    t(s, dir, "orders")
      .select(
        $"o_custkey".cast("long").as("cust"),
        $"o_orderkey".cast("long").as("okey"),
        round(lag($"o_totalprice", 1).over(w), 2).as("prev_price"),
        round(lead($"o_totalprice", 1).over(w), 2).as("next_price"),
        round(first($"o_totalprice").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2).as("first_price"),
        ntile(4).over(w).cast("long").as("quartile"))
      .orderBy($"cust", $"okey")
  }

  // ---------------------------------------------------------------- q31
  /** String function surface: regexp_replace, pad, reverse, translate,
    * position, split_part — all codegen'd builtins. */
  val q31StringFuncs: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "part")
      .select(
        $"p_partkey".cast("long").as("p_key"),
        regexp_replace($"p_name", "[aeiou]", "").as("novowels"),
        lpad($"p_brand", 12, "*").as("brand_pad"),
        reverse($"p_type").as("type_rev"),
        translate($"p_brand", "AEIOU", "12345").as("brand_tr"),
        instr($"p_name", "a").cast("long").as("first_a"),
        element_at(split($"p_type", " "), 1).as("type_head"))
      .orderBy($"p_key")
  }

  // ---------------------------------------------------------------- q32
  /** Spark 4 VariantType over the semi-structured payload (SURVEY §1.3):
    * parse once into a binary variant, then typed path extraction — the
    * engine-native way to hold schemaless event payloads at scale (no
    * per-query JSON re-parse; variant_get is codegen'd byte-offset access).
    * The oracle extracts the same value textually. */
  val q32Variant: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "events")
      .withColumn("v", parse_json($"props"))
      .withColumn("k", expr("variant_get(v, '$.k', 'bigint')"))
      .groupBy($"k")
      // + 1e-9 before rounding: the testdata's few-decimal values make
      // averages land exactly on 5th-decimal ties, and Spark (binary
      // HALF_UP) and DuckDB round them to different sides; the same nudge
      // on both engines picks one side deterministically. Integer-cent
      // staging (value is 2-decimal data) makes the mean itself
      // order-deterministic — the q01/c10 discipline.
      .agg(round(sum(round($"value" * 100).cast("long")) / lit(100.0)
        / count(lit(1)) + 1e-9, 4).as("avg_value"), count(lit(1)).as("n"))
      .orderBy($"k")
  }

  // ---------------------------------------------------------------- q33
  /** Pure theta join (non-equi only — SURVEY §2.8 joins row): BNLJ is the
    * only possible strategy, which is exactly why it is confined to
    * dim × dim sides; the broadcast side is 5 rows. */
  val q33ThetaJoin: Q = (s, dir) => {
    import s.implicits._
    val r = t(s, dir, "region").select($"r_regionkey", $"r_name")
    val n = t(s, dir, "nation").select($"n_regionkey", $"n_nationkey", $"n_name")
    n.join(broadcast(r), n("n_regionkey") < r("r_regionkey"))
      .select($"n_nationkey".cast("long").as("nkey"), $"n_name", $"r_name")
      .orderBy($"nkey", $"r_name")
  }

  // ---------------------------------------------------------------- q34
  /** Z-order layout audit: Morton-interleave two bounded lineitem key
    * dimensions ([[graft.functions.Layout.zorderKey]], pure codegen'd bit
    * ops), range-bucket the key, and report each bucket's bounding box in
    * BOTH dimensions. Tight per-bucket min/max in both columns is exactly
    * the property that makes `repartitionByRange(zkey)` + sorted parquet
    * writes prunable by file statistics for two-predicate scans at 100 TB
    * (each of the 64 buckets covers a 128×128 sub-rectangle of the
    * 1024×1024 key space, not a stripe). */
  val q34Zorder: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "lineitem")
      .select(($"l_orderkey" % 1024).as("xk"), ($"l_partkey" % 1024).as("yk"))
      .withColumn("zkey", graft.functions.Layout.zorderKey($"xk", $"yk", 10))
      .withColumn("bucket", shiftright($"zkey", 14))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n"),
        min($"xk").as("x_min"), max($"xk").as("x_max"),
        min($"yk").as("y_min"), max($"yk").as("y_max"))
      .orderBy($"bucket")
  }

  // ---------------------------------------------------------------- q35
  /** Ordered conversion funnel (view → click → purchase): for each user the
    * first view, the first click strictly after it, and the first purchase
    * strictly after that — the classic behavioral-analytics operator the
    * events table exists for. Three stage aggregations chained by keyed
    * equi-joins on user_id (each stage's output is ≤ one row per user, so
    * every join is user-keyed and AQE-broadcastable when small); no windows
    * over the full event stream, no cross-stage shuffle beyond user_id. */
  val q35Funnel: Q = (s, dir) => {
    import s.implicits._
    val e = t(s, dir, "events")
    val v = e.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("v_ts"))
    val c = e.filter($"event_type" === "click")
      .join(v, Seq("user_id")).filter($"ts" > $"v_ts")
      .groupBy($"user_id").agg(min($"ts").as("c_ts"))
    val p = e.filter($"event_type" === "purchase")
      .join(c, Seq("user_id")).filter($"ts" > $"c_ts")
      .groupBy($"user_id").agg(min($"ts").as("p_ts"))
    v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .select(
        $"user_id",
        date_format($"v_ts", "yyyy-MM-dd HH:mm:ss").as("view_ts"),
        date_format($"c_ts", "yyyy-MM-dd HH:mm:ss").as("click_ts"),
        date_format($"p_ts", "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
        (lit(1L) + when($"c_ts".isNotNull, 1L).otherwise(0L)
          + when($"p_ts".isNotNull, 1L).otherwise(0L)).as("depth"))
      .orderBy($"user_id")
  }

  /** Single-scan variant of [[q35Funnel]] (API form; output proven equal by
    * ContractSpec): ONE events scan and ONE user-keyed shuffle — each user's
    * (ts, type) pairs are collected sorted and the stage chain is a
    * left-to-right fold over them, instead of q35's three filtered stage
    * aggregations chained by joins. The fold is a higher-order `aggregate`
    * (interpreted, not codegen'd), but it runs once per USER over an array
    * bounded by that user's event count — the shuffle/scan savings dominate
    * at 100 TB, where three extra scans of the event log cost far more than
    * per-group interpretation. Skewed users note: the collected array is one
    * user's events, the same bound q17 sessionization already carries. */
  val q35FunnelSingleScan: Q = (s, dir) => {
    import s.implicits._
    val noTs = lit(null).cast("timestamp")
    val acc0 = struct(noTs.as("v"), noTs.as("c"), noTs.as("p"))
    t(s, dir, "events")
      .filter($"event_type".isin("view", "click", "purchase"))
      .groupBy($"user_id")
      .agg(sort_array(collect_list(struct($"ts", $"event_type"))).as("__ev"),
        // q35's base set (users with >= 1 view) as a cheap aggregated flag:
        // filtering on __f.v would inline the whole fold into the Filter and
        // evaluate it twice per user (no CSE across Filter/Project)
        max($"event_type" === "view").as("__hasv"))
      .filter($"__hasv")
      .withColumn("__f", aggregate($"__ev", acc0, (acc, e) => {
        val (v, c, p) = (acc.getField("v"), acc.getField("c"), acc.getField("p"))
        val (ts, et) = (e.getField("ts"), e.getField("event_type"))
        struct(
          when(v.isNull && et === "view", ts).otherwise(v).as("v"),
          // strict > matches q35's "first click strictly after the first
          // view"; events arrive in ts order, so first-match-wins = min
          when(c.isNull && v.isNotNull && et === "click" && ts > v, ts)
            .otherwise(c).as("c"),
          when(p.isNull && c.isNotNull && et === "purchase" && ts > c, ts)
            .otherwise(p).as("p"))
      }))
      .select(
        $"user_id",
        date_format($"__f.v", "yyyy-MM-dd HH:mm:ss").as("view_ts"),
        date_format($"__f.c", "yyyy-MM-dd HH:mm:ss").as("click_ts"),
        date_format($"__f.p", "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
        (lit(1L) + when($"__f.c".isNotNull, 1L).otherwise(0L)
          + when($"__f.p".isNotNull, 1L).otherwise(0L)).as("depth"))
      .orderBy($"user_id")
  }

  // ---------------------------------------------------------------- q36
  /** Salted skewed join — the oracle row for [[graft.operators.Skew]]: a
    * deterministic per-row salt scatters the big (lineitem) side across
    * `salt` reducers and replicates the small (part) side once per salt
    * value, preserving equi-join semantics exactly. The DuckDB twin is the
    * PLAIN join — identical output is the whole point (DedupOpsSpec asserts
    * it in-engine; this row proves it against an independent engine). */
  val q36SaltedJoin: Q = (s, dir) => {
    import s.implicits._
    val li = t(s, dir, "lineitem").filter($"l_quantity" > 45.0)
    val p  = t(s, dir, "part")
    graft.operators.Skew.saltedJoin(li, p, "l_partkey", "p_partkey", salt = 8)
      .select($"l_orderkey", $"l_linenumber".cast("long").as("line_no"),
        $"l_partkey", $"p_name", round($"p_retailprice", 2).as("price"))
      .orderBy($"l_orderkey", $"line_no")
  }

  // ---------------------------------------------------------------- q37
  /** Exact discrete percentiles per group: `percentile_disc` picks the
    * smallest value whose cumulative distribution reaches p — i.e. element
    * `ceil(p·n)` of the sorted multiset — so the result is a VALUE COPIED
    * FROM THE INPUT, no interpolation arithmetic, hash-exact across engines
    * by construction (DuckDB `quantile_disc` implements the same rule;
    * verified element-for-element). Exact percentiles keep a value→count
    * histogram per group as aggregation state — bounded here by the
    * distinct 2-decimal prices, NOT by group row count, but still the
    * operator to swap for q26's `approx_percentile` sketch when the value
    * domain is unbounded at 100 TB (that trade is the q26/ContractSpec
    * story; this row is the exact side of it). */
  val q37Percentiles: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "lineitem")
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY l_extendedprice)").as("p25"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)").as("p50"),
        expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY l_extendedprice)").as("p75"),
        expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY l_extendedprice)").as("p95"),
        count(lit(1)).as("n"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  // ---------------------------------------------------------------- q38
  /** Bucketed co-located join — the storage-layout lever that deletes the
    * join shuffle outright: both fact tables are written `bucketBy(8, key)
    * .sortBy(key)`, so each scan reports hash-partitioning on the join key
    * and the sort-merge join runs with ZERO Exchange and ZERO Sort under it
    * (PlanSpec asserts both; the MERGE hint keeps AQE from broadcasting the
    * small side at test scale, since shuffle elimination is the thing under
    * proof). At 100 TB this is THE recurring-join pattern: pay one
    * partitioned write, then every downstream orderkey join is
    * shuffle-free. The bucketed copies are external tables under
    * java.io.tmpdir, content-addressed by a collision-free dir tag and
    * built AT MOST ONCE per dir (repeat invocations reuse or re-register
    * the existing files); the oracle replays the plain join — bucketing
    * must not change a single row. */
  /** Collision-free per-dir tag for layout copies: the sanitized dir for
    * readability PLUS an md5 prefix of the RAW dir string, so two dirs that
    * sanitize identically ('sf0.1' vs 'sf0_1') can never share a layout
    * path or catalog table (round-10 ADVICE). */
  private def dirTag(dir: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4).map(b => f"$b%02x").mkString
    dir.replaceAll("[^a-zA-Z0-9]", "_") + "_" + h
  }

  val q38BucketedJoin: Q = (s0, dir) => {
    // The legacy bucket-sort flag and the plan forcing run on a PRIVATE
    // newSession(): same SparkContext and catalog, but its OWN SQLConf —
    // the shared session's other in-flight queries can never be planned
    // under the flag (round-10 ADVICE). The catalog is still shared state:
    // concurrent q38 invocations against the SAME dir are not supported
    // (the testdata is immutable, so the idempotent skip below makes
    // repeat invocations read-only after the first).
    val s = s0.newSession()
    import s.implicits._
    val tag = dirTag(dir)
    val base = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_bucketed/$tag").getAbsolutePath
    def bucketed(name: String, key: String): DataFrame = {
      val tbl = s"graft_bucketed_${name}_$tag"
      val path = s"$base/$name"
      val marker = new java.io.File(path, "_SUCCESS")
      if (!s.catalog.tableExists(tbl)) {
        if (marker.isFile) {
          // files survive from an earlier JVM (content-addressed by dirTag,
          // source immutable): register the bucketed layout, don't rewrite
          val ddl = t(s, dir, name).schema.toDDL
          s.sql(s"""CREATE TABLE $tbl ($ddl) USING PARQUET
                   |CLUSTERED BY ($key) SORTED BY ($key) INTO 8 BUCKETS
                   |LOCATION '$path'""".stripMargin)
        } else {
          // repartition on the bucket hash first -> exactly ONE file per
          // bucket; with multiple files per bucket Spark cannot trust the
          // sortBy metadata and re-sorts both sides (writer tasks and
          // buckets would interleave), silently forfeiting the no-Sort
          // merge join
          t(s, dir, name).repartition(8, col(key)).write
            .bucketBy(8, key).sortBy(key)
            .option("path", path)
            .mode("overwrite").saveAsTable(tbl)
        }
      }
      s.table(tbl)
    }
    val li = bucketed("lineitem", "l_orderkey")
    val o = bucketed("orders", "o_orderkey")
    val joined = li.hint("MERGE").join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy($"o_orderpriority")
      .agg(
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"),
        countDistinct($"o_orderkey").as("n_orders"),
        count(lit(1)).as("n_items"))
      .orderBy($"o_orderpriority")
    // Spark 3+ ignores bucket SORT metadata by default (the one-file-per-
    // bucket check needs a listing — SPARK-28595); opt in on the private
    // session and force the physical plan NOW so the no-Sort merge join is
    // planned under the flag. The Dataset caches its QueryExecution, so
    // later actions reuse this plan; the flag lives and dies with `s`.
    s.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    joined.queryExecution.executedPlan
    joined
  }

  // ---------------------------------------------------------------- q39
  /** Date-partitioned layout + partition pruning — the OTHER storage lever
    * next to q38's bucketing: events land under `event_date=.../` Hive-style
    * directories, and a one-day query prunes to that directory at PLANNING
    * time — `PartitionFilters` in the scan, 1 of ~30 directories read
    * (PlanSpec asserts both). At 100 TB with daily partitions this is the
    * difference between scanning 1/365th and scanning everything; it
    * composes with row-group pushdown (which only skips WITHIN the files it
    * already opened). The partitioned copy is content-addressed per dir
    * under java.io.tmpdir and written at most once; the oracle replays the
    * same day filter on the raw table — layout must not change a row. */
  val q39PartitionPruning: Q = (s, dir) => {
    import s.implicits._
    val base = new java.io.File(
      sys.props("java.io.tmpdir"),
      s"graft_partitioned/${dirTag(dir)}/events").getAbsolutePath
    // Idempotent skip (round-10 ADVICE): the copy is content-addressed by
    // the collision-free dirTag and the testdata is immutable, so once the
    // _SUCCESS marker exists, building this query is read-only — plan
    // inspection no longer rewrites the dataset, and repeat invocations
    // cannot race a delete-then-write against each other's reads. (The
    // FIRST build per dir still writes at construction time; Bench times
    // that build separately as layout_s.)
    if (!new java.io.File(base, "_SUCCESS").isFile)
      t(s, dir, "events")
        .withColumn("event_date", date_format($"ts", "yyyy-MM-dd"))
        .write.partitionBy("event_date").mode("overwrite").parquet(base)
    s.read.parquet(base)
      .filter($"event_date" === "2024-01-15")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        countDistinct($"user_id").as("n_users"),
        round(sum($"value"), 2).as("sum_value"))
      .orderBy($"event_type")
  }

  // ---------------------------------------------------------------- q40
  /** Exact discrete percentiles via a VALUE HISTOGRAM — the q37 semantics
    * re-planned for UNBOUNDED value domains: q37's builtin
    * `percentile_disc` holds a value→count map as aggregation-buffer state
    * (fine while distinct values are bounded, e.g. 2-decimal prices); this
    * form moves that histogram into the PLAN — a (keys, value)-keyed count,
    * a TWO-LEVEL cumulative count over the histogram (round 20: bounded
    * sortableBits-bucket offsets + partitioned per-bucket windows, the c12
    * decomposition — the previous per-key window sorted each key's whole
    * value domain in one task), and a conditional-min pick of the
    * smallest value whose cumulative count reaches ceil(p·n). Same
    * ceil-rank rule, same value-copy outputs (zero float interpolation),
    * same oracle as q37 — two independent plans, one contract. */
  def exactPercentilesDisc(df: DataFrame, keyCols: Seq[String],
      valueCol: String, ps: Seq[(String, Double)]): DataFrame = {
    val keys = keyCols.map(col)
    val hist = df.groupBy((keys :+ col(valueCol)): _*)
      .agg(count(lit(1)).as("__c"))
    // Round-20 re-plan of the cumulative count (guide §2.5 — the c12
    // perplexityBuckets two-level decomposition): the previous plan ran
    // ONE window partition per key over the whole per-key histogram, so
    // an unbounded value domain put the entire domain's sort in a single
    // task — exactly the straggler this histogram form exists to avoid.
    // Now sortableBits buckets the value domain into ≤ 2¹⁶ monotone
    // buckets: a bounded per-(key, bucket) histogram carries the
    // exclusive prefix offsets (tiny windows over ≤ 65536 rows per key),
    // and the per-value cumulative count runs in PARTITIONED
    // (key, bucket) windows — ~1/65536 of the domain per partition. The
    // counts are exact integers and bucket order ≡ value order
    // (sortableBits is monotone), so every __cum — and therefore every
    // ceil-rank pick — is bit-identical to the single-window plan.
    // (+0.0 folds −0.0 into +0.0 so SQL-equal values share a bucket id.)
    val hb = hist.withColumn("__bkt", shiftright(
      graft.functions.Layout.sortableBits(col(valueCol).cast("double") + lit(0.0d)),
      48))
    val offW = Window.partitionBy(keys: _*).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val totW = Window.partitionBy(keys: _*)
    // bounded by the bucket space (≤ 2¹⁶ rows per key), never the domain
    val offs = hb.groupBy((keys :+ col("__bkt")): _*)
      .agg(sum(col("__c")).as("__bc"))
      .withColumn("__off", coalesce(sum(col("__bc")).over(offW), lit(0L)))
      .withColumn("__n", sum(col("__bc")).over(totW))
      .select((keys :+ col("__bkt") :+ col("__off") :+ col("__n")): _*)
    val withinW = Window.partitionBy((keys :+ col("__bkt")): _*)
      .orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // null-safe equality: a NULL group key (or the NULL-value bucket) must
    // keep its histogram rows exactly as the old single-window plan kept
    // them — a plain equi-join would drop them
    val offsR = offs.select((keyCols.map(k => col(k).as(s"__o_$k")) :+
      col("__bkt").as("__obkt") :+ col("__off") :+ col("__n")): _*)
    val joinCond = (keyCols.map(k => col(k) <=> col(s"__o_$k")) :+
      (col("__bkt") <=> col("__obkt"))).reduce(_ && _)
    // no broadcast() hint (round 21, the r20 verdict's scale flaw): offsR
    // has one row per distinct (group keys, bucket) — bounded per key
    // (≤ 2¹⁶ buckets) but NOT in group-key cardinality, so forcing a
    // broadcast ORs back the driver/executor-memory cliff this histogram
    // plan exists to avoid. The null-safe equality condition is a plain
    // hash-join key set, so AQE broadcasts when offsR is actually small
    // (it is at every declared-query key set) and keeps a keyed
    // shuffle join when a high-cardinality keyCols makes it histogram-sized.
    val staged = hb
      .join(offsR, joinCond)
      .withColumn("__cum", col("__off") + sum(col("__c")).over(withinW))
    val picks = ps.map { case (name, p) =>
      min(when(col("__cum").cast("double") >= ceil(lit(p) * col("__n")),
        col(valueCol))).as(name)
    } :+ max(col("__n")).as("n")
    staged.groupBy(keys: _*).agg(picks.head, picks.tail: _*)
  }

  val q40PercentilesHist: Q = (s, dir) => {
    import s.implicits._
    exactPercentilesDisc(t(s, dir, "lineitem"),
      Seq("l_returnflag", "l_linestatus"), "l_extendedprice",
      Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75, "p95" -> 0.95))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** The [[exactPercentilesAuto]] switch decision, exposed for specs and
    * telemetry: ("builtin" | "histogram", approximate distinct count of the
    * value column). ONE bounded-state scan — `approx_count_distinct`
    * (HyperLogLog++) over the FULL column: constant sketch state per task,
    * merge is commutative/associative, so the estimate — and therefore the
    * PLAN a production run gets — is DETERMINISTIC under any partitioning
    * or file layout. (The previous probe countDistinct'ed an unordered
    * 64k-row `limit` slice: an arbitrary prefix, so a corpus clustered by
    * the value column could show few distinct values in the slice while
    * the full domain is unbounded — routing to the builtin plan whose agg
    * buffer grows with the data, the exact scale failure the switch exists
    * to avoid; and the plan could flip run-to-run with file order.) The
    * ±5% HLL error only matters within a hair of `switchDistinct`, where
    * both plans are bit-equal by contract anyway (q37 ≡ q40, one shared
    * oracle), so results never depend on the estimate. */
  def exactPercentilesAutoChoice(df: DataFrame, valueCol: String,
      switchDistinct: Long = 4096L): (String, Long) = {
    val seen = df.select(col(valueCol))
      .agg(approx_count_distinct(col(valueCol))).head().getLong(0)
    (if (seen > switchDistinct) "histogram" else "builtin", seen)
  }

  /** Size-adaptive exact percentiles — the [[graft.ext.DedupOps]]
    * jaccardPairsAuto adoption seam applied to the q37/q40 plan pair:
    * the builtin `percentile_disc` (q37) holds a value→count map as
    * aggregation-buffer STATE — compact and single-shuffle while the value
    * domain is bounded (2-decimal prices), but on an unbounded domain at
    * 100 TB that buffer grows with the data inside one task; the
    * keyed-histogram re-plan ([[exactPercentilesDisc]]/q40) moves the
    * histogram into the PLAN, where it partitions and spills like any
    * relation. Both plans implement the same ceil(p·n) value-copy rule and
    * are bit-equal (one shared DuckDB oracle), so the switch is purely a
    * physical-plan choice past a deterministic approx-distinct probe. */
  def exactPercentilesAuto(df: DataFrame, keyCols: Seq[String],
      valueCol: String, ps: Seq[(String, Double)],
      switchDistinct: Long = 4096L): DataFrame = {
    val (choice, seen) =
      exactPercentilesAutoChoice(df, valueCol, switchDistinct)
    log.info(s"exactPercentilesAuto: picked '$choice' plan " +
      s"(~$seen distinct full-column HLL estimate, switch at $switchDistinct)")
    if (choice == "builtin") {
      val aggs = ps.map { case (name, p) =>
        expr(s"percentile_disc($p) WITHIN GROUP (ORDER BY $valueCol)").as(name)
      } :+ count(lit(1)).as("n")
      df.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    } else exactPercentilesDisc(df, keyCols, valueCol, ps)
  }

  // ---------------------------------------------------------------- q51
  /** q51: [[exactPercentilesAuto]] on the q37/q40 configuration — the
    * oracle row proving the adaptive seam returns the SAME rows as both
    * fixed plans regardless of which the probe picks (the shared
    * percentile_disc oracle; testdata prices show >4096 distinct values
    * already at sf0.001, so the default switch routes to the histogram
    * plan — and either verdict hash-matches q37 and q40 by the bit-equal
    * contract PlanSpec pins). */
  val q51PercentilesAuto: Q = (s, dir) => {
    import s.implicits._
    exactPercentilesAuto(t(s, dir, "lineitem"),
      Seq("l_returnflag", "l_linestatus"), "l_extendedprice",
      Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75, "p95" -> 0.95))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  // ---------------------------------------------------------------- q41
  /** Sessionization via the NATIVE `session_window` operator — the built-in
    * twin of q17's hand-rolled lag/cumsum form (one declarative groupBy the
    * optimizer owns, and the same operator that powers watermarked
    * streaming session windows, so batch and stream share one construct).
    * Boundary semantics differ from q17 at exactly-gap spacing: the native
    * window is [start, last+gap), so an event at PRECISELY prev+gap starts
    * a NEW session where q17's strict `> gap` rule continues the old one —
    * the oracle replays the native `>=` rule. Session identity is the
    * window start (the session's first event timestamp), emitted as exact
    * micros. */
  val q41SessionWindowNative: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "events")
      .groupBy($"user_id", session_window($"ts", "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"), round(sum($"value"), 2).as("sess_value"))
      .select($"user_id", unix_micros($"sw.start").as("sess_start_us"),
        $"n_events", $"sess_value")
      .orderBy($"user_id", $"sess_start_us")
  }

  // ---------------------------------------------------------------- q42
  /** LATERAL correlated subquery join — top-2 orders PER customer via a
    * per-row dependent subquery (`FROM customer, LATERAL (... LIMIT 2)`),
    * the SQL:2003 construct Spark supports since 3.2 (SPARK-34382). Spark
    * DECORRELATES the lateral limit into a window rank over one orders
    * shuffle — no per-customer re-execution, so the declarative form keeps
    * the q04-style physical plan while the query reads as "for each
    * customer, its top orders". Registered on a private newSession so the
    * temp views never leak into (or race) the shared session's catalog.
    * 100 TB: one orders shuffle on custkey + a broadcast-able customer
    * side; the LIMIT bounds per-key output at 2 rows. */
  val q42LateralJoin: Q = (s0, dir) => {
    val s = s0.newSession()
    t(s, dir, "customer").createOrReplaceTempView("graft_customer_lat")
    t(s, dir, "orders").createOrReplaceTempView("graft_orders_lat")
    s.sql(
      """SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey,
        |       round(t.o_totalprice, 2) AS price,
        |       CAST(t.rk AS BIGINT) AS rk
        |FROM graft_customer_lat c,
        |LATERAL (
        |  SELECT o_orderkey, o_totalprice,
        |         row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM graft_orders_lat o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey
        |  LIMIT 2) t
        |ORDER BY c.c_custkey, t.rk""".stripMargin)
  }

  // ---------------------------------------------------------------- q43
  /** Arg-extremum aggregation: WHICH row attains a group's extreme, in one
    * aggregation pass — `max_by`/`min_by` (Spark 3.3+) plus the tie-proof
    * `max(struct(price, key))` form. The struct comparison is
    * lexicographic in BOTH engines, so equal prices deterministically
    * resolve to the larger orderkey — `max_by(key, price)` ALONE is
    * nondeterministic under ties and is only used here with the UNIQUE
    * orderkey as the ordering value. One shuffle on the group key,
    * constant-size agg state — the scalable replacement for the
    * "rank-then-filter-rk=1" window plan when only the extreme row is
    * wanted (no sort, no per-group row buffering). */
  val q43ArgExtremum: Q = (s, dir) => {
    import s.implicits._
    val best = struct($"o_totalprice", $"o_orderkey")
    t(s, dir, "orders")
      .groupBy($"o_custkey")
      .agg(
        max(best).getField("o_orderkey").as("best_order"),
        round(max(best).getField("o_totalprice"), 2).as("best_price"),
        min(best).getField("o_orderkey").as("worst_order"),
        max_by($"o_orderstatus", $"o_orderkey").as("last_status"),
        min_by($"o_orderdate", $"o_orderkey").as("first_date"),
        count(lit(1)).as("n_orders"))
      .withColumn("first_date", date_format($"first_date", "yyyy-MM-dd"))
      .orderBy($"o_custkey")
  }

  // ---------------------------------------------------------------- q44
  /** HOPPING (sliding) window aggregation — `window(ts, '1 hour',
    * '30 minutes')`: every event lands in size/slide = 2 overlapping hops,
    * the same declarative construct Structured Streaming uses for
    * overlapping-window aggregations (q16 is its tumbling special case).
    * Spark expands the hop assignment in the PROJECTION (an explode of 2
    * window structs per row) and then runs one ordinary hash aggregation —
    * no self-join, no range join; the oracle replays the assignment with
    * pure epoch-micros integer arithmetic (hop = bucket(ts) − k·slide).
    * Value sums are integer-cent-staged (exact longs, order-free). */
  val q44HoppingWindow: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "events")
      .groupBy(window($"ts", "1 hour", "30 minutes").as("w"), $"event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(round($"value" * 100).cast("long")).as("value_cents"))
      .select(unix_micros(col("w.start")).as("hop_start_us"), $"event_type",
        $"n_events", $"value_cents")
      .orderBy($"hop_start_us", $"event_type")
  }

  // ---------------------------------------------------------------- q45
  /** Time-RANGE window frame — per user, the rolling trailing-1-hour event
    * count and value sum at every event: `RANGE BETWEEN 3600000000
    * PRECEDING AND CURRENT ROW` over epoch-micros ordering. RANGE frames
    * differ from q05's ROWS frames exactly where it matters for event
    * time: the frame is defined by the ORDERING VALUE (all events within
    * the hour, ties included as peers), not by a row count — the batch twin
    * of a streaming sliding aggregate. Frame sums are integer cents: a
    * float sum over a sliding frame would reassociate differently between
    * engines (segment-tree vs running accumulation); exact longs make the
    * frame content, not float luck, the only degree of freedom. */
  val q45RangeFrame: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy(unix_micros($"ts"))
      .rangeBetween(-3600000000L, 0L)
    t(s, dir, "events")
      .withColumn("__cents", round($"value" * 100).cast("long"))
      .withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("cents_1h", sum($"__cents").over(w))
      .select($"event_id", $"user_id", unix_micros($"ts").as("ts_us"),
        $"n_1h", $"cents_1h")
      .orderBy($"event_id")
  }

  // ---------------------------------------------------------------- q46
  /** UNPIVOT (melt) — the inverse of q23's pivot: wide per-row measure
    * columns become (measure, val) rows via `Dataset.unpivot` (Spark 3.4+),
    * planned as a single Expand projection — one scan, zero shuffles, rows
    * emitted measure-major per input row. The normalization step every
    * long-format metrics pipeline starts with; the oracle replays it as
    * the defining UNION ALL. */
  val q46Unpivot: Q = (s, dir) => {
    import s.implicits._
    // deterministic key cap (l_orderkey % 10 = 0, ~1/10 of the table): the
    // full-table unpivot compared 180k oracle rows at sf0.01 — the board's
    // largest compare for a construct whose semantics a slice pins just as
    // well (round-11 verdict #7). The filter sits BEFORE the unpivot and
    // pushes to the scan; the plan stays one Expand, zero shuffles
    // (PlanSpec).
    t(s, dir, "lineitem")
      .filter($"l_orderkey" % 10 === 0)
      .select($"l_orderkey", $"l_linenumber".cast("long").as("l_linenumber"),
        round($"l_quantity", 2).as("l_quantity"),
        round($"l_discount", 2).as("l_discount"),
        round($"l_tax", 2).as("l_tax"))
      .unpivot(Array($"l_orderkey", $"l_linenumber"),
        Array($"l_quantity", $"l_discount", $"l_tax"),
        "measure", "val")
      .orderBy($"l_orderkey", $"l_linenumber", $"measure")
  }

  // ---------------------------------------------------------------- q47
  /** GROUPING metadata functions — `grouping()` / `grouping_id()` over a
    * rollup: the machine-readable way to tell a subtotal row from a data
    * row whose key happens to be NULL (q10's coalesce labels are for
    * humans; BI layers key on the grouping bits). Spark's grouping_id()
    * bit order (first rollup column = MSB) matches DuckDB's
    * GROUPING(a, b). */
  val q47GroupingId: Q = (s, dir) => {
    import s.implicits._
    t(s, dir, "events")
      .withColumn("__ub", pmod($"user_id", lit(10)))
      .rollup($"event_type", $"__ub")
      .agg(count(lit(1)).as("n"),
        grouping($"event_type").cast("long").as("g_type"),
        grouping($"__ub").cast("long").as("g_bucket"),
        grouping_id().cast("long").as("gid"))
      .select(coalesce($"event_type", lit("(all)")).as("etype"),
        coalesce($"__ub", lit(-1L)).as("user_bucket"),
        $"g_type", $"g_bucket", $"gid", $"n")
      .orderBy($"etype", $"user_bucket")
  }

  // ---------------------------------------------------------------- q48
  /** Schema-evolution read (`mergeSchema`) — the 100 TB reality that a
    * long-lived dataset's early files lack columns later files carry: two
    * parquet generations are written (v1 without `bonus_cents`, v2 with
    * it), then ONE read with `mergeSchema=true` unions them by NAME, v1
    * rows surfacing NULL for the missing column. The aggregation proves
    * the null-fill semantics (per type: rows, cent sums, how many rows
    * predate the column). Copies are content-addressed per dir and
    * written at most once (the q39 discipline); the oracle replays the
    * SEMANTICS from the raw table (split + UNION ALL with a typed NULL) —
    * the merged read must be indistinguishable from that. */
  val q48MergeSchema: Q = (s, dir) => {
    import s.implicits._
    val base = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_evolve/${dirTag(dir)}").getAbsolutePath
    val cents = round($"value" * 100).cast("long").as("cents")
    if (!new java.io.File(s"$base/v2", "_SUCCESS").isFile) {
      val e = t(s, dir, "events")
      e.filter($"event_id" % 2 === 0)
        .select($"event_id", $"event_type", cents)
        .write.mode("overwrite").parquet(s"$base/v1")
      e.filter($"event_id" % 2 === 1)
        .select($"event_id", $"event_type", cents,
          (round($"value" * 100).cast("long") * 2).as("bonus_cents"))
        .write.mode("overwrite").parquet(s"$base/v2")
    }
    s.read.option("mergeSchema", "true").parquet(s"$base/v1", s"$base/v2")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"cents").as("sum_cents"),
        sum(coalesce($"bonus_cents", lit(0L))).as("sum_bonus"),
        sum(when($"bonus_cents".isNull, 1L).otherwise(0L)).as("n_pre_schema"))
      .orderBy($"event_type")
  }

  // ---------------------------------------------------------------- q49
  /** NULL-safe equi-join (`<=>` / IS NOT DISTINCT FROM): two aggregates
    * keyed on a NULLABLE key full-outer-joined so the NULL groups MATCH
    * each other — plain `=` silently drops them (NULL = NULL is NULL),
    * the classic silent-row-loss bug in dimension joins with missing
    * keys. Spark plans `<=>` as an ordinary hash join (EqualNullSafe is a
    * valid equi-join key — no fallback to nested-loop), so the null-safe
    * form costs the same shuffle as `=`. */
  val q49NullSafeJoin: Q = (s, dir) => {
    import s.implicits._
    val e = t(s, dir, "events")
    val a = e.groupBy(nullif($"event_type", lit("error")).as("k"))
      .agg(count(lit(1)).as("n_a"))
    val b = e.groupBy(nullif($"event_type", lit("view")).as("k"))
      .agg(count(lit(1)).as("n_b"))
    a.join(b, a("k") <=> b("k"), "full_outer")
      .select(coalesce(a("k"), lit("(null)")).as("k_a"),
        coalesce(b("k"), lit("(null)")).as("k_b"),
        coalesce($"n_a", lit(-1L)).as("n_a"),
        coalesce($"n_b", lit(-1L)).as("n_b"))
      .orderBy($"k_a", $"k_b")
  }

  // ---------------------------------------------------------------- q50
  /** BAG-semantics set operations — `intersectAll` / `exceptAll` (SQL
    * INTERSECT ALL / EXCEPT ALL): multiplicity-aware versions of q08's
    * distinct set ops. INTERSECT ALL keeps min(multiplicity) copies,
    * EXCEPT ALL keeps count_a − count_b — the semantics reconciliation
    * and diff pipelines need (a distinct intersect hides HOW MANY rows
    * agree). Spark plans both as an aggregate-on-counts + generate, not a
    * join per copy. Grouped output so the compare is deterministic. */
  val q50BagSetOps: Q = (s, dir) => {
    import s.implicits._
    val e = t(s, dir, "events")
    val a = e.filter($"user_id" % 2 === 0).select($"event_type")
    val b = e.filter($"value" > 100.0).select($"event_type")
    val i = a.intersectAll(b).groupBy($"event_type")
      .agg(count(lit(1)).as("n")).withColumn("op", lit("intersect_all"))
    val x = a.exceptAll(b).groupBy($"event_type")
      .agg(count(lit(1)).as("n")).withColumn("op", lit("except_all"))
    i.unionByName(x).select($"op", $"event_type", $"n")
      .orderBy($"op", $"event_type")
  }

  val queries: Map[String, Q] = Map(
    "q50_bag_set_ops" -> q50BagSetOps,
    "q48_merge_schema" -> q48MergeSchema,
    "q49_nullsafe_join" -> q49NullSafeJoin,
    "q47_grouping_id" -> q47GroupingId,
    "q46_unpivot" -> q46Unpivot,
    "q44_hopping_window" -> q44HoppingWindow,
    "q45_range_frame" -> q45RangeFrame,
    "q42_lateral_join" -> q42LateralJoin,
    "q43_arg_extremum" -> q43ArgExtremum,
    "q41_session_window" -> q41SessionWindowNative,
    "q37_percentiles" -> q37Percentiles,
    "q38_bucketed_join" -> q38BucketedJoin,
    "q39_partition_pruning" -> q39PartitionPruning,
    "q40_percentiles_hist" -> q40PercentilesHist,
    "q51_percentiles_auto" -> q51PercentilesAuto,
    "q34_zorder" -> q34Zorder,
    // single-scan form registered as THE q35 (one events scan, one user-keyed
    // shuffle, zero joins — the plan to run at 100 TB); the chained
    // three-join form stays as the in-engine parity witness (ContractSpec).
    "q35_funnel" -> q35FunnelSingleScan,
    "q36_salted_join" -> q36SaltedJoin,
    "q01_pricing_summary" -> q01PricingSummary,
    "q02_revenue_by_nation" -> q02RevenueByNation,
    "q03_top_orders" -> q03TopOrders,
    "q04_window_topn" -> q04WindowTopN,
    "q05_running_total" -> q05RunningTotal,
    "q06_semi_join" -> q06SemiJoin,
    "q07_anti_join" -> q07AntiJoin,
    "q08_set_ops" -> q08SetOps,
    "q09_distinct_agg" -> q09DistinctAgg,
    "q10_rollup" -> q10Rollup,
    "q11_cube" -> q11Cube,
    "q12_scalar_funcs" -> q12ScalarFuncs,
    "q13_date_funcs" -> q13DateFuncs,
    "q14_conditional_agg" -> q14ConditionalAgg,
    "q15_json_extract" -> q15JsonExtract,
    "q16_tumbling_daily" -> q16TumblingDaily,
    "q17_sessionize" -> q17Sessionize,
    "q18_range_join" -> q18RangeJoin,
    "q19_asof_join" -> q19AsOfJoin,
    "q20_stats" -> q20Stats,
    "q21_top_users_daily" -> q21TopUsersDaily,
    "q22_grouping_sets" -> q22GroupingSets,
    "q23_pivot" -> q23Pivot,
    "q24_explode" -> q24Explode,
    "q25_array_funcs" -> q25ArrayFuncs,
    "q26_approx_agg" -> q26ApproxAgg,
    "q27_full_outer" -> q27FullOuter,
    "q28_cross_join" -> q28CrossJoin,
    "q29_corr_subquery" -> q29CorrSubquery,
    "q30_analytic_funcs" -> q30AnalyticFuncs,
    "q31_string_funcs" -> q31StringFuncs,
    "q32_variant" -> q32Variant,
    "q33_theta_join" -> q33ThetaJoin)

  // quantile_disc implements the same smallest-value-at-cume_dist>=p rule
  // as Spark's percentile_disc (both pick sorted element ceil(p*n)) — the
  // outputs are copies of input values, so the compare is exact. Shared by
  // q37 (builtin plan) and q40 (histogram plan): one contract, two plans.
  private val percentileDiscSql =
    """SELECT l_returnflag, l_linestatus,
      | quantile_disc(l_extendedprice, 0.25) AS p25,
      | quantile_disc(l_extendedprice, 0.5) AS p50,
      | quantile_disc(l_extendedprice, 0.75) AS p75,
      | quantile_disc(l_extendedprice, 0.95) AS p95,
      | CAST(count(*) AS BIGINT) AS n
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  val oracles: Map[String, String] = Map(
    "q50_bag_set_ops" ->
      """WITH a AS (SELECT event_type FROM events WHERE user_id % 2 = 0),
        | b AS (SELECT event_type FROM events WHERE value > 100.0),
        | i AS (SELECT event_type FROM a INTERSECT ALL SELECT event_type FROM b),
        | x AS (SELECT event_type FROM a EXCEPT ALL SELECT event_type FROM b)
        |SELECT op, event_type, n FROM (
        | SELECT 'intersect_all' AS op, event_type, CAST(count(*) AS BIGINT) AS n
        | FROM i GROUP BY event_type
        | UNION ALL
        | SELECT 'except_all', event_type, CAST(count(*) AS BIGINT)
        | FROM x GROUP BY event_type) t
        |ORDER BY op, event_type""".stripMargin,
    // the SEMANTIC replay of union-by-name: split + UNION ALL with a typed
    // NULL for the column v1 predates — the merged read must match this
    "q48_merge_schema" ->
      """WITH v1 AS (
        |  SELECT event_id, event_type, CAST(round(value * 100) AS BIGINT) AS cents,
        |   CAST(NULL AS BIGINT) AS bonus_cents
        |  FROM events WHERE event_id % 2 = 0),
        | v2 AS (
        |  SELECT event_id, event_type, CAST(round(value * 100) AS BIGINT) AS cents,
        |   CAST(round(value * 100) AS BIGINT) * 2 AS bonus_cents
        |  FROM events WHERE event_id % 2 = 1),
        | u AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(cents) AS BIGINT) AS sum_cents,
        | CAST(sum(coalesce(bonus_cents, 0)) AS BIGINT) AS sum_bonus,
        | CAST(sum(CASE WHEN bonus_cents IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_pre_schema
        |FROM u GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q49_nullsafe_join" ->
      """WITH a AS (
        |  SELECT nullif(event_type, 'error') AS k, CAST(count(*) AS BIGINT) AS n_a
        |  FROM events GROUP BY 1),
        | b AS (
        |  SELECT nullif(event_type, 'view') AS k, CAST(count(*) AS BIGINT) AS n_b
        |  FROM events GROUP BY 1)
        |SELECT coalesce(a.k, '(null)') AS k_a, coalesce(b.k, '(null)') AS k_b,
        | CAST(coalesce(a.n_a, -1) AS BIGINT) AS n_a,
        | CAST(coalesce(b.n_b, -1) AS BIGINT) AS n_b
        |FROM a FULL OUTER JOIN b ON a.k IS NOT DISTINCT FROM b.k
        |ORDER BY k_a, k_b""".stripMargin,
    "q47_grouping_id" ->
      """SELECT coalesce(event_type, '(all)') AS etype,
        | CAST(coalesce(user_id % 10, -1) AS BIGINT) AS user_bucket,
        | CAST(GROUPING(event_type) AS BIGINT) AS g_type,
        | CAST(GROUPING(user_id % 10) AS BIGINT) AS g_bucket,
        | CAST(GROUPING(event_type, user_id % 10) AS BIGINT) AS gid,
        | CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY ROLLUP (event_type, user_id % 10)
        |ORDER BY etype, user_bucket""".stripMargin,
    // the defining UNION ALL of unpivot: one branch per measure column
    "q46_unpivot" ->
      """WITH li AS (SELECT * FROM lineitem WHERE l_orderkey % 10 = 0)
        |SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        | 'l_quantity' AS measure, round(l_quantity, 2) AS val FROM li
        |UNION ALL
        |SELECT l_orderkey, CAST(l_linenumber AS BIGINT),
        | 'l_discount', round(l_discount, 2) FROM li
        |UNION ALL
        |SELECT l_orderkey, CAST(l_linenumber AS BIGINT),
        | 'l_tax', round(l_tax, 2) FROM li
        |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin,
    // hop assignment as pure integer micros arithmetic: every event joins
    // hops bucket(ts) and bucket(ts) - 30min (size/slide = 2)
    "q44_hopping_window" ->
      """WITH h AS (
        |  SELECT event_type, value,
        |   (epoch_us(ts) - epoch_us(ts) % 1800000000) - k * 1800000000 AS hop
        |  FROM events, (SELECT unnest(range(0, 2)) AS k))
        |SELECT CAST(hop AS BIGINT) AS hop_start_us, event_type,
        | CAST(count(*) AS BIGINT) AS n_events,
        | CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM h GROUP BY hop, event_type
        |ORDER BY hop_start_us, event_type""".stripMargin,
    "q45_range_frame" ->
      """SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
        | CAST(count(*) OVER w AS BIGINT) AS n_1h,
        | CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT) AS cents_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    // DuckDB's native LATERAL replays the per-customer dependent subquery
    "q42_lateral_join" ->
      """SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey,
        | round(t.o_totalprice, 2) AS price, CAST(t.rk AS BIGINT) AS rk
        |FROM customer c,
        |LATERAL (
        |  SELECT o_orderkey, o_totalprice,
        |    row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders o WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |ORDER BY c.c_custkey, t.rk""".stripMargin,
    // named-struct max/min replay the tie-proof argmax; arg_max/arg_min
    // replay max_by/min_by where the ordering value (orderkey) is unique
    "q43_arg_extremum" ->
      """SELECT o_custkey,
        | (max({'p': o_totalprice, 'k': o_orderkey})).k AS best_order,
        | round((max({'p': o_totalprice, 'k': o_orderkey})).p, 2) AS best_price,
        | (min({'p': o_totalprice, 'k': o_orderkey})).k AS worst_order,
        | arg_max(o_orderstatus, o_orderkey) AS last_status,
        | strftime(CAST(arg_min(o_orderdate, o_orderkey) AS DATE), '%Y-%m-%d') AS first_date,
        | CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin,
    // the NATIVE session rule: a new session starts when the gap to the
    // previous event is >= 30 min (q17's hand form uses strict >)
    "q41_session_window" ->
      """WITH w AS (
        |  SELECT user_id, ts, value,
        |   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        | f AS (
        |  SELECT *, CASE WHEN prev IS NULL
        |    OR epoch_us(ts) - epoch_us(prev) >= 1800 * 1000000
        |   THEN 1 ELSE 0 END AS ns
        |  FROM w),
        | g AS (
        |  SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM f)
        |SELECT user_id, CAST(min(epoch_us(ts)) AS BIGINT) AS sess_start_us,
        | CAST(count(*) AS BIGINT) AS n_events,
        | round(sum(value), 2) AS sess_value
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, sess_start_us""".stripMargin,
    "q37_percentiles" -> percentileDiscSql,
    "q40_percentiles_hist" -> percentileDiscSql,
    "q51_percentiles_auto" -> percentileDiscSql,
    // the same one-day filter on the RAW table — the partitioned layout
    // must be invisible in the rows
    "q39_partition_pruning" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        | CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        | round(sum(value), 2) AS sum_value
        |FROM events WHERE strftime(ts, '%Y-%m-%d') = '2024-01-15'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    // the PLAIN join — the bucketed layout must be invisible in the rows
    "q38_bucketed_join" ->
      """SELECT o_orderpriority,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        | CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
        | CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        | round(CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE)
        |   / 100.0 / count(*) + 1e-9, 4) AS avg_qty,
        | round(CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE)
        |   / 100.0 / count(*) + 1e-9, 4) AS avg_disc,
        | CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_revenue_by_nation" ->
      """SELECT r_name, n_name,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        | CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "q03_top_orders" ->
      """SELECT CAST(l_orderkey AS BIGINT) AS o_key,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate > TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY l_orderkey
        |ORDER BY revenue DESC, o_key
        |LIMIT 10""".stripMargin,
    "q04_window_topn" ->
      """SELECT p_brand, p_key, price, rn FROM (
        | SELECT p_brand, CAST(p_partkey AS BIGINT) AS p_key,
        |  round(p_retailprice, 2) AS price,
        |  CAST(row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS BIGINT) AS rn
        | FROM part) t
        |WHERE rn <= 3
        |ORDER BY p_brand, rn""".stripMargin,
    "q05_running_total" ->
      """SELECT CAST(o_custkey AS BIGINT) AS cust, CAST(o_orderkey AS BIGINT) AS okey,
        | round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running
        |FROM orders
        |ORDER BY cust, okey""".stripMargin,
    "q06_semi_join" ->
      """SELECT CAST(c_custkey AS BIGINT) AS cust, c_name, c_mktsegment
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 50000.0)
        |ORDER BY cust""".stripMargin,
    "q07_anti_join" ->
      """SELECT CAST(c_custkey AS BIGINT) AS cust, c_name
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        |ORDER BY cust""".stripMargin,
    "q08_set_ops" ->
      """WITH cn AS (SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS k FROM customer),
        | sn AS (SELECT DISTINCT CAST(s_nationkey AS BIGINT) AS k FROM supplier)
        |SELECT 'union' AS op, k FROM (SELECT k FROM cn UNION SELECT k FROM sn)
        |UNION ALL SELECT 'intersect' AS op, k FROM (SELECT k FROM cn INTERSECT SELECT k FROM sn)
        |UNION ALL SELECT 'except' AS op, k FROM (SELECT k FROM cn EXCEPT SELECT k FROM sn)
        |ORDER BY op, k""".stripMargin,
    "q09_distinct_agg" ->
      """SELECT l_returnflag,
        | CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
        | CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_part,
        | CAST(count(*) AS BIGINT) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q10_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag, coalesce(l_linestatus, 'ALL') AS status,
        | round(sum(l_quantity), 2) AS sum_qty, CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin,
    "q11_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status, coalesce(o_orderpriority, 'ALL') AS priority,
        | round(sum(o_totalprice), 2) AS total, CAST(count(*) AS BIGINT) AS n
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "q12_scalar_funcs" ->
      """SELECT CAST(p_partkey AS BIGINT) AS p_key,
        | upper(p_brand) AS brand_u,
        | substring(p_name, 1, 12) AS name12,
        | CAST(length(p_name) AS BIGINT) AS name_len,
        | concat_ws('|', p_brand, p_type) AS brand_type,
        | round(abs(p_retailprice - 1000.0), 2) AS absdiff,
        | CAST(p_size % 7 AS BIGINT) AS size_mod7
        |FROM part ORDER BY p_key""".stripMargin,
    "q13_date_funcs" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS okey,
        | CAST(year(o_orderdate) AS BIGINT) AS yr,
        | CAST(month(o_orderdate) AS BIGINT) AS mo,
        | CAST(day(o_orderdate) AS BIGINT) AS dom,
        | CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        | strftime(CAST(date_trunc('month', o_orderdate) AS DATE), '%Y-%m-%d') AS month_start,
        | CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since,
        | strftime(CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE), '%Y-%m-%d') AS plus3m
        |FROM orders ORDER BY okey""".stripMargin,
    "q14_conditional_agg" ->
      """SELECT user_id,
        | round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END), 2) AS purchase_value,
        | CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
        | round(max(value), 2) AS max_value,
        | round(min(value), 2) AS min_value,
        | CAST(count(*) AS BIGINT) AS n_events
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q15_json_extract" ->
      """SELECT CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS BIGINT) AS k,
        | CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1 ORDER BY k""".stripMargin,
    "q16_tumbling_daily" ->
      """SELECT strftime(CAST(date_trunc('day', ts) AS DATE), '%Y-%m-%d') AS day, event_type,
        | CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,
    "q17_sessionize" ->
      """WITH g AS (
        | SELECT user_id, value, epoch_us(ts) AS us,
        |  lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        | FROM events),
        | f AS (
        | SELECT user_id, value, us,
        |  CASE WHEN prev_us IS NULL OR us - prev_us > 1800 * 1000000 THEN 1 ELSE 0 END AS new_sess
        | FROM g),
        | x AS (
        | SELECT user_id, value,
        |  CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY us
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_idx
        | FROM f)
        |SELECT user_id, sess_idx, CAST(count(*) AS BIGINT) AS n_events,
        | round(sum(value), 2) AS sess_value
        |FROM x GROUP BY user_id, sess_idx ORDER BY user_id, sess_idx""".stripMargin,
    "q18_range_join" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_shipped_90d
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | AND l_shipdate >= o_orderdate AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q19_asof_join" ->
      """WITH w AS (
        | SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
        |  max(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_us
        | FROM events)
        |SELECT event_id, user_id, us - last_click_us AS us_since_click
        |FROM w WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,
    "q20_stats" ->
      """SELECT event_type,
        | round(stddev_samp(value), 4) AS sd,
        | round(var_samp(value), 4) AS variance,
        | round(corr(value, CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS DOUBLE)), 4) + 0.0 AS corr_vk,
        | round(quantile_cont(value, 0.5), 4) AS median_v,
        | CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q21_top_users_daily" ->
      """SELECT day, user_id, total, rk FROM (
        | SELECT day, user_id, total,
        |  CAST(row_number() OVER (PARTITION BY day ORDER BY total DESC, user_id) AS BIGINT) AS rk
        | FROM (
        |  SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, user_id, round(sum(value), 2) AS total
        |  FROM events GROUP BY 1, 2) d) t
        |WHERE rk <= 5 ORDER BY day, rk""".stripMargin,
    "q22_grouping_sets" ->
      """SELECT coalesce(event_type, 'ALL') AS etype,
        | coalesce(CAST(user_id % 10 AS BIGINT), -1) AS user_bucket,
        | CAST(count(*) AS BIGINT) AS n,
        | round(sum(value), 2) AS sum_value
        |FROM events
        |GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())
        |ORDER BY etype, user_bucket""".stripMargin,
    "q23_pivot" ->
      """SELECT user_id,
        | coalesce(round(sum(CASE WHEN event_type = 'click' THEN value END), 2), 0.0) AS click_v,
        | coalesce(round(sum(CASE WHEN event_type = 'error' THEN value END), 2), 0.0) AS error_v,
        | coalesce(round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2), 0.0) AS purchase_v,
        | coalesce(round(sum(CASE WHEN event_type = 'signup' THEN value END), 2), 0.0) AS signup_v,
        | coalesce(round(sum(CASE WHEN event_type = 'view' THEN value END), 2), 0.0) AS view_v
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q24_explode" ->
      """SELECT tok, CAST(count(*) AS BIGINT) AS n FROM (
        | SELECT unnest(list_filter(string_split_regex(text, '\s+'), x -> length(x) > 0)) AS tok
        | FROM documents)
        |GROUP BY tok ORDER BY n DESC, tok LIMIT 100""".stripMargin,
    "q25_array_funcs" ->
      """SELECT vec_id,
        | round(list_max(v), 4) AS v_max,
        | round(list_min(v), 4) AS v_min,
        | round(list_sum(v) / len(v), 4) + 0.0 AS v_avg,
        | round(sqrt(list_sum(list_transform(v, x -> x * x))), 4) AS l2,
        | CAST(len(list_filter(v, x -> x > 0)) AS BIGINT) AS n_pos
        |FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        |ORDER BY vec_id""".stripMargin,
    "q27_full_outer" ->
      """WITH cn AS (
        |  SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_cust
        |  FROM customer WHERE c_mktsegment = 'BUILDING' GROUP BY c_nationkey),
        | sn AS (
        |  SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_supp
        |  FROM supplier WHERE s_acctbal > 5000.0 GROUP BY s_nationkey)
        |SELECT CAST(coalesce(c_nationkey, s_nationkey) AS BIGINT) AS nkey,
        | coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
        |FROM cn FULL OUTER JOIN sn ON c_nationkey = s_nationkey
        |ORDER BY nkey""".stripMargin,
    "q28_cross_join" ->
      """SELECT r_name, status, r_name || '-' || status AS label
        |FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus AS status FROM orders)
        |ORDER BY r_name, status""".stripMargin,
    "q29_corr_subquery" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS okey, CAST(o_custkey AS BIGINT) AS cust,
        | round(o_totalprice, 2) AS price, ratio
        |FROM (
        | SELECT o_orderkey, o_custkey, o_totalprice,
        |  round(o_totalprice / (
        |    SELECT CAST(sum(CAST(round(o2.o_totalprice * 100) AS BIGINT)) AS DOUBLE)
        |           / 100.0 / count(*)
        |    FROM orders o2 WHERE o2.o_custkey = orders.o_custkey), 4) AS ratio
        | FROM orders) t
        |WHERE ratio > 1.5 ORDER BY okey""".stripMargin,
    "q30_analytic_funcs" ->
      """SELECT CAST(o_custkey AS BIGINT) AS cust, CAST(o_orderkey AS BIGINT) AS okey,
        | round(lag(o_totalprice, 1) OVER w, 2) AS prev_price,
        | round(lead(o_totalprice, 1) OVER w, 2) AS next_price,
        | round(first_value(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS first_price,
        | CAST(ntile(4) OVER w AS BIGINT) AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY cust, okey""".stripMargin,
    "q31_string_funcs" ->
      """SELECT CAST(p_partkey AS BIGINT) AS p_key,
        | regexp_replace(p_name, '[aeiou]', '', 'g') AS novowels,
        | lpad(p_brand, 12, '*') AS brand_pad,
        | reverse(p_type) AS type_rev,
        | translate(p_brand, 'AEIOU', '12345') AS brand_tr,
        | CAST(strpos(p_name, 'a') AS BIGINT) AS first_a,
        | split_part(p_type, ' ', 1) AS type_head
        |FROM part ORDER BY p_key""".stripMargin,
    "q32_variant" ->
      """SELECT CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS BIGINT) AS k,
        | round(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
        |   / 100.0 / count(*) + 1e-9, 4) AS avg_value, CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY 1 ORDER BY k""".stripMargin,
    "q33_theta_join" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS nkey, n_name, r_name
        |FROM nation JOIN region ON n_regionkey < r_regionkey
        |ORDER BY nkey, r_name""".stripMargin,
    "q34_zorder" -> {
      val interleave = (0 until 10).flatMap(i => Seq(
        s"(((xk >> $i) & 1) << ${2 * i})", s"(((yk >> $i) & 1) << ${2 * i + 1})"))
        .mkString(" | ")
      s"""WITH b AS (
         |  SELECT l_orderkey % 1024 AS xk, l_partkey % 1024 AS yk FROM lineitem),
         | z AS (SELECT xk, yk, ($interleave) AS zkey FROM b)
         |SELECT zkey >> 14 AS bucket, CAST(count(*) AS BIGINT) AS n,
         | min(xk) AS x_min, max(xk) AS x_max, min(yk) AS y_min, max(yk) AS y_max
         |FROM z GROUP BY bucket ORDER BY bucket""".stripMargin
    },
    "q35_funnel" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS v_ts FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        | c AS (
        |  SELECT e.user_id, min(e.ts) AS c_ts
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.v_ts
        |  GROUP BY e.user_id),
        | p AS (
        |  SELECT e.user_id, min(e.ts) AS p_ts
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
        |  GROUP BY e.user_id)
        |SELECT v.user_id,
        | strftime(v.v_ts, '%Y-%m-%d %H:%M:%S') AS view_ts,
        | strftime(c.c_ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
        | strftime(p.p_ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
        | CAST(1 + CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END
        |        + CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS depth
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |       LEFT JOIN p ON v.user_id = p.user_id
        |ORDER BY v.user_id""".stripMargin,
    "q36_salted_join" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS line_no,
        | l_partkey, p_name, round(p_retailprice, 2) AS price
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_quantity > 45.0
        |ORDER BY l_orderkey, line_no""".stripMargin)
}
