package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All tables are parquet; loading through here keeps the scan declarative so
  * Catalyst applies predicate pushdown and column pruning — at 100 TB the scan
  * must only read the columns/rows each query touches.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    normalizeTs(spark.read.parquet(s"$dir/$name.parquet"))

  /** Normalize the driver-generated `ts` column to session-zoned TIMESTAMP
    * across the encodings the generator has produced:
    *  - TIMESTAMP(NANOS): no native Spark type — read as LongType via
    *    spark.sql.legacy.parquet.nanosAsLong (set in GraftSession/Verify/
    *    Bench) and converted here. Integer `div` keeps full precision — a
    *    double round-trip would corrupt µs at 1e18 ns.
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): reads natively as
    *    TIMESTAMP_NTZ; cast interprets the wall-clock in the session zone
    *    (UTC everywhere here), matching both the nanos path's instants and
    *    DuckDB's naive-timestamp oracle reads.
    * Already-LTZ data passes through untouched. */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }

  /** Load a table and ensure downstream per-row CPU work can use the whole
    * cluster: when the scan yields fewer splits than the available
    * parallelism (tiny files / single parquet row group — exactly the local
    * test fixture), round-robin repartition; otherwise leave the scan's
    * natural partitioning alone.
    *
    * At 100 TB the scan produces thousands of row-group splits and this is a
    * deliberate NO-OP — an unconditional repartition there would shuffle the
    * entire corpus for nothing. The condition is what makes the helper safe
    * to use on every CPU-bound chain (tokenize/shingle/hash, vector math).
    */
  def loadSpread(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = load(spark, dir, name)
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Register every table as a temp view for `spark.sql` surfaces. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Content fingerprint of `<dir>/<table>.parquet`: name+length+mtime of
    * every part file PLUS the last 4 KiB of each part (the thrift-encoded
    * parquet footer — row-group stats + schema, content-dependent), so a
    * same-sized regeneration inside one mtime tick still changes the
    * address. A stat walk + one bounded tail read per part, never a data
    * scan. Tolerates parts vanishing or shrinking mid-walk (concurrent
    * regeneration): the stat triple already folded in changes the digest
    * on the next call. */
  def tableFingerprint(dir: String, table: String): String = {
    val root = new java.io.File(dir, s"$table.parquet")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).fold(Seq.empty[java.io.File])(
          _.toSeq.sortBy(_.getName).flatMap(walk))
      else Seq(f)
    val md = java.security.MessageDigest.getInstance("MD5")
    walk(root).foreach { p =>
      md.update(s"${p.getName}:${p.length}:${p.lastModified};"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val len = p.length
      if (p.getName.endsWith(".parquet") && len > 0) {
        try {
          val raf = new java.io.RandomAccessFile(p, "r")
          try {
            val n = math.min(4096L, len).toInt
            raf.seek(len - n)
            val tail = new Array[Byte](n)
            raf.readFully(tail)
            md.update(tail)
          } finally raf.close()
        } catch { case _: java.io.IOException => () }
      }
    }
    md.digest().map("%02x".format(_)).mkString
  }

  /** Short stable hash of a source data dir's canonical path — folded into
    * every persisted-store name so entries for DIFFERENT dirs coexist on
    * disk. Fingerprints legitimately differ across dirs (a gate JVM on
    * sf0.001 and a bench JVM on sf1 run concurrently); before this, each
    * publish evicted the OTHER dir's live table, so a reader mid-scan could
    * hit FileNotFoundException and sequential alternation between dirs
    * rebuilt the table every run (round-15 ADVICE #1). Eviction now only
    * matches entries for the SAME dir (superseded generations of the same
    * data under one path — the case eviction exists for). */
  private[graft] def dirHash(dir: String): String = {
    val canonical =
      try new java.io.File(dir).getCanonicalPath
      catch { case _: java.io.IOException => dir }
    // 16 hex chars (64 bits): at 8 (32 bits) a birthday collision between
    // two data dirs silently reintroduces the cross-dir mutual-eviction /
    // stale-read bug this hash exists to prevent (round-16 ADVICE #2); the
    // name-length cost is negligible and the legacy-entry regexes
    // disambiguate by segment count, not segment length
    java.security.MessageDigest.getInstance("MD5")
      .digest(canonical.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(16)
  }

  /** Content-addressed persisted DERIVED table under
    * `${java.io.tmpdir}/graft_derived/<name>-<dirHash>-<fp>`: built AT MOST
    * ONCE per source-table content (the q38 layout / ANN code-table
    * discipline — Bench times the one-time build in its `sigs`/`layout`
    * sections; the sweeps then measure the plans a deployment re-runs
    * against the stored relation). Published via temp-sibling + atomic
    * rename, so a concurrent gate/bench JVM never reads a half-written
    * table — it either sees the completed directory or builds its own temp
    * and loses the rename race benignly (identical content). Superseded
    * generations of the same `name` FOR THE SAME SOURCE DIR are evicted on
    * publish ([[dirHash]] scoping — different dirs coexist). Every
    * parameter that changes the produced rows must be folded into `name`;
    * trained-model addressing is [[graft.ext.Similarity]]'s cachedCodes
    * (model-fingerprint half).
    *
    * `family`: when a PARAMETER rides in the name (the bucket table's
    * adaptive width — `s02bucket_w8` vs `s02bucket_w9`), same-name
    * eviction alone leaks the sibling: a regenerated corpus that crosses
    * the width boundary publishes a fresh `_w9` store but the stale `_w8`
    * entry (a full copy of the float corpus) never matches the new name
    * and lives forever in tmpdir (round-17 ADVICE #1). Passing the
    * parameter-free prefix as `family` widens eviction to EVERY
    * `<family>*-<dirHash>-*` sibling of the same source dir except the
    * entry just published — safe because one dir has exactly one live
    * parameterization (the parameter is a function of the data). */
  def cachedDerived(s: SparkSession, dir: String, table: String,
      name: String, family: Option[String] = None)(build: => DataFrame)
      : DataFrame = {
    val dh = dirHash(dir)
    val fp = tableFingerprint(dir, table)
    val root = new java.io.File(sys.props("java.io.tmpdir"), "graft_derived")
    val path = new java.io.File(root, s"$name-$dh-$fp")
    require(family.forall(name.startsWith),
      s"family must prefix the store name, got family=$family name=$name")
    // the '<family><digits>' contract validates BEFORE any build/publish
    // work (round-19 ADVICE #1: validating on the eviction path let a
    // contract-violating name publish its store first and skip validation
    // entirely on cached reads): a family store's param segment must be
    // all digits — every family caller parameterizes by an integer width —
    // so a future store that merely SHARES the family prefix with a
    // non-numeric suffix is never mistaken for an eviction sibling
    require(family.forall(f =>
        name.substring(f.length).forall(_.isDigit) &&
          name.length > f.length),
      s"family stores must be '<family><digits>', got family=$family name=$name")
    if (!new java.io.File(path, "_SUCCESS").isFile) {
      val tmp = new java.io.File(root,
        s".tmp-$name-$dh-$fp-${java.util.UUID.randomUUID}")
      build.write.mode("overwrite").parquet(tmp.getPath)
      if (!tmp.renameTo(path) && !new java.io.File(path, "_SUCCESS").isFile) {
        deleteRecursively(path); tmp.renameTo(path): Unit
      }
      if (tmp.isDirectory) deleteRecursively(tmp)
      // legacy entries are unreachable under the current naming — clean
      // them up too (segment lengths disambiguate: pre-dirHash rounds wrote
      // `<name>-<32-hex fp>`, the round-16 8-hex dir hash wrote
      // `<name>-<8-hex dh>-<32-hex fp>`; current is 16-hex dh + 32-hex fp)
      val legacy = s"\\Q$name\\E-(?:[0-9a-f]{8}-)?[0-9a-f]{32}".r
      // sibling parameterizations of the same family for the SAME dir
      // (`<family><param>-<16-hex dh>-<32-hex fp>`), plus legacy-format
      // siblings of ANY width (pre-dirHash / 8-hex-dh names are unreachable
      // under current naming, so deleting them regardless of dir is safe —
      // same rationale as `legacy` above). The digits-only param segment is
      // guaranteed by the entry require above (round-18 ADVICE #1).
      val sibling = family.map(f =>
        (s"\\Q$f\\E\\d+-\\Q$dh\\E-[0-9a-f]{32}" +
          s"|\\Q$f\\E\\d+-(?:[0-9a-f]{8}-)?[0-9a-f]{32}").r)
      Option(root.listFiles()).getOrElse(Array.empty).foreach { f =>
        val n = f.getName
        if (((n.startsWith(s"$name-$dh-") ||
              sibling.exists(_.matches(n))) && n != s"$name-$dh-$fp") ||
            legacy.matches(n))
          deleteRecursively(f)
      }
    }
    s.read.parquet(path.getPath)
  }

  /** Read-only REGISTRY PROBE of the [[cachedDerived]] store: does a
    * COMPLETE (`_SUCCESS`-committed) derived artifact named `name` exist
    * for the CURRENT content of `<dir>/<table>.parquet`? Never builds —
    * the probe is the evidence side of "is this index already
    * maintained?" routing decisions (round-19 verdict #2: the fusion
    * router's `graphMaintained` flag was caller-asserted; a stale
    * assertion silently served a full graph build). Content-addressed by
    * construction: a regenerated dir changes [[tableFingerprint]], so a
    * stale artifact answers `false`, never "fresh". */
  def derivedExists(dir: String, table: String, name: String): Boolean = {
    val root = new java.io.File(sys.props("java.io.tmpdir"), "graft_derived")
    val path = new java.io.File(root,
      s"$name-${dirHash(dir)}-${tableFingerprint(dir, table)}")
    new java.io.File(path, "_SUCCESS").isFile
  }

  /** Row count of `<dir>/<table>.parquet`, memoized per JVM on the
    * stat+footer [[tableFingerprint]] — the adaptive-banding width probes
    * (s02/s12/s24/s26's `bucketPlanes`/`adaptivePlanes`) each paid one
    * exact count() job per query invocation on the SAME unchanged dir
    * (round-15 verdict #3). Parquet footer counts make the job cheap, but
    * repeated invocations in one JVM (bench min-of-3 sweeps, the gate's
    * query list) now skip it entirely; a regenerated dir changes the
    * fingerprint and recounts. Superseded generations evict like
    * [[graft.ext.Similarity]]'s modelCache. */
  def cachedCount(s: SparkSession, dir: String, table: String): Long = {
    val prefix = s"$table:${dirHash(dir)}:"
    val key = prefix + tableFingerprint(dir, table)
    countCache.keySet.removeIf(k => k.startsWith(prefix) && k != key)
    countCache.computeIfAbsent(key, _ => load(s, dir, table).count())
      .longValue()
  }
  private val countCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(): Unit
  }
}
