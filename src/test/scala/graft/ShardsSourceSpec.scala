package graft

import java.nio.file.{Files, Path, StandardOpenOption}

/** DSv2 micro-batch source spec: the Kinesis-consumer contract — per-shard
  * sequence replay, incremental GetRecords-style batches, and exact resume
  * from checkpointed offsets across a restart. */
class ShardsSourceSpec extends SparkSpec {
  import spark.implicits._

  private def append(dir: Path, shard: String, lines: String*): Unit =
    Files.writeString(dir.resolve(shard),
      lines.mkString("", "\n", "\n"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)

  test("replays shards with per-shard sequence numbers; appends arrive incrementally") {
    val dir = Files.createTempDirectory("graft-shards")
    val ck = Files.createTempDirectory("graft-shards-ck")
    append(dir, "shard-a.ndjson", """{"n":1}""", """{"n":2}""")
    append(dir, "shard-b.ndjson", """{"n":10}""")

    val q = spark.readStream.format("graft-shards").load(dir.toString)
      .writeStream.format("memory").queryName("shards_out")
      .option("checkpointLocation", ck.toString).start()
    try {
      q.processAllAvailable()
      val first = spark.table("shards_out")
        .select($"shard", $"seq", $"data").as[(String, Long, String)].collect().sorted
      assert(first.toSeq == Seq(
        ("shard-a.ndjson", 0L, """{"n":1}"""), ("shard-a.ndjson", 1L, """{"n":2}"""),
        ("shard-b.ndjson", 0L, """{"n":10}""")))

      append(dir, "shard-a.ndjson", """{"n":3}""")
      append(dir, "shard-c.ndjson", """{"n":100}""") // new shard mid-stream
      q.processAllAvailable()
      val all = spark.table("shards_out")
        .select($"shard", $"seq").as[(String, Long)].collect().sorted
      assert(all.toSeq == Seq(
        ("shard-a.ndjson", 0L), ("shard-a.ndjson", 1L), ("shard-a.ndjson", 2L),
        ("shard-b.ndjson", 0L), ("shard-c.ndjson", 0L)),
        "appends deliver exactly the new sequence range, once")
    } finally q.stop()
  }

  test("restart resumes from the checkpointed offsets, not from scratch") {
    val dir = Files.createTempDirectory("graft-shards2")
    val ck = Files.createTempDirectory("graft-shards2-ck")
    val out = Files.createTempDirectory("graft-shards2-out")
    append(dir, "shard-a.ndjson", "r0", "r1")

    def run(): Unit = {
      val q = spark.readStream.format("graft-shards").load(dir.toString)
        .writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", ck.toString).start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(spark.read.parquet(out.toString).count() == 2)

    append(dir, "shard-a.ndjson", "r2")
    run() // new query, SAME checkpoint: must consume only the tail
    val all = spark.read.parquet(out.toString)
      .select($"seq", $"data").as[(Long, String)].collect().sorted
    assert(all.toSeq == Seq((0L, "r0"), (1L, "r1"), (2L, "r2")),
      s"exactly-once across restart; got $all")
  }

  test("full pipeline: graft-shards source -> publish transform -> graft-streams sink") {
    // the reference's whole deployment in one streaming query: tail shard
    // files (beat ≈ producer), encode + key (Publish path), deliver to the
    // Kinesis-shaped sink — both ends DSv2 formats of this engine.
    RegistryPutter.got.clear()
    val dir = Files.createTempDirectory("graft-e2e-shards")
    val ck = Files.createTempDirectory("graft-e2e-ck")
    append(dir, "shard-a.ndjson", """{"host":"web-1","msg":"m1"}""")
    append(dir, "shard-b.ndjson", """{"host":"web-2","msg":"m2"}""")

    val cfg = graft.config.StreamsConfig(
      region = "us-east-1", streamName = "t", partitionKey = "host")
    val eventSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("host", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("msg", org.apache.spark.sql.types.StringType)))
    val events = spark.readStream.format("graft-shards").load(dir.toString)
      .select(org.apache.spark.sql.functions.from_json($"data", eventSchema).as("e"))
      .select($"e.host", $"e.msg")
    val (records, _) = graft.streaming.Pipeline.publishTransform(events, cfg)
    val q = records.writeStream.format("graft-streams")
      .option("region", "us-east-1").option("stream_name", "t")
      .option("putter.class", classOf[RegistryPutter].getName)
      .option("checkpointLocation", ck.toString).start()
    try q.processAllAvailable() finally q.stop()

    val recs = RegistryPutter.got.toArray(Array.empty[graft.sink.BatchPut.Record])
    assert(recs.map(_.key).sorted.toSeq == Seq("web-1", "web-2"))
    assert(recs.forall(r => new String(r.data, "UTF-8").endsWith("\n")))
  }

  test("batch replay works and column pruning reaches the source") {
    val dir = Files.createTempDirectory("graft-shards3")
    append(dir, "shard-a.ndjson", "x", "y", "z")
    append(dir, "shard-b.ndjson", "w")
    graft.sources.GraftShardsProvider.lastPrunedSchema
      .set(graft.sources.GraftShardsProvider.schema)
    val got = spark.read.format("graft-shards").load(dir.toString)
      .select($"shard", $"seq") // data unused -> prunable
      .as[(String, Long)].collect().sorted
    assert(got.toSeq == Seq(("shard-a.ndjson", 0L), ("shard-a.ndjson", 1L),
      ("shard-a.ndjson", 2L), ("shard-b.ndjson", 0L)))
    val pruned = graft.sources.GraftShardsProvider.lastPrunedSchema.get().fieldNames.toSeq
    assert(!pruned.contains("data"),
      s"optimizer should have pruned the payload column, got $pruned")
  }

  test("shard predicate pushdown prunes InputPartitions (batch)") {
    val dir = Files.createTempDirectory("graft-shards4")
    append(dir, "shard-a.ndjson", "a0", "a1")
    append(dir, "shard-b.ndjson", "b0")
    append(dir, "shard-c.ndjson", "c0", "c1", "c2")
    graft.sources.GraftShardsProvider.lastPushedShards.set(None)
    val one = spark.read.format("graft-shards").load(dir.toString)
      .where($"shard" === "shard-b.ndjson")
    // the scan itself must plan exactly one partition — the filter reached
    // the source, it is not a post-scan filter over all three shards
    assert(one.rdd.getNumPartitions == 1,
      "equality predicate on shard must plan a single InputPartition")
    assert(one.select($"seq", $"data").as[(Long, String)].collect().toSeq
      == Seq((0L, "b0")))
    assert(graft.sources.GraftShardsProvider.lastPushedShards.get()
      == Some(Set("shard-b.ndjson")))

    // IN-list prunes to the named subset; conjunction intersects
    graft.sources.GraftShardsProvider.lastPushedShards.set(None)
    val two = spark.read.format("graft-shards").load(dir.toString)
      .where($"shard".isin("shard-a.ndjson", "shard-c.ndjson"))
    assert(two.rdd.getNumPartitions == 2)
    assert(two.count() == 5)

    // non-shard predicates are NOT absorbed: seq filter still applies
    val rest = spark.read.format("graft-shards").load(dir.toString)
      .where($"shard" === "shard-c.ndjson" && $"seq" >= 1)
      .select($"data").as[String].collect().sorted
    assert(rest.toSeq == Seq("c1", "c2"))
  }

  test("shards subscription option confines the stream: pruned shards never counted") {
    // Streaming cannot rely on filter pushdown for offset tracking (Spark
    // builds the MicroBatchStream before pushdown runs), so a shard subset
    // is subscribed EXPLICITLY — the Kinesis consumer model.
    val dir = Files.createTempDirectory("graft-shards5")
    val ck = Files.createTempDirectory("graft-shards5-ck")
    append(dir, "shard-a.ndjson", """{"n":1}""", """{"n":2}""")
    append(dir, "shard-b.ndjson", """{"n":10}""")
    val q = spark.readStream.format("graft-shards")
      .option("shards", "shard-a.ndjson")
      .load(dir.toString)
      .writeStream.format("memory").queryName("shards_pruned")
      .option("checkpointLocation", ck.toString).start()
    try {
      q.processAllAvailable()
      val got = spark.table("shards_pruned")
        .select($"shard", $"seq").as[(String, Long)].collect().sorted
      assert(got.toSeq == Seq(("shard-a.ndjson", 0L), ("shard-a.ndjson", 1L)))
      // the offset log records only the subscribed shard: shard-b was never
      // line-counted, the streaming twin of partition pruning
      val lastOffset = Files.readAllLines(ck.resolve("offsets").toFile.listFiles()
        .map(_.toPath).maxBy(_.getFileName.toString)).toArray.mkString("\n")
      assert(lastOffset.contains("shard-a.ndjson") && !lastOffset.contains("shard-b.ndjson"),
        s"offset log must track only the kept shard, got: $lastOffset")
    } finally q.stop()
  }

  test("continuous mode tails shards: rows arrive without a trigger boundary") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = Files.createTempDirectory("graft-shards6")
    val ck = Files.createTempDirectory("graft-shards6-ck")
    append(dir, "shard-a.ndjson", "a0", "a1")
    append(dir, "shard-b.ndjson", "b0")
    val q = spark.readStream.format("graft-shards").load(dir.toString)
      .writeStream.format("memory").queryName("shards_cont")
      .trigger(Trigger.Continuous("200 milliseconds"))
      .option("checkpointLocation", ck.toString).start()
    def rowsWithin(n: Int, deadlineMs: Long): Boolean = {
      val t0 = System.currentTimeMillis()
      while (spark.table("shards_cont").count() < n) {
        if (System.currentTimeMillis() - t0 > deadlineMs) return false
        Thread.sleep(100)
      }
      true
    }
    try {
      assert(rowsWithin(3, 30000), "initial shard contents must stream through")
      // the long-running tasks tail the files: an append surfaces with no
      // new micro-batch being planned
      append(dir, "shard-a.ndjson", "a2")
      assert(rowsWithin(4, 30000), "appended line must surface mid-epoch")
      val got = spark.table("shards_cont")
        .select($"shard", $"seq", $"data").as[(String, Long, String)].collect().sorted
      assert(got.toSeq == Seq(
        ("shard-a.ndjson", 0L, "a0"), ("shard-a.ndjson", 1L, "a1"),
        ("shard-a.ndjson", 2L, "a2"), ("shard-b.ndjson", 0L, "b0")))
    } finally q.stop()
  }

  test("offsets serialize round-trip through the offset log format") {
    import graft.sources.ShardOffsets
    val o = ShardOffsets(Map("shard-a.ndjson" -> 12L, "shard-b.ndjson" -> 7L))
    assert(ShardOffsets.parse(o.json()) == o)
    assert(ShardOffsets.parse("") == ShardOffsets(Map.empty))
  }
}
