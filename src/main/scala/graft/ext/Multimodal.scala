package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media (image/audio/video) modeled as opaque
  * `BinaryType` payloads plus a typed metadata struct, with decode /
  * feature-extract implemented as distributed per-partition transforms.
  *
  * IMAGES decode for real via the JDK's built-in `javax.imageio.ImageIO`
  * (PNG/JPEG/BMP/GIF — `java.desktop`, zero external deps): [[decodeImage]] /
  * [[resizeImage]], exercised per-partition by [[decodeFeatures]] /
  * [[resize]]. Payloads ImageIO cannot read (audio, video, arbitrary bytes)
  * fall back to the clearly-marked deterministic STUBs
  * ([[stubDecode]]/[[stubResize]]) — only those codecs are genuinely
  * environment-blocked; the Spark-side plumbing (schema, batching,
  * partitioning, transform signatures) is real and tested either way
  * (MultimodalSpec). LLM-pipeline extension (SURVEY.md §2.8 scope).
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  /** Canonical media schema: opaque bytes + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", LongType, nullable = false),
      StructField("digest", StringType, nullable = false))), nullable = false)))

  /** Decoded-feature schema appended by [[decodeFeatures]]. */
  val featureSchema: StructType = StructType(mediaSchema.fields ++ Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))

  /** Build a media DataFrame from `documents` by treating the UTF-8 bytes as
    * an opaque payload — the plumbing twin of reading real image/audio blobs. */
  def mediaFrom(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select(
        $"doc_id".as("media_id"),
        lit("text").as("kind"),
        encode($"text", "utf-8").as("payload"))
      .withColumn("meta", struct(
        octet_length($"payload").cast("long").as("n_bytes"),
        md5($"payload").as("digest")))
  }

  /** ImageIO's default read path wraps every InputStream in a DISK-backed
    * cache file (useCache=true) — one temp-file create/write/delete per
    * payload per row inside mapPartitions, for bytes that are already in
    * memory. Flipping the JVM-wide flag once keeps decodes heap-only. */
  private lazy val imageIoNoDiskCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** Real image decode via JDK ImageIO: (width, height, n_frames=1) for any
    * payload ImageIO can read (PNG/JPEG/BMP/GIF), None otherwise so callers
    * fall back to [[stubDecode]]. Runs on executors inside the mapPartitions
    * transforms — headless-safe, no display needed. */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Int)] =
    try {
      imageIoNoDiskCache
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None else Some((img.getWidth, img.getHeight, 1))
    } catch { case _: Exception => None }

  /** Real image resample via Graphics2D bilinear draw onto a w×h RGB raster,
    * re-encoded as PNG; None when the payload is not a decodable image so
    * callers fall back to [[stubResize]]. Deterministic on a given JDK (the
    * spec pins the thumbnail digest). */
  def resizeImage(payload: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    try {
      imageIoNoDiskCache
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val out = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
        g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        Some(bos.toByteArray)
      }
    } catch { case _: Exception => None }

  /** STUB decoder — the fallback for payloads ImageIO cannot read (audio /
    * video / arbitrary bytes; those codec libraries are not in this
    * container). Derives deterministic fake dimensions from the payload so
    * the distributed plumbing (per-partition batch transform, schema
    * evolution, no driver collect) is exercised end-to-end regardless of
    * payload kind. */
  def stubDecode(payload: Array[Byte]): (Int, Int, Int) = {
    // ??? <- real audio/video decoder goes here; deterministic fake below.
    val n = payload.length
    (64 + n % 512, 64 + (n / 7) % 512, 1 + n % 30)
  }

  /** Distributed decode/feature-extract: mapPartitions over Rows so each
    * executor batch-decodes its partition locally (the Scala analogue of a
    * `mapInPandas` batch UDF). Images decode for real ([[decodeImage]]);
    * everything else takes the stub fallback. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    media.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val (w, h, f) = decodeImage(payload).getOrElse(stubDecode(payload))
        Row.fromSeq(r.toSeq ++ Seq(w, h, f))
      }
    }(enc)
  }

  /** STUB resize — the fallback for non-image payloads: a deterministic
    * digest-derived thumbnail payload, so the binary-in/binary-out
    * per-partition transform shape is exercised for every payload kind. */
  def stubResize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    // ??? <- real audio/video resample goes here; deterministic fake below.
    val d = java.security.MessageDigest.getInstance("MD5")
    d.update(payload); d.update(s":$w:$h".getBytes("UTF-8"))
    d.digest()
  }

  /** Distributed resize: appends (thumb BINARY, thumb_w, thumb_h). Same
    * mapPartitions batch shape a Pandas-UDF decode would use. Images
    * resample for real ([[resizeImage]]); everything else takes the stub. */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame = {
    val schema = StructType(media.schema.fields ++ Seq(
      StructField("thumb", BinaryType, nullable = false),
      StructField("thumb_w", IntegerType, nullable = false),
      StructField("thumb_h", IntegerType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    media.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val thumb = resizeImage(payload, w, h).getOrElse(stubResize(payload, w, h))
        Row.fromSeq(r.toSeq ++ Seq(thumb, w, h))
      }
    }(enc)
  }

  /** Frame sampling: one output row per kept frame (every `everyNth` of the
    * decoded n_frames) — a declarative explode over the decoded frame count,
    * so Catalyst handles the fan-out; the per-frame payload is the stub
    * decode of (payload digest, frame_idx). */
  def sampleFrames(decoded: DataFrame, everyNth: Int): DataFrame = {
    require(everyNth >= 1)
    decoded
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyNth))))
      .withColumn("frame_digest",
        md5(concat(col("meta.digest"), lit(":"), col("frame_idx").cast("string"))))
      .select(col("media_id"), col("frame_idx"), col("frame_digest"))
  }

  /** Chunked transport: split each payload into fixed-size chunk ROWS
    * (media_id, chunk_idx, n_chunks, chunk, chunk_digest). Chunk rows keep
    * every shuffle/scan unit bounded at `chunkBytes` and spread one asset
    * across partitions. Declarative explode (sequence + substring), so
    * Catalyst owns the fan-out.
    *
    * PRECONDITION — cell cap: the input payload is already ONE BinaryType
    * cell, so it is capped at ~2 GiB by JVM array limits; this operator
    * re-shapes an in-plan payload for transport, it cannot INGEST an asset
    * past the cap. Assets larger than a cell must enter as chunk rows
    * directly from storage via [[readChunked]] (the `graft-chunks` DSv2
    * source plans offset ranges from file lengths and never materializes a
    * whole asset). The chunk offset is range-guarded: a payload long enough
    * to wrap the substring offset past 2³¹ raises an error instead of
    * silently wrapping. A null payload survives as one empty chunk (every
    * media_id crosses the transport; m01-style null handling). */
  def chunk(media: DataFrame, chunkBytes: Int): DataFrame = {
    require(chunkBytes >= 1)
    media
      .withColumn("__pay", coalesce(col("payload"), lit(Array.emptyByteArray)))
      .withColumn("n_chunks",
        greatest(ceil(octet_length(col("__pay")).cast("double") / chunkBytes), lit(1))
          .cast("long"))
      .withColumn("chunk_idx", explode(sequence(lit(0L), col("n_chunks") - 1)))
      .withColumn("__off", col("chunk_idx") * chunkBytes + lit(1L))
      .withColumn("chunk",
        when(col("__off") <= Int.MaxValue,
          expr(s"substring(__pay, cast(__off as int), $chunkBytes)"))
          .otherwise(raise_error(concat(
            lit("chunk offset overflows substring's int range for media_id "),
            col("media_id").cast("string"))).cast("binary")))
      .withColumn("chunk_digest", md5(col("chunk")))
      .select(col("media_id"), col("chunk_idx"), col("n_chunks"),
        col("chunk"), col("chunk_digest"))
  }

  /** Chunked-at-ingest reader: chunk rows straight from storage through the
    * `graft-chunks` DSv2 source — same output shape as [[chunk]] with the
    * file URI as media_id — so assets beyond the single-cell cap never
    * materialize whole. See [[graft.sources.GraftChunksProvider]] for the
    * planning/split contract. */
  def readChunked(s: SparkSession, path: String, chunkBytes: Int,
      splitBytes: Long = 128L << 20): DataFrame =
    s.read.format("graft-chunks")
      .option("chunk_bytes", chunkBytes)
      .option("split_bytes", splitBytes)
      .load(path)
      .withColumn("chunk_digest", md5(col("chunk")))

  /** Reassemble [[chunk]] rows back into one payload per media_id, with the
    * digest for end-to-end verification. The in-group fold is declarative
    * (sort_array + aggregate over the collected chunk structs — one keyed
    * shuffle). NOTE: reassembly necessarily materializes the whole asset in
    * one cell again — it is for consumers that need the full payload (and
    * for round-trip verification); pipelines that can work per-chunk (frame
    * decode, rolling digests) should stay on the chunk rows. */
  def reassemble(chunks: DataFrame): DataFrame =
    chunks
      .groupBy(col("media_id"))
      .agg(collect_list(struct(col("chunk_idx"), col("chunk"))).as("__cs"))
      .select(col("media_id"),
        expr("aggregate(transform(array_sort(__cs), x -> x.chunk), " +
          "cast('' as binary), (acc, c) -> concat(acc, c))").as("payload"))
      .withColumn("digest", md5(col("payload")))

  // ---------------------------------------------------------------- m01
  /** Oracle-checked metadata extraction over the binary payload column —
    * byte length, digest, and a deterministic stub feature. The decode stub
    * itself is covered by MultimodalSpec (not SQL-expressible). */
  val m01BinaryMeta: Q = (s, dir) => {
    import s.implicits._
    mediaFrom(s, dir)
      .select(
        $"media_id",
        $"kind",
        $"meta.n_bytes".as("n_bytes"),
        $"meta.digest".as("digest"),
        ($"meta.n_bytes" % 256).as("stub_feature"))
      .orderBy($"media_id")
  }

  // ---------------------------------------------------------------- m02
  /** Oracle-checked chunked-transport accounting: per-asset chunk count and
    * the exact size split between full chunks and the tail. The byte-level
    * round-trip (chunk → reassemble == original payload+digest) is
    * MultimodalSpec's job; the oracle pins the chunk arithmetic. */
  val m02Chunking: Q = (s, dir) => {
    import s.implicits._
    chunk(mediaFrom(s, dir), chunkBytes = 100)
      .groupBy($"media_id")
      .agg(
        first($"n_chunks").as("n_chunks"),
        sum(octet_length($"chunk")).cast("long").as("total_bytes"),
        max(when($"chunk_idx" === $"n_chunks" - 1, octet_length($"chunk")))
          .cast("long").as("tail_bytes"))
      .orderBy($"media_id")
  }

  // ---------------------------------------------------------------- m03
  /** Committed multi-file fixture for the chunked-at-ingest oracle row: the
    * scale factor doesn't apply (the source under test reads RAW FILES, not
    * the parquet tables), so the query reads a fixed checked-in directory
    * and the DuckDB oracle replays it with `read_blob` over the same files.
    * The fixture pins the planner's edges: a multi-chunk file, an exact
    * chunk-multiple file, an EMPTY file (one empty chunk — every asset
    * survives transport), and a sub-chunk file.
    *
    * Resolution order (no hardcoded checkout path): `-Dgraft.chunkfix.dir`,
    * the classpath (test runs — sbt puts `src/test/resources` there), then
    * the repo-relative path against the working directory (the driver's
    * `runMain graft.Verify` from the repo root). The oracle SQL below is
    * built from the SAME resolved path, so both engines read one directory
    * wherever the repo is checked out. */
  private[graft] val chunkFixtureDir: String =
    sys.props.get("graft.chunkfix.dir")
      .orElse(Option(getClass.getResource("/chunkfix"))
        .filter(_.getProtocol == "file")
        .map(u => new java.io.File(u.toURI).getAbsolutePath))
      .getOrElse(new java.io.File("src/test/resources/chunkfix").getAbsolutePath)

  /** Oracle-checked `graft-chunks` ingest: per-file chunk accounting (count,
    * rows, total bytes) plus a reassembly digest proving the chunk rows
    * carry the exact file bytes. md5 over the HEX of the payload because the
    * DuckDB twin has no blob-md5 — both engines uppercase-hex identically.
    * Byte-level splits/seeks are MultimodalSpec + ChunksConfSpec's job; the
    * oracle pins planning arithmetic and end-to-end content. */
  val m03ChunkedRead: Q = (s, _) => {
    val ch = readChunked(s, chunkFixtureDir, chunkBytes = 7)
    val acct = ch.groupBy(col("media_id")).agg(
      first(col("n_chunks")).as("n_chunks"),
      count(lit(1)).as("rows_read"),
      sum(octet_length(col("chunk"))).cast("long").as("total_bytes"))
    val digests = reassemble(ch)
      .select(col("media_id"), md5(hex(col("payload"))).as("hex_digest"))
    acct.join(digests, Seq("media_id")).orderBy(col("media_id"))
  }

  val queries: Map[String, Q] = Map(
    "m01_binary_meta" -> m01BinaryMeta,
    "m02_chunking" -> m02Chunking,
    "m03_chunked_read" -> m03ChunkedRead)

  val oracles: Map[String, String] = Map(
    "m01_binary_meta" ->
      """SELECT doc_id AS media_id, 'text' AS kind,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | md5(text) AS digest,
        | CAST(octet_length(encode(text)) % 256 AS BIGINT) AS stub_feature
        |FROM documents ORDER BY media_id""".stripMargin,
    "m02_chunking" ->
      """WITH b AS (
        |  SELECT doc_id AS media_id, octet_length(encode(text)) AS n
        |  FROM documents)
        |SELECT media_id,
        | CAST(greatest(ceil(n / 100.0), 1) AS BIGINT) AS n_chunks,
        | CAST(n AS BIGINT) AS total_bytes,
        | CAST(CASE WHEN n = 0 THEN 0
        |           WHEN n % 100 = 0 THEN 100
        |           ELSE n % 100 END AS BIGINT) AS tail_bytes
        |FROM b ORDER BY media_id""".stripMargin,
    "m03_chunked_read" ->
      s"""SELECT 'file:' || filename AS media_id,
         | CAST(CASE WHEN size = 0 THEN 1
         |           ELSE CAST(ceil(size / 7.0) AS BIGINT) END AS BIGINT) AS n_chunks,
         | CAST(CASE WHEN size = 0 THEN 1
         |           ELSE CAST(ceil(size / 7.0) AS BIGINT) END AS BIGINT) AS rows_read,
         | CAST(size AS BIGINT) AS total_bytes,
         | md5(hex(content)) AS hex_digest
         |FROM read_blob('$chunkFixtureDir/*')
         |ORDER BY media_id""".stripMargin)
}
