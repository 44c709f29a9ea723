package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media (image/audio/video) modeled as opaque
  * `BinaryType` payloads plus a typed metadata struct, with decode /
  * feature-extract implemented as distributed per-partition transforms.
  *
  * The real decoder libraries are not in this container, so the decode step is
  * a clearly-marked deterministic STUB ([[stubDecode]]); everything Spark-side
  * — schema, batching, partitioning, the transform's signature — is real and
  * tested (MultimodalSpec). LLM-pipeline extension (SURVEY.md §2.8 scope).
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

  /** STUB decoder: a real deployment would decode image/audio bytes here
    * (e.g. via an image library on the executors). The stub derives
    * deterministic fake dimensions from the payload so the distributed
    * plumbing (per-partition batch transform, schema evolution, no driver
    * collect) is exercised end-to-end. */
  def stubDecode(payload: Array[Byte]): (Int, Int, Int) = {
    // ??? <- real decoder goes here; deterministic fake below.
    val n = payload.length
    (64 + n % 512, 64 + (n / 7) % 512, 1 + n % 30)
  }

  /** Distributed decode/feature-extract: mapPartitions over Rows so each
    * executor batch-decodes its partition locally (the Scala analogue of a
    * `mapInPandas` batch UDF). */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    media.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val (w, h, f) = stubDecode(payload)
        Row.fromSeq(r.toSeq ++ Seq(w, h, f))
      }
    }(enc)
  }

  /** STUB resize: a real deployment decodes and resamples pixels here; the
    * stub derives a deterministic thumbnail payload from (digest, w, h) so
    * the plumbing (binary-in/binary-out per-partition transform, schema
    * evolution) is exercised. */
  def stubResize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    // ??? <- real image resample goes here; deterministic fake below.
    val d = java.security.MessageDigest.getInstance("MD5")
    d.update(payload); d.update(s":$w:$h".getBytes("UTF-8"))
    d.digest()
  }

  /** Distributed resize: appends (thumb BINARY, thumb_w, thumb_h). Same
    * mapPartitions batch shape a Pandas-UDF decode would use. */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame = {
    val schema = StructType(media.schema.fields ++ Seq(
      StructField("thumb", BinaryType, nullable = false),
      StructField("thumb_w", IntegerType, nullable = false),
      StructField("thumb_h", IntegerType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    media.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        Row.fromSeq(r.toSeq ++ Seq(stubResize(payload, w, h), w, h))
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

  val queries: Map[String, Q] = Map("m01_binary_meta" -> m01BinaryMeta)

  val oracles: Map[String, String] = Map(
    "m01_binary_meta" ->
      """SELECT doc_id AS media_id, 'text' AS kind,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | md5(text) AS digest,
        | CAST(octet_length(encode(text)) % 256 AS BIGINT) AS stub_feature
        |FROM documents ORDER BY media_id""".stripMargin)
}
