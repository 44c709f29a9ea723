package graft.sources

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** DSv2 batch source emitting CHUNK ROWS directly from storage — the
  * chunked-at-ingest half of the multimodal transport
  * ([[graft.ext.Multimodal.chunk]] is the in-plan half and is bounded by its
  * input already being ONE BinaryType cell, capped at ~2 GiB by JVM arrays).
  * Reading through this source, a 50 GiB video never materializes whole
  * anywhere: the driver plans offset ranges from file LENGTHS (no data read
  * at plan time), each executor task opens its file, seeks to its range and
  * streams `chunk_bytes` at a time, so every scan/shuffle unit is bounded at
  * the chunk size and one asset spreads across tasks.
  *
  * {{{
  *   spark.read.format("graft-chunks")
  *     .option("chunk_bytes", 1 << 20)   // chunk cell size (default 1 MiB)
  *     .option("split_bytes", 128 << 20) // target bytes per task (default)
  *     .load(dir)
  *     // => media_id STRING (file URI), chunk_idx LONG, n_chunks LONG,
  *     //    chunk BINARY
  * }}}
  *
  * Output shape matches [[graft.ext.Multimodal.chunk]] (media_id is the file
  * URI instead of a numeric id), so [[graft.ext.Multimodal.reassemble]] and
  * per-chunk pipelines consume either interchangeably. An empty file yields
  * one empty chunk row (same `greatest(n_chunks, 1)` contract), so every
  * asset survives transport.
  *
  * Scale notes: one InputPartition per `split_bytes` of contiguous chunks —
  * parallelism tracks total bytes, not file count, so a handful of huge
  * assets still fans out across the cluster. Files are listed driver-side
  * (names + lengths only, same as Spark's own file index). The session's
  * Hadoop configuration (`sessionState.newHadoopConf()` — core-site plus
  * `spark.hadoop.*` overrides: s3a credentials, endpoints, custom schemes)
  * is captured at scan build time and shipped to every reader task, so the
  * source resolves exactly the filesystems the rest of the session does
  * (spec: ChunksConfSpec's probe scheme exists only in the session conf).
  */
class GraftChunksProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-chunks"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftChunksProvider.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = properties.asScala
    new ChunksTable(
      opts.getOrElse("path",
        throw new IllegalArgumentException("path is required (load(dir))")),
      chunkBytes = opts.get("chunk_bytes").map(_.toInt).getOrElse(1 << 20),
      splitBytes = opts.get("split_bytes").map(_.toLong).getOrElse(128L << 20))
  }
}

object GraftChunksProvider {
  val schema: StructType = StructType(Seq(
    StructField("media_id", StringType, nullable = false),
    StructField("chunk_idx", LongType, nullable = false),
    StructField("n_chunks", LongType, nullable = false),
    StructField("chunk", BinaryType, nullable = false)))
}

private[sources] class ChunksTable(path: String, chunkBytes: Int,
    splitBytes: Long) extends Table with SupportsRead {
  require(chunkBytes >= 1, s"chunk_bytes must be >= 1, got $chunkBytes")
  require(splitBytes >= chunkBytes,
    s"split_bytes ($splitBytes) must be >= chunk_bytes ($chunkBytes)")
  override def name(): String = s"graft-chunks($path)"
  override def schema(): StructType = GraftChunksProvider.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new ChunksScan(path, chunkBytes, splitBytes)
}

/** Java-serializable Hadoop `Configuration` carrier (the upstream
  * `org.apache.spark.util.SerializableConfiguration` is `private[spark]`;
  * this is its standard connector-side twin). */
private[sources] class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

private[sources] class ChunksScan(path: String, chunkBytes: Int,
    splitBytes: Long) extends Scan with Batch {
  // captured on the driver at scan-build time: core-site defaults plus the
  // session's spark.hadoop.* / runtime hadoopConfiguration overrides
  private val hadoopConf = new SerializableHadoopConf(
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration()))

  override def readSchema(): StructType = GraftChunksProvider.schema
  override def toBatch: Batch = this

  /** Plan from file lengths only — no asset byte is read at plan time. */
  override def planInputPartitions(): Array[InputPartition] = {
    val p = new HPath(path)
    val fs = p.getFileSystem(hadoopConf.value)
    val statuses = Option(fs.globStatus(p)).filter(_.nonEmpty)
      .getOrElse(Array(fs.getFileStatus(p)))
      .flatMap(s => if (s.isDirectory) fs.listStatus(s.getPath) else Array(s))
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_")
        && !s.getPath.getName.startsWith("."))
      .sortBy(_.getPath.toString)
    val chunksPerSplit = math.max(1L, splitBytes / chunkBytes)
    statuses.flatMap { st =>
      val len = st.getLen
      val nChunks = math.max(1L, (len + chunkBytes - 1) / chunkBytes)
      (0L until nChunks by chunksPerSplit).map { start =>
        ChunkRange(st.getPath.toString, len, nChunks, start,
          math.min(start + chunksPerSplit, nChunks)): InputPartition
      }
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ChunkReaderFactory(chunkBytes, hadoopConf)
}

/** Ships the chunk size and the serialized session Hadoop conf to executors
  * (a lambda here would capture the non-serializable Scan). */
private[sources] class ChunkReaderFactory(chunkBytes: Int,
    hadoopConf: SerializableHadoopConf) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ChunkRangeReader(partition.asInstanceOf[ChunkRange], chunkBytes, hadoopConf)
}

/** One task's contiguous chunk range [startChunk, endChunk) of one file. */
private[sources] final case class ChunkRange(path: String, fileLen: Long,
    nChunks: Long, startChunk: Long, endChunk: Long) extends InputPartition

private[sources] class ChunkRangeReader(range: ChunkRange, chunkBytes: Int,
    hadoopConf: SerializableHadoopConf) extends PartitionReader[InternalRow] {
  private val pathUtf8 = UTF8String.fromString(range.path)
  private var idx = range.startChunk - 1
  private var current: Array[Byte] = _
  private var in: org.apache.hadoop.fs.FSDataInputStream = _

  override def next(): Boolean = {
    idx += 1
    if (idx >= range.endChunk) return false
    val off = idx * chunkBytes.toLong
    val size = math.min(chunkBytes.toLong, math.max(0L, range.fileLen - off)).toInt
    current = new Array[Byte](size)
    if (size > 0) { // empty file: its single chunk is empty, stream never opens
      if (in == null) {
        val p = new HPath(range.path)
        in = p.getFileSystem(hadoopConf.value).open(p)
        in.seek(off)
      }
      in.readFully(current)
    }
    true
  }

  override def get(): InternalRow = new GenericInternalRow(
    Array[Any](pathUtf8, idx, range.nChunks, current))

  override def close(): Unit = if (in != null) in.close()
}
