package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{ContinuousPartitionReader, ContinuousPartitionReaderFactory, ContinuousStream, MicroBatchStream, Offset, PartitionOffset}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualNullSafe, EqualTo, Filter, In, IsNotNull}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** DSv2 micro-batch SOURCE replaying a directory of per-shard NDJSON files —
  * the consumer-side twin of the Kinesis contract the reference produces
  * into (BASELINE.json north star: "Structured Streaming + Kinesis source";
  * OSS Spark ships no Kinesis connector):
  *
  *   shard          ≈ one `shard-*.ndjson` file (append-only)
  *   sequence number ≈ line number within the shard
  *   GetRecords     ≈ planInputPartitions over the (start, end] offset range
  *   checkpoint     ≈ per-shard offsets serialized into the streaming
  *                    offset log — restart resumes exactly where it stopped
  *
  * One InputPartition per shard per micro-batch preserves per-shard order
  * (the Kinesis ordering guarantee); parallelism = shard count, exactly like
  * a real Kinesis consumer.
  *
  * {{{
  *   spark.readStream.format("graft-shards").load(dir)
  *     // => shard STRING, seq LONG, data STRING
  * }}}
  */
class GraftShardsProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-shards"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftShardsProvider.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ShardsTable(Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("path is required (load(dir))")))
}

object GraftShardsProvider {
  val schema: StructType = StructType(Seq(
    StructField("shard", StringType, nullable = false),
    StructField("seq", LongType, nullable = false),
    StructField("data", StringType, nullable = false)))

  /** Test/metrics seam: the most recent schema the optimizer pruned to. */
  val lastPrunedSchema = new java.util.concurrent.atomic.AtomicReference[StructType](schema)

  /** Test/metrics seam: the shard set the optimizer pushed down (None = no
    * shard predicate — scan everything). */
  val lastPushedShards =
    new java.util.concurrent.atomic.AtomicReference[Option[Set[String]]](None)

  /** Current line count per shard file in `dir`, confined to `keep` when a
    * shard predicate was pushed down — pruned shards are never even line-
    * counted, the Kinesis analogue of subscribing to a subset of shards. */
  private[sources] def shardEnds(dir: String,
      keep: Option[Set[String]] = None): Map[String, Long] = {
    val d = Paths.get(dir)
    if (!Files.isDirectory(d)) Map.empty
    else Files.list(d).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("shard-") &&
        p.getFileName.toString.endsWith(".ndjson"))
      .filter(p => keep.forall(_.contains(p.getFileName.toString)))
      .map(p => p.getFileName.toString -> countLines(p))
      .toMap
  }

  private def countLines(p: Path): Long =
    Files.lines(p, StandardCharsets.UTF_8).count()
}

/** Per-shard line positions; JSON "shard-a.ndjson:12,shard-b.ndjson:7"
  * (simple k:v form — stable, human-readable in the offset log). */
case class ShardOffsets(positions: Map[String, Long]) extends Offset {
  override def json(): String =
    positions.toSeq.sorted.map { case (s, n) => s"$s:$n" }.mkString(",")
}

object ShardOffsets {
  def parse(s: String): ShardOffsets =
    if (s.isEmpty) ShardOffsets(Map.empty)
    else ShardOffsets(s.split(",").map { kv =>
      val i = kv.lastIndexOf(':')
      kv.substring(0, i) -> kv.substring(i + 1).toLong
    }.toMap)
}

private class ShardsTable(dir: String) extends Table with SupportsRead {
  override def name(): String = s"graft-shards($dir)"
  override def schema(): StructType = GraftShardsProvider.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ,
      TableCapability.CONTINUOUS_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
      // column pruning (DSv2 pushdown contract): when a query only touches
      // shard/seq, the reader never materializes the payload string
      private var required: StructType = GraftShardsProvider.schema
      // the `shards` OPTION is the explicit subscription (the Kinesis way of
      // consuming a shard subset) and the only pruning visible to STREAMING
      // offset tracking: Spark builds the MicroBatchStream from the analyzed
      // plan before filter pushdown runs, so a `where shard = 'x'` on a
      // stream filters rows but cannot confine latestOffset. Batch scans
      // additionally get automatic pruning via pushFilters below.
      private var keep: Option[Set[String]] =
        Option(options.get("shards")).map(_.split(",").map(_.trim).toSet)
      private var pushed: Array[Filter] = Array.empty
      override def pruneColumns(requiredSchema: StructType): Unit = {
        required = requiredSchema
        GraftShardsProvider.lastPrunedSchema.set(requiredSchema)
      }
      // shard-name pruning (the Kinesis analogue of subscribing to a shard
      // subset): `where shard = 'x'` / `shard IN (...)` plans ONLY those
      // shards' InputPartitions and never line-counts the rest. Pruning is
      // EXACT — every row of a kept shard has that shard value — so accepted
      // filters are fully absorbed (not re-evaluated post-scan).
      override def pushFilters(filters: Array[Filter]): Array[Filter] = {
        val (accepted, rest) = filters.partition {
          case EqualTo("shard", _: String) => true
          case EqualNullSafe("shard", _: String) => true
          case In("shard", vs) => vs.forall(_.isInstanceOf[String])
          case IsNotNull("shard") => true // shard is non-nullable: vacuous
          case _ => false
        }
        accepted.foreach { f =>
          val c: Option[Set[String]] = f match {
            case EqualTo(_, v: String) => Some(Set(v))
            case EqualNullSafe(_, v: String) => Some(Set(v))
            case In(_, vs) => Some(vs.map(_.asInstanceOf[String]).toSet)
            case _ => None
          }
          c.foreach(s => keep = Some(keep.fold(s)(_ intersect s)))
        }
        pushed = accepted
        GraftShardsProvider.lastPushedShards.set(keep)
        rest
      }
      override def pushedFilters(): Array[Filter] = pushed
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = required
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new ShardsMicroBatchStream(dir, required, keep)
        override def toContinuousStream(checkpointLocation: String): ContinuousStream =
          new ShardsContinuousStream(dir, required, keep)
        // bounded replay of everything currently in the shards (batch read
        // path — and where Catalyst's column pruning reaches the source)
        override def toBatch: Batch = new Batch {
          override def planInputPartitions(): Array[InputPartition] =
            GraftShardsProvider.shardEnds(dir, keep).toSeq.sortBy(_._1).collect {
              case (shard, end) if end > 0 =>
                ShardSlice(dir, shard, 0L, end): InputPartition
            }.toArray
          override def createReaderFactory(): PartitionReaderFactory =
            new ShardReaderFactory(required.fieldNames)
        }
      }
    }
}

private class ShardsMicroBatchStream(dir: String,
    required: StructType = GraftShardsProvider.schema,
    keep: Option[Set[String]] = None) extends MicroBatchStream {
  override def initialOffset(): Offset = ShardOffsets(Map.empty)
  override def latestOffset(): Offset =
    ShardOffsets(GraftShardsProvider.shardEnds(dir, keep))
  override def deserializeOffset(json: String): Offset = ShardOffsets.parse(json)
  override def commit(end: Offset): Unit = () // offset log is the record of progress
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ShardOffsets].positions
    val e = end.asInstanceOf[ShardOffsets].positions
    e.toSeq.sortBy(_._1).flatMap { case (shard, endLine) =>
      val startLine = s.getOrElse(shard, 0L)
      if (endLine > startLine)
        Some(ShardSlice(dir, shard, startLine, endLine): InputPartition)
      else None
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new ShardReaderFactory(required.fieldNames)
}

/** One shard's (startLine, endLine] slice — a GetRecords call's worth. */
private case class ShardSlice(dir: String, shard: String,
    startLine: Long, endLine: Long) extends InputPartition

/** Continuous-mode twin of the micro-batch stream (NEXT r1 #2): one
  * LONG-RUNNING task per shard tails its file like a Kinesis enhanced-fan-out
  * subscriber — rows surface at sub-epoch latency instead of per trigger.
  *
  * The shard set is FIXED at query start (Spark's continuous execution does
  * not support reconfiguration): a shard file created mid-query is picked up
  * on restart, the analogue of a Kinesis reshard forcing consumer
  * re-planning. Exactly-once resume comes from the epoch-coordinated
  * per-partition offsets ([[ShardPartitionOffset]]) merged into the same
  * [[ShardOffsets]] journal format the micro-batch path checkpoints. */
private class ShardsContinuousStream(dir: String,
    required: StructType = GraftShardsProvider.schema,
    keep: Option[Set[String]] = None) extends ContinuousStream {
  override def initialOffset(): Offset = ShardOffsets(Map.empty)
  override def deserializeOffset(json: String): Offset = ShardOffsets.parse(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def mergeOffsets(offsets: Array[PartitionOffset]): Offset =
    ShardOffsets(offsets.collect {
      case ShardPartitionOffset(shard, line) => shard -> line
    }.toMap)

  override def planInputPartitions(start: Offset): Array[InputPartition] = {
    val resume = start.asInstanceOf[ShardOffsets].positions
    // every shard present now or checkpointed before, resuming where it left
    val shards = (GraftShardsProvider.shardEnds(dir, keep).keySet ++ resume.keySet).toSeq.sorted
    shards.map(s => ShardSlice(dir, s, resume.getOrElse(s, 0L), Long.MaxValue): InputPartition)
      .toArray
  }
  override def createContinuousReaderFactory(): ContinuousPartitionReaderFactory =
    new ShardContinuousReaderFactory(required.fieldNames)
}

/** One shard's committed position — the unit the epoch coordinator collects
  * from each long-running task at every epoch boundary. */
private case class ShardPartitionOffset(shard: String, line: Long) extends PartitionOffset

private class ShardContinuousReaderFactory(fields: Array[String])
  extends ContinuousPartitionReaderFactory {
  override def createReader(partition: InputPartition): ContinuousPartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ShardSlice]
    new ContinuousPartitionReader[InternalRow] {
      // tail -f over an append-only local file: a BufferedReader that has
      // returned null at EOF reads newly appended bytes on later calls
      private val in = Files.newBufferedReader(
        Paths.get(p.dir, p.shard), StandardCharsets.UTF_8)
      private var pos = 0L          // next line index to read
      private var cur: String = _
      // skip to the resume position (replayed lines are already committed)
      while (pos < p.startLine) { if (in.readLine() != null) pos += 1 else Thread.sleep(10) }

      override def next(): Boolean = {
        var line = in.readLine()
        while (line == null) {      // blocked tail: poll until data or task kill
          Thread.sleep(20)          // InterruptedException propagates on stop()
          line = in.readLine()
        }
        cur = line; pos += 1
        true
      }
      override def get(): InternalRow = new GenericInternalRow(
        fields.map {
          case "shard" => UTF8String.fromString(p.shard)
          case "seq" => pos - 1
          case "data" => UTF8String.fromString(cur)
        }.toArray[Any])
      override def getOffset: PartitionOffset = ShardPartitionOffset(p.shard, pos)
      override def close(): Unit = in.close()
    }
  }
}

private class ShardReaderFactory(fields: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ShardSlice]
    new PartitionReader[InternalRow] {
      private val lines = Files.lines(
        Paths.get(p.dir, p.shard), StandardCharsets.UTF_8)
      private val it = lines.iterator().asScala
        .zipWithIndex.map { case (l, i) => (l, i.toLong) }
        .filter { case (_, i) => i >= p.startLine && i < p.endLine }
      private var cur: (String, Long) = _
      override def next(): Boolean = { val has = it.hasNext; if (has) cur = it.next(); has }
      override def get(): InternalRow = new GenericInternalRow(
        fields.map {
          case "shard" => UTF8String.fromString(p.shard)
          case "seq" => cur._2
          case "data" => UTF8String.fromString(cur._1)
        }.toArray[Any])
      override def close(): Unit = lines.close()
    }
  }
}
