package graft.functions

import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, LeafExpression, Nondeterministic}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Executor-local xid generator — the byte-format twin of the reference's
  * generated partition key (s12v/awsbeats streams/partition_key.go:45-47 uses
  * the public rs/xid format): 12 bytes = 4B big-endian unix seconds + 3B
  * machine id + 2B process id + 3B counter, base32hex-encoded to a 20-char
  * lowercase string. Properties the reference relies on (README.md:36,
  * SURVEY §2.4 K2): globally unique, k-ordered (lexicographic order ≈ time
  * order), uniform spread when used as a shard/partition key.
  *
  * Thread-safe and allocation-light: one AtomicInteger per JVM; no
  * coordination between executors (machine+pid disambiguate JVMs, matching
  * xid's design).
  */
object XidGen {
  private val alphabet = "0123456789abcdefghijklmnopqrstuv".toCharArray

  private val machineId: Array[Byte] = {
    val name = try java.net.InetAddress.getLocalHost.getHostName
    catch { case _: Exception => "localhost" }
    java.security.MessageDigest.getInstance("MD5")
      .digest(name.getBytes(StandardCharsets.UTF_8)).take(3)
  }

  private val pid: Int = (ProcessHandle.current.pid & 0xffff).toInt

  private val counter = new AtomicInteger(new java.security.SecureRandom().nextInt())

  /** Next 20-char xid. */
  def next(): String = next(System.currentTimeMillis() / 1000L)

  private[graft] def next(unixSeconds: Long): String = {
    val b = new Array[Byte](12)
    val t = unixSeconds
    b(0) = (t >>> 24).toByte; b(1) = (t >>> 16).toByte
    b(2) = (t >>> 8).toByte; b(3) = t.toByte
    b(4) = machineId(0); b(5) = machineId(1); b(6) = machineId(2)
    b(7) = (pid >>> 8).toByte; b(8) = pid.toByte
    val c = counter.getAndIncrement()
    b(9) = (c >>> 16).toByte; b(10) = (c >>> 8).toByte; b(11) = c.toByte
    encode(b)
  }

  /** base32hex (rs/xid alphabet), 12 bytes -> 20 chars. */
  private[graft] def encode(b: Array[Byte]): String = {
    val out = new Array[Char](20)
    var acc = 0L; var nbits = 0; var i = 0; var o = 0
    while (i < 12) {
      acc = (acc << 8) | (b(i) & 0xffL); nbits += 8; i += 1
      while (nbits >= 5) {
        nbits -= 5
        out(o) = alphabet(((acc >>> nbits) & 0x1f).toInt); o += 1
      }
    }
    // 96 bits = 19 chars * 5 + 1 remaining bit, left-aligned like rs/xid
    out(19) = alphabet(((acc << (5 - nbits)) & 0x1f).toInt)
    new String(out)
  }
}

/** Native Catalyst expression for xid generation — a codegen'd leaf, so it
  * inlines into WholeStageCodegen instead of breaking the pipeline the way a
  * Scala UDF would (SURVEY §4.3: custom `Expression` only where builtins
  * can't express the semantics — byte-format parity with rs/xid is such a
  * case; `uuid()` is neither time-sortable nor xid-shaped). */
case class Xid() extends LeafExpression with Nondeterministic {
  override def nullable: Boolean = false
  override def dataType: DataType = StringType
  override def prettyName: String = "xid"
  override protected def initializeInternal(partitionIndex: Int): Unit = ()
  override protected def evalInternal(input: InternalRow): Any =
    UTF8String.fromString(XidGen.next())
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    ev.copy(
      code = code"""final UTF8String ${ev.value} = UTF8String.fromString(graft.functions.XidGen.next());""",
      isNull = FalseLiteral)
}

/** SQL registration — `spark.sql("SELECT xid()")` — via the standard
  * SparkSessionExtensions hook:
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.xidDescriptor)
    ext.injectFunction(Layout.zorderDescriptor)
    ext.injectFunction(GraftExtensions.nfcDescriptor)
    ext.injectFunction(GraftExtensions.stripAccentsDescriptor)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  val xidDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("xid"),
      new ExpressionInfo(classOf[Xid].getName, "xid"),
      (_: Seq[Expression]) => Xid())

  /** `SELECT graft_nfc(text)` — Unicode NFC normalization (t16). */
  val nfcDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => NfcNormalize(c)
        case _ => throw new IllegalArgumentException(
          s"graft_nfc expects exactly 1 argument, got ${args.size}")
      })

  /** `SELECT graft_strip_accents(text)` — accent folding (t17). */
  val stripAccentsDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_strip_accents"),
      new ExpressionInfo(classOf[StripAccents].getName, "graft_strip_accents"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => StripAccents(c)
        case _ => throw new IllegalArgumentException(
          s"graft_strip_accents expects exactly 1 argument, got ${args.size}")
      })

  /** Imperative twin for sessions built without the extensions config. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Seq(xidDescriptor, Layout.zorderDescriptor, nfcDescriptor,
        stripAccentsDescriptor)
      .foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}

/** Column-level façade for the engine's native expressions. */
object functions {
  /** Globally-unique, time-sortable xid key (K2 twin). */
  def xid(): Column = org.apache.spark.sql.classic.GraftColumnBridge.column(Xid())
}
