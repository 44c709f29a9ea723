package graft

import graft.functions.{GraftExtensions, NfcNormalize, StripAccents}
import graft.ext.TextAnalysis
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** NfcNormalize (t16): UAX #15 canonical composition as a codegen'd native
  * expression. The t16 oracle proves corpus-level parity with DuckDB's
  * nfc_normalize; this pins the expression-level contract — composition
  * cases, the zero-allocation fast path, null propagation, codegen fusion,
  * and SQL registration. All non-ASCII codepoints are spelled as escapes:
  * 0301 combining acute, 0308 combining diaeresis, 030A combining ring,
  * 212B ANGSTROM SIGN; 00E9/00F6/00C5 the precomposed forms. */
class TextExprsSpec extends SparkSpec {
  import spark.implicits._

  private def nfc(s: String): String =
    NfcNormalize.nfc(UTF8String.fromString(s)).toString

  test("composes decomposed sequences to NFC") {
    assert(nfc("cafe\u0301") == "caf\u00e9") // e + combining acute
    assert(nfc("o\u0308") == "\u00f6")          // o + combining diaeresis
    assert(nfc("\u212B") == "\u00c5")           // ANGSTROM SIGN -> A-ring
    assert(nfc("A\u030A") == "\u00c5")          // A + combining ring
  }

  test("already-normalized input returns the same instance (fast path)") {
    val ascii = UTF8String.fromString("plain ascii text")
    assert(NfcNormalize.nfc(ascii) eq ascii)
    val precomposed = UTF8String.fromString("caf\u00e9 \u00c5ngstr\u00f6m")
    assert(NfcNormalize.nfc(precomposed) eq precomposed)
  }

  test("idempotent: nfc(nfc(x)) == nfc(x)") {
    for (s <- Seq("cafe\u0301", "\u212Bngstro\u0308m", "", "mix \u00e9e\u0301"))
      assert(nfc(nfc(s)) == nfc(s))
  }

  test("null propagates; facade casts non-string input") {
    val df = Seq((1L, Some("e\u0301")), (2L, None: Option[String]))
      .toDF("id", "t")
      .select($"id", NfcNormalize.normalize($"t").as("n"))
    assert(df.as[(Long, Option[String])].collect().toMap ==
      Map(1L -> Some("\u00e9"), 2L -> None))
    // non-string input: the Column facade casts to string first
    val casted = spark.range(1)
      .select(NfcNormalize.normalize(col("id")).as("n")).as[String].head()
    assert(casted == "0")
  }

  test("stays inside WholeStageCodegen") {
    // range (not a local Seq): ConvertToLocalRelation would fold a literal
    // projection into a LocalTableScan with no codegen stage to observe
    val plan = spark.range(10)
      .select(NfcNormalize.normalize(col("id")))
      .queryExecution.executedPlan
    assert(plan.toString.linesIterator.next().startsWith("*("),
      s"graft_nfc must not break the codegen pipeline; got:\n$plan")
  }

  test("registers as graft_nfc SQL function via extensions descriptor") {
    GraftExtensions.register(spark)
    // the SQL literal embeds the combining acute directly (Spark's chr()
    // is ASCII-only, so it can't build the codepoint in-query)
    val got = spark.sql("SELECT graft_nfc('cafe\u0301') AS n").as[String].head()
    assert(got == "caf\u00e9")
  }

  test("normalizeNfc marks changed rows and leaves ASCII untouched") {
    val docs = Seq((1L, "cafe\u0301"), (2L, "plain"), (3L, "caf\u00e9"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.normalizeNfc(docs, "text")
      .select($"doc_id", $"norm_text",
        ($"norm_text" =!= $"text").cast("long").as("changed"))
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, "caf\u00e9", 1L), // decomposed -> composed, flagged
      (2L, "plain", 0L),
      (3L, "caf\u00e9", 0L))) // already NFC, untouched
  }

  // ------------------------------------------------------- StripAccents/t17

  private def fold(s: String): String =
    StripAccents.strip(UTF8String.fromString(s)).toString

  test("strip: accents fold from both decomposed and precomposed forms") {
    assert(fold("cafe\u0301") == "cafe")
    assert(fold("caf\u00e9") == "cafe")
    assert(fold("\u00c5ngstr\u00f6m") == "Angstrom")
    assert(fold("\u212bngstro\u0308m") == "Angstrom")
    assert(fold("na\u00efve") == "naive")
    assert(fold("\u00f1") == "n")
  }

  test("strip: non-accent letters survive (the DuckDB strip_accents contract)") {
    // stroke-l has no canonical decomposition; eszett and ligatures are
    // letters, not letter+mark \u2014 all must pass through
    assert(fold("\u0142\u00f3d\u017a") == "\u0142odz")
    assert(fold("stra\u00dfe") == "stra\u00dfe")
    assert(fold("\u0153uvre \u00c6r\u00f8") == "\u0153uvre \u00c6r\u00f8")
  }

  test("strip: scripts whose NFD is not marks recompose (Hangul), marks drop (kana dakuten)") {
    // U+D55C U+AD6D decompose to Jamo under NFD; the trailing NFC pass must
    // recompose them or the folded text changes byte identity for no reason
    assert(fold("\ud55c\uad6d") == "\ud55c\uad6d")
    // pa (U+3071) = ha (U+306F) + semi-voiced mark (Mn) -> folds to ha,
    // matching utf8proc
    assert(fold("\u3071") == "\u306f")
  }

  test("strip: spacing (Mc) and enclosing (Me) marks drop like utf8proc STRIPMARK") {
    // Devanagari ka + i-matra (U+093F, Mc) -> bare ka; Tamil na + i-matra
    // (U+0BBF, Mc) -> bare na: DuckDB strip_accents folds both (verified
    // live), so Mn-only stripping was a latent Indic-script divergence
    assert(fold("\u0915\u093f") == "\u0915")
    assert(fold("\u0ba8\u0bbf") == "\u0ba8")
    // combining enclosing circle (U+20DD, Me) drops too
    assert(fold("a\u20ddb") == "ab")
  }

  test("strip: pure-ASCII fast path returns the same instance") {
    val ascii = UTF8String.fromString("plain ascii text")
    assert(StripAccents.strip(ascii) eq ascii)
  }

  test("strip: idempotent and nfc-stable") {
    for (s <- Seq("cafe\u0301", "\u0142\u00f3d\u017a", "\ud55c\uad6d", "", "stra\u00dfe")) {
      assert(fold(fold(s)) == fold(s))
      // folding then NFC-normalizing changes nothing: fold output is NFC
      assert(nfc(fold(s)) == fold(s))
    }
  }

  test("strip: registers as graft_strip_accents SQL function") {
    GraftExtensions.register(spark)
    val got = spark.sql("SELECT graft_strip_accents('caf\u00e9 \u0142') AS n")
      .as[String].head()
    assert(got == "cafe \u0142")
  }

  test("stripAccents facade stays inside WholeStageCodegen") {
    val plan = spark.range(10)
      .select(StripAccents.fold(col("id")))
      .queryExecution.executedPlan
    assert(plan.toString.linesIterator.next().startsWith("*("),
      s"graft_strip_accents must not break the codegen pipeline; got:\n$plan")
  }
}
