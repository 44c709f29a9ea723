package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic text/hash primitives shared by the dedup,
  * similarity and text-analysis surfaces.
  *
  * Every derived value must be reproducible bit-for-bit by the DuckDB oracle,
  * so the only hash primitive is md5 (identical in every engine): a 60-bit
  * integer is taken from the first 15 hex chars, then folded into the Mersenne
  * prime 2^31-1 so that subsequent affine transforms `(a*h + b) % P` stay well
  * inside Long range (a,h < 2^31 ⇒ a*h < 2^62).
  *
  * All ops are codegen'd Catalyst built-ins (conv/md5/split/transform/slice) —
  * no UDFs — so they inline into WholeStageCodegen and scale linearly with
  * rows; nothing here shuffles.
  *
  * ==Exploding a COMPUTED array: use explode_outer + isNotNull==
  * A non-outer `explode(expensiveExpr)` lets Catalyst's
  * `InferFiltersFromGenerate` add `size(expensiveExpr) > 0 AND
  * isnotnull(expensiveExpr)` and push it to the scan with the WHOLE
  * expression tree inlined (several copies — the CASE/size/isnotnull each
  * carry one), so the tokenize+shingle chain re-evaluates ~6x per row:
  * measured 20x slower shingle generation at sf0.1. `explode_outer` implies
  * no non-empty constraint — nothing is inferred — and the null rows from
  * empty arrays are dropped by a cheap `isNotNull` on the GENERATED column
  * (a post-Generate attribute the optimizer cannot push below it). Plain
  * `explode` stays fine for arrays that are literals/scan columns, where the
  * inferred filter is cheap or even helps.
  */
object TextOps {
  /** Mersenne prime 2^31-1 — modulus for all derived hashes. */
  val P = 2147483647L

  /** 60-bit integer from the md5 of a string/binary column. */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** md5-derived hash folded mod P (fits in 31 bits). */
  def hm(c: Column): Column = h60(c) % P

  /** Affine minhash permutation k applied to an `hm` column. */
  def perm(k: Int, h: Column): Column =
    (lit(2L * k + 1) * h + lit(12345L + 41L * k)) % P

  /** Whitespace tokens, empties removed (matches DuckDB
    * `list_filter(string_split_regex(text,'\s+'), x -> length(x)>0)`). */
  def toks(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** Word n-shingles for every start position 1..len — trailing positions
    * yield the shorter tails, so docs with 1..n-1 tokens still produce a
    * shingle. ZERO tokens (empty/whitespace-only text) yields the EMPTY
    * array: Spark's `sequence(1, 0)` is the descending [1, 0] (slice with
    * start 0 then throws at runtime), whereas DuckDB's `range(1, len+1)` is
    * empty for len=0 — the guard makes both engines agree and keeps the
    * operators crash-free on degenerate docs. NULL text also yields [].
    * IMPORTANT: pass a MATERIALIZED token-array column (`withColumn("tk",
    * toks(...))` first) — an expression inlined here re-evaluates once per
    * position (no CSE inside lambdas → O(n²) retokenization). */
  def shinglesN(tk: Column, n: Int): Column =
    when(size(tk) > 0,
      transform(sequence(lit(1), size(tk)), i => array_join(slice(tk, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Word 3-shingles (the d02/d04 setting). */
  def shingles3(tk: Column): Column = shinglesN(tk, 3)

  /** Exact word n-grams — FULL length only (no shorter tails, unlike
    * [[shinglesN]]): docs with fewer than n tokens yield the empty array.
    * This is the decontamination setting, where a partial tail match must
    * not count as benchmark overlap. Matches DuckDB
    * `array_to_string(toks[i:i+n-1],' ')` over `range(1, len-(n-2))`.
    * Same materialized-token-column and empty-array caveats as shinglesN. */
  def ngramsExact(tk: Column, n: Int): Column =
    when(size(tk) >= n,
      transform(sequence(lit(1), size(tk) - (n - 1)),
        i => array_join(slice(tk, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Order-deterministic rounded mean of a per-group float term, for use
    * inside `.agg(...)`: the terms collect per group, sort ascending, and
    * fold-sum left-to-right, so the result is bit-identical across runs,
    * partition counts and task completion orders. A plain `avg(double)`
    * merges float partial aggregates in task-completion order — scheduler
    * luck — and one group whose true mean sits within ~1 ulp of a 4-decimal
    * half-way boundary then rounds differently run to run (the round-9
    * c10_dsir_weights driver flake). The `+ 1e-9` nudge shields exact-half
    * decimal boundaries, not ulp-order reassociation; this fold removes the
    * reassociation entirely. DuckDB replays it exactly (left fold, same
    * 0.0+x init identity): see [[foldMeanSql]]. Group state is bounded by
    * the group's term count (per-doc tokens) — the same bound as rebuilding
    * the document's text, fine at 100 TB.
    *
    * `n` must be the group's term count (`count(lit(1))` alongside). */
  def foldMean(term: Column, n: Column, scale: Int = 4): Column =
    round(
      aggregate(sort_array(collect_list(term)), lit(0.0d), (a, x) => a + x)
        / n + 1e-9, scale)

  /** Order-deterministic rounded SUM of a per-group float term (the
    * [[foldMean]] machinery without the /n): collect, sort ascending,
    * fold-sum left-to-right — bit-identical across partitionings and task
    * orders. Group state is bounded by the group's term count (callers keep
    * that vocabulary-sized, never corpus-sized). DuckDB twin:
    * `round(list_reduce(list_sort(list(term)), (a,x) -> a + x) + 1e-9, s)`. */
  def foldSum(term: Column, scale: Int = 4): Column =
    round(
      aggregate(sort_array(collect_list(term)), lit(0.0d), (a, x) => a + x)
        + 1e-9, scale)

  /** The DuckDB twin of [[foldMean]] — splice into an aggregate SELECT.
    * `list_reduce` folds left `f(f(t1,t2),t3)…`; Spark's fold is
    * `((0.0+t1)+t2)+t3…` and `0.0 + x ≡ x` bit-exact for every non-(-0.0)
    * double (log-ratio terms are never -0.0: `ln(1.0)` is +0.0), so the
    * two sums are bit-identical given bit-identical sorted inputs.
    *
    * The trailing `+ 0.0` canonicalizes DuckDB's signed zero: when the
    * folded mean is a tiny negative that survives the `+ 1e-9` nudge
    * (e.g. −2e-9), DuckDB's `round()` preserves the sign and returns
    * `-0.0`, while Spark's `Round` goes through `BigDecimal` (which has
    * no signed zero) and returns `+0.0`. IEEE `-0.0 + 0.0 = +0.0`, and
    * every non-zero value is unchanged, so the guard makes the twin
    * bit-identical to Spark without perturbing anything else. */
  def foldMeanSql(term: String): String =
    s"round(list_reduce(list_sort(list($term)), (a, x) -> a + x) / count(*) + 1e-9, 4) + 0.0"

  /** Same 60-bit md5 hash computed driver-side (for plan-constant values such
    * as LSH hyperplanes — must agree exactly with [[h60]]/[[hm]]). */
  def h60Local(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }
}
