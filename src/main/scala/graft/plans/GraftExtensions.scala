package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point (SURVEY.md §7.3 custom-Catalyst
  * tier): registers the native kernels as SQL functions, so the engine's
  * hot expressions are reachable from plain SQL — the Spark-native
  * analogue of the reference lineage's `REGISTER jar; DEFINE fn ...;`.
  *
  * Two ways in:
  *   - at session build: `--conf spark.sql.extensions=graft.plans.GraftExtensions`
  *   - on a live session: `GraftExtensions.registerInto(spark)` (the
  *     in-session DEFINE analogue)
  *
  * Registered functions:
  *   cosine_sim(a, b)          — codegen'd cosine over array<double>
  *   lang_id(text)             — stopword-evidence language ID
  *   ngram_stats(text, n)      — [n_ngrams, n_uniq] exact stats
  *   ngram_strings(text, n)    — distinct word n-gram strings
  *   shingle_hash64(text, n)   — distinct shingle XXH64 hashes
  *   minhash_sig(hashes, k)    — k-permutation MinHash signature
  *   simhash64(text)           — 64-bit SimHash fingerprint
  *   rp_lsh_bucket(vec, p)     — random-hyperplane LSH bucket id
  *   rep_stats(text, n)        — Gopher repetition stats (8 longs)
  *   bignum(s)                 — canonical arbitrary-precision string
  *   bignum_sort_key(s)        — order-preserving bignum sort key
  *   bignum_add / bignum_mul   — exact arbitrary-precision arithmetic
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        GraftExtensions.info(name, usage), builder))
    }
    // runs inside the operator-optimization fixed-point batch: unwraps
    // the bignum carrier's null-guard CASEs so codegen CSE can dedup
    // kernel chains (see SimplifyBigNumCarriers)
    ext.injectOptimizerRule(_ => SimplifyBigNumCarriers)
  }
}

object GraftExtensions {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal int argument, got: $other")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  /** (name, usage, builder) for every native kernel. */
  val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("cosine_sim", "cosine_sim(a, b) - cosine similarity of two array<double>", {
      case Seq(a, b) => CosineSim(a, b)
      case args => throw new IllegalArgumentException(s"cosine_sim needs 2 args, got ${args.length}")
    }: Seq[Expression] => Expression),
    ("lang_id", "lang_id(text) - stopword-evidence language code", {
      case Seq(t) => LangId(t)
      case args => throw new IllegalArgumentException(s"lang_id needs 1 arg, got ${args.length}")
    }: Seq[Expression] => Expression),
    ("ngram_stats", "ngram_stats(text, n) - [count, distinct] of word n-grams", {
      case Seq(t, n) => NgramStats(t, intArg(n, "ngram_stats"))
      case args => throw new IllegalArgumentException(s"ngram_stats needs 2 args, got ${args.length}")
    }: Seq[Expression] => Expression),
    ("ngram_strings", "ngram_strings(text, n) - distinct word n-gram strings", {
      case Seq(t, n) => NgramStrings(t, intArg(n, "ngram_strings"))
      case args => throw new IllegalArgumentException(s"ngram_strings needs 2 args, got ${args.length}")
    }: Seq[Expression] => Expression),
    ("shingle_hash64", "shingle_hash64(text, n) - distinct shingle hashes", {
      case Seq(t, n) => ShingleHash64(t, intArg(n, "shingle_hash64"))
      case args => throw new IllegalArgumentException(s"shingle_hash64 needs 2 args, got ${args.length}")
    }: Seq[Expression] => Expression),
    ("minhash_sig", "minhash_sig(hashes, k) - k-permutation MinHash signature", {
      case Seq(h, k) => MinHashSig(h, intArg(k, "minhash_sig"))
      case args => throw new IllegalArgumentException(s"minhash_sig needs 2 args, got ${args.length}")
    }: Seq[Expression] => Expression),
    ("simhash64", "simhash64(text) - 64-bit SimHash fingerprint", {
      case Seq(t) => SimHash64(t)
      case args => throw new IllegalArgumentException(s"simhash64 needs 1 arg, got ${args.length}")
    }: Seq[Expression] => Expression),
    ("rp_lsh_bucket", "rp_lsh_bucket(vec, planes) - random-hyperplane LSH bucket id", {
      case Seq(v, p) => RpLshBucket(v, intArg(p, "rp_lsh_bucket"))
      case args => throw new IllegalArgumentException(s"rp_lsh_bucket needs 2 args, got ${args.length}")
    }: Seq[Expression] => Expression),
    ("rep_stats", "rep_stats(text, n) - Gopher repetition stats (8 longs)", {
      case Seq(t, n) => RepStats(t, intArg(n, "rep_stats"))
      case args => throw new IllegalArgumentException(s"rep_stats needs 2 args, got ${args.length}")
    }: Seq[Expression] => Expression),
    ("bignum", "bignum(s) - canonical arbitrary-precision decimal string", {
      case Seq(s) => BigNumNorm(s)
      case args => throw new IllegalArgumentException(s"bignum needs 1 arg, got ${args.length}")
    }: Seq[Expression] => Expression),
    ("bignum_sort_key", "bignum_sort_key(s) - order-preserving key of a bignum string", {
      case Seq(s) => BigNumSortKey(s)
      case args => throw new IllegalArgumentException(s"bignum_sort_key needs 1 arg, got ${args.length}")
    }: Seq[Expression] => Expression),
    ("bignum_add", "bignum_add(a, b) - exact arbitrary-precision sum", {
      case Seq(a, b) => BigNumBin("+", a, b)
      case args => throw new IllegalArgumentException(s"bignum_add needs 2 args, got ${args.length}")
    }: Seq[Expression] => Expression),
    ("bignum_mul", "bignum_mul(a, b) - exact arbitrary-precision product", {
      case Seq(a, b) => BigNumBin("*", a, b)
      case args => throw new IllegalArgumentException(s"bignum_mul needs 2 args, got ${args.length}")
    }: Seq[Expression] => Expression))

  /** Register into a LIVE session's function registry — usable when the
    * session was built without the extensions conf (Pig's in-session
    * `DEFINE`). Idempotent: re-registration replaces the same name. */
  def registerInto(spark: SparkSession): Unit =
    functions.foreach { case (name, usage, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), info(name, usage), builder)
    }
}
