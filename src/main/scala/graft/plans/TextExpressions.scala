package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** XXH64 of a single long, public-spec constants — callable from
  * generated code by fully-qualified name. Matches the standard XXH64
  * of an 8-byte little-endian input with the given seed. */
object HashKernels {
  final val P1 = -7046029288634856825L // 0x9E3779B185EBCA87
  final val P2 = -4417276706812531889L // 0xC2B2AE3D27D4EB4F
  final val P3 = 1609587929392839161L  // 0x165667B19E3779F9
  final val P4 = -8796714831421723037L // 0x85EBCA77C2B2AE63
  final val P5 = 2870177450012600261L  // 0x27D4EB2F165667C5

  def xxh64Long(v: Long, seed: Long): Long = {
    var acc = seed + P5 + 8L
    var k1 = v * P2
    k1 = java.lang.Long.rotateLeft(k1, 31)
    k1 *= P1
    acc ^= k1
    acc = java.lang.Long.rotateLeft(acc, 27) * P1 + P4
    acc ^= acc >>> 33
    acc *= P2
    acc ^= acc >>> 29
    acc *= P3
    acc ^= acc >>> 32
    acc
  }
}

/** k-permutation MinHash signature over an `array<long>` of shingle
  * hashes: sig[i] = min over h of xxh64(h, seed = i).
  *
  * The HOF formulation allocates two k-long boxed arrays per shingle
  * step (interpreted lambda evaluation) — ~25s of the sf0.1 bench.
  * This is one primitive k×m loop per row, codegen'd: the 100 TB
  * dedup path's hot kernel (SURVEY.md §7.3 custom-Catalyst tier).
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val m = hs.numElements()
    val sig = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < m) {
      val h = hs.getLong(j)
      var i = 0
      while (i < k) {
        val v = HashKernels.xxh64Long(h, i.toLong)
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val m = ctx.freshName("m")
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |int $m = $hs.numElements();
         |long[] $sig = new long[$k];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $j = 0; $j < $m; $j++) {
         |  long $h = $hs.getLong($j);
         |  for (int $i = 0; $i < $k; $i++) {
         |    long $v = graft.plans.HashKernels.xxh64Long($h, (long) $i);
         |    if ($v < $sig[$i]) $sig[$i] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Shared tokenizer for all native text kernels.
  *
  * CRITICAL whitespace contract: splits on Java-regex `\s` —
  * EXACTLY `[ \t\n\x0B\f\r]`, ASCII-only — because every kernel here
  * claims bit-identity with a `split(lower(text), "\\s+")` HOF
  * formulation and with DuckDB's RE2 `string_split_regex('\s+')`,
  * and BOTH of those treat `\s` as ASCII. `Character.isWhitespace`
  * is Unicode-aware (U+3000 ideographic space etc.) and would
  * silently diverge on non-ASCII corpora (e.g. zh text). */
object TokKernel {
  @inline def isSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Lowercased whitespace-run tokens of `s` (already lowercased). */
  def tokens(s: String): java.util.ArrayList[String] = {
    val out = new java.util.ArrayList[String]()
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && isSpace(s.charAt(i))) i += 1
      val start = i
      while (i < len && !isSpace(s.charAt(i))) i += 1
      if (i > start) out.add(s.substring(start, i))
    }
    out
  }
}

/** Tokenize + word-n-gram-shingle + hash, fused into one native pass:
  * text -> distinct array<long> of shingle hashes.
  *
  * Replaces the interpreted lower/split/transform/slice/array_join/
  * xxhash64 chain, which allocated a UTF8String per token, per shingle
  * string, and boxed array per row — the dominant garbage source of the
  * fuzzy-dedup pipeline (young-GC pauses ate more time than compute).
  * Semantics mirror Dedup.tokens + wordShingles + shingleHashes: tokens
  * split on whitespace runs of lowercased text, a doc shorter than n
  * yields one whole-text shingle, shingles are space-joined and
  * de-duplicated. Hash = XXH64 over UTF-8 bytes, seed 42.
  */
object ShingleKernels {
  def shingleHashes(text: org.apache.spark.unsafe.types.UTF8String, n: Int): Array[Long] = {
    val s = text.toLowerCase.toString
    val tokens = TokKernel.tokens(s)
    val m = tokens.size
    val sb = new java.lang.StringBuilder(64)
    def hashOf(str: String): Long = {
      val bytes = str.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
    }
    if (m < n) {
      sb.setLength(0)
      var j = 0
      while (j < m) { if (j > 0) sb.append(' '); sb.append(tokens.get(j)); j += 1 }
      Array(hashOf(sb.toString))
    } else {
      val seen = new java.util.HashSet[java.lang.Long]()
      val out = new java.util.ArrayList[java.lang.Long]()
      var j = 0
      while (j <= m - n) {
        sb.setLength(0)
        var q = 0
        while (q < n) { if (q > 0) sb.append(' '); sb.append(tokens.get(j + q)); q += 1 }
        val h = java.lang.Long.valueOf(hashOf(sb.toString))
        if (seen.add(h)) out.add(h)
        j += 1
      }
      val res = new Array[Long](out.size)
      var r = 0
      while (r < res.length) { res(r) = out.get(r); r += 1 }
      res
    }
  }
}

/** Positional n-token window hashes, one per window, order-sensitive,
  * NOT de-duplicated — the fingerprint stream behind exact-substring
  * span dedup ([[graft.operators.Dedup.verbatimSpans]]): window j
  * covers tokens [j, j+n) of the lowercased whitespace tokenization
  * and out[j] must equal out'[j'] iff the token sequences match (mod
  * 64-bit collisions).
  *
  * Each token is byte-hashed ONCE (XXH64, seed 42), then each window
  * chain-mixes its n token hashes ([[HashKernels.xxh64Long]] fold —
  * order-sensitive by construction). That makes the per-doc cost
  * O(T) string hashing + O(T·n) long mixes, versus the Column-level
  * slice+concat formulation's O(T·n) string BUILDS + hashes — the
  * string work is what dominated (measured 3× on the documents
  * fixture at n=8). */
object WindowKernels {
  def windowHashes(text: org.apache.spark.unsafe.types.UTF8String, n: Int): Array[Long] = {
    val tokens = TokKernel.tokens(text.toLowerCase.toString)
    val m = tokens.size
    if (m < n) return Array.emptyLongArray
    val th = new Array[Long](m)
    var j = 0
    while (j < m) {
      val bytes = tokens.get(j).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      th(j) = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
      j += 1
    }
    val out = new Array[Long](m - n + 1)
    var w = 0
    while (w < out.length) {
      var acc = 42L
      var q = 0
      while (q < n) { acc = HashKernels.xxh64Long(th(w + q), acc); q += 1 }
      out(w) = acc
      w += 1
    }
    out
  }
}

/** text -> array<long> positional window hashes via [[WindowKernels]]. */
case class WindowHash64(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "window_hash64"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(WindowKernels.windowHashes(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.plans.WindowKernels.windowHashes($t, $n));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): WindowHash64 =
    copy(child = newChild)
}

/** text -> array<long> shingle hashes via [[ShingleKernels]]. */
case class ShingleHash64(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash64"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(ShingleKernels.shingleHashes(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.plans.ShingleKernels.shingleHashes($t, $n));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): ShingleHash64 =
    copy(child = newChild)
}

/** Exact n-gram repetition stats in one native pass:
  * text -> (n_ngrams, n_uniq) over space-joined word n-grams of the
  * lowercased, whitespace-tokenized text. Distinctness is on the exact
  * n-gram STRINGS (HashSet), matching DuckDB's list_distinct — no
  * hash-collision caveat. Replaces an interpreted
  * transform(sequence)/concat_ws/array_distinct chain that allocated a
  * Catalyst array of n-gram UTF8Strings per row (the slowest query of
  * the sf0.1 verify pass by 2x before this).
  */
object NgramKernels {
  /** returns {count, uniq}; m < n tokens -> {0, 0} (q65 semantics). */
  def ngramStats(text: org.apache.spark.unsafe.types.UTF8String, n: Int): Array[Long] = {
    val s = text.toLowerCase.toString
    val tokens = TokKernel.tokens(s)
    val m = tokens.size
    if (m < n) return Array(0L, 0L)
    val seen = new java.util.HashSet[String]()
    val sb = new java.lang.StringBuilder(64)
    var j = 0
    while (j <= m - n) {
      sb.setLength(0)
      var q = 0
      while (q < n) { if (q > 0) sb.append(' '); sb.append(tokens.get(j + q)); q += 1 }
      seen.add(sb.toString)
      j += 1
    }
    Array((m - n + 1).toLong, seen.size.toLong)
  }
}

/** Distinct word n-gram STRINGS of the lowercased text, one native
  * pass. No whole-text fallback for short docs (unlike ShingleHash64):
  * m < n tokens -> empty array — the decontamination semantics, where
  * a 3-token doc simply has no 5-grams to match. */
object NgramStringKernels {
  def ngramStrings(text: org.apache.spark.unsafe.types.UTF8String, n: Int)
      : Array[org.apache.spark.unsafe.types.UTF8String] = {
    val s = text.toLowerCase.toString
    val tokens = TokKernel.tokens(s)
    val m = tokens.size
    if (m < n) return Array.empty
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder(64)
    var j = 0
    while (j <= m - n) {
      sb.setLength(0)
      var q = 0
      while (q < n) { if (q > 0) sb.append(' '); sb.append(tokens.get(j + q)); q += 1 }
      seen.add(sb.toString)
      j += 1
    }
    val out = new Array[org.apache.spark.unsafe.types.UTF8String](seen.size)
    val it = seen.iterator()
    var r = 0
    while (it.hasNext) {
      out(r) = org.apache.spark.unsafe.types.UTF8String.fromString(it.next()); r += 1
    }
    out
  }
}

/** EVERY word n-gram of the lowercased text, in order, repeats
  * included — the total-count stream (hot-n-gram heavy hitters needs
  * mass, not presence; [[NgramStringKernels]] dedups per doc and
  * serves the doc-frequency ops). m < n tokens -> empty. */
object NgramStringAllKernels {
  def ngramStringsAll(text: org.apache.spark.unsafe.types.UTF8String, n: Int)
      : Array[org.apache.spark.unsafe.types.UTF8String] = {
    val s = text.toLowerCase.toString
    val tokens = TokKernel.tokens(s)
    val m = tokens.size
    if (m < n) return Array.empty
    val out = new Array[org.apache.spark.unsafe.types.UTF8String](m - n + 1)
    val sb = new java.lang.StringBuilder(64)
    var j = 0
    while (j <= m - n) {
      sb.setLength(0)
      var q = 0
      while (q < n) { if (q > 0) sb.append(' '); sb.append(tokens.get(j + q)); q += 1 }
      out(j) = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
      j += 1
    }
    out
  }
}

case class NgramStringsAll(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ngram_strings_all"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(NgramStringAllKernels.ngramStringsAll(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
      .asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  (Object[]) graft.plans.NgramStringAllKernels.ngramStringsAll($t, $n));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): NgramStringsAll =
    copy(child = newChild)
}

case class NgramStrings(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ngram_strings"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(NgramStringKernels.ngramStrings(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
      .asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  (Object[]) graft.plans.NgramStringKernels.ngramStrings($t, $n));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): NgramStrings =
    copy(child = newChild)
}

case class NgramStats(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_stats"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(NgramKernels.ngramStats(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.plans.NgramKernels.ngramStats($t, $n));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): NgramStats =
    copy(child = newChild)
}

/** 64-bit SimHash of the whitespace-tokenized, lowercased text in one
  * native pass — replicates the dataflow formulation in
  * `Dedup.simhashFingerprintsAgg` exactly (per-token XXH64 with
  * Spark's seed 42, ±1 votes per bit over ALL tokens incl. repeats,
  * bit set iff vote sum > 0, zero-token docs -> 0) WITHOUT the
  * explode + 64-aggregate groupBy: the fingerprint becomes a pure
  * per-row expression, so fingerprinting a corpus needs NO shuffle
  * at all. */
object SimHashKernels {
  def simhash64(text: org.apache.spark.unsafe.types.UTF8String): Long = {
    val s = text.toLowerCase.toString
    val votes = new Array[Int](64)
    var any = false
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && TokKernel.isSpace(s.charAt(i))) i += 1
      val start = i
      while (i < len && !TokKernel.isSpace(s.charAt(i))) i += 1
      if (i > start) {
        any = true
        val bytes = s.substring(start, i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
          bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
    }
    if (!any) 0L
    else {
      var fp = 0L
      var b = 0
      while (b < 64) { if (votes(b) > 0) fp |= 1L << b; b += 1 }
      fp
    }
  }
}

case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHashKernels.simhash64(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.plans.SimHashKernels.simhash64($t);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Stopword-evidence language ID in one native pass — mirrors
  * TextAnalysis.langId's argmax-with-alphabetical-tiebreak exactly:
  * score_l = |tokens ∩ stopwords_l| / max(|tokens|, 1); first language
  * (sorted order) with a strictly greater score wins; no evidence ->
  * "und". All languages share the denominator, so the kernel compares
  * raw counts — no floating point at all. Replaces 5 interpreted
  * filter() HOFs (each with a 10-way isin per token) that also
  * re-tokenized the text 5 times.
  */
object LangKernels {
  private[plans] val langs: Array[String] =
    graft.operators.TextAnalysis.stopwords.keys.toArray.sorted
  private val masks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    langs.zipWithIndex.foreach { case (l, i) =>
      graft.operators.TextAnalysis.stopwords(l).foreach { w =>
        val prev = m.getOrDefault(w, Integer.valueOf(0)).intValue()
        m.put(w, Integer.valueOf(prev | (1 << i))) // "la" is es AND fr
      }
    }
    m
  }
  private val und = org.apache.spark.unsafe.types.UTF8String.fromString("und")
  private val langU8: Array[org.apache.spark.unsafe.types.UTF8String] =
    langs.map(org.apache.spark.unsafe.types.UTF8String.fromString)

  def langId(text: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = {
    val s = text.toLowerCase.toString
    val cnts = new Array[Int](langs.length)
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && TokKernel.isSpace(s.charAt(i))) i += 1
      val start = i
      while (i < len && !TokKernel.isSpace(s.charAt(i))) i += 1
      if (i > start) {
        val mask = masks.get(s.substring(start, i))
        if (mask != null) {
          var b = mask.intValue()
          while (b != 0) {
            val k = java.lang.Integer.numberOfTrailingZeros(b)
            cnts(k) += 1
            b &= b - 1
          }
        }
      }
    }
    var best = 0
    var k = 1
    while (k < cnts.length) { if (cnts(k) > cnts(best)) best = k; k += 1 }
    if (cnts(best) == 0) und else langU8(best)
  }
}

case class LangId(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  override def nullSafeEval(input: Any): Any =
    LangKernels.langId(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.plans.LangKernels.langId($t);")

  override protected def withNewChildInternal(newChild: Expression): LangId =
    copy(child = newChild)
}

/** Gopher-style repetition signals (Rae et al. 2021, "Scaling Language
  * Models", table A1 quality filters) in ONE native pass: word-n-gram
  * repetition (total/distinct/top count/top char mass) and duplicate
  * -line stats (lines split on '\n', empties dropped). Char counts are
  * UTF-16 units — identical to codepoints on the ASCII corpus and to
  * DuckDB's length() there (same caveat as every length() use here).
  *
  * The "top n-gram char mass" is max over grams of count·len(gram) —
  * tie-free (Gopher's "chars in the MOST FREQUENT n-gram" is ambiguous
  * under count ties; the max-product is deterministic and equals it
  * whenever the top gram is unique).
  */
object RepKernels {
  /** [nGrams, distinctGrams, maxGramCount, maxGramCharProd,
    *  nLines, distinctLines, dupLineChars, totalLineChars] */
  def repStats(text: org.apache.spark.unsafe.types.UTF8String, n: Int): Array[Long] = {
    val s = text.toLowerCase.toString
    val tokens = TokKernel.tokens(s)
    val m = tokens.size
    val counts = new java.util.HashMap[String, Int]()
    var grams = 0L
    if (m >= n) {
      val sb = new java.lang.StringBuilder(64)
      var j = 0
      while (j <= m - n) {
        sb.setLength(0)
        var q = 0
        while (q < n) { if (q > 0) sb.append(' '); sb.append(tokens.get(j + q)); q += 1 }
        counts.merge(sb.toString, 1, Integer.sum)
        j += 1
      }
      grams = (m - n + 1).toLong
    }
    var maxc = 0L
    var maxProd = 0L
    val git = counts.entrySet().iterator()
    while (git.hasNext) {
      val e = git.next()
      val c = e.getValue.toLong
      if (c > maxc) maxc = c
      val prod = c * e.getKey.length
      if (prod > maxProd) maxProd = prod
    }
    val lineCounts = new java.util.HashMap[String, Int]()
    var nLines = 0L
    s.split("\n", -1).foreach { line =>
      if (line.nonEmpty) { nLines += 1; lineCounts.merge(line, 1, Integer.sum) }
    }
    var dupChars = 0L
    var totChars = 0L
    val lit = lineCounts.entrySet().iterator()
    while (lit.hasNext) {
      val e = lit.next()
      val c = e.getValue.toLong
      val len = e.getKey.length.toLong
      totChars += c * len
      if (c > 1) dupChars += c * len
    }
    Array(grams, counts.size.toLong, maxc, maxProd,
      nLines, lineCounts.size.toLong, dupChars, totChars)
  }
}

case class RepStats(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rep_stats"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(RepKernels.repStats(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.plans.RepKernels.repStats($t, $n));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): RepStats =
    copy(child = newChild)
}

/** Trained BPE merge list as an immutable, serializable plan object:
  * rank = position in the merge sequence (first merge = rank 0 = most
  * frequent pair at train time). Shipped to executors ONCE per plan via
  * codegen's reference-object mechanism — never re-parsed per row.
  * Pairs key a tuple map (no joined-string key: a symbol may contain
  * any non-whitespace character, so no separator is collision-safe). */
final class BpeRanks(val merges: Array[(String, String)],
    val byteLevel: Boolean = false) extends Serializable {
  @transient lazy val rank: java.util.HashMap[(String, String), Integer] = {
    val m = new java.util.HashMap[(String, String), Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) {
      if (!m.containsKey(merges(i))) m.put(merges(i), Integer.valueOf(i))
      i += 1
    }
    m
  }
  // value equality on the merge sequence so expression canonicalization
  // (and with it codegen CSE) sees two same-merges encoders as equal
  override def equals(o: Any): Boolean = o match {
    case r: BpeRanks => byteLevel == r.byteLevel && java.util.Arrays.equals(
      merges.asInstanceOf[Array[AnyRef]], r.merges.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode: Int =
    31 * java.util.Arrays.hashCode(merges.asInstanceOf[Array[AnyRef]]) +
      (if (byteLevel) 1 else 0)
}

/** BPE apply-side (the other half of [[graft.operators.TextAnalysis]]
  * bpeTrain): tokenize (lowercase, whitespace runs — TokKernel), then
  * per word repeatedly merge the BEST-RANKED adjacent symbol pair,
  * left-to-right non-overlapping ("aaaa" under (a,a) → "aa","aa" — the
  * mergeAdjacent law), until no adjacent pair holds a trained rank.
  * Initial symbols are CODE POINTS (matches the trainer's Spark-SQL
  * `substring(tok,i,1)` char split, which is code-point based — a
  * UTF-16 char split would break surrogate pairs). */
object BpeKernels {
  def encode(text: org.apache.spark.unsafe.types.UTF8String, ranks: BpeRanks)
      : Array[org.apache.spark.unsafe.types.UTF8String] = {
    val toks = TokKernel.tokens(text.toLowerCase.toString)
    val out = new java.util.ArrayList[org.apache.spark.unsafe.types.UTF8String]()
    val rank = ranks.rank
    var w = 0
    while (w < toks.size) {
      val word = toks.get(w)
      // split to code points — or, byte-level, to UTF-8 bytes mapped
      // one-to-one onto Latin-1 chars (code points 0..255), so the
      // same string-symbol machinery serves both alphabets
      var syms = new java.util.ArrayList[String](word.length)
      if (ranks.byteLevel) {
        val bytes = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        var i = 0
        while (i < bytes.length) {
          syms.add(String.valueOf((bytes(i) & 0xFF).toChar))
          i += 1
        }
      } else {
        var i = 0
        while (i < word.length) {
          val cp = word.codePointAt(i)
          val cc = Character.charCount(cp)
          syms.add(word.substring(i, i + cc))
          i += cc
        }
      }
      var done = rank.isEmpty
      while (!done && syms.size >= 2) {
        // best (lowest) rank among adjacent pairs
        var best = Integer.MAX_VALUE
        var bl: String = null; var br: String = null
        var j = 0
        while (j < syms.size - 1) {
          val r = rank.get((syms.get(j), syms.get(j + 1)))
          if (r != null && r < best) { best = r; bl = syms.get(j); br = syms.get(j + 1) }
          j += 1
        }
        if (bl == null) done = true
        else {
          val merged = new java.util.ArrayList[String](syms.size)
          var p = 0
          while (p < syms.size) {
            if (p < syms.size - 1 && syms.get(p) == bl && syms.get(p + 1) == br) {
              merged.add(bl + br); p += 2
            } else { merged.add(syms.get(p)); p += 1 }
          }
          syms = merged
        }
      }
      var q = 0
      while (q < syms.size) {
        out.add(org.apache.spark.unsafe.types.UTF8String.fromString(syms.get(q)))
        q += 1
      }
      w += 1
    }
    out.toArray(new Array[org.apache.spark.unsafe.types.UTF8String](out.size))
  }
}

case class BpeEncode(child: Expression, ranks: BpeRanks) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(BpeKernels.encode(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], ranks)
      .asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.addReferenceObj("bpeRanks", ranks, "graft.plans.BpeRanks")
    nullSafeCodeGen(ctx, ev, t =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  (Object[]) graft.plans.BpeKernels.encode($t, $r));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object TextExpressions {
  /** Column entry point: shingle-hash array -> k-long MinHash signature. */
  def minhashSig(shingleHashes: Column, k: Int): Column =
    GraftSqlBridge.column(MinHashSig(GraftSqlBridge.expression(shingleHashes), k))

  /** Column entry point: text -> distinct shingle-hash array (fused). */
  def shingleHash64(text: Column, n: Int): Column =
    GraftSqlBridge.column(ShingleHash64(GraftSqlBridge.expression(text), n))

  /** Column entry point: text -> positional n-token window hashes. */
  def windowHash64(text: Column, n: Int): Column =
    GraftSqlBridge.column(WindowHash64(GraftSqlBridge.expression(text), n))

  /** Column entry point: text -> [n_ngrams, n_uniq] exact stats. */
  def ngramStats(text: Column, n: Int): Column =
    GraftSqlBridge.column(NgramStats(GraftSqlBridge.expression(text), n))

  /** Column entry point: text -> 8-long Gopher repetition stats. */
  def repStats(text: Column, n: Int): Column =
    GraftSqlBridge.column(RepStats(GraftSqlBridge.expression(text), n))

  /** Column entry point: text -> distinct n-gram strings. */
  def ngramStrings(text: Column, n: Int): Column =
    GraftSqlBridge.column(NgramStrings(GraftSqlBridge.expression(text), n))

  /** Column entry point: text -> ALL n-gram strings (repeats kept). */
  def ngramStringsAll(text: Column, n: Int): Column =
    GraftSqlBridge.column(NgramStringsAll(GraftSqlBridge.expression(text), n))

  /** Column entry point: text -> language code (native argmax). */
  def langIdNative(text: Column): Column =
    GraftSqlBridge.column(LangId(GraftSqlBridge.expression(text)))

  /** Column entry point: text -> 64-bit SimHash fingerprint. */
  def simhash64(text: Column): Column =
    GraftSqlBridge.column(SimHash64(GraftSqlBridge.expression(text)))

  /** Column entry point: text -> BPE symbol array under a trained
    * merge list (apply-side of bpeTrain). `byteLevel` switches the
    * initial alphabet from code points to UTF-8 bytes (as Latin-1
    * chars); the merge list must come from the SAME mode's trainer. */
  def bpeEncode(text: Column, merges: Seq[(String, String)],
      byteLevel: Boolean = false): Column =
    GraftSqlBridge.column(BpeEncode(GraftSqlBridge.expression(text),
      new BpeRanks(merges.toArray, byteLevel)))
}
