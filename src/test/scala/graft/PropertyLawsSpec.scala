package graft

import org.apache.spark.sql.functions._
import graft.functions.Aggregators.TopKByScore
import graft.functions.PigFunctions._
import graft.pig.PigPreprocessor

/** Randomized law tests (seeded — deterministic across runs).
  *
  * TopKByScore's laws are checked pure-JVM over arbitrary merge trees:
  * Spark may split input across any partitioning and merge partial
  * states in any order, so the aggregator must give the identical
  * answer for every (split, merge-order) choice.
  *
  * The string shims are checked in ONE distributed pass: generate the
  * cases driver-side, compute the expected value with plain Java string
  * ops (the semantics Pig's builtins defer to), run the shim on an
  * executor, compare row-wise.
  */
class PropertyLawsSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  test("TopKByScore: any split + any merge order equals global sorted take(k)") {
    for (_ <- 1 to 200) {
      val n = rnd.nextInt(40)
      val k = 1 + rnd.nextInt(8)
      val agg = new TopKByScore(k)
      // duplicate scores on purpose: ties must break by id, not arrival
      val items = Seq.fill(n)((rnd.nextInt(8).toDouble, rnd.nextLong().abs % 1000))
      val want = items.sortBy(t => (-t._1, t._2)).distinct.take(k)
      // random split into partial buffers, each reduced in arrival order
      var buffers = items.distinct.grouped(1 + rnd.nextInt(5))
        .map(_.foldLeft(agg.zero)(agg.reduce)).toList
      // random-order pairwise merges down to one buffer
      while (buffers.length > 1) {
        val i = rnd.nextInt(buffers.length)
        val a = buffers(i); val rest = buffers.patch(i, Nil, 1)
        val j = rnd.nextInt(rest.length)
        buffers = rest.updated(j, agg.merge(a, rest(j)))
      }
      val got = buffers.headOption.map(agg.finish).getOrElse(Nil)
      assert(got == want, s"n=$n k=$k got=$got want=$want")
    }
  }

  test("BoundedConcat: any split + any merge order equals global sorted take(n)") {
    for (_ <- 1 to 200) {
      val n = rnd.nextInt(60)
      val bound = 1 + rnd.nextInt(6)
      val agg = new graft.functions.Aggregators.BoundedConcat(bound, ",")
      // duplicates on purpose: the bar's >= reject must not change the
      // multiset of the n smallest (equal strings are indistinguishable)
      val items = Seq.fill(n)(s"s${rnd.nextInt(12)}")
      val want = items.sorted.take(bound).mkString(",")
      var buffers = items.grouped(1 + rnd.nextInt(5))
        .map(_.foldLeft(agg.zero)(agg.reduce)).toList
      while (buffers.length > 1) {
        val i = rnd.nextInt(buffers.length)
        val a = buffers(i); val rest = buffers.patch(i, Nil, 1)
        val j = rnd.nextInt(rest.length)
        buffers = rest.updated(j, agg.merge(a, rest(j)))
      }
      val got = buffers.headOption.map(agg.finish).getOrElse("")
      assert(got == want, s"n=$n bound=$bound got=$got want=$want")
    }
  }

  test("substringPig/indexOfPig/lastIndexOfPig match Java semantics on generated cases") {
    val alphabet = "ab#x "
    def randStr(): String =
      Seq.fill(rnd.nextInt(12))(alphabet(rnd.nextInt(alphabet.length))).mkString
    val cases = Seq.fill(400)((randStr(), rnd.nextInt(14), rnd.nextInt(14)))
    // Pig SUBSTRING(s, start, stop): 0-based [start, stop), null when
    // out of range (mirrors Java substring throwing)
    def pigSubstr(s: String, start: Int, stop: Int): String =
      try s.substring(start, stop) catch { case _: Exception => null }
    val df = cases.zipWithIndex
      .map { case ((s, a, b), i) => (i, s, a, b) }.toDF("i", "s", "a", "b")
    val got = df.select($"i",
        expr("substring(s, a + 1, greatest(b - a, 0))").as("sub_builtin"),
        indexOfPig($"s", "#").as("idx"),
        lastIndexOfPig($"s", "#").as("lidx"))
      .as[(Int, String, Int, Int)].collect().sortBy(_._1)
    cases.zipWithIndex.foreach { case ((s, a, b), i) =>
      val (_, _, idx, lidx) = got(i)
      assert(idx == s.indexOf("#"), s"indexOf($s)")
      assert(lidx == s.lastIndexOf("#"), s"lastIndexOf($s)")
      // in-range substring agrees with the 1-based builtin shim recipe
      if (a <= b && b <= s.length) {
        val (_, sub, _, _) = got(i)
        assert(sub == pigSubstr(s, a, b), s"substr($s,$a,$b)")
      }
    }
  }

  test("roundPig is HALF_UP like Pig/BigDecimal on generated decimals") {
    val cases = Seq.fill(300) {
      val scaled = rnd.nextInt(2000000) - 1000000
      (scaled / 1000.0, rnd.nextInt(3)) // up to 3 decimal places, round to 0-2
    }
    val df = cases.zipWithIndex.map { case ((v, s), i) => (i, v, s) }.toDF("i", "v", "s")
    // round() with a literal scale; group cases by scale to keep it literal
    cases.map(_._2).distinct.foreach { s =>
      val idx = cases.zipWithIndex.filter(_._1._2 == s).map(_._2).toSet
      val got = df.filter($"s" === s).select($"i", roundPig($"v", s)).as[(Int, Double)]
        .collect().toMap
      idx.foreach { i =>
        val want = BigDecimal(cases(i)._1)
          .setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(got(i) == want, s"round(${cases(i)._1}, $s): got ${got(i)} want $want")
      }
    }
  }

  test("Pig parser: random token soup parses or fails fast with a position — never hangs") {
    val tokens = Array(
      "LOAD", "FILTER", "FOREACH", "GENERATE", "GROUP", "BY", "JOIN",
      "ORDER", "LIMIT", "CASE", "WHEN", "THEN", "ELSE", "END", "AS",
      "FLATTEN", "ALL", "USING", "MATCHES", "AND", "OR", "NOT", "a",
      "b", "x12", "foo::bar", "$0", "$3", "'str'", "3", "2.5", "-1",
      "(", ")", "{", "}", ",", ";", "=", "==", "<=", ">", "+", "*",
      "/", "%", "?", ":", "..", ".", "#", "::", "*", "NULL", "TRUE",
      // round-5 statement surface: SET / REGISTER / namespaced UDF calls
      "SET", "REGISTER", "default_parallel", "spark.sql.x", "jython",
      "ns.f", "m.double_it",
      // late-round-5 surface: MAPREDUCE bridge, qualified storage classes
      "MAPREDUCE", "STORE", "INTO", "`args`",
      "org.apache.pig.piggybank.storage.CSVExcelStorage", "XMLLoader",
      "SequenceFileLoader", "HBaseStorage", "'merge-sparse'")
    for (i <- 1 to 400) {
      val n = 1 + rnd.nextInt(24)
      val soup = Seq.fill(n)(tokens(rnd.nextInt(tokens.length))).mkString(" ")
      val t0 = System.nanoTime()
      try { graft.pig.PigParser.parseScript(soup); () }
      catch {
        case e: IllegalArgumentException =>
          assert(e.getMessage.contains("line"), s"no position for: $soup")
        case e: Throwable => fail(s"unexpected ${e.getClass.getName} for: $soup")
      }
      assert((System.nanoTime() - t0) < 5e9, s"parser took >5s on: $soup")
    }
  }

  test("macro expansion hygiene: prefix-named params never corrupt, locals always rename") {
    // Generated DEFINE…RETURNS macros where one param's name is a strict
    // prefix of another's (`$p` vs `$prio`), declared in random order and
    // referenced in both orders in the body. Expansion must substitute
    // each ref with ITS arg (a naive `$p` → arg replace would turn
    // `$prio` into `<arg>rio`), rename every macro-local alias, and
    // leave zero `$` refs behind.
    val letters = "abcdefghijkmnpqsuvwz" // no l/o (confusable), no r/t (R/T are taken)
    def name(len: Int) = Seq.fill(len)(letters(rnd.nextInt(letters.length))).mkString
    for (i <- 1 to 300) {
      val short = name(1 + rnd.nextInt(3))
      val long = short + name(1 + rnd.nextInt(4))
      val (argShort, argLong) = (100 + rnd.nextInt(400), 700 + rnd.nextInt(300))
      val declOrder = rnd.nextBoolean()
      val (p1, p2, a1, a2) =
        if (declOrder) (short, long, argShort, argLong)
        else (long, short, argLong, argShort)
      val refOrder = rnd.nextBoolean()
      val body =
        if (refOrder)
          s"f = FILTER $$R BY pr > $$$long; g = LIMIT f $$$short; $$T = DISTINCT g;"
        else
          s"f = LIMIT $$R $$$short; g = FILTER f BY pr > $$$long; $$T = DISTINCT g;"
      val script =
        s"""DEFINE m(R, $p1, $p2) RETURNS T { $body };
           |a = LOAD 'x';
           |b = m(a, $a1, $a2);""".stripMargin
      val out = PigPreprocessor(script, Map.empty)
      assert(out.contains(s"BY pr > $argLong"),
        s"[$i] long param corrupted by prefix:\n$script\n-->\n$out")
      assert(s"""LIMIT __m\\d+_\\w+ $argShort\\b""".r.findFirstIn(out).isDefined
        || s"""LIMIT a $argShort\\b""".r.findFirstIn(out).isDefined,
        s"[$i] short param corrupted:\n$script\n-->\n$out")
      assert(!out.contains("$"), s"[$i] unexpanded ref survives:\n$out")
      assert(out.contains("b = DISTINCT"), s"[$i] return alias not bound:\n$out")
      // macro-local aliases f/g must be renamed at every position
      for (l <- Seq("f", "g"))
        assert(!out.linesIterator.exists(_.trim.startsWith(s"$l =")),
          s"[$i] local alias '$l' leaked:\n$out")
    }
  }

  test("pig parse→compile round-trip: generated scripts equal the reference dataflow; mutations fail loudly") {
    // Generator over the supported statement grammar: each op carries
    // BOTH a Pig rendering and an independent DataFrame rendering, so a
    // parse or compile slip shows up as a RESULT diff, not a hunch.
    // (The token-soup test above covers "garbage fails fast"; this one
    // covers the other direction — valid scripts never silently
    // mis-compile — plus keyword mutations that must throw, not
    // mis-run.)
    import org.apache.spark.sql.DataFrame
    val proj = "P0 = FOREACH L GENERATE l_orderkey, l_linenumber, l_quantity, l_returnflag;"
    val refBase = tables.lineitem
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_returnflag"))

    // (pig statement builder, reference builder, terminal?)
    case class Op(pig: (String, String) => String, ref: DataFrame => DataFrame,
      terminal: Boolean = false)
    def ops(): Op = rnd.nextInt(6) match {
      case 0 =>
        val q = 1 + rnd.nextInt(49)
        Op((in, out) => s"$out = FILTER $in BY l_quantity > $q;",
          _.filter(col("l_quantity") > q))
      case 1 =>
        val f = Seq("R", "A", "N")(rnd.nextInt(3))
        Op((in, out) => s"$out = FILTER $in BY l_returnflag == '$f';",
          _.filter(col("l_returnflag") === f))
      case 2 =>
        Op((in, out) => s"$out = DISTINCT $in;", _.distinct())
      case 3 =>
        val k = 1 + rnd.nextInt(200)
        // (l_orderkey, l_linenumber) is unique, so LIMIT is deterministic
        Op((in, out) =>
          s"__s$out = ORDER $in BY l_orderkey ASC, l_linenumber ASC; " +
            s"$out = LIMIT __s$out $k;",
          _.orderBy(col("l_orderkey").asc, col("l_linenumber").asc).limit(k))
      case 4 =>
        Op((in, out) => s"$out = FOREACH $in GENERATE l_orderkey, " +
          s"l_quantity * 2.0 AS q2;",
          _.select(col("l_orderkey"), (col("l_quantity") * 2.0).as("q2")),
          terminal = true)
      case 5 =>
        Op((in, out) =>
          s"__g$out = GROUP $in BY l_returnflag; " +
            s"$out = FOREACH __g$out GENERATE group AS l_returnflag, COUNT($in) AS n;",
          _.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n")),
          terminal = true)
    }

    val mutations = Seq("FILTER " -> "FILTRE ", " BY " -> " BYE ",
      "GENERATE " -> "GENRATE ", "DISTINCT " -> "DISTINKT ")
    for (i <- 1 to 30) {
      val nOps = 1 + rnd.nextInt(4)
      val chain = scala.collection.mutable.ArrayBuffer.empty[Op]
      while (chain.length < nOps && !chain.lastOption.exists(_.terminal))
        chain += ops()
      var alias = "P0"
      var refDf = refBase
      val lines = new StringBuilder
      lines ++= s"L = LOAD '$$DIR/lineitem.parquet' USING parquet;\n$proj\n"
      chain.zipWithIndex.foreach { case (op, j) =>
        val out = s"P${j + 1}"
        lines ++= op.pig(alias, out) + "\n"
        refDf = op.ref(refDf)
        alias = out
      }
      val script = lines.toString
      val got = graft.pig.PigScript.query(spark, script, Map("DIR" -> sf))
        .collect().map(_.toString).sorted.toSeq
      val want = refDf.collect().map(_.toString).sorted.toSeq
      assert(got == want,
        s"[$i] round-trip diverged (${got.length} vs ${want.length} rows):\n$script")
      // a keyword mutation must throw a positioned parse error — never
      // return a (wrong) result
      val applicable = mutations.filter(m => script.contains(m._1))
      if (applicable.nonEmpty) {
        val (from, to) = applicable(rnd.nextInt(applicable.length))
        val bad = script.replaceFirst(java.util.regex.Pattern.quote(from),
          java.util.regex.Matcher.quoteReplacement(to))
        val e = intercept[IllegalArgumentException] {
          graft.pig.PigScript.query(spark, bad, Map("DIR" -> sf)).collect()
        }
        assert(e.getMessage.contains("line"),
          s"[$i] mutation '$from'->'$to' error lacks position: ${e.getMessage}")
      }
    }
  }

  test("normalizeUrl is idempotent and host/domain are stable on generated URLs") {
    import graft.operators.TextAnalysis._
    val schemes = Array("http", "HTTPS", "Http")
    val hosts = Array("Ex.COM", "www.ex.com", "A.B.Ex.Com", "x9.example.org")
    val paths = Array("", "/", "/P/q", "/deep/Path-1")
    val queries = Array("", "?q=1", "?utm_source=a", "?utm_source=a&q=1",
      "?a=1&utm_medium=m&b=2", "?utm_x=1&utm_y=2")
    val frags = Array("", "#f", "#Sec/2")
    val urls = Seq.fill(150) {
      schemes(rnd.nextInt(schemes.length)) + "://" +
        hosts(rnd.nextInt(hosts.length)) + paths(rnd.nextInt(paths.length)) +
        queries(rnd.nextInt(queries.length)) + frags(rnd.nextInt(frags.length))
    }
    val rows = urls.toDF("u").select(
        $"u", normalizeUrl($"u").as("n1"),
        normalizeUrl(normalizeUrl($"u")).as("n2"),
        urlHost(normalizeUrl($"u")).as("h"))
      .as[(String, String, String, String)].collect()
    rows.foreach { case (u, n1, n2, h) =>
      assert(n1 == n2, s"not idempotent: $u -> $n1 -> $n2")
      assert(!n1.contains("#") && !n1.contains("utm_"), s"$u -> $n1")
      assert(h == h.toLowerCase && u.toLowerCase.contains(h), s"$u host $h")
    }
  }

  test("incrementalNew laws: empty corpus keeps all; corpus ⊇ batch keeps none") {
    import graft.operators.Dedup
    val batch = Seq.tabulate(60)(i => (i.toLong, s"fp_${i % 37}"))
      .toDF("id", "fp")
    val none = Seq.empty[(Long, String)].toDF("id", "fp").select($"fp")
    assert(Dedup.incrementalNew(batch, none, "fp", expectedSeen = 10L)
      .count() == 60)
    val all = batch.select($"fp")
    assert(Dedup.incrementalNew(batch, all, "fp", expectedSeen = 10L)
      .count() == 0)
  }

  test("quantizeInt8 laws on random vectors: bounds, error, monotone codes") {
    // ONE distributed pass over generated vectors (mixed magnitudes,
    // negatives, near-ties), laws checked row-wise against plain math
    val vecs = (0 until 300).map { i =>
      val dim = 2 + rnd.nextInt(24)
      val scale = math.pow(10, rnd.nextInt(7) - 3)
      (i.toLong, Array.fill(dim)(((rnd.nextDouble() - 0.5) * scale).toFloat))
    }
    val out = vecs.toDF("id", "v")
      .withColumn("q", graft.operators.Similarity.quantizeInt8($"v"))
      .select($"id", $"v".cast("array<double>").as("v"),
        $"q.codes".as("codes"), graft.operators.Similarity.dequantizeInt8($"q").as("vhat"),
        ($"q.mx" - $"q.mn").as("range"))
      .as[(Long, Seq[Double], Seq[Int], Seq[Double], Double)].collect()
    assert(out.length == 300)
    out.foreach { case (id, v, codes, vhat, range) =>
      assert(codes.forall(c => c >= 0 && c <= 255), s"id=$id")
      v.zip(vhat).foreach { case (x, xh) =>
        assert(math.abs(x - xh) <= range / 255.0 * (1 + 1e-9) + 1e-300,
          s"id=$id err ${math.abs(x - xh)} > ${range / 255.0}")
      }
      // codes are monotone in the value: sort by value, codes follow
      val byVal = v.zip(codes).sortBy(_._1)
      assert(byVal.map(_._2).sliding(2).forall {
        case Seq(a, b) => a <= b; case _ => true
      }, s"id=$id codes not monotone")
    }
  }

  test("bpeEncode laws on random texts/merges: lossless concat, no mergeable pair left") {
    // random texts over a tiny alphabet (so random merges actually
    // apply) and random merge lists incl. multi-char compounds
    val alpha = "abc"
    def word() = (0 until 1 + rnd.nextInt(6)).map(_ => alpha(rnd.nextInt(3))).mkString
    val cases = (0 until 120).map { i =>
      val text = (0 until rnd.nextInt(5)).map(_ => word()).mkString(" ")
      val nm = rnd.nextInt(6)
      val merges = Seq.tabulate(nm) { _ =>
        val l = if (rnd.nextBoolean()) word().take(2) else alpha(rnd.nextInt(3)).toString
        val r = alpha(rnd.nextInt(3)).toString
        (l, r)
      }
      (i, text, merges)
    }
    cases.foreach { case (i, text, merges) =>
      val out = Seq(Tuple1(text)).toDF("t")
        .select(graft.plans.TextExpressions.bpeEncode($"t", merges).as("e"))
        .as[Seq[String]].head()
      // losslessness: symbols concatenate back to the tokenized text
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      assert(out.mkString == toks.mkString, s"case $i: '$text' merges=$merges out=$out")
      // fixpoint: no adjacent pair inside any word still holds a rank
      // (word boundaries recovered by walking token lengths)
      val ranks = merges.zipWithIndex.filter { case (m, idx) =>
        merges.indexOf(m) == idx }.toMap
      var rest = out.toList
      toks.foreach { w =>
        var len = 0
        val syms = scala.collection.mutable.ArrayBuffer.empty[String]
        while (len < w.length) { syms += rest.head; len += rest.head.length; rest = rest.tail }
        syms.toSeq.sliding(2).foreach {
          case Seq(a, b) => assert(!ranks.contains((a, b)),
            s"case $i: mergeable pair ($a,$b) survived in $syms")
          case _ =>
        }
      }
    }
  }

  test("heavyHitters equals exact group-by counts on random skewed streams") {
    for (trial <- 1 to 5) {
      val zipf = (1 to 30).flatMap(r => Seq.fill(1 + 600 / (r * r))(s"w$r"))
      val extra = (0 until 200).map(i => s"rare$i")
      val words = new scala.util.Random(trial).shuffle(zipf ++ extra)
      val docs = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
        .toDF("id", "text").repartition(5 + trial)
      val n = words.size.toLong
      val minCount = 5L + trial * 7
      // smallest capacity the guarantee admits (forces max MG pressure)
      val capacity = (n / minCount + 1).toInt
      val got = graft.operators.TextAnalysis
        .heavyHitters(docs, "text", minCount, capacity)
        .as[(String, Long)].collect().toMap
      val want = words.groupBy(identity).view.mapValues(_.size.toLong)
        .filter(_._2 >= minCount).toMap
      assert(got == want, s"trial $trial: got=$got want=$want")
    }
  }
}
