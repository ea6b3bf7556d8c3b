package graft

import graft.functions.BigNum
import graft.plans.BigNumOps
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Arbitrary-precision BIGINTEGER/BIGDECIMAL — the round-5 verdict's
  * remaining precision gap (DecimalType caps at 38 digits; these
  * don't). No DuckDB oracle can check >38-digit exactness (HUGEINT is
  * int128), so the reference here is java.math.BigDecimal itself, plus
  * partition-invariance laws for the aggregators.
  */
class BigNumSpec extends SparkSpec {
  import spark.implicits._

  private def u(s: String) = UTF8String.fromString(s)
  private def samples[T](g: Gen[T], n: Int = 200): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7L + i)))

  private val decGen: Gen[java.math.BigDecimal] = for {
    digits <- Gen.chooseNum(1, 60)
    s <- Gen.listOfN(digits, Gen.numChar).map(_.mkString)
    scale <- Gen.chooseNum(-10, 45)
    neg <- Gen.oneOf(true, false)
  } yield {
    val v = new java.math.BigDecimal(new java.math.BigInteger(s), scale)
    if (neg) v.negate else v
  }

  test("sortKey is order-preserving and injective on canonical forms") {
    val vals = samples(decGen, 300) ++ Seq(
      java.math.BigDecimal.ZERO, new java.math.BigDecimal("-0.000"),
      new java.math.BigDecimal("0.5"), new java.math.BigDecimal("0.49"),
      new java.math.BigDecimal("-0.5"), new java.math.BigDecimal("-0.55"),
      new java.math.BigDecimal("1"), new java.math.BigDecimal("1.5"),
      new java.math.BigDecimal("-1"), new java.math.BigDecimal("-1.5"),
      new java.math.BigDecimal("1" + "0" * 50),
      new java.math.BigDecimal("-1" + "0" * 50))
    val pairs = vals.map(v =>
      (v, BigNumOps.sortKey(u(v.toPlainString)).toString))
    for (Seq((a, ka), (b, kb)) <- pairs.combinations(2)) {
      val cmpV = a.compareTo(b)
      val cmpK = ka.compareTo(kb)
      assert(Integer.signum(cmpV) == Integer.signum(cmpK),
        s"order mismatch: $a vs $b -> keys $ka vs $kb")
      if (cmpV == 0) assert(ka == kb, s"equal values, different keys: $a $b")
    }
  }

  test("kernels match java.math at 80-digit operands") {
    val g = Gen.zip(decGen, decGen)
    samples(g, 150).foreach { case (a, b) =>
      val (ua, ub) = (u(a.toPlainString), u(b.toPlainString))
      assert(BigNumOps.add(ua, ub).toString ==
        a.add(b).stripTrailingZeros.toPlainString)
      assert(BigNumOps.sub(ua, ub).toString ==
        a.subtract(b).stripTrailingZeros.toPlainString)
      assert(BigNumOps.mul(ua, ub).toString ==
        a.multiply(b).stripTrailingZeros.toPlainString)
      assert(Integer.signum(BigNumOps.cmp(ua, ub)) ==
        Integer.signum(a.compareTo(b)))
      if (b.signum != 0)
        assert(BigNumOps.mod(ua, ub).toString ==
          a.remainder(b).stripTrailingZeros.toPlainString)
    }
  }

  test("normalize canonicalizes exponent notation and zeros") {
    assert(BigNumOps.normalize(u("1.5E10")).toString == "15000000000")
    assert(BigNumOps.normalize(u("-0.000")).toString == "0")
    assert(BigNumOps.normalize(u("00012.3400")).toString == "12.34")
    assert(BigNumOps.trunc(u("-3.99")).toString == "-3")
    assert(BigNumOps.trunc(u("3.99")).toString == "3")
  }

  test("sum beyond DecimalType(38): exact 40-digit result, partition-invariant") {
    // 100 distinct 38-digit values: their exact sum needs 40 digits
    val vals = (0 until 100).map(i => new java.math.BigInteger("9" * 37 + f"$i%02d"))
    val expect = vals.reduce(_ add _).toString
    assert(expect.length > 38) // the DecimalType cap is genuinely exceeded
    val df = vals.map(_.toString).toDF("v")
    // AVG divides the exact sum at DECIMAL128 in finish — same
    // partition-invariance requirement as SUM (typed BigDecimal
    // buffers since round 7; the law must survive the kryo encoder)
    val expectAvg = new java.math.BigDecimal(vals.reduce(_ add _))
      .divide(java.math.BigDecimal.valueOf(100), java.math.MathContext.DECIMAL128)
      .stripTrailingZeros.toPlainString
    for (parts <- Seq(1, 4, 13)) {
      val got = df.repartition(parts)
        .agg(BigNum.sumBig(BigNum.big($"v")).as("s"))
        .select(BigNum.str($"s")).as[String].head()
      assert(got == expect, s"at $parts partitions")
      val gotAvg = df.repartition(parts)
        .agg(BigNum.avgBig(BigNum.big($"v")).as("a"))
        .select(BigNum.str($"a")).as[String].head()
      assert(gotAvg == expectAvg, s"avg at $parts partitions")
    }
  }

  test("canonical-int fast paths agree with the BigDecimal slow paths") {
    // The r9 fast lanes (canonIntDigits passthrough, long/pow10/BigInteger
    // arithmetic, byte-level sortKey) must be OBSERVATIONALLY identical
    // to the slow paths they bypass. Feeding "<int>.0" parses to the
    // same value but fails the canonical-int check, forcing the slow
    // path — injectivity on values then demands byte-equal keys.
    val intGen: Gen[java.math.BigInteger] = for {
      digits <- Gen.chooseNum(1, 40)
      s <- Gen.listOfN(digits, Gen.numChar).map(_.mkString)
      neg <- Gen.oneOf(true, false)
    } yield {
      val v = new java.math.BigInteger(s)
      if (neg) v.negate else v
    }
    val edge = Seq("0", "1", "-1", "10", "1000000000000000", // pow10 lane
      "9" * 17, "-" + "9" * 17, "1" + "0" * 17, // long-lane boundary
      "9" * 18, "1" + "2" * 18, "-" + "9" * 19 // just past it
    ).map(new java.math.BigInteger(_))
    val vals = samples(intGen, 200).map(_.toString) ++ edge.map(_.toString)
    vals.foreach { v =>
      assert(BigNumOps.sortKey(u(v)).toString ==
        BigNumOps.sortKey(u(v + ".0")).toString, s"sortKey lanes differ at $v")
      assert(BigNumOps.normalize(u(v)).toString == v)
      assert(BigNumOps.trunc(u(v)).toString == v)
    }
    for (a <- vals.take(40); b <- vals.takeRight(15)) {
      val (ba, bb) = (new java.math.BigInteger(a), new java.math.BigInteger(b))
      assert(BigNumOps.add(u(a), u(b)).toString == ba.add(bb).toString)
      assert(BigNumOps.sub(u(a), u(b)).toString == ba.subtract(bb).toString)
      assert(BigNumOps.mul(u(a), u(b)).toString == ba.multiply(bb).toString)
      assert(Integer.signum(BigNumOps.cmp(u(a), u(b))) == ba.compareTo(bb))
    }
  }

  test("SumBuf long fast lane: overflow escape, lane mixing, null/zero semantics") {
    // overflow escape: 9e16 added 300 times crosses the flush bound
    // repeatedly; total must equal exact java.math
    val buf = BigNum.SumAgg.zero
    (1 to 300).foreach(_ => buf.addStr("90000000000000000"))
    assert(BigNum.SumAgg.finish(buf) ==
      new java.math.BigInteger("90000000000000000")
        .multiply(java.math.BigInteger.valueOf(300)).toString)
    // mixed lanes: small ints (fast), 40-digit ints and decimals (slow),
    // arbitrary reduce/merge split points
    val inputs = Seq("5", "-7", "123456789", "9" * 40, "-3.25", "0.125",
      "17" * 10, "-" + "8" * 39, "0", "42")
    val expect = inputs.map(new java.math.BigDecimal(_)).reduce(_ add _)
      .stripTrailingZeros.toPlainString
    for (split <- Seq(1, 3, 7, inputs.length)) {
      val bufs = inputs.grouped(split).map(g =>
        g.foldLeft(BigNum.SumAgg.zero)(BigNum.SumAgg.reduce)).toSeq
      val merged = bufs.reduce(BigNum.SumAgg.merge)
      assert(BigNum.SumAgg.finish(merged) == expect, s"split=$split")
    }
    // all-null → null, all-zero → "0" (Pig SUM convention)
    val nb = BigNum.SumAgg.reduce(BigNum.SumAgg.zero, null)
    assert(BigNum.SumAgg.finish(nb) == null)
    val zb = Seq("0", "0").foldLeft(BigNum.SumAgg.zero)(BigNum.SumAgg.reduce)
    assert(BigNum.SumAgg.finish(zb) == "0")
  }

  test("orderBy / min / max on bignum columns follow numeric order") {
    val raw = Seq("-2", "-1.5", "-0.5", "0", "0.49", "0.5", "1", "1.5",
      "10", "9" * 45, "-" + "9" * 45)
    val shuffled = scala.util.Random.shuffle(raw)
    val df = shuffled.toDF("v").select(BigNum.big($"v").as("b"))
    val sorted = df.orderBy($"b").select(BigNum.str($"b")).as[String].collect()
    val expect = raw.map(new java.math.BigDecimal(_))
      .sorted(Ordering.comparatorToOrdering(
        java.util.Comparator.naturalOrder[java.math.BigDecimal]()))
      .map(_.stripTrailingZeros.toPlainString)
    assert(sorted.toSeq == expect)
    val mn = df.agg(BigNum.str(BigNum.minBig($"b"))).as[String].head()
    val mx = df.agg(BigNum.str(BigNum.maxBig($"b"))).as[String].head()
    assert(mn == "-" + "9" * 45 && mx == "9" * 45)
  }

  test("arithmetic column API: exact product of two 40-digit factors") {
    val a = "1" + "2" * 39
    val b = "9" + "8" * 39
    val expect = new java.math.BigInteger(a).multiply(new java.math.BigInteger(b)).toString
    val got = Seq((a, b)).toDF("a", "b")
      .select(BigNum.str(BigNum.mul(BigNum.big($"a"), BigNum.big($"b")))).as[String].head()
    assert(got == expect)
  }

  test("pig front end: BI/BD literals, casts, exact SUM, numeric ORDER") {
    val script =
      """L = LOAD '$DIR/lineitem.parquet' USING parquet;
        |P = FOREACH L GENERATE l_returnflag,
        |      (biginteger)l_orderkey * (biginteger)l_partkey * 1000000000000BI AS big_amt;
        |G = GROUP P BY l_returnflag;
        |S = FOREACH G GENERATE group AS flag, SUM(P.big_amt) AS total;
        |O = ORDER S BY total DESC;
        |""".stripMargin
    val rows = graft.pig.PigScript.query(spark, script, Map("DIR" -> sf))
      .as[(String, String)].collect()
    // reference computed independently with java.math over the same data
    val ref = tables.lineitem
      .select($"l_returnflag", $"l_orderkey", $"l_partkey")
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues { rs =>
        rs.map { case (_, ok, pk) =>
          java.math.BigInteger.valueOf(ok).multiply(java.math.BigInteger.valueOf(pk))
            .multiply(new java.math.BigInteger("1000000000000"))
        }.reduce(_ add _)
      }.toMap
    assert(rows.length == ref.size)
    // ORDER BY total DESC honored numerically (not lexically)
    val totals = rows.map(r => new java.math.BigDecimal(r._2))
    assert(totals.sliding(2).forall { case Array(x, y) => x.compareTo(y) >= 0; case _ => true })
    rows.foreach { case (flag, tot) =>
      assert(tot == ref(flag).toString, s"flag $flag")
      assert(new java.math.BigDecimal(tot).precision > 18) // beyond long range
    }
  }

  test("cast leniency: unparseable input nulls (Pig cast-failure semantics), never throws") {
    // a malformed row in a 100 TB scan must not kill the job
    assert(BigNumOps.normalize(u("not a number")) == null)
    assert(BigNumOps.trunc(u("12.3.4")) == null)
    val script =
      """D = LOAD '$DIR/documents.parquet' USING parquet;
        |P = FOREACH D GENERATE doc_id, (biginteger)text AS bad;
        |F = FILTER P BY doc_id < 3;
        |""".stripMargin
    val rows = graft.pig.PigScript.query(spark, script, Map("DIR" -> sf))
      .as[(Long, String)].collect()
    assert(rows.length == 3 && rows.forall(_._2 == null))
  }

  test("DESCRIBE renders bignum columns as biginteger, not the carrier struct") {
    val gs = new graft.core.GraftSession(spark)
    val df = Seq("12").toDF("v").select(BigNum.big($"v").as("amt"))
    gs.register("B", df)
    val d = gs.describe("B")
    assert(d.contains("amt: biginteger"), d)
    assert(!d.contains("__bn_k"), d)
  }

  test("SUM of an all-null bignum group is null (Pig/SQL convention), not 0") {
    val df = Seq((1L, Some("5")), (1L, None), (2L, None), (2L, None))
      .toDF("k", "v")
      .select($"k", when($"v".isNotNull, BigNum.big($"v")).as("b"))
    val out = df.groupBy($"k").agg(BigNum.str(BigNum.sumBig($"b")).as("s"))
      .as[(Long, Option[String])].collect().toMap
    assert(out(1L).contains("5"))
    assert(out(2L).isEmpty)
  }

  test("AS-clause casts unwrap bignums in row and aggregate FOREACH outputs") {
    val script =
      """L = LOAD '$DIR/lineitem.parquet' USING parquet;
        |P = FOREACH L GENERATE l_returnflag,
        |      (biginteger)l_orderkey * 1000000000000000BI AS amt;
        |R = FOREACH P GENERATE l_returnflag, amt AS s1:chararray,
        |      FLATTEN(amt) AS s2:chararray;
        |G = GROUP P BY l_returnflag;
        |S = FOREACH G GENERATE group AS flag, SUM(P.amt) AS tot:chararray;
        |""".stripMargin
    val r = graft.pig.PigScript.run(spark, script, Map("DIR" -> sf))
    // row-path casts: canonical decimal text, not struct renderings
    val row = r("R").select("s1", "s2").as[(String, String)].head()
    assert(row._1 == row._2 && row._1.matches("\\d+"), row.toString)
    assert(new java.math.BigDecimal(row._1).precision >= 16) // carries the 1e15 scale
    val sOut = r("S").schema("tot").dataType
    assert(sOut == org.apache.spark.sql.types.StringType)
    val tot = r("S").select("tot").as[String].head()
    assert(tot.matches("\\d+") && new java.math.BigDecimal(tot).precision > 18)
  }

  test("pig front end: bignum compares promote the other side; bigdecimal division") {
    val script =
      """L = LOAD '$DIR/lineitem.parquet' USING parquet;
        |F = FILTER L BY (biginteger)l_orderkey * 100000000000000000000BI
        |      > 300000000000000000000000BI;
        |P = FOREACH F GENERATE l_orderkey,
        |      (bigdecimal)l_orderkey / 8BD AS ratio;
        |D = DISTINCT P;
        |""".stripMargin
    val rows = graft.pig.PigScript.query(spark, script, Map("DIR" -> sf))
      .as[(Long, String)].collect()
    // ok * 1e20 > 3e23  <=>  ok > 3000, evaluated exactly in bignum
    val expectKeys = tables.lineitem.select($"l_orderkey").as[Long].collect()
      .filter(_ > 3000).toSet
    assert(rows.map(_._1).toSet == expectKeys)
    rows.foreach { case (ok, ratio) =>
      val expect = new java.math.BigDecimal(ok)
        .divide(new java.math.BigDecimal(8), java.math.MathContext.DECIMAL128)
        .stripTrailingZeros.toPlainString
      assert(ratio == expect)
    }
  }

  test("bignum fields inside nested FOREACH blocks: arithmetic, compare, aggregates") {
    // amt is a BIGNUM bag field; the nested FILTER multiplies and
    // compares it in bignum space (ok * 1e18 * 10 > 3e22 <=> ok > 3000,
    // exact), and MAX rides the bignum ordering — the elem-context
    // type dispatch that used to fall through to numeric ops on the
    // carrier struct
    val script =
      """L = LOAD '$DIR/lineitem.parquet' USING parquet;
        |P = FOREACH L GENERATE l_suppkey, (biginteger)l_orderkey * 1000000000000000000BI AS amt;
        |G = GROUP P BY l_suppkey;
        |A = FOREACH G {
        |  big = FILTER P BY amt * 10BI > 30000000000000000000000BI;
        |  GENERATE group AS sk, COUNT(big) AS n_big, MAX(big.amt) AS max_amt;
        |};
        |""".stripMargin
    val got = graft.pig.PigScript.query(spark, script, Map("DIR" -> sf))
      .as[(Long, Long, Option[String])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val ref = tables.lineitem.groupBy($"l_suppkey").agg(
      sum(when($"l_orderkey" > 3000, 1L).otherwise(0L)).as("n"),
      max(when($"l_orderkey" > 3000, $"l_orderkey")).as("mo"))
      .as[(Long, Long, Option[Long])].collect()
    assert(ref.nonEmpty && got.size == ref.length)
    ref.foreach { case (sk, n, mo) =>
      val (nGot, maxGot) = got(sk)
      assert(nGot == n, s"suppkey $sk count")
      val expectMax = mo.map(o => new java.math.BigInteger(o.toString)
        .multiply(new java.math.BigInteger("1000000000000000000")).toString)
      assert(maxGot == expectMax, s"suppkey $sk max: $maxGot vs $expectMax")
    }
  }

  test("unwrapAll renders bignums nested in bags/tuples/maps, not just top level") {
    // the STORE-of-a-grouped-relation shape: a bag of tuples each
    // carrying a bignum, plus a tuple-nested and a map-valued bignum
    val big = "9" * 45
    val df = Seq((1L, big), (1L, "-" + big)).toDF("k", "v")
      .select($"k", BigNum.big($"v").as("bn"))
    val grouped = df.groupBy($"k").agg(
      collect_list(struct($"bn".as("b"), lit(7).as("x"))).as("bag"),
      BigNum.minBig($"bn").as("mn"))
      .withColumn("tup", struct($"mn".as("inner")))
      .withColumn("m2", map(lit("key"), BigNum.big(lit("5"))))
      .drop("mn")
    val out = BigNum.unwrapAll(grouped)
    // nested carriers are gone from the schema entirely
    def hasCarrier(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case s: org.apache.spark.sql.types.StructType =>
        BigNum.isBig(s) || s.fields.exists(f => hasCarrier(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hasCarrier(a.elementType)
      case m: org.apache.spark.sql.types.MapType => hasCarrier(m.valueType)
      case _ => false
    }
    assert(!out.schema.fields.exists(f => hasCarrier(f.dataType)))
    val row = out.select($"bag", $"tup", $"m2").head()
    val bagVals = row.getSeq[org.apache.spark.sql.Row](0).map(_.getString(0)).toSet
    assert(bagVals == Set(big, "-" + big))
    assert(row.getStruct(1).getString(0) == "-" + big) // min inside tuple
    assert(row.getMap[String, String](2)("key") == "5")
    // null rows stay null after the rebuild
    val withNull = df.limit(1)
      .select(lit(null).cast(df.schema("bn").dataType).as("bn"))
      .withColumn("t", when(lit(false), struct($"bn".as("b"))).otherwise(lit(null)))
    val nrow = BigNum.unwrapAll(withNull).head()
    assert(nrow.isNullAt(0) && nrow.isNullAt(1))
  }
}
