package graft

import org.apache.spark.sql.functions._
import graft.operators.Linalg

/** Exact moments, deterministic Jacobi, and whitening laws
  * (operators/Linalg.scala + the MomentVector/AffineProject kernels). */
class LinalgSpec extends SparkSpec {
  import spark.implicits._

  test("secondMoments: hand-exact sums; bit-identical under repartitioning") {
    val df = Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)).toDF("v")
    val (n, sums, prods) = Linalg.secondMoments(df, "v", 2)
    assert(n == 2)
    assert(sums.map(_.doubleValue()).toSeq == Seq(4.0, 6.0))
    assert(prods(0)(0).doubleValue() == 10.0) // 1 + 9
    assert(prods(0)(1).doubleValue() == 14.0) // 2 + 12
    assert(prods(1)(1).doubleValue() == 20.0) // 4 + 16
    assert(prods(1)(0) == prods(0)(1), "symmetric fill")
    // exact DECIMAL sums: equal as BigDecimals at any partitioning
    val big = (1 to 500).map(i => Seq(i * 0.1, 100.0 / i)).toDF("v")
    val a = Linalg.secondMoments(big, "v", 2)
    val b = Linalg.secondMoments(big.repartition(7), "v", 2)
    assert(a._1 == b._1)
    assert(a._2.toSeq == b._2.toSeq, "mean sums must be bit-identical")
    assert(a._3.map(_.toSeq).toSeq == b._3.map(_.toSeq).toSeq,
      "product sums must be bit-identical")
  }

  test("secondMoments: wrong-length vectors fail loudly, not by null-skipping") {
    // the guard lives in the kernel now (one corpus pass, r19), so the
    // failure surfaces wrapped in Spark's task-failure exception — the
    // kernel's message must survive the wrapping
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    val df = Seq(Seq(1.0, 2.0), Seq(3.0)).toDF("v")
    val e = intercept[Exception] { Linalg.secondMoments(df, "v", 2) }
    assert(messages(e).exists(_.contains("moment_vector: vector size")), e.toString)
    // a NULL vector must fail the same way, never silently drop out of
    // the moment sums (it is coalesced to size 0 before the kernel)
    val withNull = Seq(Some(Seq(1.0, 2.0)), None).toDF("v")
    val e2 = intercept[Exception] { Linalg.secondMoments(withNull, "v", 2) }
    assert(messages(e2).exists(_.contains("moment_vector: vector size 0")), e2.toString)
  }

  test("jacobiEigen: known symmetric matrices, descending order, orthonormal vectors") {
    val (vals, vecs) = Linalg.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(vals(0) - 3.0) < 1e-12 && math.abs(vals(1) - 1.0) < 1e-12)
    val s = 1.0 / math.sqrt(2.0)
    assert(math.abs(math.abs(vecs(0)(0)) - s) < 1e-12 &&
      math.abs(math.abs(vecs(0)(1)) - s) < 1e-12)
    // a 4x4 with known spectrum: diag(5,3,2,1) conjugated stays {5,3,2,1}
    val d = Array(5.0, 3.0, 2.0, 1.0)
    val diag = Array.tabulate(4, 4)((i, j) => if (i == j) d(i) else 0.0)
    val (v2, e2) = Linalg.jacobiEigen(diag)
    assert(v2.toSeq == d.toSeq)
    // orthonormality of returned vectors
    for (i <- 0 until 4; j <- 0 until 4) {
      val dot = (0 until 4).map(k => e2(i)(k) * e2(j)(k)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-12, s"($i,$j) dot $dot")
    }
  }

  test("pcaWhiten: correlated data comes out decorrelated with unit variance, distributed") {
    // strongly correlated 3-dim cloud (deterministic generator)
    val rows = (0 until 2000).map { i =>
      val a = math.sin(i * 0.7) * 3.0
      val b = a * 0.9 + math.cos(i * 1.3) // correlated with a
      val c = math.sin(i * 2.1) * 0.2
      (i.toLong, Seq(a, b, c))
    }
    val df = rows.toDF("id", "v")
    val (white, vals) = Linalg.pcaWhiten(df, "id", "v", dim = 3, k = 3)
    assert(vals.zip(vals.tail).forall { case (x, y) => x >= y }, "eigs descending")
    val (wn, wsums, wprods) = Linalg.secondMoments(white, "white", 3)
    val wc = Linalg.covariance(wn, wsums, wprods)
    for (i <- 0 until 3; j <- 0 until 3) {
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(wc(i)(j) - want) < 1e-9,
        s"whitened cov($i,$j) = ${wc(i)(j)}")
    }
    // kernel-vs-driver parity: the codegen projection reproduces the
    // reference left-to-right accumulation bit for bit
    val (_, sums, prods) = Linalg.secondMoments(df, "v", 3)
    val cov = Linalg.covariance(2000L, sums, prods)
    val (evals, evecs) = Linalg.jacobiEigen(cov)
    val mc = java.math.MathContext.DECIMAL128
    val mu = sums.map(_.divide(new java.math.BigDecimal(2000L), mc).doubleValue())
    val got = white.filter($"id" === 7L).select($"white").as[Seq[Double]].head()
    val x = rows(7)._2
    val want = (0 until 3).map { r =>
      var acc = 0.0
      for (i <- 0 until 3) acc += (x(i) - mu(i)) * (evecs(r)(i) / math.sqrt(evals(r)))
      acc
    }
    assert(got == want, s"kernel $got vs reference $want")
  }
}
