package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for algebraic laws the engine relies on (SURVEY.md
  * §5c — an improvement over the reference's test lineage): these laws
  * are what make Catalyst's rewrites and partial aggregation safe, so we
  * pin them against our own operator surface.
  *
  * Uses ScalaCheck generators with fixed seeds (scalatestplus isn't in
  * the offline artifact cache) — deterministic, N samples per law.
  */
class AlgebraicLawsSpec extends SparkSpec {
  import spark.implicits._

  private val rowsGen: Gen[List[(Int, Int)]] =
    Gen.listOfN(30, Gen.zip(Gen.chooseNum(-50, 50), Gen.chooseNum(-50, 50)))

  private def samples[T](g: Gen[T], n: Int = 8): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("filter commutes with projection when the predicate survives") {
    samples(rowsGen).foreach { rows =>
      val df = rows.toDF("a", "b")
      val fp = df.filter($"a" > 0).select($"a", ($"b" + 1).as("c"))
      val pf = df.select($"a", ($"b" + 1).as("c")).filter($"a" > 0)
      assert(fp.collect().toSet == pf.collect().toSet)
    }
  }

  test("partial aggregation law: per-key sums invariant under repartitioning") {
    samples(rowsGen).foreach { rows =>
      val df = rows.toDF("k", "v")
      val total = df.groupBy($"k").agg(sum($"v").as("s")).as[(Int, Long)].collect().toMap
      val repart = df.repartition(7).groupBy($"k").agg(sum($"v").as("s"))
        .as[(Int, Long)].collect().toMap
      assert(total == repart)
    }
  }

  test("union count additivity (bag semantics, no dedupe)") {
    samples(Gen.zip(rowsGen, rowsGen), 4).foreach { case (r1, r2) =>
      val a = r1.toDF("a", "b")
      val b = r2.toDF("a", "b")
      assert(a.unionAll(b).count() == a.count() + b.count())
    }
  }

  test("split branches partition the input exactly") {
    samples(rowsGen, 4).foreach { rows =>
      val df = rows.toDF("a", "b")
      val parts = operators.Relational.split(df,
        Seq("neg" -> ($"a" < 0), "zero" -> ($"a" === 0)), Some("pos"))
      assert(parts.values.map(_.count()).sum == df.count())
      operators.Relational.unsplit(df)
    }
  }

  test("jaccard is symmetric and bounded [0,1] on shingle sets") {
    val textGen = Gen.listOfN(12, Gen.oneOf("a", "b", "c", "d", "e")).map(_.mkString(" "))
    samples(Gen.zip(textGen, textGen), 6).foreach { case (t1, t2) =>
      val df = Seq((1L, t1), (2L, t2)).toDF("id", "text")
      val sh = df.select($"id",
        operators.Dedup.wordShingles(operators.Dedup.tokens($"text"), 3).as("sh"))
      val pair = sh.filter($"id" === 1).select($"sh".as("s1"))
        .crossJoin(sh.filter($"id" === 2).select($"sh".as("s2")))
      val j12 = pair.select(operators.Dedup.jaccard($"s1", $"s2")).as[Double].head()
      val j21 = pair.select(operators.Dedup.jaccard($"s2", $"s1")).as[Double].head()
      assert(j12 == j21 && j12 >= 0.0 && j12 <= 1.0)
    }
  }

  test("HLL sketch (approx_count_distinct) lands within 5% of exact") {
    // the 100 TB replacement for exact COUNT(DISTINCT): mergeable fixed-
    // size sketch vs a full distinct shuffle
    val li = tables.lineitem
    val exact = li.select(countDistinct($"l_orderkey")).as[Long].head()
    val approx = li.select(approx_count_distinct($"l_orderkey", rsd = 0.02)).as[Long].head()
    assert(math.abs(approx - exact).toDouble / exact <= 0.05,
      s"approx=$approx exact=$exact")
  }

  test("approx_percentile brackets the exact percentile") {
    val li = tables.lineitem
    val exact = li.select(expr("percentile(l_quantity, 0.5)")).as[Double].head()
    val approx = li.select(expr("approx_percentile(l_quantity, 0.5, 1000)")).as[Double].head()
    // quantities are small integers; accuracy-1000 should land within
    // one neighboring value of the true median
    assert(math.abs(approx - exact) <= 1.0, s"approx=$approx exact=$exact")
  }
}
