package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches
import graft.functions.Aggregators.KMinValues

/** KMV sketch laws (operators/Sketches.scala): selection determinism,
  * the exact merge monoid, unsigned ordering, under-k exactness, and
  * estimator accuracy on planted sets with known overlap. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def sketchOf(ds: Seq[String], k: Int): Seq[Long] =
    Sketches.kmvPerGroup(
      ds.toDF("g").withColumn("grp", lit("x")).withColumn("h", xxhash64($"g")),
      "grp", "h", k).select("sketch").collect()(0).getSeq[Long](0)

  test("KMinValues: unsigned order, distinctness, under-k is the exact set") {
    // -1L is the LARGEST unsigned 64-bit value: it must lose to any
    // small positive hash
    val agg = new KMinValues(2)
    val buf = Seq(-1L, 5L, 3L, 5L, 3L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(buf) == Seq(3L, 5L))
    // under-k: the sketch IS the distinct set (ascending unsigned)
    val small = Seq(7L, -1L, 7L, 2L).foldLeft(new KMinValues(10).zero)(new KMinValues(10).reduce)
    assert(new KMinValues(10).finish(small) == Seq(2L, 7L, -1L))
    assert(Sketches.distinctEstimate(Seq(2L, 7L, -1L), 10) == 3.0)
  }

  test("KMV: duplicates are invisible; partition/arrival order is immaterial") {
    val base = (1 to 3000).map(i => s"elem$i")
    val k = 256
    val s1 = sketchOf(base, k)
    val s2 = sketchOf(scala.util.Random.shuffle(base.flatMap(x => Seq(x, x, x))), k)
    assert(s1 == s2, "5x-duplicated shuffled stream must sketch identically")
    val df = base.toDF("g").withColumn("grp", lit("x")).withColumn("h", xxhash64($"g"))
    val a = Sketches.kmvPerGroup(df, "grp", "h", k).select("sketch").collect()(0).getSeq[Long](0)
    val b = Sketches.kmvPerGroup(df.repartition(13), "grp", "h", k)
      .select("sketch").collect()(0).getSeq[Long](0)
    assert(a == b, "sketch must be partition-invariant")
  }

  test("KMV: merge(sketch(A), sketch(B)) == sketch(A ++ B) exactly") {
    val k = 128
    val aEls = (1 to 2000).map(i => s"a$i")
    val bEls = (1500 to 3500).map(i => s"a$i") // overlapping range
    val sa = sketchOf(aEls, k); val sb = sketchOf(bEls, k)
    assert(Sketches.mergeSketches(sa, sb, k) == sketchOf(aEls ++ bEls, k))
  }

  test("KMV estimators: planted 1/3 Jaccard and distinct counts within tolerance") {
    val k = 512
    val aEls = (0 until 10000).map(i => s"x$i")
    val bEls = (5000 until 15000).map(i => s"x$i") // |A|=|B|=10k, inter=5k, union=15k
    val sa = sketchOf(aEls, k); val sb = sketchOf(bEls, k)
    val estJ = Sketches.jaccardEstimate(sa, sb, k)
    assert(math.abs(estJ - 1.0 / 3.0) < 0.07, s"J est $estJ vs 1/3 (k=$k, sigma~0.02)")
    assert(math.abs(Sketches.distinctEstimate(sa, k) - 10000) / 10000.0 < 0.15)
    val estU = Sketches.distinctEstimate(Sketches.mergeSketches(sa, sb, k), k)
    assert(math.abs(estU - 15000) / 15000.0 < 0.15, s"union est $estU")
    val estI = Sketches.intersectionEstimate(sa, sb, k)
    assert(math.abs(estI - 5000) / 5000.0 < 0.25, s"intersection est $estI")
  }
}
