package graft

import org.apache.spark.sql.functions._
import graft.operators.{RangeJoin, Similarity}

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("binned range join equals cross+filter on arbitrary intervals") {
    val points = Seq(0.5, 10.0, 99.9, 100.0, 250.0, 777.7).toDF("v")
    val intervals = Seq(
      (0.0, 100.0), (50.0, 60.0), (100.0, 300.0), (700.0, 800.0), (900.0, 901.0))
      .toDF("lo", "hi")
    val got = RangeJoin.pointInInterval(points, "v", intervals, "lo", "hi", binSize = 75.0)
      .select($"v", $"lo", $"hi").as[(Double, Double, Double)].collect().toSet
    val want = points.crossJoin(intervals)
      .filter($"v" >= $"lo" && $"v" < $"hi")
      .select($"v", $"lo", $"hi").as[(Double, Double, Double)].collect().toSet
    assert(got == want)
    assert(want.nonEmpty)
    // boundary semantics: hi is exclusive, lo inclusive
    assert(got.contains((100.0, 100.0, 300.0)) && !got.exists(r => r._1 == 100.0 && r._3 == 100.0))
  }

  test("range join keeps points arbitrarily close below hi at a bin edge") {
    // hi = 150.0 sits exactly on a binSize=75 edge; the point 150-ulp
    // lives in bin 1 which an epsilon-trimmed hiBin would never explode
    // into — regression for the silent-drop bug.
    val nearHi = math.nextDown(150.0)
    val points = Seq(nearHi, 149.9999999999, 150.0).toDF("v")
    val intervals = Seq((100.0, 150.0)).toDF("lo", "hi")
    val got = RangeJoin.pointInInterval(points, "v", intervals, "lo", "hi", binSize = 75.0)
      .select($"v").as[Double].collect().toSet
    assert(got == Set(nearHi, 149.9999999999)) // 150.0 excluded: hi exclusive
  }

  test("IVF top-k overlaps brute force substantially on self-query") {
    val emb = tables.embeddings
    val q = emb.filter($"vec_id" % 250 === 0)
    val brute = Similarity.bruteForceTopK(emb, q, "vec_id", "vec_id", "embedding", 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(emb, q, "vec_id", "vec_id", "embedding", 5,
      nCentroids = 8, nProbe = 3)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    assert(ivf.nonEmpty)
    assert(ivf.intersect(brute).size.toDouble / brute.size >= 0.2) // approximate: sanity recall
  }
}
