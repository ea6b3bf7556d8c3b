package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Integer-exact PageRank (operators/Graph.scala): hand-computed
  * fixtures, fixed points, determinism, and the mass bound the overflow
  * guard relies on. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private val S = 1000L // small scale keeps hand arithmetic readable

  test("pageRank: symmetric 2-cycle is an exact fixed point at rank=scale") {
    val edges = Seq(("a", "b"), ("b", "a")).toDF("s", "d")
    for (iters <- Seq(1, 3, 5)) {
      val r = Graph.pageRank(edges, "s", "d", iters, scale = S)
        .as[(String, Long)].collect().toMap
      // teleport 150 + 85% of a full share 1000 = 1000 exactly, every round
      assert(r == Map("a" -> 1000L, "b" -> 1000L), s"iters=$iters: $r")
    }
  }

  test("pageRank: hand-computed star graph, three iterations, exact truncating arithmetic") {
    // a<->b, a<->c; deg a=2, b=c=1; teleport=150
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "a"), ("c", "a")).toDF("s", "d")
    val expected = Seq(
      1 -> Map("a" -> 1850L, "b" -> 575L, "c" -> 575L),
      2 -> Map("a" -> 1127L, "b" -> 936L, "c" -> 936L),
      3 -> Map("a" -> 1741L, "b" -> 628L, "c" -> 628L))
    expected.foreach { case (iters, want) =>
      val got = Graph.pageRank(edges, "s", "d", iters, scale = S)
        .as[(String, Long)].collect().toMap
      assert(got == want, s"iters=$iters")
    }
  }

  test("pageRank: duplicate edges collapse; dangling mass leaks but never corrupts") {
    // a->b listed twice must count as ONE edge (deg a = 1, full share to b);
    // b is dangling: its mass leaks, b's rank still updates from a
    val edges = Seq(("a", "b"), ("a", "b")).toDF("s", "d")
    val r = Graph.pageRank(edges, "s", "d", iters = 1, scale = S)
      .as[(String, Long)].collect().toMap
    assert(r("b") == 150L + 85L * 1000L / 100L) // 1000: one full share
    assert(r("a") == 150L)                      // no inbound edges
  }

  test("pageRank: partition invariance and the mass bound on the trade graph") {
    val tb = tables
    val e = tb.orders.join(tb.lineitem, $"o_orderkey" === $"l_orderkey")
      .select(concat(lit("c"), $"o_custkey").as("src"),
              concat(lit("s"), $"l_suppkey").as("dst"))
    val sym = e.union(e.select($"dst".as("src"), $"src".as("dst")))
    val r1 = Graph.pageRank(sym, "src", "dst", iters = 2)
      .as[(String, Long)].collect().toMap
    val r2 = Graph.pageRank(sym.repartition(13), "src", "dst", iters = 2)
      .as[(String, Long)].collect().toMap
    assert(r1 == r2, "fixed-point arithmetic must be partition-invariant")
    // damping only shrinks total mass: sum(rank) <= nodes * scale
    val mass = r1.values.map(BigInt(_)).sum
    assert(mass <= BigInt(r1.size) * 1000000000000L, s"mass=$mass nodes=${r1.size}")
    // suppliers aggregate many customers: the top-ranked node is a supplier
    val top = r1.maxBy(_._2)._1
    assert(top.startsWith("s"), s"expected a supplier hub on top, got $top")
  }

  test("pageRank auto-scale: a 10^6-node graph the old 1e12 default refused") {
    // ring: out-degree 1 everywhere, one in-edge each => exact fixed
    // point rank == scale at every iteration, any scale
    val n = 1000000L
    val edges = spark.range(n).select($"id".cast("string").as("s"),
      (($"id" + 1L) % n).cast("string").as("d"))
    // the historical fixed default overflows the mass bound here...
    val refused = intercept[IllegalArgumentException] {
      Graph.pageRank(edges, "s", "d", iters = 1, scale = 1000000000000L)
    }
    assert(refused.getMessage.contains("overflow"))
    // ...auto (scale=0 default) derives the largest safe power of ten:
    // 1e6 * s * 85 < 2^63 => s = 1e11
    val r = Graph.pageRank(edges, "s", "d", iters = 1)
    val distinctRanks = r.select($"rank").distinct().as[Long].collect()
    assert(distinctRanks.toSeq == Seq(100000000000L),
      s"ring fixed point must hold at the auto-derived scale: $distinctRanks")
    assert(r.count() == n)
  }

  test("reliable-checkpoint switch: setCheckpointDir flips every iterative operator, results identical") {
    // GraftSession.materialize is the library's single lineage-truncation
    // point; with a checkpoint dir set it must route to RELIABLE
    // df.checkpoint (executor-loss-safe on a real cluster) and produce
    // bit-identical results. Restore the unset state afterward — the
    // SparkContext is JVM-shared and other suites assert the local path.
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "a"), ("c", "a")).toDF("s", "d")
    val local = Graph.pageRank(edges, "s", "d", iters = 3, scale = S)
      .as[(String, Long)].collect().toMap
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id1", "id2")
    val localCc = graft.operators.Dedup.clusterPairs(pairs)
      .as[(Long, Long)].collect().toMap
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_reliable_ckpt").toString
    val sc = spark.sparkContext
    sc.setCheckpointDir(ckptDir)
    try {
      val reliable = Graph.pageRank(edges, "s", "d", iters = 3, scale = S)
        .as[(String, Long)].collect().toMap
      assert(reliable == local, "reliable-checkpoint path must be bit-identical")
      val reliableCc = graft.operators.Dedup.clusterPairs(pairs)
        .as[(Long, Long)].collect().toMap
      assert(reliableCc == localCc)
      // receipt: the switch actually engaged — checkpoint files exist
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(ckptDir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(wrote > 0, "reliable checkpoints must land in the checkpoint dir")
    } finally {
      // SparkContext has no public unset; restore via the private var so
      // the rest of the suite keeps exercising the localCheckpoint path
      val f = sc.getClass.getDeclaredMethod("checkpointDir_$eq", classOf[Option[String]])
      f.invoke(sc, None)
      assert(sc.getCheckpointDir.isEmpty)
    }
  }
}
