package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("split partitions rows exhaustively with OTHERWISE") {
    val ev = tables.events
    val branches = Relational.split(ev,
      Seq("click" -> ($"event_type" === "click"), "error" -> ($"event_type" === "error")),
      otherwise = Some("other"))
    val total = branches.values.map(_.count()).sum
    assert(total == ev.count())
    assert(branches("click").filter($"event_type" =!= "click").count() == 0)
    assert(branches("other")
      .filter($"event_type" === "click" || $"event_type" === "error").count() == 0)
    Relational.unsplit(ev)
  }

  test("cogroup yields empty bags (not nulls) for absent groups — OUTER semantics") {
    val a = Seq((1, "x"), (2, "y")).toDF("k", "va")
    val b = Seq((2, 10), (3, 20)).toDF("k", "vb")
    val cg = Relational.cogroup(Seq("k"), ("a", a, Seq("k")), ("b", b, Seq("k")))
    val rows = cg.select($"k", size($"bag_a").as("na"), size($"bag_b").as("nb"))
      .as[(Int, Int, Int)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq((1, 1, 0), (2, 1, 1), (3, 0, 1)))
  }

  test("rankBy matches window rank/dense_rank semantics") {
    val df = Seq(10, 20, 20, 30, 30, 30, 40).toDF("v")
    val got = Relational.rankBy(df, Seq("v"), ascending = true)
      .select($"v", $"rank", $"dense_rank")
      .as[(Int, Long, Long)].collect().sortBy(r => (r._1, r._2))
    val expected = Seq(
      (10, 1L, 1L), (20, 2L, 2L), (20, 2L, 2L),
      (30, 4L, 3L), (30, 4L, 3L), (30, 4L, 3L), (40, 7L, 4L))
    assert(got.toSeq == expected)
  }

  test("rankBy descending") {
    val df = Seq(1.0, 2.0, 2.0, 3.0).toDF("v")
    val got = Relational.rankBy(df, Seq("v"), ascending = false)
      .select($"v", $"rank").as[(Double, Long)].collect().toSeq.sorted
    assert(got == Seq((1.0, 4L), (2.0, 2L), (2.0, 2L), (3.0, 1L)))
  }

  test("rankBy does not leak a session-lifetime cached RDD") {
    // track ids, not counts: the shared test session's OTHER cached RDDs
    // come and go concurrently (ContextCleaner), only rankBy's are ours
    val beforeIds = spark.sparkContext.getPersistentRDDs.keySet
    def newIds = spark.sparkContext.getPersistentRDDs.keySet -- beforeIds
    var result = Relational.rankBy(Seq(5, 1, 3, 3, 2).toDF("v"), Seq("v"))
    result.count()
    // no separately-cached sorted-counts RDD; only the bounded
    // sorted-keys localCheckpoint (lifetime = the result reference)
    assert(newIds.size <= 1)
    // once the result is unreachable, the ContextCleaner reclaims the
    // checkpoint blocks — i.e. nothing survives a rank call's consumers
    result = null
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (newIds.nonEmpty && System.nanoTime() < deadline) {
      System.gc(); Thread.sleep(200)
    }
    assert(newIds.isEmpty)
  }

  test("rankSequence assigns a 1-based dense sequence") {
    val df = Seq("a", "b", "c").toDF("s")
    val ranks = Relational.rankSequence(df).select($"rank").as[Long].collect().sorted
    assert(ranks.toSeq == Seq(1L, 2L, 3L))
  }

  test("saltedJoin equals the plain join (inner + left), spreads hot keys, rejects right") {
    // one hot key (90% of probe rows) + a probe row with no match
    val probe = ((1 to 90).map(i => (7L, i)) ++ Seq((1L, 91), (2L, 92), (99L, 93)))
      .toDF("k", "pv")
    val build = Seq((7L, "hot"), (1L, "a"), (2L, "b"), (3L, "unmatched")).toDF("bk", "bv")
    for (jt <- Seq("inner", "left")) {
      val got = Relational.saltedJoin(probe, build, Seq("k"), Seq("bk"), salts = 4, jt)
        .select($"k", $"pv", $"bv").collect().map(r => (r.get(0), r.get(1), r.get(2))).toSeq
      val want = probe.join(build, $"k" === $"bk", jt)
        .select($"k", $"pv", $"bv").collect().map(r => (r.get(0), r.get(1), r.get(2))).toSeq
      assert(got.sortBy(_.toString) == want.sortBy(_.toString), s"joinType=$jt")
    }
    // the hot key's probe rows really scatter across salts
    val salted = probe.withColumn("__s", pmod(hash(probe.columns.map(col): _*), lit(4)))
    assert(salted.filter($"k" === 7L).select($"__s").distinct().count() > 1)
    intercept[IllegalArgumentException] {
      Relational.saltedJoin(probe, build, Seq("k"), Seq("bk"), 4, "full")
    }
  }

  test("topPerGroup is deterministic under ties via tiebreak") {
    val df = Seq((1, 100, 5.0), (1, 101, 5.0), (1, 102, 5.0), (2, 200, 1.0))
      .toDF("g", "id", "v")
    val got = Relational.topPerGroup(df, Seq("g"), "v", 2, "id")
      .select($"g", $"id").as[(Int, Int)].collect().toSet
    assert(got == Set((1, 100), (1, 101), (2, 200)))
  }

  test("saltedAggregate equals direct aggregation") {
    val li = tables.lineitem
    val direct = li.groupBy($"l_returnflag")
      .agg(sum($"l_quantity").cast("decimal(18,2)").as("s"), count(lit(1)).as("c"))
      .as[(String, BigDecimal, Long)].collect().toSet
    val salted = Relational.saltedAggregate(li, Seq("l_returnflag"), 8)(
        sum($"l_quantity").cast("decimal(18,2)").as("ps"), count(lit(1)).as("pc"))(
        sum($"ps").cast("decimal(18,2)").as("s"), sum($"pc").as("c"))
      .as[(String, BigDecimal, Long)].collect().toSet
    assert(salted == direct)
  }

  test("nested bag ops compose: filter -> sort -> limit -> sum") {
    val df = Seq(Seq((1, 2.0), (2, 8.0), (3, 4.0), (4, 6.0))).toDF("bag")
      .select($"bag".cast("array<struct<id:int,v:double>>").as("bag"))
    val filtered = Relational.nested.filterBag($"bag", x => x.getField("v") > 3.0)
    val sorted = Relational.nested.sortBagBy(filtered, "v", asc = false)
    val top2 = Relational.nested.limitBag(sorted, 2)
    val s = Relational.nested.sumBag(top2, "v")
    assert(df.select(s).as[Double].head() == 14.0) // 8.0 + 6.0
  }

  test("equiDepthHistogram: exact bucket populations; ties never straddle") {
    import org.apache.spark.sql.functions._
    // 1..100 -> 4 buckets of exactly 25
    val df = (1 to 100).map(_.toDouble).toDF("x").repartition(5)
    val h = Relational.equiDepthHistogram(df, "x", 4)
      .as[(Long, Double, Double, Long)].collect().sortBy(_._1)
    assert(h.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(h.forall(_._4 == 25L))
    assert(h.map(b => (b._2, b._3)).toSeq ==
      Seq((1.0, 25.0), (26.0, 50.0), (51.0, 75.0), (76.0, 100.0)))
    // heavy tie crossing a boundary: value 5 repeated 10x in 20 rows,
    // 2 buckets — the tie block shares one rank, so it lands WHOLLY in
    // one bucket (competition rank pins it to the first)
    val tied = ((1 to 10).map(_ => 5.0) ++ (11 to 20).map(_.toDouble)).toDF("x")
    val h2 = Relational.equiDepthHistogram(tied, "x", 2)
      .as[(Long, Double, Double, Long)].collect().sortBy(_._1)
    assert(h2.map(_._1).toSeq == Seq(0L, 1L))
    val b0 = h2(0)
    assert(b0._2 == 5.0 && b0._3 == 5.0 && b0._4 == 10L,
      s"the 10-row tie at 5.0 must sit whole in bucket 0: $h2")
    // nulls excluded; counts conserve
    val withNulls = df.withColumn("x",
      when($"x" <= 10, lit(null).cast("double")).otherwise($"x"))
    val h3 = Relational.equiDepthHistogram(withNulls, "x", 3)
      .agg(sum($"cnt")).as[Long].head()
    assert(h3 == 90L)
  }

  test("distributionDrift: identical dists split evenly; shifts and clamps land right") {
    import org.apache.spark.sql.functions._
    val base = (1 to 100).map(_.toDouble).toDF("x")
    // self-drift: every bin holds exactly base_cnt == target_cnt == 25
    val self = Relational.distributionDrift(base, base, "x", 4)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(self.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(self.forall(r => r._2 == 25L && r._3 == 25L))
    // shifted target: all mass above the base range clamps to the LAST
    // bin; mass below clamps to bin 0
    val shifted = Seq(1000.0, 2000.0, -5.0).toDF("x")
    val d = Relational.distributionDrift(base, shifted, "x", 4)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(d(3L) == 2L && d(0L) == 1L)
    // boundary ownership: x equal to a bin's hi belongs to THAT bin
    // (boundaries are hi values, rule is hi < x)
    val onEdge = Seq(25.0, 26.0).toDF("x")
    val e = Relational.distributionDrift(base, onEdge, "x", 4)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(e(0L) == 1L && e(1L) == 1L)
    // nulls excluded from both sides
    val withNull = Seq[Option[Double]](Some(50.0), None).toDF("x")
    val nn = Relational.distributionDrift(base, withNull, "x", 4)
      .agg(sum($"target_cnt")).as[Long].head()
    assert(nn == 1L)
  }

  test("distributionDrift: base side binned from key counts matches the value rule") {
    import org.apache.spark.sql.functions._
    // round 18: the base side is binned from the distinct-key counts
    // (weighted by __cnt) instead of a second base scan. A tie block
    // straddling a histogram boundary is where the rank-based
    // histogram count disagrees with the value rule — self-drift must
    // still report base_cnt == target_cnt per bin (the target side IS
    // a scan under the value rule).
    val tied = ((1 to 10).map(_ => 5.0) ++ (11 to 20).map(_.toDouble))
      .toDF("x").repartition(3)
    val self = Relational.distributionDrift(tied, tied, "x", 2)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(self.forall(r => r._2 == r._3),
      s"base must bin under the same value rule as target: ${self.toSeq}")
    assert(self.map(_._2).sum == 20L)
  }

  test("skewProfile: exact top-N with deterministic ties; bounded top-N plan") {
    import org.apache.spark.sql.functions._
    // keys 1..10 with frequency = key; plus ties: 11 and 12 both x5
    val rows = (1L to 10L).flatMap(k => Seq.fill(k.toInt)(k)) ++
      Seq.fill(5)(11L) ++ Seq.fill(5)(12L)
    val df = rows.toDF("k").repartition(7)
    val prof = Relational.skewProfile(df, Seq("k"), 4)
    val got = prof.as[(Long, Long, Double)].collect()
    val total = rows.size.toDouble
    // top-4 by (cnt DESC, k ASC): 10x10, 9x9, 8x8, 7x7
    assert(got.map(r => (r._1, r._2)).toSeq ==
      Seq((10L, 10L), (9L, 9L), (8L, 8L), (7L, 7L)))
    got.foreach { case (_, cnt, share) => assert(share == cnt / total) }
    // cutoff INSIDE the cnt=5 tie group {5, 11, 12}: top-7 takes 5 and
    // 11 by key order and must never admit 12
    val tied = Relational.skewProfile(df, Seq("k"), 7)
      .as[(Long, Long, Double)].collect().map(_._1)
    assert(tied.toSeq.sorted == Seq(5L, 6L, 7L, 8L, 9L, 10L, 11L),
      s"tie at cnt=5 must break by key asc, got ${tied.toSeq}")
    // plan: bounded top-N (TakeOrderedAndProject), never a global Sort
    val plan = prof.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1500))
  }
}
