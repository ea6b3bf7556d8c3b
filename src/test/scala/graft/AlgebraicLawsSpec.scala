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

  /** The uniqueness guards ride the operator's own shuffle (assert_true
    * inside a task), so a violation surfaces at action time wrapped in
    * SparkException layers — assert on the cause chain's message. */
  private def assertRefusedWith(msg: String)(body: => Any): Unit = {
    val e = intercept[Exception](body)
    val chain = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .toSeq
    assert(chain.exists(_.contains(msg)),
      s"expected a failure containing '$msg', got:\n${chain.mkString("\n")}")
  }

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

  // ---- incremental aggregate maintenance: the monoid laws (round 10) ----

  private def canon(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toSeq.map {
      case null => "NULL"
      case d: java.math.BigDecimal => d.stripTrailingZeros.toPlainString
      case v => v.toString
    }.mkString("|")).toSet

  test("Incremental: merge(state(a), state(b)) == state(a ++ b), any split, any order") {
    import graft.operators.Incremental
    val li = tables.lineitem
    val keys = Seq("l_returnflag", "l_linestatus")
    val ms = Seq("qty" -> $"l_quantity", "price" -> $"l_extendedprice")
    val full = canon(Incremental.aggState(li, keys, ms))
    // three different splits, including a skewed one and a 3-way
    for (mod <- Seq(2, 10)) {
      val parts = (0 until mod).map(r => li.filter($"l_orderkey" % mod === r))
      val states = parts.map(p => Incremental.aggState(p, keys, ms))
      assert(canon(Incremental.mergeStates(states: _*)) == full, s"mod=$mod")
      assert(canon(Incremental.mergeStates(states.reverse: _*)) == full, s"mod=$mod reversed")
    }
    // left-fold merge tree == one-shot merge (associativity in practice)
    val s3 = (0 until 3).map(r => Incremental.aggState(li.filter($"l_orderkey" % 3 === r), keys, ms))
    val folded = s3.reduce((a, b) => Incremental.mergeStates(a, b))
    assert(canon(folded) == full)
  }

  test("Incremental: applyDelta on a group unseen in the base; all-null measures") {
    import graft.operators.Incremental
    val base = Seq(("a", Some(1.0)), ("a", Some(3.0))).toDF("k", "v")
    val delta = Seq(("b", None: Option[Double]), ("b", Some(5.0)), ("c", None)).toDF("k", "v")
    val st = Incremental.applyDelta(
      Incremental.aggState(base, Seq("k"), Seq("v" -> $"v")),
      delta, Seq("k"), Seq("v" -> $"v"))
    val out = Incremental.finalizeState(st)
      .as[(String, Long, Option[Double], Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(out("a") == (("a", 2L, Some(4.0), Some(2.0), Some(1.0), Some(3.0))))
    assert(out("b") == (("b", 2L, Some(5.0), Some(5.0), Some(5.0), Some(5.0))))
    // group c: rows exist but the measure never does -> NULL sum/avg, cnt 1
    assert(out("c") == (("c", 1L, None, None, None, None)))
  }

  test("mergeUpsert: update/insert/delete semantics, null-SET, ambiguous source refused") {
    import graft.operators.Incremental
    val base = Seq((1L, Some("a"), 10.0), (2L, Some("b"), 20.0), (3L, Some("c"), 30.0))
      .toDF("k", "name", "bal")
    val changes = Seq(
      (2L, Some("B"), 22.0, false),   // update
      (4L, Some("d"), 40.0, false),   // insert
      (3L, Some("c"), 30.0, true),    // delete
      (1L, None: Option[String], 11.0, false) // update that SETS name to null
    ).toDF("k", "name", "bal", "del")
    val out = Incremental.mergeUpsert(base, changes, Seq("k"), Some("del"))
      .as[(Long, Option[String], Double)].collect().map(r => r._1 -> r).toMap
    assert(out.size == 3)
    assert(out(1L) == ((1L, None, 11.0)), "a change may SET a column to null")
    assert(out(2L) == ((2L, Some("B"), 22.0)))
    assert(out(4L) == ((4L, Some("d"), 40.0)))
    assert(!out.contains(3L), "deleted key must vanish")
    // no delete column: pure upsert keeps every key
    val up = Incremental.mergeUpsert(base, changes.drop("del"), Seq("k"), None)
    assert(up.count() == 4)
    // ambiguous source: two change rows for one key must be refused —
    // the guard rides the merge join's own shuffle (no extra probe
    // job), so it trips at action time inside a task
    val dup = Seq((2L, Some("x"), 1.0, false), (2L, Some("y"), 2.0, false))
      .toDF("k", "name", "bal", "del")
    assertRefusedWith("ambiguous MERGE source") {
      Incremental.mergeUpsert(base, dup, Seq("k"), Some("del")).count()
    }
    // schema drift refused
    intercept[IllegalArgumentException] {
      Incremental.mergeUpsert(base, changes.withColumnRenamed("bal", "amt"),
        Seq("k"), Some("del"))
    }
  }

  test("scd2Apply: close/open/no-op semantics; version chains stay contiguous") {
    import graft.operators.Incremental
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val t0 = ts("2020-01-01 00:00:00"); val t1 = ts("2021-01-01 00:00:00")
    val t2 = ts("2022-01-01 00:00:00")
    val hist0 = Seq(
      (1L, Some("a"), t0, None: Option[java.sql.Timestamp]),
      (2L, Some("b"), t0, None),
      (3L, None: Option[String], t0, None) // current attr is NULL
    ).toDF("k", "name", "valid_from", "valid_to")
    val ch1 = Seq(
      (1L, Some("A")),  // real update
      (2L, Some("b")),  // no-op: attrs equal -> no new version
      (3L, Some("c")),  // NULL -> value is a REAL change (null-safe compare)
      (4L, Some("d"))   // brand-new key
    ).toDF("k", "name")
    val h1 = Incremental.scd2Apply(hist0, ch1, Seq("k"), t1).cache()
    val cur = h1.filter($"valid_to".isNull)
      .as[(Long, Option[String], java.sql.Timestamp, Option[java.sql.Timestamp])]
      .collect().map(r => r._1 -> r).toMap
    assert(cur(1L)._2 == Some("A") && cur(1L)._3 == t1)
    assert(cur(2L)._2 == Some("b") && cur(2L)._3 == t0, "no-op must not version")
    assert(cur(3L)._2 == Some("c") && cur(3L)._3 == t1, "NULL->value is a change")
    assert(cur(4L)._2 == Some("d") && cur(4L)._3 == t1)
    // closed versions carry the close timestamp
    val closed = h1.filter($"valid_to".isNotNull)
      .as[(Long, Option[String], java.sql.Timestamp, Option[java.sql.Timestamp])]
      .collect()
    assert(closed.map(_._1).sorted.toSeq == Seq(1L, 3L))
    assert(closed.forall(r => r._4 == Some(t1)))
    // second application: chains stay contiguous, closed history untouched
    val ch2 = Seq((1L, Some("AA"))).toDF("k", "name")
    val h2 = Incremental.scd2Apply(h1, ch2, Seq("k"), t2)
    val k1 = h2.filter($"k" === 1L)
      .as[(Long, Option[String], java.sql.Timestamp, Option[java.sql.Timestamp])]
      .collect().sortBy(_._3.getTime)
    assert(k1.map(_._2).toSeq == Seq(Some("a"), Some("A"), Some("AA")))
    assert(k1.map(_._3).toSeq == Seq(t0, t1, t2))
    assert(k1.map(_._4).toSeq == Seq(Some(t1), Some(t2), None),
      "validity intervals must chain without gaps")
    // ambiguous batch refused (in-flight guard: trips at action time)
    assertRefusedWith("ambiguous change batch") {
      Incremental.scd2Apply(h1, Seq((1L, Some("x")), (1L, Some("y"))).toDF("k", "name"),
        Seq("k"), t2).count()
    }
    h1.unpersist()
  }

  test("asOfSnapshot: time travel reconstructs every historical state exactly") {
    import graft.operators.Incremental
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val t0 = ts("2020-01-01 00:00:00"); val t1 = ts("2021-01-01 00:00:00")
    val t2 = ts("2022-01-01 00:00:00")
    val hist0 = Seq((1L, "a", t0), (2L, "b", t0))
      .toDF("k", "name", "valid_from")
      .withColumn("valid_to", lit(null).cast("timestamp"))
    val h1 = Incremental.scd2Apply(hist0,
      Seq((1L, "A"), (3L, "c")).toDF("k", "name"), Seq("k"), t1)
    val h2 = Incremental.scd2Apply(h1,
      Seq((1L, "AA"), (2L, "B")).toDF("k", "name"), Seq("k"), t2)
    def snap(t: java.sql.Timestamp) =
      Incremental.asOfSnapshot(h2, t).as[(Long, String)].collect().toSet
    // before t0: nothing existed
    assert(snap(ts("2019-06-01 00:00:00")).isEmpty)
    // AT a version boundary the NEW version is visible (valid_from <= t)
    assert(snap(t0) == Set((1L, "a"), (2L, "b")))
    assert(snap(ts("2020-06-01 00:00:00")) == Set((1L, "a"), (2L, "b")))
    assert(snap(t1) == Set((1L, "A"), (2L, "b"), (3L, "c")))
    assert(snap(ts("2021-06-01 00:00:00")) == Set((1L, "A"), (2L, "b"), (3L, "c")))
    assert(snap(ts("2023-01-01 00:00:00")) == Set((1L, "AA"), (2L, "B"), (3L, "c")))
  }

  test("pitJoin: each fact sees the version valid AT its timestamp") {
    import graft.operators.Incremental
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val t0 = ts("2020-01-01 00:00:00"); val t1 = ts("2021-01-01 00:00:00")
    val hist = Incremental.scd2Apply(
      Seq((1L, "a", t0), (2L, "b", t0)).toDF("k", "name", "valid_from")
        .withColumn("valid_to", lit(null).cast("timestamp")),
      Seq((1L, "A")).toDF("k", "name"), Seq("k"), t1)
    val facts = Seq(
      (100L, 1L, ts("2020-06-01 00:00:00")), // v0 era
      (101L, 1L, t1),                        // AT the boundary -> new version
      (102L, 1L, ts("2022-01-01 00:00:00")), // v1 era
      (103L, 2L, ts("2022-01-01 00:00:00")), // never-changed key
      (104L, 9L, ts("2022-01-01 00:00:00")), // unknown key -> NULL attrs
      (105L, 1L, ts("2019-01-01 00:00:00"))  // before first version -> NULL
    ).toDF("fact_id", "k", "ts")
    val out = Incremental.pitJoin(facts, hist, Seq("k"), "ts")
      .as[(Long, Long, java.sql.Timestamp, Option[String])]
      .collect().map(r => r._1 -> r._4).toMap
    assert(out(100L) == Some("a"))
    assert(out(101L) == Some("A"), "at t == valid_from the NEW version is valid")
    assert(out(102L) == Some("A"))
    assert(out(103L) == Some("b"))
    assert(out(104L).isEmpty && out(105L).isEmpty)
    assert(out.size == 6, "left join: every fact exactly once")
    // attribute-name collision refused
    intercept[IllegalArgumentException] {
      Incremental.pitJoin(facts.withColumnRenamed("fact_id", "name"),
        hist, Seq("k"), "ts")
    }
    // facts and history from the SAME source (the common shape: a
    // table joined to its own SCD2 rollup) must not trip Spark's
    // ambiguous-self-join check — found by the 5M soak
    val src = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val selfHist = Incremental.scd2Apply(
      src.withColumn("valid_from", lit(t0))
        .withColumn("valid_to", lit(null).cast("timestamp")),
      src.filter($"k" === 1L).select($"k", lit("A").as("v")), Seq("k"), t1)
    val selfFacts = src.select($"k", lit(ts("2022-01-01 00:00:00")).as("ts"))
      .withColumnRenamed("k", "k") // same lineage on purpose
    val self = Incremental.pitJoin(selfFacts, selfHist, Seq("k"), "ts")
      .as[(Long, java.sql.Timestamp, String)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(self == Map(1L -> "A", 2L -> "b"))
  }

  test("snapshotDiff: minimal change feed; diff-then-apply round-trips both ways") {
    import graft.operators.Incremental
    val base = Seq[(Long, Option[String], Option[Double])](
      (1L, Some("a"), Some(1.0)),  // unchanged
      (2L, Some("b"), Some(2.0)),  // value update
      (3L, Some("c"), None),       // NULL -> value update
      (4L, None, Some(4.0)),       // value -> NULL update
      (5L, Some("e"), Some(5.0))   // deleted
    ).toDF("k", "name", "x")
    val target = Seq[(Long, Option[String], Option[Double])](
      (1L, Some("a"), Some(1.0)),
      (2L, Some("B"), Some(2.0)),
      (3L, Some("c"), Some(3.0)),
      (4L, None, None),
      (6L, Some("f"), Some(6.0))   // inserted
    ).toDF("k", "name", "x")
    val diff = Incremental.snapshotDiff(base, target, Seq("k"))
    val byKey = diff.as[(Long, Option[String], Option[Double], String)]
      .collect().map(r => r._1 -> r).toMap
    assert(byKey.size == 5 && !byKey.contains(1L), "unchanged keys are omitted")
    assert(byKey(2L) == ((2L, Some("B"), Some(2.0), "update")))
    assert(byKey(3L) == ((3L, Some("c"), Some(3.0), "update")),
      "NULL -> value is a real update (null-safe compare)")
    assert(byKey(4L) == ((4L, None, None, "update")),
      "value -> NULL is a real update")
    assert(byKey(5L) == ((5L, None, None, "delete")))
    assert(byKey(6L) == ((6L, Some("f"), Some(6.0), "insert")))
    // round trip forward: base + diff == target
    val fwd = Incremental.mergeUpsert(base,
      diff.withColumn("del", $"op" === "delete").drop("op"),
      Seq("k"), deleteCol = Some("del"))
    assert(fwd.exceptAll(target).isEmpty && target.exceptAll(fwd).isEmpty)
    // round trip backward: target + diff(target, base) == base
    val back = Incremental.snapshotDiff(target, base, Seq("k"))
    val bwd = Incremental.mergeUpsert(target,
      back.withColumn("del", $"op" === "delete").drop("op"),
      Seq("k"), deleteCol = Some("del"))
    assert(bwd.exceptAll(base).isEmpty && base.exceptAll(bwd).isEmpty)
    // identical snapshots diff to EMPTY
    assert(Incremental.snapshotDiff(base, base, Seq("k")).isEmpty)
    // ambiguous snapshot refused (in-flight guard: trips at action time)
    assertRefusedWith("not key-unique") {
      Incremental.snapshotDiff(
        base.unionByName(base.limit(1)), target, Seq("k")).count()
    }
  }

  test("Incremental: finalize(incremental) == finalize(full) on the real table") {
    import graft.operators.Incremental
    val li = tables.lineitem
    val keys = Seq("l_returnflag", "l_linestatus")
    val ms = Seq("qty" -> $"l_quantity")
    val base  = li.filter($"l_orderkey" % 10 =!= 0)
    val delta = li.filter($"l_orderkey" % 10 === 0)
    val inc = Incremental.finalizeState(
      Incremental.applyDelta(Incremental.aggState(base, keys, ms), delta, keys, ms))
    val full = Incremental.finalizeState(Incremental.aggState(li, keys, ms))
    assert(canon(inc) == canon(full))
  }
}
