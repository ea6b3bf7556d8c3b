package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.VersionedTable

/** Model-based testing of the versioned-table substrate: random
  * sequences of the full op surface (MERGE upserts/deletes, DV
  * deleteWhere, UPDATE WHERE, metadata-only ADD/RENAME/DROP COLUMN
  * and type widening, RESTORE, OPTIMIZE compaction) are applied in
  * lockstep to the real table and to a trivial in-memory model; after
  * EVERY op the table must read back exactly the model, and the CDF
  * between any executed step and the next must replay the model's
  * delta. This is the test shape that catches cross-feature
  * interactions no single-feature spec thinks to write (a DV mask
  * surviving a widen, a restore landing on a pre-migration schema, a
  * rename mid-feed, a restore resurrecting a dropped column's
  * tombstone). Seeds are fixed — failures replay deterministically. */
class VersionedTableModelSpec extends SparkSpec {
  import spark.implicits._

  // model row: key -> (a, optional b); schema state tracked alongside:
  // (rows, hasB, aWide, logical name of a, logical name of b)
  private type Model = Map[Long, (Long, Option[Double])]
  private case class Snap(m: Model, hasB: Boolean, aWide: Boolean,
      aName: String, bName: String)

  private def readBack(dir: String, s: Snap): Model = {
    val df = VersionedTable.read(spark, dir)
    if (s.hasB)
      df.select(col("k"), col(s.aName).cast("long"), col(s.bName))
        .as[(Long, Long, Option[Double])].collect()
        .map { case (k, a, b) => k -> (a, b) }.toMap
    else
      df.select(col("k"), col(s.aName).cast("long"))
        .as[(Long, Long)].collect()
        .map { case (k, a) => k -> (a, None: Option[Double]) }.toMap
  }

  private def toDf(rows: Seq[(Long, Long, Option[Double])], s: Snap) = {
    val base = rows.toDF("k", "a", "b")
      .withColumn("a", if (s.aWide) $"a" else $"a".cast("int"))
      .withColumnRenamed("a", s.aName).withColumnRenamed("b", s.bName)
    if (s.hasB) base else base.drop(s.bName)
  }

  test("random op sequences: table == model after every op; CDF replays each delta") {
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val dir = java.nio.file.Files
        .createTempDirectory(s"vt-model-$seed").toString + "/t"
      var model: Model =
        (0L until 30L).map(k => k -> (k * 10, None: Option[Double])).toMap
      var snap = Snap(model, hasB = false, aWide = false, "a", "b0")
      var bGen = 0 // dropped b-names are tombstoned; re-adds need fresh
      VersionedTable.commit(spark, dir,
        toDf(model.toSeq.map { case (k, (a, b)) => (k, a, b) }, snap),
        -1L, "loader", clusterBy = Seq("k"), clusterFiles = 4)
      // snapshots per committed version, for restore's model rollback
      val history = scala.collection.mutable.ArrayBuffer[Snap](snap)
      def tip = VersionedTable.latestVersion(spark, dir)
      def record(): Unit = { snap = snap.copy(m = model); history += snap }

      (1 to 18).foreach { step =>
        val op = rnd.nextInt(14)
        val label: String = op match {
          case 0 | 1 | 2 => // MERGE: upserts + randomized deletes
            val keys = Seq.fill(1 + rnd.nextInt(6))(rnd.nextInt(40).toLong)
            val rows = keys.distinct.map { k =>
              val del = rnd.nextInt(4) == 0 && model.contains(k)
              (k, rnd.nextInt(1000).toLong,
                if (snap.hasB && rnd.nextBoolean())
                  Some(rnd.nextInt(100).toDouble) else None,
                del)
            }
            val ch = rows.toDF("k", "a", "b", "__del")
              .withColumn("a", if (snap.aWide) $"a" else $"a".cast("int"))
              .withColumnRenamed("a", snap.aName)
              .withColumnRenamed("b", snap.bName)
            val ch2 = if (snap.hasB) ch else ch.drop(snap.bName)
            VersionedTable.merge(spark, dir, ch2, Seq("k"), tip, s"m$step",
              deleteCol = Some("__del"))
            rows.foreach { case (k, a, b, del) =>
              if (del) model -= k else model += k -> (a, b)
            }
            record(); s"merge(${rows.length})"
          case 3 | 4 => // DV delete by predicate
            val m = 2 + rnd.nextInt(5); val r = rnd.nextInt(m)
            VersionedTable.deleteWhere(spark, dir, s"k % $m = $r", tip, s"d$step")
            val before = model.size
            model = model.filterNot { case (k, _) => k % m == r }
            if (model.size != before) record()
            s"deleteWhere(k%$m=$r)"
          case 5 if !snap.hasB => // ADD COLUMN (fresh name per generation)
            VersionedTable.addColumns(spark, dir,
              Seq(StructField(snap.bName, DoubleType)), tip, s"add$step")
            snap = snap.copy(hasB = true); record(); s"addColumns(${snap.bName})"
          case 6 if !snap.aWide => // widen a INT -> LONG
            VersionedTable.widenColumns(spark, dir,
              Map(snap.aName -> LongType), tip, s"wid$step")
            snap = snap.copy(aWide = true); record(); s"widen(${snap.aName})"
          case 7 => // RESTORE to a random retained version
            val to = rnd.nextInt(history.length)
            if (to.toLong != tip && history(to) != snap.copy(m = model)) {
              VersionedTable.restore(spark, dir, to.toLong, tip, s"r$step",
                allowSchemaChange = true)
              snap = history(to); model = snap.m
              history += snap
            }
            s"restore($to)"
          case 8 => // OPTIMIZE: content-invariant, no new model version
            val st = VersionedTable.compactSmallFiles(spark, dir, tip,
              s"opt$step", smallBytes = 1L << 20, targetFileCount = 2)
            if (st.isDefined) record()
            "compact"
          case 9 => // UPDATE WHERE: keyed bump through the rewrite path
            val m = 2 + rnd.nextInt(5); val r = rnd.nextInt(m)
            val st = VersionedTable.updateWhere(spark, dir,
              s"k % $m = $r",
              Seq(snap.aName -> s"`${snap.aName}` + 7"), tip, s"u$step")
            if (st.isDefined) {
              model = model.map { case (k, (a, b)) =>
                k -> (if (k % m == r) (a + 7, b) else (a, b))
              }
              record()
            }
            s"updateWhere(k%$m=$r)"
          case 10 => // RENAME a (metadata-only; labels toggle, bytes don't)
            val next = if (snap.aName == "a") "a_r" else "a"
            VersionedTable.renameColumns(spark, dir,
              Map(snap.aName -> next), tip, s"rn$step")
            snap = snap.copy(aName = next); record(); s"rename(->$next)"
          case 11 if snap.hasB => // DROP b (tombstoned; next add = fresh name)
            VersionedTable.dropColumns(spark, dir, Seq(snap.bName), tip,
              s"dr$step")
            model = model.map { case (k, (a, _)) => k -> (a, None) }
            bGen += 1
            snap = snap.copy(hasB = false, bName = s"b$bGen")
            record(); "dropColumns"
          case _ => // no-op probe: prunedFiles on a random bound stays sound
            val lo = rnd.nextInt(40).toLong
            val got = VersionedTable.readWhere(spark, dir,
                Seq(VersionedTable.ColBound("k", Some(lo), Some(lo + 5))))
              .filter($"k".between(lo, lo + 5))
              .select($"k").as[Long].collect().toSet
            assert(got == model.keySet.filter(k => k >= lo && k <= lo + 5),
              s"seed=$seed step=$step: pruned read diverged")
            "readWhere"
        }
        assert(history.length.toLong == tip + 1,
          s"seed=$seed step=$step [$label]: model history out of sync")
        val got = readBack(dir, snap)
        assert(got == model,
          s"seed=$seed step=$step [$label]: table != model\n" +
            s"missing=${(model.keySet -- got.keySet).toSeq.sorted}\n" +
            s"extra=${(got.keySet -- model.keySet).toSeq.sorted}\n" +
            s"diff=${model.keySet.intersect(got.keySet).filter(k => model(k) != got(k)).toSeq.sorted.take(5).map(k => (k, model(k), got(k)))}")
      }
      // the CDF between consecutive versions replays the model deltas.
      // Defined across equal schemas, add-only migrations, widenings,
      // and RENAMES (physical identity; the feed carries v2's names) —
      // only a drop between the versions has no well-defined row shape.
      (0L until tip).foreach { v =>
        val s1 = history(v.toInt)
        val s2 = history(v.toInt + 1)
        if (s1.hasB == s2.hasB || (!s1.hasB && s2.hasB))
          if ((s1.aWide == s2.aWide || (!s1.aWide && s2.aWide)) &&
              (s1.hasB, s2.hasB) != (true, false) &&
              !(s1.hasB && s2.hasB && s1.bName != s2.bName)) {
            val cdf = VersionedTable.changesBetween(spark, dir, v, v + 1,
                Seq("k"))
              .select(col("k"), col(s2.aName).cast("long").as("a"),
                (if (s2.hasB) col(s2.bName)
                 else lit(null).cast("double")).as("b"), col("op"))
              .as[(Long, Option[Long], Option[Double], String)].collect()
            val replayed = cdf.foldLeft(s1.m) { case (m, (k, a, b, op)) =>
              if (op == "delete") m - k else m + (k -> (a.get, b))
            }
            assert(replayed == s2.m,
              s"seed=$seed: CDF v$v->v${v + 1} does not replay the model delta")
          }
      }
    }
  }

  test("concurrent writers under rebase: every merge lands, and the CDF in COMMIT order replays the model exactly") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    (1 to 2).foreach { seed =>
      val rnd = new scala.util.Random(seed + 400)
      val dir = java.nio.file.Files
        .createTempDirectory(s"vt-cmodel-$seed").toString + "/t"
      var model: Map[Long, Long] = (0L until 400L).map(k => k -> k * 3).toMap
      VersionedTable.commit(spark, dir,
        model.toSeq.toDF("k", "a"), -1L, "loader",
        clusterBy = Seq("k"), clusterFiles = 8)
      def tip = VersionedTable.latestVersion(spark, dir)
      (1 to 3).foreach { round =>
        val tip0 = tip
        // three writers, each churning its OWN key band — logically
        // disjoint work; whether a given pair is file-disjoint depends
        // on the sampled range boundaries, so a loser may legitimately
        // refuse (overlapping file) — the documented recovery (call
        // again; with a rebase budget a stale merge re-plans at tip)
        // must then land it. Every merge must EVENTUALLY commit.
        val deltas: Seq[(String, Seq[(Long, Long)])] = (0 to 2).map { w =>
          val rows = Seq.fill(6)(w * 150L + rnd.nextInt(100).toLong)
            .distinct.map(k => k -> rnd.nextInt(100000).toLong)
          (s"w$w-r$round", rows)
        }
        val gate = new java.util.concurrent.CyclicBarrier(3)
        val futs = deltas.map { case (wid, rows) =>
          Future {
            gate.await()
            var out = -1L
            var tries = 0
            while (out < 0) {
              tries += 1
              try out = VersionedTable.merge(spark, dir,
                rows.toDF("k", "a"), Seq("k"),
                VersionedTable.latestVersion(spark, dir), wid,
                rebaseAttempts = 6).version
              catch {
                case _: VersionedTable.CommitConflict if tries < 6 => ()
              }
            }
            out
          }
        }
        val vs = Await.result(Future.sequence(futs), 300.seconds)
        assert(vs.toSet == Set(tip0 + 1, tip0 + 2, tip0 + 3),
          s"seed=$seed round=$round: all three must land, got $vs")
        // bands are disjoint → the final model is order-free
        deltas.foreach { case (_, rows) => rows.foreach(model += _) }
        val got = VersionedTable.read(spark, dir)
          .select($"k", $"a").as[(Long, Long)].collect().toMap
        assert(got == model, s"seed=$seed round=$round: table != model")
        // the CDF between consecutive versions, folded in COMMIT order
        // (manifest.writer identifies which delta each version is),
        // must replay to exactly the serial application — this is the
        // "rebased commits replay identically through CDF" law
        val byWriter = deltas.toMap
        // forward replay from the pre-round snapshot (ground truth)
        var fwd = VersionedTable.readVersion(spark, dir, tip0)
          .select($"k", $"a").as[(Long, Long)].collect().toMap
        (tip0 until tip0 + 3).foreach { v =>
          val wid = VersionedTable.readManifest(spark, dir, v + 1).writer
          val cdf = VersionedTable
            .changesBetween(spark, dir, v, v + 1, Seq("k"))
            .select($"k", $"a", $"op")
            .as[(Long, Option[Long], String)].collect()
          fwd = cdf.foldLeft(fwd) { case (m, (k, a, op)) =>
            if (op == "delete") m - k else m + (k -> a.get)
          }
          // after applying version v+1's feed, the state must equal
          // the pre-round snapshot plus the committed writers' deltas
          val committedSoFar = (tip0 + 1 to v + 1).map(u =>
            VersionedTable.readManifest(spark, dir, u).writer)
          val expected = VersionedTable.readVersion(spark, dir, tip0)
            .select($"k", $"a").as[(Long, Long)].collect().toMap ++
            committedSoFar.flatMap(byWriter)
          assert(fwd == expected,
            s"seed=$seed round=$round: CDF replay diverged at v${v + 1} ($wid)")
        }
      }
    }
  }

  test("mixed scoped writers race on a STATS-LESS table: all land, scopes recorded, CDF replays") {
    // round-16 law: merge + updateWhere + deleteWhere race from the
    // same tip on DISJOINT key bands of a table with NO stats — the
    // winner-added-files envelope check can prove nothing, so a
    // mid-flight loser lands only through the recorded-scope
    // disjointness admit. The law: every writer eventually lands, each
    // commit carries its op's recorded scope, the final table equals
    // the order-free serial model, and the CDF folded in COMMIT order
    // replays the model exactly (a scope-admitted rebase must never
    // distort the feed).
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    (1 to 2).foreach { seed =>
      val rnd = new scala.util.Random(seed + 2500)
      val dir = java.nio.file.Files
        .createTempDirectory(s"vt-smodel-$seed").toString + "/t"
      var model: Map[Long, Long] = (0L until 400L).map(k => k -> k * 3).toMap
      VersionedTable.commit(spark, dir,
        model.toSeq.toDF("k", "a").repartitionByRange(8, $"k"),
        -1L, "loader") // deliberately NO clusterBy/statsCols
      assert(VersionedTable.readManifest(spark, dir, 0L).stats.isEmpty,
        "the fixture must be stats-less or the law tests the wrong admit")
      def tip = VersionedTable.latestVersion(spark, dir)
      (1 to 2).foreach { round =>
        val tip0 = tip
        val preRound = model
        // band [0,100): merge upserts; band [150,250): update; band
        // [300,400): delete — per-round rotating moduli keep the
        // update/delete sets fresh
        val mergeRows = Seq.fill(5)(rnd.nextInt(100).toLong).distinct
          .map(k => k -> rnd.nextInt(100000).toLong)
        val updMod = 1 + round // k % 3 alternates its residue classes
        val delMod = 1 + round
        val updPred = s"k >= 150 AND k < 250 AND k % 3 = ${updMod % 3}"
        val delPred = s"k >= 300 AND k < 400 AND k % 7 = $delMod"
        val effects: Map[String, Map[Long, Long] => Map[Long, Long]] = Map(
          s"m-$round" -> (m => m ++ mergeRows),
          s"u-$round" -> (m => m.map { case (k, a) =>
            if (k >= 150 && k < 250 && k % 3 == updMod % 3) k -> (a + 1000)
            else k -> a
          }),
          s"d-$round" -> (m => m.filterNot { case (k, _) =>
            k >= 300 && k < 400 && k % 7 == delMod }))
        val gate = new java.util.concurrent.CyclicBarrier(3)
        def retrying(body: => Long): Future[Long] = Future {
          gate.await()
          var out = -1L
          var tries = 0
          while (out < 0) {
            tries += 1
            try out = body
            catch { case _: VersionedTable.CommitConflict if tries < 6 => () }
          }
          out
        }
        val futs = Seq(
          retrying(VersionedTable.merge(spark, dir,
            mergeRows.toDF("k", "a"), Seq("k"),
            VersionedTable.latestVersion(spark, dir), s"m-$round",
            rebaseAttempts = 6).version),
          retrying(VersionedTable.updateWhere(spark, dir, updPred,
            Seq("a" -> "a + 1000"),
            VersionedTable.latestVersion(spark, dir), s"u-$round",
            rebaseAttempts = 6)
            .map(_.version).getOrElse(sys.error("update matched nothing"))),
          retrying(VersionedTable.deleteWhere(spark, dir, delPred,
            VersionedTable.latestVersion(spark, dir), s"d-$round",
            rebaseAttempts = 6).version))
        val vs = Await.result(Future.sequence(futs), 300.seconds)
        assert(vs.toSet == Set(tip0 + 1, tip0 + 2, tip0 + 3),
          s"seed=$seed round=$round: all three scoped writers must " +
            s"land, got $vs")
        // every commit carries ITS op's recorded scope
        (tip0 + 1 to tip0 + 3).foreach { v =>
          val m = VersionedTable.readManifest(spark, dir, v)
          val want = m.writer.take(1) match {
            case "m" => "merge"; case "u" => "update"; case "d" => "delete"
          }
          assert(m.meta.get(VersionedTable.ScopeOpKey).contains(want),
            s"seed=$seed round=$round: v$v (${m.writer}) lacks its " +
              s"recorded scope: ${m.meta}")
          assert(m.meta.contains(VersionedTable.ScopeBoundsKey))
        }
        // disjoint bands → the serial model is order-free
        model = effects.values.foldLeft(preRound)((m, f) => f(m))
        val got = VersionedTable.read(spark, dir)
          .select($"k", $"a").as[(Long, Long)].collect().toMap
        assert(got == model, s"seed=$seed round=$round: table != model")
        // CDF folded in COMMIT order replays exactly
        var fwd = preRound
        var appliedEffects = Set.empty[String]
        (tip0 until tip0 + 3).foreach { v =>
          val wid = VersionedTable.readManifest(spark, dir, v + 1).writer
          val cdf = VersionedTable
            .changesBetween(spark, dir, v, v + 1, Seq("k"))
            .select($"k", $"a", $"op")
            .as[(Long, Option[Long], String)].collect()
          fwd = cdf.foldLeft(fwd) { case (m, (k, a, op)) =>
            if (op == "delete") m - k else m + (k -> a.get)
          }
          appliedEffects += wid
          val expected = appliedEffects.foldLeft(preRound)(
            (m, w) => effects(w)(m))
          assert(fwd == expected,
            s"seed=$seed round=$round: CDF replay diverged at " +
              s"v${v + 1} ($wid)")
        }
      }
    }
  }

  test("branch model: fastForward lands the exact net effect or refuses with both worlds intact") {
    (1 to 2).foreach { seed =>
      val rnd = new scala.util.Random(seed + 700)
      val dir = java.nio.file.Files
        .createTempDirectory(s"vt-bmodel-$seed").toString + "/t"
      var main: Map[Long, Long] = (0L until 400L).map(k => k -> k).toMap
      VersionedTable.commit(spark, dir, main.toSeq.toDF("k", "a"),
        -1L, "loader", clusterBy = Seq("k"), clusterFiles = 8)
      def readMap(d: String): Map[Long, Long] =
        VersionedTable.read(spark, d)
          .select($"k", $"a").as[(Long, Long)].collect().toMap
      (1 to 3).foreach { round =>
        val bname = s"b$round"
        VersionedTable.createBranch(spark, dir, bname)
        val ref = VersionedTable.branchRef(dir, bname)
        val fork = main // main state at the fork point
        var branch = main
        // two branch ops on the LOW key band [0, 150)
        (1 to 2).foreach { _ =>
          val bv = VersionedTable.latestVersion(spark, ref)
          if (rnd.nextBoolean()) {
            val rows = Seq.fill(5)(rnd.nextInt(150).toLong).distinct
              .map(k => k -> rnd.nextInt(9999).toLong)
            VersionedTable.merge(spark, ref, rows.toDF("k", "a"),
              Seq("k"), bv, "bw")
            branch = branch ++ rows
          } else {
            val lo = rnd.nextInt(120).toLong
            VersionedTable.deleteWhere(spark, ref,
              s"k >= $lo AND k <= ${lo + 9}", bv, "bw")
            branch = branch.filterNot { case (k, _) => k >= lo && k <= lo + 9 }
          }
        }
        // one concurrent MAIN op on the HIGH band [250, 400): a merge
        // ADDS files (refused under readsTable), a delete only masks
        // (admitted when file-disjoint) — both outcomes are legal and
        // both worlds are asserted either way
        val mv = VersionedTable.latestVersion(spark, dir)
        if (rnd.nextBoolean()) {
          val lo = (250 + rnd.nextInt(140)).toLong
          VersionedTable.deleteWhere(spark, dir,
            s"k >= $lo AND k <= ${lo + 5}", mv, "mw")
          main = main.filterNot { case (k, _) => k >= lo && k <= lo + 5 }
        } else {
          val rows = Seq.fill(4)((250 + rnd.nextInt(150)).toLong).distinct
            .map(k => k -> rnd.nextInt(9999).toLong)
          VersionedTable.merge(spark, dir, rows.toDF("k", "a"),
            Seq("k"), mv, "mw")
          main = main ++ rows
        }
        // isolation in both directions before the landing
        assert(readMap(ref) == branch,
          s"seed=$seed round=$round: branch world drifted")
        assert(readMap(dir) == main,
          s"seed=$seed round=$round: main world drifted")
        // the law: land EXACTLY the net effect, or refuse with both
        // worlds intact — never anything in between
        val landedModel = {
          // branch net vs fork, applied onto main's current state
          val changed = (fork.keySet ++ branch.keySet).filter(k =>
            fork.get(k) != branch.get(k))
          changed.foldLeft(main) { (m, k) =>
            branch.get(k) match {
              case Some(v) => m + (k -> v)
              case None    => m - k
            }
          }
        }
        try {
          VersionedTable.fastForward(spark, dir, bname, "merger")
          main = landedModel
          assert(readMap(dir) == main,
            s"seed=$seed round=$round: landing != net effect")
        } catch {
          case _: VersionedTable.CommitConflict =>
            assert(readMap(dir) == main,
              s"seed=$seed round=$round: refused landing must not touch main")
            assert(readMap(ref) == branch,
              s"seed=$seed round=$round: refused landing must not touch branch")
        }
        VersionedTable.deleteBranch(spark, dir, bname)
      }
      // retention still works under the accumulated branch history
      VersionedTable.expire(spark, dir, keep = 2)
      VersionedTable.vacuum(spark, dir)
      assert(readMap(dir) == main, s"seed=$seed: retention broke the tip")
    }
  }

  test("branch model under divergence: one-sided extension lands net effect + schema, two-sided refuses intact") {
    // round-16 law (VERDICT r15 #2): with mainline MOVED past the fork,
    // a one-sided nullable column append still lands — the data law is
    // unchanged (landing == net effect applied to main) and the landed
    // schema is the union. Round-17 extension (VERDICT r16 #2): a
    // TWO-sided append with DISJOINT names (mode 3) now lands too —
    // union schema, mainline's fields first then the branch tail —
    // while a SAME-NAME two-sided append (mode 4) still refuses with
    // both worlds intact. Round-18 extension (VERDICT r17 missing
    // #3): one-sided RENAMES land too — mode 5 (branch renames the
    // value column), mode 6 (mainline renames it while the branch
    // appends) — the data law unchanged under physical identity and
    // the landed names the renaming side's; TWO-sided renames
    // (mode 7) refuse with both worlds intact. Fresh table per case
    // so each case's fork starts from a clean 2-column world.
    (1 to 2).foreach { seed =>
      val rnd = new scala.util.Random(seed + 1600)
      // 1 = branch adds col, 2 = mainline, 3 = both (disjoint names),
      // 4 = both (same name — the surviving refusal cell),
      // 5 = branch renames, 6 = mainline renames × branch appends,
      // 7 = both rename (the surviving rename-refusal cell)
      (1 to 7).foreach { mode =>
        val dir = java.nio.file.Files
          .createTempDirectory(s"vt-bdiv-$seed-$mode").toString + "/t"
        var main: Map[Long, Long] = (0L until 400L).map(k => k -> k).toMap
        VersionedTable.commit(spark, dir, main.toSeq.toDF("k", "a"),
          -1L, "loader", clusterBy = Seq("k"), clusterFiles = 8)
        def readMapAs(d: String, vc: String): Map[Long, Long] =
          VersionedTable.read(spark, d)
            .select($"k", org.apache.spark.sql.functions.col(vc))
            .as[(Long, Long)].collect().toMap
        def readMap(d: String): Map[Long, Long] = readMapAs(d, "a")
        VersionedTable.createBranch(spark, dir, "div")
        val ref = VersionedTable.branchRef(dir, "div")
        val fork = main
        var branch = main
        // branch data ops on the LOW band, as the base law
        (1 to 2).foreach { _ =>
          val bv = VersionedTable.latestVersion(spark, ref)
          if (rnd.nextBoolean()) {
            val rows = Seq.fill(5)(rnd.nextInt(150).toLong).distinct
              .map(k => k -> rnd.nextInt(9999).toLong)
            VersionedTable.merge(spark, ref, rows.toDF("k", "a"),
              Seq("k"), bv, "bw")
            branch = branch ++ rows
          } else {
            val lo = rnd.nextInt(120).toLong
            VersionedTable.deleteWhere(spark, ref,
              s"k >= $lo AND k <= ${lo + 9}", bv, "bw")
            branch = branch.filterNot { case (k, _) => k >= lo && k <= lo + 9 }
          }
        }
        // mainline op: a HIGH-band delete (masks only — admissible)
        locally {
          val lo = (250 + rnd.nextInt(140)).toLong
          VersionedTable.deleteWhere(spark, dir,
            s"k >= $lo AND k <= ${lo + 5}",
            VersionedTable.latestVersion(spark, dir), "mw")
          main = main.filterNot { case (k, _) => k >= lo && k <= lo + 5 }
        }
        // the divergence
        def addCol(d: String, n: String,
            dt: org.apache.spark.sql.types.DataType =
              org.apache.spark.sql.types.LongType): Unit =
          VersionedTable.addColumns(spark, d, Seq(
            org.apache.spark.sql.types.StructField(n, dt, nullable = true)),
            VersionedTable.latestVersion(spark, d),
            if (d == dir) "mw" else "bw")
        def rename(d: String, from: String, to: String): Unit =
          VersionedTable.renameColumns(spark, d, Map(from -> to),
            VersionedTable.latestVersion(spark, d),
            if (d == dir) "mw" else "bw")
        if (mode == 1 || mode == 3) addCol(ref, "cb")
        if (mode == 2 || mode == 3) addCol(dir, "cm")
        // mode 4: the SAME name appended on both sides with DIFFERENT
        // types — no union exists, the surviving refusal cell (equal
        // name+type would converge to equal shapes and land trivially)
        if (mode == 4) {
          addCol(ref, "cx")
          addCol(dir, "cx", org.apache.spark.sql.types.DoubleType)
        }
        if (mode == 5) rename(ref, "a", "a2")
        if (mode == 6) { rename(dir, "a", "am"); addCol(ref, "cb") }
        if (mode == 7) { rename(ref, "a", "ab"); rename(dir, "a", "am") }
        val landedModel = {
          val changed = (fork.keySet ++ branch.keySet).filter(k =>
            fork.get(k) != branch.get(k))
          changed.foldLeft(main) { (m, k) =>
            branch.get(k) match {
              case Some(v) => m + (k -> v)
              case None    => m - k
            }
          }
        }
        // the landed value-column name: the renaming side's
        val aName = mode match {
          case 5 => "a2"; case 6 => "am"; case _ => "a"
        }
        try {
          val landed = VersionedTable.fastForward(spark, dir, "div", "merger")
          assert(mode != 4 && mode != 7,
            s"seed=$seed mode=$mode: the refusal cell must refuse")
          assert(readMapAs(dir, aName) == landedModel,
            s"seed=$seed mode=$mode: landing != net effect")
          val sch = VersionedTable.readManifest(spark, dir, landed.get)
            .schema.get
          // the order rule: mainline's fields first (renamed through
          // the renaming side's map), then the branch's tail
          val want = mode match {
            case 1 => Seq("k", "a", "cb"); case 2 => Seq("k", "a", "cm")
            case 3 => Seq("k", "a", "cm", "cb")
            case 5 => Seq("k", "a2"); case 6 => Seq("k", "am", "cb")
            case _ => Seq.empty
          }
          assert(sch.fieldNames.toSeq == want,
            s"seed=$seed mode=$mode: landed schema ${sch.fieldNames.toSeq}")
          val exts = mode match {
            case 1 | 6 => Seq("cb"); case 2 => Seq("cm")
            case 3 => Seq("cm", "cb"); case _ => Seq.empty
          }
          exts.foreach { c =>
            assert(sch(c).nullable,
              "landed extensions must be nullable (other side null-fills)")
            // every surviving row null-fills every extension
            assert(VersionedTable.read(spark, dir)
              .where(org.apache.spark.sql.functions.col(c).isNotNull)
              .isEmpty,
              s"seed=$seed mode=$mode: rows must null-fill '$c'")
          }
          // renamed landings keep the STICKY physical name mapped
          if (mode == 5 || mode == 6)
            assert(VersionedTable.readManifest(spark, dir, landed.get)
              .colmap.get(aName).contains("a"),
              s"seed=$seed mode=$mode: landed colmap must map $aName->a")
        } catch {
          case _: VersionedTable.CommitConflict =>
            assert(mode == 4 || mode == 7,
              s"seed=$seed mode=$mode: this divergence must land")
            val mainA = if (mode == 7) "am" else "a"
            val branchA = if (mode == 7) "ab" else "a"
            assert(readMapAs(dir, mainA) == main,
              s"seed=$seed mode=$mode: refused landing touched main")
            assert(readMapAs(ref, branchA) == branch,
              s"seed=$seed mode=$mode: refused landing touched branch")
        }
      }
    }
  }

  test("range-pick model: a consecutive pick range lands exactly its rows; the later landing converges") {
    // round-17 law (VERDICT r16 #5): a branch stages K blind appends;
    // a random consecutive subrange n..m is cherry-picked in order —
    // the table must read back base + EXACTLY the picked rows; a
    // subsequent fastForward of the WHOLE branch must converge to
    // base + all K rows with no row landed twice (the by-reference
    // dedup under the same-branch rebase exemption).
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed + 1700)
      val dir = java.nio.file.Files
        .createTempDirectory(s"vt-rpick-$seed").toString + "/t"
      val base: Map[Long, Long] = (0L until 200L).map(k => k -> k).toMap
      VersionedTable.commit(spark, dir, base.toSeq.toDF("k", "a"),
        -1L, "loader", clusterBy = Seq("k"), clusterFiles = 4)
      def readMap(d: String): Map[Long, Long] =
        VersionedTable.read(spark, d)
          .select($"k", $"a").as[(Long, Long)].collect().toMap
      VersionedTable.createBranch(spark, dir, "rp")
      val ref = VersionedTable.branchRef(dir, "rp")
      val k0 = VersionedTable.latestVersion(spark, ref)
      val kCommits = 4 + rnd.nextInt(4) // 4..7 blind appends
      val rows = (1 to kCommits).map { i =>
        val row = (10000L + seed * 100 + i) -> (1000L + i)
        VersionedTable.commitDelta(spark, ref,
          Some(Seq((row._1, row._2)).toDF("k", "a").coalesce(1)),
          Seq.empty, k0 + i - 1, "bw")
        row
      }
      val n = 1 + rnd.nextInt(kCommits)
      val m = n + rnd.nextInt(kCommits - n + 1)
      (n to m).foreach(bv => VersionedTable.cherryPick(spark, dir, "rp",
        k0 + bv, "picker", readsTable = false))
      val picked = rows.slice(n - 1, m).toMap
      assert(readMap(dir) == base ++ picked,
        s"seed=$seed range $n..$m of $kCommits: table != base + picked")
      // land the whole branch: converges, nothing lands twice
      VersionedTable.fastForward(spark, dir, "rp", "merger",
        readsTable = false)
      assert(readMap(dir) == base ++ rows.toMap,
        s"seed=$seed: post-landing table != base + all branch rows")
      val cnt = VersionedTable.read(spark, dir).groupBy($"k")
        .count().where($"count" > 1).count()
      assert(cnt == 0L, s"seed=$seed: a picked row landed twice")
      VersionedTable.deleteBranch(spark, dir, "rp")
    }
  }
}
