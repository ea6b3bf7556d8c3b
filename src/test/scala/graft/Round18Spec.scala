package graft

import org.apache.spark.sql.functions._
import graft.operators.VersionedTable
import graft.operators.VersionedTable.{CommitConflict, ExpectationViolation}

/** Round-18 surface: the r17 advice fixes (racing migrations refuse;
  * adopted schema tails forced nullable; incarnation-specific
  * cherry-pick exemption tags; typed CommitConflict through SQL range
  * picks; constant-floor listing-cache weights), SQL
  * `CHERRY PICK … CONTENT LOCAL` (VERDICT r17 missing #1), and
  * one-sided RENAME reconciliation in fastForward (missing #3:
  * physical-identity column matching). */
class Round18Spec extends SparkSpec {
  import spark.implicits._

  private def df(tag: String, n: Int, from: Int = 0) =
    spark.range(from, from + n).select($"id".as("k"), lit(tag).as("v"))

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString + "/t"

  private def rows(d: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    d.select(d.columns.head, d.columns(1)).as[(Long, String)].collect().toSet

  // ───────── racing migrations refuse (r17 advice, medium #1) ─────────

  test("an EXPLICIT migration racing another migration refuses loudly (no last-writer-wins)") {
    val dir = tmp("race-mig")
    VersionedTable.commit(spark, dir, df("a", 6), -1L, "w")
    // winner: a metadata-only ADD COLUMNS lands first
    VersionedTable.addColumns(spark, dir, Seq(
      org.apache.spark.sql.types.StructField("w",
        org.apache.spark.sql.types.LongType, nullable = true)), 0L, "w")
    // loser: an explicit allowSchemaChange migration planned against
    // v0 — landing its staged schema would ERASE the winner's column,
    // so the rebase walk must refuse schema-changing winners here
    val e = intercept[CommitConflict] {
      VersionedTable.commitDelta(spark, dir,
        Some(df("b", 2, 10).coalesce(1)
          .withColumn("note", lit("x"))), Seq.empty, 0L, "w2",
        allowSchemaChange = true, rebaseAttempts = 2)
    }
    assert(e.getMessage.contains("changed the table schema"),
      s"racing migrations must refuse on the walk: ${e.getMessage}")
    // control: the ORDINARY blind append still rebases across the
    // migration and adopts it (the q265 behavior is untouched)
    val s = VersionedTable.commitDelta(spark, dir,
      Some(df("c", 2, 20).coalesce(1)), Seq.empty, 0L, "w3",
      rebaseAttempts = 1)
    assert(VersionedTable.schemaOf(spark, dir, s.version)
      .fieldNames.toSeq == Seq("k", "v", "w"))
  }

  // ───────── adopted tails are forced nullable (advice, medium #2) ─────────

  test("a blind append rebasing across a NON-nullable populated append adopts the tail NULLABLE") {
    val dir = tmp("adopt-null")
    VersionedTable.commit(spark, dir, df("a", 6), -1L, "w",
      statsCols = Some(Seq("k")))
    // winner: an explicit migration that appended a populated column
    // whose DataFrame receipt is NON-nullable (lit() literals are)
    VersionedTable.commitDelta(spark, dir,
      Some(spark.range(100, 103).coalesce(1).select($"id".as("k"),
        lit("m").as("v"), lit(7L).as("w"))), Seq.empty, 0L, "w",
      allowSchemaChange = true, statsCols = Some(Seq("k")))
    assert(!VersionedTable.schemaOf(spark, dir, 1L)("w").nullable,
      "precondition: the winner's receipt declares w non-nullable")
    // loser: a blind append (no w column) planned against v0 — the
    // landing adopts the winner's schema, but OUR files null-fill w,
    // so the adopted tail must come out NULLABLE (Spark folds
    // IsNotNull(w) to true otherwise and reads go silently wrong)
    val s = VersionedTable.commitDelta(spark, dir,
      Some(df("b", 2, 10).coalesce(1)), Seq.empty, 0L, "w2",
      rebaseAttempts = 1)
    val landed = VersionedTable.schemaOf(spark, dir, s.version)
    assert(landed.fieldNames.toSeq == Seq("k", "v", "w"))
    assert(landed("w").nullable,
      "the adopted appended tail must be forced nullable")
    val out = VersionedTable.read(spark, dir)
    assert(out.where($"w".isNull).count() == 8L) // 6 base + 2 loser
    assert(out.where($"w".isNotNull).count() == 3L)
  }

  // ───────── incarnation-specific pick exemption (advice, low #4) ─────────

  test("cherry-pick exemption tags die with the branch incarnation (DROP + CREATE same name)") {
    val dir = tmp("inc-tag")
    VersionedTable.commit(spark, dir, df("a", 4), -1L, "w")
    // incarnation 1: a pick lands with its tag
    VersionedTable.createBranch(spark, dir, "p")
    val ref = VersionedTable.branchRef(dir, "p")
    VersionedTable.commitDelta(spark, ref,
      Some(df("p1", 2, 100).coalesce(1)), Seq.empty, 0L, "wb")
    val landed = VersionedTable.cherryPick(spark, dir, "p", 1L, "w")
    val tag = VersionedTable.readManifest(spark, dir, landed)
      .meta("branch.cherryPicked")
    assert(tag.startsWith("p@1#") && tag.drop(4).toLongOption.nonEmpty,
      s"tag must carry the incarnation: $tag")
    // incarnation 2: same NAME, forked before the old pick landed —
    // its rebase walk crosses the incarnation-1 pick winner, which
    // must NOT be exempted for this unrelated branch
    VersionedTable.deleteBranch(spark, dir, "p")
    VersionedTable.createBranch(spark, dir, "p", fromVersion = 0L)
    VersionedTable.commitDelta(spark, ref,
      Some(df("q1", 2, 200).coalesce(1)), Seq.empty, 0L, "wb")
    VersionedTable.commitDelta(spark, ref,
      Some(df("q2", 2, 300).coalesce(1)), Seq.empty, 1L, "wb")
    val e = intercept[CommitConflict] {
      // readsTable = true (the conservative default): the old pick's
      // added files are a risky winner unless wrongly exempted
      VersionedTable.cherryPick(spark, dir, "p", 2L, "w")
    }
    assert(e.getMessage.contains("not logically disjoint"),
      s"a previous incarnation's pick must not exempt: ${e.getMessage}")
  }

  // ───────── SQL CHERRY PICK … CONTENT LOCAL (VERDICT r17 #1) ─────────

  test("SQL CHERRY PICK CONTENT LOCAL: plain form refuses over an advanced mainline, attested form lands") {
    import graft.core.GraftSession
    val dir = tmp("sql-pick-cl")
    VersionedTable.commit(spark, dir, df("a", 6), -1L, "w")
    val gs = new GraftSession(spark)
    gs.registerVersioned("t", dir)
    gs.runScript(
      """CREATE BRANCH fix ON t AS tdev;
        |INSERT INTO tdev SELECT k + 100, 'pick' FROM tdev WHERE k < 2
        |""".stripMargin)
    // mainline advances with a blind append since the fork
    VersionedTable.commitDelta(spark, dir,
      Some(df("m", 2, 50).coalesce(1)), Seq.empty, 0L, "w")
    // plain form: conservative readsTable gate refuses (mainline
    // added files the branch work would have seen under serialization)
    val e = intercept[CommitConflict] {
      gs.sql("CHERRY PICK 1 FROM fix ON t")
    }
    assert(e.getMessage.contains("not logically disjoint"))
    // attested form: the picked commit is content-local, lands
    val r = gs.sql("CHERRY PICK 1 FROM fix ON t CONTENT LOCAL").head()
    assert(r.getString(0) == "cherry_pick" && r.getLong(3) == 1L)
    val got = rows(VersionedTable.read(spark, dir))
    assert(got.count(_._2 == "pick") == 2 && got.count(_._2 == "m") == 2)
    // the live-file gate is NOT waived by the attestation: a pick
    // whose delta rewrote an earlier UNLANDED branch file still
    // refuses (it depends on files mainline does not hold)
    val ref = VersionedTable.branchRef(dir, "fix")
    val bTip = VersionedTable.latestVersion(spark, ref)
    VersionedTable.commitDelta(spark, ref, // b2: stays unlanded
      Some(df("u", 2, 300).coalesce(1)), Seq.empty, bTip, "wb")
    val b2 = VersionedTable.latestVersion(spark, ref)
    val unlanded = VersionedTable.readManifest(spark, ref, b2).files
      .filterNot(VersionedTable.readManifest(spark, ref, b2 - 1)
        .files.toSet).head
    VersionedTable.commitDelta(spark, ref, // b3: rewrites b2's file
      Some(df("rw", 2, 400).coalesce(1)), Seq(unlanded), b2, "wb")
    val e2 = intercept[IllegalArgumentException] {
      gs.sql(s"CHERRY PICK ${b2 + 1} FROM fix ON t CONTENT LOCAL")
    }
    assert(e2.getMessage.contains("earlier unlanded branch work"),
      s"live-file gate must survive the attestation: ${e2.getMessage}")
  }

  test("SQL range pick rethrows a mid-range CommitConflict TYPED (advice, low #5)") {
    import graft.core.GraftSession
    val dir = tmp("sql-pick-cc")
    val gs = new GraftSession(spark)
    VersionedTable.commit(spark, dir, df("a", 8), -1L, "w",
      statsCols = Some(Seq("k")))
    gs.registerVersioned("t", dir)
    gs.sql("CREATE BRANCH fix ON t AS tdev")
    val ref = VersionedTable.branchRef(dir, "fix")
    // b1: clean blind append; b2: rewrites a BASE file (a real file
    // dependency a racing mainline delete then invalidates)
    VersionedTable.commitDelta(spark, ref,
      Some(df("p1", 2, 100).coalesce(1)), Seq.empty, 0L, "wb")
    val baseFile = VersionedTable.readManifest(spark, dir, 0L).files.head
    VersionedTable.commitDelta(spark, ref,
      Some(df("p2", 2, 200).coalesce(1)), Seq(baseFile), 1L, "wb")
    // mainline rewrites the SAME base file since the fork
    VersionedTable.commitDelta(spark, dir,
      Some(df("mrw", 1, 500).coalesce(1)), Seq(baseFile), 0L, "w")
    // pick 1 lands (content-local); pick 2 hits the clash — the
    // resume-point error must stay a TYPED CommitConflict, not an
    // IllegalArgumentException (a retryable conflict is not a
    // permanent grammar refusal)
    val e = intercept[CommitConflict] {
      gs.sql("CHERRY PICK 1..2 FROM fix ON t CONTENT LOCAL")
    }
    assert(e.getMessage.contains("picks 1..1 landed") &&
      e.getMessage.contains("resume with CHERRY PICK 2..2"),
      s"typed partial-landing conflict: ${e.getMessage}")
    assert(rows(VersionedTable.read(spark, dir)).count(_._2 == "p1") == 2)
  }

  // ───────── listing cache: constant per-entry weight (advice, low #3) ─────────

  test("listing cache charges a constant floor per entry (many tiny tables stay bounded)") {
    val cache = VersionedTable.listingCache
    val old = cache.budget
    try {
      cache.clear()
      cache.budget = 32L * 64 // room for exactly 64 floor-weight entries
      (1 to 500).foreach(i => cache.put(s"/tiny/table-$i", (1L, Seq(0L))))
      assert(cache.entriesNow <= 64,
        s"per-entry floor must bound entries: ${cache.entriesNow}")
      assert(cache.weightNow <= cache.budget)
    } finally { cache.clear(); cache.budget = old }
  }

  // ───────── one-sided rename reconciliation (VERDICT r17 missing #3) ─────────

  test("fastForward lands a MAINLINE rename × branch append: renaming side's names win") {
    val dir = tmp("ren-main")
    VersionedTable.commit(spark, dir, df("a", 6), -1L, "w")
    VersionedTable.createBranch(spark, dir, "dev")
    val ref = VersionedTable.branchRef(dir, "dev")
    // branch: appends rows AND a column (still under the old names)
    VersionedTable.addColumns(spark, ref, Seq(
      org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.DoubleType, nullable = true)), 0L, "wb")
    VersionedTable.commitDelta(spark, ref,
      Some(spark.range(100, 103).coalesce(1).select($"id".as("k"),
        lit("dev").as("v"), lit(2.5).as("score"))), Seq.empty, 1L, "wb")
    // mainline: renames v -> label (metadata-only, sticky physical)
    VersionedTable.renameColumns(spark, dir, Map("v" -> "label"), 0L, "w")
    val landed = VersionedTable.fastForward(spark, dir, "dev", "w",
      readsTable = false).get
    val lm = VersionedTable.readManifest(spark, dir, landed)
    assert(lm.schema.get.fieldNames.toSeq == Seq("k", "label", "score"),
      s"landed names: ${lm.schema.get.fieldNames.toSeq}")
    assert(lm.colmap.get("label").contains("v"),
      s"landing colmap must keep the sticky physical name: ${lm.colmap}")
    val out = VersionedTable.read(spark, dir)
    // branch files wrote physical 'v' — the landed colmap resolves
    // 'label' to the same bytes on BOTH sides' files
    assert(out.where($"label" === "dev").count() == 3L)
    assert(out.where($"label" === "a").count() == 6L)
    assert(out.where($"score".isNotNull).count() == 3L)
  }

  test("fastForward lands a BRANCH rename × mainline append") {
    val dir = tmp("ren-branch")
    VersionedTable.commit(spark, dir, df("a", 6), -1L, "w")
    VersionedTable.createBranch(spark, dir, "dev")
    val ref = VersionedTable.branchRef(dir, "dev")
    // branch: renames v -> label, then appends rows under the new name
    VersionedTable.renameColumns(spark, ref, Map("v" -> "label"), 0L, "wb")
    VersionedTable.commitDelta(spark, ref,
      Some(spark.range(100, 102).coalesce(1).select($"id".as("k"),
        lit("dev").as("label"))), Seq.empty, 1L, "wb")
    // mainline: appends a column + a row since the fork
    VersionedTable.addColumns(spark, dir, Seq(
      org.apache.spark.sql.types.StructField("region",
        org.apache.spark.sql.types.StringType, nullable = true)), 0L, "w")
    VersionedTable.commitDelta(spark, dir,
      Some(spark.range(1).coalesce(1).select(lit(200L).as("k"),
        lit("m").as("v"), lit("eu").as("region"))), Seq.empty, 1L, "w")
    val landed = VersionedTable.fastForward(spark, dir, "dev", "w",
      readsTable = false).get
    val lm = VersionedTable.readManifest(spark, dir, landed)
    assert(lm.schema.get.fieldNames.toSeq == Seq("k", "label", "region"),
      s"landed names: ${lm.schema.get.fieldNames.toSeq}")
    assert(lm.colmap.get("label").contains("v"))
    val out = VersionedTable.read(spark, dir)
    assert(out.where($"label" === "dev").count() == 2L)
    assert(out.where($"label" === "m").count() == 1L)
    assert(out.where($"region".isNotNull).count() == 1L)
    assert(out.where($"region".isNotNull && $"label" =!= "m").isEmpty)
  }

  test("two-sided renames refuse; rename colliding with the other side's append refuses") {
    // both sides renamed (different columns) — no automatic resolution
    val dir = tmp("ren-both")
    VersionedTable.commit(spark, dir,
      df("a", 4).withColumn("x", lit(1L)), -1L, "w")
    VersionedTable.createBranch(spark, dir, "dev")
    val ref = VersionedTable.branchRef(dir, "dev")
    VersionedTable.renameColumns(spark, ref, Map("v" -> "label"), 0L, "wb")
    VersionedTable.renameColumns(spark, dir, Map("x" -> "y"), 0L, "w")
    val e = intercept[CommitConflict] {
      VersionedTable.fastForward(spark, dir, "dev", "w", readsTable = false)
    }
    assert(e.getMessage.contains("both sides renamed"),
      s"two-sided rename refusal: ${e.getMessage}")
    // mainline renamed v -> score; branch independently APPENDED a
    // column also called score — the landing would collide
    val dir2 = tmp("ren-clash")
    VersionedTable.commit(spark, dir2, df("a", 4), -1L, "w")
    VersionedTable.createBranch(spark, dir2, "dev")
    val ref2 = VersionedTable.branchRef(dir2, "dev")
    VersionedTable.addColumns(spark, ref2, Seq(
      org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.DoubleType, nullable = true)), 0L, "wb")
    VersionedTable.commitDelta(spark, ref2,
      Some(spark.range(1).coalesce(1).select(lit(9L).as("k"),
        lit("d").as("v"), lit(1.0).as("score"))), Seq.empty, 1L, "wb")
    VersionedTable.renameColumns(spark, dir2, Map("v" -> "score"), 0L, "w")
    val e2 = intercept[CommitConflict] {
      VersionedTable.fastForward(spark, dir2, "dev", "w", readsTable = false)
    }
    assert(e2.getMessage.contains("collides with another landed column"),
      s"rename × append collision: ${e2.getMessage}")
  }

  test("rename reconciliation × declarations: token lists rename through, SQL mentions refuse") {
    // branch re-declares clustering naming the OLD column while
    // mainline renames it — the landed token list renames through
    val dir = tmp("ren-decl")
    VersionedTable.commit(spark, dir, df("a", 6), -1L, "w")
    VersionedTable.createBranch(spark, dir, "dev")
    val ref = VersionedTable.branchRef(dir, "dev")
    VersionedTable.commitDelta(spark, ref,
      Some(df("d", 2, 100).coalesce(1)), Seq.empty, 0L, "wb",
      meta = Map(VersionedTable.ClusterKey -> "k,v"))
    VersionedTable.renameColumns(spark, dir, Map("v" -> "label"), 0L, "w")
    val landed = VersionedTable.fastForward(spark, dir, "dev", "w",
      readsTable = false).get
    val lm = VersionedTable.readManifest(spark, dir, landed)
    assert(lm.meta.get(VersionedTable.ClusterKey).contains("k,label"),
      s"cluster tokens must rename through: ${lm.meta.get(VersionedTable.ClusterKey)}")
    // branch declares an EXPECTATION whose free-form SQL mentions the
    // old name — cannot be rewritten soundly, refuses loudly
    val dir2 = tmp("ren-expect")
    VersionedTable.commit(spark, dir2, df("a", 6), -1L, "w")
    VersionedTable.createBranch(spark, dir2, "dev")
    val ref2 = VersionedTable.branchRef(dir2, "dev")
    VersionedTable.commitDelta(spark, ref2,
      Some(df("d", 2, 100).coalesce(1)), Seq.empty, 0L, "wb",
      expectations = Map("v_ok" -> "v IS NOT NULL"))
    VersionedTable.renameColumns(spark, dir2, Map("v" -> "label"), 0L, "w")
    val e = intercept[CommitConflict] {
      VersionedTable.fastForward(spark, dir2, "dev", "w", readsTable = false)
    }
    assert(e.getMessage.contains("mentions renamed column 'v'"),
      s"SQL mention refusal: ${e.getMessage}")
  }

  test("mainline rename mid-walk: the landing gate admits the metadata-only step") {
    // mainline: append THEN rename since the fork (two winners: one
    // additive, one pure-rename) — the walk admits both kinds and the
    // branch's blind append lands under the renamed world
    val dir = tmp("ren-walk")
    VersionedTable.commit(spark, dir, df("a", 6), -1L, "w")
    VersionedTable.createBranch(spark, dir, "dev")
    val ref = VersionedTable.branchRef(dir, "dev")
    VersionedTable.commitDelta(spark, ref,
      Some(df("dev", 2, 100).coalesce(1)), Seq.empty, 0L, "wb")
    VersionedTable.commitDelta(spark, dir,
      Some(df("m", 1, 50).coalesce(1)), Seq.empty, 0L, "w")
    VersionedTable.renameColumns(spark, dir, Map("v" -> "label"), 1L, "w")
    val landed = VersionedTable.fastForward(spark, dir, "dev", "w",
      readsTable = false).get
    val lm = VersionedTable.readManifest(spark, dir, landed)
    assert(lm.schema.get.fieldNames.toSeq == Seq("k", "label"))
    val out = VersionedTable.read(spark, dir)
    assert(out.count() == 9L)
    assert(out.where($"label" === "dev").count() == 2L)
    // stats stayed keyed under the LANDED name (pruning survives)
    val landedStats = lm.stats.values.flatMap(_.keys).toSet
    assert(!landedStats.contains("v"),
      s"no stale stat keys under the old name: $landedStats")
  }

  test("cherryPick across a one-sided rename: mainline's names always win the landing") {
    // mainline renamed since the fork; a branch blind-append delta
    // (planned under the OLD names) still picks — physical identity
    val dir = tmp("pick-ren")
    VersionedTable.commit(spark, dir, df("a", 4), -1L, "w",
      statsCols = Some(Seq("k")))
    VersionedTable.createBranch(spark, dir, "fix")
    val ref = VersionedTable.branchRef(dir, "fix")
    VersionedTable.commitDelta(spark, ref,
      Some(df("p1", 2, 100).coalesce(1)), Seq.empty, 0L, "wb",
      statsCols = Some(Seq("k")))
    VersionedTable.renameColumns(spark, dir, Map("v" -> "label"), 0L, "w")
    val landed = VersionedTable.cherryPick(spark, dir, "fix", 1L, "w",
      readsTable = false)
    val lm = VersionedTable.readManifest(spark, dir, landed)
    assert(lm.schema.get.fieldNames.toSeq == Seq("k", "label"))
    val out = VersionedTable.read(spark, dir)
    assert(out.where($"label" === "p1").count() == 2L)
    // the picked file's stats re-keyed under the landed names
    assert(!lm.stats.values.flatMap(_.keys).toSet.contains("v"))
    // BRANCH renamed since the fork: picking a later delta lands
    // under MAINLINE's names (a pick never lands naming)
    val dir2 = tmp("pick-bren")
    VersionedTable.commit(spark, dir2, df("a", 4), -1L, "w")
    VersionedTable.createBranch(spark, dir2, "fix")
    val ref2 = VersionedTable.branchRef(dir2, "fix")
    VersionedTable.renameColumns(spark, ref2, Map("v" -> "note"), 0L, "wb")
    VersionedTable.commitDelta(spark, ref2,
      Some(spark.range(2).coalesce(1).select(($"id" + 200L).as("k"),
        lit("p2").as("note"))), Seq.empty, 1L, "wb")
    val landed2 = VersionedTable.cherryPick(spark, dir2, "fix", 2L, "w",
      readsTable = false)
    val lm2 = VersionedTable.readManifest(spark, dir2, landed2)
    assert(lm2.schema.get.fieldNames.toSeq == Seq("k", "v"),
      s"mainline's names win: ${lm2.schema.get.fieldNames.toSeq}")
    assert(VersionedTable.read(spark, dir2)
      .where($"v" === "p2").count() == 2L)
    // the pick OF the rename commit itself still refuses
    val e0 = intercept[IllegalArgumentException] {
      VersionedTable.cherryPick(spark, dir2, "fix", 1L, "w",
        readsTable = false)
    }
    assert(e0.getMessage.contains("changed the schema/mapping"))
    // collision: mainline renamed v -> extra while the branch's
    // unlanded tail ADDS a column called extra — no landing
    val dir3 = tmp("pick-clash")
    VersionedTable.commit(spark, dir3, df("a", 4), -1L, "w")
    VersionedTable.createBranch(spark, dir3, "fix")
    val ref3 = VersionedTable.branchRef(dir3, "fix")
    VersionedTable.addColumns(spark, ref3, Seq(
      org.apache.spark.sql.types.StructField("extra",
        org.apache.spark.sql.types.StringType, nullable = true)), 0L, "wb")
    VersionedTable.commitDelta(spark, ref3,
      Some(spark.range(1).coalesce(1).select(lit(300L).as("k"),
        lit("d").as("v"), lit("x").as("extra"))), Seq.empty, 1L, "wb")
    VersionedTable.renameColumns(spark, dir3, Map("v" -> "extra"), 0L, "w")
    val e1 = intercept[IllegalArgumentException] {
      VersionedTable.cherryPick(spark, dir3, "fix", 2L, "w",
        readsTable = false)
    }
    assert(e1.getMessage.contains("collides with a mainline column"),
      s"rename × tail-append collision: ${e1.getMessage}")
  }

  // ───────── REBASE BRANCH (VERDICT r17 missing #2) ─────────

  test("rebaseBranch re-anchors a refused branch; the conservative fastForward then lands") {
    val dir = tmp("rb-basic")
    VersionedTable.commit(spark, dir, df("a", 6), -1L, "w")
    VersionedTable.createBranch(spark, dir, "dev")
    val ref = VersionedTable.branchRef(dir, "dev")
    VersionedTable.commitDelta(spark, ref,
      Some(df("d1", 2, 100).coalesce(1)), Seq.empty, 0L, "wb")
    VersionedTable.commitDelta(spark, ref,
      Some(df("d2", 2, 200).coalesce(1)), Seq.empty, 1L, "wb")
    // mainline appends since the fork → the conservative landing
    // (readsTable = true) refuses
    VersionedTable.commitDelta(spark, dir,
      Some(df("m", 2, 50).coalesce(1)), Seq.empty, 0L, "w")
    val e = intercept[CommitConflict] {
      VersionedTable.fastForward(spark, dir, "dev", "w")
    }
    assert(e.getMessage.contains("not logically disjoint"))
    // rebase: replay the two deltas onto the tip; the walk is then
    // empty and the SAME conservative landing goes through
    val r = VersionedTable.rebaseBranch(spark, dir, "dev", "w")
    assert(r == VersionedTable.RebaseStats(1L, 2L, 0L), s"receipt: $r")
    assert(VersionedTable.versions(spark, ref) == Seq(1L, 2L, 3L),
      "the rebased chain renumbers from the mainline tip")
    val landed = VersionedTable.fastForward(spark, dir, "dev", "w").get
    val got = rows(VersionedTable.read(spark, dir))
    assert(got.size == 12 && got.count(_._2 == "d1") == 2 &&
      got.count(_._2 == "d2") == 2 && got.count(_._2 == "m") == 2,
      s"every branch row lands exactly once: $got")
    assert(landed == 2L)
  }

  test("rebaseBranch drops commits already cherry-picked from THIS incarnation") {
    val dir = tmp("rb-picked")
    VersionedTable.commit(spark, dir, df("a", 4), -1L, "w")
    VersionedTable.createBranch(spark, dir, "dev")
    val ref = VersionedTable.branchRef(dir, "dev")
    VersionedTable.commitDelta(spark, ref,
      Some(df("d1", 2, 100).coalesce(1)), Seq.empty, 0L, "wb")
    VersionedTable.commitDelta(spark, ref,
      Some(df("d2", 2, 200).coalesce(1)), Seq.empty, 1L, "wb")
    VersionedTable.commitDelta(spark, ref,
      Some(df("d3", 2, 300).coalesce(1)), Seq.empty, 2L, "wb")
    // pick the MIDDLE commit onto mainline, then rebase
    VersionedTable.cherryPick(spark, dir, "dev", 2L, "w",
      readsTable = false)
    val r = VersionedTable.rebaseBranch(spark, dir, "dev", "w")
    assert(r.replayed == 2L && r.skipped == 1L, s"receipt: $r")
    VersionedTable.fastForward(spark, dir, "dev", "w").get
    val got = rows(VersionedTable.read(spark, dir))
    assert(got.size == 10 &&
      Seq("d1", "d2", "d3").forall(t => got.count(_._2 == t) == 2),
      s"the picked commit must land exactly once: $got")
  }

  test("rebaseBranch refuses a REAL file conflict all-or-nothing, naming the replayable prefix") {
    val dir = tmp("rb-conflict")
    VersionedTable.commit(spark, dir, df("a", 6), -1L, "w")
    val baseFile = VersionedTable.readManifest(spark, dir, 0L).files.head
    VersionedTable.createBranch(spark, dir, "dev")
    val ref = VersionedTable.branchRef(dir, "dev")
    VersionedTable.commitDelta(spark, ref, // d1: clean append
      Some(df("d1", 2, 100).coalesce(1)), Seq.empty, 0L, "wb")
    VersionedTable.commitDelta(spark, ref, // d2: rewrites a base file
      Some(df("d2", 2, 200).coalesce(1)), Seq(baseFile), 1L, "wb")
    // mainline rewrites the SAME file → d2 is a real conflict
    VersionedTable.commitDelta(spark, dir,
      Some(df("m", 1, 50).coalesce(1)), Seq(baseFile), 0L, "w")
    val before = VersionedTable.versions(spark, ref)
    val e = intercept[CommitConflict] {
      VersionedTable.rebaseBranch(spark, dir, "dev", "w")
    }
    assert(e.getMessage.contains("branch version 2") &&
      e.getMessage.contains("commits 1..1 are cleanly replayable"),
      s"first-conflict attribution: ${e.getMessage}")
    assert(VersionedTable.versions(spark, ref) == before,
      "all-or-nothing: the branch chain must be untouched")
  }

  test("rebaseBranch replays additive migrations and enforces mainline's new expectations") {
    val dir = tmp("rb-schema")
    VersionedTable.commit(spark, dir, df("a", 4), -1L, "w")
    VersionedTable.createBranch(spark, dir, "dev")
    val ref = VersionedTable.branchRef(dir, "dev")
    VersionedTable.addColumns(spark, ref, Seq(
      org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.DoubleType, nullable = true)), 0L, "wb")
    VersionedTable.commitDelta(spark, ref,
      Some(spark.range(100, 102).coalesce(1).select($"id".as("k"),
        lit("d").as("v"), lit(1.5).as("score"))), Seq.empty, 1L, "wb")
    VersionedTable.commitDelta(spark, dir,
      Some(df("m", 1, 50).coalesce(1)), Seq.empty, 0L, "w")
    val r = VersionedTable.rebaseBranch(spark, dir, "dev", "w")
    assert(r.replayed == 2L)
    VersionedTable.fastForward(spark, dir, "dev", "w").get
    val out = VersionedTable.read(spark, dir)
    assert(out.columns.toSeq == Seq("k", "v", "score"))
    assert(out.where($"score".isNotNull).count() == 2L)
    // mainline expectations declared since the fork bind the replayed
    // adds: the rebase serializes branch rows AFTER the declaration
    val dir2 = tmp("rb-expect")
    VersionedTable.commit(spark, dir2, df("a", 4), -1L, "w")
    VersionedTable.createBranch(spark, dir2, "dev")
    val ref2 = VersionedTable.branchRef(dir2, "dev")
    VersionedTable.commitDelta(spark, ref2,
      Some(df("big", 2, 5000).coalesce(1)), Seq.empty, 0L, "wb")
    VersionedTable.commitDelta(spark, dir2,
      Some(df("m", 1, 50).coalesce(1)), Seq.empty, 0L, "w",
      expectations = Map("k_small" -> "k < 1000"))
    val e = intercept[ExpectationViolation] {
      VersionedTable.rebaseBranch(spark, dir2, "dev", "w")
    }
    assert(e.getMessage.contains("re-declared expectations"),
      s"new expectations bind replayed adds: ${e.getMessage}")
  }

  test("rebaseBranch across a mainline RENAME: replayed decl tokens rename through, SQL mentions refuse") {
    val dir = tmp("rb-ren")
    VersionedTable.commit(spark, dir, df("a", 4), -1L, "w")
    VersionedTable.createBranch(spark, dir, "dev")
    val ref = VersionedTable.branchRef(dir, "dev")
    VersionedTable.commitDelta(spark, ref,
      Some(df("d1", 2, 100).coalesce(1)), Seq.empty, 0L, "wb")
    VersionedTable.commitDelta(spark, ref, // re-declares with OLD name
      Some(df("d2", 2, 200).coalesce(1)), Seq.empty, 1L, "wb",
      meta = Map(VersionedTable.ClusterKey -> "k,v"))
    VersionedTable.renameColumns(spark, dir, Map("v" -> "label"), 0L, "w")
    VersionedTable.commitDelta(spark, dir,
      Some(spark.range(1).coalesce(1).select(lit(50L).as("k"),
        lit("m").as("label"))), Seq.empty, 1L, "w")
    val r = VersionedTable.rebaseBranch(spark, dir, "dev", "w")
    assert(r.replayed == 2L, s"receipt: $r")
    // the rebased chain carries the RENAMED schema and the branch's
    // cluster tokens renamed through
    val bTip = VersionedTable.latestVersion(spark, ref)
    val bm = VersionedTable.readManifest(spark, ref, bTip)
    assert(bm.schema.get.fieldNames.toSeq == Seq("k", "label"))
    assert(bm.meta.get(VersionedTable.ClusterKey).contains("k,label"),
      s"replayed tokens rename through: ${bm.meta.get(VersionedTable.ClusterKey)}")
    VersionedTable.fastForward(spark, dir, "dev", "w").get
    val out = VersionedTable.read(spark, dir)
    assert(out.where($"label" === "d1").count() == 2L &&
      out.where($"label" === "d2").count() == 2L &&
      out.where($"label" === "m").count() == 1L)
    // a branch expectation whose free-form SQL mentions the renamed
    // name cannot be rewritten — the rebase refuses loudly
    val dir2 = tmp("rb-ren-sql")
    VersionedTable.commit(spark, dir2, df("a", 4), -1L, "w")
    VersionedTable.createBranch(spark, dir2, "dev")
    val ref2 = VersionedTable.branchRef(dir2, "dev")
    VersionedTable.commitDelta(spark, ref2,
      Some(df("d", 2, 100).coalesce(1)), Seq.empty, 0L, "wb",
      expectations = Map("v_ok" -> "v IS NOT NULL"))
    VersionedTable.renameColumns(spark, dir2, Map("v" -> "label"), 0L, "w")
    VersionedTable.commitDelta(spark, dir2,
      Some(spark.range(1).coalesce(1).select(lit(60L).as("k"),
        lit("m").as("label"))), Seq.empty, 1L, "w")
    val e = intercept[CommitConflict] {
      VersionedTable.rebaseBranch(spark, dir2, "dev", "w")
    }
    assert(e.getMessage.contains("mentioning renamed column 'v'"),
      s"SQL mention refusal in replay: ${e.getMessage}")
  }

  test("rebase-then-land on a feed-declared table keeps the change feed exact") {
    val dir = tmp("rb-feed")
    VersionedTable.commit(spark, dir, df("a", 6), -1L, "w",
      meta = Map(VersionedTable.FeedKey -> "k"))
    VersionedTable.createBranch(spark, dir, "dev")
    val ref = VersionedTable.branchRef(dir, "dev")
    VersionedTable.commitDelta(spark, ref,
      Some(df("d1", 2, 100).coalesce(1)), Seq.empty, 0L, "wb")
    VersionedTable.commitDelta(spark, ref, // rewrites an own file:
      // k=100 updated to d1b, k=101 carried verbatim
      Some(df("d1b", 1, 100).union(df("d1", 1, 101)).coalesce(1)),
      Seq(VersionedTable.readManifest(spark, ref, 1L).files
        .filterNot(VersionedTable.readManifest(spark, ref, 0L)
          .files.toSet).head), 1L, "wb")
    VersionedTable.commitDelta(spark, dir,
      Some(df("m", 1, 50).coalesce(1)), Seq.empty, 0L, "w")
    val pre = VersionedTable.latestVersion(spark, dir)
    VersionedTable.rebaseBranch(spark, dir, "dev", "w")
    val landed = VersionedTable.fastForward(spark, dir, "dev", "w").get
    // the landing's feed diff: the branch's NET effect — d1b replaced
    // one d1 row in place (same key), so the feed carries key 100 as
    // an update-shaped upsert and 101 as an insert, nothing else
    val feed = VersionedTable.changesBetween(spark, dir, pre, landed,
      Seq("k"))
    val got = feed.select($"k", $"v", $"op")
      .as[(Long, String, String)].collect().toSet
    assert(got == Set((100L, "d1b", "insert"), (101L, "d1", "insert")),
      s"the landing's feed must be the branch's net effect: $got")
    // mainline read exact: 6 base + 1 m + d1b(k=100) + d1(k=101)
    val out = rows(VersionedTable.read(spark, dir))
    assert(out.size == 9 && out.contains((100L, "d1b")) &&
      out.contains((101L, "d1")) && out.count(_._2 == "m") == 1)
  }

  test("SQL REBASE BRANCH + seeded model law: rebase-then-fastForward converges exactly once") {
    import graft.core.GraftSession
    val rnd = new scala.util.Random(1804)
    (1 to 4).foreach { seed =>
      val dir = tmp(s"rb-law-$seed")
      val gs = new GraftSession(spark)
      VersionedTable.commit(spark, dir, df("base", 4), -1L, "w")
      gs.registerVersioned("t", dir)
      gs.sql("CREATE BRANCH dev ON t AS tdev")
      val ref = VersionedTable.branchRef(dir, "dev")
      val nBranch = 1 + rnd.nextInt(3)
      val nMain = rnd.nextInt(3)
      val tags = (1 to nBranch).map(i => s"b$seed-$i")
      tags.zipWithIndex.foreach { case (t, i) =>
        VersionedTable.commitDelta(spark, ref,
          Some(df(t, 2, 1000 + 100 * i).coalesce(1)), Seq.empty,
          i.toLong, "wb")
      }
      (1 to nMain).foreach { i =>
        VersionedTable.commitDelta(spark, dir,
          Some(df(s"m$seed-$i", 1, 100 * i).coalesce(1)), Seq.empty,
          (i - 1).toLong, "w")
      }
      // maybe land one branch commit as a pick first (content-local)
      val pickOne = rnd.nextBoolean() && nBranch > 1
      if (pickOne)
        VersionedTable.cherryPick(spark, dir, "dev", 1L, "w",
          readsTable = false)
      val r = gs.sql("REBASE BRANCH dev ON t").head()
      // a quiet mainline (no appends, no picks) makes rebase a no-op
      val expectReplayed =
        if (nMain == 0 && !pickOne) 0L
        else (if (pickOne) nBranch - 1 else nBranch).toLong
      assert(r.getString(0) == "rebase_branch" &&
        r.getLong(3) == expectReplayed, s"seed $seed receipt: $r")
      // the conservative landing goes through after the rebase
      VersionedTable.fastForward(spark, dir, "dev", "w").get
      val got = rows(VersionedTable.read(spark, dir))
      tags.foreach(t => assert(got.count(_._2 == t) == 2,
        s"seed $seed: branch tag $t must land exactly once: $got"))
      (1 to nMain).foreach(i =>
        assert(got.count(_._2 == s"m$seed-$i") == 1,
          s"seed $seed: mainline rows survive"))
      assert(got.count(_._2 == "base") == 4)
    }
  }
}
