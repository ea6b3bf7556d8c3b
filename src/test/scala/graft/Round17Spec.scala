package graft

import org.apache.spark.sql.functions._
import graft.operators.VersionedTable
import graft.operators.VersionedTable.{CommitConflict, ExpectationViolation}

/** Round-17 surface (VERDICT r16 #2–#5): two-sided DISJOINT additive
  * reconciliation in fastForward (schema appends with disjoint names;
  * declaration changes with disjoint keys, cross-enforced both ways),
  * cherryPick's one-sided additive schema admit (+ the pick-is-a-delta
  * refusals), the weight-bounded version-listing cache, and the SQL
  * `CHERRY PICK n..m` range with its partial-landing contract. */
class Round17Spec extends SparkSpec {
  import spark.implicits._

  private def df(tag: String, n: Int, from: Int = 0) =
    spark.range(from, from + n).select($"id".as("k"), lit(tag).as("v"))

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString + "/t"

  private def rows(d: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    d.select($"k", $"v").as[(Long, String)].collect().toSet

  // ───────── two-sided disjoint additive schema reconciliation ─────────

  test("fastForward lands two-sided DISJOINT column appends: union schema, mainline first") {
    val dir = tmp("ff2-sch")
    VersionedTable.commit(spark, dir, df("a", 12), -1L, "w")
    VersionedTable.createBranch(spark, dir, "dev")
    val ref = VersionedTable.branchRef(dir, "dev")
    // branch: ADD COLUMNS score + rows carrying it
    VersionedTable.addColumns(spark, ref, Seq(
      org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.DoubleType, nullable = true)), 0L, "wb")
    VersionedTable.commitDelta(spark, ref,
      Some(spark.range(100, 103).coalesce(1).select($"id".as("k"),
        lit("dev").as("v"), lit(2.5).as("score"))), Seq.empty, 1L, "wb")
    // mainline, independently: ADD COLUMNS region + a row carrying it
    VersionedTable.addColumns(spark, dir, Seq(
      org.apache.spark.sql.types.StructField("region",
        org.apache.spark.sql.types.StringType, nullable = true)), 0L, "w")
    VersionedTable.commitDelta(spark, dir,
      Some(spark.range(1).coalesce(1).select(lit(200L).as("k"),
        lit("m").as("v"), lit("eu").as("region"))), Seq.empty, 1L, "w")
    val landed = VersionedTable.fastForward(spark, dir, "dev", "w",
      readsTable = false).get
    val lm = VersionedTable.readManifest(spark, dir, landed)
    // the order rule: mainline's fields (committed order), branch tail last
    assert(lm.schema.get.fieldNames.toSeq == Seq("k", "v", "region", "score"),
      s"union schema order: ${lm.schema.get.fieldNames.toSeq}")
    assert(lm.schema.get.fields.drop(2).forall(_.nullable),
      "both tails must be nullable (each side null-fills the other's)")
    val out = VersionedTable.read(spark, dir)
    assert(out.count() == 16L) // 12 base + 1 mainline + 3 branch
    // each side's rows null-fill the OTHER side's column
    assert(out.where($"score".isNotNull).count() == 3L)
    assert(out.where($"region".isNotNull).count() == 1L)
    assert(out.where($"score".isNotNull && $"region".isNotNull).isEmpty)
    // the NEXT stage-land cycle keeps landing (anchors re-synced)
    VersionedTable.commitDelta(spark, ref,
      Some(spark.range(1).coalesce(1).select(lit(300L).as("k"),
        lit("dev2").as("v"), lit(9.0).as("score"))), Seq.empty,
      VersionedTable.latestVersion(spark, ref), "wb")
    val landed2 = VersionedTable.fastForward(spark, dir, "dev", "w",
      readsTable = false).get
    assert(VersionedTable.readManifest(spark, dir, landed2)
      .schema.get.fieldNames.toSeq == Seq("k", "v", "region", "score"))
    assert(VersionedTable.read(spark, dir).count() == 17L)
  }

  test("two-sided divergences that are NOT disjoint appends still refuse loudly") {
    // same name appended on both sides at DIFFERENT types → no union
    val dir = tmp("ff2-clash")
    VersionedTable.commit(spark, dir, df("a", 6), -1L, "w")
    VersionedTable.createBranch(spark, dir, "dev")
    val ref = VersionedTable.branchRef(dir, "dev")
    VersionedTable.addColumns(spark, ref, Seq(
      org.apache.spark.sql.types.StructField("c1",
        org.apache.spark.sql.types.LongType, nullable = true)), 0L, "wb")
    VersionedTable.commitDelta(spark, ref,
      Some(spark.range(1).coalesce(1).select(lit(50L).as("k"),
        lit("d").as("v"), lit(1L).as("c1"))), Seq.empty, 1L, "wb")
    VersionedTable.addColumns(spark, dir, Seq(
      org.apache.spark.sql.types.StructField("c1",
        org.apache.spark.sql.types.DoubleType, nullable = true)), 0L, "w")
    val e = intercept[CommitConflict] {
      VersionedTable.fastForward(spark, dir, "dev", "w", readsTable = false)
    }
    assert(e.getMessage.contains("has no union"))
    // branch DROPPED a column while mainline appended → beyond appends
    val dir2 = tmp("ff2-drop")
    VersionedTable.commit(spark, dir2, df("a", 6), -1L, "w")
    VersionedTable.createBranch(spark, dir2, "dev")
    val ref2 = VersionedTable.branchRef(dir2, "dev")
    VersionedTable.dropColumns(spark, ref2, Seq("v"), 0L, "wb")
    VersionedTable.addColumns(spark, dir2, Seq(
      org.apache.spark.sql.types.StructField("extra",
        org.apache.spark.sql.types.LongType, nullable = true)), 0L, "w")
    val e2 = intercept[CommitConflict] {
      VersionedTable.fastForward(spark, dir2, "dev", "w", readsTable = false)
    }
    assert(e2.getMessage.contains("beyond a nullable append"))
    // mainline DROPPED a column the branch's anchor still carries,
    // while the branch appended → the branch's world cannot map into
    // mainline's current schema
    val dir3 = tmp("ff2-mdrop")
    VersionedTable.commit(spark, dir3, df("a", 6), -1L, "w")
    VersionedTable.createBranch(spark, dir3, "dev")
    val ref3 = VersionedTable.branchRef(dir3, "dev")
    VersionedTable.addColumns(spark, ref3, Seq(
      org.apache.spark.sql.types.StructField("c2",
        org.apache.spark.sql.types.LongType, nullable = true)), 0L, "wb")
    VersionedTable.dropColumns(spark, dir3, Seq("v"), 0L, "w")
    val e3 = intercept[CommitConflict] {
      VersionedTable.fastForward(spark, dir3, "dev", "w", readsTable = false)
    }
    assert(e3.getMessage.contains("no longer carries column 'v'"))
  }

  // ───────── two-sided disjoint declaration reconciliation ─────────

  test("fastForward lands two-sided DISJOINT declarations: union, cross-enforced both ways") {
    val dir = tmp("ff2-decl")
    VersionedTable.commit(spark, dir, df("ok", 8), -1L, "w")
    VersionedTable.createBranch(spark, dir, "dev")
    val ref = VersionedTable.branchRef(dir, "dev")
    // branch declares expect.k_low and writes conforming rows
    VersionedTable.commitDelta(spark, ref,
      Some(df("dev", 2, 50).coalesce(1)), Seq.empty, 0L, "wb",
      expectations = Map("no_bad" -> "v <> 'bad'"))
    // mainline independently declares expect.k_pos + conforming append
    VersionedTable.commitDelta(spark, dir,
      Some(df("m", 2, 70).coalesce(1)), Seq.empty, 0L, "w",
      expectations = Map("k_pos" -> "k >= 0"))
    val landed = VersionedTable.fastForward(spark, dir, "dev", "w",
      readsTable = false).get
    val ex = VersionedTable.tableExpectations(spark, dir, landed)
    assert(ex.get("no_bad").contains("v <> 'bad'") &&
      ex.get("k_pos").contains("k >= 0"),
      s"landing must carry the UNION of disjoint declarations: $ex")
    assert(rows(VersionedTable.read(spark, dir)).size == 12)
    // direction 1: mainline's since-fork adds violate the BRANCH's new
    // check → the landing refuses
    val dir2 = tmp("ff2-declv1")
    VersionedTable.commit(spark, dir2, df("ok", 8), -1L, "w")
    VersionedTable.createBranch(spark, dir2, "dev")
    val ref2 = VersionedTable.branchRef(dir2, "dev")
    VersionedTable.commitDelta(spark, ref2,
      Some(df("dev", 1, 50).coalesce(1)), Seq.empty, 0L, "wb",
      expectations = Map("no_bad" -> "v <> 'bad'"))
    VersionedTable.commitDelta(spark, dir2,
      Some(df("bad", 1, 70).coalesce(1)), Seq.empty, 0L, "w",
      expectations = Map("k_pos" -> "k >= 0"))
    val e1 = intercept[ExpectationViolation] {
      VersionedTable.fastForward(spark, dir2, "dev", "w", readsTable = false)
    }
    assert(e1.getMessage.contains("violate the branch's re-declared"))
    // direction 2: the branch's adds violate MAINLINE's new check
    val dir3 = tmp("ff2-declv2")
    VersionedTable.commit(spark, dir3, df("ok", 8), -1L, "w")
    VersionedTable.createBranch(spark, dir3, "dev")
    val ref3 = VersionedTable.branchRef(dir3, "dev")
    VersionedTable.commitDelta(spark, ref3,
      Some(spark.range(1).coalesce(1).select(lit(-5L).as("k"),
        lit("dev").as("v"))), Seq.empty, 0L, "wb",
      expectations = Map("no_bad" -> "v <> 'bad'"))
    VersionedTable.commitDelta(spark, dir3,
      Some(df("m", 1, 70).coalesce(1)), Seq.empty, 0L, "w",
      expectations = Map("k_pos" -> "k >= 0"))
    val e2 = intercept[ExpectationViolation] {
      VersionedTable.fastForward(spark, dir3, "dev", "w", readsTable = false)
    }
    assert(e2.getMessage.contains("violate mainline's re-declared"))
    // same-KEY two-sided change still refuses, naming the key
    val dir4 = tmp("ff2-declsame")
    VersionedTable.commit(spark, dir4, df("ok", 8), -1L, "w")
    VersionedTable.createBranch(spark, dir4, "dev")
    val ref4 = VersionedTable.branchRef(dir4, "dev")
    VersionedTable.commitDelta(spark, ref4,
      Some(df("dev", 1, 50).coalesce(1)), Seq.empty, 0L, "wb",
      expectations = Map("guard" -> "k < 1000"))
    VersionedTable.commitDelta(spark, dir4,
      Some(df("m", 1, 70).coalesce(1)), Seq.empty, 0L, "w",
      expectations = Map("guard" -> "k < 5000"))
    val e3 = intercept[CommitConflict] {
      VersionedTable.fastForward(spark, dir4, "dev", "w", readsTable = false)
    }
    assert(e3.getMessage.contains("same keys") &&
      e3.getMessage.contains("expect.guard"))
  }

  test("cross-dimension two-sided: branch appends a column while BOTH declare disjoint checks") {
    // the full r17 cell: schema two-sided is NOT in play (one-sided
    // branch append), declarations two-sided disjoint — both admits
    // compose in one landing
    val dir = tmp("ff2-cross")
    VersionedTable.commit(spark, dir, df("ok", 6), -1L, "w")
    VersionedTable.createBranch(spark, dir, "dev")
    val ref = VersionedTable.branchRef(dir, "dev")
    VersionedTable.addColumns(spark, ref, Seq(
      org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.DoubleType, nullable = true)), 0L, "wb")
    VersionedTable.commitDelta(spark, ref,
      Some(spark.range(1).coalesce(1).select(lit(50L).as("k"),
        lit("dev").as("v"), lit(1.0).as("score"))), Seq.empty, 1L, "wb",
      expectations = Map("score_ok" -> "score IS NULL OR score >= 0"))
    VersionedTable.commitDelta(spark, dir,
      Some(df("m", 1, 70).coalesce(1)), Seq.empty, 0L, "w",
      expectations = Map("no_bad" -> "v <> 'bad'"))
    val landed = VersionedTable.fastForward(spark, dir, "dev", "w",
      readsTable = false).get
    val lm = VersionedTable.readManifest(spark, dir, landed)
    assert(lm.schema.get.fieldNames.toSeq == Seq("k", "v", "score"))
    val ex = VersionedTable.tableExpectations(spark, dir, landed)
    assert(ex.contains("score_ok") && ex.contains("no_bad"), s"$ex")
    assert(VersionedTable.read(spark, dir).count() == 8L)
  }

  test("convergent evolution: both sides append the SAME name at the SAME type — lands once") {
    // the general rule's 'carried' path: after mainline lands `score`
    // from another source, the branch's own `score` append (same
    // type) is convergent, not a clash — the landing carries ONE
    // score column and both sides' values
    val dir = tmp("ff2-conv")
    VersionedTable.commit(spark, dir, df("a", 6), -1L, "w")
    VersionedTable.createBranch(spark, dir, "dev")
    val ref = VersionedTable.branchRef(dir, "dev")
    VersionedTable.addColumns(spark, ref, Seq(
      org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.LongType, nullable = true)), 0L, "wb")
    VersionedTable.commitDelta(spark, ref,
      Some(spark.range(1).coalesce(1).select(lit(50L).as("k"),
        lit("d").as("v"), lit(7L).as("score"))), Seq.empty, 1L, "wb")
    // mainline appends region THEN the same score (different order —
    // name-based mapping, not positional)
    VersionedTable.addColumns(spark, dir, Seq(
      org.apache.spark.sql.types.StructField("region",
        org.apache.spark.sql.types.StringType, nullable = true),
      org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.LongType, nullable = true)), 0L, "w")
    VersionedTable.commitDelta(spark, dir,
      Some(spark.range(1).coalesce(1).select(lit(60L).as("k"),
        lit("m").as("v"), lit("eu").as("region"), lit(9L).as("score"))),
      Seq.empty, 1L, "w")
    val landed = VersionedTable.fastForward(spark, dir, "dev", "w",
      readsTable = false).get
    val sch = VersionedTable.readManifest(spark, dir, landed).schema.get
    assert(sch.fieldNames.toSeq == Seq("k", "v", "region", "score"),
      s"convergent column must land ONCE: ${sch.fieldNames.toSeq}")
    val out = VersionedTable.read(spark, dir)
    assert(out.where($"score".isNotNull).count() == 2L,
      "both sides' score values must survive in the one column")
    assert(out.where($"k" === 50L).select($"score").as[Long].head() == 7L)
    assert(out.where($"k" === 60L).select($"score").as[Long].head() == 9L)
  }

  test("disjoint declaration REMOVAL reconciles: branch clears its key while mainline adds another") {
    // changed-key semantics include removals: the branch clears an
    // expectation (empty-sql override) while mainline declares a NEW
    // one — disjoint keys, both changes land
    val dir = tmp("ff2-rm")
    VersionedTable.commit(spark, dir, df("ok", 6), -1L, "w",
      expectations = Map("old_guard" -> "k < 100000"))
    VersionedTable.createBranch(spark, dir, "dev")
    val ref = VersionedTable.branchRef(dir, "dev")
    VersionedTable.commitDelta(spark, ref,
      Some(df("d", 1, 50).coalesce(1)), Seq.empty, 0L, "wb",
      expectations = Map("old_guard" -> "")) // the documented clear
    VersionedTable.commitDelta(spark, dir,
      Some(df("m", 1, 70).coalesce(1)), Seq.empty, 0L, "w",
      expectations = Map("fresh" -> "v <> 'nope'"))
    val landed = VersionedTable.fastForward(spark, dir, "dev", "w",
      readsTable = false).get
    val ex = VersionedTable.tableExpectations(spark, dir, landed)
    assert(!ex.contains("old_guard"),
      s"the branch's removal must land: $ex")
    assert(ex.get("fresh").contains("v <> 'nope'"),
      s"mainline's new declaration must land: $ex")
  }

  // ───────── cherryPick: one-sided additive schema admit ─────────

  test("cherryPick lands a post-extension append under the UNION schema; migration picks refuse") {
    val dir = tmp("cp-add")
    VersionedTable.commit(spark, dir, df("a", 10), -1L, "w")
    VersionedTable.createBranch(spark, dir, "hotfix")
    val ref = VersionedTable.branchRef(dir, "hotfix")
    // branch: v1 = ADD COLUMNS score, v2 = append carrying it, v3 =
    // another append (stays unlanded)
    VersionedTable.addColumns(spark, ref, Seq(
      org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.DoubleType, nullable = true)), 0L, "wb")
    VersionedTable.commitDelta(spark, ref,
      Some(spark.range(100, 102).coalesce(1).select($"id".as("k"),
        lit("fix").as("v"), lit(3.5).as("score"))), Seq.empty, 1L, "wb")
    VersionedTable.commitDelta(spark, ref,
      Some(spark.range(200, 201).coalesce(1).select($"id".as("k"),
        lit("later").as("v"), lit(9.9).as("score"))), Seq.empty, 2L, "wb")
    // picking the MIGRATION commit itself refuses (a pick is a delta)
    val eMig = intercept[IllegalArgumentException] {
      VersionedTable.cherryPick(spark, dir, "hotfix", 1L, "w")
    }
    assert(eMig.getMessage.contains("schema migrations land via fastForward"))
    // picking v2 lands under the union schema; mainline files null-fill
    val v = VersionedTable.cherryPick(spark, dir, "hotfix", 2L, "w")
    val lm = VersionedTable.readManifest(spark, dir, v)
    assert(lm.schema.get.fieldNames.toSeq == Seq("k", "v", "score"))
    assert(lm.schema.get.fields.last.nullable)
    val out = VersionedTable.read(spark, dir)
    assert(out.count() == 12L)
    assert(out.where($"score".isNotNull).count() == 2L)
    assert(out.where($"v" === "later").isEmpty, "v3 must stay unlanded")
    // a SECOND pick after the extension landed: shapes now equal, the
    // plain path carries the column through
    val v2 = VersionedTable.cherryPick(spark, dir, "hotfix", 3L, "w")
    assert(VersionedTable.readManifest(spark, dir, v2)
      .schema.get.fieldNames.toSeq == Seq("k", "v", "score"))
    assert(VersionedTable.read(spark, dir).where($"v" === "later")
      .count() == 1L)
  }

  test("cherryPick refuses a re-declaring commit and a delta built on unlanded branch work") {
    val dir = tmp("cp-ref")
    VersionedTable.commit(spark, dir, df("a", 10), -1L, "w",
      statsCols = Some(Seq("k")))
    VersionedTable.createBranch(spark, dir, "dev")
    val ref = VersionedTable.branchRef(dir, "dev")
    // v1 re-declares an expectation alongside rows → pick refuses
    VersionedTable.commitDelta(spark, ref,
      Some(df("d", 1, 50).coalesce(1)), Seq.empty, 0L, "wb",
      expectations = Map("k_pos" -> "k >= 0"))
    val eDecl = intercept[IllegalArgumentException] {
      VersionedTable.cherryPick(spark, dir, "dev", 1L, "w")
    }
    assert(eDecl.getMessage.contains("re-declared"))
    // v2 appends (unlanded), v3 rewrites v2's file via a keyed merge →
    // picking v3 alone depends on v2's file and must stay loud
    VersionedTable.commitDelta(spark, ref,
      Some(df("d2", 2, 60).coalesce(1)), Seq.empty, 1L, "wb")
    VersionedTable.merge(spark, ref,
      spark.range(1).coalesce(1).select(lit(60L).as("k"),
        lit("d2x").as("v")), Seq("k"), 2L, "wb")
    val eDep = intercept[IllegalArgumentException] {
      VersionedTable.cherryPick(spark, dir, "dev", 3L, "w")
    }
    assert(eDep.getMessage.contains("unlanded branch work"))
    // a schema DIVERGENCE the admit cannot express: mainline extended,
    // branch did not → refuses toward fastForward
    VersionedTable.addColumns(spark, dir, Seq(
      org.apache.spark.sql.types.StructField("extra",
        org.apache.spark.sql.types.LongType, nullable = true)), 0L, "w")
    val eDiv = intercept[IllegalArgumentException] {
      VersionedTable.cherryPick(spark, dir, "dev", 2L, "w")
    }
    assert(eDiv.getMessage.contains("diverged beyond a branch-side"))
  }

  test("two-sided disjoint append on a PREVIOUSLY-RENAMED table: colmap rides, physical shadowing refuses") {
    // the rename happened BEFORE the fork, so both sides share the
    // colmap (label -> physical v) — the reconciliation must carry it
    // through the union landing, and reads must keep resolving the
    // renamed column by its physical name on both sides' files
    val dir = tmp("ff2-ren")
    VersionedTable.commit(spark, dir, df("a", 6), -1L, "w")
    VersionedTable.renameColumns(spark, dir, Map("v" -> "label"), 0L, "w")
    VersionedTable.createBranch(spark, dir, "dev")
    val ref = VersionedTable.branchRef(dir, "dev")
    VersionedTable.addColumns(spark, ref, Seq(
      org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.DoubleType, nullable = true)),
      VersionedTable.latestVersion(spark, ref), "wb")
    VersionedTable.commitDelta(spark, ref,
      Some(spark.range(1).coalesce(1).select(lit(50L).as("k"),
        lit("d").as("label"), lit(1.5).as("score"))), Seq.empty,
      VersionedTable.latestVersion(spark, ref), "wb")
    VersionedTable.addColumns(spark, dir, Seq(
      org.apache.spark.sql.types.StructField("region",
        org.apache.spark.sql.types.StringType, nullable = true)),
      VersionedTable.latestVersion(spark, dir), "w")
    VersionedTable.commitDelta(spark, dir,
      Some(spark.range(1).coalesce(1).select(lit(60L).as("k"),
        lit("m").as("label"), lit("eu").as("region"))), Seq.empty,
      VersionedTable.latestVersion(spark, dir), "w")
    val landed = VersionedTable.fastForward(spark, dir, "dev", "w",
      readsTable = false).get
    val lm = VersionedTable.readManifest(spark, dir, landed)
    assert(lm.schema.get.fieldNames.toSeq ==
      Seq("k", "label", "region", "score"))
    assert(lm.colmap.get("label").contains("v"),
      s"the pre-fork rename's mapping must ride the landing: ${lm.colmap}")
    val out = VersionedTable.read(spark, dir)
    assert(out.where($"label" === "d").select($"score").as[Double]
      .head() == 1.5, "the branch row must resolve through the colmap")
    assert(out.where($"label" === "m").select($"region").as[String]
      .head() == "eu")
    assert(out.where($"label" === "a").count() == 6L)
    // a branch-side column named like a DROPPED column's physical
    // tombstone is refused at EVERY write door — even the
    // allowSchemaChange commitDelta escape hatch — which is what makes
    // the landing-side takenPhys guard in fastForward/cherryPick a
    // pure belt: no public write path can produce the shadowed state.
    // Pin the door here so a future relaxation of the write guard
    // would surface as this test failing, not as silent reliance on
    // the belt.
    val dir2 = tmp("ff2-ren2")
    VersionedTable.commit(spark, dir2,
      spark.range(4).select($"id".as("k"), lit("a").as("v"),
        lit(1L).as("extra")), -1L, "w")
    VersionedTable.dropColumns(spark, dir2, Seq("extra"), 0L, "w")
    VersionedTable.createBranch(spark, dir2, "dev")
    val ref2 = VersionedTable.branchRef(dir2, "dev")
    val e = intercept[IllegalArgumentException] {
      VersionedTable.commitDelta(spark, ref2,
        Some(spark.range(1).coalesce(1).select(lit(50L).as("k"),
          lit("d").as("v"), lit(9L).as("extra"))), Seq.empty,
        VersionedTable.latestVersion(spark, ref2), "wb",
        allowSchemaChange = true)
    }
    assert(e.getMessage.contains("DROPPED column's physical name"),
      s"the write door must refuse tombstone reuse: ${e.getMessage}")
  }

  test("two-sided disjoint landing on a FEED-declared table: the CDF replays the net effect") {
    // change-feed x reconciliation: the landing's feed must carry
    // exactly the branch's net adds under the UNION schema, and a
    // cursor consumer replaying the whole history must converge to
    // the landed table
    val dir = tmp("ff2-feed")
    VersionedTable.commit(spark, dir, df("a", 8), -1L, "w",
      meta = Map(VersionedTable.FeedKey -> "k"))
    VersionedTable.createBranch(spark, dir, "dev")
    val ref = VersionedTable.branchRef(dir, "dev")
    VersionedTable.addColumns(spark, ref, Seq(
      org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.DoubleType, nullable = true)), 0L, "wb")
    VersionedTable.commitDelta(spark, ref,
      Some(spark.range(2).coalesce(1).select(($"id" + 100L).as("k"),
        lit("dev").as("v"), lit(0.5).as("score"))), Seq.empty, 1L, "wb")
    VersionedTable.addColumns(spark, dir, Seq(
      org.apache.spark.sql.types.StructField("region",
        org.apache.spark.sql.types.StringType, nullable = true)), 0L, "w")
    VersionedTable.commitDelta(spark, dir,
      Some(spark.range(1).coalesce(1).select(lit(200L).as("k"),
        lit("m").as("v"), lit("eu").as("region"))), Seq.empty, 1L, "w")
    val landed = VersionedTable.fastForward(spark, dir, "dev", "w",
      readsTable = false).get
    // the landing's persisted feed: exactly the branch's adds, as
    // inserts
    val feed = spark.read.parquet(s"$dir/_changes/v$landed")
    assert(feed.select($"op").distinct().as[String].collect().toSeq ==
      Seq("insert"), "a landing of pure adds must feed only inserts")
    assert(feed.select($"k").as[Long].collect().toSet == Set(100L, 101L))
    // the change feed ACROSS the landing (v0 -> landed) carries both
    // sides' adds — the old side padded across the union migration
    val replayed = VersionedTable.changesBetween(spark, dir, 0L, landed,
      Seq("k"))
    assert(replayed.where($"op" === "insert").count() == 3L &&
      replayed.where($"op" =!= "insert").isEmpty,
      "the cross-landing diff must be exactly the 3 added rows")
    assert(replayed.where($"k" === 100L).select($"score").as[Double]
      .head() == 0.5, "the branch row's new-column value must ride the diff")
  }

  test("FAST FORWARD … CONTENT LOCAL grammar: exact keyword or refuse; attestation changes the gate") {
    import graft.core.GraftSession
    val dir = tmp("sql-ffcl")
    VersionedTable.commit(spark, dir, df("a", 8), -1L, "w")
    val gs = new GraftSession(spark)
    gs.registerVersioned("t", dir)
    gs.runScript(
      """CREATE BRANCH dev ON t AS tdev;
        |INSERT INTO tdev SELECT k + 100, 'b' FROM tdev WHERE k < 2;
        |INSERT INTO t SELECT k + 200, 'm' FROM t WHERE k < 2""".stripMargin)
    // partial/typo keywords refuse with the grammar, landing nothing
    Seq("FAST FORWARD t FROM dev CONTENT",
        "FAST FORWARD t FROM dev LOCAL",
        "FAST FORWARD t FROM dev CONTENTLOCAL").foreach { stmt =>
      val e = intercept[IllegalArgumentException] { gs.sql(stmt) }
      assert(e.getMessage.contains("[CONTENT LOCAL]"), s"$stmt: $e")
    }
    // un-attested: mainline appended → conservative refusal
    intercept[VersionedTable.CommitConflict] {
      gs.sql("FAST FORWARD t FROM dev")
    }
    // attested: lands; both sides' rows visible
    gs.sql("FAST FORWARD t FROM dev CONTENT LOCAL")
    assert(rows(VersionedTable.read(spark, dir)).size == 12)
  }

  test("additive-schema rebase: blind deltas and deletes race an addColumns migration without re-staging") {
    // the migration-racing-appenders case: a writer plans against v0,
    // an addColumns lands first; the writer's rebase ADOPTS the
    // extended schema instead of refusing (or worse, regressing it) —
    // its staged files null-fill the new column
    val dir = tmp("arb")
    VersionedTable.commit(spark, dir, df("a", 10), -1L, "w",
      statsCols = Some(Seq("k")))
    VersionedTable.addColumns(spark, dir, Seq(
      org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.DoubleType, nullable = true)), 0L, "mig")
    // blind append planned against the SUPERSEDED v0
    val st = VersionedTable.commitDelta(spark, dir,
      Some(df("late", 2, 50).coalesce(1)), Seq.empty, 0L, "w2",
      rebaseAttempts = 1)
    assert(st.version == 2L)
    val lm = VersionedTable.readManifest(spark, dir, 2L)
    assert(lm.schema.get.fieldNames.toSeq == Seq("k", "v", "score"),
      s"the rebase must ADOPT the winner's extension: " +
        s"${lm.schema.get.fieldNames.toSeq}")
    val out = VersionedTable.read(spark, dir)
    assert(out.count() == 12L)
    assert(out.where($"score".isNotNull).isEmpty, "null-fill everywhere")
    // a keyed MERGE with rebaseAttempts re-plans at the ADOPTED tip,
    // so its changes must carry the current (extended) schema — the
    // stale-shaped changes refuse with the schema contract, and the
    // conforming merge lands without regressing the extension
    intercept[IllegalArgumentException] {
      VersionedTable.merge(spark, dir,
        spark.range(1).coalesce(1).select(lit(3L).as("k"),
          lit("upd").as("v")), Seq("k"), 1L, "w3", rebaseAttempts = 2)
    }
    VersionedTable.merge(spark, dir,
      spark.range(1).coalesce(1).select(lit(3L).as("k"),
        lit("upd").as("v"), lit(1.0).as("score")), Seq("k"),
      1L, "w3", rebaseAttempts = 2)
    assert(VersionedTable.read(spark, dir)
      .where($"v" === "upd").count() == 1L)
    assert(VersionedTable.readManifest(spark, dir,
      VersionedTable.latestVersion(spark, dir))
      .schema.get.fieldNames.length == 3, "merge must not regress it")
    // a DV delete planned against the superseded version also rides
    val dir2 = tmp("arb2")
    VersionedTable.commit(spark, dir2, df("a", 10), -1L, "w",
      statsCols = Some(Seq("k")))
    VersionedTable.addColumns(spark, dir2, Seq(
      org.apache.spark.sql.types.StructField("tag",
        org.apache.spark.sql.types.StringType, nullable = true)), 0L, "mig")
    val ds = VersionedTable.deleteWhere(spark, dir2, "k = 4", 0L, "gdpr",
      rebaseAttempts = 1)
    assert(ds.version == 2L && ds.rowsDeleted == 1L)
    assert(VersionedTable.readManifest(spark, dir2, 2L)
      .schema.get.fieldNames.toSeq == Seq("k", "v", "tag"),
      "the delete landing must adopt the extension, not regress it")
    assert(VersionedTable.read(spark, dir2).count() == 9L)
    // refusals survive: a RENAME winner still refuses the rebase, and
    // a staged schema WIDER than the parent still needs
    // allowSchemaChange
    val dir3 = tmp("arb3")
    VersionedTable.commit(spark, dir3, df("a", 6), -1L, "w")
    VersionedTable.renameColumns(spark, dir3, Map("v" -> "label"), 0L, "mig")
    intercept[VersionedTable.CommitConflict] {
      VersionedTable.commitDelta(spark, dir3,
        Some(df("late", 1, 50).coalesce(1)), Seq.empty, 0L, "w2",
        rebaseAttempts = 1)
    }
    val dir4 = tmp("arb4")
    VersionedTable.commit(spark, dir4, df("a", 6), -1L, "w")
    intercept[IllegalArgumentException] {
      VersionedTable.commitDelta(spark, dir4,
        Some(spark.range(1).coalesce(1).select(lit(50L).as("k"),
          lit("x").as("v"), lit(1.0).as("extra"))), Seq.empty, 0L, "w2",
        rebaseAttempts = 1)
    }
  }

  test("additive rebase on a FEED-declared table: the rebased commit's feed and CDF stay exact") {
    val dir = tmp("arb-feed")
    VersionedTable.commit(spark, dir, df("a", 8), -1L, "w",
      meta = Map(VersionedTable.FeedKey -> "k"))
    VersionedTable.addColumns(spark, dir, Seq(
      org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.DoubleType, nullable = true)), 0L, "mig")
    val st = VersionedTable.commitDelta(spark, dir,
      Some(df("late", 2, 100).coalesce(1)), Seq.empty, 0L, "w2",
      rebaseAttempts = 1)
    assert(st.version == 2L)
    // the rebased commit's persisted feed: exactly its own adds
    val feed = spark.read.parquet(s"$dir/_changes/v2")
    assert(feed.select($"op").distinct().as[String].collect().toSeq ==
      Seq("insert"))
    assert(feed.select($"k").as[Long].collect().toSet == Set(100L, 101L))
    // the CDF across migration + rebased append: the old side pads,
    // the diff is exactly the 2 appended rows with score null
    val d = VersionedTable.changesBetween(spark, dir, 0L, 2L, Seq("k"))
    assert(d.where($"op" === "insert").count() == 2L &&
      d.where($"op" =!= "insert").isEmpty)
    assert(d.where($"score".isNotNull).isEmpty)
  }

  // ───────── weight-bounded version-listing cache ─────────

  test("listing cache evicts by total WEIGHT and never caches oversized version lists") {
    spark.conf.set("graft.manifest.cache.graceMs", "0") // cache eagerly
    val oldBudget = VersionedTable.listingCache.budget
    try {
      // five tables, 3 versions each — every listing weighs the
      // 32-unit constant FLOOR (round 18, the r17 advice: fixed
      // per-entry overhead is charged even for tiny listings). Budget
      // 128 holds exactly 4 floor-weight entries, so 5 offered
      // listings must evict down.
      VersionedTable.listingCache.clear()
      VersionedTable.listingCache.budget = 128L
      val dirs = (1 to 5).map { i =>
        val d = tmp(s"lw-$i")
        VersionedTable.commit(spark, d, df("a", 2), -1L, s"w$i")
        VersionedTable.commit(spark, d, df("b", 2), 0L, s"w$i")
        VersionedTable.commit(spark, d, df("c", 2), 1L, s"w$i")
        d
      }
      dirs.foreach(d =>
        assert(VersionedTable.versions(spark, d) == Seq(0L, 1L, 2L)))
      val w = VersionedTable.listingCache.weightNow
      assert(w > 0L && w <= 128L,
        s"5 floor-weight listings must evict down to the budget: $w")
      assert(VersionedTable.listingCache.entriesNow <= 4,
        "the floor bounds the entry count too")
      // evicted listings still answer correctly (re-listed on miss)
      dirs.foreach(d =>
        assert(VersionedTable.versions(spark, d) == Seq(0L, 1L, 2L)))
      // the per-entry cap: with budget 64 the cap is 16 < the 32
      // floor, so NO listing is ever cached — weight must stay zero
      VersionedTable.listingCache.clear()
      VersionedTable.listingCache.budget = 64L
      val d4 = tmp("lw-big")
      VersionedTable.commit(spark, d4, df("a", 2), -1L, "w")
      VersionedTable.commit(spark, d4, df("b", 2), 0L, "w")
      VersionedTable.commit(spark, d4, df("c", 2), 1L, "w")
      assert(VersionedTable.versions(spark, d4) == Seq(0L, 1L, 2L))
      assert(VersionedTable.listingCache.weightNow == 0L,
        "an over-cap listing must never be cached")
      // and a SMALL listing still caches once the cap clears the floor
      VersionedTable.listingCache.budget = 128L
      val d5 = tmp("lw-small")
      VersionedTable.commit(spark, d5, df("a", 2), -1L, "w")
      val before = VersionedTable.listingCache.entriesNow
      assert(VersionedTable.versions(spark, d5) == Seq(0L))
      assert(VersionedTable.listingCache.entriesNow >= before,
        "an in-cap listing should still be cacheable")
    } finally {
      VersionedTable.listingCache.budget = oldBudget
      spark.conf.unset("graft.manifest.cache.graceMs")
    }
  }

  // ───────── SQL CHERRY PICK n..m ─────────

  test("SQL CHERRY PICK n..m lands the range in order; mid-range refusal keeps prior picks") {
    import graft.core.GraftSession
    val dir = tmp("sql-range")
    VersionedTable.commit(spark, dir, df("a", 10), -1L, "w")
    val gs = new GraftSession(spark)
    gs.registerVersioned("t", dir)
    gs.runScript(
      """CREATE BRANCH fixes ON t AS tdev;
        |INSERT INTO tdev SELECT k + 100, 'p1' FROM tdev WHERE k < 2;
        |INSERT INTO tdev SELECT k + 200, 'p2' FROM tdev WHERE k < 2;
        |INSERT INTO tdev SELECT k + 300, 'p3' FROM tdev WHERE k < 2""".stripMargin)
    val r = gs.sql("CHERRY PICK 1..3 FROM fixes ON t").head()
    assert(r.getString(0) == "cherry_pick" && r.getLong(2) == 3L &&
      r.getLong(3) == 3L, s"range receipt: $r")
    val got = rows(VersionedTable.read(spark, dir))
    assert(Seq("p1", "p2", "p3").forall(p => got.count(_._2 == p) == 2))
    // grammar: inverted range refuses without landing anything
    val e0 = intercept[IllegalArgumentException] {
      gs.sql("CHERRY PICK 3..1 FROM fixes ON t")
    }
    assert(e0.getMessage.contains("n <= m"))
    // mid-range refusal with the partial-landing contract: v4 = a
    // clean append, v5 = a RE-DECLARING commit (a pick is a delta —
    // refuses), v6 = another clean append. The range lands v4, stops
    // at v5 naming the resume point, and never reaches v6.
    gs.sql("INSERT INTO tdev SELECT k + 400, 'p4' FROM tdev WHERE k < 2")
    // v5/v6 go through the table layer directly (a re-declaring commit
    // has no INSERT spelling); the tdev alias is left stale, unused
    val ref = VersionedTable.branchRef(dir, "fixes")
    VersionedTable.commitDelta(spark, ref,
      Some(df("p5", 2, 500).coalesce(1)), Seq.empty,
      VersionedTable.latestVersion(spark, ref), "wb",
      expectations = Map("k_pos" -> "k >= 0"))
    VersionedTable.commitDelta(spark, ref,
      Some(df("p6", 2, 600).coalesce(1)), Seq.empty,
      VersionedTable.latestVersion(spark, ref), "wb")
    val e1 = intercept[IllegalArgumentException] {
      gs.sql("CHERRY PICK 4..6 FROM fixes ON t") // v4 lands, v5 refuses
    }
    assert(e1.getMessage.contains("picks 4..4 landed") &&
      e1.getMessage.contains("resume with CHERRY PICK 5..6"),
      s"partial-landing message: ${e1.getMessage}")
    // the prior pick stayed landed (the documented contract)
    val got2 = rows(VersionedTable.read(spark, dir))
    assert(got2.count(_._2 == "p4") == 2, "the landed prefix must stay")
    assert(got2.count(_._2 == "p5") == 0 && got2.count(_._2 == "p6") == 0,
      "nothing at or past the refusal may land")
  }
}
