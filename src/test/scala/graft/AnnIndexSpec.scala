package graft

import org.apache.spark.sql.functions._
import graft.operators.{AnnIndex, Similarity}

/** Persisted IVF-PQ indexes (operators/AnnIndex.scala): serve ==
  * in-memory equivalence, the save→load→save fixpoint, and the
  * torn/foreign-index refusals. */
class AnnIndexSpec extends SparkSpec {
  import spark.implicits._

  // small deterministic embedding fixture: 40 vectors in R^4, two
  // obvious clusters plus per-id jitter so top-k is unambiguous
  private lazy val emb = spark.range(40).select(
    $"id".as("vec_id"),
    array(
      (when($"id" % 2 === 0, 10.0).otherwise(-10.0) + $"id" * 0.01).cast("double"),
      ($"id" * 0.02).cast("double"),
      (when($"id" % 2 === 0, -1.0).otherwise(1.0)).cast("double"),
      lit(0.5).cast("double")).as("embedding"))

  private def fit() = {
    val cents = Similarity.centroidTable(emb, "vec_id", "embedding", 4)
    val pq = Similarity.pqTrain(emb, "embedding", m = 2, nCodes = 8, iters = 2)
    (cents, pq)
  }

  test("serve-from-disk equals the in-memory path, with and without refine") {
    val (cents, pq) = fit()
    val qs = emb.filter($"vec_id" % 10 === 0)
    val tmp = java.nio.file.Files.createTempDirectory("annidx").toString
    AnnIndex.save(spark, s"$tmp/idx", emb, "vec_id", "embedding", cents, pq)
    val loaded = AnnIndex.load(spark, s"$tmp/idx")
    assert(loaded.idCol == "vec_id" && loaded.dim == 4)
    for (refine <- Seq(0, 3)) {
      val inMem = Similarity.ivfPqTopK(emb, qs, "vec_id", "vec_id",
        "embedding", k = 3, cents, pq, nProbe = 2, refine = refine)
      val served = AnnIndex.topK(loaded, qs, "vec_id", "embedding", k = 3,
        nProbe = 2, refine = refine,
        exactCorpus = if (refine > 0) Some(emb) else None)
      assert(served.exceptAll(inMem).isEmpty && inMem.exceptAll(served).isEmpty,
        s"refine=$refine: served answer diverged from the in-memory path")
    }
  }

  test("cell-partitioned codes: identical serving, partition-pruned scans") {
    val (cents, pq) = fit()
    val qs = emb.filter($"vec_id" % 10 === 0)
    val tmp = java.nio.file.Files.createTempDirectory("annidx-cell").toString
    AnnIndex.save(spark, s"$tmp/flat", emb, "vec_id", "embedding", cents, pq)
    AnnIndex.save(spark, s"$tmp/cell", emb, "vec_id", "embedding", cents, pq,
      partitionCodesByCell = true)
    val flat = AnnIndex.load(spark, s"$tmp/flat")
    val celled = AnnIndex.load(spark, s"$tmp/cell")
    // a probe's cell filter reaches the scan as a PARTITION filter —
    // the serving scan reads only the probed cells' directories
    val plan = celled.codes.filter($"cell" === 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("\\s", "").contains("(cell"),
      s"cell filter must prune partitions:\n${plan.take(800)}")
    // layout is an execution detail: served answers are identical
    val a = AnnIndex.topK(flat, qs, "vec_id", "embedding", k = 3, nProbe = 2)
    val b = AnnIndex.topK(celled, qs, "vec_id", "embedding", k = 3, nProbe = 2)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("save -> load -> save is a fixpoint (models and codes byte-stable)") {
    val (cents, pq) = fit()
    val tmp = java.nio.file.Files.createTempDirectory("annidx-fix").toString
    AnnIndex.save(spark, s"$tmp/a", emb, "vec_id", "embedding", cents, pq)
    val l1 = AnnIndex.load(spark, s"$tmp/a")
    // re-save FROM the loaded model over the loaded artifacts' corpus
    val cents1 = l1.cents.zipWithIndex.map { case (cv, i) => (i.toLong, cv) }
      .toDF("cid", "cv")
    AnnIndex.save(spark, s"$tmp/b", emb, "vec_id", "embedding", cents1, l1.pq)
    val l2 = AnnIndex.load(spark, s"$tmp/b")
    assert(l2.cents == l1.cents, "centroids drifted across a save/load cycle")
    assert(l2.pq.subDim == l1.pq.subDim &&
      l2.pq.codes.map(_.map(_.toSeq).toSeq).toSeq ==
        l1.pq.codes.map(_.map(_.toSeq).toSeq).toSeq,
      "codebooks drifted across a save/load cycle")
    val c1 = spark.read.parquet(s"$tmp/a/codes")
    val c2 = spark.read.parquet(s"$tmp/b/codes")
    assert(c1.exceptAll(c2).isEmpty && c2.exceptAll(c1).isEmpty,
      "encoded corpus drifted across a save/load cycle")
  }

  test("serving plan scans the STORED codes — the corpus is never re-encoded") {
    val (cents, pq) = fit()
    val tmp = java.nio.file.Files.createTempDirectory("annidx-plan").toString
    AnnIndex.save(spark, s"$tmp/idx", emb, "vec_id", "embedding", cents, pq)
    val loaded = AnnIndex.load(spark, s"$tmp/idx")
    val plan = AnnIndex.topK(loaded, emb.limit(3), "vec_id", "embedding",
      k = 2, nProbe = 2).queryExecution.executedPlan.toString
    // the corpus side is a parquet scan of the persisted codes table...
    assert(plan.contains(s"$tmp/idx/codes"),
      s"serve must read the stored codes:\n${plan.take(600)}")
    // ...and the train/encode kernels appear NOWHERE in the serve plan
    // (query-side LUT/ADC kernels are expected; corpus-side encode is not)
    assert(!plan.toLowerCase.contains("pqencode"),
      "serving must not re-encode the corpus")
  }

  test("codes_delta union: load sees ingested rows; includeDeltas=false sees base only") {
    val (cents, pq) = fit()
    val base = emb.filter($"vec_id" < 30)
    val extra = emb.filter($"vec_id" >= 30)
    val tmp = java.nio.file.Files.createTempDirectory("annidx-delta").toString
    AnnIndex.save(spark, s"$tmp/idx", base, "vec_id", "embedding", cents, pq)
    // a delta batch as annIngestStream writes it (same frozen model)
    val flat = AnnIndex.load(spark, s"$tmp/idx")
    graft.operators.Similarity
      .ivfPqEncode(extra, "vec_id", "embedding", flat.cents, flat.pq)
      .write.parquet(s"$tmp/idx/codes_delta/batch=0")
    val withDelta = AnnIndex.load(spark, s"$tmp/idx")
    assert(withDelta.codes.count() == 40)
    assert(AnnIndex.load(spark, s"$tmp/idx", includeDeltas = false)
      .codes.count() == 30)
    // a delta-resident vector is findable by serving
    val q = extra.limit(1)
    val got = AnnIndex.topK(withDelta, emb.filter($"vec_id" === 0L),
      "vec_id", "embedding", k = 39, nProbe = 4)
    assert(got.count() == 39, "all base+delta rows minus self must score")
  }

  test("published generations: atomic publish, crashed-save isolation, retention") {
    val (cents, pq) = fit()
    val qs = emb.filter($"vec_id" % 10 === 0)
    val root = java.nio.file.Files.createTempDirectory("annidx-pub").toString + "/r"
    val g0 = AnnIndex.savePublished(spark, root, emb, "vec_id", "embedding",
      cents, pq)
    assert(g0 == 0L && AnnIndex.generations(spark, root) == Seq(0L))
    // load resolves the root to the active generation
    val l0 = AnnIndex.load(spark, root)
    val flat = java.nio.file.Files.createTempDirectory("annidx-flat").toString
    AnnIndex.save(spark, s"$flat/idx", emb, "vec_id", "embedding", cents, pq)
    val lf = AnnIndex.load(spark, s"$flat/idx")
    val a = AnnIndex.topK(l0, qs, "vec_id", "embedding", k = 3, nProbe = 2)
    val b = AnnIndex.topK(lf, qs, "vec_id", "embedding", k = 3, nProbe = 2)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "published and flat indexes must serve identically")
    // a crashed re-train: staged dir, NO pub file — the old generation
    // keeps serving, untouched
    emb.limit(3).write.parquet(s"$root/g1-crashed/garbage")
    assert(AnnIndex.activeDir(spark, root).endsWith("g0-trainer"))
    assert(AnnIndex.load(spark, root).codes.count() == 40)
    // a real second publication supersedes (generation numbers come
    // from PUB files — the crashed staging dir never claimed one);
    // retention floor holds
    val g2 = AnnIndex.savePublished(spark, root, emb.filter($"vec_id" < 20),
      "vec_id", "embedding", cents, pq)
    assert(g2 == 1L && AnnIndex.load(spark, root).codes.count() == 20)
    intercept[IllegalArgumentException] {
      AnnIndex.expireGenerations(spark, root, keep = 1)
    }
    assert(AnnIndex.expireGenerations(spark, root, keep = 2).isEmpty,
      "two published generations and keep=2: nothing to expire")
  }

  test("tombstones: deleted ids vanish from serving; compact folds them away") {
    val (cents, pq) = fit()
    val root = java.nio.file.Files.createTempDirectory("annidx-ts").toString + "/r"
    val base = emb.filter($"vec_id" < 30)
    val extra = emb.filter($"vec_id" >= 30)
    AnnIndex.savePublished(spark, root, base, "vec_id", "embedding", cents, pq)
    // a delta batch under the frozen model (as the ingest stream writes)
    val l0 = AnnIndex.load(spark, root)
    val active0 = AnnIndex.activeDir(spark, root)
    Similarity.ivfPqEncode(extra, "vec_id", "embedding", l0.cents, l0.pq)
      .write.parquet(s"$active0/codes_delta/batch=0")
    // delete ids straddling base (2, 4) and delta (30, 32)
    val n = AnnIndex.deleteIds(spark, root,
      Seq(2L, 4L, 30L, 32L).toDF("vec_id"))
    assert(n == 4L)
    val l1 = AnnIndex.load(spark, root)
    assert(l1.codes.count() == 36)
    assert(l1.codes.filter($"vec_id".isin(2L, 4L, 30L, 32L)).isEmpty,
      "tombstoned ids must not appear in the serving scan")
    val served1 = AnnIndex.topK(l1, emb.filter($"vec_id" === 0L),
      "vec_id", "embedding", k = 35, nProbe = 4)
    assert(served1.filter($"neighbor_id".isin(2L, 4L, 30L, 32L)).isEmpty)
    // compact: new generation, physically clean, same serving answer
    val g1 = AnnIndex.compact(spark, root)
    assert(g1 == 1L)
    val l2 = AnnIndex.load(spark, root)
    assert(l2.codes.count() == 36)
    val c1 = l1.codes.orderBy("vec_id").collect().toSeq
    val c2 = l2.codes.orderBy("vec_id").collect().toSeq
    assert(c1 == c2, "compacted codes must equal pre-compact serving codes")
    // the new generation has no tombstones and no live deltas
    val active1 = AnnIndex.activeDir(spark, root)
    assert(active1 != active0)
    assert(!new java.io.File(s"$active1/tombstones").exists())
    // a REPLAYED old ingest batch re-landing in the new generation is
    // inert: its dir name is in folded/, so load skips it
    Similarity.ivfPqEncode(extra, "vec_id", "embedding", l0.cents, l0.pq)
      .write.parquet(s"$active1/codes_delta/batch=0")
    assert(AnnIndex.load(spark, root).codes.count() == 36,
      "a folded batch replay must not double-serve its rows")
    // ...while a genuinely NEW batch serves (and un-deletes nothing)
    Similarity.ivfPqEncode(emb.filter($"vec_id" === 2L), "vec_id",
        "embedding", l0.cents, l0.pq)
      .write.parquet(s"$active1/codes_delta/batch=1")
    assert(AnnIndex.load(spark, root).codes.count() == 37)
    // serve-during-compact: the OLD loaded handle (resolved to g0)
    // still serves after compaction published g1
    assert(AnnIndex.topK(l1, emb.filter($"vec_id" === 0L), "vec_id",
      "embedding", k = 5, nProbe = 4).count() == 5)
    // compacting a FLAT index refuses (no atomic publish to ride)
    val e = intercept[IllegalArgumentException] {
      AnnIndex.compact(spark, active1)
    }
    assert(e.getMessage.contains("savePublished"))
  }

  test("retrain guard: a train-publication after model load refuses ingest") {
    val (cents, pq) = fit()
    val root = java.nio.file.Files.createTempDirectory("annidx-guard").toString + "/r"
    AnnIndex.savePublished(spark, root, emb, "vec_id", "embedding", cents, pq)
    val gen0 = AnnIndex.generations(spark, root).last
    AnnIndex.requireModelStable(spark, root, gen0) // fine: nothing newer
    AnnIndex.compact(spark, root)
    AnnIndex.requireModelStable(spark, root, gen0) // fine: compact is byte-stable
    AnnIndex.savePublished(spark, root, emb, "vec_id", "embedding", cents, pq)
    val e = intercept[IllegalArgumentException] {
      AnnIndex.requireModelStable(spark, root, gen0)
    }
    assert(e.getMessage.contains("retrained"))
  }

  test("refusals: manifest-less dir, future format version, refine without vectors") {
    val (cents, pq) = fit()
    val tmp = java.nio.file.Files.createTempDirectory("annidx-bad").toString
    // a save that "crashed" before the manifest commit marker
    intercept[IllegalArgumentException] {
      AnnIndex.load(spark, s"$tmp/nothing")
    }
    AnnIndex.save(spark, s"$tmp/idx", emb, "vec_id", "embedding", cents, pq)
    // future version refuses (forward compatibility is not faked)
    spark.read.parquet(s"$tmp/idx/manifest")
      .withColumn("format_version", lit(AnnIndex.FormatVersion + 1))
      .write.mode("overwrite").parquet(s"$tmp/idx2_manifest")
    // copy the rest of the index, swap manifests
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    org.apache.hadoop.fs.FileUtil.copy(fs, new org.apache.hadoop.fs.Path(s"$tmp/idx"),
      fs, new org.apache.hadoop.fs.Path(s"$tmp/idx2"), false,
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$tmp/idx2/manifest"), true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$tmp/idx2_manifest"),
      new org.apache.hadoop.fs.Path(s"$tmp/idx2/manifest"))
    val e = intercept[IllegalArgumentException] {
      AnnIndex.load(spark, s"$tmp/idx2")
    }
    assert(e.getMessage.contains("format_version"))
    // refine without the exact corpus must refuse, not fake with ADC
    val loaded = AnnIndex.load(spark, s"$tmp/idx")
    val err = intercept[IllegalArgumentException] {
      AnnIndex.topK(loaded, emb.limit(2), "vec_id", "embedding", k = 2,
        nProbe = 1, refine = 2, exactCorpus = None).collect()
    }
    assert(err.getMessage.contains("refine"))
  }
}
