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
