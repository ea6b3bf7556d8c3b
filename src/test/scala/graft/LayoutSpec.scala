package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

/** Z-order layout (operators/Layout.scala): the bit permutation itself,
  * its failure modes, and the thing the layout exists for — measured
  * file-skipping on a box predicate, z-clustered vs linearly sorted. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def z(a: Long, b: Long): Long =
    Seq((a, b)).toDF("a", "b")
      .select(Layout.zValue2($"a", $"b")).as[Long].head()

  test("zValue2: hand-computed interleaves and boundary values") {
    assert(z(0L, 0L) == 0L)
    assert(z(1L, 0L) == 1L) // a takes bit 0
    assert(z(0L, 1L) == 2L) // b takes bit 1
    // a=3 -> bits {0,2}; b=5 -> bits {1,5}: 1+4+2+32
    assert(z(3L, 5L) == 39L)
    // full 32-bit a spreads onto all even positions
    assert(z(4294967295L, 0L) == 0x5555555555555555L)
    assert(z(0L, 4294967295L) == 0xAAAAAAAAAAAAAAAAL)
    // recursive quadrant structure: the high interleaved bits partition
    // the plane — everything below 2^16 x 2^16 sorts before any point
    // with a high bit set
    assert(z(65535L, 65535L) == 4294967295L)
    assert(z(65536L, 0L) == 4294967296L)
  }

  test("zValue3: hand-computed interleaves, boundaries, range guard") {
    def z3(a: Long, b: Long, c: Long): Long =
      Seq((a, b, c)).toDF("a", "b", "c")
        .select(Layout.zValue3($"a", $"b", $"c")).as[Long].head()
    assert(z3(0, 0, 0) == 0L)
    assert(z3(1, 0, 0) == 1L && z3(0, 1, 0) == 2L && z3(0, 0, 1) == 4L)
    assert(z3(1, 1, 1) == 7L)
    assert(z3(2, 0, 0) == 8L && z3(0, 2, 0) == 16L && z3(0, 0, 2) == 32L)
    assert(z3(3, 3, 3) == 63L)
    // top bit of each 21-bit key lands at positions 60/61/62
    assert(z3(1L << 20, 0, 0) == (1L << 60))
    assert(z3(0, 1L << 20, 0) == (1L << 61))
    assert(z3(0, 0, 1L << 20) == (1L << 62))
    val max = (1L << 21) - 1
    assert(z3(max, max, max) == (1L << 63) - 1,
      "all-ones keys fill all 63 bits")
    // adjacent-in-a rows differ only in the a-lane
    assert((z3(5, 9, 2) ^ z3(4, 9, 2)) % 8 != 0)
    val e = intercept[Exception] {
      z3(1L << 21, 0, 0)
    }
    assert(e.getMessage.contains("out of [0, 2^21)"))
  }

  test("zValue2: out-of-range inputs fail loudly, not by silent masking") {
    intercept[Exception] { z(-1L, 0L) }
    intercept[Exception] { z(0L, 4294967296L) }
  }

  test("zorder layout: a box on the NON-leading dimension skips files; linear cannot") {
    val li = tables.lineitem.select($"l_orderkey", $"l_partkey", $"l_extendedprice")
    val nFiles = 16
    val zDir = java.nio.file.Files.createTempDirectory("graft_zorder_").toString
    val linDir = java.nio.file.Files.createTempDirectory("graft_linear_").toString
    // normalized: orderkey spans ~13 bits, partkey ~8 — raw interleave
    // would let orderkey dominate the prefix (that asymmetry is exactly
    // why the normalized variant exists)
    Layout.zorderWriteNormalized(li, "l_orderkey", "l_partkey", zDir, nFiles)
    li.repartitionByRange(nFiles, $"l_orderkey").sortWithinPartitions($"l_orderkey")
      .write.mode("overwrite").parquet(linDir)

    // both rewrites preserve the data exactly
    val src = li.agg(count(lit(1)), sum($"l_orderkey"), sum($"l_partkey")).head()
    Seq(zDir, linDir).foreach { d =>
      val got = spark.read.parquet(d)
        .agg(count(lit(1)), sum($"l_orderkey"), sum($"l_partkey")).head()
      assert(got == src, s"rewrite at $d must be lossless")
    }

    val zEnv = Layout.fileEnvelopes(spark, zDir, "l_orderkey", "l_partkey").cache()
    val linEnv = Layout.fileEnvelopes(spark, linDir, "l_orderkey", "l_partkey").cache()
    assert(zEnv.count() == nFiles && linEnv.count() == nFiles)

    val (okLo, okHi) = {
      val r = li.agg(min($"l_orderkey"), max($"l_orderkey")).as[(Long, Long)].head()
      (r._1, r._2)
    }
    val (pkLo, pkHi) = {
      val r = li.agg(min($"l_partkey"), max($"l_partkey")).as[(Long, Long)].head()
      (r._1, r._2)
    }
    // ~10% box on partkey ONLY (full orderkey range): linear layout has
    // every partkey in every file -> reads all 16; z-order must skip
    val pkW = math.max(1L, (pkHi - pkLo) / 10)
    val zTouch = Layout.filesTouched(zEnv, okLo, okHi, pkLo, pkLo + pkW)
    val linTouch = Layout.filesTouched(linEnv, okLo, okHi, pkLo, pkLo + pkW)
    assert(linTouch == nFiles, s"linear layout cannot prune on partkey ($linTouch)")
    assert(zTouch <= nFiles / 2,
      s"z-order must skip at least half the files on a 10% partkey box (touched $zTouch)")
    // ~10% box on orderkey only: linear is near-perfect; z-order still
    // skips (rectangles bound orderkey too)
    val okW = math.max(1L, (okHi - okLo) / 10)
    val zTouchA = Layout.filesTouched(zEnv, okLo, okLo + okW, pkLo, pkHi)
    val linTouchA = Layout.filesTouched(linEnv, okLo, okLo + okW, pkLo, pkHi)
    assert(linTouchA <= 3, s"linear prunes its own sort key ($linTouchA)")
    assert(zTouchA < nFiles, s"z-order bounds the leading dim too ($zTouchA)")
    zEnv.unpersist(); linEnv.unpersist()
  }

  test("zorderWrite3: a box on the LAST dimension skips files; linear cannot") {
    import org.apache.spark.sql.functions._
    // uniform 32x32x32 grid
    val grid = spark.range(32768).select(
      (col("id") % 32).as("x"),
      ((col("id") / 32) % 32).as("y"),
      ((col("id") / 1024) % 32).as("z"))
    val nFiles = 16
    val zDir = java.nio.file.Files.createTempDirectory("graft_z3_").toString
    val linDir = java.nio.file.Files.createTempDirectory("graft_z3lin_").toString
    Layout.zorderWrite3(grid, "x", "y", "z", zDir, nFiles)
    grid.repartitionByRange(nFiles, $"x").sortWithinPartitions($"x")
      .write.mode("overwrite").parquet(linDir)
    def touched(dir: String, zLo: Long, zHi: Long): Long =
      spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min($"z").as("zmin"), max($"z").as("zmax"))
        .filter($"zmax" >= zLo && $"zmin" <= zHi).count()
    // ~12% box on z ONLY: linear (sorted by x) has every z everywhere
    val zT = touched(zDir, 0, 3); val linT = touched(linDir, 0, 3)
    assert(linT == nFiles, s"linear layout cannot prune on z ($linT)")
    assert(zT <= nFiles / 2,
      s"3-D z-order must skip at least half the files on a z box (touched $zT)")
    // losslessness
    val src = grid.agg(count(lit(1)), sum($"x"), sum($"y"), sum($"z")).head()
    assert(spark.read.parquet(zDir)
      .agg(count(lit(1)), sum($"x"), sum($"y"), sum($"z")).head() == src)
  }

  test("compact: bins respect the target, one file per bin, content lossless") {
    val docs = tables.documents
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact_").toString
    val frag = s"$tmp/frag"; val opt = s"$tmp/opt"
    docs.repartition(32).write.mode("overwrite").parquet(frag)
    val inFiles = new java.io.File(frag).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    val target = 128L * 1024
    val receipt = Layout.compact(spark, frag, opt, target)
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    // plan receipts: bins cover every input file; within-target unless
    // a singleton oversized file owns the bin
    assert(receipt.map(_._2).sum == inFiles.length)
    receipt.foreach { case (bin, nFiles, bytes) =>
      assert(bytes <= target || nFiles == 1,
        s"bin $bin over target with $nFiles files ($bytes bytes)")
    }
    // fewer files than before (that's the point) — and plain files at
    // the root: the rewrite is schema-preserving, no partition dirs
    val outFiles = new java.io.File(opt).listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(outFiles == receipt.length && outFiles < inFiles.length)
    assert(new java.io.File(opt).listFiles().forall(!_.isDirectory),
      "compacted output must not contain partition directories")
    // lossless: exact multiset equality both ways, schema unchanged
    val back = spark.read.parquet(opt)
    assert(back.schema == spark.read.parquet(frag).schema,
      "compaction must preserve the read-back schema exactly")
    assert(back.select(docs.columns.map(col).toSeq: _*).exceptAll(docs).isEmpty &&
      docs.exceptAll(back.select(docs.columns.map(col).toSeq: _*)).isEmpty,
      "compaction must preserve the exact row multiset")
  }

  test("compact sortWithin: clustering key order survives inside each output file") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact_sort_").toString
    val frag = s"$tmp/frag"; val opt = s"$tmp/opt"
    tables.documents.repartition(16).write.mode("overwrite").parquet(frag)
    Layout.compact(spark, frag, opt, targetBytes = 128L * 1024,
      sortWithin = Some("doc_id"))
    val binFiles = new java.io.File(opt).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(binFiles.nonEmpty)
    binFiles.foreach { f =>
      val ids = spark.read.parquet(f.toString).select($"doc_id")
        .as[Long].collect()
      assert(ids.sameElements(ids.sorted),
        s"bin ${f.getName} must keep doc_id order inside its file")
    }
  }

  test("compact: an oversized file gets its own bin rather than splitting") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact_big_").toString
    val frag = s"$tmp/frag"; val opt = s"$tmp/opt"
    // one big file (single partition) + several tiny ones
    val big = (1L to 20000L).map(i => (i, s"payload_$i" * 8)).toDF("id", "s")
    val small = (20001L to 20040L).map(i => (i, s"p$i")).toDF("id", "s")
    big.coalesce(1).write.mode("overwrite").parquet(frag)
    small.repartition(8).write.mode("append").parquet(frag)
    val sizes = new java.io.File(frag).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).map(_.length)
    val target = sizes.max / 2 // strictly smaller than the big file
    val receipt = Layout.compact(spark, frag, opt, target)
      .as[(Int, Long, Long)].collect()
    val overs = receipt.filter(_._3 > target)
    assert(overs.nonEmpty && overs.forall(_._2 == 1),
      "every over-target bin must be a single unsplittable file")
    val back = spark.read.parquet(opt).select($"id", $"s")
    val all = big.unionByName(small)
    assert(back.exceptAll(all).isEmpty && all.exceptAll(back).isEmpty)
  }
}
