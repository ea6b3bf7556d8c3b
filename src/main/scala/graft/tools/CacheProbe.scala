package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.VersionedTable

/** Attribution probe for the manifest cache (round 15, VERDICT r14
  * #2): times the SAME micro-batch-shaped commit loop — N keyed
  * merges on a feed-declared clustered table, the q235 commit path —
  * with the cache OFF and then ON, in ONE process under identical
  * load, so the receipt is an A/B, not a cross-run loadavg guess.
  * The cache-off leg runs FIRST, so JIT warm-up favors neither...
  * actually it favors the ON leg; the B-then-A order flag flips it
  * (`SPARK_GRAFT_PROBE_ORDER=on_first`) — run both orders, quote the
  * worse-for-ON pair.
  *
  * Usage: `sbt "runMain graft.tools.CacheProbe [nCommits]"`.
  */
object CacheProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(40)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def leg(cache: Boolean): Double = {
      val dir = java.nio.file.Files
        .createTempDirectory(s"cacheprobe_$cache").toString + "/t"
      spark.conf.set("graft.manifest.cache", cache.toString)
      VersionedTable.commit(spark, dir,
        spark.range(200000).select($"id".as("k"), ($"id" % 97).as("w")),
        -1L, "loader", clusterBy = Seq("k"), clusterFiles = 16,
        meta = Map(VersionedTable.FeedKey -> "k"))
      val t0 = System.nanoTime()
      (1 to n).foreach { i =>
        VersionedTable.merge(spark,
          dir, Seq((i * 17L, -1L)).toDF("k", "w"), Seq("k"),
          VersionedTable.latestVersion(spark, dir), "probe")
      }
      val secs = (System.nanoTime() - t0) / 1e9
      spark.conf.unset("graft.manifest.cache")
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(dir).getParentFile)
      secs
    }

    val onFirst = sys.env.get("SPARK_GRAFT_PROBE_ORDER")
      .contains("on_first")
    // warm both paths once (JIT + codegen) before timing
    leg(cache = true); leg(cache = false)
    val (a, b) =
      if (onFirst) { val on = leg(true); val off = leg(false); (off, on) }
      else { val off = leg(false); val on = leg(true); (off, on) }
    println(f"[cacheprobe] $n%d feed-declared merges: cache OFF $a%.1fs, " +
      f"cache ON $b%.1fs (${100.0 * (a - b) / a}%.0f%% faster, " +
      f"order=${if (onFirst) "on_first" else "off_first"})")

    // ── version-LISTING cache leg (round 16, VERDICT r15 #6) ──
    // The listing cache serves READS of a quiet table (resolution =
    // one dir stat + one existence probe instead of a listStatus +
    // name parse per call); during a hot commit loop the grace gate
    // keeps it off by design. Local listStatus is microseconds, so
    // the local delta is the MECHANISM receipt only — the lever is an
    // object store, where LIST is a priced, slower round trip than
    // HEAD (the in-code rationale at VersionedTable.versions).
    locally {
      val dir = java.nio.file.Files
        .createTempDirectory("cacheprobe_listing").toString + "/t"
      VersionedTable.commit(spark, dir,
        spark.range(1000).select($"id".as("k"), ($"id" % 7).as("w")),
        -1L, "loader")
      (1 to 19).foreach { i =>
        VersionedTable.commitDelta(spark, dir,
          Some(Seq((1000000L + i, 0L)).toDF("k", "w")), Seq.empty,
          VersionedTable.latestVersion(spark, dir), "probe")
      }
      Thread.sleep(2100) // production grace: the table is now "quiet"
      def listLeg(cache: Boolean, m: Int): Double = {
        spark.conf.set("graft.listing.cache", cache.toString)
        var acc = 0L
        val t0 = System.nanoTime()
        (1 to m).foreach(_ => acc += VersionedTable.latestVersion(spark, dir))
        val secs = (System.nanoTime() - t0) / 1e9
        spark.conf.unset("graft.listing.cache")
        require(acc == 19L * m, s"listing probe drifted: $acc")
        secs
      }
      val m = 5000
      listLeg(cache = true, 200); listLeg(cache = false, 200) // JIT warm
      val (loff, lon) =
        if (onFirst) { val on = listLeg(true, m); (listLeg(false, m), on) }
        else (listLeg(false, m), listLeg(true, m))
      println(f"[cacheprobe] $m%d latestVersion calls on a quiet " +
        f"20-version table: listing cache OFF $loff%.2fs, ON $lon%.2fs " +
        f"(${100.0 * (loff - lon) / loff}%.0f%% faster, " +
        f"order=${if (onFirst) "on_first" else "off_first"})")
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(dir).getParentFile)
    }
    spark.stop()
    sys.exit(0)
  }
}
