package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.format.converter.ParquetMetadataConverter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.SerializableConfiguration

import scala.jdk.CollectionConverters._

/** Sparse-index lookup over a sorted parquet table — the Spark-first
  * replacement for Pig's `JOIN … USING 'merge-sparse'` [Pig:
  * o.a.p.backend.hadoop.executionengine.mapReduceLayer.MergeJoinIndexer
  * + POMergeCogroup, cited from model knowledge of the public Pig tree
  * — the reference checkout is empty (SURVEY §0.1)].
  *
  * Pig built a sampled (key → file offset) index over a sorted input
  * and seeked into it for each probe key. Parquet already carries that
  * index: every file footer records per-row-group min/max for each
  * column. So the operator becomes: read FOOTERS (metadata-only, a
  * map-only job over file paths — no data IO), keep files whose
  * [min,max] can contain a probe key, scan only those, then broadcast-
  * join the probe side.
  *
  * At 100 TB this is the difference between scanning 30 000 files and
  * scanning the 3 that can match: the index job moves O(files) footers
  * (KBs each), and the data job's input is bounded by the true match
  * volume plus row-group granularity, not the table size.
  */
object SparseIndex {

  /** Per-file key range from the parquet footer. `rows` for debugging
    * and pruning asserts in specs. */
  final case class FileStats(path: String, rows: Long, min: Long, max: Long)

  /** Footer-only index of `dir`: one [[FileStats]] per data file, for
    * an integral `keyCol`. Distributed — paths are parallelized and
    * footers read on executors — so indexing 100k files is a short
    * metadata job, not a scan. A file with no usable statistics is
    * returned with the full-range sentinel (never pruned): missing
    * stats must degrade to a bigger read, not a wrong answer.
    */
  def index(spark: SparkSession, dir: String, keyCol: String): Seq[FileStats] = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val files = fs.listStatus(root).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString)
    if (files.isEmpty) return Nil
    val sconf = new SerializableConfiguration(conf)
    val slices = math.max(1, math.min(files.length, 64))
    spark.sparkContext.parallelize(files, slices)
      .map(p => readFileStats(sconf.value, p, keyCol))
      .collect().toSeq // O(files) triples — bounded metadata, not data
  }

  private def readFileStats(conf: Configuration, path: String,
      keyCol: String): FileStats = {
    val footer = ParquetFileReader.readFooter(
      conf, new Path(path), ParquetMetadataConverter.NO_FILTER)
    var min = Long.MaxValue
    var max = Long.MinValue
    var rows = 0L
    var sound = true
    footer.getBlocks.asScala.foreach { block =>
      rows += block.getRowCount
      block.getColumns.asScala
        .find(_.getPath.toDotString == keyCol) match {
        case Some(cc) =>
          val st = cc.getStatistics
          if (st == null || st.isEmpty || !st.hasNonNullValue) sound = false
          else {
            (st.genericGetMin, st.genericGetMax) match {
              case (lo: Number, hi: Number) =>
                min = math.min(min, lo.longValue)
                max = math.max(max, hi.longValue)
              case _ => sound = false // non-integral key column
            }
          }
        case None => sound = false
      }
    }
    if (sound && rows > 0) FileStats(path, rows, min, max)
    else FileStats(path, rows, Long.MinValue, Long.MaxValue) // never pruned
  }

  /** Inner-join `dir` (sorted-by-`keyCol` parquet) against a SMALL
    * probe relation, scanning only files whose key range can contain a
    * probe key.
    *
    * Contract (same as Pig's merge-sparse): the probe side is
    * selective — its distinct keys fit on the driver. `maxKeys` guards
    * the contract with a hard error instead of a silent OOM; beyond
    * it, use a plain shuffle join (pruning can't help when the probe
    * hits most of the table anyway). The collected keys are pruning
    * METADATA; data rows flow only through the broadcast hash join.
    */
  def lookupJoin(spark: SparkSession, dir: String, keyCol: String,
      probe: DataFrame, probeKey: String,
      maxKeys: Int = 1 << 20): DataFrame = {
    val keyRows = probe.select(col(probeKey).cast("long"))
      .na.drop().distinct().limit(maxKeys + 1).collect()
    require(keyRows.length <= maxKeys,
      s"sparse lookup probe exceeds $maxKeys distinct keys — " +
        "use a plain join for non-selective probes")
    val keys = keyRows.map(_.getLong(0)).sorted
    val files = index(spark, dir, keyCol).filter { f =>
      val i = java.util.Arrays.binarySearch(keys, f.min)
      val from = if (i >= 0) i else -i - 1
      from < keys.length && keys(from) <= f.max
    }.map(_.path)
    val base =
      if (files.isEmpty) spark.read.parquet(dir).limit(0)
      else spark.read.parquet(files: _*)
    base.join(broadcast(probe), base(keyCol) === probe(probeKey))
  }
}
