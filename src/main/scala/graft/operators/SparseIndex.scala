package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.format.converter.ParquetMetadataConverter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
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
    val files = pruneFiles(index(spark, dir, keyCol), keys)
    val base =
      if (files.isEmpty) spark.read.parquet(dir).limit(0)
      else {
        // push the probe-key bounds into the scan: parquet's own
        // row-group (and page-index) statistics then prune WITHIN each
        // surviving file — the second level of Pig's index seek, for
        // free. Small key sets push In (page-level); larger ones push
        // the range (row-group-level). Either way the broadcast join
        // still decides exact membership.
        val raw = spark.read.parquet(files: _*)
        val pred =
          if (keys.length <= 1000) col(keyCol).isin(keys.map(_.asInstanceOf[Any]): _*)
          else col(keyCol).between(keys.head, keys.last)
        raw.filter(pred)
      }
    base.join(broadcast(probe), base(keyCol) === probe(probeKey))
  }

  /** Files whose [min,max] contains at least one probe key (`keys`
    * sorted ascending). */
  private def pruneFiles(idx: Seq[FileStats], keys: Array[Long]): Seq[String] =
    idx.filter { f =>
      val i = java.util.Arrays.binarySearch(keys, f.min)
      val from = if (i >= 0) i else -i - 1
      from < keys.length && keys(from) <= f.max
    }.map(_.path)

  // ------------------------------------------------------------------
  // Pig front-end routing: JOIN … USING 'merge-sparse'
  // ------------------------------------------------------------------

  /** Best-effort routing of the script-level `'merge-sparse'` hint:
    * if `big` is a bare (rename/reorder-only) single-root parquet
    * scan, both key sides are integral, and `probe`'s distinct keys
    * fit the selective contract, rebuild the join against a
    * footer-pruned scan. Returns None whenever the shape does not
    * qualify — the compiler falls back to a sort-merge join, so the
    * hint can improve the plan but never change semantics or fail a
    * script that Pig would have run.
    */
  def routeScriptJoin(probe: DataFrame, probeKey: Column, big: DataFrame,
      bigKeyName: String, maxKeys: Int = 100000): Option[DataFrame] = {
    val spark = big.sparkSession
    val integral = Set[org.apache.spark.sql.types.DataType](
      ByteType, ShortType, IntegerType, LongType)
    for {
      (path, fileNames) <- asRenamedParquetScan(big)
      keyIdx = big.columns.indexOf(bigKeyName)
      if keyIdx >= 0 && integral(big.schema(keyIdx).dataType)
      if integral(probe.select(probeKey).schema.head.dataType)
      keyRows = probe.select(probeKey.cast("long")).na.drop()
        .distinct().limit(maxKeys + 1).collect()
      if keyRows.length <= maxKeys
    } yield {
      val keys = keyRows.map(_.getLong(0)).sorted
      val files = pruneFiles(index(spark, path, fileNames(keyIdx)), keys)
      val pruned =
        if (files.isEmpty) big.limit(0)
        else {
          val renamed = spark.read.parquet(files: _*)
            .select(fileNames.map(n => col(s"`$n`")): _*)
            .toDF(big.columns: _*)
          // same second-level seek as lookupJoin: the key predicate
          // pushes through the rename Project into the parquet scan,
          // where row-group/page stats prune within surviving files
          val pred =
            if (keys.length <= 1000)
              renamed(s"`$bigKeyName`").isin(keys.map(_.asInstanceOf[Any]): _*)
            else renamed(s"`$bigKeyName`").between(keys.head, keys.last)
          renamed.filter(pred)
        }
      probe.join(pruned, probeKey === pruned(s"`$bigKeyName`"))
    }
  }

  /** Unwrap `df` down to a single-root parquet `LogicalRelation`
    * through rename/reorder-only Projects and subquery aliases.
    * Returns the root path plus, for each df output column, the FILE
    * column name feeding it. Any computation, filter, or join on the
    * way → None.
    */
  private def asRenamedParquetScan(df: DataFrame): Option[(String, Seq[String])] = {
    def unwrap(p: LogicalPlan): Option[(LogicalRelation, Seq[String])] = p match {
      case SubqueryAlias(_, c) => unwrap(c)
      case Project(list, c) =>
        unwrap(c).flatMap { case (rel, childNames) =>
          val childOut = c.output
          val mapped = list.map {
            case ar: AttributeReference => childOut.indexWhere(_.exprId == ar.exprId)
            case Alias(ar: AttributeReference, _) =>
              childOut.indexWhere(_.exprId == ar.exprId)
            case _ => -1
          }
          if (mapped.forall(_ >= 0)) Some((rel, mapped.map(childNames)))
          else None
        }
      case lr: LogicalRelation => Some((lr, lr.output.map(_.name)))
      case _ => None
    }
    unwrap(df.queryExecution.analyzed).flatMap { case (lr, fileNames) =>
      lr.relation match {
        case fs: HadoopFsRelation
            if fs.fileFormat.getClass.getSimpleName.startsWith("Parquet")
              && fs.location.rootPaths.length == 1 =>
          Some((fs.location.rootPaths.head.toString, fileNames))
        case _ => None
      }
    }
  }
}
