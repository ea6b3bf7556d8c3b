package graft.sources

import java.util

import scala.collection.JavaConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.{SequenceFile, Text}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RequiresDistributionAndOrdering, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Sorted key-value table — the HBaseStorage-shaped connector
  * (SURVEY §2.1) [Pig: o.a.p.backend.hadoop.hbase.HBaseStorage, cited
  * from model knowledge of the public Pig tree — the reference
  * checkout is empty (SURVEY §0.1)].
  *
  * No HBase exists in this sandbox, so the STORAGE SUBSTRATE is the
  * HFile idea itself: a directory of key-sorted sequence files plus a
  * `_kvindex` sidecar of per-file key ranges (the block-index
  * analogue). Everything HBaseStorage pushed into the region servers
  * is implemented for real against that substrate:
  *
  *  - **key-range pushdown** (get/scan semantics): range predicates on
  *    `key` prune whole FILES via the sidecar, and the per-file reader
  *    starts emitting at the lower bound and STOPS at the upper bound
  *    (keys are sorted — the early exit is the scan-range seek);
  *  - **column projection**: only requested value columns are
  *    materialized; a key-only read never splits the value bytes.
  *
  * Swapping the substrate for a real HBase client touches only
  * [[KvPartitionReader]] (scan construction) and [[KeyValueStore.write]]
  * — the Spark-facing protocol (TableProvider / ScanBuilder /
  * pushdown) is the deliverable and is fully exercised by tests.
  *
  * Scale: one input partition per surviving file; the sidecar is
  * O(files) driver metadata (the same contract as SparseIndex and the
  * region-location metadata an HBase client holds).
  */
class KeyValueStore extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("KeyValueStore needs a path"))
    KeyValueStore.schemaOf(KeyValueStore.readIndex(new Configuration(), path)._1)
  }
  // writes carry the query's schema (no sidecar exists yet for a new
  // table) — reads still infer from the sidecar above
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KvTable(properties.get("path"), Option(schema))
}

object KeyValueStore {
  val Format = "graft.sources.KeyValueStore"

  /** NULL cell sentinel in the tab-joined value encoding. HBase skips
    * null cells entirely; a positional encoding can't skip, so NULL is
    * marked in-band and restored on read — it must NOT conflate with
    * the empty string (a real, distinct value). NUL can't appear in
    * the text columns this connector carries. */
  private[sources] val NullSentinel = "\u0000"

  /** Fixed-width decimal key rendering: numeric order == lexicographic
    * order, the rowkey-design idiom HBase itself requires. */
  private[sources] def renderKey(k: Long): String = {
    require(k >= 0, s"negative key $k unsupported (rowkeys sort as bytes)")
    f"$k%019d"
  }

  def schemaOf(valueCols: Seq[String]): StructType =
    StructType(StructField("key", LongType, nullable = false) +:
      valueCols.map(c => StructField(c, StringType, nullable = true)))

  /** Write `df` as a sorted KV table through the DSv2 write path: the
    * connector declares its layout invariant via
    * `RequiresDistributionAndOrdering` (ordered by key, `nFiles`
    * partitions) and SPARK inserts the range partition + sort; each
    * task streams its partition to a sequence file and commits a
    * (file, min, max, rows) message; the job commit assembles the
    * `_kvindex` sidecar from COMMITTED tasks only — speculative or
    * failed attempts never become visible. */
  def write(df: DataFrame, keyCol: String, valueCols: Seq[String],
      path: String, nFiles: Int): Unit = {
    val root = new Path(path)
    val fs = root.getFileSystem(df.sparkSession.sessionState.newHadoopConf())
    fs.delete(root, true)
    fs.mkdirs(root)
    df.select(
        (col(keyCol).cast("long").as("key") +:
          valueCols.map(c => col(c).cast("string").as(c))): _*)
      .write.format(Format).option("files", nFiles.toString)
      .mode("append").save(path)
  }

  /** Sidecar: (value column names, per-file (path, min, max, rows)). */
  private[sources] def readIndex(conf: Configuration,
      path: String): (Seq[String], Seq[(String, Long, Long, Long)]) = {
    val p = new Path(path, "_kvindex")
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val lines = text.split("\n").filter(_.nonEmpty)
    val cols = lines.head.stripPrefix("#columns\t").split(",").toSeq
      .filter(_.nonEmpty)
    val files = lines.tail.toSeq.map { ln =>
      val Array(f, mn, mx, n) = ln.split("\t")
      (f, mn.toLong, mx.toLong, n.toLong)
    }
    (cols, files)
  }
}

final class KvTable(path: String, provided: Option[StructType])
    extends Table with SupportsRead with SupportsWrite {
  private lazy val (valueCols, files) =
    KeyValueStore.readIndex(new Configuration(), path)
  override def name(): String = s"kv($path)"
  override def schema(): StructType =
    provided.filter(_.nonEmpty)
      .getOrElse(KeyValueStore.schemaOf(valueCols))
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KvScanBuilder(valueCols, files)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val s = info.schema()
    require(s.fields.headOption.exists(f =>
        f.name == "key" && f.dataType == LongType),
      s"KeyValueStore writes need a leading LongType 'key' column, got $s")
    require(s.fields.drop(1).forall(_.dataType == StringType),
      s"KeyValueStore value columns must be strings (cells are bytes), got $s")
    val nFiles = Option(info.options.get("files")).map(_.toInt).getOrElse(0)
    new WriteBuilder {
      override def build(): Write = new KvWrite(path, s, nFiles)
    }
  }
}

/** The connector owns its layout invariant: Spark is told to range-
  * distribute and sort by key (and how many partitions) and inserts
  * the exchange itself — callers cannot produce an unsorted table. */
final class KvWrite(path: String, writeSchema: StructType, nFiles: Int)
    extends Write with RequiresDistributionAndOrdering {
  private val order = Array[SortOrder](
    Expressions.sort(Expressions.column("key"), SortDirection.ASCENDING))
  override def requiredDistribution(): Distribution = Distributions.ordered(order)
  override def requiredOrdering(): Array[SortOrder] = order
  override def requiredNumPartitions(): Int = nFiles
  override def toBatch: BatchWrite = new KvBatchWrite(path, writeSchema)
}

final case class KvCommitMessage(file: String, min: Long, max: Long,
    rows: Long) extends WriterCommitMessage

final class KvBatchWrite(path: String, writeSchema: StructType)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new KvWriterFactory(path, writeSchema)

  /** Job commit: the sidecar is assembled from committed task messages
    * only (merged with any prior sidecar for append), so files from
    * speculative or failed attempts are never visible to readers. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val conf = new Configuration()
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val valueCols = writeSchema.fieldNames.toSeq.filterNot(_ == "key")
    val prior =
      if (fs.exists(new Path(root, "_kvindex")))
        KeyValueStore.readIndex(conf, path)._2
      else Nil
    val fresh = messages.collect {
      case m: KvCommitMessage if m.rows > 0 => (m.file, m.min, m.max, m.rows)
    }
    val out = fs.create(new Path(root, "_kvindex"), true)
    try out.write((s"#columns\t${valueCols.mkString(",")}\n" +
      (prior ++ fresh).sortBy(_._1)
        .map { case (f, mn, mx, n) => s"$f\t$mn\t$mx\t$n\n" }.mkString)
      .getBytes("UTF-8"))
    finally out.close()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val conf = new Configuration()
    messages.collect { case m: KvCommitMessage => m }.foreach { m =>
      val p = new Path(m.file)
      p.getFileSystem(conf).delete(p, false)
    }
  }
}

final class KvWriterFactory(path: String, writeSchema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new KvDataWriter(path, writeSchema, partitionId, taskId)
}

/** One task's sorted slice → one sequence file; the (min, max, rows)
  * triple travels back in the commit message. Task ids in the file
  * name keep retried attempts from colliding; only the committed
  * attempt's file enters the sidecar. */
final class KvDataWriter(path: String, writeSchema: StructType,
    partitionId: Int, taskId: Long) extends DataWriter[InternalRow] {
  private val file = new Path(path, f"part-$partitionId%05d-$taskId.seq")
  private val conf = new Configuration()
  private lazy val writer = SequenceFile.createWriter(conf,
    SequenceFile.Writer.file(file),
    SequenceFile.Writer.keyClass(classOf[Text]),
    SequenceFile.Writer.valueClass(classOf[Text]))
  private val valIdx = writeSchema.fields.zipWithIndex
    .collect { case (f, i) if f.name != "key" => i }
  private val keyIdx = writeSchema.fieldIndex("key")
  private val k = new Text(); private val v = new Text()
  private var min = Long.MaxValue
  private var max = Long.MinValue
  private var rows = 0L

  override def write(row: InternalRow): Unit = {
    val key = row.getLong(keyIdx)
    k.set(KeyValueStore.renderKey(key))
    v.set(valIdx.map(i =>
      if (row.isNullAt(i)) KeyValueStore.NullSentinel
      else row.getUTF8String(i).toString)
      .mkString("\t"))
    writer.append(k, v)
    min = math.min(min, key); max = math.max(max, key); rows += 1
  }
  override def commit(): WriterCommitMessage = {
    if (rows > 0) writer.close()
    KvCommitMessage(file.toString, min, max, rows)
  }
  override def abort(): Unit = {
    if (rows > 0) writer.close()
    file.getFileSystem(conf).delete(file, false)
  }
  override def close(): Unit = ()
}

final class KvScanBuilder(valueCols: Seq[String],
    files: Seq[(String, Long, Long, Long)])
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownAggregates {

  private var requiredSchema: StructType = KeyValueStore.schemaOf(valueCols)
  private var lo: Long = 0L            // inclusive
  private var hi: Long = Long.MaxValue // inclusive
  private var pushed: Array[Filter] = Array.empty
  private var pushedAgg: Option[Seq[AggregateFunc]] = None

  // ---- aggregate pushdown (stats-only scans) ----
  //
  // COUNT(*)/MIN(key)/MAX(key) with no grouping are answerable from
  // the per-file index (min, max, count) WITHOUT opening a single
  // data file — the HBase/row-store "metadata count" fast path; at
  // 100 TB the difference between a full scan and reading N_file
  // index entries. SOUNDNESS RULE: only when every file overlapping
  // the pushed key range is FULLY CONTAINED in it (a partially
  // overlapping file would need a real scan to know which of its
  // rows qualify) — otherwise the pushdown is refused and Spark
  // plans the ordinary scan+aggregate, which is always correct.
  private def overlapping = files.filter { case (_, mn, mx, _) => mx >= lo && mn <= hi }
  private def statsAnswerable: Boolean =
    overlapping.forall { case (_, mn, mx, _) => lo <= mn && mx <= hi }
  private def isKeyRef(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
    e.describe() == "key"
  private def canPush(agg: Aggregation): Boolean =
    agg.groupByExpressions.isEmpty && statsAnswerable &&
      agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall {
        case _: CountStar => true
        case m: Min => isKeyRef(m.column)
        case m: Max => isKeyRef(m.column)
        case _ => false
      }
  override def supportCompletePushDown(agg: Aggregation): Boolean = canPush(agg)
  override def pushAggregation(agg: Aggregation): Boolean = {
    if (!canPush(agg)) false
    else { pushedAgg = Some(agg.aggregateExpressions.toSeq); true }
  }

  override def pruneColumns(required: StructType): Unit =
    requiredSchema = required

  /** Key range predicates are FULLY handled: files outside the range
    * are never opened, and the reader seeks/stops inside each file. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThan("key", v: Number)        => lo = math.max(lo, v.longValue + 1); true
      case GreaterThanOrEqual("key", v: Number) => lo = math.max(lo, v.longValue); true
      case LessThan("key", v: Number)           => hi = math.min(hi, v.longValue - 1); true
      case LessThanOrEqual("key", v: Number)    => hi = math.min(hi, v.longValue); true
      case EqualTo("key", v: Number)            =>
        lo = math.max(lo, v.longValue); hi = math.min(hi, v.longValue); true
      case _ => false
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = pushedAgg match {
    case Some(aggs) => new KvStatsScan(aggs, overlapping, lo, hi)
    case None => buildRowScan()
  }

  private def buildRowScan(): Scan = new Scan with Batch {
    override def readSchema(): StructType = requiredSchema
    override def description(): String =
      s"KeyValueStore range=[$lo,$hi] cols=${requiredSchema.fieldNames.mkString(",")}"
    override def toBatch: Batch = this

    override def planInputPartitions(): Array[InputPartition] =
      files.filter { case (_, mn, mx, _) => mx >= lo && mn <= hi }
        .map { case (f, _, _, _) => KvPartition(f, lo, hi): InputPartition }
        .toArray

    override def createReaderFactory(): PartitionReaderFactory = {
      val schema = requiredSchema
      val cols = valueCols
      new PartitionReaderFactory {
        override def createReader(p: InputPartition): PartitionReader[InternalRow] =
          new KvPartitionReader(p.asInstanceOf[KvPartition], schema, cols)
      }
    }
  }
}

final case class KvPartition(file: String, lo: Long, hi: Long)
    extends InputPartition

/** Stats-only scan for a COMPLETELY pushed aggregation: the answer
  * comes from the per-file index alone — `planInputPartitions` emits
  * ONE synthetic partition and no data file is ever opened. An empty
  * overlap yields SQL aggregate-on-empty semantics: COUNT = 0,
  * MIN/MAX = NULL. */
final class KvStatsScan(aggs: Seq[AggregateFunc],
    overlapping: Seq[(String, Long, Long, Long)], lo: Long, hi: Long)
    extends Scan with Batch {
  override def readSchema(): StructType = StructType(aggs.zipWithIndex.map {
    case (_: CountStar, i) => StructField(s"agg_$i", LongType, nullable = false)
    case (_, i)            => StructField(s"agg_$i", LongType, nullable = true)
  })
  override def description(): String =
    s"KeyValueStore STATS-ONLY range=[$lo,$hi] aggs=${aggs.map(_.describe()).mkString(",")}"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(KvStatsPartition(
      overlapping.map(_._4).sum,
      if (overlapping.isEmpty) None else Some(overlapping.map(_._2).min),
      if (overlapping.isEmpty) None else Some(overlapping.map(_._3).max)))
  override def createReaderFactory(): PartitionReaderFactory = {
    val as = aggs
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private val stats = p.asInstanceOf[KvStatsPartition]
          private var emitted = false
          override def next(): Boolean = !emitted && { emitted = true; true }
          override def get(): InternalRow =
            new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
              as.map {
                case _: CountStar => stats.count: Any
                case _: Min       => stats.min.map(x => x: Any).orNull
                case _: Max       => stats.max.map(x => x: Any).orNull
                case other => throw new IllegalStateException(
                  s"unpushable aggregate slipped through: ${other.describe()}")
              }.toArray)
          override def close(): Unit = ()
        }
    }
  }
}

final case class KvStatsPartition(count: Long, min: Option[Long], max: Option[Long])
    extends InputPartition

/** Streams one sorted file: skips keys below `lo`, STOPS at the first
  * key above `hi` (the scan-range early exit), splits the value bytes
  * only when a value column is actually requested. */
final class KvPartitionReader(p: KvPartition, schema: StructType,
    valueCols: Seq[String]) extends PartitionReader[InternalRow] {
  private val reader = new SequenceFile.Reader(new Configuration(),
    SequenceFile.Reader.file(new Path(p.file)))
  private val k = new Text(); private val v = new Text()
  // projection plan: for each output field, either the key (-1) or a
  // value-part index
  private val fieldIdx: Array[Int] = schema.fieldNames.map {
    case "key" => -1
    case c => valueCols.indexOf(c)
  }
  private val needsValue = fieldIdx.exists(_ >= 0)
  private var row: InternalRow = _
  private var done = false

  override def next(): Boolean = {
    if (done) return false
    while (reader.next(k, v)) {
      val key = k.toString.toLong
      if (key > p.hi) { done = true; return false } // sorted: early exit
      if (key >= p.lo) {
        val parts = if (needsValue) v.toString.split("\t", -1) else null
        row = InternalRow.fromSeq(fieldIdx.toSeq.map {
          case -1 => key
          case i if parts != null && i < parts.length =>
            if (parts(i) == KeyValueStore.NullSentinel) null
            else UTF8String.fromString(parts(i))
          case _ => null
        })
        return true
      }
    }
    done = true
    false
  }
  override def get(): InternalRow = row
  override def close(): Unit = reader.close()
}
