package graft.sources

import java.util

import scala.collection.JavaConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.{SequenceFile, Text}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

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
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KvTable(properties.get("path"))
}

object KeyValueStore {
  val Format = "graft.sources.KeyValueStore"

  /** Fixed-width decimal key rendering: numeric order == lexicographic
    * order, the rowkey-design idiom HBase itself requires. */
  private[sources] def renderKey(k: Long): String = {
    require(k >= 0, s"negative key $k unsupported (rowkeys sort as bytes)")
    f"$k%019d"
  }

  def schemaOf(valueCols: Seq[String]): StructType =
    StructType(StructField("key", LongType, nullable = false) +:
      valueCols.map(c => StructField(c, StringType, nullable = true)))

  /** Write `df` as a sorted KV table: range-partition by key, sort
    * within files, stream each partition to a sequence file on the
    * EXECUTORS (no driver data path), then record per-file key ranges
    * in the `_kvindex` sidecar (bounded: one line per file). */
  def write(df: DataFrame, keyCol: String, valueCols: Seq[String],
      path: String, nFiles: Int): Unit = {
    val spark = df.sparkSession
    val hconf = new SerializableConfiguration(spark.sessionState.newHadoopConf())
    val root = new Path(path)
    val fs = root.getFileSystem(hconf.value)
    fs.delete(root, true)
    fs.mkdirs(root)
    val bc = spark.sparkContext.broadcast(hconf)
    val prepared = df.select(
        (col(keyCol).cast("long").as("__k") +:
          valueCols.map(c => col(c).cast("string"))): _*)
      .repartitionByRange(nFiles, col("__k"))
      .sortWithinPartitions("__k")
    val stats = prepared.rdd.mapPartitionsWithIndex { (pid, it) =>
      if (it.isEmpty) Iterator.empty
      else {
        val conf = bc.value.value
        val file = new Path(root, f"part-$pid%05d.seq")
        val writer = SequenceFile.createWriter(conf,
          SequenceFile.Writer.file(file),
          SequenceFile.Writer.keyClass(classOf[Text]),
          SequenceFile.Writer.valueClass(classOf[Text]))
        val k = new Text(); val v = new Text()
        var min = Long.MaxValue; var max = Long.MinValue; var n = 0L
        try it.foreach { row =>
          val key = row.getLong(0)
          k.set(renderKey(key))
          v.set((1 until row.length).map(i =>
            if (row.isNullAt(i)) "" else row.getString(i)).mkString("\t"))
          writer.append(k, v)
          min = math.min(min, key); max = math.max(max, key); n += 1
        } finally writer.close()
        Iterator((file.toString, min, max, n))
      }
    }.collect() // O(files) sidecar triples — bounded metadata
    val out = fs.create(new Path(root, "_kvindex"), true)
    try {
      out.write((s"#columns\t${valueCols.mkString(",")}\n" +
        stats.sortBy(_._1).map { case (f, mn, mx, n) => s"$f\t$mn\t$mx\t$n\n" }
          .mkString).getBytes("UTF-8"))
    } finally out.close()
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

final class KvTable(path: String) extends Table with SupportsRead {
  private lazy val (valueCols, files) =
    KeyValueStore.readIndex(new Configuration(), path)
  override def name(): String = s"kv($path)"
  override def schema(): StructType = KeyValueStore.schemaOf(valueCols)
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KvScanBuilder(valueCols, files)
}

final class KvScanBuilder(valueCols: Seq[String],
    files: Seq[(String, Long, Long, Long)])
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {

  private var requiredSchema: StructType = KeyValueStore.schemaOf(valueCols)
  private var lo: Long = 0L            // inclusive
  private var hi: Long = Long.MaxValue // inclusive
  private var pushed: Array[Filter] = Array.empty

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

  override def build(): Scan = new Scan with Batch {
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
            UTF8String.fromString(parts(i))
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
