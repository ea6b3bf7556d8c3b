package graft.sources

import java.util

import scala.collection.JavaConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for a deterministic synthetic document
  * corpus — the Spark-native answer to the reference lineage's
  * pluggable `LoadFunc` + `LoadMetadata` + `LoadPushDown` surface
  * (SURVEY.md §2.9): schema discovery, **projection pushdown**
  * (`SupportsPushDownRequiredColumns` — unrequested columns are never
  * generated) and **predicate pushdown** (`SupportsPushDownFilters` —
  * `doc_id` range filters narrow the generated id range, so filtered
  * reads do proportionally less work, like a loader seeking into an
  * index).
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.SyntheticDocs")
  *     .option("rows", 10000).option("partitions", 8).load()
  * }}}
  *
  * Scale shape: rows are generated per-partition from the id alone
  * (no driver materialization, no shared state); `partitions` slices
  * the id range evenly, so a 10^12-row synthetic corpus is as cheap
  * to declare as a 10^3-row one.
  */
class SyntheticDocs extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticDocs.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SyntheticDocsTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("partitions", "4").toInt,
      properties.getOrDefault("textmod", "9973").toLong)
}

object SyntheticDocs {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("text", StringType, nullable = false)))

  private val langs = Array("de", "en", "es", "fr", "zh")
  private val words = Array("alpha", "bravo", "charlie", "delta", "echo",
    "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima")

  /** Deterministic row content from the id alone. Every third word
    * carries an id-derived numeric suffix, giving a ~120k-term
    * vocabulary — without it every doc collapses into ~84 distinct
    * texts and dedup/contamination soaks measure a degenerate corpus. */
  def lang(id: Long): String = langs((id % langs.length).toInt)
  /** `mod` bounds the numeric-suffix space and therefore the DISTINCT
    * TEXT count (~84 word patterns x mod). The 9973 default saturates
    * near 838k distinct texts, so a 50M-row corpus carries ~60 copies
    * of each — realistic for crawl dedup but it makes the TRUE
    * near-dup pair set O(N x 60). Soaks that need constant dup
    * density at any N pass `textmod ~ rows/50`. */
  def text(id: Long, mod: Long = 9973L): String = {
    val n = 5 + (id % 7).toInt
    val sb = new java.lang.StringBuilder(n * 8)
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      sb.append(words(((id * 31 + i * 7) % words.length).abs.toInt))
      if ((id + i) % 3 == 0) sb.append(((id * 131 + i * 17) % mod).abs)
      i += 1
    }
    sb.toString
  }
}

final class SyntheticDocsTable(rows: Long, partitions: Int, textMod: Long)
    extends Table with SupportsRead {
  override def name(): String = s"synthetic_docs($rows)"
  override def schema(): StructType = SyntheticDocs.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticScanBuilder(rows, partitions, textMod)
}

final class SyntheticScanBuilder(rows: Long, partitions: Int, textMod: Long = 9973L)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var requiredSchema: StructType = SyntheticDocs.schema
  private var lo: Long = 0L        // inclusive generated-id lower bound
  private var hi: Long = rows      // exclusive upper bound
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(required: StructType): Unit =
    requiredSchema = required

  /** Accept doc_id range/equality filters by narrowing [lo, hi); all
    * accepted filters are fully handled (nothing residual). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThan("doc_id", v: Long)        => lo = math.max(lo, v + 1); true
      case GreaterThanOrEqual("doc_id", v: Long) => lo = math.max(lo, v); true
      case LessThan("doc_id", v: Long)           => hi = math.min(hi, v); true
      case LessThanOrEqual("doc_id", v: Long)    => hi = math.min(hi, v + 1); true
      case EqualTo("doc_id", v: Long)            => lo = math.max(lo, v); hi = math.min(hi, v + 1); true
      case _ => false
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = requiredSchema
    override def description(): String =
      s"SyntheticDocs range=[$lo,$hi) cols=${requiredSchema.fieldNames.mkString(",")}"
    override def toBatch: Batch = this

    override def planInputPartitions(): Array[InputPartition] = {
      val span = math.max(0L, hi - lo)
      val per = math.max(1L, (span + partitions - 1) / partitions)
      (0 until partitions).iterator
        .map(i => (lo + i * per, math.min(lo + (i + 1) * per, hi)))
        .filter { case (a, b) => a < b }
        .map { case (a, b) => SyntheticPartition(a, b, textMod): InputPartition }
        .toArray
    }

    override def createReaderFactory(): PartitionReaderFactory = {
      val schema = requiredSchema
      new PartitionReaderFactory {
        override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
          val sp = p.asInstanceOf[SyntheticPartition]
          new PartitionReader[InternalRow] {
            private var id = sp.start - 1
            override def next(): Boolean = { id += 1; id < sp.end }
            override def get(): InternalRow =
              InternalRow.fromSeq(schema.fieldNames.toSeq.map {
                case "doc_id" => id
                case "lang"   => UTF8String.fromString(SyntheticDocs.lang(id))
                case "text"   => UTF8String.fromString(SyntheticDocs.text(id, sp.textMod))
              })
            override def close(): Unit = ()
          }
        }
      }
    }
  }
}

final case class SyntheticPartition(start: Long, end: Long,
    textMod: Long = 9973L) extends InputPartition
