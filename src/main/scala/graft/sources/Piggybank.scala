package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The "piggybank" surface: Pig's contrib library of loaders and small
  * eval functions, re-expressed Spark-first. [Pig: contrib/piggybank —
  * o.a.p.piggybank.storage.{SequenceFileLoader, CSVExcelStorage,
  * XMLLoader, apachelog.CombinedLogLoader} and
  * o.a.p.piggybank.evaluation.datetime.{ISOToUnix, UnixToISO,
  * DiffDate}, cited from model knowledge of the public Pig tree —
  * the reference checkout is empty (SURVEY §0.1)].
  *
  * Design stance (SURVEY §2.1): loaders become DataFrame readers so
  * Catalyst sees a relation it can prune/push into, and the eval
  * functions become `Column` combinators over codegen'd builtins —
  * no UDFs anywhere on this surface.
  *
  * Scale notes per member below; none of these collects data to the
  * driver.
  */
object Piggybank {

  // ------------------------------------------------------------------
  // SequenceFileLoader [Pig: o.a.p.piggybank.storage.SequenceFileLoader]
  // ------------------------------------------------------------------

  /** Read a Hadoop SequenceFile of (Text, Text) as a two-column
    * DataFrame `(key string, value string)`.
    *
    * Scale: `sequenceFile` splits by HDFS block exactly like Pig's
    * loader did — a 100 TB directory of sequence files fans out to one
    * task per split, and downstream projection happens post-scan (the
    * format has no column structure to push into, same as Pig).
    */
  def readSequenceFile(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.sequenceFile[String, String](path).toDF("key", "value")
  }

  /** Write `(keyCol, valueCol)` as a (Text, Text) SequenceFile — the
    * storage half of the round trip (Pig's SequenceFileLoader is
    * read-only; Pig users wrote them from MR jobs).
    */
  def writeSequenceFile(df: DataFrame, keyCol: String, valueCol: String,
      path: String): Unit = {
    val rdd = df.select(col(keyCol).cast("string"), col(valueCol).cast("string"))
      .rdd.map(r => (r.getString(0), r.getString(1)))
    rdd.saveAsSequenceFile(path)
  }

  // ------------------------------------------------------------------
  // CombinedLogLoader [Pig: o.a.p.piggybank.storage.apachelog.*]
  // ------------------------------------------------------------------

  /** Apache "combined" access-log line pattern: common log format plus
    * referer and user-agent. Group order matches [[parseCombinedLog]].
    */
  val CombinedLogPattern: String =
    """^(\S+) (\S+) (\S+) \[([^\]]+)\] "(\S+) (\S+) (\S+)" (\d{3}) (\S+) "([^"]*)" "([^"]*)"$"""

  /** Parse one combined-log line into a struct of typed fields. Pure
    * `regexp_extract` over one shared pattern — Catalyst collapses the
    * repeated regex into whole-stage codegen; nothing leaves the row.
    */
  def parseCombinedLog(line: Column): Column = {
    def g(i: Int) = regexp_extract(line, CombinedLogPattern, i)
    // ANSI-safe numeric fields: a malformed line (or '-' byte count)
    // yields NULL instead of aborting the scan — one bad log line must
    // not kill a 100 TB job
    def num(c: Column, t: String) =
      when(c.rlike("^[0-9]+$"), c.cast(t)).otherwise(lit(null).cast(t))
    struct(
      g(1).as("ip"),
      g(2).as("ident"),
      g(3).as("user"),
      g(4).as("ts"),
      g(5).as("method"),
      g(6).as("uri"),
      g(7).as("proto"),
      num(g(8), "int").as("status"),
      num(g(9), "long").as("bytes"),
      g(10).as("referer"),
      g(11).as("agent"))
  }

  // ------------------------------------------------------------------
  // XMLLoader [Pig: o.a.p.piggybank.storage.XMLLoader]
  // ------------------------------------------------------------------

  /** One row per `<tag>…</tag>` element (Pig's XMLLoader contract:
    * LOAD 'f' USING XMLLoader('tag') yields each matching element as a
    * single chararray field named `record`).
    *
    * Files are read whole (`wholetext`) so elements may span lines,
    * then records are exploded per file. Scale: parallelism is
    * per-FILE here, not per-split — correct for the many-small-files
    * layout XML corpora actually have; a single monolithic 100 GB XML
    * file would need a boundary-scanning custom InputFormat, which Pig's
    * loader equally did not attempt (it required elements not to cross
    * split boundaries).
    */
  def xmlRecords(spark: SparkSession, path: String, tag: String): DataFrame = {
    require(tag.matches("[A-Za-z_][A-Za-z0-9_.-]*"), s"bad XML tag: $tag")
    val pat = s"(?s)<$tag(?:\\s[^>]*)?>.*?</$tag>"
    spark.read.option("wholetext", "true").text(path)
      .select(explode(regexp_extract_all(col("value"), lit(pat), lit(0)))
        .as("record"))
  }

  /** Extract the text content of the first `<tag>…</tag>` child of an
    * XML record column. Regex-level (like Pig users' downstream
    * XPath-ish REGEX_EXTRACT chains), not a full XML parser.
    */
  def xmlElement(record: Column, tag: String): Column =
    regexp_extract(record, s"(?s)<$tag(?:\\s[^>]*)?>(.*?)</$tag>", 1)

  // ------------------------------------------------------------------
  // CSVExcelStorage [Pig: o.a.p.piggybank.storage.CSVExcelStorage]
  // ------------------------------------------------------------------

  /** Excel-dialect CSV options: quoted fields, `""` escapes a quote,
    * fields may contain embedded delimiters and NEWLINES (the part
    * plain PigStorage could never round-trip).
    */
  private def csvExcelOptions(delimiter: String): Map[String, String] = Map(
    "delimiter" -> delimiter,
    "quote" -> "\"",
    "escape" -> "\"",
    "multiLine" -> "true")

  def writeCsvExcel(df: DataFrame, path: String,
      delimiter: String = ","): Unit =
    df.write.mode("overwrite")
      .options(csvExcelOptions(delimiter) - "multiLine")
      .option("quoteAll", "true")
      .csv(path)

  /** Read Excel-dialect CSV. `multiLine=true` parses files whole-record
    * rather than line-split; at 100 TB this costs input-split
    * parallelism on HUGE single files (a documented Spark CSV
    * limitation that applies equally to Pig's loader, which buffered
    * records across line boundaries in one mapper) — with many files,
    * parallelism is per-file and unaffected.
    */
  def readCsvExcel(spark: SparkSession, path: String,
      delimiter: String = ","): DataFrame =
    spark.read.options(csvExcelOptions(delimiter)).csv(path)

  // ------------------------------------------------------------------
  // datetime helpers [Pig: o.a.p.piggybank.evaluation.datetime.*]
  // ------------------------------------------------------------------

  /** ISOToUnix: timestamp → epoch MILLIseconds (Pig returned millis,
    * not seconds). */
  def isoToUnix(ts: Column): Column = unix_millis(ts.cast("timestamp"))

  /** UnixToISO: epoch millis → ISO-8601 string with explicit UTC
    * offset, matching Pig's Joda `ISODateTimeFormat.dateTime()` shape
    * `yyyy-MM-dd'T'HH:mm:ss.SSSZ` (rendered here with a literal
    * `+00:00` since the engine pins the session to UTC).
    */
  def unixToIso(ms: Column): Column =
    concat(
      date_format(timestamp_millis(ms), "yyyy-MM-dd'T'HH:mm:ss.SSS"),
      lit("+00:00"))

  /** ISODaysBetween(a, b) = whole days from b to a (a - b), Pig's
    * argument order. */
  def isoDaysBetween(a: Column, b: Column): Column =
    datediff(a, b).cast("long")
}
