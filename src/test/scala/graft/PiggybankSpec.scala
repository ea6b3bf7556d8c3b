package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Piggybank

/** §2.1 "piggybank extras": the contrib loaders/evals a real Pig user
  * leans on — SequenceFileLoader, CSVExcelStorage, XMLLoader, the
  * apachelog loader, and the ISO datetime evals — re-expressed as
  * DataFrame readers + Column combinators, plus their Pig-front-end
  * `LOAD … USING <fully.qualified.Class>` spellings. */
class PiggybankSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = Files.createTempDirectory("piggybank").toString

  // ---------------- SequenceFileLoader ----------------

  test("sequence file (Text,Text) round trip") {
    val path = s"$base/seq"
    val src = tables.nation.select(
      col("n_nationkey").cast("string").as("k"), col("n_name").as("v"))
    Piggybank.writeSequenceFile(src, "k", "v", path)
    val back = Piggybank.readSequenceFile(spark, path)
    assert(back.columns.toSeq == Seq("key", "value"))
    assert(back.count() == 25)
    assert(back.as[(String, String)].collect().toMap ===
      src.as[(String, String)].collect().toMap)
  }

  test("LOAD … USING SequenceFileLoader through the Pig front end") {
    val path = s"$base/seq2"
    Piggybank.writeSequenceFile(
      tables.nation.select(col("n_nationkey").cast("string").as("k"),
        col("n_regionkey").cast("string").as("v")), "k", "v", path)
    val df = graft.pig.PigScript.query(spark,
      s"""raw = LOAD '$path'
            USING org.apache.pig.piggybank.storage.SequenceFileLoader()
            AS (nk:int, rk:int);
          big = FILTER raw BY rk >= 3;
          STORE big INTO 'out';""")
    assert(df.count() ==
      tables.nation.filter(col("n_regionkey") >= 3).count())
  }

  // ---------------- CombinedLogLoader ----------------

  test("combined log line parses field-for-field; '-' bytes → NULL") {
    val line = """203.0.113.9 - alice [10/Oct/2000:13:55:36 -0700] """ +
      """"GET /apache_pb.gif HTTP/1.0" 200 - "http://ref/" "Mozilla/4.08""""
    val r = Seq(line).toDF("value")
      .select(Piggybank.parseCombinedLog(col("value")).as("r"))
      .select("r.*").collect()(0)
    assert(r.getAs[String]("ip") == "203.0.113.9")
    assert(r.getAs[String]("user") == "alice")
    assert(r.getAs[String]("ts") == "10/Oct/2000:13:55:36 -0700")
    assert(r.getAs[String]("method") == "GET")
    assert(r.getAs[String]("uri") == "/apache_pb.gif")
    assert(r.getAs[Int]("status") == 200)
    assert(r.isNullAt(r.fieldIndex("bytes")))
    assert(r.getAs[String]("referer") == "http://ref/")
    assert(r.getAs[String]("agent") == "Mozilla/4.08")
  }

  test("malformed log line yields empty fields, not an exception") {
    val r = Seq("not a log line").toDF("value")
      .select(Piggybank.parseCombinedLog(col("value")).as("r"))
      .select("r.*").collect()(0)
    assert(r.getAs[String]("ip") == "")
    assert(r.isNullAt(r.fieldIndex("status"))) // '' casts to NULL int
  }

  // ---------------- XMLLoader ----------------

  test("xmlRecords: one row per element, elements span lines and files") {
    val path = s"$base/xml"
    val docs = Seq(
      "<catalog>\n<item id=\"1\">\n  <name>ax</name>\n</item>\n" +
        "<item id=\"2\"><name>b&amp;c</name></item>\n</catalog>",
      "<catalog><item id=\"3\">\n<name>d</name></item></catalog>")
    // two files → per-file parallelism; records must not leak across
    Files.createDirectories(java.nio.file.Paths.get(path))
    docs.zipWithIndex.foreach { case (d, i) =>
      Files.write(java.nio.file.Paths.get(s"$path/f$i.xml"), d.getBytes)
    }
    val recs = Piggybank.xmlRecords(spark, path, "item")
    assert(recs.count() == 3)
    val names = recs.select(Piggybank.xmlElement(col("record"), "name"))
      .as[String].collect().sorted
    assert(names.toSeq == Seq("ax", "b&amp;c", "d"))
  }

  test("LOAD … USING XMLLoader('tag') through the Pig front end") {
    val path = s"$base/xml2"
    Files.createDirectories(java.nio.file.Paths.get(path))
    Files.write(java.nio.file.Paths.get(s"$path/a.xml"),
      "<doc><p>one</p></doc>\n<doc><p>two</p></doc>".getBytes)
    val df = graft.pig.PigScript.query(spark,
      s"""d = LOAD '$path' USING XMLLoader('doc') AS (record:chararray);
          STORE d INTO 'out';""")
    assert(df.as[String].collect().toSet ==
      Set("<doc><p>one</p></doc>", "<doc><p>two</p></doc>"))
  }

  test("XMLLoader without a tag argument fails fast") {
    intercept[IllegalArgumentException] {
      graft.pig.PigScript.query(spark,
        s"d = LOAD '$base/xml2' USING XMLLoader(); STORE d INTO 'out';")
        .count()
    }
  }

  // ---------------- CSVExcelStorage ----------------

  test("csv-excel round trips embedded delimiter, quote, and newline") {
    val path = s"$base/csvx"
    val src = Seq((1, "plain"), (2, "a,b"), (3, "say \"hi\""),
      (4, "line1\nline2")).toDF("id", "s")
    Piggybank.writeCsvExcel(src, path)
    val back = Piggybank.readCsvExcel(spark, path)
      .select(col("_c0").cast("int").as("id"), col("_c1").as("s"))
    assert(back.as[(Int, String)].collect().toMap ===
      src.as[(Int, String)].collect().toMap)
  }

  test("LOAD … USING CSVExcelStorage (fully qualified) parses quoting") {
    val path = s"$base/csvx2"
    Piggybank.writeCsvExcel(
      Seq((1, "a,b"), (2, "c\nd")).toDF("id", "s"), path)
    val df = graft.pig.PigScript.query(spark,
      s"""r = LOAD '$path'
            USING org.apache.pig.piggybank.storage.CSVExcelStorage(',')
            AS (id:int, s:chararray);
          STORE r INTO 'out';""")
    assert(df.as[(Int, String)].collect().toMap ==
      Map(1 -> "a,b", 2 -> "c\nd"))
  }

  test("DEFINE aliases a loader class; alias resolves in LOAD USING") {
    val path = s"$base/seq3"
    Piggybank.writeSequenceFile(
      tables.nation.select(col("n_nationkey").cast("string").as("k"),
        col("n_name").as("v")), "k", "v", path)
    val df = graft.pig.PigScript.query(spark,
      s"""DEFINE seq org.apache.pig.piggybank.storage.SequenceFileLoader();
          raw = LOAD '$path' USING seq AS (nk:int, name:chararray);
          big = FILTER raw BY nk >= 20;
          STORE big INTO 'out';""")
    assert(df.count() ==
      tables.nation.filter(col("n_nationkey") >= 20).count())
  }

  // ---------------- datetime evals ----------------

  test("ISOToUnix / UnixToISO / ISODaysBetween") {
    val df = Seq("2020-03-01 12:34:56.789").toDF("s")
      .select(to_timestamp(col("s")).as("ts"))
      .select(
        Piggybank.isoToUnix(col("ts")).as("ms"),
        Piggybank.unixToIso(Piggybank.isoToUnix(col("ts"))).as("iso"),
        Piggybank.isoDaysBetween(col("ts"),
          lit("2020-02-28").cast("date")).as("days"))
    val r = df.collect()(0)
    assert(r.getAs[Long]("ms") == 1583066096789L)
    assert(r.getAs[String]("iso") == "2020-03-01T12:34:56.789+00:00")
    assert(r.getAs[Long]("days") == 2L)
  }
}
