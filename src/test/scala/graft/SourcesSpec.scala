package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** §2.1 source/sink coverage: every Load/StoreFunc class the reference
  * ships maps to a built-in Spark format — prove the round trips. */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = Files.createTempDirectory("sources").toString
  private lazy val orig = tables.orders
    .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice")

  private def roundTrip(format: String, opts: Map[String, String] = Map.empty): Unit = {
    val path = s"$base/$format"
    orig.write.format(format).options(opts).mode("overwrite").save(path)
    val back = spark.read.format(format).options(opts)
      .schema(orig.schema).load(path)
    assert(back.count() == orig.count())
    assert(back.exceptAll(orig).count() == 0, s"$format round trip diverged")
  }

  test("parquet round trip (primary format / BinStorage interchange)") { roundTrip("parquet") }
  test("orc round trip (OrcStorage)") { roundTrip("orc") }
  test("avro round trip (AvroStorage) — explicit provider class") {
    // spark-sql ships AvroFileFormat itself; only the spark-avro module's
    // META-INF service registration (which makes the bare name "avro"
    // resolvable) is absent in this image. The explicit provider class is
    // the documented fallback — same format, same files.
    roundTrip(graft.Engine.AvroFormat)
  }
  test("json round trip (JsonLoader/JsonStorage)") { roundTrip("json") }
  test("csv round trip with delimiter (PigStorage)") {
    roundTrip("csv", Map("delimiter" -> "|", "header" -> "false"))
  }

  test("partitioned write prunes partitions at read (PartitionFilters)") {
    val path = s"$base/docs_by_lang"
    tables.documents.write.partitionBy("lang").mode("overwrite").parquet(path)
    val df = spark.read.parquet(path).filter($"lang" === "en").select($"doc_id")
    val n = df.count()
    assert(n > 0 && n < tables.documents.count())
    val plan = df.queryExecution.executedPlan.toString
    // the lang predicate must prune directories, not filter rows post-scan
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      s"no partition pruning in plan:\n$plan")
  }

  test("bucketed tables co-locate the join: no shuffle exchange on the keys") {
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    tables.lineitem.select($"l_orderkey", $"l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
    tables.orders.select($"o_orderkey", $"o_orderstatus")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"), $"l_orderkey" === $"o_orderkey")
    val n = joined.count()
    assert(n == tables.lineitem.count()) // FK totality in the fixture
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    // both sides pre-bucketed on the key -> SMJ with zero repartitioning;
    // at 100 TB this is the shuffle you design away
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
  }

  test("DSv2 connector: schema inference, projection + predicate pushdown (LoadFunc surface)") {
    val df = spark.read.format("graft.sources.SyntheticDocs")
      .option("rows", 1000).option("partitions", 4).load()
    assert(df.schema.fieldNames.toSeq == Seq("doc_id", "lang", "text"))
    assert(df.count() == 1000)
    // predicate pushdown: the doc_id range narrows the GENERATED range
    val filtered = df.filter($"doc_id" >= 900 && $"doc_id" < 950).select($"doc_id", $"lang")
    assert(filtered.count() == 50)
    val plan = filtered.queryExecution.executedPlan.toString
    // scan description proves the source saw the narrowed range and the
    // pruned column set (the filter/projection did not run post-scan)
    assert(plan.contains("range=[900,950)"), s"filter not pushed:\n$plan")
    assert(plan.contains("cols=doc_id,lang"), s"columns not pruned:\n$plan")
    // determinism: same ids -> same content on every read
    val a = df.filter($"doc_id" === 123).select($"text").as[String].head()
    val b = spark.read.format("graft.sources.SyntheticDocs").option("rows", 1000).load()
      .filter($"doc_id" === 123).select($"text").as[String].head()
    assert(a == b && a.nonEmpty)
  }

  test("delimited text with positional columns (schema-less PigStorage load)") {
    val path = s"$base/pigstorage"
    orig.write.option("delimiter", "\t").mode("overwrite").csv(path)
    val pos = Engine.loadDelimited(spark, path, "\t") // _c0, _c1, ... all strings
    assert(pos.columns.toSeq == Seq("_c0", "_c1", "_c2", "_c3"))
    // lazy typing: cast at use site (SURVEY §1.3)
    assert(pos.select(sum($"_c0".cast("long"))).as[Long].head() ==
      orig.select(sum($"o_orderkey")).as[Long].head())
  }
}
