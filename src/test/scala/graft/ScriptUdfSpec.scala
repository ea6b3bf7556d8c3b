package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, StringType}
import graft.functions.ScriptUdfs
import graft.pig.PigScript

/** Scripting-UDF surface (`REGISTER 'udf' USING <lang> AS ns` +
  * `ns.f(...)` calls): full protocol exercised through the Pig
  * front-end with the in-repo toy JSR-223 engine — the same path a
  * real jython/graal jar would take. */
class ScriptUdfSpec extends SparkSpec {
  import spark.implicits._

  // 'toy' is the built-in reference engine (ScriptUdfs registers it);
  // the spec exercises the same factory path a real jar would take
  ScriptUdfs.registerEngineFactory("toy",
    () => new graft.functions.ToyScriptEngine)

  private def writeScript(): String = {
    val f = java.nio.file.Files.createTempFile("graft_udfs_", ".toy")
    java.nio.file.Files.writeString(f,
      """# schema: double_it double
        |def double_it(x) = x * 2
        |# schema: shout string
        |def shout(s) = s + "!"
        |# schema: add int
        |def add(a, b) = a + b
        |# no schema entry: defaults to string
        |def tag(x) = upper(x)
        |""".stripMargin)
    f.toString
  }

  test("REGISTER USING + namespaced calls: values, declared schemas, executor dispatch") {
    val path = writeScript()
    val df = PigScript.query(spark,
      s"""REGISTER '$path' USING toy AS m;
          O = LOAD '$$DIR/orders.parquet' USING parquet;
          B = FOREACH O GENERATE o_orderkey, m.double_it(o_totalprice) AS d2,
                m.shout(o_orderpriority) AS sh, m.add(o_orderkey, 1) AS nxt,
                m.tag(o_orderpriority) AS tg;""",
      Map("DIR" -> sf))
    val sch = df.schema
    assert(sch("d2").dataType == DoubleType)   // from graft_output_schemas
    assert(sch("sh").dataType == StringType)
    assert(sch("nxt").dataType == IntegerType) // engine Double -> coerced int
    assert(sch("tg").dataType == StringType)   // schema-less default
    val want = tables.orders
      .select($"o_orderkey", ($"o_totalprice" * 2).as("d2"),
        concat($"o_orderpriority", lit("!")).as("sh"),
        ($"o_orderkey" + 1).cast("int").as("nxt"),
        upper($"o_orderpriority").as("tg"))
    assert(df.orderBy("o_orderkey").collect().toSeq ==
      want.orderBy("o_orderkey").collect().toSeq)
  }

  test("script UDFs compose with builtins and filters") {
    val path = writeScript()
    val df = PigScript.query(spark,
      s"""REGISTER '$path' USING toy AS fx;
          O = LOAD '$$DIR/orders.parquet' USING parquet;
          F = FILTER O BY fx.double_it(o_totalprice) > 300000.0;
          B = FOREACH F GENERATE o_orderkey, ROUND(fx.double_it(o_totalprice)) AS r;""",
      Map("DIR" -> sf))
    val want = tables.orders.filter($"o_totalprice" * 2 > 300000.0).count()
    assert(df.count() == want && want > 0)
  }

  test("script UDFs work in nested FOREACH blocks and aggregate FOREACH") {
    val path = writeScript()
    // nested block: UDF inside the inner FILTER predicate
    val nested = PigScript.query(spark,
      s"""REGISTER '$path' USING toy AS fx;
          O = LOAD '$$DIR/orders.parquet' USING parquet;
          G = GROUP O BY o_custkey;
          A = FOREACH G {
            big = FILTER O BY fx.double_it(o_totalprice) > 200000.0;
            GENERATE group AS ck, COUNT(big) AS n_big;
          };""",
      Map("DIR" -> sf))
    val want = tables.orders.filter($"o_totalprice" * 2 > 200000.0)
      .groupBy($"o_custkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = nested.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // nested COUNT counts only matching rows; groups with zero matches
    // report 0 on the Pig side and are absent from the batch groupBy
    assert(got.filter(_._2 > 0) == want)
    // aggregate FOREACH: UDF over the group key after aggregation
    val agged = PigScript.query(spark,
      s"""REGISTER '$path' USING toy AS fx;
          O = LOAD '$$DIR/orders.parquet' USING parquet;
          G = GROUP O BY o_orderpriority;
          A = FOREACH G GENERATE fx.shout(group) AS tag, COUNT(O) AS n;""",
      Map("DIR" -> sf))
    val tags = agged.collect().map(_.getString(0)).toSet
    assert(tags.nonEmpty && tags.forall(_.endsWith("!")))
  }

  test("missing engine fails at the REGISTER line, naming the fix") {
    val path = writeScript()
    val e = intercept[IllegalArgumentException] {
      PigScript.query(spark,
        s"""REGISTER '$path' USING jython AS p;
            O = LOAD '$$DIR/orders.parquet' USING parquet;""",
        Map("DIR" -> sf))
    }
    assert(e.getMessage.contains("no JSR-223 engine"))
    assert(e.getMessage.contains("jython"))
  }

  test("unregistered namespace is a compile-time error") {
    val e = intercept[Exception] {
      PigScript.query(spark,
        s"""O = LOAD '$$DIR/orders.parquet' USING parquet;
            B = FOREACH O GENERATE ghost.f(o_orderkey);""",
        Map("DIR" -> sf)).collect()
    }
    assert(e.getMessage.contains("unknown UDF namespace"))
  }

  test("broken script fails at REGISTER, not mid-job") {
    val f = java.nio.file.Files.createTempFile("graft_udfs_bad_", ".toy")
    java.nio.file.Files.writeString(f, "this is not a definition\n")
    val e = intercept[Exception] {
      PigScript.query(spark, s"REGISTER '$f' USING toy AS bad;\nO = LOAD '$$DIR/orders.parquet' USING parquet;",
        Map("DIR" -> sf))
    }
    assert(e.getMessage.contains("cannot parse"))
  }
}
