package graft

import org.apache.spark.sql.functions._
import graft.operators.{Relational, StreamThrough}

class OperatorEdgeSpec extends SparkSpec {
  import spark.implicits._

  test("assertRows passes valid data through unchanged") {
    val df = Seq(1, 2, 3).toDF("v")
    assert(Relational.assertRows(df, $"v" > 0, "positive").count() == 3)
  }

  test("assertRows fails the job on violation") {
    val df = Seq(1, -2, 3).toDF("v")
    // wrapped as SparkException from a task, or SparkRuntimeException
    // when the plan collapses to a local scan — either way it fails
    val e = intercept[Throwable] {
      Relational.assertRows(df, $"v" > 0, "positive").count()
    }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("|")
    assert(msgs.contains("ASSERT failed"))
  }

  test("StreamThrough pipes rows through an external command") {
    val df = Seq((1L, "abc"), (2L, "xyz")).toDF("id", "s")
    val out = StreamThrough(df, Seq("tr", "a-z", "A-Z"), Seq("id", "s_up"))
    val got = out.as[(String, String)].collect().toSet
    assert(got == Set(("1", "ABC"), ("2", "XYZ")))
  }

  test("StreamThrough surfaces a nonzero exit as a task failure") {
    val df = Seq((1L, "a")).toDF("id", "s")
    val e = intercept[org.apache.spark.SparkException] {
      StreamThrough(df, Seq("false"), Seq("x")).count()
    }
    assert(e.getMessage.contains("exited") || e.getCause != null)
  }

  test("bloomSemiFilter keeps all true matches (no false negatives)") {
    val big = tables.lineitem
    val small = tables.orders.filter($"o_orderpriority" === "1-URGENT").select($"o_orderkey")
    val pre = Relational.bloomSemiFilter(big, "l_orderkey", small, "o_orderkey",
      expectedItems = 10000L)
    val exact = big.join(small, $"l_orderkey" === $"o_orderkey", "left_semi")
    // bloom pass is a superset of the exact semi join
    assert(pre.join(small, $"l_orderkey" === $"o_orderkey", "left_semi").count() == exact.count())
    assert(pre.count() >= exact.count())
  }

  test("weighted_avg Aggregator is partition-count invariant") {
    graft.functions.Aggregators.register(spark)
    val li = tables.lineitem
    val r1 = li.repartition(1).groupBy($"l_returnflag")
      .agg(expr("weighted_avg(l_extendedprice, l_quantity)").as("w")).as[(String, Double)].collect().toMap
    val r13 = li.repartition(13).groupBy($"l_returnflag")
      .agg(expr("weighted_avg(l_extendedprice, l_quantity)").as("w")).as[(String, Double)].collect().toMap
    assert(r1 == r13) // exact integer buffer -> identical at any parallelism
  }
}
