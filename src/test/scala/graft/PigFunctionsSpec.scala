package graft

import org.apache.spark.sql.functions._
import graft.functions.PigFunctions._

/** Pig-semantics shims: each test pins a semantic delta called out in
  * SURVEY.md §7.5.3 (full-match regex, 0-based indices, durations). */
class PigFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("matchesFull is a whole-string match, unlike rlike") {
    val df = Seq("1-URGENT", "NOT-1-URGENT-ISH").toDF("s")
    val got = df.select(matchesFull($"s", "1-.*").as("m")).as[Boolean].collect()
    assert(got.toSeq == Seq(true, false))
  }

  test("substringPig is 0-based with exclusive stop") {
    val df = Seq("hello world").toDF("s")
    assert(df.select(substringPig($"s", 0, 5)).as[String].head() == "hello")
    assert(df.select(substringPig($"s", 6, 11)).as[String].head() == "world")
  }

  test("indexOfPig / lastIndexOfPig are 0-based, -1 when absent") {
    val df = Seq("abcabc").toDF("s")
    assert(df.select(indexOfPig($"s", "b").cast("int")).as[Int].head() == 1)
    assert(df.select(indexOfPig($"s", "z").cast("int")).as[Int].head() == -1)
    assert(df.select(lastIndexOfPig($"s", "b").cast("int")).as[Int].head() == 4)
    assert(df.select(lastIndexOfPig($"s", "z").cast("int")).as[Int].head() == -1)
  }

  test("tokenize drops empty tokens") {
    val df = Seq("a  b\t c ").toDF("s")
    assert(df.select(tokenize($"s")).as[Seq[String]].head() == Seq("a", "b", "c"))
  }

  test("addDuration handles mixed ISO-8601 designators") {
    val df = Seq("2024-01-01 00:00:00").toDF("s")
      .select(to_timestamp($"s").as("t"))
    val got = df.select(addDuration($"t", "P1DT2H30M").cast("string")).as[String].head()
    assert(got == "2024-01-02 02:30:00")
  }

  test("xBetween family truncates whole units like Joda") {
    val df = Seq(("2024-03-15 12:30:45", "2024-01-01 00:00:00")).toDF("a", "b")
      .select(to_timestamp($"a").as("a"), to_timestamp($"b").as("b"))
    assert(df.select(daysBetween($"a", $"b")).as[Long].head() == 74L)
    assert(df.select(hoursBetween($"a", $"b")).as[Long].head() == 74L * 24 + 12)
    assert(df.select(weeksBetween($"a", $"b")).as[Long].head() == 10L)
    assert(df.select(monthsBetweenPig($"a", $"b")).as[Long].head() == 2L)
    assert(df.select(yearsBetween($"a", $"b")).as[Long].head() == 0L)
    assert(df.select(secondsBetween($"a", $"b")).as[Long].head() ==
      (74L * 24 + 12) * 3600 + 30 * 60 + 45)
  }

  test("getWeekYear follows ISO week-year at year boundaries") {
    // 2024-12-30 is ISO week 1 of 2025; 2021-01-01 is ISO week 53 of 2020
    val df = Seq("2024-12-30", "2021-01-01", "2024-06-15").toDF("s")
      .select(to_timestamp($"s").as("t"))
    val got = df.select(getWeekYear($"t")).as[Int].collect().toSeq
    assert(got == Seq(2025, 2020, 2024))
  }

  test("topN picks n largest by field") {
    val df = Seq(Seq((1, "a"), (5, "b"), (3, "c"))).toDF("bag")
      .select($"bag".cast("array<struct<v:int,s:string>>").as("bag"))
    val got = df.select(topN($"bag", "v", 2).getField("v")).as[Seq[Int]].head()
    assert(got == Seq(5, 3))
  }

  test("intDiv truncates toward zero like Pig/Java") {
    val df = Seq((7, 2), (-7, 2)).toDF("a", "b")
    assert(df.select(intDiv($"a", $"b")).as[Long].collect().toSeq == Seq(3L, -3L))
  }

  test("TOBAG/TOTUPLE/TOMAP constructors and BagToTuple flattening") {
    val df = Seq((1, "x", 2.5)).toDF("a", "b", "c")
    assert(df.select(toBag($"a", $"a" + 1)).as[Seq[Int]].head() == Seq(1, 2))
    assert(df.select(toTuple($"a", $"b").getField("b")).as[String].head() == "x")
    val m = toMapPig(lit("k1"), $"b", lit("k2"), lit("y"))
    assert(df.select(element_at(m, "k1")).as[String].head() == "x")
    assert(df.select(keySet(m)).as[Seq[String]].head().toSet == Set("k1", "k2"))
    val bags = Seq(Seq((1, "p"), (2, "q"))).toDF("bag")
      .select($"bag".cast("array<struct<v:int,s:string>>").as("bag"))
    assert(bags.select(bagToTuple($"bag", "s")).as[Seq[String]].head() == Seq("p", "q"))
  }

  test("pluckTuple keeps only prefix-named columns") {
    val df = Seq((1, 2, 3)).toDF("a_x", "a_y", "b_z")
    assert(graft.operators.Relational.pluckTuple(df, "a_").columns.toSeq == Seq("a_x", "a_y"))
  }

  test("castPig nulls a failed cast (Pig semantics) where ANSI cast throws") {
    val df = Seq("42", "abc", "7.9").toDF("s")
    // ANSI default: plain cast fails the job on 'abc'
    intercept[Throwable] { df.select($"s".cast("int")).collect() }
    val got = df.select(castPig($"s", "int")).as[Option[Int]].collect().toSeq
    assert(got == Seq(Some(42), None, None)) // '7.9' is not an int literal either
  }
}
