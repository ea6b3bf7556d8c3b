package graft

import org.apache.spark.sql.functions._
import graft.core.{ExampleSynth, GraftSession}

/** ILLUSTRATE example synthesis (the reference lineage's
  * pen.ExampleGenerator behavior): constraint-solved, predicate-verified
  * example rows for Filter steps the sample walk cannot reach. */
class ExampleSynthSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "alpha", 10.0), (2L, "beta", 20.0), (3L, "gamma", 30.0)
  ).toDF("id", "name", "score")

  test("synthesizes a row for an unreachable numeric range filter") {
    val f = docs.filter($"score" < -5.0 && $"id" > 100L)
    assert(f.take(1).isEmpty)
    val row = ExampleSynth.synthesize(f).get
    assert(row.getDouble(row.fieldIndex("score")) < -5.0)
    assert(row.getLong(row.fieldIndex("id")) > 100L)
  }

  test("synthesizes equality + string-predicate conjuncts") {
    val f = docs.filter($"name" === "nope" && $"score" >= 1e9)
    val row = ExampleSynth.synthesize(f).get
    assert(row.getString(row.fieldIndex("name")) == "nope")
    assert(row.getDouble(row.fieldIndex("score")) >= 1e9)
  }

  test("startswith / IN solve through to a verified example") {
    val f1 = docs.filter($"name".startsWith("zzz"))
    assert(ExampleSynth.synthesize(f1).get.getString(1).startsWith("zzz"))
    val f2 = docs.filter($"id".isin(777L, 888L))
    assert(Set(777L, 888L).contains(ExampleSynth.synthesize(f2).get.getLong(0)))
  }

  test("solves through an implicit cast (int col vs double literal)") {
    val ints = Seq(1, 2, 3).toDF("v")
    val f = ints.filter($"v" > lit(1000.0))
    val row = ExampleSynth.synthesize(f).get
    assert(row.getInt(0) > 1000)
  }

  test("OR branches: an unsatisfiable left arm falls through to the right") {
    val f = docs.filter(($"score" > 5.0 && $"score" < 3.0) || $"name" === "synth-me")
    val row = ExampleSynth.synthesize(f).get
    assert(row.getString(row.fieldIndex("name")) == "synth-me")
  }

  test("refuses to fabricate: contradictions and non-filters yield None") {
    assert(ExampleSynth.synthesize(docs.filter($"score" > 5.0 && $"score" < 3.0)).isEmpty)
    // verifier catches shapes the solver does not understand
    assert(ExampleSynth.synthesize(docs.filter(length($"name") === 99)).isEmpty)
    // non-filter roots are out of scope, not an error
    assert(ExampleSynth.synthesize(docs.groupBy($"name").count()).isEmpty)
  }

  test("soundness law: a synthesized row ALWAYS passes the real filter (200 random predicates)") {
    // seeded generator over (id: long, score: double, name: string):
    // random conjunctions, possibly contradictory — the law is only
    // that Some(row) implies df-of-row survives the original filter
    val rnd = new scala.util.Random(7)
    val base = docs.limit(0) // schema-only; sample rows must not matter
    var synthesized = 0
    for (_ <- 1 to 200) {
      def numC(c: org.apache.spark.sql.Column, v: Double) = rnd.nextInt(5) match {
        case 0 => c === v; case 1 => c > v; case 2 => c < v
        case 3 => c >= v; case 4 => c <= v
      }
      val conjs = Seq.newBuilder[org.apache.spark.sql.Column]
      if (rnd.nextBoolean()) conjs += numC($"id".cast("double"), rnd.nextInt(100) - 50)
      if (rnd.nextBoolean()) conjs += numC($"score", (rnd.nextInt(200) - 100) / 4.0)
      if (rnd.nextBoolean()) conjs += (rnd.nextInt(3) match {
        case 0 => $"name" === s"v${rnd.nextInt(10)}"
        case 1 => $"name".startsWith(s"p${rnd.nextInt(10)}")
        case 2 => $"name" > s"m${rnd.nextInt(10)}"
      })
      val cs = conjs.result()
      val cond = if (cs.isEmpty) lit(true) else cs.reduce(_ && _)
      ExampleSynth.synthesize(base.filter(cond)).foreach { row =>
        synthesized += 1
        val one = spark.createDataFrame(
          java.util.List.of(row), base.schema)
        assert(one.filter(cond).count() == 1,
          s"synthesized row $row does not satisfy $cond")
      }
    }
    assert(synthesized > 100, s"solver succeeded only $synthesized/200 times")
  }

  test("ILLUSTRATE renders the synthesized row, clearly marked") {
    val gs = new GraftSession(spark)
    gs.register("D", docs)
    gs.register("F", docs.filter($"score" < -5.0))
    val out = gs.illustrate("F")
    assert(out.contains("-- synthesized"))
    assert(out.linesIterator.exists(l => l.contains("-6.0") && l.contains("synthesized")))
    // and the unsatisfiable case is reported honestly
    gs.register("G", docs.filter($"score" > 5.0 && $"score" < 3.0))
    assert(gs.illustrate("G").contains("no example synthesizable"))
  }
}
