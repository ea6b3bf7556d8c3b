package graft

import org.scalatest.funsuite.AnyFunSuite

/** Lints every oracle SQL string in [[SparkEntry.oracleSql]] for the
  * aggregate-typing bug class that cost round 5 its perfect gate:
  * DuckDB types `SUM(INTEGER)` as HUGEINT (int128), which the driver's
  * pandas fetch renders as float64 — so a bare `SUM(x) AS name` output
  * column hashes `12.000000000` against Spark's `12` and fails the
  * hash gate even when every value matches (q124, CORRECTNESS_r05).
  *
  * The rule: an aggregate whose SQL result type differs from Spark's
  * (`SUM`, `AVG`) may not BE an output column on its own — i.e. the
  * balanced `AGG(...)` call immediately followed by `AS alias` must be
  * wrapped in an explicit `CAST( ... AS <type>)`. Aggregates consumed
  * inside arithmetic, `ROUND`, window `OVER` clauses, or comparisons
  * are exempt: their enclosing expression fixes the output type.
  */
class OracleLintSpec extends AnyFunSuite {

  /** End index (exclusive) of the balanced-paren call starting at the
    * `(` at `open`, or -1 if unbalanced. */
  private def closeParen(sql: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i < sql.length) {
      sql.charAt(i) match {
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return i + 1
        case _ =>
      }
      i += 1
    }
    -1
  }

  private val aggStart = "(?i)\\b(SUM|AVG)\\s*\\(".r
  private val asAlias = "(?is)^\\s+AS\\s+\\w+".r

  /** Offenders: (aggregate text, position) for every bare
    * agg-as-output-column not wrapped in CAST. */
  private def offenders(sql: String): Seq[String] =
    aggStart.findAllMatchIn(sql).toSeq.flatMap { m =>
      val open = sql.indexOf('(', m.start)
      val end = closeParen(sql, open)
      val followedByAs = end > 0 && asAlias.findFirstIn(sql.substring(end)).isDefined
      val before = sql.substring(0, m.start).replaceAll("\\s+$", "")
      val castWrapped = before.toUpperCase.endsWith("CAST(")
      if (followedByAs && !castWrapped) Some(sql.substring(m.start, end))
      else None
    }

  test("no oracle outputs a bare uncast SUM/AVG column") {
    val bad = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) => offenders(sql).map(o => s"$name: $o")
    }
    assert(bad.isEmpty,
      s"\nUncast aggregate output columns (wrap in CAST(... AS BIGINT/DOUBLE)):\n  " +
        bad.mkString("\n  "))
  }

  test("the lint itself catches the round-5 q124 shape") {
    val r5 = "SELECT domain, COUNT(*) AS n_docs, SUM(n_chars) AS sum_chars FROM u GROUP BY domain"
    assert(offenders(r5).nonEmpty)
    val fixed = "SELECT domain, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars FROM u GROUP BY domain"
    assert(offenders(fixed).isEmpty)
    // consumed aggregates are exempt: the enclosing expression types them
    assert(offenders("SELECT round(SUM(v), 4) AS t FROM x").isEmpty)
    assert(offenders("SELECT SUM(b) OVER (PARTITION BY k ORDER BY ts) AS s FROM x").isEmpty)
  }
}
