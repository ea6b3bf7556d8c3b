package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference lineage's scalar builtin library re-expressed as
  * `Column => Column` combinators over `org.apache.spark.sql.functions`
  * (SURVEY.md §2.6). Everything here stays inside whole-stage codegen —
  * no Scala UDFs on these paths.
  *
  * Semantics shims (SURVEY.md §7.5.3) — places where the reference's
  * semantics differ from Spark's defaults:
  *  - `MATCHES` is a FULL match, Spark `rlike` is a find() —> wrap the
  *    pattern in `^(?:...)$`.
  *  - `SUBSTRING(s, start, stop)` is 0-based with exclusive stop; Spark
  *    `substring` is 1-based with a length.
  *  - `INDEXOF` is 0-based (-1 when absent); Spark `instr` is 1-based
  *    (0 when absent).
  *  - int/int division truncates in the reference —> `div` discipline.
  *  - `ROUND` is HALF_UP — Spark `round` matches (NOT `bround`).
  */
object PigFunctions {

  // ---------------- string ----------------

  /** Pig `x MATCHES 'regex'` — whole-string regex match. */
  def matchesFull(c: Column, regex: String): Column =
    c.rlike("^(?:" + regex + ")$")

  /** Pig SUBSTRING(str, startIndex, stopIndex): 0-based, stop exclusive. */
  def substringPig(c: Column, start: Int, stop: Int): Column =
    substring(c, start + 1, math.max(0, stop - start))

  /** Pig INDEXOF(str, sub): 0-based index of first occurrence, -1 if absent. */
  def indexOfPig(c: Column, sub: String): Column =
    instr(c, sub) - 1

  /** Pig LAST_INDEX_OF(str, sub): 0-based index of last occurrence. */
  def lastIndexOfPig(c: Column, sub: String): Column = {
    val len = length(c)
    val revIdx = instr(reverse(c), sub.reverse)
    when(revIdx === 0, lit(-1)).otherwise(len - revIdx - lit(sub.length) + 1)
  }

  /** Pig STRSPLIT(str, regex) — returns a tuple in Pig; array here. */
  def strSplit(c: Column, regex: String): Column = split(c, regex)

  /** Pig TOKENIZE(str) — whitespace-split bag of words, empties dropped. */
  def tokenize(c: Column): Column =
    filter(split(c, "\\s+"), t => t =!= lit(""))

  /** Pig EqualsIgnoreCase. */
  def equalsIgnoreCase(a: Column, b: Column): Column = lower(a) === lower(b)

  /** Pig REGEX_EXTRACT(str, regex, groupIdx) — 1-based group index, like
    * java.util.regex.Matcher.group(i); maps 1:1 to regexp_extract. */
  def regexExtract(c: Column, regex: String, group: Int): Column =
    regexp_extract(c, regex, group)

  /** Pig SPRINTF(format, args...) — printf-style formatting. */
  def sprintf(format: String, args: Column*): Column = format_string(format, args: _*)

  /** Pig UCFIRST — uppercase the first character only (initcap touches
    * every word; this does not). */
  def ucfirst(c: Column): Column = concat(upper(substring(c, 1, 1)), substring(c, 2, Int.MaxValue))

  /** Pig REGEX_EXTRACT_ALL(str, regex) — all groups of the single match
    * as a tuple; array here (group 0 excluded, like Pig). */
  def regexExtractAll(c: Column, regex: String, numGroups: Int): Column =
    array((1 to numGroups).map(i => regexp_extract(c, regex, i)): _*)

  /** Pig STARTSWITH / ENDSWITH. */
  def startsWithPig(c: Column, prefix: String): Column = c.startsWith(prefix)
  def endsWithPig(c: Column, suffix: String): Column = c.endsWith(suffix)

  // ---------------- arithmetic ----------------

  /** Pig ROUND_TO(val, digits) — HALF_UP to a digit count. */
  def roundTo(c: Column, digits: Int): Column = round(c, digits)

  def cbrtPig(c: Column): Column = cbrt(c)

  /** Pig int/int division truncates toward zero (SQL `div`). */
  def intDiv(a: Column, b: Column): Column =
    try_divide(a.cast("long"), b.cast("long")).cast("long")

  /** Pig ROUND — HALF_UP, which Spark `round` also is. */
  def roundPig(c: Column, scale: Int = 0): Column = round(c, scale)

  // ---------------- datetime ----------------

  /** Whole units in a − b, truncated TOWARD ZERO — Joda (and therefore
    * Pig) `Days.daysBetween` semantics: -1.5 days is -1, not -2. A
    * `floor` would round toward −∞ and differ on every negative
    * interval; the double division is exact here (|seconds| ≲ 2^40 ≪
    * 2^52), so the long cast is the truncation. */
  private def unitsBetween(a: Column, b: Column, unitSeconds: Long): Column =
    ((unix_timestamp(a) - unix_timestamp(b)) / unitSeconds).cast("long")

  /** Pig DaysBetween(dt1, dt2): whole days in dt1 - dt2 (toward zero). */
  def daysBetween(a: Column, b: Column): Column = unitsBetween(a, b, 86400L)

  def hoursBetween(a: Column, b: Column): Column = unitsBetween(a, b, 3600L)

  def minutesBetween(a: Column, b: Column): Column = unitsBetween(a, b, 60L)

  def secondsBetween(a: Column, b: Column): Column =
    (unix_timestamp(a) - unix_timestamp(b)).cast("long")

  def weeksBetween(a: Column, b: Column): Column = unitsBetween(a, b, 7L * 86400L)

  /** Pig MonthsBetween — whole months (Joda truncates toward zero). */
  def monthsBetweenPig(a: Column, b: Column): Column =
    months_between(a, b).cast("long")

  def yearsBetween(a: Column, b: Column): Column =
    (months_between(a, b) / 12.0).cast("long")

  /** Pig GetWeek (ISO week-of-year) / GetWeekYear. */
  def getWeek(c: Column): Column = weekofyear(c)
  /** ISO week-year = the year of that week's Thursday. */
  def getWeekYear(c: Column): Column = {
    val isoDow = (dayofweek(c) + lit(5)) % 7 // Monday=0 .. Sunday=6
    year(date_add(c, (lit(3) - isoDow).cast("int")))
  }

  /** Pig ToUnixTime / ToMilliSeconds. */
  def toUnixTime(c: Column): Column = unix_timestamp(c)
  def toMilliSeconds(c: Column): Column = (unix_millis(c)).cast("long")

  /** Pig AddDuration(dt, 'ISO-8601') for day/hour/minute/second grain.
    * Coarser grains (P1M, P1Y) use months; mixed designators supported
    * for the common forms (e.g. P1DT2H30M). */
  def addDuration(dt: Column, iso: String): Column = {
    val p = """^P(?:(\d+)Y)?(?:(\d+)M)?(?:(\d+)D)?(?:T(?:(\d+)H)?(?:(\d+)M)?(?:(\d+)S)?)?$""".r
    iso match {
      case p(y, mo, d, h, mi, s) =>
        def n(x: String): Int = Option(x).map(_.toInt).getOrElse(0)
        dt + make_interval(
          lit(n(y)), lit(n(mo)), lit(0), lit(n(d)), lit(n(h)), lit(n(mi)), lit(n(s)))
      case _ => throw new IllegalArgumentException(s"unsupported ISO-8601 duration: $iso")
    }
  }

  def subtractDuration(dt: Column, iso: String): Column = {
    val added = addDuration(lit("1970-01-01 00:00:00").cast("timestamp"), iso)
    val delta = added - lit("1970-01-01 00:00:00").cast("timestamp")
    dt - delta
  }

  // ---------------- bag / tuple / map ----------------

  /** Pig SIZE over a bag/tuple — element count. */
  def sizeOf(c: Column): Column = coalesce(size(c), lit(0))

  /** Pig IsEmpty(bag). */
  def isEmptyBag(c: Column): Column = coalesce(size(c), lit(0)) === 0

  /** Pig BagToString(bag, delim). */
  def bagToString(c: Column, delim: String): Column = array_join(c, delim)

  /** Pig TOP(n, sortField, bag-of-structs): n largest elements by field.
    * Compiled to array_sort with a descending comparator + slice — runs
    * inside codegen, no shuffle, no UDF. */
  def topN(bag: Column, field: String, n: Int): Column = {
    val sortedDesc = array_sort(bag, (l, r) =>
      when(l.getField(field) > r.getField(field), lit(-1))
        .when(l.getField(field) < r.getField(field), lit(1))
        .otherwise(lit(0)))
    slice(sortedDesc, 1, n)
  }

  /** Pig SUBTRACT(bag1, bag2) — elements of bag1 not in bag2. */
  def bagSubtract(a: Column, b: Column): Column = array_except(a, b)

  /** Pig UniqueID — unique-per-row id (nondeterministic across runs,
    * like the reference's task-id + sequence scheme). */
  def uniqueId(): Column = concat_ws("-",
    spark_partition_id().cast("string"), monotonically_increasing_id().cast("string"))

  /** Pig DIFF(bag1, bag2) — elements in exactly one of the two bags. */
  def bagDiff(a: Column, b: Column): Column =
    array_union(array_except(a, b), array_except(b, a))

  /** Pig KEYSET / VALUELIST / VALUESET over maps. */
  def keySet(m: Column): Column = map_keys(m)
  def valueList(m: Column): Column = map_values(m)
  def valueSet(m: Column): Column = array_distinct(map_values(m))

  /** TOBAG(e1, e2, …) — bag from scalars (Pig o.a.p.builtin.TOBAG). */
  def toBag(cols: Column*): Column = array(cols: _*)

  /** TOTUPLE(e1, e2, …) — tuple from scalars (o.a.p.builtin.TOTUPLE). */
  def toTuple(cols: Column*): Column = struct(cols: _*)

  /** TOMAP(k1, v1, k2, v2, …) — map from alternating key/value args
    * (o.a.p.builtin.TOMAP). */
  def toMapPig(kv: Column*): Column = map(kv: _*)

  /** BagToTuple({(a),(b),(c)}) flattens a bag of tuples into one tuple
    * (o.a.p.builtin.BagToTuple); for a bag of structs we flatten the
    * named field into an array — the closest faithful shape when the
    * element count is data-dependent. */
  def bagToTuple(bag: Column, field: String): Column =
    transform(bag, t => t.getField(field))

  /** Pig cast semantics: a failed cast yields NULL (with a warning in
    * the reference), it never fails the job. Spark 4 defaults to ANSI
    * mode where `cast('abc' as int)` THROWS — dirty data that a Pig
    * script shrugs off would kill the Spark job. `try_cast` restores
    * the reference behavior per-expression without giving up ANSI's
    * saner arithmetic everywhere else. */
  def castPig(c: Column, dataType: String): Column = c.try_cast(dataType)
}
