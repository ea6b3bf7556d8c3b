package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.ExplainMode

/** Session wrapper mirroring the reference lineage's incremental
  * alias environment (PigServer-style, SURVEY.md §3.3): each registered
  * alias binds a name to an immutable logical plan; executing an alias
  * compiles just the sub-plan reaching it (Spark does this naturally —
  * a DataFrame IS the logical plan).
  *
  * Unlike the reference (one MapReduce job per blocking boundary with
  * HDFS materialization between jobs), plans here stay declarative and
  * Catalyst/Tungsten handle optimization + pipelining.
  */
final class GraftSession(val spark: SparkSession) {
  private val env = scala.collection.mutable.LinkedHashMap.empty[String, DataFrame]

  /** `A = <plan>;` — rebinding an alias is allowed, like Pig. */
  def register(alias: String, df: DataFrame): this.type = { env(alias) = df; this }

  def apply(alias: String): DataFrame =
    env.getOrElse(alias, throw new NoSuchElementException(s"unknown alias: $alias"))

  def aliases: Seq[String] = env.keys.toSeq

  /** Register a versioned table ([[graft.operators.VersionedTable]])
    * as a SQL-queryable alias, pinned to latest / `VERSION AS OF` /
    * `TIMESTAMP AS OF` — the lakehouse substrate reachable from the
    * SQL entry point (`session.sql("SELECT ... FROM t")`) with the
    * same resolution surface as the Pig front-end's VersionedStorage.
    * Re-register after new commits to move a "latest" binding forward
    * (a registered alias pins the version it resolved, the snapshot-
    * isolation read a concurrent writer must not shift). */
  def registerVersioned(alias: String, dir: String,
      version: Long = -1L,
      asOf: Option[java.sql.Timestamp] = None): this.type = {
    import graft.operators.VersionedTable
    require(version < 0 || asOf.isEmpty,
      "registerVersioned: pass a version OR a timestamp, not both")
    val df = asOf match {
      case Some(ts) => VersionedTable.readAsOf(spark, dir, ts)
      case None if version >= 0 => VersionedTable.readVersion(spark, dir, version)
      case None => VersionedTable.read(spark, dir)
    }
    register(alias, df)
  }

  /** DESCRIBE — schema of the alias. */
  def describe(alias: String): String = {
    // render the bignum struct rep by its Pig type name — users see
    // `biginteger`, not the internal {sort_key, text} carrier
    val tree = apply(alias).schema.treeString
    tree.replace(
      "struct (nullable = true)\n |    |-- __bn_k: string (nullable = true)\n" +
        " |    |-- __bn_s: string (nullable = true)",
      "biginteger (nullable = true)")
  }

  /** EXPLAIN — formatted physical plan (Catalyst's, richer than the
    * reference's logical/physical/MR dump). */
  def explain(alias: String): String =
    apply(alias).queryExecution.explainString(ExplainMode.fromString("formatted"))

  /** DUMP — driver-side iterator over results (bounded use only). */
  def dump(alias: String, n: Int = 20): Array[org.apache.spark.sql.Row] =
    apply(alias).take(n)

  /** STORE — write an alias out. */
  def store(alias: String, path: String, format: String = "parquet"): Unit =
    apply(alias).write.format(format).mode("overwrite").save(path)

  /** ILLUSTRATE — example tuples for the alias and every alias bound
    * before it, in registration order: a cheap walk of the pipeline
    * showing what each step's rows look like (schema + up to `n`
    * example rows). Spark-first rendition of the reference's
    * ILLUSTRATE: each sample is a `take(n)` — limit-pushdown keeps it
    * interactive even over large inputs — and a row that reaches step k
    * IS an example that survived steps 1..k-1. When a Filter step kills
    * every sampled row, [[ExampleSynth]] supplies the reference's
    * `pen.ExampleGenerator` behavior: a constraint-synthesized,
    * predicate-verified example, clearly marked as synthesized. */
  def illustrate(alias: String, n: Int = 5): String = {
    apply(alias) // fail fast on unknown alias
    val chain = env.keys.toSeq.takeWhile(_ != alias) :+ alias
    val sb = new StringBuilder
    def render(row: org.apache.spark.sql.Row): String =
      row.toSeq.map {
        case null => "null"
        case s: String => s"'$s'"
        case v => v.toString
      }.mkString(", ")
    chain.foreach { a =>
      val df = env(a)
      val names = df.schema.fields.map(f => s"${f.name}:${f.dataType.simpleString}")
      sb.append(s"$a: {${names.mkString(", ")}}\n")
      val sampled = df.take(n)
      sampled.foreach(row => sb.append("  (").append(render(row)).append(")\n"))
      if (sampled.isEmpty) ExampleSynth.synthesize(df) match {
        case Some(row) =>
          sb.append("  (").append(render(row))
            .append(")  -- synthesized: no input row reaches this step\n")
        case None =>
          sb.append("  -- empty (no example synthesizable)\n")
      }
    }
    sb.toString
  }

  /** Expose every registered alias as a temp view and run SQL against
    * them — the PigServer `registerQuery`/`openIterator` programmatic
    * entry point (SURVEY §3.3), with Spark SQL as the query language. */
  def sql(query: String): DataFrame =
      GraftSession.sqlLockFor(spark).synchronized {
    // atomic register+analyze: spark.sql resolves the views eagerly, so
    // once this block returns the plan no longer depends on the temp
    // views and a concurrent caller (e.g. parallel Verify) re-binding
    // the same names cannot corrupt it
    env.foreach { case (alias, df) => df.createOrReplaceTempView(alias) }
    spark.sql(query)
  }
}

object GraftSession {

  // one lock PER SparkSession, not global: temp views are scoped to
  // their session catalog, so only GraftSessions sharing a
  // SparkSession can corrupt each other's register+analyze window —
  // independent sessions (concurrent-serving) must not serialize
  // (weak keys: a dropped SparkSession must not be pinned by its lock)
  private val sqlLocks =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession, Object]
  private[core] def sqlLockFor(
      s: org.apache.spark.sql.SparkSession): Object = sqlLocks.synchronized {
    var l = sqlLocks.get(s)
    if (l == null) { l = new Object; sqlLocks.put(s, l) }
    l
  }

  /** Materialize a DataFrame and truncate its lineage — the iteration
    * primitive behind pageRank, pair-clustering, k-means, BPE training
    * and the two-pass rank (anywhere a plan would otherwise grow
    * `iters` deep or be recomputed per downstream job).
    *
    * Default = localCheckpoint: blocks live in executor storage
    * (memory, spilling to local disk), no distributed-FS round trip —
    * correct on local[*] and the fastest option on a healthy cluster,
    * but NOT fault-tolerant: lineage is gone, so a lost executor makes
    * the blocks unrecoverable and fails the job (Spark can't recompute
    * what it no longer knows how to derive).
    *
    * On a real multi-node cluster, set a checkpoint directory once
    * (`spark.sparkContext.setCheckpointDir("hdfs://…/ckpt")`): every
    * iterative operator in the library then switches to RELIABLE
    * checkpoints (replicated-FS-backed, executor-loss-safe) through
    * this single switch — no per-operator flags. See SCALE.md
    * ("Lineage truncation") for the tradeoff discussion.
    *
    * `eager=false` defers materialization to the first action, for
    * call sites that truncate lineage but may never execute (e.g. a
    * branch the caller might discard). */
  def materialize(df: DataFrame, eager: Boolean = true): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager)
    else df.localCheckpoint(eager)

  /** RDD counterpart of [[materialize]] (rankBy's stats pass is the one
    * RDD-level truncation in the library). Both variants mark the RDD
    * and materialize at its next action; the reliable branch persists
    * first so checkpointing doesn't recompute the job (and re-fire its
    * accumulators). */
  def materializeRdd[T](rdd: org.apache.spark.rdd.RDD[T]): org.apache.spark.rdd.RDD[T] =
    if (rdd.sparkContext.getCheckpointDir.isDefined) {
      rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      rdd.checkpoint(); rdd
    } else rdd.localCheckpoint()

  /** Chainable form of [[materialize]] for operator pipelines:
    * `import graft.core.GraftSession.Materialize` then
    * `df.groupBy(…).agg(…).materialized()`. */
  implicit class Materialize(private val df: DataFrame) extends AnyVal {
    def materialized(eager: Boolean = true): DataFrame =
      GraftSession.materialize(df, eager)
  }

  /** Scale-oriented defaults applied to every session this engine builds:
    * AQE (runtime re-plan: skew-join splitting, partition coalescing,
    * broadcast demotion), nested-schema pruning so struct/map accesses
    * prune at the parquet scan, UTC timestamps. */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    // native kernels as SQL functions + the bignum carrier-unwrap
    // optimizer rule (graft.plans.SimplifyBigNumCarriers)
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.parquet.aggregatePushdown", "true")
    // events.parquet carries TIMESTAMP(NANOS) which the vectorized reader
    // rejects; read as long and convert in Tables.events.
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // fixture timestamps are TIMESTAMP(isAdjustedToUTC=false) micros;
    // Spark 4's default infers those as TIMESTAMP_NTZ, which breaks
    // TIMESTAMP-typed consumers (unix_micros, getTimestamp) and diverges
    // from the DuckDB oracle's naive-timestamp reading. Infer as
    // TIMESTAMP (session tz is UTC, so values are identical).
    .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    // Spark 4.1 routes lower/upper through ICU case mappings whose class
    // init burns ~1 CPU-minute on first use and is slower per call; the
    // JVM fast path matches DuckDB's non-ICU lower() on our data.
    .config("spark.sql.icu.caseMappings.enabled", "false")

  def local(cores: Int = 4): GraftSession = {
    val spark = configure(
      SparkSession.builder()
        .master(s"local[$cores]")
        .appName("graft")
        .config("spark.sql.shuffle.partitions", cores.toString)
        .config("spark.ui.enabled", "false")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new GraftSession(spark)
  }
}
