package graft.functions

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.api.java.{UDF0, UDF1, UDF2, UDF3, UDF4, UDF5}
import org.apache.spark.sql.functions.call_udf
import org.apache.spark.sql.types._

/** Scripting UDFs (SURVEY §2.6: `REGISTER 'udf.py' USING jython AS ns` —
  * the reference lineage's `o.a.p.scripting.*` surface) rebuilt on
  * JSR-223, the JVM's standard script-engine API (which is exactly how
  * the reference hosts jython/js/groovy).
  *
  * Cluster-shape contract: an engine instance is neither serializable
  * nor thread-safe, so ONLY `(language, source)` travels in the UDF
  * closure; every executor thread lazily instantiates + evaluates its
  * own engine on first call (thread-local), the same
  * ship-source-not-state design the reference uses for its script
  * engines. Function dispatch is `javax.script.Invocable`.
  *
  * Output schemas: the reference reads a per-function `@outputSchema`
  * decorator. JSR-223 has no portable decorator reflection, so the
  * convention here is a `graft_output_schemas` engine binding — a
  * `Map[functionName -> DDL type]` the script (or engine) publishes;
  * functions without an entry default to `string` (the analogue of
  * Pig's default-to-bytearray).
  *
  * This sandbox ships NO engine (Nashorn left the JDK in 15, no
  * jython/graal jars offline) — `newEngine` then fails with a clear
  * message naming the fix. The protocol itself is fully exercised by
  * the spec's in-repo toy JSR-223 engine; dropping a real engine jar on
  * the classpath changes nothing in this file.
  */
object ScriptUdfs {

  type EngineFactory = () => javax.script.ScriptEngine

  /** Extension hook: languages resolvable without a classpath engine
    * (tests; embedders with custom engines). Checked before JSR-223
    * discovery. Keyed lowercase. */
  private val factories = TrieMap.empty[String, EngineFactory]
  // built-in: the in-repo reference engine (see [[ToyScriptEngine]]),
  // always resolvable — the protocol's oracle-checkable path (q201)
  factories("toy") = () => new ToyScriptEngine

  /** Driver-side namespace registry: ns -> (language, source). Script-
    * scoped in Pig; JVM-scoped here with last-wins rebinding (same as
    * alias rebinding semantics). */
  private val namespaces = TrieMap.empty[String, (String, String)]

  def registerEngineFactory(lang: String, f: EngineFactory): Unit =
    factories(lang.toLowerCase) = f

  def newEngine(lang: String): javax.script.ScriptEngine =
    factories.get(lang.toLowerCase).map(_())
      .orElse(Option(new javax.script.ScriptEngineManager().getEngineByName(lang)))
      .getOrElse(throw new IllegalArgumentException(
        s"no JSR-223 engine for language '$lang' on the classpath — add the " +
          "engine jar (e.g. jython-standalone for 'jython', graaljs for " +
          "'javascript') or registerEngineFactory(...)"))

  /** One evaluated engine per (thread, language, source-hash): threads
    * never share an engine, so no synchronization in the hot path. */
  private final case class Evaluated(engine: javax.script.ScriptEngine,
      schemas: Map[String, DataType])

  private val perThread: ThreadLocal[scala.collection.mutable.Map[(String, String), Evaluated]] =
    ThreadLocal.withInitial(() => scala.collection.mutable.Map.empty)

  private def sha(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def evaluated(lang: String, source: String): Evaluated =
    perThread.get().getOrElseUpdate((lang.toLowerCase, sha(source)), {
      val e = newEngine(lang)
      e.eval(source)
      val schemas = Option(e.getBindings(javax.script.ScriptContext.ENGINE_SCOPE)
          .get("graft_output_schemas")) match {
        case Some(m: java.util.Map[_, _]) =>
          m.asScala.map { case (k, v) =>
            k.toString -> org.apache.spark.sql.types.DataType.fromDDL(v.toString)
          }.toMap
        case _ => Map.empty[String, DataType]
      }
      Evaluated(e, schemas)
    })

  /** REGISTER 'script' USING lang AS ns — driver-side: eagerly evaluate
    * once (fail fast on a missing engine or a broken script), then bind
    * the namespace. */
  def loadNamespace(ns: String, lang: String, source: String): Unit = {
    evaluated(lang, source)
    namespaces(ns) = (lang, source)
  }

  def returnTypeOf(ns: String, fn: String): DataType = {
    val (lang, source) = namespaceOrThrow(ns)
    evaluated(lang, source).schemas.getOrElse(fn, StringType)
  }

  private def namespaceOrThrow(ns: String): (String, String) =
    namespaces.getOrElse(ns, throw new IllegalArgumentException(
      s"unknown UDF namespace '$ns' — REGISTER '<script>' USING <lang> AS $ns first"))

  /** Executor-side entry: invoked from the Spark UDF wrapper. */
  def call(lang: String, source: String, fn: String, dt: DataType,
      args: Array[AnyRef]): AnyRef = {
    val ev = evaluated(lang, source)
    val raw = ev.engine.asInstanceOf[javax.script.Invocable]
      .invokeFunction(fn, args: _*)
    coerce(raw, dt)
  }

  /** Engines hand back boxed Java types of THEIR choosing (jython ints
    * arrive as BigInteger, js numbers as Double); coerce to the
    * declared schema so the row encoder never sees a surprise. */
  private def coerce(v: AnyRef, dt: DataType): AnyRef = (v, dt) match {
    case (null, _) => null
    case (n: java.lang.Number, IntegerType) => Integer.valueOf(n.intValue())
    case (n: java.lang.Number, LongType) => java.lang.Long.valueOf(n.longValue())
    case (n: java.lang.Number, DoubleType) => java.lang.Double.valueOf(n.doubleValue())
    case (n: java.lang.Number, FloatType) => java.lang.Float.valueOf(n.floatValue())
    case (n: java.lang.Number, ShortType) => java.lang.Short.valueOf(n.shortValue())
    case (n: java.lang.Number, d: DecimalType) =>
      new java.math.BigDecimal(n.toString).setScale(d.scale, java.math.RoundingMode.HALF_UP)
    case (x, StringType) => x.toString
    case (x, _) => x
  }

  /** Column calling `ns.fn(args)`: registers an idempotent session UDF
    * wrapper (named after ns+fn, ship-source-only closure) and returns
    * the call. */
  def column(spark: SparkSession, ns: String, fn: String, args: Seq[Column]): Column = {
    val (lang, source) = namespaceOrThrow(ns)
    val dt = returnTypeOf(ns, fn)
    val name = s"script_${ns}_$fn"
    registerSparkUdf(spark, name, lang, source, fn, dt, args.size)
    call_udf(name, args: _*)
  }

  private def registerSparkUdf(spark: SparkSession, name: String, lang: String,
      source: String, fn: String, dt: DataType, arity: Int): Unit = arity match {
    case 0 => spark.udf.register(name, new UDF0[AnyRef] {
      override def call(): AnyRef = ScriptUdfs.call(lang, source, fn, dt, Array()) }, dt)
    case 1 => spark.udf.register(name, new UDF1[AnyRef, AnyRef] {
      override def call(a: AnyRef): AnyRef =
        ScriptUdfs.call(lang, source, fn, dt, Array(a)) }, dt)
    case 2 => spark.udf.register(name, new UDF2[AnyRef, AnyRef, AnyRef] {
      override def call(a: AnyRef, b: AnyRef): AnyRef =
        ScriptUdfs.call(lang, source, fn, dt, Array(a, b)) }, dt)
    case 3 => spark.udf.register(name, new UDF3[AnyRef, AnyRef, AnyRef, AnyRef] {
      override def call(a: AnyRef, b: AnyRef, c: AnyRef): AnyRef =
        ScriptUdfs.call(lang, source, fn, dt, Array(a, b, c)) }, dt)
    case 4 => spark.udf.register(name, new UDF4[AnyRef, AnyRef, AnyRef, AnyRef, AnyRef] {
      override def call(a: AnyRef, b: AnyRef, c: AnyRef, d: AnyRef): AnyRef =
        ScriptUdfs.call(lang, source, fn, dt, Array(a, b, c, d)) }, dt)
    case 5 => spark.udf.register(name, new UDF5[AnyRef, AnyRef, AnyRef, AnyRef, AnyRef, AnyRef] {
      override def call(a: AnyRef, b: AnyRef, c: AnyRef, d: AnyRef, e: AnyRef): AnyRef =
        ScriptUdfs.call(lang, source, fn, dt, Array(a, b, c, d, e)) }, dt)
    case n => throw new IllegalArgumentException(
      s"script UDF $name: arity $n not supported (max 5)")
  }
}
