package graft.pig

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The textual entry point — what `pig script.pig -p DIR=/data` is to
  * the reference (SURVEY.md §3.1). Pipeline: preprocess (params,
  * %default/%declare, param files, DEFINE-macros) → parse → compile to
  * DataFrames. Parameter precedence matches the reference:
  * `%default < param file < params (command line) < %declare`.
  *
  * Nothing executes until an action: the compiled script is a set of
  * named Catalyst plans, so running a script is as lazy (and as
  * optimized) as writing the same DataFrame code by hand.
  *
  * `ASSERT A BY cond [, 'msg'];` rebinds `A` so every downstream
  * consumer trips the check at execution time (Pig 0.12 semantics): a
  * violating row fails the job with the message; a holding predicate
  * is optimized away by Catalyst's filter pushdown, not re-scanned.
  *
  * {{{
  * val result = PigScript.run(spark,
  *   """L = LOAD '$DIR/lineitem.parquet' USING parquet;
  *      G = GROUP L BY l_returnflag;
  *      S = FOREACH G GENERATE group AS flag, COUNT_STAR(L) AS n;
  *      STORE S INTO '/tmp/out';""",
  *   params = Map("DIR" -> "/root/testdata/sf0.001"))
  * result("S").show()
  * }}}
  */
object PigScript {

  /** Parse + compile; STORE statements are recorded (and executed only
    * when `executeStores = true`). `paramFiles` are `-param_file` paths
    * (`name=value` lines), applied between `%default` and `params`. */
  def run(spark: SparkSession, script: String,
      params: Map[String, String] = Map.empty,
      executeStores: Boolean = false,
      paramFiles: Seq[String] = Nil): PigCompiler.Result = {
    val fileParams = paramFiles.foldLeft(Map.empty[String, String]) { (acc, p) =>
      acc ++ PigPreprocessor.parseParamFile(
        java.nio.file.Files.readString(java.nio.file.Paths.get(p)))
    }
    val pre = PigPreprocessor(script, params, fileParams)
    PigCompiler.compile(spark, PigParser.parseScript(pre), executeStores)
  }

  /** Run a script and return its "result" relation: the target of the
    * last STORE if any, else the last assigned alias — the contract the
    * driver's oracle queries use. */
  def query(spark: SparkSession, script: String,
      params: Map[String, String] = Map.empty): DataFrame = {
    val r = run(spark, script, params)
    val alias = r.stores.lastOption.map(_.alias).orElse(r.lastAlias)
      .getOrElse(throw new IllegalArgumentException("script defines no relation"))
    // same rendering STORE would write: bignums emit as decimal text
    graft.functions.BigNum.unwrapAll(r(alias))
  }

  /** Load a `.pig` script bundled as a classpath resource. */
  def resource(path: String): String = {
    val in = Option(getClass.getResourceAsStream(path)).getOrElse(
      throw new IllegalArgumentException(s"no such resource: $path"))
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** Run a bundled `.pig` resource (see src/main/resources/pig/). */
  def queryResource(spark: SparkSession, resourcePath: String,
      params: Map[String, String] = Map.empty): DataFrame =
    query(spark, resource(resourcePath), params)

  /** Run a script and register every alias into a [[graft.core.GraftSession]]
    * — the PigServer workflow: script defines the relations, the session
    * then serves DESCRIBE/EXPLAIN/DUMP/STORE and SQL over them. */
  def runInto(session: graft.core.GraftSession, script: String,
      params: Map[String, String] = Map.empty): PigCompiler.Result = {
    val r = run(session.spark, script, params)
    r.aliases.foreach(a => session.register(a, r(a)))
    r
  }
}
