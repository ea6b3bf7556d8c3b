package graft.pig

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{BigNum, PigFunctions}
import graft.operators.{Relational, StreamThrough}
import PigAst._

/** Compiles the Pig Latin AST onto the engine's DataFrame surface —
  * stage 2–3 of the reference pipeline (logical plan build + optimize),
  * except here "optimize" is mostly *delegation*: the output is a
  * declarative Catalyst plan, so pushdown / pruning / join strategy /
  * AQE come for free (SURVEY.md §4).
  *
  * The one rewrite the compiler does itself is the one Catalyst cannot
  * see through the Pig data model: **`FOREACH (GROUP x BY k) GENERATE
  * key, Agg(bag)` never materializes the bag** when every generated
  * item is algebraic (COUNT/SUM/AVG/MIN/MAX over the group, key refs,
  * and scalar arithmetic over those). It compiles straight to
  * `groupBy(k).agg(...)` — partial aggregation, map-side combine, no
  * collect_list — which is exactly the reference's combiner
  * optimization (POPartialAgg), decided at compile time here instead of
  * plan-rewrite time there. Scripts that structurally consume the bag
  * (FLATTEN(bag), bag in a non-aggregate position) fall back to a real
  * bag materialization, same as the reference.
  *
  * Join outputs are qualified `alias::column` exactly like Pig, and
  * unqualified references resolve by unique `::name` suffix — so
  * scripts keep working unchanged through joins.
  */
object PigCompiler {

  // ---------------- compiled-script result ----------------

  final case class StoreTarget(alias: String, path: String, format: String,
      options: Map[String, String])

  final class Result private[PigCompiler] (
      env: mutable.LinkedHashMap[String, Rel],
      val stores: Seq[StoreTarget],
      val lastAlias: Option[String]) {
    def apply(alias: String): DataFrame = lookup(env, alias).df
    def aliases: Seq[String] = env.keys.toSeq
  }

  /** Alias binding. GROUP results stay *symbolic* (GroupMeta) until a
    * consumer forces a shape: an algebraic FOREACH compiles the group
    * away entirely; anything else lazily materializes bags. */
  private[pig] final class Rel(mk: () => DataFrame, val group: Option[GroupMeta]) {
    lazy val df: DataFrame = mk()
  }
  /** `mode`: "group" | "cube" | "rollup" — which grouping-set flavor the
    * algebraic FOREACH compiles to (Pig's CUBE statement reuses the
    * whole GROUP machinery with a bag named `cube`). */
  private[pig] final case class GroupMeta(childAlias: String, child: DataFrame,
      keys: Seq[PExpr], all: Boolean, mode: String = "group")

  private def lookup(env: mutable.LinkedHashMap[String, Rel], a: String): Rel =
    env.getOrElse(a, throw new IllegalArgumentException(
      s"unknown alias '$a' (defined: ${env.keys.mkString(", ")})"))

  /** FOREACH input resolution: a bound alias looks up the env; the
    * inline form `FOREACH (GROUP A BY x) …` compiles its op unbound —
    * in particular an inline GROUP stays symbolic (GroupMeta), so the
    * algebraic combiner rewrite applies exactly as if it were bound. */
  private def resolveRef(spark: SparkSession,
      env: mutable.LinkedHashMap[String, Rel],
      cmds: collection.Map[String, (String, Seq[String])], ref: PRelRef): Rel =
    ref match {
      case RAlias(n) => lookup(env, n)
      case RInline(op) => compileOp(spark, env, cmds, op)
    }

  // ---------------- multi-query shared-scan policy ----------------

  /** Direct ALIAS inputs of an op. Scalar references inside
    * expressions (bindScalars) are deliberately not counted — they
    * collect a one-row aggregate, not a lineage re-scan. */
  private def refsOf(op: POp): Seq[String] = op match {
    case _: PLoad => Seq.empty
    case PFilter(in, _) => Seq(in)
    case PForeach(in, _) => refOf(in)
    case PForeachNested(in, _, _) => refOf(in)
    case PCubeOp(in, _, _) => Seq(in)
    case PGroup(inputs, _, _, _) => inputs.map(_._1)
    case PJoin(sides, _, _) => sides.map(_._1)
    case POrder(in, _, _) => Seq(in)
    case PLimit(in, _) => Seq(in)
    case PDistinct(in) => Seq(in)
    case PUnion(ins, _) => ins
    case PCross(ins) => ins
    case PSample(in, _) => Seq(in)
    case PRank(in, _, _) => Seq(in)
    case PStream(in, _, _, _) => Seq(in)
    case PAliasRef(in) => Seq(in)
    case n: PNative => Seq(n.storeAlias)
  }
  private def refOf(r: PRelRef): Seq[String] = r match {
    case RAlias(n) => Seq(n)
    case RInline(op) => refsOf(op)
  }

  /** The MultiQueryOptimizer analogue (SURVEY §4.2): a script with N>1
    * STORE sinks whose lineages share a prefix would otherwise re-scan
    * that prefix once PER SINK — correct at sf0.1, silently N× the
    * single most expensive cost at 100 TB. This pre-pass picks the
    * aliases to persist(MEMORY_AND_DISK) so one scan serves all sinks:
    * the DEEPEST shared aliases — those on ≥2 store lineages with no
    * direct consumer that is itself shared (caching a chain once, at
    * the point closest to the sinks). SPLIT branches count as children
    * of the split input, so a fan-out script with both branches stored
    * caches the unsplit point, exactly Pig's MQO split-point. Scripts
    * that rebind an alias fall back to per-sink execution (the static
    * lineage would be ambiguous — rare, and correct either way).
    *
    * Known slack, both correctness-neutral: (a) a shared GROUP alias
    * whose consumers are all ALGEBRAIC foreaches never forces its
    * bag-df, so its cache entry stays empty and the group's input
    * re-scans — the combiner rewrite usually makes that scan cheap;
    * (b) a shared alias reached through a non-shared sibling path
    * recomputes along that path. */
  private[graft] def sharedScanAliases(stmts: Seq[PStmt]): Set[String] = {
    val deps = mutable.Map.empty[String, Seq[String]]
    val storeRoots = Seq.newBuilder[String]
    var rebound = false
    stmts.foreach {
      case PAssign(a, op) =>
        if (deps.contains(a)) rebound = true
        deps(a) = refsOf(op)
      case PSplit(in, branches, otherwise) =>
        (branches.map(_._1) ++ otherwise).foreach { n =>
          if (deps.contains(n)) rebound = true
          deps(n) = Seq(in)
        }
      case PStore(a, _, _) => storeRoots += a
      case _ => ()
    }
    val roots = storeRoots.result()
    if (rebound || roots.distinct.size < 2) return Set.empty
    def lineage(a: String): Set[String] = {
      val seen = mutable.Set.empty[String]
      def go(x: String): Unit =
        if (seen.add(x)) deps.getOrElse(x, Seq.empty).foreach(go)
      go(a); seen.toSet
    }
    val lins = roots.distinct.map(lineage)
    val shared = lins.flatten.distinct
      .filter(a => lins.count(_.contains(a)) >= 2).toSet
    val consumers: Map[String, Set[String]] = deps.toSeq
      .flatMap { case (a, ds) => ds.map(_ -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    shared.filter(x => !consumers.getOrElse(x, Set.empty).exists(shared))
  }

  // ---------------- entry ----------------

  def compile(spark: SparkSession, stmts: Seq[PStmt],
      executeStores: Boolean = false): Result = {
    val env = mutable.LinkedHashMap.empty[String, Rel]
    val cmds = mutable.Map.empty[String, (String, Seq[String])]
    val funcAliases = mutable.Map.empty[String, (String, Seq[String])]
    val stores = Seq.newBuilder[StoreTarget]
    var last: Option[String] = None
    // shared-scan policy: aliases on ≥2 store lineages persist on
    // first materialization and release after the last sink ran
    val toCache: Set[String] =
      if (executeStores) sharedScanAliases(stmts) else Set.empty
    val cachedDfs = mutable.ArrayBuffer.empty[DataFrame]
    def cacheWrap(alias: String, rel: Rel): Rel =
      if (!toCache(alias)) rel
      else new Rel(() => {
        val d = rel.df.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        cachedDfs.synchronized { cachedDfs += d }
        d
      }, rel.group)

    // `DEFINE seq SequenceFileLoader('\t')` aliases substitute for the
    // class wherever a funcSpec is accepted (a bare alias ref only —
    // an alias with its own args would be a different definition)
    def resolveSpec(spec: Option[(String, Seq[String])]): Option[(String, Seq[String])] =
      spec match {
        case Some((n, Nil)) if funcAliases.contains(n) => Some(funcAliases(n))
        case other => other
      }
    def resolveFuncAliases(op: POp): POp =
      if (funcAliases.isEmpty) op
      else op match {
        case PLoad(p, l, s) => PLoad(p, resolveSpec(l), s)
        case PForeach(RInline(inner), items) =>
          PForeach(RInline(resolveFuncAliases(inner)), items)
        case f: PForeachNested =>
          val withIn = f.in match {
            case RInline(inner) => f.copy(in = RInline(resolveFuncAliases(inner)))
            case _ => f
          }
          // nested ORDER ... USING <define-alias> resolves like any
          // other funcSpec site
          withIn.copy(stmts = withIn.stmts.map {
            case (n, NOrder(s, ks, cmp)) => (n, NOrder(s, ks, resolveSpec(cmp)))
            case other => other
          })
        case n: PNative =>
          n.copy(storeFunc = resolveSpec(n.storeFunc),
            loadFunc = resolveSpec(n.loadFunc))
        case o: POrder => o.copy(comparator = resolveSpec(o.comparator))
        case other => other
      }

    stmts.foreach {
      case PDefineFunc(name, f) =>
        funcAliases(name) = f
      case PDefineCmd(name, cmd, ship) =>
        cmds(name) = (cmd, ship)
      case PRegister(path, Some((lang, ns))) =>
        // scripting UDFs: eager driver-side load — a missing engine or
        // broken script fails HERE, at the REGISTER line, not mid-job
        val src = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(path)), "UTF-8")
        graft.functions.ScriptUdfs.loadNamespace(ns, lang, src)
      case PRegister(path, None) =>
        spark.sparkContext.addJar(path)
      case PSet(key, value) => key match {
        // Pig's parallelism knob → Spark's shuffle parallelism
        case "default_parallel" =>
          spark.conf.set("spark.sql.shuffle.partitions", value)
        // engine properties pass through (runtime-modifiable SQL confs;
        // a static conf raises Spark's own clear error at this line)
        case k if k.startsWith("spark.") => spark.conf.set(k, value)
        // MR-era job properties (job.name, mapreduce.*, pig.*) have no
        // Spark meaning — accepted and ignored, like Pig on an engine
        // that does not know the key
        case _ => ()
      }
      case s @ PAssign(alias, op) =>
        // attach alias + line to both compile-time and lazy plan-build
        // errors — the statement a user has to fix, PigServer-style
        def reframe[T](body: => T): T =
          try body catch {
            case e: IllegalArgumentException if e.getMessage != null &&
                !e.getMessage.startsWith("in '") =>
              throw new IllegalArgumentException(
                s"in '$alias' (line ${s.pos.line}): ${e.getMessage}", e)
          }
        val r = reframe(compileOp(spark, env, cmds, resolveFuncAliases(op)))
        env(alias) = cacheWrap(alias, new Rel(() => reframe(r.df), r.group))
        last = Some(alias)
      case PStore(alias, path, using0)
          if resolveSpec(using0).exists(
            _._1.split('.').last.equalsIgnoreCase("hbasestorage")) =>
        // STORE … USING HBaseStorage('cf:a cf:b'): Pig's contract puts
        // the rowkey in the FIRST field; remaining fields map onto the
        // column list in order [Pig: HBaseStorage putNext]
        val using = resolveSpec(using0)
        val quals = using.get._2.headOption.getOrElse(
            throw new IllegalArgumentException(
              "HBaseStorage needs a column list ('cf:a cf:b')"))
          .split("\\s+").filter(_.nonEmpty).toSeq.map(_.split(':').last)
        stores += StoreTarget(alias, path, "hbasestorage", Map.empty)
        if (executeStores) {
          val df = BigNum.unwrapAll(lookup(env, alias).df)
          require(df.columns.length == quals.length + 1,
            s"HBaseStorage column list names ${quals.length} columns but " +
              s"'$alias' has ${df.columns.length} fields (first is the rowkey)")
          val renamed = df.toDF(("__rowkey" +: quals): _*)
          graft.sources.KeyValueStore.write(renamed, "__rowkey", quals, path,
            nFiles = spark.sessionState.conf.numShufflePartitions)
        }

      case PStore(alias, path, using0)
          if resolveSpec(using0).exists(u => isVersionedStorage(u._1)) =>
        // STORE … USING VersionedStorage[(declarations…)]: the sink is
        // a versioned table — an ATOMIC CAS commit as the child of the
        // latest version (v0 creates the table). Declarations (round
        // 14 — VERDICT r13 #8: skipping + CDC + constraints without a
        // line of Scala):
        //   'k1,k2'            — legacy bare first arg = cluster=k1,k2
        //   'cluster=k1,k2'    — clustered layout (stats index follows)
        //   'mode=zorder'      — clustering shape (default range)
        //   'feed=k1,k2'       — persisted change feed on these keys
        //   'expect.<n>=<sql>' — CHECK expectation (violations refuse
        //                        the STORE, table untouched)
        // Schema drift refuses exactly like the API commit (migrations
        // are an explicit API act, not a side effect of a re-run).
        val decl = parseVersionedStoreArgs(resolveSpec(using0).get._2)
        stores += StoreTarget(alias, path, "graft-versioned",
          Map("clusterBy" -> decl.cluster.mkString(","),
            "clusterMode" -> decl.mode, "feed" -> decl.feed.mkString(","))
            .filter(_._2.nonEmpty) ++
            decl.expects.map { case (n, sql) => s"expect.$n" -> sql })
        if (executeStores) {
          val cur = graft.operators.VersionedTable.latestVersion(spark, path)
          graft.operators.VersionedTable.commit(spark, path,
            BigNum.unwrapAll(lookup(env, alias).df), cur, "pig",
            clusterBy = decl.cluster, clusterMode = decl.mode,
            clusterFiles = decl.files,
            meta = if (decl.feed.isEmpty) Map.empty
              else Map(graft.operators.VersionedTable.FeedKey ->
                decl.feed.mkString(",")),
            expectations = decl.expects)
        }
      case PStore(alias, path, using0) =>
        val (fmt, opts) = storageFormat(resolveSpec(using0))
        stores += StoreTarget(alias, path, fmt, opts)
        if (executeStores)
          BigNum.unwrapAll(lookup(env, alias).df).write.format(fmt).options(opts)
            .mode("overwrite").save(path)
      case PSplit(in, branches, otherwise) =>
        val df = lookup(env, in).df
        // persist = false: a compiled script lives for the session and
        // has no unsplit point — re-scan beats a leaked cache entry
        val parts = Relational.split(df,
          branches.map { case (n, e) => n -> compileExpr(df, e) }, otherwise,
          persist = false)
        parts.foreach { case (n, d) =>
          env(n) = cacheWrap(n, new Rel(() => d, None))
        }
      case PAssertStmt(in, cond, msg) =>
        val r = lookup(env, in)
        env(in) = new Rel(() => Relational.assertRows(r.df,
          compileExpr(r.df, cond), msg.getOrElse(cond.toString)), r.group)
      case PDump(_) | PDescribe(_) | PExplain(_) | PIllustrate(_) =>
        // interactive statements: no-ops in batch compile; the session
        // surface (GraftSession dump/describe/explain/illustrate) serves
        // them after runInto
    }
    // every sink has run (stores execute inline above) — release the
    // shared-scan cache; later Result.apply reads recompute uncached
    cachedDfs.foreach(_.unpersist(false))
    new Result(env, stores.result(), last)
  }

  // ---------------- operators ----------------

  private def compileOp(spark: SparkSession,
      env: mutable.LinkedHashMap[String, Rel],
      cmds: collection.Map[String, (String, Seq[String])], op: POp): Rel = op match {

    case PLoad(path, loader, schema) =>
      new Rel(() => load(spark, path, loader, schema), None)

    case PFilter(in, cond) =>
      val df = lookup(env, in).df
      new Rel(() => {
        val (bound, cond2) = bindScalars(env, df, Seq(cond))
        bound.filter(compileExpr(bound, cond2.head))
          .select(df.columns.map(c => col(s"`$c`")): _*)
      }, None)

    case PForeach(in, items) =>
      val rel = resolveRef(spark, env, cmds, in)
      rel.group match {
        case Some(meta) if isAlgebraic(Set(meta.childAlias), items) =>
          new Rel(() => compileAggForeach(meta, items,
            Map(meta.childAlias -> BagInfo(lit(true), None))), None)
        case _ =>
          new Rel(() => {
            val (bound, exprs) = bindScalars(env, rel.df, items.map(_.expr))
            compileRowForeach(bound,
              items.zip(exprs).map { case (it, e) => it.copy(expr = e) })
          }, None)
      }

    case PForeachNested(in, stmts, items) =>
      val rel = resolveRef(spark, env, cmds, in)
      rel.group match {
        // FILTER / inner-FOREACH pipelines + algebraic GENERATE compile
        // to FILTERED relational aggregates over (possibly projected)
        // bag fields — no bag ever materializes (the reference's
        // combiner can't do this; Spark's partial agg handles the
        // conditional aggregates map-side)
        case Some(meta) if algebraicStmts(stmts) &&
            isAlgebraic(Set(meta.childAlias) ++ stmts.map(_._1), items) =>
          new Rel(() => {
            val child = meta.child
            val bags = mutable.LinkedHashMap[String, BagInfo](
              meta.childAlias -> BagInfo(lit(true), None))
            def base(src: String, what: String): BagInfo =
              bags.getOrElse(src, throw new IllegalArgumentException(
                s"nested $what source '$src' is not the bag or an earlier nested alias"))
            stmts.foreach {
              case (name, NFilter(src, cond)) =>
                val b = base(src, "FILTER")
                bags(name) = BagInfo(
                  b.pred && compileExpr(child, substFields(cond, b.fields)), b.fields)
              case (name, NForeach(src, gen)) =>
                val b = base(src, "FOREACH")
                val fields = gen.zipWithIndex.map { case (it, i) =>
                  val (nm, tpe) = it.asNames.headOption
                    .getOrElse((defaultName(it.expr, i), None))
                  val e = substFields(it.expr, b.fields)
                  nm -> tpe.map(PCast(_, e)).getOrElse(e)
                }
                bags(name) = BagInfo(b.pred, Some(fields))
              case (name, other) => throw new IllegalStateException(
                s"non-algebraic nested op for '$name': $other")
            }
            compileAggForeach(meta, items, bags.toMap)
          }, None)
        // anything with ORDER/LIMIT/DISTINCT (or non-algebraic GENERATE)
        // runs over materialized bags via per-row HOFs — no shuffle for
        // the inner pipeline (Relational.nested building blocks). When
        // the bag comes from a symbolic GROUP and the pipeline only
        // ORDERs/LIMITs/FILTERs it, the bag is materialized PRUNED to
        // the referenced fields: collect_list(struct(<all columns>))
        // defeats Catalyst's column pruning (nothing prunes through an
        // opaque collect buffer), so without this a nested top-k over
        // one field shuffles the whole row per element.
        case _ =>
          new Rel(() => {
            val base = rel.group
              .flatMap(meta => bagPruneFields(meta, stmts, items)
                .map(fs => materializeGroup(meta, Some(fs))))
              .getOrElse(rel.df)
            compileNestedBags(base, stmts, items)
          }, None)
      }

    case PGroup(Seq((in, keys)), all, _, hint) =>
      val child = lookup(env, in).df
      hint.filter(_ => !all).foreach(requireCollocated(child, keys, _))
      val meta = GroupMeta(in, child, keys, all)
      new Rel(() => materializeGroup(meta), Some(meta))

    case PCubeOp(in, dims, rollup) =>
      val child = lookup(env, in).df
      // Pig names the CUBE output bag `cube` (the statement's alias for
      // the grouped relation's tuples)
      val meta = GroupMeta("cube", child, dims, all = false,
        mode = if (rollup) "rollup" else "cube")
      new Rel(() => materializeGroup(meta), Some(meta))

    case PGroup(inputs, _, inner, hint) => // COGROUP
      val sides = inputs.map { case (a, keys) =>
        val df = lookup(env, a).df
        hint.foreach(requireCollocated(df, keys, _))
        val names = keys.map {
          case PCol(n) => resolvedName(df, n)
          case PPos(i) => df.columns(i)
          case other => throw new IllegalArgumentException(
            s"COGROUP keys must be column refs, got $other")
        }
        (a, df, names)
      }
      val keyNames = sides.head._3.map(_.split("::").last)
      new Rel(() => {
        val cg0 =
          if (inner.isEmpty) Relational.cogroup(keyNames, sides: _*)
          else Relational.cogroupInner(keyNames, inner, sides: _*)
        // Pig shape: bags named after their input, key(s) named `group`
        val bagsRenamed = sides.foldLeft(cg0) { case (d, (a, _, _)) =>
          d.withColumnRenamed(s"bag_$a", a)
        }
        if (keyNames.length == 1) bagsRenamed.withColumnRenamed(keyNames.head, "group")
        else bagsRenamed
          .withColumn("group", struct(keyNames.map(col): _*))
          .select((col("group") +: sides.map(s => col(s._1))): _*)
      }, None)

    case PJoin(sides, outer, using) =>
      require(outer.isEmpty || sides.length == 2,
        "outer joins are binary (Pig restriction)")
      val prepared = sides.map { case (a, keys) => (a, qualify(lookup(env, a).df, a), keys) }
      new Rel(() => {
        val joinType = outer.getOrElse("inner")
        val (_, d0, k0) = prepared.head
        val leftKeyCols = k0.map(compileExpr(d0, _))
        prepared.tail.foldLeft(d0) { case (acc, (_, di, ki)) =>
          // USING 'replicated' → broadcast; 'merge' (pre-sorted inputs) →
          // sort-merge-join hint; 'skewed' → forced shuffle-merge join:
          // the user is declaring big, skew-keyed sides, so a broadcast
          // pick would be wrong at scale, and SMJ is the shape AQE's
          // skew-join split acts on (GraftSession enables skewJoin —
          // the runtime split supersedes Pig's sampled skewed-join
          // plan).
          // 'merge-sparse' (right side sorted+indexed, few matches):
          // route through the footer-pruned sparse lookup when the
          // right side is a bare parquet scan; any other shape falls
          // back to SMJ below — the hint can only improve the plan,
          // never change the answer.
          val sparse =
            if (using.contains("merge-sparse") && joinType == "inner"
                && ki.length == 1)
              ki.head match {
                case PCol(n) => graft.operators.SparseIndex.routeScriptJoin(
                  acc, leftKeyCols.head, di, resolvedName(di, n))
                case _ => None
              }
            else None
          sparse.getOrElse {
            val right = using match {
              case Some("replicated") => broadcast(di)
              case Some("merge") | Some("merge-sparse") => di.hint("MERGE")
              case Some("skewed") => di.hint("SHUFFLE_MERGE")
              case _ => di
            }
            val cond = leftKeyCols.zip(ki.map(compileExpr(di, _)))
              .map { case (l, r) => l === r }.reduce(_ && _)
            acc.join(right, cond, joinType)
          }
        }
      }, None)

    case POrder(in, keys, comparator) =>
      val df = lookup(env, in).df
      // The two comparator shapes expressible as Catalyst sort keys are
      // honored, recognized by the class's simple name; anything else
      // is refused — silently dropping a user comparator reorders the
      // output with no diagnostic (the round-5 behavior).
      val sortCols: Seq[Column] = comparator.map(_._1) match {
        case None =>
          keys.map { case (e, asc) =>
            val c = compileExpr(df, e); if (asc) c.asc else c.desc }
        case Some(cls) =>
          val simple = cls.split('.').last.toLowerCase
          if (simple.contains("reverse") || simple.contains("descending")
              || simple == "desc")
            // a reversing comparator flips every key's direction
            keys.map { case (e, asc) =>
              val c = compileExpr(df, e); if (asc) c.desc else c.asc }
          else if (simple.contains("caseinsensitive")
              || simple.contains("ignorecase"))
            // case-insensitive total order: LOWER(key) first, the raw
            // key as the deterministic tiebreak; non-string keys are
            // unaffected by case folding
            keys.flatMap { case (e, asc) =>
              val c = compileExpr(df, e)
              val isStr = df.select(c).schema.head.dataType == StringType
              val folded = if (isStr) Seq(lower(c), c) else Seq(c)
              folded.map(k => if (asc) k.asc else k.desc)
            }
          else
            throw new IllegalArgumentException(
              s"ORDER ... USING '$cls': unsupported comparator. Only " +
                "reverse (*Reverse*/*Descending*) and case-insensitive " +
                "(*CaseInsensitive*/*IgnoreCase*) comparators compile to " +
                "Catalyst sort keys; rewrite the order as BY <expr> " +
                "ASC|DESC or drop the USING clause.")
      }
      new Rel(() => df.orderBy(sortCols: _*), None)

    case PLimit(in, n) =>
      require(n <= Int.MaxValue, s"LIMIT $n exceeds Int.MaxValue " +
        "(Spark's limit is Int-bounded; drop the LIMIT or pre-filter)")
      val df = lookup(env, in).df
      new Rel(() => df.limit(n.toInt), None)

    case PDistinct(in) =>
      val df = lookup(env, in).df
      new Rel(() => df.distinct(), None)

    case PUnion(ins, onSchema) =>
      val dfs = ins.map(lookup(env, _).df)
      new Rel(() =>
        if (onSchema) dfs.reduce(_.unionByName(_, allowMissingColumns = true))
        else dfs.reduce(_ unionAll _), None)

    case PCross(ins) =>
      val dfs = ins.map(a => qualify(lookup(env, a).df, a))
      new Rel(() => dfs.reduce(_ crossJoin _), None)

    case PSample(in, p) =>
      val df = lookup(env, in).df
      new Rel(() => df.sample(p, 42L), None)

    case PRank(in, Nil, _) =>
      val df = lookup(env, in).df
      new Rel(() => {
        val r = Relational.rankSequence(df, s"rank_$in")
        r.select((col(s"rank_$in") +: df.columns.map(c => col(s"`$c`"))): _*)
      }, None)

    case PRank(in, keys, dense) =>
      val df = lookup(env, in).df
      val ascAll = keys.map(_._2).distinct
      require(ascAll.length == 1, "RANK BY requires a uniform sort direction")
      val names = keys.map {
        case (PCol(n), _) => resolvedName(df, n)
        case (PPos(i), _) => df.columns(i)
        case (other, _) => throw new IllegalArgumentException(
          s"RANK BY requires column refs, got $other")
      }
      new Rel(() => {
        val ranked = Relational.rankBy(df, names, ascAll.head)
        val rankCol = (if (dense) col("dense_rank") else col("rank")).as(s"rank_$in")
        ranked.select((rankCol +: df.columns.map(c => col(s"`$c`"))): _*)
      }, None)

    case PNative(cmd, inAlias, inPath, inFunc, outPath, outFunc, schema, params) =>
      val child = lookup(env, inAlias)
      new Rel(() => {
        // the Pig contract: materialize the input relation, run the
        // opaque job, ingest its output. The job runs as a local
        // command — the same CLIENT boundary as Pig's job submission;
        // on a cluster deployment this becomes a spark-submit /
        // YARN-submit wrapper with no change to the dataflow.
        val (fmt, opts) = storageFormat(inFunc.orElse(Some(("pigstorage", Nil))))
        child.df.write.format(fmt).options(opts).mode("overwrite").save(inPath)
        val full = cmd + params.map(" " + _).getOrElse("")
        val pb = new ProcessBuilder("/bin/sh", "-c", full)
        pb.redirectErrorStream(true)
        val proc = pb.start()
        val log = scala.io.Source
          .fromInputStream(proc.getInputStream, "UTF-8").mkString
        val exit = proc.waitFor()
        require(exit == 0,
          s"MAPREDUCE job failed (exit $exit): $full\n${log.take(4000)}")
        load(spark, outPath, outFunc.orElse(Some(("pigstorage", Nil))), schema)
      }, None)

    case PStream(in, cmd, outCols, byName) =>
      require(outCols.nonEmpty, "STREAM ... THROUGH requires AS (col, ...)")
      val df = lookup(env, in).df
      val (command, ship) =
        if (byName) cmds.getOrElse(cmd, throw new IllegalArgumentException(
          s"STREAM THROUGH $cmd: no such DEFINEd command"))
        else (cmd, Nil)
      // Pig ships files into the task cwd and the command refers to them
      // by basename; map basename mentions onto StreamThrough's
      // {SHIP:name} placeholders (only where not part of a longer path)
      val resolved = ship.foldLeft(command) { (c, path) =>
        val name = new java.io.File(path).getName
        c.replaceAll("(?<![\\w/])" + java.util.regex.Pattern.quote(name),
          java.util.regex.Matcher.quoteReplacement(s"{SHIP:$name}"))
      }
      new Rel(() => StreamThrough(df, Seq("/bin/sh", "-c", resolved), outCols, ship), None)

    case PAliasRef(in) =>
      val r = lookup(env, in)
      new Rel(() => r.df, r.group)
  }

  /** CASE → a `when` chain; with an operand each WHEN is an equality
    * test against it (`compile` is the expression compiler of the
    * calling context — row, bag-element, or post-aggregate). */
  private def caseWhen(compile: PExpr => Column, operand: Option[PExpr],
      branches: Seq[(PExpr, PExpr)], els: Option[PExpr]): Column = {
    val base = operand.map(compile)
    val whens = branches.map { case (w, t) =>
      (base.map(_ === compile(w)).getOrElse(compile(w)), compile(t))
    }
    val chained = whens.tail.foldLeft(when(whens.head._1, whens.head._2)) {
      case (acc, (c, t)) => acc.when(c, t)
    }
    els.map(e => chained.otherwise(compile(e))).getOrElse(chained)
  }

  // ---------------- scalar aliases ----------------

  /** Pig scalar aliases (Pig 0.8+): `C.total` where `C` is a BOUND
    * RELATION (not a column of the input) reads the field of C's single
    * row as a per-row scalar — the classic normalize-by-a-global idiom
    * (`FOREACH L GENERATE qty / T.avg_qty`). Compiled Spark-first: each
    * referenced relation contributes a guarded one-row global aggregate
    * that is broadcast cross-joined onto the input — the same plan
    * shape as Pig's distributed-cache scalar, with the reference's
    * "scalar has more than one row" runtime error reproduced via
    * raise_error. Column refs win over alias refs on a name clash,
    * matching Pig's resolution order. */
  private def bindScalars(env: mutable.LinkedHashMap[String, Rel],
      df: DataFrame, exprs: Seq[PExpr]): (DataFrame, Seq[PExpr]) = {
    def isCol(n: String): Boolean =
      df.columns.contains(n) || df.columns.exists(_.endsWith(s"::$n"))
    val refs = mutable.LinkedHashSet.empty[(String, String)]
    def walk(e: PExpr): Unit = e match {
      case PDot(PCol(a), f) if !isCol(a) && env.contains(a) => refs += ((a, f))
      case PDot(b, _) => walk(b)
      case PMapGet(b, _) => walk(b)
      case PBin(_, l, r) => walk(l); walk(r)
      case PNot(x) => walk(x)
      case PNeg(x) => walk(x)
      case PIsNull(x, _) => walk(x)
      case PMatches(x, _) => walk(x)
      case PIn(x, its) => walk(x); its.foreach(walk)
      case PTernary(c, t, f) => walk(c); walk(t); walk(f)
      case PCaseWhen(op, brs, els) =>
        op.foreach(walk)
        brs.foreach { case (w, t) => walk(w); walk(t) }
        els.foreach(walk)
      case PCast(_, x) => walk(x)
      case PCall(_, as) => as.foreach(walk)
      case _ =>
    }
    exprs.foreach(walk)
    if (refs.isEmpty) (df, exprs)
    else {
      val bound = refs.toSeq.groupBy(_._1).toSeq.sortBy(_._1)
        .foldLeft(df) { case (acc, (a, fs)) =>
          val src = lookup(env, a).df
          val aggs = fs.map { case (_, f) =>
            max(resolve(src, f)).as(s"__sc_${a}_$f")
          } :+ count(lit(1)).as("__sc_n")
          val one = src.agg(aggs.head, aggs.tail: _*)
            .select(fs.map { case (_, f) =>
              when(col("__sc_n") <= 1, col(s"__sc_${a}_$f"))
                .otherwise(raise_error(lit(
                  s"scalar alias '$a' has more than one row")))
                .as(s"__sc_${a}_$f")
            }: _*)
          acc.crossJoin(broadcast(one))
        }
      def rw(e: PExpr): PExpr = e match {
        case PDot(PCol(a), f) if refs.contains((a, f)) => PCol(s"__sc_${a}_$f")
        case PDot(b, f) => PDot(rw(b), f)
        case PMapGet(b, k) => PMapGet(rw(b), k)
        case PBin(op, l, r) => PBin(op, rw(l), rw(r))
        case PNot(x) => PNot(rw(x))
        case PNeg(x) => PNeg(rw(x))
        case PIsNull(x, n) => PIsNull(rw(x), n)
        case PMatches(x, re) => PMatches(rw(x), re)
        case PIn(x, its) => PIn(rw(x), its.map(rw))
        case PTernary(c, t, f) => PTernary(rw(c), rw(t), rw(f))
        case PCaseWhen(op, brs, els) =>
          PCaseWhen(op.map(rw), brs.map { case (w, t) => (rw(w), rw(t)) }, els.map(rw))
        case PCast(t, x) => PCast(t, rw(x))
        case PCall(fn, as) => PCall(fn, as.map(rw))
        case other => other
      }
      (bound, exprs.map(rw))
    }
  }

  // ---------------- LOAD / STORE formats ----------------

  private def isVersionedStorage(name: String): Boolean = {
    val s = name.split('.').last.toLowerCase
    s == "versionedstorage" || s == "versionedtable"
  }

  private[graft] case class VStoreDecl(cluster: Seq[String], mode: String,
      files: Int, feed: Seq[String], expects: Map[String, String])

  /** The VersionedStorage STORE declaration grammar. Malformed
    * declarations refuse LOUDLY (an unknown key silently ignored would
    * mean a script that THINKS it declared a feed ships without CDC). */
  private[graft] def parseVersionedStoreArgs(args: Seq[String]): VStoreDecl = {
    def cols(v: String) = v.split(',').toSeq.map(_.trim).filter(_.nonEmpty)
    var cluster = Seq.empty[String]
    var mode = "range"; var modeSet = false
    var files = 0
    var feed = Seq.empty[String]
    val expects = mutable.LinkedHashMap.empty[String, String]
    args.zipWithIndex.foreach { case (a, i) =>
      val t = a.trim
      val eq = t.indexOf('=')
      if (eq < 0) {
        require(i == 0 && t.nonEmpty,
          s"VersionedStorage: bare argument '$t' — only the FIRST " +
            "argument may be a bare clustering list ('k1,k2'); later " +
            "arguments must be declarations (cluster=/mode=/feed=/" +
            "expect.<name>=)")
        cluster = cols(t)
      } else {
        val k = t.substring(0, eq).trim
        val v = t.substring(eq + 1).trim
        k match {
          case "cluster" => cluster = cols(v)
          case "mode" =>
            require(v == "range" || v == "zorder",
              s"VersionedStorage: mode=$v — 'range' or 'zorder'")
            mode = v; modeSet = true
          case "files" =>
            files = v.toIntOption.filter(_ > 0).getOrElse(
              throw new IllegalArgumentException(
                s"VersionedStorage: files=$v — a positive file count " +
                  "(pins the clustered layout; omit to let AQE size it)"))
          case "feed" => feed = cols(v)
          case e if e.startsWith("expect.") =>
            val n = e.stripPrefix("expect.")
            require(n.nonEmpty && v.nonEmpty,
              s"VersionedStorage: expectation '$t' needs a name and a " +
                "boolean SQL body (expect.<name>=<sql>)")
            expects(n) = v
          case other => throw new IllegalArgumentException(
            s"VersionedStorage: unknown declaration '$other=' — " +
              "cluster=k1,k2 | mode=range|zorder | files=N | " +
              "feed=k1,k2 | expect.<name>=<sql>")
        }
      }
    }
    require((!modeSet && files == 0) || cluster.nonEmpty,
      "VersionedStorage: mode=/files= declare the clustering SHAPE — " +
        "they need cluster= (or a bare clustering list) to apply to")
    VStoreDecl(cluster, mode, files, feed, expects.toMap)
  }

  private def storageFormat(spec: Option[(String, Seq[String])]): (String, Map[String, String]) =
    spec match {
      case None => ("parquet", Map.empty) // engine-native interchange
      // scripts name storage classes bare or fully qualified
      // (org.apache.pig.piggybank.storage.CSVExcelStorage) — dispatch
      // on the simple class name either way
      case Some((name, args)) => name.split('.').last.toLowerCase match {
        case "pigstorage" =>
          ("csv", Map("delimiter" -> args.headOption.getOrElse("\t")))
        case "csvexcelstorage" =>
          // Excel dialect: quoted fields, "" escapes a quote, embedded
          // newlines allowed [Pig: piggybank.storage.CSVExcelStorage]
          ("csv", Map("delimiter" -> args.headOption.getOrElse(","),
            "quote" -> "\"", "escape" -> "\"", "multiLine" -> "true"))
        case "parquet" | "parquetloader" | "parquetstorer" | "binstorage" =>
          ("parquet", Map.empty)
        case "jsonloader" | "jsonstorage" | "json" => ("json", Map.empty)
        case "orcstorage" | "orc" => ("orc", Map.empty)
        case "textloader" | "text" => ("text", Map.empty)
        case "avrostorage" | "avro" => (graft.Engine.AvroFormat, Map.empty)
        case other => (other, Map.empty) // raw Spark format passthrough
      }
    }

  /** `GROUP … USING 'collected'/'merge'` contract check: the input
    * must already be clustered by the group key — Pig required a
    * CollectableLoadFunc ('collected') / sorted loader ('merge') and
    * FAILED the job otherwise; the Spark-native equivalent is a scan
    * whose partitioning (bucketing) already satisfies the aggregate's
    * distribution, so the group runs with ZERO Exchange. Verified by
    * planning a probe aggregate over the keys: a shuffle in that plan
    * means the contract does not hold and the hint is refused loudly
    * (silently shuffling anyway would lie about the plan the user
    * asked for). Probe planning only — nothing executes here. */
  private def requireCollocated(df: DataFrame, keys: Seq[PExpr], hint: String): Unit = {
    val keyNames = keys.map {
      case PCol(n) => resolvedName(df, n)
      case PPos(i) => df.columns(i)
      case other => throw new IllegalArgumentException(
        s"GROUP ... USING '$hint' keys must be column refs, got $other")
    }
    val probe = df.groupBy(keyNames.map(k => col(s"`$k`")): _*).agg(count(lit(1)))
    val plan = probe.queryExecution.executedPlan.toString
    require(!plan.contains("Exchange hashpartitioning"),
      s"GROUP ... USING '$hint' requires input already clustered by " +
        s"(${keyNames.mkString(", ")}) — a CollectableLoadFunc/sorted input in Pig; " +
        "here: a table bucketed by the group key (write with bucketBy + " +
        "saveAsTable, LOAD ... USING hcatloader). This input would shuffle; " +
        "drop the hint for a plain shuffled GROUP (identical result).")
  }

  private def load(spark: SparkSession, path: String,
      loader: Option[(String, Seq[String])],
      schema: Option[Seq[(String, Option[String])]]): DataFrame = {
    // loaders whose row shape is not a Spark file format: XMLLoader
    // (one row per element) and SequenceFileLoader ((key, value)
    // Text pairs) get dedicated readers [Pig: piggybank.storage]
    val special = loader.map { case (n, args) =>
      (n.split('.').last.toLowerCase, args)
    } collect {
      case ("xmlloader", args) =>
        graft.sources.Piggybank.xmlRecords(spark, path,
          args.headOption.getOrElse(
            throw new IllegalArgumentException("XMLLoader needs a tag argument")))
      case ("sequencefileloader", _) =>
        graft.sources.Piggybank.readSequenceFile(spark, path)
      case ("hcatloader" | "table", _) =>
        // catalog-table load [Pig: o.a.hive.hcatalog.pig.HCatLoader] —
        // the route that carries bucketing metadata, which path-based
        // parquet reads cannot (GROUP USING 'collected' needs it)
        spark.table(path)
      case ("versionedstorage" | "versionedtable", args) =>
        // LOAD 'dir' USING VersionedStorage;          → latest version
        // LOAD 'dir' USING VersionedStorage('7');     → VERSION AS OF 7
        // LOAD 'dir' USING VersionedStorage('2026-01-01 00:00:00');
        //                                             → TIMESTAMP AS OF
        args.headOption match {
          case None =>
            graft.operators.VersionedTable.read(spark, path)
          case Some(a) => a.toLongOption match {
            case Some(v) =>
              graft.operators.VersionedTable.readVersion(spark, path, v)
            case None =>
              // normalize the common timestamp shapes before
              // Timestamp.valueOf (which only accepts
              // 'yyyy-[m]m-[d]d hh:mm:ss[.f…]'): a date-only argument
              // means midnight, an ISO-8601 'T' separator is a space.
              // Failures get a positioned, two-forms error instead of
              // a bare IllegalArgumentException with no context.
              val norm = a.trim match {
                case d if d.matches("""\d{4}-\d{1,2}-\d{1,2}""") =>
                  s"$d 00:00:00"
                case t if t.matches("""\d{4}-\d{1,2}-\d{1,2}T.*""") =>
                  t.replaceFirst("T", " ").stripSuffix("Z")
                case other => other
              }
              val ts =
                try java.sql.Timestamp.valueOf(norm)
                catch {
                  case _: IllegalArgumentException =>
                    throw new IllegalArgumentException(
                      s"LOAD '$path' USING VersionedStorage('$a'): the " +
                        "argument must be either a version number " +
                        "('7') or a timestamp ('yyyy-MM-dd[ HH:mm:ss]'" +
                        " / ISO-8601 'T' form) for TIMESTAMP AS OF")
                }
              graft.operators.VersionedTable.readAsOf(spark, path, ts)
          }
        }
      case ("hbasestorage", args) =>
        // HBaseStorage('cf:a cf:b'[, '-loadKey true']) → the sorted-KV
        // connector; qualifiers map to value columns, the rowkey is
        // exposed when -loadKey is set [Pig: o.a.p.backend.hadoop
        // .hbase.HBaseStorage]
        val quals = args.headOption.getOrElse(throw new IllegalArgumentException(
            "HBaseStorage needs a column list ('cf:a cf:b')"))
          .split("\\s+").filter(_.nonEmpty).toSeq.map(_.split(':').last)
        val loadKey = args.lift(1).exists(_.toLowerCase.contains("-loadkey"))
        val raw = spark.read.format(graft.sources.KeyValueStore.Format).load(path)
        val cols = (if (loadKey) Seq("key") else Nil) ++ quals
        raw.select(cols.map(c => raw.col(s"`$c`")): _*)
    }
    val raw = special.getOrElse {
      // default loader is PigStorage('\t'): delimited text, lazy-typed
      val (fmt, opts) = storageFormat(loader.orElse(Some(("pigstorage", Nil))))
      spark.read.format(fmt).options(opts).load(path)
    }
    applyAsSchema(raw, path, schema)
  }

  private def applyAsSchema(raw: DataFrame, path: String,
      schema: Option[Seq[(String, Option[String])]]): DataFrame = {
    schema match {
      case None => raw // positional $0.. refs; cast-at-use (SURVEY §1.3)
      case Some(decls) =>
        require(decls.length <= raw.columns.length,
          s"AS clause names ${decls.length} fields but $path has ${raw.columns.length}")
        raw.select(decls.zipWithIndex.map { case ((n, t), i) =>
          val c = raw.col(s"`${raw.columns(i)}`")
          t.map(castPigType(c, _)).getOrElse(c).as(n)
        }: _*)
    }
  }

  // ---------------- GROUP materialization (bag path) ----------------

  /** Bag-path column pruning: the child columns a nested
    * ORDER/LIMIT/FILTER pipeline + GENERATE actually reference, or
    * None when pruning is unsafe. Only pipelines whose every stage
    * preserves the child row shape qualify (ORDER/LIMIT/FILTER —
    * an inner FOREACH re-projects and DISTINCT compares whole
    * tuples, so both force the full bag); within that shape every
    * element-scope name is a child field, and an outer GENERATE item
    * referencing a whole bag (other than length-only COUNT/SIZE)
    * needs every field. Conservative by construction: any expression
    * form this walker does not positively understand keeps the full
    * bag, so pruning can narrow the collect buffer but never change
    * what a downstream expression can see. */
  private def bagPruneFields(meta: GroupMeta,
      stmts: Seq[(String, PNestedOp)], items: Seq[GenItem]): Option[Seq[String]] = {
    val rowShaped = stmts.forall {
      case (_, _: NOrder) | (_, _: NLimit) | (_, _: NFilter) => true
      case _ => false
    }
    if (!rowShaped) return None
    val bagAliases: Set[String] = Set(meta.childAlias) ++ stmts.map(_._1)
    val names = mutable.LinkedHashSet[String]()
    var whole = false
    // element scope: every name resolves against the bag element
    def elemRef(e: PExpr): Unit = e match {
      case PCol(n) => names += n
      case PDot(b, _) => elemRef(b)
      case PMapGet(b, _) => elemRef(b)
      case PBin(_, l, r) => elemRef(l); elemRef(r)
      case PNot(x) => elemRef(x)
      case PNeg(x) => elemRef(x)
      case PIsNull(x, _) => elemRef(x)
      case PMatches(x, _) => elemRef(x)
      case PIn(x, its) => elemRef(x); its.foreach(elemRef)
      case PTernary(c, t, f) => elemRef(c); elemRef(t); elemRef(f)
      case PCaseWhen(op, brs, els) =>
        op.foreach(elemRef)
        brs.foreach { case (w, t) => elemRef(w); elemRef(t) }
        els.foreach(elemRef)
      case PCast(_, x) => elemRef(x)
      case PCall(_, as) => as.foreach(elemRef)
      case PLit(_) | PBigLit(_) => ()
      case _ => whole = true // positional / range refs: keep the row
    }
    // outer scope: bag fields appear only under a bag-alias base
    def itemRef(e: PExpr): Unit = e match {
      case PCol("group") | PDot(PCol("group"), _) => ()
      case PDot(PCol(b), f) if bagAliases(b) => names += f
      case PCol(b) if bagAliases(b) => whole = true
      case PCall(fn, Seq(PCol(b))) if bagAliases(b) &&
          Set("COUNT_STAR", "SIZE")(fn.toUpperCase) =>
        () // length-only over a bag: any field set has the same size
      case PCall(fn, Seq(PCol(b))) if bagAliases(b) &&
          fn.toUpperCase == "COUNT" =>
        // Pig COUNT skips tuples whose FIRST field is null — the pruned
        // struct must keep the child's first column, and keep it first
        // (filter below preserves child column order).
        names += meta.child.columns.head
      case PDot(b, _) => itemRef(b)
      case PMapGet(b, _) => itemRef(b)
      case PBin(_, l, r) => itemRef(l); itemRef(r)
      case PNot(x) => itemRef(x)
      case PNeg(x) => itemRef(x)
      case PIsNull(x, _) => itemRef(x)
      case PMatches(x, _) => itemRef(x)
      case PIn(x, its) => itemRef(x); its.foreach(itemRef)
      case PTernary(c, t, f) => itemRef(c); itemRef(t); itemRef(f)
      case PCaseWhen(op, brs, els) =>
        op.foreach(itemRef)
        brs.foreach { case (w, t) => itemRef(w); itemRef(t) }
        els.foreach(itemRef)
      case PCast(_, x) => itemRef(x)
      case PCall(_, as) => as.foreach(itemRef)
      case PLit(_) | PBigLit(_) => ()
      case _ => whole = true
    }
    stmts.foreach {
      case (_, NFilter(_, cond)) => elemRef(cond)
      case (_, NOrder(_, keys, _)) => names ++= keys.map(_._1)
      case (_, NLimit(_, _)) => ()
      case _ => whole = true
    }
    items.foreach(it => itemRef(it.expr))
    if (whole || names.isEmpty) return None
    // resolve collected names against the child (exact or unique
    // `a::n` suffix, the fieldIn rule; ambiguity keeps all candidates
    // — fieldIn refuses later exactly as it would unpruned)
    val keep = meta.child.columns.filter(c =>
      names.exists(n => c == n || c.endsWith(s"::$n")))
    if (keep.isEmpty || keep.length == meta.child.columns.length) None
    else Some(keep.toSeq)
  }

  private[pig] def materializeGroup(meta: GroupMeta,
      bagFields: Option[Seq[String]] = None): DataFrame = {
    val child = meta.child
    val cols = bagFields.getOrElse(child.columns.toSeq)
    val bag = collect_list(struct(cols.map(c => child.col(s"`$c`")): _*))
      .as(meta.childAlias)
    if (meta.all)
      child.agg(bag).select(lit("all").as("group"), col(meta.childAlias))
    else {
      val keyCols = meta.keys.zipWithIndex.map { case (k, i) =>
        compileExpr(child, k).as(keyName(child, k, i))
      }
      val groupCol =
        if (keyCols.length == 1) keyCols.head.as("group")
        else struct(keyCols: _*).as("group")
      grouped(child, meta.mode, Seq(groupCol)).agg(bag)
    }
  }

  private def grouped(child: DataFrame, mode: String, keys: Seq[Column]) =
    mode match {
      case "cube" => child.cube(keys: _*)
      case "rollup" => child.rollup(keys: _*)
      case _ => child.groupBy(keys: _*)
    }

  private def keyName(child: DataFrame, k: PExpr, i: Int): String = k match {
    case PCol(n) => resolvedName(child, n).split("::").last
    case PPos(j) => child.columns(j)
    case _ => s"k$i"
  }

  // ---------------- FOREACH: algebraic (combiner) path ----------------

  /** What the combiner path knows about a bag name: the row predicate
    * accumulated by nested FILTERs, and (after an inner FOREACH) the
    * projected field list — each field an expression over the GROUP's
    * child columns. `fields = None` means the raw child row. */
  private[pig] final case class BagInfo(pred: Column,
      fields: Option[Seq[(String, PExpr)]])

  /** Nested pipelines the combiner path can absorb: FILTERs and inner
    * FOREACH projections (single-name, non-FLATTEN items). ORDER /
    * LIMIT / DISTINCT force the bag path. */
  private def algebraicStmts(stmts: Seq[(String, PNestedOp)]): Boolean =
    stmts.forall {
      case (_, _: NFilter) => true
      case (_, NForeach(_, gen)) =>
        gen.forall(it => !it.flatten && it.asNames.length <= 1)
      case _ => false
    }

  /** Rewrite references to a projected bag's fields back into
    * expressions over the GROUP child (chains through stacked inner
    * FOREACHes). */
  private def substFields(e: PExpr,
      fields: Option[Seq[(String, PExpr)]]): PExpr = fields match {
    case None => e
    case Some(m) =>
      val byName = m.toMap
      def go(x: PExpr): PExpr = x match {
        case PCol(n) => byName.getOrElse(n, x)
        case PDot(b, f) => PDot(go(b), f)
        case PMapGet(b, k) => PMapGet(go(b), k)
        case PBin(op, l, r) => PBin(op, go(l), go(r))
        case PNot(y) => PNot(go(y))
        case PNeg(y) => PNeg(go(y))
        case PIsNull(y, n) => PIsNull(go(y), n)
        case PMatches(y, re) => PMatches(go(y), re)
        case PIn(y, its) => PIn(go(y), its.map(go))
        case PTernary(c, t, f) => PTernary(go(c), go(t), go(f))
        case PCaseWhen(op, brs, els) =>
          PCaseWhen(op.map(go), brs.map { case (w, t) => (go(w), go(t)) }, els.map(go))
        case PCast(t, y) => PCast(t, go(y))
        case PCall(fn, as) => PCall(fn, as.map(go))
        case other => other
      }
      go(e)
  }

  private val aggFns = Set("COUNT", "COUNT_STAR", "SUM", "AVG", "MIN", "MAX")

  private def isBagRef(bagNames: Set[String], e: PExpr): Boolean = e match {
    case PCol(b) => bagNames(b)
    case PDot(PCol(b), _) => bagNames(b)
    case _ => false
  }

  private def bagRefName(e: PExpr): String = e match {
    case PCol(b) => b
    case PDot(PCol(b), _) => b
    case other => throw new IllegalArgumentException(s"not a bag ref: $other")
  }

  private[pig] def isAlgebraic(bagNames: Set[String], items: Seq[GenItem]): Boolean = {
    def ok(e: PExpr): Boolean = e match {
      case PCol("group") => true
      case PDot(PCol("group"), _) => true
      case PLit(_) => true
      case PCall(fn, Seq(a)) if aggFns(fn) && isBagRef(bagNames, a) => true
      case PCall(_, args) if args.nonEmpty => args.forall(ok)
      case PBin(_, l, r) => ok(l) && ok(r)
      case PNeg(x) => ok(x)
      case PNot(x) => ok(x)
      case PCast(_, x) => ok(x)
      case PTernary(c, t, f) => ok(c) && ok(t) && ok(f)
      case PCaseWhen(op, brs, els) =>
        op.forall(ok) && brs.forall { case (w, t) => ok(w) && ok(t) } && els.forall(ok)
      case PIsNull(x, _) => ok(x)
      case PMatches(x, _) => ok(x)
      case _ => false
    }
    items.forall { it =>
      if (it.flatten) it.expr == PCol("group")
      else ok(it.expr)
    }
  }

  /** `FOREACH (GROUP child BY k) GENERATE …` with only algebraic items:
    * one relational aggregate, no bags, partial agg map-side. `bags`
    * maps each bag name (the group's own, plus nested FILTER/FOREACH
    * aliases) to its [[BagInfo]] — aggregates over a filtered bag
    * become CONDITIONAL aggregates (`count(when(p, …))`), the
    * filtered-agg plan a nested FOREACH block deserves at scale; a
    * `lit(true)` predicate constant-folds away. Projected bags
    * aggregate the projection expression directly. */
  private def compileAggForeach(meta: GroupMeta, items: Seq[GenItem],
      bags: Map[String, BagInfo]): DataFrame = {
    val child = meta.child
    val keyInfo = meta.keys.zipWithIndex.map { case (k, i) =>
      (compileExpr(child, k), keyName(child, k, i), s"__gk$i")
    }
    val keyByName: Map[String, String] = keyInfo.map(t => t._2 -> t._3).toMap

    val bagNames = bags.keySet

    // pass 1: collect the distinct aggregate calls across all items
    val aggCalls = mutable.LinkedHashMap.empty[PExpr, (String, Column)]
    def collectAggs(e: PExpr): Unit = e match {
      case c @ PCall(fn, Seq(a)) if aggFns(fn) && isBagRef(bagNames, a) =>
        if (!aggCalls.contains(c)) {
          val id = s"__ag${aggCalls.size}"
          aggCalls(c) = (id, compileAggCall(child, fn, a, bags(bagRefName(a))).as(id))
        }
      case PCall(_, args) => args.foreach(collectAggs)
      case PBin(_, l, r) => collectAggs(l); collectAggs(r)
      case PNeg(x) => collectAggs(x)
      case PNot(x) => collectAggs(x)
      case PCast(_, x) => collectAggs(x)
      case PTernary(c, t, f) => collectAggs(c); collectAggs(t); collectAggs(f)
      case PCaseWhen(op, brs, els) =>
        op.foreach(collectAggs)
        brs.foreach { case (w, t) => collectAggs(w); collectAggs(t) }
        els.foreach(collectAggs)
      case PIsNull(x, _) => collectAggs(x)
      case PMatches(x, _) => collectAggs(x)
      case _ =>
    }
    items.foreach(i => collectAggs(i.expr))

    val aggExprs =
      if (aggCalls.isEmpty) Seq(count(lit(1)).as("__dummy"))
      else aggCalls.values.map(_._2).toSeq
    val agged =
      if (meta.all) child.agg(aggExprs.head, aggExprs.tail: _*)
      else grouped(child, meta.mode, keyInfo.map { case (c, _, gk) => c.as(gk) })
        .agg(aggExprs.head, aggExprs.tail: _*)

    // pass 2: item expressions over the aggregated columns
    def post(e: PExpr): Column = e match {
      case c @ PCall(fn, Seq(a)) if aggFns(fn) && isBagRef(bagNames, a) =>
        col(aggCalls(c)._1)
      case PCol("group") =>
        if (meta.all) lit("all")
        else if (keyInfo.length == 1) col(keyInfo.head._3)
        else struct(keyInfo.map { case (_, nm, gk) => col(gk).as(nm) }: _*)
      case PDot(PCol("group"), f) =>
        col(keyByName.getOrElse(f, throw new IllegalArgumentException(
          s"group has no field '$f' (keys: ${keyInfo.map(_._2).mkString(", ")})")))
      case PLit(null) => lit(null)
      case PLit(v) => lit(v)
      case PBigLit(digits) => BigNum.big(lit(digits))
      case PBin(op, l, r) =>
        val (lc, rc) = (post(l), post(r))
        if (bigSensitive(op))
          binOpT(op, lc, rc, isBigCol(agged, lc), isBigCol(agged, rc))
        else binOp(op, lc, rc)
      case PNeg(x) =>
        val c = post(x)
        if (isBigCol(agged, c)) BigNum.neg(c) else -c
      case PNot(x) => !post(x)
      case PCast(t, x) =>
        val c = post(x)
        castPigType(c, t, Some(dtypeOf(agged, c)))
      case PTernary(c, t, f) => when(post(c), post(t)).otherwise(post(f))
      case PCaseWhen(op, brs, els) => caseWhen(post, op, brs, els)
      case PIsNull(x, neg) => if (neg) post(x).isNotNull else post(x).isNull
      case PMatches(x, re) => PigFunctions.matchesFull(post(x), re)
      case PCall(fn, args) =>
        scalarCall(fn, args.map(post), args, c => dtypeOf(agged, c))
      case other => throw new IllegalArgumentException(s"unsupported in aggregate FOREACH: $other")
    }

    val outCols = items.zipWithIndex.flatMap { case (it, i) =>
      val asNames = it.asNames
      if (it.flatten) { // FLATTEN(group): one column per key
        require(asNames.isEmpty || asNames.length == keyInfo.length,
          s"FLATTEN(group) AS arity ${asNames.length} != ${keyInfo.length} keys")
        keyInfo.zipWithIndex.map { case ((_, nm, gk), j) =>
          val (outName, tpe) =
            if (asNames.nonEmpty) asNames(j) else (nm, None)
          val c = col(gk)
          tpe.map(castPigType(c, _, Some(dtypeOf(agged, c)))).getOrElse(c).as(outName)
        }
      } else {
        val c = post(it.expr)
        val (outName, tpe) = asNames.headOption.getOrElse((defaultName(it.expr, i), None))
        Seq(tpe.map(castPigType(c, _, Some(dtypeOf(agged, c)))).getOrElse(c).as(outName))
      }
    }
    agged.select(outCols: _*)
  }

  private def compileAggCall(child: DataFrame, fn: String, arg: PExpr,
      bag: BagInfo): Column = {
    // `when(lit(true), c)` is constant-folded by Catalyst, so the
    // unfiltered base bag pays nothing for the uniform wrapping
    def field(f: String): Column = when(bag.pred, bag.fields match {
      case Some(m) => compileExpr(child, m.collectFirst { case (n, e) if n == f => e }
        .getOrElse(throw new IllegalArgumentException(
          s"projected bag has no field '$f' (fields: ${m.map(_._1).mkString(", ")})")))
      case None => resolve(child, f)
    })
    def firstField: Column = bag.fields match {
      case Some(m) => compileExpr(child, m.head._2)
      case None => child.col(s"`${child.columns.head}`")
    }
    // bignum bag fields route to the exact aggregators (SUM/AVG) or
    // native struct min/max — COUNT needs no special case (it counts
    // non-null structs)
    def bigField(f: String): Option[Column] = {
      val c = field(f)
      if (isBigCol(child, c)) Some(c) else None
    }
    (fn, arg) match {
      // Pig COUNT(bag) counts tuples whose FIRST field is non-null
      case ("COUNT", PCol(_)) => count(when(bag.pred, firstField))
      case ("COUNT", PDot(_, f)) => count(field(f))
      case ("COUNT_STAR", _) => count(when(bag.pred, lit(1)))
      case ("SUM", PDot(_, f)) =>
        bigField(f).map(BigNum.sumBig).getOrElse(sum(field(f)))
      case ("AVG", PDot(_, f)) =>
        bigField(f).map(BigNum.avgBig).getOrElse(avg(field(f)))
      case ("MIN", PDot(_, f)) => min(field(f))
      case ("MAX", PDot(_, f)) => max(field(f))
      case _ => throw new IllegalArgumentException(
        s"$fn needs a bag field argument (e.g. $fn(rel.column))")
    }
  }

  // ---------------- FOREACH: nested block, bag (HOF) path ----------------

  /** ORDER/LIMIT/DISTINCT inner pipelines (or non-algebraic GENERATE)
    * run over the materialized bags: each nested statement is a per-row
    * higher-order function — the inner pipeline never shuffles. */
  private def compileNestedBags(base: DataFrame,
      stmts: Seq[(String, PNestedOp)], items: Seq[GenItem]): DataFrame = {
    var df = base
    stmts.foreach { case (name, nop) =>
      val srcCol = resolve(df, nop.src)
      val elemType: StructType = dtypeOf(df, srcCol) match {
        case ArrayType(st: StructType, _) => st
        case dt => throw new IllegalArgumentException(
          s"nested ${nop.getClass.getSimpleName} over non-bag '${nop.src}' ($dt)")
      }
      val c = nop match {
        case NFilter(_, cond) => filter(srcCol, e => compileElem(elemType, e, cond))
        case NOrder(_, keys, cmp) =>
          // the top-level comparator policy, applied to HOF sort keys:
          // reverse flips every direction, case-insensitive folds
          // string keys (raw key as tiebreak), anything else refuses
          val resolved = keys.map { case (f, asc) =>
            (fieldIn(elemType, f), asc) }
          def isStr(f: String) = elemType(f).dataType == StringType
          val hofKeys: Seq[(Column => Column, Boolean)] =
            cmp.map(_._1) match {
              case None =>
                resolved.map { case (f, a) =>
                  ((e: Column) => e.getField(f), a) }
              case Some(cls) =>
                val simple = cls.split('.').last.toLowerCase
                if (simple.contains("reverse") ||
                    simple.contains("descending") || simple == "desc")
                  resolved.map { case (f, a) =>
                    ((e: Column) => e.getField(f), !a) }
                else if (simple.contains("caseinsensitive") ||
                    simple.contains("ignorecase"))
                  resolved.flatMap { case (f, a) =>
                    val raw = (e: Column) => e.getField(f)
                    if (isStr(f))
                      Seq(((e: Column) => lower(e.getField(f)), a), (raw, a))
                    else Seq((raw, a))
                  }
                else throw new IllegalArgumentException(
                  s"nested ORDER ... USING '$cls': unsupported " +
                    "comparator. Only reverse (*Reverse*/*Descending*) " +
                    "and case-insensitive (*CaseInsensitive*/*IgnoreCase*) " +
                    "comparators compile to sort keys; rewrite as BY " +
                    "<field> ASC|DESC or drop the USING clause.")
            }
          Relational.nested.sortBagByKeys(srcCol, hofKeys)
        case NLimit(_, n) => slice(srcCol, 1, n)
        case NDistinct(_) => array_distinct(srcCol)
        // inner FOREACH over a materialized bag: per-element projection
        // (transform keeps the pipeline a per-row HOF — no shuffle)
        case NForeach(_, gen) if gen.forall(!_.flatten) =>
          transform(srcCol, e => struct(gen.zipWithIndex.map { case (it, i) =>
            val (nm, tpe) = it.asNames.headOption
              .getOrElse((defaultName(it.expr, i), None))
            val pc = compileElem(elemType, e, it.expr)
            tpe.map(castPigType(pc, _)).getOrElse(pc).as(nm)
          }: _*))
        // inner FOREACH with FLATTEN: still a per-row HOF — a
        // sub-bag field expands via a nested transform + flatten
        // (each element's sub-bag elements become elements of the
        // result bag, Pig's inner-FLATTEN inner-join semantics: null
        // or empty sub-bags contribute nothing); a tuple field
        // expands in place. Never a shuffle, never an explode.
        case NForeach(_, gen) =>
          require(gen.count(_.flatten) == 1,
            "multiple FLATTENs in one nested FOREACH (a per-element " +
              "cross product) are not supported — chain two nested " +
              "FOREACH statements")
          nestedFlattenForeach(df, elemType, srcCol, gen)
      }
      df = df.withColumn(name, c)
    }
    compileRowForeach(df, items)
  }

  /** Nested `p = FOREACH L GENERATE [pre…,] FLATTEN(f) [, post…];`
    * lowered to per-row HOFs. `f` is a bag or tuple field of the bag
    * element, or any COMPUTED expression whose type Catalyst can
    * derive against the frame (e.g. `FLATTEN(TOKENIZE(text))` — the
    * probe HOF is analyzed, never executed):
    *   - bag of tuples  → each sub-element's fields expand, scalar
    *     items ride along per sub-element (transform² + flatten);
    *   - bag of scalars → one field per sub-element;
    *   - tuple          → fields expand in place, one element each. */
  private def nestedFlattenForeach(df: DataFrame, st: StructType,
      srcCol: Column, gen: Seq[GenItem]): Column = {
    val flatIdx = gen.indexWhere(_.flatten)
    val flat = gen(flatIdx)
    val ftype = elemTypeOf(st, flat.expr).orElse {
      // computed expression: type it by ANALYZING (not running) the
      // per-element HOF against the real frame schema
      scala.util.Try(dtypeOf(df,
        transform(srcCol, e => compileElem(st, e, flat.expr)))).toOption
        .collect { case ArrayType(t, _) => t }
    }.getOrElse(
      throw new IllegalArgumentException(
        "FLATTEN inside a nested FOREACH needs a bag/tuple-valued " +
          s"argument (got: ${flat.expr}, which does not analyze to one " +
          "against the element schema) — project the value with a " +
          "prior nested FOREACH statement first"))
    def named(c: Column, as: Option[(String, Option[String])], i: Int,
        e: PExpr): Column = {
      val (nm, tpe) = as.getOrElse((defaultName(e, i), None))
      tpe.map(castPigType(c, _)).getOrElse(c).as(nm)
    }
    // GENERATE-ordered output fields for one (outer elem, sub elem)
    def fields(e: Column, sub: Option[Column]): Seq[Column] =
      gen.zipWithIndex.flatMap { case (it, i) =>
        if (!it.flatten)
          Seq(named(compileElem(st, e, it.expr), it.asNames.headOption, i,
            it.expr))
        else ftype match {
          case ArrayType(et: StructType, _) =>
            require(flat.asNames.isEmpty ||
                flat.asNames.length == et.fields.length,
              s"FLATTEN AS arity ${flat.asNames.length} != " +
                s"${et.fields.length} fields")
            et.fields.zipWithIndex.map { case (f, j) =>
              named(sub.get.getField(f.name),
                flat.asNames.lift(j).orElse(Some((f.name, None))), i, it.expr)
            }
          case ArrayType(_, _) =>
            Seq(named(sub.get, flat.asNames.headOption, i, it.expr))
          case _: StructType =>
            val base = compileElem(st, e, it.expr)
            val sf = ftype.asInstanceOf[StructType].fields
            require(flat.asNames.isEmpty || flat.asNames.length == sf.length,
              s"FLATTEN AS arity ${flat.asNames.length} != ${sf.length} fields")
            sf.zipWithIndex.map { case (f, j) =>
              named(base.getField(f.name),
                flat.asNames.lift(j).orElse(Some((f.name, None))), i, it.expr)
            }
          case other => throw new IllegalArgumentException(
            s"FLATTEN inside a nested FOREACH needs a bag or tuple field, " +
              s"got ${other.simpleString}")
        }
      }
    ftype match {
      case _: ArrayType =>
        val nested = transform(srcCol, e =>
          transform(compileElem(st, e, flat.expr), t =>
            struct(fields(e, Some(t)): _*)))
        flatten(filter(nested, a => a.isNotNull))
      case _ =>
        transform(srcCol, e => struct(fields(e, None): _*))
    }
  }

  private def fieldIn(st: StructType, name: String): String =
    st.fieldNames.find(_ == name)
      .orElse {
        val cands = st.fieldNames.filter(_.endsWith(s"::$name"))
        if (cands.length == 1) Some(cands.head) else None
      }
      .getOrElse(throw new IllegalArgumentException(
        s"no field '$name' in bag element (${st.fieldNames.mkString(", ")})"))

  /** Expression over a bag ELEMENT (lambda variable) — used by nested
    * FILTER predicates. Same operator surface as [[compileExpr]] minus
    * the type-dispatched builtins (no analysis is possible on a lambda
    * variable; nested predicates are scalar comparisons in practice). */
  /** Static type of a nested-bag element expression, where resolvable
    * (field refs and struct drills against the ELEMENT schema — the
    * nested analogue of dtypeOf; None for computed expressions). */
  private def elemTypeOf(st: StructType, e: PExpr): Option[DataType] = e match {
    case PCol(n) => scala.util.Try(st(fieldIn(st, n)).dataType).toOption
    case PPos(i) if i < st.fields.length => Some(st.fields(i).dataType)
    case PDot(b, f) => elemTypeOf(st, b).flatMap {
      case s: StructType => scala.util.Try(s(f).dataType).toOption
      case _ => None
    }
    case _ => None
  }

  /** Does a nested-bag element expression produce a bignum? Mirrors the
    * top level's maybeBig: field types via [[elemTypeOf]], plus the
    * shapes that CREATE bignums (literals, casts, arithmetic whose
    * either side is big). Without this, bignum fields inside nested
    * FOREACH/FILTER blocks fell through to plain numeric ops on the
    * carrier struct. */
  private def elemIsBig(st: StructType, e: PExpr): Boolean = e match {
    case PBigLit(_) => true
    case PCast(t, _) => t == "biginteger" || t == "bigdecimal"
    case PBin(op, l, r) if Set("+", "-", "*", "/", "%")(op) =>
      elemIsBig(st, l) || elemIsBig(st, r)
    case PNeg(x) => elemIsBig(st, x)
    case PTernary(_, t, f) => elemIsBig(st, t) || elemIsBig(st, f)
    case _ => elemTypeOf(st, e).exists(BigNum.isBig)
  }

  private def compileElem(st: StructType, elem: Column, e: PExpr): Column = e match {
    case PLit(null) => lit(null)
    case PLit(v) => lit(v)
    case PBigLit(digits) => BigNum.big(lit(digits))
    case PCol(n) => elem.getField(fieldIn(st, n))
    case PPos(i) => elem.getField(st.fields(i).name)
    case PDot(b, f) => compileElem(st, elem, b).getField(f)
    case PMapGet(b, k) => compileElem(st, elem, b).getItem(k)
    case PBin(op, l, r) => binOpT(op, compileElem(st, elem, l), compileElem(st, elem, r),
      elemIsBig(st, l), elemIsBig(st, r))
    case PNot(x) => !compileElem(st, elem, x)
    case PNeg(x) =>
      val c = compileElem(st, elem, x)
      if (elemIsBig(st, x)) BigNum.neg(c) else -c
    case PIsNull(x, neg) =>
      val c = compileElem(st, elem, x); if (neg) c.isNotNull else c.isNull
    case PMatches(x, re) => PigFunctions.matchesFull(compileElem(st, elem, x), re)
    case PIn(x, items) =>
      compileElem(st, elem, x).isin(items.map(compileElem(st, elem, _)): _*)
    case PTernary(c, t, f) =>
      when(compileElem(st, elem, c), compileElem(st, elem, t))
        .otherwise(compileElem(st, elem, f))
    case PCast(t, x) =>
      val dt: Option[DataType] =
        if (elemIsBig(st, x)) Some(BigNum.schema) else elemTypeOf(st, x)
      castPigType(compileElem(st, elem, x), t, dt)
    case PCall(fn, args) =>
      scalarCall(fn, args.map(compileElem(st, elem, _)), args, _ =>
        throw new IllegalArgumentException(
          s"$fn needs type dispatch — unsupported inside a nested FILTER predicate"))
    case PCaseWhen(op, brs, els) => caseWhen(compileElem(st, elem, _), op, brs, els)
    case other => throw new IllegalArgumentException(
      s"unsupported in nested predicate: $other")
  }

  // ---------------- FOREACH: row path (incl. FLATTEN) ----------------

  private def compileRowForeach(input: DataFrame, rawItems: Seq[GenItem]): DataFrame = {
    // `*` never includes bound scalar-alias columns (bindScalars)
    val starCols = input.columns.filterNot(_.startsWith("__sc_"))
    // stage 0: expand range projections (`a..d`) to plain column items
    val items = rawItems.flatMap {
      case GenItem(PRangeProj(f, t), flat, as) =>
        require(!flat && as.isEmpty, "range projection takes no FLATTEN/AS")
        def idx(e: PExpr): Int = e match {
          case PPos(i) => i
          case PCol(n) => starCols.indexOf(resolvedName(input, n))
          case other => throw new IllegalArgumentException(
            s"range endpoint must be a column or $$n, got $other")
        }
        val lo = f.map(idx).getOrElse(0)
        val hi = t.map(idx).getOrElse(starCols.length - 1)
        require(lo >= 0 && hi >= lo && hi < starCols.length,
          s"range projection out of order or out of bounds ($lo..$hi)")
        starCols.slice(lo, hi + 1).toSeq.map(n =>
          GenItem(PCol(n), flatten = false, Seq((n.split("::").last, None))))
      case it => Seq(it)
    }
    // stage 1: compute every item into a temp slot (__it{i}); FLATTEN of
    // an array stays an array in its slot for now
    case class Slot(tmp: String, item: GenItem, dt: DataType)
    val slots = items.zipWithIndex.map { case (it, i) =>
      val c = it.expr match {
        case PStar => struct(starCols.map(c => input.col(s"`$c`")): _*)
        case e => compileExpr(input, e)
      }
      Slot(s"__it$i", it.copy(expr = it.expr), dtypeOf(input, c)) -> c
    }
    var df = input.select(slots.map { case (s, c) => c.as(s.tmp) }: _*)

    // stage 2: explode array-flatten slots left-to-right (each explode
    // is its own projection stage; multiple FLATTENs = cross product,
    // matching Pig)
    slots.foreach { case (s, _) =>
      if (s.item.flatten) s.dt match {
        case _: ArrayType =>
          val others = df.columns.filter(_ != s.tmp).map(c => col(s"`$c`"))
          df = df.select((others :+ explode(col(s.tmp)).as(s.tmp)): _*)
        case _ => // struct/tuple flatten needs no explode
      }
    }

    // stage 3: expand slots to final named columns
    val out = slots.flatMap { case (s, _) =>
      val c = col(s.tmp)
      val as = s.item.asNames
      // dt rides along so bignum inputs unwrap before a scalar cast
      def cast1(c: Column, t: Option[String], dt: DataType) =
        t.map(castPigType(c, _, Some(dt))).getOrElse(c)
      s.item match {
        case GenItem(PStar, false, _) =>
          starCols.map(n => c.getField(n).as(n)).toSeq
        case GenItem(e, true, _) =>
          val innerDt = s.dt match {
            case ArrayType(et, _) => et
            case dt => dt
          }
          innerDt match {
            case st: StructType if !graft.functions.BigNum.isBig(st) =>
              require(as.isEmpty || as.length == st.fields.length,
                s"FLATTEN AS arity ${as.length} != ${st.fields.length} fields")
              st.fields.zipWithIndex.map { case (f, j) =>
                val (nm, t) = if (as.nonEmpty) as(j) else (f.name.split("::").last, None)
                cast1(c.getField(f.name), t, f.dataType).as(nm)
              }.toSeq
            case other =>
              val (nm, t) = as.headOption.getOrElse((flatName(e), None))
              Seq(cast1(c, t, other).as(nm))
          }
        case GenItem(e, false, _) =>
          val (nm, t) = as.headOption.getOrElse((defaultName(e, slots.indexWhere(_._1 eq s)), None))
          Seq(cast1(c, t, s.dt).as(nm))
      }
    }
    df.select(out: _*)
  }

  private def defaultName(e: PExpr, i: Int): String = e match {
    case PCol(n) => n.split("::").last
    case PDot(_, f) => f
    case PCall(fn, _) => fn.toLowerCase
    case _ => s"val$i"
  }

  private def flatName(e: PExpr): String = e match {
    case PCol(n) => n.split("::").last
    case PDot(_, f) => f
    case _ => "token"
  }

  // ---------------- expressions (row context) ----------------

  /** Qualify every unqualified column as `alias::col` — Pig's join/cross
    * output naming. Already-qualified names pass through (nested joins
    * keep their original qualifier, like Pig). */
  private def qualify(df: DataFrame, alias: String): DataFrame = {
    val renames = df.columns.collect { case c if !c.contains("::") => c -> s"$alias::$c" }
    if (renames.isEmpty) df else df.withColumnsRenamed(renames.toMap)
  }

  private def resolvedName(df: DataFrame, name: String): String = {
    if (df.columns.contains(name)) name
    else {
      val cands = df.columns.filter(_.endsWith(s"::$name"))
      cands.length match {
        case 1 => cands.head
        case 0 => throw new IllegalArgumentException(
          s"unknown column '$name'; available: ${df.columns.mkString(", ")}")
        case _ => throw new IllegalArgumentException(
          s"ambiguous column '$name': ${cands.mkString(", ")} — qualify with alias::")
      }
    }
  }

  private def resolve(df: DataFrame, name: String): Column =
    df.col(s"`${resolvedName(df, name)}`")

  private[pig] def compileExpr(df: DataFrame, e: PExpr): Column = e match {
    case PLit(null) => lit(null)
    case PLit(v) => lit(v)
    case PBigLit(digits) => BigNum.big(lit(digits))
    case PCol(n) => resolve(df, n)
    case PPos(i) =>
      require(i < df.columns.length,
        s"positional $$${i} out of range (width ${df.columns.length})")
      df.col(s"`${df.columns(i)}`")
    case PDot(b, f) => compileExpr(df, b).getField(f)
    case PMapGet(b, k) => compileExpr(df, b).getItem(k)
    case PBin(op, l, r) =>
      val (lc, rc) = (compileExpr(df, l), compileExpr(df, r))
      if (bigSensitive(op) && (maybeBig(df, l) || maybeBig(df, r)))
        binOpT(op, lc, rc, maybeBig(df, l), maybeBig(df, r))
      else binOp(op, lc, rc)
    case PNot(x) => !compileExpr(df, x)
    case PNeg(x) =>
      val c = compileExpr(df, x)
      if (maybeBig(df, x)) BigNum.neg(c) else -c
    case PIsNull(x, neg) =>
      val c = compileExpr(df, x); if (neg) c.isNotNull else c.isNull
    case PMatches(x, re) => PigFunctions.matchesFull(compileExpr(df, x), re)
    case PIn(x, items) =>
      compileExpr(df, x).isin(items.map(compileExpr(df, _)): _*)
    case PTernary(c, t, f) =>
      when(compileExpr(df, c), compileExpr(df, t)).otherwise(compileExpr(df, f))
    case PCast(t, x) =>
      val c = compileExpr(df, x)
      castPigType(c, t, Some(dtypeOf(df, c)))
    case PCall(fn, args) =>
      scalarCall(fn, args.map(compileExpr(df, _)), args, c => dtypeOf(df, c))
    case PCaseWhen(op, brs, els) => caseWhen(compileExpr(df, _), op, brs, els)
    case PStar => throw new IllegalArgumentException("* is only valid as a GENERATE item")
    case PRangeProj(_, _) => throw new IllegalArgumentException(
      "range projection (a..b) is only valid as a GENERATE item")
  }

  /** Ops whose operands may need bignum dispatch (arith + compares —
    * and/or can't type a bignum). */
  private val bigSensitive =
    Set("+", "-", "*", "/", "%", "==", "!=", "<", "<=", ">", ">=")

  private def isBigCol(df: DataFrame, c: Column): Boolean =
    BigNum.isBig(dtypeOf(df, c))

  /** Structural "is this expression bignum-typed" — O(1) against the
    * CACHED schema for the common shapes (field refs, casts, literals,
    * arith), so the dispatch never re-analyzes a plan per binop. A
    * false NEGATIVE on a comparison is still correct (struct equality/
    * ordering is numeric by construction of the sort key); only the
    * dtypeOf fallback shapes (nested field access) pay an analysis. */
  private def maybeBig(df: DataFrame, e: PExpr): Boolean = e match {
    case PBigLit(_) => true
    case PCast(t, _) => t == "biginteger" || t == "bigdecimal"
    case PCol(n) => BigNum.isBig(df.schema(resolvedName(df, n)).dataType)
    case PPos(i) =>
      i < df.columns.length && BigNum.isBig(df.schema(i).dataType)
    case PBin(op, l, r) if Set("+", "-", "*", "/", "%")(op) =>
      maybeBig(df, l) || maybeBig(df, r)
    case PNeg(x) => maybeBig(df, x)
    case PTernary(_, t, f) => maybeBig(df, t) || maybeBig(df, f)
    case PCaseWhen(_, brs, els) =>
      brs.exists(b => maybeBig(df, b._2)) || els.exists(maybeBig(df, _))
    case PDot(_, _) | PMapGet(_, _) =>
      BigNum.isBig(dtypeOf(df, compileExpr(df, e)))
    case _ => false
  }

  /** Arithmetic/comparison with bignum promotion: if either side is a
    * bignum struct, lift the other and run the exact kernels;
    * comparisons ride native struct ordering (the sort-key field), so
    * they stay inside codegen with no custom comparator. */
  private def binOpT(op: String, l: Column, r: Column,
      lBig: Boolean, rBig: Boolean): Column =
    if (!lBig && !rBig) binOp(op, l, r)
    else {
      val lw = if (lBig) l else BigNum.big(l)
      val rw = if (rBig) r else BigNum.big(r)
      op match {
        case "+" => BigNum.add(lw, rw)
        case "-" => BigNum.sub(lw, rw)
        case "*" => BigNum.mul(lw, rw)
        case "/" => BigNum.div(lw, rw)
        case "%" => BigNum.mod(lw, rw)
        case _ => binOp(op, lw, rw)
      }
    }

  private def binOp(op: String, l: Column, r: Column): Column = op match {
    case "and" => l && r
    case "or" => l || r
    case "+" => l + r
    case "-" => l - r
    case "*" => l * r
    case "/" => l / r
    case "%" => l % r
    case "==" => l === r
    case "!=" => l =!= r
    case "<" => l < r
    case "<=" => l <= r
    case ">" => l > r
    case ">=" => l >= r
  }

  /** `dt` is the input column's resolved type where the caller can
    * supply it — needed only so bignum structs unwrap before a
    * non-bignum cast (and pass through / truncate on a bignum one).
    * BIGINTEGER/BIGDECIMAL are TRUE arbitrary precision (beyond
    * DecimalType's 38-digit cap): values live in the
    * [[graft.functions.BigNum]] struct rep. */
  private[pig] def castPigType(c0: Column, pigType: String,
      dt: Option[DataType] = None): Column = {
    val fromBig = dt.exists(BigNum.isBig)
    def c = if (fromBig) BigNum.str(c0) else c0
    pigType match {
      case "int" => PigFunctions.castPig(c, "int")
      case "long" => PigFunctions.castPig(c, "bigint")
      case "float" => PigFunctions.castPig(c, "float")
      case "double" => PigFunctions.castPig(c, "double")
      case "chararray" => PigFunctions.castPig(c, "string")
      case "boolean" => PigFunctions.castPig(c, "boolean")
      case "datetime" => PigFunctions.castPig(c, "timestamp")
      case "biginteger" => BigNum.bigInteger(c)
      case "bigdecimal" => if (fromBig) c0 else BigNum.big(c)
      case "bytearray" => c0 // bytearray = "raw, cast later": identity
    }
  }

  // ---------------- scalar builtin dispatch ----------------

  private def litString(raw: Seq[PExpr], i: Int, fn: String): String = raw(i) match {
    case PLit(s: String) => s
    case other => throw new IllegalArgumentException(
      s"$fn expects a string literal at arg ${i + 1}, got $other")
  }
  private def litInt(raw: Seq[PExpr], i: Int, fn: String): Int = raw(i) match {
    case PLit(v: Int) => v
    case PLit(v: Long) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn expects an int literal at arg ${i + 1}, got $other")
  }

  /** Scalar (and bag-over-array) builtins. `args` are compiled columns,
    * `raw` the AST args (for literal-only parameters), `dtype` resolves
    * a compiled column's type in the caller's context. The bag family
    * (COUNT/SUM/…) dispatches on the ARGUMENT TYPE: over an array
    * column (a materialized bag) it becomes a higher-order function —
    * per-row, no shuffle (Relational.nested's building blocks). */
  private def scalarCall(fn: String, args: Seq[Column],
      raw: Seq[PExpr], dtype: Column => DataType): Column = {
    def a0 = args.head
    fn match {
      // `ns.func(...)`: scripting UDF (case-preserved by the parser).
      // The active session is the one compiling this script — scalarCall
      // has no session parameter and script UDFs are the only case that
      // needs one (for the idempotent wrapper registration).
      case nsfn if nsfn.contains(".") =>
        val Array(ns, f) = nsfn.split("\\.", 2)
        graft.functions.ScriptUdfs.column(
          org.apache.spark.sql.SparkSession.active, ns, f, args)
      case "UPPER" => upper(a0)
      case "LOWER" => lower(a0)
      case "TRIM" => trim(a0)
      case "LTRIM" => ltrim(a0)
      case "RTRIM" => rtrim(a0)
      case "CONCAT" => concat(args: _*)
      case "SUBSTRING" =>
        PigFunctions.substringPig(a0, litInt(raw, 1, fn), litInt(raw, 2, fn))
      case "INDEXOF" => PigFunctions.indexOfPig(a0, litString(raw, 1, fn))
      case "LAST_INDEX_OF" => PigFunctions.lastIndexOfPig(a0, litString(raw, 1, fn))
      case "STRSPLIT" => PigFunctions.strSplit(a0, litString(raw, 1, fn))
      case "TOKENIZE" => PigFunctions.tokenize(a0)
      case "REPLACE" =>
        regexp_replace(a0, litString(raw, 1, fn), litString(raw, 2, fn))
      case "REGEX_EXTRACT" =>
        PigFunctions.regexExtract(a0, litString(raw, 1, fn), litInt(raw, 2, fn))
      case "SPRINTF" => PigFunctions.sprintf(litString(raw, 0, fn), args.tail: _*)
      case "UCFIRST" => PigFunctions.ucfirst(a0)
      case "LCFIRST" =>
        concat(lower(substring(a0, 1, 1)), substring(a0, 2, Int.MaxValue))
      case "STARTSWITH" => PigFunctions.startsWithPig(a0, litString(raw, 1, fn))
      case "ENDSWITH" => PigFunctions.endsWithPig(a0, litString(raw, 1, fn))
      case "EQUALSIGNORECASE" => PigFunctions.equalsIgnoreCase(a0, args(1))
      // TOP(n, fieldIdx, bag) [Pig: o.a.p.builtin.TOP — priority-queue
      // Algebraic UDF]: top-n tuples of the bag by the idx-th field,
      // descending — expressed as sorted-slice bag HOFs (no shuffle;
      // null field values compare equal, like an untouched PQ slot)
      case "TOP" =>
        val n = litInt(raw, 0, fn)
        val idx = litInt(raw, 1, fn)
        val bag = args(2)
        dtype(bag) match {
          case ArrayType(st: StructType, _) =>
            require(idx >= 0 && idx < st.fields.length,
              s"TOP: field index $idx out of range (0..${st.fields.length - 1})")
            val f = st.fields(idx).name
            slice(array_sort(bag, (l, r) =>
              when(l.getField(f) < r.getField(f), lit(1))
                .when(l.getField(f) > r.getField(f), lit(-1))
                .otherwise(lit(0))), 1, n)
          case other => throw new IllegalArgumentException(
            s"TOP expects a bag of tuples, got ${other.simpleString}")
        }
      case "SIZE" => dtype(a0) match {
        case StringType => length(a0).cast("long")
        case _: ArrayType | _: MapType => PigFunctions.sizeOf(a0).cast("long")
        case st: StructType => lit(st.fields.length.toLong)
        case _ => lit(1L)
      }
      case "ABS" => abs(a0)
      case "CEIL" => ceil(a0).cast("double")
      case "FLOOR" => floor(a0).cast("double")
      // Pig ROUND is Math.round: half toward +infinity (-2.5 -> -2),
      // NOT Spark/SQL round's half away from zero (-2.5 -> -3)
      case "ROUND" => floor(a0 + lit(0.5)).cast("long")
      case "ROUND_TO" => PigFunctions.roundTo(a0, litInt(raw, 1, fn))
      case "SQRT" => sqrt(a0)
      case "CBRT" => cbrt(a0)
      case "EXP" => exp(a0)
      case "LOG" => log(a0)
      case "LOG10" => log10(a0)
      case "POW" => pow(a0, args(1))
      case "TODATE" =>
        if (args.length >= 2) to_timestamp(a0, litString(raw, 1, fn))
        else to_timestamp(a0)
      case "GETYEAR" => year(a0)
      case "GETMONTH" => month(a0)
      case "GETDAY" => dayofmonth(a0)
      case "GETHOUR" => hour(a0)
      case "GETMINUTE" => minute(a0)
      case "GETSECOND" => second(a0)
      case "GETWEEK" => PigFunctions.getWeek(a0)
      case "GETWEEKYEAR" => PigFunctions.getWeekYear(a0)
      case "DAYSBETWEEN" => PigFunctions.daysBetween(a0, args(1))
      case "HOURSBETWEEN" => PigFunctions.hoursBetween(a0, args(1))
      case "MINUTESBETWEEN" => PigFunctions.minutesBetween(a0, args(1))
      case "SECONDSBETWEEN" => PigFunctions.secondsBetween(a0, args(1))
      case "WEEKSBETWEEN" => PigFunctions.weeksBetween(a0, args(1))
      case "MONTHSBETWEEN" => PigFunctions.monthsBetweenPig(a0, args(1))
      case "YEARSBETWEEN" => PigFunctions.yearsBetween(a0, args(1))
      case "ADDDURATION" => PigFunctions.addDuration(a0, litString(raw, 1, fn))
      case "SUBTRACTDURATION" =>
        PigFunctions.subtractDuration(a0, litString(raw, 1, fn))
      case "TOUNIXTIME" => PigFunctions.toUnixTime(a0)
      case "TOMILLISECONDS" => PigFunctions.toMilliSeconds(a0)
      case "ISEMPTY" => PigFunctions.isEmptyBag(a0)
      case "BAGTOSTRING" => PigFunctions.bagToString(a0, litString(raw, 1, fn))
      case "DIFF" => PigFunctions.bagDiff(a0, args(1))
      case "SUBTRACT" => PigFunctions.bagSubtract(a0, args(1))
      case "TOBAG" => PigFunctions.toBag(args: _*)
      case "TOTUPLE" => PigFunctions.toTuple(args: _*)
      case "TOMAP" => PigFunctions.toMapPig(args: _*)
      // bag aggregates over a MATERIALIZED bag column (array) — per-row
      // HOFs, the nested-FOREACH building blocks:
      case "COUNT" | "COUNT_STAR" | "SUM" | "AVG" | "MIN" | "MAX" =>
        dtype(a0) match {
          case ArrayType(et, _) => bagAgg(fn, a0, et)
          case dt => throw new IllegalArgumentException(
            s"$fn outside an aggregating FOREACH needs a bag (array) argument, got $dt")
        }
      case other => throw new IllegalArgumentException(
        s"unknown function $other (see graft.functions.PigFunctions for the supported surface)")
    }
  }

  private def bagAgg(fn: String, bag: Column, elem: DataType): Column = fn match {
    case "COUNT" => elem match {
      // Pig COUNT skips tuples whose first field is null
      case st: StructType =>
        size(filter(bag, e => e.getField(st.fields.head.name).isNotNull)).cast("long")
      case _ => size(filter(bag, e => e.isNotNull)).cast("long")
    }
    case "COUNT_STAR" => PigFunctions.sizeOf(bag).cast("long")
    case "SUM" => elem match {
      case IntegerType | LongType =>
        aggregate(bag, lit(0L), (acc, x) => acc + x.cast("bigint"))
      case _ => aggregate(bag, lit(0.0), (acc, x) => acc + x.cast("double"))
    }
    case "AVG" =>
      aggregate(bag, lit(0.0), (acc, x) => acc + x.cast("double")) /
        PigFunctions.sizeOf(bag)
    case "MIN" => array_min(bag)
    case "MAX" => array_max(bag)
  }

  private def dtypeOf(df: DataFrame, c: Column): DataType =
    df.select(c).schema.head.dataType
}
