package graft.pig

/** AST for the Pig Latin core statement grammar (SURVEY.md §3.1 — the
  * reference lineage's textual entry point). Covers the statement set a
  * reference user's scripts actually exercise: LOAD [AS] / STORE /
  * FILTER / FOREACH…GENERATE [FLATTEN] / GROUP [ALL] / COGROUP /
  * JOIN [USING 'replicated'|'skewed'] [outer] / ORDER / LIMIT /
  * DISTINCT / UNION [ONSCHEMA] / CROSS / SPLIT [OTHERWISE] / SAMPLE /
  * RANK [BY … [DENSE]] / STREAM…THROUGH / DUMP / DESCRIBE, plus
  * DEFINE-macro and $param substitution in [[PigPreprocessor]].
  *
  * Nested FOREACH blocks support inner FILTER / ORDER / LIMIT /
  * DISTINCT / FOREACH (and the `p = L.field;` projection shorthand).
  * Documented non-goals (SURVEY.md §7.5.7): scripting UDFs, MAPREDUCE
  * inline.
  */
object PigAst {

  // ---------------- expressions ----------------

  sealed trait PExpr
  /** Int / Long / Double / String / Boolean literal, or null. */
  final case class PLit(v: Any) extends PExpr
  /** Arbitrary-precision literal: `123BI` / `1.25BD` (Pig BIGINTEGER /
    * BIGDECIMAL). Carries the digits verbatim — no float round-trip. */
  final case class PBigLit(digits: String) extends PExpr
  /** Column reference: `x` or the join-qualified `a::x`. */
  final case class PCol(name: String) extends PExpr
  /** Positional reference `$3` (lazy-typed loads, SURVEY §1.3). */
  final case class PPos(idx: Int) extends PExpr
  /** Field access `e.f` (tuple/struct field, or bag-column projection). */
  final case class PDot(e: PExpr, field: String) extends PExpr
  /** Map access `m#'key'`. */
  final case class PMapGet(e: PExpr, key: String) extends PExpr
  /** Binary op: + - * / % == != < <= > >= and or */
  final case class PBin(op: String, l: PExpr, r: PExpr) extends PExpr
  final case class PNot(e: PExpr) extends PExpr
  final case class PNeg(e: PExpr) extends PExpr
  final case class PIsNull(e: PExpr, negated: Boolean) extends PExpr
  /** `e matches 'regex'` — full-string match (semantics shim §7.5.3). */
  final case class PMatches(e: PExpr, regex: String) extends PExpr
  final case class PIn(e: PExpr, items: Seq[PExpr]) extends PExpr
  /** `cond ? a : b` (Pig bincond). */
  final case class PTernary(c: PExpr, t: PExpr, f: PExpr) extends PExpr
  /** Pig 0.12 CASE: `CASE [operand] WHEN w THEN t … [ELSE e] END`.
    * With an operand, each WHEN is an equality test against it. */
  final case class PCaseWhen(operand: Option[PExpr],
      branches: Seq[(PExpr, PExpr)], els: Option[PExpr]) extends PExpr
  /** `(int)e` — Pig cast = try_cast under ANSI (null on failure). */
  final case class PCast(tpe: String, e: PExpr) extends PExpr
  final case class PCall(fn: String, args: Seq[PExpr]) extends PExpr
  /** `*` — all columns of the input relation. */
  case object PStar extends PExpr
  /** Range projection `a..d` / `..d` / `a..` / `$1..$3` — only valid
    * as a GENERATE item; expands to the input columns between the
    * endpoints (inclusive), in schema order. */
  final case class PRangeProj(from: Option[PExpr], to: Option[PExpr]) extends PExpr

  // ---------------- FOREACH items ----------------

  /** One GENERATE item; `asNames` may carry several names (FLATTEN of a
    * tuple / multi-field AS). A name may carry an optional `:type`. */
  final case class GenItem(expr: PExpr, flatten: Boolean,
      asNames: Seq[(String, Option[String])])

  // ---------------- relational operators ----------------

  sealed trait POp

  /** FOREACH input: a bound alias, or Pig's inline-relation form
    * `FOREACH (GROUP A BY x) GENERATE …` (nested op, never bound). */
  sealed trait PRelRef
  final case class RAlias(name: String) extends PRelRef
  final case class RInline(op: POp) extends PRelRef

  final case class PLoad(path: String, loader: Option[(String, Seq[String])],
      schema: Option[Seq[(String, Option[String])]]) extends POp
  final case class PFilter(in: String, cond: PExpr) extends POp
  final case class PForeach(in: PRelRef, items: Seq[GenItem]) extends POp

  /** Nested-FOREACH inner pipeline statement (`x = FILTER L BY p;`
    * inside a `FOREACH G { ... GENERATE ...; }` block). */
  sealed trait PNestedOp { def src: String }
  final case class NFilter(src: String, cond: PExpr) extends PNestedOp
  /** Nested ORDER: multi-key, with the same optional comparator
    * surface as the top-level POrder (reverse / case-insensitive
    * compile to key rewrites; anything else refuses loudly). */
  final case class NOrder(src: String, keys: Seq[(String, Boolean)],
      comparator: Option[(String, Seq[String])] = None) extends PNestedOp
  final case class NLimit(src: String, n: Int) extends PNestedOp
  final case class NDistinct(src: String) extends PNestedOp
  /** Inner FOREACH — bag-field projection before aggregation
    * (`p = FOREACH L GENERATE e AS f;`), or its shorthand
    * `p = L.field;`. */
  final case class NForeach(src: String, items: Seq[GenItem]) extends PNestedOp
  final case class PForeachNested(in: PRelRef,
      stmts: Seq[(String, PNestedOp)], items: Seq[GenItem]) extends POp

  /** CUBE/ROLLUP statement: `C = CUBE A BY CUBE(d1, d2);` (Pig 0.11). */
  final case class PCubeOp(in: String, dims: Seq[PExpr], rollup: Boolean) extends POp
  /** GROUP (1 input) / COGROUP (n inputs); `inner` lists inputs with the
    * INNER modifier (drop keys whose bag would be empty). `hint`:
    * Some("collected"|"merge") for `USING 'collected'/'merge'` — the
    * input-is-already-clustered contract (Pig: CollectableLoadFunc /
    * sorted loader), verified at compile so the aggregate runs with
    * zero Exchange or fails loudly. */
  final case class PGroup(inputs: Seq[(String, Seq[PExpr])], all: Boolean,
      inner: Set[String], hint: Option[String] = None) extends POp
  /** `outer`: None = inner; Some("left"|"right"|"full_outer").
    * `using`: replicated | skewed | merge (strategy hints). */
  final case class PJoin(sides: Seq[(String, Seq[PExpr])],
      outer: Option[String], using: Option[String]) extends POp
  /** `comparator`: `ORDER … USING <class>` — honored when the class
    * name encodes one of the two idiomatic shapes (reverse /
    * case-insensitive), refused loudly otherwise [Pig: LOSort
    * setUserFunc]. */
  final case class POrder(in: String, keys: Seq[(PExpr, Boolean)],
      comparator: Option[(String, Seq[String])] = None) extends POp
  final case class PLimit(in: String, n: Long) extends POp
  final case class PDistinct(in: String) extends POp
  final case class PUnion(ins: Seq[String], onSchema: Boolean) extends POp
  final case class PCross(ins: Seq[String]) extends POp
  final case class PSample(in: String, fraction: Double) extends POp
  final case class PRank(in: String, keys: Seq[(PExpr, Boolean)],
      dense: Boolean) extends POp
  /** `byName = true` when `command` names a `DEFINE`d command (with
    * optional SHIP list) rather than an inline backtick string. */
  final case class PStream(in: String, command: String,
      schema: Seq[String], byName: Boolean = false) extends POp
  /** `B = A;` — alias copy. */
  final case class PAliasRef(in: String) extends POp
  /** `B = MAPREDUCE 'job' STORE A INTO 'in' LOAD 'out' AS (…) `args`;`
    * — opaque external batch job bridged by a STORE and a LOAD
    * [Pig: LONative/PONative]. `job` runs as a local command here
    * (there is no MR cluster to submit to); the dataflow contract —
    * materialize input, run job, ingest output — is Pig's. */
  final case class PNative(cmd: String, storeAlias: String,
      storePath: String, storeFunc: Option[(String, Seq[String])],
      loadPath: String, loadFunc: Option[(String, Seq[String])],
      loadSchema: Option[Seq[(String, Option[String])]],
      params: Option[String]) extends POp

  // ---------------- statements ----------------

  /** Statements carry their source position (of the PREPROCESSED text —
    * macro expansion and IMPORT inlining shift lines) so compile-time
    * and execution-time errors can name the offending line, like parse
    * errors already do. */
  sealed trait PStmt extends scala.util.parsing.input.Positional
  /** `DEFINE name \`cmd\` [SHIP('f', …)];` — external streaming command
    * (the macro form of DEFINE is expanded by the preprocessor). */
  /** `DEFINE seq SequenceFileLoader('\t');` — function/loader aliasing
    * [Pig: DEFINE (UDFs, streaming)]. The alias substitutes for the
    * class wherever a funcSpec is accepted (LOAD/STORE USING). */
  final case class PDefineFunc(name: String,
      func: (String, Seq[String])) extends PStmt
  final case class PDefineCmd(name: String, command: String,
      ship: Seq[String]) extends PStmt
  /** `REGISTER 'path' [USING lang AS ns];` — with USING: a scripting-UDF
    * namespace (functions callable as `ns.f(...)`); without: a jar. */
  final case class PRegister(path: String,
      script: Option[(String, String)]) extends PStmt
  /** `SET key value;` — engine property. */
  final case class PSet(key: String, value: String) extends PStmt
  final case class PAssign(alias: String, op: POp) extends PStmt
  final case class PStore(alias: String, path: String,
      using: Option[(String, Seq[String])]) extends PStmt
  final case class PSplit(in: String, branches: Seq[(String, PExpr)],
      otherwise: Option[String]) extends PStmt
  final case class PDump(alias: String) extends PStmt
  final case class PDescribe(alias: String) extends PStmt
  final case class PExplain(alias: String) extends PStmt
  final case class PIllustrate(alias: String) extends PStmt
  /** `ASSERT A BY cond [, 'msg'];` — rebinds A so downstream consumers
    * trip the check at execution (Pig 0.12 semantics). */
  final case class PAssertStmt(in: String, cond: PExpr,
      msg: Option[String]) extends PStmt
}
