package graft.pig

import scala.util.parsing.combinator.RegexParsers

import PigAst._

/** Recursive-descent grammar for the Pig Latin core statement set,
  * built on scala-parser-combinators (ships with Spark's classpath).
  * Keywords are case-insensitive, like the reference grammar; `--` and
  * C-style comments are whitespace. Parse errors surface with the
  * offending position, PigServer-style.
  */
object PigParser extends RegexParsers {

  override protected val whiteSpace =
    """(\s|--.*|/\*(?s:.*?)\*/)+""".r

  // reserved words may not be bare column/alias identifiers (contextual
  // keywords like GROUP stay usable as columns, matching Pig).
  private val reserved = Set(
    "and", "or", "not", "as", "by", "is", "null", "matches", "in",
    "asc", "desc", "if", "otherwise", "into", "using", "inner", "outer",
    "left", "right", "full", "generate", "all", "dense", "through",
    "flatten", "case", "when", "then", "else", "end")

  private def kw(s: String): Parser[String] =
    ("""(?i)\b""" + s + """\b""").r ^^ (_.toLowerCase)

  private val identRe = """[A-Za-z_][A-Za-z0-9_]*""".r
  private def ident: Parser[String] =
    identRe.filter(s => !reserved.contains(s.toLowerCase)).
      withFailureMessage("identifier expected")

  /** `a` or join-qualified `a::b::c` (kept verbatim as the column name). */
  private def colRef: Parser[String] =
    rep1sep(ident, "::") ^^ (_.mkString("::"))

  private def quoted: Parser[String] =
    """'(\\.|[^'\\])*'""".r ^^ { s =>
      s.substring(1, s.length - 1)
        .replace("\\'", "'").replace("\\t", "\t").replace("\\n", "\n")
        .replace("\\\\", "\\")
    }

  private def backtick: Parser[String] =
    """`[^`]*`""".r ^^ (s => s.substring(1, s.length - 1))

  /** `123BI` / `-1.25BD` — Pig's arbitrary-precision literal suffixes
    * [Pig: QueryParser LONGINTEGER/BIGDECIMAL tokens]. Tried before
    * [[number]] so the digits never round-trip through a double. */
  private def bigNumber: Parser[PBigLit] =
    """-?\d+\.\d+(?i:BD)|-?\d+(?i:BI|BD)""".r ^^ { s =>
      PBigLit(s.substring(0, s.length - 2))
    }

  private def number: Parser[PLit] =
    """-?\d+\.\d+([eE][-+]?\d+)?[fF]?|-?\d+[lLfF]?""".r ^^ { s =>
      val low = s.toLowerCase
      if (low.contains('.') || low.contains('e') || low.endsWith("f"))
        PLit(low.stripSuffix("f").toDouble)
      else if (low.endsWith("l")) PLit(low.stripSuffix("l").toLong)
      else {
        val v = s.toLong
        if (v >= Int.MinValue && v <= Int.MaxValue) PLit(v.toInt) else PLit(v)
      }
    }

  private val pigTypes = Set("int", "long", "float", "double", "chararray",
    "bytearray", "boolean", "datetime", "biginteger", "bigdecimal")
  private def typeName: Parser[String] =
    identRe.filter(s => pigTypes.contains(s.toLowerCase)) ^^ (_.toLowerCase)

  // ---------------- expressions ----------------

  def expr: Parser[PExpr] = ternary

  private def ternary: Parser[PExpr] =
    orExpr ~ opt("?" ~> expr ~ (":" ~> expr)) ^^ {
      case c ~ Some(t ~ f) => PTernary(c, t, f)
      case c ~ None => c
    }

  private def orExpr: Parser[PExpr] =
    rep1sep(andExpr, kw("or")) ^^ (_.reduceLeft(PBin("or", _, _)))

  private def andExpr: Parser[PExpr] =
    rep1sep(notExpr, kw("and")) ^^ (_.reduceLeft(PBin("and", _, _)))

  private def notExpr: Parser[PExpr] =
    kw("not") ~> notExpr ^^ PNot.apply | relExpr

  private def relExpr: Parser[PExpr] =
    addExpr ~ opt(relTail) ^^ {
      case e ~ Some(f) => f(e)
      case e ~ None => e
    }

  private def relTail: Parser[PExpr => PExpr] =
    ("==" | "!=" | "<=" | ">=" | "<" | ">") ~ addExpr ^^ {
      case op ~ r => (l: PExpr) => PBin(op, l, r)
    } |
    kw("matches") ~> quoted ^^ (re => (l: PExpr) => PMatches(l, re)) |
    kw("is") ~> kw("not") ~> kw("null") ^^^ ((l: PExpr) => PIsNull(l, negated = true)) |
    kw("is") ~> kw("null") ^^^ ((l: PExpr) => PIsNull(l, negated = false)) |
    kw("in") ~> "(" ~> rep1sep(expr, ",") <~ ")" ^^ (items => (l: PExpr) => PIn(l, items))

  private def addExpr: Parser[PExpr] =
    mulExpr ~ rep(("+" | "-") ~ mulExpr) ^^ {
      case h ~ t => t.foldLeft(h) { case (l, op ~ r) => PBin(op, l, r) }
    }

  private def mulExpr: Parser[PExpr] =
    unaryExpr ~ rep(("*" | "/" | "%") ~ unaryExpr) ^^ {
      case h ~ t => t.foldLeft(h) { case (l, op ~ r) => PBin(op, l, r) }
    }

  private def unaryExpr: Parser[PExpr] =
    "-" ~> unaryExpr ^^ PNeg.apply | castExpr

  private def castExpr: Parser[PExpr] =
    ("(" ~> typeName <~ ")") ~ unaryExpr ^^ { case t ~ e => PCast(t, e) } |
    postfix

  private def postfix: Parser[PExpr] =
    primary ~ rep("." ~> ident ^^ (f => (e: PExpr) => PDot(e, f)) |
                  "#" ~> quoted ^^ (k => (e: PExpr) => PMapGet(e, k))) ^^ {
      case base ~ ops => ops.foldLeft(base)((e, f) => f(e))
    }

  // Pig 0.12 CASE (both forms; WHENs over an operand are equality tests)
  private def caseExpr: Parser[PExpr] =
    kw("case") ~> opt(not(kw("when")) ~> expr) ~
      rep1(kw("when") ~> expr ~ (kw("then") ~> expr) ^^ { case w ~ t => (w, t) }) ~
      opt(kw("else") ~> expr) <~ kw("end") ^^ {
        case op ~ branches ~ els => PCaseWhen(op, branches, els)
      }

  private def primary: Parser[PExpr] =
    kw("null") ^^^ PLit(null) |
    kw("true") ^^^ PLit(true) |
    kw("false") ^^^ PLit(false) |
    caseExpr |
    bigNumber |
    number |
    quoted ^^ (s => PLit(s)) |
    """\$\d+""".r ^^ (s => PPos(s.tail.toInt)) |
    "*" ^^^ PStar |
    funcCall |
    colRef ^^ PCol.apply |
    "(" ~> expr <~ ")"

  // a call is ident followed immediately by '(' — disambiguated from a
  // bare column ref by backtracking (| tries colRef next). The
  // namespaced form `ns.func(args)` is a scripting UDF (REGISTER …
  // USING <lang> AS ns) — case-PRESERVED, script function names are
  // case-sensitive, unlike builtins.
  private def funcCall: Parser[PExpr] =
    (identRe ~ ("." ~> identRe) <~ guard("(")) ~ ("(" ~> repsep(expr, ",") <~ ")") ^^ {
      case ns ~ f ~ args => PCall(s"$ns.$f", args)
    } |
    (identRe <~ guard("(")) ~ ("(" ~> repsep(expr, ",") <~ ")") ^^ {
      case fn ~ args => PCall(fn.toUpperCase, args)
    }

  // ---------------- operators ----------------

  private def fieldDecl: Parser[(String, Option[String])] =
    ident ~ opt(":" ~> typeName) ^^ { case n ~ t => (n, t) }

  /** Storage class, bare (`PigStorage`) or fully qualified
    * (`org.apache.pig.piggybank.storage.CSVExcelStorage`), with
    * optional quoted args. */
  private def funcSpec: Parser[(String, Seq[String])] =
    rep1sep(ident, ".") ~ opt("(" ~> repsep(quoted, ",") <~ ")") ^^ {
      case ns ~ args => (ns.mkString("."), args.getOrElse(Nil))
    }

  private def loadOp: Parser[POp] =
    kw("load") ~> quoted ~ opt(kw("using") ~> funcSpec) ~
      opt(kw("as") ~> "(" ~> rep1sep(fieldDecl, ",") <~ ")") ^^ {
        case p ~ l ~ s => PLoad(p, l, s)
      }

  private def filterOp: Parser[POp] =
    kw("filter") ~> ident ~ (kw("by") ~> expr) ^^ { case a ~ e => PFilter(a, e) }

  private def asClause: Parser[Seq[(String, Option[String])]] =
    kw("as") ~> ("(" ~> rep1sep(fieldDecl, ",") <~ ")" | fieldDecl ^^ (Seq(_)))

  private def rangeEnd: Parser[PExpr] =
    """\$\d+""".r ^^ (s => PPos(s.tail.toInt)) | colRef ^^ PCol.apply

  // `a..d` / `..d` / `a..` — tried before expr so the `..` is seen
  // before a bare colRef ends the item (backtracks cleanly otherwise)
  private def rangeItem: Parser[GenItem] =
    rangeEnd ~ (".." ~> opt(rangeEnd)) ^^ {
      case f ~ t => GenItem(PRangeProj(Some(f), t), flatten = false, Nil)
    } |
    ".." ~> rangeEnd ^^ (t => GenItem(PRangeProj(None, Some(t)), flatten = false, Nil))

  private def genItem: Parser[GenItem] =
    kw("flatten") ~> ("(" ~> expr <~ ")") ~ opt(asClause) ^^ {
      case e ~ as => GenItem(e, flatten = true, as.getOrElse(Nil))
    } |
    rangeItem |
    expr ~ opt(asClause) ^^ {
      case e ~ as => GenItem(e, flatten = false, as.getOrElse(Nil))
    }

  /** FOREACH input: a bound alias, or Pig's inline-relation one-liner
    * `FOREACH (GROUP A BY x) GENERATE …` — any relational op in parens,
    * compiled unbound. */
  private def relRef: Parser[PRelRef] =
    "(" ~> op <~ ")" ^^ RInline.apply | ident ^^ RAlias.apply

  private def foreachOp: Parser[POp] =
    kw("foreach") ~> relRef ~ (kw("generate") ~> rep1sep(genItem, ",")) ^^ {
      case r ~ items => PForeach(r, items)
    }

  // nested FOREACH block: inner FILTER/ORDER/LIMIT/DISTINCT pipeline
  // over the bags, closed by a GENERATE (SURVEY §7.5.2)
  private def nestedOp: Parser[PNestedOp] =
    kw("filter") ~> ident ~ (kw("by") ~> expr) ^^ { case s ~ e => NFilter(s, e) } |
    kw("order") ~> ident ~ (kw("by") ~> rep1sep(
        colRef ~ opt(kw("asc") | kw("desc")) ^^ {
          case f ~ d => (f, !d.contains("desc"))
        }, ",")) ~ opt(kw("using") ~> funcSpec) ^^ {
      case s ~ ks ~ cmp => NOrder(s, ks, cmp)
    } |
    kw("limit") ~> ident ~ """\d+""".r ^^ { case s ~ n => NLimit(s, n.toInt) } |
    kw("distinct") ~> ident ^^ NDistinct.apply |
    kw("foreach") ~> ident ~ (kw("generate") ~> rep1sep(genItem, ",")) ^^ {
      case s ~ items => NForeach(s, items)
    } |
    // bag-projection shorthand `p = L.field;`
    ident ~ ("." ~> ident) ^^ { case s ~ f =>
      NForeach(s, Seq(GenItem(PCol(f), flatten = false, Seq((f, None)))))
    }

  private def foreachNestedOp: Parser[POp] =
    kw("foreach") ~> relRef ~ ("{" ~>
        rep(ident ~ ("=" ~> nestedOp) <~ ";" ^^ { case n ~ o => (n, o) })) ~
      (kw("generate") ~> rep1sep(genItem, ",") <~ ";" <~ "}") ^^ {
        case r ~ stmts ~ items => PForeachNested(r, stmts, items)
      }

  // CUBE statement (Pig 0.11): `C = CUBE A BY CUBE(d1, d2);`
  private def cubeOp: Parser[POp] =
    kw("cube") ~> ident ~ (kw("by") ~> (kw("cube") | kw("rollup"))) ~
      ("(" ~> rep1sep(expr, ",") <~ ")") ^^ {
        case a ~ kind ~ dims => PCubeOp(a, dims, rollup = kind == "rollup")
      }

  private def keyList: Parser[Seq[PExpr]] =
    "(" ~> rep1sep(expr, ",") <~ ")" | expr ^^ (Seq(_))

  private def groupSide: Parser[(String, Seq[PExpr], Boolean)] =
    ident ~ (kw("by") ~> keyList) ~ opt(kw("inner")) ^^ {
      case a ~ ks ~ inn => (a, ks, inn.isDefined)
    }

  /** `PARTITION BY fully.qualified.Partitioner` — accepted and
    * IGNORED, like PARALLEL: shuffle partitioning is Spark's call
    * (hash partitioning + AQE), and a hand-written Hadoop Partitioner
    * class has no meaning here. Parsing it keeps reference scripts
    * runnable [Pig: LOCogroup/LOCross setCustomPartitioner]. */
  private def partitionClause: Parser[String] =
    kw("partition") ~> kw("by") ~> rep1sep(ident, ".") ^^ (_.mkString("."))

  /** `GROUP … USING 'collected'|'merge'` — Pig's map-side / sorted
    * group execution hints. Results are identical to a plain GROUP;
    * the hint is a CONTRACT that the input is already clustered by the
    * group key (Pig: the loader must be a CollectableLoadFunc / sorted
    * — Pig fails the job otherwise), so the compiler verifies it and
    * the aggregate runs with zero Exchange (bucketed scans). Any OTHER
    * quoted group type is a parse error, exactly as Pig rejects
    * unknown GROUPTYPEs [Pig: LOCogroup GROUPTYPE]. */
  private def groupHint: Parser[String] =
    kw("using") ~> quoted ^? ({
      case h if Set("collected", "merge")(h.toLowerCase) => h.toLowerCase
    }: PartialFunction[String, String],
      h => s"GROUP ... USING '$h': unknown group type (expected 'collected' or 'merge')")

  private def groupOp: Parser[POp] =
    ((kw("group") | kw("cogroup")) ~> (
      ident <~ kw("all") ^^ (a => PGroup(Seq((a, Nil)), all = true, Set.empty)) |
      rep1sep(groupSide, ",") ^^ { sides =>
        PGroup(sides.map(s => (s._1, s._2)), all = false,
          sides.filter(_._3).map(_._1).toSet)
      }) ~ opt(groupHint) <~ opt(partitionClause)) ^^ {
        case (pg: PGroup) ~ h => pg.copy(hint = h)
        case g ~ _ => g
      }

  private def joinSide: Parser[(String, Seq[PExpr])] =
    ident ~ (kw("by") ~> keyList) ^^ { case a ~ ks => (a, ks) }

  private def outerKind: Parser[String] =
    (kw("left") | kw("right") | kw("full")) <~ opt(kw("outer")) ^^ {
      case "full" => "full_outer"
      case k => k
    }

  private def joinOp: Parser[POp] =
    kw("join") ~> joinSide ~ opt(outerKind) ~ ("," ~> rep1sep(joinSide, ",")) ~
      opt(kw("using") ~> quoted) ^^ {
        case first ~ outer ~ rest ~ using =>
          PJoin(first +: rest, outer, using.map(_.toLowerCase))
      }

  private def orderKey: Parser[(PExpr, Boolean)] =
    expr ~ opt(kw("asc") | kw("desc")) ^^ {
      case e ~ d => (e, !d.contains("desc"))
    }

  /** `ORDER … USING comparator` — the comparator class is carried to
    * the compiler, which honors the two shapes expressible as
    * Catalyst sort keys (reverse, case-insensitive) and refuses any
    * other class loudly — an arbitrary Java comparator cannot run
    * inside Catalyst, and silently ignoring it would reorder the
    * user's output [Pig: LOSort setUserFunc]. */
  private def orderOp: Parser[POp] =
    kw("order") ~> ident ~ (kw("by") ~> rep1sep(orderKey, ",")) ~
      opt(kw("using") ~> funcSpec) ^^ {
      case a ~ ks ~ cmp => POrder(a, ks, cmp)
    }

  private def limitOp: Parser[POp] =
    kw("limit") ~> ident ~ """\d+""".r ^^ { case a ~ n => PLimit(a, n.toLong) }

  private def distinctOp: Parser[POp] =
    kw("distinct") ~> ident <~ opt(partitionClause) ^^ PDistinct.apply

  private def unionOp: Parser[POp] =
    kw("union") ~> opt(kw("onschema")) ~ rep1sep(ident, ",") ^^ {
      case on ~ ins => PUnion(ins, on.isDefined)
    }

  private def crossOp: Parser[POp] =
    kw("cross") ~> rep1sep(ident, ",") <~ opt(partitionClause) ^^ PCross.apply

  private def sampleOp: Parser[POp] =
    kw("sample") ~> ident ~ """0?\.\d+|1\.0|0|1""".r ^^ {
      case a ~ p => PSample(a, p.toDouble)
    }

  private def rankOp: Parser[POp] =
    kw("rank") ~> ident ~ opt(kw("by") ~> rep1sep(orderKey, ",") ~ opt(kw("dense"))) ^^ {
      case a ~ Some(ks ~ dense) => PRank(a, ks, dense.isDefined)
      case a ~ None => PRank(a, Nil, dense = false)
    }

  private def streamOp: Parser[POp] =
    kw("stream") ~> ident ~ (kw("through") ~> (
        backtick ^^ ((_: String, false)) | ident ^^ ((_: String, true)))) ~
      opt(kw("as") ~> "(" ~> rep1sep(fieldDecl, ",") <~ ")") ^^ {
        case a ~ ((cmd, byName)) ~ sch =>
          PStream(a, cmd, sch.getOrElse(Nil).map(_._1), byName)
      }

  /** `MAPREDUCE 'job' STORE A INTO 'in' [USING f] LOAD 'out' [USING f]
    * [AS (…)] [`args`]` [Pig: LONative]. */
  private def mapreduceOp: Parser[POp] =
    kw("mapreduce") ~> quoted ~
      (kw("store") ~> ident) ~ (kw("into") ~> quoted) ~
      opt(kw("using") ~> funcSpec) ~
      (kw("load") ~> quoted) ~ opt(kw("using") ~> funcSpec) ~
      opt(kw("as") ~> "(" ~> rep1sep(fieldDecl, ",") <~ ")") ~
      opt(backtick) ^^ {
        case cmd ~ a ~ inP ~ inF ~ outP ~ outF ~ sch ~ params =>
          PNative(cmd, a, inP, inF, outP, outF, sch, params)
      }

  private def op: Parser[POp] =
    loadOp | filterOp | foreachNestedOp | foreachOp | groupOp | cubeOp |
    joinOp | orderOp | limitOp |
    distinctOp | unionOp | crossOp | sampleOp | rankOp | streamOp |
    mapreduceOp |
    ident ^^ PAliasRef.apply

  // ---------------- statements ----------------

  // `PARALLEL n` is accepted on any relational statement and ignored:
  // reduce-side parallelism is Spark's call here (shuffle.partitions +
  // AQE coalescing supersede Pig's per-operator reducer counts — a
  // hand-pinned width would fight the runtime re-plan).
  private def assign: Parser[PStmt] =
    ident ~ ("=" ~> op) <~ opt(kw("parallel") ~> """\d+""".r) <~ ";" ^^ {
      case a ~ o => PAssign(a, o)
    }

  private def storeStmt: Parser[PStmt] =
    kw("store") ~> ident ~ (kw("into") ~> quoted) ~
      opt(kw("using") ~> funcSpec) <~ ";" ^^ {
        case a ~ p ~ u => PStore(a, p, u)
      }

  private def splitStmt: Parser[PStmt] =
    kw("split") ~> ident ~ (kw("into") ~>
        rep1sep(ident ~ (kw("if") ~> expr) ^^ { case n ~ e => (n, e) }, ",")) ~
      opt("," ~> ident <~ kw("otherwise")) <~ ";" ^^ {
        case a ~ brs ~ oth => PSplit(a, brs, oth)
      } |
    // OTHERWISE branch may also be the final comma-separated element
    kw("split") ~> ident ~ (kw("into") ~>
        rep1sep(ident ~ (kw("if") ~> expr) ^^ { case n ~ e => (n, e) }, ",")) <~ ";" ^^ {
        case a ~ brs => PSplit(a, brs, None)
      }

  private def defineCmdStmt: Parser[PStmt] =
    kw("define") ~> ident ~ backtick ~
      opt(kw("ship") ~> "(" ~> rep1sep(quoted, ",") <~ ")") <~ ";" ^^ {
        case n ~ cmd ~ ship => PDefineCmd(n, cmd, ship.getOrElse(Nil))
      } |
    // `DEFINE seq SequenceFileLoader('\t');` — loader/storage aliasing
    kw("define") ~> ident ~ funcSpec <~ ";" ^^ {
      case n ~ f => PDefineFunc(n, f)
    }

  /** `REGISTER 'udf.py' USING jython AS myfuncs;` — scripting-UDF
    * namespace; plain `REGISTER 'lib.jar';` ships a jar. */
  private def registerStmt: Parser[PStmt] =
    kw("register") ~> quoted ~
      opt((kw("using") ~> ident) ~ (kw("as") ~> ident)) <~ ";" ^^ {
        case path ~ Some(lang ~ ns) => PRegister(path, Some((lang, ns)))
        case path ~ None => PRegister(path, None)
      }

  /** `SET key value;` — engine property (dotted keys allowed; value may
    * be quoted or a bare token). */
  private def setStmt: Parser[PStmt] =
    kw("set") ~> """[A-Za-z_][A-Za-z0-9_.]*""".r ~
      (quoted | """[^\s;]+""".r) <~ ";" ^^ {
        case k ~ v => PSet(k, v)
      }

  private def dumpStmt: Parser[PStmt] = kw("dump") ~> ident <~ ";" ^^ PDump.apply
  private def describeStmt: Parser[PStmt] =
    kw("describe") ~> ident <~ ";" ^^ PDescribe.apply
  private def explainStmt: Parser[PStmt] =
    kw("explain") ~> ident <~ ";" ^^ PExplain.apply
  private def illustrateStmt: Parser[PStmt] =
    kw("illustrate") ~> ident <~ ";" ^^ PIllustrate.apply
  private def assertStmt: Parser[PStmt] =
    kw("assert") ~> ident ~ (kw("by") ~> expr) ~ opt("," ~> quoted) <~ ";" ^^ {
      case a ~ e ~ msg => PAssertStmt(a, e, msg)
    }

  private def stmt: Parser[PStmt] =
    positioned(defineCmdStmt | registerStmt | setStmt | storeStmt | splitStmt |
      dumpStmt | describeStmt | explainStmt | illustrateStmt | assertStmt |
      assign)

  private def script: Parser[Seq[PStmt]] = rep(stmt)

  /** Parse a full script; throws IllegalArgumentException with position
    * detail on malformed input (PigServer reports syntax errors the
    * same way — fail fast, before any job runs). */
  def parseScript(text: String): Seq[PStmt] =
    parseAll(script, text) match {
      case Success(stmts, _) => stmts
      case NoSuccess(msg, next) =>
        throw new IllegalArgumentException(
          s"Pig parse error at line ${next.pos.line}, col ${next.pos.column}: $msg\n${next.pos.longString}")
      case other =>
        throw new IllegalArgumentException(s"Pig parse error: $other")
    }
}
