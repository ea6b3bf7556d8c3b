package graft.pig

/** The textual preprocessing layer that runs BEFORE the parser, exactly
  * as the reference lineage does it (parameter substitution and macro
  * expansion are preprocessors over the script text, not plan nodes):
  *
  *  1. `%default NAME 'value';` — fills params not supplied elsewhere.
  *  2. `%declare NAME 'value';` — script-level override; HIGHEST
  *     precedence, matching the reference's order
  *     `%default < param file < command line < %declare`.
  *  3. `$NAME` / `${NAME}` — parameter substitution (positional `$0…`
  *     refs are digits and never collide). Parameter files (`-param_file`,
  *     `name=value` lines, `#` comments) load via [[parseParamFile]].
  *  4. `DEFINE name(p1, p2) RETURNS out { … };` — macros expand by
  *     textual substitution of `$param`/`$out` with call-site renaming
  *     of macro-local aliases (`__mN_x`), the same hygiene scheme the
  *     reference's macro expander uses. Renaming targets
  *     relation-alias positions (assignment lhs, operator operands,
  *     comma lists, bag refs) — a COLUMN that merely shares the local
  *     alias's name in an expression position (`BY t > 5`) is left
  *     alone.
  *  5. `IMPORT 'macros.pig';` inlines the named file (recursively,
  *     depth-bounded) so its macros join the importing script.
  *  6. Neither `SET` nor `REGISTER` is stripped — both are real
  *     statements now (session conf / jar shipping / scripting-UDF
  *     namespaces, PigParser).
  */
object PigPreprocessor {

  private val defaultRe =
    """(?im)^\s*%default\s+(\w+)\s+('(?:\\.|[^'\\])*'|\S+)\s*;?\s*$""".r
  private val declareRe =
    """(?im)^\s*%declare\s+(\w+)\s+('(?:\\.|[^'\\])*'|\S+)\s*;?\s*$""".r
  private val importRe =
    """(?im)^\s*import\s+'([^']+)'\s*;\s*$""".r
  private val macroDefRe =
    """(?is)define\s+(\w+)\s*\(([^)]*)\)\s+returns\s+(\w+)\s*\{(.*?)\}\s*;""".r

  /** `params` are command-line-level (highest caller precedence);
    * `fileParams` sit between `%default` and the command line. */
  def apply(text: String, params: Map[String, String],
      fileParams: Map[String, String] = Map.empty): String = {
    def collect(re: scala.util.matching.Regex, t: String) =
      re.findAllMatchIn(t).map { m =>
        val raw = m.group(2)
        val v = if (raw.startsWith("'")) raw.substring(1, raw.length - 1) else raw
        m.group(1) -> v
      }.toMap
    // 0. IMPORT 'macros.pig'; — inline the file (recursively, bounded)
    //    so its DEFINE…RETURNS macros join this script's
    val imported = expandImports(text, depth = 0)

    // 1. %default / %declare lines: collect then strip
    val defaults = collect(defaultRe, imported)
    val declares = collect(declareRe, imported)
    var t = defaultRe.replaceAllIn(imported, "")
    t = declareRe.replaceAllIn(t, "")

    // 2. macros: collect definitions, strip them, then expand call sites
    val macros = macroDefRe.findAllMatchIn(t).map { m =>
      val params = m.group(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      MacroDef(m.group(1), params, m.group(3), m.group(4))
    }.toSeq
    t = macroDefRe.replaceAllIn(t, "")
    var expansion = 0
    var guard = 0
    do {
      guard += 1
      expansion = 0
      for (mac <- macros) {
        val callRe = ("""(?im)^([ \t]*)(\w+)\s*=\s*""" + mac.name + """\s*\(([^;]*)\)\s*;""").r
        t = callRe.replaceAllIn(t, m => {
          expansion += 1
          val lhs = m.group(2)
          val args = splitTopLevel(m.group(3))
          require(args.length == mac.params.length,
            s"macro ${mac.name}: expected ${mac.params.length} args, got ${args.length}")
          scala.util.matching.Regex.quoteReplacement(
            expand(mac, lhs, args, expansion + guard * 1000))
        })
      }
    } while (expansion > 0 && guard < 10)

    // 3. precedence: %default < param file < command line < %declare
    substituteParams(t, defaults ++ fileParams ++ params ++ declares)
  }

  private def expandImports(text: String, depth: Int): String = {
    require(depth < 8, "IMPORT nesting deeper than 8 — cycle?")
    importRe.replaceAllIn(text, m => {
      val p = java.nio.file.Paths.get(m.group(1))
      require(java.nio.file.Files.exists(p), s"IMPORT: no such file: $p")
      scala.util.matching.Regex.quoteReplacement(
        expandImports(java.nio.file.Files.readString(p), depth + 1))
    })
  }

  /** A Pig parameter file: one `name=value` per line, `#` comments,
    * optional single quotes around the value. */
  def parseParamFile(text: String): Map[String, String] =
    text.linesIterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#") && l.contains('='))
      .map { l =>
        val i = l.indexOf('=')
        val v = l.substring(i + 1).trim
        l.substring(0, i).trim ->
          (if (v.length >= 2 && v.startsWith("'") && v.endsWith("'"))
            v.substring(1, v.length - 1) else v)
      }.toMap

  private final case class MacroDef(name: String, params: Seq[String],
      ret: String, body: String)

  /** Split a macro argument list on top-level commas only. */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var start = 0; var inStr = false
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' => inStr = !inStr
        case '(' if !inStr => depth += 1
        case ')' if !inStr => depth -= 1
        case ',' if !inStr && depth == 0 =>
          out += s.substring(start, i).trim; start = i + 1
        case _ =>
      }
      i += 1
    }
    val last = s.substring(start).trim
    if (last.nonEmpty || start < s.length) out += last
    out.result().filter(_.nonEmpty)
  }

  // relation-operand keywords: an identifier right after one of these is
  // a relation alias, never a column (BY/GENERATE start expression
  // context and are deliberately absent)
  private val relKeywords =
    "filter|foreach|group|cogroup|join|order|limit|distinct|sample|rank|" +
    "stream|union|cross|assert|split|store|dump|describe|explain|into|onschema"

  /** Rename relation-alias occurrences of `a` to `to` in a macro body.
    * Covered positions: assignment lhs, operand after a relational
    * keyword, member of a comma list (JOIN/UNION/CROSS/COGROUP sides),
    * bag projection (`a.f`), and a bare whole function argument
    * (`COUNT(a)`, `FLATTEN(a)`). Known ambiguity (documented): a column
    * used as a WHOLE bare function arg that shares the alias's name
    * still renames — textual expansion cannot tell those apart. */
  private def renameAlias(body: String, a: String, to: String): String = {
    val q = java.util.regex.Pattern.quote(a)
    val r = scala.util.matching.Regex.quoteReplacement(to)
    var t = body
    // lhs:  `a = …;`
    t = ("""(?m)^(\s*)""" + q + """(\s*=)""").r.replaceAllIn(t, "$1" + r + "$2")
    // rhs alias copy:  `x = a;`
    t = ("""(=\s*)""" + q + """(\s*;)""").r.replaceAllIn(t, "$1" + r + "$2")
    // after a relational keyword:  `FILTER a BY …`, `LIMIT a 3`
    t = ("""(?i)(\b(?:""" + relKeywords + """)\s+)""" + q + """\b""").r
      .replaceAllIn(t, "$1" + r)
    // comma-list member before BY/INNER/terminator:  `JOIN x BY k, a BY k`
    t = ("""(,\s*)""" + q + """\b(?=\s*(?i:by|inner)\b|\s*[;,])""").r
      .replaceAllIn(t, "$1" + r)
    // bag projection:  `a.f`
    t = ("""\b""" + q + """(?=\s*\.)""").r.replaceAllIn(t, r)
    // whole bare function argument:  `COUNT(a)`, `FLATTEN(a)`
    t = ("""([(,]\s*)""" + q + """(?=\s*[),])""").r.replaceAllIn(t, "$1" + r)
    t
  }

  private def expand(mac: MacroDef, lhs: String, args: Seq[String], n: Int): String = {
    var body = mac.body
    // rename macro-local aliases (assigned in the body, not the return)
    val localAliases = """(?m)^\s*(\w+)\s*=""".r.findAllMatchIn(mac.body)
      .map(_.group(1)).filter(_ != s"$$${mac.ret}").toSet
      .filterNot(a => a.startsWith("$"))
    for (a <- localAliases)
      body = renameAlias(body, a, s"__m${n}_$a")
    // substitute $param -> arg, $ret -> lhs; `(?!\w)` keeps a param
    // whose name prefixes another (`$p` vs `$prio`) from corrupting the
    // longer reference
    def subst(b: String, name: String, repl: String): String =
      ("""\$""" + java.util.regex.Pattern.quote(name) + """(?!\w)""").r
        .replaceAllIn(b, scala.util.matching.Regex.quoteReplacement(repl))
    val afterParams = mac.params.zip(args)
      .foldLeft(body) { case (b, (p, arg)) => subst(b, p, arg) }
    subst(afterParams, mac.ret, lhs)
  }

  /** `$NAME` and `${NAME}` for names present in the map; unknown
    * `$name` refs are an error (same as the reference preprocessor).
    * `\$` escapes a literal dollar (a regex `'a\$b'` survives
    * substitution as `'a$b'`). */
  def substituteParams(text: String, params: Map[String, String]): String = {
    val sentinel = "\u0001PIG_ESC_DOLLAR\u0001"
    val re = """\$\{(\w+)\}|\$([A-Za-z_]\w*)""".r
    val out = re.replaceAllIn(text.replace("\\$", sentinel), m => {
      val name = Option(m.group(1)).getOrElse(m.group(2))
      params.get(name) match {
        case Some(v) => scala.util.matching.Regex.quoteReplacement(v)
        case None => throw new IllegalArgumentException(
          s"undefined parameter $$$name (supplied: ${params.keys.toSeq.sorted.mkString(", ")})")
      }
    })
    out.replace(sentinel, "$")
  }
}
