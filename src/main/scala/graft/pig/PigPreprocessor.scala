package graft.pig

/** The textual preprocessing layer that runs BEFORE the parser, exactly
  * as the reference lineage does it (parameter substitution and macro
  * expansion are preprocessors over the script text, not plan nodes):
  *
  *  1. `%default NAME 'value';` — fills params not supplied by the
  *     caller.
  *  2. `$NAME` / `${NAME}` — parameter substitution from the caller's
  *     map (positional `$0…` refs are digits and never collide).
  *  3. `DEFINE name(p1, p2) RETURNS out { … };` — macros expand by
  *     textual substitution of `$param`/`$out` with call-site renaming
  *     of macro-local aliases (`__mN_x`), the same hygiene scheme the
  *     reference's macro expander uses.
  *  4. `SET/REGISTER/IMPORT` directives are stripped (engine-level
  *     concerns handled by the SparkSession / classpath here).
  */
object PigPreprocessor {

  private val defaultRe =
    """(?im)^\s*%default\s+(\w+)\s+('(?:\\.|[^'\\])*'|\S+)\s*;?\s*$""".r
  private val directiveRe =
    """(?im)^\s*(set|register|import)\s+[^;]*;\s*$""".r
  private val macroDefRe =
    """(?is)define\s+(\w+)\s*\(([^)]*)\)\s+returns\s+(\w+)\s*\{(.*?)\}\s*;""".r

  def apply(text: String, params: Map[String, String]): String = {
    // 1. %default lines: collect then strip
    val defaults = defaultRe.findAllMatchIn(text).map { m =>
      val raw = m.group(2)
      val v = if (raw.startsWith("'")) raw.substring(1, raw.length - 1) else raw
      m.group(1) -> v
    }.toMap
    var t = defaultRe.replaceAllIn(text, "")
    t = directiveRe.replaceAllIn(t, "")

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

    // 3. caller params + %defaults (caller wins)
    val all = defaults ++ params
    substituteParams(t, all)
  }

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

  private def expand(mac: MacroDef, lhs: String, args: Seq[String], n: Int): String = {
    var body = mac.body
    // rename macro-local aliases (assigned in the body, not the return)
    val localAliases = """(?m)^\s*(\w+)\s*=""".r.findAllMatchIn(mac.body)
      .map(_.group(1)).filter(_ != s"$$${mac.ret}").toSet
      .filterNot(a => a.startsWith("$"))
    for (a <- localAliases)
      body = body.replaceAll("\\b" + a + "\\b", s"__m${n}_$a")
    // substitute $param -> arg, $ret -> lhs
    for ((p, arg) <- mac.params.zip(args))
      body = body.replace(s"$$$p", arg)
    body.replace(s"$$${mac.ret}", lhs)
  }

  /** `$NAME` and `${NAME}` for names present in the map; unknown
    * `$name` refs are an error (same as the reference preprocessor). */
  def substituteParams(text: String, params: Map[String, String]): String = {
    val re = """\$\{(\w+)\}|\$([A-Za-z_]\w*)""".r
    re.replaceAllIn(text, m => {
      val name = Option(m.group(1)).getOrElse(m.group(2))
      params.get(name) match {
        case Some(v) => scala.util.matching.Regex.quoteReplacement(v)
        case None => throw new IllegalArgumentException(
          s"undefined parameter $$$name (supplied: ${params.keys.toSeq.sorted.mkString(", ")})")
      }
    })
  }
}
