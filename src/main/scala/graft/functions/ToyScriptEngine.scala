package graft.functions

import javax.script.{AbstractScriptEngine, Bindings, ScriptContext, ScriptEngineFactory, SimpleBindings}
import scala.collection.mutable

/** A minimal but REAL JSR-223 engine for a toy UDF language — the
  * in-repo reference engine for the scripting-UDF protocol (REGISTER →
  * eval → schema binding → Invocable dispatch from executor threads),
  * registered as the built-in `toy` language so the surface is
  * exercisable (and oracle-checkable, q201) in a sandbox that ships no
  * jython/graal jar. The engine honors the same contract
  * a real one would: `eval` defines functions and publishes
  * `graft_output_schemas`; `invokeFunction` dispatches by name.
  *
  * Language: lines of
  *   `# schema: <fn> <ddl-type>`
  *   `def <fn>(<p1>[, <p2>]) = <body>`
  * where body is `upper(p)`, `len(p)`, or `<operand> (+|*) <operand>`
  * over params, numeric literals, and double-quoted string literals.
  */
final class ToyScriptEngine extends AbstractScriptEngine with javax.script.Invocable {

  private sealed trait Expr
  private case class Param(i: Int) extends Expr
  private case class NumLit(v: Double) extends Expr
  private case class StrLit(v: String) extends Expr
  private case class Bin(op: String, l: Expr, r: Expr) extends Expr
  private case class Fn1(name: String, arg: Expr) extends Expr

  private val fns = mutable.Map.empty[String, (Seq[String], Expr)]

  override def eval(script: String, ctx: ScriptContext): AnyRef = {
    val schemas = new java.util.HashMap[String, String]()
    val defRe = """def\s+(\w+)\(([^)]*)\)\s*=\s*(.+)""".r
    val schemaRe = """#\s*schema:\s*(\w+)\s+(.+)""".r
    script.linesIterator.map(_.trim).filter(_.nonEmpty).foreach {
      case schemaRe(fn, ddl) => schemas.put(fn, ddl.trim)
      case defRe(name, params, body) =>
        val ps = params.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        fns(name) = (ps, parseBody(body.trim, ps))
      case line if line.startsWith("#") => ()
      case line => throw new javax.script.ScriptException(s"toy: cannot parse '$line'")
    }
    ctx.getBindings(ScriptContext.ENGINE_SCOPE).put("graft_output_schemas", schemas)
    null
  }

  private def parseBody(body: String, ps: Seq[String]): Expr = {
    def operand(tok: String): Expr = {
      val t = tok.trim
      if (t.startsWith("\"") && t.endsWith("\"")) StrLit(t.substring(1, t.length - 1))
      else if (ps.contains(t)) Param(ps.indexOf(t))
      else NumLit(t.toDouble)
    }
    val fn1Re = """(upper|len)\(\s*(\w+)\s*\)""".r
    val binRe = """(.+?)\s*([+*])\s*(.+)""".r
    body match {
      case fn1Re(f, p) => Fn1(f, operand(p))
      case binRe(l, op, r) => Bin(op, operand(l), operand(r))
      case single => operand(single)
    }
  }

  private def run(e: Expr, args: Array[AnyRef]): AnyRef = e match {
    case Param(i) => args(i)
    case NumLit(v) => java.lang.Double.valueOf(v)
    case StrLit(v) => v
    case Fn1("upper", a) => String.valueOf(run(a, args)).toUpperCase
    case Fn1("len", a) => Integer.valueOf(String.valueOf(run(a, args)).length)
    case Fn1(other, _) => throw new javax.script.ScriptException(s"toy: unknown fn $other")
    case Bin(op, l, r) =>
      val (lv, rv) = (run(l, args), run(r, args))
      (op, lv, rv) match {
        case ("+", a: String, b) => a + String.valueOf(b)
        case ("+", a, b: String) => String.valueOf(a) + b
        case ("+", a: java.lang.Number, b: java.lang.Number) =>
          java.lang.Double.valueOf(a.doubleValue() + b.doubleValue())
        case ("*", a: java.lang.Number, b: java.lang.Number) =>
          java.lang.Double.valueOf(a.doubleValue() * b.doubleValue())
        case _ => throw new javax.script.ScriptException(s"toy: bad operands for $op")
      }
  }

  override def invokeFunction(name: String, args: AnyRef*): AnyRef = {
    val (ps, body) = fns.getOrElse(name,
      throw new NoSuchMethodException(s"toy function '$name' not defined"))
    require(ps.length == args.length,
      s"toy $name: expected ${ps.length} args, got ${args.length}")
    run(body, args.toArray)
  }

  override def invokeMethod(thiz: AnyRef, name: String, args: AnyRef*): AnyRef =
    throw new UnsupportedOperationException("toy: no objects")
  override def getInterface[T](cls: Class[T]): T = null.asInstanceOf[T]
  override def getInterface[T](thiz: AnyRef, cls: Class[T]): T = null.asInstanceOf[T]

  override def eval(reader: java.io.Reader, ctx: ScriptContext): AnyRef = {
    val sw = new java.io.StringWriter()
    reader.transferTo(sw)
    eval(sw.toString, ctx)
  }
  override def createBindings(): Bindings = new SimpleBindings()
  override def getFactory: ScriptEngineFactory = null
}
