package graft.api

import scala.collection.mutable.ArrayBuffer

/** GraphQL executable-document parser — the transport half of the
  * reference's query plane (graphql-yoga serving `schema.ts` at
  * `/api/v2/graphql`; `src/modules/api/index.ts:54-75`). The engine
  * side already accepts the reference's *argument objects* verbatim
  * (`graft.query.ArgsJson`); this parser closes the remaining gap —
  * the GraphQL *query language* itself — so a reference client's
  * request document works unchanged against [[HttpApi]].
  *
  * Scope: the executable subset the reference's schema can be queried
  * with — operations (query only; variables with defaults), fields
  * with aliases and arguments, all value kinds (int, float, string,
  * block string, boolean, null, enum, list, object, variable), nested
  * selection sets, inline fragments with type conditions (the
  * reference's own GraphiQL default query uses `... on HivePost`;
  * `api/index.ts:60-72`), and named fragment definitions + spreads.
  * Not supported (documented, rejected with a clear error): mutations
  * and subscriptions (the reference's Query type is the entire
  * surface — `schema.ts:308-327` defines no Mutation), and directives
  * (`@skip`/`@include` — the reference schema declares none).
  *
  * No external parser dependency: hand-rolled lexer + recursive
  * descent over the GraphQL October-2021 grammar productions listed
  * above, ~250 lines, fully spec'd in GraphQLParserSpec.
  */
object GraphQL {

  // ── AST ────────────────────────────────────────────────────────────
  sealed trait Value
  final case class VInt(v: Long) extends Value
  final case class VFloat(v: Double) extends Value
  final case class VString(v: String) extends Value
  final case class VBool(v: Boolean) extends Value
  case object VNull extends Value
  /** Bare-name value (enum literal, e.g. `trendingBy: PAYOUT`). */
  final case class VEnum(name: String) extends Value
  final case class VList(items: Seq[Value]) extends Value
  final case class VObj(fields: Seq[(String, Value)]) extends Value
  final case class VVar(name: String) extends Value

  sealed trait Selection
  final case class Field(alias: String, name: String,
                         args: Seq[(String, Value)],
                         selections: Seq[Selection]) extends Selection
  /** Inline fragment (or a resolved named-fragment spread): its
    * selections apply only to rows whose `__typename` matches the
    * type condition (None = no condition). */
  final case class InlineFragment(onType: Option[String],
                                  selections: Seq[Selection])
      extends Selection

  /** One parsed operation: variable definitions are
    * (name, declared type string, default value). */
  final case class Operation(name: Option[String],
                             variables: Seq[(String, String, Option[Value])],
                             selections: Seq[Selection])

  final case class ParseError(msg: String, pos: Int)
      extends RuntimeException(s"$msg (at offset $pos)")

  def parse(doc: String): Operation = new Parser(doc).document()

  /** The selections that apply to a row of the given `__typename`:
    * fields pass through; inline fragments flatten when their type
    * condition matches (or when either side has no type info). */
  def applicable(sels: Seq[Selection],
                 typename: Option[String]): Seq[Field] =
    sels.flatMap {
      case f: Field => Seq(f)
      case InlineFragment(cond, inner) =>
        if (cond.isEmpty || typename.isEmpty || cond == typename)
          applicable(inner, typename)
        else Nil
    }

  /** Spec CollectFields: [[applicable]] fields grouped by response
    * key (alias) in first-seen order, duplicate keys MERGING their
    * selection sets — `{ a { x } a { y } }` selects x AND y, and the
    * field resolves ONCE (graphql-js executes one merged field, not
    * two overwrites). Args come from the first occurrence (the spec
    * only allows merging when arguments are identical); a same-alias/
    * different-field collision keeps the first (it is a validation
    * error upstream). */
  def collectFields(sels: Seq[Selection],
                    typename: Option[String]): Seq[Field] = {
    val out = scala.collection.mutable.LinkedHashMap[String, Field]()
    applicable(sels, typename).foreach { f =>
      out.get(f.alias) match {
        case Some(prev) if prev.name == f.name =>
          out(f.alias) =
            prev.copy(selections = prev.selections ++ f.selections)
        case Some(_) => ()
        case None => out(f.alias) = f
      }
    }
    out.values.toSeq
  }

  /** Every field name any branch of the selection could need — the
    * union over fragment alternatives, used to prune the DataFrame's
    * columns BEFORE collect (so GraphQL selection drives Catalyst
    * column pruning down to the parquet scan). Aliases are included
    * because hydration materializes aliased relational fields as
    * alias-named columns. */
  def allFieldNames(sels: Seq[Selection]): Set[String] = sels.flatMap {
    case f: Field => Seq(f.name, f.alias)
    case InlineFragment(_, inner) => allFieldNames(inner)
  }.toSet

  // selections parsed with fragment spreads still symbolic, resolved
  // once all fragment definitions are known (a spread may precede its
  // definition in the document)
  private sealed trait RawSel
  private final case class RField(alias: String, name: String,
      args: Seq[(String, Value)], sels: Seq[RawSel]) extends RawSel
  private final case class RInline(on: Option[String],
      sels: Seq[RawSel]) extends RawSel
  private final case class RSpread(name: String) extends RawSel

  /** Nesting bound for selection sets, lists, and objects combined —
    * the parser is recursive-descent, so without a bound a hostile
    * `[[[[…` document overflows the stack, and StackOverflowError is
    * an Error the HTTP layer's Exception handling would not convert
    * to a request error. 200 is far past any real query (the
    * reference schema bottoms out around depth 6). */
  val MaxDepth = 200

  /** Budget on RESOLVED selection nodes. The depth bound alone does
    * not stop a fragment bomb: sibling spreads of the same fragment
    * each re-expand it (`seen` is path-scoped), so a ~1.5 KB document
    * of 40 fragments each spreading the next TWICE resolves to 2^40
    * nodes while every individual chain stays short. Count every node
    * materialized during resolution and refuse past the budget. */
  val MaxResolvedNodes = 100000

  // ── Lexer + recursive descent ──────────────────────────────────────
  private final class Parser(src: String) {
    private var i = 0
    private var depth = 0
    private def descend[A](f: => A): A = {
      depth += 1
      if (depth > MaxDepth) fail(s"nesting deeper than $MaxDepth")
      try f finally depth -= 1
    }
    // fragments stored UNRESOLVED and substituted at document end —
    // a spread may reference a fragment defined later in the document
    private val frags =
      scala.collection.mutable.Map[String, (Option[String], Seq[RawSel])]()

    def document(): Operation = {
      skip()
      var op: Option[(Option[String],
        Seq[(String, String, Option[Value])], Seq[RawSel])] = None
      while (i < src.length) {
        if (peekIs("fragment")) fragmentDef()
        else {
          if (op.isDefined)
            fail("only one operation per document is supported")
          op = Some(operation())
        }
        skip()
      }
      val (name, vars, raw) =
        op.getOrElse(fail("empty document"))
      Operation(name, vars, raw.map(resolve(_, Set.empty)))
    }

    private var resolvedNodes = 0
    private def resolve(s: RawSel, seen: Set[String]): Selection = {
      resolvedNodes += 1
      if (resolvedNodes > MaxResolvedNodes)
        fail(s"document resolves to more than $MaxResolvedNodes " +
          "selection nodes (fragment expansion bomb?)")
      s match {
        case RField(a, n, ar, ss) =>
          Field(a, n, ar, ss.map(resolve(_, seen)))
        case RInline(on, ss) =>
          InlineFragment(on, ss.map(resolve(_, seen)))
        case RSpread(name) =>
          if (seen(name)) fail(s"fragment cycle through '$name'")
          // chains bound like nesting: resolve recurses once per
          // spread link, so an unbounded f1→f2→…→fN chain would
          // overflow the stack the same way deep nesting would
          if (seen.size >= MaxDepth)
            fail(s"fragment chain deeper than $MaxDepth")
          val (on, body) = frags.getOrElse(name,
            fail(s"undefined fragment '$name'"))
          InlineFragment(on, body.map(resolve(_, seen + name)))
      }
    }

    private def fragmentDef(): Unit = {
      expectName("fragment")
      val name = name0()
      if (name == "on") fail("fragment name must not be 'on'")
      expectName("on")
      val cond = name0()
      frags(name) = (Some(cond), selectionSet())
    }

    private def operation()
        : (Option[String], Seq[(String, String, Option[Value])],
           Seq[RawSel]) = {
      skip()
      if (peek() == '{') (None, Nil, selectionSet())
      else {
        val kw = name0()
        kw match {
          case "query" => ()
          case "mutation" | "subscription" =>
            fail(s"$kw operations are not supported (the reference " +
              "schema is query-only)")
          case other => fail(s"expected operation keyword, got '$other'")
        }
        skip()
        val nm = if (peek() != '(' && peek() != '{') Some(name0()) else None
        skip()
        val vars =
          if (peek() == '(') { i += 1; varDefs() } else Nil
        (nm, vars, selectionSet())
      }
    }

    private def varDefs(): Seq[(String, String, Option[Value])] = {
      val out = ArrayBuffer[(String, String, Option[Value])]()
      skip()
      while (peek() != ')') {
        expect('$'); val nm = name0(); skip(); expect(':')
        val tp = typeRef(); skip()
        val dflt = if (peek() == '=') { i += 1; Some(value()) } else None
        out += ((nm, tp, dflt)); skip()
      }
      i += 1
      out.toSeq
    }

    private def typeRef(): String = descend {
      skip()
      val sb = new StringBuilder
      if (peek() == '[') {
        i += 1; sb += '['; sb ++= typeRef(); skip(); expect(']'); sb += ']'
      } else sb ++= name0()
      skip()
      if (peek() == '!') { i += 1; sb += '!' }
      sb.toString
    }

    private def selectionSet(): Seq[RawSel] = descend {
      skip(); expect('{')
      val out = ArrayBuffer[RawSel]()
      skip()
      while (peek() != '}') {
        out += selection(); skip()
      }
      i += 1
      if (out.isEmpty) fail("empty selection set")
      out.toSeq
    }

    private def selection(): RawSel = {
      skip()
      if (peek() == '.') {
        expect('.'); expect('.'); expect('.'); skip()
        if (peek() == '{') RInline(None, selectionSet())
        else {
          val nm = name0()
          if (nm == "on") { val cond = name0(); RInline(Some(cond), selectionSet()) }
          else RSpread(nm)
        }
      } else {
        val first = name0(); skip()
        val (alias, nm) =
          if (peek() == ':') { i += 1; val n = name0(); (first, n) }
          else (first, first)
        skip()
        if (peek() == '@')
          fail("directives are not supported (none in the reference schema)")
        val args = if (peek() == '(') { i += 1; arguments() } else Nil
        skip()
        if (peek() == '@')
          fail("directives are not supported (none in the reference schema)")
        val sels = if (peek() == '{') selectionSet() else Nil
        RField(alias, nm, args, sels)
      }
    }

    private def arguments(): Seq[(String, Value)] = {
      val out = ArrayBuffer[(String, Value)]()
      skip()
      while (peek() != ')') {
        val nm = name0(); skip(); expect(':')
        out += ((nm, value())); skip()
      }
      i += 1
      out.toSeq
    }

    private def value(): Value = descend {
      skip()
      peek() match {
        case '$' => i += 1; VVar(name0())
        case '"' => VString(stringValue())
        case '[' =>
          i += 1; val items = ArrayBuffer[Value]()
          skip()
          while (peek() != ']') { items += value(); skip() }
          i += 1; VList(items.toSeq)
        case '{' =>
          i += 1; val fs = ArrayBuffer[(String, Value)]()
          skip()
          while (peek() != '}') {
            val nm = name0(); skip(); expect(':')
            fs += ((nm, value())); skip()
          }
          i += 1; VObj(fs.toSeq)
        case c if c == '-' || c.isDigit => number()
        case c if isNameStart(c) =>
          name0() match {
            case "true" => VBool(true)
            case "false" => VBool(false)
            case "null" => VNull
            case e => VEnum(e)
          }
        case c => fail(s"unexpected '$c' in value position")
      }
    }

    private def number(): Value = {
      val start = i
      if (peek() == '-') i += 1
      while (i < src.length && src.charAt(i).isDigit) i += 1
      var isFloat = false
      if (i < src.length && src.charAt(i) == '.') {
        isFloat = true; i += 1
        while (i < src.length && src.charAt(i).isDigit) i += 1
      }
      if (i < src.length &&
          (src.charAt(i) == 'e' || src.charAt(i) == 'E')) {
        isFloat = true; i += 1
        if (i < src.length &&
            (src.charAt(i) == '+' || src.charAt(i) == '-')) i += 1
        while (i < src.length && src.charAt(i).isDigit) i += 1
      }
      val tok = src.substring(start, i)
      try if (isFloat) VFloat(tok.toDouble) else VInt(tok.toLong)
      catch { case _: NumberFormatException =>
        // e.g. an int literal past Long range — keep the "parse
        // failures are always ParseError" contract the HTTP layer's
        // error classification relies on
        fail(s"number out of range: $tok")
      }
    }

    private def stringValue(): String = {
      // block string: """...""" with common-indent stripping; the
      // terminator is the first UNESCAPED triple quote (the only
      // escape block strings have is \""" — spec BlockStringValue)
      if (src.startsWith("\"\"\"", i)) {
        i += 3
        var end = src.indexOf("\"\"\"", i)
        while (end > 0 && src.charAt(end - 1) == '\\')
          end = src.indexOf("\"\"\"", end + 1)
        if (end < 0) fail("unterminated block string")
        val raw = src.substring(i, end).replace("\\\"\"\"", "\"\"\"")
        i = end + 3
        stripBlockIndent(raw)
      } else {
        i += 1
        val sb = new StringBuilder
        while (peek() != '"') {
          val c = src.charAt(i)
          if (c == '\\') {
            i += 1
            src.charAt(i) match {
              case '"' => sb += '"'
              case '\\' => sb += '\\'
              case '/' => sb += '/'
              case 'b' => sb += '\b'
              case 'f' => sb += '\f'
              case 'n' => sb += '\n'
              case 'r' => sb += '\r'
              case 't' => sb += '\t'
              case 'u' =>
                sb += Integer.parseInt(src.substring(i + 1, i + 5), 16)
                  .toChar
                i += 4
              case e => fail(s"bad escape '\\$e'")
            }
            i += 1
          } else if (c == '\n') fail("newline in single-quoted string")
          else { sb += c; i += 1 }
        }
        i += 1
        sb.toString
      }
    }

    /** GraphQL spec BlockStringValue(): drop common indentation and
      * leading/trailing blank lines. */
    private def stripBlockIndent(raw: String): String = {
      val lines = raw.split("\n", -1)
      val indents = lines.drop(1).filter(_.trim.nonEmpty)
        .map(l => l.indexWhere(!_.isWhitespace))
      val common = if (indents.isEmpty) 0 else indents.min
      val stripped = lines.head +:
        lines.drop(1).map(l => l.drop(math.min(common, l.length)))
      stripped.dropWhile(_.trim.isEmpty).reverse
        .dropWhile(_.trim.isEmpty).reverse.mkString("\n")
    }

    // ── lexer plumbing ───────────────────────────────────────────────
    private def isNameStart(c: Char) = c == '_' || c.isLetter
    private def name0(): String = {
      skip()
      if (i >= src.length || !isNameStart(src.charAt(i)))
        fail("expected a name")
      val start = i
      while (i < src.length && {
        val c = src.charAt(i); c == '_' || c.isLetterOrDigit
      }) i += 1
      src.substring(start, i)
    }
    private def expectName(n: String): Unit = {
      val got = name0()
      if (got != n) fail(s"expected '$n', got '$got'")
    }
    private def peekIs(n: String): Boolean = {
      val save = i
      val ok = try { name0() == n } catch { case _: ParseError => false }
      i = save; ok
    }
    private def peek(): Char =
      if (i < src.length) src.charAt(i)
      else fail("unexpected end of document")
    private def expect(c: Char): Unit = {
      skip()
      if (peek() != c) fail(s"expected '$c', got '${peek()}'")
      i += 1
    }
    /** Whitespace, commas (insignificant per spec), and # comments. */
    private def skip(): Unit = {
      var go = true
      while (go && i < src.length) {
        val c = src.charAt(i)
        if (c.isWhitespace || c == ',') i += 1
        else if (c == '#') { while (i < src.length && src.charAt(i) != '\n') i += 1 }
        else go = false
      }
    }
    private def fail(msg: String): Nothing = throw ParseError(msg, i)
  }
}
