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
  * `api/index.ts:60-72`), named fragment definitions + spreads, and
  * directives on fields/spreads/inline fragments — the two
  * spec-mandated execution builtins `@skip`/`@include` are honored
  * (with variable `if:` arguments; [[applyDirectives]]), every other
  * directive name is rejected with an error naming it. Not supported
  * (documented, rejected with a clear error): mutations and
  * subscriptions (the reference's Query type is the entire surface —
  * `schema.ts:308-327` defines no Mutation).
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

  /** A directive occurrence (`@skip(if: ...)`). Only the two
    * spec-mandated execution builtins are honored ([[applyDirectives]]
    * — GraphQL Oct-2021 §5.7.1: every compliant server provides
    * `@skip`/`@include` regardless of what the schema declares, and
    * codegen'd clients emit them routinely); any other name is an
    * error at directive-application time. */
  final case class Directive(name: String, args: Seq[(String, Value)])

  sealed trait Selection
  final case class Field(alias: String, name: String,
                         args: Seq[(String, Value)],
                         selections: Seq[Selection],
                         directives: Seq[Directive] = Nil)
      extends Selection
  /** Inline fragment (or a resolved named-fragment spread): its
    * selections apply only to rows whose `__typename` matches the
    * type condition (None = no condition). */
  final case class InlineFragment(onType: Option[String],
                                  selections: Seq[Selection],
                                  directives: Seq[Directive] = Nil)
      extends Selection
  /** Left behind by [[applyDirectives]] when a field's selection set
    * was non-empty in the document but every selection was excluded
    * by @skip/@include: per spec execution the field then resolves to
    * an EMPTY OBJECT — whereas a genuinely selection-less Seq means
    * "leaf field, serialize the value". Without the marker the two
    * are indistinguishable downstream, and the executor's
    * empty-equals-passthrough contract would dump the raw row (every
    * store column, unpruned) for `{ x { y @skip(if: true) } }`.
    * Resolves to no fields; [[applicable]]/[[allFieldNames]] skip it.
    */
  case object Excluded extends Selection

  /** One parsed operation: variable definitions are
    * (name, declared type string, default value). */
  final case class Operation(name: Option[String],
                             variables: Seq[(String, String, Option[Value])],
                             selections: Seq[Selection])

  final case class ParseError(msg: String, pos: Int)
      extends RuntimeException(s"$msg (at offset $pos)")

  /** Parse + select one operation. Multi-operation documents (what
    * GraphiQL and persisted-query clients send) need `operationName`
    * to pick one, exactly like yoga's GetOperation (spec §6.1). */
  def parse(doc: String, operationName: Option[String] = None)
      : Operation = parseDocument(doc, operationName)._1

  /** [[parse]], but ALSO returning every operation the document
    * defines (fragments resolved, shared node budget) — yoga
    * validates the WHOLE document before executing any operation, so
    * the validator needs the unselected operations too. */
  def parseDocument(doc: String, operationName: Option[String] = None)
      : (Operation, Seq[Operation]) =
    new Parser(doc).document(operationName)

  /** The selections that apply to a row of the given `__typename`:
    * fields pass through; inline fragments flatten when their type
    * condition matches (or when either side has no type info). */
  def applicable(sels: Seq[Selection],
                 typename: Option[String]): Seq[Field] =
    sels.flatMap {
      case f: Field => Seq(f)
      case InlineFragment(cond, inner, _) =>
        if (cond.isEmpty || typename.isEmpty || cond == typename)
          applicable(inner, typename)
        else Nil
      case Excluded => Nil
    }

  /** Evaluate `@skip`/`@include` against the request's variables and
    * return the selection tree with excluded branches dropped and
    * directive info consumed (spec §5.7.1: excluded when `@skip(if:)`
    * is true OR `@include(if:)` is false; both present → included only
    * when include=true AND skip=false). Runs ONCE per request, before
    * field collection — the rest of the executor sees a plain tree.
    * Any other directive name is rejected (the served schema declares
    * none). `boolVar` resolves a `$variable` used as an `if:` argument
    * to its boolean value (None = absent or non-boolean → error, per
    * spec the argument is a non-null Boolean!). */
  def applyDirectives(sels: Seq[Selection],
                      boolVar: String => Option[Boolean])
      : Seq[Selection] = {
    def cond(d: Directive): Boolean = {
      val arg = d.args.collectFirst { case ("if", v) => v }
        .getOrElse(throw new IllegalArgumentException(
          s"directive @${d.name} requires an 'if' argument"))
      arg match {
        case VBool(b) => b
        case VVar(n) => boolVar(n).getOrElse(
          throw new IllegalArgumentException(
            s"@${d.name}(if: $$$n): variable must be a Boolean"))
        case other => throw new IllegalArgumentException(
          s"@${d.name}(if:) must be a Boolean, got $other")
      }
    }
    // map-then-forall (not forall alone): EVERY directive must be
    // inspected, or an unknown name after an excluding @skip would be
    // silently accepted — whether '@defer' errors must not depend on
    // the runtime value of a neighboring directive's variable
    def included(dirs: Seq[Directive]): Boolean = dirs.map { d =>
      d.name match {
        case "skip" => !cond(d)
        case "include" => cond(d)
        case other => throw new IllegalArgumentException(
          s"unknown directive '@$other' (only the execution builtins " +
            "@skip/@include are supported)")
      }
    }.forall(identity)
    sels.flatMap {
      case f: Field =>
        if (!included(f.directives)) Nil
        else {
          val inner = applyDirectives(f.selections, boolVar)
          // see [[Excluded]]: a selection set emptied by directives
          // must stay distinguishable from no-selection-set
          val kept =
            if (f.selections.nonEmpty && inner.isEmpty) Seq(Excluded)
            else inner
          Seq(f.copy(selections = kept, directives = Nil))
        }
      case fr: InlineFragment =>
        if (!included(fr.directives)) Nil
        else Seq(fr.copy(
          selections = applyDirectives(fr.selections, boolVar),
          directives = Nil))
      case Excluded => Seq(Excluded)
    }
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
    case InlineFragment(_, inner, _) => allFieldNames(inner)
    case Excluded => Nil
  }.toSet

  // selections parsed with fragment spreads still symbolic, resolved
  // once all fragment definitions are known (a spread may precede its
  // definition in the document)
  private sealed trait RawSel
  private final case class RField(alias: String, name: String,
      args: Seq[(String, Value)], sels: Seq[RawSel],
      dirs: Seq[Directive]) extends RawSel
  private final case class RInline(on: Option[String],
      sels: Seq[RawSel], dirs: Seq[Directive]) extends RawSel
  private final case class RSpread(name: String,
      dirs: Seq[Directive]) extends RawSel

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
    private val frags = scala.collection.mutable
      .Map[String, (Option[String], Seq[RawSel])]()

    def document(operationName: Option[String])
        : (Operation, Seq[Operation]) = {
      skip()
      val ops = ArrayBuffer[(Option[String],
        Seq[(String, String, Option[Value])], Seq[RawSel])]()
      while (i < src.length) {
        if (peekIs("fragment")) fragmentDef()
        else ops += operation()
        skip()
      }
      if (ops.isEmpty) fail("empty document")
      // GetOperation (spec §6.1): a multi-operation document needs
      // operationName to pick one; anonymous (shorthand) operations
      // are only legal when the document holds exactly one operation;
      // operation names must be unique (§5.2.1.1 — graphql-js rejects
      // the document; find-first would execute whichever A comes
      // first, silently order-dependent)
      if (ops.size > 1 && ops.exists(_._1.isEmpty))
        fail("an anonymous operation must be the only operation " +
          "in the document")
      ops.flatMap(_._1).groupBy(identity).collectFirst {
        case (nm, dup) if dup.size > 1 => nm
      }.foreach(nm =>
        fail(s"there can be only one operation named '$nm'"))
      val picked = operationName match {
        case None =>
          if (ops.size > 1)
            fail(s"document defines ${ops.size} operations " +
              s"(${ops.flatMap(_._1).mkString(", ")}) — pass " +
              "operationName to select one")
          ops.head
        case Some(nm) => ops.find(_._1.contains(nm)).getOrElse(
          fail(s"unknown operation '$nm' (document defines: " +
            s"${ops.flatMap(_._1).mkString(", ")})"))
      }
      // resolve EVERY operation (shared resolvedNodes budget) — the
      // executor runs only the picked one, but the validator covers
      // the whole document like yoga's validate()
      val all = ops.map { case (name, vars, raw) =>
        Operation(name, vars, raw.map(resolve(_, Set.empty, 0)))
      }.toSeq
      (all(ops.indexOf(picked)), all)
    }

    private var resolvedNodes = 0
    /** `d` is the COMBINED structural depth: one unit per nesting
      * level AND per fragment-chain link, in a single counter. The two
      * bounds used to be separate, and they compose multiplicatively —
      * a ~200-link fragment chain whose bodies each nest ~200 sets
      * passed both checks yet drove resolve() to ~40k stack frames
      * (StackOverflowError is an Error, which would escape the HTTP
      * layer's Exception handling). One counter caps the stack at
      * MaxDepth frames outright. */
    private def resolve(s: RawSel, seen: Set[String], d: Int)
        : Selection = {
      resolvedNodes += 1
      if (resolvedNodes > MaxResolvedNodes)
        fail(s"document resolves to more than $MaxResolvedNodes " +
          "selection nodes (fragment expansion bomb?)")
      if (d >= MaxDepth)
        fail(s"resolved structure deeper than $MaxDepth " +
          "(selection nesting + fragment chain combined)")
      s match {
        case RField(a, n, ar, ss, dr) =>
          Field(a, n, ar, ss.map(resolve(_, seen, d + 1)), dr)
        case RInline(on, ss, dr) =>
          InlineFragment(on, ss.map(resolve(_, seen, d + 1)), dr)
        case RSpread(name, dr) =>
          if (seen(name)) fail(s"fragment cycle through '$name'")
          val (on, body) = frags.getOrElse(name,
            fail(s"undefined fragment '$name'"))
          InlineFragment(on,
            body.map(resolve(_, seen + name, d + 1)), dr)
      }
    }

    private def fragmentDef(): Unit = {
      expectName("fragment")
      val name = name0()
      if (name == "on") fail("fragment name must not be 'on'")
      expectName("on")
      val cond = name0()
      skip()
      // the grammar allows directives here, but the execution builtins
      // @skip/@include are valid ONLY on fields, fragment spreads and
      // inline fragments (spec §5.7.1) and the served schema declares
      // no FRAGMENT_DEFINITION directives — graphql-js rejects such a
      // document at validation, so accepting (or worse, evaluating)
      // them here would execute documents yoga errors on (ADVICE r8)
      val dirs = directives()
      dirs.headOption.foreach(d => fail(
        s"directive '@${d.name}' is not allowed on a fragment " +
          "definition (@skip/@include apply to fields, fragment " +
          "spreads and inline fragments only)"))
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
        if (peek() == '{' || peek() == '@') {
          // anonymous inline fragment, optionally with directives
          val dirs = directives()
          RInline(None, selectionSet(), dirs)
        } else {
          val nm = name0()
          if (nm == "on") {
            val cond = name0(); skip()
            val dirs = directives()
            RInline(Some(cond), selectionSet(), dirs)
          } else RSpread(nm, { skip(); directives() })
        }
      } else {
        val first = name0(); skip()
        val (alias, nm) =
          if (peek() == ':') { i += 1; val n = name0(); (first, n) }
          else (first, first)
        skip()
        val args = if (peek() == '(') { i += 1; arguments() } else Nil
        skip()
        val dirs = directives()
        skip()
        val sels =
          if (i < src.length && peek() == '{') selectionSet() else Nil
        RField(alias, nm, args, sels, dirs)
      }
    }

    /** Zero or more `@name(args)?` occurrences. Names are not
      * restricted here — [[applyDirectives]] rejects anything beyond
      * the two execution builtins, with a message naming the
      * directive. */
    private def directives(): Seq[Directive] = {
      val out = ArrayBuffer[Directive]()
      skip()
      while (i < src.length && peek() == '@') {
        i += 1
        val nm = name0(); skip()
        val args = if (i < src.length && peek() == '(') {
          i += 1; arguments()
        } else Nil
        out += Directive(nm, args)
        skip()
      }
      out.toSeq
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
      // block string: """...""" with common-indent stripping. The only
      // escape is the exact 4-char sequence \""" (spec
      // BlockStringCharacter) — scanned LEFT-TO-RIGHT like graphql-js,
      // so a preceding literal backslash never masks a terminator and
      // \\""" reads as literal-\ then escaped-""" (a look-one-behind
      // indexOf scan got that wrong: it skipped genuine terminators
      // whenever ANY backslash preceded them)
      if (src.startsWith("\"\"\"", i)) {
        i += 3
        val sb = new StringBuilder
        var closed = false
        while (!closed) {
          if (i >= src.length) fail("unterminated block string")
          if (src.startsWith("\\\"\"\"", i)) { sb ++= "\"\"\""; i += 4 }
          else if (src.startsWith("\"\"\"", i)) { closed = true; i += 3 }
          else { sb += src.charAt(i); i += 1 }
        }
        stripBlockIndent(sb.toString)
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
