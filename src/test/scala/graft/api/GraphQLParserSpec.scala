package graft.api

import org.scalatest.funsuite.AnyFunSuite

/** Grammar coverage for the GraphQL executable-document subset —
  * pinned against documents the reference's clients actually send
  * (its GraphiQL default query, feed queries with nested argument
  * objects, variable-parameterized lookups). */
class GraphQLParserSpec extends AnyFunSuite {
  import GraphQL._

  private def fields(sels: Seq[Selection]): Seq[Field] =
    GraphQL.applicable(sels, None)

  test("bare selection set, arguments of every value kind") {
    val op = parse(
      """{
        |  socialFeed(
        |    spkvideo: {only: true, isShort: false},
        |    pagination: {limit: 10, skip: 0},
        |    feedOptions: {byTag: {_in: ["spark", "scala"]}, byLang: null},
        |    score: 1.5, note: "hi \n \"there\"", mode: PAYOUT
        |  ) { items { author permlink } }
        |}""".stripMargin)
    assert(op.name.isEmpty && op.variables.isEmpty)
    val f = fields(op.selections).head
    assert(f.name == "socialFeed")
    val args = f.args.toMap
    assert(args("spkvideo") == VObj(Seq(
      "only" -> VBool(true), "isShort" -> VBool(false))))
    assert(args("pagination") == VObj(Seq(
      "limit" -> VInt(10), "skip" -> VInt(0))))
    assert(args("feedOptions") == VObj(Seq(
      "byTag" -> VObj(Seq("_in" -> VList(Seq(
        VString("spark"), VString("scala"))))),
      "byLang" -> VNull)))
    assert(args("score") == VFloat(1.5))
    assert(args("note") == VString("hi \n \"there\""))
    assert(args("mode") == VEnum("PAYOUT"))
    val items = fields(f.selections).head
    assert(fields(items.selections).map(_.name) ==
      Seq("author", "permlink"))
  }

  test("named operation with variables, defaults, and aliases") {
    val op = parse(
      """query Lookup($author: String!, $lim: Int = 25) {
        |  post: socialPost(author: $author, permlink: "v1") {
        |    who: author
        |  }
        |}""".stripMargin)
    assert(op.name.contains("Lookup"))
    assert(op.variables == Seq(
      ("author", "String!", None), ("lim", "Int", Some(VInt(25)))))
    val f = fields(op.selections).head
    assert(f.alias == "post" && f.name == "socialPost")
    assert(f.args.toMap.apply("author") == VVar("author"))
    assert(fields(f.selections).head.alias == "who")
  }

  test("the reference's GraphiQL default query parses (inline " +
    "fragment on HivePost; api/index.ts:60-72)") {
    val op = parse(
      """query MyQuery {
        | latestFeed(limit: 10) {
        |   items {
        |      ... on HivePost {
        |        parent_permlink
        |        parent_author
        |        title
        |        body
        |      }
        |    }
        |  }
        |}""".stripMargin)
    val items = fields(fields(op.selections).head.selections).head
    // no flattening for a non-matching typename…
    assert(GraphQL.applicable(items.selections,
      Some("CeramicPost")).isEmpty)
    // …full flattening for the matching one (and for unknown)
    assert(GraphQL.applicable(items.selections, Some("HivePost"))
      .map(_.name) ==
      Seq("parent_permlink", "parent_author", "title", "body"))
    assert(GraphQL.allFieldNames(items.selections) ==
      Set("parent_permlink", "parent_author", "title", "body"))
  }

  test("named fragments: forward reference, nesting, cycle error") {
    val op = parse(
      """query { socialFeed { items { ...core } } }
        |fragment core on HivePost { author ...extra }
        |fragment extra on HivePost { permlink }
        |""".stripMargin)
    val items = fields(fields(op.selections).head.selections).head
    assert(GraphQL.applicable(items.selections, Some("HivePost"))
      .map(_.name) == Seq("author", "permlink"))
    val cyc = intercept[ParseError](parse(
      "query { f { ...a } } fragment a on T { ...b } " +
        "fragment b on T { ...a }"))
    assert(cyc.getMessage.contains("cycle"))
  }

  test("comments, commas-as-whitespace, block strings") {
    val tq = "\"\"\""
    val op = parse(
      "# leading comment\n" +
      "query {\n" +
      s"  searchFeed(searchTerm: $tq\n" +
      "    multi\n" +
      "    line\n" +
      s"  $tq, extra: [1,2,3,]) { items { author } } # trailing\n" +
      "}")
    val f = fields(op.selections).head
    assert(f.args.toMap.apply("searchTerm") == VString("multi\nline"))
    assert(f.args.toMap.apply("extra") ==
      VList(Seq(VInt(1), VInt(2), VInt(3))))
  }

  test("block string containing an escaped triple quote does not " +
    "terminate early") {
    val tq = "\"\"\""
    val op = parse(s"""{ f(s: ${tq}a\\${tq} b$tq) { x } }""")
    assert(fields(op.selections).head.args.toMap.apply("s") ==
      VString(s"a$tq b"))
  }

  test("collectFields merges duplicate response keys (spec " +
    "CollectFields: { a { x } a { y } } selects x AND y, once)") {
    val op = parse("{ feed { items { author } } feed { items { permlink } } }")
    val top = GraphQL.collectFields(op.selections, None)
    assert(top.size == 1 && top.head.name == "feed")
    val items = GraphQL.collectFields(top.head.selections, None)
    assert(items.size == 1)
    assert(GraphQL.collectFields(items.head.selections, None)
      .map(_.name) == Seq("author", "permlink"))
    // different aliases stay separate fields
    val op2 = parse("{ a: feed { items { author } } b: feed { items { author } } }")
    assert(GraphQL.collectFields(op2.selections, None).size == 2)
  }

  test("rejections: mutations, undefined fragments, ambiguous " +
    "operations") {
    assert(intercept[ParseError](parse("mutation { x { y } }"))
      .getMessage.contains("not supported"))
    assert(intercept[ParseError](parse("query { f { ...nope } }"))
      .getMessage.contains("undefined fragment"))
    assert(intercept[ParseError](
      parse("query A { f { x } } query B { g { y } }"))
      .getMessage.contains("operationName"))
    assert(intercept[ParseError](parse("query { }"))
      .getMessage.contains("empty selection"))
  }

  test("multi-operation documents select by operationName (spec " +
    "§6.1 GetOperation)") {
    val doc = """query A { f { x } } query B($v: Int) { g(n: $v) { y } }
                |fragment unused on T { z }""".stripMargin
    val a = GraphQL.parse(doc, Some("A"))
    assert(a.name.contains("A") &&
      fields(a.selections).head.name == "f")
    val b = GraphQL.parse(doc, Some("B"))
    assert(b.name.contains("B") && b.variables.map(_._1) == Seq("v"))
    // unknown name → error listing what the document defines
    val e = intercept[ParseError](GraphQL.parse(doc, Some("C")))
    assert(e.getMessage.contains("'C'") && e.getMessage.contains("A"))
    // a single-operation document ignores no name / matches its name
    assert(GraphQL.parse("query A { f { x } }").name.contains("A"))
    // an anonymous operation cannot share a document
    assert(intercept[ParseError](
      GraphQL.parse("{ f { x } } query B { g { y } }", Some("B")))
      .getMessage.contains("anonymous"))
    // duplicate operation names are a document error (§5.2.1.1), not
    // a silent first-match execution
    assert(intercept[ParseError](GraphQL.parse(
      "query A { f { x } } query A { g { y } }", Some("A")))
      .getMessage.contains("only one operation named 'A'"))
    // parseDocument returns EVERY operation for whole-document
    // validation
    val (picked, all) = GraphQL.parseDocument(doc, Some("A"))
    assert(picked.name.contains("A") && all.size == 2)
    assert(all.map(_.name.get) == Seq("A", "B"))
  }

  test("directives parse on fields, spreads, and inline fragments; " +
    "@skip/@include evaluate per spec §5.7.1, others are named " +
    "errors") {
    val op = parse(
      """query Q($v: Boolean!) {
        |  a @skip(if: true) { x }
        |  b @include(if: $v)
        |  c @skip(if: false) @include(if: true)
        |  ... on HivePost @include(if: false) { d }
        |  ...f @skip(if: $v)
        |}
        |fragment f on HivePost { e }""".stripMargin)
    val byAlias = fields(op.selections).map(f => f.alias -> f).toMap
    assert(byAlias("a").directives ==
      Seq(Directive("skip", Seq(("if", VBool(true))))))
    assert(byAlias("b").directives.head.args ==
      Seq(("if", VVar("v"))))
    assert(byAlias("c").directives.map(_.name) ==
      Seq("skip", "include"))
    // evaluation: $v = true
    val t = GraphQL.applyDirectives(op.selections,
      n => Some(n == "v"))
    val tNames = GraphQL.collectFields(t, None).map(_.alias)
    // a skipped, d excluded, spread f skipped (if: $v = true)
    assert(tNames == Seq("b", "c"))
    // evaluation: $v = false → the @skip(if:$v) spread SURVIVES
    val fSel = GraphQL.applyDirectives(op.selections, _ => Some(false))
    assert(GraphQL.collectFields(fSel, None).map(_.alias) ==
      Seq("c", "e"))
    // directives consumed: the surviving tree carries none
    assert(GraphQL.collectFields(t, None).forall(_.directives.isEmpty))
    // unknown directive name → error naming it
    val e1 = intercept[IllegalArgumentException](
      GraphQL.applyDirectives(
        parse("{ x @defer { y } }").selections, _ => None))
    assert(e1.getMessage.contains("@defer"))
    // non-boolean variable for if: → error
    val e2 = intercept[IllegalArgumentException](
      GraphQL.applyDirectives(
        parse("{ x @skip(if: $q) { y } }").selections, _ => None))
    assert(e2.getMessage.contains("Boolean"))
    // missing if: argument → error
    assert(intercept[IllegalArgumentException](
      GraphQL.applyDirectives(
        parse("{ x @skip { y } }").selections, _ => None))
      .getMessage.contains("'if'"))
  }

  test("block-string terminator: a literal backslash does not mask " +
    "the close (left-to-right scan, spec BlockStringCharacter)") {
    // content `a\` + escape + terminator: \""" is ALWAYS the escape,
    // so a\\\"\"\"\"\"\" reads: literal a, literal \, escaped """,
    // then the real terminator
    val op = parse("{ f(s: \"\"\"a\\\\\"\"\"\"\"\") { x } }")
    val s = fields(op.selections).head.args.toMap.apply("s")
    assert(s == VString("a\\\"\"\""))
  }

  test("escapes (incl. \\uXXXX) and negative/exponent numbers") {
    // é = é; written split so Scala's own unicode-escape pass
    // can't pre-substitute it
    val op = parse(
      "{ f(s: \"caf\\" + "u00e9 a\\tb\", a: -42, b: 6.02e23, " +
        "c: -1.5E-3) { x } }")
    val args = fields(op.selections).head.args.toMap
    assert(args("s") == VString("café a\tb"))
    assert(args("a") == VInt(-42))
    assert(args("b") == VFloat(6.02e23))
    assert(args("c") == VFloat(-1.5e-3))
  }
}
