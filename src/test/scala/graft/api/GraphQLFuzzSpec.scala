package graft.api

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property coverage for the parser: (1) every renderable value AST
  * round-trips through GraphQL argument syntax, (2) arbitrary input
  * NEVER escapes as anything but ParseError — no hangs, no stack
  * overflow (the depth bound), no unclassified exceptions — which is
  * the contract [[GraftApi.execute]]'s error handling relies on for
  * a public endpoint. */
class GraphQLFuzzSpec extends AnyFunSuite {
  import GraphQL._

  // deterministic manual sampling (the scalatest-scalacheck bridge is
  // not on the offline classpath; raw Gen + fixed seeds is plenty)
  private def samples[A](g: Gen[A], n: Int, seed: Long = 42L): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(seed + i)))

  private val name: Gen[String] = for {
    h <- Gen.alphaChar
    t <- Gen.listOfN(5, Gen.alphaNumChar)
  } yield (h :: t).mkString

  private def value(depth: Int): Gen[Value] =
    if (depth <= 0)
      Gen.oneOf(
        Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2).map(VInt),
        Gen.chooseNum(-1e9, 1e9).map(VFloat),
        Gen.asciiPrintableStr.map(VString),
        Gen.oneOf(true, false).map(VBool),
        Gen.const(VNull),
        name.map(VEnum))
    else Gen.frequency(
      5 -> value(0),
      1 -> Gen.listOfN(3, value(depth - 1)).map(VList),
      1 -> Gen.listOfN(3, name.flatMap(n =>
        value(depth - 1).map(n -> _))).map(VObj))

  private def render(v: Value): String = v match {
    case VInt(x) => x.toString
    case VFloat(x) => {
      val s = x.toString
      // GraphQL floats need a . or exponent; Scala prints both forms
      if (s.contains('.') || s.contains('e') || s.contains('E')) s
      else s + ".0"
    }
    case VString(x) => "\"" + x.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c => c.toString
    } + "\""
    case VBool(x) => x.toString
    case VNull => "null"
    case VEnum(n) => n
    case VList(xs) => xs.map(render).mkString("[", ", ", "]")
    case VObj(fs) => fs.map { case (k, x) => s"$k: ${render(x)}" }
      .mkString("{", ", ", "}")
    case VVar(n) => "$" + n
  }

  /** Enum literals true/false/null parse as their keyword values —
    * normalize the expectation the same way the parser must. */
  private def normalize(v: Value): Value = v match {
    case VEnum("true") => VBool(true)
    case VEnum("false") => VBool(false)
    case VEnum("null") => VNull
    case VList(xs) => VList(xs.map(normalize))
    case VObj(fs) => VObj(fs.map { case (k, x) => k -> normalize(x) })
    case x => x
  }

  test("argument values round-trip through GraphQL syntax") {
    samples(value(3), 300).foreach { v =>
      val doc = s"{ f(x: ${render(v)}) { y } }"
      val parsed = GraphQL.parse(doc)
      val got = GraphQL.applicable(parsed.selections, None)
        .head.args.toMap.apply("x")
      assert(got == normalize(v), s"doc was: $doc")
    }
  }

  test("arbitrary input only ever throws ParseError (no hangs, no " +
    "stack overflow, no unclassified exceptions)") {
    samples(Gen.asciiPrintableStr, 500).foreach { s =>
      try { GraphQL.parse(s); () }
      catch { case _: ParseError => () }
    }
    // structured garbage: braces/brackets/quotes soup
    val soup = Gen.listOf(Gen.oneOf(
      "{", "}", "[", "]", "(", ")", ":", "...", "$", "@", "\"",
      "\"\"\"", "query", "fragment", "on", "f", "1", "1.5", "#x\n"))
      .map(_.mkString(" "))
    samples(soup, 500).foreach { s =>
      try { GraphQL.parse(s); () }
      catch { case _: ParseError => () }
    }
  }

  test("fuzz: schema-legal selections never fail document " +
    "validation, including over a recursive UNION of partial shapes " +
    "and through opaque/map fields") {
    import org.apache.spark.sql.types._
    // two overlapping partial schemas — the served-store shape and
    // the declared shape, unioned recursively (the a6e2a39 bug class:
    // a top-level-only merge rejected declared SUBFIELDS of structs
    // the store carries partially)
    val storeSide = StructType(Seq(
      StructField("id", StringType),
      StructField("stats", StructType(Seq(
        StructField("views", LongType),
        StructField("score", DoubleType)))),
      StructField("meta", MapType(StringType, StringType)),
      StructField("tags", ArrayType(StringType))))
    val declaredSide = StructType(Seq(
      StructField("id", StringType),
      StructField("stats", StructType(Seq(
        StructField("views", LongType),
        StructField("reward", DoubleType)))),
      StructField("extra", StructType(Seq(
        StructField("pin", StringType))))))
    val shape = SchemaShape.union(
      SchemaShape.fromDataType("Store", storeSide).get,
      SchemaShape.fromDataType("Declared", declaredSide).get)

    def genSelSet(sh: SchemaShape.TypeShape, depth: Int): Gen[String] = {
      val names = sh.fields.keys.toSeq.sorted
      def genField(nm: String): Gen[String] =
        sh.fields(nm).tpe() match {
          case Some(t) if depth > 0 && t.opaque =>
            // opaque interior (map column): ANY selection passes
            Gen.oneOf(nm, s"$nm { anything goes { deeper } }")
          case Some(t) if depth > 0 && t.fields.nonEmpty =>
            Gen.oneOf(Gen.const(nm),
              genSelSet(t, depth - 1).map(ss => s"$nm $ss"))
          case _ => Gen.const(nm)
        }
      for {
        n <- Gen.chooseNum(1, math.min(3, names.size))
        picks <- Gen.pick(n, names)
        fields <- picks.toSeq.foldLeft(Gen.const(Seq.empty[String])) {
          (acc, nm) => acc.flatMap(s => genField(nm).map(s :+ _))
        }
        withTypename <- Gen.oneOf(true, false)
      } yield (fields ++ (if (withTypename) Seq("__typename") else Nil))
        .mkString("{ ", " ", " }")
    }
    samples(genSelSet(shape, 3), 300).foreach { ss =>
      val parsed = GraphQL.parse(s"query $ss")
      val errs = SchemaShape.validate(parsed.selections, shape)
      assert(errs.isEmpty, s"doc was: query $ss → $errs")
    }
    // root meta-fields are validation-opaque (GraphiQL's first
    // request); NON-root __schema is an ordinary unknown field
    val meta = GraphQL.parse(
      "query { __schema { types { name } } __typename }")
    assert(SchemaShape.validate(meta.selections, shape).isEmpty)
    val nonRoot = GraphQL.parse("query { stats { __schema { x } } }")
    assert(SchemaShape.validate(nonRoot.selections, shape)
      .exists(_.contains("__schema")))
  }

  test("out-of-range int literals are ParseError, not " +
    "NumberFormatException") {
    val e = intercept[ParseError](
      GraphQL.parse("{ f(x: 99999999999999999999) { y } }"))
    assert(e.getMessage.contains("out of range"))
  }

  test("the depth bound rejects hostile nesting instead of " +
    "overflowing the stack") {
    val deepList = "{ f(x: " + "[" * 5000 + "]" * 5000 + ") { y } }"
    val e1 = intercept[ParseError](GraphQL.parse(deepList))
    assert(e1.getMessage.contains("nesting"))
    val deepSel = "query " + "{ f " * 5000 + "}" * 5000
    val e2 = intercept[ParseError](GraphQL.parse(deepSel))
    assert(e2.getMessage.contains("nesting"))
    val chain = (1 to 500).map(i =>
      s"fragment f$i on T { ...f${i + 1} }").mkString(" ")
    val e3 = intercept[ParseError](GraphQL.parse(
      s"query { q { ...f1 } } $chain fragment f501 on T { x }"))
    assert(e3.getMessage.contains("chain") ||
      e3.getMessage.contains("nesting"))
    // nesting and chain links must share ONE combined bound: 100
    // chain links × ~3 nesting levels per fragment body stays under
    // both bounds separately yet would stack ~400 resolve frames —
    // exactly the multiplicative composition that once reached
    // StackOverflowError (an Error the HTTP layer can't classify)
    val mulChain = (1 to 100).map(i =>
      s"fragment g$i on T { a { b { ...g${i + 1} } } }").mkString(" ")
    val e4 = intercept[ParseError](GraphQL.parse(
      s"query { q { ...g1 } } $mulChain fragment g101 on T { x }"))
    assert(e4.getMessage.contains("deeper than") ||
      e4.getMessage.contains("nesting"))
  }
}
