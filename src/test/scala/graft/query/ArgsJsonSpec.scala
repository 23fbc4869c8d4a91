package graft.query

import org.scalatest.funsuite.AnyFunSuite

class ArgsJsonSpec extends AnyFunSuite {

  test("full GraphQL argument object parses field-for-field") {
    val a = ArgsJson.parse("""{
      "spkvideo": {"only": true, "firstUpload": true},
      "byTag": {"_eq": "video"},
      "byCreator": {"_in": ["alice", "bob"], "_nin": []},
      "byApp": {"_regex": "^3speak"},
      "includeComments": true,
      "byFollower": "carol",
      "pagination": {"limit": 10, "skip": 5}
    }""")
    assert(a.spkvideoOnly && a.spkvideoFirstUpload && !a.spkvideoIsShort)
    assert(a.byTag.get.eq.contains("video"))
    assert(a.byCreator.get.in.get == Seq("alice", "bob"))
    assert(a.byCreator.get.nin.get.isEmpty)  // empty list → op skipped
    assert(a.byApp.get.regex.contains("^3speak"))
    assert(a.includeComments && !a.includeCeramic)
    assert(a.byFollower.contains("carol"))
    assert(a.limit == 10 && a.skip == 5)
  }

  test("_or nests and defaults apply") {
    val a = ArgsJson.parse("""{
      "_or": [ {"byTag": {"_eq": "x"}}, {"byCreator": {"_eq": "y"}} ]
    }""")
    assert(a.or.size == 2)
    assert(a.or.head.byTag.get.eq.contains("x"))
    assert(a.limit == 0 && a.limitOr(100) == 100 && a.skip == 0 &&
      !a.includeComments)
  }

  test("explicit JSON nulls are treated as absent, not literal 'null'") {
    val a = ArgsJson.parse("""{
      "byFollower": null,
      "byTag": {"_eq": null, "_in": null},
      "pagination": {"limit": null, "skip": null},
      "spkvideo": null, "_or": null
    }""")
    assert(a.byFollower.isEmpty)
    assert(a.byTag.exists(w => w.eq.isEmpty && w.in.isEmpty))
    assert(a.limit == 0 && a.limitOr(100) == 100 && a.skip == 0)
    assert(!a.spkvideoOnly && a.or.isEmpty)
  }

  test("numeric scalars keep their types") {
    val a = ArgsJson.parse(
      """{"byLang": {"_gt": 3, "_lt": 4.5}}""")
    assert(a.byLang.get.gt.contains(3L))
    assert(a.byLang.get.lt.contains(4.5))
  }
}
