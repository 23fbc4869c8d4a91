package graft.query

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WhereSpec extends SparkSpec {

  private lazy val df = {
    import spark.implicits._
    Seq((1L, "alpha", 10.0, Seq("a", "b")),
      (2L, "beta", 20.0, Seq("b", "c")),
      (3L, "gamma", 30.0, Seq.empty[String]),
      (4L, "delta", 40.0, Seq("a")))
      .toDF("id", "name", "score", "tags")
  }

  private def ids(w: Where, c: String = "name"): Set[Long] =
    df.filter(w.compile(col(c)).getOrElse(lit(true)))
      .collect().map(_.getLong(0)).toSet

  test("every scalar op maps to its reference Mongo semantics") {
    assert(ids(Where(eq = Some("beta"))) == Set(2L))
    assert(ids(Where(ne = Some("beta"))) == Set(1L, 3L, 4L))
    assert(ids(Where(lt = Some(25.0)), "score") == Set(1L, 2L))
    assert(ids(Where(gt = Some(25.0)), "score") == Set(3L, 4L))
    assert(ids(Where(lte = Some(20.0)), "score") == Set(1L, 2L))
    assert(ids(Where(gte = Some(30.0)), "score") == Set(3L, 4L))
    assert(ids(Where(in = Some(Seq("alpha", "delta")))) == Set(1L, 4L))
    assert(ids(Where(nin = Some(Seq("alpha", "delta")))) == Set(2L, 3L))
    assert(ids(Where(regex = Some("^.e"))) == Set(2L, 4L))
    // unanchored search semantics like $regex
    assert(ids(Where(regex = Some("amm"))) == Set(3L))
  }

  test("empty _in list is SKIPPED, not match-nothing (resolvers/index.ts:14-16)") {
    assert(Where(in = Some(Nil)).compile(col("name")).isEmpty)
    assert(ids(Where(in = Some(Nil))) == Set(1L, 2L, 3L, 4L))
    // but combined ops still apply
    assert(ids(Where(in = Some(Nil), eq = Some("beta"))) == Set(2L))
  }

  test("ops on one field AND together") {
    assert(ids(Where(gt = Some(10.0), lt = Some(40.0)), "score")
      == Set(2L, 3L))
  }

  test("array-field semantics: _eq is membership, _regex matches any element") {
    def aids(w: Where) =
      df.filter(w.compileArray(col("tags")).getOrElse(lit(true)))
        .collect().map(_.getLong(0)).toSet
    assert(aids(Where(eq = Some("a"))) == Set(1L, 4L))
    assert(aids(Where(ne = Some("a"))) == Set(2L, 3L))
    assert(aids(Where(in = Some(Seq("c", "z")))) == Set(2L))
    assert(aids(Where(nin = Some(Seq("a")))) == Set(2L, 3L))
    assert(aids(Where(regex = Some("^[bc]$"))) == Set(1L, 2L))
    assert(aids(Where(in = Some(Nil))) == Set(1L, 2L, 3L, 4L)) // skip
  }

  test("Predicates.all/any fold with None as identity") {
    assert(df.filter(Predicates.all(None, None)).count() == 4)
    assert(df.filter(Predicates.all(
      Some(col("score") > 15), None, Some(col("score") < 35)))
      .collect().map(_.getLong(0)).toSet == Set(2L, 3L))
    assert(df.filter(Predicates.any(
      Some(col("name") === "alpha"), Some(col("name") === "gamma")))
      .collect().map(_.getLong(0)).toSet == Set(1L, 3L))
  }
}
