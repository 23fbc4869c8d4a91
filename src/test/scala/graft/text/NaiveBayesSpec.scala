package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The catalog row (d52) proves oracle parity; THIS spec proves the
  * learner learns — the driver corpus's lang labels are
  * text-independent by construction, so d52's holdout accuracy cannot
  * demonstrate that. Here the corpus has real class-conditional token
  * distributions, including a marker-less "zz" class the d03 marker
  * heuristic has no list for. */
class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(perClass: Int) = {
    // Three classes with disjoint-ish content words over a shared
    // function-word background; deterministic round-robin mixing.
    val content = Map(
      "aa" -> Seq("alpha", "apple", "anchor"),
      "bb" -> Seq("bravo", "berry", "basket"),
      "zz" -> Seq("zulu", "zebra", "zenith"))
    val rows = for {
      (cls, words) <- content.toSeq
      i <- 0 until perClass
    } yield {
      val text = (0 until 8).map { j =>
        if (j % 3 == 0) "the" else words((i + j) % words.size)
      }.mkString(" ")
      (cls.hashCode.toLong * 1000 + i, text, cls)
    }
    rows.toDF("id", "text", "cls")
  }

  test("learns class-conditional vocabularies; 100% on held-out docs") {
    val docs = corpus(perClass = 10)
    val out = NaiveBayes.trainApply(docs, "text", "id", "cls",
      col("id") % 5 === 0).collect()
    assert(out.length == 6) // 2 holdout docs per class
    assert(out.forall(r => r.getAs[String]("pred") ==
      r.getAs[String]("actual")))
    // the marker-less class is classified too
    assert(out.exists(_.getAs[String]("actual") == "zz"))
  }

  test("zero-token holdout doc scored prior-only, to majority class") {
    val docs = corpus(perClass = 6)
      // extra aa train docs tilt the prior toward aa
      .unionByName(Seq((900001L, "alpha apple", "aa"),
        (900002L, "apple anchor", "aa"),
        (900003L, "anchor alpha", "aa")).toDF("id", "text", "cls"))
      .unionByName(Seq((1000000L, "", "bb")).toDF("id", "text", "cls"))
    val out = NaiveBayes.trainApply(docs, "text", "id", "cls",
      col("id") === 1000000L || col("id") % 5 === 0)
    val empty = out.filter(col("id") === 1000000L).collect()
    assert(empty.length == 1)
    // prior-only argmin = most frequent training class (aa)
    assert(empty.head.getAs[String]("pred") == "aa")
  }

  test("tie on cost breaks to lexicographically smallest label") {
    // perfectly symmetric training data => identical costs for both
    // classes on a neutral doc; 'aa' must win the tie
    val docs = Seq(
      (1L, "x y", "aa"), (2L, "x y", "bb"),
      (10L, "x y", "aa")).toDF("id", "text", "cls")
    val out = NaiveBayes.trainApply(docs, "text", "id", "cls",
      col("id") === 10L).collect()
    assert(out.head.getAs[String]("pred") == "aa")
  }
}
