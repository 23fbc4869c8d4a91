package graft.text

import graft.SparkSpec

class CollocationsSpec extends SparkSpec {
  import spark.implicits._

  test("always-paired tokens outscore independent ones; min-count " +
    "excludes the rare tail") {
    // "rio grande" always co-occur as a unit; "the" pairs with
    // everything (low PMI); "rare gem" appears once (below minCount)
    val docs = (1 to 6).map { i =>
      (i.toLong, s"the rio grande v$i flows the v$i end")
    } :+ (7L, "rare gem")
    val out = Collocations.pmiTopK(docs.toDF("doc_id", "text"),
      "text", minCount = 3, k = 10).collect()
    assert(out.nonEmpty)
    val bigrams = out.map(_.getAs[String]("bigram"))
    assert(bigrams.head == "rio grande") // the perfect collocation
    assert(!bigrams.contains("rare gem")) // count 1 < minCount
    // PMI ordering is non-increasing
    val pmis = out.map(_.getAs[Long]("pmi_micro"))
    assert(pmis.zip(pmis.tail).forall { case (a, b) => a >= b })
    // "the X" bigrams score below the true collocation
    val theRio = out.find(_.getAs[String]("bigram") == "the rio")
    theRio.foreach(r =>
      assert(r.getAs[Long]("pmi_micro") < pmis.head))
  }

  test("corpora with no bigram at min-count yield an empty result") {
    val docs = Seq((1L, "a b"), (2L, "c d")).toDF("doc_id", "text")
    assert(Collocations.pmiTopK(docs, "text", minCount = 2, k = 5)
      .collect().isEmpty)
  }
}
