package graft.state

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  test("saltedEquiJoin == plain inner join; keys spread across salts") {
    import spark.implicits._
    // skewed facts: key 1 carries 100 of 103 rows
    val facts = ((1 to 100).map(i => (i.toLong, 1L)) ++
      Seq((101L, 2L), (102L, 3L), (103L, 99L)))  // 99 has no dim row
      .toDF("event_id", "k")
    val dim = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "unused"))
      .toDF("dk", "name")
    val salted = Layout.saltedEquiJoin(facts, dim,
      col("k"), col("dk"), col("event_id"), salts = 8)
    val plain = facts.join(dim, col("k") === col("dk"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "k", "dk", "name").collect()
        .map(_.toSeq).sortBy(_.toString).toSeq
    assert(canon(salted) == canon(plain))
    assert(salted.count() == 102)               // inner: key 99 dropped
    // the hot key's rows really do take distinct salt values (the
    // whole point: one key no longer lands in one reducer partition)
    val spread = facts.filter(col("k") === 1)
      .select(pmod(xxhash64(col("event_id")), lit(8L)))
      .distinct().count()
    assert(spread > 1)
  }

  test("saltedEquiJoin deterministic across runs (hash salt, not rand)") {
    import spark.implicits._
    val facts = (1 to 50).map(i => (i.toLong, i.toLong % 5))
      .toDF("event_id", "k")
    val dim = (0L to 4L).map(k => (k, s"n$k")).toDF("dk", "name")
    def run() = Layout.saltedEquiJoin(facts.repartition(7), dim,
      col("k"), col("dk"), col("event_id"), salts = 4)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(run() == run())
  }
}
