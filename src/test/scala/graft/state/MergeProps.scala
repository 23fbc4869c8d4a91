package graft.state

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property: latest-wins merge is input-order insensitive — the
  * relational replacement for the reference's reorder buffer
  * (SURVEY.md §2.11 ordering). */
class MergeProps extends SparkSpec {

  test("latestWins(shuffled input) == latestWins(sorted input), 30 trials") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    (1 to 30).foreach { trial =>
      val n = 5 + rng.nextInt(40)
      val rows = (1 to n).map { i =>
        (s"k${rng.nextInt(6)}", rng.nextInt(10).toLong, i.toLong,
          s"payload$i")
      }
      def run(input: Seq[(String, Long, Long, String)]) =
        Merge.latestWins(
          input.toDF("key", "version", "uid", "payload"),
          Seq("key"), col("version"), Seq(col("uid")))
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
          .sortBy(_._1).toSeq
      val sorted = run(rows.sortBy(r => (r._2, r._3)))
      val shuffled = run(rng.shuffle(rows))
      assert(sorted == shuffled, s"trial $trial diverged")
      // winner per key = max (version, uid)
      val expect = rows.groupBy(_._1).map { case (k, g) =>
        val w = g.maxBy(r => (r._2, r._3)); (k, w._2, w._3)
      }.toSeq.sortBy(_._1)
      assert(sorted == expect, s"trial $trial wrong winner")
    }
  }

  test("upsert(base, changes) == latest state regardless of split point, 20 trials") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    (1 to 20).foreach { trial =>
      val rows = (1 to 30).map { i =>
        (s"k${rng.nextInt(5)}", i.toLong, s"v$i")
      }
      val cut = rng.nextInt(rows.size)
      val (base, changes) = rows.splitAt(cut)
      def df(s: Seq[(String, Long, String)]) =
        s.toDF("key", "version", "payload")
      val merged = Merge.upsert(df(base), df(changes), Seq("key"),
        col("version")).collect()
        .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
      val direct = Merge.latestWins(df(rows), Seq("key"),
        col("version")).collect()
        .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
      assert(merged == direct, s"trial $trial split=$cut")
    }
  }
}
