package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Dev-only: stage decomposition of the d41 prefix-filter join at
  * sf0.1 — where do the seconds go? */
object D41Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val (tNum, tDen) = (4, 5)
    def t[A](l: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$l%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    val docs = graft.Tables.documents(spark, d)
    // warm
    docs.count()
    // variant timing: where does the sets build cost come from?
    t("A: toks select -> shingles") {
      docs.select(col("doc_id").as("id"),
          Text.tokens(col("text")).as("toks"))
        .select(col("id"), Text.wordShingles(col("toks"), 3).as("sh"))
        .write.mode("overwrite").format("noop").save()
    }
    t("B: A + array_distinct") {
      docs.select(col("doc_id").as("id"),
          Text.tokens(col("text")).as("toks"))
        .select(col("id"),
          array_distinct(Text.wordShingles(col("toks"), 3)).as("sh"))
        .write.mode("overwrite").format("noop").save()
    }
    t("C: B + filter(size>0)") {
      docs.select(col("doc_id").as("id"),
          Text.tokens(col("text")).as("toks"))
        .select(col("id"),
          array_distinct(Text.wordShingles(col("toks"), 3)).as("sh"))
        .filter(size(col("sh")) > 0)
        .write.mode("overwrite").format("noop").save()
    }
    t("D: nested tokens (HOF trap)") {
      docs.select(col("doc_id").as("id"), array_distinct(
          Text.wordShingles(Text.tokens(col("text")), 3)).as("sh"))
        .write.mode("overwrite").format("noop").save()
    }
    val sets = docs.select(col("doc_id").as("id"), array_distinct(
        Text.wordShingles(Text.tokens(col("text")), 3)).as("sh"))
      .filter(size(col("sh")) > 0).persist()
    t("sets build+persist") { sets.count() }
    val ex = sets.select(col("id"), explode(col("sh")).as("tk"))
    val dfreq = ex.groupBy("tk").agg(count(lit(1)).as("df"))
    t("dfreq") { dfreq.count() }
    val pref = ex.join(dfreq, "tk")
      .groupBy("id")
      .agg(array_sort(collect_list(struct(col("df"), col("tk"))))
        .as("os"))
      .select(col("id"), size(col("os")).cast("long").as("n"),
        expr("transform(os, s -> s.tk)").as("os"))
      .select(col("id"), col("n"), posexplode(expr(
          s"slice(os, 1, cast(n - (($tNum * n + ${tDen - 1}) DIV " +
            s"$tDen) + 1 AS INT))")).as(Seq("p0", "tk")))
      .select(col("id"), col("n"), (col("p0") + 1).as("pos"),
        col("tk")).persist()
    t("pref build+persist") { println("  pref rows = " + pref.count()) }
    val cand = pref.select(col("tk"), col("id").as("id_a"),
        col("n").as("na"), col("pos").as("pa"))
      .join(pref.select(col("tk"), col("id").as("id_b"),
        col("n").as("nb"), col("pos").as("pb")), Seq("tk"))
      .filter(col("id_a") < col("id_b"))
    t("raw joined rows") { println("  " + cand.count()) }
    val filt = cand
      .filter(col("na") * tNum <= col("nb") * tDen &&
        col("nb") * tNum <= col("na") * tDen)
      .filter(lit(1L) + least(col("na") - col("pa"),
          col("nb") - col("pb")) >=
        expr(s"($tNum * (na + nb) + ${tNum + tDen - 1}) DIV " +
          s"${tNum + tDen}"))
      .select("id_a", "id_b").distinct().persist()
    t("filtered distinct cands") { println("  " + filt.count()) }
    val verified = filt
      .join(sets.select(col("id").as("id_a"), col("sh").as("sh_a")),
        "id_a")
      .join(sets.select(col("id").as("id_b"), col("sh").as("sh_b")),
        "id_b")
      .withColumn("n_inter",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("n_union",
        (size(col("sh_a")) + size(col("sh_b")) - col("n_inter"))
          .cast("long"))
      .filter(col("n_inter") * tDen >= col("n_union") * tNum)
    t("verify") { println("  pairs = " + verified.count()) }
    // library path, steady state (2nd run = the bench-comparable one)
    (1 to 2).foreach { i =>
      t(s"library pipeline run $i") {
        val n = graft.dedup.Dedup.prefixFilterJoinPairs(
          docs, "text", "doc_id", 3, 4, 5).count()
        graft.CacheTracker.releaseAll(); n
      }
    }
    spark.stop()
  }
}
