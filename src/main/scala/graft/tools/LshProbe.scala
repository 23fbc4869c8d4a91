package graft.tools

import graft.functions.Text
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: where does minhash-LSH time go at sf0.1? */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val toks = docs.select(col("doc_id").as("id"),
      Text.tokens(col("text")).as("toks"))
    time("tokens only")(toks.count())
    val sh = toks.select(col("id"),
      Text.wordShingles(col("toks"), 3).as("sh")).persist()
    time("shingles (materialized toks)")(sh.count())
    val hashed = sh.withColumn("hashes",
      transform(col("sh"), s => xxhash64(s)))
    time("hashes")(hashed.count())
    val bandedSlow = hashed.select(col("id"),
      explode(Text.lshBandKeys(
        Text.minhashSigFromHashes(col("hashes"), 32, 42L), 8, 4))
        .as("bk"))
      .select(col("id"), col("bk.band").as("band"),
        col("bk.key").as("key"))
    time("banded, composed 32×array_min sig")(bandedSlow.count())
    val banded = hashed.select(col("id"),
      explode(Text.lshBandKeys(
        graft.functions.SigExprs.minhashSigFromHashes(
          col("hashes"), 32, 42L), 8, 4))
        .as("bk"))
      .select(col("id"), col("bk.band").as("band"),
        col("bk.key").as("key")).persist()
    time("banded, native MinHashSig")(banded.count())

    time("full minhashLshPairs")(
      println("pairs=" + graft.dedup.Dedup.minhashLshPairs(
        docs, "text", "doc_id", threshold = 0.2).count()))
    time("full simhashPairs")(
      println("pairs=" + graft.dedup.Dedup.simhashPairs(
        docs, "text", "doc_id").count()))
    spark.stop()
  }
}
