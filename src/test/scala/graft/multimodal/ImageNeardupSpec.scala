package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** mm06: the 4x16-bit aHash banding must find EVERY Hamming<=3 pair
  * (pigeonhole), verified against driver-side brute force over the
  * real decode->aHash pipeline. */
class ImageNeardupSpec extends SparkSpec {
  import spark.implicits._

  test("banding recall equals brute force at Hamming <= 3") {
    val dir = java.nio.file.Files
      .createTempDirectory("mm06spec").toString
    (0L until 40L).toDF("doc_id")
      .withColumn("text", lit("placeholder"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.queries.Catalog.all
      .find(_.name == "mm06_image_neardup").get
      .run(spark, dir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    graft.CacheTracker.releaseAll()

    val media = Multimodal.syntheticPngMedia(
      (0L until 40L).toDF("doc_id"))(spark)
    val hashes = Multimodal.imageAHash(media)(spark)
      .select("media_id", "ahash_bits")
      .as[(Long, String)].collect().toSeq
    val want = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes if ia < ib
      ham = ha.zip(hb).count { case (x, y) => x != y }
      if ham <= 3
    } yield (ia, ib)).toSet
    assert(got === want)
    assert(want.nonEmpty) // synthetic images really do cluster
  }

  test("imageAHashN(8,8) is bit-identical to imageAHash") {
    val media = Multimodal.syntheticPngMedia(
      (0L until 20L).toDF("doc_id"))(spark)
    val a = Multimodal.imageAHash(media)(spark)
      .select("media_id", "ahash_bits").as[(Long, String)]
      .collect().toMap
    val b = Multimodal.imageAHashN(media, 8, 8)(spark)
      .select("media_id", "ahash_bits").as[(Long, String)]
      .collect().toMap
    assert(a === b)
  }

  test("256-bit banding recall equals brute force at Hamming <= 3") {
    // the corpus-scale grid: same pigeonhole recall contract as the
    // 8x8 form, verified against driver-side brute force over the
    // real decode -> 16x16 aHash pipeline
    val media = Multimodal.syntheticPngMedia(
      (0L until 40L).toDF("doc_id"))(spark)
    val got = Multimodal.imageNeardupPairs(
      media, maxHamming = 3, gridW = 16, gridH = 16)(spark)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    graft.CacheTracker.releaseAll()
    val hashes = Multimodal.imageAHashN(media, 16, 16)(spark)
      .select("media_id", "ahash_bits")
      .as[(Long, String)].collect().toSeq
    val want = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes if ia < ib
      ham = ha.zip(hb).count { case (x, y) => x != y }
      if ham <= 3
    } yield (ia, ib)).toSet
    assert(got === want)
  }
}
