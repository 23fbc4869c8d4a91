package graft.dedup

import graft.functions.Text
import graft.state.Merge
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline
  * (SURVEY.md §7.5): exact, MinHash-LSH, SimHash, n-gram Jaccard.
  *
  * Scale design: every variant reduces to (a) a per-row codegen'd
  * signature, then (b) ONE equi-shuffle on a compact key (fingerprint /
  * band key / simhash prefix) — never an all-pairs comparison. The
  * candidate verification joins carry only (id, signature), not the
  * document text, so shuffle volume is O(rows × sig), not O(corpus).
  */
object Dedup {

  /** Exact dedup on normalized content: keep the lowest-id row per
    * fingerprint. One hash-shuffle on a 128-bit key. */
  def exact(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    Merge.firstPerKey(
      docs.withColumn("fp", Text.fingerprint(col(textCol))),
      Seq("fp"), col(idCol))

  /** Exact-dup groups: fingerprint → member count + surviving id.
    * The groupBy gets map-side partial aggregation for free. */
  def exactGroups(docs: DataFrame, textCol: String,
                  idCol: String): DataFrame =
    docs.withColumn("fp", Text.fingerprint(col(textCol)))
      .groupBy("fp")
      .agg(count(lit(1)).as("n_dups"), min(col(idCol)).as("keep_id"))

  /** MinHash+LSH near-dup candidate pairs, verified by exact Jaccard
    * on shingle sets.
    *
    * shingle → minhash sig (k hashes) → band keys (b bands) →
    * self-equi-join on (band, key) → jaccard ≥ threshold.
    *
    * The self-join shuffles only (id, band-key, shingles); band keys
    * partition uniformly (they're hashes), and `hash < hash` halves
    * the pair space. At 100 TB the shingle arrays would be replaced by
    * a second verification pass joining text by id — structure
    * unchanged.
    */
  def minhashLshPairs(docs: DataFrame, textCol: String, idCol: String,
                      shingleN: Int = 3, k: Int = 32, bands: Int = 8,
                      threshold: Double = 0.5,
                      seed: Long = 42L): DataFrame = {
    val rowsPerBand = k / bands
    val sh = docs.select(
      col(idCol).as("id"),
      Text.wordShingles(Text.tokens(col(textCol)), shingleN).as("sh"))
    val banded = sh
      .withColumn("sig", Text.minhashSig(col("sh"), k, seed))
      .select(col("id"), col("sh"),
        explode(Text.lshBandKeys(col("sig"), bands, rowsPerBand)).as("bk"))
      .select(col("id"), col("sh"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val a = banded.select(col("band"), col("key"),
      col("id").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("key"),
      col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Text.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .groupBy("id_a", "id_b")              // same pair can share >1 band
      .agg(max("jaccard").as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash near-dup pairs: 64-bit signature, candidates = equal
    * 16-bit sub-bands (any of 4), verified by Hamming distance ≤
    * `maxHamming` (standard Charikar/Manku block-permuted scheme —
    * any pair within Hamming 3 must share one of 4 bands). */
  def simhashPairs(docs: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val sigd = docs.select(col(idCol).as("id"),
      Text.simhash64(Text.tokens(col(textCol))).as("sig"))
    val banded = sigd.select(col("id"), col("sig"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("sig"), b * 16).bitwiseAND(0xFFFF).as("key"))
      }: _*)).as("bk"))
      .select(col("id"), col("sig"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val a = banded.select(col("band"), col("key"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("key"),
      col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(first(Text.hamming64(col("sig_a"), col("sig_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact Jaccard of every document against one anchor document —
    * the O(n) similarity scan (anchor shingle set is a plan literal →
    * broadcast; single codegen'd pass, no shuffle). */
  def jaccardToAnchor(docs: DataFrame, textCol: String, idCol: String,
                      anchorShingles: Seq[String], shingleN: Int,
                      simName: String = "jaccard"): DataFrame = {
    val anchor = array(anchorShingles.map(lit): _*)
    docs.withColumn(simName,
      Text.jaccard(
        Text.wordShingles(Text.tokens(col(textCol)), shingleN), anchor))
  }
}
