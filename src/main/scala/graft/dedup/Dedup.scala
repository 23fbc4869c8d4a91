package graft.dedup

import graft.CacheTracker
import graft.functions.{SigExprs, Text}
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
    // Materialize the shingle sets once: they feed the signature AND
    // both sides of the verification join. At 100 TB this is the
    // persisted signature/shingle side table; here a tracked lazy
    // persist plays that role (re-read 3×, computed 1×; released by
    // the harness via CacheTracker.releaseAll).
    val sh = CacheTracker.persistTracked(docs
      .select(col(idCol).as("id"), Text.tokens(col(textCol)).as("toks"))
      .select(col("id"),
        Text.wordShingles(col("toks"), shingleN).as("sh")))
    // Banding rows carry ONLY (id, band, key) — the candidate shuffle
    // moves 24 bytes/row, never the shingle arrays.
    val banded = CacheTracker.persistTracked(sh
      .withColumn("hashes", transform(col("sh"), s => xxhash64(s)))
      // native codegen signature (one loop, all k mins) — the composed
      // k×array_min formulation cost k array passes per row
      .withColumn("sig",
        SigExprs.minhashSigFromHashes(col("hashes"), k, seed))
      .select(col("id"),
        explode(Text.lshBandKeys(col("sig"), bands, rowsPerBand))
          .as("bk"))
      .select(col("id"), col("bk.band").as("band"),
        col("bk.key").as("key")))
    val cand = banded.select(col("band"), col("key"),
        col("id").as("id_a"))
      .join(banded.select(col("band"), col("key"), col("id").as("id_b")),
        Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()                          // same pair can share >1 band
    // Verification joins pull shingles back by id — two hash joins on
    // the (small) candidate set, not an array-weighted shuffle.
    // n_inter/n_union ride along as exact integers: the oracle check
    // compares THEM (float division is engine-rounding-sensitive; the
    // set sizes are not — the d05 lesson).
    val verified = cand
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("__da", array_distinct(col("sh_a")))
      .withColumn("__db", array_distinct(col("sh_b")))
      .withColumn("n_inter",
        size(array_intersect(col("__da"), col("__db"))).cast("long"))
      .withColumn("n_union",
        (size(col("__da")) + size(col("__db")) - col("n_inter"))
          .cast("long"))
      .select(col("id_a"), col("id_b"), col("n_inter"), col("n_union"),
        when(col("n_union") === 0, lit(0.0))
          .otherwise(col("n_inter").cast("double") / col("n_union"))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
    verified
  }

  /** SimHash near-dup pairs: 64-bit signature, candidates = equal
    * 16-bit sub-bands (any of 4), verified by Hamming distance ≤
    * `maxHamming` (standard Charikar/Manku block-permuted scheme —
    * any pair within Hamming 3 must share one of 4 bands, so recall
    * is GUARANTEED by pigeonhole, not probabilistic).
    *
    * `tokenHash` picks the per-token hash feeding the signature:
    * xxhash64 (default — cheapest, engine-specific) or
    * [[Text.portableTokenHash]] (md5-derived, reproducible in any
    * engine — the oracle-verified catalog configuration). */
  def simhashPairs(docs: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 3,
                   tokenHash: Column => Column = xxhash64(_)): DataFrame = {
    val sigd = CacheTracker.persistTracked(docs
      .select(col(idCol).as("id"), Text.tokens(col(textCol)).as("toks"))
      .withColumn("hashes", transform(col("toks"), t => tokenHash(t)))
      .select(col("id"),
        Text.simhash64Fast(col("hashes")).as("sig")))
    // ^ signature table: computed once, read by both self-join
    //   branches (the materialized index at scale)
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
    val verified = a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(first(Text.hamming64(col("sig_a"), col("sig_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
    verified
  }

  /** Near-dup CLUSTERS from verified pair output: connected
    * components by iterative min-label propagation ("HashMin" CC —
    * each round every node adopts the smallest label among itself and
    * its neighbors; fixpoint in O(component diameter) rounds).
    * Returns (id, cluster) with cluster = the component's minimum id,
    * i.e. the canonical survivor — `filter(id === cluster)` keeps one
    * doc per near-dup cluster.
    *
    * Scale shape: every iteration is one equi-shuffle of the EDGE
    * set (near-dup pairs only — a tiny fraction of the corpus), never
    * the documents; near-dup components are shallow (dup clusters are
    * cliques-ish), so 2-3 rounds converge. Driver coordinates the
    * fixpoint exactly like gateEvents — iteration counts are
    * data-bounded, not table-bounded. */
  def neardupClusters(pairs: DataFrame, idA: String = "id_a",
                      idB: String = "id_b"): DataFrame = {
    val edges = CacheTracker.persistTracked(
      pairs.select(col(idA).as("src"), col(idB).as("dst"))
        .unionByName(pairs.select(col(idB).as("src"),
          col(idA).as("dst")))
        .distinct())
    var labels = CacheTracker.persistTracked(
      edges.select(col("src").as("id")).distinct()
        .withColumn("cluster", col("id")))
    var converged = false
    while (!converged) {
      val neighborMin = edges
        .join(labels.select(col("id").as("dst"),
          col("cluster").as("ncl")), "dst")
        .groupBy(col("src").as("id"))
        .agg(min("ncl").as("nmin"))
      val next = CacheTracker.persistTracked(
        labels.join(neighborMin, Seq("id"), "left")
          .select(col("id"),
            least(col("cluster"), coalesce(col("nmin"), col("cluster")))
              .as("cluster")))
      converged = next.join(labels.withColumnRenamed("cluster", "old"),
        Seq("id"))
        .filter(col("cluster") < col("old")).isEmpty
      labels = next
    }
    labels
  }

  /** Exact Jaccard of every document against one anchor document —
    * the O(n) similarity scan (anchor shingle set is a plan literal →
    * broadcast; single codegen'd pass, no shuffle). */
  def jaccardToAnchor(docs: DataFrame, textCol: String, idCol: String,
                      anchorShingles: Seq[String], shingleN: Int,
                      simName: String = "jaccard"): DataFrame =
    docs.withColumn("__toks", Text.tokens(col(textCol)))
      .withColumn("__sh", Text.wordShingles(col("__toks"), shingleN))
      // native single-pass overlap vs the plan-carried anchor set,
      // MATERIALIZED as a column before deriving the ratio — a
      // CaseWhen referencing the struct three times would re-run the
      // traversal per reference (CSE doesn't reach into branches)
      .withColumn("__o", SigExprs.anchorOverlap(col("__sh"), anchorShingles))
      .withColumn(simName,
        when(col("__o.n_union") === 0, lit(0.0))
          .otherwise(col("__o.n_inter").cast("double") /
            col("__o.n_union")))
      .drop("__toks", "__sh", "__o")
}
