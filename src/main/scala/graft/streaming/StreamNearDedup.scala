package graft.streaming

import graft.CacheTracker
import graft.dedup.Dedup
import graft.functions.Text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming INCREMENTAL near-dup: every micro-batch is probed
  * against the corpus's persisted shingle-set side table with the
  * d44 asymmetric MinHash-LSH construction, then appended to that
  * side table — near-duplicate detection that never re-pairs the
  * corpus with itself, as a continuously-running ingest.
  *
  * Layout: both outputs are partitioned by `batch_id` and written
  * with DYNAMIC partition overwrite, so a replayed micro-batch
  * (post-crash foreachBatch redelivery) overwrites its own partition
  * instead of duplicating rows — the same replay-idempotence
  * contract StreamIngest's merge proves, without a table-wide
  * rewrite. The side table stores (id, sh): per-doc shingle sets,
  * i.e. the verification payload; band keys are derived per probe
  * (cheap, codegen) — at larger scale the band table is ALSO
  * persisted ([[graft.dedup.Dedup.writeBandSideTable]], partitioned
  * by [[graft.dedup.Dedup.bandBucket]]) and the probe switches to
  * [[graft.dedup.Dedup.minhashLshProbeBands]] with
  * `bandBuckets = Some(n)`, making the corpus-side read
  * bucket-pruned like the q21 posting layout (measured d44d).
  *
  * Wire into a stream exactly like [[StreamIngest]]:
  * `readStream...foreachBatch((b, id) => probeAndAppend(spark, b, id, …))`.
  */
object StreamNearDedup {

  /** One micro-batch: emit (new_id, old_id, n_inter, n_union,
    * batch_id) pairs to `pairsDir`, then register the batch's
    * shingle sets in `sideDir`. Both writes are per-batch-partition
    * overwrites → replay-idempotent (same input ⇒ same pairs ⇒ the
    * replay rewrites its partition byte-equivalent; a batch with
    * ZERO pairs touches no pairs partition at all — the pairs table
    * may not exist until the first duplicate arrives, so readers
    * supply the schema). Returns the batch's pair count (the
    * foreachBatch progress metric). */
  def probeAndAppend(spark: SparkSession, batch: DataFrame,
                     batchId: Long, sideDir: String, pairsDir: String,
                     textCol: String = "text", idCol: String = "doc_id",
                     shingleN: Int = 3, k: Int = 32, bands: Int = 8,
                     threshold: Double = 0.5, seed: Long = 42L): Long = {
    try {
      val deltaSets = CacheTracker.persistTracked(batch
        .select(col(idCol).as("id"),
          Text.tokens(col(textCol)).as("toks"))
        .select(col("id"),
          Text.wordShingles(col("toks"), shingleN).as("sh")))
      val sidePath = new org.apache.hadoop.fs.Path(sideDir)
      val fs = sidePath.getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      // "has a side table" = has DATA, not just a directory: an EMPTY
      // first batch leaves sideDir holding only _SUCCESS (dynamic
      // overwrite writes no partition), and a schema-less read of
      // that would throw "Unable to infer schema" and wedge the
      // stream on every subsequent batch (the StreamIngest hasData
      // pattern)
      val hasSide = fs.exists(sidePath) &&
        fs.listStatus(sidePath).exists { st =>
          val nm = st.getPath.getName
          !nm.startsWith("_") && !nm.startsWith(".")
        }
      // a replayed batch must not probe against its OWN first-run
      // signatures (every doc would "near-dup" itself) — exclude the
      // batch's partition from the corpus side
      val corpusSets =
        if (hasSide)
          spark.read.parquet(sideDir)
            .filter(col("batch_id") =!= batchId)
            .select("id", "sh")
        else deltaSets.filter(lit(false))
      val pairs = CacheTracker.persistTracked(
        Dedup.minhashLshProbeSets(corpusSets, deltaSets,
          k, bands, threshold, seed))
      // dynamic overwrite as a PER-WRITE option, not session conf:
      // under foreachBatch these frames are bound to the query's
      // CLONED session (conf copied at query start), so a setting on
      // the caller's session never reaches them — static overwrite
      // would silently replace the whole table every batch (the
      // StreamIngest per-write pattern)
      pairs.withColumn("batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(pairsDir)
      deltaSets.withColumn("batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(sideDir)
      pairs.count()
    } finally {
      CacheTracker.releaseAll()
    }
  }
}
