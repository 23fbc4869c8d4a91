package graft.text

import graft.CacheTracker
import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data-selection importance weights (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"):
  * score every raw document by the log-likelihood RATIO of its
  * hashed-unigram features under a target-domain LM vs the raw-corpus
  * LM, so resampling by the weight shifts the corpus mixture toward
  * the target distribution. This is the distribution-MATCHING
  * selector — d29's stratum equalizer balances known labels, this
  * learns what "looks like the target" from content alone.
  *
  *   w(d) = Σ_{t ∈ d} [ ln P̂_tgt(b(t)) − ln P̂_raw(b(t)) ]
  *   P̂(b)  = (cf(b) + 1) / (N + B)        (add-one smoothing)
  *   b(t)  = portable 60-bit md5 hash of the token, mod B
  *
  * Hashed features are the published design and ALSO the scale
  * design: both LMs live in a fixed B-row table (B = 4096 here)
  * regardless of corpus size, so the per-token lookup is a broadcast
  * join — the only corpus-sized shuffles are the one bucket-keyed
  * count (map-side combined) and the final doc-keyed sum. Raw-LM
  * counts come from the full input, so every bucket a document can
  * produce exists in the table (inner broadcast join is total).
  *
  * Determinism: same integer micro-nat quantization as
  * [[UnigramLm]] — the per-BUCKET log-ratio is rounded to a long
  * once, per-doc aggregation is exact integer addition, and the md5
  * bucket hash reproduces bit-for-bit in the SQL oracle. */
object Dsir {

  def importanceWeights(docs: DataFrame, textCol: String, idCol: String,
                        targetPred: Column, buckets: Int = 4096): DataFrame = {
    val b = lit(buckets.toLong)
    val toks = CacheTracker.persistTracked(
      docs.select(col(idCol).as("id"), targetPred.as("__tgt"),
        explode(Text.tokens(col(textCol))).as("tok"))
        .withColumn("bucket", pmod(Text.portableTokenHash(col("tok")), b)))
    // one pass counts both LMs: raw = everything, target = the
    // predicate's subset (conditional sum, map-side combined)
    val cf = toks.groupBy("bucket").agg(
      count(lit(1)).cast("long").as("cf_raw"),
      sum(when(col("__tgt"), 1L).otherwise(0L)).cast("long").as("cf_tgt"))
    val totals = cf.agg(sum("cf_raw").cast("long").as("n_raw"),
      sum("cf_tgt").cast("long").as("n_tgt"))
    // fixed-size (≤ B rows) ratio table — broadcast at any corpus size
    val ratio = cf.crossJoin(broadcast(totals))
      .withColumn("lr_micro", round(lit(1e6) *
        (log(col("cf_tgt").cast("double") + lit(1.0))
          - log(col("n_tgt").cast("double") + b.cast("double"))
          - log(col("cf_raw").cast("double") + lit(1.0))
          + log(col("n_raw").cast("double") + b.cast("double"))))
        .cast("long"))
      .select("bucket", "lr_micro")
    toks.join(broadcast(ratio), "bucket")
      .groupBy("id")
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        sum("lr_micro").cast("long").as("w_micro"))
      .withColumn("avg_lr",
        col("w_micro") / lit(1e6) / col("n_tokens"))
      .withColumnRenamed("id", idCol)
  }
}
