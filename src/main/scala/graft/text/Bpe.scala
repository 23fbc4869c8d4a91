package graft.text

import graft.functions.{BpeEncode, Text}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair encoding: learn merges, apply at scale.
  *
  * Learning follows the published subword-nmt procedure (Sennrich et
  * al. 2016): merges are learned over the WORD-FREQUENCY DICTIONARY,
  * not the raw corpus — so the distributed part is exactly ONE
  * explode + groupBy (the d24 vocab aggregate), and the n-merge
  * iteration runs driver-side over that (corpus-size-independent)
  * dictionary. At 100 TB the vocab aggregate is the same shuffle d24
  * already pays; capping at `maxVocab` head words bounds driver
  * memory while covering effectively all token mass (Zipf).
  *
  * Applying is [[graft.functions.BpeEncode]] — a plan-literal merge
  * table, embarrassingly parallel, memoized per executor.
  */
object Bpe {

  /** Learn `n` merges from the corpus' word dictionary.
    * Deterministic: pair ties break lexicographically. */
  def learnMerges(docs: DataFrame, textCol: String, n: Int,
                  maxVocab: Int = 100000): Seq[(String, String)] = {
    val vocab = docs
      .withColumn("__toks", Text.tokens(col(textCol)))
      .select(explode(col("__toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(maxVocab)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    var words: Array[(Array[String], Long)] =
      vocab.map { case (w, c) => (w.map(_.toString).toArray, c) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (merges.size < n && !exhausted) {
      val counts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      for ((syms, c) <- words; i <- 0 until syms.length - 1)
        counts.updateWith((syms(i), syms(i + 1)))(
          o => Some(o.getOrElse(0L) + c))
      if (counts.isEmpty) exhausted = true
      else {
        val best = counts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.map { case (syms, c) =>
          val out = Array.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 &&
                syms(j) == best._1 && syms(j + 1) == best._2) {
              out += syms(j) + syms(j + 1); j += 2
            } else { out += syms(j); j += 1 }
          }
          (out.result(), c)
        }
      }
    }
    merges.toSeq
  }

  /** Per-document BPE token count under a learned merge list — the
    * budget column training-mix construction keys on. */
  def tokenCount(text: Column, merges: Seq[(String, String)]): Column =
    size(BpeEncode.bpeEncode(Text.tokens(text), merges)).cast("long")
}
