package graft.text

import graft.CacheTracker
import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Collocation mining by pointwise mutual information (Church & Hanks
  * 1990) — the corpus-statistics pass that surfaces multi-word
  * expressions ("new york", "machine learning") for tokenizer vocab
  * construction, stop-phrase lists, and boilerplate discovery in a
  * training-data pipeline.
  *
  *   PMI(w1,w2) = ln( p(w1,w2) / (p(w1)·p(w2)) )
  *              = ln( c12 · NU² / (NB · c1 · c2) )
  *
  * with c12 = bigram count, NB = total bigram instances, c1/c2 =
  * unigram counts, NU = total token instances.
  *
  * Determinism: the ratio is evaluated in ONE fixed left-to-right
  * double expression (identical operation sequence in the DuckDB
  * oracle — integer counts are exact in double far past any test
  * scale) and quantized once to integer micro-nats; the top-k sort
  * carries the bigram string as tie-break.
  *
  * Scale shape at 100 TB: two token-keyed count shuffles (bigram +
  * unigram tables, both Zipf-small vs the corpus), two equi-joins of
  * the bigram table against unigram counts (on w1, then w2), one
  * global top-k = TakeOrderedAndProject (never a full sort). The
  * min-count filter is applied BEFORE the joins, so the joined side
  * is the interesting tail only. */
object Collocations {

  /** Top-`k` collocations with count ≥ `minCount`:
    * (bigram, c12, pmi_micro), ordered by PMI desc, bigram asc. */
  def pmiTopK(docs: DataFrame, textCol: String, minCount: Int,
              k: Int): DataFrame = {
    val base = CacheTracker.persistTracked(
      docs.select(Text.tokens(col(textCol)).as("toks")))
    val uni = CacheTracker.persistTracked(
      base.select(explode(col("toks")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).cast("long").as("c")))
    val bi = CacheTracker.persistTracked(
      base.select(explode(Text.wordShingles(col("toks"), 2)).as("bg"))
        .groupBy("bg").agg(count(lit(1)).cast("long").as("c12")))
    val nu = uni.agg(sum("c").cast("long").as("nu"))
    val nb = bi.agg(sum("c12").cast("long").as("nb"))
    bi.filter(col("c12") >= minCount)
      .withColumn("__w1", substring_index(col("bg"), " ", 1))
      .withColumn("__w2", substring_index(col("bg"), " ", -1))
      .join(uni.select(col("tok").as("__w1"), col("c").as("c1")), "__w1")
      .join(uni.select(col("tok").as("__w2"), col("c").as("c2")), "__w2")
      .crossJoin(broadcast(nu))
      .crossJoin(broadcast(nb))
      .withColumn("pmi_micro",
        round(lit(1e6) * log(
          col("c12").cast("double") * col("nu") * col("nu") /
            col("nb") / col("c1") / col("c2"))).cast("long"))
      .select(col("bg").as("bigram"), col("c12"), col("pmi_micro"))
      .orderBy(col("pmi_micro").desc, col("bigram"))
      .limit(k)
  }
}
