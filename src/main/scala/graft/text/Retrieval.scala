package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval — combining a lexical ranking
  * (BM25, [[Bm25]]) with a dense ranking (cosine ANN,
  * [[graft.functions.Vectors]]) into one result list, the standard
  * RAG-serving read path a training/serving pipeline needs next to
  * the reference's searchFeed (reference
  * /root/reference/src/modules/api/resolvers/index.ts searchFeed is
  * lexical-only; fusion is the §7.5-style extension).
  *
  * Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
  *
  *   rrf(d) = Σ_r 1 / (k0 + rank_r(d))   over rankings containing d
  *
  * Scale shape: the inputs are ALREADY-TRUNCATED top-n lists — each a
  * few dozen (id, rank) rows out of an arbitrarily large corpus — so
  * fusion is a union of slim bounded frames, one tiny hash aggregate,
  * and a TakeOrderedAndProject. All corpus-sized work stays inside
  * the upstream retrievers (which carry their own 100 TB designs:
  * inverted-index buckets for BM25, IVF/LSH for dense); fusion never
  * re-touches the corpus.
  *
  * Determinism: per-ranking min-ranks are pivoted into fixed columns
  * first and the RRF sum is a FIXED left-associated expression over
  * them (not a float `sum()` aggregate), so the score is the same
  * IEEE dag in any engine for any number of rankings — that is what
  * lets the catalog row hash-match a SQL oracle.
  */
object Retrieval {

  /** Fuse `rankings` — each a frame with (`idCol`, `rankCol`) where
    * rank is 1-based — into the RRF top-`k`. Output: `idCol`, one
    * `rank_i` column per input (null where absent), `rrf` rounded to
    * 6 (ranks are small integers, so 6 digits is far inside the
    * exactly-reproducible range). */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, k: Int,
              k0: Int = 60, rankCol: String = "rank"): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    val tagged = rankings.zipWithIndex.map { case (r, i) =>
      r.select(col(idCol), col(rankCol).cast("long").as("__rank"),
        lit(i).as("__src"))
    }.reduce(_ unionByName _)
    val pivoted = tagged.groupBy(col(idCol)).agg(
      min(when(col("__src") === 0, col("__rank"))).as("rank_0"),
      rankings.indices.drop(1).map(i =>
        min(when(col("__src") === i, col("__rank"))).as(s"rank_$i")): _*)
    val rrf = rankings.indices
      .map(i => coalesce(
        lit(1.0) / (lit(k0).cast("double") + col(s"rank_$i")),
        lit(0.0)))
      .reduce(_ + _) // fixed left-assoc IEEE dag, oracle-reproducible
    pivoted
      .withColumn("rrf", round(rrf, 6))
      .orderBy(col("rrf").desc, col(idCol).asc)
      .limit(k)
  }
}
