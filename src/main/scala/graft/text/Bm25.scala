package graft.text

import graft.CacheTracker
import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval (Okapi BM25, Robertson et al.) — the scoring
  * upgrade over the reference's raw term-frequency searchFeed rank
  * (`/root/reference/src/modules/api/resolvers/index.ts` searchFeed;
  * our q06/q21 keep that contract). Disjunctive: any matching term
  * contributes; docs matching no term are dropped.
  *
  *   score(d) = Σ_t idf(t) · tf·(1+k1) / (tf + k1·(1 − b + b·len/avgdl))
  *   idf(t)   = ln(1 + (N − df + 0.5) / (df + 0.5))
  *
  * Shape at 100 TB: ONE tokenize scan projects each doc down to
  * (id, len, tf per term) — pure codegen, no explode, no shuffle.
  * Corpus stats (N, avgdl, per-term df) are a single-row aggregate of
  * that slim projection, broadcast back via cross join (in a serving
  * deployment these are index-maintenance constants — recomputing
  * per query is the honest batch form). Final ranking is a
  * TakeOrderedAndProject, never a global sort. The per-doc frame is
  * cached because both the stats pass and the scoring pass read it.
  *
  * Double math note: len/tf/df/N are integer-valued doubles, so both
  * aggregation passes are order-independent-exact and the score is a
  * fixed dag of IEEE ops — the DuckDB oracle reproduces it bit-for-bit
  * (modulo a ≤1-ulp ln() libm gap, absorbed by round(·,4)).
  */
object Bm25 {

  def score(docs: DataFrame, textCol: Column, terms: Seq[String], k: Int,
            idCol: String = "doc_id", k1: Double = 1.2,
            b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "BM25 needs at least one query term")
    val base = docs
      .withColumn("__t", Text.tokens(textCol))
      .select(
        Seq(col(idCol), size(col("__t")).cast("double").as("__len")) ++
          terms.zipWithIndex.map { case (t, i) =>
            size(filter(col("__t"), x => x === lit(t)))
              .cast("double").as(s"__tf$i")
          }: _*)
    val perDoc = CacheTracker.persistTracked(base)

    val stats = perDoc.agg(
      count(lit(1)).cast("double").as("__n"),
      avg(col("__len")).as("__avgdl") +:
        terms.indices.map(i =>
          count(when(col(s"__tf$i") > 0, 1)).cast("double")
            .as(s"__df$i")): _*)

    // Same textual op order as the oracle SQL: left-assoc products,
    // (1 + k1), (1 - b + b*len/avgdl) — identical IEEE dags.
    def termScore(i: Int): Column = {
      val tf = col(s"__tf$i")
      val idf = log(lit(1.0) +
        (col("__n") - col(s"__df$i") + 0.5) / (col(s"__df$i") + 0.5))
      idf * tf * (lit(1.0) + lit(k1)) /
        (tf + lit(k1) *
          (lit(1.0) - lit(b) + lit(b) * col("__len") / col("__avgdl")))
    }

    perDoc.crossJoin(broadcast(stats))
      .filter(terms.indices.map(i => col(s"__tf$i") > 0).reduce(_ || _))
      .select(col(idCol),
        round(terms.indices.map(termScore).reduce(_ + _), 4).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }
}
