package graft.text

import graft.functions.Text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch-built inverted index — the scale path for text search
  * (SURVEY.md §7.4; replaces Mongo's `$text` index, reference
  * src/services/db.ts:61-63).
  *
  * The index is an ordinary table of posting rows (term, id, tf).
  * Written out partitioned/bucketed by `term`, a query touches only
  * the partitions of its query terms — the 100 TB search cost is
  * O(posting lists hit), not O(corpus), while the brute-force scan
  * (Feeds.search) stays the fallback for un-indexed columns.
  *
  * Contract matches Feeds.search exactly: conjunctive token match,
  * score = Σ term frequency — so both paths verify against the same
  * oracle.
  */
object InvertedIndex {

  /** docs → posting rows (term, id, tf). One explode + one partial-
    * aggregated groupBy; at scale, write .bucketBy(term) so search
    * lookups are shuffle-free.
    *
    * `stem = true` builds a STEMMED index (Porter, one native codegen
    * pass at tokenize time — no plan change): the Mongo-$text parity
    * mode where "running" and "run" share a posting list. Query it
    * with the same flag on [[search]]; mixing modes silently misses
    * (the flags must travel together, like an analyzer setting). */
  def build(docs: DataFrame, textCol: String, idCol: String,
            stem: Boolean = false): DataFrame = {
    val toks0 = Text.tokens(col(textCol))
    val toks =
      if (stem) graft.functions.PorterStem.stemTokens(toks0) else toks0
    docs
      .select(col(idCol).as("id"), toks.as("toks"))
      .select(col("id"), explode(col("toks")).as("term"))
      .groupBy("term", "id")
      .agg(count(lit(1)).as("tf"))
  }

  /** Persist the posting table BUCKETED by term — the real scale
    * layout the build-side scaladoc promises. Bucket pruning turns a
    * term-equality/IN search into a scan of only the matching
    * buckets' files (`SelectedBucketsCount: k of n` in the plan), and
    * `sortBy(term, id)` clusters each term's postings inside its
    * bucket for row-group skipping. `path` makes it an external
    * table, so the data lives where the caller says, not in the
    * session warehouse.
    *
    * NB for readers: set
    * `spark.sql.sources.bucketing.autoBucketedScan.enabled=false`
    * on the search session — the planner otherwise drops the
    * bucketed layout because a term lookup avoids no shuffle, which
    * also forfeits bucket PRUNING, the actual benefit here
    * (`SelectedBucketsCount` disappears from the scan). */
  def writeBucketed(index: DataFrame, table: String, path: String,
                    buckets: Int = 64): Unit =
    index.write.mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, "term")
      .sortBy("term", "id")
      .saveAsTable(table)

  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Search over the index: k term-partition lookups → per-doc
    * term-coverage count + tf sum → top-k. `requireAll = false` is
    * the Mongo-$text-parity any-term mode (same contract switch as
    * Feeds.search). */
  def search(index: DataFrame, terms: Seq[String], k: Int,
             requireAll: Boolean = true,
             stem: Boolean = false): DataFrame = {
    require(terms.nonEmpty, "search needs at least one term")
    // stem the QUERY terms with the same stemmer a stem-built index
    // applied to the corpus (set the flag on both sides or neither)
    val uniq0 = terms.map(_.toLowerCase).distinct
    val uniq =
      if (stem) uniq0.map(graft.functions.PorterStem.stem).distinct
      else uniq0
    val idx = index
      .filter(col("term").isin(uniq: _*))   // partition-prunable
      .groupBy("id")
      .agg(count(lit(1)).as("nt"), sum("tf").as("score"))
    (if (requireAll) idx.filter(col("nt") === uniq.size) else idx)
      .select(col("id"), col("score").cast("long").as("score"))
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
  }

  /** docs → POSITIONAL posting rows (term, id, pos) — the index
    * layout phrase and proximity queries need (term-frequency
    * postings can only answer bag-of-words queries). Same
    * `writeBucketed` layout applies: bucketed by term, a phrase
    * query scans only its terms' buckets. */
  def buildPositional(docs: DataFrame, textCol: String,
                      idCol: String): DataFrame =
    docs
      .select(col(idCol).as("id"), Text.tokens(col(textCol)).as("toks"))
      .select(col("id"), posexplode(col("toks")).as(Seq("pos", "term")))

  /** Exact phrase search: documents containing `phrase`'s tokens at
    * CONSECUTIVE positions, with the match count per doc.
    *
    * Plan shape: the positional index is filtered to the phrase's
    * terms (bucket-prunable), then each term's posting list joins the
    * FIRST term's on (id, pos − offset) — w-1 equi-joins on (id,
    * bigint), each side already restricted to one posting list. That
    * is the classic positional-intersection algorithm; cost is
    * O(Σ posting lists of the phrase terms), not O(corpus), and the
    * joins shuffle only (id, pos) pairs. Repeated terms in the
    * phrase are handled naturally (each occurrence joins at its own
    * offset). */
  def phraseSearch(positional: DataFrame,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase needs at least one term")
    val terms = phrase.map(_.toLowerCase)
    val base = positional
      .filter(col("term").isin(terms.distinct: _*))  // bucket-prunable
    val head = base.filter(col("term") === terms.head)
      .select(col("id"), col("pos").as("p0"))
    val matches = terms.zipWithIndex.tail.foldLeft(head) {
      case (acc, (t, i)) =>
        acc.join(
          base.filter(col("term") === t)
            .select(col("id"), (col("pos") - i).as("p0")),
          Seq("id", "p0"))
    }
    matches.groupBy("id")
      .agg(count(lit(1)).cast("long").as("n_matches"))
  }
}
