package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch term-frequency estimation (Cormode &
  * Muthukrishnan 2005) — the mergeable fixed-size sketch for
  * heavy-hitter queries over corpora too large for an exact
  * vocabulary pass. Complements the exact top-k ([[graft.queries
  * Catalog]] d24) and HLL distinct (q22) rows: here the SKETCH is the
  * artifact — d·w counters regardless of vocabulary size — and the
  * estimate min_j cms[j][bucket_j(t)] upper-bounds the true count.
  *
  * Hashing is the same engine-portable family as
  * [[graft.dedup.Dedup.corpusOverlap]]: base h = 60-bit md5 mod p,
  * row j buckets via ((a_j·h + b_j) mod p) mod w with a_j/b_j derived
  * from md5("a:j"/"b:j") — exact integer math end-to-end, so a DuckDB
  * oracle rebuilds the identical sketch and estimates (no pinned
  * values; overestimation error is part of the verified output).
  *
  * Scale shape: one explode over tokens → d bucket ids per instance
  * (codegen transform, no second explode of the corpus) → groupBy
  * (row, bucket) count with map-side partial aggregation — the
  * exchange carries ≤ partitions·d·w rows and the result IS the
  * mergeable sketch (union of corpora = same groupBy over their
  * concatenation). Point queries join the d·w-row sketch broadcast.
  */
object CountMin {

  private val P = 1000000007L

  private def bucketCols(tok: Column, depth: Int, width: Int): Column =
    transform(sequence(lit(0), lit(depth - 1)), j => {
      // a_j/b_j are driver-side constants folded into the plan; the
      // per-row work is one md5 + depth multiply-mods
      val aLit = array((0 until depth).map(i =>
        lit(Text.portableHashLocal(s"a:$i") % (P - 1) + 1)): _*)
      val bLit = array((0 until depth).map(i =>
        lit(Text.portableHashLocal(s"b:$i") % P)): _*)
      pmod(pmod(element_at(aLit, j + 1) *
        pmod(Text.portableTokenHash(tok), lit(P)) +
        element_at(bLit, j + 1), lit(P)), lit(width))
    })

  /** Build the sketch: one row per (row j, bucket) with its counter.
    * `tokens` is a token-instance frame (one row per occurrence). */
  def sketch(tokens: DataFrame, tokCol: String,
             depth: Int = 4, width: Int = 1024): DataFrame =
    tokens
      .select(posexplode(bucketCols(col(tokCol), depth, width))
        .as(Seq("j", "b")))
      .groupBy("j", "b").agg(count(lit(1)).as("c"))

  /** Estimate counts for `terms`: min over the d sketch rows. The
    * sketch side is d·w rows — always broadcast. */
  def estimate(sketch: DataFrame, terms: DataFrame, termCol: String,
               depth: Int = 4, width: Int = 1024): DataFrame =
    terms
      .select(col(termCol),
        posexplode(bucketCols(col(termCol), depth, width))
          .as(Seq("j", "b")))
      .join(broadcast(sketch), Seq("j", "b"))
      .groupBy(termCol).agg(min("c").as("est"))
}
