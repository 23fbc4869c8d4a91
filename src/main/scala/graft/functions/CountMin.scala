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
  * Scale shape: token instances → one vocab-sized count aggregate
  * (map-side combined) → d bucket ids per DISTINCT token (codegen,
  * one md5 per vocab entry) → groupBy (row, bucket) sum — the
  * exchanges carry ≤ partitions·vocab and ≤ partitions·d·w rows and
  * the result IS the mergeable sketch (union of corpora = same
  * aggregation over their concatenation). Point queries left-join
  * the d·w-row sketch broadcast (left: an empty bucket is true
  * count 0 and must participate in the min). */
object CountMin {

  private val P = 1000000007L

  /** Bucket ids for a token: h = 60-bit md5 mod p computed ONCE (a
    * lambda-free subexpression), then depth multiply-mods. Catalyst
    * does not CSE into HOF lambdas, so the transform lambda must not
    * contain the md5 — it references the hash through the lambda
    * argument of a single-element `transform`, which evaluates the
    * hash exactly once per row (the measured-20× corpusOverlap
    * lesson, solved the same way: keep the expensive hash outside
    * the per-slot lambda). */
  private def bucketCols(tok: Column, depth: Int, width: Int): Column = {
    val aLit = array((0 until depth).map(i =>
      lit(Text.portableHashLocal(s"a:$i") % (P - 1) + 1)): _*)
    val bLit = array((0 until depth).map(i =>
      lit(Text.portableHashLocal(s"b:$i") % P)): _*)
    flatten(transform(
      array(pmod(Text.portableTokenHash(tok), lit(P))), // 1 md5, here
      h => transform(sequence(lit(0), lit(depth - 1)), j =>
        pmod(pmod(element_at(aLit, j + 1) * h +
          element_at(bLit, j + 1), lit(P)), lit(width)))))
  }

  /** Build the sketch: one row per (row j, bucket) with its counter.
    * `tokens` is a token-instance frame (one row per occurrence);
    * instances are pre-aggregated to DISTINCT tokens first, so the
    * md5 family runs once per vocabulary entry, not once per
    * occurrence — on a 100 TB corpus the hash cost rides the
    * vocab-sized frame that the count shuffle produced anyway. */
  def sketch(tokens: DataFrame, tokCol: String,
             depth: Int = 4, width: Int = 1024): DataFrame =
    tokens.groupBy(tokCol).agg(count(lit(1)).as("__n"))
      .select(col("__n"),
        posexplode(bucketCols(col(tokCol), depth, width))
          .as(Seq("j", "b")))
      .groupBy("j", "b").agg(sum("__n").as("c"))

  /** Estimate counts for `terms`: min over the d sketch rows. The
    * sketch side is d·w rows — always broadcast. LEFT join +
    * coalesce-to-0: a term whose row-j bucket is EMPTY has true count
    * 0 and the CMS bound requires that empty bucket to participate in
    * the min (an inner join would silently drop it and report a
    * collision count — an overestimate the sketch's guarantee
    * forbids; absent terms must report est = 0, not vanish). */
  def estimate(sketch: DataFrame, terms: DataFrame, termCol: String,
               depth: Int = 4, width: Int = 1024): DataFrame =
    terms
      .select(col(termCol),
        posexplode(bucketCols(col(termCol), depth, width))
          .as(Seq("j", "b")))
      .join(broadcast(sketch), Seq("j", "b"), "left")
      .groupBy(termCol).agg(min(coalesce(col("c"), lit(0L))).as("est"))
}
