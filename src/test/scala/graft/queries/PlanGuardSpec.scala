package graft.queries

import graft.SparkSpec

/** Regression net for the expression-duplication trap family (see
  * BENCH_NOTES round-3 session 2): predicate pushdown and project
  * collapse can silently multiply an expensive dag — 2x through a
  * pushed filter, 16x through Generate inlining. Guard: the
  * tokenizer (`split(`) must appear EXACTLY ONCE in each guarded
  * row's physical plan.
  *
  * Scope: rows WITHOUT tracked persists only — InMemoryRelation
  * prints its cached child plan at every reference, so marker counts
  * over `executedPlan.toString` are print-inflated for cached rows
  * (execution still computes the cache once). Rows tokenizing via
  * other primitives (regexp_extract_all, BPE regex) have no split()
  * marker and are out of scope. This spec found a real 3x in d40
  * (filter + heap key + output each carried the dag) — fixed with
  * Predicates.evalOnce. */
class PlanGuardSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def splitCount(name: String): Int = {
    val plan = Catalog.all.find(_.name == name).get
      .run(spark, d).queryExecution.executedPlan.toString
    graft.CacheTracker.releaseAll()
    "split\\(".r.findAllIn(plan).size
  }

  private val guarded = Seq(
    "d01_dedup_exact", "d02_token_stats", "d03_lang_id",
    "d04_quality", "d11_chunking", "d12_stratified_sample",
    "d15_repetition", "d38_gopher_rules",
    "d40_weighted_sample", // evalOnce barrier
    "d10_corpus_filter", "d23_quality_sample") // evalOnce barrier

  for (name <- guarded)
    test(s"$name: exactly one tokenizer dag in the plan") {
      assert(splitCount(name) === 1)
    }
}
