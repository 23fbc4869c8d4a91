package graft

import org.apache.spark.sql.DataFrame

/** Registry for heavy cached intermediates (signature/shingle tables
  * inside the LSH pipelines).
  *
  * The builders mark intermediates with a LAZY `persist()` and return
  * the un-materialized result plan — so a query executes exactly once
  * under Verify (parquet write) and Bench (noop write), and the
  * harness releases the caches between queries via [[releaseAll]].
  * Without the release, each LSH call would pin block-manager memory
  * for the session's lifetime; without the laziness, the builder
  * itself would run an action (the round-1 anti-pattern: the result
  * was computed twice — once in the builder's count, once by the
  * caller's write).
  *
  * SCOPE CONTRACT: the registry is application-global, so
  * [[releaseAll]] assumes ONE pipeline runs at a time — the Verify /
  * Bench / foreachBatch call patterns, all sequential. Running two
  * CacheTracker-using streaming queries concurrently in one
  * application would let one query's per-batch release unpersist the
  * other's live caches (correctness is unaffected — Spark recomputes
  * from lineage — but the O(consumers) re-execution the cache
  * prevents comes back). Concurrent pipelines need per-query tracker
  * instances; the harness has no such topology today.
  */
object CacheTracker {
  private val tracked =
    scala.collection.mutable.ListBuffer.empty[DataFrame]

  /** Lazily persist `df` and register it for later release. */
  def persistTracked(df: DataFrame): DataFrame = synchronized {
    tracked += df
    df.persist()
  }

  /** Unpersist everything registered since the last release. */
  def releaseAll(): Unit = synchronized {
    tracked.foreach(_.unpersist(blocking = false))
    tracked.clear()
  }
}
