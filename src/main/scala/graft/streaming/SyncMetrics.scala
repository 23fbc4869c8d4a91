package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._
import java.util.concurrent.atomic.AtomicReference

/** Sync-progress metrics (A10, SURVEY.md §2.5) — the reference
  * computes blocks/s, lag and ETA on 2s/30s timers and upserts a
  * singleton `stats` document (src/workers/hive-stream.ts:56-127).
  * In Structured Streaming that telemetry is already emitted per
  * micro-batch; this listener folds it into the same shape.
  */
final case class SyncState(
    batches: Long, rowsIngested: Long, rowsPerSec: Double,
    lastBatchRows: Long, lastTriggerMs: Long)

class SyncMetrics extends StreamingQueryListener {
  private val state = new AtomicReference(SyncState(0, 0, 0.0, 0, 0))

  def current: SyncState = state.get()

  /** blockEta analog: remaining / throughput (caller supplies the
    * backlog estimate — chain head minus current height). */
  def etaSeconds(remainingRows: Long): Double = {
    val s = state.get()
    if (s.rowsPerSec <= 0) Double.PositiveInfinity
    else remainingRows / s.rowsPerSec
  }

  /** Q6 syncState as a QUERYABLE singleton row — the reference serves
    * a `stats` document keyed "stats" (resolvers/index.ts:352-362)
    * that the 2s/30s timers maintain (hive-stream.ts:96-127). This
    * materializes the listener snapshot into that shape so a catalog
    * query can read job state like any other table. */
  def stateRow(spark: SparkSession, headHeight: Long,
               currentHeight: Long, lastLag: Long = 0L): DataFrame = {
    val s = current
    val lag = headHeight - currentHeight
    val eta =
      if (s.rowsPerSec > 0) math.round(lag / s.rowsPerSec) else 0L
    import spark.implicits._
    Seq(("stats", currentHeight, s.rowsPerSec, lag, eta, lag - lastLag))
      .toDF("key", "block_height_current", "blocks_per_sec",
        "block_lag", "sync_eta_seconds", "block_lag_diff")
  }

  override def onQueryStarted(e: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    val rows = p.numInputRows
    val ms = Option(p.durationMs.get("triggerExecution"))
      .map(_.longValue()).getOrElse(0L)
    state.updateAndGet { s =>
      val total = s.rowsIngested + rows
      SyncState(s.batches + 1, total,
        if (ms > 0) rows * 1000.0 / ms else s.rowsPerSec, rows, ms)
    }
  }
}

object SyncMetrics {
  /** Attach a listener to the session; returns it for polling. */
  def attach(spark: SparkSession): SyncMetrics = {
    val m = new SyncMetrics
    spark.streams.addListener(m)
    m
  }

  /** The same stats-singleton shape computed RELATIONALLY from an
    * ingest log (batch replay / backfill): throughput = rows over the
    * observed time span, head simulated `headAhead` heights past the
    * newest row, lag/ETA per hive-stream.ts:96-127. One aggregate —
    * a column-pruned scan with partial agg pushdown at any scale. */
  def syncStateFromLog(log: DataFrame, heightCol: Column, tsCol: Column,
                       headAhead: Long, lastLag: Long): DataFrame =
    log
      .agg(
        max(heightCol).as("block_height_current"),
        count(lit(1)).as("rows_ingested"),
        (unix_timestamp(max(tsCol)) - unix_timestamp(min(tsCol)))
          .as("span_s"))
      .select(
        lit("stats").as("key"),
        col("block_height_current"),
        when(col("span_s") > 0,
          col("rows_ingested").cast("double") / col("span_s"))
          .otherwise(lit(0.0)).as("blocks_per_sec"),
        lit(headAhead).as("block_lag"),
        // eta only when a rate exists — a zero-span log must report
        // (rate=0, eta=0) consistently (stateRow does the same)
        when(col("span_s") > 0,
          round(lit(headAhead) /
            (col("rows_ingested").cast("double") / col("span_s")), 0)
            .cast("long"))
          .otherwise(lit(0L)).as("sync_eta_seconds"),
        lit(headAhead - lastLag).as("block_lag_diff"))
}
