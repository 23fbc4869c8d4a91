package graft.streaming

import org.apache.spark.sql.SparkSession
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
}
