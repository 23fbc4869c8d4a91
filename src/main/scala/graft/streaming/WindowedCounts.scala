package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation with watermarking — the streaming
  * counterpart of the reference's query-time trending windows
  * (SURVEY.md §2.11: the reference computes 3d/14d windows per query;
  * at scale the rolling counts are maintained incrementally and the
  * feed query reads the pre-aggregated table).
  */
object WindowedCounts {

  /** Tumbling per-window counts/sums by key with late-data bound.
    * Works on a streaming DF (stateful, append after watermark) or a
    * batch DF (plain groupBy) — same code path. */
  def tumbling(events: DataFrame, timeCol: String, keyCol: String,
               windowLen: String, lateness: String): DataFrame =
    events
      .withWatermark(timeCol, lateness)
      .groupBy(window(col(timeCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n"), sum("value").as("total"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col(keyCol), col("n"), round(col("total"), 2).as("total"))

  /** Gap-based session windows with watermark — the STREAMING
    * counterpart of the batch sessionize (catalog d17): a session
    * closes when no event for the key arrives within `gap`; open
    * sessions merge across micro-batches in the state store (keyed
    * by the grouping columns, so state shards with the stream) and
    * emit once the watermark passes their end. Session end =
    * last event + gap (the platform convention; the batch d17 emits
    * last-event time — both derive from the same boundary). */
  def sessions(events: DataFrame, timeCol: String, keyCol: String,
               gap: String, lateness: String): DataFrame =
    events
      .withWatermark(timeCol, lateness)
      .groupBy(session_window(col(timeCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col(keyCol), col("n_events"),
        round(col("total"), 2).as("total"))
}
