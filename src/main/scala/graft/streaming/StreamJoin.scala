package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream join with watermark-bounded state (SURVEY.md §2.11
  * scale path): the reference answers "what led to this event" with
  * per-document Mongo lookups at query time; the streaming engine
  * form is an event-time interval join where BOTH sides carry
  * watermarks and the range condition lets Spark evict state — no
  * unbounded buffering, state sharded by the join key with the
  * stream.
  */
object StreamJoin {

  /** Attribution: each purchase joined to the same user's views in
    * the preceding `window`. Inner join — purchases with no qualifying
    * view are dropped; a purchase preceded by several views within
    * the window matches each (downstream dedup/argmax is a separate
    * policy choice). Works identically on batch frames (the same
    * code path, minus state). Both inputs are (user_id, event_id,
    * event_type, ts, value) event streams; self-joining one source
    * stream is supported. */
  def viewPurchaseAttribution(events: DataFrame,
                              window: String = "1 hour",
                              lateness: String = "10 minutes")
      : DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"),
        col("event_id").as("view_id"), col("ts").as("view_ts"))
      .withWatermark("view_ts", lateness)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"),
        col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("value"))
      .withWatermark("purchase_ts", lateness)
    purchases.join(views,
      expr(s"""v_user = p_user AND
        purchase_ts >= view_ts AND
        purchase_ts <= view_ts + interval $window"""))
      .select(col("purchase_id"), col("p_user").as("user_id"),
        col("view_id"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("view_ts")))
          .as("delay_us"),
        col("value"))
  }
}
