package graft.state

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC changelog → slowly-changing-dimension type-2 history: the
  * lakehouse compaction that turns an event stream into queryable
  * validity intervals. Complements [[Merge.latestWins]] (which keeps
  * only the current row): SCD2 keeps EVERY distinct state with
  * [valid_from, valid_to) bounds, which is what "as of" joins
  * (d19) and training-data snapshots read.
  *
  * Two key-partitioned windows, no self-join:
  *   1. change detection — drop rows whose tracked state equals the
  *      previous row's (CDC no-op updates collapse);
  *   2. interval build — `valid_to` = next change's timestamp,
  *      `version` = change ordinal.
  *
  * Both windows partition by the dimension key, so at 100 TB the work
  * is one hash-shuffle on the key and per-key sorted scans — no
  * global ordering anywhere. The order column must carry a unique
  * tie-break (event id) to make history deterministic under equal
  * timestamps.
  *
  * NULL is a legal tracked state: change detection is null-SAFE
  * (`<=>`), so A→NULL opens a new version and NULL→NULL collapses as
  * a no-op; first-row detection rides a separate lag-of-constant
  * marker rather than `__prev IS NULL` (which would conflate "no
  * previous row" with "previous state was null"). */
object Scd {

  def scd2History(cdc: DataFrame, keyCol: String, stateCol: String,
                  tsCol: String, tieCol: String,
                  fmt: String = "yyyy-MM-dd HH:mm:ss"): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    cdc
      .withColumn("__prev", lag(col(stateCol), 1).over(w))
      .withColumn("__first", lag(lit(1), 1).over(w).isNull)
      .filter(col("__first") || !(col("__prev") <=> col(stateCol)))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("__next_ts", lead(col(tsCol), 1).over(w))
      .select(col(keyCol), col("version"), col(stateCol),
        date_format(col(tsCol), fmt).as("valid_from"),
        coalesce(date_format(col("__next_ts"), fmt), lit("current"))
          .as("valid_to"),
        col("__next_ts").isNull.as("is_current"))
  }
}
