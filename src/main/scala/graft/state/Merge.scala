package graft.state

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Upsert / keyed-state operators.
  *
  * The reference's write path is MongoDB `findOneAndUpdate(upsert)` +
  * unordered bulkWrite, with a monotonic guard: a write only applies if
  * its block height exceeds the stored `state_control.block_height`
  * (src/workers/hive-stream.ts:538, src/types/posts.ts:38-41).
  *
  * Batch re-expression: "latest version per key wins" — a single
  * window/dedup pass that is order-insensitive, so the reference's
  * reorder buffer (src/utils.ts:55-68) is unnecessary: ordering is
  * restored relationally, which parallelizes where the reference
  * serializes.
  */
object Merge {

  /** Keep exactly one row per key: the one with the greatest
    * `version` (ties broken by `ties` descending — pass a unique id
    * for determinism). One shuffle on the key columns; at scale this
    * is the natural partitioning for the entity table, so the shuffle
    * doubles as the layout write.
    */
  def latestWins(df: DataFrame, keys: Seq[String], version: Column,
                 ties: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((version.desc +: ties.map(_.desc)): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** First event per key (the reference's `first_upload` check,
    * hive-stream.ts:623-631 — "is this the author's first video").
    */
  def firstPerKey(df: DataFrame, keys: Seq[String], version: Column,
                  ties: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((version.asc +: ties.map(_.asc)): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Batch MERGE: apply a change-set onto a base table with
    * latest-wins + the monotonic version guard. Pure-parquet mode of
    * the reference's `findOneAndUpdate(upsert:true)` (S8) — on Delta
    * this becomes `MERGE INTO` keyed the same way.
    */
  def upsert(base: DataFrame, changes: DataFrame, keys: Seq[String],
             version: Column): DataFrame =
    latestWins(base.unionByName(changes, allowMissingColumns = true),
      keys, version)

  /** Tombstone-aware compaction: event-sourced deletes (S10) keep a
    * `deleted` marker column; after latest-wins, deleted keys drop out.
    */
  def compact(df: DataFrame, keys: Seq[String], version: Column,
              deletedCol: Column): DataFrame =
    latestWins(df, keys, version).filter(!coalesce(deletedCol, lit(false)))
}
