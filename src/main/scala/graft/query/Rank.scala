package graft.query

import graft.CacheTracker
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed global ranking (Q13 leaderBoard / §2.7).
  *
  * `row_number().over(Window.orderBy(...))` with no partition key is
  * correct but moves EVERY row to one partition ("WindowExec: No
  * Partition Defined" — the single-task sort that dies at 100 TB).
  * The scale-safe equivalent is the classic two-job distributed rank:
  *
  *   1. range-repartition on the sort key + sort within partitions —
  *      Spark's distributed total sort (the same machinery a global
  *      `orderBy` uses), cached so both jobs below see the exact same
  *      partitioning;
  *   2. one tiny per-partition count job → driver prefix sums =
  *      partition rank offsets (O(#partitions) driver work);
  *   3. rank = offset(partition) + partition-local index, where the
  *      local index comes from `monotonically_increasing_id()`'s low
  *      33 bits (its published layout is partitionId·2^33 + local
  *      offset, assigned in iteration order = the sorted order) — a
  *      pure codegen projection, no window, no extra shuffle.
  *
  * Output is row-identical to the unpartitioned window provided
  * `sort` is a total order (include a unique tie-break column, as any
  * deterministic ranking must).
  */
object Rank {

  /** Scale-safe global (inclusive) running sum of `value` in `sort`
    * order — the distributed prefix sum. Same two-job shape as
    * [[globalRowNumber]]: range-repartition + sort (cached), a tiny
    * per-partition-sums job whose driver prefix-scan yields partition
    * offsets, then ONE streaming pass per partition adds
    * offset + local running sum. The local scan is `mapPartitions` —
    * the legitimate per-partition-imperative case: O(1) state, zero
    * extra shuffle (a window over a materialized partition-id column
    * would re-shuffle the whole table; an unpartitioned window would
    * collapse it to one task). `value` must be integral (summed as
    * long).
    */
  def globalRunningSum(df: DataFrame, sort: Seq[Column], value: Column,
                       outCol: String): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.LongType
    val sorted = CacheTracker.persistTracked(
      df.withColumn("__v", value.cast("long"))
        .repartitionByRange(sort: _*).sortWithinPartitions(sort: _*))
    val sums = sorted
      .groupBy(spark_partition_id().as("__pid"))
      .agg(sum(col("__v")).as("__s"))
      .collect().map(r => r.getAs[Int]("__pid") -> r.getAs[Long]("__s"))
    val offsets = sums.sortBy(_._1).map(_._1)
      .zip(sums.sortBy(_._1).map(_._2).scanLeft(0L)(_ + _)).toMap
    val vIdx = sorted.schema.fieldIndex("__v")
    val outSchema = sorted.schema.add(outCol, LongType, nullable = false)
    sorted.mapPartitions { it =>
      var acc = 0L
      var off = Option.empty[Long]
      it.map { r =>
        if (off.isEmpty)
          off = Some(offsets(org.apache.spark.TaskContext.getPartitionId()))
        acc += r.getLong(vIdx)
        Row.fromSeq(r.toSeq :+ (off.get + acc))
      }
    }(Encoders.row(outSchema))
      .drop("__v")
  }

  def globalRowNumber(df: DataFrame, sort: Seq[Column],
                      rankCol: String = "rank"): DataFrame = {
    val sorted = CacheTracker.persistTracked(
      df.repartitionByRange(sort: _*).sortWithinPartitions(sort: _*))
    val counts = sorted
      .groupBy(spark_partition_id().as("__pid")).count()
      .collect().map(r => r.getAs[Int]("__pid") -> r.getAs[Long]("count"))
    val pids = counts.map(_._1).sorted
    val offsets = pids.zip(
      counts.sortBy(_._1).map(_._2).scanLeft(0L)(_ + _)).toMap
    val offMap = map(offsets.toSeq.sortBy(_._1).flatMap { case (p, o) =>
      Seq(lit(p), lit(o))
    }: _*)
    val localIdx =
      monotonically_increasing_id().bitwiseAND(lit((1L << 33) - 1))
    sorted.withColumn(rankCol,
      (element_at(offMap, spark_partition_id()) + localIdx + 1L)
        .cast("long"))
  }
}
