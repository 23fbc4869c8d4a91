package graft.streaming

import graft.functions.Text
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

final case class FpDoc(fp: String, doc_id: Long, text: String)

/** Streaming exact-dedup: emit only the first document ever seen per
  * content fingerprint, across micro-batches and restarts.
  *
  * The keyed seen-set lives in Spark's state store (checkpointed,
  * partitioned by key) via `flatMapGroupsWithState` — the streaming
  * counterpart of the batch `Dedup.exact` pass. At scale the state is
  * hash-partitioned with the stream, so dedup pressure spreads across
  * executors; add a TTL timeout when the dedup window may be bounded.
  */
object StreamDedup {

  /** docs(doc_id, text) → first-seen docs only. Works on a streaming
    * or batch Dataset (same code path — Spark dispatches). */
  def firstSeen(docs: DataFrame)
      (implicit spark: SparkSession): Dataset[FpDoc] = {
    import spark.implicits._
    val keyed = docs
      .withColumn("fp", Text.fingerprint(col("text")))
      .select(col("fp"), col("doc_id").cast("long"), col("text"))
      .as[FpDoc]
    keyed.groupByKey(_.fp)
      .flatMapGroupsWithState[Boolean, FpDoc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, docs: Iterator[FpDoc], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else if (docs.hasNext) {
            state.update(true)
            // smallest doc_id wins WITHIN a batch: the iterator's
            // order is shuffle-delivery order, so "first" would vary
            // across task retries and replays of the same input —
            // the survivor must be a function of the data
            Iterator.single(docs.minBy(_.doc_id))
          } else Iterator.empty
      }
  }

  /** Run the dedup stream over JSON doc files, appending survivors to
    * `outDir` parquet, state in `checkpointDir`. */
  def run(spark: SparkSession, inDir: String, outDir: String,
          checkpointDir: String,
          trigger: org.apache.spark.sql.streaming.Trigger)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    implicit val s: SparkSession = spark
    val in = spark.readStream
      .schema("doc_id long, text string")
      .json(inDir)
    firstSeen(in)
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .format("parquet")
      .option("path", outDir)
      .start()
  }
}
