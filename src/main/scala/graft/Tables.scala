package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (see TESTDATA.md).
  *
  * All loads are plain `spark.read.parquet` so Catalyst keeps full
  * pushdown/pruning freedom — no caching, no materialization here. At
  * cluster scale these would be catalog tables partitioned per
  * SURVEY.md §4.3; the loader is the single seam where that changes.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Document ids spread across the session's cores — the id column
    * feeding synthetic-media generation. The sf-dir parquet reads as
    * ONE split at small SFs, and media encode/decode is partition-
    * local heavy work: on a single core the mm rows ran 10-20x their
    * 32-way cost (mm10 measured 52 s serial vs 3.9 s spread). The
    * shuffle moves slim longs; the codec loops it unlocks dwarf it. */
  def mediaIds(s: SparkSession, d: String): DataFrame =
    documents(s, d).select("doc_id")
      .repartition(s.sparkContext.defaultParallelism)

  /** `events.ts` normalization — schema-adaptive because the driver
    * has shipped the column two ways across data generations:
    *
    *   - parquet TIMESTAMP(NANOS): Spark's vectorized reader rejects
    *     it ([PARQUET_TYPE_ILLEGAL]); sessions set
    *     `spark.sql.legacy.parquet.nanosAsLong=true` (see [[conf]])
    *     so it arrives as Long nanoseconds → integer-`div` to
    *     microseconds (a double division would lose precision above
    *     2^53 ns);
    *   - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): arrives as
    *     TIMESTAMP_NTZ → cast to session-zone TimestampType (UTC
    *     session, so the wall-clock value is unchanged).
    *
    * Either way downstream sees microsecond TimestampType.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => df.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** Session configs the engine requires; apply on every builder. */
  val conf: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC")
}
