package graft.state

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical layout + skew tooling (SURVEY.md §4.3) — the piece that
  * replaces the reference's 14 Mongo secondary indexes at 100 TB.
  *
  * The declared indexes tell us the access patterns:
  * feeds are time-descending (`created_at` desc), entity lookups are
  * by `(author, permlink)`, trending sorts by stat columns within a
  * community. So: partition the posts table by a date bucket of
  * `created_at` (feed/trending windows prune partitions), and sort
  * within files by `(author, permlink)` (point lookups and the J4
  * self-join hit clustered row groups via parquet min/max).
  */
object Layout {

  /** Month bucket — coarse enough for small partitions counts, fine
    * enough that a 3-day trending window reads ≤ 2 partitions. */
  def monthBucket(ts: Column): Column =
    date_format(ts, "yyyy-MM")

  /** Key-hash sub-partition for the streaming-merge layout
    * (`created_month=…/key_bucket=…`): a deterministic hash bucket of
    * the post key, so a point/seed lookup with known keys prunes to
    * the buckets those keys hash into — the (author, permlink)
    * analogue of bucketBy, expressed as a partition column because
    * (a) partition pruning works on ANY literal predicate over it
    * (bucketBy pruning is single-column-only), (b) it composes with
    * dynamic partition overwrite on a plain parquet path (no
    * metastore), and (c) it ALSO scopes the write: a micro-batch
    * rewrites only the (month, bucket) pairs it touches.
    *
    * Sizing at 100 TB: choose n so table_size/n ≈ a few GB (e.g.
    * n=4096) — a micro-batch touching K keys then reads ≤ K buckets
    * ≈ K·(table/n), independent of how the other buckets grow. */
  def keyBucket(author: Column, permlink: Column, n: Int): Column =
    pmod(xxhash64(author, permlink), lit(n.toLong)).cast("int")

  /** Write an entity table with the feed-serving layout. */
  def writePosts(posts: DataFrame, dir: String): Unit =
    posts
      .withColumn("created_month", monthBucket(col("created_at")))
      .repartition(col("created_month"))
      .sortWithinPartitions("author", "permlink")
      .write
      .partitionBy("created_month")
      .mode("overwrite")
      .parquet(dir)

  /** Read back; time predicates on created_at/created_month prune
    * partitions at the source. */
  def readPosts(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Time-window read with EXPLICIT month-partition pruning: Catalyst
    * does not infer `created_month ∈ [...]` from a `created_at`
    * range, so the window query must carry both predicates — the
    * month list goes into PartitionFilters (source-level pruning, the
    * point of the layout), the timestamp range into PushedFilters.
    * A q04-style 3-day window therefore reads ≤ 2 month partitions
    * regardless of table size. */
  def monthWindow(posts: DataFrame, from: java.sql.Timestamp,
                  to: java.sql.Timestamp): DataFrame = {
    require(!to.before(from), "monthWindow: to < from")
    // derive months in UTC — created_month was written under the
    // engine's session timezone (UTC, Tables.conf); using the JVM
    // default zone here would prune the WRONG partitions on a
    // non-UTC driver and silently drop rows
    def ym(ts: java.sql.Timestamp) = java.time.YearMonth.from(
      ts.toInstant.atZone(java.time.ZoneOffset.UTC))
    val f = ym(from)
    val t = ym(to)
    val months = Iterator.iterate(f)(_.plusMonths(1))
      .takeWhile(!_.isAfter(t)).map(_.toString).toSeq
    posts.filter(col("created_month").isin(months: _*) &&
      col("created_at") >= lit(from) && col("created_at") <= lit(to))
  }

  /** Skew-aware join (SURVEY §4.2 "AQE skew handling" + manual path):
    * salt the skewed (left) side into `buckets` sub-keys and explode
    * the build (right) side once per bucket, so one hot key spreads
    * over `buckets` tasks. Use when AQE's skew split can't help (e.g.
    * a single massive build-side key). Equi-join on `keys` only.
    */
  def saltedJoin(skewed: DataFrame, build: DataFrame,
                 keys: Seq[String], buckets: Int,
                 joinType: String = "inner"): DataFrame = {
    // join types preserving unmatched BUILD rows would emit them once
    // per salt replica — only skewed-side-preserving types are sound
    require(Set("inner", "left", "left_outer", "left_semi", "left_anti",
      "cross").contains(joinType.toLowerCase),
      s"saltedJoin: unsupported joinType '$joinType' (build side is " +
        "replicated per salt bucket)")
    val salted = skewed.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(buckets)).cast("int"))
    val exploded = build.withColumn("__salt",
      explode(array((0 until buckets).map(lit): _*)))
    salted.join(exploded, keys :+ "__salt", joinType).drop("__salt")
  }

  /** [[saltedJoin]] variant for differently-named key columns and a
    * DETERMINISTIC salt: `pmod(xxhash64(saltSource), salts)` over a
    * caller-provided unique column, so replays/retries route each
    * fact row identically regardless of partition layout (the
    * [[saltedJoin]] salt is layout-dependent — harmless for routing,
    * but an oracle-compared query wants layout independence
    * end-to-end; catalog q24 proves output ≡ the plain inner join).
    * The dimension side is exploded ×`salts` — sized for dimension
    * tables; for fact-fact skew, salt only the known hot keys and
    * union with an unsalted join of the rest. */
  def saltedEquiJoin(facts: DataFrame, dim: DataFrame,
                     factKey: Column, dimKey: Column,
                     saltSource: Column, salts: Int): DataFrame = {
    require(salts >= 1, "salts >= 1")
    val salted = facts.withColumn("__fsalt",
      pmod(xxhash64(saltSource), lit(salts.toLong)).cast("int"))
    val dimX = dim.withColumn("__dsalt",
      explode(array((0 until salts).map(lit): _*)))
    salted
      .join(dimX, factKey === dimKey && col("__fsalt") === col("__dsalt"))
      .drop("__fsalt", "__dsalt")
  }
}
