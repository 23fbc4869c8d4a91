package graft.tools

import graft.api.{ApiTables, GraftApi, HttpApi}
import org.apache.spark.sql.SparkSession

/** Boot the GraphQL front door over an ingest-produced entity store —
  * the deployment shape of the reference's indexer API
  * (`src/modules/api/index.ts:54-75`: yoga on a port, backed by the
  * ingested collections).
  *
  * Usage: `runMain graft.tools.Serve <storeDir> [port]`
  *
  * `storeDir` holds the entity tables as parquet subdirectories —
  * `posts/` `follows/` `profiles/` required, `ceramic_profiles/`
  * `communities/` `social_connections/` `sync_stats/` picked up when
  * present (missing optional tables simply leave their resolvers
  * unconfigured — querying one is a field-level GraphQL error). The
  * layout is exactly what the ingest pipeline writes (PostsIngest /
  * GraphIngest output, persisted per partition strategy); pointing
  * this at a store on a cluster serves interactive GraphQL while all
  * per-query heavy lifting stays distributed. */
object Serve {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: Serve <storeDir> [port] (default port 4568)")
    val store = args(0).stripSuffix("/")
    val port = if (args.length > 1) args(1).toInt else 4568
    val spark = SparkSession.builder()
      .appName("graft-serve")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    val server = new HttpApi(new GraftApi(spark, tables(spark, store)),
      port).start()
    println(s"graft GraphQL API listening on " +
      s"http://0.0.0.0:${server.boundPort}/api/v2/graphql")
    // serve until killed
    Thread.currentThread().join()
  }

  /** Load the entity store: required tables throw on absence with the
    * path in the message; optional ones resolve to None (their
    * resolvers then answer with a field-level GraphQL error). */
  def tables(spark: SparkSession, storeDir: String): ApiTables = {
    val store = storeDir.stripSuffix("/")
    def req(name: String) = spark.read.parquet(s"$store/$name")
    def opt(name: String) =
      try Some(spark.read.parquet(s"$store/$name"))
      catch {
        case _: org.apache.spark.sql.AnalysisException => None
      }
    ApiTables(
      posts = req("posts"),
      follows = req("follows"),
      profiles = req("profiles"),
      ceramicProfiles = opt("ceramic_profiles"),
      communities = opt("communities"),
      socialConnections = opt("social_connections"),
      syncStats = opt("sync_stats"),
      keyBuckets = storedKeyBuckets(spark, s"$store/posts"),
      replyIndex = for {
        df <- opt("reply_index")
        n <- graft.state.Layout.replyIndexBuckets(spark,
          s"$store/reply_index")
      } yield (df, n))
  }

  /** The posts store's graft-layout bucket modulus, read from its
    * `_graft_layout.json` marker (the file `StreamIngest` maintains) —
    * when present, the API's point lookups and parent_post hydration
    * partition-prune their store probes to the relevant key buckets.
    */
  private def storedKeyBuckets(spark: SparkSession,
                               postsDir: String): Option[Int] =
    try {
      val p = new org.apache.hadoop.fs.Path(postsDir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      graft.streaming.StreamIngest.storedKeyBuckets(fs, p)
    } catch { case _: Exception => None }
}
