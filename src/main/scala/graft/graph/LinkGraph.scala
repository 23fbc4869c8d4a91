package graft.graph

import graft.CacheTracker
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative link-graph centrality (PageRank) — the source-quality
  * signal large-corpus curation pipelines weight domains/sources by
  * (the role harmonic centrality / PageRank plays in Common Crawl
  * derived corpora; SURVEY.md §7.5 training-data extensions).
  *
  * Spark-first shape: power iteration as a loop of
  * join-on-src → groupBy-dst-sum — the canonical iterative Spark
  * workload. The edge list (with out-degree attached) is built ONCE
  * and persisted; each iteration shuffles only
  *   - the rank table into the join (Catalyst/AQE broadcasts it while
  *     |nodes| ≪ |edges|, the common case for link graphs), and
  *   - the partial sums of the groupBy (map-side combined).
  * At cluster scale the edge table would be bucketed by `src` so the
  * per-iteration join is shuffle-free on the big side; the loop bound
  * is a fixed iteration count, so lineage stays bounded (checkpoint
  * every ~10 iterations if you raise `iters`).
  *
  * All arithmetic is exact integer math so results are portable across
  * engines (the Catalog oracle replays it in DuckDB bit-for-bit):
  * ranks live in micro-units (`scale` = 1e6 per node), a node's
  * contribution is `pr div outdeg` (truncating integer division), and
  * the damping update is `(1-d)·scale + (dampNum · Σcontrib) div
  * dampDen`. No floats → no summation-order surface.
  *
  * Contract: `edges(src, dst)` must be distinct directed edges and
  * every node must have at least one OUT-edge and one IN-edge (true by
  * construction for the symmetrized bipartite graphs the catalog
  * feeds it; general graphs would add a dangling-mass term). Nodes
  * absent from `edges` are absent from the output.
  */
object LinkGraph {

  /** One power-iteration step over a prepared `(src, dst, outdeg)`
    * edge table: join ranks in on src, sum contributions per dst,
    * apply the quantized damping update. Factored out so the bucketed
    * scale path and the spec's plan proof drive the exact loop body
    * the public entry points run. */
  def iterate(e: DataFrame, pr: DataFrame,
              dampNum: Long, dampDen: Long, scale: Long): DataFrame = {
    val base = (scale * (dampDen - dampNum)) / dampDen
    e.as("e").join(pr.as("r"), col("e.src") === col("r.node"))
      .groupBy(col("e.dst"))
      .agg(sum(expr("r.pr div e.outdeg")).as("__s"))
      .select(col("dst").as("node"),
        expr(s"$base + (($dampNum * __s) div $dampDen)")
          .cast("long").as("pr"))
  }

  def pageRank(edges: DataFrame, iters: Int,
               dampNum: Long = 85L, dampDen: Long = 100L,
               scale: Long = 1000000L): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val e = CacheTracker.persistTracked(
      edges.join(deg, "src").select("src", "dst", "outdeg"))
    var pr = deg.select(col("src").as("node"), lit(scale).as("pr"))
    for (_ <- 1 to iters) pr = iterate(e, pr, dampNum, dampDen, scale)
    pr
  }

  /** Persist the prepared edge table BUCKETED by `src` — the layout
    * the pageRank scaladoc promises for cluster scale. A bucketed
    * FileScan carries hashpartitioning(src, buckets) as its output
    * partitioning, so every iteration's SortMergeJoin exchanges ONLY
    * the |nodes|-sized rank side; the |edges|-sized side is read in
    * place, iteration after iteration (LinkGraphSpec proves it on the
    * executed plan: `Bucketed: true`, one Exchange fewer than the
    * unbucketed join). Same machinery as
    * `text.InvertedIndex.writeBucketed` (file:48). */
  def writeEdgesBucketed(edges: DataFrame, table: String, path: String,
                         buckets: Int = 64): Unit = {
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    edges.join(deg, "src").select("src", "dst", "outdeg")
      .write.mode("overwrite").format("parquet")
      .option("path", path)
      .bucketBy(buckets, "src")
      .sortBy("src", "dst")
      .saveAsTable(table)
  }

  /** PageRank over a `writeEdgesBucketed` table: identical math to
    * `pageRank`, but each iteration's big-side join is exchange-free. */
  def pageRankBucketed(spark: SparkSession, table: String, iters: Int,
                       dampNum: Long = 85L, dampDen: Long = 100L,
                       scale: Long = 1000000L): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val e = spark.table(table)
    var pr = e.select(col("src").as("node")).distinct()
      .select(col("node"), lit(scale).as("pr"))
    for (_ <- 1 to iters) pr = iterate(e, pr, dampNum, dampDen, scale)
    pr
  }
}
