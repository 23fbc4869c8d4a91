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
    * apply the quantized damping update. The loop body of the bucketed
    * scale path (and the spec's exchange-count plan proof). */
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

  /** In-memory variant, tuned for |nodes| ≪ |edges| (the link-graph
    * norm): the edge table stays a slim persisted (src, dst) — no
    * edge-sized outdeg prep join — and each iteration joins it against
    * a BROADCAST node-sized table carrying the PRECOMPUTED per-edge
    * contribution `pr div outdeg`. Forced broadcast, because AQE does
    * not convert the chained-iteration join on its own (measured: SMJ
    * re-sorting the cached edge table every iteration). Per iteration:
    * one broadcast of |nodes| rows + one map-side-combined dst
    * aggregate. When ranks outgrow the driver, use
    * [[pageRankBucketed]] — its SMJ reads the bucketed edge table
    * exchange-free instead. */
  def pageRank(edges: DataFrame, iters: Int,
               dampNum: Long = 85L, dampDen: Long = 100L,
               scale: Long = 1000000L): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    // the caller's edge subtree feeds BOTH the degree aggregate and
    // every iteration's join — without a persist it re-executes
    val es = CacheTracker.persistTracked(edges)
    val deg = CacheTracker.persistTracked(
      es.groupBy("src").agg(count(lit(1)).as("outdeg")))
    val base = (scale * (dampDen - dampNum)) / dampDen
    var pr = deg.select(col("src").as("node"), lit(scale).as("pr"))
    for (i <- 1 to iters) {
      val contribs = pr.as("r")
        .join(deg.as("d"), col("r.node") === col("d.src"))
        .select(col("r.node").as("node"),
          expr("r.pr div d.outdeg").as("contrib"))
      pr = es.as("e").join(broadcast(contribs).as("r"),
          col("e.src") === col("r.node"))
        .groupBy(col("e.dst"))
        .agg(sum(col("r.contrib")).as("__s"))
        .select(col("dst").as("node"),
          expr(s"$base + (($dampNum * __s) div $dampDen)")
            .cast("long").as("pr"))
      // Persist each iteration (node-sized, tiny): without the cut,
      // iteration k's broadcast subtree CONTAINS iterations 1..k-1,
      // and when exchange reuse misses (AQE re-plans make the
      // subtrees non-identical) the chain re-executes per iteration —
      // O(iters²) work (measured 12.9 s → ~3 s at sf0.1). No eager
      // count() is needed: iteration k+1's broadcast collect is the
      // first consumer and populates the cache — an eager count here
      // just adds one driver job per iteration (measured ~0.2-0.3 s
      // each at sf0.1). The driver-coordinated per-iteration job is
      // the standard iterative shape (GraphX/MLlib do the same
      // internally).
      if (i < iters) pr = CacheTracker.persistTracked(pr)
    }
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
