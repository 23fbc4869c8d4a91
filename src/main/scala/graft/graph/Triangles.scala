package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting over an undirected interaction graph — the
  * clustering-coefficient / community-density signal curation
  * pipelines compute next to PageRank (SURVEY.md §7.5 training-data
  * extensions; the reference's follows graph,
  * src/workers/hive-stream.ts:330-398, is the natural input).
  *
  * Spark-first shape: the degree-ordered node-iterator (Schank &
  * Wagner 2005; the MapReduce formulation is Suri & Vassilvitskii
  * 2011). Each undirected edge is ORIENTED from its lower-(degree,id)
  * endpoint to the higher one, which makes the oriented out-degree of
  * every node O(√m) — the wedge self-join below is therefore bounded
  * at O(m^1.5) total wedges regardless of skew (a raw self-join on an
  * unoriented star node would be O(deg²); orientation is what lets a
  * celebrity node with 10M followers survive the join). The triangle
  * set is orientation-independent, so results are identical to naive
  * enumeration — only the plan changes.
  *
  * Shuffle profile at scale: canonicalize+distinct (one exchange on
  * the edge key), degree groupBy (map-side combined), two equi-joins
  * to attach ranks, the wedge self-join keyed on the shared low
  * endpoint, and the closing-edge join keyed on the candidate pair.
  * Every stage is an equi-shuffle on a slim (long, long[, long])
  * projection; nothing is broadcast-sized except by AQE's choice, and
  * no stage materializes a neighborhood list (adjacency-array
  * formulations OOM on skewed nodes; the join formulation spills).
  */
object Triangles {

  /** Per-node triangle participation: one row `(node, n_triangles)`
    * per node that is a corner of at least one triangle (zero-count
    * nodes are absent — a count over participants, not a left join
    * back to the node universe). Input edges may be directed,
    * duplicated, or self-looping; they are canonicalized first.
    */
  def perNode(edges: DataFrame, srcCol: String = "src",
              dstCol: String = "dst"): DataFrame = {
    val tri = triangles(edges, srcCol, dstCol)
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node")
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** The triangle set itself, one row per triangle. Columns (x, y, z)
    * are the corners in rank order (lowest (degree, id) first) — a
    * canonical labeling, so the row set is deterministic. */
  def triangles(edges: DataFrame, srcCol: String = "src",
                dstCol: String = "dst"): DataFrame = {
    // canonical undirected edge list: (a < b), loops dropped, dups
    // out. Persisted: the degree aggregate and the rank-attach joins
    // both read it, and same-plan subtrees do not dedupe execution
    val e = graft.CacheTracker.persistTracked(edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct())
    // degree over the canonical list (map-side combined)
    val deg = e.select(explode(array(col("a"), col("b"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    // orient low-rank → high-rank; rank = (degree, id) lexicographic
    // (struct comparison — ties broken by id, so the order is total)
    val withDeg = e
      .join(deg.select(col("n").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("deg").as("db")), "b")
    def rank(d: String, n: String) =
      struct(col(d).as("d"), col(n).as("n"))
    val aFirst = rank("da", "a") < rank("db", "b")
    // persisted: THREE consumers (wedge e1, wedge e2, closing-edge
    // join) — the closing join shuffles on (y, z), a different key
    // than the wedge's u, so exchange reuse cannot cover it and the
    // whole distinct + degree + join chain would re-execute
    val oriented = graft.CacheTracker.persistTracked(withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("u"),
      when(aFirst, col("b")).otherwise(col("a")).as("v"),
      // carry v's rank so the wedge join can order its two arms
      // without re-joining degrees
      when(aFirst, rank("db", "b")).otherwise(rank("da", "a")).as("rv")))
    // wedges: two oriented edges sharing their low endpoint; arms
    // ordered by rank so each unordered pair appears once and the
    // closing edge's orientation (lower-rank arm → higher) is known
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.u") === col("e2.u") && col("e1.rv") < col("e2.rv"))
      .select(col("e1.u").as("x"), col("e1.v").as("y"),
        col("e2.v").as("z"))
    // close: the (y, z) arm pair is itself an oriented edge
    wedges.join(oriented.select(col("u").as("y"), col("v").as("z")),
      Seq("y", "z"))
  }
}
