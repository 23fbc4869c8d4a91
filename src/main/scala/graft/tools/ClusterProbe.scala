package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.1")
    var t0 = System.nanoTime()
    val pairs = graft.dedup.Dedup.minhashLshPairs(docs, "text", "doc_id",
      shingleN = 3, k = 32, bands = 8, threshold = 0.2, seed = 42L)
      .select("id_a", "id_b").persist()
    println(f"pairs=${pairs.count()} in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    t0 = System.nanoTime()
    // iteration count of plain min-propagation, driver-side (tiny data)
    val es = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map[Long, List[Long]]().withDefaultValue(Nil)
    es.foreach { case (a, b) => adj(a) ::= b; adj(b) ::= a }
    var lbl = scala.collection.mutable.Map[Long, Long]() ++ adj.keys.map(k => k -> k)
    var it = 0
    var changed = true
    while (changed) {
      changed = false; it += 1
      adj.keys.foreach { k =>
        val m = (lbl(k) :: adj(k).map(lbl)).min
        if (m < lbl(k)) { lbl(k) = m; changed = true }
      }
    }
    println(s"driver CC: iters=$it comps=${lbl.values.toSet.size} nodes=${lbl.size} in ${(System.nanoTime()-t0)/1e9}s")
    t0 = System.nanoTime()
    val n = graft.dedup.Dedup.neardupClusters(pairs).count()
    println(s"spark CC rows=$n in ${(System.nanoTime()-t0)/1e9}s")
    spark.stop()
  }
}
