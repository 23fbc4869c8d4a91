package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Flat→bucketed migration as ONE engine call
  * ([[StreamNearDedup.migrateToBucketed]]): the lifecycle step a
  * flat stream hits when its corpus outgrows the measured
  * BucketedCorpusFloor. The headline contract (VERDICT r12 #1): pair
  * history is IDENTICAL across (flat stream → migrate → bucketed
  * stream) vs an always-bucketed control — including a replayed
  * batch straddling the migration, identical or drifted. */
class MigrateToBucketedSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"

  private def probe(batchId: Long, docs: Seq[(Long, String)],
                    side: String, pairs: String,
                    band: Option[String]): Long =
    StreamNearDedup.probeAndAppend(spark,
      docs.toDF("doc_id", "text"), batchId, side, pairs,
      threshold = 0.2, bandDir = band, buckets = 8)

  private val pairsSchema =
    "new_id long, old_id long, n_inter long, n_union long, " +
      "batch_id long"

  private def pairSet(pairs: String): Set[(Long, Long, Long)] =
    spark.read.schema(pairsSchema).parquet(pairs)
      .select(col("new_id"), col("old_id"), col("batch_id"))
      .as[(Long, Long, Long)].collect().toSet

  private def ids(dir: String): Set[Long] =
    spark.read.parquet(dir).select("id").as[Long].collect().toSet

  // the shared batch script: b0 seeds, b1 emits one cross-batch
  // pair, b2 emits cross- and intra-batch pairs (the flat-mode
  // spec's exact story)
  private def script(run: (Long, Seq[(Long, String)]) => Long)
      : Unit = {
    run(0L, Seq(1L -> base,
      2L -> "completely different words entirely here nothing shared"))
    run(1L, Seq(10L -> base.replace("sigma", "SIGMA"),
      11L -> ("foo bar " * 12).trim))
    run(2L, Seq(20L -> ("foo bar " * 12).trim,
      21L -> ("foo bar " * 12).trim))
  }

  test("pair history identical across flat -> migrate -> bucketed " +
    "(incl. an identical replay straddling the migration) vs an " +
    "always-bucketed control; the migrated store arrives folded, " +
    "watermarked, and group-manifested") {
    val dir = java.nio.file.Files
      .createTempDirectory("mig-main").toString
    val side = s"$dir/side"; val pairs = s"$dir/pairs"
    val band = s"$dir/band"
    val cSide = s"$dir/cside"; val cPairs = s"$dir/cpairs"
    val cBand = s"$dir/cband"
    // MAIN: flat history...
    script(probe(_, _, side, pairs, None))
    // ...one engine call...
    val r = StreamNearDedup.migrateToBucketed(spark, side, band,
      buckets = 8)
    assert(r.migrated && r.docs === 6L &&
      r.preservedBatch === Some(2L))
    // the migrated layout: everything below the max batch is in the
    // base generation (the store arrives already folded — no aged
    // first trigger), the max batch's leaf is preserved for the
    // straddling replay, the watermark proves its writes started
    val sideT = spark.read.parquet(side)
    assert(sideT.select("batch_id").distinct().as[Long].collect()
      .toSet === Set(graft.state.Generations.BaseBatchId, 2L))
    assert(sideT.filter(col("batch_id") === 2L)
      .select("id").as[Long].collect().toSet === Set(20L, 21L))
    assert(sideT.columns.contains("id_bucket"))
    val (fs, sp) = {
      val p = new org.apache.hadoop.fs.Path(side)
      (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
    }
    assert(graft.state.Generations.lastBatchWatermark(fs, sp)
      .contains(2L))
    // marker handshake fully installed: a bucketed restart passes,
    // and the group manifest ages the pair off one maintain() entry
    assert(graft.state.Layout.setsSideTable(side)
      .modulus(spark).contains(8))
    assert(graft.state.Layout.bandSideTable(band)
      .modulus(spark).contains(8))
    assert(graft.state.Layout.readGroupManifest(fs, sp)
      .exists(_.fold.toSet === Set(side, band)))
    // ...replay of the straddling batch (crash before its checkpoint
    // commit), now in BUCKETED mode, then the stream continues
    def bucketed(b: Long, docs: Seq[(Long, String)]): Long =
      probe(b, docs, side, pairs, Some(band))
    bucketed(2L, Seq(20L -> ("foo bar " * 12).trim,
      21L -> ("foo bar " * 12).trim))
    bucketed(3L, Seq(30L -> base.replace("rho", "RHO")))
    // CONTROL: the same story, bucketed from birth
    def ctl(b: Long, docs: Seq[(Long, String)]): Long =
      probe(b, docs, cSide, cPairs, Some(cBand))
    script(ctl)
    ctl(2L, Seq(20L -> ("foo bar " * 12).trim,
      21L -> ("foo bar " * 12).trim))
    ctl(3L, Seq(30L -> base.replace("rho", "RHO")))
    // the headline: identical pair history, identical corpus
    assert(pairSet(pairs) === pairSet(cPairs) &&
      pairSet(pairs).nonEmpty)
    assert(ids(side) === ids(cSide) && ids(side).size === 7)
    assert(ids(band) === ids(cBand))
  }

  test("a DRIFTED replay straddling the migration leaves no ghosts: " +
    "the preserved max-batch leaf is scrubbed like any bucketed " +
    "replay, pairs included") {
    val dir = java.nio.file.Files
      .createTempDirectory("mig-drift").toString
    val side = s"$dir/side"; val pairs = s"$dir/pairs"
    val band = s"$dir/band"
    probe(0L, Seq(1L -> base), side, pairs, None)
    // batch 1 emits a pair in FLAT mode, then crashes pre-commit
    probe(1L, Seq(10L -> base.replace("mu", "MU")), side, pairs, None)
    assert(pairSet(pairs) === Set((10L, 1L, 1L)))
    val r = StreamNearDedup.migrateToBucketed(spark, side, band,
      buckets = 8)
    assert(r.preservedBatch === Some(1L))
    // the replay delivers DIFFERENT rows (non-replayable source):
    // batch 1's flat-written doc AND its pair must not survive
    probe(1L, Seq(99L -> "entirely unrelated replacement row text"),
      side, pairs, Some(band))
    assert(ids(side) === Set(1L, 99L), "sets ghost")
    assert(ids(band) === Set(1L, 99L), "band ghost")
    assert(pairSet(pairs).isEmpty, "pairs ghost survived migration")
  }

  test("idempotent + crash-safe: a re-run is a no-op, stale staging " +
    "is discarded, and a crash between the swap's renames is " +
    "completed at the next entry") {
    val dir = java.nio.file.Files
      .createTempDirectory("mig-crash").toString
    val side = s"$dir/side"; val pairs = s"$dir/pairs"
    val band = s"$dir/band"
    probe(0L, Seq(1L -> base), side, pairs, None)
    probe(1L, Seq(10L -> base.replace("sigma", "SIGMA")), side,
      pairs, None)
    assert(StreamNearDedup.migrateToBucketed(spark, side, band,
      buckets = 8).migrated)
    val before = ids(side)
    // re-run: already bucketed at the requested modulus — no-op
    val r2 = StreamNearDedup.migrateToBucketed(spark, side, band,
      buckets = 8)
    assert(!r2.migrated && ids(side) === before)
    // mid-swap crash, reconstructed on disk: the live table renamed
    // away (old holds it), staging complete and waiting — entry-time
    // recovery must finish the swap, then report the no-op
    val conf = spark.sparkContext.hadoopConfiguration
    val sp = new org.apache.hadoop.fs.Path(side)
    val fs = sp.getFileSystem(conf)
    val staging = new org.apache.hadoop.fs.Path(
      sp.getParent, "." + sp.getName + "__migrate")
    val old = new org.apache.hadoop.fs.Path(
      sp.getParent, "." + sp.getName + "__migrate_old")
    assert(fs.rename(sp, staging))
    fs.mkdirs(old)
    fs.create(new org.apache.hadoop.fs.Path(old, "junk.parquet"),
      true).close()
    val r3 = StreamNearDedup.migrateToBucketed(spark, side, band,
      buckets = 8)
    assert(!r3.migrated && ids(side) === before)
    assert(!fs.exists(staging) && !fs.exists(old))
    // the recovered store still serves the bucketed stream
    assert(probe(2L, Seq(20L -> base.replace("tau", "TAU")), side,
      pairs, Some(band)) === 2L)
    // stale staging next to a LIVE flat table is discarded, the
    // migration proceeds normally
    val dir2 = java.nio.file.Files
      .createTempDirectory("mig-stale").toString
    val side2 = s"$dir2/side"
    probe(0L, Seq(1L -> base), side2, s"$dir2/pairs", None)
    val sp2 = new org.apache.hadoop.fs.Path(side2)
    val staging2 = new org.apache.hadoop.fs.Path(
      sp2.getParent, "." + sp2.getName + "__migrate")
    fs.mkdirs(staging2)
    fs.create(new org.apache.hadoop.fs.Path(staging2, "junk"),
      true).close()
    assert(StreamNearDedup.migrateToBucketed(spark, side2,
      s"$dir2/band", buckets = 8).migrated)
    assert(!fs.exists(staging2))
    assert(ids(side2) === Set(1L))
  }

  test("guards, all refusing BEFORE anything is deleted: missing " +
    "side, foreign side marker, modulus mismatch, foreign band data") {
    val dir = java.nio.file.Files
      .createTempDirectory("mig-guard").toString
    // missing side table
    val e0 = intercept[IllegalArgumentException] {
      StreamNearDedup.migrateToBucketed(spark, s"$dir/nope",
        s"$dir/band") }
    assert(e0.getMessage.contains("does not exist"))
    // a foreign marker on the side dir (someone pointed the call at
    // a reply index): refuse with the found contents
    val reply = s"$dir/reply"
    Seq((1L, "a")).toDF("k", "v").write.parquet(reply)
    val rp = new org.apache.hadoop.fs.Path(reply)
    val fs = rp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.state.Layout.writeLayoutMarker(fs, rp, "reply_buckets", 4)
    val e1 = intercept[IllegalArgumentException] {
      StreamNearDedup.migrateToBucketed(spark, reply, s"$dir/band") }
    assert(e1.getMessage.contains("foreign layout marker"))
    // an already-bucketed store at a DIFFERENT modulus: a modulus
    // change is a rebuild, not a migration
    val side = s"$dir/side"; val pairs = s"$dir/pairs"
    val band = s"$dir/band"
    probe(0L, Seq(1L -> base), side, pairs, None)
    probe(1L, Seq(10L -> base.replace("pi", "PI")), side, pairs, None)
    StreamNearDedup.migrateToBucketed(spark, side, band, buckets = 8)
    val e2 = intercept[IllegalArgumentException] {
      StreamNearDedup.migrateToBucketed(spark, side, band,
        buckets = 16) }
    assert(e2.getMessage.contains("moduli must match"))
    // band dir holding unmarked data: never delete a foreign table
    val side3 = s"$dir/side3"
    probe(0L, Seq(1L -> base), side3, s"$dir/pairs3", None)
    val foreign = s"$dir/foreign"
    Seq((1L, "x")).toDF("a", "b").write.parquet(foreign)
    val e3 = intercept[IllegalArgumentException] {
      StreamNearDedup.migrateToBucketed(spark, side3, foreign) }
    assert(e3.getMessage.contains("without a band_buckets marker"))
    // the refused migrations left the flat table fully intact
    assert(ids(side3) === Set(1L))
    assert(spark.read.parquet(foreign).count() === 1)
  }

  test("a fully-folded flat table (base generation only) migrates " +
    "with no preserved batch and no watermark; the bucketed stream " +
    "probes the migrated base") {
    val dir = java.nio.file.Files
      .createTempDirectory("mig-folded").toString
    val side = s"$dir/side"; val pairs = s"$dir/pairs"
    val band = s"$dir/band"
    probe(0L, Seq(1L -> base), side, pairs, None)
    probe(1L, Seq(2L ->
      "completely different words entirely here nothing shared"),
      side, pairs, None)
    // the operator folded the flat table by hand (documented serial
    // form) — only the base generation remains
    graft.state.Generations.foldBatches(spark, side, horizon = 2L)
    val r = StreamNearDedup.migrateToBucketed(spark, side, band,
      buckets = 8)
    assert(r.migrated && r.docs === 2L && r.preservedBatch.isEmpty)
    val sp = new org.apache.hadoop.fs.Path(side)
    val fs = sp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(graft.state.Generations.lastBatchWatermark(fs, sp).isEmpty)
    // absent watermark on a data-bearing table = "possible replay":
    // the first bucketed batch takes the ghost-glob path, finds
    // nothing, probes the base, re-establishes the watermark
    assert(probe(5L, Seq(30L -> base.replace("rho", "RHO")), side,
      pairs, Some(band)) === 1L)
    assert(graft.state.Generations.lastBatchWatermark(fs, sp)
      .contains(5L))
  }
}
