package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Streaming incremental near-dup (foreachBatch unit): cross-batch
  * probing, intra-batch pairs, replay idempotence. */
class StreamNearDedupSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"

  test("batches probe the accumulated corpus; replay overwrites in place") {
    val dir = java.nio.file.Files
      .createTempDirectory("snd").toString
    val side = s"$dir/side"; val pairs = s"$dir/pairs"
    def run(batchId: Long, docs: Seq[(Long, String)]): Long =
      StreamNearDedup.probeAndAppend(spark,
        docs.toDF("doc_id", "text"), batchId, side, pairs,
        threshold = 0.2)
    // zero-pair batches never create the pairs table — readers
    // supply the schema (the operator's documented contract)
    def pairSet(): Set[(Long, Long, Long)] =
      spark.read.schema(
          "new_id long, old_id long, n_inter long, n_union long, " +
            "batch_id long")
        .parquet(pairs)
        .select(col("new_id"), col("old_id"), col("batch_id"))
        .as[(Long, Long, Long)].collect().toSet

    // batch 0: two unrelated docs — no pairs, side table seeded
    assert(run(0L, Seq(1L -> base,
      2L -> "completely different words entirely here nothing shared"))
      === 0L)
    assert(spark.read.parquet(side).count() === 2)

    // batch 1: near-dup of doc 1 + fresh doc — one cross-batch pair
    run(1L, Seq(10L -> base.replace("sigma", "SIGMA"),
      11L -> ("foo bar " * 12).trim))
    assert(pairSet() === Set((10L, 1L, 1L)))

    // batch 2: exact dup of 11 twice — cross-batch AND intra-batch
    run(2L, Seq(20L -> ("foo bar " * 12).trim,
      21L -> ("foo bar " * 12).trim))
    assert(pairSet() === Set((10L, 1L, 1L),
      (20L, 11L, 2L), (21L, 11L, 2L), (20L, 21L, 2L)))
    assert(spark.read.parquet(side).count() === 6)

    // replay batch 2 (post-crash redelivery): nothing duplicates,
    // and the batch does not pair against its own first run
    run(2L, Seq(20L -> ("foo bar " * 12).trim,
      21L -> ("foo bar " * 12).trim))
    assert(pairSet() === Set((10L, 1L, 1L),
      (20L, 11L, 2L), (21L, 11L, 2L), (20L, 21L, 2L)))
    assert(spark.read.parquet(side).count() === 6)
  }

  test("bucketed mode (bandDir): same pair history as flat mode, " +
    "replay-idempotent, both layouts maintained per batch") {
    val dir = java.nio.file.Files
      .createTempDirectory("snd-bucketed").toString
    val side = s"$dir/side"; val pairs = s"$dir/pairs"
    val band = s"$dir/band"
    def run(batchId: Long, docs: Seq[(Long, String)]): Long =
      StreamNearDedup.probeAndAppend(spark,
        docs.toDF("doc_id", "text"), batchId, side, pairs,
        threshold = 0.2, bandDir = Some(band), buckets = 8)
    def pairSet(): Set[(Long, Long, Long)] =
      spark.read.schema(
          "new_id long, old_id long, n_inter long, n_union long, " +
            "batch_id long")
        .parquet(pairs)
        .select(col("new_id"), col("old_id"), col("batch_id"))
        .as[(Long, Long, Long)].collect().toSet

    // the flat-mode spec's exact batch script — the bucketed mode
    // must tell the same story
    assert(run(0L, Seq(1L -> base,
      2L -> "completely different words entirely here nothing shared"))
      === 0L)
    run(1L, Seq(10L -> base.replace("sigma", "SIGMA"),
      11L -> ("foo bar " * 12).trim))
    assert(pairSet() === Set((10L, 1L, 1L)))
    run(2L, Seq(20L -> ("foo bar " * 12).trim,
      21L -> ("foo bar " * 12).trim))
    val want = Set((10L, 1L, 1L),
      (20L, 11L, 2L), (21L, 11L, 2L), (20L, 21L, 2L))
    assert(pairSet() === want)
    // replay batch 2: nothing duplicates, no self-pairs
    run(2L, Seq(20L -> ("foo bar " * 12).trim,
      21L -> ("foo bar " * 12).trim))
    assert(pairSet() === want)
    // both layouts hold exactly the corpus, partitioned by their
    // bucket: 6 set rows; 8 band rows per doc (bands=8 default)
    val sideT = spark.read.parquet(side)
    assert(sideT.count() === 6 &&
      sideT.columns.contains("id_bucket"))
    val bandT = spark.read.parquet(band)
    assert(bandT.count() === 48 &&
      bandT.columns.contains("band_bucket"))
  }

  test("bucketed mode guards: modulus drift and mode switches fail " +
    "loud; a replay with a DRIFTED row set leaves no ghosts") {
    val dir = java.nio.file.Files
      .createTempDirectory("snd-guards").toString
    val side = s"$dir/side"; val pairs = s"$dir/pairs"
    val band = s"$dir/band"
    def run(batchId: Long, docs: Seq[(Long, String)],
            bd: Option[String] = Some(band), n: Int = 8): Long =
      StreamNearDedup.probeAndAppend(spark,
        docs.toDF("doc_id", "text"), batchId, side, pairs,
        threshold = 0.2, bandDir = bd, buckets = n)
    run(0L, Seq(1L -> base))
    // restart with a different modulus: silent mis-prune forbidden
    val e1 = intercept[IllegalArgumentException] {
      run(1L, Seq(2L -> base), n = 1024) }
    assert(e1.getMessage.contains("moduli must match"))
    // restart in FLAT mode against the bucketed table: forbidden
    // (flat batch_id partitions would corrupt the bucket-major tree)
    val e2 = intercept[IllegalArgumentException] {
      run(1L, Seq(2L -> base), bd = None) }
    assert(e2.getMessage.contains("bucketed-mode table"))
    // replay batch 0 with DIFFERENT rows (non-replayable source):
    // the first attempt's rows must not survive as ghosts — doc 1's
    // sets/bands hash to buckets doc 99 never touches
    run(0L, Seq(99L ->
      "totally different replacement row for the replay"))
    val sideIds = spark.read.parquet(side)
      .select("id").as[Long].collect().toSet
    assert(sideIds === Set(99L), s"ghost rows: $sideIds")
    assert(spark.read.parquet(band)
      .select("id").as[Long].collect().toSet === Set(99L))
    // ...and the PAIRS table: batch 1 emits a pair, then its drifted
    // replay emits none — the first attempt's pair must not survive
    // as a ghost referencing scrubbed rows
    def batch2Pairs(): Long = spark.read.schema(
        "new_id long, old_id long, n_inter long, n_union long, " +
          "batch_id long")
      .parquet(pairs).filter(col("batch_id") === 2L).count()
    run(1L, Seq(100L -> base))
    run(2L, Seq(200L -> base.replace("mu", "MU")))
    assert(batch2Pairs() === 1L)
    run(2L, Seq(201L ->
      "nothing resembling any stored document at all"))
    assert(batch2Pairs() === 0L,
      "pairs ghost survived a drifted replay")
    // and the flat mode refuses nothing it owns: a fresh flat table
    // then rejects a bucketed restart (the reverse switch)
    val dir2 = java.nio.file.Files
      .createTempDirectory("snd-guards2").toString
    StreamNearDedup.probeAndAppend(spark,
      Seq(1L -> base).toDF("doc_id", "text"), 0L,
      s"$dir2/side", s"$dir2/pairs", threshold = 0.2)
    val e3 = intercept[IllegalArgumentException] {
      StreamNearDedup.probeAndAppend(spark,
        Seq(2L -> base).toDF("doc_id", "text"), 1L,
        s"$dir2/side", s"$dir2/pairs", threshold = 0.2,
        bandDir = Some(s"$dir2/band"), buckets = 8) }
    assert(e3.getMessage.contains("flat mode"))
    // a bucketed store whose layout marker was HAND-DELETED still
    // refuses a flat restart: the group manifest alone proves the
    // dir belongs to a maintained bucketed tree
    val smp = new org.apache.hadoop.fs.Path(side,
      "_graft_layout.json")
    val sfs = smp.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(sfs.delete(smp, false))
    val e4 = intercept[IllegalArgumentException] {
      run(3L, Seq(300L -> base), bd = None) }
    assert(e4.getMessage.contains("maintenance-group manifest"))
  }

  test("run(): a real StreamingQuery end-to-end — per-file batches, " +
    "fold cadence folds expired leaves mid-stream, checkpoint " +
    "restart continues, and the folded base is still probed") {
    val dir = java.nio.file.Files
      .createTempDirectory("snd-run").toString
    val in = s"$dir/in"; val side = s"$dir/side"
    val pairs = s"$dir/pairs"; val band = s"$dir/band"
    val cp = s"$dir/cp"
    new java.io.File(in).mkdirs()
    def writeDocs(name: String, docs: Seq[(Long, String)]): Unit = {
      val f = new java.io.File(in, name)
      val w = new java.io.PrintWriter(f)
      try docs.foreach { case (id, t) =>
        w.println(s"""{"doc_id": $id, "text": "$t"}""") }
      finally w.close()
      // file sources order by modification time — keep batches apart
      f.setLastModified(System.currentTimeMillis())
      Thread.sleep(1100)
    }
    writeDocs("b0.json", Seq(1L -> base,
      2L -> "completely different words entirely here nothing shared"))
    writeDocs("b1.json", Seq(10L -> base.replace("sigma", "SIGMA")))
    writeDocs("b2.json", Seq(20L -> base.replace("tau", "TAU")))
    def runOnce(): Unit = {
      val q = StreamNearDedup.run(spark, in, side, pairs, cp,
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow(),
        maxFilesPerTrigger = 1, threshold = 0.2,
        bandDir = Some(band), buckets = 8, foldEvery = Some(2),
        agePairs = true)
      q.awaitTermination()
    }
    runOnce()
    val pairsSchema =
      "new_id long, old_id long, n_inter long, n_union long, " +
        "src_batch_id long, batch_id long"
    def undirected(): Set[Set[Long]] = spark.read.schema(pairsSchema)
      .parquet(pairs).select("new_id", "old_id")
      .as[(Long, Long)].collect().toSet.map((p: (Long, Long)) =>
        Set(p._1, p._2))
    assert(undirected() === Set(Set(1L, 10L), Set(1L, 20L),
      Set(10L, 20L)))
    // foldEvery=2 fired at batch 2 with horizon 2: batches 0 and 1
    // are in the base generation, batch 2's leaves survive
    val sideT = spark.read.parquet(side)
    assert(sideT.filter(col("batch_id") ===
        graft.state.Generations.BaseBatchId)
      .select("id").as[Long].collect().toSet === Set(1L, 2L, 10L))
    assert(sideT.filter(col("batch_id") === 2L)
      .select("id").as[Long].collect().toSet === Set(20L))
    // restart from the checkpoint: the next file becomes batch 3 and
    // its probe sees folded-base rows AND leaf rows alike
    writeDocs("b3.json", Seq(30L -> base.replace("rho", "RHO")))
    runOnce()
    assert(undirected() === Set(Set(1L, 10L), Set(1L, 20L),
      Set(10L, 20L), Set(30L, 1L), Set(30L, 10L), Set(30L, 20L)))
    assert(spark.read.parquet(side).count() === 5)
    // agePairs: batch 1's pair leaf folded to the base at horizon 2,
    // but its provenance rides the src_batch_id DATA column; batches
    // ≥ horizon keep their leaves
    val provs = spark.read.schema(pairsSchema).parquet(pairs)
      .select(array_sort(array(col("new_id"), col("old_id"))),
        col("src_batch_id"), col("batch_id"))
      .as[(Seq[Long], Long, Long)].collect()
      .map(r => (r._1.toSet, r._2, r._3)).toSet
    assert(provs === Set(
      (Set(1L, 10L), 1L, graft.state.Generations.BaseBatchId),
      (Set(1L, 20L), 2L, 2L),
      (Set(10L, 20L), 2L, 2L),
      (Set(30L, 1L), 3L, 3L),
      (Set(30L, 10L), 3L, 3L),
      (Set(30L, 20L), 3L, 3L)))
  }

  test("run() default contract: with agePairs=false the fold NEVER " +
    "touches the pairs table — batch_id leaves survive as " +
    "provenance and no src column is written") {
    val dir = java.nio.file.Files
      .createTempDirectory("snd-defpairs").toString
    val in = s"$dir/in"; val side = s"$dir/side"
    val pairs = s"$dir/pairs"; val band = s"$dir/band"
    new java.io.File(in).mkdirs()
    def writeDocs(name: String, docs: Seq[(Long, String)]): Unit = {
      val f = new java.io.File(in, name)
      val w = new java.io.PrintWriter(f)
      try docs.foreach { case (id, t) =>
        w.println(s"""{"doc_id": $id, "text": "$t"}""") }
      finally w.close()
      f.setLastModified(System.currentTimeMillis())
      Thread.sleep(1100)
    }
    writeDocs("b0.json", Seq(1L -> base))
    writeDocs("b1.json", Seq(10L -> base.replace("sigma", "SIGMA")))
    writeDocs("b2.json", Seq(20L -> base.replace("tau", "TAU")))
    val q = StreamNearDedup.run(spark, in, side, pairs, s"$dir/cp",
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow(),
      maxFilesPerTrigger = 1, threshold = 0.2,
      bandDir = Some(band), buckets = 8, foldEvery = Some(2))
    q.awaitTermination()
    // the side tables folded at batch 2 (horizon 2) — the pairs table
    // did NOT: its per-batch provenance leaves are intact
    val pt = spark.read.parquet(pairs)
    assert(pt.columns.sorted.toSeq ===
      Seq("batch_id", "n_inter", "n_union", "new_id", "old_id"))
    assert(pt.select("batch_id").as[Long].collect().toSet ===
      Set(1L, 2L))
    assert(spark.read.parquet(side)
      .filter(col("batch_id") === graft.state.Generations.BaseBatchId)
      .count() > 0)
  }

  test("AUTO cadence invariant: an un-tuned probe loop (run()'s " +
    "exact per-batch composition) NEVER reaches the measured " +
    "task-bound regime — leaves-per-bucket stays bounded by the " +
    "threshold, and pair history matches a never-folded control") {
    import StreamNearDedup.Defaults
    val dir = java.nio.file.Files
      .createTempDirectory("snd-auto").toString
    val side = s"$dir/side"; val pairs = s"$dir/pairs"
    val band = s"$dir/band"
    val ctlSide = s"$dir/cside"; val ctlPairs = s"$dir/cpairs"
    val ctlBand = s"$dir/cband"
    // buckets=2 so every 2-doc batch touches ~all buckets: leaves
    // per bucket grow ~1/batch — 30 batches would age to ~30
    // leaves/bucket un-folded, PAST the measured ~22.6 task-bound
    // wall; the auto cadence must keep it under the threshold
    def batchDocs(b: Long) = Seq(
      b * 10 -> base.replace("alpha", s"A$b"),
      b * 10 + 1 -> s"unique filler text number $b with nothing shared")
    var maxLpb = 0.0
    var folds = 0
    for (b <- 0L until 30L) {
      val docs = batchDocs(b).toDF("doc_id", "text")
      StreamNearDedup.probeAndAppend(spark, docs, b, side, pairs,
        threshold = 0.2, bandDir = Some(band), buckets = 2)
      // run()'s default maintenance, verbatim: auto decision + fold
      if (StreamNearDedup.maybeAutoFold(spark, side, Some(band),
          None, horizon = b).nonEmpty) folds += 1
      // BOTH tables must stay healthy — the band table ages faster
      // per bucket (bands rows per doc), which is why the decision
      // is the max over the two samples
      maxLpb = math.max(maxLpb, math.max(
        graft.state.Generations.sampleLeavesPerBucket(spark, side),
        graft.state.Generations.sampleLeavesPerBucket(spark, band)))
      // the never-folded control
      StreamNearDedup.probeAndAppend(spark, docs, b, ctlSide,
        ctlPairs, threshold = 0.2, bandDir = Some(ctlBand),
        buckets = 2)
    }
    // the invariant the auto cadence exists for: the store NEVER
    // ages into the task-bound regime (measured at ~22.6
    // leaves/bucket), and in fact never exceeds the fire threshold
    // (the fold runs the same trigger the sample crosses it)
    assert(folds >= 2, s"auto cadence never fired (folds=$folds)")
    assert(maxLpb <= Defaults.AutoFoldLeavesPerBucket,
      s"auto-folded store aged past the threshold: $maxLpb")
    // the un-tuned control DID age — the invariant is not vacuous
    assert(graft.state.Generations.sampleLeavesPerBucket(spark,
      ctlSide) > Defaults.AutoFoldLeavesPerBucket * 2)
    // folding never changed what the stream found
    val sch = "new_id long, old_id long, n_inter long, " +
      "n_union long, batch_id long"
    def hist(d: String) = spark.read.schema(sch).parquet(d)
      .select("new_id", "old_id").as[(Long, Long)].collect().toSet
    assert(hist(pairs) === hist(ctlPairs) && hist(pairs).nonEmpty)
  }

  test("un-tuned run(): the real StreamingQuery with NO cadence " +
    "argument auto-folds mid-stream — the base generation appears " +
    "without the caller ever passing foldEvery") {
    val dir = java.nio.file.Files
      .createTempDirectory("snd-autorun").toString
    val in = s"$dir/in"; val side = s"$dir/side"
    val pairs = s"$dir/pairs"; val band = s"$dir/band"
    new java.io.File(in).mkdirs()
    // explicit spaced mtimes (no sleeps): the file source orders
    // batches by modification time
    val t0 = System.currentTimeMillis() - 600000L
    for (b <- 0 until 10) {
      val f = new java.io.File(in, f"b$b%02d.json")
      val w = new java.io.PrintWriter(f)
      // 24 docs/batch across buckets=8 → every batch touches all
      // buckets, leaves/bucket grows ~1/batch → the default
      // threshold (8.0) fires inside 10 batches
      try (0 until 24).foreach { i =>
        w.println(s"""{"doc_id": ${b * 100 + i}, "text": "doc $b $i """ +
          s"""filler words ${b * 100 + i} more tokens here"}""") }
      finally w.close()
      f.setLastModified(t0 + b * 2000L)
    }
    val q = StreamNearDedup.run(spark, in, side, pairs, s"$dir/cp",
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow(),
      maxFilesPerTrigger = 1, threshold = 0.2,
      bandDir = Some(band), buckets = 8)
    q.awaitTermination()
    // the engine folded on its own: a base generation exists in both
    // side tables and the store is healthy (bounded leaves/bucket)
    for (d <- Seq(side, band)) {
      assert(spark.read.parquet(d)
        .filter(col("batch_id") === graft.state.Generations.BaseBatchId)
        .count() > 0, s"no base generation in $d — auto fold never ran")
      assert(graft.state.Generations.sampleLeavesPerBucket(spark, d)
        <= StreamNearDedup.Defaults.AutoFoldLeavesPerBucket, d)
    }
    // every doc is in the corpus exactly once (folds lose nothing)
    assert(spark.read.parquet(side).count() === 240)
  }

  test("pairProvenanceCol refuses reserved/colliding names: " +
    "\"batch_id\" (the layout column the fold collapses) and " +
    "existing pair columns would be silently overwritten") {
    val dir = java.nio.file.Files
      .createTempDirectory("snd-prov").toString
    def run(c: String): Long =
      StreamNearDedup.probeAndAppend(spark,
        Seq(1L -> base).toDF("doc_id", "text"), 0L,
        s"$dir/side-$c", s"$dir/pairs-$c", threshold = 0.2,
        bandDir = Some(s"$dir/band-$c"), buckets = 8,
        pairProvenanceCol = Some(c))
    val e1 = intercept[IllegalArgumentException] { run("batch_id") }
    assert(e1.getMessage.contains("LAYOUT column"))
    val e2 = intercept[IllegalArgumentException] { run("new_id") }
    assert(e2.getMessage.contains("collides with a pairs column"))
    // a fresh non-colliding name still works
    assert(run("src_batch_id") === 0L)
  }

  test("recommendedBandDir pins the measured d44e crossover: flat " +
    "below the floor, bucketed at/above") {
    import StreamNearDedup.{Defaults, recommendedBandDir}
    assert(recommendedBandDir(0L, "bd").isEmpty)
    assert(recommendedBandDir(Defaults.BucketedCorpusFloor - 1, "bd")
      .isEmpty)
    assert(recommendedBandDir(Defaults.BucketedCorpusFloor, "bd")
      .contains("bd"))
    assert(recommendedBandDir(Long.MaxValue, "bd").contains("bd"))
    // the floor sits between the measured decades (flat wins at
    // 500k, bucketed at 5M — BENCH_NOTES d44e)
    assert(Defaults.BucketedCorpusFloor > 500000L &&
      Defaults.BucketedCorpusFloor < 5000000L)
  }

  test("a MISSING replay watermark on a data-bearing table is not " +
    "proof of a first run: drifted-replay ghosts are still cleared") {
    val dir = java.nio.file.Files
      .createTempDirectory("snd-nowm").toString
    val side = s"$dir/side"; val pairs = s"$dir/pairs"
    val band = s"$dir/band"
    def run(batchId: Long, docs: Seq[(Long, String)]): Long =
      StreamNearDedup.probeAndAppend(spark,
        docs.toDF("doc_id", "text"), batchId, side, pairs,
        threshold = 0.2, bandDir = Some(band), buckets = 8)
    run(0L, Seq(1L -> base))
    run(1L, Seq(10L -> base.replace("sigma", "SIGMA")))
    // a pre-watermark table / hand-deleted file: absence must fall
    // back to the ghost clears, never skip them
    val wm = new org.apache.hadoop.fs.Path(side,
      "_graft_last_batch.json")
    val fs = wm.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(wm, false))
    run(1L, Seq(99L -> "entirely unrelated replacement row text"))
    assert(spark.read.parquet(side).select("id").as[Long]
      .collect().toSet === Set(1L, 99L))
    assert(spark.read.parquet(band).select("id").as[Long]
      .collect().toSet === Set(1L, 99L))
    // ...and the watermark is re-established for the next batches
    assert(graft.state.Generations.lastBatchWatermark(fs,
      new org.apache.hadoop.fs.Path(side)).contains(1L))
  }

  test("an EMPTY first batch (recovery replay) does not wedge the " +
    "stream: the side read carries an explicit schema") {
    val dir = java.nio.file.Files
      .createTempDirectory("snd-empty").toString
    val side = s"$dir/side"; val pairs = s"$dir/pairs"
    def run(batchId: Long, docs: Seq[(Long, String)]): Long =
      StreamNearDedup.probeAndAppend(spark,
        docs.toDF("doc_id", "text"), batchId, side, pairs,
        threshold = 0.2)
    // batch 0 delivers no rows: sideDir ends up with only _SUCCESS
    assert(run(0L, Seq.empty) === 0L)
    // batch 1 must still read the (empty) side table and proceed
    assert(run(1L, Seq(1L -> base)) === 0L)
    assert(run(2L, Seq(2L -> base.replace("pi", "PI"))) === 1L)
  }
}
