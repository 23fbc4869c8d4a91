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

  /** The reply-tree access path's OWN layout — the secondary-index
    * analogue of the reference's `{parent_permlink, parent_author}`
    * Mongo index (it declares one for exactly this query). The posts
    * store buckets rows by their own key, so a `children(of: key)`
    * probe cannot prune there; this slim projection (parent key,
    * child key, the child-page ordering column) is bucketed by the
    * PARENT key instead: a children page then reads ≤|page keys|
    * buckets of a table that is a few % of the store's width, ranks
    * on it, and fetches only the ≤ page×limit surviving child rows
    * from the main store (key-bucket pruned in turn). This is the
    * full-rebuild form; the streaming merge maintains the same index
    * incrementally per micro-batch
    * ([[graft.streaming.StreamIngest.refreshReplyIndex]] — the delta
    * is the batch's own replies, so the refresh is batch-sized). */
  def writeReplyIndex(posts: DataFrame, dir: String, n: Int): Unit =
    // full rebuild under the shared marker-before-data protocol
    // ([[rebuildWithMarker]]); dynamic-mode write so the fresh marker
    // survives the overwrite
    rebuildWithMarker(posts.sparkSession, dir, "reply_buckets", n) {
      writeReplyIndexRows(replyIndexRows(posts, n), dir)
    }

  /** The index's row projection — shared by the full rebuild above
    * and the incremental per-batch refresh
    * ([[graft.streaming.StreamIngest.refreshReplyIndex]]) so the two
    * forms cannot drift. */
  def replyIndexRows(posts: DataFrame, n: Int): DataFrame =
    posts
      .filter(col("parent_author") =!= "" &&
        col("parent_author").isNotNull)
      .select(col("parent_author"), col("parent_permlink"),
        col("author"), col("permlink"), col("created_at"))
      .withColumn("reply_bucket",
        keyBucket(col("parent_author"), col("parent_permlink"), n))

  /** An EMPTY frame with the reply index's exact row schema, routed
    * THROUGH [[replyIndexRows]] (the one projection) so a column or
    * type change there breaks this loudly at analysis time instead
    * of letting a hand-copied schema drift (it feeds the
    * no-index-leaves short-circuit of the leaf-enumerated children
    * probe). */
  def emptyReplyIndexRows(spark: SparkSession): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types._
    val posts = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("parent_author", StringType),
        StructField("parent_permlink", StringType),
        StructField("author", StringType),
        StructField("permlink", StringType),
        StructField("created_at", TimestampType))))
    replyIndexRows(posts, 1)
  }

  /** Shared physical write: bucket-partitioned, parent-key sorted,
    * dynamic overwrite (replaces only the buckets present in `rows` —
    * everything for a rebuild, the touched set for a refresh — and
    * never deletes the layout marker). */
  def writeReplyIndexRows(rows: DataFrame, dir: String): Unit =
    rows
      .repartition(col("reply_bucket"))
      .sortWithinPartitions("parent_author", "parent_permlink",
        "created_at")
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("reply_bucket")
      .parquet(dir)

  /** The crash-window-sensitive REBUILD protocol, shared by every
    * bucketed layout (reply index, dedup band/sets side tables):
    * clear any previous generation, write the modulus marker BEFORE
    * data (data without its modulus wedges every strict consumer; a
    * marker-only dir reads as a crashed create), then run the
    * caller's dynamic-mode write (which never deletes the marker).
    * One definition so a protocol fix cannot diverge per layout. */
  def rebuildWithMarker(spark: SparkSession, dir: String,
                        markerKey: String, n: Int)
                       (write: => Unit): Unit = {
    val table = new org.apache.hadoop.fs.Path(dir)
    val fs = table.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(table, true)
    writeLayoutMarker(fs, table, markerKey, n)
    write
  }

  /** A bucketed table's modulus from its layout marker (None =
    * unmarked/flat/unreadable → consumers must scan, not prune). */
  def markedBuckets(spark: SparkSession, dir: String,
                    markerKey: String): Option[Int] =
    try {
      val p = new org.apache.hadoop.fs.Path(dir)
      layoutMarker(p.getFileSystem(
        spark.sparkContext.hadoopConfiguration), p, markerKey)
    } catch { case _: Exception => None }

  /** Does the table dir hold DATA (any non-underscore/dot entry)? A
    * dir holding only a layout marker is a crashed create. */
  def hasDataFiles(fs: org.apache.hadoop.fs.FileSystem,
                   table: org.apache.hadoop.fs.Path): Boolean =
    fs.exists(table) && fs.listStatus(table).exists { st =>
      val nm = st.getPath.getName
      !nm.startsWith("_") && !nm.startsWith(".")
    }

  /** The reply index's bucket modulus from its layout marker (None =
    * no marker / unreadable → treat the table as un-indexed). */
  def replyIndexBuckets(spark: SparkSession, dir: String)
      : Option[Int] =
    markedBuckets(spark, dir, "reply_buckets")

  /** ONE bucketed graft layout as a value — the single home of the
    * generation/lifecycle protocol that the reply index, the dedup
    * band table, and the dedup sets table each instantiate (the
    * posts store shares the marker half). Every primitive delegates
    * to the shared implementations ([[layoutMarker]],
    * [[rebuildWithMarker]], [[graft.state.Generations]],
    * [[compact]]), so a protocol fix lands once; the facade exists
    * so the three instances cannot re-spell the (bucketCol,
    * markerKey) pairing or drift on sentinel/marker file names —
    * and so ONE spec (LifecycleSpec) can exercise the whole
    * lifecycle against all three layouts by construction.
    *
    * Lifecycle: `rebuild` (marker-before-data full create) →
    * `ensureMarker`+incremental writes (streaming maintenance;
    * batch-appended layouts add `batch_id` leaves) →
    * `markEmptyGeneration` when a completed bootstrap wrote zero
    * rows → aging: `fold` collapses replay-expired batch leaves
    * into the per-bucket base generation (batch-appended layouts),
    * `compactFiles` bin-packs per-leaf small files (overwrite
    * layouts); `recover` completes either's crashed commit. */
  final case class BucketedTable(dir: String, bucketCol: String,
                                 markerKey: String) {
    private def fsPath(spark: SparkSession) = {
      val p = new org.apache.hadoop.fs.Path(dir)
      (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
    }
    def modulus(spark: SparkSession, strict: Boolean = false)
        : Option[Int] = {
      val (fs, p) = fsPath(spark)
      layoutMarker(fs, p, markerKey, strict)
    }
    def writeMarker(spark: SparkSession, n: Int): Unit = {
      val (fs, p) = fsPath(spark)
      fs.mkdirs(p)
      writeLayoutMarker(fs, p, markerKey, n)
    }
    /** Marker only when absent — the incremental-create rule (a
      * truncating re-write every batch would open a recurring
      * zero-byte-marker crash window; strict: present-but-corrupt
      * refuses rather than silently re-arming). */
    def ensureMarker(spark: SparkSession, n: Int): Unit =
      if (modulus(spark, strict = true).isEmpty) writeMarker(spark, n)
    def hasData(spark: SparkSession): Boolean = {
      val (fs, p) = fsPath(spark)
      hasDataFiles(fs, p)
    }
    def hasEmptyGeneration(spark: SparkSession): Boolean = {
      val (fs, p) = fsPath(spark)
      hasEmptyIndexMarker(fs, p)
    }
    def markEmptyGeneration(spark: SparkSession): Unit = {
      val (fs, p) = fsPath(spark)
      writeEmptyIndexMarker(fs, p)
    }
    def rebuild(spark: SparkSession, n: Int)(write: => Unit): Unit =
      rebuildWithMarker(spark, dir, markerKey, n)(write)
    def recover(spark: SparkSession): Unit =
      Generations.recover(spark, dir)
    def fold(spark: SparkSession, horizon: Long): Generations.FoldStats =
      Generations.foldBatches(spark, dir, horizon)
    def compactFiles(spark: SparkSession, targetBytes: Long)
        : (Long, Long) = compact(spark, dir, targetBytes)
    def maintain(spark: SparkSession,
                 foldHorizon: Option[Long] = None,
                 compactTargetBytes: Long = DefaultCompactTargetBytes)
        : MaintainReport =
      Layout.maintain(spark, dir, foldHorizon, compactTargetBytes)
    /** Leaf-enumerated read of `values`' buckets — STRICT
      * ([[readBucketLeavesStrict]]): this facade is only ever built
      * for marked layouts, where data without bucket dirs is a
      * marker/layout mismatch that must refuse, not serve an empty
      * corpus. */
    def readBuckets(spark: SparkSession, values: Seq[Int])
        : Option[DataFrame] =
      readBucketLeavesStrict(spark, dir, bucketCol, values)
  }

  /** ~128-MB output files — the standard parquet bin-pack target
    * (one comfortable HDFS/object-store block, the same size
    * ScaleEvidence's compaction stages use); partitions already at
    * or under it are never rewritten. */
  val DefaultCompactTargetBytes: Long = 128L << 20

  /** What [[maintain]] ran: the fold's stats when the layout is
    * batch-appended and a safe horizon existed, the (before, after)
    * file counts when the overwrite layout was bin-packed, or the
    * per-member fold stats when the dir carries a group manifest
    * (the whole group ages off one call). At most one shape is set —
    * the layout picks the op. `skipped` is the MANDATORY reason when
    * nothing ran but maintenance was requested on a table that looks
    * like it needs it (a batch-appended table with no safe horizon):
    * a cron calling maintain() and never reading the report still
    * gets the warn log, and a caller that does read it gets the why
    * instead of a quiet `ran=false`. */
  final case class MaintainReport(
      fold: Option[Generations.FoldStats],
      compacted: Option[(Long, Long)],
      group: Seq[(String, Generations.FoldStats)] = Nil,
      skipped: Option[String] = None) {
    def ran: Boolean = fold.nonEmpty || compacted.nonEmpty ||
      group.nonEmpty
  }

  /** ONE maintenance entry for any graft layout — the layout IS its
    * own manifest for maintenance too: inspect the directory tree and
    * run whichever aging op this layout needs, with crash recovery
    * for BOTH protocols up front ([[Generations.recover]] completes a
    * committed-but-unfinished fold; [[compact]] runs its own staging
    * recovery internally). Batch-appended layouts (any `batch_id=`
    * leaf present — the streaming side tables, an aged pairs table)
    * FOLD replay-expired leaves into the per-bucket base generation;
    * overwrite layouts (reply index, posts store) BIN-PACK small
    * files toward `compactTargetBytes`. Same single-writer contract
    * as both underlying ops: run between triggers or with the stream
    * stopped.
    *
    * The fold horizon: `foldHorizon` when given, else the table's own
    * replay watermark ([[Generations.lastBatchWatermark]] — the
    * highest batch id whose writes ever STARTED; ids below it can
    * never be re-delivered by foreachBatch, so `horizon = watermark`
    * folds exactly the leaves no replay will target).
    *
    * GROUPED tables (a `_graft_group.json` manifest, maintained by
    * the bucketed near-dup stream and [[
    * graft.streaming.StreamNearDedup.migrateToBucketed]]): maintain()
    * on ANY member folds the whole group in lockstep with the
    * horizon source's watermark — the band/pairs tables, which carry
    * no watermark of their own, age through their manifest. A
    * STANDALONE batch-appended table with neither horizon nor
    * watermark skips the fold LOG-LOUD with the reason on the report
    * (`skipped`) — never a guessed horizon, never a quiet no-op. */
  def maintain(spark: SparkSession, dir: String,
               foldHorizon: Option[Long] = None,
               compactTargetBytes: Long = DefaultCompactTargetBytes)
      : MaintainReport = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a GROUP manifest trumps the single-table inspection: entering
    // through ANY member (the band table, the un-aged pairs table)
    // ages the whole group in lockstep with the shared horizon —
    // the one case the single-table rule could not cover (band/pairs
    // carry no watermark of their own, so standalone maintain() on
    // them had to skip)
    readGroupManifest(fs, root) match {
      case Some(g) => return maintainGroup(spark, dir, g, foldHorizon)
      case None => ()
    }
    Generations.recover(spark, dir)
    // any batch_id= leaf — including a lone folded base — marks the
    // batch-appended shape (a fully-folded store must not fall
    // through to the overwrite branch)
    val batchAppended = Generations.batchLeaves(fs, root).nonEmpty
    if (batchAppended) {
      val horizon = foldHorizon
        .orElse(Generations.lastBatchWatermark(fs, root))
      horizon match {
        case Some(h) => MaintainReport(
          Some(Generations.foldBatches(spark, dir, h)), None)
        case None =>
          // LOG-LOUD skip, never a quiet no-op: the table needs
          // aging but no safe horizon exists — folding with a
          // guessed one would break replay idempotence
          val why = s"maintain($dir): batch-appended table with no " +
            "replay watermark and no foldHorizon given — fold " +
            "SKIPPED (a guessed horizon would break replay " +
            "idempotence). Pass foldHorizon, or let the owning " +
            "stream write a group manifest so the sets table's " +
            "watermark can supply it."
          org.slf4j.LoggerFactory.getLogger(getClass).warn(why)
          MaintainReport(None, None, skipped = Some(why))
      }
    } else if (hasDataFiles(fs, root))
      MaintainReport(None, Some(compact(spark, dir, compactTargetBytes)))
    else MaintainReport(None, None)
  }

  /** [[maintain]]'s group arm: fold every member in `g.fold` with the
    * ONE shared horizon — `foldHorizon` when given, else the horizon
    * source's replay watermark (the sets table: the highest batch id
    * whose writes ever started; ids below it can never be
    * re-delivered, on ANY sibling — the stream writes all members
    * from the same foreachBatch). Missing members refuse (a stale
    * manifest on a moved group must not fold half a group); a
    * horizon source with no watermark is the log-loud skip (never
    * guess). */
  private def maintainGroup(spark: SparkSession, dir: String,
                            g: MaintenanceGroup,
                            foldHorizon: Option[Long])
      : MaintainReport = {
    val conf = spark.sparkContext.hadoopConfiguration
    val missing = (g.horizonSource +: g.fold).distinct.filterNot { m =>
      val p = new org.apache.hadoop.fs.Path(m)
      p.getFileSystem(conf).exists(p)
    }
    require(missing.isEmpty,
      s"maintain($dir): group manifest names missing member(s) " +
        s"${missing.mkString(", ")} — the group moved or the " +
        "manifest is stale; folding the remaining members alone " +
        "would desynchronize the group. Restart the stream at the " +
        "new paths (it rewrites the manifests) or delete the stale " +
        "_graft_group.json.")
    val hs = new org.apache.hadoop.fs.Path(g.horizonSource)
    val horizon = foldHorizon.orElse(
      Generations.lastBatchWatermark(hs.getFileSystem(conf), hs))
    horizon match {
      case Some(h) =>
        MaintainReport(None, None,
          group = g.fold.map(m =>
            m -> Generations.foldBatches(spark, m, h)))
      case None =>
        val why = s"maintain($dir): group manifest's horizon source " +
          s"${g.horizonSource} carries no replay watermark and no " +
          "foldHorizon was given — group fold SKIPPED (a guessed " +
          "horizon would break replay idempotence)."
        org.slf4j.LoggerFactory.getLogger(getClass).warn(why)
        MaintainReport(None, None, skipped = Some(why))
    }
  }

  private val GroupManifestFile = "_graft_group.json"

  /** A maintenance GROUP: sibling tables one stream maintains
    * together (the near-dup sets/band/pairs trio), recorded in each
    * member's dir so [[maintain]] on ANY member ages the whole group.
    * `horizonSource` is the member whose replay watermark supplies
    * the shared fold horizon (the sets table — the one table the
    * stream watermarks); `fold` is the members folded in lockstep
    * (the pairs table appears only when its provenance mode lets it
    * age — an entry dir absent from `fold` still triggers the
    * group's fold, it just keeps its own leaves). */
  final case class MaintenanceGroup(horizonSource: String,
                                    fold: Seq[String])

  /** Existence probe only — for guards that must refuse on ANY
    * manifest, even a corrupt one (a parse there would fail-loud
    * with the wrong diagnosis; the flat-mode sideDir guard). */
  def hasGroupManifest(fs: org.apache.hadoop.fs.FileSystem,
                       table: org.apache.hadoop.fs.Path): Boolean =
    fs.exists(new org.apache.hadoop.fs.Path(table, GroupManifestFile))

  /** Member dir → its group manifest (None = not grouped). STRICT: a
    * present-but-corrupt manifest throws — maintain() is a write
    * path, and degrading to single-table maintenance would silently
    * stop aging the siblings. */
  def readGroupManifest(fs: org.apache.hadoop.fs.FileSystem,
                        table: org.apache.hadoop.fs.Path)
      : Option[MaintenanceGroup] = {
    val p = new org.apache.hadoop.fs.Path(table, GroupManifestFile)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val s = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      val hs = jsonStringsAfter(s, "\"horizon_source\"", 1)
      val fold = jsonStringsAfter(s, "\"fold\"", Int.MaxValue)
      if (hs.isEmpty || s.indexOf("\"fold\"") < 0)
        throw new IllegalStateException(
          s"corrupt group manifest at $p: $s")
      Some(MaintenanceGroup(hs.head, fold))
    }
  }

  /** Write the manifest via dot-temp + rename (the watermark-install
    * rule: never truncate the live file in place). */
  def writeGroupManifest(fs: org.apache.hadoop.fs.FileSystem,
                         table: org.apache.hadoop.fs.Path,
                         g: MaintenanceGroup): Unit = {
    def esc(s: String) =
      s.replace("\\", "\\\\").replace("\"", "\\\"")
    val body = s"""{"horizon_source": "${esc(g.horizonSource)}", """ +
      s""""fold": [${g.fold.map(f => "\"" + esc(f) + "\"")
        .mkString(", ")}]}"""
    val tmp = new org.apache.hadoop.fs.Path(table,
      "." + GroupManifestFile + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val dst = new org.apache.hadoop.fs.Path(table, GroupManifestFile)
    val direct = try fs.rename(tmp, dst)
      catch { case scala.util.control.NonFatal(_) => false }
    if (!direct) {
      fs.delete(dst, false)
      if (!fs.rename(tmp, dst)) throw new IllegalStateException(
        s"cannot install group manifest at $dst")
    }
  }

  /** Keep every member's manifest current: read, rewrite only when
    * absent or drifted (a moved/reconfigured group self-heals on the
    * next trigger; an unchanged group costs one small read per
    * member). Creates member dirs that don't exist yet (the pairs
    * table before its first pair). */
  def ensureGroupManifest(spark: SparkSession, members: Seq[String],
                          g: MaintenanceGroup): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    members.distinct.foreach { m =>
      val p = new org.apache.hadoop.fs.Path(m)
      val fs = p.getFileSystem(conf)
      val current =
        try readGroupManifest(fs, p)
        catch { case _: IllegalStateException => None } // corrupt: heal
      if (!current.contains(g)) {
        fs.mkdirs(p)
        writeGroupManifest(fs, p, g)
      }
    }
  }

  /** The ≤`max` JSON string literals following `key` in `s` (first
    * occurrence), scanned with real escape handling — paths are
    * arbitrary strings, so the regex-over-JSON trick the int markers
    * use is not safe here. Stops at the closing `]` for arrays; a
    * bare string value reads one literal. */
  private def jsonStringsAfter(s: String, key: String, max: Int)
      : Seq[String] = {
    val at = s.indexOf(key)
    if (at < 0) return Nil
    var i = at + key.length
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var inArray = false
    var done = false
    while (!done && i < s.length && out.size < max) {
      s.charAt(i) match {
        case '[' => inArray = true; i += 1
        case ']' => done = true
        case '"' =>
          val sb = new StringBuilder
          i += 1
          while (i < s.length && s.charAt(i) != '"') {
            if (s.charAt(i) == '\\' && i + 1 < s.length) {
              sb.append(s.charAt(i + 1)); i += 2
            } else { sb.append(s.charAt(i)); i += 1 }
          }
          i += 1
          out += sb.toString
          if (!inArray) done = true
        case ',' | ':' | ' ' | '\t' | '\n' | '\r' => i += 1
        case _ => done = true // next key / malformed — stop
      }
    }
    out.toSeq
  }

  /** The three streaming-maintained instances + the store's marker
    * pairing — the one place the (bucketCol, markerKey) names live. */
  def replyIndexTable(dir: String): BucketedTable =
    BucketedTable(dir, "reply_bucket", "reply_buckets")
  def bandSideTable(dir: String): BucketedTable =
    BucketedTable(dir, "band_bucket", "band_buckets")
  def setsSideTable(dir: String): BucketedTable =
    BucketedTable(dir, "id_bucket", "sets_buckets")
  def postsStoreTable(dir: String): BucketedTable =
    BucketedTable(dir, "key_bucket", "key_buckets")

  private val EmptyIndexMarkerFile = "_graft_empty_index"

  /** A reply-index bootstrap that completed with ZERO rows (the store
    * had no replies yet) leaves a marker-only dir, on-disk identical
    * to a crashed create. This sentinel — written only AFTER such a
    * bootstrap finishes — records the successful empty generation, so
    * later micro-batches take the incremental path instead of
    * re-running the full-store bootstrap every trigger. Underscore
    * prefix keeps it invisible to [[hasDataFiles]] and parquet
    * readers; a full [[writeReplyIndex]] rebuild clears it with the
    * rest of the dir. */
  def hasEmptyIndexMarker(fs: org.apache.hadoop.fs.FileSystem,
                          table: org.apache.hadoop.fs.Path): Boolean =
    fs.exists(new org.apache.hadoop.fs.Path(table, EmptyIndexMarkerFile))

  def writeEmptyIndexMarker(fs: org.apache.hadoop.fs.FileSystem,
                            table: org.apache.hadoop.fs.Path): Unit =
    fs.create(new org.apache.hadoop.fs.Path(table, EmptyIndexMarkerFile),
      true).close()

  private val LayoutMarkerFile = "_graft_layout.json"

  /** Read `"<key>": n` from `<table>/_graft_layout.json` — the ONE
    * marker reader every layout shares (posts stores carry
    * `key_buckets`, reply indexes `reply_buckets`). None = no marker.
    * `strict` = a PRESENT but unparseable marker throws instead of
    * answering None: the merge path must refuse rather than prune
    * with a guessed modulus (that silently splits keys); read-side
    * consumers degrade to unpruned instead. */
  def layoutMarker(fs: org.apache.hadoop.fs.FileSystem,
                   table: org.apache.hadoop.fs.Path, key: String,
                   strict: Boolean = false): Option[Int] = {
    val p = new org.apache.hadoop.fs.Path(table, LayoutMarkerFile)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val s =
        try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      val n = ("\"" + key + "\"\\s*:\\s*(\\d+)").r
        .findFirstMatchIn(s).map(_.group(1).toInt)
      if (n.isEmpty && strict) throw new IllegalStateException(
        s"corrupt layout marker at $p: $s")
      n
    }
  }

  /** The marker file's RAW contents (None = absent) — for guards that
    * must refuse on ANY marker, ours or foreign, with the found
    * contents in the diagnosis instead of a key-specific parse error
    * (the flat-vs-bucketed mode guard). */
  def layoutMarkerRaw(fs: org.apache.hadoop.fs.FileSystem,
                      table: org.apache.hadoop.fs.Path)
      : Option[String] = {
    val p = new org.apache.hadoop.fs.Path(table, LayoutMarkerFile)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8))
      finally in.close()
    }
  }

  def writeLayoutMarker(fs: org.apache.hadoop.fs.FileSystem,
                        table: org.apache.hadoop.fs.Path, key: String,
                        n: Int): Unit = {
    val out = fs.create(
      new org.apache.hadoop.fs.Path(table, LayoutMarkerFile), true)
    try out.write(s"""{"$key": $n}"""
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  // ── Leaf-pruned reads: the layout IS the manifest ─────────────────
  //
  // A fresh `spark.read.parquet(dir)` builds its file index by
  // listing EVERY partition directory — at a production modulus
  // (n=4096 × months) that driver listing dwarfs a point probe's
  // task time (measured: 1.5 s of task under a 43 s wall,
  // BENCH_NOTES r9 modulus sweep #4). But a bucketed graft layout
  // needs no stored manifest to avoid that: bucket value → directory
  // is computable, so a probe that knows its K bucket values can
  // enumerate exactly those leaf dirs — 1 root listing (+ one per
  // month for the two-level store) instead of n×months — and hand
  // Spark only the leaves it will read. No staleness window exists
  // by construction: the listing that prices the read IS the read's
  // file source (unlike a manifest file, which can lag a crashed
  // refresh and silently drop a bucket).

  /** The leaf directories holding `bucketCol ∈ values`, enumerated
    * without listing any other partition. Handles both layout
    * shapes: one-level `bucketCol=V` at the root (reply index, dedup
    * side tables) and two-level `parent=…/bucketCol=V` (the posts
    * store's `created_month/key_bucket`) — shape is detected from
    * the single root listing. Missing buckets simply don't appear
    * (hash buckets with no rows are never written). */
  def bucketLeafDirs(spark: SparkSession, dir: String,
                     bucketCol: String, values: Seq[Int])
      : Seq[String] =
    bucketLeafScan(spark, dir, bucketCol, values)._1

  /** The single listing pass behind [[bucketLeafDirs]] /
    * [[readBucketLeaves]]: (matching leaf dirs, whether ANY
    * `bucketCol=` dir exists at either level, first UNBUCKETED data
    * location or None). The second element distinguishes "the
    * requested buckets hold no rows" (normal: empty hash buckets are
    * never written) from "the table's data is not bucketed by
    * `bucketCol` at all"; the third catches the PARTIAL mix the
    * all-or-nothing signal can't — some parents bucketed, one parent
    * (or the root itself) holding raw data outside any `bucketCol=`
    * dir, e.g. a partially migrated legacy store — whose rows an
    * enumerated read would silently omit. Both are marker/layout
    * mismatches that make enumeration lossy; [[readBucketLeavesStrict]]
    * refuses on either. */
  private def bucketLeafScan(spark: SparkSession, dir: String,
                             bucketCol: String, values: Seq[Int])
      : (Seq[String], Boolean, Option[String]) = {
    // no requested buckets ⇒ no read and no corruption question —
    // skip the listing entirely (vacuously "bucketed")
    if (values.isEmpty) return (Nil, true, None)
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return (Nil, false, None)
    val wanted = values.map(v => s"$bucketCol=$v").toSet
    val all = fs.listStatus(root).filterNot { st =>
      val nm = st.getPath.getName
      nm.startsWith(".") || nm.startsWith("_")
    }
    // data FILES directly at the root sit outside every bucket dir in
    // either shape — lossy alongside any bucket dir
    val rootFile = all.find(!_.isDirectory).map(_.getPath.toString)
    val top = all.filter(_.isDirectory)
    val oneLevel = top.exists(_.getPath.getName.startsWith(bucketCol + "="))
    if (oneLevel) {
      // a non-bucketCol sibling DIR next to the bucket dirs (a
      // different partition column, a raw subdir) is unbucketed data
      // at this level too
      val strayDir = top.find(
        !_.getPath.getName.startsWith(bucketCol + "="))
        .map(_.getPath.toString)
      (top.filter(st => wanted(st.getPath.getName))
        .map(_.getPath.toString).toSeq, true, rootFile.orElse(strayDir))
    } else {
      var sawBucketDir = false
      var stray: Option[String] = rootFile
      val dirs = top.toSeq.flatMap { parent =>
        val children = fs.listStatus(parent.getPath).filterNot { c =>
          val nm = c.getPath.getName
          nm.startsWith(".") || nm.startsWith("_")
        }
        if (children.exists(c => c.isDirectory &&
            c.getPath.getName.startsWith(bucketCol + "=")))
          sawBucketDir = true
        // any child that is NOT a bucketCol= dir — a raw data file,
        // or a subdir partitioned by something else — is data outside
        // every enumerable leaf, whether or not this parent also has
        // bucketed children
        if (stray.isEmpty)
          stray = children.find(c => !(c.isDirectory &&
              c.getPath.getName.startsWith(bucketCol + "=")))
            .map(_.getPath.toString)
        children.filter(c => c.isDirectory &&
          wanted(c.getPath.getName)).map(_.getPath.toString)
      }
      (dirs, sawBucketDir, stray)
    }
  }

  /** Bucket-pruned parquet read via [[bucketLeafDirs]]: Spark's file
    * index is built over ONLY the requested leaves (`basePath` keeps
    * the partition columns). None = no requested leaf exists (no
    * matching rows — callers short-circuit with their empty frame).
    * Semantics-preserving exactly when the caller's predicate
    * implies `bucketCol ∈ values` — the same contract as the
    * `isin`-prune forms, moved from plan time to listing time. */
  def readBucketLeaves(spark: SparkSession, dir: String,
                       bucketCol: String, values: Seq[Int])
      : Option[DataFrame] = {
    val dirs = bucketLeafDirs(spark, dir, bucketCol, values)
    if (dirs.isEmpty) None
    else Some(spark.read.option("basePath", dir).parquet(dirs: _*))
  }

  /** [[readBucketLeaves]] for a table KNOWN to be bucketed (a marked
    * layout): additionally FAILS LOUD when the table holds data
    * outside the `bucketCol=` partition tree — either NO bucket dir
    * exists anywhere (all-or-nothing mismatch) or SOME data sits
    * outside the bucket dirs (partial mix: a parent with raw files
    * and no `bucketCol=` children, a stray file at the root — e.g. a
    * partially migrated legacy store). Enumerating either would
    * silently serve an empty/partial view of rows that exist (lost
    * corpus rows, no error: the exact silent-lossiness the modulus
    * handshake exists to prevent). None still means "the requested
    * buckets hold no rows" — normal, callers short-circuit with their
    * empty frame. */
  def readBucketLeavesStrict(spark: SparkSession, dir: String,
                             bucketCol: String, values: Seq[Int])
      : Option[DataFrame] = {
    val (dirs, sawBucketDirs, stray) = bucketLeafScan(spark, dir,
      bucketCol, values)
    stray.foreach { s =>
      throw new IllegalStateException(
        s"$dir holds data outside the $bucketCol= partition tree " +
          s"(e.g. $s) — an enumerated read would silently omit those " +
          "rows; the layout does not match its marker, rebuild the " +
          "table")
    }
    if (dirs.nonEmpty)
      Some(spark.read.option("basePath", dir).parquet(dirs: _*))
    else {
      val root = new org.apache.hadoop.fs.Path(dir)
      val fs = root.getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      if (!sawBucketDirs && hasDataFiles(fs, root))
        throw new IllegalStateException(
          s"$dir holds data but no $bucketCol= partition dirs — the " +
            "layout does not match its marker; rebuild the table")
      None
    }
  }

  /** One data-bearing leaf dir of a (possibly partitioned) table —
    * the cheap schema source for empty-result short-circuits (read
    * it `filter(false)`): ~depth RPCs instead of a full listing. */
  def firstDataLeaf(spark: SparkSession, dir: String)
      : Option[String] = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def descend(p: org.apache.hadoop.fs.Path): Option[String] = {
      if (!fs.exists(p)) return None
      val entries = fs.listStatus(p).filterNot { st =>
        val nm = st.getPath.getName
        nm.startsWith(".") || nm.startsWith("_")
      }
      if (entries.exists(st => !st.isDirectory &&
          st.getPath.getName.endsWith(".parquet")))
        Some(p.toString)
      else entries.filter(_.isDirectory).toSeq.sortBy(_.getPath.getName)
        .view.flatMap(st => descend(st.getPath)).headOption
    }
    descend(root)
  }

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

  // ── Z-order layout ────────────────────────────────────────────────
  //
  // One sort key can only cluster one dimension; a Z-order (Morton)
  // curve clusters TWO at once, so range filters on EITHER dimension
  // prune ~√(selectivity) of the layout instead of pruning on one
  // dimension and scanning the other. This is the multi-dimensional
  // layout trick behind Delta/Iceberg OPTIMIZE ZORDER, expressed with
  // nothing but a codegen bit-interleave expression + partitionBy.

  /** Morton z-value of two `bits`-bit non-negative coordinates:
    * bit i of x → bit 2i, bit i of y → bit 2i+1. Callers quantize
    * raw values into the 0..2^bits-1 grid first. Unrolled bitwise
    * expression — whole-stage codegen, no UDF. */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "zValue: 1 <= bits <= 31")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        call_function("shiftleft",
          call_function("shiftright", x.cast("long"), lit(i))
            .bitwiseAND(1L), lit(2 * i)),
        call_function("shiftleft",
          call_function("shiftright", y.cast("long"), lit(i))
            .bitwiseAND(1L), lit(2 * i + 1)))
    }
    terms.reduce(_ bitwiseOR _)
  }

  /** Coarse z-cell: the z-value of the TOP `p` bits of each
    * coordinate — a 2^(2p)-cell grid usable as a partition column
    * (the z-prefix property: a cell is exactly a contiguous z-value
    * range). */
  def zCell(x: Column, y: Column, bits: Int, p: Int): Column = {
    require(p >= 1 && p <= bits, "zCell: 1 <= p <= bits")
    zValue(call_function("shiftright", x.cast("long"), lit(bits - p)),
      call_function("shiftright", y.cast("long"), lit(bits - p)), p)
  }

  /** Driver-side twin of [[zValue]] for cell enumeration. */
  def zValueLocal(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  /** The z-cells intersecting the query box [x1,x2]×[y1,y2] (grid
    * coords, inclusive) — the pruning list for a filter on either or
    * both dimensions. Enumeration is over the ≤2^(2p) COARSE cells
    * (p is chosen small: 3-6 ⇒ 64-4096 cells), a driver-trivial
    * bound independent of data size; this is the plain-enumeration
    * form of the BIGMIN z-range decomposition. */
  def zCellsFor(x1: Long, x2: Long, y1: Long, y2: Long,
                bits: Int, p: Int): Seq[Long] = {
    val shift = bits - p
    for {
      cx <- (x1 >> shift) to (x2 >> shift)
      cy <- (y1 >> shift) to (y2 >> shift)
    } yield zValueLocal(cx, cy, p)
  }

  /** Write `df` z-ordered on (`xCol`, `yCol`): partitioned by the
    * coarse `z_cell`, rows sorted by the fine z-value within each
    * partition (parquet min/max row-group stats then cluster both
    * dimensions inside files too). Read back with a
    * `z_cell isin zCellsFor(...)` filter for partition pruning —
    * metric-proven in LayoutSpec. */
  def writeZOrdered(df: DataFrame, dir: String, xCol: Column,
                    yCol: Column, bits: Int, p: Int): Unit =
    df.withColumn("z_cell", zCell(xCol, yCol, bits, p))
      .withColumn("__z", zValue(xCol, yCol, bits))
      .repartition(col("z_cell"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").partitionBy("z_cell").parquet(dir)

  // ── Small-file compaction ─────────────────────────────────────────

  /** Bin-pack a parquet table's files toward `targetBytes` per file —
    * the maintenance op that keeps a streaming-merged table healthy
    * (each micro-batch overwrite leaves per-trigger files; thousands
    * of tiny files turn every scan's file listing + task scheduling
    * into the bottleneck long before bytes do).
    *
    * Works per LEAF DIRECTORY (= per partition for a partitioned
    * table, the root for an unpartitioned one): a dir whose file
    * count exceeds `ceil(dirBytes / targetBytes)` is re-read,
    * coalesced to exactly that count, staged under a DOT-PREFIXED
    * sibling (partition discovery and parquet reads ignore `.`/`_`
    * dirs, so in-flight staging is invisible to readers) and swapped
    * in by two renames. Partition values live in the dir path and
    * are preserved untouched; content is the same rows
    * (spec-asserted by fingerprint). Dirs already at or under their
    * target are left alone (no write amplification on healthy
    * partitions).
    *
    * Concurrency contract — SINGLE-WRITER MAINTENANCE op: the swap
    * window is two renames, and between them the partition dir is
    * briefly absent, so a reader racing the swap can miss that
    * partition. Run it when the table has no concurrent readers (or
    * behind a table lock); true snapshot-atomic compaction requires a
    * manifest table format (Delta/Iceberg OPTIMIZE), which is the
    * stated production path for this layout, not raw dir swaps. A
    * crash between the renames leaves the data safe in the dot-dir;
    * the next [[compact]] run restores it before doing new work.
    *
    * The driver loop is over partition dirs — bounded by the layout,
    * not the data; at real scale the dirs compact independently,
    * exactly like Delta OPTIMIZE's per-partition bin-packing.
    * Returns (files before, files after). */
  def compact(spark: SparkSession, dir: String,
              targetBytes: Long): (Long, Long) = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash recovery FIRST: a `.X__old` left by a crashed swap is the
    // authoritative copy iff `X` is missing — restore it; stale
    // `.X__compact` staging is simply discarded. The root's own
    // staging dirs live in its PARENT (the unpartitioned case).
    val rootOld = new org.apache.hadoop.fs.Path(
      root.getParent, "." + root.getName + "__old")
    if (!fs.exists(root) && fs.exists(rootOld)) fs.rename(rootOld, root)
    else if (fs.exists(rootOld)) fs.delete(rootOld, true)
    val rootTmp = new org.apache.hadoop.fs.Path(
      root.getParent, "." + root.getName + "__compact")
    if (fs.exists(rootTmp)) fs.delete(rootTmp, true)
    // recovery must RECURSE: in a multi-level layout (e.g. the
    // streaming table's created_month=/key_bucket=) a crashed swap
    // leaves `.key_bucket=B__old` INSIDE a month dir — a root-only
    // scan would never restore it (the partition's rows stay
    // invisible forever), and the recursive listFiles below would
    // treat the orphaned staging dirs as compactable data
    def recover(dir: org.apache.hadoop.fs.Path): Unit = {
      val it = fs.listStatusIterator(dir)
      while (it.hasNext) {
        val st = it.next()
        val nm = st.getPath.getName
        if (st.isDirectory) {
          if (nm.startsWith(".") && nm.endsWith("__old")) {
            val orig = new org.apache.hadoop.fs.Path(dir,
              nm.stripPrefix(".").stripSuffix("__old"))
            if (!fs.exists(orig)) fs.rename(st.getPath, orig)
            else fs.delete(st.getPath, true)
          } else if (nm.startsWith(".") && nm.endsWith("__compact")) {
            fs.delete(st.getPath, true)
          } else if (!nm.startsWith(".") && !nm.startsWith("_")) {
            recover(st.getPath)
          }
        }
      }
    }
    recover(root)
    val it = fs.listFiles(root, true)
    val byDir = scala.collection.mutable.Map
      .empty[org.apache.hadoop.fs.Path, (Long, Long)] // files, bytes
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) {
        val d = f.getPath.getParent
        val (n, b) = byDir.getOrElse(d, (0L, 0L))
        byDir(d) = (n + 1, b + f.getLen)
      }
    }
    val before = byDir.values.map(_._1).sum
    var after = 0L
    byDir.toSeq.sortBy(_._1.toString).foreach { case (d, (n, bytes)) =>
      val target = math.max(1L, (bytes + targetBytes - 1) / targetBytes)
      if (n <= target) after += n
      else {
        val tmp = new org.apache.hadoop.fs.Path(
          d.getParent, "." + d.getName + "__compact")
        spark.read.parquet(d.toString)
          .coalesce(target.toInt)
          .write.mode("overwrite").parquet(tmp.toString)
        val bak = new org.apache.hadoop.fs.Path(
          d.getParent, "." + d.getName + "__old")
        if (!fs.rename(d, bak))
          throw new IllegalStateException(s"compact: cannot move $d")
        if (!fs.rename(tmp, d)) {
          fs.rename(bak, d) // roll back
          throw new IllegalStateException(s"compact: cannot swap $tmp")
        }
        fs.delete(bak, true)
        val it2 = fs.listFiles(d, false)
        var cnt = 0L
        while (it2.hasNext) {
          if (it2.next().getPath.getName.endsWith(".parquet")) cnt += 1
        }
        after += cnt
      }
    }
    (before, after)
  }
}
