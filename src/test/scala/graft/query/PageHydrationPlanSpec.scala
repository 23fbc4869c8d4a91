package graft.query

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

/** Plan contract for the page-hydration operators behind the GraphQL
  * SocialPost fields (the same no-unpartitioned-window /
  * broadcast-the-small-side rules PlanAuditSpec enforces on the
  * catalog): childrenFor's per-parent rank must be a PARTITIONED
  * window, and both hydrations must broadcast the page-derived side,
  * never shuffle the full posts source against a page. */
class PageHydrationPlanSpec extends SparkSpec {
  import spark.implicits._

  // assertions read the COMPILED physical plan (sparkPlan): over the
  // tiny LocalRelation fixtures AQE executes broadcast stages eagerly
  // and the final adaptive plan collapses to a LocalTableScan of the
  // result, hiding the join/window nodes under audit
  private def nodes(df: DataFrame): Seq[SparkPlan] = {
    val out = scala.collection.mutable.ArrayBuffer[SparkPlan]()
    def go(n: SparkPlan): Unit = n.foreach {
      case a: AdaptiveSparkPlanExec => go(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        out += s; go(s.plan)
      case x => out += x
    }
    go(df.queryExecution.sparkPlan); out.toSeq
  }

  // child pK (K % 3 == 0) replies to p(K-1), whose author is
  // user((K-1) % 7) — parent_author must be the PARENT's author
  private lazy val posts = (1L to 200L).map { i =>
    val parent = if (i % 3 == 0) s"user${(i - 1) % 7}" else ""
    val parentPerm = if (i % 3 == 0) s"p${i - 1}" else "hive-110011"
    (s"user${i % 7}", s"p$i", parent, parentPerm,
      java.sql.Timestamp.valueOf(s"2024-05-01 12:00:${i % 60}"))
  }.toDF("author", "permlink", "parent_author", "parent_permlink",
    "created_at")

  test("childrenFor: window is partitioned by parent key; page side " +
    "broadcasts; per-parent skip/limit paging holds") {
    val page = posts.filter(col("permlink").isin("p2", "p5"))
    val out = PostQueries.childrenFor(page, posts, limit = 2, skip = 0)
    val ns = nodes(out)
    val unpartitioned = ns.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(unpartitioned.isEmpty,
      "childrenFor must never rank through a single partition")
    assert(ns.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "page-derived sides must broadcast")
    // semantic check: p2's children are p3..p? with parent p2 — the
    // fixture gives child pK parent p(K-1) for K % 3 == 0
    val rows = out.filter(col("permlink") === "p2")
      .select(size(col("children"))).as[Int].collect()
    assert(rows.head == 1)   // only p3 has parent p2
    // limit honored per parent: a parent with many children caps at 2
    val many = posts.withColumn("parent_author", lit("user1"))
      .withColumn("parent_permlink", lit("pX"))
    val page2 = Seq(("user1", "pX", "", "", java.sql.Timestamp
      .valueOf("2024-05-01 12:00:00")))
      .toDF("author", "permlink", "parent_author", "parent_permlink",
        "created_at")
    val capped = PostQueries.childrenFor(page2, many, limit = 2,
      skip = 1)
    val kid = capped.select(
      transform(col("children"), k => k.getField("permlink"))
        .as("ps")).as[Seq[String]].collect().head
    assert(kid.size == 2)
    // second==0 rows: p120 (user1) < p60 (user4) < p180 (user5) by
    // (created_at, author, permlink); skip=1 drops p120
    assert(kid == Seq("p60", "p180"))
  }

  test("level-2 hydration keeps the contract: nested hydrate hooks " +
    "run on the page-bounded matched frame, windows stay partitioned, " +
    "page-derived sides broadcast") {
    val page = posts.filter(col("permlink").isin("p2", "p5"))
    // children { parent_post, children } — the nested hook is exactly
    // what the GraphQL executor passes at depth 2
    val out = PostQueries.childrenFor(page, posts, limit = 2, skip = 0,
      outCol = "children",
      hydrate = m => PostQueries.childrenFor(
        PostQueries.withParentFrom(m, posts, outCol = "pp2"),
        posts, limit = 1, skip = 0, outCol = "kids2"))
    val ns = nodes(out)
    val unpartitioned = ns.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(unpartitioned.isEmpty,
      "no hydration level may rank through a single partition")
    assert(!ns.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.joins.SortMergeJoinExec]) &&
      !ns.exists(_.isInstanceOf[
        org.apache.spark.sql.execution.joins.ShuffledHashJoinExec]),
      "page-derived sides must broadcast at every level — a shuffled " +
        "join means a full-table side reached a page join")
    // semantics: p2's child is p3; p3's parent_post is p2 and p3's
    // own children page (limit 1) contains p4-with-parent-p3? —
    // fixture: child pK (K%3==0) has parent p(K-1), so p3's children
    // are none (p6's parent is p5) → kids2 empty, pp2 = p2
    val row = out.filter(col("permlink") === "p2")
      .select(col("children").getItem(0).getField("pp2")
          .getField("permlink").as("pp"),
        size(col("children").getItem(0).getField("kids2")).as("nk"))
      .collect().head
    assert(row.getString(0) == "p2")
    assert(row.getInt(1) == 0)
    // a parent whose child HAS children: p5 → child p6 → p6's
    // children page: fixture gives p6 no children (p9's parent is
    // p8) — instead check p5's child list is keyed correctly
    val p5kids = out.filter(col("permlink") === "p5")
      .select(transform(col("children"),
        k => k.getField("permlink")).as("ks"))
      .as[Seq[String]].collect().head
    assert(p5kids == Seq("p6"))
  }

  test("graft-layout bucket pruning: point lookup and parent-key " +
    "hydration probes carry key_bucket PARTITION filters") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = java.nio.file.Files
      .createTempDirectory("graft-bucketed").toString + "/posts"
    posts
      .withColumn("created_month",
        date_format(col("created_at"), "yyyy-MM"))
      .withColumn("key_bucket", graft.state.Layout.keyBucket(
        col("author"), col("permlink"), 8))
      .write.partitionBy("created_month", "key_bucket")
      .parquet(dir)
    val stored = spark.read.parquet(dir)
    def scanOf(df: org.apache.spark.sql.DataFrame) =
      nodes(df).collectFirst { case f: FileSourceScanExec => f }.get
    // point lookup: the bucket expression over literals constant-folds
    // into a partition filter — 1 bucket of 8 scanned
    val point = PostQueries.socialPost(stored, "user1", "p1",
      keyBuckets = Some(8))
    val pScan = scanOf(point)
    assert(pScan.partitionFilters.exists(
      _.references.exists(_.name == "key_bucket")),
      pScan.partitionFilters.toString)
    assert(point.collect().map(_.getAs[String]("permlink")).toSeq
      == Seq("p1"))
    // parent-key pruning: the page's parent buckets become an isin
    // partition filter on the hydration source
    val page = stored.filter(col("permlink").isin("p3", "p6"))
    val srcPruned = PostQueries.parentPruned(page, stored, 8)
    val out = PostQueries.withParentFrom(page, srcPruned)
    val sScans = nodes(out).collect { case f: FileSourceScanExec => f }
    assert(sScans.exists(_.partitionFilters.exists(
      _.references.exists(_.name == "key_bucket"))),
      sScans.map(_.partitionFilters).toString)
    val got = out.select(col("permlink"),
      col("parent_post.permlink").as("pp")).collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got("p3").contains("p2") && got("p6").contains("p5"))
    // a source without the layout passes through untouched
    assert(PostQueries.parentPruned(page, posts, 8) eq posts)
  }

  test("childrenForIndexed: identical results to childrenFor, " +
    "reply_bucket + key_bucket partition filters on the probes, " +
    "window stays partitioned") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val base = java.nio.file.Files
      .createTempDirectory("graft-replyidx").toString
    posts
      .withColumn("created_month",
        date_format(col("created_at"), "yyyy-MM"))
      .withColumn("key_bucket", graft.state.Layout.keyBucket(
        col("author"), col("permlink"), 8))
      .write.partitionBy("created_month", "key_bucket")
      .parquet(s"$base/posts")
    val stored = spark.read.parquet(s"$base/posts")
    graft.state.Layout.writeReplyIndex(stored, s"$base/reply_index", 8)
    assert(graft.state.Layout
      .replyIndexBuckets(spark, s"$base/reply_index").contains(8))
    val idx = spark.read.parquet(s"$base/reply_index")
    val page = stored.filter(col("permlink").isin("p2", "p5", "p7"))
    val viaIndex = PostQueries.childrenForIndexed(page, stored, idx, 8,
      limit = 2, skip = 0, sourceKeyBuckets = Some(8))
    val viaScan = PostQueries.childrenFor(page, stored, limit = 2,
      skip = 0)
    def kidsOf(df: org.apache.spark.sql.DataFrame) =
      df.select(col("permlink"), transform(col("children"),
          k => k.getField("permlink")).as("ks"))
        .collect().map(r => r.getString(0) -> r.getSeq[String](1))
        .toMap
    assert(kidsOf(viaIndex) == kidsOf(viaScan))
    assert(kidsOf(viaIndex)("p2") == Seq("p3"))  // p3 replies to p2
    assert(kidsOf(viaIndex)("p7").isEmpty)       // no replies → []
    // both partition filters reach their scans
    val scans = nodes(viaIndex).collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.exists(_.partitionFilters.exists(
      _.references.exists(_.name == "reply_bucket"))),
      scans.map(_.partitionFilters).toString)
    assert(scans.exists(_.partitionFilters.exists(
      _.references.exists(_.name == "key_bucket"))),
      scans.map(_.partitionFilters).toString)
    val unpartitioned = nodes(viaIndex).collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(unpartitioned.isEmpty)
    // per-parent skip/limit paging matches the scan path on a parent
    // with many children
    val many = posts.withColumn("parent_author", lit("user1"))
      .withColumn("parent_permlink", lit("pX"))
      .withColumn("created_month", lit("2024-05"))
      .withColumn("key_bucket", graft.state.Layout.keyBucket(
        col("author"), col("permlink"), 8))
    many.write.partitionBy("created_month", "key_bucket")
      .parquet(s"$base/many")
    val manyStored = spark.read.parquet(s"$base/many")
    graft.state.Layout.writeReplyIndex(manyStored, s"$base/many_idx", 8)
    val manyIdx = spark.read.parquet(s"$base/many_idx")
    val page2 = Seq(("user1", "pX", "", "", java.sql.Timestamp
      .valueOf("2024-05-01 12:00:00")))
      .toDF("author", "permlink", "parent_author", "parent_permlink",
        "created_at")
    val capped = PostQueries.childrenForIndexed(page2, manyStored,
      manyIdx, 8, limit = 2, skip = 1, sourceKeyBuckets = Some(8))
    val kid = capped.select(
      transform(col("children"), k => k.getField("permlink"))
        .as("ps")).as[Seq[String]].collect().head
    assert(kid == Seq("p60", "p180"))  // same page as childrenFor's
  }

  test("childrenForIndexedAt (directory form): same results as the " +
    "frame form, and BOTH file indexes hold only the probed leaf " +
    "dirs — the listing never touches the rest of the table") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val base = java.nio.file.Files
      .createTempDirectory("graft-replyidx-at").toString
    posts
      .withColumn("created_month",
        date_format(col("created_at"), "yyyy-MM"))
      .withColumn("key_bucket", graft.state.Layout.keyBucket(
        col("author"), col("permlink"), 8))
      .write.partitionBy("created_month", "key_bucket")
      .parquet(s"$base/posts")
    locally { // the store's modulus marker (the merge writes it)
      val p = new org.apache.hadoop.fs.Path(s"$base/posts")
      graft.state.Layout.writeLayoutMarker(
        p.getFileSystem(spark.sparkContext.hadoopConfiguration), p,
        "key_buckets", 8)
    }
    val stored = spark.read.parquet(s"$base/posts")
    graft.state.Layout.writeReplyIndex(stored, s"$base/idx", 8)
    val page = stored.filter(col("permlink").isin("p2", "p5", "p7"))
    val viaFrames = PostQueries.childrenForIndexed(page, stored,
      spark.read.parquet(s"$base/idx"), 8, limit = 2,
      sourceKeyBuckets = Some(8))
    val viaDirs = PostQueries.childrenForIndexedAt(spark, page,
      s"$base/posts", s"$base/idx", limit = 2)
    def kidsOf(df: org.apache.spark.sql.DataFrame) =
      df.select(col("permlink"), transform(col("children"),
          k => k.getField("permlink")).as("ks"))
        .collect().map(r => r.getString(0) -> r.getSeq[String](1))
        .toMap
    assert(kidsOf(viaDirs) == kidsOf(viaFrames))
    assert(kidsOf(viaDirs)("p2") == Seq("p3"))
    assert(kidsOf(viaDirs)("p7").isEmpty)
    // the listing contract: every scan over the two tables is rooted
    // at LEAF dirs (bucket-valued paths), never the table root — the
    // file index was built from enumerated leaves only
    val scans = nodes(viaDirs).collect {
      case f: FileSourceScanExec => f }
    val idxScans = scans.filter(_.relation.location.rootPaths
      .exists(_.toString.contains(s"$base/idx")))
    val storeScans = scans.filter(_.relation.location.rootPaths
      .exists(_.toString.contains(s"$base/posts")))
    assert(idxScans.nonEmpty && storeScans.nonEmpty)
    assert(idxScans.forall(_.relation.location.rootPaths
      .forall(_.toString.contains("reply_bucket="))),
      idxScans.flatMap(_.relation.location.rootPaths).mkString(","))
    // the page's own scan (caller-built from a full read) also roots
    // at the store — the FETCH leg is the scan whose roots are all
    // leaf dirs; it must exist, and enumerate ≤ |child keys| leaves
    assert(storeScans.exists { s =>
      val rp = s.relation.location.rootPaths
      rp.nonEmpty && rp.forall(_.toString.contains("key_bucket="))
    }, storeScans.flatMap(_.relation.location.rootPaths).mkString(","))
    // a page whose parents have no replies: empty children, no error
    // — and no store leaves are even enumerated for the fetch
    val lonely = stored.filter(col("permlink") === "p7")
    val none = PostQueries.childrenForIndexedAt(spark, lonely,
      s"$base/posts", s"$base/idx", limit = 2)
    assert(kidsOf(none)("p7").isEmpty)
    // a LEGITIMATELY EMPTY store (marker-only dirs — a freshly
    // bootstrapped pair before any data) answers the page with empty
    // children instead of throwing (ADVICE r10)
    val emptyBase = java.nio.file.Files
      .createTempDirectory("graft-replyidx-empty").toString
    Seq(s"$emptyBase/posts" -> "key_buckets",
        s"$emptyBase/idx" -> "reply_buckets").foreach { case (d, k) =>
      val p = new org.apache.hadoop.fs.Path(d)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(p)
      graft.state.Layout.writeLayoutMarker(fs, p, k, 8)
    }
    val onEmpty = PostQueries.childrenForIndexedAt(spark,
      lonely.select("author", "permlink"),
      s"$emptyBase/posts", s"$emptyBase/idx", limit = 2)
    assert(onEmpty.count() === 1)
    assert(onEmpty.select(size(col("children"))).head().getInt(0) === 0)
  }

  test("withParentFrom: no full-table shuffle against the page — " +
    "broadcast joins only; missing parents stay null") {
    val page = posts.filter(col("permlink").isin("p3", "p4"))
    val out = PostQueries.withParentFrom(page, posts)
    val ns = nodes(out)
    assert(ns.exists(_.isInstanceOf[BroadcastHashJoinExec]))
    val got = out.select(col("permlink"),
      col("parent_post.permlink").as("pp")).collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got("p3").contains("p2"))  // p3 is a reply to p2
    assert(got("p4").isEmpty)         // p4 is top-level
  }
}
