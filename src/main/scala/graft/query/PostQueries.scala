package graft.query

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Feed-filter arguments — the engine's equivalent of the reference's
  * GraphQL input object (schema.ts:284-291) compiled by
  * TransformFeedArgs (resolvers/index.ts:58-149). Field-for-field per
  * SURVEY.md §2.2 F1-F14. */
final case class FeedArgs(
    spkvideoFirstUpload: Boolean = false,            // F1
    spkvideoOnly: Boolean = false,                   // F2
    spkvideoIsShort: Boolean = false,                // F3
    includeComments: Boolean = false,                // F4 (default off)
    byTag: Option[Where] = None,                     // F5
    byCreator: Option[Where] = None,                 // F6
    byPermlink: Option[Where] = None,
    byCommunity: Option[Where] = None,               // F7
    byApp: Option[Where] = None,                     // F8
    byType: Option[Where] = None,                    // F9
    byLang: Option[Where] = None,                    // F10
    or: Seq[FeedArgs] = Nil,                         // F11
    includeCeramic: Boolean = false,                 // F12
    byFollower: Option[String] = None,               // F13 (semi join)
    // 0 = "unset": each feed applies its own default via limitOr,
    // matching JS `pagination?.limit || N` (0 is falsy there too)
    limit: Int = 0, skip: Int = 0) {
  def limitOr(default: Int): Int = if (limit > 0) limit else default
}

/** The read-path query surface over the posts/profiles/communities/
  * follows entity tables (SURVEY.md §2.3-§2.5, §3.1).
  *
  * Where the reference issues one MongoDB query per GraphQL field
  * (N+1), every method here is a single DataFrame pipeline: filters
  * compile to pushed-down predicates, `byFollower` is a broadcast
  * left-semi join, hydration is a broadcast left join — so a feed is
  * one scan + one TakeOrderedAndProject regardless of page size.
  */
object PostQueries {

  /** F11: an `_or` branch carries ONLY its named field predicate
    * (schema.ts:284-291, resolvers/index.ts:108-116) — the F1-F4/F12
    * defaults stay top-level and are not folded into branches. */
  private def orBranch(a: FeedArgs): Column =
    Predicates.all(
      a.byTag.flatMap(_.compileArray(col("tags"))),
      a.byCreator.flatMap(_.compile(col("author"))),
      a.byPermlink.flatMap(_.compile(col("permlink"))),
      a.byCommunity.flatMap(_.compile(col("parent_permlink"))),
      a.byApp.flatMap(_.compile(col("app_metadata.app"))),
      a.byType.flatMap(_.compileArray(col("app_metadata.types"))))

  /** F1-F12 compiled to one predicate (no F13 — that's a join).
    *
    * TransformFeedArgs builds a plain object, so later assignments to
    * the same key silently replace earlier ones: `byFollower`
    * overwrites `byCreator` (both write query["author"],
    * resolvers/index.ts:88-90 vs :126-146), and `byType` overwrites
    * `spkvideo.only` (both write query["app_metadata.types"],
    * :65-67 vs :100-102). We reproduce that last-wins behavior. */
  def feedPredicate(a: FeedArgs): Column = {
    val base = Predicates.all(
      Option.when(a.spkvideoFirstUpload)(
        col("app_metadata.spkvideo.first_upload") === true),
      Option.when(a.spkvideoOnly && a.byType.isEmpty)(
        array_contains(col("app_metadata.types"), "spkvideo")),
      Option.when(a.spkvideoIsShort)(
        col("app_metadata.spkvideo.is_short") === true),
      // F4: flags must NOT contain 'comment'; null-safe (missing ⇒ keep)
      Option.when(!a.includeComments)(
        !coalesce(array_contains(col("flags"), "comment"), lit(false))),
      a.byTag.flatMap(_.compileArray(col("tags"))),
      Option.when(a.byFollower.isEmpty)(a.byCreator)
        .flatten.flatMap(_.compile(col("author"))),
      a.byPermlink.flatMap(_.compile(col("permlink"))),
      a.byCommunity.flatMap(_.compile(col("parent_permlink"))),
      a.byApp.flatMap(_.compile(col("app_metadata.app"))),
      a.byType.flatMap(_.compileArray(col("app_metadata.types"))),
      a.byLang.flatMap(_.compile(
        get_json_object(col("json_metadata_raw"), "$.video.info.lang"))),
      // F12: TYPE != CERAMIC unless opted in (null-safe)
      Option.when(!a.includeCeramic)(
        coalesce(col("TYPE"), lit("")) =!= "CERAMIC"))
    // F11: _or of single-field branches, ANDed with the rest
    if (a.or.isEmpty) base
    else base && a.or.map(orBranch).reduce(_ || _)
  }

  /** Apply F13 byFollower as a broadcast left-semi join against the
    * follow edge list (resolvers/index.ts:126-146): keep posts whose
    * author is followed by X. A `did:`-prefixed follower reads the
    * offchain `social_connections` table instead of `follows`
    * (resolvers/index.ts:127-138). The follow set of one account is
    * tiny ⇒ broadcast, no shuffle of posts. */
  def applyFollower(posts: DataFrame, follows: DataFrame,
                    follower: String,
                    socialConnections: Option[DataFrame] = None)
      : DataFrame = {
    val edges =
      if (follower.startsWith("did:"))
        socialConnections.getOrElse(follows)
      else follows
    posts.join(
      broadcast(edges.filter(col("follower") === follower)
        .select(col("following"))),
      posts("author") === col("following"), "left_semi")
  }

  private def filtered(posts: DataFrame, follows: DataFrame,
                       a: FeedArgs,
                       socialConnections: Option[DataFrame] = None)
      : DataFrame = {
    val base = posts.filter(feedPredicate(a))
    a.byFollower.fold(base)(f =>
      applyFollower(base, follows, f, socialConnections))
  }

  /** Q8 socialFeed: newest-first page. `socialConnections` routes a
    * `did:` byFollower to the Ceramic social graph instead of the
    * Hive follows table (resolvers/index.ts:126-146). */
  def socialFeed(posts: DataFrame, follows: DataFrame,
                 a: FeedArgs,
                 socialConnections: Option[DataFrame] = None)
      : DataFrame =
    Feeds.page(filtered(posts, follows, a, socialConnections),
      lit(true),
      Seq(col("created_at").desc, col("author").asc,
        col("permlink").asc),
      a.skip, a.limitOr(100))

  /** Q9 searchFeed: any-term token match + tf score, newest-first —
    * Mongo $text matches documents containing ANY search term and the
    * resolver sorts by created_at, not relevance
    * (resolvers/index.ts:200-214). `stem = true` is the Mongo-analyzer
    * parity mode ("running" matches "run"; Porter at tokenize time,
    * [[graft.functions.PorterStem]]); default off = the token-exact
    * oracle contract (the remaining documented divergence,
    * SURVEY.md §7.4, now opt-in-closable). */
  def searchFeed(posts: DataFrame, follows: DataFrame, a: FeedArgs,
                 term: String,
                 socialConnections: Option[DataFrame] = None,
                 stem: Boolean = false)
      : DataFrame = {
    val terms = term.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    Feeds.search(filtered(posts, follows, a, socialConnections),
      col("body"), terms,
        requireAll = false, stem = stem)
      .orderBy(col("created_at").desc, col("author").asc,
        col("permlink").asc)
      .offset(a.skip).limit(a.limitOr(100))
  }

  sealed trait TrendingBy
  case object ByComments extends TrendingBy
  case object ByPayout extends TrendingBy

  /** Q10 trendingFeed: 3-day window back from the newest matching
    * post, ranked by comments or payout (resolvers/index.ts:224-267).
    */
  def trendingFeed(posts: DataFrame, follows: DataFrame, a: FeedArgs,
                   by: TrendingBy = ByComments,
                   socialConnections: Option[DataFrame] = None)
      : DataFrame = {
    val metric = by match {
      case ByComments => col("stats.num_comments")
      case ByPayout   => col("stats.total_hive_reward")
    }
    Feeds.trending(filtered(posts, follows, a, socialConnections),
      lit(true),
      col("created_at"), expr("INTERVAL 3 DAYS"),
      Seq(metric.desc, col("author").asc, col("permlink").asc),
      a.limitOr(100), a.skip)
  }

  /** Q11 relatedFeed: posts sharing tags with the anchor (or same
    * community for top-level anchors), uniform seeded sample of 25
    * (resolvers/index.ts:268-307). Anchor is resolved relationally —
    * a one-row broadcast, not a driver lookup. */
  def relatedFeed(posts: DataFrame, follows: DataFrame, a: FeedArgs,
                  author: String, permlink: String,
                  seed: Long = 42L,
                  socialConnections: Option[DataFrame] = None)
      : DataFrame = {
    // Eager 1-row anchor lookup: the reference throws `Post not
    // found` on a missing anchor (resolvers/index.ts:276-278) — fail
    // fast the same way rather than silently returning an empty feed.
    // The collect is a bounded point lookup (the same cost the
    // crossJoin(broadcast) paid); its values then enter the plan as
    // LITERALS, so the tag-overlap filter is pure codegen with no
    // join at all.
    val anchorRow = posts
      .filter(col("author") === author && col("permlink") === permlink)
      .select(col("tags"), col("parent_author"), col("parent_permlink"))
      .limit(1).collect()
    if (anchorRow.isEmpty)
      throw new NoSuchElementException("Post not found")
    val r = anchorRow.head
    // null-safe: a posts table not built by PostsIngest (ceramic CDC,
    // hand-made fixtures) can carry tags = null; treat as no tags like
    // the old arrays_overlap-against-null formulation did
    val aTags = Option(r.getAs[scala.collection.Seq[String]]("tags"))
      .getOrElse(scala.collection.Seq.empty[String])
    val aTagsLit =
      if (aTags.isEmpty) array().cast("array<string>")
      else array(aTags.map(lit).toSeq: _*)
    // NB: the reference does NOT exclude the anchor post itself —
    // it matches its own tags and can appear in the sample
    // (resolvers/index.ts:279-296)
    val related = filtered(posts, follows, a, socialConnections)
      .filter(
        arrays_overlap(col("tags"), aTagsLit) ||
          (lit(r.getAs[String]("parent_author") == "") &&
            col("parent_permlink") ===
              lit(r.getAs[String]("parent_permlink"))))
    // layout-independent seeded sample; default size 25 = the
    // reference's `pagination?.limit || 25`
    Feeds.relatedSample(related, lit(true), a.limitOr(25), seed,
      Seq(col("author"), col("permlink")))
  }

  /** Q1 socialPost: point lookup. */
  def socialPost(posts: DataFrame, author: String,
                 permlink: String,
                 keyBuckets: Option[Int] = None): DataFrame =
    bucketPointPruned(posts, author, permlink, keyBuckets)
      .filter(col("author") === author &&
        col("permlink") === permlink).limit(1)

  /** Point-lookup partition pruning for a graft-layout store
    * (`created_month / key_bucket = H(author, permlink) mod n`,
    * `state.Layout.keyBucket` — the layout StreamIngest merges
    * into): the key's bucket is a CONSTANT-FOLDABLE expression over
    * literals, so Catalyst turns it into a partition filter and the
    * scan touches 1/n of the store instead of all of it. Sources
    * without the layout pass through unchanged. */
  def bucketPointPruned(posts: DataFrame, author: String,
                        permlink: String,
                        keyBuckets: Option[Int]): DataFrame =
    keyBuckets.filter(_ => posts.columns.contains("key_bucket"))
      .map(n => posts.filter(col("key_bucket") ===
        graft.state.Layout.keyBucket(lit(author), lit(permlink), n)))
      .getOrElse(posts)

  /** Partition-prune a graft-layout posts source to the key buckets
    * the page's parent refs can hash into — the hydration-side twin
    * of `StreamIngest.prunedExisting` (same keyBucket contract, same
    * bounded discovery collect: ≤ min(page, n) ints). The win scales
    * with n / |page keys| — a point page touches 1 bucket of n, a
    * 100-row page on a 4096-bucket production store ~2.5%. `children`
    * CANNOT prune on this layout (rows bucket by their OWN key, not
    * their parent's) — that probe stays a scan unless the deployment
    * adds a reply-keyed layout. Top-level rows' empty ("","") parent
    * ref is excluded like prunedExisting. Sources without the layout
    * pass through. */
  def parentPruned(page: DataFrame, source: DataFrame,
                   keyBuckets: Int): DataFrame =
    if (!source.columns.contains("key_bucket")) source
    else {
      val buckets = page
        .filter(col("parent_author") =!= "")
        .select(graft.state.Layout.keyBucket(col("parent_author"),
          col("parent_permlink"), keyBuckets).as("b"))
        .distinct().collect().map(_.getInt(0)).toSeq
      source.filter(col("key_bucket").isin(buckets: _*))
    }

  /** Q3 children: one level of the reply tree with skip/limit
    * (posts.ts:161-231). */
  def children(posts: DataFrame, author: String, permlink: String,
               limit: Int = 100, skip: Int = 0): DataFrame =
    posts.filter(col("parent_author") === author &&
        col("parent_permlink") === permlink)
      .orderBy(col("created_at").asc, col("author").asc,
        col("permlink").asc)
      .offset(skip).limit(limit)

  /** Q2 parent_post hydration for a set of posts: one SHUFFLE
    * self-join replacing the reference's per-row findOne. This is the
    * full-table form — both sides are table-sized, so forcing the
    * broadcast plan of [[withParentFrom]] here would materialize a
    * table-proportional hash relation on the driver; keep the shuffle
    * and let AQE downgrade it when the input happens to be small. */
  def withParent(posts: DataFrame): DataFrame = {
    val parents = posts.select(
      col("author").as("_pa"), col("permlink").as("_pp"),
      struct(posts.columns.map(col).toSeq: _*).as("parent_post"))
    posts.join(parents,
      col("parent_author") === col("_pa") &&
        col("parent_permlink") === col("_pp"), "left")
      .drop("_pa", "_pp")
  }

  /** Q2, page form: hydrate the parent post onto a (small) page from a
    * (large) posts source. Scale shape: the source is first
    * semi-joined down to the page's parent keys (broadcast of ≤page
    * keys), so the final left join broadcasts a ≤page-sized matched
    * set — no full-table shuffle ever touches the page
    * (posts.ts:233-244 resolves this per post, N+1).
    *
    * `outCol` names the struct column (each aliased GraphQL occurrence
    * materializes under its own name — never two columns with a shared
    * default). `hydrate` runs on the MATCHED parents AFTER the
    * semi-join pares them down to ≤page rows — the hook nested
    * (multi-level) hydration attaches the parents' own relational
    * fields through, so a deeper level only ever joins against a
    * page-bounded frame, never the full table. */
  def withParentFrom(page: DataFrame, source: DataFrame,
                     outCol: String = "parent_post",
                     hydrate: DataFrame => DataFrame = identity)
      : DataFrame = {
    val keys = page.select(col("parent_author").as("_pa"),
      col("parent_permlink").as("_pp")).distinct()
    val matched = source.join(broadcast(keys),
      source("author") === keys("_pa") &&
        source("permlink") === keys("_pp"), "left_semi")
    val h = hydrate(matched)
    val parents = h.select(col("author").as("_pa"),
      col("permlink").as("_pp"),
      struct(h.columns.map(c => col(s"`$c`")).toSeq: _*).as(outCol))
    page.join(broadcast(parents),
      page("parent_author") === parents("_pa") &&
        page("parent_permlink") === parents("_pp"), "left")
      .drop("_pa", "_pp")
  }

  /** Q3, page form: attach each page post's `children` array (its
    * one-level reply page, ordered like [[children]]: created_at,
    * author, permlink; `skip`/`limit` applied PER PARENT). The
    * reference runs one find per post (posts.ts:161-231 — N+1); here
    * one window partitioned by parent key ranks every child of the
    * page's posts in a single pass — and the window input is first
    * semi-joined down to the page's keys, so the rank never runs
    * over the full table. Posts with no children get []. */
  def childrenFor(page: DataFrame, source: DataFrame,
                  limit: Int = 100, skip: Int = 0,
                  outCol: String = "children",
                  hydrate: DataFrame => DataFrame = identity)
      : DataFrame = {
    // negative skip behaves like 0 (JS `args.skip` undefined/negative
    // both page from the start) — unclamped, `_rk > -1` would keep
    // ranks 1..limit-1 and silently shorten the page by one
    val sk = math.max(0, skip)
    val keys = page.select(col("author").as("_ca"),
      col("permlink").as("_cp")).distinct()
    val matched = source.join(broadcast(keys),
      source("parent_author") === keys("_ca") &&
        source("parent_permlink") === keys("_cp"), "left_semi")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("parent_author", "parent_permlink")
      .orderBy(col("created_at").asc, col("author").asc,
        col("permlink").asc)
    // rank + page BEFORE `hydrate`: nested (multi-level) hydration then
    // joins against at most page×limit rows, never every child row
    val paged = matched.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") > sk && col("_rk") <= sk.toLong + limit)
    assembleChildren(page, paged, outCol, hydrate)
  }

  /** Q3 page form, served through a REPLY-INDEX layout
    * ([[graft.state.Layout.writeReplyIndex]]) — the scale path for
    * the one API probe the key-bucketed store cannot prune (rows
    * bucket by their own key, children look up by their PARENT's).
    * Same results as [[childrenFor]]; different plan:
    *   1. the page's parent keys prune the slim index to ≤|page keys|
    *      `reply_bucket` partitions (bounded discovery collect),
    *   2. the per-parent rank/skip/limit window runs on the INDEX
    *      (5 narrow columns), never the full-width store,
    *   3. only the ≤ page×limit SURVIVING child keys fetch their full
    *      rows from the store — key-bucket pruned in turn when the
    *      store has the graft layout (`sourceKeyBuckets`).
    * Pruning scales with n/|keys| (a 4096-bucket production index
    * prunes a 100-key page to ~2.5% of files); the window input drops
    * from every child of the page's posts at store width to the same
    * rows at index width regardless. The slim index probe executes
    * twice (bucket discovery + the fetch join's build side) — both
    * executions are the pruned slim scan, cheaper than persisting
    * through the caller's collect.
    *
    * `keysFrom`: the frame to derive the page's keys from when `page`
    * carries extra plan weight (e.g. earlier hydration joins) — must
    * hold the same (author, permlink) rows; the two eager discovery
    * collects then run the slim plan instead of re-executing the
    * joins. Document identity is the FULL 4-tuple
    * (parent_author, parent_permlink, author, permlink) — the same
    * key the merge and the index rows preserve (two documents sharing
    * (author, permlink) under different parents BOTH survive) — so
    * the fetch joins and dedupes on all four; a store whose index
    * holds duplicate 4-tuples (a violated invariant) serves one row
    * per key instead of cross-multiplying past `limit`. */
  def childrenForIndexed(page: DataFrame, source: DataFrame,
                         replyIndex: DataFrame, indexBuckets: Int,
                         limit: Int = 100, skip: Int = 0,
                         outCol: String = "children",
                         hydrate: DataFrame => DataFrame = identity,
                         sourceKeyBuckets: Option[Int] = None,
                         keysFrom: Option[DataFrame] = None)
      : DataFrame = {
    val kf = keysFrom.getOrElse(page)
    val pb = kf.select(graft.state.Layout.keyBucket(col("author"),
        col("permlink"), indexBuckets).as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq
    childrenForIndexedCore(page, kf,
      replyIndex.filter(col("reply_bucket").isin(pb: _*)),
      sourceKeyBuckets.filter(_ => source.columns.contains("key_bucket")),
      {
        case Some(kb) => source.filter(col("key_bucket").isin(kb: _*))
        case None => source
      },
      limit, skip, outCol, hydrate)
  }

  /** [[childrenForIndexed]] BY TABLE DIRECTORY — the listing-cost
    * form. A fresh partitioned read lists EVERY leaf dir to build
    * its file index; at a production modulus that driver listing
    * dwarfs a point probe's task time (measured 43 s wall over
    * 1.5 s task at store+index n=4096, BENCH_NOTES r9). Here both
    * legs go through [[graft.state.Layout.readBucketLeaves]]: the
    * bucket values are computed first (the same page-bounded
    * discovery collects), the leaf dirs are ENUMERATED from them —
    * the layout is its own manifest, bucket → directory is
    * computable — and Spark's file index only ever sees the ≤|keys|
    * leaves the probe will read. Moduli come from the tables' own
    * layout markers (hardcoding n is the silent mis-prune hazard);
    * an unmarked store degrades to the full read.
    *
    * `sourceView` is a row-local view (projection/filter) applied to
    * every store read — identity in production; test/bench harnesses
    * that derive a virtual forest from the flat store hook it here.
    * Results are identical to [[childrenForIndexed]] over the same
    * tables (spec-pinned).
    *
    * EMPTY-STORE SCHEMA CAVEAT: a store with no data leaves at all
    * answers with `outCol` typed as an array of the SLIM reply-index
    * projection (parent/child keys + `created_at` — the only schema
    * an empty store pair still defines), while a data-bearing store
    * yields arrays of (hydrated) store rows. A consumer that binds to
    * store columns inside `outCol`, or unions pages across store
    * states, must treat the empty page's arrays as schema-less
    * emptiness (e.g. gate on the store's emptiness, or select only
    * the index columns) — the store's own row schema does not exist
    * on disk to derive in that state. */
  def childrenForIndexedAt(spark: SparkSession, page: DataFrame,
                           sourceDir: String, indexDir: String,
                           limit: Int = 100, skip: Int = 0,
                           outCol: String = "children",
                           hydrate: DataFrame => DataFrame = identity,
                           keysFrom: Option[DataFrame] = None,
                           sourceView: DataFrame => DataFrame =
                             identity): DataFrame = {
    val idxN = graft.state.Layout.replyIndexBuckets(spark, indexDir)
      .getOrElse(throw new IllegalArgumentException(
        s"$indexDir has no reply_buckets layout marker — build it " +
          "with Layout.writeReplyIndex"))
    // a store with NO data leaves at all (legitimately empty — e.g.
    // freshly bootstrapped, empty-generation-marked) answers the
    // page with EMPTY children without running the probe: its index
    // is empty too, and running the core would need a store schema
    // that does not exist (`sourceView`/`hydrate` referencing store
    // columns would crash on any surrogate). The empty arrays are
    // typed as the slim index projection — the one schema an empty
    // store pair still defines; once data lands, the element type is
    // the (hydrated) store row as usual.
    val firstLeaf = graft.state.Layout.firstDataLeaf(spark, sourceDir)
    if (firstLeaf.isEmpty)
      return page.withColumn(outCol, array().cast(
        org.apache.spark.sql.types.ArrayType(
          graft.state.Layout.emptyReplyIndexRows(spark)
            .drop("reply_bucket").schema)))
    val kf = keysFrom.getOrElse(page)
    val pb = kf.select(graft.state.Layout.keyBucket(col("author"),
        col("permlink"), idxN).as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val idx = graft.state.Layout.replyIndexTable(indexDir)
      .readBuckets(spark, pb)
      .getOrElse(graft.state.Layout.emptyReplyIndexRows(spark))
    val storeN = graft.state.Layout.markedBuckets(spark, sourceDir,
      "key_buckets")
    // empty-result schema source: the ONE data leaf found above, not
    // a full listing (the data-less case already short-circuited)
    def emptyStore(): DataFrame = sourceView(spark.read
      .option("basePath", sourceDir)
      .parquet(firstLeaf.get).filter(lit(false)))
    childrenForIndexedCore(page, kf, idx, storeN,
      {
        case Some(kb) =>
          if (kb.isEmpty) emptyStore()
          else graft.state.Layout.postsStoreTable(sourceDir)
            .readBuckets(spark, kb)
            .map(sourceView).getOrElse(emptyStore())
        case None => sourceView(spark.read.parquet(sourceDir))
      },
      limit, skip, outCol, hydrate)
  }

  /** Shared relational core of the two indexed-children forms: rank
    * the (already index-bucket-pruned) slim index, page per parent,
    * then fetch surviving child rows from the store obtained via
    * `sourceFor` — called with `Some(childKeyBuckets)` when
    * `kbModulus` is known (the caller prunes however its store form
    * allows: isin filter or leaf enumeration), `None` otherwise. */
  private def childrenForIndexedCore(page: DataFrame, kf: DataFrame,
                                     idxPruned: DataFrame,
                                     kbModulus: Option[Int],
                                     sourceFor: Option[Seq[Int]] =>
                                       DataFrame,
                                     limit: Int, skip: Int,
                                     outCol: String,
                                     hydrate: DataFrame => DataFrame)
      : DataFrame = {
    val sk = math.max(0, skip)
    val keys = kf.select(col("author").as("_ca"),
      col("permlink").as("_cp")).distinct()
    val cand = idxPruned
      .join(broadcast(keys),
        idxPruned("parent_author") === keys("_ca") &&
          idxPruned("parent_permlink") === keys("_cp"), "left_semi")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("parent_author", "parent_permlink")
      .orderBy(col("created_at").asc, col("author").asc,
        col("permlink").asc)
    val pagedKeys = cand.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") > sk && col("_rk") <= sk.toLong + limit)
      .select(col("parent_author").as("_pa"),
        col("parent_permlink").as("_pp"),
        col("author").as("_ka"), col("permlink").as("_kp"),
        col("_rk"))
      // one row per document key (see scaladoc)
      .dropDuplicates("_pa", "_pp", "_ka", "_kp")
    val fetchBase = kbModulus match {
      case Some(n) =>
        val kb = pagedKeys.select(graft.state.Layout.keyBucket(
            col("_ka"), col("_kp"), n).as("b"))
          .distinct().collect().map(_.getInt(0)).toSeq
        sourceFor(Some(kb))
      case None => sourceFor(None)
    }
    val ranked = fetchBase.join(broadcast(pagedKeys),
      fetchBase("parent_author") === pagedKeys("_pa") &&
        fetchBase("parent_permlink") === pagedKeys("_pp") &&
        fetchBase("author") === pagedKeys("_ka") &&
        fetchBase("permlink") === pagedKeys("_kp"), "inner")
      .drop("_pa", "_pp", "_ka", "_kp")
      // no-op on a latest-wins store; bounds a duplicate-key store to
      // one fetched row per document instead of multiplying past limit
      .dropDuplicates("parent_author", "parent_permlink", "author",
        "permlink")
    assembleChildren(page, ranked, outCol, hydrate)
  }

  /** Shared tail of the children operators: hydrate the ranked child
    * rows (`_rk` present), collect each parent's page into an
    * `_rk`-ordered struct array, left-join onto the page, [] for
    * childless posts. */
  private def assembleChildren(page: DataFrame, ranked: DataFrame,
                               outCol: String,
                               hydrate: DataFrame => DataFrame)
      : DataFrame = {
    val h = hydrate(ranked)
    val kidCols = h.columns.filterNot(_ == "_rk")
    val grouped = h
      .groupBy(col("parent_author").as("_ca"),
        col("parent_permlink").as("_cp"))
      .agg(transform(
        array_sort(collect_list(struct(col("_rk"),
          struct(kidCols.map(c => col(s"`$c`")).toSeq: _*).as("_kid")))),
        x => x.getField("_kid")).as(outCol))
    val emptyKids = array().cast(
      org.apache.spark.sql.types.ArrayType(
        grouped.schema(outCol).dataType
          .asInstanceOf[org.apache.spark.sql.types.ArrayType]
          .elementType))
    page.join(broadcast(grouped),
      page("author") === grouped("_ca") &&
        page("permlink") === grouped("_cp"), "left")
      .drop("_ca", "_cp")
      .withColumn(outCol, coalesce(col(s"`$outCol`"), emptyKids))
  }

  /** J6 profile hydration: batched broadcast join, not N+1. */
  def hydrateAuthors(posts: DataFrame, profiles: DataFrame): DataFrame =
    posts.join(
      broadcast(profiles.select(col("username"),
        struct(col("displayName"), col("about"), col("images"))
          .as("author_profile"))),
      posts("author") === col("username"), "left")
      .drop("username")

  /** Q12 follows: both directions + counts (A9) in two aggregations.
    */
  def followCounts(follows: DataFrame, id: String): DataFrame =
    // coalesce: sum() over an EMPTY follows table is NULL, and the
    // reference's countDocuments answers 0 there — without it a store
    // with no follow edges turns the counts into field-level errors
    follows.agg(
      coalesce(sum(when(col("follower") === id, 1).otherwise(0)),
        lit(0L)).as("following_count"),
      coalesce(sum(when(col("following") === id, 1).otherwise(0)),
        lit(0L)).as("follower_count"))

  /** Q12 follows(id) edge lists: the reference returns BOTH
    * directions — `followings` (follower = id) and `followers`
    * (following = id) — each edge with `followed_at.toISOString()`
    * and lazily-hydrated follower/following profiles
    * (resolvers/index.ts:322-351). One scan emits both lists (a
    * self-follow edge lands in both, like the reference), and the
    * per-edge N+1 profile lookups become two broadcast joins. */
  def followEdges(follows: DataFrame, profiles: DataFrame,
      id: String): DataFrame = {
    val edges = follows
      .filter(col("follower") === id || col("following") === id)
      .withColumn("list", explode(filter(array(
        when(col("follower") === id, lit("followings")),
        when(col("following") === id, lit("followers"))),
        x => x.isNotNull)))
      .withColumn("followed_at",
        date_format(col("followed_at"),
          "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"))
    def prof(as: String) = broadcast(profiles.select(
      col("username").as(s"_u_$as"),
      struct(col("username"), col("displayName"), col("about"),
        col("images")).as(as)))
    edges
      .join(prof("follower_profile"),
        col("follower") === col("_u_follower_profile"), "left")
      .join(prof("following_profile"),
        col("following") === col("_u_following_profile"), "left")
      .drop("_u_follower_profile", "_u_following_profile")
  }

  /** Q13 leaderBoard: score>0 profiles ranked, plus
    * total_active_creators (A7). Each item carries `author` (the
    * username) and the full profile row as `author_profile`, like the
    * reference's response shape (resolvers/index.ts:464-471).
    * Ranking via [[Rank.globalRowNumber]] — the reference's rank is
    * equally global, but a single-partition window is not how you
    * compute it over 100 TB (identical output, distributed sort). */
  def leaderBoard(profiles: DataFrame): DataFrame =
    Rank.globalRowNumber(profiles.filter(col("score") > 0),
      Seq(col("score").desc, col("username").asc))
      .select(col("rank"), col("username"),
        col("username").as("author"),
        struct(profiles.columns.map(col).toSeq: _*)
          .as("author_profile"),
        col("score"))

  /** A1 trendingTags over posts: 14-day window, unwind, count, top-k.
    */
  def trendingTags(posts: DataFrame, now: Column, k: Int = 5): DataFrame =
    Feeds.topTags(posts,
      col("created_at") > now - expr("INTERVAL 14 DAYS"),
      col("tags"), k)
}
