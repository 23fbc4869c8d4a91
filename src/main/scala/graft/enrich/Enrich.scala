package graft.enrich

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Background-enrichment jobs (reference src/workers/background-proc/
  * core.ts, src/workers/process-meta.ts) re-expressed as set-based
  * joins: what the reference does with per-document RPC loops at
  * concurrency 50 becomes one join per batch — the N-round-trip → one
  * shuffle transformation that makes this plane scale.
  */
object Enrich {

  /** X12: `"1.234 HBD"` → 1.234 (core.ts:104, post-stats.ts:46-48). */
  def moneyToDouble(c: Column): Column =
    split(c, " ").getItem(0).cast("double")

  /** postStats (core.ts:73-162): dirty posts ⋈ content_rpc (J5/S3) +
    * self-join comment counts (A2) → recomputed `stats` struct +
    * `hive_rewards`, dirty flag cleared.
    *
    * Update applies only where the reference would write: TYPE='HIVE'
    * rows whose `needs_stat_update` is true or missing (core.ts:77-98)
    * and whose get_content RPC returned data — Ceramic posts and
    * RPC misses keep their stored stats untouched. A4 payout: pending
    * if last_payout is epoch, else total+curator (core.ts:104). A3
    * vote tallies from active_votes signs (core.ts:117-126). The
    * 6000-row/run batch cap is an operational knob, not a semantic.
    *
    * If `contentRpc` carries a boolean `deleted` column (the
    * "was deleted" RPC error, core.ts:141-153), those rows get
    * status='deleted' and the flag cleared, with stats untouched.
    */
  def postStats(posts: DataFrame, contentRpc: DataFrame): DataFrame = {
    val hasDeleted = contentRpc.columns.contains("deleted")
    // A2: one aggregation replaces N countDocuments round-trips.
    val commentCounts = posts
      .filter(col("parent_author") =!= "")
      .groupBy(col("parent_author").as("ca"),
        col("parent_permlink").as("cp"))
      .agg(count(lit(1)).cast("int").as("num_comments"))

    val av = col("active_votes")
    val payout = when(col("last_payout") <= "1970-01-01T00:00:00",
      moneyToDouble(col("pending_payout_value")))
      .otherwise(moneyToDouble(col("total_payout_value")) +
        moneyToDouble(col("curator_payout_value")))
    val dirty = col("p.needs_stat_update").isNull ||
      col("p.needs_stat_update")
    val rpcDeleted =
      if (hasDeleted) coalesce(col("c.deleted"), lit(false))
      else lit(false)
    val applies = col("p.TYPE") === "HIVE" && dirty &&
      col("c.net_votes").isNotNull && !rpcDeleted
    val deleteApplies = col("p.TYPE") === "HIVE" && dirty && rpcDeleted

    // rpc snapshots are one-row-per-post; guard against a duplicated
    // snapshot multiplying the posts table through the left join.
    // The survivor is picked DETERMINISTICALLY (smallest whole-row
    // hash) — dropDuplicates keeps a partition-order-dependent row,
    // which would make enrichment output vary run to run when the
    // duplicates differ in content.
    val rpcOnePerKey = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("author", "permlink")
        .orderBy(md5(to_json(struct(contentRpc.columns.map(col): _*))))
      contentRpc.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    }
    posts.alias("p")
      .join(rpcOnePerKey.alias("c"), Seq("author", "permlink"), "left")
      .join(commentCounts,
        col("p.author") === col("ca") && col("p.permlink") === col("cp"),
        "left")
      .withColumn("stats",
        when(applies, struct(
          coalesce(col("num_comments"), lit(0)).as("num_comments"),
          coalesce(col("c.net_votes"), lit(0)).as("num_votes"),
          coalesce(size(filter(av, v => v.getField("rshares") > 0)),
            lit(0)).as("num_up_votes"),
          coalesce(size(filter(av, v => v.getField("rshares") < 0)),
            lit(0)).as("num_down_votes"),
          coalesce(payout, lit(0.0)).as("total_hive_reward"),
          coalesce(av, array().cast(
            "array<struct<voter:string,rshares:double," +
              "percent:int,weight:double>>")).as("active_voters")))
          .otherwise(col("p.stats")))
      .withColumn("hive_rewards",
        when(applies, struct(
          col("c.max_accepted_payout"),
          col("c.max_cashout_time"),
          col("c.cashout_time"),
          col("c.total_payout_value"),
          col("c.curator_payout_value"),
          payout.as("payout"),
          col("c.last_payout").as("payout_at")))  // core.ts:133
          .otherwise(col("p.hive_rewards")))
      // status before needs_stat_update: both conditions read the
      // pre-update p.needs_stat_update dirty flag
      .withColumn("status",
        when(deleteApplies, lit("deleted")).otherwise(col("p.status")))
      .withColumn("needs_stat_update",
        when(applies || deleteApplies, lit(false))
          .otherwise(col("p.needs_stat_update")))
      .select(posts.columns.map { n =>
        if (Seq("stats", "hive_rewards", "needs_stat_update", "status")
          .contains(n)) col(n).as(n)
        else col(s"p.$n")
      }.toSeq: _*)
  }

  /** The dirty set updateHeightWeight fetches playlists for
    * (core.ts:198-207): top-level 3speak posts without dimensions. */
  def videoMetaCandidates(posts: DataFrame): DataFrame =
    posts.filter(col("parent_author") === "" &&
      get_json_object(col("json_metadata_raw"), "$.app")
        .rlike("3speak") &&
      col("app_metadata.spkvideo.height").isNull &&
      col("app_metadata.spkvideo.width").isNull)
      .select("author", "permlink")

  /** updateHeightWeight (core.ts:193-246): video posts without
    * dimensions ⋈ fetched playlists (S6) → width/height via the
    * RESOLUTION regex (X9) + is_short (X10: ≤180 s and portrait).
    * `playlists` carries (author, permlink, body). */
  def videoMeta(posts: DataFrame, playlists: DataFrame): DataFrame = {
    val res = "RESOLUTION=([0-9]+)x([0-9]+)"
    val pl = playlists.select(col("author"), col("permlink"),
      regexp_extract(col("body"), res, 1).cast("int").as("w"),
      regexp_extract(col("body"), res, 2).cast("int").as("h"))
      .withColumn("w", coalesce(when(col("w") =!= 0, col("w")), lit(0)))
      .withColumn("h", coalesce(when(col("h") =!= 0, col("h")), lit(0)))
    // duration ?? 0.0 (core.ts:226) — a missing duration still gets
    // an is_short verdict from the aspect ratio alone
    val duration = coalesce(get_json_object(col("json_metadata_raw"),
      "$.video.info.duration").cast("double"), lit(0.0))
    val sv = col("app_metadata.spkvideo")
    posts.join(pl, Seq("author", "permlink"), "left")
      .withColumn("app_metadata",
        // Mongo's dotted $set creates spkvideo if absent
        // (core.ts:232-241), so a null spkvideo doesn't skip the
        // write — its other fields just stay null
        when(col("w").isNotNull, struct(
          col("app_metadata.types").as("types"),
          col("app_metadata.app").as("app"),
          struct(
            sv.getField("authority_signed").as("authority_signed"),
            sv.getField("storage_type").as("storage_type"),
            sv.getField("first_upload").as("first_upload"),
            col("h").as("height"),
            col("w").as("width"),
            (duration <= 180 && col("h") >= col("w")).as("is_short"))
            .as("spkvideo")))
          .otherwise(col("app_metadata")))
      .drop("w", "h")
  }

  /** scoreChannels (A6, core.ts:285-383): per 3speak author,
    * score = 3×(first-level comments on their videos) + 0.1×(video
    * votes); everyone else zeroed (S11 as a left join, not a scan-
    * and-update loop).
    *
    * Observable reference bug, reproduced: the vote accumulator is
    * `totalVotes + vid.stats?.num_votes || 0` (core.ts:355) — JS
    * precedence makes the sum NaN when a video has no stats, and
    * `|| 0` then RESETS the accumulator. So total_votes is the sum of
    * num_votes over the videos AFTER the author's last stats-less
    * video in cursor order (insertion ≈ created_at; permlink as the
    * deterministic tie-break). The comments accumulator is unaffected
    * (countDocuments always returns a number). */
  def channelScores(posts: DataFrame, profiles: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the reference scores over ALL app=3speak posts of the author —
    // it does not exclude comment-flagged rows (core.ts:341-345)
    val videos = posts.filter(col("app_metadata.app") === "3speak")
    val commentCounts = posts
      .filter(col("parent_author") =!= "")
      .groupBy(col("parent_author").as("ca"),
        col("parent_permlink").as("cp"))
      .agg(count(lit(1)).as("n_comments"))
    val numVotes = col("v.stats.num_votes").cast("long")
    val wOrd = Window.partitionBy(col("v.author"))
      .orderBy(col("v.created_at"), col("v.permlink"))
    val wAll = Window.partitionBy(col("v.author"))
    val perAuthor = videos.alias("v")
      .join(commentCounts,
        col("v.author") === col("ca") && col("v.permlink") === col("cp"),
        "left")
      .withColumn("__idx", row_number().over(wOrd))
      // last stats-less video resets the vote accumulator (see above)
      .withColumn("__reset",
        max(when(numVotes.isNull, col("__idx"))).over(wAll))
      .groupBy(col("v.author").as("author"))
      .agg(
        sum(coalesce(col("n_comments"), lit(0L))).as("total_comments"),
        coalesce(sum(when(col("__idx") > coalesce(col("__reset"), lit(0)),
          numVotes)), lit(0L)).as("total_votes"))
      .withColumn("new_score",
        col("total_comments") * 3 + col("total_votes") * 0.1)
    profiles.alias("pr")
      .join(perAuthor.alias("sc"),
        col("pr.username") === col("sc.author"), "left")
      .withColumn("score", coalesce(col("new_score"), lit(0.0)))
      .select(profiles.columns.map {
        case "score" => col("score")
        case n => col(s"pr.$n")
      }.toSeq: _*)
  }

  /** process-meta notifications (X7, src/services/block_processing/
    * notifications.ts:5-56): extract @mentions from post bodies →
    * notification rows; DID mentions typed 'did', hive names
    * lowercased, mentioned_at = the post's updated_at, ref =
    * hive/<author>/<permlink>. Mention token charset and the
    * preceding-boundary rule follow twitter-text's published mention
    * pattern (no dots in names; not preceded by word/@-adjacent
    * chars). Dedup matches the whole-document dedup at insert
    * (process-meta.ts:25-28). */
  def mentionNotifications(posts: DataFrame): DataFrame = {
    // twitter-text mention pattern incl. the retweet-prefix
    // alternative: "rt@name" / "RT:@name" count as mentions even
    // though 't'/':' precede the @ (notifications.ts:5)
    val mentionRe = "(?:^|[^a-zA-Z0-9_!#$%&*@＠]|" +
      "(?:^|[^a-zA-Z0-9_+~.-])(?:rt|RT|rT|Rt):?)" +
      "[@＠]([a-zA-Z0-9_:-]{1,80})"
    posts
      .select(col("author"), col("permlink"), col("updated_at"),
        explode(array_distinct(
          regexp_extract_all(col("body"), lit(mentionRe), lit(1))))
          .as("mention"))
      .select(
        when(col("mention").startsWith("did:"), col("mention"))
          .otherwise(lower(col("mention"))).as("target"),
        col("author").as("from"),
        when(col("mention").startsWith("did:"), lit("did"))
          .otherwise(lit("hive")).as("type"),
        lit("mention").as("notification_type"),
        col("updated_at").as("mentioned_at"),
        concat_ws("/", lit("hive"), col("author"), col("permlink"))
          .as("ref"))
      .distinct()
  }

  /** Cross-batch notification dedup + sink population: candidate
    * mention notifications from this batch minus the rows already in
    * the notifications table. The reference runs `findOne(notify)`
    * per candidate and inserts only on miss (process-meta.ts:25-28) —
    * a whole-document match, which is ONE left anti join here (no
    * N round-trips). The worker selects posts with
    * `metadata_status='unprocessed'` (process-meta.ts:15-17); note it
    * observably never flips that flag afterwards, so re-runs re-derive
    * the same candidates — exactly why the anti join must exist.
    * Replaying overlapping batches therefore yields no duplicates:
    * union the result into `stored` after each batch.
    * (All notification fields are non-null, so join-key null
    * semantics don't matter for the whole-row match.) */
  def newNotifications(posts: DataFrame, stored: DataFrame): DataFrame = {
    val batch = mentionNotifications(
      posts.filter(col("metadata_status") === "unprocessed"))
    batch.join(stored, batch.columns.toSeq, "left_anti")
  }

  /** communityRefresh (S4, core.ts:248-283): communities flagged
    * needs_update ⋈ `communities_rpc` (bridge.get_community stand-in:
    * name, title, about, description, flag_text, lang, is_nsfw,
    * subscribers, created_at, team) → refreshed metadata + roles,
    * created_at reset from the RPC (core.ts:272), flag cleared. Only
    * `hive-` community accounts are processed (core.ts:252-254). */
  def communityRefresh(communities: DataFrame,
                       communitiesRpc: DataFrame): DataFrame = {
    val joined = communities.alias("c")
      // rpc snapshots are one-row-per-community; guard against a
      // duplicated snapshot multiplying the entity table
      .join(communitiesRpc.dropDuplicates("name").alias("r"),
        col("c.username") === col("r.name"), "left")
    val applies = col("c.needs_update") &&
      col("c.username").startsWith("hive-") && col("r.name").isNotNull
    def pick(f: String) =
      when(applies, col(s"r.$f")).otherwise(col(s"c.$f"))
    joined.select(
      col("c._id").as("_id"), col("c.username").as("username"),
      pick("title").as("title"), pick("about").as("about"),
      pick("description").as("description"),
      pick("flag_text").as("flag_text"), pick("lang").as("lang"),
      pick("is_nsfw").as("is_nsfw"),
      pick("subscribers").as("subscribers"),
      when(applies, to_timestamp(col("r.created_at")))
        .otherwise(col("c.created_at")).as("created_at"),
      when(applies, col("r.team")).otherwise(col("c.roles")).as("roles"),
      col("c.images").as("images"),
      col("c.topics").as("topics"),
      when(applies, lit(false))
        .otherwise(col("c.needs_update")).as("needs_update"))
  }

  /** pullAllAccounts apply (S5, core.ts:393-449): missing-profile
    * authors ⋈ `accounts_rpc` (database.getAccounts stand-in) →
    * profile rows. Rows with unparseable JSON or no `.profile` key
    * are skipped, matching the reference's try/catch-continue.
    *
    * Metadata source: `posting_json_metadata || json_metadata`
    * (core.ts:407) — an empty/missing posting metadata falls back to
    * json_metadata, so accounts whose profile lives only there are
    * still hydrated. The fallback column is optional (older
    * snapshots may not carry it). */
  def profilesFromAccountsRpc(accountsRpc: DataFrame): DataFrame = {
    val metaSrc =
      if (accountsRpc.columns.contains("json_metadata"))
        coalesce(nullif(col("posting_json_metadata"), lit("")),
          col("json_metadata"))
      else col("posting_json_metadata")
    def pf(f: String) = get_json_object(metaSrc, s"$$.profile.$f")
    accountsRpc
      .filter(get_json_object(metaSrc, "$.profile").isNotNull)
      .select(
        concat(lit("hive/"), col("name")).as("_id"),
        col("name").as("username"),
        lit("HIVE").as("TYPE"),
        pf("name").as("displayName"),
        pf("about").as("about"),
        pf("location").as("location"),
        pf("website").as("website"),
        get_json_object(metaSrc, "$.did").as("did"),
        struct(pf("profile_image").as("avatar"),
          pf("cover_image").as("cover")).as("images"),
        struct(pf("pinned").as("pinned_post")).as("extra"),
        lit(null).cast("double").as("score"))
  }

  /** offchainIdRefresh (core.ts:44-71): stream-id grants (from
    * spk.bridge_id ops or the Ceramic bridge) applied to posts —
    * id set, needs_stream_id cleared. The reference selects only
    * TYPE='HIVE' rows with no existing id, so a replayed grant never
    * overwrites one already stored. (The reference writers store the
    * field as `offchain_id` while its GraphQL layer reads
    * `off_chain_id` — a split it never reconciles; we keep the single
    * read-surface column `off_chain_id`.) */
  def applyStreamIds(posts: DataFrame, streamIds: DataFrame): DataFrame = {
    val applies = col("p.TYPE") === "HIVE" &&
      col("p.off_chain_id").isNull && col("stream_id").isNotNull
    posts.alias("p")
      // one grant per key: replayed/duplicate grants must not
      // multiply posts rows through the left join
      .join(streamIds.groupBy(col("author").as("sa"),
          col("permlink").as("sp"))
          .agg(max("stream_id").as("stream_id")),
        col("p.author") === col("sa") && col("p.permlink") === col("sp"),
        "left")
      .withColumn("__applies", applies)
      .withColumn("off_chain_id",
        when(col("__applies"), col("stream_id"))
          .otherwise(col("p.off_chain_id")))
      .withColumn("needs_stream_id",
        when(col("__applies"), lit(false))
          .otherwise(col("p.needs_stream_id")))
      .select(posts.columns.map {
        case n @ ("off_chain_id" | "needs_stream_id") => col(n).as(n)
        case n => col(s"p.$n")
      }.toSeq: _*)
  }

  /** pullAllAccounts discovery (J7, core.ts:393-449): distinct authors
    * with no profile row — the left anti join replacing the findOne
    * loop. */
  def missingProfiles(posts: DataFrame, profiles: DataFrame): DataFrame =
    posts.select(col("author")).distinct()
      .join(profiles, col("author") === col("username"), "left_anti")
}
