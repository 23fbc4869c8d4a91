package graft.ingest

import graft.state.Merge
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Social-graph ingest: follows, profiles, communities, delegated
  * authority (reference src/workers/hive-stream.ts:261-493).
  *
  * Every handler is: parse payload JSON → normalized edge/entity
  * events → latest-wins compaction (Merge). Unfollows/revocations are
  * tombstone events that compaction drops — event-sourced S10 rather
  * than point deletes, so batch replay is one shuffle per entity.
  */
object GraphIngest {

  /** Follow/unfollow edges from the three custom_json families
    * (hive-stream.ts:282-397):
    *   - id=follow:     json = ["follow", {follower, following, what[]}]
    *     (empty `what` = unfollow; follower must equal the signer)
    *   - id=spk.follow / spk.unfollow: json = {did, ...}, follower =
    *     signing account, following = the DID
    *   - id=community:  json = ["subscribe"|"unsubscribe",
    *     {community}] — community membership as an edge
    * Returns the compacted follows table (Schemas.follow shape).
    */
  def follows(ops: DataFrame): DataFrame = {
    val cj = ops.filter(col("op_name") === "custom_json")
      .withColumn("cid", get_json_object(col("payload"), "$.id"))
      .withColumn("signer",
        get_json_object(col("payload"), "$.required_posting_auths[0]"))
      .withColumn("json", get_json_object(col("payload"), "$.json"))

    val classic = cj.filter(col("cid") === "follow" &&
      get_json_object(col("json"), "$[0]") === "follow")
      .select(
        get_json_object(col("json"), "$[1].follower").as("follower"),
        get_json_object(col("json"), "$[1].following").as("following"),
        from_json(get_json_object(col("json"), "$[1].what"),
          graft.ddl("array<string>")).as("what"),
        col("ts"), col("block_height"), col("op_index"), col("signer"))
      // follower must equal signer (hive-stream.ts:369-371)
      .filter(col("follower") === col("signer"))
      // a missing `what` crashes the reference op (what.length throws,
      // caught, op skipped) — so it is neither follow nor unfollow
      .filter(col("what").isNotNull)
      .withColumn("unfollow", size(col("what")) === 0)
      // _id: hive-<follower>-<following> (hive-stream.ts:376)
      .withColumn("_id", concat_ws("-", lit("hive"), col("follower"),
        col("following")))
      .withColumn("followed_at", col("ts"))

    val spk = cj.filter(col("cid").isin("spk.follow", "spk.unfollow"))
      .select(
        col("signer").as("follower"),
        get_json_object(col("json"), "$.did").as("following"),
        from_json(get_json_object(col("json"), "$.what"),
          graft.ddl("array<string>")).as("what"),
        col("ts"), col("block_height"), col("op_index"),
        (col("cid") === "spk.unfollow").as("unfollow"))
      .filter(col("following").isNotNull)
      // _id: hive/<account>/<did> (hive-stream.ts:334); the reference
      // never writes followed_at on spk edges
      .withColumn("_id", concat_ws("/", lit("hive"), col("follower"),
        col("following")))
      .withColumn("followed_at", lit(null).cast("timestamp"))

    // spk.unfollow's findOneAndDelete filter includes `what`
    // (hive-stream.ts:345-359): an unfollow whose what differs from
    // the stored edge's what (the latest prior spk.follow) is a no-op
    // and must not tombstone the edge.
    val wPrev = org.apache.spark.sql.expressions.Window
      .partitionBy("follower", "following")
      .orderBy(col("block_height"), col("op_index"))
      .rowsBetween(Long.MinValue, -1)
    // struct marker: the stored edge's `what` may itself be NULL (a
    // follow op without the field) — a bare last(what, ignoreNulls)
    // would skip that follow and compare against a STALE older value,
    // and `=== null` can never match; the reference's delete filter
    // matches null-to-missing, so the compare must be null-safe
    val spkEffective = spk
      .withColumn("__pw",
        last(when(!col("unfollow"), struct(col("what").as("w"))),
          ignoreNulls = true).over(wPrev))
      .filter(!col("unfollow") ||
        (col("__pw").isNotNull && col("__pw.w") <=> col("what")))
      .drop("__pw")

    val community = cj.filter(col("cid") === "community" &&
      get_json_object(col("json"), "$[0]")
        .isin("subscribe", "unsubscribe"))
      .select(
        col("signer").as("follower"),
        get_json_object(col("json"), "$[1].community").as("following"),
        // reference stores the string 'community'; normalized to a
        // single-element array for the typed column
        array(lit("community")).as("what"),
        col("ts"), col("block_height"), col("op_index"),
        (get_json_object(col("json"), "$[0]") === "unsubscribe")
          .as("unfollow"))
      .filter(col("following").isNotNull)
      .withColumn("_id", concat_ws("-", lit("hive"), col("follower"),
        col("following")))
      .withColumn("followed_at", col("ts"))

    val cols = Seq("_id", "follower", "following", "what",
      "followed_at", "ts", "block_height", "op_index", "unfollow")
    val events = classic.select(cols.map(col): _*)
      .unionByName(spkEffective.select(cols.map(col): _*))
      .unionByName(community.select(cols.map(col): _*))
      .filter(col("follower").isNotNull)

    Merge.latestWins(events, Seq("follower", "following"),
        col("block_height"), Seq(col("op_index")))
      .filter(!col("unfollow"))
      .select("_id", "follower", "following", "what", "followed_at")
  }

  private def postingProfile(field: String) =
    get_json_object(col("posting_json_metadata"), s"$$.profile.$field")

  /** account_update2 → profiles (non-`hive-` accounts,
    * hive-stream.ts:448-493). Malformed/profile-less JSON rows are
    * skipped, matching the reference's try/catch-continue. */
  def profiles(ops: DataFrame): DataFrame = {
    val au = ops.filter(col("op_name") === "account_update2")
      .select(
        get_json_object(col("payload"), "$.account").as("account"),
        get_json_object(col("payload"), "$.posting_json_metadata")
          .as("posting_json_metadata"),
        col("ts"), col("block_height"), col("op_index"))
      .filter(col("account").isNotNull &&
        !col("account").startsWith("hive-"))
      .filter(get_json_object(col("posting_json_metadata"), "$.profile")
        .isNotNull)
    Merge.latestWins(au, Seq("account"), col("block_height"),
        Seq(col("op_index")))
      .select(
        concat(lit("hive/"), col("account")).as("_id"),
        col("account").as("username"),
        lit("HIVE").as("TYPE"),
        postingProfile("name").as("displayName"),
        postingProfile("about").as("about"),
        postingProfile("location").as("location"),
        postingProfile("website").as("website"),
        get_json_object(col("posting_json_metadata"), "$.did")
          .as("did"),
        struct(postingProfile("profile_image").as("avatar"),
          postingProfile("cover_image").as("cover")).as("images"),
        struct(postingProfile("pinned").as("pinned_post")).as("extra"),
        lit(null).cast("double").as("score"))
  }

  /** Communities from the two write sites, merged per account:
    *   - account_update2 on `hive-` accounts with a profile key sets
    *     ONLY images + needs_update (hive-stream.ts:456-472 — title/
    *     about arrive later via updateProps or the S4 refresh);
    *   - custom_json id=community ["updateProps", {title, about}]
    *     sets title/about + needs_update (hive-stream.ts:311-323),
    *     keyed by the SIGNING account.
    */
  def communities(ops: DataFrame): DataFrame = {
    val au = ops.filter(col("op_name") === "account_update2")
      .select(
        get_json_object(col("payload"), "$.account").as("account"),
        get_json_object(col("payload"), "$.posting_json_metadata")
          .as("posting_json_metadata"),
        col("ts"), col("block_height"), col("op_index"))
      .filter(col("account").isNotNull &&
        col("account").startsWith("hive-"))
      // profile-less / malformed json is skipped for communities too
      // (hive-stream.ts:453-455)
      .filter(get_json_object(col("posting_json_metadata"), "$.profile")
        .isNotNull)
    val images = Merge.latestWins(au, Seq("account"),
        col("block_height"), Seq(col("op_index")))
      .select(col("account"), col("ts"),
        struct(postingProfile("profile_image").as("avatar"),
          postingProfile("cover_image").as("cover")).as("images"),
        // profile.topcs (sic) || [] — the reference reads a typo'd
        // key (hive-stream.ts:466), so this is [] in practice
        coalesce(from_json(postingProfile("topcs"),
          graft.ddl("array<string>")), array().cast("array<string>"))
          .as("topics"))

    val props = ops.filter(col("op_name") === "custom_json" &&
      get_json_object(col("payload"), "$.id") === "community")
      .withColumn("json", get_json_object(col("payload"), "$.json"))
      .filter(get_json_object(col("json"), "$[0]") === "updateProps")
      .select(
        get_json_object(col("payload"), "$.required_posting_auths[0]")
          .as("account"),
        get_json_object(col("json"), "$[1].title").as("title"),
        get_json_object(col("json"), "$[1].about").as("about"),
        col("ts"), col("block_height"), col("op_index"))
      .filter(col("account").isNotNull)
    val latestProps = Merge.latestWins(props, Seq("account"),
        col("block_height"), Seq(col("op_index")))
      .select(col("account").as("p_account"), col("title"),
        col("about"), col("ts").as("p_ts"))

    images.join(latestProps,
        col("account") === col("p_account"), "full_outer")
      .withColumn("acct", coalesce(col("account"), col("p_account")))
      .select(
        concat(lit("hive/"), col("acct")).as("_id"),
        col("acct").as("username"),
        col("title"),
        col("about"),
        lit(null).cast("string").as("description"),
        lit(null).cast("string").as("flag_text"),
        lit(null).cast("string").as("lang"),
        lit(null).cast("boolean").as("is_nsfw"),
        lit(null).cast("int").as("subscribers"),
        coalesce(col("ts"), col("p_ts")).as("created_at"),
        lit(null).cast("array<array<string>>").as("roles"),
        col("images"),
        col("topics"),
        lit(true).as("needs_update"))
  }

  /** Accounts whose granted posting authority is tracked
    * (reference src/config.ts delegated_posting_accounts). */
  val delegatedPostingAccounts: Seq[String] =
    Seq("threespeak", "threespeak.beta")

  /** account_update → delegated posting authority
    * (hive-stream.ts:399-447). Observable reference behavior is
    * ADDS-ONLY: the revocation loop dereferences
    * `updateOp.posting.account_auth` (a typo — the field is
    * `account_auths`), so whenever it would run it throws and the
    * per-op try/catch (hive-stream.ts:700-702) swallows the whole op;
    * the J11 reconcile described in SURVEY.md §2.6 is dead code. We
    * therefore accumulate every granted (from, to) edge ever seen,
    * keeping the newest op's block/trx/date metadata per edge, and
    * never drop edges on revocation. */
  def delegatedAuthority(ops: DataFrame): DataFrame = {
    val au = ops.filter(col("op_name") === "account_update")
      .select(
        get_json_object(col("payload"), "$.account").as("account"),
        get_json_object(col("payload"), "$.posting.account_auths")
          .as("auths_json"),
        col("ts"), col("block_height"), col("op_index"), col("trx_id"))
      .filter(col("account").isNotNull && col("auths_json").isNotNull)
    val edges = au
      .select(col("account"), col("ts"), col("block_height"),
        col("op_index"), col("trx_id"),
        explode(from_json(col("auths_json"),
          graft.ddl("array<array<string>>"))).as("auth"))
      // only configured delegate accounts are tracked
      // (hive-stream.ts:425-427)
      .filter(col("auth").getItem(0)
        .isin(delegatedPostingAccounts: _*))
      .withColumn("to", col("auth").getItem(0))
    Merge.latestWins(edges, Seq("account", "to"),
        col("block_height"), Seq(col("op_index")))
      .select(
        lit("posting").as("type"),
        col("account").as("from"),
        col("to"),
        col("ts").as("date"),
        col("trx_id"),
        col("block_height"))
  }

  /** custom_json id=spk.bridge_id → dirty set: the reference only
    * FLAGS needs_stream_id on the existing post (hive-stream.ts:
    * 261-281); the id itself is created later by offchainIdRefresh
    * (Enrich.applyStreamIds is that application step). */
  def streamIdRequests(ops: DataFrame): DataFrame =
    ops.filter(col("op_name") === "custom_json" &&
      get_json_object(col("payload"), "$.id") === "spk.bridge_id")
      .select(
        get_json_object(get_json_object(col("payload"), "$.json"),
          "$.author").as("author"),
        get_json_object(get_json_object(col("payload"), "$.json"),
          "$.permlink").as("permlink"),
        get_json_object(get_json_object(col("payload"), "$.json"),
          "$.stream_id").as("stream_id"))
      .filter(col("author").isNotNull)
      .distinct()
}
