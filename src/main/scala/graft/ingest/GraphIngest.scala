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
      .withColumn("unfollow", size(coalesce(col("what"),
        array().cast("array<string>"))) === 0)

    val spk = cj.filter(col("cid").isin("spk.follow", "spk.unfollow"))
      .select(
        col("signer").as("follower"),
        get_json_object(col("json"), "$.did").as("following"),
        from_json(get_json_object(col("json"), "$.what"),
          graft.ddl("array<string>")).as("what"),
        col("ts"), col("block_height"), col("op_index"),
        (col("cid") === "spk.unfollow").as("unfollow"))
      .filter(col("following").isNotNull)

    val community = cj.filter(col("cid") === "community" &&
      get_json_object(col("json"), "$[0]")
        .isin("subscribe", "unsubscribe"))
      .select(
        col("signer").as("follower"),
        get_json_object(col("json"), "$[1].community").as("following"),
        array(lit("community")).as("what"),
        col("ts"), col("block_height"), col("op_index"),
        (get_json_object(col("json"), "$[0]") === "unsubscribe")
          .as("unfollow"))
      .filter(col("following").isNotNull)

    val events = classic
      .select("follower", "following", "what", "ts", "block_height",
        "op_index", "unfollow")
      .unionByName(spk.select("follower", "following", "what", "ts",
        "block_height", "op_index", "unfollow"))
      .unionByName(community.select("follower", "following", "what",
        "ts", "block_height", "op_index", "unfollow"))
      .filter(col("follower").isNotNull)

    Merge.latestWins(events, Seq("follower", "following"),
        col("block_height"), Seq(col("op_index")))
      .filter(!col("unfollow"))
      .select(
        concat_ws("-", lit("hive"), col("follower"), col("following"))
          .as("_id"),
        col("follower"), col("following"), col("what"),
        col("ts").as("followed_at"))
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

  /** account_update2 → communities (`hive-` accounts,
    * hive-stream.ts:456-472); flagged needs_update for the
    * enrichment join (S4). */
  def communities(ops: DataFrame): DataFrame = {
    val au = ops.filter(col("op_name") === "account_update2")
      .select(
        get_json_object(col("payload"), "$.account").as("account"),
        get_json_object(col("payload"), "$.posting_json_metadata")
          .as("posting_json_metadata"),
        col("ts"), col("block_height"), col("op_index"))
      .filter(col("account").isNotNull &&
        col("account").startsWith("hive-"))
    Merge.latestWins(au, Seq("account"), col("block_height"),
        Seq(col("op_index")))
      .select(
        concat(lit("hive/"), col("account")).as("_id"),
        col("account").as("username"),
        postingProfile("name").as("title"),
        postingProfile("about").as("about"),
        lit(null).cast("string").as("description"),
        lit(null).cast("string").as("flag_text"),
        lit(null).cast("string").as("lang"),
        lit(null).cast("boolean").as("is_nsfw"),
        lit(null).cast("int").as("subscribers"),
        col("ts").as("created_at"),
        lit(null).cast("array<array<string>>").as("roles"),
        struct(postingProfile("profile_image").as("avatar"),
          postingProfile("cover_image").as("cover")).as("images"),
        lit(true).as("needs_update"))
  }

  /** account_update → delegated posting authority (J11 reconcile,
    * hive-stream.ts:399-447): the latest op per account defines the
    * complete auth set — adds and revokes fall out of the replace
    * (relational `except` of old vs new, here latest-wins + explode).
    */
  def delegatedAuthority(ops: DataFrame): DataFrame = {
    val au = ops.filter(col("op_name") === "account_update")
      .select(
        get_json_object(col("payload"), "$.account").as("account"),
        get_json_object(col("payload"), "$.posting.account_auths")
          .as("auths_json"),
        col("ts"), col("block_height"), col("op_index"), col("trx_id"))
      .filter(col("account").isNotNull && col("auths_json").isNotNull)
    Merge.latestWins(au, Seq("account"), col("block_height"),
        Seq(col("op_index")))
      .select(col("account"), col("ts"), col("block_height"),
        col("trx_id"),
        explode(from_json(col("auths_json"), graft.ddl("array<array<string>>")))
          .as("auth"))
      .select(
        lit("posting").as("type"),
        col("account").as("from"),
        col("auth").getItem(0).as("to"),
        col("ts").as("date"),
        col("trx_id"),
        col("block_height"))
  }

  /** custom_json id=spk.bridge_id → needs_stream_id flags
    * (hive-stream.ts:261-281). */
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
