package graft.domain

import org.apache.spark.sql.types._

/** Entity-table schemas for the social-indexer domain (SURVEY.md §1,
  * FIXTURES.md §B.2-B.5). Fixed StructTypes for the ~40 known fields;
  * the open tail of the reference's documents (`[x:string]: any`,
  * src/types/posts.ts:83) is kept as one `json_metadata_raw` string
  * column queried with from_json/get_json_object on demand.
  */
object Schemas {

  val activeVoter: StructType = StructType(Seq(
    StructField("voter", StringType),
    StructField("rshares", DoubleType),
    StructField("percent", IntegerType),
    StructField("weight", DoubleType)))

  val stats: StructType = StructType(Seq(
    StructField("num_comments", IntegerType),
    StructField("num_votes", IntegerType),
    StructField("num_up_votes", IntegerType),
    StructField("num_down_votes", IntegerType),
    StructField("total_hive_reward", DoubleType),
    StructField("active_voters", ArrayType(activeVoter))))

  val hiveRewards: StructType = StructType(Seq(
    StructField("max_accepted_payout", StringType),
    StructField("max_cashout_time", StringType),
    StructField("cashout_time", StringType),
    StructField("total_payout_value", StringType),
    StructField("curator_payout_value", StringType),
    StructField("payout", DoubleType),
    StructField("payout_at", StringType)))

  val stateControl: StructType = StructType(Seq(
    StructField("block_height", LongType),
    StructField("version_id", StringType)))

  val originControl: StructType = StructType(Seq(
    StructField("allowed_by_parent", BooleanType),
    StructField("allowed_by_type", BooleanType),
    StructField("allowed_by_community", BooleanType)))

  val spkvideo: StructType = StructType(Seq(
    StructField("authority_signed", BooleanType),
    StructField("storage_type", StringType),
    StructField("first_upload", BooleanType),
    StructField("height", IntegerType),
    StructField("width", IntegerType),
    StructField("is_short", BooleanType)))

  val appMetadata: StructType = StructType(Seq(
    StructField("types", ArrayType(StringType)),
    StructField("app", StringType),
    StructField("spkvideo", spkvideo)))

  /** posts — the central fact table (src/types/posts.ts:1-84). */
  val post: StructType = StructType(Seq(
    StructField("parent_author", StringType),
    StructField("parent_permlink", StringType),
    StructField("author", StringType),
    StructField("permlink", StringType),
    StructField("status", StringType),
    StructField("title", StringType),
    StructField("body", StringType),
    StructField("tags", ArrayType(StringType)),
    StructField("created_at", TimestampType),
    StructField("updated_at", TimestampType),
    StructField("metadata_status", StringType),
    StructField("needs_stat_update", BooleanType),
    StructField("needs_stream_id", BooleanType),
    StructField("stats", stats),
    StructField("hive_rewards", hiveRewards),
    StructField("state_control", stateControl),
    StructField("origin_control", originControl),
    StructField("json_metadata_raw", StringType),
    StructField("app_metadata", appMetadata),
    StructField("ipfs_links", ArrayType(StructType(Seq(
      StructField("cid", StringType))))),
    StructField("beneficiaries", ArrayType(StructType(Seq(
      StructField("account", StringType),
      StructField("weight", IntegerType))))),
    StructField("TYPE", StringType),
    StructField("__t", StringType),
    StructField("__v", StringType),
    StructField("flags", ArrayType(StringType)),
    StructField("off_chain_id", StringType)))

  /** profiles (hive-stream.ts:474-492, core.ts:418-436). */
  val profile: StructType = StructType(Seq(
    StructField("_id", StringType),
    StructField("username", StringType),
    StructField("TYPE", StringType),
    StructField("displayName", StringType),
    StructField("about", StringType),
    StructField("location", StringType),
    StructField("website", StringType),
    StructField("did", StringType),
    StructField("images", StructType(Seq(
      StructField("avatar", StringType),
      StructField("cover", StringType)))),
    StructField("extra", StructType(Seq(
      StructField("pinned_post", StringType)))),
    StructField("score", DoubleType)))

  /** communities (core.ts:260-278). */
  val community: StructType = StructType(Seq(
    StructField("_id", StringType),
    StructField("username", StringType),
    StructField("title", StringType),
    StructField("about", StringType),
    StructField("description", StringType),
    StructField("flag_text", StringType),
    StructField("lang", StringType),
    StructField("is_nsfw", BooleanType),
    StructField("subscribers", IntegerType),
    StructField("created_at", TimestampType),
    StructField("roles", ArrayType(ArrayType(StringType))),
    StructField("images", StructType(Seq(
      StructField("avatar", StringType),
      StructField("cover", StringType)))),
    // written from profile.topcs (sic — reference reads a typo'd key,
    // hive-stream.ts:466) so it is [] in practice
    StructField("topics", ArrayType(StringType)),
    StructField("needs_update", BooleanType)))

  /** follows edge list (hive-stream.ts:287-301, 333-343). */
  val follow: StructType = StructType(Seq(
    StructField("_id", StringType),
    StructField("follower", StringType),
    StructField("following", StringType),
    StructField("what", ArrayType(StringType)),
    StructField("followed_at", TimestampType)))

  /** delegated-authority (src/types/index.ts:1-8). */
  val delegatedAuthority: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("from", StringType),
    StructField("to", StringType),
    StructField("date", TimestampType),
    StructField("trx_id", StringType),
    StructField("block_height", LongType)))

  /** notifications (src/services/block_processing/notifications.ts:46-53). */
  val notification: StructType = StructType(Seq(
    StructField("target", StringType),
    StructField("from", StringType),
    StructField("type", StringType),
    StructField("notification_type", StringType),
    StructField("mentioned_at", TimestampType),
    StructField("ref", StringType)))

  /** Raw Hive block (ingest input, FIXTURES.md §B.1). */
  val block: StructType = StructType(Seq(
    StructField("block_id", StringType),
    StructField("timestamp", StringType),
    StructField("transactions", ArrayType(StructType(Seq(
      StructField("transaction_id", StringType),
      StructField("operations", ArrayType(StructType(Seq(
        StructField("name", StringType),
        StructField("payload", StringType)))))))))))

  /** content_rpc enrichment input (FIXTURES.md §B.4; get_content,
    * core.ts:100-134). */
  val contentRpc: StructType = StructType(Seq(
    StructField("author", StringType),
    StructField("permlink", StringType),
    StructField("last_payout", StringType),
    StructField("pending_payout_value", StringType),
    StructField("total_payout_value", StringType),
    StructField("curator_payout_value", StringType),
    StructField("net_votes", IntegerType),
    StructField("max_accepted_payout", StringType),
    StructField("max_cashout_time", StringType),
    StructField("cashout_time", StringType),
    StructField("active_votes", ArrayType(activeVoter))))

  /** Ceramic CDC change-stream event (FIXTURES.md §B.5; reference
    * src/services/index.ts:57-131). */
  val cdcEvent: StructType = StructType(Seq(
    StructField("operationType", StringType),
    StructField("clusterTime", LongType),
    StructField("ns", StructType(Seq(StructField("coll", StringType)))),
    StructField("updateDescription", StructType(Seq(
      StructField("updatedFields", MapType(StringType, StringType))))),
    StructField("fullDocument", StructType(Seq(
      StructField("id", StringType),
      StructField("creator_id", StringType),
      StructField("version_id", StringType),
      StructField("created_at", TimestampType),
      StructField("updated_at", TimestampType),
      StructField("parent_headers", StructType(Seq(
        StructField("author", StringType),
        StructField("permlink", StringType)))),
      StructField("app_metadata", StructType(Seq(
        StructField("permlink", StringType)))),
      StructField("content", StructType(Seq(
        StructField("title", StringType),
        StructField("body", StringType),
        StructField("json_metadata_raw", StringType)))))))))

  /** comment op json_metadata shape (posts.ts:51-56, 109-152) for
    * from_json extraction; unknown keys stay in json_metadata_raw. */
  val commentMeta: StructType = StructType(Seq(
    StructField("app", StringType),
    StructField("tags", ArrayType(StringType)),
    StructField("image", ArrayType(StringType)),
    StructField("flags", ArrayType(StringType)),
    StructField("video", StructType(Seq(
      StructField("info", StructType(Seq(
        StructField("duration", DoubleType),
        StructField("lang", StringType),
        StructField("sourceMap", ArrayType(StructType(Seq(
          StructField("type", StringType),
          StructField("url", StringType),
          StructField("format", StringType)))))))))))))
}
