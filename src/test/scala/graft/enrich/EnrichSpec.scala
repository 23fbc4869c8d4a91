package graft.enrich

import graft.SparkSpec
import graft.ingest.{Fixtures, PostsIngest}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

class EnrichSpec extends SparkSpec {
  import Fixtures._

  private def mkPosts(): DataFrame = {
    val ops = toOps(spark,
      block(100, "2024-05-01T12:00:00",
        ("t1", Seq(("comment", comment("alice", "v1", "a video @bob",
          jsonMeta = videoMeta)))),
        ("t2", Seq(("comment", comment("carol", "x1", "plain @alice @bob"))))),
      block(101, "2024-05-01T12:00:03",
        ("t3", Seq(("comment", comment("bob", "r1", "nice!",
          parentAuthor = "alice", parentPermlink = "v1")))),
        ("t4", Seq(("comment", comment("dave", "r2", "agreed @Alice",
          parentAuthor = "alice", parentPermlink = "v1"))))))
    PostsIngest.ingest(ops)(spark)
  }

  test("postStats: payout branches (A4), vote tallies (A3), comment counts (A2)") {
    import spark.implicits._
    val posts = mkPosts()
    val rpc = Seq(
      // paid-out post: total + curator
      ("alice", "v1", "2024-05-10T00:00:00", "0.000 HBD", "1.500 HBD",
        "0.500 HBD", 3,
        Seq(("bob", 100.0, 10000, 1.0), ("carol", -5.0, -10000, 1.0),
          ("dave", 7.0, 10000, 1.0))),
      // pending post
      ("carol", "x1", "1970-01-01T00:00:00", "2.250 HBD", "0.000 HBD",
        "0.000 HBD", 1, Seq(("bob", 10.0, 10000, 1.0))))
      .toDF("author", "permlink", "last_payout", "pending_payout_value",
        "total_payout_value", "curator_payout_value", "net_votes",
        "votes")
      .withColumn("active_votes",
        transform(col("votes"), v => struct(
          v.getField("_1").as("voter"), v.getField("_2").as("rshares"),
          v.getField("_3").as("percent"), v.getField("_4").as("weight"))))
      .withColumn("max_accepted_payout", lit("1000000.000 HBD"))
      .withColumn("max_cashout_time", lit("2024-05-08T00:00:00"))
      .withColumn("cashout_time", lit("2024-05-08T00:00:00"))
      .drop("votes")
    val out = Enrich.postStats(posts, rpc).collect()
      .map(r => r.getAs[String]("permlink") -> r).toMap
    val a = out("v1").getAs[Row]("stats")
    assert(a.getAs[Int]("num_comments") == 2)          // A2: r1 + r2
    assert(a.getAs[Int]("num_votes") == 3)
    assert(a.getAs[Int]("num_up_votes") == 2)
    assert(a.getAs[Int]("num_down_votes") == 1)
    assert(math.abs(a.getAs[Double]("total_hive_reward") - 2.0) < 1e-9)
    assert(!out("v1").getAs[Boolean]("needs_stat_update"))
    val c = out("x1").getAs[Row]("stats")
    assert(math.abs(c.getAs[Double]("total_hive_reward") - 2.25) < 1e-9)
    // replies with no rpc row keep their null stats
    assert(out("r1").getAs[Row]("stats") == null)
  }

  test("postStats: 'was deleted' RPC marks status deleted, stats untouched") {
    import spark.implicits._
    val posts = mkPosts()
    val rpc = Seq(("alice", "v1", true))
      .toDF("author", "permlink", "deleted")
      .withColumn("last_payout", lit(null).cast("string"))
      .withColumn("pending_payout_value", lit(null).cast("string"))
      .withColumn("total_payout_value", lit(null).cast("string"))
      .withColumn("curator_payout_value", lit(null).cast("string"))
      .withColumn("net_votes", lit(null).cast("int"))
      .withColumn("active_votes", lit(null).cast(
        "array<struct<voter:string,rshares:double,percent:int,weight:double>>"))
      .withColumn("max_accepted_payout", lit(null).cast("string"))
      .withColumn("max_cashout_time", lit(null).cast("string"))
      .withColumn("cashout_time", lit(null).cast("string"))
    val out = Enrich.postStats(posts, rpc).collect()
      .map(r => r.getAs[String]("permlink") -> r).toMap
    assert(out("v1").getAs[String]("status") == "deleted")
    assert(!out("v1").getAs[Boolean]("needs_stat_update"))
    assert(out("v1").getAs[Row]("stats") == null)   // core.ts:141-153
    assert(out("x1").getAs[String]("status") == "published")
  }

  test("postStats: duplicated RPC snapshot row does not multiply posts") {
    import spark.implicits._
    val posts = mkPosts()
    val rpc = Seq(
      ("alice", "v1", "2024-05-10T00:00:00", "0.000 HBD", "1.500 HBD",
        "0.500 HBD", 3),
      // the same key again — a replayed/duplicated snapshot
      ("alice", "v1", "2024-05-10T00:00:00", "0.000 HBD", "1.500 HBD",
        "0.500 HBD", 3))
      .toDF("author", "permlink", "last_payout", "pending_payout_value",
        "total_payout_value", "curator_payout_value", "net_votes")
      .withColumn("active_votes", lit(null).cast(
        "array<struct<voter:string,rshares:double,percent:int,weight:double>>"))
      .withColumn("max_accepted_payout", lit(null).cast("string"))
      .withColumn("max_cashout_time", lit(null).cast("string"))
      .withColumn("cashout_time", lit(null).cast("string"))
    val out = Enrich.postStats(posts, rpc)
    assert(out.count() == posts.count())
    assert(out.filter(col("permlink") === "v1").count() == 1)
  }

  test("videoMeta: RESOLUTION regex (X9) + is_short (X10)") {
    import spark.implicits._
    val posts = mkPosts()
    val playlists = Seq(
      ("alice", "v1",
        "#EXTM3U\n#EXT-X-STREAM-INF:RESOLUTION=1080x1920,BANDWIDTH=1\nv.m3u8"))
      .toDF("author", "permlink", "body")
    val out = Enrich.videoMeta(posts, playlists).collect()
      .map(r => r.getAs[String]("permlink") -> r).toMap
    val sv = out("v1").getAs[Row]("app_metadata").getAs[Row]("spkvideo")
    assert(sv.getAs[Int]("width") == 1080)
    assert(sv.getAs[Int]("height") == 1920)
    assert(sv.getAs[Boolean]("is_short"))   // 120.5s ≤ 180 and portrait
    // 3speak post with no playlist row: spkvideo exists (app-keyed)
    // but dimensions stay unset
    val sv2 = out("x1").getAs[Row]("app_metadata").getAs[Row]("spkvideo")
    assert(sv2 != null && sv2.getAs[AnyRef]("height") == null)
  }

  test("channelScores: 3×comments + 0.1×votes; others zeroed (A6/S11)") {
    import spark.implicits._
    val posts = mkPosts()
    // give alice's video stats num_votes = 10
    val posts2 = posts.withColumn("stats",
      when(col("permlink") === "v1",
        struct(lit(2).as("num_comments"), lit(10).as("num_votes"),
          lit(0).as("num_up_votes"), lit(0).as("num_down_votes"),
          lit(0.0).as("total_hive_reward"),
          lit(null).cast(
            "array<struct<voter:string,rshares:double,percent:int," +
              "weight:double>>").as("active_voters")))
        .otherwise(col("stats")))
    val profiles = Seq(("hive/alice", "alice", 5.0),
      ("hive/zed", "zed", 7.0))
      .toDF("_id", "username", "score_old")
      .withColumn("score", col("score_old")).drop("score_old")
    val out = Enrich.channelScores(posts2, profiles).collect()
      .map(r => r.getAs[String]("username") ->
        r.getAs[Double]("score")).toMap
    assert(math.abs(out("alice") - (2 * 3 + 10 * 0.1)) < 1e-9)
    assert(out("zed") == 0.0)               // S11 zero-out
  }

  test("channelScores: stats-less video RESETS the vote accumulator (core.ts:355)") {
    import spark.implicits._
    // (totalVotes + undefined) || 0 — each stats-less video zeroes the
    // running vote sum; only videos AFTER the author's last stats-less
    // one (in insertion order) count
    def post(author: String, permlink: String, ts: String,
             votes: java.lang.Integer) =
      (author, permlink, java.sql.Timestamp.valueOf(ts), votes)
    val posts = Seq(
      // alice: stats-less video arrives AFTER the voted one → reset to 0
      post("alice", "a1", "2024-05-01 00:00:00", 10),
      post("alice", "a2", "2024-05-02 00:00:00", null),
      // bob: stats-less video FIRST, voted one after → 7 survives
      post("bob", "b1", "2024-05-01 00:00:00", null),
      post("bob", "b2", "2024-05-02 00:00:00", 7))
      .toDF("author", "permlink", "created_at", "nv")
      .withColumn("parent_author", lit(""))
      .withColumn("parent_permlink", lit(""))
      .withColumn("app_metadata",
        struct(lit("3speak").as("app")))
      .withColumn("stats",
        when(col("nv").isNotNull, struct(col("nv").as("num_votes"))))
      .drop("nv")
    val profiles = Seq(("hive/alice", "alice", 0.0),
      ("hive/bob", "bob", 0.0)).toDF("_id", "username", "score")
    val out = Enrich.channelScores(posts, profiles).collect()
      .map(r => r.getAs[String]("username") ->
        r.getAs[Double]("score")).toMap
    assert(out("alice") == 0.0)                 // 10 votes wiped by a2
    assert(math.abs(out("bob") - 0.7) < 1e-9)   // 7 × 0.1 survives
  }

  test("mentionNotifications: @mentions, DID typing, lowercase (X7)") {
    val posts = mkPosts()
    val notifs = Enrich.mentionNotifications(
      posts.withColumn("body",
        when(col("permlink") === "x1",
          lit("hey @Bob and @did:key:z6MkTest but not email@host"))
          .otherwise(col("body"))))
      .collect()
    val targets = notifs.map(r => (r.getAs[String]("target"),
      r.getAs[String]("from"), r.getAs[String]("type"))).toSet
    assert(targets.contains(("bob", "carol", "hive")))       // lowercased
    assert(targets.contains(("did:key:z6MkTest", "carol", "did")))
    assert(targets.contains(("bob", "alice", "hive")))
    // email-style @ is not a mention (twitter-text boundary rule)
    assert(!targets.exists(_._1 == "host"))
    // retweet prefix allows a mention despite the adjacent 't'
    val rt = Enrich.mentionNotifications(
      posts.withColumn("body", lit("rt@dave says hi")))
      .collect().map(_.getAs[String]("target")).toSet
    assert(rt == Set("dave"))
    // ref format hive/<author>/<permlink> (notifications.ts:52)
    assert(notifs.head.getAs[String]("ref").startsWith("hive/"))
  }

  test("newNotifications: overlapping batch replay inserts no duplicates") {
    val posts = mkPosts()   // metadata_status = 'unprocessed' for all
    val empty = Enrich.mentionNotifications(posts).limit(0)
    // batch 1: all posts → everything is new
    val n1 = Enrich.newNotifications(posts, empty)
    val stored1 = n1
    assert(n1.count() > 0)
    // batch 2 REPLAYS the same posts (plus nothing new) against the
    // now-populated store → zero new rows (process-meta.ts:25-28)
    val n2 = Enrich.newNotifications(posts, stored1)
    assert(n2.count() == 0)
    // a genuinely new mention still lands
    val posts3 = posts.withColumn("body",
      when(col("permlink") === "x1", lit("hello @newperson"))
        .otherwise(col("body")))
    val n3 = Enrich.newNotifications(posts3, stored1)
      .collect().map(_.getAs[String]("target")).toSet
    assert(n3 == Set("newperson"))
  }

  test("communityRefresh: needs_update rows refreshed from rpc, flag cleared (S4)") {
    import spark.implicits._
    val communities = Seq(
      ("hive/hive-1", "hive-1", "old title", true),
      ("hive/hive-2", "hive-2", "keep", false))
      .toDF("_id", "username", "title", "needs_update")
      .withColumn("about", lit(null).cast("string"))
      .withColumn("description", lit(null).cast("string"))
      .withColumn("flag_text", lit(null).cast("string"))
      .withColumn("lang", lit(null).cast("string"))
      .withColumn("is_nsfw", lit(null).cast("boolean"))
      .withColumn("subscribers", lit(null).cast("int"))
      .withColumn("created_at", current_timestamp())
      .withColumn("roles", lit(null).cast("array<array<string>>"))
      .withColumn("images", struct(lit(null).cast("string").as("avatar"),
        lit(null).cast("string").as("cover")))
      .withColumn("topics", array().cast("array<string>"))
    val rpc = Seq(("hive-1", "Fresh Title", "about!", "desc", "", "en",
      false, 42)).toDF("name", "title", "about", "description",
        "flag_text", "lang", "is_nsfw", "subscribers")
      .withColumn("team", array(array(lit("alice"), lit("admin"),
        lit(""))))
      .withColumn("created_at", lit("2020-01-02 03:04:05"))
    val out = Enrich.communityRefresh(communities, rpc).collect()
      .map(r => r.getAs[String]("username") -> r).toMap
    assert(out("hive-1").getAs[String]("title") == "Fresh Title")
    assert(out("hive-1").getAs[Int]("subscribers") == 42)
    // created_at is reset from the RPC payload (core.ts:272)
    assert(out("hive-1").getAs[java.sql.Timestamp]("created_at")
      .toString.startsWith("2020-01-02"))
    assert(!out("hive-1").getAs[Boolean]("needs_update"))
    assert(out("hive-2").getAs[String]("title") == "keep")
    assert(!out("hive-2").getAs[Boolean]("needs_update"))
  }

  test("profilesFromAccountsRpc: parses profiles, skips malformed/profile-less (S5)") {
    import spark.implicits._
    val rpc = Seq(
      ("alice", """{"profile":{"name":"Alice","profile_image":"a.png"}}"""),
      ("bob", """not json at all"""),
      ("carol", """{"something":"else"}"""))
      .toDF("name", "posting_json_metadata")
    val out = Enrich.profilesFromAccountsRpc(rpc).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("username") == "alice")
    assert(out.head.getAs[String]("displayName") == "Alice")
  }

  test("profilesFromAccountsRpc: empty posting meta falls back to json_metadata") {
    import spark.implicits._
    // posting_json_metadata || json_metadata (core.ts:407)
    val rpc = Seq(
      ("alice", "", """{"profile":{"name":"A"},"did":"did:key:z6MkA"}"""),
      ("bob", null, """{"profile":{"name":"B"}}"""),
      // posting wins when non-empty
      ("carol", """{"profile":{"name":"Cp"}}""",
        """{"profile":{"name":"Cj"}}"""),
      // neither has a profile → skipped
      ("dave", "", """{"x":1}"""))
      .toDF("name", "posting_json_metadata", "json_metadata")
    val out = Enrich.profilesFromAccountsRpc(rpc).collect()
      .map(r => r.getAs[String]("username") ->
        (r.getAs[String]("displayName"), r.getAs[String]("did"))).toMap
    assert(out.keySet == Set("alice", "bob", "carol"))
    assert(out("alice") == ("A", "did:key:z6MkA"))
    assert(out("bob")._1 == "B")
    assert(out("carol")._1 == "Cp")
  }

  test("applyStreamIds: off_chain_id set, needs_stream_id cleared") {
    import spark.implicits._
    val posts = mkPosts()
    // duplicate (replayed) grant must NOT multiply the posts row
    val grants = Seq(("alice", "v1", "kjz99"), ("alice", "v1", "kjz99"))
      .toDF("author", "permlink", "stream_id")
    assert(Enrich.applyStreamIds(posts, grants).count() == posts.count())
    val out = Enrich.applyStreamIds(posts, grants).collect()
      .map(r => r.getAs[String]("permlink") -> r).toMap
    assert(out("v1").getAs[String]("off_chain_id") == "kjz99")
    assert(!out("v1").getAs[Boolean]("needs_stream_id"))
    assert(out("x1").getAs[String]("off_chain_id") == null)
  }

  test("missingProfiles: authors without profile rows (J7)") {
    import spark.implicits._
    val posts = mkPosts()
    val profiles = Seq(("hive/alice", "alice")).toDF("_id", "username")
    val missing = Enrich.missingProfiles(posts, profiles)
      .collect().map(_.getAs[String]("author")).toSet
    assert(missing == Set("bob", "carol", "dave"))
  }
}
