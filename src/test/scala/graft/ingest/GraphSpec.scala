package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.Row

class GraphSpec extends SparkSpec {
  import Fixtures._

  private def cj(id: String, signer: String, json: String): String =
    s"""{"id":${js(id)},"required_posting_auths":[${js(signer)}],""" +
      s""""json":${js(json)}}"""

  test("follow → edge; empty-what unfollow removes it; signer enforced") {
    val ops = toOps(spark,
      block(100, "2024-05-01T12:00:00",
        ("t1", Seq(("custom_json", cj("follow", "alice",
          """["follow",{"follower":"alice","following":"bob","what":["blog"]}]""")))),
        ("t2", Seq(("custom_json", cj("follow", "alice",
          """["follow",{"follower":"alice","following":"carol","what":["blog"]}]""")))),
        ("t3", Seq(("custom_json", cj("mallory", "mallory",
          """["follow",{"follower":"alice","following":"eve","what":["blog"]}]"""))))),
      block(101, "2024-05-01T12:00:03",
        ("t4", Seq(("custom_json", cj("follow", "alice",
          """["follow",{"follower":"alice","following":"bob","what":[]}]"""))))))
    val f = GraphIngest.follows(ops).collect()
    val edges = f.map(r => (r.getAs[String]("follower"),
      r.getAs[String]("following"))).toSet
    assert(edges == Set(("alice", "carol"))) // bob unfollowed; eve spoofed
    assert(f.head.getAs[String]("_id") == "hive-alice-carol")
  }

  test("spk.unfollow is a no-op unless its what matches the stored edge") {
    // the delete filter includes what (hive-stream.ts:345-359)
    val ops = toOps(spark,
      block(100, "2024-05-01T12:00:00",
        ("t1", Seq(("custom_json", cj("spk.follow", "alice",
          """{"did":"did:key:zA","what":["posts"]}""")))),
        ("t2", Seq(("custom_json", cj("spk.follow", "bob",
          """{"did":"did:key:zB","what":["posts"]}"""))))),
      block(101, "2024-05-01T12:00:03",
        // mismatched what: edge must survive
        ("t3", Seq(("custom_json", cj("spk.unfollow", "alice",
          """{"did":"did:key:zA","what":["other"]}""")))),
        // matching what: edge removed
        ("t4", Seq(("custom_json", cj("spk.unfollow", "bob",
          """{"did":"did:key:zB","what":["posts"]}"""))))))
    val edges = GraphIngest.follows(ops).collect()
      .map(r => (r.getAs[String]("follower"),
        r.getAs[String]("following"))).toSet
    assert(edges == Set(("alice", "did:key:zA")))
  }

  test("spk.unfollow matches a stored NULL what (null-to-missing, " +
    "not a stale older value)") {
    val ops = toOps(spark,
      block(100, "2024-05-01T12:00:00",
        // follow WITH what, then a later follow WITHOUT the field:
        // the stored edge's what is now null
        ("t1", Seq(("custom_json", cj("spk.follow", "alice",
          """{"did":"did:key:zA","what":["posts"]}""")))),
        ("t2", Seq(("custom_json", cj("spk.follow", "alice",
          """{"did":"did:key:zA"}"""))))),
      block(101, "2024-05-01T12:00:03",
        // unfollow without what: must match the stored null and
        // delete — comparing against the STALE ["posts"] would
        // wrongly keep the edge
        ("t3", Seq(("custom_json", cj("spk.unfollow", "alice",
          """{"did":"did:key:zA"}"""))))))
    assert(GraphIngest.follows(ops).collect().isEmpty)
  }

  test("spk.follow DID edges + community subscribe edges") {
    val ops = toOps(spark,
      block(100, "2024-05-01T12:00:00",
        ("t1", Seq(("custom_json", cj("spk.follow", "alice",
          """{"did":"did:key:z6Mk","what":["posts"]}""")))),
        ("t2", Seq(("custom_json", cj("community", "bob",
          """["subscribe",{"community":"hive-125"}]"""))))))
    val edges = GraphIngest.follows(ops).collect()
      .map(r => (r.getAs[String]("follower"),
        r.getAs[String]("following"))).toSet
    assert(edges == Set(("alice", "did:key:z6Mk"), ("bob", "hive-125")))
  }

  test("account_update2 → profile for users, community for hive-*; latest wins") {
    val p1 = """{"account":"alice","posting_json_metadata":""" +
      js("""{"profile":{"name":"Alice V1","about":"old"}}""") + "}"
    val p2 = """{"account":"alice","posting_json_metadata":""" +
      js("""{"profile":{"name":"Alice V2","about":"new",""" +
        """"profile_image":"https://img/a.png"},"did":"did:key:abc"}""") + "}"
    val c1 = """{"account":"hive-199","posting_json_metadata":""" +
      js("""{"profile":{"profile_image":"https://img/c.png"}}""") + "}"
    val props = cj("community", "hive-199",
      """["updateProps",{"title":"My Community","about":"a community"}]""")
    val ops = toOps(spark,
      block(100, "2024-05-01T12:00:00",
        ("t1", Seq(("account_update2", p1))),
        ("t2", Seq(("account_update2", c1))),
        ("t4", Seq(("custom_json", props)))),
      block(101, "2024-05-01T12:00:03",
        ("t3", Seq(("account_update2", p2)))))
    val prof = GraphIngest.profiles(ops).collect()
    assert(prof.length == 1)
    assert(prof.head.getAs[String]("_id") == "hive/alice")
    assert(prof.head.getAs[String]("displayName") == "Alice V2")
    assert(prof.head.getAs[String]("did") == "did:key:abc")
    assert(prof.head.getAs[Row]("images").getAs[String]("avatar")
      == "https://img/a.png")
    val comm = GraphIngest.communities(ops).collect()
    assert(comm.length == 1)
    assert(comm.head.getAs[String]("username") == "hive-199")
    // account_update2 sets only images (hive-stream.ts:456-472);
    // title/about come from the updateProps custom_json
    assert(comm.head.getAs[Row]("images").getAs[String]("avatar")
      == "https://img/c.png")
    assert(comm.head.getAs[String]("title") == "My Community")
    assert(comm.head.getAs[String]("about") == "a community")
    assert(comm.head.getAs[Boolean]("needs_update"))
  }

  test("account_update → delegated authority accumulates; no revoke") {
    val a1 = """{"account":"alice","posting":{"account_auths":""" +
      """[["threespeak",1],["other",1]]}}"""
    // later op without threespeak: the reference's revocation loop is
    // dead code (account_auth typo, hive-stream.ts:407), so the
    // granted edge survives with its original metadata
    val a2 = """{"account":"alice","posting":{"account_auths":""" +
      """[["threespeak.beta",1]]}}"""
    val ops = toOps(spark,
      block(100, "2024-05-01T12:00:00",
        ("t1", Seq(("account_update", a1)))),
      block(101, "2024-05-01T12:00:03",
        ("t2", Seq(("account_update", a2)))))
    val auth = GraphIngest.delegatedAuthority(ops).collect()
    assert(auth.map(_.getAs[String]("to")).toSet
      == Set("threespeak", "threespeak.beta"))
    assert(auth.forall(_.getAs[String]("from") == "alice"))
    assert(auth.forall(_.getAs[String]("type") == "posting"))
  }

  test("spk.bridge_id → stream-id requests (needs_stream_id source)") {
    val ops = toOps(spark,
      block(100, "2024-05-01T12:00:00",
        ("t1", Seq(("custom_json", cj("spk.bridge_id", "alice",
          """{"author":"alice","permlink":"p1","stream_id":"kjz123"}"""))))))
    val req = GraphIngest.streamIdRequests(ops).collect()
    assert(req.length == 1)
    assert(req.head.getAs[String]("stream_id") == "kjz123")
  }
}
