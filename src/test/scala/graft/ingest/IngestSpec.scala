package graft.ingest

import graft.SparkSpec
import graft.functions.Dmp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Golden fixture blocks per FIXTURES.md §B.1 — one per op variant. */
object Fixtures {

  /** JSON-escape a string for embedding. */
  def js(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\t' => "\\t"
      case '\r' => "\\r"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  def blockId(height: Long): String = f"$height%08x" + "ab" * 12

  def block(height: Long, time: String,
            txs: (String, Seq[(String, String)])*): String = {
    val txJson = txs.map { case (txid, ops) =>
      val opsJson = ops.map { case (name, payload) =>
        s"""{"name":${js(name)},"payload":${js(payload)}}"""
      }.mkString("[", ",", "]")
      s"""{"transaction_id":${js(txid)},"operations":$opsJson}"""
    }.mkString("[", ",", "]")
    s"""{"block_id":${js(blockId(height))},"timestamp":${js(time)},""" +
      s""""transactions":$txJson}"""
  }

  def comment(author: String, permlink: String, body: String,
              parentAuthor: String = "", parentPermlink: String = "hive-100",
              title: String = "t", jsonMeta: String =
              """{"app":"3speak/0.3","tags":["video","fun"]}"""): String =
    s"""{"parent_author":${js(parentAuthor)},""" +
      s""""parent_permlink":${js(parentPermlink)},""" +
      s""""author":${js(author)},"permlink":${js(permlink)},""" +
      s""""title":${js(title)},"body":${js(body)},""" +
      s""""json_metadata":${js(jsonMeta)}}"""

  val videoMeta: String =
    """{"app":"3speak/0.3","tags":["video"],""" +
      """"image":["https://img/1.png","https://img/2.png"],""" +
      """"video":{"info":{"duration":120.5,"lang":"en","sourceMap":[""" +
      """{"type":"video","url":"ipfs://QmVid123/manifest.m3u8","format":"m3u8"},""" +
      """{"type":"thumbnail","url":"ipfs://QmThumb9","format":"png"}]}}}"""

  def toOps(spark: org.apache.spark.sql.SparkSession,
            blocks: String*): DataFrame = {
    import spark.implicits._
    OpExtract.ops(spark.read.schema(graft.domain.Schemas.block)
      .json(blocks.toSeq.toDS()))
  }
}

class IngestSpec extends SparkSpec {
  import Fixtures._

  test("OpExtract decodes height from hex block id (X13) and explodes ops") {
    val ops = toOps(spark,
      block(32530000L, "2024-05-01T12:00:00",
        ("tx1", Seq(("comment", comment("alice", "p1", "hello")),
          ("vote", """{"voter":"bob","author":"alice","permlink":"p1"}""")))))
    val rows = ops.orderBy("op_index").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("block_height") == 32530000L)
    assert(rows(0).getAs[String]("op_name") == "comment")
    assert(rows(1).getAs[Int]("op_index") == 1)
    assert(rows(0).getAs[java.sql.Timestamp]("ts").toString
      .startsWith("2024-05-01 12:00:00"))
  }

  test("comment insert produces a published HIVE post with metadata") {
    val ops = toOps(spark,
      block(100, "2024-05-01T12:00:00",
        ("tx1", Seq(("comment",
          comment("alice", "video1", "my body", jsonMeta = videoMeta))))))
    val posts = PostsIngest.ingest(ops)(spark)
    val r = posts.collect()
    assert(r.length == 1)
    val p = r.head
    assert(p.getAs[String]("status") == "published")
    assert(p.getAs[String]("body") == "my body")
    assert(p.getAs[String]("TYPE") == "HIVE")
    assert(p.getAs[String]("__t") == "post_hive")
    val app = p.getAs[org.apache.spark.sql.Row]("app_metadata")
    assert(app.getAs[String]("app") == "3speak")                 // X2
    assert(app.getAs[scala.collection.Seq[String]]("types") == Seq("spkvideo"))
    val sv = app.getAs[org.apache.spark.sql.Row]("spkvideo")
    assert(sv.getAs[String]("storage_type") == "ipfs")
    assert(sv.getAs[Boolean]("first_upload"))                     // J8
    val links = p.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("ipfs_links")
    assert(links.map(_.getAs[String]("cid")) ==
      Seq("QmVid123", "QmThumb9"))                                // X5
    val oc = p.getAs[org.apache.spark.sql.Row]("origin_control")
    // top-level: parent lookup misses => false (hive-stream.ts:515-524)
    assert(!oc.getAs[Boolean]("allowed_by_parent"))
    assert(oc.getAs[Boolean]("allowed_by_type"))                  // X3
  }

  test("reply gets comment flag; parent gate works both ways (J2)") {
    val ops = toOps(spark,
      block(100, "2024-05-01T12:00:00",
        ("tx1", Seq(("comment", comment("alice", "post1", "parent"))))),
      block(101, "2024-05-01T12:00:03",
        ("tx2", Seq(("comment", comment("bob", "re1", "reply!",
          parentAuthor = "alice", parentPermlink = "post1")))),
        ("tx3", Seq(("comment", comment("eve", "re2", "orphan",
          parentAuthor = "nobody", parentPermlink = "nope")))),
        ("tx4", Seq(("comment", comment("mal", "m1", "spam",
          jsonMeta = """{"app":"other/1.0"}""")))),
        ("tx5", Seq(("comment", comment("ok", "k1", "chain reply",
          parentAuthor = "alice", parentPermlink = "post1",
          jsonMeta = """{"app":"other/1.0"}"""))))))
    val posts = PostsIngest.ingest(ops)(spark)
    val byKey = posts.collect().map(r =>
      r.getAs[String]("permlink") -> r).toMap
    assert(byKey("re1").getAs[scala.collection.Seq[String]]("flags") == Seq("comment"))
    assert(byKey("re1").getAs[org.apache.spark.sql.Row]("origin_control")
      .getAs[Boolean]("allowed_by_parent"))
    assert(!byKey("re2").getAs[org.apache.spark.sql.Row]("origin_control")
      .getAs[Boolean]("allowed_by_parent"))
    assert(byKey("post1").getAs[scala.collection.Seq[String]]("flags") == Seq())
    // disallowed-app orphan is DROPPED (hive-stream.ts:526-528);
    // disallowed-app REPLY to an indexed post is kept via its parent
    assert(!byKey.contains("m1"))
    assert(byKey.contains("k1"))
    assert(byKey("k1").getAs[org.apache.spark.sql.Row]("origin_control")
      .getAs[Boolean]("allowed_by_parent"))
  }

  test("5-deep reply chain in ONE batch resolves to fixpoint (J2 gate)") {
    // the reference indexes any depth because blocks are sequential;
    // a fixed iteration count would drop the tail of a chain that
    // arrives entirely within one batch
    val other = """{"app":"other/1.0"}"""
    val ops = toOps(spark,
      block(100, "2024-05-01T12:00:00",
        ("t0", Seq(("comment", comment("a0", "p0", "root")))),
        ("t1", Seq(("comment", comment("a1", "p1", "d1",
          parentAuthor = "a0", parentPermlink = "p0", jsonMeta = other)))),
        ("t2", Seq(("comment", comment("a2", "p2", "d2",
          parentAuthor = "a1", parentPermlink = "p1", jsonMeta = other)))),
        ("t3", Seq(("comment", comment("a3", "p3", "d3",
          parentAuthor = "a2", parentPermlink = "p2", jsonMeta = other)))),
        ("t4", Seq(("comment", comment("a4", "p4", "d4",
          parentAuthor = "a3", parentPermlink = "p3", jsonMeta = other)))),
        ("t5", Seq(("comment", comment("a5", "p5", "d5",
          parentAuthor = "a4", parentPermlink = "p4", jsonMeta = other)))),
        // detached disallowed event must still be dropped
        ("t6", Seq(("comment", comment("a6", "p6", "orphan",
          parentAuthor = "zz", parentPermlink = "zz", jsonMeta = other))))))
    val got = PostsIngest.ingest(ops)(spark)
      .collect().map(_.getAs[String]("permlink")).toSet
    assert(got == Set("p0", "p1", "p2", "p3", "p4", "p5"))
  }

  test("edit via dmp patch applies; non-patch replaces (X6)") {
    val v1 = "The quick brown fox jumps over the lazy dog"
    val v2 = "The quick red fox jumps over the lazy dog"
    val patch = Dmp.patchToText(Dmp.patchMake(v1, v2))
    val ops = toOps(spark,
      block(100, "2024-05-01T12:00:00",
        ("tx1", Seq(("comment", comment("alice", "p1", v1))))),
      block(101, "2024-05-01T12:00:03",
        ("tx2", Seq(("comment", comment("alice", "p1", patch))))),
      block(102, "2024-05-01T12:00:06",
        ("tx3", Seq(("comment", comment("bob", "p2", "first"))))),
      block(103, "2024-05-01T12:00:09",
        ("tx4", Seq(("comment", comment("bob", "p2", "full new body"))))))
    val posts = PostsIngest.ingest(ops)(spark)
    val byKey = posts.collect().map(r =>
      r.getAs[String]("permlink") -> r).toMap
    assert(byKey("p1").getAs[String]("body") == v2)
    assert(byKey("p2").getAs[String]("body") == "full new body")
    assert(byKey("p1").getAs[org.apache.spark.sql.Row]("state_control")
      .getAs[Long]("block_height") == 101)
  }

  test("deleted flag in edit marks status deleted (X17)") {
    val ops = toOps(spark,
      block(100, "2024-05-01T12:00:00",
        ("tx1", Seq(("comment", comment("alice", "p1", "hello"))))),
      block(101, "2024-05-01T12:00:03",
        ("tx2", Seq(("comment", comment("alice", "p1", "",
          jsonMeta = """{"app":"3speak/0.3","flags":["deleted"]}"""))))))
    val posts = PostsIngest.ingest(ops)(spark)
    assert(posts.collect().head.getAs[String]("status") == "deleted")
    // body unchanged: empty patch text applies as identity
    assert(posts.collect().head.getAs[String]("body") == "hello")
  }

  test("edit failing the app gate is dropped; insert-time app_metadata sticks") {
    // The reference gates EVERY comment op on its own metadata before
    // the exists-check (hive-stream.ts:515-528), so an edit to a
    // top-level post whose new metadata loses the allowed app is
    // skipped entirely; and the edit $set never recomputes
    // app_metadata/ipfs_links (hive-stream.ts:563-577).
    val ops = toOps(spark,
      block(100, "2024-05-01T12:00:00",
        ("tx1", Seq(("comment",
          comment("alice", "p1", "v1 body", jsonMeta = videoMeta))))),
      block(101, "2024-05-01T12:00:03",
        // gate-failing edit: app not in ALLOWED_APPS → dropped
        ("tx2", Seq(("comment", comment("alice", "p1", "hacked",
          jsonMeta = """{"app":"other/1.0"}"""))))),
      block(102, "2024-05-01T12:00:06",
        // gate-passing edit: new tags stick, app_metadata does not
        ("tx3", Seq(("comment", comment("alice", "p1", "new body",
          jsonMeta = """{"app":"3speak/0.9","tags":["edited"]}"""))))))
    val p = PostsIngest.ingest(ops)(spark).collect().head
    assert(p.getAs[String]("body") == "new body")     // block 101 skipped
    assert(p.getAs[org.apache.spark.sql.Row]("state_control")
      .getAs[Long]("block_height") == 102)
    // stored tags follow the last write...
    assert(p.getAs[scala.collection.Seq[String]]("tags") == Seq("edited"))
    // ...but storage_type/ipfs_links keep the insert-time sourceMap
    assert(p.getAs[org.apache.spark.sql.Row]("app_metadata")
      .getAs[org.apache.spark.sql.Row]("spkvideo")
      .getAs[String]("storage_type") == "ipfs")
    assert(p.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("ipfs_links")
      .map(_.getAs[String]("cid")) == Seq("QmVid123", "QmThumb9"))
  }

  test("same permlink under a different parent is a new post, not an edit") {
    // exists-check keys on all four fields (hive-stream.ts:530-535)
    val ops = toOps(spark,
      block(100, "2024-05-01T12:00:00",
        ("tx1", Seq(("comment", comment("alice", "top", "root"))))),
      block(101, "2024-05-01T12:00:03",
        ("tx2", Seq(("comment", comment("bob", "re", "reply A",
          parentAuthor = "alice", parentPermlink = "top"))))),
      block(102, "2024-05-01T12:00:06",
        ("tx3", Seq(("comment", comment("bob", "re", "reply B",
          jsonMeta = """{"app":"3speak/0.3"}"""))))))
    val rows = PostsIngest.ingest(ops)(spark)
      .filter(col("permlink") === "re").collect()
    assert(rows.length == 2)      // two documents, no dmp chaining
    assert(rows.map(_.getAs[String]("body")).toSet
      == Set("reply A", "reply B"))
  }

  test("out-of-order heights: stale op never wins (state_control guard)") {
    // N+1 written "before" N in the input — final state must be N+1's.
    val ops = toOps(spark,
      block(101, "2024-05-01T12:00:03",
        ("tx2", Seq(("comment", comment("alice", "p1", "newer body"))))),
      block(100, "2024-05-01T12:00:00",
        ("tx1", Seq(("comment", comment("alice", "p1", "older body"))))))
    val posts = PostsIngest.ingest(ops)(spark)
    val p = posts.collect().head
    assert(p.getAs[String]("body") == "newer body")
    assert(p.getAs[org.apache.spark.sql.Row]("state_control")
      .getAs[Long]("block_height") == 101)
  }

  test("comment_options beneficiaries + 3speak-publish authority (J10)") {
    val benefPayload =
      """{"author":"alice","permlink":"p1","extensions":[[""" +
        """"comment_payout_beneficiaries",{"beneficiaries":[""" +
        """{"account":"spk.beneficiary","weight":900}]}]]}"""
    val publishPayload =
      """{"id":"3speak-publish","required_posting_auths":["threespeak"],""" +
        """"json":"{}"}"""
    val ops = toOps(spark,
      block(100, "2024-05-01T12:00:00",
        ("tx1", Seq(
          ("comment", comment("alice", "p1", "b", jsonMeta = videoMeta)),
          ("comment_options", benefPayload),
          ("custom_json", publishPayload)))))
    val p = PostsIngest.ingest(ops)(spark).collect().head
    val benefs = p.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("beneficiaries")
    assert(benefs.map(b => (b.getAs[String]("account"),
      b.getAs[Int]("weight"))) == scala.collection.Seq(("spk.beneficiary", 900)))
    assert(p.getAs[org.apache.spark.sql.Row]("app_metadata")
      .getAs[org.apache.spark.sql.Row]("spkvideo")
      .getAs[Boolean]("authority_signed"))
  }

  test("two comment_options in one tx: the FIRST op's beneficiaries " +
    "win (op order, not payload lexicographic order)") {
    def benef(acct: String) =
      s"""{"author":"alice","permlink":"p1","extensions":[[""" +
        s""""comment_payout_beneficiaries",{"beneficiaries":[""" +
        s"""{"account":"$acct","weight":100}]}]]}"""
    // 'zeta' sorts AFTER 'alpha' — a max() over the JSON strings
    // would wrongly pick the second op's payload
    val ops = toOps(spark,
      block(100, "2024-05-01T12:00:00",
        ("tx1", Seq(
          ("comment", comment("alice", "p1", "b")),
          ("comment_options", benef("alpha")),
          ("comment_options", benef("zeta"))))))
    val p = PostsIngest.ingest(ops)(spark).collect().head
    val benefs = p.getAs[scala.collection.Seq[org.apache.spark.sql.Row]](
      "beneficiaries")
    assert(benefs.map(_.getAs[String]("account")) ==
      scala.collection.Seq("alpha"))
  }

  test("first_upload true for every 3speak insert (J8, dead lookup)") {
    // the reference's dedup guard queries video.first_upload — a
    // field no writer sets — so it never fires (hive-stream.ts:623-631)
    val ops = toOps(spark,
      block(100, "2024-05-01T12:00:00",
        ("tx1", Seq(("comment",
          comment("alice", "v1", "b", jsonMeta = videoMeta))))),
      block(101, "2024-05-01T12:00:03",
        ("tx2", Seq(("comment",
          comment("alice", "v2", "b", jsonMeta = videoMeta))))))
    val posts = PostsIngest.ingest(ops)(spark)
    val byKey = posts.collect().map(r =>
      r.getAs[String]("permlink") ->
        r.getAs[org.apache.spark.sql.Row]("app_metadata")
          .getAs[org.apache.spark.sql.Row]("spkvideo")
          .getAs[Boolean]("first_upload")).toMap
    assert(byKey("v1") && byKey("v2"))
  }

  test("vote ops produce a dirty set applied to posts (J9)") {
    val ops = toOps(spark,
      block(100, "2024-05-01T12:00:00",
        ("tx1", Seq(("comment", comment("alice", "p1", "b")),
          ("comment", comment("bob", "p2", "b"))))),
      block(101, "2024-05-01T12:00:03",
        ("tx2", Seq(("vote",
          """{"voter":"carol","author":"alice","permlink":"p1","weight":10000}""")))))
    val posts = PostsIngest.ingest(ops)(spark)
    val flagged = PostsIngest.flagNeedsStatUpdate(posts,
      PostsIngest.voteDirtySet(ops))
    val byKey = flagged.collect().map(r =>
      r.getAs[String]("permlink") ->
        r.getAs[Boolean]("needs_stat_update")).toMap
    assert(byKey("p1") && !byKey("p2"))
  }

  test("posts schema matches the declared entity schema") {
    val ops = toOps(spark,
      block(100, "2024-05-01T12:00:00",
        ("tx1", Seq(("comment",
          comment("alice", "p1", "b", jsonMeta = videoMeta))))))
    val posts = PostsIngest.ingest(ops)(spark)
    def norm(dt: org.apache.spark.sql.types.DataType): String =
      dt.sql.replace(" NOT NULL", "") // ignore nullability
    assert(posts.schema.fields.map(f => (f.name, norm(f.dataType))).toSeq
      == graft.domain.Schemas.post.fields
        .map(f => (f.name, norm(f.dataType))).toSeq)
  }
}
