package graft.query

import graft.SparkSpec
import graft.functions.Vectors
import graft.ingest.{Fixtures, GraphIngest, PostsIngest}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class ProjectionsAndVectorsSpec extends SparkSpec {
  import Fixtures._

  private lazy val posts = {
    val ops = toOps(spark,
      block(100, "2024-05-01T12:00:00",
        ("t1", Seq(("comment", comment("alice", "v1",
          "intro\n---\n\nreal video body", jsonMeta = videoMeta)))),
        ("t2", Seq(("comment", comment("bob", "b1", "plain post",
          parentPermlink = "general"))))))
    PostsIngest.ingest(ops)(spark)
  }

  test("P1-P6: refs, metadata projection, lang, community_ref, spkvideo, typename") {
    val p = PostProjections.project(posts).collect()
      .map(r => r.getAs[String]("permlink") -> r).toMap
    val v1 = p("v1")
    assert(v1.getAs[scala.collection.Seq[String]]("refs")
      == Seq("hive:alice:v1"))                                   // P1
    assert(v1.getAs[Row]("json_metadata").getAs[String]("app")
      == "3speak/0.3")                                           // P2
    assert(v1.getAs[String]("lang") == "en")                     // P3
    assert(v1.getAs[String]("community_ref") == "hive-100")      // P4
    assert(p("b1").getAs[String]("community_ref") == null)
    val sv = v1.getAs[Row]("spkvideo")                           // P5
    assert(sv.getAs[String]("play_url") == "ipfs://QmVid123/manifest.m3u8")
    assert(sv.getAs[String]("thumbnail_url") == "https://img/2.png")
    assert(sv.getAs[String]("body") == "real video body")        // X15
    assert(sv.getAs[Int]("height") == 0)     // ?? 0.0 defaults
    assert(!sv.getAs[Boolean]("is_short"))   // ?? false default
    assert(p("b1").getAs[Row]("spkvideo") == null)
    assert(v1.getAs[String]("__typename") == "HivePost")         // P6
  }

  test("ANSI regression: video post with no header, empty images, no video sourceMap entry") {
    val sparseVideoMeta =
      """{"app":"3speak/0.3","image":[],""" +
        """"video":{"info":{"duration":30.0,"sourceMap":[]}}}"""
    val ops = toOps(spark,
      block(100, "2024-05-01T12:00:00",
        ("t1", Seq(("comment", comment("zed", "z1",
          "no header here at all", jsonMeta = sparseVideoMeta))))))
    val p = PostProjections.project(PostsIngest.ingest(ops)(spark))
      .filter(col("permlink") === "z1").collect().head
    val sv = p.getAs[Row]("spkvideo")
    assert(sv != null)
    assert(sv.getAs[String]("thumbnail_url")
      == "https://media.3speak.tv/z1/thumbnails/default.png")
    assert(sv.getAs[String]("play_url")
      == "https://threespeakvideo.b-cdn.net/z1/default.m3u8")
    // split('---\n\n')[1] of a header-less body is undefined
    assert(sv.getAs[String]("body") == null)
  }

  test("P7/P8: profile views and community roles unpack") {
    import spark.implicits._
    val profiles = Seq(("hive/alice", "alice", null: String, "about",
      null: String, null: String, null: String))
      .toDF("_id", "username", "displayName", "about", "location",
        "website", "did")
      .withColumn("images", struct(lit("av.png").as("avatar"),
        lit(null).cast("string").as("cover")))
      .withColumn("extra",
        struct(lit(null).cast("string").as("pinned_post")))
      .withColumn("score", lit(1.0))
    val view = PostProjections.profileView(profiles).collect().head
    assert(view.getAs[String]("id") == "hive/alice")  // id = _id
    assert(view.getAs[String]("name") == null)  // no username fallback
    assert(view.getAs[String]("username") == "alice")
    assert(view.getAs[String]("__typename") == "HiveProfile")
    assert(view.getAs[Row]("images").getAs[String]("avatar") == "av.png")

    val comm = Seq(Tuple1("hive/hive-1")).toDF("_id")
      .withColumn("roles", array(
        array(lit("alice"), lit("admin"), lit("boss")),
        array(lit("bob"), lit("mod"), lit(""))))
    val roles = comm.withColumn("r", PostProjections.rolesUnpacked)
      .select(explode(col("r")).as("x")).select("x.*").collect()
      .map(r => (r.getAs[String]("username"), r.getAs[String]("role")))
    assert(roles.toSeq == Seq(("alice", "admin"), ("bob", "mod")))
  }

  test("cosinePairs: finds near-dup vectors, verified cosine, no false positives") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    def vec() = Seq.fill(16)(rng.nextGaussian().toFloat)
    val v0 = vec(); val v1 = vec(); val v2 = vec()
    // v0 ~ v0' (tiny noise), v1/v2 unrelated
    val v0near = v0.map(x => x + 0.001f)
    val vectors = Seq((0L, v0), (1L, v0near), (2L, v1), (3L, v2))
      .toDF("vec_id", "embedding")
    val pairs = Vectors.cosinePairs(vectors, "embedding", "vec_id",
      dim = 16, threshold = 0.98).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("cosine")))
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((0L, 1L)))
    assert(pairs.head._3 > 0.999)
  }

  test("Q4 community: point lookup + two feeds with forced byCommunity") {
    import spark.implicits._
    val communities = Seq(("hive/hive-100", "hive-100", "My Comm"))
      .toDF("_id", "username", "title")
      .withColumn("roles", array(array(lit("alice"), lit("admin"),
        lit(""))))
    val follows = spark.emptyDataFrame
      .sparkSession.createDataFrame(
        java.util.List.of[Row](),
        graft.domain.Schemas.follow)
    val (row, trending, newest) = PostProjections.community(
      communities, posts, follows, "hive-100")
    assert(row.count() == 1)
    assert(newest.collect().map(_.getAs[String]("permlink")).toSeq
      == Seq("v1"))
    assert(trending.count() == 1)
  }

  test("batchTopKCosine == per-query topKCosine; no single-partition window") {
    import graft.functions.Vectors
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val batch = Vectors.batchTopKCosine(emb, "embedding", queries,
      "qv", "qid", k = 4)
    val got = batch.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    // parity: each query's ranked ids == the single-query operator's
    (0L until 3L).foreach { qid =>
      val qv = emb.filter(col("vec_id") === qid)
        .head().getAs[scala.collection.Seq[Float]]("embedding").toSeq
      val single = Vectors.topKCosine(emb, "embedding", qv, k = 4)
        .collect().map(_.getAs[Long]("vec_id")).toSeq
      assert(got(qid) == single, s"qid=$qid")
      assert(got(qid).head == qid)          // self is rank 1
    }
    // both windows are partitioned — no global single-partition sort
    assert(!batch.queryExecution.executedPlan.toString
      .contains("No Partition Defined"))
  }

  test("kmeansFit recovers separated clusters; output feeds ivfAssign") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def pt(axis: Int) = Seq.tabulate(8)(d =>
      ((if (d == axis) 5.0 else 0.0) + rnd.nextGaussian() * 0.05).toFloat)
    val rows = (0 until 90).map { i =>
      (i.toLong, pt(i / 30))            // 3 true clusters on axes 0/1/2
    }
    val df = rows.toDF("vec_id", "embedding")
    val cents = Vectors.kmeansFit(df, "embedding", "vec_id",
      k = 3, iters = 5)
    assert(cents.size == 3)
    val got = Vectors.ivfAssign(df, "embedding", cents)
      .select("vec_id", "cluster").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    // every true cluster maps to ONE label and the labels are distinct
    val byTrue = got.groupBy(_._1 / 30).view
      .mapValues(_.map(_._2).distinct).toMap
    assert(byTrue.values.forall(_.size == 1), s"split cluster: $byTrue")
    assert(byTrue.values.flatten.toSet.size == 3, s"merged: $byTrue")
  }

  test("quantizeInt8: scale formula, zero vector, exact integer qdot") {
    import spark.implicits._
    val rows = Seq(
      (0L, Seq(1.0f, -2.0f, 0.5f)),
      (1L, Seq(0.0f, 0.0f, 0.0f)),            // all-zero: no div-by-0
      (2L, Seq(-4.0f, 4.0f, 2.0f)))
      .toDF("vec_id", "embedding")
      .withColumn("__ma", Vectors.maxAbs(col("embedding")))
      .withColumn("q", Vectors.quantizeInt8(col("embedding"), col("__ma")))
    val got = rows.orderBy("vec_id").collect()
      .map(_.getAs[scala.collection.Seq[Byte]]("q").toSeq)
    // doc 0: scale 127/2 ⇒ floor(63.5+.5)=64, floor(-127+.5)=-127,
    //        floor(31.75+.5)=32
    assert(got(0) == Seq[Byte](64, -127, 32))
    assert(got(1) == Seq[Byte](0, 0, 0))
    assert(got(2) == Seq[Byte](-127, 127, 64))
    val qd = rows.filter(col("vec_id") === 0)
      .crossJoin(rows.filter(col("vec_id") === 2)
        .select(col("q").as("q2")))
      .select(Vectors.qdot(col("q"), col("q2")).cast("long"))
      .head().getLong(0)
    assert(qd == 64L * -127 + -127L * 127 + 32L * 64) // exact long math
  }

  test("quantizedTopK: rerank matches exact top-k at sf0.001") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val reranked = Vectors.quantizedTopK(emb, "embedding",
      col("vec_id") === 0, k = 10, candidates = 40)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    val anchor = emb.filter(col("vec_id") === 0)
      .head().getAs[scala.collection.Seq[Float]]("embedding").toSeq
    val exact = emb
      .withColumn("sim",
        round(Vectors.cosine(col("embedding"),
          array(anchor.map(lit): _*)), 4))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(10).collect().map(_.getAs[Long]("vec_id")).toSeq
    // 4× candidate headroom absorbs int8 rank noise on this corpus —
    // pinned: identical result set AND order
    assert(reranked == exact)
  }
}
