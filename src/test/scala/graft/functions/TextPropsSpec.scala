package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextPropsSpec extends SparkSpec {

  test("minhash signature agreement approximates Jaccard similarity") {
    import spark.implicits._
    // doc pairs with known overlap: share `s` of 40 shingle tokens
    val base = (1 to 60).map(i => s"tok$i")
    val docs = Seq(
      ("a1", base.take(40)), ("a2", base.take(40)),            // J = 1.0
      ("b1", base.take(40)), ("b2", base.slice(20, 60)),       // J = 0.33
      ("c1", base.take(30)), ("c2", base.slice(30, 60)))       // J = 0.0
      .map { case (id, toks) => (id, toks.mkString(" ")) }
      .toDF("id", "text")
      .withColumn("toks", Text.tokens(col("text")))
      .withColumn("sig", Text.minhashSig(col("toks"), k = 128))
    val sigs = docs.collect()
      .map(r => r.getAs[String]("id") ->
        r.getAs[scala.collection.Seq[Long]]("sig")).toMap
    def agree(a: String, b: String): Double =
      sigs(a).zip(sigs(b)).count { case (x, y) => x == y } / 128.0
    assert(agree("a1", "a2") == 1.0)
    assert(math.abs(agree("b1", "b2") - 1.0 / 3) < 0.15)
    assert(agree("c1", "c2") < 0.1)
  }

  test("wordShingles on docs shorter than n yields empty, not an error") {
    import spark.implicits._
    // sequence(1, size-(n-1)) would DESCEND for short docs and slice(_,0,_)
    // throws — the guard must return [] for them (DuckDB oracle parity).
    val rows = Seq(("empty", ""), ("one", "hello"), ("two", "hello world"),
      ("three", "a b c"), ("four", "a b c d"))
      .toDF("id", "text")
      .withColumn("toks", Text.tokens(col("text")))
      .withColumn("sh", Text.wordShingles(col("toks"), 3))
      .collect()
      .map(r => r.getAs[String]("id") ->
        r.getAs[scala.collection.Seq[String]]("sh")).toMap
    assert(rows("empty").isEmpty)
    assert(rows("one").isEmpty)
    assert(rows("two").isEmpty)
    assert(rows("three") == Seq("a b c"))
    assert(rows("four") == Seq("a b c", "b c d"))
  }

  test("langId picks the marker-dense language; und for no hits") {
    import spark.implicits._
    val r = Seq(
      ("en", "the cat and the dog is in the house"),
      ("es", "el perro y la casa de los gatos"),
      ("de", "der hund ist nicht das problem und zu gross"),
      ("fr", "le chat est dans les maisons des gens"),
      ("und", "zzz qqq www"))
      .toDF("expect", "text")
      .withColumn("got",
        Text.langId(Text.tokens(col("text"))).getField("lang"))
      .select("expect", "got")
      .collect()
    r.foreach(row =>
      assert(row.getString(0) == row.getString(1),
        s"'${row.getString(0)}' text classified as '${row.getString(1)}'"))
  }

  test("fingerprint is whitespace/case-insensitive but content-sensitive") {
    import spark.implicits._
    val fps = Seq(("a", "Hello  World"), ("b", "hello world"),
      ("c", "hello\tworld"), ("d", "hello there"))
      .toDF("id", "text")
      .withColumn("fp", Text.fingerprint(col("text")))
      .collect()
      .map(r => r.getAs[String]("id") -> r.getAs[String]("fp")).toMap
    assert(fps("a") == fps("b") && fps("b") == fps("c"))
    assert(fps("a") != fps("d"))
  }

  test("rolling fingerprint is order-sensitive (unlike set fingerprint)") {
    import spark.implicits._
    val df = Seq(("x", "alpha beta gamma"), ("y", "gamma beta alpha"))
      .toDF("id", "text")
      .withColumn("toks", Text.tokens(col("text")))
      .withColumn("roll", Text.rollingFingerprint(col("toks")))
      .withColumn("set_fp", Text.fingerprint(col("text")))
    val rows = df.collect().map(r =>
      r.getAs[String]("id") -> (r.getAs[Long]("roll"),
        r.getAs[String]("set_fp"))).toMap
    assert(rows("x")._1 != rows("y")._1)   // order matters
    assert(rows("x")._2 != rows("y")._2)   // md5 of joined also ordered
  }

  test("hashtag/url extraction (X8 base-meta shape)") {
    import spark.implicits._
    val r = Seq(Tuple1(
      "Check #Spark and #data_2024 but not x#inline or #123; " +
        "see https://example.com/a?b=1 and http://h.io. end"))
      .toDF("text")
      .select(Text.extractHashtags(col("text")).as("tags"),
        Text.extractUrls(col("text")).as("urls"))
      .head()
    assert(r.getAs[scala.collection.Seq[String]]("tags")
      == Seq("spark", "data_2024"))   // needs a letter; boundary rule
    assert(r.getAs[scala.collection.Seq[String]]("urls")
      == Seq("https://example.com/a?b=1", "http://h.io."))
  }

  test("portable rolling fingerprint: seed/empty/single-token semantics") {
    import spark.implicits._
    // must match DuckDB list_reduce exactly: empty → null, single
    // token → the RAW token, else md5-chain seeded with token 1
    val rows = Seq(("e", ""), ("one", "solo"), ("two", "a b"),
      ("three", "a b c"))
      .toDF("id", "text")
      .withColumn("tk", Text.tokens(col("text")))
      .withColumn("fp", Text.rollingFingerprintPortable(col("tk")))
      .collect().map(r => r.getAs[String]("id") ->
        r.getAs[String]("fp")).toMap
    assert(rows("e") == null)
    assert(rows("one") == "solo")
    val md5ab = java.security.MessageDigest.getInstance("MD5")
      .digest("ab".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(rows("two") == md5ab)
    assert(rows("three") != rows("two"))   // order/content sensitive
  }

  test("bpeish token count: contractions and punct split like GPT-2 pretokenizer") {
    import spark.implicits._
    val n = Seq(Tuple1("it's a well-known fact, isn't it?"))
      .toDF("text")
      .select(Text.bpeishCount(col("text"))).head().getLong(0)
    // it|'s| a| well|-|known| fact|,| isn|'t| it|?
    assert(n == 12L)
  }

  test("tokenChunks: overlap, short tail, single-chunk and empty docs") {
    import spark.implicits._
    val out = Seq(
      ("seven", (1 to 7).map(i => s"t$i").mkString(" ")),  // 3 chunks
      ("two", "a b"),                                      // 1 chunk
      ("empty", "   "))                                    // 0 chunks
      .toDF("id", "text")
      .withColumn("toks", Text.tokens(col("text")))
      .select(col("id"), posexplode(
        Text.tokenChunks(col("toks"), win = 4, stride = 3)))
      .collect()
      .map(r => (r.getString(0), r.getInt(1),
        r.getAs[scala.collection.Seq[String]]("col")))
    val seven = out.filter(_._1 == "seven").sortBy(_._2)
    // starts 1, 4, 7: full window, full window, short tail
    assert(seven.toSeq.map(_._3.toSeq) == Seq(
      Seq("t1", "t2", "t3", "t4"),
      Seq("t4", "t5", "t6", "t7"),      // overlap of 1 with previous
      Seq("t7")))
    assert(out.filter(_._1 == "two").toSeq.map(_._3.toSeq)
      == Seq(Seq("a", "b")))
    assert(!out.exists(_._1 == "empty"))   // no rows, no crash
  }

  test("redactPii: emails then phones; counts via the same patterns") {
    import spark.implicits._
    val out = Seq(
      "mail bob.smith+x@sub.example.org now",
      "call 555-123-4567 or 555-000-1111",
      "both a@b.io 111-222-3333",
      "clean text")
      .toDF("text")
      .select(
        Text.redactPii(col("text")).as("red"),
        size(regexp_extract_all(col("text"),
          lit(Text.emailPattern), lit(0))).as("ne"),
        size(regexp_extract_all(col("text"),
          lit(Text.phonePattern), lit(0))).as("np"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    assert(out(0) == ("mail [EMAIL] now", 1, 0))
    assert(out(1) == ("call [PHONE] or [PHONE]", 0, 2))
    assert(out(2) == ("both [EMAIL] [PHONE]", 1, 1))
    assert(out(3) == ("clean text", 0, 0))
  }

  test("tokenChunks invariants over random docs (slice equality, coverage)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val docs = (0 until 20).map { i =>
      val n = rnd.nextInt(31)   // 0..30 tokens
      (i.toLong, Seq.fill(n)(s"w${rnd.nextInt(6)}").mkString(" "))
    }
    for ((w, s) <- Seq((4, 3), (5, 5), (8, 2), (1, 1))) {
      val out = docs.toDF("id", "text")
        .withColumn("toks", Text.tokens(col("text")))
        .select(col("id"), col("toks"),
          Text.tokenChunks(col("toks"), w, s).as("chunks"))
        .collect()
      for (r <- out) {
        val toks = r.getAs[scala.collection.Seq[String]]("toks").toSeq
        val chunks = r.getAs[scala.collection.Seq[
          scala.collection.Seq[String]]]("chunks").map(_.toSeq).toSeq
        val t = toks.length
        // chunk count and exact slice equality at every start
        assert(chunks.length ==
          (if (t == 0) 0 else (t + s - 1) / s))
        chunks.zipWithIndex.foreach { case (c, i) =>
          assert(c == toks.slice(i * s, i * s + w))
        }
        // stride <= win here, so every token index is covered
        assert(chunks.flatten.length >= t || s > w)
        // no overlap (win == stride) reconstructs the doc exactly
        if (w == s) assert(chunks.flatten == toks)
      }
    }
  }

  test("topTokenCount: max run over sorted tokens == explode-groupBy max") {
    import spark.implicits._
    val out = Seq(
      ("rep", "a b a c a b"),      // a:3
      ("uniq", "x y z"),           // 1
      ("one", "solo"),             // 1
      ("empty", " "))              // 0
      .toDF("id", "text")
      .withColumn("toks", Text.tokens(col("text")))
      .select(col("id"), Text.topTokenCount(col("toks")).as("c"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(out == Map("rep" -> 3, "uniq" -> 1, "one" -> 1, "empty" -> 0))
  }

  test("hamming64 and jaccard basics") {
    import spark.implicits._
    val df = Seq((0L, 0L), (0L, 1L), (0L, 7L), (-1L, 0L))
      .toDF("a", "b")
      .select(Text.hamming64(col("a"), col("b")).as("h"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(0, 1, 3, 64))
    val j = Seq((Seq("a", "b", "c"), Seq("b", "c", "d")))
      .toDF("x", "y")
      .select(Text.jaccard(col("x"), col("y"))).head().getDouble(0)
    assert(math.abs(j - 0.5) < 1e-12)
  }

  test("charEntropyParts: hand values, order invariance, micro " +
    "quantization") {
    import spark.implicits._
    def ent(s: String): (Long, Long) = {
      val r = Seq(s).toDF("text")
        .withColumn("__chars", split(col("text"), ""))
        .select(Text.charEntropyParts(col("__chars")).as("e"))
        .select(col("e.n_uniq_chars"), col("e.ent_micro"))
        .head()
      (r.getLong(0), r.getLong(1))
    }
    assert(ent("aaaa") === ((1L, 0L)))           // degenerate: 0 bits
    // "ab": 2 × round(1e6 · 0.5 · log2(0.5)) = 2 × −500000
    assert(ent("ab") === ((2L, -1000000L)))      // exactly 1 bit
    assert(ent("abcd") === ((4L, -2000000L)))    // exactly 2 bits
    // entropy is a function of the histogram, not the order
    assert(ent("aabb") === ent("abab"))
    assert(ent("abab") === ent("bbaa"))
    // skewed beats uniform: H("aaab") < H("aabb")
    assert(-ent("aaab")._2 < -ent("aabb")._2)
  }

  test("dupNgramStats invariants over random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val vocab = (0 until 12).map(i => s"w$i")
    val docs = (0 until 40).map { i =>
      (i.toLong,
        Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
    }.toDF("doc_id", "text")
    val got = graft.dedup.Dedup
      .dupNgramStats(docs, "text", "doc_id", shingleN = 3, minDocs = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    graft.CacheTracker.releaseAll()
    assert(got.length == 40)                       // every doc reported
    assert(got.forall { case (_, nSh, nDup) =>
      nDup >= 0 && nDup <= nSh })                  // dup ⊆ distinct
    // with minDocs = 1 every shingle is trivially "duplicated"
    val all1 = graft.dedup.Dedup
      .dupNgramStats(docs, "text", "doc_id", shingleN = 3, minDocs = 1)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    graft.CacheTracker.releaseAll()
    assert(all1.forall { case (nSh, nDup) => nDup == nSh })
  }

  test("quantizeInt8 invariants over random vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    val rows = (0 until 60).map { i =>
      (i.toLong, Seq.fill(16)((rnd.nextFloat() * 2 - 1) *
        math.pow(10, rnd.nextInt(5) - 2).toFloat))
    }.toDF("id", "v")
      .withColumn("ma", Vectors.maxAbs(col("v")))
      .withColumn("q", Vectors.quantizeInt8(col("v"), col("ma")))
      .select(col("v"), col("q")).collect()
    rows.foreach { r =>
      val v = r.getAs[scala.collection.Seq[Float]](0)
      val q = r.getAs[scala.collection.Seq[Byte]](1)
      assert(q.length == v.length)
      assert(q.forall(b => b >= -127 && b <= 127))  // int8 range, no wrap
      // sign preserved wherever the magnitude survives rounding
      v.zip(q).foreach { case (x, b) =>
        if (b != 0) assert(math.signum(x.toDouble) == math.signum(b.toDouble)) }
      // the max-|x| element quantizes to ±127 exactly
      val iMax = v.indices.maxBy(i => math.abs(v(i).toDouble))
      assert(math.abs(q(iMax).toInt) == 127)
    }
  }
}
