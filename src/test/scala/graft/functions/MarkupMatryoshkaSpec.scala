package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MarkupMatryoshkaSpec extends SparkSpec {
  import spark.implicits._

  private def strip(s: String): String =
    Seq(s).toDF("t").select(Text.stripMarkup(col("t")))
      .collect()(0).getString(0)

  test("stripMarkup: tags out, entities decoded, whitespace collapsed") {
    assert(strip("<p>Hello  <b>world</b></p>") === "Hello world")
    assert(strip("a &lt;tag&gt; &amp; &quot;q&quot; &#39;s&#39;") ===
      "a <tag> & \"q\" 's'")
    assert(strip("x&nbsp;&nbsp;y") === "x y")
  }

  test("stripMarkup: single-pass entity decode (&amp;lt; stays &lt;)") {
    // the browser-visible text of "&amp;lt;" is "&lt;", not "<"
    assert(strip("&amp;lt;") === "&lt;")
  }

  test("stripMarkup: unclosed/empty tags and markup-only input") {
    assert(strip("<br/><hr>") === "")
    assert(strip("text <unclosed") === "text <unclosed") // no '>' → kept
  }

  test("matryoshkaTopK: anchor first; prefix candidates rerank exactly") {
    // 4-dim vectors; prefix = first 2 dims
    val emb = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)),
      (1L, Seq(1f, 0f, 0f, 1f)),   // prefix-identical to anchor
      (2L, Seq(0f, 1f, 0f, 0f)),   // prefix-orthogonal
      (3L, Seq(0.9f, 0.1f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val out = Vectors.matryoshkaTopK(emb, "embedding",
      col("vec_id") === 0, prefixDims = 2, k = 3, candidates = 3)
      .collect().map(r => (r.getLong(0), r.getAs[Double]("sim")))
    assert(out.head === ((0L, 1.0)))        // anchor itself
    // id 2's prefix cosine is 0 → cut at candidates=3; id 1 reranked
    // below 3 by full-dim cosine (1/sqrt2 ≈ .7071 < .9939)
    assert(out.map(_._1).toSeq === Seq(0L, 3L, 1L))
  }
}
