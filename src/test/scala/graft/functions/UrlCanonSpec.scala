package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlCanonSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(Text.canonicalizeUrl(col("u")).as("c"))
      .as[String].collect().toSeq

  test("scheme/host lowercased, path case preserved") {
    assert(canon("HTTPS://ExAmPle.COM/Mixed/Case") ==
      Seq("https://example.com/Mixed/Case"))
  }

  test("www, default ports, fragment stripped; non-default port kept") {
    assert(canon(
      "https://www.example.com:443/a#frag",
      "http://www.example.com:80/a",
      "http://example.com:8080/a") ==
      Seq("https://example.com/a", "http://example.com/a",
        "http://example.com:8080/a"))
  }

  test("tracking params dropped, survivors sorted, bare ? dropped") {
    assert(canon(
      "http://e.com/p?utm_source=x&b=2&a=1&fbclid=zz&gclid=q",
      "http://e.com/p?utm_campaign=only") ==
      Seq("http://e.com/p?a=1&b=2", "http://e.com/p"))
  }

  test("trailing slash stripped on non-root path; root kept") {
    assert(canon("http://e.com/a/b/", "http://e.com/") ==
      Seq("http://e.com/a/b", "http://e.com/"))
  }

  test("idempotent: canon(canon(u)) == canon(u)") {
    val msgs = Seq(
      "HTTPS://WWW.E.COM:443/A/?b=1&utm_x=1#f",
      "http://e.com:80/?z=9&a=1",
      "http://e.com/deep/path/?utm_source=s")
    val once = canon(msgs: _*)
    assert(canon(once: _*) == once)
  }
}
