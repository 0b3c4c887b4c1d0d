package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** URL canonicalization + host curation — edge cases beyond the gate
  * fixture's systematic variety. */
class UrlSpec extends SparkSpec {

  private def canon(u: String): String = {
    import spark.implicits._
    Seq(u).toDF("u").select(Url.canonicalize(col("u")).as("c")).head.getString(0)
  }

  private def hostOf(u: String): String = {
    import spark.implicits._
    Seq(u).toDF("u").select(Url.host(col("u")).as("h")).head.getString(0)
  }

  test("scheme+host lowercase, www strip, default port drop, fragment drop") {
    assert(canon("HTTP://WWW.Example.COM:80/A/b?x=1#top") === "http://example.com/A/b?x=1")
    assert(canon("https://Site.org:443/") === "https://site.org")
    assert(canon("https://Site.org:8443/p") === "https://site.org:8443/p")
    // :80 is only default for http — kept under https
    assert(canon("https://a.net:80/p") === "https://a.net:80/p")
  }

  test("path: case preserved, duplicate slashes collapsed, trailing slash stripped") {
    assert(canon("http://h.com//A//B///c/") === "http://h.com/A/B/c")
    assert(canon("http://h.com/") === "http://h.com")
    assert(canon("http://h.com") === "http://h.com")
  }

  test("query: tracking params dropped, rest sorted, empty query omitted") {
    assert(canon("http://h.com/p?b=2&utm_source=f&a=1&fbclid=Z&gclid=Y") ===
      "http://h.com/p?a=1&b=2")
    assert(canon("http://h.com/p?utm_campaign=x") === "http://h.com/p")
    // param VALUES are preserved case-sensitively; only names are matched
    assert(canon("http://h.com/p?ref=abc&Key=Val") === "http://h.com/p?Key=Val")
  }

  test("host extraction ignores port and www, lowercases") {
    assert(hostOf("HTTPS://WWW.Sub.Domain.IO:8080/x?q=1") === "sub.domain.io")
    // malformed input degenerates to empty host, not an error
    assert(hostOf("not a url") === "")
  }

  test("dropBlockedHosts: literal list and broadcast table variants agree") {
    import spark.implicits._
    val df = Seq(
      (1L, "http://bad.com/a"),
      (2L, "http://WWW.Bad.com:80/b"), // canonical host also bad.com
      (3L, "http://good.org/c")).toDF("id", "url")
    val bySeq = Url.dropBlockedHosts(df, "url", Seq("bad.com"))
      .select("id").as[Long].collect().sorted
    val byTable = Url.dropBlockedHosts(df, "url",
      Seq("bad.com").toDF("host")).select("id").as[Long].collect().sorted
    assert(bySeq.toSeq === Seq(3L))
    assert(byTable.toSeq === Seq(3L))
  }

  test("canonical form is a stable dedup key across crawl variants") {
    import spark.implicits._
    val variants = Seq(
      "HTTP://WWW.News.Site.com:80/today//story?id=9&utm_medium=rss#frag",
      "http://news.site.com/today/story/?utm_source=feed&id=9",
      "http://News.Site.COM/today/story?id=9")
    val keys = variants.toDF("u")
      .select(Url.canonicalize(col("u")).as("c")).distinct().collect()
    assert(keys.length === 1)
    assert(keys.head.getString(0) === "http://news.site.com/today/story?id=9")
  }
}
