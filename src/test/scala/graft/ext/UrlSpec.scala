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

  test("parseRobots: RFC 9309 grouping, comments, empty disallow, unknown keys") {
    import spark.implicits._
    val txt = Seq(
      "# crawl policy",
      "User-agent: GraftBot",
      "User-Agent: otherbot   # two agents, one group",
      "Disallow: /private",
      "Allow: /private/ok",
      "",
      "user-agent: *",
      "Disallow:",          // empty value = allow-all, NO rule
      "Crawl-delay: 10",    // unknown key ignored
      "Disallow: /tmp/*",
      "Allow: /a$").mkString("\n")
    val rules = Url.parseRobots(Seq(("h1", txt)).toDF("host", "txt"), "txt")
      .select("agent", "allow", "rule_path").collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getString(2))).toSet
    assert(rules == Set(
      ("graftbot", false, "/private"), ("otherbot", false, "/private"),
      ("graftbot", true, "/private/ok"), ("otherbot", true, "/private/ok"),
      ("*", false, "/tmp/*"), ("*", true, "/a$")))
  }

  test("robotsDecisions: longest match, allow tie-break, group selection, wildcards") {
    import spark.implicits._
    val rules = Seq(
      // exact-agent group on h1
      ("h1.com", "graftbot", false, "/private"),
      ("h1.com", "graftbot", true, "/private/pub"),
      ("h1.com", "*", false, "/"), // must be IGNORED for graftbot on h1
      // star group on h2, with wildcard + anchor
      ("h2.com", "*", false, "/tmp/*"),
      ("h2.com", "*", true, "/tmp/keep"),
      ("h2.com", "*", false, "/exact$"),
      // equal-length allow/disallow tie on h3 + a literal-dot rule
      ("h3.com", "*", false, "/abc"),
      ("h3.com", "*", true, "/ab*"),
      ("h3.com", "*", false, "/x.y"))
      .toDF("host", "agent", "allow", "rule_path")
    val urls = Seq(
      1L -> "http://h1.com/private/x",      // disallow (/private)
      2L -> "http://h1.com/private/pub/x",  // allow (longer match)
      3L -> "http://h1.com/other",          // no match in graftbot group -> allow
      4L -> "http://h2.com/tmp/junk",       // /tmp/* disallow
      5L -> "http://h2.com/tmp/keep/f",     // /tmp/keep longer -> allow
      6L -> "http://h2.com/exact",          // $-anchored disallow
      7L -> "http://h2.com/exactly",        // anchor must NOT match
      8L -> "http://h3.com/abc",            // 4 vs 4 tie -> allow wins
      9L -> "http://nowhere.com/x",         // host without rules -> allow
      10L -> "http://h3.com/xzy",           // literal dot must NOT match
      11L -> "http://h3.com/x.y")           // literal dot matches itself
      .toDF("id", "url")
    val got = Url.robotsDecisions(urls, "url", rules, "GraftBot")
      .select("id", "allowed").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got == Map(1L -> false, 2L -> true, 3L -> true, 4L -> false,
      5L -> true, 6L -> false, 7L -> true, 8L -> true, 9L -> true,
      10L -> true, 11L -> false), got)
  }

  test("robotsDecisions: plan stays flat as the rules table grows (no plan literal)") {
    // the round-7 shape collected the WHOLE rules table into a typedLit —
    // a 2000-host table below would embed ~8000 compiled patterns in the
    // plan string (the trainMerges plan-explosion class). The broadcast
    // shape must keep the plan size independent of the rules cardinality.
    val rules = spark.range(2000)
      .selectExpr("concat('h', id, '.com') AS host")
      .selectExpr("host", "'*' AS agent",
        "explode(array('/a', '/a/b', '/c*', '/d$')) AS rule_path")
      .selectExpr("host", "agent", "rule_path LIKE '%b' AS allow", "rule_path")
    val urls = spark.range(100).selectExpr("id",
      "concat('http://h', id % 2000, '.com/a/b/x') AS url")
    val dec = Url.robotsDecisions(urls, "url", rules, "graftbot")
    val planStr = dec.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(planStr.length < 60000,
      s"plan must not embed the rules table (explain length ${planStr.length})")
    // verdicts stay right: /a/b/x matches /a (deny, len 2) and /a/b
    // (allow, len 4) — longest wins → every URL allowed
    assert(dec.where(!col("allowed")).count() === 0)
    assert(dec.count() === 100)
  }

  test("robotsDecisions: empty rules table allows everything") {
    import spark.implicits._
    val rules = Seq.empty[(String, String, Boolean, String)]
      .toDF("host", "agent", "allow", "rule_path")
    val urls = Seq(1L -> "http://a.com/x", 2L -> "not a url").toDF("id", "url")
    val got = Url.robotsDecisions(urls, "url", rules, "graftbot")
      .select("id", "allowed").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got == Map(1L -> true, 2L -> true), got)
  }

  test("parseCrawlDelays: group sharing, fractions, invalid/negative dropped") {
    import spark.implicits._
    val txt = Seq(
      "User-agent: GraftBot",
      "User-agent: otherbot",
      "Crawl-delay: 1.5",      // both agents, fractional seconds
      "User-agent: *",
      "Disallow: /tmp",        // directive closes the agent list
      "User-agent: late",      // new group after rules
      "Crawl-delay: 2",
      "Crawl-delay: nope",     // unparsable -> dropped
      "Crawl-delay: -3").mkString("\n")  // negative -> dropped
    val got = Url.parseCrawlDelays(Seq(("h1", txt)).toDF("host", "txt"), "txt")
      .select("agent", "delay_ms").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("graftbot", 1500L), ("otherbot", 1500L),
      ("late", 2000L)), got)
  }

  test("resolveCrawlDelays: exact agent beats *, min delay on duplicates") {
    import spark.implicits._
    val delays = Seq(
      ("h1", "*", 2000L), ("h1", "GraftBot", 500L),
      ("h2", "*", 800L), ("h2", "*", 300L),       // dup directives -> min
      ("h3", "otherbot", 9000L))                  // foreign agent only
      .toDF("host", "agent", "delay_ms")
    val got = Url.resolveCrawlDelays(delays, "graftbot")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("h1" -> 500L, "h2" -> 300L), got)
  }

  test("politeSchedule: per-host spacing at the resolved delay, default fill") {
    import spark.implicits._
    val frontier = Seq(
      (1L, "h1"), (2L, "h1"), (3L, "h1"), (4L, "h2"), (5L, "h2"))
      .toDF("id", "host")
    val delays = Seq(("h1", 500L)).toDF("host", "delay_ms")
    val got = Url.politeSchedule(frontier, "host", Seq(col("id")),
        delays, defaultDelayMs = 1000L, t0Ms = 100L)
      .select("id", "seq", "fetch_at_ms").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(
      1L -> (1L, 100L), 2L -> (2L, 600L), 3L -> (3L, 1100L),
      4L -> (1L, 100L), 5L -> (2L, 1100L)), got)
  }

  test("recrawlPriority: hot-and-stale outranks fresh; single obs has priority 0") {
    import spark.implicits._
    // key A: changes every visit, last seen at t=50 (stale, hot)
    // key B: never changes, last seen at t=100 (fresh, cold)
    // key C: one observation (no measurable rate)
    val h = Seq(
      ("A", 0L, true), ("A", 25L, true), ("A", 50L, true),
      ("B", 0L, false), ("B", 50L, false), ("B", 100L, false),
      ("C", 10L, true))
      .toDF("k", "t", "ch")
    val got = Url.recrawlPriority(h, "k", "t", col("ch"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    // A: 3 changes over span 50, age 50 -> 3*50*1e6/50 = 3e6 ppm
    // (3 expected missed changes)
    assert(got("A") == (3L, 3L, 50L, 50L, 3000000L), got.toString)
    // B: zero changes -> priority 0 despite nonzero age
    assert(got("B") == (3L, 0L, 100L, 0L, 0L), got.toString)
    // C: zero span -> no measurable rate, priority 0 by contract
    assert(got("C") == (1L, 1L, 0L, 90L, 0L), got.toString)
    // fine-grained clocks must not truncate the rate to zero: 2 changes
    // over a 1e11-unit span (a "rate_ppm" would floor to 0), half the
    // span stale -> ~1 expected missed change
    val fine = Seq(("F", 0L, true), ("F", 100000000000L, true),
      ("F", 50000000000L, false), ("G", 200000000000L, false))
      .toDF("k", "t", "ch")
    val fp = Url.recrawlPriority(fine, "k", "t", col("ch"))
      .where(col("k") === "F").first()
    assert(fp.getLong(5) == 2000000L, fp.toString) // 2*1e11*1e6/1e11
    // null keys and timestamps are excluded, not misaggregated
    val withNulls = h.unionByName(Seq(
      (Option.empty[String], Option(7L), Option(true)),
      (Option("A"), Option.empty[Long], Option(true)))
      .toDF("k", "t", "ch"))
    assert(Url.recrawlPriority(withNulls, "k", "t", col("ch"))
      .where(col("k") === "A").first().getLong(1) == 3L)
  }
}
