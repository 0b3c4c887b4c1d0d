package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + host-level crawl-curation operators.
  *
  * Web-scale pretraining corpora key almost every curation decision off the
  * URL: exact-URL dedup needs a canonical form (the same page is crawled as
  * `HTTP://WWW.Site.com:80/a//b?utm_source=x#top` and
  * `http://site.com/a/b`), per-host quotas bound any single domain's share
  * of the corpus, and blocklists drop known-bad hosts (the C4/RefinedWeb
  * posture). The reference engine has no web layer — these are extension
  * operators in the same spirit as the dedup/quality family.
  *
  * Everything is a pure `Column` expression chain (regexp + higher-order
  * array functions, fully codegen'd, no UDF, no shuffle): canonicalization
  * at 100 TB is a free map over the scan. The canonical form is:
  *
  *   - scheme and host lowercased (path/query case is PRESERVED — URL
  *     semantics make the path case-sensitive)
  *   - a leading `www.` stripped from the host
  *   - default ports dropped (`:80` for http, `:443` for https); any other
  *     explicit port kept
  *   - the fragment dropped
  *   - duplicate slashes in the path collapsed, a trailing slash stripped
  *   - tracking parameters removed (`utm_*` prefix + a fixed exact list),
  *     remaining query params sorted for order-independence
  *
  * [[canonicalSql]]/[[hostSql]] render the SAME rules as DuckDB SQL for the
  * oracle gates — one spec, two engines.
  */
object Url {

  /** Exact-name tracking params stripped from query strings (beside the
    * `utm_` prefix family). Shared verbatim with the SQL mirror. */
  val TrackingParams: Seq[String] = Seq("fbclid", "gclid", "ref", "mc_cid", "mc_eid")

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val AuthRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  private val PathRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"

  /** Lowercased host of a URL column: authority minus port minus `www.`. */
  def host(url: Column): Column = {
    val auth = lower(regexp_extract(url, AuthRe, 1))
    regexp_replace(regexp_replace(auth, ":[0-9]+$", ""), "^www\\.", "")
  }

  /** Canonical form of a URL column (rules in the object doc). Malformed
    * input (no `scheme://`) degenerates to `"://"`-prefixed output rather
    * than erroring — filter on [[host]] being non-empty to drop junk. */
  def canonicalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, SchemeRe, 1))
    val auth = lower(regexp_extract(url, AuthRe, 1))
    val port = regexp_extract(auth, ":([0-9]+)$", 1)
    val h = regexp_replace(regexp_replace(auth, ":[0-9]+$", ""), "^www\\.", "")
    val isDefaultPort =
      (scheme === "http" && port === "80") || (scheme === "https" && port === "443")
    val portSuffix =
      when(port === "" || isDefaultPort, lit("")).otherwise(concat(lit(":"), port))
    val path = regexp_replace(
      regexp_replace(regexp_extract(url, PathRe, 1), "/+", "/"), "/$", "")
    val params = filter(split(regexp_extract(url, "\\?([^#]*)", 1), "&"), p =>
      p =!= "" && !p.startsWith("utm_") &&
        !substring_index(p, "=", 1).isin(TrackingParams: _*))
    val qs = array_join(array_sort(params), "&")
    concat(scheme, lit("://"), h, portSuffix, path,
      when(qs === "", lit("")).otherwise(concat(lit("?"), qs)))
  }

  /** Drop rows whose host is on a small literal blocklist (codegen'd
    * `NOT IN`; null-safe — junk rows with an empty host survive unless ""
    * is itself listed). For large blocklists use the DataFrame overload. */
  def dropBlockedHosts(df: DataFrame, urlCol: String, blocked: Seq[String]): DataFrame =
    df.where(!host(col(urlCol)).isin(blocked: _*))

  /** Drop rows whose host appears in a blocklist table (column `host`).
    * Broadcast left-anti join: the corpus never shuffles; blocklists are
    * dimension-sized (at most millions of hosts) at any corpus scale. */
  def dropBlockedHosts(df: DataFrame, urlCol: String, blocklist: DataFrame): DataFrame =
    df.join(broadcast(blocklist.select(col("host").as("__blocked_host")).distinct()),
        host(col(urlCol)) === col("__blocked_host"), "left_anti")

  /** Raw path of a URL column (no canonicalization — RFC 9309 matches the
    * path as crawled). Empty path degenerates to "/" (the RFC's implicit
    * root). */
  def path(url: Column): Column = {
    val p = regexp_extract(url, PathRe, 1)
    when(p === "", lit("/")).otherwise(p)
  }

  /** Parse raw robots.txt content into rule rows — RFC 9309 grouping:
    * consecutive `User-agent:` lines open ONE group; `Allow:`/`Disallow:`
    * lines attach to every agent of the most recent group; comments and
    * unknown keys are ignored; an empty `Disallow:` value is allow-all
    * (no rule). A single declarative fold per robots file (`aggregate`
    * HOF carrying (agents, in_ua, rules) struct state) — per-file
    * sequential semantics without a UDF or a shuffle.
    *
    * Output: input row + exploded (agent, allow, rule_path). Files with
    * no rules emit nothing. */
  def parseRobots(df: DataFrame, txtCol: String): DataFrame = {
    // pre-lex each line to (key, v) structs, then one stateful fold
    val folded = expr(
      s"""aggregate(
         |  transform(split($txtCol, '\n'), raw ->
         |    struct(
         |      lower(trim(substring_index(split_part(raw, '#', 1), ':', 1)))
         |        AS key,
         |      CASE WHEN instr(split_part(raw, '#', 1), ':') = 0 THEN ''
         |           ELSE trim(substr(split_part(raw, '#', 1),
         |                  instr(split_part(raw, '#', 1), ':') + 1)) END
         |        AS v)),
         |  struct(
         |    cast(array() as array<string>) as agents,
         |    false as in_ua,
         |    cast(array() as array<struct<agent string, allow boolean,
         |                                 rule_path string>>) as rules),
         |  (acc, kv) -> CASE
         |    WHEN kv.key = 'user-agent' AND kv.v != '' THEN
         |      struct(
         |        CASE WHEN acc.in_ua THEN array_append(acc.agents, kv.v)
         |             ELSE array(kv.v) END AS agents,
         |        true AS in_ua, acc.rules AS rules)
         |    WHEN kv.key IN ('allow', 'disallow') THEN
         |      struct(acc.agents AS agents, false AS in_ua,
         |        CASE WHEN kv.v = '' OR size(acc.agents) = 0 THEN acc.rules
         |        ELSE concat(acc.rules, transform(acc.agents, a ->
         |          struct(a AS agent, kv.key = 'allow' AS allow,
         |                 kv.v AS rule_path))) END AS rules)
         |    ELSE acc
         |    END,
         |  acc -> acc.rules)""".stripMargin)
    df.withColumn("__robots_rules", folded)
      .select(col("*"), explode(col("__robots_rules")).as("r"))
      .drop("__robots_rules")
      .withColumn("agent", lower(col("r.agent")))
      .withColumn("allow", col("r.allow"))
      .withColumn("rule_path", col("r.rule_path"))
      .drop("r")
  }

  /** Regex translation of a robots rule path (both engines build the
    * identical pattern string): regex specials escaped, `*` → `.*`, a
    * trailing `$` anchors the end, everything prefix-matched from `^`. */
  /** Chars escaped when a rule path becomes a regex — shared with the SQL
    * mirror. (Backslash/caret are not in the URL-path charset; `*` and a
    * trailing `$` are the RFC's own wildcards, translated, not escaped.) */
  val RulePatternEscapes: Seq[String] =
    Seq(".", "+", "?", "(", ")", "[", "]", "{", "}", "|")

  private def rulePattern(rulePath: Column): Column = {
    val endAnchored = rulePath.endsWith("$")
    val body = when(endAnchored,
      rulePath.substr(lit(1), length(rulePath) - 1)).otherwise(rulePath)
    val escaped = RulePatternEscapes
      .foldLeft(body)((c, ch) => regexp_replace(c, "\\" + ch, "\\\\" + ch))
    concat(lit("^"), regexp_replace(escaped, "\\*", ".*"),
      when(endAnchored, lit("$")).otherwise(lit("")))
  }

  /** RFC 9309 crawl-permission decisions for an agent over a URL corpus.
    *
    * `rules`: (host, agent, allow, rule_path) — from [[parseRobots]] or a
    * curated table. Per host, the group is the agent's own rules when any
    * exist, else the `*` group (RFC group selection); among matching rules
    * the LONGEST rule path wins, ties break least-restrictive (allow).
    * URLs with no matching rule (or no rules for their host at all) are
    * allowed.
    *
    * Scale shape: one site's robots is KBs, but a web-scale frontier has
    * MILLIONS of hosts — the rules table is dimension-sized relative to
    * the corpus yet far too big for a plan literal (an earlier
    * formulation collected the whole table onto the driver and shipped it
    * as a `typedLit` probed linearly per URL: a 1M-host × 20-rule literal
    * is the `trainMerges` plan-string-explosion class, and per-row cost
    * was O(total rules), not O(this host's rules)). The scale-safe shape:
    * group-select and pre-compile the rules into ONE array row per host
    * (a rules-dimension-only shuffle, never the corpus), then BROADCAST
    * hash join on host — the corpus is still never shuffled, and the
    * per-row verdict (regexp-match candidates, max-struct the winner)
    * touches only the joined host's own rules. Robots screening at
    * 100 TB stays a free map over the scan, like canonicalization;
    * broadcast capacity bounds the rules side at ~millions of hosts,
    * which is also where a curated rules table naturally tops out
    * (compiled patterns for 100k hosts / 2M rules measure ~tens of MB —
    * see ScaleSmoke's robots entry). */
  def robotsDecisions(
      urls: DataFrame, urlCol: String, rules: DataFrame, agent: String
  ): DataFrame = {
    val a = agent.toLowerCase(java.util.Locale.ROOT)
    // compile once per RULE (dimension-side work), then collapse to one
    // row per host with RFC group selection: the exact-agent group when
    // any of its rules exist for the host, else the `*` group.
    // (collect_list skips the nulls the `when` produces for the other
    // group; element order inside the array is irrelevant — the winner
    // is an order-free max-struct.)
    val compiled = rules
      .select(lower(col("agent")).as("__agent"), col("host"),
        struct(length(col("rule_path")).as("plen"), col("allow").as("allow"),
          rulePattern(col("rule_path")).as("rx")).as("__rule"))
      .where(col("__agent").isin(a, "*"))
    val perHost = compiled
      .groupBy(col("host").as("__rules_host"))
      .agg(
        collect_list(when(col("__agent") === a, col("__rule"))).as("__exact"),
        collect_list(when(col("__agent") === "*", col("__rule"))).as("__star"))
      .select(col("__rules_host"),
        when(size(col("__exact")) > 0, col("__exact"))
          .otherwise(col("__star")).as("__rules"))
    // RFC "longest rule" counts the ORIGINAL rule path's length,
    // wildcards included (plen above, not the compiled regex length)
    val matches = filter(col("__rules"), r =>
      regexp_like(col("__path"), r.getField("rx")))
    val win = array_max(transform(matches, r =>
      struct(r.getField("plen").as("plen"), r.getField("allow").as("allow"))))
    urls
      .withColumn("__host", host(col(urlCol)))
      .withColumn("__path", path(col(urlCol)))
      .join(broadcast(perHost), col("__host") === col("__rules_host"), "left")
      .withColumn("allowed", coalesce(win.getField("allow"), lit(true)))
      .drop("__path", "__rules_host", "__rules")
      .withColumnRenamed("__host", "url_host")
  }

  /** Crawl-delay directives per agent group from raw robots.txt text —
    * the politeness half of [[parseRobots]] (RFC 9309 leaves crawl-delay
    * as the de-facto extension every major engine honors). Same line
    * lexer and group-accumulation fold: consecutive `user-agent` lines
    * share the following directives; any other directive closes the
    * group. Emits one (agent, delay_ms) row per group member; values are
    * decimal seconds (fractions allowed), invalid or negative values are
    * dropped. The fold is one declarative `aggregate` per file — no UDF,
    * no shuffle. */
  def parseCrawlDelays(df: DataFrame, txtCol: String): DataFrame = {
    val folded = expr(
      s"""aggregate(
         |  transform(split($txtCol, '\n'), raw ->
         |    struct(
         |      lower(trim(substring_index(split_part(raw, '#', 1), ':', 1)))
         |        AS key,
         |      CASE WHEN instr(split_part(raw, '#', 1), ':') = 0 THEN ''
         |           ELSE trim(substr(split_part(raw, '#', 1),
         |                  instr(split_part(raw, '#', 1), ':') + 1)) END
         |        AS v)),
         |  struct(
         |    cast(array() as array<string>) as agents,
         |    false as in_ua,
         |    cast(array() as array<struct<agent string, delay_ms bigint>>)
         |      as delays),
         |  (acc, kv) -> CASE
         |    WHEN kv.key = 'user-agent' AND kv.v != '' THEN
         |      struct(
         |        CASE WHEN acc.in_ua THEN array_append(acc.agents, kv.v)
         |             ELSE array(kv.v) END AS agents,
         |        true AS in_ua, acc.delays AS delays)
         |    WHEN kv.key = 'crawl-delay' THEN
         |      struct(acc.agents AS agents, false AS in_ua,
         |        CASE WHEN size(acc.agents) = 0
         |               OR try_cast(kv.v AS decimal(9,3)) IS NULL
         |               OR try_cast(kv.v AS decimal(9,3)) < 0 THEN acc.delays
         |        ELSE concat(acc.delays, transform(acc.agents, a ->
         |          struct(a AS agent,
         |            cast(try_cast(kv.v AS decimal(9,3)) * 1000 AS bigint)
         |              AS delay_ms))) END AS delays)
         |    WHEN kv.key IN ('allow', 'disallow') THEN
         |      struct(acc.agents AS agents, false AS in_ua,
         |        acc.delays AS delays)
         |    ELSE acc
         |    END,
         |  acc -> acc.delays)""".stripMargin)
    df.withColumn("__cd", folded)
      .select(col("*"), explode(col("__cd")).as("d"))
      .drop("__cd")
      .withColumn("agent", lower(col("d.agent")))
      .withColumn("delay_ms", col("d.delay_ms"))
      .drop("d")
  }

  /** One delay per host for `agent`: the exact-agent group beats `*`
    * (the [[robotsDecisions]] group-selection rule), duplicate directives
    * inside a group resolve to the smallest delay deterministically —
    * a min-struct fold over a host-sized table, never a window. */
  def resolveCrawlDelays(delays: DataFrame, agent: String): DataFrame = {
    val a = agent.toLowerCase(java.util.Locale.ROOT)
    delays
      .where(lower(col("agent")).isin(a, "*"))
      .select(col("host"),
        struct(when(lower(col("agent")) === a, 0).otherwise(1).as("pref"),
          col("delay_ms")).as("__k"))
      .groupBy("host").agg(min("__k").as("__best"))
      .select(col("host"), col("__best.delay_ms").as("delay_ms"))
  }

  /** Per-host rate-limited fetch schedule for a frontier batch: URLs of
    * one host are sequenced by `order` (pass unique keys — determinism
    * is the caller's contract) and assigned
    * `fetch_at_ms = t0Ms + (seq−1)·delay_ms`, so no host is hit faster
    * than its resolved crawl-delay (hosts absent from `hostDelays` get
    * `defaultDelayMs`). Output = frontier columns + (delay_ms, seq,
    * fetch_at_ms).
    *
    * Scale shape: the per-host window is the ONE frontier shuffle, and
    * the delay join co-locates on the same host key (host-sized side —
    * AQE broadcasts it when it fits). Per-host partitions are bounded
    * because a frontier batch is quota-capped upstream
    * ([[graft.ext.Sampling.quotaCap]]) — an uncapped host would make a
    * fat window partition, which is the quota's job to prevent, not the
    * scheduler's. */
  def politeSchedule(
      frontier: DataFrame,
      hostCol: String,
      order: Seq[Column],
      hostDelays: DataFrame,
      defaultDelayMs: Long,
      t0Ms: Long = 0L
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val seq = row_number().over(
      Window.partitionBy(col(hostCol)).orderBy(order: _*))
    frontier
      .join(hostDelays.withColumnRenamed("host", hostCol), Seq(hostCol), "left")
      .withColumn("delay_ms", coalesce(col("delay_ms"), lit(defaultDelayMs)))
      .withColumn("seq", seq.cast("bigint"))
      .withColumn("fetch_at_ms",
        lit(t0Ms) + (col("seq") - 1L) * col("delay_ms"))
  }

  // ---- DuckDB SQL mirrors (oracle generation — same constants) ----------

  private def trackingInList: String =
    TrackingParams.map(p => s"'$p'").mkString("(", ", ", ")")

  /** SQL fragment: lowercased no-port no-www host of the URL expression. */
  def hostSql(u: String): String =
    s"regexp_replace(regexp_replace(lower(regexp_extract($u, '$AuthRe', 1)), ':[0-9]+$$', ''), '^www\\.', '')"

  /** SQL fragment mirroring [[path]]: raw path, "" → "/". */
  def pathSql(u: String): String =
    s"""CASE WHEN regexp_extract($u, '$PathRe', 1) = '' THEN '/'
       |     ELSE regexp_extract($u, '$PathRe', 1) END""".stripMargin

  /** SQL fragment mirroring [[rulePattern]] for a `rule_path` column. */
  def rulePatternSql: String = {
    val body = "CASE WHEN rule_path LIKE '%$' " +
      "THEN substr(rule_path, 1, length(rule_path) - 1) ELSE rule_path END"
    val escaped = RulePatternEscapes
      .foldLeft(body)((e, ch) => s"replace($e, '$ch', '\\$ch')")
    s"'^' || replace($escaped, '*', '.*') || " +
      "CASE WHEN rule_path LIKE '%$' THEN '$' ELSE '' END"
  }

  /** SQL fragment mirroring [[canonicalize]] for a URL expression `u`.
    * `coalesce(array_to_string(...), '')` guards DuckDB's empty-list → NULL
    * drift (the ext_cut_spans lesson). */
  def canonicalSql(u: String): String = {
    val scheme = s"lower(regexp_extract($u, '$SchemeRe', 1))"
    val auth = s"lower(regexp_extract($u, '$AuthRe', 1))"
    val port = s"regexp_extract($auth, ':([0-9]+)$$', 1)"
    val h = s"regexp_replace(regexp_replace($auth, ':[0-9]+$$', ''), '^www\\.', '')"
    val portSuffix =
      s"""CASE WHEN $port = '' OR ($scheme = 'http' AND $port = '80')
         |       OR ($scheme = 'https' AND $port = '443')
         |  THEN '' ELSE ':' || $port END""".stripMargin
    // DuckDB regexp_replace is first-match-only without 'g' (Spark replaces
    // all) — the slash collapse needs the flag; the anchored rules don't
    val path =
      s"regexp_replace(regexp_replace(regexp_extract($u, '$PathRe', 1), '/+', '/', 'g'), '/$$', '')"
    val qs =
      s"""coalesce(array_to_string(list_sort(list_filter(
         |  string_split(regexp_extract($u, '\\?([^#]*)', 1), '&'),
         |  p -> p <> '' AND p NOT LIKE 'utm_%'
         |       AND split_part(p, '=', 1) NOT IN $trackingInList)), '&'), '')""".stripMargin
    s"""$scheme || '://' || $h || $portSuffix || $path ||
       |  (CASE WHEN ($qs) = '' THEN '' ELSE '?' || ($qs) END)""".stripMargin
  }

  /** Freshness-driven recrawl priority (the Cho–Garcia-Molina posture,
    * integer-exact): per key, the expected number of MISSED changes —
    * observed change rate (n_changes over the key's observation span)
    * times the current staleness (time since the key's last observation,
    * against the data's own max time, never the wall clock) — in ppm:
    *
    *   priority_ppm = (n_changes · age · 10⁶) div span
    *
    * computed as ONE decimal(38,0) product before the single truncating
    * division, so fine-grained time units can't zero it (a per-factor
    * "rate_ppm" would truncate to 0 whenever span > 10⁶·changes — with
    * µs timestamps that is EVERY key). High priority = changes often AND
    * hasn't been visited lately; a key observed once (zero span) has no
    * measurable rate and priority 0 — recrawl it on the discovery
    * schedule, not the freshness one.
    *
    * Scale shape: one partial-agg pass over the history + a broadcast
    * one-row data-max side — the history table never shuffles twice. */
  def recrawlPriority(
      history: DataFrame,
      keyCol: String,
      tsCol: String, // integer time units
      changed: Column // boolean: this observation saw a change
  ): DataFrame = {
    val obs = history
      .where(col(keyCol).isNotNull && col(tsCol).isNotNull)
    val agg = obs.groupBy(col(keyCol)).agg(
      count(lit(1)).as("n_obs"),
      sum(changed.cast("long")).as("n_changes"),
      min(col(tsCol)).as("__first"),
      max(col(tsCol)).as("__last"))
    val now = obs.agg(max(col(tsCol)).as("__now"))
    agg.crossJoin(broadcast(now))
      .withColumn("span", col("__last") - col("__first"))
      .withColumn("age", col("__now") - col("__last"))
      .withColumn("priority_ppm",
        when(col("span") === 0, lit(0L))
          .otherwise(expr(
            """cast((cast(n_changes as decimal(38,0)) * age * 1000000)
              |div span as bigint)""".stripMargin)))
      .select(col(keyCol), col("n_obs"), col("n_changes"), col("span"),
        col("age"), col("priority_ppm"))
  }
}
