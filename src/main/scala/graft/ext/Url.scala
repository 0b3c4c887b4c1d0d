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

  // ---- DuckDB SQL mirrors (oracle generation — same constants) ----------

  private def trackingInList: String =
    TrackingParams.map(p => s"'$p'").mkString("(", ", ", ")")

  /** SQL fragment: lowercased no-port no-www host of the URL expression. */
  def hostSql(u: String): String =
    s"regexp_replace(regexp_replace(lower(regexp_extract($u, '$AuthRe', 1)), ':[0-9]+$$', ''), '^www\\.', '')"

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
}
