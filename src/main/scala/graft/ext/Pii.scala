package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured PII detection and pseudonymization — the governance pass a
  * corpus runs before release. Four detectors, each with a VALIDITY gate
  * so shaped-but-not-real matches stay untouched:
  *
  *   - email     (the [[TextStats.EmailPattern]] shape)
  *   - phone     (international `+` form, 7–15 digits — E.164's bound)
  *   - ipv4      (dotted quad, every octet ≤ 255)
  *   - card      (13–19 digits with optional single space/dash
  *                separators, LUHN-CHECKED — the checksum is what
  *                separates a card number from an order id)
  *
  * Matches are replaced by DETERMINISTIC tokens
  * `<CAT:substr(md5(norm ∥ salt), 1, 8)>` (norm = lowercased email,
  * digits-only phone/card, verbatim ip): the same value maps to the same
  * token corpus-wide, so joins and frequency analyses survive redaction
  * while the value itself never leaves the engine. A non-empty salt
  * keys the mapping (unsalted md5 of a low-entropy space like phone
  * numbers is trivially reversible by enumeration).
  *
  * Every pass is pure expression work — split + regexp_extract_all +
  * one zip_with rebuild per category, Luhn as a higher-order fold over
  * the digit list — no UDF, no shuffle, and the identical RE2-compatible
  * patterns replay in the DuckDB oracle (the *Sql mirrors). Passes run
  * email → phone → ipv4 → card so the `+`-prefixed phone form wins over
  * a bare card-length digit run; emitted tokens contain no 13-digit run,
  * so later passes cannot re-match earlier tokens.
  *
  * Scale shape: one narrow projection over the corpus — embarrassingly
  * parallel, no exchange, no state. Validity gates are per-match
  * arithmetic on match-length lists. */
object Pii {

  val EmailPat: String = TextStats.EmailPattern
  val PhonePat: String = "\\+[0-9]{7,15}"
  val Ipv4Pat: String = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  /** Card shapes: 4-4-4-4 grouped, 4-6-5 grouped (Amex), or 13–19
    * contiguous digits. Deliberately NOT `\d([ -]?\d){12,18}` — that
    * form can start mid-way through adjacent numbers (e.g. the last
    * octet of a preceding IP) and the wrong greedy match then shadows
    * the real card. Alternation order is irrelevant here: the grouped
    * and contiguous arms can't match at the same position, so Java's
    * leftmost-first and RE2's leftmost-longest agree. */
  val CardPat: String =
    "\\b(?:[0-9]{4}[ -]){3}[0-9]{4}\\b|\\b[0-9]{4}[ -][0-9]{6}[ -][0-9]{5}\\b|\\b[0-9]{13,19}\\b"

  /** Luhn checksum over the digits of a matched string: doubled every
    * second digit from the right, digit-summed, total ≡ 0 (mod 10). */
  def luhnOk(m: Column): Column = {
    val rev = reverse(regexp_extract_all(m, lit("[0-9]"), lit(0)))
    val terms = transform(rev, (d, i) => {
      val v = d.cast("int")
      when(i % 2 === 1,
        when(v * 2 > 9, v * 2 - 9).otherwise(v * 2)).otherwise(v)
    })
    aggregate(terms, lit(0), (a, x) => a + x) % 10 === 0
  }

  /** Dotted-quad validity: every octet ≤ 255. */
  def ipOk(m: Column): Column =
    forall(regexp_extract_all(m, lit("[0-9]+"), lit(0)),
      o => o.cast("int") <= 255)

  private def alwaysOk(m: Column): Column = lit(true)

  /** Digits-only normalization (phone/card hashing key). */
  private def digitsOf(m: Column): Column =
    array_join(regexp_extract_all(m, lit("[0-9]"), lit(0)), "")

  private def token(cat: String, norm: Column, salt: String): Column =
    concat(lit(s"<$cat:"),
      substring(md5(concat(norm, lit(salt))), 1, 8), lit(">"))

  /** Catalyst has no let expression: binding a value as a one-element
    * transform's lambda variable evaluates it exactly once however many
    * times the body references it (the [[TextHash.shingles]] lesson —
    * without this, chained passes re-evaluate their whole prefix once
    * per reference: a 2^passes regex blowup that cost ext_pii 77 s at
    * sf0.1 before binding, ~1 s after). */
  private def bound(v: Column)(body: Column => Column): Column =
    element_at(transform(array(v), body), 1)

  /** One category pass: rebuild `text` with every VALID match replaced
    * by its token, invalid matches untouched. split yields the segments
    * between matches (one more than matches), zip_with interleaves;
    * text, segments, and matches are each let-bound to one evaluation. */
  private def replaceValid(
      text: Column, pat: String,
      tok: Column => Column, valid: Column => Column): Column =
    bound(text) { t =>
      bound(split(t, pat, -1)) { parts =>
        bound(regexp_extract_all(t, lit(pat), lit(0))) { ms =>
          concat(element_at(parts, 1),
            array_join(zip_with(ms, slice(parts, lit(2), size(ms)),
              (m, p) => concat(when(valid(m), tok(m)).otherwise(m), p)), ""))
        }
      }
    }

  /** All four passes in precedence order → `outCol`. */
  def pseudonymize(
      df: DataFrame, textCol: String,
      salt: String = "", outCol: String = "pii_text"): DataFrame = {
    val t4 =
      replaceValid(
        replaceValid(
          replaceValid(
            replaceValid(col(textCol), EmailPat,
              m => token("EMAIL", lower(m), salt), alwaysOk),
            PhonePat, m => token("PHONE", digitsOf(m), salt), alwaysOk),
          Ipv4Pat, m => token("IP", m, salt), ipOk),
        CardPat, m => token("CARD", digitsOf(m), salt), luhnOk)
    df.withColumn(outCol, t4)
  }

  /** Per-doc VALID-match counts per category, each on the ORIGINAL text
    * (independent detectors — the release-gate report): (textCol…,
    * n_email, n_phone, n_ip, n_card). */
  def signals(df: DataFrame, textCol: String): DataFrame = {
    val t0 = col(textCol)
    df
      .withColumn("n_email",
        size(regexp_extract_all(t0, lit(EmailPat), lit(0))).cast("long"))
      .withColumn("n_phone",
        size(regexp_extract_all(t0, lit(PhonePat), lit(0))).cast("long"))
      .withColumn("n_ip",
        size(filter(regexp_extract_all(t0, lit(Ipv4Pat), lit(0)),
          ipOk _)).cast("long"))
      .withColumn("n_card",
        size(filter(regexp_extract_all(t0, lit(CardPat), lit(0)),
          luhnOk _)).cast("long"))
  }

  /** k-anonymity / l-diversity audit over quasi-identifier columns — the
    * re-identification risk report a structured corpus runs before
    * release (Sweeney 2002; Machanavajjhala 2007). A row is k-anonymous
    * when ≥ k rows share its full quasi-identifier combination; a QI
    * group is l-diverse when its sensitive column takes ≥ l DISTINCT
    * values (a k-large group whose sensitive value is constant still
    * leaks it — the homogeneity attack k alone misses).
    *
    * Output: one row per QI group — (qiCols…, n_rows, n_sensitive,
    * k_ok, l_ok) with exact counts. Filter `!k_ok || !l_ok` for the
    * violation set; rows with any null QI cell group together per
    * SQL GROUP BY semantics (null is a value here — a null QI cell is
    * itself a disclosure-relevant group, not ignorable); a null
    * SENSITIVE cell likewise counts as one distinct value (the
    * two-level grouping counts it — unlike COUNT(DISTINCT), which
    * would silently call a group of all-null sensitives 0-diverse).
    *
    * Scale shape: one exchange — groupBy(qi…, sensitive) partial-aggs
    * the corpus to (group × value) cardinality, then a second
    * already-partitioned agg collapses to groups; COUNT DISTINCT is
    * exact without expansion because the first agg already deduped. */
  def kAnonymity(
      df: DataFrame,
      qiCols: Seq[String],
      sensitiveCol: String,
      k: Long,
      l: Long
  ): DataFrame = {
    require(qiCols.nonEmpty, "kAnonymity: need at least one QI column")
    require(k >= 1 && l >= 1, "kAnonymity: k and l must be >= 1")
    val qi = qiCols.map(col)
    df.groupBy(qi :+ col(sensitiveCol).as("__sv"): _*)
      .agg(count(lit(1)).as("__nv"))
      .groupBy(qi: _*)
      .agg(sum("__nv").as("n_rows"),
        count(lit(1)).as("n_sensitive"))
      .select(qi ++ Seq(col("n_rows"), col("n_sensitive"),
        (col("n_rows") >= k).as("k_ok"),
        (col("n_sensitive") >= l).as("l_ok")): _*)
  }

  // ---- DuckDB SQL mirrors (oracle generation — same patterns) ----------

  /** Literal for embedding a Java/RE2 pattern in SQL single quotes. */
  private def lq(pat: String): String = "'" + pat.replace("'", "''") + "'"

  /** Lambda var is `li`, not `i` — callers nest this inside
    * [[replaceValidSql]]'s `i` lambda and DuckDB must not shadow. */
  def luhnOkSql(m: String): String = {
    val rev = s"list_reverse(regexp_extract_all($m, '[0-9]'))"
    s"""(list_sum(list_transform(range(0, len($rev)), li ->
       |  CASE WHEN li % 2 = 1
       |    THEN CASE WHEN CAST($rev[li + 1] AS INT) * 2 > 9
       |              THEN CAST($rev[li + 1] AS INT) * 2 - 9
       |              ELSE CAST($rev[li + 1] AS INT) * 2 END
       |    ELSE CAST($rev[li + 1] AS INT) END)) % 10 = 0)""".stripMargin
  }

  def ipOkSql(m: String): String =
    s"(len(list_filter(regexp_extract_all($m, '[0-9]+'), o -> CAST(o AS INT) > 255)) = 0)"

  def digitsOfSql(m: String): String =
    s"coalesce(array_to_string(regexp_extract_all($m, '[0-9]'), ''), '')"

  def tokenSql(cat: String, norm: String, salt: String): String =
    s"('<$cat:' || substr(md5($norm || '${salt.replace("'", "''")}'), 1, 8) || '>')"

  /** SQL fragment mirroring [[replaceValid]] over a text expression. */
  def replaceValidSql(
      textE: String, pat: String, tokE: String => String,
      validE: String => String): String = {
    val parts = s"str_split_regex($textE, ${lq(pat)})"
    val ms = s"regexp_extract_all($textE, ${lq(pat)})"
    s"""($parts[1] || coalesce(array_to_string(
       |  list_transform(range(0, len($ms)), i ->
       |    (CASE WHEN ${validE(s"$ms[i + 1]")}
       |          THEN ${tokE(s"$ms[i + 1]")}
       |          ELSE $ms[i + 1] END) || $parts[i + 2]),
       |  ''), ''))""".stripMargin
  }

  /** The four passes composed for SQL (CTE-friendly single expression
    * would nest 4× — callers chain one CTE per pass instead). */
  def passSqls(salt: String): Seq[(String, String => String)] = Seq(
    ("email", (t: String) => replaceValidSql(t, EmailPat,
      m => tokenSql("EMAIL", s"lower($m)", salt), _ => "true")),
    ("phone", (t: String) => replaceValidSql(t, PhonePat,
      m => tokenSql("PHONE", digitsOfSql(m), salt), _ => "true")),
    ("ip", (t: String) => replaceValidSql(t, Ipv4Pat,
      m => tokenSql("IP", m, salt), ipOkSql)),
    ("card", (t: String) => replaceValidSql(t, CardPat,
      m => tokenSql("CARD", digitsOfSql(m), salt), luhnOkSql)))
}
