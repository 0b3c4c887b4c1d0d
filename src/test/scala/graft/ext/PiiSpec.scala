package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PII pseudonymization: validity gates (Luhn, octet range), token
  * determinism and referential integrity, pass precedence, and the
  * signals report. 4111-1111-1111-1111 is the canonical PUBLIC test
  * PAN; 203.0.113.x is TEST-NET-3; +1-415-555-01xx is the reserved
  * fictional phone range — no real PII appears in this spec. */
class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def run(text: String, salt: String = ""): String =
    Pii.pseudonymize(Seq((1L, text)).toDF("id", "text"), "text", salt)
      .select("pii_text").first().getString(0)

  test("luhn gate: valid card tokenized, checksum-failing run untouched") {
    val out = run("pay 4111 1111 1111 1111 or 4111-1111-1111-1112 now")
    assert(out.contains("<CARD:"), out)
    assert(out.contains("4111-1111-1111-1112"), out)
    assert(!out.contains("4111 1111 1111 1111"), out)
  }

  test("octet gate: real IP tokenized, 999.1.2.3 untouched") {
    val out = run("from 203.0.113.7 not 999.1.2.3")
    assert(out.contains("<IP:") && out.contains("999.1.2.3")
      && !out.contains("203.0.113.7"), out)
  }

  test("tokens are deterministic and value-keyed (referential integrity)") {
    val a = run("mail A@Example.com and a@example.COM")
    // same email up to case -> same token, exactly one distinct token
    val toks = "<EMAIL:[0-9a-f]{8}>".r.findAllIn(a).toSeq
    assert(toks.size == 2 && toks.distinct.size == 1, a)
    // separators don't change the card token (digits-only normalization)
    val b = run("4111 1111 1111 1111 vs 4111-1111-1111-1111")
    val ctoks = "<CARD:[0-9a-f]{8}>".r.findAllIn(b).toSeq
    assert(ctoks.size == 2 && ctoks.distinct.size == 1, b)
    // salt keys the mapping
    assert(run("x a@b.com", "s1") != run("x a@b.com", "s2"))
  }

  test("precedence: +-prefixed 13-digit run is a phone, not a card") {
    val out = run("call +4111111111111 ok")
    assert(out.contains("<PHONE:") && !out.contains("<CARD:"), out)
  }

  test("edge positions and no-match text rebuild exactly") {
    assert(run("no pii here at all") == "no pii here at all")
    assert(run("a@b.cd").matches("<EMAIL:[0-9a-f]{8}>"))
    val out = run("a@b.cd mid x@y.zw")
    assert(out.matches("<EMAIL:[0-9a-f]{8}> mid <EMAIL:[0-9a-f]{8}>"), out)
    assert(run("") == "")
  }

  test("signals: per-category valid counts on the original text") {
    val df = Seq(
      (1L, "a@b.cd c@d.ef +12345678 203.0.113.7 999.9.9.9 " +
        "4111 1111 1111 1111 4111-1111-1111-1112")).toDF("id", "text")
    val r = Pii.signals(df, "text")
      .select("n_email", "n_phone", "n_ip", "n_card").first()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      == ((2L, 1L, 1L, 1L)), r)
  }

  test("luhn matches an independent implementation on random digit runs") {
    def refLuhn(digits: String): Boolean = {
      val s = digits.reverse.zipWithIndex.map { case (c, i) =>
        val v = c - '0'
        if (i % 2 == 1) { val d = v * 2; if (d > 9) d - 9 else d } else v
      }.sum
      s % 10 == 0
    }
    val rnd = new scala.util.Random(11)
    val runs = (1 to 40).map(_ =>
      (1 to (13 + rnd.nextInt(7))).map(_ => rnd.nextInt(10)).mkString)
    val df = runs.zipWithIndex.map { case (d, i) => (i.toLong, d) }
      .toDF("id", "m")
    val got = df.select(col("id"), Pii.luhnOk(col("m")).as("ok"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    runs.zipWithIndex.foreach { case (d, i) =>
      assert(got(i.toLong) == refLuhn(d), s"digits $d")
    }
  }

  test("kAnonymity: per-QI counts, k/l verdicts, null QI and sensitive") {
    import spark.implicits._
    val rows = Seq(
      // group (us, a): 3 rows, sensitive {1, 1, 2} -> 2 distinct
      (Option("us"), "a", Option(1L)), (Option("us"), "a", Option(1L)),
      (Option("us"), "a", Option(2L)),
      // group (us, b): 1 row -> k-violation
      (Option("us"), "b", Option(9L)),
      // group (de, a): 2 rows, sensitive {null, 3} -> null IS a value
      (Option("de"), "a", Option.empty[Long]), (Option("de"), "a", Option(3L)),
      // null QI cell forms its own group
      (Option.empty[String], "a", Option(7L)))
      .toDF("country", "tier", "sv")
    val got = Pii.kAnonymity(rows, Seq("country", "tier"), "sv", k = 2, l = 2)
      .collect().map(r => (Option(r.getString(0)).getOrElse("∅"), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5))).toMap
    assert(got(("us", "a")) == ((3L, 2L, true, true)))
    assert(got(("us", "b")) == ((1L, 1L, false, false)))
    assert(got(("de", "a")) == ((2L, 2L, true, true))) // null sv counted
    assert(got(("∅", "a")) == ((1L, 1L, false, false)))
    assert(got.size == 4)
    // homogeneity: k-large but sensitive-constant group fails l only
    val homo = Seq.fill(5)(("fr", "c", 1L)).toDF("country", "tier", "sv")
    val h = Pii.kAnonymity(homo, Seq("country", "tier"), "sv", k = 2, l = 2)
      .first()
    assert(h.getLong(2) == 5L && h.getLong(3) == 1L &&
      h.getBoolean(4) && !h.getBoolean(5))
  }
}
