package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HTML → text extraction: rule order, entity decode edge cases, link
  * extraction, and injection behavior (decoded markup is NOT re-stripped). */
class HtmlSpec extends SparkSpec {

  private def run(html: String): String = {
    import spark.implicits._
    Seq(html).toDF("h").select(Html.extractText(col("h"))).head().getString(0)
  }

  test("scripts and styles drop with their payloads, tags become spaces") {
    assert(run("<p>a</p><p>b</p>") == "a b")
    assert(run("<script>var x = '<p>not text</p>';</script>hi") == "hi")
    assert(run("<style>p { color: red }</style>body") == "body")
    // multi-line script payload (dotall), attributes on the tag
    assert(run("<script type=\"text/javascript\">\nline1\nline2\n</script>ok") == "ok")
  }

  test("entity decode order: &amp;lt; stays literal, no double decode") {
    assert(run("Tom &amp; Jerry") == "Tom & Jerry")
    assert(run("&amp;lt;") == "&lt;") // NOT "<"
    assert(run("&lt;b&gt;") == "<b>") // decoded after stripping: stays text
    assert(run("a&nbsp;&nbsp;b") == "a b") // nbsp joins the ws collapse
    assert(run("&quot;q&quot; &#39;s") == "\"q\" 's")
  }

  test("whitespace collapses and trims across tag boundaries") {
    assert(run("  <p>\n  a\t\tb  </p>\n ") == "a b")
  }

  test("links extract in document order; pages without links give empty") {
    import spark.implicits._
    val html = "<a href=\"/one\">1</a><p>x</p><a href=\"https://two\">2</a>" +
      "<a href='/single-quoted-skipped'>3</a>"
    val row = Seq(html).toDF("h")
    val links = row.select(Html.extractLinks(col("h"))).head().getSeq[String](0)
    assert(links == Seq("/one", "https://two"))
    val none = Seq("<p>no links</p>").toDF("h")
      .select(Html.extractLinks(col("h"))).head().getSeq[String](0)
    assert(none.isEmpty)
  }

  test("extract() produces text_clean, links, n_links without shuffling") {
    import spark.implicits._
    val df = Seq((1L, "<p>hi</p><a href=\"/x\">l</a>")).toDF("doc_id", "html")
    val out = Html.extract(df, "html")
    assert(out.columns.toSeq ==
      Seq("doc_id", "html", "text_clean", "links", "n_links"))
    val r = out.head()
    assert(r.getAs[String]("text_clean") == "hi l")
    assert(r.getAs[Long]("n_links") == 1L)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "per-row extraction must not shuffle")
  }
}
