package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Markdown → text extraction: rule order (fences → inline code →
  * images → links → structure → emphasis), link harvesting, and the
  * no-shuffle guarantee. */
class MarkdownSpec extends SparkSpec {

  private def run(md: String): String = {
    import spark.implicits._
    Seq(md).toDF("m").select(Markdown.extractText(col("m")))
      .head().getString(0)
  }

  test("code fences drop with payloads; inline code keeps content") {
    assert(run("before\n```scala\nval x = **not bold**\n```\nafter") ==
      "before after")
    assert(run("use `foo()` here") == "use foo() here")
    // a fenced [x](y) is code, not a link target
    import spark.implicits._
    val links = Seq("```\n[x](y)\n```\n[real](/r)").toDF("m")
      .select(Markdown.extractLinks(col("m"))).head().getSeq[String](0)
    assert(links == Seq("/r"))
  }

  test("images resolve to alt text, links to their text, targets harvested") {
    assert(run("see ![diagram](http://i/x.png) and [docs](http://d)") ==
      "see diagram and docs")
    import spark.implicits._
    val links = Seq("![a](/img) mid [b](/one) [c](/two)").toDF("m")
      .select(Markdown.extractLinks(col("m"))).head().getSeq[String](0)
    assert(links == Seq("/img", "/one", "/two"))
  }

  test("headers, quotes, lists, rules strip; emphasis unwraps in pair order") {
    assert(run("# Title\nbody") == "Title body")
    assert(run("> quoted\nplain") == "quoted plain")
    assert(run("- one\n- two\n1. three") == "one two three")
    assert(run("a\n---\nb") == "a b")
    assert(run("**bold** and *ital* and __b2__ and _i2_") ==
      "bold and ital and b2 and i2")
    // double-emphasis must not degrade into empty single pairs
    assert(run("**x**") == "x")
    // mid-word underscores survive (snake_case is not emphasis)
    assert(run("a snake_case_name here") == "a snake_case_name here")
  }

  test("extract() produces text_clean, links, n_links without shuffling") {
    import spark.implicits._
    val df = Seq((1L, "# T\n[l](/x) body")).toDF("doc_id", "md")
    val out = Markdown.extract(df, "md")
    val r = out.head()
    assert(r.getAs[String]("text_clean") == "T l body")
    assert(r.getAs[Long]("n_links") == 1L)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "per-row extraction must not shuffle")
  }
}
