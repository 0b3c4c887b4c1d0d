package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Blocked fuzzy linkage: value agreement with the naive in-block
  * levenshtein join, deterministic best-match tie-breaks, and the
  * fail-fast guard on degenerate blocking. */
class FuzzyJoinSpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    val clean = Seq(
      (1L, "red widget", "red"),
      (2L, "red widgets", "red"),
      (3L, "red gadget", "red"),
      (4L, "blue bolt", "blue"),
      (5L, "blue belt", "blue"),
      (6L, "green gear", "green")
    ).toDF("rid", "name", "blk")
    val dirty = Seq(
      (101L, "red widge", "red"), // deletion of clean 1 (dist 1), 2 (dist 2)
      (102L, "blue blt", "blue"), // deletion of 4 (dist 1), 5 (dist 2)
      (103L, "green gain", "green"), // dist 3 to 6 → no match at maxDist 2
      (104L, "red gadget", "red"), // exact (dist 0)
      (105L, "blue bolt", "grey") // right block empty → no candidates
    ).toDF("rid", "name", "blk")
    (clean, dirty)
  }

  test("pairs match the naive in-block levenshtein join") {
    val (clean, dirty) = fixture
    val got = FuzzyJoin.blockedPairs(dirty, clean, "rid", "name", "blk", 2)
      .select("l_id", "r_id", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = dirty.select(col("blk"), col("rid").as("l_id"), col("name").as("ln"))
      .join(clean.select(col("blk"), col("rid").as("r_id"), col("name").as("rn")), "blk")
      .withColumn("dist", levenshtein(col("ln"), col("rn")))
      .where(col("dist") <= 2)
      .select("l_id", "r_id", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == want)
    assert(got.contains((101L, 1L, 1)) && got.contains((101L, 2L, 2)))
    assert(!got.exists(_._1 == 103L) && !got.exists(_._1 == 105L))
  }

  test("bestMatch keeps lowest distance, then lowest r_id") {
    val (clean, dirty) = fixture
    val best = FuzzyJoin.bestMatch(dirty, clean, "rid", "name", "blk", 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(best == Map(
      101L -> (1L, 1), // dist 1 beats dist 2
      102L -> (4L, 1),
      104L -> (3L, 0)))
    // equal-distance tie: two clean rows at dist 1 → lowest r_id wins
    import spark.implicits._
    val tieClean = Seq((7L, "ax", "a"), (8L, "ay", "a")).toDF("rid", "name", "blk")
    val tieDirty = Seq((201L, "az", "a")).toDF("rid", "name", "blk")
    val tie = FuzzyJoin.bestMatch(tieDirty, tieClean, "rid", "name", "blk", 2)
      .collect()
    assert(tie.length == 1 && tie.head.getLong(1) == 7L && tie.head.getInt(2) == 1)
  }

  test("fail-fast guard refuses a block past maxBlockPairs") {
    import spark.implicits._
    val side = (1L to 40L).map(i => (i, s"name$i", "hot")).toDF("rid", "name", "blk")
    val e = intercept[Exception] {
      FuzzyJoin.blockedPairs(side, side, "rid", "name", "blk", 2,
        maxBlockPairs = 100L).count()
    }
    assert(e.getMessage.contains("refine the blocking key") ||
      Option(e.getCause).exists(_.getMessage.contains("refine the blocking key")))
  }

  test("threshold form excludes pairs beyond maxDist exactly at the bound") {
    import spark.implicits._
    val clean = Seq((1L, "abcdef", "b")).toDF("rid", "name", "blk")
    val dirty = Seq(
      (11L, "abcdxy", "b"), // dist 2 — kept at maxDist 2
      (12L, "abxyzw", "b") // dist 4 — dropped
    ).toDF("rid", "name", "blk")
    val got = FuzzyJoin.blockedPairs(dirty, clean, "rid", "name", "blk", 2)
      .select("l_id", "dist").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got == Set((11L, 2)))
  }
}
