package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** saltedJoin == plain inner join, exactly, on a skewed fixture — plus the
  * plan fact: the join key carries the salt. */
class SkewSpec extends SparkSpec {

  private def fact = spark.createDataFrame(
    java.util.List.of(
      (1 to 40).map(i => Row(i.toLong, "hot", i * 1.0)) ++
        Seq(Row(100L, "cold", 5.0), Row(101L, "orphan", 9.0)): _*),
    StructType(Seq(StructField("id", LongType), StructField("k", StringType),
      StructField("v", DoubleType))))

  private def dim = spark.createDataFrame(
    java.util.List.of(Row("hot", 10L), Row("cold", 20L), Row("unused", 30L)),
    StructType(Seq(StructField("k", StringType), StructField("w", LongType))))

  test("saltedJoin reproduces the plain inner join exactly") {
    val plain = fact.join(dim, "k")
      .select("id", "k", "v", "w").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
      .toSet
    val salted = Skew.saltedJoin(fact, dim, "k", buckets = 7,
        saltFrom = Seq(col("id")))
      .select("id", "k", "v", "w").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
      .toSet
    assert(salted == plain, "salting must not change inner-join semantics")
    assert(plain.size == 41, "hot 40 + cold 1; orphan and unused drop")
    // buckets = 1 degenerates to the plain join too
    val one = Skew.saltedJoin(fact, dim, "k", buckets = 1,
      saltFrom = Seq(col("id"))).count()
    assert(one == 41L)
  }

  test("skewSplitJoin == plain join; hot and cold legs partition the fact") {
    val plain = fact.join(dim, "k")
      .select("id", "k", "v", "w").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
      .toSet
    val split = Skew.skewSplitJoin(fact, dim, "k", hotKeys = Seq("hot"),
        buckets = 5, saltFrom = Seq(col("id")))
      .select("id", "k", "v", "w").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
      .toSet
    assert(split == plain)
    // a hot list naming a key with no fact rows is harmless
    val extra = Skew.skewSplitJoin(fact, dim, "k",
      hotKeys = Seq("hot", "unused"), buckets = 5, saltFrom = Seq(col("id")))
    assert(extra.count() == plain.size)
    intercept[IllegalArgumentException] {
      Skew.skewSplitJoin(fact, dim, "k", Nil, 5, Seq(col("id")))
    }
  }

  test("the join runs on (key, salt): every hot key splits across buckets") {
    val salted = fact.withColumn("__salt", Skew.salt(7, Seq(col("id"))))
    val spread = salted.where(col("k") === "hot")
      .select(countDistinct(col("__salt"))).first().getLong(0)
    assert(spread >= 5, s"40 hot rows over 7 buckets must spread: $spread")
    val p = Skew.saltedJoin(fact, dim, "k", buckets = 7,
      saltFrom = Seq(col("id"))).queryExecution.optimizedPlan.toString
    assert(p.contains("__salt"), s"salt must reach the join keys:\n$p")
  }
}
