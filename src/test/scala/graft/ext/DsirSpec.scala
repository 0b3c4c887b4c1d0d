package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DSIR importance resampling: feature-stream shape, hand-computed
  * log-likelihood-ratio weights, target-affinity ordering, and the
  * deterministic Gumbel top-k selection contract. */
class DsirSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  test("featureBuckets: one bucket per unigram + bigram occurrence, in range") {
    val df = Seq((1L, "a b c"), (2L, "a"), (3L, ""), (4L, "  ")).toDF("doc_id", "text")
    val rows = df.select(col("doc_id"),
      Dsir.featureBuckets(col("text"), 97).as("f")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(rows(1L).length == 5, "3 unigrams + 2 bigrams") // a b c, a b, b c
    assert(rows(2L).length == 1, "single token has no bigram")
    assert(rows(3L).isEmpty && rows(4L).isEmpty, "empty docs yield no features")
    assert(rows.values.flatten.forall(b => b >= 0 && b < 97))
  }

  test("hand-computed weight: repeated target n-grams raise logw, off-target lower it") {
    // distinct-token texts so every n-gram hits its own count (bucket
    // collisions at B=10000 are possible but astronomically unlikely for
    // this 6-gram vocabulary; the assert below would catch one anyway)
    val target = Seq((1L, "aa bb"), (2L, "aa bb")).toDF("doc_id", "text")
    val raw = Seq((10L, "aa bb"), (11L, "xx yy")).toDF("doc_id", "text")
    val out = Dsir.importanceWeights(raw, target, "text", "doc_id",
      buckets = 10000, alpha = 0.01).orderBy("doc_id").collect()
    // target counts: aa:2 bb:2 "aa bb":2, Ct=6; raw counts: each of
    // aa bb "aa bb" xx yy "xx yy" once, Cr=6; B=10000, α=0.01, α·B=100
    def lr(ct: Long, cr: Long): Long =
      BigDecimal(math.log((ct + 0.01) / 106.0) - math.log((cr + 0.01) / 106.0))
        .*(BigDecimal(Dsir.LrScale))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val w10 = out.find(_.getLong(0) == 10L).get
    val w11 = out.find(_.getLong(0) == 11L).get
    assert(w10.getLong(1) == 3 && w11.getLong(1) == 3, "n_feat = 2L-1 = 3")
    assert(w10.getLong(2) == 3 * lr(2, 1), s"on-target doc: ${w10.getLong(2)}")
    assert(w11.getLong(2) == 3 * lr(0, 1), s"off-target doc: ${w11.getLong(2)}")
    assert(w10.getLong(2) > w11.getLong(2), "target-like doc must outweigh")
  }

  test("resample: exactly k rows, deterministic, and target-tilted") {
    val target = (0 until 50).map(i => (i.toLong, "the cat sat on the mat"))
      .toDF("doc_id", "text")
    val raw = ((0 until 60).map(i => (100L + i, "the cat sat on the mat")) ++
      (0 until 60).map(i => (200L + i, "zq xv qq ww ee rr"))).toDF("doc_id", "text")
    val sel = Dsir.resample(raw, target, "text", "doc_id", k = 40,
      buckets = 1000, alpha = 0.01)
    val ids = sel.select("doc_id").as[Long].collect().toSet
    assert(ids.size == 40)
    assert(ids.forall(id => id >= 100L && id < 260L), "selected ⊆ raw")
    // importance weights dominate the Gumbel noise here (the two groups'
    // logw differ by thousands of nats) → the on-target group wins
    assert(ids.forall(_ < 200L), s"all selected docs must be on-target: $ids")
    val again = Dsir.resample(raw, target, "text", "doc_id", k = 40,
      buckets = 1000, alpha = 0.01).select("doc_id").as[Long].collect().toSet
    assert(again == ids, "selection is a pure function of (corpus, salt)")
    // a different salt redraws the noise but keeps the k-row contract
    val other = Dsir.resample(raw, target, "text", "doc_id", k = 40,
      buckets = 1000, alpha = 0.01, salt = "other")
      .select("doc_id").as[Long].collect().toSet
    assert(other.size == 40)
  }
}
