package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Product quantization: encode/ADC invariants and trained-codebook
  * quality. The cross-engine value check lives in the `ext_pq_topk`
  * oracle gate; these specs pin the algebra the gate can't see. */
class PQSpec extends SparkSpec {

  private val m = 4
  private val dim = 16
  private val ksub = 8

  private def vecs(n: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    (0 until n).map { i =>
      (i.toLong, Seq.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat))
    }.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
  }

  test("pqEncode: m codes in range, deterministic across partitioning") {
    val corpus = vecs(200)
    val cb = Similarity.pqCodebook(corpus, "embedding", "vec_id", m, ksub, dim)
    val enc = Similarity.pqEncode(corpus, "embedding", "vec_id", cb, m, dim)
      .collect().map(r => r.getLong(0) -> ((r.getSeq[Int](1), r.getDouble(2)))).toMap
    assert(enc.size == 200)
    enc.values.foreach { case (codes, rn) =>
      assert(codes.length == m && codes.forall(c => c >= 0 && c < ksub))
      assert(rn > 0.0)
    }
    val enc2 = Similarity.pqEncode(corpus.repartition(13), "embedding", "vec_id",
      cb, m, dim)
      .collect().map(r => r.getLong(0) -> ((r.getSeq[Int](1), r.getDouble(2)))).toMap
    assert(enc2 == enc, "codes must not depend on partitioning")
  }

  test("pqTopK score == exact cosine against the reconstruction") {
    val corpus = vecs(120)
    val cb = Similarity.pqCodebook(corpus, "embedding", "vec_id", m, ksub, dim)
    val book = cb.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Float](2).toArray).toMap
    val enc = Similarity.pqEncode(corpus, "embedding", "vec_id", cb, m, dim)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val raw = corpus.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val got = Similarity.pqTopK(corpus, corpus.where(col("vec_id") < 3),
      "embedding", "vec_id", k = 4, m, ksub, dim)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(got.nonEmpty && got.length == 3 * 4)
    def scaledDot(a: Array[Float], b: Array[Float]): Long =
      a.zip(b).map { case (x, y) =>
        math.round(x.toDouble * y.toDouble * 1e15)
      }.sum
    got.foreach { case (qId, cId, _, cosine) =>
      val recon = enc(cId).zipWithIndex.flatMap { case (code, b) => book((b, code)) }.toArray
      val q = raw(qId)
      // the reference runs the same exact scaled-int algebra by hand
      val sd = (0 until m).map { b =>
        scaledDot(q.slice(b * dim / m, (b + 1) * dim / m), book((b, enc(cId)(b))))
      }.sum
      val qNorm = math.sqrt(scaledDot(q, q).toDouble / 1e15)
      val rNorm = math.sqrt(scaledDot(recon, recon).toDouble / 1e15)
      val want = sd.toDouble / 1e15 / (qNorm * rNorm)
      assert(math.abs(cosine - want) < 1e-12,
        s"ADC score must equal reconstruction cosine: $cosine vs $want")
    }
  }

  test("ivfPqTopK with nProbe = nCells equals the unrestricted pqTopK") {
    // probing every cell removes the IVF restriction entirely — the
    // composed operator must then reproduce pqTopK's ranking exactly
    // (same codes, same ADC sums, same tiebreaks)
    val corpus = vecs(150)
    val queries = corpus.where(col("vec_id") < 3)
    val full = Similarity.pqTopK(corpus, queries, "embedding", "vec_id",
      k = 5, m, ksub, dim)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val composed = Similarity.ivfPqTopK(corpus, queries, "embedding", "vec_id",
      k = 5, nCells = 8, nProbe = 8, m = m, ksub = ksub, dim = dim)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(composed == full,
      s"all-cells probe must equal unrestricted PQ search:\n$composed\nvs\n$full")
  }

  test("ivfPqTopK candidates never leave the probed cells") {
    val corpus = vecs(200)
    val queries = corpus.where(col("vec_id") < 4)
    val nCells = 8; val nProbe = 2
    val cells = Similarity.assignCells(corpus, "embedding", "vec_id", nCells)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val out = Similarity.ivfPqTopK(corpus, queries, "embedding", "vec_id",
      k = 10, nCells = nCells, nProbe = nProbe, m = m, ksub = ksub, dim = dim)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // every returned candidate must live in one of its query's probed
    // cells — at nProbe=2 of 8 that is a strict subset of the corpus
    val probed = out.groupBy(_._1).map { case (q, rows) =>
      q -> rows.map(p => cells(p._2)).toSet
    }
    probed.foreach { case (q, cellSet) =>
      assert(cellSet.size <= nProbe,
        s"query $q drew candidates from ${cellSet.size} cells (> $nProbe)")
    }
  }

  test("trained codebook quantizes no worse than the placeholder") {
    val corpus = vecs(300)
    def meanErr(cb: org.apache.spark.sql.DataFrame): Double = {
      val book = cb.collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Float](2).toArray).toMap
      val enc = Similarity.pqEncode(corpus, "embedding", "vec_id", cb, m, dim)
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      val raw = corpus.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
      raw.map { case (id, v) =>
        val recon = enc(id).zipWithIndex.flatMap { case (code, b) => book((b, code)) }.toArray
        math.sqrt(v.zip(recon).map { case (x, y) =>
          (x - y).toDouble * (x - y).toDouble
        }.sum)
      }.sum / raw.size
    }
    val placeholder = meanErr(
      Similarity.pqCodebook(corpus, "embedding", "vec_id", m, ksub, dim))
    val trained = meanErr(
      Similarity.pqCodebookTrained(corpus, "embedding", "vec_id", m, ksub, dim, 3))
    assert(trained <= placeholder + 1e-9,
      s"k-means training must not hurt quantization: $trained vs $placeholder")
    // and training actually moves the centroids on this corpus
    assert(trained < placeholder, "training should improve a random corpus")
  }
}
