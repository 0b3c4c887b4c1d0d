package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PCA whitening: exact covariance tier + deterministic Jacobi eigensolve
  * tier (the iterative float math has no cross-engine bit contract, so it
  * is spec-proven here while [[Similarity.covarianceMatrix]] carries the
  * oracle gate — the Percentiles two-tier pattern). */
class PCASpec extends SparkSpec {

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select("vec_id", "embedding")

  test("covarianceMatrix == naive quantized reference on the first 4 dims") {
    val got = Similarity.covarianceMatrix(emb, "embedding", dim = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val rows = emb.collect().map(_.getSeq[Float](1).take(4).toArray)
    val n = rows.length.toDouble
    // Spark round() is exact BigDecimal HALF_UP; math.round is
    // floor(x+0.5), which misrounds doubles just under a boundary
    def rnd(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    for (i <- 0 until 4; j <- i until 4) {
      val sxy = rows.map(v =>
        rnd(v(i).toDouble * v(j).toDouble * 1e15)).sum.toDouble
      val sxi = rows.map(v => rnd(v(i).toDouble * 1e7)).sum.toDouble
      val sxj = rows.map(v => rnd(v(j).toDouble * 1e7)).sum.toDouble
      val want = sxy / 1e15 / n - (sxi / 1e7 / n) * (sxj / 1e7 / n)
      assert(got((i.toLong, j.toLong)) == want,
        s"cov($i,$j): ${got((i.toLong, j.toLong))} vs $want")
    }
    assert(got.size == 10, "upper triangle of a 4x4: 10 cells")
  }

  test("jacobiEigen: reconstructs the matrix, eigenvectors orthonormal") {
    val a = Array(
      Array(4.0, 1.0, 0.5),
      Array(1.0, 3.0, 0.25),
      Array(0.5, 0.25, 2.0))
    val (evals, v) = Similarity.jacobiEigen(a)
    val n = 3
    // V diag(evals) V^T == A
    for (i <- 0 until n; j <- 0 until n) {
      val recon = (0 until n).map(k => v(i)(k) * evals(k) * v(j)(k)).sum
      assert(math.abs(recon - a(i)(j)) < 1e-10, s"recon($i,$j)=$recon vs ${a(i)(j)}")
    }
    // columns orthonormal
    for (p <- 0 until n; q <- 0 until n) {
      val d = (0 until n).map(k => v(k)(p) * v(k)(q)).sum
      assert(math.abs(d - (if (p == q) 1.0 else 0.0)) < 1e-10, s"v.$p · v.$q = $d")
    }
    // trace preserved
    assert(math.abs(evals.sum - 9.0) < 1e-10)
  }

  test("pcaWhiten: deterministic, and whitened sample covariance is the identity") {
    val k = 4
    def run() = Similarity.pcaWhiten(emb, "embedding", "vec_id", dim = 8, k = k)
      .orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val a = run()
    val b = run()
    assert(a.map(_._1).sameElements(b.map(_._1)) &&
      a.zip(b).forall { case ((_, x), (_, y)) => x.sameElements(y) },
      "same corpus, same projection, bit-identical")
    // sample covariance of the whitened output ≈ I (we whitened with the
    // sample covariance itself, so this is near-exact up to float error)
    val rows = a.map(_._2)
    val n = rows.length.toDouble
    val mu = (0 until k).map(d => rows.map(_(d)).sum / n)
    for (i <- 0 until k; j <- 0 until k) {
      val c = rows.map(v => (v(i) - mu(i)) * (v(j) - mu(j))).sum / n
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(c - want) < 1e-3, s"whitened cov($i,$j) = $c, want $want")
    }
  }
}
