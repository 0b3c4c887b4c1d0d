package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Seeded k-means codebook: deterministic across runs, measurably better
  * quantization than the lowest-id placeholder, and pluggable into IVF. */
class KMeansSpec extends SparkSpec {

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select("vec_id", "embedding")

  /** Mean best-cosine of every vector to its nearest codebook cell —
    * higher = tighter quantization. */
  private def quantQuality(codebook: DataFrame): Double = {
    val cells = codebook.withColumn("cell_norm", Similarity.normDecimal(col("cell_vec")))
    emb.withColumn("norm", Similarity.normDecimal(col("embedding")))
      .crossJoin(broadcast(cells))
      .withColumn("cos", Similarity.dotDecimal(col("embedding"), col("cell_vec")) /
        (col("norm") * col("cell_norm")))
      .groupBy("vec_id").agg(max(col("cos")).as("best"))
      .agg(avg("best")).head().getDouble(0)
  }

  test("training is deterministic: identical codebook on repeated runs") {
    def run() = Similarity.kmeansCodebook(emb, "embedding", "vec_id", nCells = 8, dim = 64)
      .orderBy("cell_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toList)).toSeq
    assert(run() == run())
  }

  test("3 Lloyd iterations beat the lowest-id placeholder codebook") {
    val naive = emb.orderBy(col("vec_id").asc).limit(8)
      .select(col("vec_id").as("cell_id"), col("embedding").as("cell_vec"))
    val trained = Similarity.kmeansCodebook(emb, "embedding", "vec_id", nCells = 8, dim = 64)
    val qNaive = quantQuality(naive)
    val qTrained = quantQuality(trained)
    assert(qTrained > qNaive,
      f"k-means must tighten quantization: naive=$qNaive%.4f trained=$qTrained%.4f")
  }

  test("semDedup: planted semantic duplicate dropped, lower-id original kept") {
    val base = emb.where(col("vec_id") < 200)
    // exact duplicate of vec_id=3 under a higher id — same cluster, cos=1
    val dup = base.where(col("vec_id") === 3)
      .select(lit(100000L).as("vec_id"), col("embedding"))
    val out = Similarity.semDedup(base.unionByName(dup),
      "embedding", "vec_id", nCells = 8, threshold = 0.999)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out.size == 201, "one flag per input row, dropped rows included")
    assert(out(3L), "the lower-id original survives")
    assert(!out(100000L), "the higher-id duplicate is dropped")
    // threshold no pair reaches → everything kept
    val all = Similarity.semDedup(base, "embedding", "vec_id",
      nCells = 8, threshold = 1.1).collect()
    assert(all.forall(_.getBoolean(2)))
  }

  test("semDedup accepts a trained codebook and stays deterministic") {
    val trained = Similarity.kmeansCodebook(emb, "embedding", "vec_id", nCells = 8, dim = 64)
    def run() = Similarity.semDedup(emb, "embedding", "vec_id",
      nCells = 8, threshold = 0.2, codebook = Some(trained))
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    val a = run()
    assert(a == run(), "same codebook, same flags")
    assert(a.exists(!_._3), "threshold 0.2 must drop something in this corpus")
  }

  test("semDedup skew guard fails fast on a degenerate clustering") {
    val e = intercept[Exception] {
      Similarity.semDedup(emb.where(col("vec_id") < 50), "embedding", "vec_id",
        nCells = 2, threshold = 0.9, maxClusterSize = 10L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("graft.semDedup")),
      s"guard message must surface: ${msgs(e)}")
  }

  test("ivfTopK accepts a trained codebook and still finds the planted duplicate") {
    val trained = Similarity.kmeansCodebook(emb, "embedding", "vec_id", nCells = 8, dim = 64)
    // plant an exact duplicate of vec_id=3 under a new id
    val dup = emb.where(col("vec_id") === 3)
      .select(lit(100000L).as("vec_id"), col("embedding"))
    val corpus = emb.unionByName(dup)
    val out = Similarity.ivfTopK(corpus, dup, "embedding", "vec_id",
      k = 3, nCells = 8, nProbe = 3, codebook = Some(trained))
      .orderBy("rank").collect()
    assert(out.nonEmpty)
    assert(out(0).getLong(1) == 3L, "exact duplicate must rank first")
    assert(math.abs(out(0).getDouble(3) - 1.0) < 1e-9)
  }

  test("clusterQuality: populations total the corpus; dead cells surface with n=0") {
    val corpus = emb.where(col("vec_id") < 300)
    val book = Similarity.kmeansCodebook(corpus, "embedding", "vec_id",
      nCells = 8, dim = 64, iterations = 2)
    val rows = Similarity.clusterQuality(corpus, "embedding", "vec_id", book)
      .orderBy("cell_id").collect()
    assert(rows.length == 8, "one row per codebook cell, dead cells included")
    assert(rows.map(_.getLong(1)).sum == 300L, "every vector assigned exactly once")
    for (r <- rows if r.getLong(1) > 0) {
      val n = r.getLong(1); val sum = r.getLong(2); val mn = r.getLong(3)
      assert(mn <= sum / n, s"min can't beat mean: $r")
      assert(sum <= n * 10000000L && mn >= -10000000L, s"cos_q out of [-1e7,1e7]: $r")
    }
    // a far-away synthetic cell must be dead: n=0, null stats
    val far = spark.range(1).select(lit(999L).as("cell_id"),
      array((0 until 64).map(i => lit(if (i == 0) -1f else 0f)): _*)
        .cast("array<float>").as("cell_vec"))
    val withDead = Similarity.clusterQuality(corpus, "embedding", "vec_id",
      book.unionByName(far)).where(col("cell_id") === 999L).collect()
    // dead only if nothing points toward -x; either way the row exists
    assert(withDead.length == 1)
  }
}
