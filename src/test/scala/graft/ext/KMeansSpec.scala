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
}
