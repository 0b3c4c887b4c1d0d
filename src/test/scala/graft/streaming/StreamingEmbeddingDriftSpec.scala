package graft.streaming

import graft.SparkSpec
import graft.table.TableStore
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Embedding-drift ingest gate: a micro-batch whose per-key centroid
  * geometry rotates away from the frozen reference is quarantined whole;
  * aligned batches land. Catches the re-embed/model-mixup failure the
  * token-histogram JS monitor cannot see. */
class StreamingEmbeddingDriftSpec extends SparkSpec {

  private val schema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("label",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("embedding",
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType))))

  test("aligned batch lands; rotated batch and all-novel-key batch quarantine") {
    import spark.implicits._
    val work = Files.createTempDirectory("graft_sedrift")
    val src = work.resolve("src"); Files.createDirectories(src)
    val store = new TableStore(spark, work.resolve("store").toString)
    val ckpt = work.resolve("ckpt").toString

    // reference geometry: label x points +x, label y points +y
    val ref = Seq(
      ("x", Seq(1f, 0f, 0f)), ("x", Seq(1f, 0.1f, 0f)),
      ("y", Seq(0f, 1f, 0f)), ("y", Seq(0f, 1f, 0.1f)))
      .toDF("label", "embedding")
      .select(col("label"), col("embedding").cast("array<float>").as("embedding"))
    val refCentroids = graft.ext.Drift
      .quantizedCentroids(ref, "embedding", "label", nDims = 3, p = "ref")
      .localCheckpoint(true)

    def write(name: String, rows: (String, Seq[Float])*): Unit = {
      Files.writeString(src.resolve(name),
        rows.map { case (l, v) =>
          s"""{"label":"$l","embedding":[${v.mkString(",")}]}"""
        }.mkString("", "\n", "\n"))
      ()
    }
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    def ingest(): Unit = StreamingIngest.embeddingDriftMonitorIngestAvailableNow(
      spark, src.toString, schema, store, "vectors", ckpt,
      "embedding", "label", nDims = 3, refCentroids, minCosine = 0.9,
      onBatch = (b, k, c) => seen.synchronized { seen += ((b, k, c)); () })

    write("f0.json", "x" -> Seq(1f, 0.05f, 0f), "y" -> Seq(0.05f, 1f, 0f))
    ingest()
    assert(store.exists("vectors") && store.scan("vectors").count() == 2,
      "aligned batch must land")

    // re-encoded batch: label y's vectors now point +z — geometry rotated
    write("f1.json", "x" -> Seq(1f, 0f, 0f), "y" -> Seq(0f, 0f, 1f))
    // batch of only unseen labels: nothing to compare — conservative reject
    write("f2.json", "zz" -> Seq(1f, 1f, 1f))
    ingest()
    assert(store.scan("vectors").count() == 2,
      "rotated and novel-key batches must both quarantine")
    val verdicts = seen.sortBy(_._1).toList
    assert(verdicts.head._3 > 0.9, s"$verdicts")
    assert(verdicts(1)._3 < 0.9, s"rotated batch min-cos must alarm: $verdicts")
    assert(verdicts(2)._2 == 0L && verdicts(2)._3.isNaN, s"$verdicts")
  }
}
