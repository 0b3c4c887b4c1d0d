package graft.plans

import graft.GraftSession
import graft.ext.Dsir
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native `graft_feature_buckets` kernel must be byte-identical to the
  * declarative HOF spec (`Dsir.featureBucketsHof`) — same grams, same
  * order (unigrams then bigrams), same md5-mod arithmetic — on real
  * corpus text and on the edge shapes (empty, whitespace runs, single
  * token, null). */
class FeatureBucketsNativeSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get("local[4]", 4)

  test("native == declarative on corpus text and edges") {
    import spark.implicits._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .unionByName(Seq(
        (9000001L, ""),
        (9000002L, " "),
        (9000003L, "   leading and   doubled  spaces "),
        (9000004L, "single"),
        (9000005L, "two tokens"),
        (9000006L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    for (buckets <- Seq(7, 1000)) {
      val both = docs.select(col("doc_id"),
        call_function("graft_feature_buckets", col("text"), lit(buckets)).as("nat"),
        Dsir.featureBucketsHof(col("text"), buckets).as("hof"))
      val bad = both.where(
        (col("nat").isNull =!= col("hof").isNull) ||
          (col("nat").isNotNull && col("nat") =!= col("hof")))
      assert(bad.isEmpty, s"buckets=$buckets: ${bad.count()} mismatching docs")
    }
  }
}
