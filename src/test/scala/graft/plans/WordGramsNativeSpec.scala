package graft.plans

import graft.GraftSession
import graft.ext.TextHash
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native `graft_word_grams` kernel must be byte-identical to the
  * declarative HOF spec (`TextHash.shinglesDeclarative`) — same tokens
  * (empties from doubled/trailing spaces KEPT), same space-joined
  * windows, same whole-text fallback under n tokens — on corpus text and
  * the edge shapes. */
class WordGramsNativeSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.get("local[4]", 4)

  test("native == declarative on corpus text and edges") {
    val sp = spark
    import sp.implicits._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .unionByName(Seq(
        (9000001L, ""),
        (9000002L, " "),
        (9000003L, "   leading and   doubled  spaces "),
        (9000004L, "single"),
        (9000005L, "two tokens"),
        (9000006L, "exactly three tokens"),
        (9000007L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    for (n <- Seq(1, 2, 3, 8)) {
      val both = docs.select(col("doc_id"),
        call_function("graft_word_grams", col("text"), lit(n)).as("nat"),
        TextHash.shinglesDeclarative(col("text"), n).as("dec"))
      val bad = both.where(
        (col("nat").isNull =!= col("dec").isNull) ||
          (col("nat").isNotNull && col("nat") =!= col("dec")))
      assert(bad.isEmpty, s"n=$n: ${bad.count()} mismatching docs")
    }
  }
}
