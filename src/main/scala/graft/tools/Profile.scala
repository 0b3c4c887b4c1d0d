package graft.tools

import graft.GraftSession
import graft.ext.{Dedup, TextHash}
import org.apache.spark.sql.functions._

/** Dev profiling harness for operator hot paths.
  * Run: `sbt "runMain graft.tools.Profile <sfDir>"`. */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("local[32]", 32)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val corpus = docs.unionByName(
      docs.where(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(" zz dup marker")).as("text")))

    time("corpus count")(corpus.count())
    val sh = corpus.select(col("doc_id"), TextHash.shingles(col("text")).as("sh"))
    time("shingles only")(sh.agg(sum(size(col("sh")))).first())
    val sig = sh.withColumn("sig", TextHash.minhashSignature(col("sh")))
    time("signature (HOF)")(sig.agg(sum(element_at(col("sig"), 1))).first())
    val nat = corpus.withColumn("sig", call_function("graft_minhash_sig", col("text")))
    time("signature (native expr)")(nat.agg(sum(element_at(col("sig"), 1))).first())
    time("signature (native, again)")(nat.agg(sum(element_at(col("sig"), 1))).first())
    time("full minhashPairs")(
      Dedup.minhashPairs(corpus, "text", "doc_id", 0.6).count())
    time("full minhashPairs again")(
      Dedup.minhashPairs(corpus, "text", "doc_id", 0.6).count())
    spark.stop()
  }
}
