package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query against
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line with per-query seconds.
  *
  * Each query gets one untimed warmup run (codegen JIT + broadcast build +
  * file-index caches — one-time costs a long-lived cluster amortizes away)
  * unless SPARK_GRAFT_WARMUP=0.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val warmup = sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0"
    val spark = GraftSession.get(s"local[$cpus]", cpus.toInt)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // isolate queries: caches built by one query must not distort the next
      spark.sqlContext.clearCache()
      if (warmup) {
        try fn(spark, sfDir).count()
        catch { case _: Throwable => -1L }
      }
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
