package graft.tools

import graft.GraftSession

/** Dump `.explain("formatted")` of declared queries to files — the
  * optimization-round evidence artifact (`plans/<tag>/<query>_<suffix>.txt`).
  *
  * Run: `sbt "runMain graft.tools.ExplainDump <outDir> <suffix> <q1> <q2> …"`
  * (one JVM for the whole list; `suffix` is `before`/`after`). The dump is
  * the ANALYZED-then-optimized plan exactly as `explain("formatted")`
  * prints it — AQE shows `isFinalPlan=false`, which is fine: the shape
  * (Exchange count, join strategy, PushedFilters/ReadSchema) is what the
  * artifact pins.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("local[32]", 32)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val p = java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt")
      java.nio.file.Files.write(p, txt.getBytes("UTF-8"))
      println(s"[explain-dump] wrote $p (${txt.length} chars)")
    }
    spark.stop()
  }
}
