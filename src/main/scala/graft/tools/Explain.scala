package graft.tools

import graft.GraftSession

/** Print the formatted physical plan (and optionally timings) of declared
  * queries. Run: `sbt "runMain graft.tools.Explain <query> [sfDir]"`. */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get("local[32]", 32)
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.explain("formatted")
    val t0 = System.nanoTime()
    df.count()
    println(f"[explain] first run  ${(System.nanoTime() - t0) / 1e9}%6.2fs")
    val t1 = System.nanoTime()
    df.count()
    println(f"[explain] second run ${(System.nanoTime() - t1) / 1e9}%6.2fs")
    spark.stop()
  }
}
