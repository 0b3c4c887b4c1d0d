package graft.tools

import org.apache.spark.sql.DataFrame

/** The structural optimized-plan fingerprint behind `bench_plans.json`
  * (v3, round 11): pre-order walk of canonicalized operator node names,
  * each expression contributing its class-name multiset SORTED — operand
  * order inside one expression is binary-dependent (canonicalization
  * orders commutative operands by hashCode, which shifts with Class
  * identity across recompiles) and must not read as plan drift, while
  * operator order (pushdown, join order, rule firing) stays
  * order-sensitive through the node-name walk.
  *
  * v3 additionally normalizes comparison ORIENTATION: canonicalization
  * rewrites `x >= lit` to `lit <= x` only when `x.hashCode > lit.hashCode`,
  * and an operand containing a `MultiCommutativeOp` carries a `Class`
  * reference whose identity hash shifts with classloading order — so the
  * SAME source flipped one `ext_curation` conjunct GTE↔LTE between the
  * round-10 builder and driver binaries. GT/GTE fold to LT/LTE in the
  * multiset (orientation is canonically equivalent, never a plan-shape
  * event); an added or removed comparison still flips the sha. v2 shas
  * containing any GT/GTE are not comparable to v3 (re-baselined).
  *
  * Shared by [[graft.Bench]] (the per-round artifact) and the
  * [[PlanFingerprint.main]] dev tool, which prints the full INPUT string
  * so two boxes' drift can be diffed character-by-character instead of
  * adjudicated from two opaque shas. */
object PlanFingerprint {
  private def norm(n: String): String = n match {
    case "GreaterThan"        => "LessThan"
    case "GreaterThanOrEqual" => "LessThanOrEqual"
    case other                => other
  }

  def input(df: DataFrame): String = {
    val sb = new StringBuilder
    df.queryExecution.optimizedPlan.canonicalized.foreach { node =>
      sb.append(node.nodeName).append('[')
      node.expressions.foreach { e =>
        val names = scala.collection.mutable.ArrayBuffer.empty[String]
        e.foreach(x => names += norm(x.getClass.getSimpleName))
        names.sorted.foreach(n => sb.append(n).append(','))
        sb.append(';')
      }
      sb.append(']')
    }
    sb.toString
  }

  def sha(df: DataFrame): String =
    try {
      java.security.MessageDigest.getInstance("SHA-1")
        .digest(input(df).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
    } catch { case _: Throwable => "unavailable" }

  /** `sbt "runMain graft.tools.PlanFingerprint <query> [sfDir] [outFile]"`
    * — prints the sha and (to `outFile` when given) the raw input string. */
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    // honor SPARK_GRAFT_CPUS like Bench — ext_curation proved a plan can
    // differ with session parallelism, and the tool must reproduce both
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.get(s"local[$cpus]", cpus.toInt)
    val df = graft.SparkEntry.queries(name)(spark, dir)
    val in = input(df)
    println(s"[fingerprint] $name sha=${sha(df)} len=${in.length}")
    args.lift(2).foreach { out =>
      val w = new java.io.PrintWriter(out)
      try w.println(in) finally w.close()
      val wt = new java.io.PrintWriter(out + ".tree")
      try wt.println(df.queryExecution.optimizedPlan.canonicalized.treeString)
      finally wt.close()
      println(s"[fingerprint] input written to $out (+.tree)")
    }
    // pre/post-execution probe: run the query, then fingerprint BOTH the
    // executed df and a freshly-built copy — isolates state the execution
    // left in the session from state baked into the df at build time
    df.write.format("noop").mode("overwrite").save()
    val in2 = input(df)
    println(s"[fingerprint] $name post-exec same-df sha=${sha(df)} len=${in2.length}")
    val df2 = graft.SparkEntry.queries(name)(spark, dir)
    val in3 = input(df2)
    println(s"[fingerprint] $name post-exec fresh-df sha=${sha(df2)} len=${in3.length}")
    args.lift(2).foreach { out =>
      val w = new java.io.PrintWriter(out + ".post")
      try w.println(in3) finally w.close()
    }
    spark.stop()
  }
}
