package graft.tools

import graft.GraftSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Dev profiler for one declared query: runs the gate like Bench does
  * (fresh call per run, noop sink) and prints every Spark JOB with its
  * wall duration, task count, and call-site description — separating
  * "many tiny commit jobs" from "one big compute job", which the bench's
  * single per-gate number cannot.
  *
  * Run: `sbt "runMain graft.tools.GateProfile <query> [sfDir]"`.
  */
object GateProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("local[32]", 32)
    args.foreach(profileOne(spark, dir, _))
    spark.stop()
  }

  private def profileOne(spark: org.apache.spark.sql.SparkSession,
      dir: String, name: String): Unit = {
    println(s"\n[gate-profile] ===== $name =====")

    final case class JobRec(id: Int, desc: String, start: Long,
        var end: Long = -1L, var nTasks: Int = 0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(js.stageInfos.headOption.map(_.name))
          .getOrElse("?")
        jobs.put(js.jobId, JobRec(js.jobId, desc.take(120), js.time))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val r = jobs.get(je.jobId)
        if (r != null) r.end = je.time
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        // attribute tasks to whichever job owns the stage (approx: latest)
        ()
      }
    }

    def once(label: String): Double = {
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val df = fn(spark, dir)
      val tPlan = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t1 = System.nanoTime()
      println(f"[gate-profile] $label: build+side-effects ${(tPlan - t0) / 1e9}%7.3fs  noop-action ${(t1 - tPlan) / 1e9}%7.3fs  total ${(t1 - t0) / 1e9}%7.3fs")
      (t1 - t0) / 1e9
    }

    // warmup (uninstrumented)
    once("warmup ")
    spark.sqlContext.clearCache()
    System.gc()
    spark.sparkContext.addSparkListener(listener)
    // poor-man's sampling profiler: every 20 ms grab all stacks, count
    // RUNNABLE non-executor threads' top interesting frame — says what the
    // DRIVER is doing between jobs (planning? fs? commit? codegen?)
    val samples = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val sampling = new java.util.concurrent.atomic.AtomicBoolean(true)
    val sampler = new Thread(() => {
      while (sampling.get) {
        val all = Thread.getAllStackTraces
        all.forEach { (t, st) =>
          val n = t.getName
          if (t.getState == Thread.State.RUNNABLE &&
              !n.startsWith("Executor task launch") &&
              !n.contains("sampler") && st.nonEmpty) {
            val interesting = st.find { f =>
              val c = f.getClassName
              (c.startsWith("org.apache.spark.sql.catalyst") ||
               c.startsWith("org.apache.spark.sql.execution") ||
               c.startsWith("org.apache.spark.sql.classic") ||
               c.startsWith("org.apache.hadoop") ||
               c.startsWith("org.apache.parquet") ||
               c.startsWith("org.codehaus.janino") ||
               c.startsWith("graft")) && !c.contains("Profile")
            }.getOrElse(st.head)
            val key = n.replaceAll("[-0-9]+$", "#") + " @ " +
              interesting.getClassName.split("\\.").takeRight(2).mkString(".") +
              "." + interesting.getMethodName
            samples.merge(key, 1, (a, b) => a + b)
          }
        }
        Thread.sleep(20)
      }
    }, "graft-gate-sampler")
    sampler.setDaemon(true)
    sampler.start()
    once("timed  ")
    sampling.set(false)
    sampler.join(500)
    spark.sparkContext.removeSparkListener(listener)
    locally {
      import scala.jdk.CollectionConverters._
      val top = samples.asScala.toSeq.sortBy(-_._2.intValue).take(25)
      println(s"[gate-profile] driver-side RUNNABLE samples (20ms ticks):")
      top.foreach { case (k, c) => println(f"[gate-profile]   ${c.intValue}%5d  $k") }
    }

    import scala.jdk.CollectionConverters._
    val recs = jobs.values.asScala.toSeq.sortBy(_.start)
    val totalMs = recs.filter(_.end > 0).map(r => r.end - r.start).sum
    println(s"[gate-profile] ${recs.size} jobs, sum of job wall-times ${totalMs / 1000.0}s")
    val worst = recs.filter(_.end > 0).sortBy(r => -(r.end - r.start)).take(30)
    worst.foreach { r =>
      println(f"[gate-profile]   job ${r.id}%4d ${(r.end - r.start) / 1000.0}%8.3fs  ${r.desc}")
    }
    // gaps between jobs = driver-side work (planning, fs ops, commits)
    val sorted = recs.filter(_.end > 0).sortBy(_.start)
    var gapMs = 0L
    sorted.sliding(2).foreach {
      case Seq(a, b) => if (b.start > a.end) gapMs += b.start - a.end
      case _ => ()
    }
    println(f"[gate-profile] inter-job driver gap total ${gapMs / 1000.0}%.3fs")
  }
}
