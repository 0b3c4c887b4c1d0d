package graft.tools

import org.apache.logging.log4j.LogManager
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.config.Property
import org.apache.logging.log4j.core.{LogEvent, LoggerContext}

/** Assert that whole-stage codegen actually ENGAGED for everything a block
  * executes. Spark's 64 KB generated-method overflow is silent-by-design:
  * the stage logs a warning and runs INTERPRETED — correct output, and at
  * scale exactly the 10×+ regression the native kernels were built to
  * kill. The guard listens on the two loggers that announce the fallback
  * (`WholeStageCodegenExec`: "Whole-stage codegen disabled…";
  * `CodeGenerator`: the janino compile error) and fails the smoke if
  * either fires, turning a perf time bomb into a red assertion. */
object CodegenGuard {

  private final class Capture(name: String)
      extends AbstractAppender(name, null, null, false, Property.EMPTY_ARRAY) {
    val hits = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    override def append(event: LogEvent): Unit = {
      // match loosely and case-insensitively, and include the attached
      // throwable's message — Spark/Janino wording varies across
      // versions ("Code of method ... grows beyond 64 KB", "failed to
      // compile: ...") and the overflow often rides the exception, not
      // the log line
      val thrown = Option(event.getThrown)
        .map(t => " " + String.valueOf(t.getMessage)).getOrElse("")
      val msg = (event.getMessage.getFormattedMessage + thrown).toLowerCase
      if (msg.contains("codegen disabled") ||
          msg.contains("grows beyond 64 kb") ||
          msg.contains("failed to compile"))
        hits.add(event.getLoggerName + ": " + msg.linesIterator.next())
    }
  }

  /** Run `body`; throw if any codegen fallback was logged during it. */
  def assertNoFallback[T](label: String)(body: => T): T = {
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val cap = new Capture(s"graft-codegen-guard-$label")
    cap.start()
    val cfg = ctx.getConfiguration
    val loggers = Seq(
      "org.apache.spark.sql.execution.WholeStageCodegenExec",
      "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator")
    loggers.foreach { ln =>
      cfg.getLoggerConfig(ln) // ensure root config exists for the name
      cfg.addLogger(ln, {
        val lc = new org.apache.logging.log4j.core.config.LoggerConfig(
          ln, org.apache.logging.log4j.Level.WARN, true)
        lc.addAppender(cap, org.apache.logging.log4j.Level.WARN, null)
        lc
      })
    }
    ctx.updateLoggers()
    try {
      val result = body
      if (!cap.hits.isEmpty)
        throw new AssertionError(
          s"[$label] whole-stage codegen fell back to interpreted: " +
            cap.hits.peek())
      result
    } finally {
      loggers.foreach(cfg.removeLogger)
      ctx.updateLoggers()
      cap.stop()
    }
  }
}
