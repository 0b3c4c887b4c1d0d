package graft.pipeline

/** Failure-alert transport (C6): consumes the structured failure payload
  * the pipeline raises, mirroring the reference's failure e-mail
  * (aircan/dependencies/utils/email.py:12-117 — a formatted notification
  * per failed run whose own errors are swallowed).
  *
  * Same pluggable-poster pattern as [[HttpStatusCallback]] /
  * [[graft.export.ApiBatchSink]]: the transport (SMTP, webhook, pager) is a
  * `String => Unit` injected at the edge; alerting must never mask the
  * original pipeline failure, so every delivery is wrapped.
  */
trait AlertSink {
  /** Deliver a failure notification; implementations must never throw
    * (wrap via [[AlertSink.poster]] rather than hand-rolling). */
  def alert(table: String, payload: String): Unit
}

object AlertSink {

  /** No-op default: alerting is opt-in, like the reference's email block. */
  object NoAlerts extends AlertSink {
    def alert(table: String, payload: String): Unit = ()
  }

  /** Alert sink delivering a JSON envelope to any poster; never throws. */
  def poster(post: String => Unit): AlertSink = new AlertSink {
    def alert(table: String, payload: String): Unit =
      try post(s"""{"table":${esc(table)},"failure":$payload}""")
      catch { case _: Throwable => () }
  }

  private def esc(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
}
