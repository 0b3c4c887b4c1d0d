package graft.pipeline

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

/** HTTP status callback (C5): fire-and-forget lifecycle POSTs, mirroring the
  * reference's CKAN notifier (aircan/dependencies/utils/ckan.py:13-78 —
  * a JSON POST per state transition whose failures are swallowed so status
  * reporting can never fail the pipeline).
  *
  * The transport is pluggable (same injection pattern as
  * [[graft.export.ApiBatchSink]]): pass any `String => Unit` poster, or use
  * [[HttpStatusCallback.toUrl]] for the built-in HttpURLConnection POST with
  * the reference's timeout posture. Every call is wrapped — implementations
  * of the poster may throw freely; the callback never does.
  */
final class HttpStatusCallback(post: String => Unit) extends StatusCallback {
  def update(state: String, message: String): Unit =
    try post(HttpStatusCallback.payload(state, message))
    catch { case _: Throwable => () }
}

object HttpStatusCallback {

  /** Callback POSTing JSON to `url` (connect/read timeouts in ms; defaults
    * match the reference's short status-call budget, not the long download
    * budget). */
  def toUrl(url: String, connectTimeoutMs: Int = 10000, readTimeoutMs: Int = 30000,
      headers: Map[String, String] = Map.empty): HttpStatusCallback =
    new HttpStatusCallback(body => {
      val conn = new URI(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
      try {
        conn.setConnectTimeout(connectTimeoutMs)
        conn.setReadTimeout(readTimeoutMs)
        conn.setRequestMethod("POST")
        conn.setRequestProperty("Content-Type", "application/json")
        headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
        conn.setDoOutput(true)
        val out = conn.getOutputStream
        try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
        conn.getResponseCode // drain the response; status is fire-and-forget
        ()
      } finally conn.disconnect()
    })

  private[pipeline] def payload(state: String, message: String): String =
    s"""{"state":${esc(state)},"message":${esc(message)}}"""

  private def esc(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
}
