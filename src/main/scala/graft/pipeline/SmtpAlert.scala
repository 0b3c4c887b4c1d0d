package graft.pipeline

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets

/** Minimal SMTP transport for the failure-alert sink — the concrete mail
  * delivery behind [[AlertSink]], closing the reference's per-site failure
  * email (aircan/dependencies/utils/email.py:87-117: build an HTML message,
  * open the configured SMTP connection, send, and swallow any delivery
  * error because email is a nice-to-have that must never fail the task).
  *
  * Dependency-free by design (no jakarta.mail in this library): the client
  * speaks the base RFC 5321 dialogue — EHLO, MAIL FROM, RCPT TO, DATA,
  * QUIT — with optional AUTH LOGIN, over a plain socket. STARTTLS is
  * deliberately NOT implemented: it would be untestable here and silently
  * downgrading is worse than refusing; deployments that require TLS should
  * inject their own transport via [[AlertSink.poster]] (the seam this
  * client itself plugs into). Delivery runs on the driver only, bounded by
  * `timeoutMs` per socket operation.
  */
object SmtpAlert {

  final case class SmtpError(reply: String)
      extends RuntimeException(s"SMTP transport refused: $reply")

  /** Alert sink mailing each failure payload via `conn`
    * (host/port/login/password, e.g. the site's `{site_id}_email`
    * connection). Never throws — delivery errors are logged and dropped,
    * like the reference's `except Exception` around sendmail. */
  def sink(
      conn: ConnectionSpec,
      from: String,
      to: Seq[String],
      subjectPrefix: String = "[graft] pipeline failure"
  ): AlertSink =
    AlertSink.poster(body => send(conn, from, to, subjectPrefix, body))

  /** One SMTP delivery (visible for tests; throws [[SmtpError]] on any
    * non-2xx/3xx reply — callers wanting never-throw semantics go through
    * [[sink]]). */
  def send(
      conn: ConnectionSpec,
      from: String,
      to: Seq[String],
      subject: String,
      body: String,
      timeoutMs: Int = 10000
  ): Unit = {
    require(to.nonEmpty, "SMTP delivery needs at least one recipient")
    val socket = new Socket()
    try {
      socket.connect(new InetSocketAddress(conn.host, conn.port), timeoutMs)
      socket.setSoTimeout(timeoutMs)
      val in = new BufferedReader(
        new InputStreamReader(socket.getInputStream, StandardCharsets.UTF_8))
      val out = new OutputStreamWriter(socket.getOutputStream, StandardCharsets.UTF_8)

      def reply(): String = {
        // multi-line replies: "250-..." continues, "250 ..." ends
        var line = in.readLine()
        val first = line
        while (line != null && line.length >= 4 && line.charAt(3) == '-')
          line = in.readLine()
        if (first == null) throw SmtpError("connection closed")
        if (first.isEmpty || first.charAt(0) > '3') throw SmtpError(first)
        first
      }
      def cmd(s: String): String = {
        out.write(s); out.write("\r\n"); out.flush(); reply()
      }

      reply() // 220 greeting
      cmd("EHLO graft.local")
      if (conn.login.nonEmpty) {
        val b64 = java.util.Base64.getEncoder
        cmd("AUTH LOGIN")
        cmd(b64.encodeToString(conn.login.getBytes(StandardCharsets.UTF_8)))
        cmd(b64.encodeToString(conn.password.getBytes(StandardCharsets.UTF_8)))
      }
      cmd(s"MAIL FROM:<$from>")
      to.foreach(r => cmd(s"RCPT TO:<$r>"))
      cmd("DATA")
      val headers = Seq(
        s"From: $from",
        s"To: ${to.mkString(", ")}",
        s"Subject: $subject",
        "MIME-Version: 1.0",
        "Content-Type: text/plain; charset=utf-8")
      // dot-stuff per RFC 5321 §4.5.2
      val stuffed = body.split("\n", -1).map { l =>
        val t = l.stripSuffix("\r")
        if (t.startsWith(".")) "." + t else t
      }
      out.write(headers.mkString("", "\r\n", "\r\n\r\n"))
      out.write(stuffed.mkString("", "\r\n", "\r\n.\r\n"))
      out.flush()
      reply() // 250 accepted
      cmd("QUIT")
      ()
    } finally socket.close()
  }
}
