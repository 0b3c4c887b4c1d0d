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
  * QUIT — with optional AUTH LOGIN. STARTTLS (RFC 3207) is supported via
  * the JDK's own TLS: set `extra("starttls") = "required"` on the
  * connection and the client upgrades after EHLO — refusing outright
  * (never silently downgrading) when the server does not advertise the
  * capability or the handshake fails, and sending credentials only on
  * the encrypted channel. Any other `starttls` value is a config error
  * (a typo like "requried" must not quietly mean "plaintext is fine").
  * Delivery runs on the driver only, bounded by `timeoutMs` per socket
  * operation.
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
    * [[sink]]). `sslSocketFactory` overrides the JDK default for the
    * STARTTLS upgrade (tests inject a loopback-trusting factory). */
  def send(
      conn: ConnectionSpec,
      from: String,
      to: Seq[String],
      subject: String,
      body: String,
      timeoutMs: Int = 10000,
      sslSocketFactory: Option[javax.net.ssl.SSLSocketFactory] = None
  ): Unit = {
    require(to.nonEmpty, "SMTP delivery needs at least one recipient")
    val wantTls = conn.extra.get("starttls") match {
      case Some("required")    => true
      case None | Some("")     => false
      case Some(other) =>
        throw SmtpError(s"unknown starttls mode '$other' (use \"required\")")
    }
    val plain = new Socket()
    var socket: Socket = plain
    try {
      plain.connect(new InetSocketAddress(conn.host, conn.port), timeoutMs)
      plain.setSoTimeout(timeoutMs)
      var in = new BufferedReader(
        new InputStreamReader(socket.getInputStream, StandardCharsets.UTF_8))
      var out = new OutputStreamWriter(socket.getOutputStream, StandardCharsets.UTF_8)

      def reply(): Seq[String] = {
        // multi-line replies: "250-..." continues, "250 ..." ends
        val all = Seq.newBuilder[String]
        var line = in.readLine()
        val first = line
        while (line != null && line.length >= 4 && line.charAt(3) == '-') {
          all += line
          line = in.readLine()
        }
        if (line != null) all += line
        if (first == null) throw SmtpError("connection closed")
        if (first.isEmpty || first.charAt(0) > '3') throw SmtpError(first)
        all.result()
      }
      def cmd(s: String): Seq[String] = {
        out.write(s); out.write("\r\n"); out.flush(); reply()
      }

      reply() // 220 greeting
      val caps = cmd("EHLO graft.local")
      if (wantTls) {
        // refuse, never downgrade: no STARTTLS capability → no delivery
        if (!caps.exists(_.toUpperCase.contains("STARTTLS")))
          throw SmtpError("server does not advertise STARTTLS " +
            "— refusing to send in the clear")
        cmd("STARTTLS") // 220: server is ready for the handshake
        val factory = sslSocketFactory.getOrElse(
          javax.net.ssl.SSLContext.getDefault.getSocketFactory)
        val ssl = factory
          .createSocket(socket, conn.host, conn.port, true)
          .asInstanceOf[javax.net.ssl.SSLSocket]
        ssl.setUseClientMode(true)
        ssl.setSoTimeout(timeoutMs)
        // Endpoint identification (CWE-295): SSLSocket verifies the chain
        // but NOT that the certificate matches conn.host unless asked — an
        // active MITM with any CA-signed cert would otherwise pass the
        // handshake and receive the AUTH LOGIN credentials. "HTTPS" is the
        // JSSE rule set (RFC 2818 host matching), the standard choice for
        // SMTP STARTTLS too (same as jakarta.mail's ssl.checkserveridentity).
        val params = ssl.getSSLParameters
        params.setEndpointIdentificationAlgorithm("HTTPS")
        ssl.setSSLParameters(params)
        ssl.startHandshake() // throws on any TLS failure — no fallback
        socket = ssl
        in = new BufferedReader(
          new InputStreamReader(ssl.getInputStream, StandardCharsets.UTF_8))
        out = new OutputStreamWriter(ssl.getOutputStream, StandardCharsets.UTF_8)
        cmd("EHLO graft.local") // RFC 3207: state resets after the upgrade
      }
      // AUTH strictly after any TLS upgrade — credentials never in the clear
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
