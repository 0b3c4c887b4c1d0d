package graft.pipeline

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Drives the real socket transport against a loopback fake SMTP server —
  * same live-wire pattern as FetchSpec's loopback HTTP server. */
class SmtpAlertSpec extends AnyFunSuite {

  /** One-shot fake SMTP server; records every client line. `refuseAt`
    * makes the server reply 554 to the Nth command (0-based). */
  private def withServer[A](refuseAt: Int = -1)(
      f: (ConnectionSpec, () => Seq[String]) => A): A = {
    val server = new ServerSocket(0, 1, java.net.InetAddress.getLoopbackAddress)
    val lines = mutable.ArrayBuffer.empty[String]
    val t = new Thread(() => {
      try {
        val s = server.accept()
        val in = new BufferedReader(
          new InputStreamReader(s.getInputStream, StandardCharsets.UTF_8))
        val out = new OutputStreamWriter(s.getOutputStream, StandardCharsets.UTF_8)
        def say(r: String): Unit = { out.write(r + "\r\n"); out.flush() }
        say("220 fake.smtp ready")
        var inData = false
        var nCmd = 0
        var quit = false
        var line = in.readLine()
        while (line != null && !quit) {
          lines.synchronized { lines += line }
          if (inData) {
            if (line == ".") { inData = false; say("250 queued") }
          } else {
            val resp =
              if (nCmd == refuseAt) "554 refused"
              else if (line.startsWith("EHLO")) "250 fake.smtp"
              else if (line.startsWith("AUTH")) "334 VXNlcm5hbWU6"
              else if (line.startsWith("DATA")) { inData = true; "354 go" }
              else if (line.startsWith("QUIT")) { quit = true; "221 bye" }
              else "250 ok"
            nCmd += 1
            say(resp)
          }
          if (!quit) line = in.readLine()
        }
        s.close()
      } catch { case _: Throwable => () }
    })
    t.setDaemon(true)
    t.start()
    try f(
      ConnectionSpec(host = "127.0.0.1", port = server.getLocalPort),
      () => lines.synchronized(lines.toSeq))
    finally { try server.close() catch { case _: Throwable => () } }
  }

  test("full dialogue: EHLO, MAIL FROM, RCPT per recipient, DATA, dot-stuffing, QUIT") {
    withServer() { (conn, dialogue) =>
      SmtpAlert.send(conn, "graft@demo", Seq("ops@demo", "oncall@demo"),
        "subject-x", "line1\n.starts-with-dot\nline3")
      val d = dialogue()
      assert(d.exists(_.startsWith("EHLO")))
      assert(d.contains("MAIL FROM:<graft@demo>"))
      assert(d.contains("RCPT TO:<ops@demo>") && d.contains("RCPT TO:<oncall@demo>"))
      assert(d.contains("Subject: subject-x"))
      assert(d.contains("..starts-with-dot"), s"dot-stuffing required: $d")
      assert(d.contains(".") && d.contains("QUIT"))
      // no AUTH without a login
      assert(!d.exists(_.startsWith("AUTH")))
    }
  }

  test("AUTH LOGIN sends base64 credentials when a login is configured") {
    withServer() { (conn0, dialogue) =>
      val conn = conn0.copy(login = "alerts@demo", password = "pw")
      SmtpAlert.send(conn, "graft@demo", Seq("ops@demo"), "s", "b")
      val d = dialogue()
      val b64 = java.util.Base64.getEncoder
      assert(d.contains("AUTH LOGIN"))
      assert(d.contains(b64.encodeToString("alerts@demo".getBytes)))
      assert(d.contains(b64.encodeToString("pw".getBytes)))
    }
  }

  test("server refusal raises SmtpError from send, but the SINK never throws") {
    withServer(refuseAt = 1) { (conn, _) =>
      intercept[SmtpAlert.SmtpError] {
        SmtpAlert.send(conn, "graft@demo", Seq("ops@demo"), "s", "b")
      }
    }
    withServer(refuseAt = 1) { (conn, _) =>
      SmtpAlert.sink(conn, "graft@demo", Seq("ops@demo"))
        .alert("tbl", """{"err":"x"}""") // must not throw
    }
    // unreachable server: sink still never throws
    SmtpAlert.sink(ConnectionSpec(host = "127.0.0.1", port = 1),
      "graft@demo", Seq("ops@demo")).alert("tbl", "{}")
  }

  test("sink wires the alert envelope through as the mail body") {
    withServer() { (conn, dialogue) =>
      SmtpAlert.sink(conn, "graft@demo", Seq("ops@demo"))
        .alert("orders", """{"errorCount":3}""")
      val d = dialogue()
      assert(d.exists(_.contains(""""table":"orders"""")),
        s"alert envelope must reach the body: $d")
      assert(d.exists(_.contains(""""errorCount":3""")))
    }
  }

  // ---- STARTTLS: real JDK TLS over the loopback, self-signed cert ----

  /** SSLContext keyed+trusted on a keytool-generated self-signed
    * CN=localhost cert — serves both sides of the loopback handshake. */
  private lazy val tlsContext: javax.net.ssl.SSLContext = {
    import java.nio.file.Files
    val ksFile = Files.createTempFile("graft-smtp-tls", ".p12")
    Files.delete(ksFile) // keytool refuses to overwrite
    val gen = new ProcessBuilder(
      "keytool", "-genkeypair", "-alias", "t", "-keyalg", "RSA",
      "-keysize", "2048", "-storetype", "PKCS12",
      "-keystore", ksFile.toString, "-storepass", "changeit",
      "-keypass", "changeit", "-dname", "CN=localhost", "-validity", "2")
      .redirectErrorStream(true).start()
    assert(gen.waitFor() == 0, "keytool must generate the test keypair")
    val ks = java.security.KeyStore.getInstance("PKCS12")
    val fis = Files.newInputStream(ksFile)
    try ks.load(fis, "changeit".toCharArray) finally fis.close()
    val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
      javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, "changeit".toCharArray)
    val trust = java.security.KeyStore.getInstance("PKCS12")
    trust.load(null, null)
    trust.setCertificateEntry("t", ks.getCertificate("t"))
    val tmf = javax.net.ssl.TrustManagerFactory.getInstance(
      javax.net.ssl.TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(trust)
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, tmf.getTrustManagers, null)
    ctx
  }

  /** Fake SMTP server that advertises STARTTLS and upgrades the accepted
    * socket on request; records plaintext and encrypted lines separately. */
  private def withTlsServer[A](
      f: (ConnectionSpec, () => Seq[String], () => Seq[String]) => A): A = {
    val server = new ServerSocket(0, 1, java.net.InetAddress.getLoopbackAddress)
    val clear = mutable.ArrayBuffer.empty[String]
    val sealed_ = mutable.ArrayBuffer.empty[String]
    val t = new Thread(() => {
      try {
        var s: java.net.Socket = server.accept()
        var in = new BufferedReader(
          new InputStreamReader(s.getInputStream, StandardCharsets.UTF_8))
        var out = new OutputStreamWriter(s.getOutputStream, StandardCharsets.UTF_8)
        var sink = clear
        def say(r: String): Unit = { out.write(r + "\r\n"); out.flush() }
        say("220 fake.smtp ready")
        var inData = false
        var quit = false
        var line = in.readLine()
        while (line != null && !quit) {
          sink.synchronized { sink += line }
          if (inData) {
            if (line == ".") { inData = false; say("250 queued") }
          } else if (line.startsWith("STARTTLS")) {
            say("220 go ahead")
            val ssl = tlsContext.getSocketFactory
              .createSocket(s, null, s.getPort, true)
              .asInstanceOf[javax.net.ssl.SSLSocket]
            ssl.setUseClientMode(false)
            s = ssl
            in = new BufferedReader(
              new InputStreamReader(ssl.getInputStream, StandardCharsets.UTF_8))
            out = new OutputStreamWriter(ssl.getOutputStream, StandardCharsets.UTF_8)
            sink = sealed_
          } else {
            val resp =
              if (line.startsWith("EHLO")) "250-fake.smtp\r\n250 STARTTLS"
              else if (line.startsWith("AUTH")) "334 VXNlcm5hbWU6"
              else if (line.startsWith("DATA")) { inData = true; "354 go" }
              else if (line.startsWith("QUIT")) { quit = true; "221 bye" }
              else "250 ok"
            say(resp)
          }
          if (!quit) line = in.readLine()
        }
        s.close()
      } catch { case _: Throwable => () }
    })
    t.setDaemon(true)
    t.start()
    try f(
      ConnectionSpec(host = "localhost", port = server.getLocalPort,
        extra = Map("starttls" -> "required")),
      () => clear.synchronized(clear.toSeq),
      () => sealed_.synchronized(sealed_.toSeq))
    finally { try server.close() catch { case _: Throwable => () } }
  }

  test("STARTTLS required: upgrade happens, credentials and mail only on TLS") {
    withTlsServer { (conn0, clearLines, tlsLines) =>
      val conn = conn0.copy(login = "alerts@demo", password = "pw")
      SmtpAlert.send(conn, "graft@demo", Seq("ops@demo"), "s", "secret-body",
        sslSocketFactory = Some(tlsContext.getSocketFactory))
      val c = clearLines()
      val e = tlsLines()
      assert(c.exists(_.startsWith("EHLO")) && c.contains("STARTTLS"),
        s"pre-upgrade dialogue is EHLO + STARTTLS only: $c")
      assert(!c.exists(l => l.startsWith("AUTH") || l.startsWith("MAIL") ||
        l.contains("secret-body")),
        s"nothing sensitive may travel in the clear: $c")
      assert(e.exists(_.startsWith("EHLO")), "EHLO repeats after the upgrade")
      assert(e.contains("AUTH LOGIN") && e.contains("MAIL FROM:<graft@demo>"))
      assert(e.contains("secret-body") && e.contains("QUIT"))
    }
  }

  test("STARTTLS required but not advertised: refuse before any mail command") {
    withServer() { (conn0, dialogue) => // plain server, no STARTTLS capability
      val conn = conn0.copy(extra = Map("starttls" -> "required"))
      val e = intercept[SmtpAlert.SmtpError] {
        SmtpAlert.send(conn, "graft@demo", Seq("ops@demo"), "s", "b")
      }
      assert(e.getMessage.contains("STARTTLS"))
      assert(!dialogue().exists(_.startsWith("MAIL")),
        "refusal must come before MAIL FROM — no cleartext delivery attempt")
    }
  }

  test("unknown starttls mode is a config error, not silent plaintext") {
    val e = intercept[SmtpAlert.SmtpError] {
      SmtpAlert.send(
        ConnectionSpec(host = "127.0.0.1", port = 1,
          extra = Map("starttls" -> "requried")),
        "graft@demo", Seq("ops@demo"), "s", "b")
    }
    assert(e.getMessage.contains("requried"))
  }
}
