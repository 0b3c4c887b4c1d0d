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
}
