package graft

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.EmailSink
import graft.sources.ConfigYaml.MailerConfig

/** K5 — e-mail sink: composition semantics with an in-memory transport
  * and the SMTP dialogue against a loopback fake server (the reference's
  * smtplib path, base.py:707-743). */
class EmailSinkSpec extends AnyFunSuite {

  test("skip-when-unconfigured, compose-when-recipients (base.py:744-816)") {
    var sent = Vector.empty[EmailSink.Email]
    val fake = new EmailSink.Transport {
      override def send(m: EmailSink.Email): Unit = sent :+= m
    }
    val cfg = MailerConfig("from@x", "", "ignored", 25, ssl = false)
    assert(!EmailSink.sendStageReport(fake, cfg, Seq.empty, "s", "b"))
    assert(sent.isEmpty)
    assert(EmailSink.sendStageReport(fake, cfg, Seq("a@x", "b@x"),
      "Scraping: sspm", "2 OK / 0 ERROR",
      attachments = Seq("reporte.csv" -> "id,status\n1,OK\n".getBytes)))
    assert(sent.size == 1)
    val mime = EmailSink.render(sent.head)
    assert(mime.contains("Subject: Scraping: sspm"))
    assert(mime.contains("To: a@x,b@x"))
    assert(mime.contains("""filename="reporte.csv""""))
    // base64 of the attachment payload is present
    val b64 = java.util.Base64.getEncoder
      .encodeToString("id,status\n1,OK\n".getBytes)
    assert(mime.replace("\r\n", "").contains(b64))
  }

  test("SmtpTransport speaks the full dialogue against a loopback server") {
    val server = new ServerSocket(0)
    val received = new java.util.concurrent.LinkedBlockingQueue[String]()
    val serverThread = new Thread(() => {
      val s = server.accept()
      val in = new BufferedReader(new InputStreamReader(
        s.getInputStream, StandardCharsets.UTF_8))
      val out = new OutputStreamWriter(s.getOutputStream,
        StandardCharsets.UTF_8)
      def reply(r: String): Unit = { out.write(r + "\r\n"); out.flush() }
      reply("220 fake ESMTP")
      val data = new StringBuilder
      var inData = false
      var line = in.readLine()
      while (line != null) {
        if (inData) {
          if (line == ".") {
            inData = false; reply("250 ok: queued")
          } else data ++= line + "\n"
        } else line.takeWhile(_ != ' ') match {
          case "EHLO" => reply("250-fake"); reply("250 AUTH LOGIN")
          case "AUTH" => reply("334 VXNlcm5hbWU6")
          case "MAIL" => reply("250 ok")
          case "RCPT" => reply("250 ok")
          case "DATA" => inData = true; reply("354 go ahead")
          case "QUIT" => reply("221 bye"); received.put(data.toString)
          case _ => reply(if (line.matches("^[A-Za-z0-9+/=]+$"))
            // AUTH LOGIN continuation lines (base64 user, then password)
            (if (received.isEmpty && data.isEmpty &&
              !line.isEmpty) "334 UGFzc3dvcmQ6" else "235 ok")
            else "250 ok")
        }
        line = if (inData || !line.startsWith("QUIT")) in.readLine() else null
      }
      s.close()
    })
    serverThread.setDaemon(true)
    serverThread.start()

    val cfg = MailerConfig("u@x", "", "127.0.0.1", server.getLocalPort,
      ssl = false)
    val t = new EmailSink.SmtpTransport(cfg)
    t.send(EmailSink.Email("u@x", Seq("r@x"), "Hi", "body text"))
    val data = received.poll(10, java.util.concurrent.TimeUnit.SECONDS)
    server.close()
    assert(data != null, "server never saw DATA")
    assert(data.contains("Subject: Hi"))
    assert(data.contains("body text"))
  }
}
