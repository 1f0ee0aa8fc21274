package graft.sinks

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.net.Socket
import java.nio.charset.StandardCharsets
import java.util.Base64
import graft.sources.ConfigYaml.MailerConfig

/** K5 — e-mail report sink behind a transport interface (reference
  * base.py:707-743 `send_email` over smtplib; per-stage recipients from
  * config_email.yaml, base.py:744-816,1098-1109).
  *
  * The message composition (MIME multipart with file attachments) and
  * the skip-when-unconfigured semantics live here; the wire transport
  * is injected — tests use an in-memory fake or a loopback server, and
  * production wires [[SmtpTransport]] (a minimal RFC 5321 dialogue over
  * a socket; the container is zero-egress so no mail library exists to
  * delegate to).
  */
object EmailSink {

  final case class Email(from: String, to: Seq[String], subject: String,
      body: String, attachments: Seq[(String, Array[Byte])] = Seq.empty)

  trait Transport {
    def send(mail: Email): Unit
  }

  /** The reference's per-stage report send (base.py:744-816): skip
    * silently when recipients are unconfigured, otherwise compose and
    * hand to the transport. Returns true when a mail went out. */
  def sendStageReport(transport: Transport, cfg: MailerConfig,
      recipients: Seq[String], subject: String, body: String,
      attachments: Seq[(String, Array[Byte])] = Seq.empty): Boolean = {
    if (recipients.isEmpty) false
    else {
      transport.send(Email(cfg.user, recipients, subject, body, attachments))
      true
    }
  }

  /** RFC 2045/2046 multipart MIME rendering (Subject/From/To/Date +
    * text part + base64 attachment parts) — the shape smtplib's
    * MIMEMultipart produces in the reference. */
  def render(mail: Email,
      date: java.time.ZonedDateTime = java.time.ZonedDateTime.now()): String = {
    val boundary = "====graft-boundary===="
    val sb = new StringBuilder
    sb ++= s"Subject: ${mail.subject}\r\n"
    sb ++= s"From: ${mail.from}\r\n"
    sb ++= s"To: ${mail.to.mkString(",")}\r\n"
    sb ++= s"Date: ${date.format(java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME)}\r\n"
    sb ++= "MIME-Version: 1.0\r\n"
    sb ++= s"""Content-Type: multipart/mixed; boundary="$boundary"\r\n"""
    sb ++= "\r\n"
    sb ++= s"--$boundary\r\n"
    sb ++= "Content-Type: text/plain; charset=utf-8\r\n\r\n"
    sb ++= mail.body
    sb ++= "\r\n"
    mail.attachments.foreach { case (name, bytes) =>
      sb ++= s"--$boundary\r\n"
      sb ++= s"""Content-Type: application/octet-stream; Name="$name"\r\n"""
      sb ++= "Content-Transfer-Encoding: base64\r\n"
      sb ++= s"""Content-Disposition: attachment; filename="$name"\r\n\r\n"""
      sb ++= Base64.getMimeEncoder(76, "\r\n".getBytes)
        .encodeToString(bytes)
      sb ++= "\r\n"
    }
    sb ++= s"--$boundary--\r\n"
    sb.toString
  }

  /** Minimal SMTP client: greeting, EHLO, optional AUTH LOGIN, MAIL
    * FROM, RCPT TO, DATA, QUIT (smtplib's plain dialogue,
    * base.py:728-739). `ssl=true` expects an implicit-TLS socket from
    * the factory (SMTPS port 465); STARTTLS upgrade is intentionally
    * out of scope. */
  final class SmtpTransport(cfg: MailerConfig,
      socketFactory: (String, Int) => Socket = SmtpTransport.defaultSocket)
      extends Transport {

    override def send(mail: Email): Unit = {
      val socket = socketFactory(cfg.smtpServer, cfg.port)
      try {
        val in = new BufferedReader(new InputStreamReader(
          socket.getInputStream, StandardCharsets.UTF_8))
        val out = new OutputStreamWriter(
          socket.getOutputStream, StandardCharsets.UTF_8)
        def expect(codes: Set[Int]): Unit = {
          var line = in.readLine()
          // multi-line replies: "250-..." continues, "250 ..." ends
          while (line != null && line.length >= 4 && line.charAt(3) == '-')
            line = in.readLine()
          val code = Option(line).flatMap(_.take(3).toIntOption).getOrElse(-1)
          require(codes.contains(code), s"smtp: unexpected reply '$line'")
        }
        def cmd(s: String, codes: Set[Int]): Unit = {
          out.write(s + "\r\n"); out.flush(); expect(codes)
        }
        expect(Set(220))
        cmd("EHLO graft", Set(250))
        if (cfg.password.nonEmpty) {
          cmd("AUTH LOGIN", Set(334))
          cmd(Base64.getEncoder.encodeToString(
            cfg.user.getBytes(StandardCharsets.UTF_8)), Set(334))
          cmd(Base64.getEncoder.encodeToString(
            cfg.password.getBytes(StandardCharsets.UTF_8)), Set(235))
        }
        cmd(s"MAIL FROM:<${mail.from}>", Set(250))
        mail.to.foreach(r => cmd(s"RCPT TO:<$r>", Set(250, 251)))
        cmd("DATA", Set(354))
        // dot-stuffing per RFC 5321 §4.5.2
        val payload = render(mail).replaceAll("(?m)^\\.", "..")
        out.write(payload)
        if (!payload.endsWith("\r\n")) out.write("\r\n")
        cmd(".", Set(250))
        cmd("QUIT", Set(221))
      } finally socket.close()
    }
  }

  object SmtpTransport {
    def defaultSocket(host: String, port: Int): Socket = new Socket(host, port)

    /** Implicit-TLS socket for `ssl: true` configs (SMTPS). */
    def sslSocket(host: String, port: Int): Socket =
      javax.net.ssl.SSLSocketFactory.getDefault.createSocket(host, port)

    def forConfig(cfg: MailerConfig): SmtpTransport =
      new SmtpTransport(cfg,
        if (cfg.ssl) sslSocket else defaultSocket _)
  }
}
