package graft

import java.io.{BufferedReader, InputStreamReader, OutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

/** Minimal loopback FTP server for [[FtpSpec]] — the test-side analogue of
  * the reference fixture's Twisted `FTPFactory` + `FTPRealm`
  * (`tests/test_downloader_handler_twisted_ftp.py:57-77`): anonymous users
  * are rooted at `root`, named users at `root/<user>` (FTPRealm's
  * `anonymousRoot` / `userHome` layout). Thread-per-connection so parallel
  * fetches exercise the handler the way a distributed fetch batch would.
  * Speaks just enough RFC 959 for the handler under test: USER/PASS,
  * TYPE, PASV, PORT, RETR, QUIT; a wrong password gets `530` and a dropped
  * control connection like Twisted's FTP server. The greeting is multiline
  * (`220-…` continuation) so the client's RFC 959 §4.2 reply parser is
  * exercised on every connection.
  */
final class MiniFtpServer(root: Path, users: Map[String, String]) {
  private val loopback = InetAddress.getLoopbackAddress
  private val server = new ServerSocket(0, 16, loopback)
  @volatile private var running = true

  val port: Int = server.getLocalPort

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val s = server.accept()
        val t = new Thread(() => handle(s))
        t.setDaemon(true)
        t.start()
      } catch { case _: java.io.IOException => () /* closed */ }
    }
  })
  acceptor.setDaemon(true)
  acceptor.start()

  def stop(): Unit = { running = false; server.close() }

  private def reply(out: OutputStream, line: String): Unit = {
    out.write((line + "\r\n").getBytes(StandardCharsets.UTF_8))
    out.flush()
  }

  private def handle(sock: Socket): Unit = {
    try {
      sock.setSoTimeout(15000)
      val in = new BufferedReader(
        new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
      val out = sock.getOutputStream
      reply(out, "220-graft MiniFtpServer")
      reply(out, "220 ready")
      var user: String = null
      var home: Path = null
      var pasv: ServerSocket = null
      var active: (String, Int) = null

      def openData(): Socket =
        if (pasv != null) {
          val d = pasv.accept(); pasv.close(); pasv = null; d
        } else if (active != null) {
          val (h, p) = active; active = null
          new Socket(h, p)
        } else throw new java.io.IOException("no data connection arranged")

      var open = true
      while (open) {
        val line = in.readLine()
        if (line == null) open = false
        else {
          val sp = line.indexOf(' ')
          val cmd = (if (sp < 0) line else line.substring(0, sp)).toUpperCase
          val arg = if (sp < 0) "" else line.substring(sp + 1)
          cmd match {
            case "USER" =>
              user = arg
              reply(out, "331 Password required")
            case "PASS" =>
              if (user == "anonymous" ||
                  (user != null && users.get(user).contains(arg))) {
                home = if (user == "anonymous") root else root.resolve(user)
                reply(out, "230 User logged in")
              } else {
                // Twisted drops the control connection on failed auth —
                // that is what turns the client's pending work into
                // ConnectionLost instead of a mapped-status response
                reply(out, "530 Authentication failed")
                open = false
              }
            case "TYPE" => reply(out, "200 Type set")
            case "PASV" =>
              if (pasv != null) pasv.close()
              pasv = new ServerSocket(0, 1, loopback)
              val p = pasv.getLocalPort
              val h = loopback.getHostAddress.replace('.', ',')
              reply(out, s"227 Entering Passive Mode ($h,${p / 256},${p % 256})")
            case "PORT" =>
              val ns = arg.split(',').map(_.trim.toInt)
              active = (ns.take(4).mkString("."), ns(4) * 256 + ns(5))
              reply(out, "200 PORT command successful")
            case "RETR" =>
              val rel = if (arg.startsWith("/")) arg.substring(1) else arg
              val f = if (home == null) null else home.resolve(rel)
              if (home == null) reply(out, "530 Please login")
              else if (f != null && Files.isRegularFile(f)) {
                reply(out, "150 Opening binary data connection")
                val d = openData()
                try d.getOutputStream.write(Files.readAllBytes(f))
                finally d.close()
                reply(out, "226 Transfer complete")
              } else
                reply(out, s"550 $rel: No such file or directory.")
            case "QUIT" =>
              reply(out, "221 Goodbye")
              open = false
            case _ => reply(out, "502 Command not implemented")
          }
        }
      }
      if (pasv != null) pasv.close()
    } catch { case _: java.io.IOException => () }
    finally sock.close()
  }
}
