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
      var cwd: Path = null
      var pasv: ServerSocket = null
      var active: (String, Int) = null

      // "/" is the (chrooted) user home, like Twisted's FTPRealm shell
      def resolve(arg: String): Path =
        if (arg == "/" || arg.isEmpty) home
        else if (arg.startsWith("/")) home.resolve(arg.substring(1)).normalize
        else cwd.resolve(arg).normalize

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
                cwd = home
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
              val f = if (home == null) null else resolve(arg)
              if (home == null) reply(out, "530 Please login")
              else if (f != null && Files.isRegularFile(f)) {
                reply(out, "150 Opening binary data connection")
                val d = openData()
                try d.getOutputStream.write(Files.readAllBytes(f))
                finally d.close()
                reply(out, "226 Transfer complete")
              } else
                reply(out, s"550 $arg: No such file or directory.")
            case "CWD" =>
              if (home == null) reply(out, "530 Please login")
              else {
                val d = resolve(arg)
                if (Files.isDirectory(d)) { cwd = d; reply(out, "250 Directory changed") }
                else reply(out, s"550 $arg: No such directory.")
              }
            case "MKD" =>
              if (home == null) reply(out, "530 Please login")
              else {
                val d = resolve(arg)
                if (Files.isDirectory(d.getParent) && !Files.exists(d)) {
                  Files.createDirectory(d)
                  reply(out, s"""257 "$arg" created""")
                } else reply(out, s"550 $arg: Cannot create directory.")
              }
            case "STOR" | "APPE" =>
              if (home == null) reply(out, "530 Please login")
              else {
                val f = resolve(arg)
                reply(out, "150 Opening binary data connection")
                val d = openData()
                val buf = new java.io.ByteArrayOutputStream()
                try {
                  val chunk = new Array[Byte](8192)
                  var n = d.getInputStream.read(chunk)
                  while (n >= 0) { buf.write(chunk, 0, n); n = d.getInputStream.read(chunk) }
                } finally d.close()
                import java.nio.file.StandardOpenOption._
                if (cmd == "APPE")
                  Files.write(f, buf.toByteArray, CREATE, WRITE, APPEND)
                else Files.write(f, buf.toByteArray, CREATE, WRITE, TRUNCATE_EXISTING)
                reply(out, "226 Transfer complete")
              }
            case "MDTM" =>
              val f = if (home == null) null else resolve(arg)
              if (home == null) reply(out, "530 Please login")
              else if (f != null && Files.isRegularFile(f)) {
                val t = java.time.Instant
                  .ofEpochMilli(Files.getLastModifiedTime(f).toMillis)
                  .atZone(java.time.ZoneOffset.UTC)
                reply(out, "213 " + java.time.format.DateTimeFormatter
                  .ofPattern("yyyyMMddHHmmss").format(t))
              } else
                reply(out, s"550 $arg: No such file or directory.")
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
