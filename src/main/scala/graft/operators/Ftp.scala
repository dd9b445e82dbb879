package graft.operators

import java.io.{BufferedReader, InputStream, InputStreamReader, OutputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets

import graft.extract.ResponseTypes

/** FTP download handler (reference `core/downloader/handlers/ftp.py` /
  * `ftp_asyncio.py`, behavior pinned by
  * `tests/test_downloader_handler_twisted_ftp.py`):
  *
  *  - credentials: `meta["ftp_user"]` / `meta["ftp_password"]` override the
  *    `FTP_USER` / `FTP_PASSWORD` settings (defaults `anonymous` / `guest`,
  *    `default_settings.py:360-361`); `meta["ftp_passive"]` overrides
  *    `FTP_PASSIVE_MODE` (default true, `default_settings.py:359`).
  *  - the request path is percent-decoded before RETR
  *    (`unquote(parsed_url.path)`, `ftp_asyncio.py:100`).
  *  - success → status 200; body = the downloaded bytes, or the local
  *    filename bytes when `meta["ftp_local_filename"]` routes the payload
  *    to disk; headers `Local Filename` (the filename or "") and `Size`
  *    (payload byte count) — exactly the reference test assertions
  *    (`test_ftp_download_success`: `{b"Local Filename": [b""],
  *    b"Size": [b"17"]}`).
  *  - a failed FTP command with a reply code maps through
  *    `CODE_MAPPING = {"550": 404, "default": 503}` to an HTTP-status
  *    response whose body is the server's error message
  *    (`ftp_asyncio.py:47-50`; historical `_failed`).
  *  - login failure is NOT a response: the control connection dies and the
  *    error propagates as a download exception
  *    (`test_invalid_credentials` expects a raised `ConnectionLost`) —
  *    modeled as [[FtpFetch.FtpConnectionLost]].
  *  - the response class comes from `responsetypes.from_args(url, body)`
  *    (historical `_build_response`), pinned by `test_response_class`:
  *    `file.txt` → TextResponse by URL extension,
  *    `html-file-without-extension` → HtmlResponse by body sniff.
  *
  * [[FtpClient]] is a from-scratch RFC 959 client over JDK sockets —
  * control-channel reply parsing (single and multiline), USER/PASS login,
  * binary TYPE I, passive (PASV, reply-227 host/port parse) and active
  * (PORT) data connections, RETR streaming until data-channel EOF plus the
  * 226 completion reply. Fetches are pure per-row functions like the other
  * download handlers: on a cluster each executor task opens its own control
  * connection, so the operator distributes exactly like `file:` reads
  * (see [[LocalFetch]]).
  */
object FtpClient {

  /** One FTP control reply: 3-digit code + full text (multiline joined). */
  final case class Reply(code: Int, text: String)

  /** A command the server rejected with a definitive reply code (4xx/5xx) —
    * the Twisted `CommandFailed` analogue. */
  final case class CommandFailed(reply: Reply)
      extends RuntimeException(s"${reply.code} ${reply.text}")

  /** Control-channel death (bad greeting, refused login closing the
    * connection, truncated reply) — the Twisted `ConnectionLost` analogue. */
  final case class ConnectionLost(message: String)
      extends RuntimeException(message)

  private val Utf8 = StandardCharsets.UTF_8

  /** Read one (possibly multiline, RFC 959 §4.2) reply off the control
    * stream. Multiline: `123-first` … until a line starting `123 `. */
  private def readReply(in: BufferedReader): Reply = {
    val first = in.readLine()
    if (first == null || first.length < 3)
      throw ConnectionLost(s"control connection closed (got ${String.valueOf(first)})")
    val code =
      try first.substring(0, 3).toInt
      catch { case _: NumberFormatException =>
        throw ConnectionLost(s"malformed reply: $first") }
    if (first.length > 3 && first.charAt(3) == '-') {
      val sb = new StringBuilder(first)
      var done = false
      while (!done) {
        val line = in.readLine()
        if (line == null) throw ConnectionLost("control connection closed mid-reply")
        sb.append('\n').append(line)
        done = line.length >= 4 && line.startsWith(first.substring(0, 3)) &&
          line.charAt(3) == ' '
      }
      Reply(code, sb.toString)
    } else Reply(code, first)
  }

  private def send(out: OutputStream, cmd: String): Unit = {
    out.write((cmd + "\r\n").getBytes(Utf8))
    out.flush()
  }

  private def expect(in: BufferedReader, out: OutputStream, cmd: String,
      ok: Int => Boolean): Reply = {
    send(out, cmd)
    val r = readReply(in)
    if (!ok(r.code)) throw CommandFailed(r)
    r
  }

  /** Parse a 227 `Entering Passive Mode (h1,h2,h3,h4,p1,p2)` reply. */
  private[graft] def parsePasv(text: String): (String, Int) = {
    val m = "(\\d+),(\\d+),(\\d+),(\\d+),(\\d+),(\\d+)".r.findFirstMatchIn(text)
      .getOrElse(throw ConnectionLost(s"unparseable PASV reply: $text"))
    val host = (1 to 4).map(m.group).mkString(".")
    (host, m.group(5).toInt * 256 + m.group(6).toInt)
  }

  private def drain(in: InputStream): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    val chunk = new Array[Byte](8192)
    var n = in.read(chunk)
    while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
    buf.toByteArray
  }

  /** Open the control connection, log in, run `f`, QUIT.
    *
    * A login rejection is NOT a [[CommandFailed]]: Twisted's FTPClient drops
    * the connection on failed auth, so the reference surfaces it as
    * ConnectionLost (`test_invalid_credentials`) — never a mapped-status
    * response. */
  private def session[A](host: String, port: Int, user: String,
      password: String, timeoutMs: Int)(
      f: (BufferedReader, OutputStream, Socket) => A): A = {
    val ctl = new Socket()
    try {
      ctl.connect(new java.net.InetSocketAddress(host, port), timeoutMs)
      ctl.setSoTimeout(timeoutMs)
      val in = new BufferedReader(
        new InputStreamReader(ctl.getInputStream, Utf8))
      val out = ctl.getOutputStream
      val greeting = readReply(in)
      if (greeting.code != 220) throw ConnectionLost(s"bad greeting: ${greeting.text}")
      // USER → 331 (need password) or 230 (already in); PASS → 230.
      send(out, s"USER $user")
      val u = readReply(in)
      if (u.code != 331 && u.code != 230)
        throw ConnectionLost(s"login failed: ${u.text}")
      if (u.code == 331) {
        send(out, s"PASS $password")
        val p = readReply(in)
        if (p.code != 230) throw ConnectionLost(s"login failed: ${p.text}")
      }
      val result = f(in, out, ctl)
      send(out, "QUIT") // best-effort; reply not required
      result
    } finally ctl.close()
  }

  /** Arrange a data connection (PASV or PORT), issue `command`, run `use`
    * on the data socket, then consume the 226/250 completion reply. */
  private def withData[A](in: BufferedReader, out: OutputStream, ctl: Socket,
      passive: Boolean, timeoutMs: Int, command: String)(use: Socket => A): A = {
    val dataSock =
      if (passive) {
        val pasv = expect(in, out, "PASV", _ == 227)
        val (dh, dp) = parsePasv(pasv.text)
        // connect to the advertised endpoint; servers behind loopback
        // always advertise a reachable one in this model
        val ds = new Socket()
        ds.connect(new java.net.InetSocketAddress(dh, dp), timeoutMs)
        ds.setSoTimeout(timeoutMs)
        send(out, command)
        val r = readReply(in)
        if (r.code != 125 && r.code != 150) { ds.close(); throw CommandFailed(r) }
        ds
      } else {
        // active mode (FTP_PASSIVE_MODE=false / FEED_STORAGE_FTP_ACTIVE):
        // we listen, the server connects back (RFC 959 PORT)
        val srv = new ServerSocket(0, 1, ctl.getLocalAddress)
        try {
          srv.setSoTimeout(timeoutMs)
          val a = ctl.getLocalAddress.getHostAddress.split('.')
          val p = srv.getLocalPort
          expect(in, out,
            s"PORT ${a.mkString(",")},${p / 256},${p % 256}", _ == 200)
          send(out, command)
          val r = readReply(in)
          if (r.code != 125 && r.code != 150) throw CommandFailed(r)
          val ds = srv.accept()
          ds.setSoTimeout(timeoutMs)
          ds
        } finally srv.close()
      }
    val result = try use(dataSock) finally dataSock.close()
    val done = readReply(in)
    if (done.code != 226 && done.code != 250) throw CommandFailed(done)
    result
  }

  /** Log in, switch to binary, RETR `path`, return the payload bytes.
    *
    * Throws [[CommandFailed]] when the server rejects a command with a
    * reply code (e.g. 550 for a missing file, 530 for a bad password) and
    * [[ConnectionLost]] when the control channel dies — mirroring how the
    * reference surfaces Twisted's two failure shapes. */
  def retrieve(host: String, port: Int, user: String, password: String,
      path: String, passive: Boolean = true, timeoutMs: Int = 15000): Array[Byte] =
    session(host, port, user, password, timeoutMs) { (in, out, ctl) =>
      expect(in, out, "TYPE I", _ == 200)
      withData(in, out, ctl, passive, timeoutMs, s"RETR $path") { ds =>
        drain(ds.getInputStream)
      }
    }

  /** `MDTM path` + `RETR path` in one session — `FTPFilesStore.stat_file`
    * (`pipelines/files.py:410-421`). The first element is
    * `float(voidcmd("MDTM …")[4:].strip())`: ftplib returns the raw reply
    * line, `[4:]` strips the `213 ` prefix, and the remaining
    * `YYYYMMDDHHMMSS[.sss]` digits parse as a (non-epoch) float. */
  def mdtmAndRetrieve(host: String, port: Int, user: String, password: String,
      path: String, passive: Boolean = true,
      timeoutMs: Int = 15000): (Double, Array[Byte]) =
    session(host, port, user, password, timeoutMs) { (in, out, ctl) =>
      val r = expect(in, out, s"MDTM $path", _ / 100 == 2)
      val mdtm = r.text.substring(4).trim.toDouble
      expect(in, out, "TYPE I", _ == 200)
      val body = withData(in, out, ctl, passive, timeoutMs, s"RETR $path") {
        ds => drain(ds.getInputStream)
      }
      (mdtm, body)
    }

  private def posixDirname(path: String): String = {
    val i = path.lastIndexOf('/')
    if (i < 0) "" else if (i == 0) "/" else path.substring(0, i)
  }

  private def posixBasename(path: String): String = {
    val i = path.lastIndexOf('/')
    if (i < 0) path else path.substring(i + 1)
  }

  /** Reference `ftp_makedirs_cwd` (`utils/ftp.py:7-18`): CWD to `path`,
    * creating missing parents on a 5xx (ftplib `error_perm`) — recurse to
    * the parent, MKD, and CWD only at the first call. */
  private def makedirsCwd(in: BufferedReader, out: OutputStream, path: String,
      firstCall: Boolean): Unit = {
    try { expect(in, out, s"CWD $path", _ / 100 == 2); () }
    catch { case CommandFailed(r) if r.code >= 500 && r.code < 600 =>
      makedirsCwd(in, out, posixDirname(path), firstCall = false)
      expect(in, out, s"MKD $path", _ / 100 == 2)
      if (firstCall) expect(in, out, s"CWD $path", _ / 100 == 2)
    }
  }

  /** Reference `ftp_store_file` (`utils/ftp.py:21-45`): log in, CWD to the
    * path's directory (creating missing parents), then upload the payload —
    * `STOR` when `overwrite` else `APPE`. */
  def store(host: String, port: Int, user: String, password: String,
      path: String, content: Array[Byte], passive: Boolean = true,
      overwrite: Boolean = true, timeoutMs: Int = 15000): Unit =
    session(host, port, user, password, timeoutMs) { (in, out, ctl) =>
      makedirsCwd(in, out, posixDirname(path), firstCall = true)
      expect(in, out, "TYPE I", _ == 200) // ftplib storbinary sends TYPE I itself
      val cmd = if (overwrite) "STOR" else "APPE"
      withData(in, out, ctl, passive, timeoutMs, s"$cmd ${posixBasename(path)}") { ds =>
        ds.getOutputStream.write(content)
        ds.getOutputStream.flush()
      }
    }
}

object FtpFetch {

  type FtpConnectionLost = FtpClient.ConnectionLost
  val FtpConnectionLost = FtpClient.ConnectionLost

  /** `CODE_MAPPING` (`ftp_asyncio.py:47-50`). */
  val CodeMapping: Map[Int, Int] = Map(550 -> 404)
  val DefaultHttpCode = 503

  /** Reference `FTP_USER` / `FTP_PASSWORD` defaults
    * (`default_settings.py:360-361`). */
  val DefaultUser = "anonymous"
  val DefaultPassword = "guest"

  /** The reference Response analogue: `headers` carries the normalized
    * `Local Filename` / `Size` pair the test battery asserts on. */
  final case class FtpResult(
      status: Int,
      body: Array[Byte],
      headers: Map[String, String],
      respClass: ResponseTypes.RespClass)

  /** Download one ftp:// URL with the reference handler's semantics.
    *
    * @param ftpUser      `meta["ftp_user"]` (None → `FTP_USER`)
    * @param ftpPassword  `meta["ftp_password"]` (None → `FTP_PASSWORD`)
    * @param localFilename `meta["ftp_local_filename"]`: write the payload
    *                      there; the response body becomes the filename
    * @param passive      `meta["ftp_passive"]` / `FTP_PASSIVE_MODE`
    */
  def fetch(url: String,
      ftpUser: Option[String] = None,
      ftpPassword: Option[String] = None,
      localFilename: Option[String] = None,
      passive: Boolean = true,
      timeoutMs: Int = 15000): FtpResult = {
    val parts = graft.urlkit.PyUrl.urlsplit(url)
    val host = graft.urlkit.PyUrl.hostname(parts.netloc).getOrElse(
      throw FtpClient.ConnectionLost(s"no host in $url"))
    val port = graft.urlkit.PyUrl.port(parts.netloc).getOrElse(21)
    // unquote(parsed_url.path) — ftp_asyncio.py:100
    val path = new String(graft.urlkit.PyUrl.unquoteToBytes(parts.path),
      StandardCharsets.UTF_8)
    val user = ftpUser.getOrElse(DefaultUser)
    val password = ftpPassword.getOrElse(DefaultPassword)
    try {
      val payload =
        FtpClient.retrieve(host, port, user, password, path, passive, timeoutMs)
      val body = localFilename match {
        case Some(f) =>
          java.nio.file.Files.write(java.nio.file.Paths.get(f), payload)
          f.getBytes(StandardCharsets.UTF_8)
        case None => payload
      }
      // historical _build_response: headers {"local filename": name or "",
      // "size": size}; respcls = responsetypes.from_args(url=url, body=body)
      FtpResult(200, body,
        Map("Local Filename" -> localFilename.getOrElse(""),
            "Size" -> payload.length.toString),
        ResponseTypes.fromArgs(url = url, body = body))
    } catch {
      case FtpClient.CommandFailed(reply) =>
        val status = CodeMapping.getOrElse(reply.code, DefaultHttpCode)
        FtpResult(status, reply.text.getBytes(StandardCharsets.UTF_8),
          Map.empty, ResponseTypes.RPlain)
    }
  }
}
