package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.extract.ResponseTypes
import graft.operators.{FtpClient, FtpFetch}

/** Port of the reference FTP download-handler battery
  * (`tests/test_downloader_handler_twisted_ftp.py` — TestFTP and
  * TestAnonymousFTP) against [[MiniFtpServer]], the same way DataUriSpec
  * pins the data:/file: handlers: status / body / `Local Filename` +
  * `Size` headers / response class / 550→404 mapping / login-failure
  * exception, byte-exact where the reference asserts bytes. */
class FtpSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val username = "scrapy"
  private val password = "passwd"

  // test_files — tests/test_downloader_handler_twisted_ftp.py:44-48
  private val testFiles = Seq(
    "file.txt" -> "I have the power!",
    "file with spaces.txt" -> "Moooooooooo power!",
    "html-file-without-extension" -> "<!DOCTYPE html>\n<title>.</title>")

  private var root: Path = _
  private var server: MiniFtpServer = _
  private def base: String = s"ftp://127.0.0.1:${server.port}/"

  override def beforeAll(): Unit = {
    root = Files.createTempDirectory("graft-ftp")
    val userDir = root.resolve(username)
    Files.createDirectories(userDir)
    for ((name, content) <- testFiles) {
      // user files under root/<user> (FTPRealm userHome), anonymous at root
      Files.write(userDir.resolve(name),
        content.getBytes(StandardCharsets.UTF_8))
      Files.write(root.resolve(name), content.getBytes(StandardCharsets.UTF_8))
    }
    server = new MiniFtpServer(root, Map(username -> password))
  }

  override def afterAll(): Unit = if (server != null) server.stop()

  private def fetch(url: String, localFilename: Option[String] = None,
      user: Option[String] = Some(username),
      pass: Option[String] = Some(password),
      passive: Boolean = true): FtpFetch.FtpResult =
    FtpFetch.fetch(url, ftpUser = user, ftpPassword = pass,
      localFilename = localFilename, passive = passive)

  test("download success (test_ftp_download_success)") {
    val r = fetch(base + "file.txt")
    assert(r.status === 200)
    assert(new String(r.body, StandardCharsets.UTF_8) === "I have the power!")
    assert(r.headers === Map("Local Filename" -> "", "Size" -> "17"))
  }

  test("path with spaces (test_ftp_download_path_with_spaces)") {
    // Request URL-encodes the space; the handler unquotes before RETR
    val r = fetch(base + "file%20with%20spaces.txt")
    assert(r.status === 200)
    assert(new String(r.body, StandardCharsets.UTF_8) === "Moooooooooo power!")
    assert(r.headers === Map("Local Filename" -> "", "Size" -> "18"))
  }

  test("nonexistent file maps 550 → 404 (test_ftp_download_nonexistent)") {
    val r = fetch(base + "nonexistent.txt")
    assert(r.status === 404)
    // body = the server's error message (historical _failed)
    assert(new String(r.body, StandardCharsets.UTF_8).contains("550"))
  }

  test("ftp_local_filename routes payload to disk (test_ftp_local_filename)") {
    val local = Files.createTempFile("graft-ftp-local", ".bin")
    val r = fetch(base + "file.txt", localFilename = Some(local.toString))
    assert(r.status === 200)
    assert(new String(r.body, StandardCharsets.UTF_8) === local.toString)
    assert(r.headers ===
      Map("Local Filename" -> local.toString, "Size" -> "17"))
    assert(Files.exists(local))
    assert(new String(Files.readAllBytes(local), StandardCharsets.UTF_8) ===
      "I have the power!")
    Files.delete(local)
  }

  test("response class by URL extension then body sniff (test_response_class)") {
    assert(fetch(base + "file.txt").respClass === ResponseTypes.RText)
    assert(fetch(base + "html-file-without-extension").respClass ===
      ResponseTypes.RHtml)
  }

  test("invalid credentials raise, not a response (test_invalid_credentials)") {
    intercept[FtpClient.ConnectionLost] {
      fetch(base + "file.txt", pass = Some("invalid"))
    }
  }

  test("anonymous default credentials (TestAnonymousFTP)") {
    // req_meta = {} → FTP_USER/FTP_PASSWORD defaults (anonymous/guest)
    val r = FtpFetch.fetch(base + "file.txt")
    assert(r.status === 200)
    assert(new String(r.body, StandardCharsets.UTF_8) === "I have the power!")
    assert(r.headers === Map("Local Filename" -> "", "Size" -> "17"))
  }

  test("active mode (FTP_PASSIVE_MODE=false → PORT)") {
    val r = fetch(base + "file.txt", passive = false)
    assert(r.status === 200)
    assert(new String(r.body, StandardCharsets.UTF_8) === "I have the power!")
  }

  test("unknown command failure maps to 503 (CODE_MAPPING default)") {
    // a RETR before login: the server answers 530, which is not in
    // CODE_MAPPING → default 503. Drive the client directly: fetch()
    // always logs in first, so issue the mapping check on the mapping
    // itself plus a direct CommandFailed shape.
    assert(FtpFetch.CodeMapping.getOrElse(530, FtpFetch.DefaultHttpCode) === 503)
    assert(FtpFetch.CodeMapping(550) === 404)
  }

  test("PASV reply parser (RFC 959 h1,h2,h3,h4,p1,p2)") {
    assert(FtpClient.parsePasv("227 Entering Passive Mode (127,0,0,1,19,137)")
      === (("127.0.0.1", 19 * 256 + 137)))
  }

  test("parallel fetches (thread-per-connection, distributed batch shape)") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val bodies = Await.result(
      Future.sequence((1 to 8).map(_ => Future {
        new String(fetch(base + "file.txt").body, StandardCharsets.UTF_8)
      })), 30.seconds)
    assert(bodies.forall(_ == "I have the power!"))
  }
}
