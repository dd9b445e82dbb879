package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import graft.urlkit.{PyUrl, UrlKit}

/** Media file stores (reference `pipelines/files.py:104-427`): where a
  * downloaded media file is persisted and how an existing copy is stat'd for
  * the FILES_EXPIRES freshness gate. The reference's `FilesPipeline` maps a
  * URI scheme to a store class (`STORE_SCHEMES`, `files.py:451-457`); each
  * store exposes `persist_file` / `stat_file`. All three stores here are
  * pure per-row functions — on a cluster each executor persists the files
  * its partition fetched (mapPartitions over the media batch), no driver
  * fan-in; the stat results join back into the media_seen delta chain that
  * drives the age gate (contract on CrawlEngine's media stage).
  *
  *  - `FsFilesStore`  — local/`file://` basedir (`files.py:104-152`)
  *  - `S3FilesStore`  — signed PUT/HEAD request rows via [[S3Auth]]
  *    (`files.py:155-284`; the sandbox has no S3 endpoint, so the store
  *    produces the request the upload amounts to, like [[FeedStorage]])
  *  - `FtpFilesStore` — upload + MDTM/RETR stat over [[FtpClient]]
  *    (`files.py:364-427`)
  *  - `GcsFilesStore` — the `gs://` path/metadata contract only
  *    (`files.py:287-363`): the reference delegates the transport wholesale
  *    to the google-cloud-storage client and its only non-mocked test is
  *    env-gated, so there is no public wire contract to pin offline —
  *    what IS pinned is the blob-path/attribute surface its mocked test
  *    covers.
  */
object FilesStore {

  /** A `stat_file` result (`StatInfo`): POSIX mtime seconds (FTP: the raw
    * `MDTM` digits parsed as a float, `files.py:419` — NOT epoch) and the
    * md5-hex checksum. The reference returns `{}` on any error → None. */
  final case class StatInfo(lastModified: Double, checksum: String)

  // ---------------------------------------------------------------------
  // file_path (files.py:712-729): where a media URL lands inside the store.
  // ---------------------------------------------------------------------

  /** `FilesPipeline.file_path`: `full/<sha1(request.url)><ext>` where the
    * URL is the request's (already `safe_url_string`-sanitized) URL and the
    * extension is `PurePath(url).suffix` when that suffix is a known
    * mimetypes key, else the extension guessed from the URL's mime type
    * (empty when unguessable). Pinned by the 9 reference goldens
    * (`tests/test_pipeline_files.py:92-154`) in FilesStoreSpec. */
  def filePath(rawUrl: String): String = {
    val url = UrlKit.safeUrlString(rawUrl)
    val guid = mediaGuid(rawUrl)
    val suffix = pathSuffix(url)
    val ext =
      if (suffix.nonEmpty && PyMime.typesMap.contains(suffix)) suffix
      else Option(PyMime.guessType(url)).map(PyMime.guessExtension).map {
        case null => ""
        case e => e
      }.getOrElse("")
    s"full/$guid$ext"
  }

  /** The media guid both pipelines share: sha1 hex of the
    * (`safe_url_string`-sanitized, like `Request.__init__`) URL bytes
    * (`files.py:720`, `images.py:221,230`). */
  def mediaGuid(rawUrl: String): String = {
    val url = UrlKit.safeUrlString(rawUrl)
    val md = java.security.MessageDigest.getInstance("SHA-1")
    md.digest(url.getBytes(StandardCharsets.UTF_8))
      .map(b => f"${b & 0xff}%02x").mkString
  }

  /** CPython `pathlib.PurePath(url).suffix`: the final path component's
    * extension — trailing slashes dropped, a leading-dot-only or
    * trailing-dot name has none. The URL is treated as an opaque POSIX
    * path (query and fragment ride along in the final component, which is
    * exactly what makes `...?img=x.jpg` resolve to `.jpg`). */
  private[graft] def pathSuffix(url: String): String = {
    val segs = url.split("/")
    var i = segs.length - 1
    while (i >= 0 && segs(i).isEmpty) i -= 1
    if (i < 0) return ""
    val name = segs(i)
    val dot = name.lastIndexOf('.')
    if (dot > 0 && dot < name.length - 1) name.substring(dot) else ""
  }

  // ---------------------------------------------------------------------
  // FSFilesStore (files.py:104-152)
  // ---------------------------------------------------------------------

  /** Local store: `basedir` has any `scheme://` prefix stripped
    * (`files.py:105-108`), paths are `/`-joined under it. */
  final case class FsFilesStore(basedirRaw: String) {
    val basedir: String = {
      val i = basedirRaw.indexOf("://")
      if (i >= 0) basedirRaw.substring(i + 3) else basedirRaw
    }

    private def resolve(path: String): Path =
      Paths.get(basedir, path.split("/"): _*)

    /** `persist_file`: mkdir parents, write bytes. */
    def persistFile(path: String, content: Array[Byte]): Unit = {
      val p = resolve(path)
      Files.createDirectories(p.getParent)
      Files.write(p, content)
      ()
    }

    /** `stat_file`: mtime seconds + md5; any OS error → None
      * (`files.py:127-139`). */
    def statFile(path: String): Option[StatInfo] = {
      val p = resolve(path)
      try {
        val mtime = Files.getLastModifiedTime(p).toMillis / 1000.0
        Some(StatInfo(mtime, graft.media.ImageOps.md5Hex(Files.readAllBytes(p))))
      } catch { case _: java.io.IOException => None }
    }
  }

  // ---------------------------------------------------------------------
  // S3FilesStore (files.py:155-284)
  // ---------------------------------------------------------------------

  /** `S3FilesStore.HEADERS` — applied to every upload, overridable per-file
    * (`files.py:166-168`). */
  val S3DefaultHeaders: Vector[(String, String)] =
    Vector("Cache-Control" -> "max-age=172800")

  /** `S3FilesStore.POLICY` default (settings `FILES_STORE_S3_ACL`). */
  val S3DefaultPolicy = "private"

  /** The botocore put_object kwarg surface (`files.py:246-284`): header
    * names the store accepts. An unsupported header raises TypeError in the
    * reference — mirrored as IllegalArgumentException. Values are the
    * canonical header spellings the signed PUT carries. */
  private val s3SupportedHeaders: Vector[String] = Vector(
    "Content-Type", "Cache-Control", "Content-Disposition",
    "Content-Encoding", "Content-Language", "Content-Length", "Content-MD5",
    "Expires",
    "X-Amz-Grant-Full-Control", "X-Amz-Grant-Read", "X-Amz-Grant-Read-ACP",
    "X-Amz-Grant-Write-ACP", "X-Amz-Object-Lock-Legal-Hold",
    "X-Amz-Object-Lock-Mode", "X-Amz-Object-Lock-Retain-Until-Date",
    "X-Amz-Request-Payer", "X-Amz-Server-Side-Encryption",
    "X-Amz-Server-Side-Encryption-Aws-Kms-Key-Id",
    "X-Amz-Server-Side-Encryption-Context",
    "X-Amz-Server-Side-Encryption-Customer-Algorithm",
    "X-Amz-Server-Side-Encryption-Customer-Key",
    "X-Amz-Server-Side-Encryption-Customer-Key-Md5",
    "X-Amz-Storage-Class", "X-Amz-Tagging",
    "X-Amz-Website-Redirect-Location")

  /** `s3://bucket/prefix…` store. Keys are `prefix + path` verbatim
    * (`files.py:206,226` — no separator inserted; the URI's trailing slash
    * is the user's contract, `test_blob_path_consistency` style). The
    * reference uploads through botocore; here the store renders the signed
    * request rows the calls amount to, via the same HmacV1 signer as the
    * s3 download handler. */
  final case class S3FilesStore(
      bucket: String,
      prefix: String,
      accessKey: Option[String] = None,
      secretKey: Option[String] = None,
      sessionToken: Option[String] = None,
      policy: String = S3DefaultPolicy) {

    private def keyName(path: String): String = prefix + path

    /** The case-insensitive header merge of `persist_file`
      * (`files.py:246-253`): defaults first, per-file headers override —
      * both validated against the botocore kwarg table. Later duplicate of
      * the same (CI) name wins, like dict.update. */
    private[graft] def mergeHeaders(
        headers: Vector[(String, String)]): Vector[(String, String)] = {
      var out = Vector.empty[(String, String)]
      (S3DefaultHeaders ++ headers).foreach { case (name, value) =>
        val canon = s3SupportedHeaders.find(_.equalsIgnoreCase(name)).getOrElse(
          throw new IllegalArgumentException(
            s"""Header "$name" is not supported by botocore"""))
        out = out.filterNot(_._1 == canon) :+ (canon -> value)
      }
      out
    }

    /** `persist_file` → the signed `PutObject` request: virtual-hosted URL,
      * merged headers, `x-amz-acl` from the policy, item meta as
      * `x-amz-meta-*` (string-rendered values, `files.py:258`). `date` is
      * the caller's RFC 1123 signing date (virtual clock). */
    def persistRequest(path: String, meta: Seq[(String, String)] = Nil,
        headers: Vector[(String, String)] = Vector.empty,
        date: String = "", isSecure: Boolean = true): S3Fetch.Prepared = {
      val merged = mergeHeaders(headers) ++
        Vector("x-amz-acl" -> policy) ++
        meta.map { case (k, v) =>
          s"x-amz-meta-${k.toLowerCase(java.util.Locale.ROOT)}" -> v }
      S3Fetch.prepare(s"s3://$bucket/${keyName(path)}", method = "PUT",
        headers = merged, isSecure = isSecure, accessKey = accessKey,
        secretKey = secretKey, sessionToken = sessionToken,
        anon = Some(false), date = date)
    }

    /** `stat_file` → the signed `HeadObject` request (`files.py:189-216`). */
    def statRequest(path: String, date: String = "",
        isSecure: Boolean = true): S3Fetch.Prepared =
      S3Fetch.prepare(s"s3://$bucket/${keyName(path)}", method = "HEAD",
        isSecure = isSecure, accessKey = accessKey, secretKey = secretKey,
        sessionToken = sessionToken, anon = Some(false), date = date)

    /** `stat_file`'s response mapping (`files.py:191-195`): checksum is the
      * ETag with its quotes stripped; lastModified is the header's epoch
      * seconds (botocore parses Last-Modified to a datetime; the caller
      * supplies the parsed value). */
    def parseStat(etag: String, lastModifiedEpochSec: Double): StatInfo =
      StatInfo(lastModifiedEpochSec, etag.stripPrefix("\"").stripSuffix("\""))
  }

  object S3FilesStore {
    /** `S3FilesStore.__init__` (`files.py:185-187`): scheme must be `s3`,
      * then `bucket, prefix = uri[5:].split("/", 1)` — a URI without a `/`
      * after the bucket is an error. */
    def fromUri(uri: String,
        accessKey: Option[String] = None, secretKey: Option[String] = None,
        sessionToken: Option[String] = None,
        policy: String = S3DefaultPolicy): S3FilesStore = {
      if (!uri.startsWith("s3://"))
        throw new IllegalArgumentException(
          s"Incorrect URI scheme in $uri, expected 's3'")
      val rest = uri.substring(5)
      val slash = rest.indexOf('/')
      if (slash < 0)
        throw new IllegalArgumentException(s"no key prefix in $uri")
      S3FilesStore(rest.substring(0, slash), rest.substring(slash + 1),
        accessKey, secretKey, sessionToken, policy)
    }
  }

  // ---------------------------------------------------------------------
  // GCSFilesStore (files.py:287-363) — path/metadata contract only
  // ---------------------------------------------------------------------

  /** `GCSFilesStore.CACHE_CONTROL` (`files.py:290`). */
  val GcsCacheControl = "max-age=172800"

  /** The `gs://bucket/prefix…` store's PINNABLE surface: bucket/prefix
    * parse (`uri[5:].split("/", 1)`, same shape as S3), the blob path used
    * by BOTH persist and stat (`prefix + path`,
    * `test_blob_path_consistency`), the default content type, and the
    * upload metadata (cache control + string-rendered item meta +
    * predefined ACL). The transport itself delegates wholesale to the
    * google-cloud-storage client in the reference — no public wire
    * contract its tests pin — so persist/stat network calls are documented
    * out for this offline port. */
  final case class GcsFilesStore(
      bucket: String,
      prefix: String,
      policy: Option[String] = None) {

    /** `_get_blob_path` (`files.py:338-339`). */
    def blobPath(path: String): String = prefix + path

    /** `_get_content_type` (`files.py:333-336`). */
    def contentType(headers: Seq[(String, String)]): String =
      headers.collectFirst { case ("Content-Type", v) => v }
        .getOrElse("application/octet-stream")

    /** The blob attributes `persist_file` sets (`files.py:341-363`). */
    def uploadMetadata(meta: Seq[(String, String)],
        headers: Seq[(String, String)]): Map[String, String] =
      Map("cache_control" -> GcsCacheControl,
        "content_type" -> contentType(headers)) ++
        policy.map("predefined_acl" -> _) ++
        meta.map { case (k, v) => s"metadata.$k" -> v }
  }

  object GcsFilesStore {
    def fromUri(uri: String, policy: Option[String] = None): GcsFilesStore = {
      if (!uri.startsWith("gs://"))
        throw new IllegalArgumentException(
          s"Incorrect URI scheme in $uri, expected 'gs'")
      val rest = uri.substring(5)
      val slash = rest.indexOf('/')
      if (slash < 0)
        throw new IllegalArgumentException(s"no blob prefix in $uri")
      GcsFilesStore(rest.substring(0, slash), rest.substring(slash + 1), policy)
    }
  }

  // ---------------------------------------------------------------------
  // FTPFilesStore (files.py:364-427)
  // ---------------------------------------------------------------------

  /** `ftp://[user:pass@]host:port/basedir` store. URI userinfo outranks the
    * configured `FTP_USER`/`FTP_PASSWORD` (`files.py:381-382`); the basedir
    * is the URI path with trailing slashes stripped. */
  final case class FtpFilesStore(
      host: String,
      port: Int,
      username: String,
      password: String,
      basedir: String,
      useActiveMode: Boolean = false) {

    private def remotePath(path: String): String = s"$basedir/$path"

    /** `persist_file` → `ftp_store_file` (`files.py:384-405`): STOR at
      * `basedir/path`, creating missing remote directories. */
    def persistFile(path: String, content: Array[Byte],
        timeoutMs: Int = 15000): Unit =
      FtpClient.store(host, port, username, password, remotePath(path),
        content, passive = !useActiveMode, overwrite = true,
        timeoutMs = timeoutMs)

    /** `stat_file` (`files.py:407-427`): one session does
      * `MDTM basedir/path` (the reply's digits parsed as a float — the
      * reference keeps the raw YYYYMMDDHHMMSS number, not epoch) then
      * md5-hashes a `RETR` of the same file; ANY failure → None ("the file
      * doesn't exist"). */
    def statFile(path: String, timeoutMs: Int = 15000): Option[StatInfo] =
      try {
        val p = remotePath(path)
        val (mdtm, body) = FtpClient.mdtmAndRetrieve(host, port, username,
          password, p, passive = !useActiveMode, timeoutMs = timeoutMs)
        Some(StatInfo(mdtm, graft.media.ImageOps.md5Hex(body)))
      } catch { case scala.util.control.NonFatal(_) => None }
  }

  object FtpFilesStore {
    /** `FTPFilesStore.__init__` (`files.py:370-382`). The reference asserts
      * a port is present in the URI; kept, with its dead `or 21` fallback
      * dropped. */
    def fromUri(uri: String, ftpUsername: Option[String] = None,
        ftpPassword: Option[String] = None,
        useActiveMode: Boolean = false): FtpFilesStore = {
      if (!uri.startsWith("ftp://"))
        throw new IllegalArgumentException(
          s"Incorrect URI scheme in $uri, expected 'ftp'")
      val parts = PyUrl.urlsplit(uri)
      val host = PyUrl.hostname(parts.netloc).getOrElse(
        throw new IllegalArgumentException(s"no host in $uri"))
      val port = PyUrl.port(parts.netloc).getOrElse(
        throw new IllegalArgumentException(s"no port in $uri"))
      val (user, pass) = PyUrl.userinfo(parts.netloc)
      FtpFilesStore(
        host = host,
        port = port,
        username = user.orElse(ftpUsername).getOrElse(
          throw new IllegalArgumentException("FTP_USERNAME not set")),
        password = pass.orElse(ftpPassword).getOrElse(
          throw new IllegalArgumentException("FTP_PASSWORD not set")),
        basedir = {
          var p = parts.path
          while (p.endsWith("/")) p = p.dropRight(1)
          p
        },
        useActiveMode = useActiveMode)
    }
  }
}

/** CPython's builtin `mimetypes` table (Lib/mimetypes.py
  * `_default_mime_types`, strict entries, insertion-ordered — the order is
  * `guess_extension`'s tie-break). `FilesPipeline.file_path` consults this
  * raw stdlib table, NOT the scrapy-overridden one [[graft.extract.ResponseTypes]]
  * carries (which merges `scrapy/mime.types`, e.g. `.xml` → application/xml
  * there vs text/xml here). System `/etc/mime.types` additions are
  * deliberately not modeled — they'd make `file_path` host-dependent. */
private[operators] object PyMime {

  private[operators] val ordered: Vector[(String, String)] = Vector(
    ".js" -> "application/javascript", ".mjs" -> "application/javascript",
    ".json" -> "application/json",
    ".webmanifest" -> "application/manifest+json",
    ".doc" -> "application/msword", ".dot" -> "application/msword",
    ".wiz" -> "application/msword",
    ".nq" -> "application/n-quads", ".nt" -> "application/n-triples",
    ".bin" -> "application/octet-stream", ".a" -> "application/octet-stream",
    ".dll" -> "application/octet-stream", ".exe" -> "application/octet-stream",
    ".o" -> "application/octet-stream", ".obj" -> "application/octet-stream",
    ".so" -> "application/octet-stream",
    ".oda" -> "application/oda",
    ".pdf" -> "application/pdf",
    ".p7c" -> "application/pkcs7-mime",
    ".ps" -> "application/postscript", ".ai" -> "application/postscript",
    ".eps" -> "application/postscript",
    ".trig" -> "application/trig",
    ".m3u" -> "application/vnd.apple.mpegurl",
    ".m3u8" -> "application/vnd.apple.mpegurl",
    ".xls" -> "application/vnd.ms-excel", ".xlb" -> "application/vnd.ms-excel",
    ".ppt" -> "application/vnd.ms-powerpoint",
    ".pot" -> "application/vnd.ms-powerpoint",
    ".ppa" -> "application/vnd.ms-powerpoint",
    ".pps" -> "application/vnd.ms-powerpoint",
    ".pwz" -> "application/vnd.ms-powerpoint",
    ".wasm" -> "application/wasm",
    ".bcpio" -> "application/x-bcpio", ".cpio" -> "application/x-cpio",
    ".csh" -> "application/x-csh", ".dvi" -> "application/x-dvi",
    ".gtar" -> "application/x-gtar", ".hdf" -> "application/x-hdf",
    ".h5" -> "application/x-hdf5", ".latex" -> "application/x-latex",
    ".mif" -> "application/x-mif", ".cdf" -> "application/x-netcdf",
    ".nc" -> "application/x-netcdf", ".p12" -> "application/x-pkcs12",
    ".pfx" -> "application/x-pkcs12",
    ".ram" -> "application/x-pn-realaudio",
    ".pyc" -> "application/x-python-code",
    ".pyo" -> "application/x-python-code",
    ".sh" -> "application/x-sh", ".shar" -> "application/x-shar",
    ".swf" -> "application/x-shockwave-flash",
    ".sv4cpio" -> "application/x-sv4cpio", ".sv4crc" -> "application/x-sv4crc",
    ".tar" -> "application/x-tar", ".tcl" -> "application/x-tcl",
    ".tex" -> "application/x-tex", ".texi" -> "application/x-texinfo",
    ".texinfo" -> "application/x-texinfo",
    ".roff" -> "application/x-troff", ".t" -> "application/x-troff",
    ".tr" -> "application/x-troff", ".man" -> "application/x-troff-man",
    ".me" -> "application/x-troff-me", ".ms" -> "application/x-troff-ms",
    ".ustar" -> "application/x-ustar", ".src" -> "application/x-wais-source",
    ".xsl" -> "application/xml", ".rdf" -> "application/xml",
    ".wsdl" -> "application/xml", ".xpdl" -> "application/xml",
    ".zip" -> "application/zip",
    ".3gp" -> "audio/3gpp", ".3gpp" -> "audio/3gpp",
    ".3g2" -> "audio/3gpp2", ".3gpp2" -> "audio/3gpp2",
    ".aac" -> "audio/aac", ".adts" -> "audio/aac", ".loas" -> "audio/aac",
    ".ass" -> "audio/aac",
    ".au" -> "audio/basic", ".snd" -> "audio/basic",
    ".mp3" -> "audio/mpeg", ".mp2" -> "audio/mpeg",
    ".opus" -> "audio/opus",
    ".aif" -> "audio/x-aiff", ".aifc" -> "audio/x-aiff",
    ".aiff" -> "audio/x-aiff",
    ".ra" -> "audio/x-pn-realaudio", ".wav" -> "audio/x-wav",
    ".avif" -> "image/avif", ".bmp" -> "image/bmp", ".gif" -> "image/gif",
    ".ief" -> "image/ief",
    ".jpg" -> "image/jpeg", ".jpe" -> "image/jpeg", ".jpeg" -> "image/jpeg",
    ".heic" -> "image/heic", ".heif" -> "image/heif",
    ".png" -> "image/png", ".svg" -> "image/svg+xml",
    ".tiff" -> "image/tiff", ".tif" -> "image/tiff",
    ".ico" -> "image/vnd.microsoft.icon",
    ".ras" -> "image/x-cmu-raster", ".pnm" -> "image/x-portable-anymap",
    ".pbm" -> "image/x-portable-bitmap", ".pgm" -> "image/x-portable-graymap",
    ".ppm" -> "image/x-portable-pixmap", ".rgb" -> "image/x-rgb",
    ".xbm" -> "image/x-xbitmap", ".xpm" -> "image/x-xpixmap",
    ".xwd" -> "image/x-xwindowdump",
    ".eml" -> "message/rfc822", ".mht" -> "message/rfc822",
    ".mhtml" -> "message/rfc822", ".nws" -> "message/rfc822",
    ".css" -> "text/css", ".csv" -> "text/csv",
    ".html" -> "text/html", ".htm" -> "text/html",
    ".n3" -> "text/n3",
    ".txt" -> "text/plain", ".bat" -> "text/plain", ".c" -> "text/plain",
    ".h" -> "text/plain", ".ksh" -> "text/plain", ".pl" -> "text/plain",
    ".srt" -> "text/plain",
    ".rtx" -> "text/richtext", ".tsv" -> "text/tab-separated-values",
    ".vtt" -> "text/vtt", ".py" -> "text/x-python",
    ".etx" -> "text/x-setext", ".sgm" -> "text/x-sgml",
    ".sgml" -> "text/x-sgml", ".vcf" -> "text/x-vcard", ".xml" -> "text/xml",
    ".mp4" -> "video/mp4",
    ".mpeg" -> "video/mpeg", ".m1v" -> "video/mpeg", ".mpa" -> "video/mpeg",
    ".mpe" -> "video/mpeg", ".mpg" -> "video/mpeg",
    ".mov" -> "video/quicktime", ".qt" -> "video/quicktime",
    ".webm" -> "video/webm", ".avi" -> "video/x-msvideo",
    ".movie" -> "video/x-sgi-movie")

  val typesMap: Map[String, String] = ordered.toMap

  /** `mimetypes.encodings_map` / `suffix_map` (shared semantics with
    * [[graft.extract.ResponseTypes]]; duplicated values, same contract). */
  private val encodingsMap: Map[String, String] = Map(
    ".gz" -> "gzip", ".Z" -> "compress", ".bz2" -> "bzip2",
    ".xz" -> "xz", ".br" -> "br")
  private val suffixMap: Map[String, String] = Map(
    ".svgz" -> ".svg.gz", ".tgz" -> ".tar.gz", ".taz" -> ".tar.gz",
    ".tz" -> ".tar.gz", ".tbz2" -> ".tar.bz2", ".txz" -> ".tar.xz")

  /** `mimetypes.guess_type(url)[0]` over the builtin table, including the
    * stdlib's RFC 2397 `data:` branch (`Lib/mimetypes.py` guess_type:
    * mediatype up to `;`/`,`, `text/plain` when it has an `=` or no `/`).
    * Returns null when unguessable. */
  def guessType(url: String): String = {
    // urllib._splittype: ([^/:]+):(.*)
    val colon = url.indexOf(':')
    val (scheme, rest) =
      if (colon > 0 && !url.substring(0, colon).contains('/'))
        (url.substring(0, colon).toLowerCase(java.util.Locale.ROOT),
          url.substring(colon + 1))
      else (null, url)
    if (scheme == "data") {
      val comma = rest.indexOf(',')
      if (comma < 0) return null
      val semi = rest.indexOf(';')
      val tpe =
        if (semi >= 0 && semi < comma) rest.substring(0, semi)
        else rest.substring(0, comma)
      return if (tpe.contains('=') || !tpe.contains('/')) "text/plain" else tpe
    }
    var (base, ext) = graft.extract.ResponseTypes.splitext(rest)
    while (suffixMap.contains(ext.toLowerCase(java.util.Locale.ROOT))) {
      val re = graft.extract.ResponseTypes.splitext(
        base + suffixMap(ext.toLowerCase(java.util.Locale.ROOT)))
      base = re._1; ext = re._2
    }
    if (encodingsMap.contains(ext)) {
      val re = graft.extract.ResponseTypes.splitext(base)
      base = re._1; ext = re._2
    }
    typesMap.getOrElse(ext,
      typesMap.getOrElse(ext.toLowerCase(java.util.Locale.ROOT), null))
  }

  /** `mimetypes.guess_extension`: the first extension mapped to the type in
    * table order. Null for an unknown type. */
  def guessExtension(tpe: String): String =
    if (tpe == null) null
    else ordered.collectFirst { case (e, t) if t == tpe => e }.orNull
}
