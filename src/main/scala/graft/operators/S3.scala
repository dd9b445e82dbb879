package graft.operators

import java.nio.charset.StandardCharsets

import graft.urlkit.{PyUrl, UrlKit}

/** S3 download handler (reference `core/downloader/handlers/s3.py`, pinned
  * by the `TestS3` / `TestS3Anon` batteries in
  * `tests/test_downloader_handlers.py` — whose expected signatures are the
  * worked examples of the public 2006 AWS S3 developer guide).
  *
  * The reference handler is a REQUEST REWRITE in front of the plain HTTP
  * handler: it never speaks S3 wire protocol itself. It
  *
  *  1. parses `s3://bucket/key?query`,
  *  2. picks `https` when `meta["is_secure"]` else `http` (`s3.py:86`),
  *  3. anonymous mode (explicit `anon=True`, or implicit when neither
  *     access key nor secret is configured, `s3.py:47-50`) just rewrites to
  *     the virtual-hosted URL `{scheme}://{bucket}.s3.amazonaws.com{path}`,
  *  4. otherwise signs a path-style twin
  *     `{scheme}://s3.amazonaws.com/{bucket}{path}` with botocore's
  *     `AUTH_TYPE_MAPS["s3"]` signer (HmacV1 — the classic
  *     `Authorization: AWS <access>:<base64 hmac-sha1>` scheme) and ships
  *     the signed headers on the virtual-hosted URL (`s3.py:88-103`).
  *
  * [[S3Auth]] reimplements botocore's `HmacV1Auth` canonicalization from
  * its published behavior: standard headers (content-md5, content-type,
  * date — the Date header is always REPLACED by the signing-time date,
  * which is why the reference tests mock `botocore.auth.formatdate`;
  * here the caller passes the date explicitly so a crawl signs at its
  * deterministic virtual clock, never the wall clock), sorted lowercased
  * `x-amz-*` custom headers (multi-values comma-joined), and the canonical
  * resource: the still-percent-encoded path plus only the query arguments
  * of interest (sub-resources + `response-*` overrides), name-sorted, with
  * VALUES percent-decoded but NAMES kept raw — exactly HmacV1Auth's
  * `unquote_v` behavior, which `test_request_signing7` ("ensure that
  * spaces are quoted properly before signing") exists to pin.
  *
  * Like [[FtpFetch]] and [[LocalFetch]] this is a pure per-row function:
  * `prepare` turns one s3:// request row into the http(s) request row the
  * fetch chain downloads, so it distributes with the fetch batch and needs
  * no driver-side state.
  */
object S3Auth {

  /** Query-string arguments included in the canonical resource
    * (botocore `HmacV1Auth.QSAOfInterest`). */
  val QSAOfInterest: Set[String] = Set(
    "accelerate", "acl", "cors", "defaultObjectAcl", "location", "logging",
    "partNumber", "policy", "requestPayment", "torrent", "versioning",
    "versionId", "versions", "website", "uploads", "uploadId",
    "response-content-type", "response-content-language", "response-expires",
    "response-cache-control", "response-content-disposition",
    "response-content-encoding", "delete", "lifecycle", "tagging", "restore",
    "storageClass", "notification", "replication", "analytics", "metrics",
    "inventory", "select", "select-type", "object-lock")

  /** `content-md5 \n content-type \n date` — every occurrence of each, in
    * insertion order, stripped; blank when absent. The caller has already
    * replaced Date with the signing date. */
  private def canonicalStandardHeaders(headers: Vector[(String, String)]): String =
    Seq("content-md5", "content-type", "date").map { ih =>
      val vs = headers.collect { case (k, v) if k.toLowerCase == ih => v.trim }
      if (vs.isEmpty) "" else vs.mkString("\n")
    }.mkString("\n")

  /** Lowercased `x-amz-*` headers, multi-values comma-joined in insertion
    * order, lines sorted by header name. */
  private def canonicalCustomHeaders(headers: Vector[(String, String)]): String = {
    val byKey = headers.collect {
      case (k, v) if k.toLowerCase.startsWith("x-amz-") => (k.toLowerCase, v.trim)
    }
    byKey.map(_._1).distinct.sorted
      .map(k => s"$k:${byKey.collect { case (`k`, v) => v }.mkString(",")}")
      .mkString("\n")
  }

  /** Path (still percent-encoded) + `?`-joined QSA of interest: raw names,
    * percent-decoded values, stable-sorted by raw name (`unquote_v`:
    * a bare `?acl` stays a bare name). */
  private[operators] def canonicalResource(path: String, query: String): String = {
    if (query.isEmpty) return path
    val qsa = query.split("&", -1).toVector
      .map { a => val eq = a.indexOf('=');
        if (eq < 0) (a, null: String) else (a.substring(0, eq), a.substring(eq + 1)) }
      .filter { case (n, _) => QSAOfInterest.contains(n) }
    if (qsa.isEmpty) path
    else path + "?" + qsa.sortBy(_._1).map {
      case (n, null) => n
      case (n, v)    => s"$n=${PyUrl.unquote(v)}"
    }.mkString("&")
  }

  /** botocore `HmacV1Auth.canonical_string`: the custom-header block only
    * contributes a line when non-empty. */
  def canonicalString(method: String, path: String, query: String,
      headers: Vector[(String, String)]): String = {
    val custom = canonicalCustomHeaders(headers)
    method.toUpperCase + "\n" +
      canonicalStandardHeaders(headers) + "\n" +
      (if (custom.nonEmpty) custom + "\n" else "") +
      canonicalResource(path, query)
  }

  /** Base64(HMAC-SHA1(secret, stringToSign)). */
  def signString(secret: String, stringToSign: String): String = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA1")
    mac.init(new javax.crypto.spec.SecretKeySpec(
      secret.getBytes(StandardCharsets.UTF_8), "HmacSHA1"))
    java.util.Base64.getEncoder.encodeToString(
      mac.doFinal(stringToSign.getBytes(StandardCharsets.UTF_8)))
  }

  private def deleteCi(headers: Vector[(String, String)], name: String) =
    headers.filterNot(_._1.equalsIgnoreCase(name))

  /** botocore `add_auth` over a path-style URL: replace Date with the
    * signing date, surface the session token as `x-amz-security-token`,
    * compute the signature, inject `Authorization: AWS <access>:<sig>`.
    * Returns the signed header vector. */
  def addAuth(method: String, pathStyleUrl: String,
      headers: Vector[(String, String)], accessKey: String, secretKey: String,
      sessionToken: Option[String], date: String): Vector[(String, String)] = {
    val split = PyUrl.urlsplit(pathStyleUrl)
    var h = deleteCi(headers, "Date") :+ ("Date" -> date)
    sessionToken.foreach { t =>
      h = deleteCi(h, "x-amz-security-token") :+ ("x-amz-security-token" -> t)
    }
    val sig = signString(secretKey, canonicalString(method, split.path, split.query, h))
    deleteCi(h, "Authorization") :+ ("Authorization" -> s"AWS $accessKey:$sig")
  }
}

object S3Fetch {

  /** The rewritten request the HTTP fetch chain downloads. */
  final case class Prepared(url: String, headers: Vector[(String, String)],
      anon: Boolean)

  /** Rewrite one s3:// request into its signed http(s) twin.
    *
    * @param rawUrl    the s3:// request URL (sanitized like the reference
    *                  `Request.__init__` before parsing)
    * @param isSecure  `meta["is_secure"]` → https (default http, `s3.py:86`)
    * @param anon      explicit `anon` kwarg; None = implicit (anonymous when
    *                  no credentials are configured, `s3.py:47-50`)
    * @param date      RFC 1123 signing date — the `botocore.auth.formatdate`
    *                  analogue, supplied by the caller (virtual clock) so
    *                  signing is deterministic
    */
  def prepare(rawUrl: String, method: String = "GET",
      headers: Vector[(String, String)] = Vector.empty,
      isSecure: Boolean = false,
      accessKey: Option[String] = None, secretKey: Option[String] = None,
      sessionToken: Option[String] = None, anon: Option[Boolean] = None,
      date: String = ""): Prepared = {
    val url = UrlKit.safeUrlString(rawUrl)
    val parts = PyUrl.urlsplit(url)
    val bucket = PyUrl.hostname(parts.netloc).getOrElse(
      throw new IllegalArgumentException(s"no bucket in $rawUrl"))
    val path = if (parts.query.nonEmpty) s"${parts.path}?${parts.query}"
               else parts.path
    val scheme = if (isSecure) "https" else "http"
    val virtualHosted = s"$scheme://$bucket.s3.amazonaws.com$path"
    val isAnon = anon.getOrElse(
      accessKey.forall(_.isEmpty) && secretKey.forall(_.isEmpty))
    if (isAnon) Prepared(virtualHosted, headers, anon = true)
    else {
      val signed = S3Auth.addAuth(method, s"$scheme://s3.amazonaws.com/$bucket$path",
        headers, accessKey.get, secretKey.get, sessionToken, date)
      Prepared(virtualHosted, signed, anon = false)
    }
  }
}
