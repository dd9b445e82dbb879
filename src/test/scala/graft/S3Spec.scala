package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{S3Auth, S3Fetch}

/** Port of the reference S3 download-handler battery
  * (`tests/test_downloader_handlers.py` TestS3Anon + TestS3) — the expected
  * Authorization values are the worked signing examples of the public 2006
  * AWS S3 developer guide, which is where the reference test file says it
  * took them from. The reference mocks `botocore.auth.formatdate` to pin
  * the signing date; here the date is an explicit `prepare` parameter. */
class S3Spec extends AnyFunSuite {

  // the AWS developer-guide example credentials the reference tests use
  private val AccessKey = "0PN5J17HBGZHT7JJ3X82"
  private val SecretKey = "uV3F3YluFJax1cknvbcGwgjvx4QpvB+leU8dUj2o"

  private def sign(url: String, date: String, method: String = "GET",
      headers: Vector[(String, String)] = Vector.empty): String = {
    val p = S3Fetch.prepare(url, method = method, headers = headers,
      accessKey = Some(AccessKey), secretKey = Some(SecretKey), date = date)
    p.headers.collectFirst { case (k, v) if k == "Authorization" => v }.get
  }

  test("anon request rewrites to the virtual-hosted URL (test_anon_request)") {
    // no credentials configured -> implicit anon=True
    val p = S3Fetch.prepare("s3://aws-publicdatasets/")
    assert(p.anon)
    assert(p.url === "http://aws-publicdatasets.s3.amazonaws.com/")
    assert(p.headers.isEmpty)
  }

  test("is_secure meta selects https") {
    assert(S3Fetch.prepare("s3://aws-publicdatasets/", isSecure = true).url ===
      "https://aws-publicdatasets.s3.amazonaws.com/")
  }

  test("explicit anon=false with credentials still signs; explicit anon=true never does") {
    val signed = S3Fetch.prepare("s3://b/k", accessKey = Some(AccessKey),
      secretKey = Some(SecretKey), anon = Some(false),
      date = "Tue, 27 Mar 2007 19:36:42 +0000")
    assert(signed.headers.exists(_._1 == "Authorization"))
    val anon = S3Fetch.prepare("s3://b/k", accessKey = Some(AccessKey),
      secretKey = Some(SecretKey), anon = Some(true))
    assert(!anon.headers.exists(_._1 == "Authorization"))
  }

  test("GET object (test_request_signing1)") {
    assert(sign("s3://johnsmith/photos/puppy.jpg",
      "Tue, 27 Mar 2007 19:36:42 +0000") ===
      "AWS 0PN5J17HBGZHT7JJ3X82:xXjDGYUmKxnwqr5KXNPGldn5LbA=")
  }

  test("PUT object (test_request_signing2)") {
    assert(sign("s3://johnsmith/photos/puppy.jpg",
      "Tue, 27 Mar 2007 21:15:45 +0000", method = "PUT",
      headers = Vector(
        "Content-Type" -> "image/jpeg",
        "Date" -> "Tue, 27 Mar 2007 21:15:45 +0000",
        "Content-Length" -> "94328")) ===
      "AWS 0PN5J17HBGZHT7JJ3X82:hcicpDDvL9SsO6AkvxqmIWkmOuQ=")
  }

  test("list bucket: uninteresting query args stay out of the resource (test_request_signing3)") {
    assert(sign("s3://johnsmith/?prefix=photos&max-keys=50&marker=puppy",
      "Tue, 27 Mar 2007 19:42:41 +0000",
      headers = Vector(
        "User-Agent" -> "Mozilla/5.0",
        "Date" -> "Tue, 27 Mar 2007 19:42:41 +0000")) ===
      "AWS 0PN5J17HBGZHT7JJ3X82:jsRt/rhG+Vtp88HrYL706QhE4w4=")
  }

  test("acl sub-resource (test_request_signing4)") {
    assert(sign("s3://johnsmith/?acl", "Tue, 27 Mar 2007 19:44:46 +0000",
      headers = Vector("Date" -> "Tue, 27 Mar 2007 19:44:46 +0000")) ===
      "AWS 0PN5J17HBGZHT7JJ3X82:thdUi9VAkzhkniLj96JIrOPGi0g=")
  }

  test("CNAME bucket with x-amz metadata (test_request_signing6)") {
    assert(sign("s3://static.johnsmith.net:8080/db-backup.dat.gz",
      "Tue, 27 Mar 2007 21:06:08 +0000", method = "PUT",
      headers = Vector(
        "User-Agent" -> "curl/7.15.5",
        "Host" -> "static.johnsmith.net:8080",
        "Date" -> "Tue, 27 Mar 2007 21:06:08 +0000",
        "x-amz-acl" -> "public-read",
        "content-type" -> "application/x-download",
        "Content-MD5" -> "4gJE4saaMU4BqNR0kLY+lw==",
        "X-Amz-Meta-ReviewedBy" -> "joe@johnsmith.net,jane@johnsmith.net",
        "X-Amz-Meta-FileChecksum" -> "0x02661779",
        "X-Amz-Meta-ChecksumAlgorithm" -> "crc32",
        "Content-Disposition" -> "attachment; filename=database.dat",
        "Content-Encoding" -> "gzip",
        "Content-Length" -> "5913339")) ===
      "AWS 0PN5J17HBGZHT7JJ3X82:C0FlOtU8Ylb9KDTpZqYkZPX91iI=")
  }

  test("spaces are quoted before signing (test_request_signing7)") {
    assert(sign(
      "s3://johnsmith/photos/my puppy.jpg?response-content-disposition=my puppy.jpg",
      "Tue, 27 Mar 2007 19:42:41 +0000") ===
      "AWS 0PN5J17HBGZHT7JJ3X82:+CfvG8EZ3YccOrRVMXNaK2eKZmM=")
  }

  test("signed requests go out on the virtual-hosted URL with the signing Date") {
    val p = S3Fetch.prepare("s3://johnsmith/photos/puppy.jpg",
      accessKey = Some(AccessKey), secretKey = Some(SecretKey),
      headers = Vector("Date" -> "stale value"),
      date = "Tue, 27 Mar 2007 19:36:42 +0000")
    assert(p.url === "http://johnsmith.s3.amazonaws.com/photos/puppy.jpg")
    // Date is always REPLACED by the signing date (botocore deletes + re-adds)
    assert(p.headers.filter(_._1.equalsIgnoreCase("Date")) ===
      Vector("Date" -> "Tue, 27 Mar 2007 19:36:42 +0000"))
    assert(!p.anon)
  }

  test("session token rides as x-amz-security-token and is signed") {
    val p = S3Fetch.prepare("s3://b/k", accessKey = Some(AccessKey),
      secretKey = Some(SecretKey), sessionToken = Some("tok"),
      date = "Tue, 27 Mar 2007 19:36:42 +0000")
    assert(p.headers.contains("x-amz-security-token" -> "tok"))
    // the token participates in the canonical string as a custom header
    val cs = S3Auth.canonicalString("GET", "/b/k", "",
      Vector("Date" -> "d", "x-amz-security-token" -> "tok"))
    assert(cs === "GET\n\n\nd\nx-amz-security-token:tok\n/b/k")
  }

  test("canonical resource keeps raw names, decodes values, sorts, drops the rest") {
    assert(S3Auth.canonicalString("GET", "/b/", "acl", Vector("Date" -> "d"))
      === "GET\n\n\nd\n/b/?acl")
    assert(S3Auth.canonicalString("GET", "/b/o", "prefix=a&max-keys=10",
      Vector("Date" -> "d")) === "GET\n\n\nd\n/b/o")
    assert(S3Auth.canonicalString("GET", "/b/o",
      "versionId=2&response-content-type=text%2Fplain", Vector("Date" -> "d"))
      === "GET\n\n\nd\n/b/o?response-content-type=text/plain&versionId=2")
  }
}
