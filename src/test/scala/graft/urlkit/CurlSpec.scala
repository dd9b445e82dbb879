package graft.urlkit

import org.scalatest.funsuite.AnyFunSuite
import Curl.{CurlRequest, curlToRequest}

/** Golden battery for [[Curl.curlToRequest]], ported from the reference's
  * public `tests/test_utils_curl.py` (every test, same inputs and expected
  * kwargs). */
class CurlSpec extends AnyFunSuite {

  private def b64(userPass: String): String =
    "Basic " + java.util.Base64.getEncoder.encodeToString(
      userPass.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))

  test("get") {
    assert(curlToRequest("curl http://example.org/") ==
      CurlRequest("GET", "http://example.org/"))
  }

  test("get without scheme") {
    assert(curlToRequest("curl www.example.org") ==
      CurlRequest("GET", "http://www.example.org"))
  }

  test("get basic auth") {
    assert(curlToRequest(
      """curl "https://api.test.com/" -u "some_username:some_password"""") ==
      CurlRequest("GET", "https://api.test.com/",
        headers = Seq("Authorization" -> b64("some_username:some_password"))))
  }

  test("get complex: headers, cookie header merge, -b pair, --compressed") {
    val cmd = "curl 'http://httpbin.org/get' -H 'Accept-Encoding: gzip, deflate'" +
      " -H 'Accept-Language: en-US,en;q=0.9,ru;q=0.8,es;q=0.7' -H 'Upgra" +
      "de-Insecure-Requests: 1' -H 'User-Agent: Mozilla/5.0 (X11; Linux " +
      "x86_64) AppleWebKit/537.36 (KHTML, like Gecko) Ubuntu Chromium/62" +
      ".0.3202.75 Chrome/62.0.3202.75 Safari/537.36' -H 'Accept: text/ht" +
      "ml,application/xhtml+xml,application/xml;q=0.9,image/webp,image/a" +
      "png,*/*;q=0.8' -H 'Referer: http://httpbin.org/' -H 'Cookie: _gau" +
      "ges_unique_year=1; _gauges_unique=1; _gauges_unique_month=1; _gau" +
      "ges_unique_hour=1' -H 'Connection: keep-alive' --compressed -b '_" +
      "gauges_unique_day=1'"
    val r = curlToRequest(cmd)
    assert(r.method == "GET")
    assert(r.url == "http://httpbin.org/get")
    assert(r.headers == Seq(
      "Accept-Encoding" -> "gzip, deflate",
      "Accept-Language" -> "en-US,en;q=0.9,ru;q=0.8,es;q=0.7",
      "Upgrade-Insecure-Requests" -> "1",
      "User-Agent" -> ("Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 (KHTML" +
        ", like Gecko) Ubuntu Chromium/62.0.3202.75 Chrome/62.0.32" +
        "02.75 Safari/537.36"),
      "Accept" -> ("text/html,application/xhtml+xml,application/xml;q=0.9,ima" +
        "ge/webp,image/apng,*/*;q=0.8"),
      "Referer" -> "http://httpbin.org/",
      "Connection" -> "keep-alive"))
    assert(r.cookies.toMap == Map(
      "_gauges_unique_year" -> "1",
      "_gauges_unique_hour" -> "1",
      "_gauges_unique_day" -> "1",
      "_gauges_unique" -> "1",
      "_gauges_unique_month" -> "1"))
    assert(r.body.isEmpty)
  }

  test("post") {
    val cmd = "curl 'http://httpbin.org/post' -X POST -H 'Cookie: _gauges_unique" +
      "_year=1; _gauges_unique=1; _gauges_unique_month=1; _gauges_unique" +
      "_hour=1; _gauges_unique_day=1' -H 'Origin: http://httpbin.org' -H" +
      " 'Accept-Encoding: gzip, deflate' -H 'Accept-Language: en-US,en;q" +
      "=0.9,ru;q=0.8,es;q=0.7' -H 'Upgrade-Insecure-Requests: 1' -H 'Use" +
      "r-Agent: Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 (KHTM" +
      "L, like Gecko) Ubuntu Chromium/62.0.3202.75 Chrome/62.0.3202.75 S" +
      "afari/537.36' -H 'Content-Type: application/x-www-form-urlencoded" +
      "' -H 'Accept: text/html,application/xhtml+xml,application/xml;q=0" +
      ".9,image/webp,image/apng,*/*;q=0.8' -H 'Cache-Control: max-age=0'" +
      " -H 'Referer: http://httpbin.org/forms/post' -H 'Connection: keep" +
      "-alive' --data 'custname=John+Smith&custtel=500&custemail=jsmith%" +
      "40example.org&size=small&topping=cheese&topping=onion&delivery=12" +
      "%3A15&comments=' --compressed"
    val r = curlToRequest(cmd)
    assert(r.method == "POST")
    assert(r.url == "http://httpbin.org/post")
    assert(r.body.contains("custname=John+Smith&custtel=500&custemail=jsmith%40exampl" +
      "e.org&size=small&topping=cheese&topping=onion&delivery=12" +
      "%3A15&comments="))
    assert(r.cookies.toMap == Map(
      "_gauges_unique_year" -> "1",
      "_gauges_unique_hour" -> "1",
      "_gauges_unique_day" -> "1",
      "_gauges_unique" -> "1",
      "_gauges_unique_month" -> "1"))
    assert(r.headers == Seq(
      "Origin" -> "http://httpbin.org",
      "Accept-Encoding" -> "gzip, deflate",
      "Accept-Language" -> "en-US,en;q=0.9,ru;q=0.8,es;q=0.7",
      "Upgrade-Insecure-Requests" -> "1",
      "User-Agent" -> ("Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 (KHTML" +
        ", like Gecko) Ubuntu Chromium/62.0.3202.75 Chrome/62.0.32" +
        "02.75 Safari/537.36"),
      "Content-Type" -> "application/x-www-form-urlencoded",
      "Accept" -> ("text/html,application/xhtml+xml,application/xml;q=0.9,ima" +
        "ge/webp,image/apng,*/*;q=0.8"),
      "Cache-Control" -> "max-age=0",
      "Referer" -> "http://httpbin.org/forms/post",
      "Connection" -> "keep-alive"))
  }

  test("post --data-raw") {
    val cmd = "curl 'https://www.example.org/' --data-raw 'excerptLength=200&ena" +
      "bleDidYouMean=true&sortCriteria=ffirstz32xnamez32x201740686%20asc" +
      "ending&queryFunctions=%5B%5D&rankingFunctions=%5B%5D'"
    assert(curlToRequest(cmd) == CurlRequest("POST", "https://www.example.org/",
      body = Some("excerptLength=200&enableDidYouMean=true&sortCriteria=ffirstz3" +
        "2xnamez32x201740686%20ascending&queryFunctions=%5B%5D&ranking" +
        "Functions=%5B%5D")))
  }

  test("post --data-raw with ANSI string prefix $'...'") {
    val cmd = "curl 'https://www.example.org/' --data-raw $'{\"$filters\":\"Filter!\"}'"
    assert(curlToRequest(cmd) == CurlRequest("POST", "https://www.example.org/",
      body = Some("""{"$filters":"Filter!"}""")))
  }

  test("explicit GET with data keeps GET") {
    assert(curlToRequest("curl httpbin.org/anything -X GET --data asdf") ==
      CurlRequest("GET", "http://httpbin.org/anything", body = Some("asdf")))
  }

  test("patch: -u auth appends Authorization after headers") {
    val cmd = "curl \"https://example.com/api/fake\" -u \"username:password\" -H \"Ac" +
      "cept: application/vnd.go.cd.v4+json\" -H \"Content-Type: applicatio" +
      "n/json\" -X PATCH -d '{\"hostname\": \"agent02.example.com\",  \"agent" +
      "_config_state\": \"Enabled\", \"resources\": [\"Java\",\"Linux\"], \"enviro" +
      "nments\": [\"Dev\"]}'"
    val r = curlToRequest(cmd)
    assert(r.method == "PATCH")
    assert(r.url == "https://example.com/api/fake")
    assert(r.headers == Seq(
      "Accept" -> "application/vnd.go.cd.v4+json",
      "Content-Type" -> "application/json",
      "Authorization" -> b64("username:password")))
    assert(r.body.contains("{\"hostname\": \"agent02.example.com\",  \"agent_config_state\"" +
      ": \"Enabled\", \"resources\": [\"Java\",\"Linux\"], \"environments" +
      "\": [\"Dev\"]}"))
  }

  test("delete: quoted -X value") {
    assert(curlToRequest("""curl -X "DELETE" https://www.url.com/page""") ==
      CurlRequest("DELETE", "https://www.url.com/page"))
  }

  test("silent flag ignored") {
    assert(curlToRequest("""curl --silent "www.example.com"""") ==
      CurlRequest("GET", "http://www.example.com"))
  }

  test("too few arguments") {
    val e = intercept[IllegalArgumentException](curlToRequest("curl"))
    assert(e.getMessage.contains("the following arguments are required: url"))
  }

  test("unknown options: ignored by default, raise when asked") {
    assert(curlToRequest("curl --bar --baz http://www.example.com") ==
      CurlRequest("GET", "http://www.example.com"))
    val e = intercept[IllegalArgumentException](
      curlToRequest("curl --bar --baz http://www.example.com",
        ignoreUnknownOptions = false))
    assert(e.getMessage.contains("Unrecognized options:"))
    assert(e.getMessage.contains("--bar"))
    assert(e.getMessage.contains("--baz"))
  }

  test("must start with curl") {
    val e = intercept[IllegalArgumentException](
      curlToRequest("carl -X POST http://example.org"))
    assert(e.getMessage.startsWith("A curl command must start"))
  }

  // ---- shlex unit pins (CPython shlex.split posix semantics) --------------

  test("shlex: quotes, escapes, adjacency") {
    import Curl.shlexSplit
    assert(shlexSplit("a b  c") == Seq("a", "b", "c"))
    assert(shlexSplit("a 'b c' d") == Seq("a", "b c", "d"))
    assert(shlexSplit("""a "b c" d""") == Seq("a", "b c", "d"))
    assert(shlexSplit("""a"b"c""") == Seq("abc"))
    assert(shlexSplit("""x\ y""") == Seq("x y"))
    assert(shlexSplit("""a "x \" y" b""") == Seq("a", """x " y""", "b"))
    assert(shlexSplit("""a "x \n y" b""") == Seq("a", """x \n y""", "b"))
    assert(shlexSplit("$'ab'") == Seq("$ab"))
    assert(shlexSplit("''") == Seq(""))
    intercept[IllegalArgumentException](shlexSplit("'unclosed"))
  }
}
