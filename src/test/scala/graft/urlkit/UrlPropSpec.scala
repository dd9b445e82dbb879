package graft.urlkit

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for canonicalization (SURVEY.md §5: idempotence,
  * query-order invariance, sanitize/canonicalize composition). */
object UrlPropSpec extends Properties("urlkit") {

  private val word: Gen[String] = for {
    n <- Gen.chooseNum(1, 8)
    cs <- Gen.listOfN(n, Gen.alphaLowerChar)
  } yield cs.mkString

  private val alnumWord: Gen[String] = for {
    n <- Gen.chooseNum(1, 6)
    cs <- Gen.listOfN(n, Gen.alphaNumChar)
  } yield cs.mkString

  private val hostGen: Gen[String] = for {
    n <- Gen.chooseNum(1, 3)
    parts <- Gen.listOfN(n, word)
  } yield parts.mkString(".") + ".test"

  private val segGen: Gen[String] =
    Gen.oneOf(alnumWord,
      Gen.const("a b"), Gen.const("%7Euser"), Gen.const("p%2Fq"), Gen.const("ü"))

  private val kvGen: Gen[(String, String)] = for {
    k <- word
    v <- Gen.oneOf(alnumWord, Gen.const(""), Gen.const("a b"))
  } yield (k, v)

  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("http", "https", "HTTP")
    host <- hostGen
    nSeg <- Gen.chooseNum(0, 4)
    segs <- Gen.listOfN(nSeg, segGen)
    nKv <- Gen.chooseNum(0, 4)
    kvs <- Gen.listOfN(nKv, kvGen)
    frag <- Gen.oneOf("", "#frag", "#a/b")
  } yield {
    val path = if (segs.isEmpty) "" else segs.mkString("/", "/", "")
    val query = if (kvs.isEmpty) "" else
      kvs.map { case (k, v) => if (v.isEmpty) k else s"$k=$v" }.mkString("?", "&", "")
    s"$scheme://$host$path$query$frag"
  }

  property("canonicalize is idempotent") = forAll(urlGen) { url =>
    val c = UrlKit.canonicalizeUrl(UrlKit.safeUrlString(url))
    UrlKit.canonicalizeUrl(c) == c
  }

  property("query order never changes the canonical form") = forAll(
    urlGen, Gen.chooseNum(0, 1000)) { (url, seed) =>
    val split = PyUrl.urlsplit(url)
    val pairs = split.query.split("&").filter(_.nonEmpty).toSeq
    val shuffled = new scala.util.Random(seed).shuffle(pairs).mkString("&")
    val reordered = PyUrl.urlunsplit(split.scheme, split.netloc, split.path, shuffled, split.fragment)
    UrlKit.canonicalizeUrl(UrlKit.safeUrlString(url)) ==
      UrlKit.canonicalizeUrl(UrlKit.safeUrlString(reordered))
  }

  property("fragments never affect the default fingerprint") = forAll(urlGen) { url =>
    val noFrag = url.takeWhile(_ != '#')
    UrlKit.fingerprint(UrlKit.safeUrlString(url)).toSeq ==
      UrlKit.fingerprint(UrlKit.safeUrlString(noFrag)).toSeq
  }

  property("host case never affects the fingerprint") = forAll(urlGen) { url =>
    val split = PyUrl.urlsplit(url)
    val upper = PyUrl.urlunsplit(split.scheme,
      split.netloc.toUpperCase(java.util.Locale.ROOT), split.path, split.query, split.fragment)
    UrlKit.fingerprint(UrlKit.safeUrlString(url)).toSeq ==
      UrlKit.fingerprint(UrlKit.safeUrlString(upper)).toSeq
  }

  property("safeUrlString is idempotent") = forAll(urlGen) { url =>
    val s = UrlKit.safeUrlString(url)
    UrlKit.safeUrlString(s) == s
  }

  property("urljoin with absolute href is canonical-equal to the href") =
    forAll(urlGen, urlGen) { (base, abs) =>
      UrlKit.canonicalizeUrl(UrlKit.safeUrlString(UrlKit.urljoin(base, abs))) ==
        UrlKit.canonicalizeUrl(UrlKit.safeUrlString(abs))
    }
}
