package graft

import graft.urlkit.UrlKit

/** Tiny CLI surface over urlkit for manual inspection / verification:
  *   runMain graft.UrlTool canon <url>
  *   runMain graft.UrlTool safe <url>
  *   runMain graft.UrlTool fp <url> [method]
  *   runMain graft.UrlTool join <base> <href>
  *   runMain graft.UrlTool host <url>
  */
object UrlTool {
  def main(args: Array[String]): Unit = args.toList match {
    case "canon" :: url :: Nil => println(UrlKit.canonicalizeUrl(url))
    case "safe" :: url :: Nil => println(UrlKit.safeUrlString(url))
    case "fp" :: url :: rest =>
      val method = rest.headOption.getOrElse("GET")
      println(UrlKit.toHex(UrlKit.fingerprint(UrlKit.safeUrlString(url), method)))
    case "join" :: base :: href :: Nil => println(UrlKit.urljoin(base, href))
    case "host" :: url :: Nil => println(UrlKit.hostOf(url))
    case other =>
      System.err.println(s"usage: UrlTool canon|safe|fp|join|host ... (got: $other)")
      sys.exit(2)
  }
}
