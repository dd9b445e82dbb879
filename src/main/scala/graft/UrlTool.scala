package graft

import graft.urlkit.UrlKit

/** Tiny CLI surface over urlkit for manual inspection / verification:
  *   runMain graft.UrlTool canon <url>
  *   runMain graft.UrlTool safe <url>
  *   runMain graft.UrlTool fp <url> [method]
  *   runMain graft.UrlTool join <base> <href>
  *   runMain graft.UrlTool host <url>
  *   runMain graft.UrlTool curl "<curl command>"
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
    case "curl" :: cmd :: Nil =>
      // Request.from_curl: print the parsed Request kwargs, one per line
      val r = graft.urlkit.Curl.curlToRequest(cmd)
      println(s"method\t${r.method}")
      println(s"url\t${r.url}")
      r.headers.foreach { case (k, v) => println(s"header\t$k: $v") }
      r.cookies.foreach { case (k, v) => println(s"cookie\t$k=$v") }
      r.body.foreach(b => println(s"body\t$b"))
    case "oracle" :: rest =>
      // run the reference-semantics oracle on a canned corpus and print the log
      val spec = rest.headOption.getOrElse("tiny") match {
        case "small" => graft.corpus.Corpus.Small
        case "smallmeta" => // request-meta control seeds (contract 7d)
          graft.corpus.Corpus.Small.copy(metaControlSeeds = true)
        case "smalljar" => // cookiejar-meta seeds over tier-2 cookie traps
          graft.corpus.Corpus.Small.copy(cookieTraps = true,
            cookieJarSeeds = true)
        case "smallform" => // form-submission corpus (contract 7g)
          graft.corpus.Corpus.Small.copy(formPages = true)
        case "smallscheme" => // Location-resolution traps (redirect.py:163-173)
          graft.corpus.Corpus.Small.copy(schemeTrapPages = true)
        case _ => graft.corpus.Corpus.Tiny
      }
      val pages = graft.corpus.Corpus.allPages(spec).map(p => p.url -> p).toMap
      val res = graft.oracle.Oracle.run(
        graft.CrawlConfig(maxEpochs = 50, submitForms = spec.formPages),
        graft.corpus.Corpus.seeds(spec), pages, graft.corpus.Corpus.allRobots(spec))
      res.fetchLog.foreach(f => println(
        s"${f.epoch}\t${f.seq}\t${f.virtualTMs}\t${f.status}\t${f.host}\t${f.url}\t${UrlKit.toHex(f.fp).take(12)}${if (f.isRobots) "\tROBOTS" else ""}"))
      println(s"# epochs=${res.epochs} fetches=${res.fetchLog.size} urlSeen=${res.urlSeen.size}")
      res.counters.toSeq.sortBy(_._1).foreach { case (k, v) => println(s"# $k=$v") }
    case other =>
      System.err.println(s"usage: UrlTool canon|safe|fp|join|host ... (got: $other)")
      sys.exit(2)
  }
}
