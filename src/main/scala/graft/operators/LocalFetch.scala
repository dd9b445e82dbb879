package graft.operators

import graft.urlkit.DataUri

/** Non-HTTP download-handler dispatch (contract step 6e) — the batch analogue
  * of the reference's per-scheme DOWNLOAD_HANDLERS table
  * (`scrapy/core/downloader/handlers/__init__.py:32-107`):
  *
  *  - `data:` → DataURIDownloadHandler (`handlers/datauri.py:15-28`): the
  *    response body is parsed out of the URI itself; an invalid URI is the
  *    handler's ValueError — a download exception that is NOT retried
  *    (ValueError is not in the retry middleware's exception list).
  *  - `file:` → FileDownloadHandler (`handlers/file.py:16-24`): the body is
  *    read from the local filesystem (w3lib `file_uri_to_path`); a missing/
  *    unreadable file raises OSError — a download exception that IS retried
  *    (IOError is in `retry.py`'s EXCEPTIONS_TO_RETRY).
  *
  * Both schemes skip robots.txt entirely (`downloadermiddlewares/robotstxt
  * .py:59-61` checks the URL prefix before anything else) and share the ""
  * politeness slot (slot key = `urlparse(url).hostname or ""`,
  * `core/downloader/__init__.py:169-177`). `file:` responses are never
  * HTTP-cached (HTTPCACHE_IGNORE_SCHEMES defaults to `["file"]`,
  * `default_settings.py`); `data:` responses are cacheable.
  *
  * Link extraction happens only for HTML responses, decided by the shared
  * [[graft.extract.ResponseTypes]] authority exactly like the reference
  * handlers: `from_mimetype(media_type)` for data URIs
  * (`handlers/datauri.py:19-27`), `from_args(filename, body)` for files
  * (`handlers/file.py:20-24`) — so an extension-less file whose body sniffs
  * as `<html>` is parsed too (CrawlSpider ignores non-HtmlResponse,
  * `spiders/crawl.py:140-141`).
  *
  * On a real cluster `file:` URLs resolve on the executor that fetches them
  * (exactly like the reference's handler resolving on the machine running
  * the downloader) — the conformance corpus uses a filesystem every task
  * sees. Fetches are pure per-row functions: the dispatch runs inside the
  * fetch batch's `map`, fully distributed.
  */
object LocalFetch {

  /** Fetch-chain response for a local-scheme row: `status` 200 with a body,
    * or 599 = the handler raised (exception, no response object). `isHtml`
    * gates link extraction; `retryExc` marks a retryable exception class;
    * `excClass` is the Python exception class the reference would raise
    * (the `downloader/exception_type_count/<cls>` counter key). */
  final case class LocalResponse(
      status: Int,
      body: Array[Byte],
      isHtml: Boolean,
      retryExc: Boolean,
      excClass: String = null)

  def isLocal(url: String): Boolean =
    url.startsWith("data:") || url.startsWith("file:")

  /** Exception-class counter key for a failed local fetch
    * (`downloader/exception_type_count/<cls>` — stats.py naming). The
    * common-case classes; [[fetch]] discriminates the actual OSError
    * subclass per failure (ADVICE r4). */
  def excType(url: String): String =
    if (url.startsWith("data:")) "builtins.ValueError"
    else "builtins.FileNotFoundError"

  /** w3lib `file_uri_to_path`: the percent-decoded path component. */
  def fileUriToPath(url: String): String = {
    val path = graft.urlkit.PyUrl.urlsplit(url).path
    new String(graft.urlkit.PyUrl.unquoteToBytes(path),
      java.nio.charset.StandardCharsets.UTF_8)
  }

  // handlers/file.py:20-24: respcls = responsetypes.from_args(filename, body)
  private def isHtmlFile(path: String, body: Array[Byte]): Boolean =
    graft.extract.ResponseTypes.fromArgs(filename = path, body = body) ==
      graft.extract.ResponseTypes.RHtml

  /** Dispatch one request. Deterministic for `data:`; `file:` reads the
    * task-local filesystem. */
  def fetch(url: String): LocalResponse = {
    if (url.startsWith("data:")) {
      DataUri.parse(url) match {
        case Right(p) =>
          // handlers/datauri.py:19-27: respcls = responsetypes.from_mimetype
          LocalResponse(200, p.data,
            graft.extract.ResponseTypes.fromMimetype(p.mediaType) ==
              graft.extract.ResponseTypes.RHtml,
            retryExc = false)
        case Left(_) =>
          LocalResponse(599, null, isHtml = false, retryExc = false,
            excClass = "builtins.ValueError")
      }
    } else {
      val path = fileUriToPath(url)
      try {
        val body = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
        LocalResponse(200, body, isHtmlFile(path, body), retryExc = false)
      } catch {
        // discriminate the OSError subclass CPython's open() would raise
        // (ADVICE r4); all are IOError subclasses → retried (retry.py
        // EXCEPTIONS_TO_RETRY)
        case e: java.io.IOException =>
          val cls = e match {
            case _: java.nio.file.NoSuchFileException => "builtins.FileNotFoundError"
            case _: java.nio.file.AccessDeniedException => "builtins.PermissionError"
            case _ if java.nio.file.Files.isDirectory(
              java.nio.file.Paths.get(path)) => "builtins.IsADirectoryError"
            case _ => "builtins.OSError"
          }
          LocalResponse(599, null, isHtml = false, retryExc = true, excClass = cls)
      }
    }
  }
}
