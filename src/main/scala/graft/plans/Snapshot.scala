package graft.plans

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Iceberg-like snapshot layout on plain Parquet (no Iceberg jars in the
  * sandbox — SURVEY.md env facts): one data directory per epoch, plus a
  * `v{N}.manifest.json` committed by write-temp + atomic rename. A reader
  * loads the highest committed manifest and only the files it lists, so a
  * killed job resumes from the last complete epoch (exactly-once via
  * idempotent epoch recompute, SURVEY.md §2.10).
  *
  * Manifest carries snapshot id, parent id, per-table directory lists
  * (url_seen is a delta chain with periodic compaction), cumulative
  * counters and lineage (reference CoreStats/JOBDIR analogue,
  * `scrapy/core/scheduler.py:478-496`, `scrapy/extensions/corestats.py`).
  */
final case class Manifest(
    snapshotId: Int, // epoch number
    parentId: Int, // -1 for the first
    frontierDir: String,
    seenDirs: Seq[String], // delta chain, oldest first
    // per-table DELTA CHAINS (oldest first) with periodic compaction — the
    // url_seen pattern applied to every state table (write bytes per epoch
    // O(touched keys), read = chain merge)
    hostStateDirs: Seq[String],
    robotsCacheDirs: Seq[String],
    fetchLogDirs: Seq[String],
    mediaDirs: Seq[String],
    nextFetchSeq: Long,
    frontierCount: Long,
    pageFetches: Long,
    counters: Map[String, Long],
    bloomPath: String = "", // persisted url_seen Bloom shard table (advisory)
    cookieJarDirs: Seq[String] = Nil, // per-host cookie jar delta chain
    httpCacheDirs: Seq[String] = Nil, // stored-response fp delta chain (contract 6d)
    mediaSeenDirs: Seq[String] = Nil, // media_seen delta chain (FILES_EXPIRES)
    // offsite domains_seen delta chain (contract 7h) — disjoint appends
    offsiteDomainsDirs: Seq[String] = Nil,
    // virtual-clock high-water mark across all epochs (contract step 9:
    // CLOSESPIDER_TIMEOUT on virtual time); -1 = no fetch yet
    virtualTMaxMs: Long = -1L,
    // CoreStats finish_reason analogue — set when the run loop exits
    // ("finished" / "closespider_*" / "graft_max_epochs"); "" while running
    finishReason: String = "")

object Snapshot {

  def manifestPath(root: String, id: Int): Path = Paths.get(root, f"v$id%06d.manifest.json")

  /** Schema-migration guard for resuming from snapshots written by an older
    * build: columns the current model added since (e.g. HostState.delayMs,
    * FrontierRow.dontObeyRobots) are backfilled with their semantic defaults
    * before `.as[T]`, instead of failing the resume with an analysis error. */
  def withDefaults(df: org.apache.spark.sql.DataFrame,
      defaults: Seq[(String, org.apache.spark.sql.Column)]): org.apache.spark.sql.DataFrame =
    defaults.foldLeft(df) { case (d, (name, c)) =>
      if (d.columns.contains(name)) d else d.withColumn(name, c)
    }

  // -- minimal JSON (no external deps) --------------------------------------
  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  def write(root: String, m: Manifest): Unit = {
    Files.createDirectories(Paths.get(root))
    val sb = new StringBuilder
    sb.append("{")
    sb.append("\"snapshotId\": ").append(m.snapshotId).append(", ")
    sb.append("\"parentId\": ").append(m.parentId).append(", ")
    sb.append("\"frontierDir\": ").append(jstr(m.frontierDir)).append(", ")
    sb.append("\"seenDirs\": [").append(m.seenDirs.map(jstr).mkString(", ")).append("], ")
    sb.append("\"hostStateDirs\": [").append(m.hostStateDirs.map(jstr).mkString(", ")).append("], ")
    sb.append("\"robotsCacheDirs\": [").append(m.robotsCacheDirs.map(jstr).mkString(", ")).append("], ")
    sb.append("\"fetchLogDirs\": [").append(m.fetchLogDirs.map(jstr).mkString(", ")).append("], ")
    sb.append("\"mediaDirs\": [").append(m.mediaDirs.map(jstr).mkString(", ")).append("], ")
    sb.append("\"bloomPath\": ").append(jstr(m.bloomPath)).append(", ")
    sb.append("\"cookieJarDirs\": [").append(m.cookieJarDirs.map(jstr).mkString(", ")).append("], ")
    sb.append("\"httpCacheDirs\": [").append(m.httpCacheDirs.map(jstr).mkString(", ")).append("], ")
    sb.append("\"mediaSeenDirs\": [").append(m.mediaSeenDirs.map(jstr).mkString(", ")).append("], ")
    sb.append("\"offsiteDomainsDirs\": [").append(m.offsiteDomainsDirs.map(jstr).mkString(", ")).append("], ")
    sb.append("\"virtualTMaxMs\": ").append(m.virtualTMaxMs).append(", ")
    sb.append("\"finishReason\": ").append(jstr(m.finishReason)).append(", ")
    sb.append("\"nextFetchSeq\": ").append(m.nextFetchSeq).append(", ")
    sb.append("\"frontierCount\": ").append(m.frontierCount).append(", ")
    sb.append("\"pageFetches\": ").append(m.pageFetches).append(", ")
    sb.append("\"counters\": {")
    sb.append(m.counters.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${jstr(k)}: $v" }.mkString(", "))
    sb.append("}}")
    val tmp = Paths.get(root, s".tmp-manifest-${m.snapshotId}-${System.nanoTime()}")
    Files.write(tmp, sb.toString.getBytes(UTF_8))
    Files.move(tmp, manifestPath(root, m.snapshotId),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** All committed manifests in snapshot order (one per epoch) — the
    * replay feed for the periodic-stats surface. */
  def loadAll(root: String): Seq[Manifest] = {
    val dir = Paths.get(root)
    if (!Files.isDirectory(dir)) return Nil
    Files.list(dir).iterator().asScala
      .filter(_.getFileName.toString.matches("v\\d+\\.manifest\\.json"))
      .toSeq.sortBy(_.getFileName.toString)
      .map(p => parse(new String(Files.readAllBytes(p), UTF_8)))
  }

  /** Latest committed manifest, if any. */
  def loadLatest(root: String): Option[Manifest] = {
    val dir = Paths.get(root)
    if (!Files.isDirectory(dir)) return None
    val manifests = Files.list(dir).iterator().asScala
      .filter(_.getFileName.toString.matches("v\\d+\\.manifest\\.json"))
      .toSeq
    if (manifests.isEmpty) None
    else Some(parse(new String(Files.readAllBytes(manifests.maxBy(_.getFileName.toString)), UTF_8)))
  }

  // Tiny tolerant parser for the fixed shape we write.
  def parse(json: String): Manifest = {
    def strField(name: String): String = {
      val re = ("\"" + name + "\": \"((?:[^\"\\\\]|\\\\.)*)\"").r
      re.findFirstMatchIn(json).map(m => unescape(m.group(1))).getOrElse(
        throw new IllegalArgumentException(s"manifest missing $name"))
    }
    def numField(name: String): Long = {
      val re = ("\"" + name + "\": (-?\\d+)").r
      re.findFirstMatchIn(json).map(_.group(1).toLong).getOrElse(
        throw new IllegalArgumentException(s"manifest missing $name"))
    }
    def arrField(name: String): Seq[String] = {
      val re = ("\"" + name + "\": \\[([^\\]]*)\\]").r
      re.findFirstMatchIn(json).map { m =>
        "\"((?:[^\"\\\\]|\\\\.)*)\"".r.findAllMatchIn(m.group(1)).map(x => unescape(x.group(1))).toSeq
      }.getOrElse(Seq.empty)
    }
    val countersJson = {
      val i = json.indexOf("\"counters\": {")
      val start = i + "\"counters\": {".length
      val end = json.indexOf('}', start)
      json.substring(start, math.max(end, start))
    }
    val counters = "\"((?:[^\"\\\\]|\\\\.)*)\": (-?\\d+)".r
      .findAllMatchIn(countersJson)
      .map(m => unescape(m.group(1)) -> m.group(2).toLong).toMap
    def optStrField(name: String): String = {
      val re = ("\"" + name + "\": \"((?:[^\"\\\\]|\\\\.)*)\"").r
      re.findFirstMatchIn(json).map(m => unescape(m.group(1))).getOrElse("")
    }
    def optNumField(name: String, default: Long): Long = {
      val re = ("\"" + name + "\": (-?\\d+)").r
      re.findFirstMatchIn(json).map(_.group(1).toLong).getOrElse(default)
    }
    // delta-chain fields: plural arrays (round-4 format), falling back to a
    // pre-round-4 manifest's singular full-table dirs (chain of one)
    def chainField(plural: String, singular: String): Seq[String] = {
      val arr = arrField(plural)
      if (arr.nonEmpty || json.contains("\"" + plural + "\"")) arr
      else Seq(strField(singular))
    }
    val cookieDirs = {
      val arr = arrField("cookieJarDirs")
      if (arr.nonEmpty || json.contains("\"cookieJarDirs\"")) arr
      else Seq(optStrField("cookieJarDir")).filter(_.nonEmpty)
    }
    Manifest(
      numField("snapshotId").toInt, numField("parentId").toInt,
      strField("frontierDir"), arrField("seenDirs"),
      chainField("hostStateDirs", "hostStateDir"),
      chainField("robotsCacheDirs", "robotsCacheDir"),
      arrField("fetchLogDirs"), arrField("mediaDirs"),
      numField("nextFetchSeq"), numField("frontierCount"), numField("pageFetches"),
      counters, optStrField("bloomPath"), cookieDirs, arrField("httpCacheDirs"),
      arrField("mediaSeenDirs"), arrField("offsiteDomainsDirs"),
      // pre-step-9 manifests lack these: resume with the semantic defaults
      optNumField("virtualTMaxMs", -1L), optStrField("finishReason"))
  }

  private def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"' => sb.append('"'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case 'n' => sb.append('\n'); i += 2
          case 'u' =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case o => sb.append(o); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
