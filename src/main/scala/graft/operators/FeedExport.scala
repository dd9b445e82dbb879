package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Feed export — reference `scrapy/extensions/feedexport.py:437-739` +
  * exporters (`scrapy/exporters.py:113-375`), re-expressed on the
  * DataFrameWriter. Formats: json (array-of-objects semantics via Spark's
  * json lines — the reference's JsonLinesItemExporter), csv
  * (CsvItemExporter), parquet, xml (XmlItemExporter serialization below).
  * marshal/pickle are CPython object formats with no JVM consumer — out of
  * scope by design (documented, not stubbed).
  *
  * Per-feed features mapped from the reference:
  *  - `itemFilter` — ITEM_FILTER / ItemFilter.accepts (`feedexport.py:48-94`)
  *  - `fields` — FEED_EXPORT_FIELDS projection + column order
  *  - `batchItemCount` — FEED_EXPORT_BATCH_ITEM_COUNT (`feedexport.py:
  *    437-481`): output split into numbered batches of ≤N items, one
  *    directory per batch (the distributed analogue of one file per batch).
  */
object FeedExport {

  final case class Feed(
      format: String, // json | csv | parquet | xml
      itemFilter: Option[Column] = None,
      fields: Seq[String] = Nil,
      batchItemCount: Int = 0,
      // FEED_EXPORT post-processing plugin chain (`scrapy/extensions/
      // postprocessing.py`): gzip | bz2 | xz | lzma, applied in order (data
      // flows through plugin 1 first, so on disk the LAST plugin's framing
      // is outermost). A single gzip/bz2 on a text format uses the
      // DataFrameWriter's distributed compression codec — the scalable
      // path; other chains compress the written part files via
      // commons-compress (plugin parity for formats Hadoop has no codec
      // chain for). parquet is already columnar-compressed and rejects
      // post-processing like the reference rejects it for binary exporters.
      postProcessing: Seq[String] = Nil)

  /** Apply filter + field projection, then write. `orderCols` pins the item
    * order batching counts over (the reference inherits arrival order; a
    * distributed export must say its order out loud). */
  def export(spark: SparkSession, df0: DataFrame, feed: Feed, outDir: String,
      orderCols: Seq[String] = Nil): Unit = {
    require(feed.postProcessing.isEmpty || feed.format != "parquet",
      "post-processing applies to serialized item feeds, not parquet")
    var df = feed.itemFilter.map(df0.filter).getOrElse(df0)
    if (feed.fields.nonEmpty) df = df.select(feed.fields.map(col): _*)

    val batched: DataFrame =
      if (feed.batchItemCount <= 0) df
      else {
        // global item index → batch id (3 narrow jobs; export is offline)
        val ordered = if (orderCols.nonEmpty) df.orderBy(orderCols.map(col): _*) else df
        val schema = ordered.schema
        val withBatch = ordered.rdd.zipWithIndex().map { case (row, i) =>
          org.apache.spark.sql.Row.fromSeq(
            row.toSeq :+ (i / feed.batchItemCount))
        }
        spark.createDataFrame(withBatch,
          schema.add("batch", org.apache.spark.sql.types.LongType))
      }

    // single gzip/bz2 plugin → the writer's own distributed codec
    val writerCodec: Option[String] =
      if (feed.postProcessing.size == 1)
        Map("gzip" -> "gzip", "bz2" -> "bzip2").get(feed.postProcessing.head)
      else None

    def writer(d: DataFrame) = {
      var w = d.write.mode(SaveMode.Overwrite)
        // ScrapyJSONEncoder renders datetime/date as "YYYY-MM-DD HH:MM:SS" /
        // "YYYY-MM-DD" (`utils/serialize.py:22-27`, str()-style, no 'T');
        // the CSV exporter str()s them the same way. Spark's writers default
        // to ISO-8601 'T' forms — pin the reference's instead.
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .option("dateFormat", "yyyy-MM-dd")
      writerCodec.foreach(c => w = w.option("compression", c))
      if (feed.batchItemCount > 0) w.partitionBy("batch") else w
    }

    feed.format match {
      case "json" => writer(batched).json(outDir)
      case "parquet" => writer(batched).parquet(outDir)
      case "csv" => writer(batched).option("header", "true").csv(outDir)
      case "xml" =>
        val dataCols = batched.columns.filter(_ != "batch")
        val doc = batched.select(
          (if (feed.batchItemCount > 0) Seq(col("batch")) else Seq.empty) :+
            xmlItem(dataCols).as("value"): _*)
        writer(doc).text(outDir)
      case other => throw new IllegalArgumentException(s"unknown feed format $other")
    }

    if (feed.postProcessing.nonEmpty && writerCodec.isEmpty)
      PostProcessing.compressDir(outDir, feed.postProcessing)
  }

  /** One `<item>` element per row (XmlItemExporter `exporters.py:113-152`):
    * `<item><field>escaped</field>…</item>`, null fields omitted. Files are
    * item streams; `XmlRoot` wraps them into a complete document. */
  def xmlItem(fields: Seq[String]): Column =
    concat(
      lit("<item>"),
      concat(fields.map { f =>
        when(col(f).isNull, lit(""))
          .otherwise(concat(lit(s"<$f>"), xmlEscape(col(f).cast("string")), lit(s"</$f>")))
      }: _*),
      lit("</item>"))

  val XmlRoot: (String, String) = ("<?xml version=\"1.0\" encoding=\"utf-8\"?>\n<items>", "</items>")

  private def xmlEscape(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c,
      lit("&"), lit("&amp;")), lit("<"), lit("&lt;")), lit(">"), lit("&gt;"))
}

/** Feed post-processing plugin chain — reference
  * `scrapy/extensions/postprocessing.py:15-166` (GzipPlugin, Bz2Plugin,
  * LZMAPlugin + PostProcessingManager chaining). Data flows through the
  * plugins in declaration order (plugin 1 compresses first, the last plugin
  * writes to disk), so a chain `[gzip, bz2]` produces `bz2(gzip(data))` on
  * disk — mirrored here by wrapping output streams in reverse order.
  * Backed by commons-compress (ships with Spark). */
object PostProcessing {

  import java.io.OutputStream
  import org.apache.commons.compress.compressors.bzip2.{BZip2CompressorInputStream, BZip2CompressorOutputStream}
  import org.apache.commons.compress.compressors.gzip.{GzipCompressorInputStream, GzipCompressorOutputStream}
  import org.apache.commons.compress.compressors.lzma.{LZMACompressorInputStream, LZMACompressorOutputStream}
  import org.apache.commons.compress.compressors.xz.{XZCompressorInputStream, XZCompressorOutputStream}

  val Extensions: Map[String, String] =
    Map("gzip" -> "gz", "bz2" -> "bz2", "xz" -> "xz", "lzma" -> "lzma")

  private def wrapOut(plugin: String, out: OutputStream): OutputStream = plugin match {
    case "gzip" => new GzipCompressorOutputStream(out)
    case "bz2" => new BZip2CompressorOutputStream(out)
    case "xz" => new XZCompressorOutputStream(out)
    case "lzma" => new LZMACompressorOutputStream(out)
    case other => throw new IllegalArgumentException(s"unknown plugin $other")
  }

  private def wrapIn(plugin: String, in: java.io.InputStream): java.io.InputStream =
    plugin match {
      case "gzip" => new GzipCompressorInputStream(in)
      case "bz2" => new BZip2CompressorInputStream(in)
      case "xz" => new XZCompressorInputStream(in)
      case "lzma" => new LZMACompressorInputStream(in)
      case other => throw new IllegalArgumentException(s"unknown plugin $other")
    }

  /** Compress one file through the chain; returns the new path (original
    * removed). Extensions accumulate in plugin order like the reference's
    * feed URI conventions. */
  def compressFile(src: java.nio.file.Path, plugins: Seq[String]): java.nio.file.Path = {
    val dst = src.resolveSibling(
      src.getFileName.toString + plugins.map(p => "." + Extensions(p)).mkString)
    var os: OutputStream = java.nio.file.Files.newOutputStream(dst)
    for (p <- plugins.reverse) os = wrapOut(p, os)
    try java.nio.file.Files.copy(src, os) finally os.close()
    java.nio.file.Files.delete(src)
    dst
  }

  /** Post-pass over a written feed dir: every part file (incl. batch
    * subdirs) goes through the chain, in parallel across files. */
  def compressDir(dir: String, plugins: Seq[String]): Unit = {
    import scala.jdk.CollectionConverters._
    val parts = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .iterator().asScala
      .filter(p => java.nio.file.Files.isRegularFile(p) &&
        p.getFileName.toString.startsWith("part-"))
      .toSeq
    // parallel across part files (bounded by the machine; no extra deps)
    parts.toList.asJava.parallelStream().forEach(p => compressFile(p, plugins))
  }

  /** Decompression for tests / consumers: invert the chain. */
  def decompress(path: java.nio.file.Path, plugins: Seq[String]): Array[Byte] = {
    var in: java.io.InputStream = java.nio.file.Files.newInputStream(path)
    for (p <- plugins.reverse) in = wrapIn(p, in)
    try in.readAllBytes() finally in.close()
  }
}

/** item_completed gather — reference MediaPipeline.item_completed
  * (`scrapy/pipelines/media.py:238-272`): collect each item's media results
  * back onto the item row, in a deterministic order. One partial-aggregated
  * groupBy + one key join; no window. */
object ItemGather {
  def gather(items: DataFrame, itemKey: String,
      results: DataFrame, resultKey: String, resultCols: Seq[String]): DataFrame = {
    val gathered = results
      .groupBy(col(resultKey).as(itemKey))
      .agg(sort_array(collect_list(struct(resultCols.map(col): _*))).as("results"))
    items.join(gathered, Seq(itemKey), "left")
  }
}
