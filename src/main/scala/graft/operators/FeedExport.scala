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
      batchItemCount: Int = 0)

  /** Apply filter + field projection, then write. `orderCols` pins the item
    * order batching counts over (the reference inherits arrival order; a
    * distributed export must say its order out loud). */
  def export(spark: SparkSession, df0: DataFrame, feed: Feed, outDir: String,
      orderCols: Seq[String] = Nil): Unit = {
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

    def writer(d: DataFrame) = {
      val w = d.write.mode(SaveMode.Overwrite)
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
