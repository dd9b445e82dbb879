package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{FeedExport, ItemGather}

/** Feed-export round trips + per-feed item filter + batching + XML
  * serialization (reference `feedexport.py`/`exporters.py` behaviors). */
class FeedExportSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sample() = {
    import spark.implicits._
    (1 to 10).map(i => (i.toLong, s"http://h${i % 3}.test/p/$i", 200 + (i % 2) * 104))
      .toDF("seq", "url", "status")
  }

  test("json round-trip with item filter and field projection") {
    import spark.implicits._
    val out = TestSpark.tempDir("feed-json")
    FeedExport.export(spark, sample(),
      FeedExport.Feed("json",
        itemFilter = Some(col("status") === 200),
        fields = Seq("seq", "url")), out)
    val back = spark.read.json(out)
    assert(back.count() === 5) // even seq rows have status 200
    assert(back.columns.sorted === Array("seq", "url"))
    assert(back.select("seq").as[Long].collect().sorted === Array(2L, 4L, 6L, 8L, 10L))
  }

  test("csv round-trip with header") {
    val out = TestSpark.tempDir("feed-csv")
    FeedExport.export(spark, sample(), FeedExport.Feed("csv"), out)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(out)
    assert(back.count() === 10)
    assert(back.columns.toSet === Set("seq", "url", "status"))
  }

  test("datetime/date render like ScrapyJSONEncoder (no ISO 'T'), json + csv") {
    // reference golden (`tests/test_utils_serialize.py::test_encode_decode`):
    // datetime(2010,1,2,10,11,12) -> "2010-01-02 10:11:12", date -> "2010-01-02"
    import spark.implicits._
    val df = Seq(1L).toDF("seq")
      .withColumn("dt", to_timestamp(lit("2010-01-02 10:11:12")))
      .withColumn("d", to_date(lit("2010-01-02")))
    def rawText(dir: String): String =
      spark.read.text(dir).as[String].collect().mkString("\n")
    val jout = TestSpark.tempDir("feed-json-dt")
    FeedExport.export(spark, df, FeedExport.Feed("json"), jout)
    assert(rawText(jout).contains("\"dt\":\"2010-01-02 10:11:12\""))
    assert(rawText(jout).contains("\"d\":\"2010-01-02\""))
    val cout = TestSpark.tempDir("feed-csv-dt")
    FeedExport.export(spark, df, FeedExport.Feed("csv"), cout)
    assert(rawText(cout).contains("2010-01-02 10:11:12"))
  }

  test("post-processing: single gzip plugin uses the distributed writer codec") {
    import spark.implicits._
    val out = TestSpark.tempDir("feed-gz")
    FeedExport.export(spark, sample(),
      FeedExport.Feed("json", postProcessing = Seq("gzip")), out)
    val files = new java.io.File(out).listFiles().filter(_.getName.startsWith("part-"))
    assert(files.nonEmpty && files.forall(_.getName.endsWith(".gz")),
      s"expected .gz parts, got ${files.map(_.getName).toSeq}")
    assert(spark.read.json(out).count() === 10) // spark reads the codec back
  }

  test("post-processing: xz and chained gzip+bz2 plugins round-trip") {
    import graft.operators.PostProcessing
    for (chain <- Seq(Seq("xz"), Seq("lzma"), Seq("gzip", "bz2"))) {
      val out = TestSpark.tempDir(s"feed-${chain.mkString("-")}")
      FeedExport.export(spark, sample(),
        FeedExport.Feed("json", postProcessing = chain), out)
      val files = new java.io.File(out).listFiles()
        .filter(_.getName.startsWith("part-")).sortBy(_.getName)
      val wantSuffix = chain.map(p => "." + PostProcessing.Extensions(p)).mkString
      assert(files.nonEmpty && files.forall(_.getName.endsWith(wantSuffix)),
        s"[$chain] expected *$wantSuffix, got ${files.map(_.getName).toSeq}")
      // invert the chain: concatenated lines must be the 10 items
      val lines = files.flatMap { f =>
        new String(PostProcessing.decompress(f.toPath, chain), "UTF-8")
          .split("\n").filter(_.nonEmpty)
      }
      assert(lines.length === 10, s"[$chain] got ${lines.length} items")
      assert(lines.forall(_.contains("\"url\"")))
    }
  }

  test("post-processing rejects parquet (binary, already compressed)") {
    intercept[IllegalArgumentException] {
      FeedExport.export(spark, sample(),
        FeedExport.Feed("parquet", postProcessing = Seq("gzip")),
        TestSpark.tempDir("feed-pq-gz"))
    }
  }

  test("batching splits output into numbered batches of <= N items") {
    import spark.implicits._
    val out = TestSpark.tempDir("feed-batch")
    FeedExport.export(spark, sample(),
      FeedExport.Feed("json", batchItemCount = 4), out, orderCols = Seq("seq"))
    val back = spark.read.json(out) // batch is a partition column
    assert(back.count() === 10)
    val sizes = back.groupBy("batch").count()
      .as[(Long, Long)].collect().toMap
    assert(sizes === Map(0L -> 4L, 1L -> 4L, 2L -> 2L)) // ceil(10/4) batches
    // batch membership follows the declared order
    val b0 = back.filter($"batch" === 0).select("seq").as[Long].collect().sorted
    assert(b0 === Array(1L, 2L, 3L, 4L))
  }

  test("xml items: escaping, null omission, root wrapper") {
    import spark.implicits._
    val df = Seq((1L, "a<b>&c", null: String)).toDF("seq", "title", "note")
    val out = TestSpark.tempDir("feed-xml")
    FeedExport.export(spark, df, FeedExport.Feed("xml"), out)
    val items = spark.read.text(out).as[String].collect()
    assert(items.length === 1)
    assert(items.head ===
      "<item><seq>1</seq><title>a&lt;b&gt;&amp;c</title></item>")
    val (hdr, ftr) = FeedExport.XmlRoot
    val doc = hdr + items.mkString + ftr
    assert(doc.contains("<items><item>") || doc.contains("<items>\n") || doc.startsWith("<?xml"))
  }

  test("item_completed gather collects ordered results per item") {
    import spark.implicits._
    val items = Seq(10L, 20L, 30L).toDF("id")
    val results = Seq((10L, 2, "b"), (10L, 1, "a"), (20L, 1, "c"))
      .toDF("rid", "ord", "name")
    val g = ItemGather.gather(items, "id", results, "rid", Seq("ord", "name"))
      .select($"id", transform($"results", r => r.getField("name")).as("names"))
      .as[(Long, Option[Seq[String]])].collect().toMap
    assert(g(10L) === Some(Seq("a", "b"))) // sorted by (ord, name)
    assert(g(20L) === Some(Seq("c")))
    assert(g(30L) === None) // item with no media results
  }
}
