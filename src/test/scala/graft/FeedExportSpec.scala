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

  // ── exporter value serialization (reference tests/test_exporters.py) ──

  test("csv: multivalued string field joins with ',' inside writer quoting") {
    // TestCsvItemExporter::test_join_multivalue — '"Mary,Paul",John'
    import spark.implicits._
    val df = Seq(("John", Seq("Mary", "Paul"))).toDF("name", "friends")
    val out = TestSpark.tempDir("feed-csv-join")
    FeedExport.export(spark, df, FeedExport.Feed("csv"), out)
    val lines = spark.read.text(out).as[String].collect()
    assert(lines.contains("John,\"Mary,Paul\""))
  }

  test("csv: multivalued non-string field renders the Python str(list) form") {
    // TestCsvItemExporter::test_join_multivalue_not_strings — '"[4, 8]",John'
    import spark.implicits._
    val df = Seq(("John", Seq(4, 8))).toDF("name", "friends")
    val out = TestSpark.tempDir("feed-csv-join-int")
    FeedExport.export(spark, df, FeedExport.Feed("csv"), out)
    val lines = spark.read.text(out).as[String].collect()
    assert(lines.contains("John,\"[4, 8]\""))
  }

  test("csv: non-string scalars render like str() — bool True/False, datetime") {
    // TestCsvItemExporter::test_nonstring_types_item —
    // "22,False,3.14,2015-01-01 01:01:01"
    import spark.implicits._
    val df = Seq((22, false, 3.14)).toDF("number", "boolean", "float")
      .withColumn("time", to_timestamp(lit("2015-01-01 01:01:01")))
    val out = TestSpark.tempDir("feed-csv-nonstring")
    FeedExport.export(spark, df, FeedExport.Feed("csv"), out)
    val lines = spark.read.text(out).as[String].collect()
    assert(lines.contains("22,False,3.14,2015-01-01 01:01:01"))
  }

  test("xml: multivalued fields wrap elements in <value>") {
    // TestXmlItemExporter::test_multivalued_fields
    import spark.implicits._
    val df = Seq((Seq("John£", "Doe"), Seq(1, 2, 3))).toDF("name", "age")
    val out = TestSpark.tempDir("feed-xml-multi")
    FeedExport.export(spark, df, FeedExport.Feed("xml"), out)
    val items = spark.read.text(out).as[String].collect()
    assert(items.toSeq === Seq(
      "<item><name><value>John£</value><value>Doe</value></name>" +
        "<age><value>1</value><value>2</value><value>3</value></age></item>"))
  }

  test("xml: dict-valued fields nest child elements recursively") {
    // TestXmlItemExporter::test_nested_item
    import spark.implicits._
    // shape: age = {age: {age: "22", name: "foo£hoo"}, name: "bar"}
    val df = Seq("buz").toDF("name")
      .select($"name", struct(
        struct(lit("22").as("age"), lit("foo£hoo").as("name")).as("age"),
        lit("bar").as("name")).as("age"))
    val out = TestSpark.tempDir("feed-xml-nested")
    FeedExport.export(spark, df, FeedExport.Feed("xml"), out)
    val items = spark.read.text(out).as[String].collect()
    assert(items.toSeq === Seq(
      "<item><name>buz</name><age><age><age>22</age>" +
        "<name>foo£hoo</name></age><name>bar</name></age></item>"))
  }

  test("xml: list of dicts — <value> wrapping + inner lists, null fields omitted") {
    // TestXmlItemExporter::test_nested_list_item
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val inner = StructType(Seq(
      StructField("name", StringType),
      StructField("v2", StructType(Seq(StructField("egg", ArrayType(StringType)))))))
    val schema = StructType(Seq(
      StructField("name", StringType), StructField("age", ArrayType(inner))))
    val rows = Seq(Row("buz", Seq(
      Row("foo", null), Row("bar", Row(Seq("spam"))))))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val out = TestSpark.tempDir("feed-xml-nested-list")
    FeedExport.export(spark, df, FeedExport.Feed("xml"), out)
    import spark.implicits._
    val items = spark.read.text(out).as[String].collect()
    assert(items.toSeq === Seq(
      "<item><name>buz</name><age><value><name>foo</name></value>" +
        "<value><name>bar</name><v2><egg><value>spam</value></egg></v2></value></age></item>"))
  }

  // ── CPython binary feeds (PickleItemExporter / MarshalItemExporter) ──

  private def binarySample() = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("url", StringType), StructField("status", IntegerType),
      StructField("size", LongType), StructField("ok", BooleanType),
      StructField("score", DoubleType),
      StructField("tags", ArrayType(StringType)),
      StructField("body", BinaryType), StructField("note", StringType)))
    val rows = Seq(
      Row("http://a.example/", 200, 1234567890123L, true, 0.5,
        Seq("x", "news"), Array[Byte](0, 1, 'a', 'b', 'c'), null),
      Row("http://b.example/é", 404, -1L, false, -2.25,
        Seq.empty[String], Array.empty[Byte], "dup"),
      Row("http://c.example/", 301, null, null, null, null, null, ""))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }

  private def partBytes(dir: String, ext: String): Array[Byte] = {
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .iterator()
    val parts = scala.jdk.CollectionConverters.IteratorHasAsScala(files).asScala
      .filter(p => p.getFileName.toString.startsWith("part-") &&
        p.getFileName.toString.contains(ext))
      .toSeq.sortBy(_.toString)
    parts.flatMap(p => java.nio.file.Files.readAllBytes(p).toSeq).toArray
  }

  private def hex(b: Array[Byte]): String = b.map(x => f"$x%02x").mkString

  test("pickle feed is the byte-for-byte CPython pickle.dump stream") {
    // golden: CPython 3.11 `b''.join(pickle.dumps(row(i), 4) for i in range(3))`
    // over these exact item dicts (runtime-fresh values, interned keys)
    val out = TestSpark.tempDir("feed-pickle")
    FeedExport.export(spark, binarySample(), FeedExport.Feed("pickle"), out)
    assert(hex(partBytes(out, ".pickle")) ===
      "8004957d000000000000007d94288c0375726c948c11687474703a2f2f612e6578616d706c652f948c06737461747573944bc88c0473697a65948a06cb04fb711f018c026f6b94888c0573636f726594473fe00000000000008c0474616773945d94288c0178948c046e65777394658c04626f64799443050001616263948c046e6f7465944e752e" +
      "80049570000000000000007d94288c0375726c948c13687474703a2f2f622e6578616d706c652fc3a9948c06737461747573944d94018c0473697a65944affffffff8c026f6b94898c0573636f72659447c0020000000000008c0474616773945d948c04626f6479944300948c046e6f7465948c0364757094752e" +
      "8004955c000000000000007d94288c0375726c948c11687474703a2f2f632e6578616d706c652f948c06737461747573944d2d018c0473697a65944e8c026f6b944e8c0573636f7265944e8c0474616773944e8c04626f6479944e8c046e6f7465948c0094752e")
  }

  test("marshal feed is the byte-for-byte CPython marshal.dump stream") {
    val out = TestSpark.tempDir("feed-marshal")
    FeedExport.export(spark, binarySample(), FeedExport.Feed("marshal"), out)
    assert(hex(partBytes(out, ".marshal")) ===
      "7bda0375726c7a11687474703a2f2f612e6578616d706c652fda06737461747573e9c8000000da0473697a656c03000000cb04f6637d04da026f6b54da0573636f726567000000000000e03fda04746167735b02000000fa01787a046e657773da04626f647973050000000001616263da046e6f74654e30" +
      "7bda0375726c7513000000687474703a2f2f622e6578616d706c652fc3a9da067374617475736994010000da0473697a65e9ffffffffda026f6b46da0573636f72656700000000000002c0da04746167735b00000000da04626f6479f300000000da046e6f74657a0364757030" +
      "7bda0375726c7a11687474703a2f2f632e6578616d706c652fda06737461747573692d010000da0473697a654eda026f6b4eda0573636f72654eda04746167734eda04626f64794eda046e6f7465da0030")
  }

  test("pickle feed composes with post-processing plugins") {
    import graft.operators.PostProcessing
    val plain = TestSpark.tempDir("feed-pickle-plain")
    FeedExport.export(spark, binarySample(), FeedExport.Feed("pickle"), plain)
    val gz = TestSpark.tempDir("feed-pickle-gz")
    FeedExport.export(spark, binarySample(),
      FeedExport.Feed("pickle", postProcessing = Seq("gzip")), gz)
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(gz)).iterator()
    val parts = scala.jdk.CollectionConverters.IteratorHasAsScala(files).asScala
      .filter(_.getFileName.toString.endsWith(".pickle.gz")).toSeq
    assert(parts.size === 1)
    assert(PostProcessing.decompress(parts.head, Seq("gzip")).toSeq ===
      partBytes(plain, ".pickle").toSeq)
  }

  test("pprint feed is the byte-for-byte CPython PprintItemExporter stream") {
    // golden: CPython 3.11 `"".join(pprint.pformat(d) + "\n" for d in items)`
    // over the same item dicts — note sort_dicts reorders the keys
    val out = TestSpark.tempDir("feed-pprint")
    FeedExport.export(spark, binarySample(), FeedExport.Feed("pprint"), out)
    assert(new String(partBytes(out, ".pprint"), "UTF-8") ===
      "{'body': b'\\x00\\x01abc',\n 'note': None,\n 'ok': True,\n" +
      " 'score': 0.5,\n 'size': 1234567890123,\n 'status': 200,\n" +
      " 'tags': ['x', 'news'],\n 'url': 'http://a.example/'}\n" +
      "{'body': b'',\n 'note': 'dup',\n 'ok': False,\n 'score': -2.25,\n" +
      " 'size': -1,\n 'status': 404,\n 'tags': [],\n" +
      " 'url': 'http://b.example/é'}\n" +
      "{'body': None,\n 'note': '',\n 'ok': None,\n 'score': None,\n" +
      " 'size': None,\n 'status': 301,\n 'tags': None,\n" +
      " 'url': 'http://c.example/'}\n")
  }

  test("binary feed batching writes whole batches under batch=N dirs") {
    import spark.implicits._
    val out = TestSpark.tempDir("feed-marshal-batch")
    FeedExport.export(spark, sample().select("seq", "url"),
      FeedExport.Feed("marshal", batchItemCount = 4), out, orderCols = Seq("seq"))
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).sorted
    assert(dirs === Array("batch=0", "batch=1", "batch=2"))
    // ordered concat equals an unbatched export of the seq-ordered frame
    val ref = TestSpark.tempDir("feed-marshal-ref")
    FeedExport.export(spark,
      sample().select("seq", "url").orderBy("seq").coalesce(1),
      FeedExport.Feed("marshal"), ref)
    val got = dirs.flatMap(d => partBytes(s"$out/$d", ".marshal").toSeq)
    assert(got.toSeq === partBytes(ref, ".marshal").toSeq)
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
