package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Feed export — reference `scrapy/extensions/feedexport.py:437-739` +
  * exporters (`scrapy/exporters.py:113-375`), re-expressed on the
  * DataFrameWriter. Formats: json (array-of-objects semantics via Spark's
  * json lines — the reference's JsonLinesItemExporter), csv
  * (CsvItemExporter), parquet, xml (XmlItemExporter serialization below),
  * the CPython binary formats pickle / marshal (PickleItemExporter /
  * MarshalItemExporter, `exporters.py:297-322`) via the byte-for-byte
  * [[Pickle]]/[[PyMarshal]] writers — one `dumps(dict(item))` per row,
  * concatenated per part file exactly like the reference's per-item
  * `dump(..., file)` stream — and pprint (PprintItemExporter,
  * `exporters.py:325-332`) via the byte-for-byte [[PyPprint]] pformat.
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
      format: String, // json | csv | parquet | xml | pickle | marshal | pprint
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
      case "csv" => writer(csvSerialize(batched)).option("header", "true").csv(outDir)
      case "xml" =>
        val schema = batched.schema
        val dataFields = schema.fields.filter(_.name != "batch")
        val doc = batched.select(
          (if (feed.batchItemCount > 0) Seq(col("batch")) else Seq.empty) :+
            xmlItem(dataFields.toIndexedSeq).as("value"): _*)
        writer(doc).text(outDir)
      case "pickle" | "marshal" | "pprint" =>
        writeBinary(batched, feed.format, outDir, feed.batchItemCount > 0, orderCols)
      case other => throw new IllegalArgumentException(s"unknown feed format $other")
    }

    if (feed.postProcessing.nonEmpty &&
        (writerCodec.isEmpty || feed.format == "pickle" ||
          feed.format == "marshal" || feed.format == "pprint"))
      PostProcessing.compressDir(outDir, feed.postProcessing)
  }

  /** Distributed binary item-stream writer for the CPython formats: each
    * partition serializes its rows in order and streams them to ONE part
    * file through the Hadoop FileSystem API (works on local FS and HDFS
    * alike; no driver collect). With batching, batches are range-partitioned
    * so each output file holds whole batches, written under `batch=N/`
    * subdirs mirroring the text writers' `partitionBy("batch")` layout. */
  private def writeBinary(df0: DataFrame, format: String, outDir: String,
      batched: Boolean, orderCols: Seq[String]): Unit = {
    val df =
      if (!batched) df0
      else df0.repartitionByRange(col("batch"))
        .sortWithinPartitions(("batch" +: orderCols).map(col): _*)
    val schema = df.schema
    val conf = new SerHadoopConf(df.sparkSession.sparkContext.hadoopConfiguration)
    // pprint rides the same per-item byte-stream plumbing: the reference
    // PprintItemExporter writes to_bytes(pformat(itemdict) + "\n") per item
    // (`exporters.py:325-332`)
    val dumps: Py => Array[Byte] = format match {
      case "pickle" => Pickle.dumps _
      case "marshal" => PyMarshal.dumps _
      case "pprint" => PyPprint.exportLine _
    }
    val ext = format
    df.rdd.foreachPartition { rows =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val fsRoot = new org.apache.hadoop.fs.Path(outDir)
      val fs = fsRoot.getFileSystem(conf.value)
      val batchIdx = schema.fieldNames.indexOf("batch")
      var curBatch: Long = Long.MinValue
      var out: org.apache.hadoop.fs.FSDataOutputStream = null
      def open(batch: Long): Unit = {
        if (out != null) out.close()
        val p =
          if (batchIdx < 0) new org.apache.hadoop.fs.Path(fsRoot, f"part-$pid%05d.$ext")
          else new org.apache.hadoop.fs.Path(fsRoot, f"batch=$batch/part-$pid%05d.$ext")
        out = fs.create(p, true)
        curBatch = batch
      }
      try {
        rows.foreach { row =>
          val b = if (batchIdx < 0) Long.MinValue + 1 else row.getLong(batchIdx)
          if (out == null || b != curBatch) open(b)
          val item = rowToPy(row, schema, skipIdx = batchIdx)
          out.write(dumps(item))
        }
      } finally if (out != null) out.close()
    }
  }

  /** Row → CPython item dict in schema field order. Field names are
    * interned constants (like spider-code dict keys); values are fresh
    * runtime objects — the convention the [[Py]] writers' goldens pin.
    * datetime/date columns export via the same string render the text
    * exporters use (`utils/serialize.py:22-27` str()-style); pickling real
    * datetime objects would need the copyreg REDUCE protocol, outside the
    * feed value domain. */
  private[operators] def rowToPy(row: org.apache.spark.sql.Row,
      schema: org.apache.spark.sql.types.StructType, skipIdx: Int): Py = {
    val fields = schema.fields.zipWithIndex.collect {
      case (f, i) if i != skipIdx =>
        (Py.PyStr(f.name, interned = true): Py, anyToPy(row.get(i), f.dataType))
    }
    Py.PyDict(fields.toIndexedSeq)
  }

  private def anyToPy(v: Any, dt: org.apache.spark.sql.types.DataType): Py = {
    import org.apache.spark.sql.types._
    if (v == null) return Py.PyNone
    dt match {
      case StringType => Py.PyStr(v.asInstanceOf[String])
      case LongType => Py.int(v.asInstanceOf[Long])
      case IntegerType => Py.int(v.asInstanceOf[Int].toLong)
      case ShortType => Py.int(v.asInstanceOf[Short].toLong)
      case ByteType => Py.int(v.asInstanceOf[Byte].toLong)
      case BooleanType => Py.PyBool(v.asInstanceOf[Boolean])
      case DoubleType => Py.PyFloat(v.asInstanceOf[Double])
      case FloatType => Py.PyFloat(v.asInstanceOf[Float].toDouble)
      case BinaryType => Py.PyBytes(v.asInstanceOf[Array[Byte]])
      case _: DecimalType => Py.PyFloat(v.asInstanceOf[java.math.BigDecimal].doubleValue())
      case DateType => Py.PyStr(v.toString) // yyyy-MM-dd
      case TimestampType =>
        val ts = v.asInstanceOf[java.sql.Timestamp]
        val base = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss").format(ts)
        val micros = ts.getNanos / 1000
        Py.PyStr(if (micros == 0) base else f"$base.$micros%06d")
      case ArrayType(et, _) =>
        Py.PyList(v.asInstanceOf[scala.collection.Seq[Any]].toIndexedSeq.map(anyToPy(_, et)))
      case MapType(kt, vt, _) =>
        Py.PyDict(v.asInstanceOf[scala.collection.Map[Any, Any]].toIndexedSeq
          .map { case (k, mv) => (anyToPy(k, kt), anyToPy(mv, vt)) })
      case st: StructType =>
        rowToPy(v.asInstanceOf[org.apache.spark.sql.Row], st, skipIdx = -1)
      case other => throw new IllegalArgumentException(s"unsupported feed type $other")
    }
  }

  /** Hadoop Configuration is not Serializable; standard wrapper so the
    * executor-side writers can open the right FileSystem. */
  private final class SerHadoopConf(
      @transient var value: org.apache.hadoop.conf.Configuration) extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject(); value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new org.apache.hadoop.conf.Configuration(false)
      value.readFields(in)
    }
  }

  /** CsvItemExporter value serialization (`exporters.py:234-244`
    * `_join_if_needed` + BaseItemExporter str()): a multivalued field of
    * strings joins with "," (the writer's quoting then wraps embedded
    * commas); a multivalued field of non-strings renders as the Python
    * `str(list)` form `[4, 8]`; booleans render `True`/`False` like
    * `str(bool)`. Timestamps/dates ride the writer's reference-format
    * options. All column expressions — stays in whole-stage codegen. */
  private def csvSerialize(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    val cols = df.schema.fields.map { f =>
      val c = col(f.name)
      (f.dataType match {
        case ArrayType(StringType, _) => array_join(c, ",")
        case ArrayType(et, _) =>
          concat(lit("["), array_join(transform(c, e => pyStr(e, et)), ", "), lit("]"))
        case BooleanType => pyStr(c, BooleanType)
        case _ => c
      }).as(f.name)
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Python `str(value)` render for scalar leaves. */
  private def pyStr(c: Column, dt: org.apache.spark.sql.types.DataType): Column =
    dt match {
      case org.apache.spark.sql.types.BooleanType =>
        when(c.isNull, lit(null: String)).when(c, lit("True")).otherwise(lit("False"))
      case _ => c.cast("string")
    }

  /** One `<item>` element per row (XmlItemExporter `exporters.py:113-152`):
    * `<item><field>escaped</field>…</item>`, null fields omitted.
    * Reference `_export_xml_field` recursion: a dict-valued field nests
    * child elements, a multivalued field wraps each element in `<value>`,
    * scalars are str()'d (booleans `True`/`False`) and escaped. Files are
    * item streams; `XmlRoot` wraps them into a complete document. */
  def xmlItem(fields: Seq[org.apache.spark.sql.types.StructField]): Column =
    concat(
      lit("<item>"),
      concat(fields.map(f => xmlField(col(f.name), f.name, f.dataType)): _*),
      lit("</item>"))

  private def xmlField(c: Column,
      name: String, dt: org.apache.spark.sql.types.DataType): Column =
    when(c.isNull, lit(""))
      .otherwise(concat(lit(s"<$name>"), xmlValue(c, dt), lit(s"</$name>")))

  private def xmlValue(c: Column,
      dt: org.apache.spark.sql.types.DataType): Column = {
    import org.apache.spark.sql.types._
    dt match {
      case ArrayType(et, _) =>
        array_join(transform(c, e =>
          concat(lit("<value>"), xmlValue(e, et), lit("</value>"))), "")
      case st: StructType =>
        concat(st.fields.map(f => xmlField(c.getField(f.name), f.name, f.dataType))
          .toIndexedSeq: _*)
      case BooleanType => pyStr(c, BooleanType)
      case _ => xmlEscape(c.cast("string"))
    }
  }

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
