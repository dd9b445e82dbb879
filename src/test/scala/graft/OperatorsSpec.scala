package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.Corpus
import graft.extract.Sitemap
import graft.functions.{Similarity, TextFunctions}
import graft.media.{ImageOps, MediaFunctions, Phash}
import graft.operators.AutoThrottle

/** Unit coverage for the auxiliary operators: autothrottle, media/multimodal
  * functions, IVF similarity, sitemap expansion, text near-dup primitives. */
class OperatorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // ---- AutoThrottle --------------------------------------------------------
  test("autothrottle update follows the reference formula and clamps") {
    import AutoThrottle.clampedUpdate
    // target = latency/conc; new = (old+target)/2
    assert(clampedUpdate(5000, 3000, 200, 1.0, 100, 60000) === 4000)
    // never decreases on a non-200 response
    assert(clampedUpdate(5000, 100, 503, 1.0, 100, 60000) === 5000)
    assert(clampedUpdate(5000, 100, 200, 1.0, 100, 60000) === 2550)
    // a non-200 CAN still raise the delay (throttle.py:135-139 only blocks
    // decreases)
    assert(clampedUpdate(1000, 9000, 503, 1.0, 100, 60000) === 9000)
    // `new_delay = max(target_delay, new_delay)`: target above the mean wins
    // (throttle.py:117-119 — problematic-site rule)
    assert(clampedUpdate(1000, 9000, 200, 1.0, 100, 60000) === 9000)
    // clamped to max
    assert(clampedUpdate(60000, 500000, 200, 1.0, 100, 60000) === 60000)
  }

  test("autothrottle per-host dataset update") {
    import spark.implicits._
    val fetches = Seq(
      ("a.test", 1000L, 200), ("a.test", 3000L, 200), ("b.test", 500L, 503))
      .toDF("host", "latencyMs", "status")
    val cur = Seq(AutoThrottle.HostDelay("a.test", 5000L)).toDS()
    val updated = AutoThrottle.updateDelays(spark, fetches, cur)
      .collect().map(d => d.host -> d.delayMs).toMap
    // per-RESPONSE replay in order (reference throttle.py:104-129):
    // 5000 →(1000ms ok)→ 3000 →(3000ms ok)→ 3000
    assert(updated("a.test") === 3000)
    assert(updated("b.test") === 5000) // error → never below start
  }

  // ---- media / multimodal --------------------------------------------------
  test("resize preserves content scale; thumbnails fit the box") {
    val px = Corpus.pixels(Corpus.Tiny, 2)
    val half = MediaFunctions.resize(px, px.w / 2, px.h / 2)
    assert(half.w === px.w / 2 && half.h === px.h / 2)
    // phash of a resize stays close (scale invariance of DCT hash)
    assert(Phash.hamming(Phash.phash64(px), Phash.phash64(half)) <= 10)
    val thumbs = MediaFunctions.thumbnails(px, Map("s" -> ((64, 64))))
    val tp = ImageOps.decode(thumbs("s")).get
    assert(tp.w <= 64 && tp.h <= 64)
    assert(tp.w == 64 || tp.h == 64) // fit-inside touches the box
  }

  test("image features over a binary column (real decode path)") {
    import spark.implicits._
    val rows = (0 until 6).map { i =>
      val img = Corpus.image(Corpus.Tiny, i)
      (img.image_id, img.bytes)
    }
    val df = rows.toDF("image_id", "bytes")
    val feats = MediaFunctions.imageFeatures(spark, df).collect()
    assert(feats.length === 6)
    for (f <- feats) {
      assert(f.w > 0 && f.h > 0)
      assert(f.meanLuma > 0 && f.meanLuma < 255)
      val thumb = ImageOps.decode(f.thumbJpeg).get
      assert(thumb.w <= 64 && thumb.h <= 64)
    }
  }

  test("audio/video features: real JDK decode through the Spark plumbing") {
    import spark.implicits._
    import graft.media.AudioOps
    // real WAV payloads (javax.sound decode), one garbage row that must drop
    val wav1 = AudioOps.encodeWav(AudioOps.sine(440.0, 0.5))          // 4000 frames
    val wav2 = AudioOps.encodeWav(AudioOps.sine(1000.0, 0.25, 16000f)) // 4000 frames
    val gif = ImageOps.encodeGifAnimation(
      (0 until 16).map(i => MediaFunctions.resize(Corpus.pixels(Corpus.Tiny, i), 48, 48)))
    val media = Seq(("m1", wav1), ("m2", wav2), ("junk", Array.tabulate(64)(_.toByte)))
      .toDF("media_id", "bytes")
    val audio = MediaFunctions.audioFeatures(spark, media).collect()
    assert(audio.map(_.media_id).toSet === Set("m1", "m2")) // junk dropped
    val m1 = audio.find(_.media_id == "m1").get
    assert(m1.sampleRate === 8000f && m1.channels === 1 && m1.nFrames === 4000L)
    assert(math.abs(m1.durationSec - 0.5) < 1e-9)
    // 440 Hz sine at amp 0.5: rms = 0.5/√2, zcr = 2·440/8000
    assert(math.abs(m1.rms - 0.5 / math.sqrt(2.0)) < 0.005)
    assert(math.abs(m1.zeroCrossRate - 2.0 * 440.0 / 8000.0) < 0.005)
    // animated GIF: 16 composited frames, every 4th sampled
    val frames = MediaFunctions.sampleFrames(spark, Seq(("v1", gif)).toDF("media_id", "bytes"), everyK = 4).collect()
    assert(frames.map(_.frameIdx).sorted === Array(0, 4, 8, 12))
    // determinism
    val again = MediaFunctions.audioFeatures(spark, media).collect()
    assert(audio.map(_.fingerprint).sorted === again.map(_.fingerprint).sorted)
  }

  // ---- similarity ----------------------------------------------------------
  test("IVF top-k achieves high recall vs brute force on real embeddings") {
    // The testdata embeddings are ISOTROPIC (intra- vs inter-label mean
    // cosine both ≈ 0, measured via DuckDB): with no cluster structure, IVF
    // recall is bounded by ~P(true NN lands in a probed list) — slightly
    // above nProbe/nLists. nProbe=5/nLists=8 clears 0.9 on this geometry;
    // on genuinely clustered data the trained (maximin + deterministic
    // Lloyd) quantizer concentrates neighbors and smaller probe fractions
    // suffice. The adjacent test pins the stronger, data-independent
    // property: IVF == exact ranking within the probed lists.
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = (0L until 10L).toSeq
    val exact = Similarity.bruteTopK(spark, emb, queries, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = Similarity.ivfTopK(spark, emb, queries, k = 3, nLists = 8, nProbe = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.9, s"IVF recall too low: $recall (exact=$exact ivf=$ivf)")
  }

  test("IVF's only error source is probe misses: exact rank within probed lists") {
    import spark.implicits._
    val nLists = 8; val nProbe = 4; val k = 3
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val e = emb.select($"vec_id", $"embedding".cast("array<double>").as("emb"))
    val queries = (0L until 10L).toSeq
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    // replicate the quantizer deterministically, then assert ivfTopK equals
    // the EXACT brute-force ranking restricted to each query's probed lists
    val centroids = Similarity.trainCentroids(spark, e, nLists)
    val assign = Similarity.ivfAssignment(spark, emb, nLists)
      .as[(Long, Int)].collect().toMap
    val vecs = e.as[(Long, Seq[Double])].collect().toMap
    val ivf = Similarity.ivfTopK(spark, emb, queries, k, nLists, nProbe)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    for (q <- queries) {
      val qe = vecs(q)
      val probed = centroids.map { case (lid, c) => (lid, cos(qe, c.toSeq)) }
        .sortBy { case (lid, s) => (-s, lid) }.take(nProbe).map(_._1).toSet
      val expected = vecs.toSeq
        .filter { case (id, _) => id != q && probed.contains(assign(id)) }
        .map { case (id, v) => (id, cos(qe, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(k).map(_._1)
      assert(ivf.getOrElse(q, Seq.empty) === expected, s"query $q probed=$probed")
    }
  }

  // ---- peek ------------------------------------------------------------------
  test("IVF-blocked near-dup finds the true nearest neighbor with high recall") {
    // the 100 TB shape of q_embedding_neardup: candidate set bounded by the
    // nProbe nearest IVF lists instead of a label block (which is O(n²) when
    // labels are few). On the isotropic testdata embeddings recall is
    // governed by P(true nn shares a probed list) — same geometry bound as
    // the ivfTopK test above; the gate has margin below its measured ~0.9.
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val all = (0L until 500L).toSeq
    val exactNN = Similarity.bruteTopK(spark, emb, all, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val blocked = Similarity.ivfNearDup(spark, emb, nLists = 8, nProbe = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(blocked.size === 500, "every vector must get a neighbor")
    val recall = all.count(i => blocked.get(i) == exactNN.get(i)).toDouble / all.size
    assert(recall >= 0.8, s"IVF-blocked near-dup recall too low: $recall")
  }

  test("peek returns each slot's next request under the dequeue comparator") {
    import spark.implicits._
    def fr(url: String, host: String, prio: Int, dEpoch: Int, dParent: Long, dLink: Int) =
      FrontierRow(url, Array[Byte](1), host, prio, 0, isStart = false,
        dEpoch, dParent, dLink, 0, 0, dontFilter = false)
    val frontier = Seq(
      fr("http://a.test/low", "a.test", 0, 1, 1L, 0),
      fr("http://a.test/hi", "a.test", 5, 2, 9L, 3), // priority wins
      fr("http://b.test/old", "b.test", 0, 1, 4L, 0),
      fr("http://b.test/new", "b.test", 0, 3, 7L, 1) // LIFO: newest discovery
    ).toDS()
    val peeked = graft.operators.CrawlEngine
      .peek(spark, CrawlConfig(), frontier)
      .collect().map(r => r.host -> r.url).toMap
    assert(peeked === Map(
      "a.test" -> "http://a.test/hi",
      "b.test" -> "http://b.test/new"))
    // FIFO variant flips the tie-break
    val fifo = graft.operators.CrawlEngine
      .peek(spark, CrawlConfig(queueOrder = "fifo"), frontier)
      .collect().map(r => r.host -> r.url).toMap
    assert(fifo("b.test") === "http://b.test/old")
  }

  // ---- sitemap --------------------------------------------------------------
  test("sitemap: urlset, index recursion, gzip, robots discovery") {
    val urlset =
      "<?xml version=\"1.0\"?><urlset><url><loc>http://h.test/p/1</loc></url>" +
      "<url><loc> http://h.test/p/2 </loc></url></urlset>"
    val p = Sitemap.parse(urlset.getBytes)
    assert(!p.isIndex && p.locs === Seq("http://h.test/p/1", "http://h.test/p/2"))

    val index = "<sitemapindex><sitemap><loc>http://h.test/sm1.xml</loc></sitemap></sitemapindex>"
    assert(Sitemap.parse(index.getBytes).isIndex)

    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(urlset.getBytes); gz.close()
    assert(Sitemap.parse(bos.toByteArray).locs.size === 2)

    assert(Sitemap.sitemapUrlsFromRobots(
      "User-agent: *\nDisallow: /x\nSitemap: http://h.test/sitemap.xml\n")
      === Seq("http://h.test/sitemap.xml"))

    val docs = Map(
      "http://h.test/root.xml" -> index.getBytes,
      "http://h.test/sm1.xml" -> urlset.getBytes)
    assert(Sitemap.expand(docs.get, "http://h.test/root.xml")
      === Seq("http://h.test/p/1", "http://h.test/p/2"))
  }

  // ---- text near-dup primitives ---------------------------------------------
  test("minhash/LSH finds near-duplicate texts; jaccard sanity") {
    val a = "the quick brown fox jumps over the lazy dog again and again today"
    val b = "the quick brown fox jumps over the lazy dog again and again tomorrow"
    val c = "completely different words appear within this unrelated document body"
    assert(TextFunctions.ngramJaccard(a, b) > 0.5)
    assert(TextFunctions.ngramJaccard(a, c) === 0.0)
    val bandsA = TextFunctions.lshBands(TextFunctions.minhashSignature(a)).toSet
    val bandsB = TextFunctions.lshBands(TextFunctions.minhashSignature(b)).toSet
    val bandsC = TextFunctions.lshBands(TextFunctions.minhashSignature(c)).toSet
    assert((bandsA & bandsB).nonEmpty, "near-dups must share an LSH bucket")
    assert((bandsA & bandsC).isEmpty, "unrelated docs must not collide")
    // simhash distance ordering
    val dAB = java.lang.Long.bitCount(TextFunctions.simhash64(a) ^ TextFunctions.simhash64(b))
    val dAC = java.lang.Long.bitCount(TextFunctions.simhash64(a) ^ TextFunctions.simhash64(c))
    assert(dAB < dAC)
  }

  test("duplicate 8-gram fraction: shared passage counted, short docs dropped") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dupngram").toString
    Seq(
      (0L, "a b c d e f g h i j"),     // grams: a..h, b..i, c..j
      (1L, "z z a b c d e f g h"),     // shares exactly "a b c d e f g h"
      (2L, "p q r s t u v w"),         // one unique gram
      (3L, "x y"))                     // < 8 tokens: zero grams, absent row
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_dup_ngram_fraction")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === Map(0L -> ((3L, 1L)), 1L -> ((3L, 1L)), 2L -> ((1L, 0L))))
  }
}
