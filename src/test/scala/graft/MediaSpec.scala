package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.Corpus
import graft.media.{ImageOps, Phash}

/** Image invariants from BASELINE.json input_hint: PNG round-trips
  * byte-exact pixels; JPEG round-trips at PSNR ≥ 40 dB; phash is stable
  * under lossy re-encode; captions byte-equal. */
class MediaSpec extends AnyFunSuite {
  private val spec = Corpus.Tiny

  test("png round-trip is lossless; psnr infinite") {
    val px = Corpus.pixels(spec, 0)
    val decoded = ImageOps.decode(ImageOps.encode(px, "png")).get
    assert(decoded.w === px.w && decoded.h === px.h)
    assert(decoded.rgb.sameElements(px.rgb))
    assert(ImageOps.psnr(px, decoded).isPosInfinity)
  }

  test("jpeg round-trip PSNR >= 40 dB (lossy invariant)") {
    for (i <- 1 to 20 by 2) {
      val px = Corpus.pixels(spec, i)
      val decoded = ImageOps.decode(ImageOps.encode(px, "jpeg")).get
      val p = ImageOps.psnr(px, decoded)
      assert(p >= 40.0, s"img $i psnr $p < 40dB")
    }
  }

  test("phash: identical pixels → identical hash; jpeg decode → close hash") {
    for (i <- 0 until 10) {
      val px = Corpus.pixels(spec, i)
      assert(Phash.phash64(px) === Phash.phash64(px))
      val jp = ImageOps.decode(ImageOps.encode(px, "jpeg")).get
      val d = Phash.hamming(Phash.phash64(px), Phash.phash64(jp))
      assert(d <= 6, s"img $i phash drifted $d bits after jpeg")
    }
  }

  test("phash separates different images") {
    val distinct = (0 until 12).map(i => Phash.phash64(Corpus.pixels(spec, i)))
    val pairs = for {
      a <- distinct.indices; b <- distinct.indices if a < b
      if Corpus.pixels(spec, a).rgb.toSeq != Corpus.pixels(spec, b).rgb.toSeq
    } yield Phash.hamming(distinct(a), distinct(b))
    assert(pairs.count(_ >= 8) >= pairs.size / 2, s"phash not discriminative: $pairs")
  }

  test("image rows carry exact input_hint schema values") {
    val img = Corpus.image(spec, 3) // odd → jpeg
    assert(img.fmt === "jpeg")
    val dec = ImageOps.decode(img.bytes).get
    assert((dec.w, dec.h) === ((img.w, img.h)))
    assert(img.caption === Corpus.caption(spec, 3))
    assert(ImageOps.psnr(Corpus.pixels(spec, 3), dec) >= 40.0)
  }

  test("duplicate images share pixels (phash dedup fixture)") {
    val spec2 = Corpus.Small
    val hashes = (0 until 200).map(i => Phash.phash64(Corpus.pixels(spec2, i)))
    assert(hashes.distinct.size < hashes.size, "corpus should contain near-dup images")
  }
}
