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

  // ---- audio (javax.sound, real decode) ------------------------------------

  test("wav pcm16 round-trip is sample-exact; rate/channels preserved") {
    import graft.media.AudioOps
    val tone = AudioOps.sine(261.63, 0.3, 22050f, amplitude = 0.8)
    val dec = AudioOps.decode(AudioOps.encodeWav(tone)).get
    assert(dec.sampleRate === 22050f && dec.channels === 1)
    assert(dec.data.sameElements(tone.data)) // PCM16 LE is lossless
  }

  test("stereo interleaved wav: frame count halves the sample count") {
    import graft.media.AudioOps
    val n = 1000
    val interleaved = Array.tabulate(2 * n)(i =>
      if (i % 2 == 0) (i * 13 % 3000).toShort else (-i * 7 % 3000).toShort)
    val dec = AudioOps.decode(AudioOps.encodeWav(AudioOps.Samples(8000f, 2, interleaved))).get
    assert(dec.channels === 2 && dec.nFrames === n.toLong)
    assert(dec.data.sameElements(interleaved))
  }

  test("ulaw wav decodes through the PCM16 conversion chain") {
    import graft.media.AudioOps
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // synthesize a µ-law WAV: PCM16 tone → JDK µ-law converter → WAVE bytes
    val tone = AudioOps.sine(440.0, 0.1)
    val pcmBytes = AudioOps.encodeWav(tone)
    val pcmIn = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(pcmBytes))
    val ulawFmt = new AudioFormat(AudioFormat.Encoding.ULAW, 8000f, 8, 1, 1, 8000f, false)
    val ulawIn = AudioSystem.getAudioInputStream(ulawFmt, pcmIn)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ulawIn, AudioFileFormat.Type.WAVE, bos)
    val dec = AudioOps.decode(bos.toByteArray).get
    assert(dec.nFrames === tone.nFrames)
    // µ-law is lossy but a 440 Hz tone keeps its energy + pitch signals
    assert(math.abs(AudioOps.rms(dec.data) - AudioOps.rms(tone.data)) < 0.01)
    assert(math.abs(AudioOps.zeroCrossRate(dec.data) - 0.11) < 0.01)
  }

  test("non-audio bytes decode to None") {
    import graft.media.AudioOps
    assert(AudioOps.decode(Array.tabulate(256)(_.toByte)).isEmpty)
    assert(AudioOps.decode(Corpus.image(spec, 0).bytes).isEmpty)
  }

  // ---- animated GIF frames (ImageIO multi-frame, real decode) --------------

  test("animated gif: frame count and low-color pixel fidelity") {
    // ≤256-color frames survive GIF palettization exactly
    val frames = (0 until 5).map { f =>
      val colors = Array(0xff0000, 0x00ff00, 0x0000ff, 0xffffff, 0x000000)
      ImageOps.Pixels(32, 32, Array.tabulate(32 * 32)(i => colors((i + f) % colors.length)))
    }
    val decoded = ImageOps.decodeFrames(ImageOps.encodeGifAnimation(frames))
    assert(decoded.length === 5)
    for ((orig, dec) <- frames.zip(decoded)) {
      assert(dec.w === 32 && dec.h === 32)
      assert(dec.rgb.sameElements(orig.rgb), "palettized round-trip must be exact")
    }
  }

  test("single-frame formats yield one frame; junk yields none") {
    val png = ImageOps.encode(Corpus.pixels(spec, 2), "png")
    val one = ImageOps.decodeFrames(png)
    assert(one.length === 1)
    assert(one.head.rgb.sameElements(Corpus.pixels(spec, 2).rgb))
    assert(ImageOps.decodeFrames(Array.tabulate(100)(_.toByte)).isEmpty)
  }

  test("gif frame phashes track the source frames") {
    val frames = (0 until 8).map(i =>
      graft.media.MediaFunctions.resize(Corpus.pixels(Corpus.Small, i * 3), 64, 64))
    val decoded = ImageOps.decodeFrames(ImageOps.encodeGifAnimation(frames))
    assert(decoded.length === 8)
    for ((orig, dec) <- frames.zip(decoded)) {
      val d = Phash.hamming(Phash.phash64(orig), Phash.phash64(dec))
      assert(d <= 10, s"gif palettization drifted phash by $d bits")
    }
  }
}
