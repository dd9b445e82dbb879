package graft.media

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Audio codec for the multimodal pipeline — REAL decode via the JDK's
  * javax.sound.sampled (no external codec needed): WAV / AIFF / AU
  * containers with PCM (8/16-bit, LE/BE), µ-law and a-law payloads, mono or
  * multi-channel, any sample rate. Everything is normalized to interleaved
  * 16-bit signed PCM so downstream features are container-independent.
  * Compressed formats (mp3/aac/ogg) would need an external SPI — documented
  * out of scope for this container, same policy as brotli.
  *
  * Reference behavior note: the reference pipeline treats media as opaque
  * bytes + typed metadata (`scrapy/pipelines/files.py` persists, it never
  * decodes); the decode/feature step is the training-data extension the
  * brief asks for, so the semantics here are defined by this contract, not
  * by a reference file.
  */
object AudioOps {

  /** Decoded audio: interleaved 16-bit signed samples (frame-major, channel
    * minor), plus the source container's declared rate/channels. */
  final case class Samples(sampleRate: Float, channels: Int, data: Array[Short]) {
    def nFrames: Long = if (channels == 0) 0L else data.length.toLong / channels
    def durationSec: Double = if (sampleRate == 0f) 0.0 else nFrames / sampleRate.toDouble
  }

  /** Decode any JDK-supported audio container to 16-bit signed PCM.
    * None for payloads that are not recognized audio (mirrors
    * ImageOps.decode's Option contract — undecodable rows drop out of the
    * pipeline instead of poisoning the task). */
  def decode(bytes: Array[Byte]): Option[Samples] = {
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val src = in.getFormat
        val target = new AudioFormat(
          AudioFormat.Encoding.PCM_SIGNED,
          src.getSampleRate, 16, src.getChannels,
          src.getChannels * 2, src.getSampleRate, /*bigEndian=*/ false)
        val pcm =
          if (src.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
            src.getSampleSizeInBits == 16 && !src.isBigEndian) in
          else AudioSystem.getAudioInputStream(target, in)
        val raw = pcm.readAllBytes()
        val out = new Array[Short](raw.length / 2)
        var i = 0
        while (i + 1 < raw.length) {
          out(i / 2) = ((raw(i) & 0xff) | (raw(i + 1) << 8)).toShort
          i += 2
        }
        Some(Samples(src.getSampleRate, src.getChannels, out))
      } finally in.close()
    } catch { case _: Exception => None }
  }

  /** Encode to a RIFF/WAVE container (PCM16LE) — used by specs and corpus
    * synthesis so the decode path is exercised against the JDK's own
    * writer, byte-deterministic for a given input. */
  def encodeWav(s: Samples): Array[Byte] = {
    val fmt = new AudioFormat(s.sampleRate, 16, s.channels, /*signed=*/ true, /*bigEndian=*/ false)
    val raw = new Array[Byte](s.data.length * 2)
    var i = 0
    while (i < s.data.length) {
      raw(2 * i) = (s.data(i) & 0xff).toByte
      raw(2 * i + 1) = ((s.data(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new AudioInputStream(new ByteArrayInputStream(raw), fmt, s.nFrames)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Deterministic mono sine tone — the spec fixture (known RMS =
    * amp/√2·32767 and zero-cross rate = 2·freq/rate analytically). */
  def sine(freqHz: Double, seconds: Double, rate: Float = 8000f, amplitude: Double = 0.5): Samples = {
    val n = (seconds * rate).toInt
    val data = Array.tabulate(n)(i =>
      math.round(amplitude * 32767.0 * math.sin(2.0 * math.Pi * freqHz * i / rate)).toShort)
    Samples(rate, 1, data)
  }

  /** Root-mean-square amplitude in [0,1] (normalized by full scale). */
  def rms(data: Array[Short]): Double = {
    if (data.isEmpty) return 0.0
    var acc = 0.0
    var i = 0
    while (i < data.length) { val v = data(i) / 32768.0; acc += v * v; i += 1 }
    math.sqrt(acc / data.length)
  }

  /** Zero-crossing rate: sign changes per sample (pitch-ish signal for
    * quality filtering; 2·f/rate for a pure tone). */
  def zeroCrossRate(data: Array[Short]): Double = {
    if (data.length < 2) return 0.0
    var n = 0
    var i = 1
    while (i < data.length) {
      if ((data(i - 1) < 0) != (data(i) < 0)) n += 1
      i += 1
    }
    n.toDouble / (data.length - 1)
  }
}
