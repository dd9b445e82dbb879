package graft.media

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal column operators: images are REAL (javax.imageio decode,
  * resize, thumbnails — mirroring the reference's ImagesPipeline convert
  * path, `scrapy/pipelines/images.py:144-210`); audio/video decoding has no
  * codec library in this container, so those extractors are clearly-marked
  * deterministic STUBS with production-shaped Spark plumbing (binary column
  * in, typed feature struct out, mapPartitions batching).
  */
object MediaFunctions {

  /** Box-filter resize (deterministic; LANCZOS in the reference — the
    * resampling kernel is a quality knob, not a semantics change). */
  def resize(p: ImageOps.Pixels, outW: Int, outH: Int): ImageOps.Pixels = {
    val out = new Array[Int](outW * outH)
    var ty = 0
    while (ty < outH) {
      val y0 = ty * p.h / outH; val y1 = math.max((ty + 1) * p.h / outH, y0 + 1)
      var tx = 0
      while (tx < outW) {
        val x0 = tx * p.w / outW; val x1 = math.max((tx + 1) * p.w / outW, x0 + 1)
        var r = 0L; var g = 0L; var b = 0L; var n = 0
        var y = y0
        while (y < y1 && y < p.h) {
          var x = x0
          while (x < x1 && x < p.w) {
            val px = p.rgb(y * p.w + x)
            r += (px >> 16) & 0xff; g += (px >> 8) & 0xff; b += px & 0xff
            n += 1
            x += 1
          }
          y += 1
        }
        out(ty * outW + tx) =
          if (n == 0) 0 else (((r / n).toInt << 16) | ((g / n).toInt << 8) | (b / n).toInt)
        tx += 1
      }
      ty += 1
    }
    ImageOps.Pixels(outW, outH, out)
  }

  /** Thumbnail set like IMAGES_THUMBS (`scrapy/pipelines/images.py:192-210`):
    * fit-inside each named box, JPEG-encoded. */
  def thumbnails(p: ImageOps.Pixels, sizes: Map[String, (Int, Int)]): Map[String, Array[Byte]] =
    sizes.map { case (name, (bw, bh)) =>
      val scale = math.min(bw.toDouble / p.w, bh.toDouble / p.h)
      val tw = math.max(1, (p.w * scale).toInt)
      val th = math.max(1, (p.h * scale).toInt)
      name -> ImageOps.encode(resize(p, tw, th), "jpeg")
    }

  final case class ImageFeatures(
      image_id: String, w: Int, h: Int, phash: Long,
      meanLuma: Double, thumbJpeg: Array[Byte])

  /** Real image feature extraction over a binary column — decode, phash,
    * mean luma, 64x64-fit thumbnail. mapPartitions keeps decoder setup
    * per-partition (the batch shape a Pandas-UDF equivalent would use). */
  def imageFeatures(spark: SparkSession, images: DataFrame): Dataset[ImageFeatures] = {
    import spark.implicits._
    images.select($"image_id", $"bytes").as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          ImageOps.decode(bytes).map { px =>
            var luma = 0.0
            for (v <- px.rgb)
              luma += (299 * ((v >> 16) & 0xff) + 587 * ((v >> 8) & 0xff) + 114 * (v & 0xff)) / 1000.0
            ImageFeatures(id, px.w, px.h, Phash.phash64(px),
              luma / px.rgb.length,
              thumbnails(px, Map("small" -> ((64, 64))))("small"))
          }
        }
      }
  }

  final case class AudioFeatures(
      media_id: String, nSamples: Long, meanAmplitude: Double, fingerprint: Long)

  /** STUB audio decode: no audio codec libs in this container. The
    * "decoder" is a deterministic fake (treats the payload as PCM-ish
    * bytes); the Spark plumbing — binary in, typed features out,
    * per-partition batching — is the real production shape. Swap
    * `fakeDecodePcm` for a javax.sound / ffmpeg binding in production. */
  def audioFeatures(spark: SparkSession, media: DataFrame): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.select($"media_id", $"bytes").as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val samples = fakeDecodePcm(bytes)
          val mean = if (samples.isEmpty) 0.0 else samples.map(math.abs(_).toDouble).sum / samples.length
          AudioFeatures(id, samples.length.toLong, mean,
            samples.take(256).foldLeft(0L)((h, s) => h * 1000003L + s))
        }
      }
  }

  /** Deterministic stand-in for an audio decoder (STUB — see above). */
  private def fakeDecodePcm(bytes: Array[Byte]): Array[Short] = {
    val out = new Array[Short](bytes.length / 2)
    var i = 0
    while (i + 1 < bytes.length) {
      out(i / 2) = (((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)).toShort
      i += 2
    }
    out
  }

  final case class FrameSample(media_id: String, frameIdx: Int, phash: Long)

  /** STUB video frame sampling: synthesizes every k-th "frame" from payload
    * slices (no video codecs in-container); real plumbing: one binary blob →
    * several typed frame rows (flatMap fan-out), phash per frame. */
  def sampleFrames(spark: SparkSession, media: DataFrame, everyK: Int = 10): Dataset[FrameSample] = {
    import spark.implicits._
    media.select($"media_id", $"bytes").as[(String, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val frameSize = 256
        val nFrames = math.max(bytes.length / frameSize, 1)
        (0 until nFrames by everyK).map { f =>
          val slice = bytes.slice(f * frameSize, math.min((f + 1) * frameSize, bytes.length))
          val side = math.max(math.sqrt(slice.length.toDouble).toInt, 1)
          val rgb = Array.tabulate(side * side) { i =>
            val b = if (i < slice.length) slice(i) & 0xff else 0
            (b << 16) | (b << 8) | b
          }
          FrameSample(id, f, Phash.phash64(rgb, side, side))
        }
      }
  }
}
