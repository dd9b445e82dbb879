package graft.media

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal column operators over binary payload columns — ALL REAL
  * decode paths using JDK-builtin codecs (no external libraries):
  *   - images: javax.imageio decode / resize / thumbnails, mirroring the
  *     reference's ImagesPipeline convert path
  *     (`scrapy/pipelines/images.py:144-210`);
  *   - audio: javax.sound.sampled — WAV/AIFF/AU containers, PCM + µ-law +
  *     a-law payloads, normalized to 16-bit PCM ([[AudioOps]]);
  *   - video-ish: multi-frame animated GIF via the ImageIO reader with
  *     GIF89a frame compositing ([[ImageOps.decodeFrames]]).
  * Formats that genuinely need external codecs (mp3/aac, mp4/h264/vp9) are
  * documented out of scope for this container — the plumbing (binary in,
  * typed feature struct out, mapPartitions batching, flatMap frame fan-out)
  * is format-agnostic and they'd slot into the same Option-decode contract.
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

  final case class ImageDownloadResult(
      url: String, path: String, checksum: String,
      width: Int, height: Int, status: String)

  /** `ImagesPipeline.image_downloaded` (`images.py:120-141`) for one row:
    * run the get_images chain, persist the full image AND every thumbnail
    * into `store` (meta `{width,height}` is carried in the result row; the
    * store layer's header hook is S3-only), return the md5 checksum of the
    * FULL image's bytes. A gate failure (too small / undecodable) becomes a
    * `status` carrying the reference's ImageException message — the
    * media_failed path — with nothing persisted. */
  def imageDownloadedRow(url: String, bytes: Array[Byte],
      store: graft.operators.FilesStore.FsFilesStore,
      minWidth: Int = 0, minHeight: Int = 0,
      thumbs: Seq[(String, (Int, Int))] = Nil): ImageDownloadResult =
    ImagesPipeline.getImages(url, bytes, minWidth, minHeight, thumbs) match {
      case Left(msg) =>
        ImageDownloadResult(url, null, null, 0, 0, msg)
      case Right(rows) =>
        rows.foreach { case (path, _, buf) => store.persistFile(path, buf) }
        val (path, img, buf) = rows.head
        ImageDownloadResult(url, path, ImageOps.md5Hex(buf),
          img.w, img.h, "downloaded")
    }

  /** The distributed `image_downloaded` stage: each partition persists the
    * files its rows produced (FILES_STORE must be a shared filesystem on a
    * real cluster — the reference's assumption too) and yields one result
    * row per input. Narrow map, no shuffle; pairs with an exact-dedup or
    * URL-seen stage upstream so each file is written once. */
  def persistImages(spark: SparkSession, images: DataFrame, storeUri: String,
      minWidth: Int = 0, minHeight: Int = 0,
      thumbs: Seq[(String, (Int, Int))] = Nil): Dataset[ImageDownloadResult] = {
    import spark.implicits._
    images.select($"url", $"bytes").as[(String, Array[Byte])]
      .mapPartitions { it =>
        val store = graft.operators.FilesStore.FsFilesStore(storeUri)
        it.map { case (u, b) =>
          imageDownloadedRow(u, b, store, minWidth, minHeight, thumbs) }
      }
  }

  final case class AudioFeatures(
      media_id: String, sampleRate: Float, channels: Int, nFrames: Long,
      durationSec: Double, rms: Double, zeroCrossRate: Double, fingerprint: Long)

  /** REAL audio feature extraction over a binary column: javax.sound
    * decode to 16-bit PCM (WAV/AIFF/AU, µ-law/a-law — [[AudioOps.decode]]),
    * then duration / RMS energy / zero-crossing rate (the standard cheap
    * quality-filter signals) and a deterministic sample fingerprint.
    * Undecodable payloads drop out (Option contract, same as images). */
  def audioFeatures(spark: SparkSession, media: DataFrame): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.select($"media_id", $"bytes").as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          AudioOps.decode(bytes).map { s =>
            AudioFeatures(id, s.sampleRate, s.channels, s.nFrames, s.durationSec,
              AudioOps.rms(s.data), AudioOps.zeroCrossRate(s.data),
              s.data.take(256).foldLeft(0L)((h, v) => h * 1000003L + v))
          }
        }
      }
  }

  final case class FrameSample(media_id: String, frameIdx: Int, phash: Long)

  /** REAL video-frame sampling over a binary column: every k-th composited
    * frame of a multi-frame container (animated GIF — the JDK-native case,
    * [[ImageOps.decodeFrames]]), phash per sampled frame. One blob fans out
    * to several typed rows (flatMap); single-frame images yield their one
    * frame; undecodable payloads yield none. */
  def sampleFrames(spark: SparkSession, media: DataFrame, everyK: Int = 10): Dataset[FrameSample] = {
    import spark.implicits._
    media.select($"media_id", $"bytes").as[(String, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val frames = ImageOps.decodeFrames(bytes)
        (0 until frames.length by everyK).map { f =>
          FrameSample(id, f, Phash.phash64(frames(f)))
        }
      }
  }
}
