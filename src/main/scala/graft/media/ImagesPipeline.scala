package graft.media

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

import graft.media.ImageOps.Pixels

/** The ImagesPipeline's image-specific semantics
  * (`scrapy/pipelines/images.py:110-231`), as pure per-row functions over
  * payload bytes:
  *
  *  - [[filePath]] / [[thumbPath]] — `full/<sha1(url)>.jpg` and
  *    `thumbs/<id>/<sha1(url)>.jpg` (images are ALWAYS re-encoded JPEG, so
  *    unlike `FilesPipeline.file_path` there is no mimetypes consult,
  *    `images.py:216-231`)
  *  - [[convertImage]] — transparency composited over a WHITE background
  *    (PNG/WEBP RGBA and palette images), everything else converted to RGB;
  *    with a target size the image is aspect-fit; a plain RGB JPEG with no
  *    resize keeps its ORIGINAL bytes ("don't convert JPEGs again")
  *  - [[exifOrientation]] / [[applyOrientation]] / [[decodeOriented]] —
  *    the `ImageOps.exif_transpose` step of `get_images`
  *    (`images.py:146-147`): TIFF tag 274 from a JPEG APP1 segment or a PNG
  *    `eXIf` chunk, then the matching flip/rotate. The crawl engine's decode
  *    path stays orientation-blind (corpus images carry no EXIF; engine and
  *    oracle share [[ImageOps.decode]]) — this is the library surface the
  *    media operators compose.
  *
  * Alpha compositing uses PIL's exact integer blend
  * (`MULDIV255(a,b) = (t = a*b + 128; (t + (t >> 8)) >> 8)`) so the
  * reference test's golden color survives byte-for-byte:
  * (0,127,255,50) over white → (205,230,255).
  */
object ImagesPipeline {

  /** `ImagesPipeline.file_path` (`images.py:216-222`). */
  def filePath(rawUrl: String): String =
    s"full/${graft.operators.FilesStore.mediaGuid(rawUrl)}.jpg"

  /** `ImagesPipeline.thumb_path` (`images.py:224-231`). */
  def thumbPath(rawUrl: String, thumbId: String): String =
    s"thumbs/$thumbId/${graft.operators.FilesStore.mediaGuid(rawUrl)}.jpg"

  /** PIL integer blend primitive (Pillow `ImagingPaste`): exact-match the
    * reference's paste-on-white arithmetic. */
  @inline private def mulDiv255(a: Int, b: Int): Int = {
    val t = a * b + 128
    (t + (t >> 8)) >> 8
  }

  /** One decoded frame plus the facts `convert_image` branches on. */
  final case class Decoded(
      format: String, // ImageIO reader format name, uppercased (JPEG/PNG/GIF)
      hasAlpha: Boolean, // straight or palette transparency
      isPalette: Boolean, // PIL mode "P" analogue (IndexColorModel)
      isRgb: Boolean, // PIL mode "RGB" analogue (3-band, no alpha)
      w: Int,
      h: Int,
      argb: Array[Int]) // full ARGB — alpha preserved, unlike ImageOps.decode

  /** Decode keeping alpha and the container format name. None on
    * undecodable payloads (same contract as [[ImageOps.decode]]). */
  def decodeFull(bytes: Array[Byte]): Option[Decoded] =
    try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        reader.setInput(iis)
        try {
          val fmt = reader.getFormatName.toUpperCase(java.util.Locale.ROOT)
          val img = reader.read(0)
          val w = img.getWidth; val h = img.getHeight
          val argb = new Array[Int](w * h)
          img.getRGB(0, 0, w, h, argb, 0, w)
          val cm = img.getColorModel
          Some(Decoded(fmt, cm.hasAlpha,
            cm.isInstanceOf[java.awt.image.IndexColorModel],
            !cm.hasAlpha && cm.getNumColorComponents == 3, w, h, argb))
        } finally reader.dispose()
      } finally iis.close()
    } catch { case _: Exception => None }

  /** PIL `Image.thumbnail` target size (Pillow ≥ 9 `round_aspect`): floor
    * the box, no-op when the image already fits, then fit the long side and
    * round the short side toward the truer aspect ratio, min 1. */
  private[graft] def thumbnailSize(w: Int, h: Int,
      boxW: Int, boxH: Int): (Int, Int) = {
    if (boxW >= w && boxH >= h) return (w, h)
    val aspect = w.toDouble / h
    def roundAspect(number: Double, err: Int => Double): Int =
      math.max(if (err(math.floor(number).toInt) <= err(math.ceil(number).toInt))
        math.floor(number).toInt else math.ceil(number).toInt, 1)
    if (boxW.toDouble / boxH >= aspect) {
      val x = roundAspect(boxH * aspect,
        n => math.abs(aspect - n.toDouble / boxH))
      (x, boxH)
    } else {
      val y = roundAspect(boxW / aspect,
        n => if (n == 0) 0.0 else math.abs(aspect - boxW.toDouble / n))
      (boxW, y)
    }
  }

  /** `convert_image` (`images.py:176-210`). Returns the converted pixels
    * and the bytes that would be persisted: the ORIGINAL payload for an
    * un-resized RGB JPEG, a fresh JPEG encode otherwise.
    *
    * Branch fidelity: white-composite only for PNG/WEBP images with an
    * alpha channel and for palette images (a non-PNG RGBA, or PIL's
    * LA/CMYK, falls through to the plain RGB conversion — alpha dropped,
    * not composited — exactly like the reference's `elif` chain). */
  def convertImage(bytes: Array[Byte],
      size: Option[(Int, Int)] = None,
      jpegQuality: Float = 0.95f): Option[(Pixels, Array[Byte])] =
    decodeFull(bytes).map(d => convertDecoded(d, bytes, size, jpegQuality))

  private def convertDecoded(d: Decoded, bytes: Array[Byte],
      size: Option[(Int, Int)], jpegQuality: Float): (Pixels, Array[Byte]) = {
    val composite =
      (d.hasAlpha && (d.format == "PNG" || d.format == "WEBP") && !d.isPalette) ||
        d.isPalette
    val rgb = new Array[Int](d.argb.length)
    var i = 0
    while (i < rgb.length) {
      val px = d.argb(i)
      if (composite) {
        val a = (px >>> 24) & 0xff
        val r = mulDiv255(255, 255 - a) + mulDiv255((px >> 16) & 0xff, a)
        val g = mulDiv255(255, 255 - a) + mulDiv255((px >> 8) & 0xff, a)
        val b = mulDiv255(255, 255 - a) + mulDiv255(px & 0xff, a)
        rgb(i) = (r << 16) | (g << 8) | b
      } else rgb(i) = px & 0xffffff // PIL convert("RGB"): alpha dropped
      i += 1
    }
    var px = Pixels(d.w, d.h, rgb)
    size match {
      case Some((bw, bh)) =>
        val (tw, th) = thumbnailSize(d.w, d.h, bw, bh)
        if (tw != d.w || th != d.h) px = MediaFunctions.resize(px, tw, th)
        (px, ImageOps.encode(px, "jpeg", jpegQuality))
      case None if d.format == "JPEG" && !composite && d.isRgb =>
        (px, bytes) // don't convert JPEGs again (images.py:205-206)
      case None =>
        (px, ImageOps.encode(px, "jpeg", jpegQuality))
    }
  }

  /** `get_images` (`images.py:144-173`) as one batch-friendly call:
    * EXIF-transpose, min-size gate (Left = the ImageException message),
    * then the full image and every configured thumbnail as
    * (path, pixels, bytes) rows. Thumbnails convert from the converted
    * image's bytes, like the reference's `convert_image(image, size, buf)`
    * chain. */
  def getImages(url: String, body: Array[Byte],
      minWidth: Int = 0, minHeight: Int = 0,
      thumbs: Seq[(String, (Int, Int))] = Nil)
      : Either[String, Seq[(String, Pixels, Array[Byte])]] = {
    val oriented = transposeBytes(body)
    decodeFull(oriented) match {
      case None => Left("cannot identify image file")
      case Some(d) =>
        if (d.w < minWidth || d.h < minHeight)
          Left(s"Image too small (${d.w}x${d.h} < ${minWidth}x$minHeight)")
        else {
          val (img, buf) = convertDecoded(d, oriented, None, 0.95f)
          val full = (filePath(url), img, buf)
          // thumbnails derive from the converted in-memory image, like the
          // reference's convert_image(image, size, buf) chain
          val thumbRows = thumbs.map { case (id, (bw, bh)) =>
            val (tw, th) = thumbnailSize(img.w, img.h, bw, bh)
            val tp = if (tw != img.w || th != img.h)
              MediaFunctions.resize(img, tw, th) else img
            (thumbPath(url, id), tp, ImageOps.encode(tp, "jpeg"))
          }
          Right(full +: thumbRows)
        }
    }
  }

  // -----------------------------------------------------------------------
  // EXIF orientation (the ImageOps.exif_transpose step)
  // -----------------------------------------------------------------------

  /** TIFF/EXIF tag 274 from a JPEG APP1 (`Exif\0\0`) segment or a PNG
    * `eXIf` chunk. 1 (normal) when absent or unparseable. */
  def exifOrientation(bytes: Array[Byte]): Int = {
    try {
      if (bytes.length > 3 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) {
        // JPEG: walk segments until SOS
        var i = 2
        while (i + 4 <= bytes.length && (bytes(i) & 0xff) == 0xff) {
          val marker = bytes(i + 1) & 0xff
          if (marker == 0xda) return 1 // SOS — no APP1 seen
          val len = ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
          // APP1 payload identifier: the 6 bytes "Exif\0\0"
          if (marker == 0xe1 && i + 4 + 6 <= bytes.length &&
              bytes(i + 4) == 'E' && bytes(i + 5) == 'x' &&
              bytes(i + 6) == 'i' && bytes(i + 7) == 'f' &&
              bytes(i + 8) == 0 && bytes(i + 9) == 0)
            return tiffOrientation(bytes, i + 10, i + 2 + len)
          i += 2 + len
        }
        1
      } else if (bytes.length > 8 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P') {
        // PNG: chunk walk for eXIf
        var i = 8
        while (i + 8 <= bytes.length) {
          val len = ((bytes(i) & 0xff) << 24) | ((bytes(i + 1) & 0xff) << 16) |
            ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
          val tpe = new String(bytes, i + 4, 4,
            java.nio.charset.StandardCharsets.ISO_8859_1)
          if (tpe == "eXIf") return tiffOrientation(bytes, i + 8, i + 8 + len)
          if (tpe == "IEND") return 1
          i += 12 + len
        }
        1
      } else 1
    } catch { case _: Exception => 1 }
  }

  /** Walk IFD0 of a TIFF blob at [start, end) for tag 0x0112. */
  private def tiffOrientation(bytes: Array[Byte], start: Int, end: Int): Int = {
    if (start + 8 > end) return 1
    val little = bytes(start) == 'I' && bytes(start + 1) == 'I'
    def u16(o: Int): Int =
      if (little) (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
      else ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)
    def u32(o: Int): Long =
      if (little) (u16(o) & 0xffffL) | ((u16(o + 2) & 0xffffL) << 16)
      else ((u16(o) & 0xffffL) << 16) | (u16(o + 2) & 0xffffL)
    if (u16(start + 2) != 42) return 1
    val ifd = start + u32(start + 4).toInt
    if (ifd + 2 > end) return 1
    val n = u16(ifd)
    var e = 0
    while (e < n) {
      val entry = ifd + 2 + e * 12
      if (entry + 12 > end) return 1
      if (u16(entry) == 0x0112) {
        val v = u16(entry + 8) // SHORT value lives in the first 2 value bytes
        return if (v >= 1 && v <= 8) v else 1
      }
      e += 1
    }
    1
  }

  /** Apply one of the 8 EXIF orientations (PIL `exif_transpose` transform
    * table). Orientation 1 returns the input unchanged. */
  def applyOrientation(p: Pixels, orientation: Int): Pixels = {
    if (orientation <= 1 || orientation > 8) return p
    val w = p.w; val h = p.h
    val swap = orientation >= 5
    val (ow, oh) = if (swap) (h, w) else (w, h)
    val out = new Array[Int](p.rgb.length)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (tx, ty) = orientation match {
          case 2 => (w - 1 - x, y) // mirror horizontal
          case 3 => (w - 1 - x, h - 1 - y) // rotate 180
          case 4 => (x, h - 1 - y) // mirror vertical
          case 5 => (y, x) // transpose
          case 6 => (h - 1 - y, x) // rotate 90 CW
          case 7 => (h - 1 - y, w - 1 - x) // transverse
          case _ => (y, w - 1 - x) // 8: rotate 270 CW
        }
        out(ty * ow + tx) = p.rgb(y * w + x)
        x += 1
      }
      y += 1
    }
    Pixels(ow, oh, out)
  }

  /** [[ImageOps.decode]] + EXIF transpose — the `get_images` view of a
    * payload. */
  def decodeOriented(bytes: Array[Byte]): Option[Pixels] =
    ImageOps.decode(bytes).map(applyOrientation(_, exifOrientation(bytes)))

  /** EXIF-transpose at the BYTES level: non-normal orientation re-encodes
    * the transposed pixels (PNG, lossless, ALPHA-PRESERVING — PIL's
    * exif_transpose keeps the RGBA mode, so transparency must survive into
    * the convert_image composite branch) so downstream format branches
    * still see a decodable payload; orientation 1 passes the original
    * through untouched. */
  private def transposeBytes(bytes: Array[Byte]): Array[Byte] = {
    val o = exifOrientation(bytes)
    if (o <= 1) return bytes
    decodeFull(bytes) match {
      case Some(d) =>
        // applyOrientation permutes ints — ARGB values ride along intact
        val t = applyOrientation(Pixels(d.w, d.h, d.argb), o)
        val img = new java.awt.image.BufferedImage(t.w, t.h,
          java.awt.image.BufferedImage.TYPE_INT_ARGB)
        img.setRGB(0, 0, t.w, t.h, t.rgb, 0, t.w)
        val bos = new java.io.ByteArrayOutputStream()
        ImageIO.write(img, "png", bos)
        bos.toByteArray
      case None => bytes
    }
  }
}
