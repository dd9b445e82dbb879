package graft.media

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

/** Image codec + pixel math for the media pipeline (reference:
  * `scrapy/pipelines/images.py:110-210` decode → convert → re-encode path).
  * Pure JVM (javax.imageio), deterministic within a run — corpus generation
  * and the engine's decode both use these functions.
  */
object ImageOps {

  // ImageIO's default file-backed stream cache serializes concurrent decodes
  // on temp-file creation — catastrophic at 32 decode threads. Memory cache
  // keeps the decode path lock-free.
  ImageIO.setUseCache(false)

  /** Decoded image as packed 0xRRGGBB ints, row-major. */
  final case class Pixels(w: Int, h: Int, rgb: Array[Int])

  def decode(bytes: Array[Byte]): Option[Pixels] = {
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        val out = new Array[Int](w * h)
        img.getRGB(0, 0, w, h, out, 0, w)
        var i = 0
        while (i < out.length) { out(i) = out(i) & 0xffffff; i += 1 }
        Some(Pixels(w, h, out))
      }
    } catch { case _: Exception => None }
  }

  def encode(p: Pixels, fmt: String, jpegQuality: Float = 0.95f): Array[Byte] = {
    val img = new BufferedImage(p.w, p.h, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, p.w, p.h, p.rgb, 0, p.w)
    val bos = new ByteArrayOutputStream()
    fmt.toLowerCase match {
      case "jpeg" | "jpg" =>
        val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
        val param = writer.getDefaultWriteParam
        param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
        param.setCompressionQuality(jpegQuality)
        val ios = ImageIO.createImageOutputStream(bos)
        writer.setOutput(ios)
        writer.write(null, new IIOImage(img, null, null), param)
        ios.close(); writer.dispose()
      case f =>
        ImageIO.write(img, f, bos)
    }
    bos.toByteArray
  }

  /** PSNR in dB between two equal-size RGB images (per-channel MSE).
    * Infinity for identical images. Invariant gate: ≥ 40 dB for lossy
    * round-trips (BASELINE.json input_hint). */
  def psnr(a: Pixels, b: Pixels): Double = {
    require(a.w == b.w && a.h == b.h, s"size mismatch ${a.w}x${a.h} vs ${b.w}x${b.h}")
    var se = 0.0
    var i = 0
    while (i < a.rgb.length) {
      val pa = a.rgb(i); val pb = b.rgb(i)
      val dr = ((pa >> 16) & 0xff) - ((pb >> 16) & 0xff)
      val dg = ((pa >> 8) & 0xff) - ((pb >> 8) & 0xff)
      val db = (pa & 0xff) - (pb & 0xff)
      se += dr * dr + dg * dg + db * db
      i += 1
    }
    val mse = se / (a.rgb.length.toDouble * 3.0)
    if (mse == 0.0) Double.PositiveInfinity
    else 10.0 * math.log10(255.0 * 255.0 / mse)
  }

  def md5Hex(bytes: Array[Byte]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    graft.urlkit.UrlKit.toHex(md.digest(bytes))
  }

  /** Decode ALL frames of a multi-frame container (animated GIF — the one
    * video-ish format the JDK reads natively). Frames are composited per the
    * GIF89a model: each sub-image is drawn at its (left, top) offset over
    * the running canvas; disposal `restoreToBackgroundColor` clears the
    * frame's rect, `restoreToPrevious` reverts the canvas. Single-frame
    * formats (png/jpeg/bmp, or a plain GIF) yield one frame; unrecognized
    * payloads yield Nil (same Option-ish contract as `decode`). */
  def decodeFrames(bytes: Array[Byte]): Seq[Pixels] = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return Seq.empty
      val reader = readers.next()
      reader.setInput(iis, false, false) // keep metadata: GIF frame offsets/disposal
      try {
        val n = reader.getNumImages(true)
        if (n <= 0) return Seq.empty
        // canvas = logical screen; grow to fit any frame's extent
        var canvasW = 0; var canvasH = 0
        val metas = (0 until n).map { i =>
          val img = reader.read(i)
          val (left, top, disposal) = gifFrameGeometry(reader, i)
          canvasW = math.max(canvasW, left + img.getWidth)
          canvasH = math.max(canvasH, top + img.getHeight)
          (img, left, top, disposal)
        }
        val canvas = new BufferedImage(canvasW, canvasH, BufferedImage.TYPE_INT_RGB)
        val g = canvas.createGraphics()
        val out = Seq.newBuilder[Pixels]
        for ((img, left, top, disposal) <- metas) {
          val before =
            if (disposal == "restoreToPrevious") {
              val c = new BufferedImage(canvasW, canvasH, BufferedImage.TYPE_INT_RGB)
              c.createGraphics().drawImage(canvas, 0, 0, null)
              Some(c)
            } else None
          g.drawImage(img, left, top, null)
          val rgb = new Array[Int](canvasW * canvasH)
          canvas.getRGB(0, 0, canvasW, canvasH, rgb, 0, canvasW)
          var i = 0
          while (i < rgb.length) { rgb(i) = rgb(i) & 0xffffff; i += 1 }
          out += Pixels(canvasW, canvasH, rgb)
          disposal match {
            case "restoreToBackgroundColor" =>
              g.setColor(java.awt.Color.BLACK)
              g.fillRect(left, top, img.getWidth, img.getHeight)
            case "restoreToPrevious" =>
              g.drawImage(before.get, 0, 0, null)
            case _ => // doNotDispose / none: frame persists
          }
        }
        g.dispose()
        out.result()
      } finally reader.dispose()
    } catch {
      case _: Exception => Seq.empty
    } finally iis.close()
  }

  /** (left, top, disposalMethod) for frame i when the reader is GIF;
    * (0, 0, none) for any other format or absent metadata. */
  private def gifFrameGeometry(reader: javax.imageio.ImageReader, i: Int): (Int, Int, String) = {
    try {
      val meta = reader.getImageMetadata(i)
      val fmt = "javax_imageio_gif_image_1.0"
      if (!meta.getMetadataFormatNames.contains(fmt)) return (0, 0, "none")
      val root = meta.getAsTree(fmt).asInstanceOf[org.w3c.dom.Element]
      var left = 0; var top = 0; var disposal = "none"
      val kids = root.getChildNodes
      var k = 0
      while (k < kids.getLength) {
        val node = kids.item(k)
        node.getNodeName match {
          case "ImageDescriptor" =>
            val at = node.getAttributes
            left = at.getNamedItem("imageLeftPosition").getNodeValue.toInt
            top = at.getNamedItem("imageTopPosition").getNodeValue.toInt
          case "GraphicControlExtension" =>
            disposal = node.getAttributes.getNamedItem("disposalMethod").getNodeValue
          case _ =>
        }
        k += 1
      }
      (left, top, disposal)
    } catch { case _: Exception => (0, 0, "none") }
  }

  /** Write frames as an animated GIF via the JDK's sequence writer — the
    * spec/corpus fixture generator for `decodeFrames`. GIF is palettized, so
    * use low-color frames when pixel-exact round-trips matter. */
  def encodeGifAnimation(frames: Seq[Pixels]): Array[Byte] = {
    require(frames.nonEmpty, "no frames")
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    for (p <- frames) {
      val img = new BufferedImage(p.w, p.h, BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, p.w, p.h, p.rgb, 0, p.w)
      writer.writeToSequence(new IIOImage(img, null, null), writer.getDefaultWriteParam)
    }
    writer.endWriteSequence()
    ios.close(); writer.dispose()
    bos.toByteArray
  }
}

/** 64-bit perceptual hash — the standard DCT pHash (public algorithm;
  * not in the reference — required by the input_hint `phash:int64` column):
  * box-resize to 32×32 luma → 2D DCT-II → top-left 8×8 block → bit i set
  * when coefficient > median (DC excluded from the median but included as a
  * bit vs median). Self-consistent: corpus generation and engine decode both
  * call this exact function. */
object Phash {
  private val N = 32
  private val K = 8

  def phash64(p: ImageOps.Pixels): Long = phash64(p.rgb, p.w, p.h)

  def phash64(rgb: Array[Int], w: Int, h: Int): Long = {
    // 1. grayscale (integer luma, BT.601-ish)
    // 2. box-resize to 32x32: average of the source box per target cell
    val gray = new Array[Double](N * N)
    var ty = 0
    while (ty < N) {
      val y0 = ty * h / N; val y1 = math.max((ty + 1) * h / N, y0 + 1)
      var tx = 0
      while (tx < N) {
        val x0 = tx * w / N; val x1 = math.max((tx + 1) * w / N, x0 + 1)
        var sum = 0L; var cnt = 0
        var y = y0
        while (y < y1 && y < h) {
          var x = x0
          while (x < x1 && x < w) {
            val px = rgb(y * w + x)
            val r = (px >> 16) & 0xff; val g = (px >> 8) & 0xff; val b = px & 0xff
            sum += (299 * r + 587 * g + 114 * b) / 1000
            cnt += 1
            x += 1
          }
          y += 1
        }
        gray(ty * N + tx) = if (cnt == 0) 0.0 else sum.toDouble / cnt
        tx += 1
      }
      ty += 1
    }
    // 3. 2D DCT-II (rows then cols), only the first K output rows/cols needed
    val cosTab = Array.tabulate(K, N)((k, n) => math.cos(math.Pi * (n + 0.5) * k / N))
    val tmp = new Array[Double](N * K) // rows DCT'd, first K cols kept
    var y = 0
    while (y < N) {
      var u = 0
      while (u < K) {
        var s = 0.0
        var x = 0
        while (x < N) { s += gray(y * N + x) * cosTab(u)(x); x += 1 }
        tmp(y * K + u) = s
        u += 1
      }
      y += 1
    }
    val coef = new Array[Double](K * K)
    var v = 0
    while (v < K) {
      var u = 0
      while (u < K) {
        var s = 0.0
        var yy = 0
        while (yy < N) { s += tmp(yy * K + u) * cosTab(v)(yy); yy += 1 }
        coef(v * K + u) = s
        u += 1
      }
      v += 1
    }
    // 4. median of AC coefficients; bit set when coefficient > median
    val ac = java.util.Arrays.copyOfRange(coef, 1, coef.length)
    java.util.Arrays.sort(ac)
    val median = (ac(ac.length / 2 - 1) + ac(ac.length / 2)) / 2.0
    var hash = 0L
    var i = 0
    while (i < 64) {
      if (coef(i) > median) hash |= (1L << i)
      i += 1
    }
    hash
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
