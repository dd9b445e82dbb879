package graft

import java.awt.image.{BufferedImage, IndexColorModel}
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

import graft.media.{ImageOps, ImagesPipeline}

/** Port of the reference ImagesPipeline battery
  * (`tests/test_pipeline_images.py`): the 7 `test_file_path` + 4
  * `test_thumbnail_name` goldens, `test_convert_image`'s
  * JPEG-passthrough / ratio / white-composite cases (exact PIL blend
  * arithmetic), `test_get_images_exception`'s min-size gate,
  * `test_get_images`' path+thumb flow, and
  * `test_get_transposed_images`' EXIF orientation handling. */
class ImagesPipelineSpec extends AnyFunSuite {

  // ---- file_path / thumb_path goldens ------------------------------------

  test("image file_path: always .jpg (test_file_path)") {
    import ImagesPipeline.filePath
    assert(filePath("https://dev.mydeco.com/mydeco.gif")
      === "full/3fd165099d8e71b8a48b2683946e64dbfad8b52d.jpg")
    assert(filePath(
      "http://www.maddiebrown.co.uk///catalogue-items//image_54642_12175_95307.jpg")
      === "full/0ffcd85d563bca45e2f90becd0ca737bc58a00b2.jpg")
    assert(filePath("https://dev.mydeco.com/two/dirs/with%20spaces%2Bsigns.gif")
      === "full/b250e3a74fff2e4703e310048a5b13eba79379d2.jpg")
    assert(filePath(
      "http://www.dfsonline.co.uk/get_prod_image.php?img=status_0907_mdm.jpg")
      === "full/4507be485f38b0da8a0be9eb2e1dfab8a19223f2.jpg")
    assert(filePath("http://www.dorma.co.uk/images/product_details/2532/")
      === "full/97ee6f8a46cbbb418ea91502fd24176865cf39b2.jpg")
    assert(filePath("http://www.dorma.co.uk/images/product_details/2532")
      === "full/244e0dd7d96a3b7b01f54eded250c9e272577aa1.jpg")
  }

  test("thumb_path goldens (test_thumbnail_name)") {
    import ImagesPipeline.thumbPath
    assert(thumbPath("file:///tmp/foo.jpg", "50")
      === "thumbs/50/38a86208c36e59d4404db9e37ce04be863ef0335.jpg")
    assert(thumbPath("file://foo.png", "50")
      === "thumbs/50/e55b765eba0ec7348e50a1df496040449071b96a.jpg")
    assert(thumbPath("file:///tmp/foo", "50")
      === "thumbs/50/0329ad83ebb8e93ea7c7906d46e9ed55f7349a50.jpg")
    assert(thumbPath("file:///tmp/some.name/foo", "50")
      === "thumbs/50/850233df65a5b83361798f532f1fc549cd13cbe9.jpg")
  }

  // ---- fixtures -----------------------------------------------------------

  private def solid(w: Int, h: Int, rgb: Int): ImageOps.Pixels =
    ImageOps.Pixels(w, h, Array.fill(w * h)(rgb))

  private def argbPng(w: Int, h: Int, argb: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB)
    val px = Array.fill(w * h)(argb)
    img.setRGB(0, 0, w, h, px, 0, w)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def palettePng(w: Int, h: Int, argb: Int): Array[Byte] = {
    // one-entry-used indexed PNG whose palette color carries alpha (tRNS)
    val r = Array(((argb >> 16) & 0xff).toByte, 0.toByte)
    val g = Array(((argb >> 8) & 0xff).toByte, 0.toByte)
    val b = Array((argb & 0xff).toByte, 0.toByte)
    val a = Array(((argb >>> 24) & 0xff).toByte, 255.toByte)
    val cm = new IndexColorModel(8, 2, r, g, b, a)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, cm)
    val gfx = img.createGraphics()
    gfx.setColor(new java.awt.Color(argb, true))
    gfx.fillRect(0, 0, w, h)
    gfx.dispose()
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  // ---- convert_image (test_convert_image) --------------------------------

  test("convert_image: RGB JPEG passes its original bytes through") {
    val buf = ImageOps.encode(solid(100, 100, 0x007fff), "jpeg")
    val (px, out) = ImagesPipeline.convertImage(buf).get
    assert(out eq buf) // check that we don't convert JPEGs again
    assert(px.w === 100 && px.h === 100)
  }

  test("convert_image: thumbnail keeps image ratio — (10,25) box → 10x10") {
    val buf = ImageOps.encode(solid(100, 100, 0x007fff), "jpeg")
    val (thumb, tb) = ImagesPipeline.convertImage(buf, Some((10, 25))).get
    assert(thumb.w === 10 && thumb.h === 10)
    assert(tb ne buf) // resized → re-encoded
  }

  test("convert_image: RGBA PNG composites over white — PIL-exact blend") {
    // (0,127,255,50) over white → (205,230,255), test_convert_image golden
    val buf = argbPng(100, 100, (50 << 24) | 0x007fff)
    val (px, _) = ImagesPipeline.convertImage(buf).get
    assert(px.rgb.forall(_ == 0xcde6ff)) // (205,230,255)
  }

  test("convert_image: palette PNG with transparency composites over white") {
    val buf = palettePng(100, 100, (50 << 24) | 0x007fff)
    val d = ImagesPipeline.decodeFull(buf).get
    assert(d.isPalette)
    val (px, _) = ImagesPipeline.convertImage(buf).get
    assert(px.rgb.forall(_ == 0xcde6ff))
  }

  test("thumbnailSize matches PIL round_aspect") {
    import ImagesPipeline.thumbnailSize
    assert(thumbnailSize(100, 100, 10, 25) === ((10, 10)))
    assert(thumbnailSize(50, 50, 20, 20) === ((20, 20)))
    assert(thumbnailSize(50, 50, 100, 100) === ((50, 50))) // already fits
    assert(thumbnailSize(50, 100, 10, 10) === ((5, 10)))
    assert(thumbnailSize(1000, 1, 10, 10) === ((10, 1))) // min-1 clamp
  }

  // ---- get_images ----------------------------------------------------------

  test("get_images: min-size gate raises for any short side (test_get_images_exception)") {
    val url = "https://dev.mydeco.com/mydeco.gif"
    def gate(w: Int, h: Int) = ImagesPipeline.getImages(url,
      ImageOps.encode(solid(w, h, 0), "jpeg"), minWidth = 100, minHeight = 100)
    assert(gate(50, 50) === Left("Image too small (50x50 < 100x100)"))
    assert(gate(150, 50) === Left("Image too small (150x50 < 100x100)"))
    assert(gate(50, 150) === Left("Image too small (50x150 < 100x100)"))
  }

  test("get_images: full row keeps original JPEG, thumb row fits the box (test_get_images)") {
    val url = "https://dev.mydeco.com/mydeco.gif"
    val buf = ImageOps.encode(solid(50, 50, 0), "jpeg")
    val rows = ImagesPipeline.getImages(url, buf,
      thumbs = Seq("small" -> ((20, 20)))).toOption.get
    assert(rows.length === 2)
    val (path, im, out) = rows.head
    assert(path === "full/3fd165099d8e71b8a48b2683946e64dbfad8b52d.jpg")
    assert(im.w === 50 && im.h === 50)
    assert(out eq buf) // original body, not a re-encode
    val (tpath, tim, _) = rows(1)
    assert(tpath === "thumbs/small/3fd165099d8e71b8a48b2683946e64dbfad8b52d.jpg")
    assert(tim.w === 20 && tim.h === 20)
  }

  // ---- EXIF orientation (test_get_transposed_images) ----------------------

  /** Big-endian TIFF blob with a single IFD0 entry: tag 274 = orientation. */
  private def tiffBlob(orientation: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v >> 8); out.write(v & 0xff) }
    def u32(v: Int): Unit = { u16(v >> 16); u16(v & 0xffff) }
    out.write('M'); out.write('M'); u16(42); u32(8) // header, IFD0 at 8
    u16(1) // one entry
    u16(0x0112); u16(3); u32(1); u16(orientation); u16(0) // SHORT, inline
    u32(0) // no next IFD
    out.toByteArray
  }

  private def pngWithExif(png: Array[Byte], orientation: Int): Array[Byte] = {
    val tiff = tiffBlob(orientation)
    val chunk = new ByteArrayOutputStream()
    chunk.write(Array[Byte]((tiff.length >> 24).toByte, (tiff.length >> 16).toByte,
      (tiff.length >> 8).toByte, tiff.length.toByte))
    val typeAndData = "eXIf".getBytes ++ tiff
    chunk.write(typeAndData)
    val crc = new java.util.zip.CRC32()
    crc.update(typeAndData)
    val c = crc.getValue
    chunk.write(Array[Byte]((c >> 24).toByte, (c >> 16).toByte,
      (c >> 8).toByte, c.toByte))
    // insert after IHDR: 8-byte signature + (4 len + 4 type + 13 data + 4 crc)
    val at = 8 + 25
    png.take(at) ++ chunk.toByteArray ++ png.drop(at)
  }

  private def jpegWithExif(jpeg: Array[Byte], orientation: Int): Array[Byte] = {
    val tiff = tiffBlob(orientation)
    val len = 2 + 6 + tiff.length
    val seg = Array[Byte](0xff.toByte, 0xe1.toByte,
      (len >> 8).toByte, (len & 0xff).toByte,
      'E', 'x', 'i', 'f', 0, 0) ++ tiff
    jpeg.take(2) ++ seg ++ jpeg.drop(2) // right after SOI
  }

  test("exif orientation: parsed from PNG eXIf and JPEG APP1; absent → 1") {
    val base = ImageOps.encode(solid(2, 2, 0), "png")
    assert(ImagesPipeline.exifOrientation(base) === 1)
    assert(ImagesPipeline.exifOrientation(pngWithExif(base, 3)) === 3)
    val jpeg = ImageOps.encode(solid(2, 2, 0), "jpeg")
    assert(ImagesPipeline.exifOrientation(jpeg) === 1)
    assert(ImagesPipeline.exifOrientation(jpegWithExif(jpeg, 6)) === 6)
  }

  test("get_images transposes by EXIF: orientation 3 moves (1,1) to (0,0)") {
    // test_get_transposed_images: 2x2 black, red at (1,1), exif[274]=3
    val rgb = Array(0, 0, 0, 0xff0000)
    val png = ImageOps.encode(ImageOps.Pixels(2, 2, rgb), "png")
    val rows = ImagesPipeline.getImages(
      "https://dev.mydeco.com/mydeco.gif", pngWithExif(png, 3)).toOption.get
    val (path, im, _) = rows.head
    assert(path === "full/3fd165099d8e71b8a48b2683946e64dbfad8b52d.jpg")
    assert(im.rgb(0) === 0xff0000) // red now at (0,0)
    assert(im.rgb(3) === 0)
  }

  // ---- image_downloaded persist flow (images.py:120-141) ------------------

  test("imageDownloadedRow persists full + thumbs, checksums the full buf") {
    import graft.media.MediaFunctions
    val dir = java.nio.file.Files.createTempDirectory("graft-imgstore")
    val store = graft.operators.FilesStore.FsFilesStore(dir.toString)
    val url = "https://dev.mydeco.com/mydeco.gif"
    val buf = ImageOps.encode(solid(50, 50, 0), "jpeg")
    val r = MediaFunctions.imageDownloadedRow(url, buf, store,
      thumbs = Seq("small" -> ((20, 20))))
    assert(r.status === "downloaded")
    assert(r.path === "full/3fd165099d8e71b8a48b2683946e64dbfad8b52d.jpg")
    assert(r.width === 50 && r.height === 50)
    // un-resized RGB JPEG: the persisted full file IS the original body
    val full = dir.resolve("full/3fd165099d8e71b8a48b2683946e64dbfad8b52d.jpg")
    assert(java.nio.file.Files.readAllBytes(full) === buf)
    assert(r.checksum === ImageOps.md5Hex(buf))
    val thumb = dir.resolve(
      "thumbs/small/3fd165099d8e71b8a48b2683946e64dbfad8b52d.jpg")
    assert(java.nio.file.Files.isRegularFile(thumb))
    assert(ImageOps.decode(
      java.nio.file.Files.readAllBytes(thumb)).get.w === 20)
    // media_failed path: nothing persisted, status carries the message
    val tiny = MediaFunctions.imageDownloadedRow(
      "https://x.example/tiny.jpg", ImageOps.encode(solid(5, 5, 0), "jpeg"),
      store, minWidth = 10, minHeight = 10)
    assert(tiny.status === "Image too small (5x5 < 10x10)")
    assert(tiny.path == null && tiny.checksum == null)
  }

  test("persistImages distributes the image_downloaded stage") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = TestSpark.tempDir("graft-imgstore-spark")
    val rows = Seq(
      ("https://dev.mydeco.com/mydeco.gif",
        ImageOps.encode(solid(50, 50, 0x336699), "jpeg")),
      ("https://x.example/small.png",
        ImageOps.encode(solid(4, 4, 0), "png")))
    val df = rows.toDF("url", "bytes")
    val out = graft.media.MediaFunctions.persistImages(spark, df, dir,
      minWidth = 10, minHeight = 10, thumbs = Seq("t" -> ((10, 10))))
      .collect().sortBy(_.url)
    assert(out.length === 2)
    val ok = out.head
    assert(ok.status === "downloaded")
    assert(java.nio.file.Files.isRegularFile(
      java.nio.file.Paths.get(dir, ok.path)))
    assert(java.nio.file.Files.isRegularFile(java.nio.file.Paths.get(dir,
      "thumbs/t/3fd165099d8e71b8a48b2683946e64dbfad8b52d.jpg")))
    assert(out(1).status === "Image too small (4x4 < 10x10)")
  }

  test("EXIF transpose preserves alpha into the composite branch") {
    // RGBA PNG with orientation 3: transparency must survive the transpose
    // (PIL exif_transpose keeps RGBA) so convert_image still composites
    // over white instead of seeing a flattened opaque image
    val buf = pngWithExif(argbPng(4, 4, (50 << 24) | 0x007fff), 3)
    val rows = ImagesPipeline.getImages("https://x.example/a.png", buf)
      .toOption.get
    assert(rows.head._2.rgb.forall(_ == 0xcde6ff)) // (205,230,255)
  }

  test("applyOrientation transform table") {
    import ImagesPipeline.applyOrientation
    val p = ImageOps.Pixels(2, 1, Array(1, 2)) // [A B]
    assert(applyOrientation(p, 2).rgb.toSeq === Seq(2, 1)) // mirror H
    assert(applyOrientation(p, 3).rgb.toSeq === Seq(2, 1)) // rotate 180
    assert(applyOrientation(p, 4).rgb.toSeq === Seq(1, 2)) // mirror V
    val r6 = applyOrientation(p, 6) // rotate 90 CW → column [A; B]
    assert(r6.w === 1 && r6.h === 2 && r6.rgb.toSeq === Seq(1, 2))
    val r8 = applyOrientation(p, 8) // rotate 270 CW → column [B; A]
    assert(r8.w === 1 && r8.h === 2 && r8.rgb.toSeq === Seq(2, 1))
    val r5 = applyOrientation(p, 5) // transpose
    assert(r5.w === 1 && r5.h === 2 && r5.rgb.toSeq === Seq(1, 2))
    val r7 = applyOrientation(p, 7) // transverse
    assert(r7.w === 1 && r7.h === 2 && r7.rgb.toSeq === Seq(2, 1))
  }
}
