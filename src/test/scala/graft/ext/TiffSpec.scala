package graft.ext

import graft.SparkTestBase

import org.apache.spark.sql.functions._

/** The baseline-TIFF content leg: round-trip against the planted pixel
  * contract, bidirectional cross-checks against the JDK's own TIFF
  * plugin (gray and RGB, both compressed encodes rejected), big-endian
  * and multi-strip layouts, WhiteIsZero inversion, dirty-byte
  * rejection, and the five-container sniff. */
class TiffSpec extends SparkTestBase {
  import spark.implicits._

  private def pixel(s: Long, x: Int, y: Int, b: Long): Int = {
    val t = x * 5L + y * 11L + s * 131L
    val tq = ((t % 251) * (t % 251)) % 251
    val bumped = if ((x * 7 + y * 11) % 97 < b) 1 else 0
    ((((tq + t + bumped) % 256) + 256) % 256).toInt
  }

  test("round-trip: encode -> decode == the planted formula; ImageIO " +
      "reads our bytes pixel-exact") {
    val w = 13; val h = 9
    val bytes = TiffKernel.encodeGray8(w, h, (x, y) => pixel(3, x, y, 2))
    val g = TiffKernel.decodeGray(bytes)
    assert(g != null && g.width == w && g.height == h)
    for (y <- 0 until h; x <- 0 until w)
      assert(g.luma(y * w + x) == pixel(3, x, y, 2), s"($x,$y)")
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(img != null && img.getWidth == w && img.getHeight == h)
    val raster = img.getRaster
    for (y <- 0 until h; x <- 0 until w)
      assert(raster.getSample(x, y, 0) == pixel(3, x, y, 2), s"io ($x,$y)")
  }

  test("ImageIO-written TIFFs decode pixel-identically: gray, RGB " +
      "(BT.601 luma), and the JDK's default layout as it writes it") {
    val w = 31; val h = 11
    def jdkTiff(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      val wr = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
      wr.setOutput(ios)
      val p = wr.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
      wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
      wr.dispose(); ios.close() // close BEFORE reading the buffer
      bos.toByteArray
    }
    val gi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      gi.getRaster.setSample(x, y, 0, (x * 13 + y * 29) % 256)
    val g = TiffKernel.decodeGray(jdkTiff(gi))
    assert(g != null && g.width == w && g.height == h)
    for (y <- 0 until h; x <- 0 until w)
      assert(g.luma(y * w + x) == (x * 13 + y * 29) % 256, s"gray ($x,$y)")
    // RGB: our decode must land on the BT.601 integer luma
    val ci = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 7) % 256; val gg = (y * 11) % 256; val b = (x + y) % 256
      ci.setRGB(x, y, (r << 16) | (gg << 8) | b)
    }
    val c = TiffKernel.decodeGray(jdkTiff(ci))
    assert(c != null && c.width == w && c.height == h)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 7) % 256; val gg = (y * 11) % 256; val b = (x + y) % 256
      assert(c.luma(y * w + x) == (77 * r + 150 * gg + 29 * b) >> 8,
        s"rgb ($x,$y)")
    }
  }

  test("big-endian, multi-strip, and WhiteIsZero variants decode; " +
      "compressed/planar/16-bit reject; hostile bytes never throw") {
    // hand-build a 4x4 big-endian two-strip WhiteIsZero gray TIFF
    val w = 4; val h = 4
    def be2(v: Int) = Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def be4(v: Long) = Array(((v >> 24) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    val data = Array.tabulate(w * h)(i => (i * 16 + 3).toByte)
    val ifdOff = 8 + w * h
    var out = Array[Byte]('M', 'M') ++ be2(42) ++ be4(ifdOff.toLong) ++ data
    def tag(id: Int, typ: Int, count: Long, value: Long): Array[Byte] =
      be2(id) ++ be2(typ) ++ be4(count) ++
        (if (typ == 3) be2(value.toInt) ++ be2(0) else be4(value))
    val stripData = 8L // two strips of 2 rows each, back to back
    val tags = tag(256, 4, 1, w.toLong) ++ tag(257, 4, 1, h.toLong) ++
      tag(258, 3, 1, 8) ++ tag(259, 3, 1, 1) ++
      tag(262, 3, 1, 0) ++ // WhiteIsZero: decode must invert
      tag(273, 4, 2, (ifdOff + 2 + 12 * 9 + 4).toLong) ++ // offsets array
      tag(277, 3, 1, 1) ++ tag(278, 4, 1, 2) ++
      tag(279, 4, 2, (ifdOff + 2 + 12 * 9 + 4 + 8).toLong) // counts array
    out = out ++ be2(9) ++ tags ++ be4(0L) ++
      be4(stripData) ++ be4(stripData + 8) ++ // the two strip offsets
      be4(8L) ++ be4(8L) // the two strip byte counts
    val g = TiffKernel.decodeGray(out)
    assert(g != null && g.width == w && g.height == h)
    for (i <- 0 until w * h)
      assert(g.luma(i) == 255 - ((i * 16 + 3) & 0xFF), s"px $i")
    // rejects: LZW-compressed encode from the JDK, 16-bit, junk
    val gi = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
    wr.setOutput(ios)
    val p = wr.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionType("LZW")
    wr.write(null, new javax.imageio.IIOImage(gi, null, null), p)
    wr.dispose(); ios.close()
    assert(TiffKernel.decodeGray(bos.toByteArray) == null) // compression != 1
    assert(TiffKernel.decodeGray(null) == null)
    assert(TiffKernel.decodeGray("II*junk".getBytes) == null)
    assert(TiffKernel.decodeGray("not a tiff at all".getBytes) == null)
    val trunc = TiffKernel.encodeGray8(9, 9, (x, y) => x + y)
    assert(TiffKernel.decodeGray(trunc.take(trunc.length - 6)) == null)
  }

  test("the five-container sniff routes TIFF; one scan, one hash space") {
    val docs = spark.range(0, 6).select(col("id").as("doc_id"))
    val tif = Multimodal.syntheticGrayTiffCorpus(docs, "doc_id",
      col("doc_id") % 3, lit(16), lit(16), lit(2))
    val png = Multimodal.syntheticGrayPngCorpus(
      docs.select((col("doc_id") + 100).as("doc_id")), "doc_id",
      col("doc_id") % 3, lit(16), lit(16), lit(2))
    val mixed = Multimodal.mixedImageContentStats(tif.unionByName(png))
      .orderBy("media_id").collect()
    assert(mixed.length == 12 && mixed.forall(_.getBoolean(1)))
    // identical pixel contract -> identical hashes across containers
    // (TIFF doc i has seed i % 3, PNG doc 100+j has seed (100+j) % 3)
    val byId = mixed.map(r => r.getLong(0) -> r.getAs[Long]("ahash")).toMap
    var checked = 0
    for (i <- 0L until 6L; j <- 0L until 6L
         if i % 3 == (100 + j) % 3) {
      assert(byId(i) == byId(100 + j), s"tiff $i vs png ${100 + j}")
      checked += 1
    }
    assert(checked == 12)
  }
}
