package graft.ext

import graft.SparkTestBase

import org.apache.spark.sql.functions._

/** The BMP content leg: round-trip against the planted pixel contract,
  * cross-checks against the JDK's own BMP plugin (both directions),
  * top-down rows, dirty-byte rejection, the mixed-container sniff, and
  * the PcmResample truncated-mean contract. */
class BmpSpec extends SparkTestBase {
  import spark.implicits._

  private def pixel(s: Long, x: Int, y: Int, b: Long): Int = {
    val t = x * 5L + y * 11L + s * 131L
    val tq = ((t % 251) * (t % 251)) % 251
    val bumped = if ((x * 7 + y * 11) % 97 < b) 1 else 0
    ((((tq + t + bumped) % 256) + 256) % 256).toInt
  }

  test("round-trip: encode -> decode == the planted formula; ImageIO " +
      "reads our bytes pixel-exact; we read ImageIO's own BMPs") {
    val w = 13; val h = 9 // odd width: row padding exercised
    val bytes = BmpKernel.encodeGray24(w, h, (x, y) => pixel(3, x, y, 2))
    val g = BmpKernel.decodeGray(bytes)
    assert(g.width == w && g.height == h)
    for (y <- 0 until h; x <- 0 until w)
      assert(g.luma(y * w + x) == pixel(3, x, y, 2), s"($x,$y)")
    // ImageIO agrees on our wire bytes
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    for (y <- 0 until h; x <- 0 until w) {
      val v = img.getRGB(x, y) & 0xFF
      assert(v == pixel(3, x, y, 2), s"ImageIO ($x,$y)")
    }
    // and we agree on ImageIO's own BMP encode of the same picture
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val v = pixel(3, x, y, 2)
      bi.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "bmp", bos))
    val g2 = BmpKernel.decodeGray(bos.toByteArray)
    assert(g2 != null && g2.width == w && g2.height == h)
    for (y <- 0 until h; x <- 0 until w)
      assert(g2.luma(y * w + x) == pixel(3, x, y, 2), s"theirs ($x,$y)")
  }

  test("top-down BMP (negative height) decodes; dirty bytes reject") {
    val w = 4; val h = 3
    val up = BmpKernel.encodeGray24(w, h, (x, y) => x * 10 + y)
    // flip to top-down: negate height, reverse row order
    val down = up.clone()
    val neg = -h
    down(22) = (neg & 0xFF).toByte; down(23) = ((neg >> 8) & 0xFF).toByte
    down(24) = ((neg >> 16) & 0xFF).toByte; down(25) = ((neg >> 24) & 0xFF).toByte
    val rowBytes = (w * 3 + 3) & ~3
    for (y <- 0 until h; i <- 0 until rowBytes)
      down(54 + y * rowBytes + i) = up(54 + (h - 1 - y) * rowBytes + i)
    val g = BmpKernel.decodeGray(down)
    assert(g != null)
    for (y <- 0 until h; x <- 0 until w)
      assert(g.luma(y * w + x) == x * 10 + y)
    assert(BmpKernel.decodeGray("BMjunk".getBytes) == null)
    assert(BmpKernel.decodeGray(null) == null)
    // 8-bit palette / compressed headers refuse cleanly
    val b8 = up.clone(); b8(28) = 8
    assert(BmpKernel.decodeGray(b8) == null)
  }

  test("the mixed-container sniff routes BMP rows to the BMP kernel") {
    val media = Multimodal.syntheticGrayBmpCorpus(
      Seq((5L, 4L, 1L)).toDF("doc_id", "s", "b"), "doc_id",
      col("s"), lit(12), lit(10), col("b"))
    val dedicated = Multimodal.bmpContentStats(media)
      .select("ok", "sum_luma", "ahash_lo").as[(Boolean, Long, Long)]
      .collect().head
    val sniffed = Multimodal.mixedImageContentStats(media)
      .select("ok", "sum_luma", "ahash_lo").as[(Boolean, Long, Long)]
      .collect().head
    assert(dedicated == sniffed && dedicated._1)
  }

  test("PcmResample: truncated block means, tail dropped, junk null") {
    val wav = WavKernel.encodePcm16Mono(11, 8000,
      i => Seq(-7, -6, -5, 3, 4, 5, 6, -1, -2, -3, 99)(i))
    val got = Seq(wav).toDF("content")
      .select(PcmResample(col("content"), 4).as("r"))
      .as[Seq[Long]].collect().head
    // blocks: (-7-6-5+3)/4 = -15/4 -> -3 (trunc); (4+5+6-1)/4 = 14/4 -> 3
    assert(got == Seq(-3L, 3L)) // 11 samples -> 2 full blocks, tail dropped
    val junk = Seq("nope".getBytes).toDF("content")
      .select(PcmResample(col("content"), 4).as("r"))
      .select(col("r").isNull).as[Boolean].collect().head
    assert(junk)
  }
}
