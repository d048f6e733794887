package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** ICO decode: both entry payload forms (whole-PNG and raw
  * doubled-height DIB), the largest-entry pick, the hand-pinned DIB
  * layout, and the hostile-bytes contract. */
class IcoSpec extends SparkTestBase {

  private def f(x: Int, y: Int) = (x * 9 + y * 5 + (x * y) % 11) % 256

  test("both entry forms round-trip to the same pixels; ICO equals the " +
      "bare PNG decode of the wrapped payload") {
    for (png <- Seq(true, false); (w, h) <- Seq((9, 8), (16, 16), (1, 1))) {
      val ico = IcoKernel.encode(w, h, f, pngEntry = png)
      assert(MediaKind.sniff(ico) == "ico")
      val g = IcoKernel.decodeGray(ico)
      assert(g != null && g.width == w && g.height == h, s"png=$png $w x $h")
      for (y <- 0 until h; x <- 0 until w)
        assert(g.luma(y * w + x) == f(x, y), s"($x,$y) png=$png")
    }
    // the PNG-entry payload IS a real PNG: slicing it out decodes alike
    val ico = IcoKernel.encode(9, 8, f, pngEntry = true)
    val inner = java.util.Arrays.copyOfRange(ico, 22, ico.length)
    val direct = PngKernel.decodeGray(inner)
    assert(direct != null &&
      direct.luma.toSeq == IcoKernel.decodeGray(ico).luma.toSeq)
  }

  test("hand-pinned raw-DIB layout: doubled biHeight, bottom-up BGR " +
      "rows, AND mask after the XOR image") {
    // 2x1 image, pixels L=10 R=200: bytes hand-assembled
    val out = new java.io.ByteArrayOutputStream()
    def w2(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def w4(v: Int): Unit = { w2(v & 0xFFFF); w2((v >> 16) & 0xFFFF) }
    w2(0); w2(1); w2(1) // ICONDIR
    out.write(2); out.write(1); out.write(0); out.write(0)
    w2(1); w2(24); w4(40 + 8 + 4); w4(22)
    w4(40); w4(2); w4(2) // biHeight = 2 = DOUBLE the 1-px image height
    w2(1); w2(24); w4(0)
    for (_ <- 0 until 5) w4(0) // sizeImage/resolutions/clr: pad to 40
    // one XOR row (bottom-up = the only row), padded to 4 bytes:
    // B,G,R = 10,10,10 then 200,200,200 then 2 pad bytes
    for (v <- Seq(10, 10, 10, 200, 200, 200, 0, 0)) out.write(v)
    w4(0) // AND mask row (ignored)
    val g = IcoKernel.decodeGray(out.toByteArray)
    assert(g != null && g.width == 2 && g.height == 1)
    assert(g.luma.toSeq == Seq(10, 200))
  }

  test("largest entry wins: a 4x4 and a 16x16 entry in one file -> " +
      "the 16x16 decodes") {
    // build two single-entry icos and splice into a 2-entry directory
    val small = IcoKernel.encode(4, 4, (_, _) => 7, pngEntry = true)
    val big = IcoKernel.encode(16, 16, f, pngEntry = true)
    val pSmall = java.util.Arrays.copyOfRange(small, 22, small.length)
    val pBig = java.util.Arrays.copyOfRange(big, 22, big.length)
    val out = new java.io.ByteArrayOutputStream()
    def w2(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def w4(v: Int): Unit = { w2(v & 0xFFFF); w2((v >> 16) & 0xFFFF) }
    w2(0); w2(1); w2(2)
    val off0 = 6 + 32
    out.write(4); out.write(4); out.write(0); out.write(0)
    w2(1); w2(32); w4(pSmall.length); w4(off0)
    out.write(16); out.write(16); out.write(0); out.write(0)
    w2(1); w2(32); w4(pBig.length); w4(off0 + pSmall.length)
    out.write(pSmall); out.write(pBig)
    val g = IcoKernel.decodeGray(out.toByteArray)
    assert(g != null && g.width == 16 && g.height == 16)
    assert(g.luma(5) == f(5, 0))
  }

  test("hostile bytes: bad type, odd biHeight, palette bpp, truncated " +
      "payloads and flips null, never throw") {
    assert(IcoKernel.decodeGray(null) == null)
    assert(IcoKernel.decodeGray("not an ico at all, honest".getBytes)
      == null)
    val good = IcoKernel.encode(9, 8, f, pngEntry = false)
    val rnd = new scala.util.Random(3)
    for (_ <- 0 until 150) {
      val m = good.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      IcoKernel.decodeGray(m)
    }
    for (cut <- 0 until good.length by 3)
      IcoKernel.decodeGray(java.util.Arrays.copyOf(good, cut))
    // cursor type (2) is not an icon
    val cur = good.clone(); cur(2) = 2
    assert(IcoKernel.decodeGray(cur) == null)
  }

  test("the DF verb matches the PNG fixture's stats for BOTH entry " +
      "forms (shared pixel contract, one hash space)") {
    import spark.implicits._
    val src = spark.range(1, 30).toDF("doc_id")
    val ico = graft.ext.Multimodal.syntheticGrayIcoCorpus(src, "doc_id",
      col("doc_id") % 7, lit(9) + col("doc_id") % 8,
      lit(8) + col("doc_id") % 6, col("doc_id") % 5,
      col("doc_id") % 2 === 0)
    val png = graft.ext.Multimodal.syntheticGrayPngCorpus(src, "doc_id",
      col("doc_id") % 7, lit(9) + col("doc_id") % 8,
      lit(8) + col("doc_id") % 6, col("doc_id") % 5)
    val a = graft.ext.Multimodal.icoContentStats(ico)
      .orderBy("media_id").collect().toSeq
    val p = graft.ext.Multimodal.imageContentStats(png)
      .orderBy("media_id").collect().toSeq
    assert(a == p)
    // GraySniff routes ico too (the mixed/door path)
    assert(GraySniff.decode(IcoKernel.encode(8, 8, f, pngEntry = false))
      != null)
  }
}
