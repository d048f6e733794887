package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** WebP lossless (VP8L) decode. The JDK has no WebP reader, so the
  * second-implementation bar is met by HAND-ASSEMBLED bitstreams per
  * feature (simple/normal prefix codes, LZ77 copies, the color cache,
  * all four transforms) whose expected pixels are computed BY HAND
  * from the spec — an encoder/decoder error cannot cancel — plus the
  * encoder round trip against the fixture contract, plus the distance
  * map's head pinned against the published kCodeToPlane constants. */
class WebpSpec extends SparkTestBase {

  private def lumaOf(g: Int) = (150 * g) >> 8 // r = b = 0 pixels

  // ---------- building blocks for hand streams ----------

  /** VP8L header bits (after the 0x2F signature byte). */
  private def header(bw: WebpKernel.BitWriter, w: Int, h: Int): Unit = {
    bw.writeBits(0x2F, 8)
    bw.writeBits(w - 1, 14)
    bw.writeBits(h - 1, 14)
    bw.writeBits(0, 1) // alpha hint
    bw.writeBits(0, 3) // version
  }

  /** A normal-form green code over the 256+24(+cache) alphabet with
    * the given (symbol → length) pairs, rest zero. */
  private def greenCode(bw: WebpKernel.BitWriter, alphabet: Int,
      lens: (Int, Int)*): Array[(Int, Int)] = {
    val l = new Array[Int](alphabet)
    for ((s, n) <- lens) l(s) = n
    WebpKernel.writePrefixCode(bw, l)
    WebpKernel.canonicalCodes(l)
  }

  test("distance map: the generated table inverts the published " +
      "plane_to_code_lut exactly (all 120 codes)") {
    val m = WebpKernel.DistMap
    assert(m.length == 120)
    assert(m.distinct.length == 120)
    assert(m.forall { case (dx, dy) =>
      dx >= -7 && dx <= 8 && dy >= 0 && dy <= 7 && !(dy == 0 && dx < 1) })
    // the published ENCODER-side lut (row = y offset 0..7, column c =
    // 8 − x offset, value = code − 1, 255 = unmapped) — an independent
    // derivation of the same mapping; inverting it must reproduce the
    // decode table entry for entry
    val lut = Array(
      96, 73, 55, 39, 23, 13, 5, 1, 255, 255, 255, 255, 255, 255, 255, 255,
      101, 78, 58, 42, 26, 16, 8, 2, 0, 3, 9, 17, 27, 43, 59, 79,
      102, 86, 62, 46, 32, 20, 10, 6, 4, 7, 11, 21, 33, 47, 63, 87,
      105, 90, 70, 52, 37, 28, 18, 14, 12, 15, 19, 29, 38, 53, 71, 91,
      110, 99, 82, 66, 48, 35, 30, 24, 22, 25, 31, 36, 49, 67, 83, 100,
      115, 108, 94, 76, 64, 50, 44, 40, 34, 41, 45, 51, 65, 77, 95, 109,
      118, 113, 103, 92, 80, 68, 60, 56, 54, 57, 61, 69, 81, 93, 104, 114,
      119, 116, 111, 106, 97, 88, 84, 74, 72, 75, 85, 89, 98, 107, 112, 117)
    val inv = new Array[(Int, Int)](120)
    for (r <- 0 until 8; c <- 0 until 16) {
      val v = lut(r * 16 + c)
      if (v != 255) {
        assert(inv(v) == null, s"lut value $v duplicated")
        inv(v) = (8 - c, r)
      }
    }
    assert(inv.forall(_ != null))
    assert(m.toSeq == inv.toSeq)
  }

  test("hand stream: simple 2-symbol green code, constant red/blue/" +
      "alpha via simple codes — absolute literal decode") {
    val bw = new WebpKernel.BitWriter()
    header(bw, 2, 2)
    bw.writeBits(0, 1) // no transforms
    bw.writeBits(0, 1) // no color cache
    bw.writeBits(0, 1) // no meta prefix
    // green: simple code {10, 200}: canonical len-1 codes 0/1 by
    // symbol order -> 10 reads as bit 0, 200 as bit 1
    WebpKernel.writeSimpleCode(bw, 10, 200)
    WebpKernel.writeSimpleCode(bw, 5) // red: constant 5, 0 bits/pixel
    WebpKernel.writeSimpleCode(bw, 7) // blue: constant 7
    WebpKernel.writeSimpleCode(bw, 255) // alpha
    WebpKernel.writeSimpleCode(bw, 0) // distance (unused)
    // pixels: 10, 200, 200, 10
    bw.writeBits(0, 1); bw.writeBits(1, 1); bw.writeBits(1, 1)
    bw.writeBits(0, 1)
    val g = WebpKernel.decodeGray(WebpKernel.wrapRiff(bw.toBytes))
    assert(g != null && g.width == 2 && g.height == 2)
    def lum(green: Int) = (77 * 5 + 150 * green + 29 * 7) >> 8
    assert(g.luma.toSeq == Seq(lum(10), lum(200), lum(200), lum(10)))
  }

  test("hand stream: LZ77 backward reference via distance code 1 " +
      "(the (0,1) neighbor = the pixel above)") {
    val bw = new WebpKernel.BitWriter()
    header(bw, 2, 3)
    bw.writeBits(0, 1); bw.writeBits(0, 1); bw.writeBits(0, 1)
    // green: lengths {10:2, 200:2, 259:1} — symbol 259 = length-prefix
    // 3 = literal length 4 (s < 4 -> s + 1)
    val gc = greenCode(bw, 280, (10, 2), (200, 2), (259, 1))
    WebpKernel.writeSimpleCode(bw, 0) // red
    WebpKernel.writeSimpleCode(bw, 0) // blue
    WebpKernel.writeSimpleCode(bw, 255) // alpha
    WebpKernel.writeSimpleCode(bw, 0) // distance: symbol 0 -> code 1
    // two literals, then one backref of length 4 at distance w=2
    bw.writeCode(gc(10)._1, gc(10)._2)
    bw.writeCode(gc(200)._1, gc(200)._2)
    bw.writeCode(gc(259)._1, gc(259)._2)
    val g = WebpKernel.decodeGray(WebpKernel.wrapRiff(bw.toBytes))
    assert(g != null && g.width == 2 && g.height == 3)
    assert(g.luma.toSeq == Seq(10, 200, 10, 200, 10, 200).map(lumaOf))
  }

  test("hand stream: color cache — a cache hit replays the inserted " +
      "pixel at the hashed index") {
    val argb = (255 << 24) | (0 << 16) | (77 << 8) | 0
    val cacheIdx = (0x1e35a7bd * argb) >>> (32 - 4)
    val bw = new WebpKernel.BitWriter()
    header(bw, 2, 1)
    bw.writeBits(0, 1) // no transforms
    bw.writeBits(1, 1); bw.writeBits(4, 4) // color cache, 4 bits
    bw.writeBits(0, 1) // no meta prefix
    val cacheSym = 256 + 24 + cacheIdx
    val gc = greenCode(bw, 256 + 24 + 16, (77, 1), (cacheSym, 1))
    WebpKernel.writeSimpleCode(bw, 0)
    WebpKernel.writeSimpleCode(bw, 0)
    WebpKernel.writeSimpleCode(bw, 255)
    WebpKernel.writeSimpleCode(bw, 0)
    bw.writeCode(gc(77)._1, gc(77)._2) // literal: inserts into cache
    bw.writeCode(gc(cacheSym)._1, gc(cacheSym)._2) // cache hit
    val g = WebpKernel.decodeGray(WebpKernel.wrapRiff(bw.toBytes))
    assert(g != null && g.luma.toSeq == Seq(lumaOf(77), lumaOf(77)))
  }

  /** One-tile transform sub-image carrying a single ARGB value, written
    * with 0-bit simple codes throughout. */
  private def oneTileSubImage(bw: WebpKernel.BitWriter, argb: Int): Unit = {
    bw.writeBits(0, 1) // no color cache
    WebpKernel.writeSimpleCode(bw, (argb >> 8) & 0xFF) // green
    WebpKernel.writeSimpleCode(bw, (argb >> 16) & 0xFF) // red
    WebpKernel.writeSimpleCode(bw, argb & 0xFF) // blue
    WebpKernel.writeSimpleCode(bw, (argb >> 24) & 0xFF) // alpha
    WebpKernel.writeSimpleCode(bw, 0) // distance
    // the single pixel: all five codes are 0-bit -> nothing to write
  }

  test("hand stream: predictor transform mode 2 (T) — expected pixels " +
      "hand-derived from the spec's edge rules") {
    val bw = new WebpKernel.BitWriter()
    header(bw, 4, 2)
    bw.writeBits(1, 1); bw.writeBits(0, 2) // transform: predictor
    bw.writeBits(0, 3) // size_bits = 2 -> one 4x4 tile covers 4x2
    oneTileSubImage(bw, 2 << 8) // mode 2 in the green channel
    bw.writeBits(0, 1) // no more transforms
    bw.writeBits(0, 1); bw.writeBits(0, 1) // no cache, no meta
    // residuals: every pixel (a=0, r=0, g=1, b=0)
    WebpKernel.writeSimpleCode(bw, 1) // green: constant 1, 0 bits
    WebpKernel.writeSimpleCode(bw, 0)
    WebpKernel.writeSimpleCode(bw, 0)
    WebpKernel.writeSimpleCode(bw, 0) // alpha residual 0
    WebpKernel.writeSimpleCode(bw, 0)
    val g = WebpKernel.decodeGray(WebpKernel.wrapRiff(bw.toBytes))
    assert(g != null && g.width == 4 && g.height == 2)
    // hand derivation: (0,0) pred=0xFF000000 -> g=1; top row pred=L ->
    // greens 1,2,3,4; row 1: x=0 pred=T -> 2; mode T -> 3,4,5; alpha
    // becomes FF at (0,0) and propagates -> luma = (150·g)>>8 exactly
    assert(g.luma.toSeq == Seq(1, 2, 3, 4, 2, 3, 4, 5).map(lumaOf))
  }

  test("hand stream: color transform — multipliers applied per the " +
      "spec's signed (t·c)>>5 delta, red feeding blue") {
    val bw = new WebpKernel.BitWriter()
    header(bw, 2, 1)
    bw.writeBits(1, 1); bw.writeBits(1, 2) // transform: color
    bw.writeBits(0, 3) // one tile
    // cte: green_to_red=64 (blue byte), green_to_blue=32 (green byte),
    // red_to_blue=32 (red byte)
    oneTileSubImage(bw, (32 << 16) | (32 << 8) | 64)
    bw.writeBits(0, 1)
    bw.writeBits(0, 1); bw.writeBits(0, 1)
    // residual pixel: a=255 r=1 g=3 b=2 (both pixels identical)
    WebpKernel.writeSimpleCode(bw, 3)
    WebpKernel.writeSimpleCode(bw, 1)
    WebpKernel.writeSimpleCode(bw, 2)
    WebpKernel.writeSimpleCode(bw, 255)
    WebpKernel.writeSimpleCode(bw, 0)
    val g = WebpKernel.decodeGray(WebpKernel.wrapRiff(bw.toBytes))
    assert(g != null)
    // hand: red = 1 + (64·3)>>5 = 7; blue = 2 + (32·3)>>5 + (32·7)>>5
    //     = 2 + 3 + 7 = 12; luma = (77·7 + 150·3 + 29·12)>>8 = 5
    val expect = (77 * 7 + 150 * 3 + 29 * 12) >> 8
    assert(g.luma.toSeq == Seq(expect, expect))
  }

  test("hand stream: color indexing with 4-entry palette and 2-bit " +
      "bundling — delta-coded entries, LSB-first sub-pixels") {
    val bw = new WebpKernel.BitWriter()
    header(bw, 4, 1)
    bw.writeBits(1, 1); bw.writeBits(3, 2) // transform: color indexing
    bw.writeBits(3, 8) // palette size - 1 = 3
    // palette sub-image (4x1): first entry (255,0,10,0) then deltas
    // (0,0,5,0): greens 10,15,20,25 after the delta chain
    bw.writeBits(0, 1) // no color cache
    val pc = greenCode(bw, 280, (10, 1), (5, 1))
    WebpKernel.writeSimpleCode(bw, 0) // red/delta 0
    WebpKernel.writeSimpleCode(bw, 0) // blue/delta 0
    // alpha: first 255 then delta 0 — needs a 2-symbol code
    WebpKernel.writeSimpleCode(bw, 255, 0)
    WebpKernel.writeSimpleCode(bw, 0)
    // canonical order of the {255, 0} alpha code: symbol 0 -> bit 0,
    // symbol 255 -> bit 1
    bw.writeCode(pc(10)._1, pc(10)._2); bw.writeBits(1, 1) // alpha 255
    for (_ <- 0 until 3) { bw.writeCode(pc(5)._1, pc(5)._2)
      bw.writeBits(0, 1) } // alpha delta 0
    bw.writeBits(0, 1) // end transforms
    // main image: width reduced to 1; single green byte packs indices
    // [3,2,1,0] LSB-first: 3 | 2<<2 | 1<<4 | 0<<6 = 27
    bw.writeBits(0, 1); bw.writeBits(0, 1) // no cache, no meta
    WebpKernel.writeSimpleCode(bw, 27)
    WebpKernel.writeSimpleCode(bw, 0)
    WebpKernel.writeSimpleCode(bw, 0)
    WebpKernel.writeSimpleCode(bw, 0)
    WebpKernel.writeSimpleCode(bw, 0)
    val g = WebpKernel.decodeGray(WebpKernel.wrapRiff(bw.toBytes))
    assert(g != null && g.width == 4 && g.height == 1)
    assert(g.luma.toSeq == Seq(25, 20, 15, 10).map(lumaOf))
  }

  test("encoder round trip matches the fixture contract exactly — " +
      "subtract-green on and off, edge dims") {
    for (sg <- Seq(true, false); (w, h) <- Seq((1, 1), (7, 3), (33, 17),
      (16, 16))) {
      def f(x: Int, y: Int) = (x * 13 + y * 31 + (x * y) % 7) % 256
      val bytes = WebpKernel.encodeGray(w, h, f, subtractGreen = sg)
      assert(MediaKind.sniff(bytes) == "webp")
      val g = WebpKernel.decodeGray(bytes)
      assert(g != null && g.width == w && g.height == h, s"sg=$sg $w x $h")
      for (y <- 0 until h; x <- 0 until w)
        assert(g.luma(y * w + x) == f(x, y), s"($x,$y) sg=$sg")
    }
  }

  test("GraySniff routes webp into the shared stat space; lossy VP8 " +
      "and hostile bytes degrade to null, never throw") {
    val good = WebpKernel.encodeGray(8, 8, (x, y) => (x * 31 + y) % 256)
    assert(GraySniff.decode(good) != null)
    // lossy container: VP8 chunk only -> null (scope note)
    val lossy = WebpKernel.wrapRiff(Array.fill[Byte](32)(0x11))
    val l2 = lossy.clone()
    l2(12) = 'V'; l2(13) = 'P'; l2(14) = '8'; l2(15) = ' '
    assert(WebpKernel.decodeGray(l2) == null)
    // palette + predictor combo: honestly out of the supported slice
    assert(WebpKernel.decodeGray(null) == null)
    assert(WebpKernel.decodeGray("RIFFxxxxWEBP".getBytes) == null)
    // truncations and flips never throw
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 200) {
      val m = good.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      WebpKernel.decodeGray(m)
    }
    for (cut <- 0 until good.length by 3)
      WebpKernel.decodeGray(java.util.Arrays.copyOf(good, cut))
  }

  test("RIFF chunk walk is overflow-proof: a declared size near " +
      "0x7FFFFFFF nulls instead of wrapping the cursor (r14 ADVICE)") {
    // pos(12) + 8 + 0x7FFFFFEC wraps negative in Int arithmetic,
    // which would pass the bounds check and send the fourcc read out
    // of bounds; the Long walk must reject it.
    val b = new java.io.ByteArrayOutputStream()
    b.write("RIFF".getBytes); b.write(Array[Byte](0x20, 0, 0, 0))
    b.write("WEBP".getBytes)
    b.write("JUNK".getBytes)
    b.write(Array[Byte](0xEC.toByte, 0xFF.toByte, 0xFF.toByte, 0x7F))
    b.write(new Array[Byte](16)) // some trailing bytes to walk over
    assert(WebpKernel.decodeGray(b.toByteArray) == null)
    // and the unsigned-size form (high bit set, Int-negative)
    val c = b.toByteArray
    c(23) = 0xFF.toByte // size 0xFFFFFFEC
    assert(WebpKernel.decodeGray(c) == null)
  }

  test("the DF verb: GrayWebpEncode fixture -> WebpGrayStats equals " +
      "the PNG fixture's stats pixel-for-pixel (shared contract)") {
    import spark.implicits._
    val src = spark.range(1, 40).toDF("doc_id")
    def params(c: org.apache.spark.sql.Column) = (
      c % 7, lit(9) + c % 8, lit(8) + c % 6, c % 5)
    val (s, w, h, b) = params(col("doc_id"))
    val webp = src.select(col("doc_id").as("media_id"),
      GrayWebpEncode(s, w, h, lit(11L), lit(5L), b).as("content"))
    val png = src.select(col("doc_id").as("media_id"),
      GrayPngEncode(s, w, h, lit(11L), lit(5L), b).as("content"))
    val a = webp.select(col("media_id"),
      WebpGrayStats(col("content")).as("st")).select("media_id", "st.*")
      .orderBy("media_id").collect().toSeq
    val p = png.select(col("media_id"),
      PngGrayStats(col("content")).as("st")).select("media_id", "st.*")
      .orderBy("media_id").collect().toSeq
    assert(a == p) // identical stats, hashes included — one hash space
  }
}
