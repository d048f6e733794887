package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** The never-throw contract, adversarially enforced: every byte-level
  * kernel must return null/empty on ANY input — crawl bytes are
  * hostile by default, and one uncaught ArrayIndexOutOfBounds in an
  * expression fails a whole Spark stage (the r11 Mp4 zero-size-sample
  * finding, generalized). Three attack shapes, all DETERMINISTIC
  * (fixed seed — a flaky fuzz test is worse than none):
  *   1. pure random bytes,
  *   2. magic-prefixed random tails (forces the deep parse paths),
  *   3. valid fixtures with random byte flips and truncations (the
  *      realistic corruption: mostly-right files).
  * No Spark session needed — kernels are plain functions, so the
  * budget is thousands of examples, not five. */
class FuzzSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(987654321L)

  private def randomBytes(maxLen: Int): Array[Byte] = {
    val b = new Array[Byte](rnd.nextInt(maxLen))
    rnd.nextBytes(b)
    b
  }

  /** Every kernel entry point under test; each must simply not throw. */
  private def throwNothing(b: Array[Byte]): Unit = {
    GraySniff.decode(b)
    MediaKind.sniff(b)
    PngKernel.decodeGray(b)
    JpegKernel.decodeGrayY(b)
    GifKernel.decodeGrayFirstFrame(b)
    BmpKernel.decodeGray(b)
    TiffKernel.decodeGray(b)
    ExifKernel.extract(b)
    AviKernel.decodeFrames(b, 64)
    Mp4Kernel.decodeSamples(b, 64)
    WavKernel.decodePcm(b)
    Mp3Kernel.parse(b, 256)
    WarcKernel.records(b, 64)
    TarKernel.members(b, 64)
    ZipKernel.members(b, 64)
    HttpKernel.parse(b)
    PdfKernel.parse(b)
    WebpKernel.decodeGray(b)
    FlacKernel.decodePcm(b)
    IcoKernel.decodeGray(b)
    CharsetKernel.decodeAuto("text/html", b)
    CharsetKernel.metaCharset(b)
    // r14 verdict: the battery's "every kernel entry point" contract
    // was two short — PngTextKernel walks attacker-controlled chunk
    // lengths AND inflates zTXt/iTXt payloads; TextKernel rides every
    // shingle expression (arbitrary bytes as (replaced) UTF-8).
    PngTextKernel.entries(b)
    val u = org.apache.spark.unsafe.types.UTF8String.fromBytes(
      if (b == null) Array.empty[Byte] else b)
    TextKernel.tokens(u)
    TextKernel.grams(u, 3)
    // r15 container walks: AVIF/HEIC ispe, Matroska EBML, Ogg pages
    BmffMetaKernel.parse(b)
    MkvKernel.parse(b)
    OggKernel.parse(b)
    ZstdKernel.decode(b)
    Mp4MetaKernel.parse(b)
  }

  test("pure random bytes never throw in any kernel") {
    for (_ <- 0 until 400) throwNothing(randomBytes(2048))
    throwNothing(Array.empty[Byte])
    throwNothing(null)
  }

  test("magic-prefixed random tails never throw (deep parse paths)") {
    val magics: Seq[Array[Byte]] = Seq(
      Array(0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A),
      Array(0xFF.toByte, 0xD8.toByte, 0xFF.toByte),
      "GIF89a".getBytes,
      Array[Byte]('B', 'M'),
      Array[Byte]('I', 'I', 0x2A, 0),
      Array[Byte]('M', 'M', 0, 0x2A),
      "RIFF1234WAVE".getBytes,
      "RIFF1234AVI ".getBytes,
      Array[Byte](0, 0, 0, 16, 'f', 't', 'y', 'p'),
      "ID3".getBytes,
      Array(0xFF.toByte, 0xFB.toByte),
      "WARC/1.0\r\n".getBytes,
      Array(0x1F.toByte, 0x8B.toByte, 8, 0),
      Array[Byte]('P', 'K', 3, 4),
      Array[Byte]('P', 'K', 5, 6),
      "HTTP/1.1 200 OK\r\n".getBytes,
      "%PDF-1.4\n".getBytes,
      "RIFF1234WEBPVP8L".getBytes,
      "fLaC".getBytes,
      Array[Byte](0, 0, 1, 0, 2, 0),
      Array[Byte](0, 0, 0, 24, 'f', 't', 'y', 'p', 'a', 'v', 'i', 'f'),
      Array(0x1A.toByte, 0x45.toByte, 0xDF.toByte, 0xA3.toByte),
      "OggS\u0000".getBytes("ISO-8859-1"),
      Array(0x28.toByte, 0xB5.toByte, 0x2F.toByte, 0xFD.toByte))
    for (_ <- 0 until 60; m <- magics)
      throwNothing(m ++ randomBytes(1024))
  }

  /** 16-bit grayscale PNG via the JDK writer (TYPE_USHORT_GRAY) — the
    * second-implementation fixture for the depth-16 decode path. */
  private def png16Fixture(): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(8, 6,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    for (y <- 0 until 6; x <- 0 until 8)
      img.getRaster.setSample(x, y, 0, (x * 8191 + y * 257) % 65536)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("mutated valid fixtures never throw (single flips + truncations)") {
    val fixtures: Seq[Array[Byte]] = Seq(
      PngKernel.encodeGray(11, 7, (x, y) => (x * 3 + y) % 256, _ => 1),
      JpegKernel.encodeGrayBlocks(2, 2, (bx, by) => bx * 40 + by * 20),
      BmpKernel.encodeGray24(9, 5, (x, y) => (x + y) % 256),
      TiffKernel.encodeGray8(8, 6, (x, y) => (x * 5 + y) % 256),
      AviKernel.encodeMjpeg(3, 2, 1, 1),
      Mp4Kernel.encodeSamples(5, 6),
      WavKernel.encodePcm16Mono(90, 8000, i => (i * 37) % 3000 - 1500),
      WavKernel.encodeG711Mono(80, 8000, 7, i => (i * 11) % 256),
      Mp3Kernel.encode(4, 3, "T", "A", "B"),
      WarcKernel.encode(2, 3, gzipped = false),
      WarcKernel.encode(2, 3, gzipped = true),
      TarKernel.encode(6, 3),
      ZipKernel.encode(7, 3, deflated = true),
      ZipKernel.encode(7, 3, deflated = false),
      ExifKernel.withExif(
        JpegKernel.encodeGrayBlocks(1, 1, (_, _) => 9),
        "M", "N", 6, "2020:01:02 03:04:05"),
      // round-14 widening: every parse surface that shipped in r13
      // joins the mutation set — progressive JPEG (with restarts),
      // palette / Adam7 / sub-byte / 16-bit PNG, and HTTP messages
      JpegKernel.encodeGrayBlocksProgressive(2, 2,
        (bx, by) => 30 + bx * 50 + by * 25),
      JpegKernel.encodeGrayBlocksProgressive(3, 2,
        (bx, by) => 20 + bx * 30 + by * 40, restartEvery = 2),
      PngKernel.encodePalette(10, 6, 16,
        e => (e * 16, e * 8, e * 4), (x, y) => (x * 3 + y) % 16,
        y => (y + 2) % 5),
      PngKernel.encodeGrayAdam7(13, 9, (x, y) => (x * 7 + y * 3) % 256,
        k => k % 5),
      PngKernel.encodeGraySub(17, 5, 1, (x, y) => (x + y) % 2, y => y % 5),
      PngKernel.encodeGraySub(11, 6, 2, (x, y) => (x * y) % 4, y => y % 5),
      PngKernel.encodeGraySub(9, 7, 4, (x, y) => (x * 3 + y) % 16,
        y => (y + 1) % 5),
      png16Fixture(),
      HttpKernel.encode(200, "text/html", Array.tabulate(64)(i =>
        ((i * 37) % 256).toByte), chunked = false, gzipBody = false),
      HttpKernel.encode(301, "text/plain", Array.tabulate(48)(i =>
        ((i * 11) % 256).toByte), chunked = true, gzipBody = false),
      HttpKernel.encode(200, "a/b", Array.tabulate(80)(i =>
        ((i * 5) % 256).toByte), chunked = true, gzipBody = true),
      PdfKernel.encode(7L, 2),
      WebpKernel.encodeGray(9, 7, (x, y) => (x * 5 + y * 3) % 256),
      WebpKernel.encodeGray(6, 5, (x, y) => (x + y * 7) % 256,
        subtractGreen = false),
      FlacKernel.encodeMono16(300, 8000, i => (i * 77) % 3000 - 1500),
      IcoKernel.encode(9, 7, (x, y) => (x * 3 + y * 5) % 256,
        pngEntry = true),
      IcoKernel.encode(8, 6, (x, y) => (x + y * 9) % 256,
        pngEntry = false),
      // text-chunked PNG: flips land in tEXt keywords, zTXt deflate
      // payloads, and chunk CRCs — the PngTextKernel attack surface
      PngTextKernel.withText(
        PngKernel.encodeGray(7, 5, (x, y) => (x * 9 + y) % 256, _ => 0),
        Seq(
          PngTextKernel.chunk("tEXt", "Author", "fuzz target",
            deflate = false),
          PngTextKernel.chunk("zTXt", "Description",
            "a deflated note long enough to matter", deflate = true))),
      // r15 surfaces: Type0/CID PDF, AVIF meta, Matroska, Ogg, zstd
      PdfKernel.encodeCid(3L, 2),
      BmffMetaEncode.encode(5L, 0L),
      BmffMetaEncode.encode(8L, 1L),
      MkvEncode.encode(9L),
      OggEncode.encode(4L, 3),
      ZstdKernel.encodeFixture(6L, 4),
      Mp4MovieEncode.encode(5L),
      Mp4MovieEncode.encode(6L),
      HttpKernel.encode(200, "text/html", Array.tabulate(90)(i =>
        ((i * 13) % 256).toByte), chunked = true, gzipBody = false,
        zstdBody = true)
    ) ++ {
      // the WARC-of-HTML fixture (an Expression): evaluate once with
      // literal children — its mutated bytes stress WARC+HTTP+charset
      val e = WarcHtmlEncode(
        org.apache.spark.sql.catalyst.expressions.Literal(3L),
        org.apache.spark.sql.catalyst.expressions.Literal(4L))
      Seq(e.eval(null).asInstanceOf[Array[Byte]])
    }
    for (f <- fixtures) {
      throwNothing(f) // the pristine fixture first
      for (_ <- 0 until 120) {
        val m = f.clone()
        val flips = 1 + rnd.nextInt(4)
        for (_ <- 0 until flips)
          m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
        throwNothing(m)
      }
      for (_ <- 0 until 60)
        throwNothing(f.take(rnd.nextInt(f.length + 1)))
      // swapped-format confusion: one format's body behind another's
      // magic (the sniff must hand dirt to the right kernel safely)
      for (g <- fixtures if g ne f)
        throwNothing(f.take(8) ++ g.drop(8))
    }
  }
}
