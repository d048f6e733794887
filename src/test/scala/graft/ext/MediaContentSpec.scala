package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The multimodal CONTENT leg: real PNG pixel decode (zlib inflate + all
  * five unfilters), perceptual hashes, PCM sample decode, and the
  * media dedup/quality operators built on them. The decoder is
  * cross-checked BOTH directions against the JDK's own ImageIO PNG
  * codec — our encode read by ImageIO, ImageIO's encode read by us. */
class MediaContentSpec extends SparkTestBase {
  import spark.implicits._

  private def pix(seed: Long, rs: Long, cs: Long, bump: Long)(
      x: Int, y: Int): Int = {
    val t = x * cs + y * rs + seed * 131
    val tq = ((t % 251) * (t % 251)) % 251
    val b = if ((x * 7 + y * 11) % 97 < bump) 1 else 0
    ((((tq + t + b) % 256) + 256) % 256).toInt
  }

  test("PNG roundtrip through all five filter types") {
    val w = 23; val h = 17
    val f = pix(99, 11, 5, 3) _
    for (filter <- 0 to 4) {
      val png = PngKernel.encodeGray(w, h, f, _ => filter)
      val g = PngKernel.decodeGray(png)
      assert(g != null && g.width == w && g.height == h, s"filter $filter")
      for (y <- 0 until h; x <- 0 until w)
        assert(g.luma(y * w + x) == f(x, y), s"filter $filter ($x,$y)")
    }
    // mixed filters per row — the gate generator's layout
    val png = PngKernel.encodeGray(w, h, f, y => y % 5)
    val g = PngKernel.decodeGray(png)
    for (y <- 0 until h; x <- 0 until w)
      assert(g.luma(y * w + x) == f(x, y))
  }

  test("our PNG is readable by ImageIO, pixel-identical") {
    val w = 19; val h = 13
    val f = pix(42, 7, 3, 5) _
    val png = PngKernel.encodeGray(w, h, f, y => (2 + y) % 5)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(png))
    assert(img != null && img.getWidth == w && img.getHeight == h)
    val raster = img.getRaster
    for (y <- 0 until h; x <- 0 until w)
      assert(raster.getSample(x, y, 0) == f(x, y), s"($x,$y)")
  }

  test("ImageIO-written PNGs (gray and RGB) decode pixel-identically") {
    val w = 31; val h = 11
    // grayscale
    val gi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      gi.getRaster.setSample(x, y, 0, (x * 13 + y * 29) % 256)
    val gout = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(gi, "png", gout)
    val g = PngKernel.decodeGray(gout.toByteArray)
    assert(g != null && g.width == w && g.height == h)
    for (y <- 0 until h; x <- 0 until w)
      assert(g.luma(y * w + x) == (x * 13 + y * 29) % 256)
    // RGB: decode must apply the documented integer BT.601 luma
    val ci = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 7) % 256; val gg = (y * 11) % 256; val b = (x + y) % 256
      ci.setRGB(x, y, (r << 16) | (gg << 8) | b)
    }
    val cout = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(ci, "png", cout)
    val c = PngKernel.decodeGray(cout.toByteArray)
    assert(c != null && c.width == w && c.height == h)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 7) % 256; val gg = (y * 11) % 256; val b = (x + y) % 256
      assert(c.luma(y * w + x) == ((77 * r + 150 * gg + 29 * b) >> 8))
    }
  }

  test("palette PNG (color type 3): PLTE remap decodes to entry lumas; " +
      "ImageIO agrees both directions; PLTE-less / out-of-range reject") {
    val w = 21; val h = 14
    def pmod(v: Long, m: Long): Long = ((v % m) + m) % m
    val s = 5L
    def rgbOf(e: Int): (Int, Int, Int) = {
      val tq = { val t = pmod(e * 37L + s * 131L, 251); (t * t) % 251 }
      (pmod(tq + e, 256).toInt, pmod(tq * 2 + e * 5 + s, 256).toInt,
        pmod(tq * 3 + e * 11, 256).toInt)
    }
    def idxOf(x: Int, y: Int): Int = {
      val uq = { val u = pmod(x * 7L + y * 11L + s * 131L, 251); (u * u) % 251 }
      pmod(uq + x + y * 3L + s, 64).toInt
    }
    val png = PngKernel.encodePalette(w, h, 64, rgbOf, idxOf,
      y => (s + y).toInt % 5)
    val g = PngKernel.decodeGray(png)
    assert(g != null && g.width == w && g.height == h)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, gg, b) = rgbOf(idxOf(x, y))
      assert(g.luma(y * w + x) == ((77 * r + 150 * gg + 29 * b) >> 8),
        s"($x,$y)")
    }
    // ImageIO reads OUR palette PNG to the same RGB triples
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img != null && img.getWidth == w)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, gg, b) = rgbOf(idxOf(x, y))
      val rgb = img.getRGB(x, y)
      assert(((rgb >> 16) & 0xFF) == r && ((rgb >> 8) & 0xFF) == gg &&
        (rgb & 0xFF) == b, s"($x,$y)")
    }
    // ImageIO-WRITTEN indexed PNG decodes through our PLTE path
    val pal = (0 until 64).map(rgbOf)
    val icm = new java.awt.image.IndexColorModel(8, 64,
      pal.map(_._1.toByte).toArray, pal.map(_._2.toByte).toArray,
      pal.map(_._3.toByte).toArray)
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    for (y <- 0 until h; x <- 0 until w)
      bi.getRaster.setSample(x, y, 0, idxOf(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "png", bos)
    val g2 = PngKernel.decodeGray(bos.toByteArray)
    assert(g2 != null && g2.width == w && g2.height == h)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, gg, b) = rgbOf(idxOf(x, y))
      assert(g2.luma(y * w + x) == ((77 * r + 150 * gg + 29 * b) >> 8),
        s"ImageIO-written ($x,$y)")
    }
    // color type 3 with PLTE stripped -> null (PLTE is mandatory)
    val noPlte = {
      val out = new java.io.ByteArrayOutputStream()
      var pos = 0
      // copy signature, then every chunk except PLTE
      out.write(png, 0, 8); pos = 8
      while (pos + 8 <= png.length) {
        val len = (((png(pos) & 0xFF) << 24) | ((png(pos + 1) & 0xFF) << 16) |
          ((png(pos + 2) & 0xFF) << 8) | (png(pos + 3) & 0xFF))
        val typ = new String(png, pos + 4, 4, "US-ASCII")
        if (typ != "PLTE") out.write(png, pos, 12 + len)
        pos += 12 + len
      }
      out.toByteArray
    }
    assert(PngKernel.decodeGray(noPlte) == null)
    // an index past the palette end -> null (verified-or-nothing)
    val shortPal = PngKernel.encodePalette(w, h, 8, rgbOf,
      (x, y) => idxOf(x, y) % 8, _ => 0)
    assert(PngKernel.decodeGray(shortPal) != null) // in-range baseline
    // now hand-craft the same 8-entry PLTE but indices up to 63: the
    // encoder's own mod-nPal guard must be bypassed, so splice the
    // 64-index IDAT rows against the 8-entry palette
    val overIdx = {
      val raw = new Array[Byte](h * (1 + w))
      for (y <- 0 until h) {
        raw(y * (1 + w)) = 0
        for (x <- 0 until w)
          raw(y * (1 + w) + 1 + x) = idxOf(x, y).toByte // 0..63
      }
      val d = new java.util.zip.Deflater(); d.setInput(raw); d.finish()
      val buf = new Array[Byte](raw.length + 64)
      val n = d.deflate(buf); d.end()
      // reuse shortPal's header/PLTE, swap the IDAT
      val out = new java.io.ByteArrayOutputStream()
      var pos = 0
      out.write(shortPal, 0, 8); pos = 8
      while (pos + 8 <= shortPal.length) {
        val len = (((shortPal(pos) & 0xFF) << 24) |
          ((shortPal(pos + 1) & 0xFF) << 16) |
          ((shortPal(pos + 2) & 0xFF) << 8) | (shortPal(pos + 3) & 0xFF))
        val typ = new String(shortPal, pos + 4, 4, "US-ASCII")
        if (typ == "IDAT") {
          val body = java.util.Arrays.copyOf(buf, n)
          def w4(v: Long): Unit = { out.write(((v >> 24) & 0xFF).toInt)
            out.write(((v >> 16) & 0xFF).toInt)
            out.write(((v >> 8) & 0xFF).toInt); out.write((v & 0xFF).toInt) }
          w4(body.length.toLong); out.write("IDAT".getBytes, 0, 4)
          out.write(body, 0, body.length)
          val crc = new java.util.zip.CRC32()
          crc.update("IDAT".getBytes); crc.update(body)
          w4(crc.getValue)
        } else out.write(shortPal, pos, 12 + len)
        pos += 12 + len
      }
      out.toByteArray
    }
    assert(PngKernel.decodeGray(overIdx) == null)
  }

  test("sub-byte and 16-bit PNG depths: packed unfilter + bit unpack " +
      "round-trip; ImageIO agrees both directions; 16-bit reduces to " +
      "the high byte") {
    // our sub-byte encodes, all five filters in play
    for (depth <- Seq(1, 2, 4)) {
      val w = 21; val h = 13
      val mask = (1 << depth) - 1
      def lvl(x: Int, y: Int): Int = {
        val t = x * 5 + y * 11 + 7 * 131
        (((t % 251) * (t % 251)) % 251 + t) % (1 << depth)
      }
      val png = PngKernel.encodeGraySub(w, h, depth, lvl, y => (7 + y) % 5)
      val g = PngKernel.decodeGray(png)
      assert(g != null && g.width == w && g.height == h, s"depth $depth")
      for (y <- 0 until h; x <- 0 until w)
        assert(g.luma(y * w + x) == lvl(x, y) * 255 / mask,
          s"depth $depth ($x,$y)")
      // ImageIO reads our sub-byte wire bytes to the same 8-bit gray
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(png))
      assert(img != null && img.getWidth == w)
      for (y <- 0 until h; x <- 0 until w)
        assert((img.getRGB(x, y) & 0xFF) == lvl(x, y) * 255 / mask,
          s"depth $depth ImageIO ($x,$y)")
    }
    // ImageIO-WRITTEN 1-bit binary PNG decodes through the sub-byte path
    val w = 19; val h = 11
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_BINARY)
    for (y <- 0 until h; x <- 0 until w)
      bi.getRaster.setSample(x, y, 0, (x * 3 + y * 5) % 2)
    val bos1 = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "png", bos1)
    val g1 = PngKernel.decodeGray(bos1.toByteArray)
    assert(g1 != null && g1.width == w)
    for (y <- 0 until h; x <- 0 until w)
      assert(g1.luma(y * w + x) == ((x * 3 + y * 5) % 2) * 255,
        s"1-bit ImageIO ($x,$y)")
    // ImageIO-WRITTEN 16-bit gray: our luma is the spec's high-byte
    // reduction of the 16-bit sample
    val us = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      us.getRaster.setSample(x, y, 0, (x * 5231 + y * 2711) % 65536)
    val bos2 = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(us, "png", bos2)
    val g2 = PngKernel.decodeGray(bos2.toByteArray)
    assert(g2 != null && g2.width == w)
    for (y <- 0 until h; x <- 0 until w)
      assert(g2.luma(y * w + x) == ((x * 5231 + y * 2711) % 65536) >> 8,
        s"16-bit ($x,$y)")
    // ImageIO-WRITTEN 4-bit INDEXED PNG (16-color palette)
    val pal = (0 until 16).map(e => (e * 37 % 256, e * 91 % 256, e * 53 % 256))
    val icm = new java.awt.image.IndexColorModel(4, 16,
      pal.map(_._1.toByte).toArray, pal.map(_._2.toByte).toArray,
      pal.map(_._3.toByte).toArray)
    val ib = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_BINARY, icm)
    for (y <- 0 until h; x <- 0 until w)
      ib.getRaster.setSample(x, y, 0, (x * 7 + y * 3) % 16)
    val bos3 = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(ib, "png", bos3)
    val g3 = PngKernel.decodeGray(bos3.toByteArray)
    assert(g3 != null && g3.width == w)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, gg, b) = pal((x * 7 + y * 3) % 16)
      assert(g3.luma(y * w + x) == ((77 * r + 150 * gg + 29 * b) >> 8),
        s"4-bit palette ($x,$y)")
    }
  }

  test("Adam7 interlaced PNG: deinterlace equals the sequential encode " +
      "of the same pixels; ImageIO agrees both directions") {
    // odd dims hit every pass-geometry edge case (empty/1-wide passes)
    for ((w, h) <- Seq((23, 17), (8, 8), (5, 3), (1, 9), (16, 1))) {
      val f = pix(7, 11, 5, 3) _
      val seqPng = PngKernel.encodeGray(w, h, f, y => (7 + y) % 5)
      val a7Png = PngKernel.encodeGrayAdam7(w, h, f, k => (7 + k) % 5)
      val gs = PngKernel.decodeGray(seqPng)
      val ga = PngKernel.decodeGray(a7Png)
      assert(ga != null && ga.width == w && ga.height == h, s"${w}x$h")
      assert(ga.luma.toSeq == gs.luma.toSeq, s"${w}x$h interlaced != seq")
      for (y <- 0 until h; x <- 0 until w)
        assert(ga.luma(y * w + x) == f(x, y), s"${w}x$h ($x,$y)")
      // ImageIO reads OUR interlaced PNG pixel-identically
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(a7Png))
      assert(img != null && img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w)
        assert(img.getRaster.getSample(x, y, 0) == f(x, y),
          s"${w}x$h ImageIO ($x,$y)")
    }
    // ImageIO-WRITTEN interlaced PNG (progressive mode = Adam7) decodes
    val w = 27; val h = 19
    val gi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      gi.getRaster.setSample(x, y, 0, (x * 13 + y * 29) % 256)
    val wtr = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
    val p = wtr.getDefaultWriteParam
    p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    wtr.setOutput(ios)
    wtr.write(null, new javax.imageio.IIOImage(gi, null, null), p)
    wtr.dispose(); ios.close()
    val g = PngKernel.decodeGray(bos.toByteArray)
    assert(g != null && g.width == w && g.height == h)
    for (y <- 0 until h; x <- 0 until w)
      assert(g.luma(y * w + x) == (x * 13 + y * 29) % 256,
        s"ImageIO-interlaced ($x,$y)")
  }

  test("dirty bytes never throw: truncation, bad magic, unsupported layouts") {
    val good = PngKernel.encodeGray(9, 9, pix(1, 11, 5, 0) _, _ => 0)
    assert(PngKernel.decodeGray(null) == null)
    assert(PngKernel.decodeGray(Array.emptyByteArray) == null)
    assert(PngKernel.decodeGray("not a png at all".getBytes) == null)
    for (cut <- Seq(4, 12, 30, good.length - 5))
      assert(PngKernel.decodeGray(good.take(cut)) == null, s"cut $cut")
    // corrupt the IDAT payload: inflate must fail cleanly
    val bad = good.clone()
    bad(good.length - 20) = (bad(good.length - 20) ^ 0x55).toByte
    assert(PngKernel.decodeGray(bad) == null ||
      PngKernel.decodeGray(bad) != null) // never throws either way
  }

  test("aHash/dHash: identical pixels identical, small bump close, noise far") {
    def hashes(seed: Long, bump: Long) = {
      val g = PngKernel.decodeGray(
        PngKernel.encodeGray(16, 16, pix(seed, 11, 5, bump) _, y => y % 5))
      (PngKernel.ahash(g), PngKernel.dhash(g))
    }
    val (a0, d0) = hashes(3, 0)
    val (a0b, d0b) = hashes(3, 0)
    assert(a0 == a0b && d0 == d0b)
    val (a1, _) = hashes(3, 2) // few-pixel bump: near-dup
    assert(java.lang.Long.bitCount(a0 ^ a1) <= 4)
    val (a2, _) = hashes(77, 0) // different base image
    assert(java.lang.Long.bitCount(a0 ^ a2) > 6)
    // too-small images yield the sentinel
    val tiny = PngKernel.decodeGray(
      PngKernel.encodeGray(4, 4, pix(1, 1, 1, 0) _, _ => 0))
    assert(PngKernel.ahash(tiny) == Long.MinValue)
  }

  test("ahash pins to the independently-computed SQL-replay value") {
    // value cross-computed in DuckDB from the documented pixel contract
    // (seed 3, 9x8, bump 2): any drift in cells/mean/bit arithmetic on
    // either side breaks the x_mm_* oracle parity
    val g = PngKernel.decodeGray(
      PngKernel.encodeGray(9, 8, pix(3, 11, 5, 2) _, y => (3 + y) % 5))
    assert(g.luma.map(_.toLong).sum == 8944L)
    val ah = PngKernel.ahash(g)
    assert(((ah >>> 32) & 0xFFFFFFFFL) == 1205505117L)
    assert((ah & 0xFFFFFFFFL) == 2345742831L)
  }

  test("Hamming64.pairs: exact recall to radius 6, none beyond") {
    // fingerprints at controlled distances from a base
    val base = 0x0123456789ABCDEFL
    def flip(fp: Long, bits: Seq[Int]): Long =
      bits.foldLeft(fp)((acc, b) => acc ^ (1L << b))
    val rows = Seq(
      (1L, base), (2L, flip(base, Seq(0))), (3L, flip(base, Seq(1, 17, 33))),
      (4L, flip(base, Seq(2, 12, 22, 32, 42, 52))), // hamming 6
      (5L, flip(base, Seq(3, 13, 23, 33, 43, 53, 63))), // hamming 7: out
      (6L, ~base)).toDF("id", "fp")
    val got = Hamming64.pairs(rows, "id", "fp", maxHamming = 6)
      .filter($"i" === 1L).orderBy("j").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((2L, 1L), (3L, 3L), (4L, 6L)))
  }

  test("imageContentStats via DataFrame matches the kernel, flags dirt") {
    val ids = spark.range(6).toDF("doc_id")
    val media = Multimodal.syntheticGrayPngCorpus(ids, "doc_id",
      col("doc_id") % 4, lit(16), lit(12), col("doc_id") % 3)
      // row 6: planted garbage bytes
      .unionAll(Seq((99L, "garbage".getBytes)).toDF("media_id", "content"))
    val st = Multimodal.imageContentStats(media).orderBy("media_id").collect()
    assert(st.length == 7)
    val bad = st.last
    assert(!bad.getAs[Boolean]("ok") && bad.isNullAt(bad.fieldIndex("width")))
    st.dropRight(1).foreach { r =>
      val id = r.getAs[Long]("media_id")
      val s = id % 4
      val g = PngKernel.decodeGray(PngKernel.encodeGray(16, 12,
        pix(s, 11, 5, id % 3) _, y => ((s + y) % 5).toInt))
      assert(r.getAs[Long]("n_px") == 192L)
      assert(r.getAs[Long]("sum_luma") == g.luma.map(_.toLong).sum)
      val ah = PngKernel.ahash(g)
      assert(r.getAs[Long]("ahash") == ah)
      assert(r.getAs[Long]("ahash_hi") == ((ah >>> 32) & 0xFFFFFFFFL))
    }
  }

  test("imageNearDupPairs: seed clusters pair up, cross-seed doesn't") {
    val ids = spark.range(12).toDF("doc_id")
    // 3 seed clusters of 4, bumps 0..3 within each
    val media = Multimodal.syntheticGrayPngCorpus(ids, "doc_id",
      col("doc_id") % 3, lit(16), lit(16), col("doc_id") / lit(3))
    val pairs = Multimodal.imageNearDupPairs(media, maxHamming = 4).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getLong(0) % 3 == r.getLong(1) % 3,
        s"cross-seed pair ${r.getLong(0)},${r.getLong(1)}")
    }
  }

  test("imageQualityScreen: blank, sliver, tiny, undecodable flags") {
    val rows = Seq(
      // ok, n_px, w, h, var
      (1L, true, 400L, 20L, 20L, 5000L), // keeper
      (2L, true, 400L, 20L, 20L, 10L), // near-blank
      (3L, true, 200L, 100L, 2L, 5000L), // sliver
      (4L, true, 16L, 4L, 4L, 5000L), // tiny
      (5L, false, -1L, -1L, -1L, -1L)) // undecodable
      .toDF("media_id", "ok", "n_px", "width", "height", "var_milli")
      .select(col("media_id"), col("ok"),
        when(col("ok"), col("width")).as("width"),
        when(col("ok"), col("height")).as("height"),
        when(col("ok"), col("n_px")).as("n_px"),
        when(col("ok"), col("var_milli")).as("var_milli"))
    val s = Multimodal.imageQualityScreen(rows).orderBy("media_id").collect()
    assert(s.map(_.getAs[Boolean]("keep")).toSeq ==
      Seq(true, false, false, false, false))
    assert(s(1).getAs[Boolean]("near_blank"))
    assert(s(2).getAs[Boolean]("extreme_aspect"))
    assert(s(3).getAs[Boolean]("too_small"))
    assert(s(4).getAs[Boolean]("undecodable"))
  }

  private def sample(seed: Long)(i: Int): Int =
    (((seed * 7919 + i.toLong * 31 + (i.toLong * i % 101)) % 4001).toInt
      + 4001) % 4001 - 2000

  test("WAV PCM roundtrip: encode, decode, exact sample parity") {
    val wav = WavKernel.encodePcm16Mono(200, 8000, sample(5))
    val p = WavKernel.decodePcm(wav)
    assert(p != null && p.channels == 1 && p.sampleRate == 8000 &&
      p.samples.length == 200)
    (0 until 200).foreach(i => assert(p.samples(i) == sample(5)(i), s"i=$i"))
    // the container-metadata walk agrees with the sample decoder
    val meta = Multimodal.decodeWavMeta(
      Seq((1L, wav)).toDF("media_id", "content")).head()
    assert(meta.getAs[Boolean]("is_pcm") && meta.getAs[Long]("channels") == 1 &&
      meta.getAs[Long]("sample_rate") == 8000 &&
      meta.getAs[Long]("data_bytes") == 400)
  }

  // ---------------- JPEG content leg ----------------

  test("JPEG block-flat fixture round-trips EXACTLY, and javax.imageio " +
      "decodes our wire bytes to the same blocks") {
    def bv(bx: Int, by: Int): Int = (bx * 37 + by * 101 + 13) % 256
    val jpeg = JpegKernel.encodeGrayBlocks(9, 8, bv)
    // our decoder: every pixel equals its block's planted value
    val g = JpegKernel.decodeGrayY(jpeg)
    assert(g != null && g.width == 72 && g.height == 64)
    for (y <- 0 until 64; x <- 0 until 72)
      assert(g.luma(y * 72 + x) == bv(x / 8, y / 8), s"($x,$y)")
    // independent decoder: ImageIO reads the same flat blocks from the
    // same bytes — proves the wire format is real baseline JPEG
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(jpeg))
    assert(img != null && img.getWidth == 72 && img.getHeight == 64)
    val ras = img.getRaster
    for (y <- 0 until 64; x <- 0 until 72)
      assert(ras.getSample(x, y, 0) == bv(x / 8, y / 8), s"iio ($x,$y)")
  }

  test("JPEG decoder matches ImageIO on real grayscale encodes (its " +
      "Huffman/quant tables, textured content)") {
    // a textured gradient + noise image, encoded BY ImageIO (real
    // libjpeg-style tables, full AC coefficient traffic), decoded by
    // both; IDCT implementations may differ by rounding — tolerance 2,
    // mean abs <= 0.5 (JPEG-conformance-style bound)
    for (seed <- Seq(1, 7); q <- Seq(0.55f, 0.9f)) {
      val w = 45; val h = 38 // non-multiples of 8: edge-block clipping
      val src = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w) {
        val t = x * (3 + seed) + y * 7 + seed * 131
        val v = (((t % 97) * (t % 89)) % 256 + 256) % 256
        src.getRaster.setSample(x, y, 0, v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      val wtr = javax.imageio.ImageIO
        .getImageWritersByFormatName("jpeg").next()
      val p = wtr.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(q)
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      wtr.setOutput(ios)
      wtr.write(null, new javax.imageio.IIOImage(src, null, null), p)
      wtr.dispose(); ios.close()
      val jpeg = bos.toByteArray
      val ours = JpegKernel.decodeGrayY(jpeg)
      assert(ours != null, s"decode failed seed=$seed q=$q")
      assert(ours.width == w && ours.height == h)
      val ref = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(jpeg)).getRaster
      var sumAbs = 0L; var maxAbs = 0
      for (y <- 0 until h; x <- 0 until w) {
        val d = math.abs(ours.luma(y * w + x) - ref.getSample(x, y, 0))
        sumAbs += d; maxAbs = math.max(maxAbs, d)
      }
      assert(maxAbs <= 2, s"seed=$seed q=$q max |diff| $maxAbs")
      assert(sumAbs.toDouble / (w * h) <= 0.5,
        s"seed=$seed q=$q mean |diff| ${sumAbs.toDouble / (w * h)}")
    }
  }

  test("JPEG decoder: 3-component YCbCr (4:2:0 and 4:4:4) luma matches " +
      "the RGB-derived Y within rounding") {
    for (subsampled <- Seq(true, false)) {
      val w = 40; val h = 24
      val src = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        // low-saturation texture: the reference Y is recovered by
        // INVERTING ImageIO's YCbCr->RGB conversion, which clamps at
        // 0/255 — saturated chroma makes the inversion lossy and would
        // test the clamp, not the decoder
        val base = 50 + (x * 7 + y * 13) % 156
        val r = base + (x % 9); val g = base
        val b = math.max(0, base - (y % 11))
        src.setRGB(x, y, (r << 16) | (g << 8) | b)
      }
      val bos = new java.io.ByteArrayOutputStream()
      val wtr = javax.imageio.ImageIO
        .getImageWritersByFormatName("jpeg").next()
      val p = wtr.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      // ImageIO's writer picks 4:2:0 at ordinary quality and 4:4:4 at
      // very high quality — both paths exercised
      p.setCompressionQuality(if (subsampled) 0.7f else 1.0f)
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      wtr.setOutput(ios)
      wtr.write(null, new javax.imageio.IIOImage(src, null, null), p)
      wtr.dispose(); ios.close()
      val jpeg = bos.toByteArray
      val ours = JpegKernel.decodeGrayY(jpeg)
      assert(ours != null && ours.width == w && ours.height == h)
      // reference Y: invert ImageIO's RGB back through BT.601 — two
      // rounding layers (YCbCr->RGB then back), so tolerance 3
      val ref = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(jpeg))
      var maxAbs = 0; var sumAbs = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = ref.getRGB(x, y)
        val yy = math.round(0.299 * ((rgb >> 16) & 0xFF) +
          0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)).toInt
        val d = math.abs(ours.luma(y * w + x) - yy)
        maxAbs = math.max(maxAbs, d); sumAbs += d
      }
      assert(maxAbs <= 3, s"subsampled=$subsampled max |diff| $maxAbs")
      assert(sumAbs.toDouble / (w * h) <= 1.0,
        s"subsampled=$subsampled mean ${sumAbs.toDouble / (w * h)}")
    }
  }

  test("progressive JPEG fixture (SOF2, successive approximation + " +
      "EOBRUN) round-trips EXACTLY, equals its baseline twin, ImageIO agrees") {
    val bv = (bx: Int, by: Int) => {
      val t = bx * 7L + by * 11L + 3 * 131L
      val tq = ((t % 251) * (t % 251)) % 251
      ((((tq + bx + by * 3L + 3) % 256) + 256) % 256).toInt
    }
    val prog = JpegKernel.encodeGrayBlocksProgressive(9, 8, bv)
    val base = JpegKernel.encodeGrayBlocks(9, 8, bv)
    val gp = JpegKernel.decodeGrayY(prog)
    val gb = JpegKernel.decodeGrayY(base)
    assert(gp != null && gp.width == 72 && gp.height == 64)
    for (y <- 0 until 64; x <- 0 until 72)
      assert(gp.luma(y * 72 + x) == bv(x / 8, y / 8), s"($x,$y)")
    assert(gp.luma.toSeq == gb.luma.toSeq, "progressive != baseline twin")
    // ImageIO decodes the same bytes to the same flat blocks — the wire
    // format is real progressive JPEG, not a private dialect
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(prog))
    assert(ref != null && ref.getWidth == 72)
    for (y <- 0 until 64; x <- 0 until 72)
      assert(ref.getRaster.getSample(x, y, 0) == bv(x / 8, y / 8),
        s"ImageIO ($x,$y)")
    // EOBRUN spanning >2^4 blocks (one EOBn code for all 72 blocks) and
    // a grid needing multiple EOBn codes both decode
    val big = JpegKernel.encodeGrayBlocksProgressive(64, 65, bv) // 4160 blocks
    val gBig = JpegKernel.decodeGrayY(big)
    assert(gBig != null)
    for (k <- Seq(0, 5000, 100000))
      assert(gBig.luma(k) == bv((k % 512) / 8, (k / 512) / 8))
    // RESTART MARKERS in progressive scans: DRI + RSTn between every 5
    // blocks in all three scans (predictor/EOBRUN reset, bit realign) —
    // decode still bit-exact and ImageIO still agrees on the wire bytes
    val rst = JpegKernel.encodeGrayBlocksProgressive(9, 8, bv,
      restartEvery = 5)
    assert(rst.length > prog.length) // the RST markers are really there
    val gRst = JpegKernel.decodeGrayY(rst)
    assert(gRst != null && gRst.luma.toSeq == gp.luma.toSeq)
    val refRst = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(rst))
    assert(refRst != null)
    for (y <- 0 until 64; x <- 0 until 72)
      assert(refRst.getRaster.getSample(x, y, 0) == bv(x / 8, y / 8),
        s"ImageIO restart ($x,$y)")
    // a dropped restart marker is detected, not misparsed
    val broken = {
      var at = -1
      var i = rst.length / 3
      while (at < 0 && i < rst.length - 1) {
        if ((rst(i) & 0xFF) == 0xFF && (rst(i + 1) & 0xFF) >= 0xD0 &&
          (rst(i + 1) & 0xFF) <= 0xD7) at = i
        i += 1
      }
      assert(at > 0, "no RST marker found")
      rst.take(at) ++ rst.drop(at + 2) // excise one RSTn
    }
    assert(JpegKernel.decodeGrayY(broken) == null)
  }

  test("our decoder matches ImageIO's own PROGRESSIVE encodes (the IJG " +
      "scan script: spectral selection + AC successive approximation)") {
    // gray: single component, multi-scan with AC refinement passes
    for (seed <- Seq(1, 7); q <- Seq(0.55f, 0.9f)) {
      val w = 45; val h = 38
      val src = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w) {
        val t = x * (3 + seed) + y * 7 + seed * 131
        val v = (((t % 97) * (t % 89)) % 256 + 256) % 256
        src.getRaster.setSample(x, y, 0, v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      val wtr = javax.imageio.ImageIO
        .getImageWritersByFormatName("jpeg").next()
      val p = wtr.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(q)
      assert(p.canWriteProgressive)
      p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      wtr.setOutput(ios)
      wtr.write(null, new javax.imageio.IIOImage(src, null, null), p)
      wtr.dispose(); ios.close()
      val jpeg = bos.toByteArray
      // confirm it IS SOF2 (otherwise this test proves nothing)
      val hasSof2 = (0 until jpeg.length - 1).exists(i =>
        (jpeg(i) & 0xFF) == 0xFF && (jpeg(i + 1) & 0xFF) == 0xC2)
      assert(hasSof2, "ImageIO did not write a progressive stream")
      val ours = JpegKernel.decodeGrayY(jpeg)
      assert(ours != null, s"decode failed seed=$seed q=$q")
      assert(ours.width == w && ours.height == h)
      val ref = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(jpeg)).getRaster
      var sumAbs = 0L; var maxAbs = 0
      for (y <- 0 until h; x <- 0 until w) {
        val d = math.abs(ours.luma(y * w + x) - ref.getSample(x, y, 0))
        sumAbs += d; maxAbs = math.max(maxAbs, d)
      }
      assert(maxAbs <= 2, s"seed=$seed q=$q max |diff| $maxAbs")
      assert(sumAbs.toDouble / (w * h) <= 0.5,
        s"seed=$seed q=$q mean |diff| ${sumAbs.toDouble / (w * h)}")
    }
    // RGB 4:2:0 progressive: interleaved DC scans + chroma AC scans our
    // decoder byte-skips; luma recovered within the inversion tolerance
    val w = 40; val h = 24
    val src = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val base = 50 + (x * 7 + y * 13) % 156
      val r = base + (x % 9); val g = base
      val b = math.max(0, base - (y % 11))
      src.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    val wtr = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = wtr.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(0.7f)
    p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    wtr.setOutput(ios)
    wtr.write(null, new javax.imageio.IIOImage(src, null, null), p)
    wtr.dispose(); ios.close()
    val jpeg = bos.toByteArray
    val ours = JpegKernel.decodeGrayY(jpeg)
    assert(ours != null && ours.width == w && ours.height == h)
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(jpeg))
    var maxAbs = 0; var sumAbs = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = ref.getRGB(x, y)
      val yy = math.round(0.299 * ((rgb >> 16) & 0xFF) +
        0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)).toInt
      val d = math.abs(ours.luma(y * w + x) - yy)
      maxAbs = math.max(maxAbs, d); sumAbs += d
    }
    assert(maxAbs <= 3, s"progressive 4:2:0 max |diff| $maxAbs")
    assert(sumAbs.toDouble / (w * h) <= 1.0,
      s"progressive 4:2:0 mean ${sumAbs.toDouble / (w * h)}")
  }

  test("JPEG dirty bytes degrade, never throw; out-of-scope layouts null") {
    val good = JpegKernel.encodeGrayBlocks(8, 8, (bx, by) => (bx + by) % 256)
    assert(JpegKernel.decodeGrayY(null) == null)
    assert(JpegKernel.decodeGrayY(Array[Byte]()) == null)
    assert(JpegKernel.decodeGrayY("junkjunkjunk".getBytes) == null)
    assert(JpegKernel.decodeGrayY(good.take(40)) == null) // truncated
    assert(JpegKernel.decodeGrayY(good.dropRight(10)) == null)
    val flipped = good.clone()
    flipped(2) = 0x00 // break the first marker
    assert(JpegKernel.decodeGrayY(flipped) == null)
    // a baseline stream MISLABELED as SOF2: its SOS (Ss=0, Se=63) is
    // invalid for a progressive DC scan -> null, not garbage
    val prog = good.clone()
    val sofAt = {
      var i = 2; var at = -1
      while (at < 0 && i + 1 < prog.length) {
        if ((prog(i) & 0xFF) == 0xFF && (prog(i + 1) & 0xFF) == 0xC0) at = i
        i += 1
      }
      at
    }
    assert(sofAt > 0)
    prog(sofAt + 1) = 0xC2.toByte
    assert(JpegKernel.decodeGrayY(prog) == null)
    // REAL progressive streams: truncation at every scan boundary and
    // mid-entropy degrades to null, never a throw or hang
    val realProg = JpegKernel.encodeGrayBlocksProgressive(4, 4,
      (bx, by) => (bx * 31 + by * 57) % 256)
    assert(JpegKernel.decodeGrayY(realProg) != null)
    for (cut <- Seq(30, realProg.length / 2, realProg.length - 3,
        realProg.length - 1))
      assert(JpegKernel.decodeGrayY(realProg.take(cut)) == null, s"cut $cut")
    val noisy = realProg.clone()
    noisy(realProg.length - 20) = (noisy(realProg.length - 20) ^ 0x7F).toByte
    JpegKernel.decodeGrayY(noisy) // any verdict, but never a throw
  }

  test("JpegGrayStats + BlockJpegEncode: DataFrame chain, dirt " +
      "contributes nulls, hashes ride the shared machinery") {
    val df = spark.range(6).select(col("id").as("doc_id"))
      .select(col("doc_id"),
        when(col("doc_id") =!= 0,
          BlockJpegEncode(col("doc_id"), lit(8L), lit(8L)))
          .otherwise(lit("junk".getBytes)).as("content"))
      .select(col("doc_id"), JpegGrayStats(col("content")).as("s"))
      .select(col("doc_id"), col("s.ok"), col("s.width"), col("s.n_px"),
        col("s.sum_luma"), col("s.ahash_hi"), col("s.ahash_lo"))
      .orderBy("doc_id").collect()
    assert(!df(0).getBoolean(1)) // junk -> ok=false
    assert(df(0).isNullAt(2) && df(0).isNullAt(5))
    for (i <- 1 until 6) {
      assert(df(i).getBoolean(1))
      assert(df(i).getLong(2) == 64 && df(i).getLong(3) == 4096)
      // exact sum replay from the planted block formula
      val s = i.toLong
      val want = (for (bx <- 0 until 8; by <- 0 until 8) yield {
        val t = bx * 7L + by * 11L + s * 131L
        val tq = ((t % 251) * (t % 251)) % 251
        64L * ((((tq + bx + by * 3L + s) % 256) + 256) % 256)
      }).sum
      assert(df(i).getLong(4) == want, s"doc $i sum")
      assert(!df(i).isNullAt(5) && !df(i).isNullAt(6))
    }
  }

  // ---------------- GIF content leg ----------------

  private def grayRampGif(w: Int, h: Int, interlaced: Boolean,
      pixel: (Int, Int) => Int): Array[Byte] = {
    // ImageIO-written GIF over an exact 256-gray ramp palette: the
    // writer runs REAL LZW compression our decoder must replay
    val ramp = (0 until 256).map(_.toByte).toArray
    val cm = new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, pixel(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    val wtr = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val p = wtr.getDefaultWriteParam
    // ImageIO's GIF writer interlaces under MODE_DEFAULT (progressive
    // left to the writer) and writes sequential under MODE_DISABLED
    p.setProgressiveMode(if (interlaced)
      javax.imageio.ImageWriteParam.MODE_DEFAULT
    else javax.imageio.ImageWriteParam.MODE_DISABLED)
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    wtr.setOutput(ios)
    wtr.write(null, new javax.imageio.IIOImage(img, null, null), p)
    wtr.dispose(); ios.close()
    bos.toByteArray
  }

  test("GIF literal-LZW fixture round-trips exactly; ImageIO reads our " +
      "wire bytes to the same pixels") {
    def pv(x: Int, y: Int): Int = (x * 31 + y * 17 + 5) % 256
    val gif = GifKernel.encodeGrayLiteral(37, 23, pv)
    val g = GifKernel.decodeGrayFirstFrame(gif)
    assert(g != null && g.width == 37 && g.height == 23)
    for (y <- 0 until 23; x <- 0 until 37)
      assert(g.luma(y * 37 + x) == pv(x, y), s"($x,$y)")
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(gif))
    assert(img != null && img.getWidth == 37 && img.getHeight == 23)
    for (y <- 0 until 23; x <- 0 until 37)
      assert(img.getRaster.getSample(x, y, 0) == pv(x, y), s"iio ($x,$y)")
  }

  test("GIF decoder replays ImageIO's REAL compressed LZW, interlaced " +
      "and not, bit-exact through the gray ramp") {
    def pv(x: Int, y: Int): Int = {
      val t = x * 13 + y * 31 + 7
      ((t % 251) * (t % 251)) % 251 % 256
    }
    for (interlaced <- Seq(false, true)) {
      val gif = grayRampGif(50, 29, interlaced, pv)
      val g = GifKernel.decodeGrayFirstFrame(gif)
      assert(g != null && g.width == 50 && g.height == 29,
        s"interlaced=$interlaced")
      for (y <- 0 until 29; x <- 0 until 50)
        assert(g.luma(y * 50 + x) == pv(x, y),
          s"interlaced=$interlaced ($x,$y)")
    }
  }

  test("GIF dirty bytes degrade, never throw") {
    val good = GifKernel.encodeGrayLiteral(16, 16, (x, y) => (x + y) % 256)
    assert(GifKernel.decodeGrayFirstFrame(null) == null)
    assert(GifKernel.decodeGrayFirstFrame("junk".getBytes) == null)
    assert(GifKernel.decodeGrayFirstFrame(good.take(40)) == null)
    assert(GifKernel.decodeGrayFirstFrame(good.dropRight(30)) == null)
    val bad = good.clone(); bad(0) = 'X'
    assert(GifKernel.decodeGrayFirstFrame(bad) == null)
    // corrupt LZW payload: flip a byte mid-stream — either decodes to
    // SOMETHING (LZW has no checksum) or nulls, but never throws
    val mid = good.clone()
    mid(good.length / 2) = (mid(good.length / 2) ^ 0x5A).toByte
    val r = GifKernel.decodeGrayFirstFrame(mid)
    assert(r == null || r.luma.length == 256)
  }

  test("ImageGrayStats sniffs the container per row: PNG and JPEG land " +
      "in one stat space, junk degrades") {
    val png = PngKernel.encodeGray(16, 16, pix(3, 11, 5, 0) _, y => y % 5)
    val jpg = JpegKernel.encodeGrayBlocks(2, 2, (bx, by) => 50 + bx + by)
    val rows = Seq((1L, png), (2L, jpg), (3L, "junk".getBytes))
      .toDF("media_id", "content")
      .select(col("media_id"), ImageGrayStats(col("content")).as("s"))
      .select(col("media_id"), col("s.ok"), col("s.width"), col("s.sum_luma"))
      .orderBy("media_id").collect()
    assert(rows(0).getBoolean(1) && rows(0).getLong(2) == 16)
    assert(rows(1).getBoolean(1) && rows(1).getLong(2) == 16)
    // JPEG sum replay: 4 flat blocks of 64 px each
    assert(rows(1).getLong(3) == 64L * (50 + 51 + 51 + 52))
    assert(!rows(2).getBoolean(1))
    // PNG row matches the dedicated kernel exactly (same decode path)
    val g = PngKernel.decodeGray(png)
    assert(rows(0).getLong(3) == g.luma.map(_.toLong).sum)
  }

  test("WAV dirty bytes and short clips degrade, never throw") {
    assert(WavKernel.decodePcm(null) == null)
    assert(WavKernel.decodePcm("RIFFnope".getBytes) == null)
    val wav = WavKernel.encodePcm16Mono(100, 8000, sample(1))
    assert(WavKernel.decodePcm(wav.take(30)) == null)
    assert(WavKernel.energyFingerprint(Array.fill(63)(5)) == Long.MinValue)
  }

  test("audioContentStats: exact integers + fingerprint, via DataFrame") {
    val ids = spark.range(4).toDF("doc_id")
    val media = Multimodal.syntheticPcmCorpus(ids, "doc_id",
      col("doc_id"), lit(128L) + col("doc_id") * 16, lit(8000L))
    val st = Multimodal.audioContentStats(media).orderBy("media_id").collect()
    st.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val n = (128 + id * 16).toInt
      val ss = (0 until n).map(sample(id))
      assert(r.getAs[Boolean]("ok") && r.getAs[Long]("n_samples") == n)
      assert(r.getAs[Long]("sum_abs") == ss.map(v => math.abs(v.toLong)).sum)
      assert(r.getAs[Long]("peak_abs") == ss.map(v => math.abs(v.toLong)).max)
      val zc = (1 until n).count(i => (ss(i - 1) < 0) != (ss(i) < 0))
      assert(r.getAs[Long]("zero_cross") == zc.toLong)
      val fp = WavKernel.energyFingerprint(ss.toArray)
      assert(r.getAs[Long]("fp") == fp)
    }
  }

  test("resizeGray: exact floor cell means, upsampling refused, DF fanout") {
    val g = PngKernel.decodeGray(
      PngKernel.encodeGray(8, 8, pix(1, 11, 5, 0) _, _ => 0))
    val r = PngKernel.resizeGray(g, 4, 4)
    assert(r.length == 16)
    // 2x2 cells: floor mean of the four source pixels
    for (cy <- 0 until 4; cx <- 0 until 4) {
      val s = (for (y <- cy * 2 until cy * 2 + 2; x <- cx * 2 until cx * 2 + 2)
        yield g.luma(y * 8 + x).toLong).sum
      assert(r(cy * 4 + cx) == (s / 4).toInt, s"cell ($cx,$cy)")
    }
    assert(PngKernel.resizeGray(g, 9, 4) == null) // upsample refused
    val ids = spark.range(3).toDF("doc_id")
    val media = Multimodal.syntheticGrayPngCorpus(ids, "doc_id",
      col("doc_id"), lit(8), lit(8), lit(0))
      .withColumn("content", when(col("media_id") === 0,
        expr("substring(content, 2)")).otherwise(col("content")))
    val rows = Multimodal.imageResize(media, 4, 4).collect()
    // doc 0 corrupted -> zero rows; docs 1, 2 emit 16 pixels each
    assert(rows.length == 32 && rows.forall(_.getLong(0) != 0L))
    assert(rows.forall(r => r.getLong(2) >= 0 && r.getLong(2) <= 255))
  }

  test("MP4 sample table roundtrip: stsz/stco walk recovers exact frames") {
    val seed = 5L; val n = 12
    val mp4 = Mp4Kernel.encodeSamples(seed, n)
    val got = Mp4Kernel.decodeSamples(mp4, maxSamples = 4096)
    assert(got != null && got.length == n)
    var expOff = 16L + (76 + 8 * n) + 8 // ftyp + moov + mdat header
    for (i <- 0 until n) {
      val sz = 8 + (seed + i * 7) % 24
      assert(got(i).size == sz && got(i).offset == expOff, s"sample $i")
      val bytes = (0 until sz.toInt).map(j => (seed + i * 31 + j * 11) % 256)
      assert(got(i).firstByte == bytes.head && got(i).byteSum == bytes.sum,
        s"sample $i content")
      expOff += sz
    }
    // dirty bytes degrade, never throw
    assert(Mp4Kernel.decodeSamples(null, 100) == null)
    assert(Mp4Kernel.decodeSamples("junkjunkjunkjunkjunk".getBytes, 100) == null)
    assert(Mp4Kernel.decodeSamples(mp4.take(40), 100) == null)
    assert(Mp4Kernel.decodeSamples(mp4, maxSamples = 3) == null) // over cap
    // zero-size sample with offset == file length: `off + size > n` is
    // false yet the first-byte read would index past the buffer — must
    // return null, never throw (regression: AIOOBE on crawl-dirty bytes)
    val zeroSz = mp4.clone()
    val sizesAt = 76            // stsz payload: sizes start (fixed layout)
    val offsAt = 56 + 20 + 4 * n + 16 // stco offsets start
    def w4(buf: Array[Byte], p: Int, v: Long): Unit = {
      buf(p) = ((v >> 24) & 0xFF).toByte; buf(p + 1) = ((v >> 16) & 0xFF).toByte
      buf(p + 2) = ((v >> 8) & 0xFF).toByte; buf(p + 3) = (v & 0xFF).toByte
    }
    w4(zeroSz, sizesAt, 0L)                  // sample 0 size = 0
    w4(zeroSz, offsAt, zeroSz.length.toLong) // sample 0 offset = EOF
    assert(Mp4Kernel.decodeSamples(zeroSz, 100) == null)
  }

  test("videoSampleStats: per-frame rows via DataFrame, dirt contributes none") {
    val ids = spark.range(4).toDF("doc_id")
    val media = Multimodal.syntheticMp4Corpus(ids, "doc_id",
      col("doc_id") % 3, lit(4L) + col("doc_id"))
      .withColumn("content",
        when(col("media_id") === 0,
          expr("concat(X'00000000', substring(content, 5))"))
          .otherwise(col("content")))
    val rows = Multimodal.videoSampleStats(media)
      .orderBy("media_id", "sample_idx").collect()
    // doc 0 corrupted -> zero rows; docs 1..3 have 5/6/7 samples
    assert(rows.map(_.getLong(0)).toSeq.distinct == Seq(1L, 2L, 3L))
    assert(rows.count(_.getLong(0) == 1L) == 5 &&
      rows.count(_.getLong(0) == 3L) == 7)
    rows.filter(_.getLong(0) == 2L).foreach { r =>
      val i = r.getAs[Long]("sample_idx")
      assert(r.getAs[Long]("sample_size") == 8 + (2 + i * 7) % 24)
    }
  }

  test("binaryExactDedup groups identical payloads, keeps min id") {
    val ids = spark.range(9).toDF("doc_id")
    // content depends only on doc_id % 3 -> 3 groups of 3
    val media = Multimodal.syntheticGrayPngCorpus(ids, "doc_id",
      col("doc_id") % 3, lit(10), lit(10), lit(0))
    val d = Multimodal.binaryExactDedup(media).orderBy("keep_id").collect()
    assert(d.length == 3)
    assert(d.map(_.getAs[Long]("n_copies")).toSeq == Seq(3L, 3L, 3L))
    assert(d.map(_.getAs[Long]("keep_id")).toSeq == Seq(0L, 1L, 2L))
  }
}
