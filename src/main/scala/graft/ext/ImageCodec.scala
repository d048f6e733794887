package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pure-JVM PNG pixel codec — the CONTENT leg of the multimodal family
  * (the container-metadata leg lives in [[Multimodal]]). The sandbox has
  * no image library, but it doesn't need one for PNG: the format is zlib
  * (`java.util.zip.Inflater`/`Deflater`, core JVM) plus five per-row
  * byte filters (PNG spec §6) — a real decode, not a stub. Decoded luma
  * feeds the content-derived signals the metadata walk can't see:
  * perceptual hashes (aHash 8×8 mean-threshold, dHash 9×8 gradient —
  * the standard near-dup fingerprints), exact pixel statistics
  * (mean/variance for blank/low-information screens), all quantized to
  * integer units so a relational oracle replays them exactly.
  *
  * Everything is a native `CodegenFallback` expression evaluated once
  * per row inside the scan projection — no UDF registry, no
  * serialization cliff, zero shuffle; the 100 TB shape is "one linear
  * pass over the binary column, emit a 10-field struct".
  *
  * Reference behavior coverage: the reference engine has no media
  * pipeline at all (provincia-brescia/OPL is OLAP-only); this family is
  * part of the training-data-pipeline extension surface.
  */
private[ext] object PngKernel {

  /** Decoded 8-bit grayscale view of a PNG: luma row-major, one Int
    * 0..255 per pixel. */
  final case class Gray(width: Int, height: Int, luma: Array[Int])

  private val SIG = Array[Int](0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF

  private def be4(b: Array[Byte], i: Int): Long =
    ((u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) |
      (u8(b, i + 2) << 8) | u8(b, i + 3)) & 0xFFFFFFFFL

  /** Adam7 pass grid (PNG spec §8.2): x/y start offsets and steps for
    * the seven progressive passes. */
  private val A7X0 = Array(0, 4, 0, 2, 0, 1, 0)
  private val A7Y0 = Array(0, 0, 4, 0, 2, 0, 1)
  private val A7DX = Array(8, 8, 4, 4, 2, 2, 1)
  private val A7DY = Array(8, 8, 8, 4, 4, 2, 2)

  /** Decode a PNG to 8-bit luma. Returns null on ANYTHING unsupported
    * or malformed — truncated chunks, non-zlib IDAT — never throws
    * (crawl-dirty bytes are the expected input). Supported layouts
    * (the complete PNG §11.2.2 depth/type matrix except 16-bit
    * palette-less alpha nuances — see below):
    *   color type 0 (gray):    depths 1, 2, 4, 8, 16
    *   color type 3 (palette): depths 1, 2, 4, 8 (PLTE lookup)
    *   color types 2/4/6:      depths 8, 16
    * interlace 0 (sequential) and 1 (Adam7 — seven sub-images, each
    * filtered independently, scattered onto the full grid per the
    * spec §8.2 pattern). Sub-byte gray samples scale to 8-bit by the
    * standard level replication (v·255/maxLevel — exact integers for
    * depths 1/2/4); 16-bit samples reduce to their high byte (the
    * PNG-recommended 16→8 reduction); color reduces to luma with the
    * integer BT.601 weights (77·R + 150·G + 29·B) >> 8 (weights sum
    * to 256 — exact, replayable arithmetic); palette indices map
    * through the PLTE entries' lumas. */
  def decodeGray(png: Array[Byte]): Gray = {
    if (png == null || png.length < 8) return null
    var i = 0
    while (i < 8) { if (u8(png, i) != SIG(i)) return null; i += 1 }
    var pos = 8
    var width = 0; var height = 0; var colorType = -1; var interlace = 0
    var bitDepth = 8
    var seenIhdr = false; var done = false
    var palLuma: Array[Int] = null
    val idat = new java.io.ByteArrayOutputStream()
    while (!done) {
      if (pos + 8 > png.length) return null
      val len = be4(png, pos)
      if (len < 0 || len > Int.MaxValue - 12 || pos + 12 + len > png.length)
        return null
      val typ = new String(png, pos + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      typ match {
        case "IHDR" =>
          if (seenIhdr || len != 13) return null
          seenIhdr = true
          val d = pos + 8
          val w = be4(png, d); val h = be4(png, d + 4)
          // bounded dims: a forged IHDR must not allocate the heap away
          if (w < 1 || h < 1 || w > (1L << 20) || h > (1L << 20) ||
            w * h > (1L << 28)) return null
          width = w.toInt; height = h.toInt
          bitDepth = u8(png, d + 8); colorType = u8(png, d + 9)
          interlace = u8(png, d + 12)
          if (interlace > 1) return null
          val depthOk = colorType match {
            case 0 => Set(1, 2, 4, 8, 16).contains(bitDepth)
            case 3 => Set(1, 2, 4, 8).contains(bitDepth)
            case 2 | 4 | 6 => bitDepth == 8 || bitDepth == 16
            case _ => false
          }
          if (!depthOk) return null
        case "PLTE" =>
          if (!seenIhdr || palLuma != null || idat.size() > 0) return null
          if (len < 3 || len % 3 != 0 || len > 768) return null
          val n = (len / 3).toInt
          palLuma = new Array[Int](n)
          var e = 0
          while (e < n) {
            val o = pos + 8 + e * 3
            palLuma(e) = (77 * u8(png, o) + 150 * u8(png, o + 1) +
              29 * u8(png, o + 2)) >> 8
            e += 1
          }
        case "IDAT" =>
          if (!seenIhdr) return null
          idat.write(png, pos + 8, len.toInt)
        case "IEND" => done = true
        case _ => () // ancillary chunks: skip
      }
      pos += 12 + len.toInt
    }
    if (!seenIhdr) return null
    if (colorType == 3 && palLuma == null) return null // PLTE is mandatory
    val channels = colorType match {
      case 0 | 3 => 1; case 2 => 3; case 4 => 2; case 6 => 4
    }
    // bits per pixel drives row geometry; filters operate on BYTES with
    // the left neighbor one full pixel back (min 1 byte — spec §7.2)
    val pixBits = channels * bitDepth
    def rowBytesOf(pw: Int): Int = (pw * pixBits + 7) / 8
    val bppBytes = math.max(1, pixBits / 8)
    // pass geometry: interlace 0 is one full-frame pass; Adam7 is the
    // seven §8.2 sub-images (empty passes contribute zero bytes)
    val passes: Array[(Int, Int, Int, Int, Int, Int)] =
      if (interlace == 0) Array((0, 0, 1, 1, width, height))
      else (0 until 7).map { p =>
        val pw = (width - A7X0(p) + A7DX(p) - 1) / A7DX(p)
        val ph = (height - A7Y0(p) + A7DY(p) - 1) / A7DY(p)
        (A7X0(p), A7Y0(p), A7DX(p), A7DY(p), math.max(pw, 0), math.max(ph, 0))
      }.toArray
    var expected = 0L
    for ((_, _, _, _, pw, ph) <- passes if pw > 0 && ph > 0)
      expected += ph.toLong * (1L + rowBytesOf(pw))
    if (expected > Int.MaxValue) return null
    val raw = new Array[Byte](expected.toInt)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var off = 0
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        // needsDictionary: FDICT zlib headers stall inflate at 0 forever
        if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
          return null // truncated or dictionary-requiring stream
        off += n
      }
      if (off != raw.length) return null
    } catch {
      case _: java.util.zip.DataFormatException => return null
    } finally inf.end()

    val luma = new Array[Int](width * height)
    val bpp = bppBytes
    var passOff = 0
    var p = 0
    while (p < passes.length) {
      val (x0, y0, dx, dy, pw, ph) = passes(p)
      if (pw > 0 && ph > 0) {
        val rowBytes = rowBytesOf(pw)
        // unfilter this pass in place (spec §6: recon = filt + predictor,
        // mod 256); each pass filters against ITS OWN prior row only
        var y = 0
        while (y < ph) {
          val rs = passOff + y * (1 + rowBytes) + 1
          val ps = rs - (1 + rowBytes) // prior row start (reconstructed)
          val ft = u8(raw, rs - 1)
          if (ft > 4) return null
          var x = 0
          while (x < rowBytes) {
            val left = if (x >= bpp) u8(raw, rs + x - bpp) else 0
            val up = if (y > 0) u8(raw, ps + x) else 0
            val ul = if (y > 0 && x >= bpp) u8(raw, ps + x - bpp) else 0
            val pred = ft match {
              case 0 => 0
              case 1 => left
              case 2 => up
              case 3 => (left + up) >> 1
              case 4 =>
                val pp = left + up - ul
                val pa = math.abs(pp - left); val pb = math.abs(pp - up)
                val pc = math.abs(pp - ul)
                if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
            }
            raw(rs + x) = ((u8(raw, rs + x) + pred) & 0xFF).toByte
            x += 1
          }
          y += 1
        }
        // scatter this pass's pixels to their full-grid positions
        y = 0
        while (y < ph) {
          val rs = passOff + y * (1 + rowBytes) + 1
          var px = 0
          while (px < pw) {
            // 8-bit channel value of sample `ch` of pixel `px` (16-bit
            // samples reduce to their high byte; sub-byte handled below)
            def samp(ch: Int): Int =
              if (bitDepth == 16) u8(raw, rs + (px * channels + ch) * 2)
              else u8(raw, rs + px * channels + ch)
            val v =
              if (bitDepth < 8) {
                // single channel by the depth matrix (ct 0 or 3)
                val bitpos = px * bitDepth
                val mask = (1 << bitDepth) - 1
                val level = (u8(raw, rs + (bitpos >> 3)) >>
                  (8 - bitDepth - (bitpos & 7))) & mask
                if (colorType == 3) {
                  if (level >= palLuma.length) return null // out of palette
                  palLuma(level)
                } else level * 255 / mask // exact: depths 1/2/4 divide 255
              } else colorType match {
                case 3 =>
                  val idx = samp(0)
                  if (idx >= palLuma.length) return null // out-of-palette
                  palLuma(idx)
                case 0 | 4 => samp(0)
                case _ => (77 * samp(0) + 150 * samp(1) + 29 * samp(2)) >> 8
              }
            luma((y0 + y * dy) * width + (x0 + px * dx)) = v
            px += 1
          }
          y += 1
        }
        passOff += ph * (1 + rowBytes)
      }
      p += 1
    }
    Gray(width, height, luma)
  }

  /** Per-cell milli-quantized mean luma over a `gw`×`gh` grid with the
    * standard integer partition boundaries floor(c·extent/grid) — the
    * downsample both perceptual hashes are built on. Exact integer
    * arithmetic end to end (floor division), so a SQL comprehension
    * replays every cell. */
  def cellMeansMilli(g: Gray, gw: Int, gh: Int): Array[Long] = {
    val out = new Array[Long](gw * gh)
    var cy = 0
    while (cy < gh) {
      val y0 = (cy.toLong * g.height / gh).toInt
      val y1 = ((cy + 1).toLong * g.height / gh).toInt
      var cx = 0
      while (cx < gw) {
        val x0 = (cx.toLong * g.width / gw).toInt
        val x1 = ((cx + 1).toLong * g.width / gw).toInt
        var s = 0L; var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += g.luma(y * g.width + x); x += 1 }
          y += 1
        }
        val cnt = (y1 - y0).toLong * (x1 - x0)
        out(cy * gw + cx) = if (cnt == 0) 0L else s * 1000L / cnt
        cx += 1
      }
      cy += 1
    }
    out
  }

  /** aHash: 8×8 cell means, global mean of the 64 cell values, bit
    * i = cy·8+cx set iff cell > mean, for i = 0..62 — bit 63 (the
    * bottom-right cell) is RESERVED: it is the sign bit, and a hash
    * with only it set would BE the Long.MinValue sentinel, so valid
    * images could silently read as too-small. The mean still covers
    * all 64 cells. Needs width ≥ 8 and height ≥ 8 (else Long.MinValue
    * sentinel → callers emit null). */
  def ahash(g: Gray): Long = {
    if (g.width < 8 || g.height < 8) return Long.MinValue
    val cells = cellMeansMilli(g, 8, 8)
    var tot = 0L; var i = 0
    while (i < 64) { tot += cells(i); i += 1 }
    val mean = tot / 64
    var fp = 0L; i = 0
    while (i < 63) { if (cells(i) > mean) fp |= (1L << i); i += 1 }
    fp
  }

  /** dHash: 9×8 cell means, bit cy·8+cx set iff cell(cx+1) > cell(cx)
    * within the row — the horizontal-gradient fingerprint (robust to
    * global brightness shifts aHash is blind to). Bit 63 (cy=7, cx=7)
    * is RESERVED for the same reason as [[ahash]]'s: it is the sign
    * bit and the Long.MinValue sentinel must stay unreachable. Needs
    * width ≥ 9, height ≥ 8. */
  def dhash(g: Gray): Long = {
    if (g.width < 9 || g.height < 8) return Long.MinValue
    val cells = cellMeansMilli(g, 9, 8)
    var fp = 0L
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 8) {
        if ((cy * 8 + cx) < 63 &&
            cells(cy * 9 + cx + 1) > cells(cy * 9 + cx))
          fp |= (1L << (cy * 8 + cx))
        cx += 1
      }
      cy += 1
    }
    fp
  }

  /** Exact box-downsample resize to `ow`×`oh` luma: per output pixel the
    * floor mean of its source cell (standard integer partition
    * boundaries floor(c·extent/grid) — the same grid the hashes use,
    * un-quantized). Null when the image is smaller than the target in
    * either axis (upsampling needs interpolation policy — out of the
    * exact-integer contract). */
  def resizeGray(g: Gray, ow: Int, oh: Int): Array[Int] = {
    require(ow > 0 && oh > 0, s"bad target ${ow}x$oh")
    if (g.width < ow || g.height < oh) return null
    val out = new Array[Int](ow * oh)
    var cy = 0
    while (cy < oh) {
      val y0 = (cy.toLong * g.height / oh).toInt
      val y1 = ((cy + 1).toLong * g.height / oh).toInt
      var cx = 0
      while (cx < ow) {
        val x0 = (cx.toLong * g.width / ow).toInt
        val x1 = ((cx + 1).toLong * g.width / ow).toInt
        var s = 0L; var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += g.luma(y * g.width + x); x += 1 }
          y += 1
        }
        out(cy * ow + cx) = (s / ((y1 - y0).toLong * (x1 - x0))).toInt
        cx += 1
      }
      cy += 1
    }
    out
  }

  // ------------------------------ encode ------------------------------

  private def crcChunk(out: java.io.ByteArrayOutputStream, typ: String,
      data: Array[Byte]): Unit = {
    def w4(v: Long): Unit = {
      out.write(((v >> 24) & 0xFF).toInt); out.write(((v >> 16) & 0xFF).toInt)
      out.write(((v >> 8) & 0xFF).toInt); out.write((v & 0xFF).toInt)
    }
    w4(data.length.toLong)
    val tb = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    out.write(tb, 0, 4); out.write(data, 0, data.length)
    val crc = new java.util.zip.CRC32()
    crc.update(tb); crc.update(data)
    w4(crc.getValue)
  }

  /** Encode an 8-bit GRAYSCALE PNG (color type 0), real zlib IDAT, real
    * CRCs, with the row filter CHOSEN by `filterOf(y)` (0..4) and applied
    * per spec — so a decoder must implement all five unfilters correctly
    * to get the pixels back. Deterministic for fixed inputs (Deflater
    * default level on a fixed byte stream). */
  def encodeGray(width: Int, height: Int, pixel: (Int, Int) => Int,
      filterOf: Int => Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val raw = new Array[Byte](height * (1 + width))
    var y = 0
    while (y < height) {
      val rs = y * (1 + width) + 1
      val ft = filterOf(y) % 5
      raw(rs - 1) = ft.toByte
      var x = 0
      while (x < width) {
        val cur = pixel(x, y) & 0xFF
        val left = if (x > 0) pixel(x - 1, y) & 0xFF else 0
        val up = if (y > 0) pixel(x, y - 1) & 0xFF else 0
        val ul = if (y > 0 && x > 0) pixel(x - 1, y - 1) & 0xFF else 0
        val pred = ft match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) >> 1
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
        }
        raw(rs + x) = ((cur - pred) & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    val def_ = new java.util.zip.Deflater()
    def_.setInput(raw); def_.finish()
    val buf = new Array[Byte](math.max(1024, raw.length + 64))
    val zout = new java.io.ByteArrayOutputStream()
    while (!def_.finished()) {
      val n = def_.deflate(buf)
      zout.write(buf, 0, n)
    }
    def_.end()
    val out = new java.io.ByteArrayOutputStream()
    SIG.foreach(out.write)
    val ihdr = new Array[Byte](13)
    def put4(o: Int, v: Int): Unit = {
      ihdr(o) = ((v >> 24) & 0xFF).toByte; ihdr(o + 1) = ((v >> 16) & 0xFF).toByte
      ihdr(o + 2) = ((v >> 8) & 0xFF).toByte; ihdr(o + 3) = (v & 0xFF).toByte
    }
    put4(0, width); put4(4, height)
    ihdr(8) = 8 // bit depth
    ihdr(9) = 0 // color type: grayscale
    crcChunk(out, "IHDR", ihdr)
    crcChunk(out, "IDAT", zout.toByteArray)
    crcChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  private def filterRow(raw: Array[Byte], rs: Int, ft: Int, bpp: Int,
      rowBytes: Int, cur: Int => Int, prior: Int => Int): Unit = {
    raw(rs - 1) = ft.toByte
    var x = 0
    while (x < rowBytes) {
      val left = if (x >= bpp) cur(x - bpp) else 0
      val up = prior(x)
      val ul = if (x >= bpp) prior(x - bpp) else 0
      val pred = ft match {
        case 0 => 0
        case 1 => left
        case 2 => up
        case 3 => (left + up) >> 1
        case 4 =>
          val p = left + up - ul
          val pa = math.abs(p - left); val pb = math.abs(p - up)
          val pc = math.abs(p - ul)
          if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
      }
      raw(rs + x) = ((cur(x) - pred) & 0xFF).toByte
      x += 1
    }
  }

  private def deflateAll(raw: Array[Byte]): Array[Byte] = {
    val def_ = new java.util.zip.Deflater()
    def_.setInput(raw); def_.finish()
    val buf = new Array[Byte](math.max(1024, raw.length + 64))
    val zout = new java.io.ByteArrayOutputStream()
    while (!def_.finished()) zout.write(buf, 0, def_.deflate(buf))
    def_.end()
    zout.toByteArray
  }

  private def wrapPng(width: Int, height: Int, colorType: Int,
      interlace: Int, plte: Array[Byte], idat: Array[Byte],
      bitDepth: Int = 8): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    SIG.foreach(out.write)
    val ihdr = new Array[Byte](13)
    def put4(o: Int, v: Int): Unit = {
      ihdr(o) = ((v >> 24) & 0xFF).toByte; ihdr(o + 1) = ((v >> 16) & 0xFF).toByte
      ihdr(o + 2) = ((v >> 8) & 0xFF).toByte; ihdr(o + 3) = (v & 0xFF).toByte
    }
    put4(0, width); put4(4, height)
    ihdr(8) = bitDepth.toByte; ihdr(9) = colorType.toByte
    ihdr(12) = interlace.toByte
    crcChunk(out, "IHDR", ihdr)
    if (plte != null) crcChunk(out, "PLTE", plte)
    crcChunk(out, "IDAT", idat)
    crcChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Encode a SUB-BYTE grayscale PNG (bit depth 1, 2 or 4): packed
    * big-endian-within-byte sample levels 0..(2^depth − 1), per-row
    * filters chosen by `filterOf(y)` (filters act on the PACKED bytes
    * with a one-byte left offset — spec §7.2; decoding these proves
    * the byte-granular unfilter + bit unpacking compose). */
  def encodeGraySub(width: Int, height: Int, depth: Int,
      level: (Int, Int) => Int, filterOf: Int => Int): Array[Byte] = {
    require(width > 0 && height > 0 && Set(1, 2, 4).contains(depth),
      s"bad sub-byte png ${width}x$height depth $depth")
    val mask = (1 << depth) - 1
    val rowBytes = (width * depth + 7) / 8
    def packed(y: Int): Array[Int] = {
      val row = new Array[Int](rowBytes)
      var x = 0
      while (x < width) {
        val bitpos = x * depth
        row(bitpos >> 3) |= (level(x, y) & mask) <<
          (8 - depth - (bitpos & 7))
        x += 1
      }
      row
    }
    val raw = new Array[Byte](height * (1 + rowBytes))
    var y = 0
    while (y < height) {
      val rs = y * (1 + rowBytes) + 1
      val cur = packed(y)
      val pri = if (y > 0) packed(y - 1) else new Array[Int](rowBytes)
      filterRow(raw, rs, filterOf(y) % 5, 1, rowBytes, cur(_), pri(_))
      y += 1
    }
    wrapPng(width, height, 0, 0, null, deflateAll(raw), depth)
  }

  /** Encode an 8-bit PALETTE PNG (color type 3): a real PLTE chunk of
    * `nPal` RGB triples, one palette index per pixel, per-row filters
    * chosen by `filterOf(y)` — a decoder must walk PLTE and remap every
    * index to get luma back. */
  def encodePalette(width: Int, height: Int, nPal: Int,
      rgb: Int => (Int, Int, Int), idx: (Int, Int) => Int,
      filterOf: Int => Int): Array[Byte] = {
    require(width > 0 && height > 0 && nPal >= 1 && nPal <= 256,
      s"bad palette png ${width}x$height/$nPal")
    val plte = new Array[Byte](nPal * 3)
    var e = 0
    while (e < nPal) {
      val (r, g, b) = rgb(e)
      plte(e * 3) = (r & 0xFF).toByte; plte(e * 3 + 1) = (g & 0xFF).toByte
      plte(e * 3 + 2) = (b & 0xFF).toByte
      e += 1
    }
    val raw = new Array[Byte](height * (1 + width))
    var y = 0
    while (y < height) {
      val rs = y * (1 + width) + 1
      val yy = y
      filterRow(raw, rs, filterOf(y) % 5, 1, width,
        x => idx(x, yy) % nPal,
        x => if (yy > 0) idx(x, yy - 1) % nPal else 0)
      y += 1
    }
    wrapPng(width, height, 3, 0, plte, deflateAll(raw))
  }

  /** Encode an ADAM7-INTERLACED grayscale PNG whose reassembled pixels
    * are EXACTLY `pixel(x, y)` — the seven §8.2 sub-images are built,
    * filtered pass-locally (filter of pass p row y = `filterOf(p·31+y)`)
    * and concatenated, so a decoder must run the full deinterlace to
    * agree with the sequential encode of the same formula. */
  def encodeGrayAdam7(width: Int, height: Int, pixel: (Int, Int) => Int,
      filterOf: Int => Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val bos = new java.io.ByteArrayOutputStream()
    var p = 0
    while (p < 7) {
      val x0 = A7X0(p); val y0 = A7Y0(p); val dx = A7DX(p); val dy = A7DY(p)
      val pw = math.max((width - x0 + dx - 1) / dx, 0)
      val ph = math.max((height - y0 + dy - 1) / dy, 0)
      if (pw > 0 && ph > 0) {
        val raw = new Array[Byte](ph * (1 + pw))
        var y = 0
        while (y < ph) {
          val rs = y * (1 + pw) + 1
          val yy = y
          filterRow(raw, rs, filterOf(p * 31 + y) % 5, 1, pw,
            x => pixel(x0 + x * dx, y0 + yy * dy) & 0xFF,
            x => if (yy > 0) pixel(x0 + x * dx, y0 + (yy - 1) * dy) & 0xFF
              else 0)
          y += 1
        }
        bos.write(raw, 0, raw.length)
      }
      p += 1
    }
    wrapPng(width, height, 0, 1, null, deflateAll(bos.toByteArray))
  }
}

/** Content statistics + perceptual hashes from a PNG binary column —
  * ONE decode per row, all signals in one struct: ok flag, dimensions,
  * exact integer pixel sums (mean/variance in milli units via exact
  * BigInt intermediate — n·Σv² − (Σv)² overflows a long at ~10⁸ px),
  * and the aHash/dHash fingerprints split into two nonneg 32-bit-half
  * longs (hi/lo) so a SQL oracle can rebuild and compare them without
  * signed-bit traps. Undecodable content → ok=false, null fields —
  * never a throw. */
case class PngGrayStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("ok", BooleanType, nullable = false),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("n_px", LongType),
    StructField("sum_luma", LongType),
    StructField("mean_milli", LongType),
    StructField("var_milli", LongType),
    StructField("ahash_hi", LongType),
    StructField("ahash_lo", LongType),
    StructField("dhash_hi", LongType),
    StructField("dhash_lo", LongType)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"png_gray_stats requires binary, got $other")
  }

  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val bytes = child.eval(input) match {
      case null => null
      case b => b.asInstanceOf[Array[Byte]]
    }
    val g = PngKernel.decodeGray(bytes)
    if (g == null)
      return InternalRow(false, null, null, null, null, null, null,
        null, null, null, null)
    val n = g.luma.length.toLong
    var sum = 0L; var sumSq = 0L; var i = 0
    while (i < g.luma.length) {
      val v = g.luma(i); sum += v; sumSq += v.toLong * v; i += 1
    }
    val meanMilli = sum * 1000L / n
    val varMilli = ((BigInt(n) * sumSq - BigInt(sum) * sum) * 1000 /
      (BigInt(n) * n)).toLong
    val ah = PngKernel.ahash(g)
    val dh = PngKernel.dhash(g)
    def hi(fp: Long): Any =
      if (fp == Long.MinValue) null else (fp >>> 32) & 0xFFFFFFFFL
    def lo(fp: Long): Any =
      if (fp == Long.MinValue) null else fp & 0xFFFFFFFFL
    InternalRow(true, g.width.toLong, g.height.toLong, n, sum, meanMilli,
      varMilli, hi(ah), lo(ah), hi(dh), lo(dh))
  }

  override protected def withNewChildInternal(newChild: Expression): PngGrayStats =
    copy(child = newChild)

  override def prettyName: String = "png_gray_stats"
}

object PngGrayStats {
  def apply(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      PngGrayStats(org.apache.spark.sql.graftbridge.Bridge.expression(c)))
}

/** PNG decode + exact box-downsample to `outW`×`outH` luma in one pass —
  * the RESIZE verb of the multimodal family, as a native expression
  * (one evaluation per row, zero shuffle). Output: row-major long
  * array, 0..255 floor cell means; null on undecodable bytes or an
  * upsampling target (source smaller than the target in either axis). */
case class PngResizeGray(child: Expression, outW: Int, outH: Int)
    extends UnaryExpression with CodegenFallback {
  require(outW > 0 && outH > 0, s"bad target ${outW}x$outH")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"png_resize_gray requires binary, got $other")
  }

  override def eval(input: InternalRow): Any = {
    val bytes = child.eval(input) match {
      case null => return null
      case b => b.asInstanceOf[Array[Byte]]
    }
    val g = PngKernel.decodeGray(bytes)
    if (g == null) return null
    val px = PngKernel.resizeGray(g, outW, outH)
    if (px == null) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(
      px.map(_.toLong))
  }

  override protected def withNewChildInternal(newChild: Expression): PngResizeGray =
    copy(child = newChild)

  override def prettyName: String = "png_resize_gray"
}

object PngResizeGray {
  def apply(c: Column, outW: Int, outH: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      PngResizeGray(org.apache.spark.sql.graftbridge.Bridge.expression(c),
        outW, outH))
}

/** Deterministic grayscale-PNG fixture generator as an expression, so
  * synthesis runs DISTRIBUTED inside the scan (the testdata ships no
  * binary media). Pixel contract, replayable by any engine:
  * t       = x·colStep + y·rowStep + seed·131
  * pixel   = ((t² mod 251) + t + [ (x·7 + y·11) mod 97 < bump ]) mod 256
  * and row y is written with PNG filter (seed + y) mod 5 — all five
  * filter types appear, so decoding these proves the full unfilter
  * path, not just filter 0. The quadratic-residue term makes the
  * texture NOISE-LIKE and seed-dependent in structure — a pure affine
  * pattern mod 256 differs across seeds only by a constant offset,
  * which mean-thresholded aHash is invariant to (distinct seeds would
  * collide). `bump` plants bounded perturbations: two images sharing
  * (seed, rowStep, colStep) but differing in bump are NEAR-duplicates
  * (few-pixel delta), the fixture near-dup clusters are built from. */
case class GrayPngEncode(seed: Expression, w: Expression, h: Expression,
    rowStep: Expression, colStep: Expression, bump: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] =
    Seq(seed, w, h, rowStep, colStep, bump)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c => c.dataType == LongType || c.dataType == IntegerType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "gray_png_encode requires integer children")

  private def longOf(e: Expression, input: InternalRow): java.lang.Long =
    e.eval(input) match {
      case null => null
      case i: java.lang.Integer => i.longValue()
      case l: java.lang.Long => l
    }

  override def eval(input: InternalRow): Any = {
    val vs = children.map(c => longOf(c, input))
    if (vs.exists(_ == null)) return null
    val Seq(s, ww, hh, rs, cs, b) = vs.map(_.longValue())
    if (ww < 1 || hh < 1 || ww > 4096 || hh > 4096) return null
    PngKernel.encodeGray(ww.toInt, hh.toInt,
      (x, y) => {
        val t = x * cs + y * rs + s * 131
        val tq = ((t % 251) * (t % 251)) % 251 // == t² mod 251, overflow-safe
        val bumped = if ((x * 7 + y * 11) % 97 < b) 1 else 0
        ((((tq + t + bumped) % 256) + 256) % 256).toInt
      },
      y => (((s + y) % 5 + 5) % 5).toInt)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GrayPngEncode =
    GrayPngEncode(newChildren(0), newChildren(1), newChildren(2),
      newChildren(3), newChildren(4), newChildren(5))

  override def prettyName: String = "gray_png_encode"
}

object GrayPngEncode {
  def apply(seed: Column, w: Column, h: Column, rowStep: Column,
      colStep: Column, bump: Column): Column = {
    val b = org.apache.spark.sql.graftbridge.Bridge
    b.column(GrayPngEncode(b.expression(seed), b.expression(w),
      b.expression(h), b.expression(rowStep), b.expression(colStep),
      b.expression(bump)))
  }
}

/** Deterministic PALETTE-PNG fixture (color type 3, 64-entry PLTE,
  * real filters) — replayable contract, all mod-positive arithmetic:
  *   entry e:  tq(e) = ((e·37 + seed·131)² mod 251)
  *             R = (tq + e) mod 256, G = (tq·2 + e·5 + seed) mod 256,
  *             B = (tq·3 + e·11) mod 256
  *   index:    uq = ((x·7 + y·11 + seed·131)² mod 251)
  *             idx(x, y) = (uq + x + y·3 + seed) mod 64
  *   luma(x,y) = (77·R + 150·G + 29·B[idx]) >> 8; filter (seed+y) mod 5.
  * The quadratic-residue mixes keep distinct seeds distinct under the
  * mean-thresholded hashes (affine textures collide — fixture trap log). */
case class PalettePngEncode(seed: Expression, w: Expression, h: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(seed, w, h)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"palette_png_encode requires 3 longs, got ${children.map(_.dataType)}")

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    val Seq(s, ww, hh) = vs.map(_.asInstanceOf[Long])
    if (ww < 1 || hh < 1 || ww > 4096 || hh > 4096) return null
    def pmod(v: Long, m: Long): Long = ((v % m) + m) % m
    PngKernel.encodePalette(ww.toInt, hh.toInt, 64,
      e => {
        val tq = { val t = pmod(e * 37L + s * 131L, 251); (t * t) % 251 }
        (pmod(tq + e, 256).toInt, pmod(tq * 2 + e * 5 + s, 256).toInt,
          pmod(tq * 3 + e * 11, 256).toInt)
      },
      (x, y) => {
        val uq = { val u = pmod(x * 7L + y * 11L + s * 131L, 251); (u * u) % 251 }
        pmod(uq + x + y * 3L + s, 64).toInt
      },
      y => pmod(s + y, 5).toInt)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PalettePngEncode =
    PalettePngEncode(newChildren(0), newChildren(1), newChildren(2))

  override def prettyName: String = "palette_png_encode"
}

object PalettePngEncode {
  def apply(seed: Column, w: Column, h: Column): Column = {
    val b = org.apache.spark.sql.graftbridge.Bridge
    b.column(PalettePngEncode(b.expression(seed), b.expression(w),
      b.expression(h)))
  }
}

/** SUB-BYTE grayscale PNG fixture (bit depth 1, 2 or 4, real filters):
  *   t        = x·5 + y·11 + seed·131
  *   level    = ((t² mod 251) + t) mod 2^depth        (mod-positive)
  *   luma     = level · 255 / (2^depth − 1)           (exact integer)
  * with row filter (seed + y) mod 5 — the packed-byte unfilter and the
  * bit unpacking both load-bearing. */
case class GraySubPngEncode(seed: Expression, w: Expression,
    h: Expression, depth: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(seed, w, h, depth)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gray_sub_png_encode requires 4 longs, got ${children.map(_.dataType)}")

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    val Seq(s, ww, hh, d) = vs.map(_.asInstanceOf[Long])
    if (ww < 1 || hh < 1 || ww > 4096 || hh > 4096 ||
      !(d == 1L || d == 2L || d == 4L)) return null
    val levels = 1 << d.toInt
    PngKernel.encodeGraySub(ww.toInt, hh.toInt, d.toInt,
      (x, y) => {
        val t = x * 5L + y * 11L + s * 131L
        val tq = ((t % 251) * (t % 251)) % 251
        ((((tq + t) % levels) + levels) % levels).toInt
      },
      y => (((s + y) % 5 + 5) % 5).toInt)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GraySubPngEncode =
    GraySubPngEncode(newChildren(0), newChildren(1), newChildren(2),
      newChildren(3))

  override def prettyName: String = "gray_sub_png_encode"
}

object GraySubPngEncode {
  def apply(seed: Column, w: Column, h: Column, depth: Column): Column = {
    val b = org.apache.spark.sql.graftbridge.Bridge
    b.column(GraySubPngEncode(b.expression(seed), b.expression(w),
      b.expression(h), b.expression(depth)))
  }
}

/** ADAM7-INTERLACED twin of [[GrayPngEncode]]: the SAME pixel contract
  * (t² mod 251 texture, bump perturbations), written as the seven
  * interlaced sub-images — so its oracle replays the identical formula
  * while the engine must run the full deinterlace to agree, and a
  * sequential/interlaced pair of the same parameters decodes
  * bit-identically (pinned in spec). Pass p row y carries filter
  * (seed + p·31 + y) mod 5 — all five unfilters appear pass-locally. */
case class Adam7PngEncode(seed: Expression, w: Expression, h: Expression,
    rowStep: Expression, colStep: Expression, bump: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] =
    Seq(seed, w, h, rowStep, colStep, bump)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c => c.dataType == LongType || c.dataType == IntegerType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "adam7_png_encode requires integer children")

  private def longOf(e: Expression, input: InternalRow): java.lang.Long =
    e.eval(input) match {
      case null => null
      case i: java.lang.Integer => i.longValue()
      case l: java.lang.Long => l
    }

  override def eval(input: InternalRow): Any = {
    val vs = children.map(c => longOf(c, input))
    if (vs.exists(_ == null)) return null
    val Seq(s, ww, hh, rs, cs, b) = vs.map(_.longValue())
    if (ww < 1 || hh < 1 || ww > 4096 || hh > 4096) return null
    PngKernel.encodeGrayAdam7(ww.toInt, hh.toInt,
      (x, y) => {
        val t = x * cs + y * rs + s * 131
        val tq = ((t % 251) * (t % 251)) % 251 // == t² mod 251, overflow-safe
        val bumped = if ((x * 7 + y * 11) % 97 < b) 1 else 0
        ((((tq + t + bumped) % 256) + 256) % 256).toInt
      },
      k => (((s + k) % 5 + 5) % 5).toInt)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Adam7PngEncode =
    Adam7PngEncode(newChildren(0), newChildren(1), newChildren(2),
      newChildren(3), newChildren(4), newChildren(5))

  override def prettyName: String = "adam7_png_encode"
}

object Adam7PngEncode {
  def apply(seed: Column, w: Column, h: Column, rowStep: Column,
      colStep: Column, bump: Column): Column = {
    val b = org.apache.spark.sql.graftbridge.Bridge
    b.column(Adam7PngEncode(b.expression(seed), b.expression(w),
      b.expression(h), b.expression(rowStep), b.expression(colStep),
      b.expression(bump)))
  }
}

/** Hamming-ball self-join over ANY 64-bit fingerprint column — the
  * generic form of the SimHash candidate machinery in [[Dedup]], reused
  * here for perceptual-hash image near-dup. Guarantee (Manku et al.,
  * WWW'07 block-permuted tables): with 2 chunkings × C(8,2) = 56 tables
  * of 16-bit block-pair keys, every pair at Hamming ≤ 6 shares at least
  * one fully-clean table key — exact recall for maxHamming ≤ 6, then an
  * exact `bit_count(a xor b)` filter. One equi-join shuffle on (table,
  * key); candidate volume scales with genuinely-similar content, never
  * all pairs. */
object Hamming64 {

  /** Append the 56 block-pair band keys of `fpCol` as exploded (t, v)
    * columns — 56 rows out per row in, all other columns carried. The
    * SHARED key derivation: [[pairs]] builds its self-join sides with
    * it, and [[graft.streaming.ImageIngest]] persists these keys as
    * index columns at write time so the streaming probe equi-joins
    * batch keys against STORED keys instead of re-deriving the keys of
    * the whole index every micro-batch (O(batch·56) per-trigger work,
    * never O(corpus)). */
  def withBandKeys(df: DataFrame, fpCol: String): DataFrame = {
    val fp = col(fpCol)
    val rot = shiftrightunsigned(fp, 4).bitwiseOR(shiftleft(fp, 60))
    def byteOf(src: Column, k: Int): Column =
      shiftright(src, k * 8).bitwiseAND(lit(255L))
    val tables = for {
      (src, c) <- Seq((fp, 0), (rot, 1))
      i <- 0 until 8; j <- (i + 1) until 8
    } yield struct(
      lit(c * 28 + (i * (15 - i)) / 2 + (j - i - 1)).as("t"),
      shiftleft(byteOf(src, i), 8).bitwiseOR(byteOf(src, j)).as("v"))
    df.select(col("*"), explode(array(tables: _*)).as("__k"))
      .withColumn("t", col("__k.t")).withColumn("v", col("__k.v"))
      .drop("__k")
  }

  /** (i, j, hamming) pairs with i < j and hamming ≤ maxHamming, from a
    * (idCol, fpCol) frame. fpCol must be LongType (full 64-bit
    * fingerprint, sign bit allowed).
    *
    * Exact-dup collapse (the r15 optimization pass): the band self-join
    * runs over DISTINCT fingerprints, not rows. Identical fingerprints
    * — the dominant case in re-upload/re-encode corpora — collide on
    * ALL 56 tables, so the naive row-level join manufactures 56 copies
    * of every within-group pair and feeds them to `distinct()`
    * (measured at sf0.1's 20k-image gates: tens of millions of
    * pre-distinct rows for thousands of output pairs). Here the join
    * shuffles one banded row-set per distinct fp, the Hamming filter
    * prunes CANDIDATE FP PAIRS before any id expansion, and id pairs
    * materialize exactly once: within-group pairs from a plain fp
    * equi-join (Hamming 0 by construction), cross-group pairs from the
    * surviving fp pairs joined back to ids. The result SET is
    * unchanged — bands are functions of the fingerprint alone, so fp-
    * level collisions are row-level collisions, and the Manku recall
    * guarantee (every pair at Hamming ≤ 6 shares a clean table) is the
    * same statement at either granularity. Null fingerprints pair with
    * nothing (as before: a NULL band key never equi-joins). */
  def pairs(df: DataFrame, idCol: String, fpCol: String,
      maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 6,
      s"recall guaranteed only to Hamming 6, got $maxHamming")
    // (id, fp) is 16 bytes/row — materialized so the fingerprint
    // pipeline (decode + hash, the expensive part) runs ONCE: the frame
    // feeds the distinct-fp banding, both sides of the within-group
    // join, and both id-expansion joins. localCheckpoint rather than
    // persist: [[graft.streaming.FpIngest]] calls this per streaming
    // trigger, and CacheManager entries would accumulate per trigger —
    // checkpoint blocks are freed by ContextCleaner when the trigger's
    // references drop.
    val base = df.select(col(idCol).as("id"), col(fpCol).as("fp"))
      .filter(col("fp").isNotNull)
      .localCheckpoint(true)
    val keyed = withBandKeys(base.select(col("fp")).distinct(), "fp")
    val fpPairs = keyed.as("a").join(keyed.as("b"),
        col("a.t") === col("b.t") && col("a.v") === col("b.v") &&
          col("a.fp") < col("b.fp"))
      .select(col("a.fp").as("fa"), col("b.fp").as("fb"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("fa").bitwiseXOR(col("fb"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
    val cross = fpPairs
      .join(base.select(col("fp").as("fa"), col("id").as("ia")), "fa")
      .join(base.select(col("fp").as("fb"), col("id").as("ib")), "fb")
      .filter(col("ia") =!= col("ib"))
      .select(least(col("ia"), col("ib")).as("i"),
        greatest(col("ia"), col("ib")).as("j"), col("hamming"))
    val within = base.as("x").join(base.as("y"),
        col("x.fp") === col("y.fp") && col("x.id") < col("y.id"))
      .select(col("x.id").as("i"), col("y.id").as("j"), lit(0L).as("hamming"))
    within.unionAll(cross)
  }
}
