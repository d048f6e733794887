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

  /** Decode a PNG to 8-bit luma. Returns null on ANYTHING unsupported or
    * malformed — truncated chunks, non-zlib IDAT, interlacing, palette
    * color, bit depths other than 8 — never throws (crawl-dirty bytes are
    * the expected input). Supported layouts: bit depth 8, color types
    * 0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA), interlace 0. Color is
    * reduced to luma with the integer BT.601 weights (77·R + 150·G +
    * 29·B) >> 8 (weights sum to 256 — exact, replayable arithmetic). */
  def decodeGray(png: Array[Byte]): Gray = {
    if (png == null || png.length < 8) return null
    var i = 0
    while (i < 8) { if (u8(png, i) != SIG(i)) return null; i += 1 }
    var pos = 8
    var width = 0; var height = 0; var colorType = -1
    var seenIhdr = false; var done = false
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
          val bitDepth = u8(png, d + 8); colorType = u8(png, d + 9)
          val interlace = u8(png, d + 12)
          if (bitDepth != 8 || interlace != 0 ||
            !Set(0, 2, 4, 6).contains(colorType)) return null
        case "IDAT" =>
          if (!seenIhdr) return null
          idat.write(png, pos + 8, len.toInt)
        case "IEND" => done = true
        case _ => () // ancillary chunks: skip
      }
      pos += 12 + len.toInt
    }
    if (!seenIhdr) return null
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4
    }
    val rowBytes = width * channels
    val expected = height.toLong * (1L + rowBytes)
    if (expected > Int.MaxValue) return null
    val raw = new Array[Byte](expected.toInt)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var off = 0
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && inf.needsInput()) return null // truncated stream
        off += n
      }
      if (off != raw.length) return null
    } catch {
      case _: java.util.zip.DataFormatException => return null
    } finally inf.end()

    // unfilter in place (spec §6: recon = filt + predictor, mod 256)
    val bpp = channels
    var y = 0
    while (y < height) {
      val rs = y * (1 + rowBytes) + 1
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
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
        }
        raw(rs + x) = ((u8(raw, rs + x) + pred) & 0xFF).toByte
        x += 1
      }
      y += 1
    }

    val luma = new Array[Int](width * height)
    y = 0
    while (y < height) {
      val rs = y * (1 + rowBytes) + 1
      var px = 0
      while (px < width) {
        val o = rs + px * channels
        val v = channels match {
          case 1 | 2 => u8(raw, o)
          case _ => (77 * u8(raw, o) + 150 * u8(raw, o + 1) +
            29 * u8(raw, o + 2)) >> 8
        }
        luma(y * width + px) = v
        px += 1
      }
      y += 1
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
    * fingerprint, sign bit allowed). */
  def pairs(df: DataFrame, idCol: String, fpCol: String,
      maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 6,
      s"recall guaranteed only to Hamming 6, got $maxHamming")
    val base = df.select(col(idCol).as("id"), col(fpCol).as("fp"))
    val keyed = withBandKeys(base, "fp")
    keyed.as("a").join(keyed.as("b"),
        col("a.t") === col("b.t") && col("a.v") === col("b.v") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("i"), col("b.id").as("j"),
        bit_count(col("a.fp").bitwiseXOR(col("b.fp"))).cast("long")
          .as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
