package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Pure-JVM GIF raster decoder — the third image CONTENT leg. GIF's
  * raster is LZW (GIF87a/89a Appendix F): variable-width codes
  * (LSB-first), a 4096-entry rebuildable dictionary, clear/end codes —
  * like PNG's zlib and JPEG's Huffman+IDCT, exactly-specified integer
  * plumbing with no codec library needed. Decodes the FIRST image
  * descriptor (for animated GIFs that is the cover frame — the curation
  * signal) through global or local palettes, interlaced or not, to 8-bit
  * luma via the same integer BT.601 weights PNG uses
  * ((77·R + 150·G + 29·B) >> 8). GCE transparency is ignored: the
  * transparent index contributes its palette color to luma (documented
  * stance — luma screens content, not compositing). Malformed or
  * truncated bytes → null, never a throw.
  *
  * [[encodeGrayLiteral]] writes REAL standards-valid GIFs with a
  * 256-gray ramp palette and literal 9-bit LZW codes (a clear code
  * every 250 pixels keeps the decoder's dictionary below the width
  * step — the classic "uncompressed GIF" technique), so planted pixels
  * round-trip exactly and a SQL oracle replays them; javax.imageio
  * cross-checks both directions in MediaContentSpec (its writer
  * emits genuinely compressed LZW streams our decoder must replay). */
private[ext] object GifKernel {

  import PngKernel.Gray

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def le2(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)

  /** Decode the first frame to luma; null on anything malformed. */
  def decodeGrayFirstFrame(gif: Array[Byte]): Gray = {
    try decode0(gif)
    catch { case _: RuntimeException | _: ArrayIndexOutOfBoundsException |
      _: NegativeArraySizeException => null }
  }

  private def decode0(b: Array[Byte]): Gray = {
    if (b == null || b.length < 13) return null
    val hdr = new String(b, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
    if (hdr != "GIF87a" && hdr != "GIF89a") return null
    val sw = le2(b, 6); val sh = le2(b, 8)
    if (sw < 1 || sh < 1) return null
    val packed = u8(b, 10)
    var pos = 13
    var gct: Array[Int] = null // luma per palette index
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      if (pos + 3 * n > b.length) return null
      gct = readPaletteLuma(b, pos, n)
      pos += 3 * n
    }
    while (pos < b.length) {
      u8(b, pos) match {
        case 0x3B => return null // trailer before any image
        case 0x21 => // extension: label + sub-blocks
          pos += 2
          var sz = if (pos < b.length) u8(b, pos) else return null
          while (sz != 0) {
            pos += 1 + sz
            if (pos >= b.length) return null
            sz = u8(b, pos)
          }
          pos += 1
        case 0x2C => // image descriptor: the frame we decode
          if (pos + 10 > b.length) return null
          val left = le2(b, pos + 1); val top = le2(b, pos + 3)
          val w = le2(b, pos + 5); val h = le2(b, pos + 7)
          val ip = u8(b, pos + 9)
          pos += 10
          if (w < 1 || h < 1 || w > (1 << 16) || h > (1 << 16) ||
            w.toLong * h > (1L << 28)) return null
          var pal = gct
          if ((ip & 0x80) != 0) {
            val n = 2 << (ip & 7)
            if (pos + 3 * n > b.length) return null
            pal = readPaletteLuma(b, pos, n)
            pos += 3 * n
          }
          if (pal == null) return null
          val interlaced = (ip & 0x40) != 0
          if (pos >= b.length) return null
          val minCode = u8(b, pos); pos += 1
          if (minCode < 2 || minCode > 11) return null
          // concatenate the data sub-blocks
          val data = new java.io.ByteArrayOutputStream()
          var sz = if (pos < b.length) u8(b, pos) else return null
          while (sz != 0) {
            if (pos + 1 + sz > b.length) return null
            data.write(b, pos + 1, sz)
            pos += 1 + sz
            if (pos >= b.length) return null
            sz = u8(b, pos)
          }
          val idx = lzwDecode(data.toByteArray, minCode, w * h)
          if (idx == null) return null
          val luma = new Array[Int](w * h)
          // interlace pass row order (GIF spec Appendix E)
          val rowOf: Int => Int =
            if (!interlaced) identity
            else {
              val rows = new Array[Int](h)
              var r = 0
              for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2));
                   y <- start until h by step) { rows(r) = y; r += 1 }
              rows(_)
            }
          var y = 0
          while (y < h) {
            val dy = rowOf(y)
            var x = 0
            while (x < w) {
              val pi = idx(y * w + x)
              luma(dy * w + x) = if (pi < pal.length) pal(pi) else 0
              x += 1
            }
            y += 1
          }
          // left/top offsets beyond the screen are crawl dirt; the frame
          // itself is the content — return it at its own dims
          val _ = (left, top, sw, sh)
          return Gray(w, h, luma)
        case _ => return null
      }
    }
    null
  }

  private def readPaletteLuma(b: Array[Byte], pos: Int, n: Int): Array[Int] = {
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      out(i) = (77 * u8(b, pos + 3 * i) + 150 * u8(b, pos + 3 * i + 1) +
        29 * u8(b, pos + 3 * i + 2)) >> 8
      i += 1
    }
    out
  }

  /** GIF-flavor LZW decode (LSB-first codes, 4096-entry dict, deferred
    * clear allowed) of exactly `nPx` indices; null on corruption. */
  private def lzwDecode(d: Array[Byte], minCode: Int, nPx: Int): Array[Int] = {
    val clear = 1 << minCode
    val end = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    val out = new Array[Int](nPx)
    var outN = 0
    var codeSize = minCode + 1
    var next = end + 1
    var prev = -1
    var acc = 0; var nb = 0; var p = 0
    val stack = new Array[Int](4096)
    while (outN < nPx) {
      while (nb < codeSize) {
        if (p >= d.length) return null // truncated stream
        acc |= u8(d, p) << nb; nb += 8; p += 1
      }
      val code = acc & ((1 << codeSize) - 1)
      acc >>>= codeSize; nb -= codeSize
      if (code == clear) {
        codeSize = minCode + 1; next = end + 1; prev = -1
      } else if (code == end) {
        return if (outN == nPx) out else null
      } else {
        var sp = 0
        var cur = code
        if (code >= next) {
          // KwKwK: only valid as exactly `next` with a previous string
          if (code != next || prev < 0) return null
          stack(sp) = firstOf(prefix, suffix, prev, clear); sp += 1
          cur = prev
        }
        while (cur >= clear + 2) { // composite entry
          stack(sp) = suffix(cur); sp += 1
          cur = prefix(cur)
          if (sp >= 4096) return null
        }
        if (cur >= clear) return null // dangling reference
        stack(sp) = cur; sp += 1
        // pop the stack into the output
        while (sp > 0 && outN < nPx) { sp -= 1; out(outN) = stack(sp); outN += 1 }
        if (sp > 0) return null // frame overflow: more pixels than w*h
        if (prev >= 0 && next < 4096) {
          prefix(next) = prev
          suffix(next) = firstOf(prefix, suffix, code, clear)
          next += 1
          if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
      }
    }
    out
  }

  private def firstOf(prefix: Array[Int], suffix: Array[Int], code: Int,
      clear: Int): Int = {
    var c = code
    while (c >= clear + 2) c = prefix(c)
    c
  }

  /** Encode a REAL grayscale GIF89a with a 256-gray ramp palette and
    * literal LZW codes: every pixel index is emitted as its own 9-bit
    * code, with a clear code every 250 pixels so the dictionary never
    * reaches the next width step — valid LZW any decoder replays, and
    * pixel-exact by construction (index i maps to palette (i,i,i),
    * whose BT.601 luma is exactly i). */
  def encodeGrayLiteral(w: Int, h: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 4096 && h <= 4096, s"bad dims ${w}x$h")
    val out = new java.io.ByteArrayOutputStream()
    def wr(vs: Int*): Unit = vs.foreach(v => out.write(v & 0xFF))
    wr('G', 'I', 'F', '8', '9', 'a')
    wr(w & 0xFF, w >> 8, h & 0xFF, h >> 8)
    wr(0xF7, 0, 0) // GCT present, 256 entries; bg 0; aspect 0
    var i = 0
    while (i < 256) { wr(i, i, i); i += 1 }
    wr(0x2C, 0, 0, 0, 0, w & 0xFF, w >> 8, h & 0xFF, h >> 8, 0)
    wr(8) // LZW minimum code size
    // literal 9-bit codes, clear every 250 pixels, LSB-first packing
    val body = new java.io.ByteArrayOutputStream()
    var acc = 0; var nb = 0
    def put(code: Int): Unit = {
      acc |= code << nb; nb += 9
      while (nb >= 8) { body.write(acc & 0xFF); acc >>>= 8; nb -= 8 }
    }
    put(256) // initial clear
    var n = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = pixel(x, y)
        require(v >= 0 && v <= 255, s"pixel $v out of range")
        put(v)
        n += 1
        if (n % 250 == 0) put(256)
        x += 1
      }
      y += 1
    }
    put(257) // end of information
    if (nb > 0) body.write(acc & 0xFF)
    val data = body.toByteArray
    var o = 0
    while (o < data.length) { // 255-byte sub-blocks
      val len = math.min(255, data.length - o)
      out.write(len)
      out.write(data, o, len)
      o += len
    }
    wr(0) // block terminator
    wr(0x3B) // trailer
    out.toByteArray
  }
}

/** GIF decode + the shared gray-content stat struct (the
  * [[PngGrayStats]] shape) — LZW raster to luma, same hashes, same
  * downstream verbs. Undecodable bytes → ok=false, null fields. */
case class GifGrayStats(child: Expression)
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
      s"gif_gray_stats requires binary, got $other")
  }

  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val bytes = child.eval(input) match {
      case null => null
      case b => b.asInstanceOf[Array[Byte]]
    }
    GifGrayStats.statsRow(GifKernel.decodeGrayFirstFrame(bytes))
  }

  override protected def withNewChildInternal(newChild: Expression): GifGrayStats =
    copy(child = newChild)

  override def prettyName: String = "gif_gray_stats"
}

object GifGrayStats {
  def apply(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      GifGrayStats(org.apache.spark.sql.graftbridge.Bridge.expression(c)))

  /** The shared (ok, dims, stats, hash halves) row from a decoded gray
    * frame — one implementation for every gray-stats expression. */
  private[ext] def statsRow(g: PngKernel.Gray): InternalRow = {
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
}

/** Deterministic literal-LZW GIF corpus builder — the GIF twin of
  * [[GrayPngEncode]], SAME pixel contract (t = x·cs + y·rs + seed·131;
  * (t² mod 251 + t + bump?) mod 256), so the PNG oracle pixel chain
  * replays GIF gates verbatim. */
case class GrayGifEncode(seed: Expression, w: Expression, h: Expression,
    rowStep: Expression, colStep: Expression, bump: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] =
    Seq(seed, w, h, rowStep, colStep, bump)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gray_gif_encode requires 6 longs, got ${children.map(_.dataType)}")

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    val Seq(s, ww, hh, rs, cs, b) = vs.map(_.asInstanceOf[Long])
    if (ww < 1 || hh < 1 || ww > 4096 || hh > 4096) return null
    GifKernel.encodeGrayLiteral(ww.toInt, hh.toInt,
      (x, y) => {
        val t = x * cs + y * rs + s * 131
        val tq = ((t % 251) * (t % 251)) % 251
        val bumped = if ((x * 7 + y * 11) % 97 < b) 1 else 0
        ((((tq + t + bumped) % 256) + 256) % 256).toInt
      })
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GrayGifEncode =
    GrayGifEncode(newChildren(0), newChildren(1), newChildren(2),
      newChildren(3), newChildren(4), newChildren(5))

  override def prettyName: String = "gray_gif_encode"
}

object GrayGifEncode {
  def apply(seed: Column, w: Column, h: Column, rowStep: Column,
      colStep: Column, bump: Column): Column = {
    val b = org.apache.spark.sql.graftbridge.Bridge
    b.column(GrayGifEncode(b.expression(seed), b.expression(w),
      b.expression(h), b.expression(rowStep), b.expression(colStep),
      b.expression(bump)))
  }
}
