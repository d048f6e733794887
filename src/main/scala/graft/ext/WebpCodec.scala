package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Pure-JVM WebP LOSSLESS (VP8L) pixel codec — the most common modern
  * web image format after JPEG/PNG, previously triage-counted but
  * never decoded. VP8L is "exactly-specified integer plumbing" (the
  * GIF-LZW class, not the codec class): an LSB-first bit stream of
  * canonical DEFLATE-style prefix codes carrying ARGB literals, LZ77
  * backward references (with a 120-entry 2-D neighbor distance map),
  * an optional color cache, and four reversible transforms
  * (predictor / color / subtract-green / color-indexing). All are
  * implemented here from the public bitstream specification; decoded
  * luma joins the SAME GraySniff stat/hash space as PNG/JPEG/GIF/BMP/
  * TIFF, so webp near-dups land in the shared fingerprint space.
  *
  * SCOPE NOTE — lossy VP8 (the `VP8 ` chunk) is deliberately out (the
  * MP3-PCM / H.264 stance, decided rather than deferred): it needs the
  * boolean arithmetic entropy coder, 4x4/16x16 intra prediction, DCT/
  * WHT reconstruction and the in-loop deblocking filter end to end — a
  * video-codec-scale project whose output is not exact integer
  * replay. Lossy rows keep ok=false (hash-less, corpus-bias-safe),
  * exactly the posture progressive JPEG had before round 13.
  *
  * Second-implementation bar, stated honestly (the Mp3Codec stance):
  * the JDK has no WebP reader, so conformance is fixture-contract +
  * our own encoder round-trip, PLUS hand-assembled bitstreams in
  * WebpSpec pinning the absolute decode of each feature (simple and
  * normal codes, LZ77 copies, color cache, every transform) so an
  * encoder/decoder error cannot cancel. The distance map is GENERATED
  * by the spec's ordering rule (all 120 (dx∈[-7,8], dy∈[0,7]) neighbor
  * offsets sorted by dx²+dy², larger dy first, positive dx before
  * negative); WebpSpec pins ALL 120 entries against the inversion of
  * the published encoder-side plane_to_code_lut — two independent
  * derivations of the same mapping agreeing entry for entry.
  *
  * Decode contract: null on ANYTHING malformed, truncated, oversized
  * or out of the supported slice — never a throw. Unsupported-but-
  * valid combinations (color-indexing mixed with predictor/color
  * transforms — emitted by no known encoder) also null, honestly. */
private[ext] object WebpKernel {

  private val MaxPixels = 1L << 26 // 4-byte ARGB ×2 canvases bound

  // ----------------------------------------------------------------
  // bit reader: LSB-first within bytes (the VP8L convention)
  // ----------------------------------------------------------------
  private final class BitReader(b: Array[Byte], from: Int, until: Int) {
    private var pos = from.toLong * 8
    private val end = until.toLong * 8
    var bad = false
    def readBits(n: Int): Int = {
      if (n == 0) return 0
      if (pos + n > end) { bad = true; return 0 }
      var v = 0
      var i = 0
      while (i < n) {
        val p = pos + i
        val bit = (b((p >> 3).toInt) >> (p & 7).toInt) & 1
        v |= bit << i
        i += 1
      }
      pos += n
      v
    }
    def readBit(): Int = readBits(1)
  }

  // ----------------------------------------------------------------
  // canonical prefix code (DEFLATE-style: codes assigned by increasing
  // length, then symbol order; first bit read = MSB of the code)
  // ----------------------------------------------------------------
  private final class Code(val single: Int, val counts: Array[Int],
      val firstCode: Array[Int], val firstIdx: Array[Int],
      val symbols: Array[Int], val maxLen: Int) {
    def decode(br: BitReader): Int = {
      if (single >= 0) return single
      var code = 0
      var len = 0
      while (len < maxLen) {
        code = (code << 1) | br.readBit()
        len += 1
        if (br.bad) return -1
        val d = code - firstCode(len)
        if (d >= 0 && d < counts(len)) return symbols(firstIdx(len) + d)
      }
      -1
    }
  }

  /** Build the canonical code from per-symbol lengths; null when the
    * lengths do not form exactly one complete code (Kraft sum != 1),
    * except the legal single-symbol degenerate (0 bits per symbol). */
  private def buildCode(lengths: Array[Int]): Code = {
    var maxLen = 0
    var nUsed = 0
    var lastSym = -1
    var i = 0
    while (i < lengths.length) {
      if (lengths(i) > 0) {
        nUsed += 1; lastSym = i
        if (lengths(i) > maxLen) maxLen = lengths(i)
      }
      i += 1
    }
    if (nUsed == 0) return null
    if (nUsed == 1) return new Code(lastSym, null, null, null, null, 0)
    if (maxLen > 15) return null
    val counts = new Array[Int](maxLen + 1)
    i = 0
    while (i < lengths.length) {
      if (lengths(i) > 0) counts(lengths(i)) += 1
      i += 1
    }
    // Kraft: must be exactly complete
    var kraft = 0L
    var l = 1
    while (l <= maxLen) { kraft += counts(l).toLong << (maxLen - l); l += 1 }
    if (kraft != (1L << maxLen)) return null
    val firstCode = new Array[Int](maxLen + 1)
    val firstIdx = new Array[Int](maxLen + 1)
    var code = 0
    var idx = 0
    l = 1
    while (l <= maxLen) {
      firstCode(l) = code
      firstIdx(l) = idx
      code = (code + counts(l)) << 1
      idx += counts(l)
      l += 1
    }
    val symbols = new Array[Int](idx)
    val fill = firstIdx.clone()
    i = 0
    while (i < lengths.length) {
      val ln = lengths(i)
      if (ln > 0) { symbols(fill(ln)) = i; fill(ln) += 1 }
      i += 1
    }
    new Code(-1, counts, firstCode, firstIdx, symbols, maxLen)
  }

  /** The canonical CODES (per-symbol bit patterns) for an encoder —
    * shared with the decoder's assignment so both sides agree by
    * construction. codes(sym) = (code, len); len 0 = absent. */
  private[ext] def canonicalCodes(lengths: Array[Int]): Array[(Int, Int)] = {
    val out = new Array[(Int, Int)](lengths.length)
    var maxLen = 0
    for (l <- lengths) if (l > maxLen) maxLen = l
    val counts = new Array[Int](maxLen + 1)
    for (l <- lengths if l > 0) counts(l) += 1
    val next = new Array[Int](maxLen + 2)
    var code = 0
    var l = 1
    while (l <= maxLen) { next(l) = code; code = (code + counts(l)) << 1; l += 1 }
    var i = 0
    while (i < lengths.length) {
      val ln = lengths(i)
      out(i) = if (ln == 0) (0, 0) else { val c = next(ln); next(ln) += 1; (c, ln) }
      i += 1
    }
    out
  }

  // code-length-code symbol order (the spec's kCodeLengthCodeOrder)
  private val ClOrder = Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9,
    10, 11, 12, 13, 14, 15)

  /** Read one prefix code (simple or normal form) for `alphabetSize`
    * symbols; null on malformed. */
  private def readPrefixCode(br: BitReader, alphabetSize: Int): Code = {
    if (br.readBit() == 1) { // simple
      val numSymbols = br.readBits(1) + 1
      val first8 = br.readBit() == 1
      val s0 = if (first8) br.readBits(8) else br.readBits(1)
      if (br.bad || s0 >= alphabetSize) return null
      if (numSymbols == 1) {
        val lens = new Array[Int](alphabetSize)
        lens(s0) = 1 // degenerate: buildCode returns the 0-bit single
        return buildCode(lens)
      }
      val s1 = br.readBits(8)
      if (br.bad || s1 >= alphabetSize || s1 == s0) return null
      val lens = new Array[Int](alphabetSize)
      lens(s0) = 1; lens(s1) = 1
      buildCode(lens)
    } else { // normal: code-length code, then run-length-coded lengths
      val numCl = 4 + br.readBits(4)
      if (br.bad || numCl > ClOrder.length) return null
      val clLens = new Array[Int](19)
      var i = 0
      while (i < numCl) { clLens(ClOrder(i)) = br.readBits(3); i += 1 }
      if (br.bad) return null
      val clCode = buildCode(clLens)
      if (clCode == null) return null
      var maxSymbol =
        if (br.readBit() == 1) {
          val nbits = 2 + 2 * br.readBits(3)
          2 + br.readBits(nbits)
        } else alphabetSize
      if (br.bad) return null
      val lens = new Array[Int](alphabetSize)
      var symbol = 0
      var prevLen = 8
      while (symbol < alphabetSize) {
        if (maxSymbol == 0) symbol = alphabetSize // implicit zeros
        else {
          maxSymbol -= 1
          val cl = clCode.decode(br)
          if (cl < 0 || cl > 18 || br.bad) return null
          if (cl < 16) {
            lens(symbol) = cl; symbol += 1
            if (cl != 0) prevLen = cl
          } else {
            var repeat = 0
            var value = 0
            cl match {
              case 16 => repeat = 3 + br.readBits(2); value = prevLen
              case 17 => repeat = 3 + br.readBits(3)
              case _ => repeat = 11 + br.readBits(7)
            }
            if (br.bad || symbol + repeat > alphabetSize) return null
            var k = 0
            while (k < repeat) { lens(symbol) = value; symbol += 1; k += 1 }
          }
        }
      }
      buildCode(lens)
    }
  }

  // ----------------------------------------------------------------
  // LZ77 distance map: the 120 2-D neighbor codes. Generated by the
  // spec's ordering (dx ∈ [-7, 8], dy ∈ [0, 7], (dx,dy) ≠ (0,0), dy=0
  // only with dx ≥ 1; sorted by dx²+dy² ascending, then dy DESCENDING,
  // then dx ≥ 0 before dx < 0, then |dx| ascending). WebpSpec pins the
  // generated head against the published kCodeToPlane constants.
  // ----------------------------------------------------------------
  private[ext] val DistMap: Array[(Int, Int)] = {
    val all = for {
      dy <- 0 to 7
      dx <- -7 to 8
      if !(dy == 0 && dx < 1)
    } yield (dx, dy)
    all.sortBy { case (dx, dy) =>
      (dx * dx + dy * dy, -dy, if (dx >= 0) 0 else 1, math.abs(dx))
    }.toArray
  }

  /** Length/distance prefix value decode (shared formula): symbol s →
    * base value, consuming extra bits. */
  private def lz77Value(s: Int, br: BitReader): Int = {
    if (s < 4) return s + 1
    val extra = (s - 2) >> 1
    val offset = (2 + (s & 1)) << extra
    offset + br.readBits(extra) + 1
  }

  // ----------------------------------------------------------------
  // entropy-coded ARGB image (the shared machinery: main image,
  // entropy image, transform sub-images, palette)
  // ----------------------------------------------------------------
  private final case class Groups(codes: Array[Array[Code]],
      metaBits: Int, meta: Array[Int], metaW: Int)

  /** Decode an entropy-coded image of w×h ARGB pixels. `level0` turns
    * on the meta-prefix layer (main image only). Null on malformed. */
  private def decodeEntropyImage(br: BitReader, w: Int, h: Int,
      level0: Boolean): Array[Int] = {
    if (w < 1 || h < 1 || w.toLong * h > MaxPixels) return null
    // color cache
    var cacheBits = 0
    if (br.readBit() == 1) {
      cacheBits = br.readBits(4)
      if (cacheBits < 1 || cacheBits > 11) return null
    }
    if (br.bad) return null
    // meta prefix (level 0 only)
    var metaBits = 0
    var meta: Array[Int] = null
    var metaW = 0
    var nGroups = 1
    if (level0 && br.readBit() == 1) {
      metaBits = br.readBits(3) + 2
      if (br.bad) return null
      metaW = (w + (1 << metaBits) - 1) >> metaBits
      val metaH = (h + (1 << metaBits) - 1) >> metaBits
      val img = decodeEntropyImage(br, metaW, metaH, level0 = false)
      if (img == null) return null
      meta = new Array[Int](img.length)
      var i = 0
      var mx = 0
      while (i < img.length) {
        val id = ((img(i) >> 8) & 0xFFFF) // (red << 8) | green
        meta(i) = id
        if (id > mx) mx = id
        i += 1
      }
      nGroups = mx + 1
      if (nGroups > 1024) return null
    }
    if (br.bad) return null
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val greenAlpha = 256 + 24 + cacheSize
    val codes = new Array[Array[Code]](nGroups)
    var g = 0
    while (g < nGroups) {
      val cs = new Array[Code](5)
      cs(0) = readPrefixCode(br, greenAlpha)
      cs(1) = readPrefixCode(br, 256)
      cs(2) = readPrefixCode(br, 256)
      cs(3) = readPrefixCode(br, 256)
      cs(4) = readPrefixCode(br, 40)
      if (cs.exists(_ == null)) return null
      codes(g) = cs
      g += 1
    }
    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null
    def cacheInsert(argb: Int): Unit =
      if (cache != null)
        cache((0x1e35a7bd * argb) >>> (32 - cacheBits)) = argb
    val px = new Array[Int](w * h)
    var pos = 0
    val n = px.length
    while (pos < n) {
      val x = pos % w
      val y = pos / w
      val grp =
        if (meta == null) codes(0)
        else {
          val id = meta((y >> metaBits) * metaW + (x >> metaBits))
          if (id >= codes.length) return null
          codes(id)
        }
      val s = grp(0).decode(br)
      if (s < 0 || br.bad) return null
      if (s < 256) { // literal
        val red = grp(1).decode(br)
        val blue = grp(2).decode(br)
        val alpha = grp(3).decode(br)
        if (red < 0 || blue < 0 || alpha < 0 || br.bad) return null
        val argb = (alpha << 24) | (red << 16) | (s << 8) | blue
        px(pos) = argb
        cacheInsert(argb)
        pos += 1
      } else if (s < 256 + 24) { // backward reference
        val length = lz77Value(s - 256, br)
        val distSym = grp(4).decode(br)
        if (distSym < 0 || br.bad) return null
        val distCode = lz77Value(distSym, br)
        if (br.bad) return null
        val dist =
          if (distCode > 120) distCode - 120
          else {
            // (dx, dy): dx is the BACKWARD x offset (positive = left),
            // matching the published xoffset = 8 - nibble convention
            val (dx, dy) = DistMap(distCode - 1)
            val d = dy * w + dx
            if (d < 1) 1 else d
          }
        if (dist > pos || pos + length > n) return null
        var k = 0
        while (k < length) {
          val v = px(pos - dist)
          px(pos) = v
          cacheInsert(v)
          pos += 1
          k += 1
        }
      } else { // color cache hit
        if (cache == null) return null
        val idx = s - 256 - 24
        if (idx >= cacheSize) return null
        px(pos) = cache(idx)
        pos += 1
      }
    }
    px
  }

  // ----------------------------------------------------------------
  // inverse transforms
  // ----------------------------------------------------------------
  private def addGreen(px: Array[Int]): Unit = {
    var i = 0
    while (i < px.length) {
      val p = px(i)
      val g = (p >> 8) & 0xFF
      val r = (((p >> 16) & 0xFF) + g) & 0xFF
      val b = ((p & 0xFF) + g) & 0xFF
      px(i) = (p & 0xFF00FF00) | (r << 16) | b
      i += 1
    }
  }

  private def avg2(a: Int, b: Int): Int = {
    // per-channel floor average, SIMD-free closed form
    (((a ^ b) & 0xFEFEFEFE) >>> 1) + (a & b)
  }

  private def clamp255(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v

  private def predict(mode: Int, l: Int, t: Int, tl: Int, tr: Int): Int =
    mode match {
      case 0 => 0xFF000000
      case 1 => l
      case 2 => t
      case 3 => tr
      case 4 => tl
      case 5 => avg2(avg2(l, tr), t)
      case 6 => avg2(l, tl)
      case 7 => avg2(l, t)
      case 8 => avg2(tl, t)
      case 9 => avg2(t, tr)
      case 10 => avg2(avg2(l, tl), avg2(t, tr))
      case 11 => // Select: Manhattan-closer of L and T to the gradient
        var pL = 0; var pT = 0
        var sh = 0
        while (sh < 32) {
          val cl = (l >>> sh) & 0xFF; val ct = (t >>> sh) & 0xFF
          val ctl = (tl >>> sh) & 0xFF
          val p = cl + ct - ctl
          pL += math.abs(p - cl); pT += math.abs(p - ct)
          sh += 8
        }
        if (pL < pT) l else t
      case 12 => // ClampAddSubtractFull per channel
        var out = 0
        var sh = 0
        while (sh < 32) {
          val v = clamp255(((l >>> sh) & 0xFF) + ((t >>> sh) & 0xFF) -
            ((tl >>> sh) & 0xFF))
          out |= v << sh
          sh += 8
        }
        out
      case 13 => // ClampAddSubtractHalf(avg2(L,T), TL) per channel
        val a = avg2(l, t)
        var out = 0
        var sh = 0
        while (sh < 32) {
          val av = (a >>> sh) & 0xFF
          val v = clamp255(av + (av - ((tl >>> sh) & 0xFF)) / 2)
          out |= v << sh
          sh += 8
        }
        out
      case _ => 0xFF000000
    }

  private def addPixels(a: Int, b: Int): Int = {
    // per-channel (a + b) mod 256
    val rb = ((a & 0x00FF00FF) + (b & 0x00FF00FF)) & 0x00FF00FF
    val ag = (((a >>> 8) & 0x00FF00FF) + ((b >>> 8) & 0x00FF00FF)) & 0x00FF00FF
    (ag << 8) | rb
  }

  private def inversePredictor(px: Array[Int], w: Int, h: Int,
      bits: Int, tiles: Array[Int], tilesW: Int): Boolean = {
    var y = 0
    var pos = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val pred =
          if (x == 0 && y == 0) 0xFF000000
          else if (y == 0) px(pos - 1) // top row: L
          else if (x == 0) px(pos - w) // first column: T
          else {
            val t = tiles((y >> bits) * tilesW + (x >> bits))
            val mode = (t >> 8) & 0xFF // stored in green
            if (mode > 13) return false
            // TR of the rightmost column = first pixel of this row
            // (the contiguous-layout rule the spec documents)
            predict(mode, px(pos - 1), px(pos - w), px(pos - w - 1),
              px(pos - w + 1))
          }
        px(pos) = addPixels(px(pos), pred)
        x += 1; pos += 1
      }
      y += 1
    }
    true
  }

  private def colorDelta(t: Int, c: Int): Int =
    (t.toByte.toInt * c.toByte.toInt) >> 5

  private def inverseColorTransform(px: Array[Int], w: Int, h: Int,
      bits: Int, tiles: Array[Int], tilesW: Int): Unit = {
    var y = 0
    var pos = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val t = tiles((y >> bits) * tilesW + (x >> bits))
        val g2r = t & 0xFF          // blue byte
        val g2b = (t >> 8) & 0xFF   // green byte
        val r2b = (t >> 16) & 0xFF  // red byte
        val p = px(pos)
        val g = (p >> 8) & 0xFF
        var r = (p >> 16) & 0xFF
        var b = p & 0xFF
        r = (r + colorDelta(g2r, g)) & 0xFF
        b = (b + colorDelta(g2b, g)) & 0xFF
        b = (b + colorDelta(r2b, r)) & 0xFF
        px(pos) = (p & 0xFF00FF00) | (r << 16) | b
        x += 1; pos += 1
      }
      y += 1
    }
  }

  // ----------------------------------------------------------------
  // the VP8L stream
  // ----------------------------------------------------------------
  private final case class Transform(kind: Int, bits: Int,
      data: Array[Int], dataW: Int)

  /** Decode a VP8L payload (after the 'VP8L' chunk header) to ARGB. */
  private def decodeVp8l(b: Array[Byte], from: Int, until: Int):
      (Int, Int, Array[Int]) = {
    if (until - from < 5) return null
    if ((b(from) & 0xFF) != 0x2F) return null
    val br = new BitReader(b, from + 1, until)
    val w = br.readBits(14) + 1
    val h = br.readBits(14) + 1
    br.readBit() // alpha hint
    val version = br.readBits(3)
    if (br.bad || version != 0) return null
    if (w.toLong * h > MaxPixels) return null
    // transforms (each at most once)
    val seen = new Array[Boolean](4)
    var transforms: List[Transform] = Nil
    var decodeW = w // width the entropy-coded main image is stored at
    var paletteSize = 0
    var continue = true
    while (continue && !br.bad) {
      if (br.readBit() == 0) continue = false
      else {
        val kind = br.readBits(2)
        if (br.bad || seen(kind)) return null
        seen(kind) = true
        kind match {
          case 0 | 1 => // predictor / color: tile sub-image
            val bits = br.readBits(3) + 2
            val tw = (w + (1 << bits) - 1) >> bits
            val th = (h + (1 << bits) - 1) >> bits
            val img = decodeEntropyImage(br, tw, th, level0 = false)
            if (img == null) return null
            transforms ::= Transform(kind, bits, img, tw)
          case 2 => // subtract green: no data
            transforms ::= Transform(2, 0, null, 0)
          case _ => // color indexing
            paletteSize = br.readBits(8) + 1
            if (br.bad) return null
            val pal = decodeEntropyImage(br, paletteSize, 1, level0 = false)
            if (pal == null) return null
            // palette entries are per-channel delta-coded
            var i = 1
            while (i < pal.length) {
              pal(i) = addPixels(pal(i), pal(i - 1))
              i += 1
            }
            val widthBits =
              if (paletteSize <= 2) 3
              else if (paletteSize <= 4) 2
              else if (paletteSize <= 16) 1
              else 0
            decodeW = (w + (1 << widthBits) - 1) >> widthBits
            transforms ::= Transform(3, widthBits, pal, paletteSize)
        }
      }
    }
    if (br.bad) return null
    // honest restriction: color indexing composes with nothing that
    // retiles the canvas (no known encoder emits those combos)
    if (seen(3) && (seen(0) || seen(1))) return null
    var px = decodeEntropyImage(br, decodeW, h, level0 = true)
    if (px == null) return null
    // inverse transforms, reverse read order (head of list = last read)
    var cur = transforms
    var curW = decodeW
    while (cur != Nil) {
      val t = cur.head
      t.kind match {
        case 2 => addGreen(px)
        case 0 =>
          if (!inversePredictor(px, curW, h, t.bits, t.data, t.dataW))
            return null
        case 1 => inverseColorTransform(px, curW, h, t.bits, t.data, t.dataW)
        case _ => // color indexing: unbundle + palette map
          val widthBits = t.bits
          val bpp = 8 >> widthBits
          val perByte = 1 << widthBits
          val mask = (1 << bpp) - 1
          val out = new Array[Int](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val packed = (px(y * curW + (x >> widthBits)) >> 8) & 0xFF
              val idx = (packed >> (bpp * (x & (perByte - 1)))) & mask
              if (idx >= t.dataW) return null
              out(y * w + x) = t.data(idx)
              x += 1
            }
            y += 1
          }
          px = out
          curW = w
      }
      cur = cur.tail
    }
    (w, h, px)
  }

  /** RIFF walk → first VP8L chunk → decoded 8-bit luma (BT.601 integer
    * weights, same formula as every other codec in the GraySniff
    * space). Lossy `VP8 `-only containers null (scope note above). */
  def decodeGray(bytes: Array[Byte]): PngKernel.Gray = {
    if (bytes == null || bytes.length < 20) return null
    if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'E' &&
      bytes(10) == 'B' && bytes(11) == 'P')) return null
    // The chunk walk is done in Long: a declared size near 0x7FFFFFFF
    // would pass an Int `size < 0` guard and wrap `pos + 8 + size`
    // negative, sending `new String(bytes, pos, 4)` out of bounds on
    // crafted/corrupt input. Long arithmetic cannot wrap here.
    var pos = 12L
    while (pos + 8 <= bytes.length) {
      val p = pos.toInt
      val four = new String(bytes, p, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      val size = ((bytes(p + 4) & 0xFF).toLong) |
        ((bytes(p + 5) & 0xFF).toLong << 8) |
        ((bytes(p + 6) & 0xFF).toLong << 16) |
        ((bytes(p + 7) & 0xFF).toLong << 24)
      if (pos + 8 + size > bytes.length) return null
      if (four == "VP8L") {
        val r = decodeVp8l(bytes, p + 8, (pos + 8 + size).toInt)
        if (r == null) return null
        val (w, h, px) = r
        val luma = new Array[Int](px.length)
        var i = 0
        while (i < px.length) {
          val p = px(i)
          luma(i) = (77 * ((p >> 16) & 0xFF) + 150 * ((p >> 8) & 0xFF) +
            29 * (p & 0xFF)) >> 8
          i += 1
        }
        return PngKernel.Gray(w, h, luma)
      }
      pos += 8 + size + (size & 1) // chunks are 2-byte aligned
    }
    null // no VP8L chunk (lossy-only, or bare alpha/anim container)
  }

  // ----------------------------------------------------------------
  // encoder (fixture-grade): literal-only VP8L, optional subtract-green
  // ----------------------------------------------------------------
  private[ext] final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var nBits = 0
    def writeBits(v: Int, n: Int): Unit = {
      acc |= (v.toLong & ((1L << n) - 1)) << nBits
      nBits += n
      while (nBits >= 8) {
        out.write((acc & 0xFF).toInt)
        acc >>>= 8
        nBits -= 8
      }
    }
    /** A canonical prefix code's bits are consumed MSB-first — write
      * them in that order. */
    def writeCode(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { writeBits((code >> i) & 1, 1); i -= 1 }
    }
    def toBytes: Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      o.write(out.toByteArray)
      if (nBits > 0) o.write((acc & 0xFF).toInt)
      o.toByteArray
    }
  }

  /** Emit a NORMAL-form prefix code for the given symbol lengths (the
    * code-length-code layer), shared by the encoder and WebpSpec's
    * hand-stream builder. Handles the run-length 16/17/18 codes. */
  private[ext] def writePrefixCode(bw: BitWriter,
      lengths: Array[Int]): Unit = {
    bw.writeBits(0, 1) // normal form
    // run-length-encode the lengths into code-length symbols
    val syms = scala.collection.mutable.ArrayBuffer[(Int, Int)]() // (sym, extra)
    var i = 0
    var prevNonZero = 8
    while (i < lengths.length) {
      val v = lengths(i)
      var run = 1
      while (i + run < lengths.length && lengths(i + run) == v) run += 1
      if (v == 0) {
        var left = run
        while (left >= 11) {
          val take = math.min(left, 138); syms += ((18, take - 11)); left -= take
        }
        while (left >= 3) {
          val take = math.min(left, 10); syms += ((17, take - 3)); left -= take
        }
        while (left > 0) { syms += ((0, -1)); left -= 1 }
      } else {
        syms += ((v, -1))
        prevNonZero = v
        var left = run - 1
        while (left >= 3) {
          val take = math.min(left, 6); syms += ((16, take - 3)); left -= take
        }
        while (left > 0) { syms += ((v, -1)); left -= 1 }
      }
      i += run
    }
    // code-length code: a FLAT complete code over the used CL symbols
    // (all length ceil(log2 k), padded to completeness with unused
    // filler symbols that are never emitted)
    val used = syms.map(_._1).distinct.sorted
    val clLens = new Array[Int](19)
    val k = used.length
    val width =
      if (k <= 1) 1 else 32 - Integer.numberOfLeadingZeros(k - 1)
    val full = 1 << width
    for (s <- used) clLens(s) = width
    var need = full - k
    var cand = 0
    while (need > 0 && cand < 19) {
      if (clLens(cand) == 0) { clLens(cand) = width; need -= 1 }
      cand += 1
    }
    require(need == 0, "cannot complete CL code")
    // emit CL lengths in ClOrder, covering every nonzero slot
    var last = 0
    for (j <- ClOrder.indices)
      if (clLens(ClOrder(j)) > 0) last = j
    val numCl = math.max(4, last + 1)
    bw.writeBits(numCl - 4, 4)
    for (j <- 0 until numCl) bw.writeBits(clLens(ClOrder(j)), 3)
    bw.writeBits(0, 1) // no max_symbol shortcut
    val clCodes = canonicalCodes(clLens)
    for ((s, extra) <- syms) {
      val (c, l) = clCodes(s)
      bw.writeCode(c, l)
      if (s == 16) bw.writeBits(extra, 2)
      else if (s == 17) bw.writeBits(extra, 3)
      else if (s == 18) bw.writeBits(extra, 7)
    }
  }

  /** Emit a SIMPLE-form prefix code of one or two symbols. */
  private[ext] def writeSimpleCode(bw: BitWriter, s0: Int,
      s1: Int = -1): Unit = {
    bw.writeBits(1, 1) // simple form
    bw.writeBits(if (s1 >= 0) 1 else 0, 1) // num_symbols - 1
    if (s0 > 1) { bw.writeBits(1, 1); bw.writeBits(s0, 8) }
    else { bw.writeBits(0, 1); bw.writeBits(s0, 1) } // 1-bit symbol
    if (s1 >= 0) bw.writeBits(s1, 8)
  }

  /** Wrap a VP8L payload in the RIFF/WEBP container. */
  private[ext] def wrapRiff(vp8l: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = {
      out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
      out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF)
    }
    val padded = vp8l.length + (vp8l.length & 1)
    out.write("RIFF".getBytes, 0, 4)
    le32(4 + 8 + padded)
    out.write("WEBP".getBytes, 0, 4)
    out.write("VP8L".getBytes, 0, 4)
    le32(vp8l.length)
    out.write(vp8l, 0, vp8l.length)
    if ((vp8l.length & 1) == 1) out.write(0)
    out.toByteArray
  }

  /** Encode a GRAY image as lossless WebP: literal pixels under the
    * fixed canonical codes (green 9-bit + two 2-bit spares; red/blue
    * either full 8-bit codes or, with subtract-green, the 0-bit
    * constant-zero simple code; alpha constant 255). `subtractGreen`
    * additionally exercises the inverse transform on every decode. */
  def encodeGray(w: Int, h: Int, pixel: (Int, Int) => Int,
      subtractGreen: Boolean = true): Array[Byte] = {
    require(w >= 1 && h >= 1 && w <= 16384 && h <= 16384,
      s"bad dims ${w}x$h")
    val bw = new BitWriter()
    bw.writeBits(0x2F, 8)
    bw.writeBits(w - 1, 14)
    bw.writeBits(h - 1, 14)
    bw.writeBits(0, 1) // alpha unused
    bw.writeBits(0, 3) // version
    if (subtractGreen) {
      bw.writeBits(1, 1) // a transform follows
      bw.writeBits(2, 2) // subtract green
    }
    bw.writeBits(0, 1) // no more transforms
    bw.writeBits(0, 1) // no color cache
    bw.writeBits(0, 1) // no meta prefix
    // green: lengths 9 for 0..255, 2 for 256/257 (Kraft-complete),
    // zeros for the rest of the 280-symbol alphabet
    val greenLens = new Array[Int](280)
    java.util.Arrays.fill(greenLens, 0, 256, 9)
    greenLens(256) = 2; greenLens(257) = 2
    writePrefixCode(bw, greenLens)
    val greenCodes = canonicalCodes(greenLens)
    if (subtractGreen) {
      writeSimpleCode(bw, 0) // red residual: constant 0
      writeSimpleCode(bw, 0) // blue residual: constant 0
    } else {
      val full8 = Array.fill(256)(8)
      writePrefixCode(bw, full8) // red
      writePrefixCode(bw, full8) // blue
    }
    writeSimpleCode(bw, 255) // alpha: constant 255
    writeSimpleCode(bw, 0) // distance: unused single symbol
    val rbCodes =
      if (subtractGreen) null else canonicalCodes(Array.fill(256)(8))
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = pixel(x, y) & 0xFF
        val (gc, gl) = greenCodes(v)
        bw.writeCode(gc, gl)
        if (!subtractGreen) {
          val (rc, rl) = rbCodes(v)
          bw.writeCode(rc, rl) // red
          bw.writeCode(rc, rl) // blue
        }
        // alpha + distance: 0-bit simple codes, nothing to write
        x += 1
      }
      y += 1
    }
    wrapRiff(bw.toBytes)
  }
}

/** [[GifGrayStats]]-shaped pixel statistics for WebP lossless content:
  * (ok, width, height, n_px, sum_luma, mean_milli, var_milli,
  * ahash/dhash halves) — the shared GraySniff stat space. Lossy VP8
  * and dirty bytes degrade to ok=false. */
case class WebpGrayStats(child: Expression)
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
      s"webp_gray_stats requires binary, got $other")
  }

  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val bytes = child.eval(input) match {
      case null => null
      case b => b.asInstanceOf[Array[Byte]]
    }
    GifGrayStats.statsRow(WebpKernel.decodeGray(bytes))
  }

  override protected def withNewChildInternal(
      newChild: Expression): WebpGrayStats = copy(child = newChild)

  override def prettyName: String = "webp_gray_stats"
}

object WebpGrayStats {
  def apply(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      WebpGrayStats(org.apache.spark.sql.graftbridge.Bridge.expression(c)))
}

/** Deterministic lossless-WebP fixture: the SAME pixel contract as
  * [[GrayPngEncode]] —
  *   t     = x·colStep + y·rowStep + seed·131
  *   pixel = ((t² mod 251) + t + [ (x·7 + y·11) mod 97 < bump ]) mod 256
  * (mod-positive), so the PNG oracle chain replays webp decode
  * verbatim. Every image carries the subtract-green transform — the
  * inverse transform is load-bearing in every gate row. */
case class GrayWebpEncode(seed: Expression, w: Expression, h: Expression,
    rowStep: Expression, colStep: Expression, bump: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] =
    Seq(seed, w, h, rowStep, colStep, bump)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c => c.dataType == LongType ||
      c.dataType == IntegerType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "gray_webp_encode requires integer children")

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
    WebpKernel.encodeGray(ww.toInt, hh.toInt,
      (x, y) => {
        val t = x * cs + y * rs + s * 131
        val tq = ((t % 251) * (t % 251)) % 251 // == t² mod 251
        val bumped = if ((x * 7 + y * 11) % 97 < b) 1 else 0
        ((((tq + t + bumped) % 256) + 256) % 256).toInt
      })
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GrayWebpEncode =
    GrayWebpEncode(newChildren(0), newChildren(1), newChildren(2),
      newChildren(3), newChildren(4), newChildren(5))

  override def prettyName: String = "gray_webp_encode"
}

object GrayWebpEncode {
  def apply(seed: Column, w: Column, h: Column, rowStep: Column,
      colStep: Column, bump: Column): Column = {
    val b = org.apache.spark.sql.graftbridge.Bridge
    b.column(GrayWebpEncode(b.expression(seed), b.expression(w),
      b.expression(h), b.expression(rowStep), b.expression(colStep),
      b.expression(bump)))
  }
}
