package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Pure-JVM baseline JPEG (ITU-T T.81) LUMA decoder — the JPEG pixel
  * leg of the multimodal CONTENT family, built the way the PNG leg was
  * ([[PngKernel]]): core-JVM primitives only, no codec library. What
  * zlib was to PNG, a canonical Huffman decoder + an 8×8 IDCT are to
  * baseline JPEG — a few hundred lines of exactly-specified integer
  * plumbing, all in the public spec.
  *
  * Scope (honest, like the MP4 leg's): BASELINE and extended-sequential
  * Huffman scans (SOF0/SOF1) plus PROGRESSIVE (SOF2 — spectral
  * selection, successive approximation, EOBRUN, per T.81 Annex G; a
  * large fraction of real web JPEGs are progressive), 8-bit samples,
  * 1- or 3-component (grayscale / YCbCr at any Hi,Vi ∈ {1,2} — 4:4:4,
  * 4:2:2, 4:2:0), restart markers, 8-bit quant tables. Arithmetic
  * coding, 12-bit, and hierarchical scans return null — as does any
  * malformed or truncated stream; never a throw (crawl-dirty bytes are
  * the expected input). Progressive chroma AC scans are BYTE-SKIPPED
  * (marker scan, zero Huffman work — they can't affect luma), so the
  * luma-only contract costs even less on progressive than sequential.
  *
  * Output is the LUMA plane only ([[PngKernel.Gray]] — the shared
  * content type every downstream verb consumes: aHash/dHash, pixel
  * stats, resize). JPEG's Y component IS luma, so chroma blocks are
  * entropy-decoded (the bitstream can't be advanced otherwise) but
  * never IDCT'd or upsampled — the decode does exactly the work the
  * gray-content contract needs.
  *
  * Determinism note: the IDCT runs in double precision with a fixed
  * summation order and rounds once at the end — bit-identical on every
  * JVM (strict FP is the platform default since Java 17). Decoder
  * conformance is differential-tested against `javax.imageio` in
  * MediaContentSpec; the oracle gate instead uses [[encodeGrayBlocks]]
  * fixtures, whose DC-only blocks round-trip EXACTLY (a flat block's
  * only nonzero coefficient is DC; with quantizer 8 it carries v−128
  * losslessly, and the DC-only IDCT is the exact constant v), so a SQL
  * engine replays decoded pixels from the planted block formula. */
private[ext] object JpegKernel {

  import PngKernel.Gray

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF

  /** Zigzag scan position -> natural (row-major) coefficient index. */
  private val ZZ: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Canonical Huffman table in the classic mincode/maxcode/valptr
    * form (T.81 Annex C/F decode procedure). */
  private final class Huff(bits: Array[Int], vals: Array[Int]) {
    val mincode = new Array[Int](17)
    val maxcode = Array.fill(17)(-1)
    val valptr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l) > 0) {
          valptr(l) = k
          mincode(l) = code
          code += bits(l); k += bits(l)
          maxcode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def value(idx: Int): Int = vals(idx)
  }

  /** Entropy-segment bit reader with 0xFF00 unstuffing. Hitting a real
    * marker (0xFF followed by non-zero) sets `marker` and yields -1
    * bits — the caller decides whether that marker was expected (a
    * restart) or corruption. */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var cnt = 0
    var marker = -1
    def nextBit(): Int = {
      if (marker >= 0) return -1
      if (cnt == 0) {
        if (pos >= b.length) { marker = 0xD9; return -1 }
        var byte0 = u8(b, pos); pos += 1
        if (byte0 == 0xFF) {
          if (pos >= b.length) { marker = 0xD9; return -1 }
          val nx = u8(b, pos)
          if (nx == 0x00) { pos += 1 } // stuffed 0xFF datum
          else { marker = nx; pos += 1; return -1 }
        }
        acc = byte0; cnt = 8
      }
      cnt -= 1
      (acc >> cnt) & 1
    }
    /** Byte-align and consume an expected RSTn marker; false if the
      * stream has anything else there. */
    def consumeRestart(n: Int): Boolean = {
      cnt = 0
      if (marker < 0) {
        // marker not yet reached: it must be the very next bytes
        if (pos + 1 >= b.length) return false
        if (u8(b, pos) != 0xFF) return false
        marker = u8(b, pos + 1); pos += 2
      }
      if (marker != 0xD0 + n) return false
      marker = -1
      true
    }
  }

  private def huffDecode(r: BitReader, h: Huff): Int = {
    var code = 0
    var l = 1
    while (l <= 16) {
      val bit = r.nextBit()
      if (bit < 0) return -1
      code = (code << 1) | bit
      if (h.maxcode(l) >= 0 && code <= h.maxcode(l))
        return h.value(h.valptr(l) + code - h.mincode(l))
      l += 1
    }
    -1
  }

  /** RECEIVE + EXTEND (T.81 F.2.2.1): read `s` magnitude bits. */
  private def receiveExtend(r: BitReader, s: Int): Int = {
    if (s == 0) return 0
    var v = 0
    var i = 0
    while (i < s) {
      val bit = r.nextBit()
      if (bit < 0) return Int.MinValue
      v = (v << 1) | bit
      i += 1
    }
    if (v < (1 << (s - 1))) v - (1 << s) + 1 else v
  }

  /** Plain RECEIVE: `n` raw bits (EOBRUN extensions); -1 on marker. */
  private def receiveN(r: BitReader, n: Int): Int = {
    var v = 0
    var i = 0
    while (i < n) {
      val bit = r.nextBit()
      if (bit < 0) return -1
      v = (v << 1) | bit
      i += 1
    }
    v
  }

  /** Separable 2-D IDCT of one dequantized 8×8 block (natural order),
    * level-shifted (+128) and clamped into `out` at (ox, oy) with edge
    * clipping against (w, h). Double precision, fixed order. */
  private val COS: Array[Double] = {
    val c = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var x = 0
      while (x < 8) {
        c(u * 8 + x) = math.cos((2 * x + 1) * u * math.Pi / 16.0) *
          (if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)
        x += 1
      }
      u += 1
    }
    c
  }

  private def idctToPlane(coef: Array[Int], out: Array[Int], w: Int,
      h: Int, ox: Int, oy: Int): Unit = {
    // rows then columns, 0.5·(Σ C(u)·F·cos) per axis
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += COS(u * 8 + x) * coef(y * 8 + u); u += 1 }
        tmp(y * 8 + x) = s * 0.5
        x += 1
      }
      y += 1
    }
    var x = 0
    while (x < 8) {
      var yy = 0
      while (yy < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += COS(v * 8 + yy) * tmp(v * 8 + x); v += 1 }
        val px = ox + x; val py = oy + yy
        if (px < w && py < h) {
          val r = math.rint(s * 0.5 + 128.0).toInt
          out(py * w + px) = if (r < 0) 0 else if (r > 255) 255 else r
        }
        yy += 1
      }
      x += 1
    }
  }

  /** Decode a baseline/extended-sequential Huffman JPEG to its 8-bit
    * LUMA plane; null on anything outside the documented scope or on
    * malformed bytes — never throws. */
  def decodeGrayY(jpeg: Array[Byte]): Gray = {
    try decode0(jpeg)
    catch { case _: RuntimeException | _: ArrayIndexOutOfBoundsException |
      _: NegativeArraySizeException => null }
  }

  private def decode0(b: Array[Byte]): Gray = {
    if (b == null || b.length < 4) return null
    if (u8(b, 0) != 0xFF || u8(b, 1) != 0xD8) return null // SOI
    var pos = 2
    val qt = Array.ofDim[Int](4, 64) // zigzag order, as written
    val qtSeen = new Array[Boolean](4)
    val dcT = new Array[Huff](4); val acT = new Array[Huff](4)
    var w = 0; var h = 0
    var nComp = 0
    var compId: Array[Int] = null; var compHV: Array[Int] = null
    var compTq: Array[Int] = null
    var dri = 0
    var sofSeen = false
    var progressive = false
    // progressive-scan state: the luma coefficient store (ZIGZAG order
    // per block, MCU-aligned grid) accumulated across scans
    var pCoef: Array[Int] = null
    var pBW = 0; var pBH = 0
    var pMcusX = 0; var pMcusY = 0
    var pHmax = 1; var pVmax = 1
    var anyScan = false

    def be2(i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)

    // Byte-skip an entropy segment: from `from`, find the next true
    // marker (0xFF followed by neither 0x00 stuffing nor RSTn). Scans
    // that touch no luma state are skipped this way — no Huffman work.
    def skipEntropy(from: Int): Int = {
      var p = from
      while (p + 1 < b.length) {
        if (u8(b, p) == 0xFF) {
          val m = u8(b, p + 1)
          if (m != 0x00 && !(m >= 0xD0 && m <= 0xD7)) return p
        }
        p += 1
      }
      b.length
    }

    while (true) {
      // marker: one or more 0xFF fill bytes then the code
      if (pos + 1 >= b.length) return null
      if (u8(b, pos) != 0xFF) return null
      var m = u8(b, pos + 1); pos += 2
      while (m == 0xFF && pos < b.length) { m = u8(b, pos); pos += 1 }
      m match {
        case 0xD9 => // EOI: for progressive, time to dequantize + IDCT
          if (!progressive || !anyScan) return null
          if (!qtSeen(compTq(0))) return null
          val q = qt(compTq(0))
          val luma = new Array[Int](w * h)
          val nat = new Array[Int](64)
          var by = 0
          while (by < pBH) {
            var bx = 0
            while (bx < pBW) {
              val base = (by * pBW + bx) * 64
              var k = 0
              while (k < 64) { nat(ZZ(k)) = pCoef(base + k) * q(k); k += 1 }
              idctToPlane(nat, luma, w, h, bx * 8, by * 8)
              bx += 1
            }
            by += 1
          }
          return Gray(w, h, luma)
        case 0xC0 | 0xC1 | 0xC2 => // SOF0/1 sequential; SOF2 progressive
          if (sofSeen || pos + 2 > b.length) return null
          progressive = m == 0xC2
          val len = be2(pos)
          if (pos + len > b.length || len < 8) return null
          val prec = u8(b, pos + 2)
          h = be2(pos + 3); w = be2(pos + 5)
          nComp = u8(b, pos + 7)
          if (prec != 8 || w < 1 || h < 1 || (nComp != 1 && nComp != 3))
            return null
          if (w > (1 << 20) || h > (1 << 20) ||
            w.toLong * h > (1L << 28)) return null
          // SOF2 keeps the coefficient store AND the luma plane live
          // simultaneously at EOI (~2·w·h ints) — halve the pixel cap
          // so the progressive worst case matches the baseline budget
          if (progressive && w.toLong * h > (1L << 27)) return null
          if (len != 8 + 3 * nComp) return null
          compId = new Array[Int](nComp); compHV = new Array[Int](nComp)
          compTq = new Array[Int](nComp)
          var c = 0
          while (c < nComp) {
            compId(c) = u8(b, pos + 8 + 3 * c)
            compHV(c) = u8(b, pos + 9 + 3 * c)
            compTq(c) = u8(b, pos + 10 + 3 * c)
            val hi = compHV(c) >> 4; val vi = compHV(c) & 15
            if (hi < 1 || hi > 2 || vi < 1 || vi > 2 || compTq(c) > 3)
              return null
            c += 1
          }
          sofSeen = true
          pos += len
        case 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB |
            0xCD | 0xCE | 0xCF =>
          return null // arithmetic / lossless / hierarchical
        case 0xC4 => // DHT
          if (pos + 2 > b.length) return null
          val len = be2(pos)
          if (pos + len > b.length) return null
          var p = pos + 2
          val end = pos + len
          while (p < end) {
            val tcth = u8(b, p); p += 1
            val tc = tcth >> 4; val th = tcth & 15
            if (tc > 1 || th > 3 || p + 16 > end) return null
            val bits = new Array[Int](17)
            var tot = 0
            var l = 1
            while (l <= 16) { bits(l) = u8(b, p + l - 1); tot += bits(l); l += 1 }
            p += 16
            if (tot > 256 || p + tot > end) return null
            val vals = new Array[Int](tot)
            var i = 0
            while (i < tot) { vals(i) = u8(b, p + i); i += 1 }
            p += tot
            val tbl = new Huff(bits, vals)
            if (tc == 0) dcT(th) = tbl else acT(th) = tbl
          }
          pos += len
        case 0xDB => // DQT
          if (pos + 2 > b.length) return null
          val len = be2(pos)
          if (pos + len > b.length) return null
          var p = pos + 2
          val end = pos + len
          while (p < end) {
            val pqtq = u8(b, p); p += 1
            val pq = pqtq >> 4; val tq = pqtq & 15
            if (pq > 1 || tq > 3) return null
            val n = if (pq == 0) 64 else 128
            if (p + n > end) return null
            var k = 0
            while (k < 64) {
              qt(tq)(k) = if (pq == 0) u8(b, p + k)
                else (u8(b, p + 2 * k) << 8) | u8(b, p + 2 * k + 1)
              k += 1
            }
            qtSeen(tq) = true
            p += n
          }
          pos += len
        case 0xDD => // DRI
          if (pos + 4 > b.length || be2(pos) != 4) return null
          dri = be2(pos + 2)
          pos += 4
        case 0xDA if !progressive => // baseline SOS: the one scan we decode
          if (!sofSeen || pos + 2 > b.length) return null
          val len = be2(pos)
          if (pos + len > b.length) return null
          val ns = u8(b, pos + 2)
          if (ns != nComp || len != 6 + 2 * ns) return null
          val dcSel = new Array[Int](nComp); val acSel = new Array[Int](nComp)
          var c = 0
          while (c < ns) {
            val cs = u8(b, pos + 3 + 2 * c)
            val idx = compId.indexOf(cs)
            if (idx != c) return null // interleaved in SOF order only
            val tdta = u8(b, pos + 4 + 2 * c)
            dcSel(c) = tdta >> 4; acSel(c) = tdta & 15
            if (dcSel(c) > 3 || acSel(c) > 3) return null
            c += 1
          }
          c = 0
          while (c < nComp) {
            if (!qtSeen(compTq(c)) || dcT(dcSel(c)) == null ||
              acT(acSel(c)) == null) return null
            c += 1
          }
          return decodeScan(b, pos + len, w, h, nComp, compHV, compTq,
            qt, dcSel.map(dcT), acSel.map(acT), dri)
        case 0xDA => // progressive SOS: one of many scans (T.81 Annex G)
          if (!sofSeen || pos + 2 > b.length) return null
          val len = be2(pos)
          if (pos + len > b.length) return null
          val ns = u8(b, pos + 2)
          if (ns < 1 || ns > nComp || len != 6 + 2 * ns) return null
          val scomp = new Array[Int](ns)
          val dcSel = new Array[Int](ns); val acSel = new Array[Int](ns)
          var c = 0
          var prevIdx = -1
          while (c < ns) {
            val cs = u8(b, pos + 3 + 2 * c)
            val idx = compId.indexOf(cs)
            if (idx < 0 || idx <= prevIdx) return null // SOF order, no dups
            prevIdx = idx
            scomp(c) = idx
            val tdta = u8(b, pos + 4 + 2 * c)
            dcSel(c) = tdta >> 4; acSel(c) = tdta & 15
            if (dcSel(c) > 3 || acSel(c) > 3) return null
            c += 1
          }
          val ss = u8(b, pos + 3 + 2 * ns)
          val se = u8(b, pos + 4 + 2 * ns)
          val ahal = u8(b, pos + 5 + 2 * ns)
          val ah = ahal >> 4; val al = ahal & 15
          if (ss > 63 || se > 63 || se < ss || al > 13 || ah > 13) return null
          if (ss == 0 && se != 0) return null // DC scans are DC-only
          if (ss > 0 && ns != 1) return null // AC scans: one component
          if (ah != 0 && ah != al + 1) return null // successive approx step
          // lazily size the luma coefficient store (first scan)
          if (pCoef == null) {
            c = 0
            while (c < nComp) {
              pHmax = math.max(pHmax, compHV(c) >> 4)
              pVmax = math.max(pVmax, compHV(c) & 15)
              c += 1
            }
            // luma must be the full-resolution component (the gray
            // contract; same restriction as the baseline path)
            if ((compHV(0) >> 4) != pHmax || (compHV(0) & 15) != pVmax)
              return null
            pMcusX = (w + 8 * pHmax - 1) / (8 * pHmax)
            pMcusY = (h + 8 * pVmax - 1) / (8 * pVmax)
            pBW = pMcusX * pHmax; pBH = pMcusY * pVmax
            val cells = pBW.toLong * pBH * 64
            if (cells > Int.MaxValue) return null
            pCoef = new Array[Int](cells.toInt)
          }
          val touchesLuma = scomp.contains(0)
          if (!touchesLuma) {
            // chroma-only scan: no state we track — byte-skip the
            // entropy segment (no Huffman decode at all)
            pos = skipEntropy(pos + len)
          } else {
            val endPos = progScan(b, pos + len, ns, scomp, ss, se, ah, al,
              dcSel, acSel, dcT, acT, dri, nComp, compHV,
              pCoef, pBW, pBH, pMcusX, pMcusY, pHmax, pVmax, w, h)
            if (endPos < 0) return null
            pos = endPos
            anyScan = true
          }
        case 0x01 => () // TEM: parameterless
        case n if n >= 0xD0 && n <= 0xD7 => () // stray RST: parameterless
        case _ => // APPn/COM/anything else with a length field: skip
          if (pos + 2 > b.length) return null
          val len = be2(pos)
          if (len < 2 || pos + len > b.length) return null
          pos += len
      }
    }
    null
  }

  /** One PROGRESSIVE scan that touches luma (T.81 Annex G decode):
    * accumulates into the zigzag-order luma coefficient store and
    * returns the byte position of the next marker, or -1 on malformed
    * data. DC scans may be interleaved (all blocks entropy-decoded,
    * chroma coefficients discarded); AC scans are single-component by
    * spec. Successive approximation: first scans shift by Al,
    * refinement scans append bit Al (two's-complement OR — exact for
    * negative DC) / apply the ±1<<Al correction-bit algorithm for AC. */
  private def progScan(b: Array[Byte], dataPos: Int, ns: Int,
      scomp: Array[Int], ss: Int, se: Int, ah: Int, al: Int,
      dcSel: Array[Int], acSel: Array[Int], dcT: Array[Huff],
      acT: Array[Huff], dri: Int, nComp: Int, compHV: Array[Int],
      coefA: Array[Int], pBW: Int, pBH: Int, mcusX: Int, mcusY: Int,
      hmax: Int, vmax: Int, w: Int, h: Int): Int = {
    val r = new BitReader(b, dataPos)
    var eobrun = 0
    val pred = new Array[Int](ns)
    var rstN = 0

    def endPos(): Int = {
      if (r.marker >= 0) return r.pos - 2
      var p = r.pos
      while (p + 1 < b.length) {
        if (u8(b, p) == 0xFF) {
          val mm = u8(b, p + 1)
          if (mm != 0x00 && !(mm >= 0xD0 && mm <= 0xD7)) return p
        }
        p += 1
      }
      b.length
    }

    def refineNonzero(base: Int, k: Int, p1: Int, m1: Int): Boolean = {
      val c0 = coefA(base + k)
      if (c0 != 0) {
        val bit = r.nextBit()
        if (bit < 0) return false
        if (bit == 1 && (c0 & p1) == 0)
          coefA(base + k) = if (c0 >= 0) c0 + p1 else c0 + m1
      }
      true
    }

    if (ss == 0) {
      // ---- DC scan (interleaved over the scan's components) ----
      if (ah == 0) {
        var ci = 0
        while (ci < ns) {
          if (dcT(dcSel(ci)) == null) return -1
          ci += 1
        }
      }
      val interleaved = ns > 1
      val total: Long =
        if (interleaved) mcusX.toLong * mcusY
        else {
          // single-component: the component's own block grid (for luma,
          // hi==hmax → ceil(w/8) × ceil(h/8))
          val comp = scomp(0)
          val hi = compHV(comp) >> 4; val vi = compHV(comp) & 15
          val cw = (w * hi + hmax - 1) / hmax; val ch = (h * vi + vmax - 1) / vmax
          ((cw + 7) / 8).toLong * ((ch + 7) / 8)
        }
      val nbX = if (interleaved) 0 else {
        val comp = scomp(0)
        val hi = compHV(comp) >> 4
        ((w * hi + hmax - 1) / hmax + 7) / 8
      }
      var unit = 0L
      while (unit < total) {
        if (dri > 0 && unit > 0 && unit % dri == 0) {
          if (!r.consumeRestart(rstN)) return -1
          rstN = (rstN + 1) & 7
          java.util.Arrays.fill(pred, 0)
        }
        if (interleaved) {
          val mx = (unit % mcusX).toInt; val my = (unit / mcusX).toInt
          var ci = 0
          while (ci < ns) {
            val comp = scomp(ci)
            val hi = compHV(comp) >> 4; val vi = compHV(comp) & 15
            var by = 0
            while (by < vi) {
              var bx = 0
              while (bx < hi) {
                if (ah == 0) {
                  val s = huffDecode(r, dcT(dcSel(ci)))
                  if (s < 0 || s > 15) return -1
                  val diff = receiveExtend(r, s)
                  if (diff == Int.MinValue) return -1
                  pred(ci) += diff
                  if (comp == 0)
                    coefA(((my * vi + by) * pBW + mx * hi + bx) * 64) =
                      pred(ci) << al
                } else {
                  val bit = r.nextBit()
                  if (bit < 0) return -1
                  if (comp == 0 && bit == 1)
                    coefA(((my * vi + by) * pBW + mx * hi + bx) * 64) |=
                      1 << al
                }
                bx += 1
              }
              by += 1
            }
            ci += 1
          }
        } else {
          val bX = (unit % nbX).toInt; val bY = (unit / nbX).toInt
          val base = (bY * pBW + bX) * 64
          if (ah == 0) {
            val s = huffDecode(r, dcT(dcSel(0)))
            if (s < 0 || s > 15) return -1
            val diff = receiveExtend(r, s)
            if (diff == Int.MinValue) return -1
            pred(0) += diff
            if (scomp(0) == 0) coefA(base) = pred(0) << al
          } else {
            val bit = r.nextBit()
            if (bit < 0) return -1
            if (scomp(0) == 0 && bit == 1) coefA(base) |= 1 << al
          }
        }
        unit += 1
      }
      endPos()
    } else {
      // ---- AC scan: single component (luma — chroma was byte-skipped) ----
      val comp = scomp(0)
      val hi = compHV(comp) >> 4; val vi = compHV(comp) & 15
      val cw = (w * hi + hmax - 1) / hmax; val ch = (h * vi + vmax - 1) / vmax
      val nbX = (cw + 7) / 8; val nbY = (ch + 7) / 8
      val acTbl = acT(acSel(0))
      if (acTbl == null) return -1
      val p1 = 1 << al; val m1 = -(1 << al)
      var blk = 0L
      val total = nbX.toLong * nbY
      while (blk < total) {
        if (dri > 0 && blk > 0 && blk % dri == 0) {
          if (!r.consumeRestart(rstN)) return -1
          rstN = (rstN + 1) & 7
          eobrun = 0
        }
        val bX = (blk % nbX).toInt; val bY = (blk / nbX).toInt
        val base = (bY * pBW + bX) * 64
        if (ah == 0) {
          // ---- first AC scan of this band ----
          if (eobrun > 0) eobrun -= 1
          else {
            var k = ss
            var brk = false
            while (!brk && k <= se) {
              val rs = huffDecode(r, acTbl)
              if (rs < 0) return -1
              val rr = rs >> 4; val s = rs & 15
              if (s == 0) {
                if (rr == 15) k += 16 // ZRL
                else {
                  eobrun = (1 << rr) - 1
                  if (rr > 0) {
                    val eb = receiveN(r, rr)
                    if (eb < 0) return -1
                    eobrun += eb
                  }
                  brk = true
                }
              } else {
                k += rr
                if (k > se) return -1
                val v = receiveExtend(r, s)
                if (v == Int.MinValue) return -1
                coefA(base + k) = v << al
                k += 1
              }
            }
          }
        } else {
          // ---- AC refinement scan (the correction-bit algorithm) ----
          var k = ss
          if (eobrun == 0) {
            var brk = false
            while (!brk && k <= se) {
              val rs = huffDecode(r, acTbl)
              if (rs < 0) return -1
              var rr = rs >> 4; val s0 = rs & 15
              var newval = 0
              if (s0 == 0) {
                if (rr < 15) {
                  eobrun = 1 << rr
                  if (rr > 0) {
                    val eb = receiveN(r, rr)
                    if (eb < 0) return -1
                    eobrun += eb
                  }
                  brk = true
                } // rr == 15: advance over 16 zero-history coefficients
              } else {
                if (s0 != 1) return -1
                val bit = r.nextBit()
                if (bit < 0) return -1
                newval = if (bit == 1) p1 else m1
              }
              if (!brk) {
                var done = false
                while (!done && k <= se) {
                  val c0 = coefA(base + k)
                  if (c0 != 0) {
                    val bit = r.nextBit()
                    if (bit < 0) return -1
                    if (bit == 1 && (c0 & p1) == 0)
                      coefA(base + k) = if (c0 >= 0) c0 + p1 else c0 + m1
                  } else {
                    if (rr == 0) {
                      if (newval != 0) coefA(base + k) = newval
                      done = true
                    }
                    rr -= 1
                  }
                  k += 1
                }
                if (!done && newval != 0) return -1 // no slot for the new coef
              }
            }
          }
          if (eobrun > 0) {
            // end-of-band: refinement bits for the remaining nonzero
            // coefficients of this block's band
            while (k <= se) {
              if (!refineNonzero(base, k, p1, m1)) return -1
              k += 1
            }
            eobrun -= 1
          }
        }
        blk += 1
      }
      endPos()
    }
  }

  private def decodeScan(b: Array[Byte], dataPos: Int, w: Int, h: Int,
      nComp: Int, compHV: Array[Int], compTq: Array[Int],
      qt: Array[Array[Int]], dc: Array[Huff], ac: Array[Huff],
      dri: Int): Gray = {
    var hmax = 1; var vmax = 1
    var c = 0
    while (c < nComp) {
      hmax = math.max(hmax, compHV(c) >> 4)
      vmax = math.max(vmax, compHV(c) & 15)
      c += 1
    }
    val mcuW = 8 * hmax; val mcuH = 8 * vmax
    val mcusX = (w + mcuW - 1) / mcuW
    val mcusY = (h + mcuH - 1) / mcuH
    val luma = new Array[Int](w * h)
    val pred = new Array[Int](nComp)
    val coef = new Array[Int](64)
    val r = new BitReader(b, dataPos)
    var rstN = 0
    var mcu = 0
    val totalMcus = mcusX.toLong * mcusY
    while (mcu < totalMcus) {
      if (dri > 0 && mcu > 0 && mcu % dri == 0) {
        if (!r.consumeRestart(rstN)) return null
        rstN = (rstN + 1) & 7
        java.util.Arrays.fill(pred, 0)
      }
      val mx = (mcu % mcusX).toInt; val my = (mcu / mcusX).toInt
      c = 0
      while (c < nComp) {
        val hi = compHV(c) >> 4; val vi = compHV(c) & 15
        val q = qt(compTq(c))
        var by = 0
        while (by < vi) {
          var bx = 0
          while (bx < hi) {
            // ---- one block: DC ----
            val s = huffDecode(r, dc(c))
            if (s < 0 || s > 15) return null
            val diff = receiveExtend(r, s)
            if (diff == Int.MinValue) return null
            pred(c) += diff
            java.util.Arrays.fill(coef, 0)
            coef(0) = pred(c) * q(0)
            // ---- AC run-length ----
            var k = 1
            var eob = false
            while (!eob && k < 64) {
              val rs = huffDecode(r, ac(c))
              if (rs < 0) return null
              val run = rs >> 4; val size = rs & 15
              if (size == 0) {
                if (run == 15) k += 16 else eob = true
              } else {
                k += run
                if (k > 63) return null
                val v = receiveExtend(r, size)
                if (v == Int.MinValue) return null
                coef(ZZ(k)) = v * q(k)
                k += 1
              }
            }
            if (c == 0) {
              // Y block: IDCT into the luma plane, replicated per the
              // component's sampling scale (hi/hmax, vi/vmax) — for Y
              // at full resolution (the overwhelmingly common case)
              // this is a plain placement
              if (hi == hmax && vi == vmax)
                idctToPlane(coef, luma, w, h,
                  mx * mcuW + bx * 8, my * mcuH + by * 8)
              else {
                // subsampled LUMA (rare: Y smaller than chroma) — out
                // of the luma-content contract
                return null
              }
            } // chroma blocks: entropy-decoded to advance the stream,
              // never reconstructed (luma-only contract)
            bx += 1
          }
          by += 1
        }
        c += 1
      }
      mcu += 1
    }
    Gray(w, h, luma)
  }

  // ------------------------------------------------------------------
  // Encoder: block-flat grayscale baseline JPEG, DC-exact round-trip.
  // ------------------------------------------------------------------

  /** Magnitude category of a DC difference (T.81 F.1.2.1.1). */
  private def category(v: Int): Int = {
    var a = math.abs(v); var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  /** Encode a BLOCK-FLAT grayscale baseline JPEG: `wB`×`hB` blocks of
    * 8×8 pixels, block (bx, by) uniformly `bv(bx, by)` ∈ 0..255. With
    * the DC quantizer pinned to 8, a flat block's single coefficient
    * carries v−128 EXACTLY and the decode reproduces every pixel bit
    * for bit — the planted-parameter fixture the x_mm_pixels_jpeg
    * oracle replays in SQL (and javax.imageio independently decodes to
    * the same flat blocks in MediaContentSpec, proving the wire format
    * is real JPEG, not a private dialect). Tables: quantizer 8 (DC) /
    * 16 (AC, unused), minimal canonical DHTs (nine 4-bit DC category
    * codes, a 1-bit AC EOB). */
  def encodeGrayBlocks(wB: Int, hB: Int, bv: (Int, Int) => Int): Array[Byte] = {
    require(wB >= 1 && hB >= 1 && wB <= 512 && hB <= 512,
      s"bad block grid ${wB}x$hB")
    val w = wB * 8; val h = hB * 8
    val out = new java.io.ByteArrayOutputStream()
    def wr(vs: Int*): Unit = vs.foreach(v => out.write(v & 0xFF))
    def seg(marker: Int, body: Int*): Unit = {
      wr(0xFF, marker, (body.length + 2) >> 8, (body.length + 2) & 0xFF)
      body.foreach(v => out.write(v & 0xFF))
    }
    wr(0xFF, 0xD8) // SOI
    // APP0 / JFIF 1.01, no thumbnail
    seg(0xE0, 'J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0)
    // DQT table 0: zigzag position 0 (DC) = 8, the rest 16
    seg(0xDB, (0 +: (0 until 64).map(k => if (k == 0) 8 else 16)): _*)
    // SOF0: 8-bit, 1 component, 1x1 sampling, quant table 0
    seg(0xC0, 8, h >> 8, h & 0xFF, w >> 8, w & 0xFF, 1, 1, 0x11, 0)
    // DHT DC0: nine 4-bit codes for categories 0..8
    seg(0xC4, (Seq(0x00) ++ Seq(0, 0, 0, 9, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      0, 0, 0) ++ (0 to 8)): _*)
    // DHT AC0: one 1-bit code, value 0x00 (EOB)
    seg(0xC4, (Seq(0x10) ++ Seq(1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      0, 0, 0) ++ Seq(0x00)): _*)
    // SOS: 1 component, DC table 0 / AC table 0
    seg(0xDA, 1, 1, 0x00, 0, 63, 0)
    // entropy data: per block, DC category code (4 bits) + magnitude
    // bits + AC EOB (1 bit "0")
    var acc = 0; var nb = 0
    def putBits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1); nb += 1
        if (nb == 8) {
          out.write(acc & 0xFF)
          if ((acc & 0xFF) == 0xFF) out.write(0x00) // byte stuffing
          acc = 0; nb = 0
        }
        i -= 1
      }
    }
    var prev = 0
    var by = 0
    while (by < hB) {
      var bx = 0
      while (bx < wB) {
        val v = bv(bx, by)
        require(v >= 0 && v <= 255, s"block value $v out of range")
        val dcq = v - 128
        val diff = dcq - prev
        prev = dcq
        val s = category(diff)
        putBits(s, 4) // DC category code: canonical 4-bit code == s
        if (s > 0)
          putBits(if (diff < 0) diff + (1 << s) - 1 else diff, s)
        putBits(0, 1) // AC EOB: 1-bit code "0"
        bx += 1
      }
      by += 1
    }
    if (nb > 0) { // pad with 1s to the byte boundary
      acc = (acc << (8 - nb)) | ((1 << (8 - nb)) - 1)
      out.write(acc & 0xFF)
      if ((acc & 0xFF) == 0xFF) out.write(0x00)
    }
    wr(0xFF, 0xD9) // EOI
    out.toByteArray
  }

  /** PROGRESSIVE (SOF2) twin of [[encodeGrayBlocks]]: the same
    * block-flat pixel contract, written as THREE progressive scans —
    *   1. DC first (Ss=0, Se=0, Ah=0, Al=1): DPCM of dcq >> 1
    *   2. DC refinement (Ah=1, Al=0): the raw low bit of each dcq
    *   3. AC first (Ss=1, Se=63): all-zero bands as EOBRUN codes
    *      (one EOBn spans up to 32767 blocks — the decoder's EOBRUN
    *      path is genuinely exercised, not one EOB per block)
    * so decode must run successive-approximation accumulation AND
    * end-of-band runs to reproduce the pixels — still bit-exact
    * (DC-only blocks; (x>>1)<<1 | (x&1) == x in two's complement). */
  def encodeGrayBlocksProgressive(wB: Int, hB: Int,
      bv: (Int, Int) => Int, restartEvery: Int = 0): Array[Byte] = {
    require(wB >= 1 && hB >= 1 && wB <= 512 && hB <= 512,
      s"bad block grid ${wB}x$hB")
    require(restartEvery >= 0, s"bad restart interval $restartEvery")
    val w = wB * 8; val h = hB * 8
    val out = new java.io.ByteArrayOutputStream()
    def wr(vs: Int*): Unit = vs.foreach(v => out.write(v & 0xFF))
    def seg(marker: Int, body: Int*): Unit = {
      wr(0xFF, marker, (body.length + 2) >> 8, (body.length + 2) & 0xFF)
      body.foreach(v => out.write(v & 0xFF))
    }
    wr(0xFF, 0xD8) // SOI
    seg(0xE0, 'J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0)
    seg(0xDB, (0 +: (0 until 64).map(k => if (k == 0) 8 else 16)): _*)
    // SOF2: progressive, 8-bit, 1 component, 1x1 sampling
    seg(0xC2, 8, h >> 8, h & 0xFF, w >> 8, w & 0xFF, 1, 1, 0x11, 0)
    if (restartEvery > 0)
      seg(0xDD, restartEvery >> 8, restartEvery & 0xFF) // DRI
    // DHT DC0: nine 4-bit codes for categories 0..8
    seg(0xC4, (Seq(0x00) ++ Seq(0, 0, 0, 9, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      0, 0, 0) ++ (0 to 8)): _*)
    // DHT AC0: fifteen 4-bit codes for EOBn run lengths r = 0..14
    // (value r<<4; canonical code of value r<<4 is r itself)
    seg(0xC4, (Seq(0x10) ++ Seq(0, 0, 0, 15, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      0, 0, 0) ++ (0 to 14).map(_ << 4)): _*)

    // scan-local bit writer, flushed (1-padded) at each scan boundary
    var acc = 0; var nb = 0
    def putBits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1); nb += 1
        if (nb == 8) {
          out.write(acc & 0xFF)
          if ((acc & 0xFF) == 0xFF) out.write(0x00)
          acc = 0; nb = 0
        }
        i -= 1
      }
    }
    def flushBits(): Unit = if (nb > 0) {
      acc = (acc << (8 - nb)) | ((1 << (8 - nb)) - 1)
      out.write(acc & 0xFF)
      if ((acc & 0xFF) == 0xFF) out.write(0x00)
      acc = 0; nb = 0
    }

    // restart plumbing: flush (1-padded), RSTn cycling 0-7, counter
    // reset per scan; with restartEvery = 0 this is all inert
    var rstN = 0
    def maybeRestart(blkIdx: Int): Boolean = {
      if (restartEvery > 0 && blkIdx > 0 && blkIdx % restartEvery == 0) {
        flushBits()
        wr(0xFF, 0xD0 + rstN)
        rstN = (rstN + 1) & 7
        true
      } else false
    }

    // ---- scan 1: DC first, Al = 1 ----
    seg(0xDA, 1, 1, 0x00, 0, 0, 0x01)
    rstN = 0
    var prev = 0
    var blk = 0
    val nBlocks = wB * hB
    while (blk < nBlocks) {
      if (maybeRestart(blk)) prev = 0 // predictors reset at a restart
      val v = bv(blk % wB, blk / wB)
      require(v >= 0 && v <= 255, s"block value $v out of range")
      val hi = (v - 128) >> 1 // arithmetic: floor((v-128)/2)
      val diff = hi - prev
      prev = hi
      val s = category(diff)
      putBits(s, 4)
      if (s > 0)
        putBits(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      blk += 1
    }
    flushBits()

    // ---- scan 2: DC refinement, Ah = 1, Al = 0 ----
    seg(0xDA, 1, 1, 0x00, 0, 0, 0x10)
    rstN = 0
    blk = 0
    while (blk < nBlocks) {
      maybeRestart(blk)
      putBits((bv(blk % wB, blk / wB) - 128) & 1, 1)
      blk += 1
    }
    flushBits()

    // ---- scan 3: AC band 1..63, all zero — pure EOBRUN codes; an
    // EOBRUN must never cross a restart boundary, so runs are emitted
    // per restart segment ----
    seg(0xDA, 1, 1, 0x00, 1, 63, 0x00)
    rstN = 0
    val segLen = if (restartEvery > 0) restartEvery else nBlocks
    var segStart = 0
    while (segStart < nBlocks) {
      if (segStart > 0 && restartEvery > 0) {
        flushBits()
        wr(0xFF, 0xD0 + rstN)
        rstN = (rstN + 1) & 7
      }
      var remaining = math.min(segLen, nBlocks - segStart)
      while (remaining > 0) {
        val n = math.min(remaining, 32767)
        var r = 0
        while ((2 << r) <= n) r += 1 // r = floor(log2 n)
        putBits(r, 4) // EOBn code == r (canonical 4-bit)
        if (r > 0) putBits(n - (1 << r), r)
        remaining -= n
      }
      segStart += segLen
    }
    flushBits()

    wr(0xFF, 0xD9) // EOI
    out.toByteArray
  }
}

/** JPEG decode + the gray-content stat struct — identical shape to
  * [[PngGrayStats]] (ok, dims, n_px, sum/mean/var, aHash/dHash halves)
  * so the multimodal verbs compose across formats: same hashes, same
  * banding, same near-dup machinery, fed from a different container.
  * Undecodable / out-of-scope bytes → ok=false, null fields. */
case class JpegGrayStats(child: Expression)
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
      s"jpeg_gray_stats requires binary, got $other")
  }

  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val bytes = child.eval(input) match {
      case null => null
      case b => b.asInstanceOf[Array[Byte]]
    }
    val g = JpegKernel.decodeGrayY(bytes)
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

  override protected def withNewChildInternal(newChild: Expression): JpegGrayStats =
    copy(child = newChild)

  override def prettyName: String = "jpeg_gray_stats"
}

object JpegGrayStats {
  def apply(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      JpegGrayStats(org.apache.spark.sql.graftbridge.Bridge.expression(c)))
}

/** Container-sniffing gray-content stats — crawl image columns are
  * MIXED (PNG and JPEG interleaved row by row), and a per-format
  * pipeline would scan the corpus once per container. This expression
  * sniffs the magic bytes (\x89PNG / \xFFD8 / GIF8 / BM) and routes
  * each row to the matching kernel, emitting the SAME stat/hash struct
  * — one scan, one fingerprint space, so near-dup detection catches a
  * PNG and a JPEG of the same picture in the same Hamming ball (both
  * hashes threshold the same 8×8 luma cell grid; lossy-compression
  * pixel drift lands within the near-dup radius, not at zero).
  * Unknown/malformed containers → ok=false. */
case class ImageGrayStats(child: Expression)
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

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"image_gray_stats requires binary, got $other")
  }

  override def eval(input: InternalRow): Any = {
    val bytes = child.eval(input) match {
      case null => null
      case b => b.asInstanceOf[Array[Byte]]
    }
    GifGrayStats.statsRow(GraySniff.decode(bytes))
  }

  override protected def withNewChildInternal(newChild: Expression): ImageGrayStats =
    copy(child = newChild)

  override def prettyName: String = "image_gray_stats"
}

object ImageGrayStats {
  def apply(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      ImageGrayStats(org.apache.spark.sql.graftbridge.Bridge.expression(c)))
}

/** Deterministic block-flat JPEG corpus builder — the JPEG twin of
  * [[GrayPngEncode]]: a REAL baseline JPEG whose 8×8 blocks are flat
  * values of the documented formula, so decode is exact and a SQL
  * oracle replays every pixel. Block contract:
  *   bv(bx, by) = (((bx·7 + by·11 + seed·131)² mod 251) + bx + by·3 +
  *                 seed) mod 256
  * (the quadratic-residue mix from the PNG fixture family — affine
  * textures collide under mean-thresholded hashes). */
case class BlockJpegEncode(seed: Expression, wBlocks: Expression,
    hBlocks: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(seed, wBlocks, hBlocks)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"block_jpeg_encode requires 3 longs, got ${children.map(_.dataType)}")

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    val Seq(s, wb, hb) = vs.map(_.asInstanceOf[Long])
    if (wb < 1 || hb < 1 || wb > 512 || hb > 512) return null
    JpegKernel.encodeGrayBlocks(wb.toInt, hb.toInt, (bx, by) => {
      val t = bx * 7L + by * 11L + s * 131L
      val tq = ((t % 251) * (t % 251)) % 251
      ((((tq + bx + by * 3L + s) % 256) + 256) % 256).toInt
    })
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BlockJpegEncode =
    BlockJpegEncode(newChildren(0), newChildren(1), newChildren(2))

  override def prettyName: String = "block_jpeg_encode"
}

object BlockJpegEncode {
  def apply(seed: Column, wBlocks: Column, hBlocks: Column): Column = {
    val b = org.apache.spark.sql.graftbridge.Bridge
    b.column(BlockJpegEncode(b.expression(seed), b.expression(wBlocks),
      b.expression(hBlocks)))
  }
}

/** PROGRESSIVE twin of [[BlockJpegEncode]]: identical block contract,
  * wire format [[JpegKernel.encodeGrayBlocksProgressive]] (SOF2, three
  * scans, successive approximation + EOBRUN) — the oracle replays the
  * same pixel formula while the engine must run the full Annex G
  * multi-scan accumulation to agree. */
case class ProgJpegEncode(seed: Expression, wBlocks: Expression,
    hBlocks: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(seed, wBlocks, hBlocks)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"prog_jpeg_encode requires 3 longs, got ${children.map(_.dataType)}")

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    val Seq(s, wb, hb) = vs.map(_.asInstanceOf[Long])
    if (wb < 1 || hb < 1 || wb > 512 || hb > 512) return null
    JpegKernel.encodeGrayBlocksProgressive(wb.toInt, hb.toInt, (bx, by) => {
      val t = bx * 7L + by * 11L + s * 131L
      val tq = ((t % 251) * (t % 251)) % 251
      ((((tq + bx + by * 3L + s) % 256) + 256) % 256).toInt
    })
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ProgJpegEncode =
    ProgJpegEncode(newChildren(0), newChildren(1), newChildren(2))

  override def prettyName: String = "prog_jpeg_encode"
}

object ProgJpegEncode {
  def apply(seed: Column, wBlocks: Column, hBlocks: Column): Column = {
    val b = org.apache.spark.sql.graftbridge.Bridge
    b.column(ProgJpegEncode(b.expression(seed), b.expression(wBlocks),
      b.expression(hBlocks)))
  }
}
