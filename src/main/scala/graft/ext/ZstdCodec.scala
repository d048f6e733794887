package graft.ext

/** zstd (RFC 8878) frame decoder — closes the Content-Encoding gap the
  * r14 scope note lumped in with brotli. The r14 verdict's re-argument
  * stands accepted: unlike brotli (whose 122 KB static dictionary +
  * 121 word transforms + context modeling make it codec-scale), zstd
  * with no dictionary is exactly-specified integer plumbing of the
  * VP8L class — FSE (tANS) tables, canonical Huffman literals, and a
  * three-stream sequence machine, all reconstructible from the public
  * RFC alone. This is a clean-room implementation from RFC 8878; the
  * only tables carried over are the RFC's own predefined FSE
  * distributions and code→(baseline, extra-bits) tables, which are
  * normative constants.
  *
  * Scope and contract:
  *   - No dictionary support: a nonzero Dictionary_ID nulls (raw/
  *     structured dictionaries are an ecosystem feature crawl servers
  *     do not use for Content-Encoding).
  *   - Verified-or-nothing: any malformed header, FSE/Huffman table,
  *     bitstream, offset past the produced history, or (when present)
  *     XXH64 content-checksum mismatch nulls the whole decode — never
  *     a throw, never a silent partial (the container-leg contract).
  *   - Multi-frame inputs concatenate; skippable frames skip.
  *   - Output capped at [[ZstdKernel.MaxDecoded]] (the PDF/PNG cap) —
  *     a decompression bomb nulls rather than allocating.
  *
  * Conformance: ZstdSpec cross-checks against the system `zstd` CLI
  * (the system-tar precedent) at several levels — reference-compressed
  * frames with FSE-compressed Huffman weights, 4-stream literals,
  * repeat modes and RLE blocks must decode byte-exact — plus
  * hand-built raw/RLE frames, corruption and truncation batteries. */
private[ext] object ZstdKernel {

  final val MaxDecoded: Int = 1 << 26

  // ----------------------------------------------------------------
  // XXH64 (public xxHash spec) — zstd's content checksum
  // ----------------------------------------------------------------

  private final val P1 = 0x9E3779B185EBCA87L
  private final val P2 = 0xC2B2AE3D27D4EB4FL
  private final val P3 = 0x165667B19E3779F9L
  private final val P4 = 0x85EBCA77C2B2AE63L
  private final val P5 = 0x27D4EB2F165667C5L

  private def rotl(v: Long, n: Int): Long = (v << n) | (v >>> (64 - n))

  private def le8(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24) |
      ((b(i + 4) & 0xFFL) << 32) | ((b(i + 5) & 0xFFL) << 40) |
      ((b(i + 6) & 0xFFL) << 48) | ((b(i + 7) & 0xFFL) << 56)

  private def le4(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)

  def xxh64(b: Array[Byte], off: Int, len: Int, seed: Long): Long = {
    var h: Long = 0L
    var i = off
    val end = off + len
    if (len >= 32) {
      var v1 = seed + P1 + P2
      var v2 = seed + P2
      var v3 = seed
      var v4 = seed - P1
      while (i + 32 <= end) {
        v1 = rotl(v1 + le8(b, i) * P2, 31) * P1
        v2 = rotl(v2 + le8(b, i + 8) * P2, 31) * P1
        v3 = rotl(v3 + le8(b, i + 16) * P2, 31) * P1
        v4 = rotl(v4 + le8(b, i + 24) * P2, 31) * P1
        i += 32
      }
      h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
      def merge(acc: Long, v: Long): Long =
        (acc ^ (rotl(v * P2, 31) * P1)) * P1 + P4
      h = merge(h, v1); h = merge(h, v2); h = merge(h, v3)
      h = merge(h, v4)
    } else h = seed + P5
    h += len
    while (i + 8 <= end) {
      h = rotl(h ^ (rotl(le8(b, i) * P2, 31) * P1), 27) * P1 + P4
      i += 8
    }
    if (i + 4 <= end) {
      h = rotl(h ^ (le4(b, i) * P1), 23) * P2 + P3
      i += 4
    }
    while (i < end) {
      h = rotl(h ^ ((b(i) & 0xFFL) * P5), 11) * P1
      i += 1
    }
    h ^= h >>> 33; h *= P2; h ^= h >>> 29; h *= P3; h ^= h >>> 32
    h
  }

  // ----------------------------------------------------------------
  // bit readers
  // ----------------------------------------------------------------

  /** Forward LSB-first reader (FSE table descriptions). */
  private final class FwdBits(b: Array[Byte], start: Int, end: Int) {
    private var bp = 0
    var ok = true
    def read(n: Int): Int = {
      var v = 0
      var k = 0
      while (k < n) {
        val idx = bp + k
        val byteIdx = start + (idx >> 3)
        if (byteIdx >= end) { ok = false; return 0 }
        v |= ((b(byteIdx) >> (idx & 7)) & 1) << k
        k += 1
      }
      bp += n
      v
    }
    def bytesUsed: Int = (bp + 7) >> 3
  }

  /** Backward reader (FSE/Huffman payload bitstreams): the stream is
    * written LSB-first and read from the top, below the final byte's
    * 1-marker padding bit. Peeks past the start zero-pad (short final
    * Huffman codes rely on this); consumption past the start is the
    * FSE stop/corruption signal, tracked by `p < 0`. */
  private final class BackBits(b: Array[Byte], start: Int, end: Int) {
    var ok = true
    var p: Int = {
      if (end <= start) { ok = false; 0 }
      else {
        val last = b(end - 1) & 0xFF
        if (last == 0) { ok = false; 0 }
        else (end - 1 - start) * 8 +
          (31 - Integer.numberOfLeadingZeros(last))
      }
    }
    private def bit(i: Int): Int = (b(start + (i >> 3)) >> (i & 7)) & 1
    def peek(n: Int): Int = {
      var v = 0
      var k = 0
      while (k < n) {
        val idx = p - n + k
        if (idx >= 0) v |= bit(idx) << k
        k += 1
      }
      v
    }
    def skip(n: Int): Unit = p -= n
    def read(n: Int): Int = { val v = peek(n); skip(n); v }
    def readLong(n: Int): Long = {
      if (n <= 31) read(n).toLong & 0xFFFFFFFFL
      else {
        val hi = read(n - 16).toLong
        val lo = read(16).toLong
        (hi << 16) | lo
      }
    }
  }

  // ----------------------------------------------------------------
  // FSE
  // ----------------------------------------------------------------

  private final class FseTable(val al: Int, val symbol: Array[Int],
      val nbBits: Array[Int], val base: Array[Int])

  /** Build the decoding table from normalized counts (RFC 8878
    * §4.1.1): "less than 1" (-1) symbols take single cells at the
    * table top; the rest spread by the fixed step; baselines assigned
    * in table-scan order. */
  private def buildFse(counts: Array[Int], maxSym: Int, al: Int)
      : FseTable = {
    if (al < 1 || al > 12) return null
    val size = 1 << al
    val symbol = new Array[Int](size)
    var high = size - 1
    var s = 0
    while (s <= maxSym) {
      if (counts(s) == -1) {
        if (high < 0) return null
        symbol(high) = s; high -= 1
      }
      s += 1
    }
    val step = (size >> 1) + (size >> 3) + 3
    val mask = size - 1
    var pos = 0
    s = 0
    while (s <= maxSym) {
      var c = counts(s)
      while (c > 0) {
        symbol(pos) = s
        pos = (pos + step) & mask
        var guard = 0
        while (pos > high && guard <= size) {
          pos = (pos + step) & mask
          guard += 1
        }
        if (guard > size) return null
        c -= 1
      }
      s += 1
    }
    if (pos != 0) return null
    val next = new Array[Int](maxSym + 1)
    s = 0
    while (s <= maxSym) {
      next(s) = if (counts(s) == -1) 1 else counts(s)
      s += 1
    }
    val nbBits = new Array[Int](size)
    val base = new Array[Int](size)
    var i = 0
    while (i < size) {
      val sym = symbol(i)
      val x = next(sym)
      if (x <= 0) return null
      next(sym) = x + 1
      val nb = al - (31 - Integer.numberOfLeadingZeros(x))
      if (nb < 0 || nb > al) return null
      nbBits(i) = nb
      base(i) = (x << nb) - size
      i += 1
    }
    new FseTable(al, symbol, nbBits, base)
  }

  /** Read an FSE table description (the FSE_readNCount walk): returns
    * (table, bytesConsumed) or null. */
  private def readFseTable(b: Array[Byte], off: Int, end: Int,
      maxAl: Int, maxSymAllowed: Int): (FseTable, Int) = {
    if (off >= end) return null
    val f = new FwdBits(b, off, end)
    val al = f.read(4) + 5
    if (!f.ok || al > maxAl) return null
    var remaining = (1 << al) + 1
    var threshold = 1 << al
    var nbBits = al + 1
    val counts = new Array[Int](maxSymAllowed + 1)
    var charnum = 0
    var prevZero = false
    while (remaining > 1 && charnum <= maxSymAllowed) {
      if (prevZero) {
        var rep = f.read(2)
        if (!f.ok) return null
        charnum += rep
        while (rep == 3) {
          rep = f.read(2)
          if (!f.ok) return null
          charnum += rep
        }
        if (charnum > maxSymAllowed) return null
        prevZero = false
      } else {
        val max = (2 * threshold - 1) - remaining
        val low = f.read(nbBits - 1)
        if (!f.ok) return null
        var count =
          if (low < max) low
          else {
            val hiBit = f.read(1)
            if (!f.ok) return null
            val v = low | (hiBit << (nbBits - 1))
            if (v >= threshold) v - max else v
          }
        count -= 1
        remaining -= (if (count < 0) -count else count)
        if (remaining < 1) return null
        counts(charnum) = count
        charnum += 1
        prevZero = count == 0
        while (remaining < threshold) { nbBits -= 1; threshold >>= 1 }
      }
    }
    if (remaining != 1) return null
    val t = buildFse(counts, charnum - 1, al)
    if (t == null) return null
    (t, f.bytesUsed)
  }

  /** A single-state (RLE-mode) table: one cell, zero bits. */
  private def rleTable(sym: Int): FseTable =
    new FseTable(0, Array(sym), Array(0), Array(0))

  // ----------------------------------------------------------------
  // Huffman
  // ----------------------------------------------------------------

  private final class HufTable(val maxBits: Int, val symbol: Array[Int],
      val nbBits: Array[Int])

  /** Parse a Huffman tree description at `off`; returns (table,
    * bytesConsumed) or null. */
  private def readHufTable(b: Array[Byte], off: Int, end: Int)
      : (HufTable, Int) = {
    if (off >= end) return null
    val hbyte = b(off) & 0xFF
    var weights: Array[Int] = null
    var consumed = 0
    if (hbyte >= 128) {
      val n = hbyte - 127
      val nBytes = (n + 1) / 2
      if (off + 1 + nBytes > end) return null
      weights = new Array[Int](n)
      var i = 0
      while (i < n) {
        val byt = b(off + 1 + (i >> 1)) & 0xFF
        weights(i) = if ((i & 1) == 0) byt >> 4 else byt & 0xF
        i += 1
      }
      consumed = 1 + nBytes
    } else {
      val csize = hbyte
      if (csize == 0 || off + 1 + csize > end) return null
      val r = readFseTable(b, off + 1, off + 1 + csize, 6, 255)
      if (r == null) return null
      val (table, used) = r
      val back = new BackBits(b, off + 1 + used, off + 1 + csize)
      if (!back.ok) return null
      var st1 = back.read(table.al)
      var st2 = back.read(table.al)
      if (back.p < 0) return null
      val buf = new Array[Int](256)
      var n = 0
      var done = false
      while (!done) {
        if (n >= 255) return null
        buf(n) = table.symbol(st1); n += 1
        st1 = table.base(st1) + back.read(table.nbBits(st1))
        if (back.p < 0) {
          if (n >= 255) return null
          buf(n) = table.symbol(st2); n += 1
          done = true
        } else {
          if (n >= 255) return null
          buf(n) = table.symbol(st2); n += 1
          st2 = table.base(st2) + back.read(table.nbBits(st2))
          if (back.p < 0) {
            if (n >= 255) return null
            buf(n) = table.symbol(st1); n += 1
            done = true
          }
        }
      }
      weights = java.util.Arrays.copyOf(buf, n)
      consumed = 1 + csize
    }
    // implicit last weight completes the next power of two
    var total = 0L
    var i = 0
    while (i < weights.length) {
      val w = weights(i)
      if (w > 11) return null
      if (w > 0) total += 1L << (w - 1)
      i += 1
    }
    if (total <= 0 || total >= (1L << 11)) return null
    val maxBits = 64 - java.lang.Long.numberOfLeadingZeros(total)
    if (maxBits > 11) return null
    val rest = (1L << maxBits) - total
    if (java.lang.Long.bitCount(rest) != 1) return null
    val lastW = 64 - java.lang.Long.numberOfLeadingZeros(rest)
    val allW = weights :+ lastW.toInt
    val numSym = allW.length
    if (numSym > 256) return null
    // build: longest codes first (rank walk, RFC canonical order)
    val mb = maxBits.toInt
    val size = 1 << mb
    val rankCount = new Array[Int](mb + 2)
    i = 0
    while (i < numSym) {
      if (allW(i) > 0) {
        val bits = mb + 1 - allW(i)
        rankCount(bits) += 1
      }
      i += 1
    }
    val rankIdx = new Array[Int](mb + 2)
    rankIdx(mb) = 0
    var bb = mb
    while (bb >= 1) {
      rankIdx(bb - 1) = rankIdx(bb) + rankCount(bb) * (1 << (mb - bb))
      bb -= 1
    }
    if (rankIdx(0) != size) return null
    val symbol = new Array[Int](size)
    val nbBits = new Array[Int](size)
    i = 0
    while (i < numSym) {
      if (allW(i) > 0) {
        val bits = mb + 1 - allW(i)
        val base = rankIdx(bits)
        val len = 1 << (mb - bits)
        var k = 0
        while (k < len) {
          symbol(base + k) = i
          nbBits(base + k) = bits
          k += 1
        }
        rankIdx(bits) += len
      }
      i += 1
    }
    (new HufTable(mb, symbol, nbBits), consumed)
  }

  /** Decode exactly `count` literals from one backward stream. */
  private def hufDecodeStream(t: HufTable, b: Array[Byte], start: Int,
      end: Int, out: Array[Byte], outOff: Int, count: Int): Boolean = {
    val back = new BackBits(b, start, end)
    if (!back.ok) return false
    var i = 0
    while (i < count) {
      val idx = back.peek(t.maxBits)
      out(outOff + i) = t.symbol(idx).toByte
      back.skip(t.nbBits(idx))
      if (back.p < 0) return false
      i += 1
    }
    back.p == 0 // a valid stream is consumed exactly
  }

  // ----------------------------------------------------------------
  // sequence code tables (RFC 8878 normative constants)
  // ----------------------------------------------------------------

  private val LlBase = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12,
    13, 14, 15, 16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512,
    1024, 2048, 4096, 8192, 16384, 32768, 65536)
  private val LlBits = Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14,
    15, 16)
  private val MlBase = Array(3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14,
    15, 16, 17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31,
    32, 33, 34, 35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259,
    515, 1027, 2051, 4099, 8195, 16387, 32771, 65539)
  private val MlBits = Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1,
    2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)

  private val LlDefault = Array(4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2,
    1, 1, 1, 2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1,
    -1, -1)
  private val MlDefault = Array(1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1, -1, -1)
  private val OfDefault = Array(1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1)

  private lazy val LlDefaultTable = buildFse(LlDefault, 35, 6)
  private lazy val MlDefaultTable = buildFse(MlDefault, 52, 6)
  private lazy val OfDefaultTable = buildFse(OfDefault, 28, 5)

  // ----------------------------------------------------------------
  // frame decode
  // ----------------------------------------------------------------

  /** Per-frame entropy context (tables persist across blocks). */
  private final class Ctx {
    var huf: HufTable = null
    var ll: FseTable = null
    var ml: FseTable = null
    var of: FseTable = null
    val rep = Array(1L, 4L, 8L)
  }

  /** Decode the literals section of a compressed block. Returns
    * (literals, bytesConsumed) or null. */
  private def decodeLiterals(b: Array[Byte], off: Int, end: Int,
      ctx: Ctx): (Array[Byte], Int) = {
    if (off >= end) return null
    val b0 = b(off) & 0xFF
    val typ = b0 & 3
    if (typ == 0 || typ == 1) { // Raw | RLE
      var regen = 0
      var hdr = 0
      if (((b0 >> 2) & 1) == 0) { regen = b0 >> 3; hdr = 1 }
      else ((b0 >> 2) & 3) match {
        case 1 =>
          if (off + 2 > end) return null
          regen = (b0 >> 4) | ((b(off + 1) & 0xFF) << 4); hdr = 2
        case 3 =>
          if (off + 3 > end) return null
          regen = (b0 >> 4) | ((b(off + 1) & 0xFF) << 4) |
            ((b(off + 2) & 0xFF) << 12)
          hdr = 3
        case _ => return null
      }
      if (regen > (1 << 20)) return null
      if (typ == 0) {
        if (off + hdr + regen > end) return null
        (java.util.Arrays.copyOfRange(b, off + hdr, off + hdr + regen),
          hdr + regen)
      } else {
        if (off + hdr + 1 > end) return null
        val out = new Array[Byte](regen)
        java.util.Arrays.fill(out, b(off + hdr))
        (out, hdr + 1)
      }
    } else { // Compressed | Treeless
      val sf = (b0 >> 2) & 3
      var regen = 0
      var comp = 0
      var hdr = 0
      var fourStreams = true
      sf match {
        case 0 | 1 =>
          if (off + 3 > end) return null
          regen = (b0 >> 4) | ((b(off + 1) & 0x3F) << 4)
          comp = ((b(off + 1) & 0xFF) >> 6) | ((b(off + 2) & 0xFF) << 2)
          hdr = 3
          fourStreams = sf == 1
        case 2 =>
          if (off + 4 > end) return null
          regen = (b0 >> 4) | ((b(off + 1) & 0xFF) << 4) |
            ((b(off + 2) & 0x3) << 12)
          comp = ((b(off + 2) & 0xFF) >> 2) | ((b(off + 3) & 0xFF) << 6)
          hdr = 4
        case _ =>
          if (off + 5 > end) return null
          regen = (b0 >> 4) | ((b(off + 1) & 0xFF) << 4) |
            ((b(off + 2) & 0x3F) << 12)
          comp = ((b(off + 2) & 0xFF) >> 6) | ((b(off + 3) & 0xFF) << 2) |
            ((b(off + 4) & 0xFF) << 10)
          hdr = 5
      }
      if (regen > (1 << 20) || comp <= 0) return null
      val secEnd = off + hdr + comp
      if (secEnd > end) return null
      var streamsStart = off + hdr
      if (typ == 2) { // fresh tree
        val r = readHufTable(b, streamsStart, secEnd)
        if (r == null) return null
        ctx.huf = r._1
        streamsStart += r._2
      }
      if (ctx.huf == null) return null // treeless without a tree
      val out = new Array[Byte](regen)
      if (!fourStreams) {
        if (!hufDecodeStream(ctx.huf, b, streamsStart, secEnd, out, 0,
          regen)) return null
      } else {
        if (streamsStart + 6 > secEnd) return null
        val s1 = ((b(streamsStart) & 0xFF) |
          ((b(streamsStart + 1) & 0xFF) << 8))
        val s2 = ((b(streamsStart + 2) & 0xFF) |
          ((b(streamsStart + 3) & 0xFF) << 8))
        val s3 = ((b(streamsStart + 4) & 0xFF) |
          ((b(streamsStart + 5) & 0xFF) << 8))
        val dataStart = streamsStart + 6
        val total = secEnd - dataStart
        val s4 = total - s1 - s2 - s3
        if (s4 <= 0) return null
        val per = (regen + 3) / 4
        val last = regen - 3 * per
        if (last < 0) return null
        var st = dataStart
        if (!hufDecodeStream(ctx.huf, b, st, st + s1, out, 0, per))
          return null
        st += s1
        if (!hufDecodeStream(ctx.huf, b, st, st + s2, out, per, per))
          return null
        st += s2
        if (!hufDecodeStream(ctx.huf, b, st, st + s3, out, 2 * per, per))
          return null
        st += s3
        if (!hufDecodeStream(ctx.huf, b, st, secEnd, out, 3 * per, last))
          return null
      }
      (out, hdr + comp)
    }
  }

  /** Resolve one sequence-table mode. Returns (table, bytesConsumed)
    * or null. `which`: 0 LL, 1 OF, 2 ML. */
  private def seqTable(mode: Int, b: Array[Byte], off: Int, end: Int,
      ctx: Ctx, which: Int): (FseTable, Int) = {
    val (maxAl, maxSym, dflt) = which match {
      case 0 => (9, 35, LlDefaultTable)
      case 1 => (8, 31, OfDefaultTable)
      case _ => (9, 52, MlDefaultTable)
    }
    val prev = which match {
      case 0 => ctx.ll
      case 1 => ctx.of
      case _ => ctx.ml
    }
    val r: (FseTable, Int) = mode match {
      case 0 => if (dflt == null) null else (dflt, 0)
      case 1 =>
        if (off >= end) null
        else {
          val sym = b(off) & 0xFF
          if (sym > maxSym) null else (rleTable(sym), 1)
        }
      case 2 => readFseTable(b, off, end, maxAl, maxSym)
      case _ => if (prev == null) null else (prev, 0)
    }
    if (r == null) return null
    which match {
      case 0 => ctx.ll = r._1
      case 1 => ctx.of = r._1
      case _ => ctx.ml = r._1
    }
    r
  }

  /** Decode one compressed block's content into `out`. Returns the
    * new output length or -1. */
  private def decodeCompressedBlock(b: Array[Byte], off0: Int, end: Int,
      out: java.io.ByteArrayOutputStream, history: GrowBuf,
      ctx: Ctx): Boolean = {
    var off = off0
    val lit = decodeLiterals(b, off, end, ctx)
    if (lit == null) return false
    val literals = lit._1
    off += lit._2
    // sequences header
    if (off >= end) return false
    val sb0 = b(off) & 0xFF
    var nSeq = 0
    if (sb0 < 128) { nSeq = sb0; off += 1 }
    else if (sb0 == 255) {
      if (off + 3 > end) return false
      nSeq = (b(off + 1) & 0xFF) + ((b(off + 2) & 0xFF) << 8) + 0x7F00
      off += 3
    } else {
      if (off + 2 > end) return false
      nSeq = ((sb0 - 128) << 8) + (b(off + 1) & 0xFF)
      off += 2
    }
    if (nSeq == 0) {
      if (off != end) return false // no trailing garbage in the block
      history.append(literals, 0, literals.length)
      out.write(literals, 0, literals.length)
      return true
    }
    if (off >= end) return false
    val modes = b(off) & 0xFF
    if ((modes & 3) != 0) return false
    off += 1
    val llMode = (modes >> 6) & 3
    val ofMode = (modes >> 4) & 3
    val mlMode = (modes >> 2) & 3
    val llT = seqTable(llMode, b, off, end, ctx, 0)
    if (llT == null) return false
    off += llT._2
    val ofT = seqTable(ofMode, b, off, end, ctx, 1)
    if (ofT == null) return false
    off += ofT._2
    val mlT = seqTable(mlMode, b, off, end, ctx, 2)
    if (mlT == null) return false
    off += mlT._2
    val back = new BackBits(b, off, end)
    if (!back.ok) return false
    var llState = back.read(llT._1.al)
    var ofState = back.read(ofT._1.al)
    var mlState = back.read(mlT._1.al)
    if (back.p < 0) return false
    var litPos = 0
    var seq = 0
    while (seq < nSeq) {
      val ofCode = ofT._1.symbol(ofState)
      val mlCode = mlT._1.symbol(mlState)
      val llCode = llT._1.symbol(llState)
      if (ofCode > 31 || mlCode > 52 || llCode > 35) return false
      val ofValue = (1L << ofCode) + back.readLong(ofCode)
      val ml = MlBase(mlCode) + back.read(MlBits(mlCode))
      val ll = LlBase(llCode) + back.read(LlBits(llCode))
      if (back.p < 0) return false
      // repeat-offset resolution
      var offset = 0L
      if (ofValue > 3) {
        offset = ofValue - 3
        ctx.rep(2) = ctx.rep(1); ctx.rep(1) = ctx.rep(0)
        ctx.rep(0) = offset
      } else {
        var idx = ofValue.toInt
        if (ll == 0) idx += 1
        idx match {
          case 1 => offset = ctx.rep(0)
          case 2 =>
            offset = ctx.rep(1)
            ctx.rep(1) = ctx.rep(0); ctx.rep(0) = offset
          case 3 =>
            offset = ctx.rep(2)
            ctx.rep(2) = ctx.rep(1); ctx.rep(1) = ctx.rep(0)
            ctx.rep(0) = offset
          case _ =>
            offset = ctx.rep(0) - 1
            if (offset <= 0) return false
            ctx.rep(2) = ctx.rep(1); ctx.rep(1) = ctx.rep(0)
            ctx.rep(0) = offset
        }
      }
      // execute: literals then match
      if (litPos + ll > literals.length) return false
      history.append(literals, litPos, ll)
      out.write(literals, litPos, ll)
      litPos += ll
      if (offset <= 0 || offset > history.length) return false
      if (history.length + ml > MaxDecoded) return false
      var k = 0L
      while (k < ml) {
        val byt = history.at(history.length - offset)
        history.appendByte(byt)
        out.write(byt)
        k += 1
      }
      seq += 1
      if (seq < nSeq) {
        llState = llT._1.base(llState) + back.read(llT._1.nbBits(llState))
        mlState = mlT._1.base(mlState) + back.read(mlT._1.nbBits(mlState))
        ofState = ofT._1.base(ofState) + back.read(ofT._1.nbBits(ofState))
        if (back.p < 0) return false
      }
    }
    if (back.p != 0) return false // the bitstream must end exactly
    // remaining literals
    val rem = literals.length - litPos
    if (rem < 0) return false
    history.append(literals, litPos, rem)
    out.write(literals, litPos, rem)
    true
  }

  /** Growable frame-history buffer (match source). */
  private final class GrowBuf {
    private var buf = new Array[Byte](1 << 16)
    var length: Int = 0
    def at(i: Long): Byte = buf(i.toInt)
    def appendByte(v: Byte): Unit = {
      if (length == buf.length)
        buf = java.util.Arrays.copyOf(buf, buf.length * 2)
      buf(length) = v
      length += 1
    }
    def append(src: Array[Byte], off: Int, len: Int): Unit = {
      while (length + len > buf.length)
        buf = java.util.Arrays.copyOf(buf, buf.length * 2)
      System.arraycopy(src, off, buf, length, len)
      length += len
    }
  }

  /** Decode a (possibly multi-frame) zstd input. Null on anything
    * malformed; content checksums verified when present. */
  def decode(b: Array[Byte]): Array[Byte] = {
    if (b == null || b.length < 4) return null
    val out = new java.io.ByteArrayOutputStream()
    var pos = 0
    var sawFrame = false
    try {
      while (pos < b.length) {
        if (pos + 4 > b.length) return null
        val magic = le4(b, pos)
        if ((magic & 0xFFFFFFF0L) == 0x184D2A50L) { // skippable
          if (pos + 8 > b.length) return null
          val sz = le4(b, pos + 4)
          if (pos + 8 + sz > b.length) return null
          pos += 8 + sz.toInt
        } else if (magic == 0xFD2FB528L) {
          pos = decodeFrame(b, pos + 4, out)
          if (pos < 0) return null
          sawFrame = true
        } else return null
      }
    } catch {
      case _: ArrayIndexOutOfBoundsException => return null
      case _: NegativeArraySizeException => return null
    }
    if (!sawFrame) return null
    out.toByteArray
  }

  /** Decode one frame starting AFTER its magic; returns the position
    * after the frame, or -1. */
  private def decodeFrame(b: Array[Byte], start: Int,
      out: java.io.ByteArrayOutputStream): Int = {
    var pos = start
    if (pos >= b.length) return -1
    val fhd = b(pos) & 0xFF
    pos += 1
    if ((fhd & 0x08) != 0) return -1 // reserved bit
    val fcsFlag = fhd >> 6
    val singleSeg = (fhd >> 5) & 1
    val checksumFlag = (fhd >> 2) & 1
    val dictFlag = fhd & 3
    if (singleSeg == 0) {
      if (pos >= b.length) return -1
      pos += 1 // window descriptor: bounded decode, not enforced
    }
    val dictBytes = dictFlag match {
      case 0 => 0
      case 1 => 1
      case 2 => 2
      case _ => 4
    }
    if (pos + dictBytes > b.length) return -1
    var dictId = 0L
    var i = 0
    while (i < dictBytes) {
      dictId |= (b(pos + i) & 0xFFL) << (8 * i)
      i += 1
    }
    if (dictId != 0) return -1 // no dictionary support (scope note)
    pos += dictBytes
    val fcsBytes = fcsFlag match {
      case 0 => if (singleSeg == 1) 1 else 0
      case 1 => 2
      case 2 => 4
      case _ => 8
    }
    if (pos + fcsBytes > b.length) return -1
    var fcs = -1L
    if (fcsBytes > 0) {
      fcs = 0L
      i = 0
      while (i < fcsBytes) {
        fcs |= (b(pos + i) & 0xFFL) << (8 * i)
        i += 1
      }
      if (fcsBytes == 2) fcs += 256
    }
    pos += fcsBytes
    if (fcs > MaxDecoded) return -1
    val ctx = new Ctx
    val history = new GrowBuf
    val frameStartLen = out.size()
    var last = false
    while (!last) {
      if (pos + 3 > b.length) return -1
      val hdr = (b(pos) & 0xFF) | ((b(pos + 1) & 0xFF) << 8) |
        ((b(pos + 2) & 0xFF) << 16)
      pos += 3
      last = (hdr & 1) == 1
      val btype = (hdr >> 1) & 3
      val bsize = hdr >> 3
      if (out.size() - frameStartLen + bsize > MaxDecoded) return -1
      btype match {
        case 0 => // raw
          if (pos + bsize > b.length) return -1
          history.append(b, pos, bsize)
          out.write(b, pos, bsize)
          pos += bsize
        case 1 => // RLE
          if (pos + 1 > b.length) return -1
          val v = b(pos)
          var k = 0
          while (k < bsize) { history.appendByte(v); out.write(v); k += 1 }
          pos += 1
        case 2 =>
          if (pos + bsize > b.length) return -1
          if (!decodeCompressedBlock(b, pos, pos + bsize, out, history,
            ctx)) return -1
          pos += bsize
        case _ => return -1 // reserved
      }
      if (out.size() - frameStartLen > MaxDecoded) return -1
    }
    val produced = out.size() - frameStartLen
    if (fcs >= 0 && produced != fcs) return -1
    if (checksumFlag == 1) {
      if (pos + 4 > b.length) return -1
      val stored = le4(b, pos)
      val outArr = out.toByteArray
      val h = xxh64(outArr, frameStartLen, produced, 0L)
      if ((h & 0xFFFFFFFFL) != stored) return -1
      pos += 4
    }
    pos
  }

  // ----------------------------------------------------------------
  // encoder (fixtures + HTTP wire): raw/RLE blocks — fully valid
  // frames (RFC 8878 block types 0/1) with a real XXH64 checksum; the
  // entropy-coded paths are exercised by CLI-reference vectors in
  // ZstdSpec, not by this writer.
  // ----------------------------------------------------------------

  def encodeRaw(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = {
      out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
      out.write(((v >> 16) & 0xFF).toInt)
      out.write(((v >> 24) & 0xFF).toInt)
    }
    w32(0xFD2FB528L)
    // FHD: FCS 4-byte (flag 2), no single-segment, checksum on
    out.write((2 << 6) | (1 << 2))
    out.write(0x58) // window descriptor: exp 11, mantissa 24 (any)
    w32(data.length.toLong & 0xFFFFFFFFL)
    val blockMax = 1 << 16
    var off = 0
    if (data.length == 0) out.write(Array[Byte](1, 0, 0), 0, 3)
    while (off < data.length) {
      val n = math.min(blockMax, data.length - off)
      val lastB = if (off + n >= data.length) 1 else 0
      val hdr = lastB | (0 << 1) | (n << 3)
      out.write(hdr & 0xFF); out.write((hdr >> 8) & 0xFF)
      out.write((hdr >> 16) & 0xFF)
      out.write(data, off, n)
      off += n
    }
    w32(xxh64(data, 0, data.length, 0L) & 0xFFFFFFFFL)
    out.toByteArray
  }

  /** Deterministic mixed raw/RLE fixture frame. Per seed s, block j of
    * nBlocks: even j raw (len 10 + (s + 7j) mod 50, byte k =
    * (s·11 + j·13 + k·5) mod 256), odd j RLE (byte (s·7 + 3j) mod 256
    * × (5 + (s + j) mod 90)). Checksummed. */
  def encodeFixture(seed: Long, nBlocks: Int): Array[Byte] = {
    val content = new java.io.ByteArrayOutputStream()
    val s = ((seed % 1000003) + 1000003) % 1000003
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = {
      out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
      out.write(((v >> 16) & 0xFF).toInt)
      out.write(((v >> 24) & 0xFF).toInt)
    }
    w32(0xFD2FB528L)
    out.write(1 << 2) // FHD: no FCS, windowDesc follows, checksum on
    out.write(0x58)
    var j = 0
    while (j < nBlocks) {
      val lastB = if (j == nBlocks - 1) 1 else 0
      if (j % 2 == 0) {
        val n = (10 + (s + 7L * j) % 50).toInt
        val hdr = lastB | (n << 3)
        out.write(hdr & 0xFF); out.write((hdr >> 8) & 0xFF)
        out.write((hdr >> 16) & 0xFF)
        var k = 0
        while (k < n) {
          val v = ((s * 11 + j * 13 + k * 5) % 256).toInt
          out.write(v); content.write(v)
          k += 1
        }
      } else {
        val n = (5 + (s + j) % 90).toInt
        val v = ((s * 7 + 3L * j) % 256).toInt
        val hdr = lastB | (1 << 1) | (n << 3)
        out.write(hdr & 0xFF); out.write((hdr >> 8) & 0xFF)
        out.write((hdr >> 16) & 0xFF)
        out.write(v)
        var k = 0
        while (k < n) { content.write(v); k += 1 }
      }
      j += 1
    }
    val c = content.toByteArray
    w32(xxh64(c, 0, c.length, 0L) & 0xFFFFFFFFL)
    out.toByteArray
  }
}
