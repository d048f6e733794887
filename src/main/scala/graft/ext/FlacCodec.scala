package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Pure-JVM FLAC decode — the lossless audio leg the triage census
  * already counts (`flac` rows previously bypassed PCM stats and the
  * spectral-fingerprint near-dup space entirely). FLAC is the
  * PNG-zlib class of audio: an MSB-first bit stream of Rice-coded
  * prediction residuals under exactly-specified integer predictors
  * (4 FIXED polynomial orders + quantized LPC), framed with CRC-8
  * headers and CRC-16 footers — a real decode with exact integer
  * output, no DSP approximation anywhere. Decoded PCM feeds the SAME
  * [[WavPcmStats]] stat/fingerprint space as WAV/G.711, so FLAC
  * near-dups land beside their WAV twins.
  *
  * Supported (the format's dominant slice): 8/12/16/20/24-bit, mono
  * and stereo in all four assignments (independent, left/side,
  * right/side, mid/side — side channels carry the spec's +1 bit),
  * CONSTANT / VERBATIM / FIXED 0–4 / LPC 1–32 subframes, both Rice
  * methods (4- and 5-bit parameters), partitioned residuals, escape
  * (raw-bits) partitions, and wasted-bits shifting. Frame CRCs are
  * VERIFIED — crawl-dirty bytes reject (null), never throw. The
  * STREAMINFO MD5 is not checked (it certifies the whole-file decode
  * the caller may not want; per-frame CRC-16 already gates every
  * sample we emit).
  *
  * Conformance: fixture-contract + our own encoder round-trip (the
  * Mp3Codec second-implementation bar — the JDK has no FLAC reader),
  * with FlacSpec cycling every subframe type, both Rice methods,
  * escape partitions and all four stereo assignments through the
  * round trip, and hand-pinning the Rice zigzag and the fixed
  * predictors on tiny hand-built frames. */
private[ext] object FlacKernel {

  private val MaxSamples = 1 << 24

  // ---------------- MSB-first bit reader ----------------
  private final class BitReader(b: Array[Byte], from: Int, until: Int) {
    var bitPos: Long = from.toLong * 8
    private val end = until.toLong * 8
    var bad = false
    def bytePos: Int = (bitPos >> 3).toInt
    def aligned: Boolean = (bitPos & 7) == 0
    def readBit(): Int = {
      if (bitPos >= end) { bad = true; return 0 }
      val v = (b((bitPos >> 3).toInt) >> (7 - (bitPos & 7)).toInt) & 1
      bitPos += 1
      v
    }
    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def readBitsLong(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    /** Signed n-bit two's complement. */
    def readSigned(n: Int): Int = {
      val v = readBits(n)
      if (n == 0) 0
      else if ((v & (1 << (n - 1))) != 0) v - (1 << n)
      else v
    }
    /** FLAC unary: count of 0 bits terminated by a 1. */
    def readUnary(maxCount: Int): Int = {
      var q = 0
      while (q <= maxCount) {
        if (readBit() == 1) return q
        if (bad) return -1
        q += 1
      }
      bad = true
      -1
    }
    def alignToByte(): Unit = while (!aligned && !bad) readBit()
  }

  // ---------------- CRCs (the spec polynomials) ----------------
  private[ext] def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= b(i) & 0xFF
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xFF
          else (crc << 1) & 0xFF
        k += 1
      }
      i += 1
    }
    crc
  }

  private[ext] def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xFF) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xFFFF
          else (crc << 1) & 0xFFFF
        k += 1
      }
      i += 1
    }
    crc
  }

  // ---------------- decode ----------------

  /** Decode a FLAC stream to interleaved PCM (the [[WavKernel.Pcm]]
    * shape WAV decode emits). Null on anything malformed — bad magic,
    * CRC mismatch, reserved codes, truncation. */
  def decodePcm(flac: Array[Byte]): WavKernel.Pcm = {
    if (flac == null || flac.length < 42) return null
    if (!(flac(0) == 'f' && flac(1) == 'L' && flac(2) == 'a' &&
      flac(3) == 'C')) return null
    // metadata walk: STREAMINFO must be first
    var pos = 4
    var last = false
    var sampleRate = 0
    var channels = 0
    var bps = 0
    var totalSamples = 0L
    var first = true
    while (!last) {
      if (pos + 4 > flac.length) return null
      val h = flac(pos) & 0xFF
      last = (h & 0x80) != 0
      val typ = h & 0x7F
      val len = ((flac(pos + 1) & 0xFF) << 16) |
        ((flac(pos + 2) & 0xFF) << 8) | (flac(pos + 3) & 0xFF)
      if (pos + 4 + len > flac.length) return null
      if (first) {
        if (typ != 0 || len != 34) return null // STREAMINFO first
        val d = pos + 4
        val br = new BitReader(flac, d, d + 34)
        br.readBits(16); br.readBits(16) // min/max block size
        br.readBits(24); br.readBits(24) // min/max frame size
        sampleRate = br.readBits(20)
        channels = br.readBits(3) + 1
        bps = br.readBits(5) + 1
        totalSamples = br.readBitsLong(36)
        if (sampleRate < 1 || bps < 4 || bps > 32) return null
        if (totalSamples > MaxSamples) return null
        first = false
      }
      pos += 4 + len
    }
    if (first) return null
    val samples = new java.util.ArrayList[Array[Int]]()
    var decoded = 0L
    while (decoded < totalSamples) {
      val fr = decodeFrame(flac, pos, sampleRate, channels, bps)
      if (fr == null) return null
      val (chans, nextPos) = fr
      val bs = chans(0).length
      val inter = new Array[Int](bs * chans.length)
      var i = 0
      while (i < bs) {
        var c = 0
        while (c < chans.length) {
          inter(i * chans.length + c) = chans(c)(i)
          c += 1
        }
        i += 1
      }
      samples.add(inter)
      decoded += bs
      pos = nextPos
      if (decoded > MaxSamples) return null
    }
    if (decoded != totalSamples) return null
    var total = 0
    val it = samples.iterator()
    while (it.hasNext) total += it.next().length
    val all = new Array[Int](total)
    var off = 0
    val it2 = samples.iterator()
    while (it2.hasNext) {
      val a = it2.next()
      System.arraycopy(a, 0, all, off, a.length)
      off += a.length
    }
    WavKernel.Pcm(channels, sampleRate, bps, all)
  }

  /** One frame: returns (per-channel sample arrays, next byte pos). */
  private def decodeFrame(b: Array[Byte], start: Int, siRate: Int,
      siChannels: Int, siBps: Int): (Array[Array[Int]], Int) = {
    val br = new BitReader(b, start, b.length)
    if (br.readBits(14) != 0x3FFE) return null
    br.readBit() // reserved
    br.readBit() // blocking strategy
    val bsCode = br.readBits(4)
    val srCode = br.readBits(4)
    val chanAsg = br.readBits(4)
    val ssCode = br.readBits(3)
    if (br.readBit() != 0) return null // reserved
    if (br.bad) return null
    // coded number (UTF-8-style, up to 7 bytes)
    val lead = br.readBits(8)
    if (br.bad) return null
    var extra = 0
    if ((lead & 0x80) != 0) {
      var m = lead
      while ((m & 0x80) != 0 && extra < 7) { extra += 1; m <<= 1 }
      extra -= 1
      if (extra < 1 || extra > 6) return null
      var i = 0
      while (i < extra) {
        if ((br.readBits(8) & 0xC0) != 0x80) return null
        i += 1
      }
    }
    val blockSize = bsCode match {
      case 0 => return null // reserved
      case 1 => 192
      case n if n >= 2 && n <= 5 => 576 << (n - 2)
      case 6 => br.readBits(8) + 1
      case 7 => br.readBits(16) + 1
      case n => 256 << (n - 8)
    }
    val rate = srCode match {
      case 0 => siRate
      case 1 => 88200; case 2 => 176400; case 3 => 192000
      case 4 => 8000; case 5 => 16000; case 6 => 22050; case 7 => 24000
      case 8 => 32000; case 9 => 44100; case 10 => 48000; case 11 => 96000
      case 12 => br.readBits(8) * 1000
      case 13 => br.readBits(16)
      case 14 => br.readBits(16) * 10
      case _ => return null
    }
    val nChan = if (chanAsg <= 7) chanAsg + 1
      else if (chanAsg <= 10) 2
      else return null
    if (nChan != siChannels) return null
    val bps = ssCode match {
      case 0 => siBps
      case 1 => 8; case 2 => 12
      case 4 => 16; case 5 => 20; case 6 => 24
      case _ => return null
    }
    if (blockSize < 1 || blockSize > 65536) return null
    if (br.bad || !br.aligned) return null
    // CRC-8 of the header bytes read so far
    val headerEnd = br.bytePos
    val expCrc8 = br.readBits(8)
    if (br.bad || crc8(b, start, headerEnd) != expCrc8) return null
    val _ = rate
    // subframes
    val chans = new Array[Array[Int]](nChan)
    var c = 0
    while (c < nChan) {
      val sideBit = chanAsg match {
        case 8 => if (c == 1) 1 else 0 // left/side
        case 9 => if (c == 0) 1 else 0 // right/side
        case 10 => if (c == 1) 1 else 0 // mid/side
        case _ => 0
      }
      val s = decodeSubframe(br, blockSize, bps + sideBit)
      if (s == null) return null
      chans(c) = s
      c += 1
    }
    if (br.bad) return null
    br.alignToByte()
    val footStart = br.bytePos
    val expCrc16 = br.readBits(16)
    if (br.bad || crc16(b, start, footStart) != expCrc16) return null
    // stereo decorrelation
    chanAsg match {
      case 8 => // left/side: right = left - side
        var i = 0
        while (i < blockSize) {
          chans(1)(i) = chans(0)(i) - chans(1)(i); i += 1 }
      case 9 => // right/side: left = right + side (channel 0 held side)
        var i = 0
        while (i < blockSize) {
          chans(0)(i) = chans(1)(i) + chans(0)(i); i += 1 }
      case 10 => // mid/side
        var i = 0
        while (i < blockSize) {
          val side = chans(1)(i)
          val mid2 = (chans(0)(i) << 1) | (side & 1)
          chans(0)(i) = (mid2 + side) >> 1
          chans(1)(i) = (mid2 - side) >> 1
          i += 1
        }
      case _ => ()
    }
    (chans, br.bytePos)
  }

  private def decodeSubframe(br: BitReader, n: Int, bps: Int): Array[Int] = {
    if (br.readBit() != 0) return null // reserved padding bit
    val typ = br.readBits(6)
    var wasted = 0
    if (br.readBit() == 1) {
      wasted = br.readUnary(64) + 1
      if (br.bad) return null
    }
    val eff = bps - wasted
    if (eff < 1 || eff > 32) return null
    val out: Array[Int] =
      if (typ == 0) { // CONSTANT
        val v = br.readSigned(eff)
        if (br.bad) return null
        Array.fill(n)(v)
      } else if (typ == 1) { // VERBATIM
        val a = new Array[Int](n)
        var i = 0
        while (i < n) { a(i) = br.readSigned(eff); i += 1 }
        if (br.bad) return null
        a
      } else if ((typ & 0x38) == 0x08 && (typ & 0x07) <= 4) { // FIXED
        val order = typ & 0x07
        // mirror the LPC guard: a crafted frame with blockSize < order
        // (e.g. bsCode 6 / blockSize 1, FIXED order 2) would write
        // warmup samples past the n-length array
        if (order > n) return null
        val a = new Array[Int](n)
        var i = 0
        while (i < order) { a(i) = br.readSigned(eff); i += 1 }
        if (!readResidual(br, a, n, order)) return null
        i = order
        while (i < n) {
          val p = order match {
            case 0 => 0
            case 1 => a(i - 1)
            case 2 => 2 * a(i - 1) - a(i - 2)
            case 3 => 3 * a(i - 1) - 3 * a(i - 2) + a(i - 3)
            case _ => 4 * a(i - 1) - 6 * a(i - 2) + 4 * a(i - 3) - a(i - 4)
          }
          a(i) += p
          i += 1
        }
        a
      } else if ((typ & 0x20) != 0) { // LPC, order = low 5 bits + 1
        val order = (typ & 0x1F) + 1
        if (order > n) return null
        val a = new Array[Int](n)
        var i = 0
        while (i < order) { a(i) = br.readSigned(eff); i += 1 }
        val precM1 = br.readBits(4)
        if (precM1 == 15 || br.bad) return null
        val precision = precM1 + 1
        val shift = br.readSigned(5)
        if (shift < 0) return null
        val coef = new Array[Int](order)
        i = 0
        while (i < order) { coef(i) = br.readSigned(precision); i += 1 }
        if (!readResidual(br, a, n, order)) return null
        i = order
        while (i < n) {
          var acc = 0L
          var j = 0
          while (j < order) { acc += coef(j).toLong * a(i - 1 - j); j += 1 }
          a(i) += (acc >> shift).toInt
          i += 1
        }
        a
      } else return null // reserved subframe types
    if (br.bad) return null
    if (wasted > 0) {
      var i = 0
      while (i < n) { out(i) = out(i) << wasted; i += 1 }
    }
    out
  }

  /** Residual into a(order until n); true on success. */
  private def readResidual(br: BitReader, a: Array[Int], n: Int,
      order: Int): Boolean = {
    val method = br.readBits(2)
    if (method > 1 || br.bad) return false
    val pBits = if (method == 0) 4 else 5
    val escape = if (method == 0) 0xF else 0x1F
    val partOrder = br.readBits(4)
    val parts = 1 << partOrder
    if (n % parts != 0) return false
    val perPart = n / parts
    var idx = order
    var p = 0
    while (p < parts) {
      val count = if (p == 0) perPart - order else perPart
      if (count < 0) return false
      val param = br.readBits(pBits)
      if (br.bad) return false
      if (param == escape) {
        val raw = br.readBits(5)
        var i = 0
        while (i < count) {
          a(idx) = if (raw == 0) 0 else br.readSigned(raw)
          idx += 1; i += 1
        }
      } else {
        var i = 0
        while (i < count) {
          val q = br.readUnary(1 << 20)
          if (br.bad) return false
          val u = (q.toLong << param) | br.readBits(param).toLong
          // zigzag unfold
          a(idx) = (((u >>> 1) ^ -(u & 1L))).toInt
          idx += 1; i += 1
        }
      }
      p += 1
    }
    !br.bad
  }

  // ---------------- encode (fixture-grade, real CRCs) ----------------
  private[ext] final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var nBits = 0
    def writeBits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1L).toInt
        nBits += 1
        if (nBits == 8) { out.write(acc); acc = 0; nBits = 0 }
        i -= 1
      }
    }
    def writeUnary(q: Int): Unit = { // q zeros then a 1
      var i = 0
      while (i < q) { writeBits(0, 1); i += 1 }
      writeBits(1, 1)
    }
    def alignZero(): Unit = if (nBits > 0) writeBits(0, 8 - nBits)
    def toBytes: Array[Byte] = { require(nBits == 0); out.toByteArray }
    /** Snapshot of the bytes emitted so far; caller must be at a byte
      * boundary (the frame header is, by construction, at CRC time). */
    def snapshot: Array[Byte] = { require(nBits == 0); out.toByteArray }
  }

  private def zigzag(v: Int): Long = ((v.toLong << 1) ^ (v.toLong >> 63))

  private def writeRice(bw: BitWriter, vals: Seq[Int], param: Int): Unit =
    for (v <- vals) {
      val u = zigzag(v)
      bw.writeUnary((u >>> param).toInt)
      if (param > 0) bw.writeBits(u & ((1L << param) - 1), param)
    }

  /** A reasonable Rice parameter for the residual set (any valid value
    * decodes; this just bounds the unary runs). */
  private def riceParam(vals: Seq[Int]): Int = {
    var sum = 0L
    for (v <- vals) sum += math.abs(v.toLong)
    val mean = if (vals.isEmpty) 0L else sum / math.max(1, vals.length)
    var p = 0
    while ((1L << p) < mean + 1 && p < 14) p += 1
    p
  }

  /** Encode mono 16-bit FLAC. Frame f's subframe type cycles:
    * f%4 == 0 VERBATIM, 1 FIXED order 1 (Rice), 2 FIXED order 2
    * (partition order 1, Rice2 method), 3 LPC order 2 with an ESCAPED
    * raw partition — every decode path is load-bearing in any
    * multi-frame fixture. Real CRC-8/CRC-16. */
  def encodeMono16(nSamples: Int, sampleRate: Int,
      sample: Int => Int): Array[Byte] = {
    require(nSamples >= 0 && nSamples <= MaxSamples, s"bad n $nSamples")
    require(sampleRate >= 1 && sampleRate < (1 << 20), s"bad sr $sampleRate")
    val block = 256
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes, 0, 4)
    // STREAMINFO (last metadata block)
    val si = new BitWriter()
    si.writeBits(block, 16); si.writeBits(block, 16)
    si.writeBits(0, 24); si.writeBits(0, 24)
    si.writeBits(sampleRate, 20)
    si.writeBits(0, 3) // channels - 1
    si.writeBits(15, 5) // bps - 1 = 15
    si.writeBits(nSamples.toLong, 36)
    for (_ <- 0 until 16) si.writeBits(0, 8) // md5: unset (all zero)
    val sib = si.toBytes
    out.write(0x80); out.write(0); out.write(0); out.write(sib.length)
    out.write(sib, 0, sib.length)
    var done = 0
    var frame = 0
    while (done < nSamples) {
      val bs = math.min(block, nSamples - done)
      val s = Array.tabulate(bs)(i => {
        val v = sample(done + i)
        require(v >= -32768 && v <= 32767, s"sample out of 16-bit: $v")
        v
      })
      val bw = new BitWriter()
      bw.writeBits(0x3FFE, 14)
      bw.writeBits(0, 1); bw.writeBits(0, 1)
      bw.writeBits(7, 4) // blocksize: explicit 16-bit
      bw.writeBits(0, 4) // sample rate: from STREAMINFO
      bw.writeBits(0, 4) // channels: mono
      bw.writeBits(4, 3) // sample size: 16
      bw.writeBits(0, 1)
      // UTF-8 frame number (supports the full multi-byte ladder)
      val fn = frame
      if (fn < 0x80) bw.writeBits(fn, 8)
      else if (fn < 0x800) {
        bw.writeBits(0xC0 | (fn >> 6), 8)
        bw.writeBits(0x80 | (fn & 0x3F), 8)
      } else {
        bw.writeBits(0xE0 | (fn >> 12), 8)
        bw.writeBits(0x80 | ((fn >> 6) & 0x3F), 8)
        bw.writeBits(0x80 | (fn & 0x3F), 8)
      }
      bw.writeBits(bs - 1, 16)
      val headBytes = bw.snapshot
      bw.writeBits(crc8(headBytes, 0, headBytes.length), 8)
      // subframe
      (frame % 4) match {
        case 0 => // VERBATIM
          bw.writeBits(0, 1); bw.writeBits(1, 6); bw.writeBits(0, 1)
          for (v <- s) bw.writeBits(v.toLong & 0xFFFF, 16)
        case 1 => // FIXED order 1, single Rice partition
          bw.writeBits(0, 1); bw.writeBits(8 | 1, 6); bw.writeBits(0, 1)
          bw.writeBits(s(0).toLong & 0xFFFF, 16)
          val res = (1 until bs).map(i => s(i) - s(i - 1))
          val p = riceParam(res)
          bw.writeBits(0, 2); bw.writeBits(0, 4) // method 0, 1 partition
          bw.writeBits(p, 4)
          writeRice(bw, res, p)
        case 2 => // FIXED order 2, partition order 1, Rice2 method
          bw.writeBits(0, 1); bw.writeBits(8 | 2, 6); bw.writeBits(0, 1)
          bw.writeBits(s(0).toLong & 0xFFFF, 16)
          bw.writeBits(s(1).toLong & 0xFFFF, 16)
          val res = (2 until bs).map(i => s(i) - 2 * s(i - 1) + s(i - 2))
          if (bs % 2 == 0 && bs / 2 > 2) {
            bw.writeBits(1, 2); bw.writeBits(1, 4) // method 1, 2 parts
            val (r1, r2) = res.splitAt(bs / 2 - 2)
            for (part <- Seq(r1, r2)) {
              val p = riceParam(part)
              bw.writeBits(p, 5)
              writeRice(bw, part, p)
            }
          } else {
            bw.writeBits(1, 2); bw.writeBits(0, 4)
            val p = riceParam(res)
            bw.writeBits(p, 5)
            writeRice(bw, res, p)
          }
        case _ => // LPC order 2 (coefs 2,-1 shift 0 == FIXED 2), ESCAPED
          bw.writeBits(0, 1); bw.writeBits(0x20 | 1, 6); bw.writeBits(0, 1)
          bw.writeBits(s(0).toLong & 0xFFFF, 16)
          bw.writeBits(s(1).toLong & 0xFFFF, 16)
          bw.writeBits(4, 4) // precision - 1 = 4 -> 5-bit coefs
          bw.writeBits(0, 5) // shift 0
          bw.writeBits(2L & 0x1F, 5) // coef[0] = 2
          bw.writeBits((-1L) & 0x1F, 5) // coef[1] = -1
          val res = (2 until bs).map(i => s(i) - (2 * s(i - 1) - s(i - 2)))
          bw.writeBits(0, 2); bw.writeBits(0, 4)
          bw.writeBits(0xF, 4) // escape
          bw.writeBits(18, 5) // raw 18-bit residuals (|res| < 2^17)
          for (v <- res) bw.writeBits(v.toLong & 0x3FFFF, 18)
      }
      bw.alignZero()
      val body = bw.toBytes
      val full = new Array[Byte](body.length + 2)
      System.arraycopy(body, 0, full, 0, body.length)
      val c16 = crc16(body, 0, body.length)
      full(body.length) = ((c16 >> 8) & 0xFF).toByte
      full(body.length + 1) = (c16 & 0xFF).toByte
      out.write(full, 0, full.length)
      done += bs
      frame += 1
    }
    out.toByteArray
  }

  // LPC frame's order is (typ & 0x1F) + 1: 0x20|1 encodes ORDER 2
  // (the +1 convention) — the coefficients above are order-2.

  /** Stereo 16-bit encode used by the spec to exercise the four channel
    * assignments: frame f uses assignment cycle(f) ∈ {independent,
    * left/side, right/side, mid/side}, VERBATIM subframes throughout
    * (the decorrelation itself is the unit under test). */
  private[ext] def encodeStereo16(nSamples: Int, sampleRate: Int,
      left: Int => Int, right: Int => Int): Array[Byte] = {
    require(nSamples >= 0 && nSamples <= MaxSamples)
    val block = 64
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes, 0, 4)
    val si = new BitWriter()
    si.writeBits(block, 16); si.writeBits(block, 16)
    si.writeBits(0, 24); si.writeBits(0, 24)
    si.writeBits(sampleRate, 20)
    si.writeBits(1, 3) // 2 channels
    si.writeBits(15, 5)
    si.writeBits(nSamples.toLong, 36)
    for (_ <- 0 until 16) si.writeBits(0, 8)
    val sib = si.toBytes
    out.write(0x80); out.write(0); out.write(0); out.write(sib.length)
    out.write(sib, 0, sib.length)
    var done = 0
    var frame = 0
    while (done < nSamples) {
      val bs = math.min(block, nSamples - done)
      val l = Array.tabulate(bs)(i => left(done + i))
      val r = Array.tabulate(bs)(i => right(done + i))
      val asg = frame % 4 match {
        case 0 => 1 // independent stereo
        case 1 => 8; case 2 => 9; case _ => 10
      }
      val (c0, c1, bits1) = asg match {
        case 1 => (l, r, 16)
        case 8 => (l, Array.tabulate(bs)(i => l(i) - r(i)), 17)
        case 9 => (Array.tabulate(bs)(i => l(i) - r(i)), r, 17)
        case _ => (Array.tabulate(bs)(i => (l(i) + r(i)) >> 1),
          Array.tabulate(bs)(i => l(i) - r(i)), 17)
      }
      val bits0 = if (asg == 9) 17 else 16
      val (w0, w1) = if (asg == 9) (bits0, 16) else (16, bits1)
      val bw = new BitWriter()
      bw.writeBits(0x3FFE, 14)
      bw.writeBits(0, 1); bw.writeBits(0, 1)
      bw.writeBits(7, 4); bw.writeBits(0, 4)
      bw.writeBits(asg, 4)
      bw.writeBits(4, 3); bw.writeBits(0, 1)
      bw.writeBits(frame, 8) // frames < 128 in spec fixtures
      bw.writeBits(bs - 1, 16)
      val headBytes = bw.snapshot
      bw.writeBits(crc8(headBytes, 0, headBytes.length), 8)
      for ((ch, w) <- Seq((c0, w0), (c1, w1))) {
        bw.writeBits(0, 1); bw.writeBits(1, 6); bw.writeBits(0, 1)
        for (v <- ch) bw.writeBits(v.toLong & ((1L << w) - 1), w)
      }
      bw.alignZero()
      val body = bw.toBytes
      val c16 = crc16(body, 0, body.length)
      out.write(body, 0, body.length)
      out.write((c16 >> 8) & 0xFF); out.write(c16 & 0xFF)
      done += bs
      frame += 1
    }
    out.toByteArray
  }

}

/** [[WavPcmStats]]-shaped audio statistics for FLAC content — same
  * 9-field struct, same energy-contour fingerprint space as WAV, so a
  * FLAC re-encode of a WAV clip lands on identical loudness integers
  * and fingerprint. Dirty bytes / CRC mismatches degrade to ok=false. */
case class FlacPcmStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("ok", BooleanType, nullable = false),
    StructField("channels", LongType),
    StructField("sample_rate", LongType),
    StructField("n_samples", LongType),
    StructField("sum_abs", LongType),
    StructField("peak_abs", LongType),
    StructField("zero_cross", LongType),
    StructField("fp_hi", LongType),
    StructField("fp_lo", LongType)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"flac_pcm_stats requires binary, got $other")
  }

  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val bytes = child.eval(input) match {
      case null => null
      case b => b.asInstanceOf[Array[Byte]]
    }
    WavPcmStats.statsRow(FlacKernel.decodePcm(bytes))
  }

  override protected def withNewChildInternal(
      newChild: Expression): FlacPcmStats = copy(child = newChild)

  override def prettyName: String = "flac_pcm_stats"
}

object FlacPcmStats {
  def apply(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      FlacPcmStats(org.apache.spark.sql.graftbridge.Bridge.expression(c)))
}

/** Deterministic mono 16-bit FLAC fixture with the SAME sample formula
  * as [[PcmWavEncode]] (the testdata ramp: ((seed·7919 + i·31 +
  * i² mod 101) mod 4001, mod-positive) − 2000), so the WAV oracle
  * chain replays the FLAC decode verbatim. Frame subframe types cycle
  * VERBATIM / FIXED-1 / FIXED-2(Rice2, 2 partitions) / LPC-2(escape),
  * making every residual path load-bearing in any ≥4-frame clip. */
case class FlacEncode(seed: Expression, nSamples: Expression,
    sampleRate: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(seed, nSamples, sampleRate)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c => c.dataType == LongType ||
      c.dataType == IntegerType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "flac_encode requires integer children")

  private def longOf(e: Expression, input: InternalRow): java.lang.Long =
    e.eval(input) match {
      case null => null
      case i: java.lang.Integer => i.longValue()
      case l: java.lang.Long => l
    }

  override def eval(input: InternalRow): Any = {
    val s = longOf(seed, input); val n = longOf(nSamples, input)
    val sr = longOf(sampleRate, input)
    if (s == null || n == null || sr == null) return null
    if (n < 0 || n > (1L << 22) || sr <= 0 || sr >= (1L << 20)) return null
    val sv = s.longValue()
    FlacKernel.encodeMono16(n.intValue(), sr.intValue(),
      i => (((sv * 7919 + i.toLong * 31 + (i.toLong * i % 101)) % 4001).toInt
        + 4001) % 4001 - 2000)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FlacEncode =
    FlacEncode(newChildren(0), newChildren(1), newChildren(2))

  override def prettyName: String = "flac_encode"
}

object FlacEncode {
  def apply(seed: Column, nSamples: Column, sampleRate: Column): Column = {
    val b = org.apache.spark.sql.graftbridge.Bridge
    b.column(FlacEncode(b.expression(seed), b.expression(nSamples),
      b.expression(sampleRate)))
  }
}
