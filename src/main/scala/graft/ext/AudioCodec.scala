package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Pure-JVM PCM WAV sample codec — the audio CONTENT leg (the container
  * walk lives in [[Multimodal.decodeWavMeta]]). 16-bit PCM needs no
  * codec library at all: samples are little-endian int16s in the `data`
  * chunk. Decoding them yields the content signals a curation pipeline
  * screens on — exact integer loudness (Σ|s|), peak, zero-crossing rate
  * (the classic voiced/unvoiced + silence discriminator), and a 62-bit
  * energy-contour fingerprint (sign of the windowed-energy delta — the
  * shape of Haitsma-Kalker audio fingerprinting, over one band) for
  * near-dup detection via [[Hamming64]]. All integers, so a SQL
  * comprehension replays every field. One CodegenFallback expression,
  * one pass per row, zero shuffle. */
private[ext] object WavKernel {

  /** Decoded mono-PCM view: sample values as Ints. */
  final case class Pcm(channels: Int, sampleRate: Int, bitsPerSample: Int,
      samples: Array[Int])

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def le2(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le4(b: Array[Byte], i: Int): Long =
    (le2(b, i).toLong | (le2(b, i + 2).toLong << 16)) & 0xFFFFFFFFL

  /** ITU-T G.711 μ-law expansion, exact integer form (the public-domain
    * Sun g711.c contract): complement, mantissa·8 + bias 0x84, shift by
    * the segment, un-bias with the sign. Replayable in SQL as
    * `u = 255 - u0; t = ((u%16)·8 + 132) · 2^((u//16)%8);
    *  s = u ≥ 128 ? 132 − t : t − 132`. */
  def ulawExpand(u0: Int): Int = {
    val u = (~u0) & 0xFF
    val t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** ITU-T G.711 A-law expansion, exact integer form: xor 0x55, then
    * segment 0 → m·16+8, segment 1 → m·16+264, segment k≥2 →
    * (m·16+264)·2^(k−1); bit 7 SET means nonnegative (A-law's sign
    * convention is inverted vs μ-law). */
  def alawExpand(a0: Int): Int = {
    val a = a0 ^ 0x55
    val seg = (a & 0x70) >> 4
    var t = (a & 0x0F) << 4
    if (seg == 0) t += 8
    else if (seg == 1) t += 0x108
    else t = (t + 0x108) << (seg - 1)
    if ((a & 0x80) != 0) t else -t
  }

  /** Decode a WAV's samples: linear PCM (format tag 1, 16-bit) or the
    * G.711 telephony codings (tag 6 A-law / tag 7 μ-law, 8-bit —
    * expanded to 16-bit linear by the exact integer formulas above, so
    * call-center corpora ride the same stats/fingerprint machinery).
    * Null on anything else malformed: bad RIFF/WAVE magic, other format
    * tags, mismatched bits-per-sample, truncated chunks. Multi-channel
    * input is reduced to mono by the exact per-frame integer mean
    * (floor toward negative infinity — `Math.floorDiv` — so the
    * arithmetic is sign-stable and replayable). */
  def decodePcm(wav: Array[Byte]): Pcm = {
    if (wav == null || wav.length < 12) return null
    if (!(wav(0) == 'R' && wav(1) == 'I' && wav(2) == 'F' && wav(3) == 'F' &&
      wav(8) == 'W' && wav(9) == 'A' && wav(10) == 'V' && wav(11) == 'E'))
      return null
    var pos = 12
    var fmtTag = -1
    var channels = -1; var sampleRate = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    while (pos + 8 <= wav.length && (channels < 0 || dataOff < 0)) {
      val id = new String(wav, pos, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val len = le4(wav, pos + 4)
      if (len < 0 || pos + 8 + len > wav.length) return null
      id match {
        case "fmt " =>
          if (len < 16) return null
          fmtTag = le2(wav, pos + 8)
          channels = le2(wav, pos + 10)
          sampleRate = le4(wav, pos + 12).toInt
          bits = le2(wav, pos + 22)
        case "data" =>
          dataOff = pos + 8; dataLen = len.toInt
        case _ => ()
      }
      pos += 8 + len.toInt + (len.toInt & 1) // chunks are word-aligned
    }
    if (channels < 1 || dataOff < 0) return null
    val bytesPerSample = fmtTag match {
      case 1 if bits == 16 => 2
      case 6 | 7 if bits == 8 => 1 // G.711 A-law / mu-law
      case _ => return null
    }
    val frameBytes = channels * bytesPerSample
    val nFrames = dataLen / frameBytes
    val samples = new Array[Int](nFrames)
    var f = 0
    while (f < nFrames) {
      var acc = 0L; var c = 0
      while (c < channels) {
        val off = dataOff + f * frameBytes + c * bytesPerSample
        acc += (fmtTag match {
          case 1 =>
            val v = le2(wav, off)
            if (v >= 0x8000) v - 0x10000 else v // sign-extend int16
          case 6 => alawExpand(u8(wav, off))
          case _ => ulawExpand(u8(wav, off))
        })
        c += 1
      }
      samples(f) = Math.floorDiv(acc, channels).toInt
      f += 1
    }
    Pcm(channels, sampleRate, bits, samples)
  }

  /** 62-bit energy-contour fingerprint: 64 windows with the standard
    * integer boundaries floor(k·n/64), e_k = Σ|s| in window k, bit k
    * (k = 1..62) set iff e_k > e_{k−1}. Needs n ≥ 64 (else
    * Long.MinValue sentinel → callers emit null). Bits 0 and 63 are
    * RESERVED (never set): bit 63 is the sign bit, and a fingerprint
    * with only bit 63 set would BE Long.MinValue — reserving it keeps
    * the value nonnegative and the sentinel unreachable by any valid
    * clip.
    *
    * Discrimination caveat (measured): contour signs are COARSE —
    * clips with correlated loudness envelopes collide at small Hamming
    * even when their samples differ everywhere (the synthetic corpus
    * measures cross-seed minima as low as 1). Use it for CANDIDATE
    * generation ([[Hamming64]]) ahead of an exact check on
    * (n_samples, sum_abs, peak_abs, zero_cross), never as an identity
    * by itself — unlike [[PngKernel.ahash]], whose 2-D cell grid is
    * empirically far better separated (cross-class minima ~16). */
  def energyFingerprint(samples: Array[Int]): Long = {
    val n = samples.length
    if (n < 64) return Long.MinValue
    val e = new Array[Long](64)
    var k = 0
    while (k < 64) {
      val i0 = (k.toLong * n / 64).toInt
      val i1 = ((k + 1).toLong * n / 64).toInt
      var s = 0L; var i = i0
      while (i < i1) { s += math.abs(samples(i).toLong); i += 1 }
      e(k) = s
      k += 1
    }
    var fp = 0L; k = 1
    while (k < 63) { if (e(k) > e(k - 1)) fp |= (1L << k); k += 1 }
    fp
  }

  /** Square-wave filterbank periods (samples) of the SPECTRAL
    * fingerprint — the frequency axis [[spectralFingerprint]] bins
    * energy into. Even by construction (half-period sign flips), and
    * chosen so NO period is an odd-integer multiple of another: a
    * period-p square wave carries energy only at periods p/(2j+1), so
    * odd-ratio pairs (6 = 3·2, 12 = 3·4, 24 = 3·8 in the naive
    * doubling ladder) bleed into each other and freeze threshold
    * cells regardless of the signal (measured: 8 near-deterministic
    * cells with the harmonic ladder, 0 with this set). */
  val BandPeriods: Array[Int] = Array(4, 6, 10, 14, 16, 22, 26, 32)

  /** 63-bit SPECTRAL fingerprint — the class-discriminating audio hash
    * the energy contour above is not (its measured cross-seed minima
    * reach 1; see the caveat on [[energyFingerprint]]). 8 time windows
    * (boundaries floor(k·n/8), as the contour) × 8 square-wave bands
    * ([[BandPeriods]]): band energy E(k,b) = max over the two
    * quadrature phases (offset P/4 — a square correlated at worst
    * phase still keeps ≥ half amplitude) of |Σ s·σ|, σ = ±1 with
    * period P_b over the WINDOW-LOCAL sample index. Cell k·8+b
    * (cells 0..62; cell 63 is the sign bit, RESERVED like
    * [[PngKernel.ahash]]'s) is set iff 8·E(k,b) > Σ_b' E(k,b') —
    * strictly above the window's band mean, so the bits are invariant
    * to amplitude scaling (a re-encoded louder copy collides) and
    * every operand is an exact int64 any engine replays. Needs
    * n ≥ 256 (32-sample windows hold the longest band's full cycle);
    * shorter clips return the Long.MinValue sentinel → callers emit
    * null. Candidate generation composes with [[Hamming64]] exactly
    * as the image hashes do. */
  def spectralFingerprint(samples: Array[Int]): Long = {
    val n = samples.length
    if (n < 256) return Long.MinValue
    var fp = 0L
    var k = 0
    while (k < 8) {
      val i0 = (k.toLong * n / 8).toInt
      val i1 = ((k + 1).toLong * n / 8).toInt
      val e = new Array[Long](8)
      var tot = 0L
      var b = 0
      while (b < 8) {
        val p = BandPeriods(b)
        val h = p / 2
        val q = p / 4
        var c0 = 0L
        var c1 = 0L
        var j = 0
        while (j < i1 - i0) {
          val v = samples(i0 + j).toLong
          c0 += (if (j % p < h) v else -v)
          c1 += (if ((j + q) % p < h) v else -v)
          j += 1
        }
        e(b) = math.max(math.abs(c0), math.abs(c1))
        tot += e(b)
        b += 1
      }
      b = 0
      while (b < 8) {
        val cell = k * 8 + b
        if (cell < 63 && e(b) * 8 > tot) fp |= 1L << cell
        b += 1
      }
      k += 1
    }
    fp
  }

  /** Sample contract of the BAND-PROFILE fixture ([[ToneWavEncode]]):
    * eight simultaneous square waves (one per [[BandPeriods]] band),
    * each with a pseudo-random per-(class, band, window) amplitude
    *   t = (cls mod 100003)·181 + b·292 + k·61 + 7,  u = t mod 8191
    *   A = 100 + ((u·u mod 8191)·u) mod 997
    * (k = (i·8)/n, the window of sample i — aligned with the
    * fingerprint's windows whenever 8 | n), plus the ±20 noise term
    *   ((i·31 + (bump mod 1000003)·97 + (i·i mod 101)) mod 41) − 20.
    * Two measured traps shaped this formula (the FIXTURES.md
    * discipline — measure before writing a class oracle):
    *  - the CUBIC mixer folds cls·b and cls·k cross terms into every
    *    amplitude nonlinearly. A linear-in-cls profile shifts all
    *    bands by the same constant, which the mean-threshold
    *    fingerprint is INVARIANT to (the affine-texture trap: 200
    *    classes collapsed to 70 fingerprints); a plain quadratic
    *    leaves class DIFFERENCES linear in t, so nearby classes share
    *    structure (cross-class minima stuck at 1–2). The staged cubic
    *    measures dup200/scale400 cross-class minima of 6 — outside
    *    the radius-4 ball — with within-class maxima of 2.
    *  - the square waves run in WINDOW-LOCAL phase (j = i − k·n/8, the
    *    same local index the fingerprint correlates with) — global
    *    phase left the non-power-of-2 bands with a FIXED per-window
    *    attenuation pattern that dominated the threshold bits (15 of
    *    63 cells were near-deterministic across classes).
    * All operands stay far inside int64 — one comprehension replays
    * s(i) in SQL. |s| ≤ 8788, well inside int16. */
  def toneSample(cls: Long, bump: Long, n: Int, i: Int): Int = {
    val clsM = Math.floorMod(cls, 100003L)
    val k = i.toLong * 8 / n
    val j = i - (k * n / 8) // window-local sample index
    var s = 0L
    var b = 0
    while (b < 8) {
      val t = clsM * 181L + b * 292L + k * 61L + 7L
      val u = t % 8191L
      val a = 100L + (u * u % 8191L) * u % 997L
      val p = BandPeriods(b)
      s += (if (j % p < p / 2) a else -a)
      b += 1
    }
    val noise = Math.floorMod(
      i.toLong * 31 + Math.floorMod(bump, 1000003L) * 97 +
        (i.toLong * i % 101), 41L) - 20L
    (s + noise).toInt
  }

  /** Encode a minimal mono 16-bit PCM WAV from a sample function. */
  def encodePcm16Mono(nSamples: Int, sampleRate: Int,
      sample: Int => Int): Array[Byte] = {
    require(nSamples >= 0 && sampleRate > 0, s"bad $nSamples @$sampleRate")
    val dataLen = nSamples * 2
    val out = new Array[Byte](44 + dataLen)
    def ascii(o: Int, s: String): Unit = {
      var i = 0; while (i < s.length) { out(o + i) = s.charAt(i).toByte; i += 1 }
    }
    def w2(o: Int, v: Int): Unit = {
      out(o) = (v & 0xFF).toByte; out(o + 1) = ((v >> 8) & 0xFF).toByte
    }
    def w4(o: Int, v: Long): Unit = { w2(o, (v & 0xFFFF).toInt); w2(o + 2, ((v >> 16) & 0xFFFF).toInt) }
    ascii(0, "RIFF"); w4(4, 36L + dataLen); ascii(8, "WAVE")
    ascii(12, "fmt "); w4(16, 16L); w2(20, 1); w2(22, 1)
    w4(24, sampleRate.toLong); w4(28, sampleRate.toLong * 2)
    w2(32, 2); w2(34, 16)
    ascii(36, "data"); w4(40, dataLen.toLong)
    var i = 0
    while (i < nSamples) {
      w2(44 + i * 2, sample(i) & 0xFFFF)
      i += 1
    }
    out
  }

  /** Encode a REAL G.711 WAV: mono 8-bit, format tag 6 (A-law) or 7
    * (μ-law), byte j of the payload supplied by `byteAt` — the
    * telephony twin of [[encodePcm16Mono]] (same RIFF layout, 1-byte
    * frames, byteRate == sampleRate). */
  def encodeG711Mono(nSamples: Int, sampleRate: Int, law: Int,
      byteAt: Int => Int): Array[Byte] = {
    require(nSamples >= 0 && sampleRate > 0 && (law == 6 || law == 7),
      s"bad $nSamples @$sampleRate law=$law")
    val out = new Array[Byte](44 + nSamples)
    def ascii(o: Int, s: String): Unit = {
      var i = 0; while (i < s.length) { out(o + i) = s.charAt(i).toByte; i += 1 }
    }
    def w2(o: Int, v: Int): Unit = {
      out(o) = (v & 0xFF).toByte; out(o + 1) = ((v >> 8) & 0xFF).toByte
    }
    def w4(o: Int, v: Long): Unit = {
      w2(o, (v & 0xFFFF).toInt); w2(o + 2, ((v >> 16) & 0xFFFF).toInt)
    }
    ascii(0, "RIFF"); w4(4, 36L + nSamples); ascii(8, "WAVE")
    ascii(12, "fmt "); w4(16, 16L); w2(20, law); w2(22, 1)
    w4(24, sampleRate.toLong); w4(28, sampleRate.toLong)
    w2(32, 1); w2(34, 8)
    ascii(36, "data"); w4(40, nSamples.toLong)
    var i = 0
    while (i < nSamples) { out(44 + i) = (byteAt(i) & 0xFF).toByte; i += 1 }
    out
  }
}

/** Content statistics from a PCM-WAV binary column: ok flag, layout,
  * exact loudness/peak/zero-crossing integers, and the energy-contour
  * fingerprint split into nonneg hi/lo 32-bit-half longs (null when the
  * clip is shorter than 64 samples). Undecodable → ok=false, nulls,
  * never a throw. */
case class WavPcmStats(child: Expression)
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
      s"wav_pcm_stats requires binary, got $other")
  }

  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val bytes = child.eval(input) match {
      case null => null
      case b => b.asInstanceOf[Array[Byte]]
    }
    WavPcmStats.statsRow(WavKernel.decodePcm(bytes))
  }

  override protected def withNewChildInternal(newChild: Expression): WavPcmStats =
    copy(child = newChild)

  override def prettyName: String = "wav_pcm_stats"
}

object WavPcmStats {
  def apply(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      WavPcmStats(org.apache.spark.sql.graftbridge.Bridge.expression(c)))

  /** The shared (ok, layout, loudness, fingerprint halves) row from a
    * decoded PCM clip — one implementation for every audio container
    * (WAV, G.711-in-WAV, FLAC). */
  private[ext] def statsRow(p: WavKernel.Pcm): InternalRow = {
    if (p == null)
      return InternalRow(false, null, null, null, null, null, null, null,
        null)
    var sumAbs = 0L; var peak = 0L; var zc = 0L
    var i = 0
    while (i < p.samples.length) {
      val v = p.samples(i).toLong
      val a = math.abs(v)
      sumAbs += a; if (a > peak) peak = a
      // crossing: sign flip between consecutive samples, sign(0) = +
      if (i > 0) {
        val prevNeg = p.samples(i - 1) < 0
        if (prevNeg != (v < 0)) zc += 1
      }
      i += 1
    }
    val fp = WavKernel.energyFingerprint(p.samples)
    val (fpHi, fpLo): (Any, Any) =
      if (fp == Long.MinValue) (null, null)
      else ((fp >>> 32) & 0xFFFFFFFFL, fp & 0xFFFFFFFFL)
    InternalRow(true, p.channels.toLong, p.sampleRate.toLong,
      p.samples.length.toLong, sumAbs, peak, zc, fpHi, fpLo)
  }
}

/** Deterministic mono 16-bit PCM WAV fixture generator (the testdata
  * ships no audio). Sample contract, replayable by any engine:
  * s(i) = ((seed·7919 + i·31 + (i·i mod 101)) mod 4001) − 2000
  * — a pseudo-noisy signal spanning both signs with data-dependent
  * energy contour. Runs distributed inside the scan. */
case class PcmWavEncode(seed: Expression, nSamples: Expression,
    sampleRate: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(seed, nSamples, sampleRate)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c => c.dataType == LongType || c.dataType == IntegerType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "pcm_wav_encode requires integer children")

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
    if (n < 0 || n > (1L << 22) || sr <= 0) return null
    val sv = s.longValue()
    WavKernel.encodePcm16Mono(n.intValue(), sr.intValue(),
      i => (((sv * 7919 + i.toLong * 31 + (i.toLong * i % 101)) % 4001).toInt
        + 4001) % 4001 - 2000)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PcmWavEncode =
    PcmWavEncode(newChildren(0), newChildren(1), newChildren(2))

  override def prettyName: String = "pcm_wav_encode"
}

object PcmWavEncode {
  def apply(seed: Column, nSamples: Column, sampleRate: Column): Column = {
    val b = org.apache.spark.sql.graftbridge.Bridge
    b.column(PcmWavEncode(b.expression(seed), b.expression(nSamples),
      b.expression(sampleRate)))
  }
}

/** Deterministic G.711 WAV fixture generator (distributed): a REAL
  * telephony WAV (format tag `law`: 6 A-law / 7 μ-law, 8-bit mono at
  * 8 kHz) whose payload byte j is the documented formula
  *   b(j) = (seed·37 + j·11 + (j·j) mod 97) mod 256
  * so an oracle replays decode = expand(b(j)) sample-for-sample. */
case class G711WavEncode(seed: Expression, nSamples: Expression,
    law: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(seed, nSamples, law)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c => c.dataType == LongType || c.dataType == IntegerType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "g711_wav_encode requires integer children")

  private def longOf(e: Expression, input: InternalRow): java.lang.Long =
    e.eval(input) match {
      case null => null
      case i: java.lang.Integer => i.longValue()
      case l: java.lang.Long => l
    }

  override def eval(input: InternalRow): Any = {
    val s = longOf(seed, input); val n = longOf(nSamples, input)
    val l = longOf(law, input)
    if (s == null || n == null || l == null) return null
    if (n < 0 || n > (1L << 22) || (l != 6L && l != 7L)) return null
    val sv = s.longValue()
    WavKernel.encodeG711Mono(n.intValue(), 8000, l.intValue(),
      j => ((sv * 37 + j.toLong * 11 + (j.toLong * j % 97)) % 256).toInt)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): G711WavEncode =
    G711WavEncode(newChildren(0), newChildren(1), newChildren(2))

  override def prettyName: String = "g711_wav_encode"
}

object G711WavEncode {
  def apply(seed: Column, nSamples: Column, law: Column): Column = {
    val b = org.apache.spark.sql.graftbridge.Bridge
    b.column(G711WavEncode(b.expression(seed), b.expression(nSamples),
      b.expression(law)))
  }
}

/** SPECTRAL stats from a PCM-WAV binary column: ok flag, sample count,
  * and [[WavKernel.spectralFingerprint]] split into nonneg hi/lo
  * 32-bit-half longs (null when the clip is under 256 samples — the
  * fingerprint's window floor). The class-discriminating complement of
  * [[WavPcmStats]]' energy contour, kept as its own expression so the
  * frozen [[WavPcmStats]] schema (and its gates) never move.
  * Undecodable → ok=false, nulls, never a throw. */
case class WavSpectralStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("ok", BooleanType, nullable = false),
    StructField("n_samples", LongType),
    StructField("sfp_hi", LongType),
    StructField("sfp_lo", LongType)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wav_spectral_stats requires binary, got $other")
  }

  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val bytes = child.eval(input) match {
      case null => null
      case b => b.asInstanceOf[Array[Byte]]
    }
    val p = WavKernel.decodePcm(bytes)
    if (p == null) return InternalRow(false, null, null, null)
    val fp = WavKernel.spectralFingerprint(p.samples)
    val (hi, lo): (Any, Any) =
      if (fp == Long.MinValue) (null, null)
      else ((fp >>> 32) & 0xFFFFFFFFL, fp & 0xFFFFFFFFL)
    InternalRow(true, p.samples.length.toLong, hi, lo)
  }

  override protected def withNewChildInternal(
      newChild: Expression): WavSpectralStats = copy(child = newChild)

  override def prettyName: String = "wav_spectral_stats"
}

object WavSpectralStats {
  def apply(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      WavSpectralStats(org.apache.spark.sql.graftbridge.Bridge.expression(c)))
}

/** RESAMPLE: decode + exact box-decimation of a PCM-WAV binary column
  * by an integer factor — one output sample per FULL block of `factor`
  * input samples, value = TRUNCATED mean (toward zero — the integer
  * division BOTH replay engines share; floor-division would diverge
  * on negative block sums, the x_interp lesson), the partial tail
  * block dropped. The audio twin of
  * [[PngResizeGray]]: thumbnail/feature-prep with integers any engine
  * replays. Undecodable input → NULL (callers coalesce to no rows). */
case class PcmResample(child: Expression, factor: Int)
    extends UnaryExpression with CodegenFallback {
  require(factor >= 1 && factor <= (1 << 16), s"bad factor $factor")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pcm_resample requires binary, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val p = WavKernel.decodePcm(input.asInstanceOf[Array[Byte]])
    if (p == null) return null
    val n = p.samples.length / factor
    val out = new Array[Long](n)
    var b = 0
    while (b < n) {
      var s = 0L
      var j = 0
      while (j < factor) { s += p.samples(b * factor + j); j += 1 }
      out(b) = s / factor // truncation toward zero, shared by both engines
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): PcmResample =
    copy(child = newChild)

  override def prettyName: String = "pcm_resample"
}

object PcmResample {
  def apply(c: Column, factor: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      PcmResample(org.apache.spark.sql.graftbridge.Bridge.expression(c),
        factor))
}

/** TRIM-SILENCE bounds of a PCM-WAV binary column: leading/trailing
  * runs of FULL `windowSamples`-sample windows whose mean |sample|
  * sits under `minMeanAbsMilli`/1000 (exact integer
  * cross-multiplication: sum_abs·1000 < thr·W) are marked for
  * trimming — the head/tail dead air a recording pipeline drops
  * before feature extraction. Output struct
  * (ok, n_samples, lead_trim, tail_trim, kept): trims are multiples
  * of the window, kept = n − lead − tail (never negative — an
  * all-silent clip trims everything from the lead side first).
  * Undecodable → ok=false, nulls. One pass, zero shuffle, every
  * operand replayable by SQL comprehension. */
case class PcmTrimBounds(child: Expression, windowSamples: Int,
    minMeanAbsMilli: Long)
    extends UnaryExpression with CodegenFallback {
  require(windowSamples >= 1 && windowSamples <= (1 << 20),
    s"bad window $windowSamples")
  require(minMeanAbsMilli >= 0, s"bad threshold $minMeanAbsMilli")

  override def dataType: DataType = StructType(Seq(
    StructField("ok", BooleanType, nullable = false),
    StructField("n_samples", LongType),
    StructField("lead_trim", LongType),
    StructField("tail_trim", LongType),
    StructField("kept", LongType)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pcm_trim_bounds requires binary, got $other")
  }

  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val bytes = child.eval(input) match {
      case null => null
      case b => b.asInstanceOf[Array[Byte]]
    }
    val p = WavKernel.decodePcm(bytes)
    if (p == null) return InternalRow(false, null, null, null, null)
    val n = p.samples.length
    val w = windowSamples
    val nw = n / w
    def windowSilent(k: Int): Boolean = {
      var s = 0L
      var j = k * w
      val end = j + w
      while (j < end) { s += math.abs(p.samples(j).toLong); j += 1 }
      s * 1000 < minMeanAbsMilli * w
    }
    var lead = 0
    while (lead < nw && windowSilent(lead)) lead += 1
    var tail = 0
    while (tail < nw - lead && windowSilent(nw - 1 - tail)) tail += 1
    val leadS = lead.toLong * w
    val tailS = tail.toLong * w
    InternalRow(true, n.toLong, leadS, tailS, n.toLong - leadS - tailS)
  }

  override protected def withNewChildInternal(
      newChild: Expression): PcmTrimBounds = copy(child = newChild)

  override def prettyName: String = "pcm_trim_bounds"
}

object PcmTrimBounds {
  def apply(c: Column, windowSamples: Int, minMeanAbsMilli: Long): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      PcmTrimBounds(org.apache.spark.sql.graftbridge.Bridge.expression(c),
        windowSamples, minMeanAbsMilli))
}

/** Silence-padded PCM fixture: `nLead` zero samples, an `nBody`-sample
  * ALTERNATING-SIGN body
  *   v(j) = (−1)^j · (500 + (seed·7919 + j·31 + (j·j mod 101)) mod 1500)
  * — |v| ∈ [500, 2000) at EVERY sample, so every body window clears
  * any silence floor under 500 by construction (the first cut reused
  * [[PcmWavEncode]]'s slow ramp mod 4001, whose 64-sample windows can
  * sit entirely near zero — a "live" body window then judges silent
  * and the planted-trim semantics dissolve) — then `nTail` zeros.
  * The planted head/tail dead air [[PcmTrimBounds]] is gated on. */
case class PaddedWavEncode(seed: Expression, nLead: Expression,
    nBody: Expression, nTail: Expression, sampleRate: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] =
    Seq(seed, nLead, nBody, nTail, sampleRate)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c => c.dataType == LongType || c.dataType == IntegerType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "padded_wav_encode requires integer children")

  private def longOf(e: Expression, input: InternalRow): java.lang.Long =
    e.eval(input) match {
      case null => null
      case i: java.lang.Integer => i.longValue()
      case l: java.lang.Long => l
    }

  override def eval(input: InternalRow): Any = {
    val vs = children.map(c => longOf(c, input))
    if (vs.exists(_ == null)) return null
    val Seq(s, nl, nb, nt, sr) = vs.map(_.longValue())
    if (nl < 0 || nb < 0 || nt < 0 || nl + nb + nt > (1L << 22) || sr <= 0)
      return null
    val n = (nl + nb + nt).toInt
    WavKernel.encodePcm16Mono(n, sr.toInt, i =>
      if (i < nl || i >= nl + nb) 0
      else {
        val j = i - nl.toInt
        val mag = 500 + Math.floorMod(
          s * 7919 + j.toLong * 31 + (j.toLong * j % 101), 1500L).toInt
        if (j % 2 == 0) mag else -mag
      })
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PaddedWavEncode =
    PaddedWavEncode(newChildren(0), newChildren(1), newChildren(2),
      newChildren(3), newChildren(4))

  override def prettyName: String = "padded_wav_encode"
}

object PaddedWavEncode {
  def apply(seed: Column, nLead: Column, nBody: Column, nTail: Column,
      sampleRate: Column): Column = {
    val b = org.apache.spark.sql.graftbridge.Bridge
    b.column(PaddedWavEncode(b.expression(seed), b.expression(nLead),
      b.expression(nBody), b.expression(nTail), b.expression(sampleRate)))
  }
}

/** Deterministic BAND-PROFILE WAV fixture ([[WavKernel.toneSample]]'s
  * contract): per-(class, band, window) pseudo-random amplitudes over
  * the [[WavKernel.BandPeriods]] filterbank + a bump-seeded ±20 noise
  * floor — the spectral-fingerprint twin of [[PcmWavEncode]] (whose
  * pseudo-noise has no stable band structure to discriminate).
  * Same-class bumps are near-duplicates; distinct classes land far
  * apart in Hamming (measured and PINNED in AudioSpectralSpec before
  * any class oracle was written — the FIXTURES.md discipline). */
case class ToneWavEncode(cls: Expression, bump: Expression,
    nSamples: Expression, sampleRate: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(cls, bump, nSamples, sampleRate)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c => c.dataType == LongType || c.dataType == IntegerType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "tone_wav_encode requires integer children")

  private def longOf(e: Expression, input: InternalRow): java.lang.Long =
    e.eval(input) match {
      case null => null
      case i: java.lang.Integer => i.longValue()
      case l: java.lang.Long => l
    }

  override def eval(input: InternalRow): Any = {
    val c = longOf(cls, input); val b = longOf(bump, input)
    val n = longOf(nSamples, input); val sr = longOf(sampleRate, input)
    if (c == null || b == null || n == null || sr == null) return null
    if (n < 0 || n > (1L << 22) || sr <= 0) return null
    WavKernel.encodePcm16Mono(n.intValue(), sr.intValue(),
      i => WavKernel.toneSample(c.longValue(), b.longValue(), n.intValue(), i))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ToneWavEncode =
    ToneWavEncode(newChildren(0), newChildren(1), newChildren(2),
      newChildren(3))

  override def prettyName: String = "tone_wav_encode"
}

object ToneWavEncode {
  def apply(cls: Column, bump: Column, nSamples: Column,
      sampleRate: Column): Column = {
    val b = org.apache.spark.sql.graftbridge.Bridge
    b.column(ToneWavEncode(b.expression(cls), b.expression(bump),
      b.expression(nSamples), b.expression(sampleRate)))
  }
}
