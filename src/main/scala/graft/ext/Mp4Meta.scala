package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MP4/ISO-BMFF movie metadata + timed-text extraction — the r15
  * Matroska spine, mirrored onto the OTHER dominant video container
  * so both report symmetric decode-budget numbers (the Mp4Kernel
  * sample walk stays the payload-census leg; this walk reads the
  * `moov` description tree, ISO/IEC 14496-12 box grammar, zero codec
  * decode):
  *
  *   moov/mvhd        : timescale u32, duration (u32 at version 0,
  *                      u64 at version 1 — both planted by fixture)
  *   moov/trak/mdia/hdlr : handler_type fourcc (vide/soun/text/sbtl)
  *   moov/trak/tkhd   : video width/height (16.16 fixed → integer
  *                      part; version 0/1 layouts)
  *   .../stbl/stsd    : first sample-entry fourcc (the codec tag);
  *                      audio entries carry channelcount u16 +
  *                      samplerate as 16.16 fixed
  *   text/sbtl tracks : samples walked via stsz/stco (fixed and
  *                      per-sample sizes, one chunk per sample — the
  *                      Mp4Kernel layout contract); each tx3g sample
  *                      is a u16-BE length + UTF-8 text (trailing
  *                      per-sample modifier boxes ignored); STRICT
  *                      decode — malformed samples contribute nothing
  *                      (the Matroska subtitle bar), newline-joined,
  *                      capped.
  *
  * First video track and first audio track win; text samples
  * accumulate across all text tracks in document order. General
  * `stsc` chunking is out of contract (same documented simplification
  * as [[Mp4Kernel.decodeSamples]]). Dirty bytes → null, never a throw
  * (fuzz battery entry). */
private[ext] object Mp4MetaKernel {

  final case class Meta(timescale: Long, durationUnits: Long,
      nTracks: Int, videoCodec: String, width: java.lang.Long,
      height: java.lang.Long, audioCodec: String,
      sampleRate: java.lang.Long, channels: java.lang.Long,
      nTextSamples: Int, text: String)

  private def u8(b: Array[Byte], i: Long): Int = b(i.toInt) & 0xFF
  private def be2(b: Array[Byte], i: Long): Int =
    (u8(b, i) << 8) | u8(b, i + 1)
  private def be4(b: Array[Byte], i: Long): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) |
      (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def be8(b: Array[Byte], i: Long): Long =
    (be4(b, i) << 32) | be4(b, i + 4)

  /** (payloadStart, end, type) of the box at pos, or null. Size 0
    * (to-EOF) and 1 (largesize) handled like [[BmffMetaKernel]]. */
  private def boxAt(b: Array[Byte], pos: Long, hi: Long)
      : (Long, Long, String) = {
    if (pos + 8 > hi) return null
    val size32 = be4(b, pos)
    val typ = new String(b, pos.toInt + 4, 4,
      java.nio.charset.StandardCharsets.US_ASCII)
    var payload = pos + 8
    var end = 0L
    if (size32 == 0) end = hi
    else if (size32 == 1) {
      if (pos + 16 > hi) return null
      val size64 = be8(b, pos + 8)
      payload = pos + 16
      if (size64 < 16 || size64 > hi - pos) return null
      end = pos + size64
    } else {
      if (size32 < 8 || size32 > hi - pos) return null
      end = pos + size32
    }
    if (payload > end) return null
    (payload, end, typ)
  }

  private def findBox(b: Array[Byte], lo: Long, hi: Long, typ: String)
      : (Long, Long) = {
    var pos = lo
    var guard = 0
    while (pos + 8 <= hi && guard < 256) {
      val bx = boxAt(b, pos, hi)
      if (bx == null) return null
      if (bx._3 == typ) return (bx._1, bx._2)
      pos = bx._2
      guard += 1
    }
    null
  }

  def parse(b: Array[Byte]): Meta = {
    if (b == null || b.length < 16) return null
    if (!(b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'))
      return null
    val n = b.length.toLong
    val moov = findBox(b, 0, n, "moov")
    if (moov == null) return null
    // mvhd: timescale + duration, both fullbox versions
    val mvhd = findBox(b, moov._1, moov._2, "mvhd")
    if (mvhd == null) return null
    val mv = u8(b, mvhd._1)
    var timescale = 0L
    var duration = 0L
    if (mv == 0) {
      if (mvhd._1 + 20 > mvhd._2) return null
      timescale = be4(b, mvhd._1 + 12)
      duration = be4(b, mvhd._1 + 16)
    } else {
      if (mvhd._1 + 32 > mvhd._2) return null
      timescale = be4(b, mvhd._1 + 20)
      duration = be8(b, mvhd._1 + 24)
      if (duration < 0) return null
    }
    var nTracks = 0
    var videoCodec: String = null
    var width: java.lang.Long = null
    var height: java.lang.Long = null
    var audioCodec: String = null
    var rate: java.lang.Long = null
    var channels: java.lang.Long = null
    var nTextSamples = 0
    val text = new java.lang.StringBuilder()

    def utf8Strict(lo: Long, len: Int): String = {
      val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      try dec.decode(java.nio.ByteBuffer.wrap(b, lo.toInt, len)).toString
      catch { case _: java.nio.charset.CharacterCodingException => null }
    }

    def walkTextSamples(stbl: (Long, Long)): Boolean = {
      val stsz = findBox(b, stbl._1, stbl._2, "stsz")
      val stco = findBox(b, stbl._1, stbl._2, "stco")
      if (stsz == null || stco == null) return true // no samples: ok
      if (stsz._1 + 12 > stsz._2 || stco._1 + 8 > stco._2) return false
      val fixedSize = be4(b, stsz._1 + 4)
      val count = be4(b, stsz._1 + 8)
      val coCount = be4(b, stco._1 + 4)
      if (count != coCount || count > 4096 || count < 0) return false
      if (fixedSize == 0 && stsz._1 + 12 + 4 * count > stsz._2)
        return false
      if (stco._1 + 8 + 4 * count > stco._2) return false
      var i = 0L
      while (i < count) {
        val size = if (fixedSize != 0) fixedSize
          else be4(b, stsz._1 + 12 + 4 * i)
        val off = be4(b, stco._1 + 8 + 4 * i)
        if (size < 2 || off + size > n) return false
        val tlen = be2(b, off)
        // u16 length + text; per-sample modifier boxes may trail
        if (2 + tlen > size) return false
        if (text.length() < (1 << 20)) {
          val t = utf8Strict(off + 2, tlen)
          if (t != null) {
            if (text.length() > 0) text.append('\n')
            text.append(t)
            nTextSamples += 1
          }
        }
        i += 1
      }
      true
    }

    var pos = moov._1
    var guard = 0
    while (pos + 8 <= moov._2 && guard < 64) {
      val bx = boxAt(b, pos, moov._2)
      if (bx == null) return null
      if (bx._3 == "trak") {
        nTracks += 1
        val tkhd = findBox(b, bx._1, bx._2, "tkhd")
        val mdia = findBox(b, bx._1, bx._2, "mdia")
        if (mdia == null) return null
        val hdlr = findBox(b, mdia._1, mdia._2, "hdlr")
        if (hdlr == null || hdlr._1 + 12 > hdlr._2) return null
        val handler = new String(b, (hdlr._1 + 8).toInt, 4,
          java.nio.charset.StandardCharsets.US_ASCII)
        val minf = findBox(b, mdia._1, mdia._2, "minf")
        val stbl = if (minf == null) null
          else findBox(b, minf._1, minf._2, "stbl")
        val stsd = if (stbl == null) null
          else findBox(b, stbl._1, stbl._2, "stsd")
        var fourcc: String = null
        var entry: (Long, Long) = null
        if (stsd != null && stsd._1 + 16 <= stsd._2 &&
          be4(b, stsd._1 + 4) >= 1) {
          val esize = be4(b, stsd._1 + 8)
          if (esize >= 16 && stsd._1 + 8 + esize <= stsd._2) {
            fourcc = new String(b, (stsd._1 + 12).toInt, 4,
              java.nio.charset.StandardCharsets.US_ASCII)
            entry = (stsd._1 + 16, stsd._1 + 8 + esize)
          }
        }
        handler match {
          case "vide" if videoCodec == null && fourcc != null =>
            videoCodec = fourcc
            // tkhd: width/height are the LAST 8 bytes, 16.16 fixed
            if (tkhd != null && tkhd._2 - 8 >= tkhd._1) {
              width = be4(b, tkhd._2 - 8) >> 16
              height = be4(b, tkhd._2 - 4) >> 16
            }
          case "soun" if audioCodec == null && fourcc != null =>
            audioCodec = fourcc
            // audio sample entry: +8 reserved, channelcount u16,
            // samplesize u16, predefined u16, reserved u16,
            // samplerate 16.16
            if (entry._1 + 28 <= entry._2) {
              channels = be2(b, entry._1 + 16).toLong
              rate = be4(b, entry._1 + 24) >> 16
            }
          case "text" | "sbtl" =>
            if (stbl != null && !walkTextSamples(stbl)) return null
          case _ => ()
        }
      }
      pos = bx._2
      guard += 1
    }
    if (nTracks == 0) return null
    Meta(timescale, duration, nTracks, videoCodec, width, height,
      audioCodec, rate, channels, nTextSamples,
      if (nTextSamples == 0) null else text.toString)
  }
}

/** MP4 movie metadata of a binary column: (ok, timescale,
  * duration_units, n_tracks, video_codec, width, height, audio_codec,
  * sample_rate, channels, n_text_samples, text) — see
  * [[Mp4MetaKernel]]. ok=false with null fields on dirty bytes. */
case class Mp4MovieMeta(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("ok", BooleanType, nullable = false),
    StructField("timescale", LongType),
    StructField("duration_units", LongType),
    StructField("n_tracks", LongType),
    StructField("video_codec", StringType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("audio_codec", StringType),
    StructField("sample_rate", LongType),
    StructField("channels", LongType),
    StructField("n_text_samples", LongType),
    StructField("text", StringType)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mp4_movie_meta requires binary, got $other")
  }

  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val bytes = child.eval(input) match {
      case null => null
      case v => v.asInstanceOf[Array[Byte]]
    }
    val m = Mp4MetaKernel.parse(bytes)
    if (m == null) return InternalRow(false, null, null, null, null,
      null, null, null, null, null, null, null)
    def s(v: String): Any =
      if (v == null) null else UTF8String.fromString(v)
    InternalRow(true, m.timescale, m.durationUnits, m.nTracks.toLong,
      s(m.videoCodec), m.width, m.height, s(m.audioCodec), m.sampleRate,
      m.channels, m.nTextSamples.toLong, s(m.text))
  }

  override protected def withNewChildInternal(
      newChild: Expression): Mp4MovieMeta = copy(child = newChild)

  override def prettyName: String = "mp4_movie_meta"
}

object Mp4MovieMeta {
  def apply(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      Mp4MovieMeta(org.apache.spark.sql.graftbridge.Bridge.expression(c)))
}

/** Deterministic REAL MP4 movie fixture: ftyp + moov(mvhd + video
  * trak + audio trak [+ tx3g text trak]) + mdat holding the text
  * samples. Per seed s:
  *   timescale      = 1000
  *   duration_units = 5000 + s mod 90000  (mvhd version s mod 2 —
  *                    both u32 and u64 layouts planted)
  *   video          : avc1 | hvc1 (s mod 2), width 320 + (s*3) mod
  *                    1280, height 240 + (s*7) mod 720
  *   audio          : mp4a, rate {8000,16000,22050,44100,48000}
  *                    [s mod 5], channels 1 + s mod 2
  *   text (s mod 4 < 2): tx3g track with 1 + s mod 3 samples in
  *                    mdat, sample t = `cue <t> q<(s*7+t) mod 10>`
  *                    (8 bytes) behind a u16 length; n_tracks = 3,
  *                    else 2 */
case class Mp4MovieEncode(seed: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mp4_movie_encode requires long, got $other")
  }

  override def child: Expression = seed

  override def nullSafeEval(input: Any): Any =
    Mp4MovieEncode.encode(input.asInstanceOf[Long])

  override protected def withNewChildInternal(
      newChild: Expression): Mp4MovieEncode = copy(seed = newChild)

  override def prettyName: String = "mp4_movie_encode"
}

object Mp4MovieEncode {

  private def be2(v: Int): Array[Byte] =
    Array((v >>> 8).toByte, v.toByte)
  private def be4(v: Long): Array[Byte] = Array(
    (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
  private def be8(v: Long): Array[Byte] =
    Array.tabulate[Byte](8)(i => (v >>> (8 * (7 - i))).toByte)

  private def box(typ: String, payload: Array[Byte]): Array[Byte] =
    be4(payload.length + 8L) ++ typ.getBytes("US-ASCII") ++ payload

  private val Rates = Array(8000L, 16000L, 22050L, 44100L, 48000L)

  def encode(s0: Long): Array[Byte] = {
    val s = ((s0 % 1000003) + 1000003) % 1000003
    val duration = 5000 + s % 90000
    val mvhd =
      if (s % 2 == 0)
        box("mvhd", Array[Byte](0, 0, 0, 0) ++ be4(0) ++ be4(0) ++
          be4(1000) ++ be4(duration) ++ new Array[Byte](80))
      else
        box("mvhd", Array[Byte](1, 0, 0, 0) ++ be8(0) ++ be8(0) ++
          be4(1000) ++ be8(duration) ++ new Array[Byte](80))
    def hdlr(handler: String) = box("hdlr",
      Array[Byte](0, 0, 0, 0) ++ be4(0) ++
        handler.getBytes("US-ASCII") ++ new Array[Byte](13))
    def tkhd(w: Long, h: Long) = box("tkhd",
      Array[Byte](0, 0, 0, 7) ++ be4(0) ++ be4(0) ++ be4(1) ++
        be4(0) ++ be4(duration) ++ new Array[Byte](52) ++
        be4(w << 16) ++ be4(h << 16))
    def stblOf(stsd: Array[Byte], extra: Array[Byte] = Array.empty) =
      box("stbl", stsd ++ extra)
    def minfOf(stbl: Array[Byte]) = box("minf", stbl)
    def mdhd = box("mdhd", Array[Byte](0, 0, 0, 0) ++ be4(0) ++
      be4(0) ++ be4(1000) ++ be4(duration) ++ be2(0x55C4) ++ be2(0))
    def trak(t: Array[Byte], h: String, stbl: Array[Byte]) =
      box("trak", t ++ box("mdia", mdhd ++ hdlr(h) ++ minfOf(stbl)))
    // video trak
    val vW = 320 + (s * 3) % 1280
    val vH = 240 + (s * 7) % 720
    val vFourcc = if (s % 2 == 0) "avc1" else "hvc1"
    val vEntry = be4(86L) ++ vFourcc.getBytes("US-ASCII") ++
      new Array[Byte](6) ++ be2(1) ++ new Array[Byte](16) ++
      be2(vW.toInt) ++ be2(vH.toInt) ++ new Array[Byte](50)
    val vStsd = box("stsd", Array[Byte](0, 0, 0, 0) ++ be4(1) ++ vEntry)
    val emptySamples =
      box("stsz", Array[Byte](0, 0, 0, 0) ++ be4(0) ++ be4(0)) ++
        box("stco", Array[Byte](0, 0, 0, 0) ++ be4(0))
    val videoTrak = trak(tkhd(vW, vH), "vide",
      stblOf(vStsd, emptySamples))
    // audio trak
    val rate = Rates((s % 5).toInt)
    val ch = (1 + s % 2).toInt
    val aEntry = be4(36L) ++ "mp4a".getBytes("US-ASCII") ++
      new Array[Byte](6) ++ be2(1) ++ be4(0) ++ be4(0) ++
      be2(ch) ++ be2(16) ++ be2(0) ++ be2(0) ++ be4(rate << 16)
    val aStsd = box("stsd", Array[Byte](0, 0, 0, 0) ++ be4(1) ++ aEntry)
    val audioTrak = trak(tkhd(0, 0), "soun", stblOf(aStsd, emptySamples))
    // text trak (s mod 4 < 2): samples live in mdat after moov — the
    // layout computes absolute offsets, so build texts first
    val hasText = s % 4 < 2
    val texts = (0 until (1 + s % 3).toInt).map(t =>
      s"cue $t q${(s * 7 + t) % 10}")
    val samples = texts.map { t =>
      val tb = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      be2(tb.length) ++ tb
    }
    def textTrak(offsets: Seq[Long]): Array[Byte] = {
      val tEntry = be4(16L) ++ "tx3g".getBytes("US-ASCII") ++
        new Array[Byte](6) ++ be2(1)
      val tStsd = box("stsd", Array[Byte](0, 0, 0, 0) ++ be4(1) ++
        tEntry)
      val stsz = box("stsz", Array[Byte](0, 0, 0, 0) ++ be4(0) ++
        be4(samples.length.toLong) ++
        samples.flatMap(sm => be4(sm.length.toLong)).toArray)
      val stco = box("stco", Array[Byte](0, 0, 0, 0) ++
        be4(offsets.length.toLong) ++
        offsets.flatMap(o => be4(o)).toArray)
      trak(tkhd(0, 0), "text", stblOf(tStsd, stsz ++ stco))
    }
    val ftyp = box("ftyp", "isom    isom".getBytes("ISO-8859-1"))
    if (!hasText) {
      val moov = box("moov", mvhd ++ videoTrak ++ audioTrak)
      val mdat = box("mdat",
        Array.tabulate[Byte](8)(i => ((s * 13 + i) % 256).toByte))
      ftyp ++ moov ++ mdat
    } else {
      // two passes: sizes are layout-independent of offsets (be4)
      val probe = textTrak(samples.map(_ => 0L))
      val moovSize = box("moov",
        mvhd ++ videoTrak ++ audioTrak ++ probe).length
      val mdatPayloadStart = ftyp.length + moovSize + 8L
      val offsets = samples.scanLeft(mdatPayloadStart)(_ + _.length)
        .dropRight(1)
      val moov = box("moov",
        mvhd ++ videoTrak ++ audioTrak ++ textTrak(offsets))
      val mdat = box("mdat", samples.flatten.toArray)
      ftyp ++ moov ++ mdat
    }
  }

  def apply(seed: Column): Column = {
    val b = org.apache.spark.sql.graftbridge.Bridge
    b.column(Mp4MovieEncode(b.expression(seed)))
  }
}
