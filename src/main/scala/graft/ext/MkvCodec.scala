package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WebM/Matroska structural walk — the triage census sniffs the EBML
  * magic (`MediaKind`: 0x1A45DFA3 → "webm") but, before r15, learned
  * nothing else. The container grammar is EBML (RFC 8794): every
  * element is a varint ID + varint size + payload, nesting by size —
  * exactly-specified integer plumbing with zero VP8/VP9/Opus decode
  * (codec payloads stay opaque, the honest MP4-leg scope).
  *
  * Varints: the leading-zero count of the first byte gives the total
  * length (1–8 bytes); element IDs KEEP the marker bit (the public
  * spec writes IDs with it), sizes strip it. An all-ones size is
  * "unknown" — legal for Segment in live-streamed webm — and is read
  * as extends-to-end-of-buffer.
  *
  * Walked spine (IDs from the public Matroska registry):
  *   EBML 0x1A45DFA3 → DocType 0x4282, DocTypeVersion 0x4287
  *   Segment 0x18538067
  *     Info 0x1549A966 → TimestampScale 0x2AD7B1 (uint, default 1e6),
  *                       Duration 0x4489 (float32/64, in scale units)
  *     Tracks 0x1654AE6B → TrackEntry 0xAE →
  *       TrackType 0x83 (1=video, 2=audio), CodecID 0x86 (string),
  *       Video 0xE0 → PixelWidth 0xB0, PixelHeight 0xBA
  *       Audio 0xE1 → SamplingFrequency 0xB5 (float), Channels 0x9F
  *     Cluster 0x1F43B675 → block CENSUS (r15 second pass): clusters,
  *       SimpleBlocks 0xA3 and BlockGroup 0xA0 / Block 0xA1 counted,
  *       frame bytes summed past each block's track-varint + s16
  *       timestamp + flags header (lacing structure counted as-is —
  *       exactly specified, zero codec decode); payloads stay opaque.
  *     Everything else: skipped by size.
  *
  * First video track and first audio track win (multi-track files
  * report the count). Duration is reported FLOORED to a long in
  * timestamp-scale units (`duration_units`) next to the raw
  * `timestamp_scale` — integer-valued floats replay exactly across
  * engines, and the quotient form never enters the oracle. Dirty
  * bytes → null, never a throw (fuzz battery entry). */
private[ext] object MkvKernel {

  final case class Mkv(docType: String, docTypeVersion: Long,
      timestampScale: Long, durationUnits: java.lang.Long,
      nTracks: Int, videoCodec: String, pixelWidth: java.lang.Long,
      pixelHeight: java.lang.Long, audioCodec: String,
      sampleRate: java.lang.Long, channels: java.lang.Long,
      nClusters: Int, nBlocks: Int, frameBytes: Long,
      nSubBlocks: Int, subtitleText: String)

  private final val MaxElements = 10000

  /** (value, nBytes) of the varint at pos, or null. `keepMarker` for
    * element IDs. */
  private def varint(b: Array[Byte], pos: Long, hi: Long,
      keepMarker: Boolean): (Long, Int) = {
    if (pos >= hi) return null
    val first = b(pos.toInt) & 0xFF
    if (first == 0) return null // > 8-byte varint: reject
    var len = 1
    var mask = 0x80
    while ((first & mask) == 0) { len += 1; mask >>= 1 }
    if (pos + len > hi) return null
    var v = (if (keepMarker) first else first & (mask - 1)).toLong
    var i = 1
    while (i < len) {
      v = (v << 8) | (b((pos + i).toInt) & 0xFF)
      i += 1
    }
    (v, len)
  }

  /** Is `v` the all-ones ("unknown") size for an `len`-byte varint? */
  private def unknownSize(v: Long, len: Int): Boolean =
    v == (1L << (7 * len)) - 1

  /** Element header at pos: (id, payloadStart, payloadEnd) or null.
    * Unknown size extends to hi. */
  private def element(b: Array[Byte], pos: Long, hi: Long)
      : (Long, Long, Long) = {
    val id = varint(b, pos, hi, keepMarker = true)
    if (id == null) return null
    val sz = varint(b, pos + id._2, hi, keepMarker = false)
    if (sz == null) return null
    val payload = pos + id._2 + sz._2
    val end = if (unknownSize(sz._1, sz._2)) hi else payload + sz._1
    if (end < payload || end > hi) return null
    (id._1, payload, end)
  }

  private def uintAt(b: Array[Byte], lo: Long, hi: Long): Long = {
    val n = (hi - lo).toInt
    if (n < 0 || n > 8) return -1L
    var v = 0L
    var i = 0
    while (i < n) { v = (v << 8) | (b((lo + i).toInt) & 0xFF); i += 1 }
    v
  }

  private def floatAt(b: Array[Byte], lo: Long, hi: Long): java.lang.Double =
    (hi - lo).toInt match {
      case 4 => java.lang.Float
        .intBitsToFloat(uintAt(b, lo, hi).toInt).toDouble
      case 8 => java.lang.Double.longBitsToDouble(uintAt(b, lo, hi))
      case _ => null
    }

  private def strAt(b: Array[Byte], lo: Long, hi: Long): String = {
    if (hi - lo > 64) return null
    new String(b, lo.toInt, (hi - lo).toInt,
      java.nio.charset.StandardCharsets.US_ASCII)
  }

  def parse(b: Array[Byte]): Mkv = {
    if (b == null || b.length < 8) return null
    if (!((b(0) & 0xFF) == 0x1A && (b(1) & 0xFF) == 0x45 &&
      (b(2) & 0xFF) == 0xDF && (b(3) & 0xFF) == 0xA3)) return null
    val n = b.length.toLong
    var docType: String = null
    var docTypeVersion = 1L
    var timestampScale = 1000000L
    var durationUnits: java.lang.Long = null
    var nTracks = 0
    var videoCodec: String = null
    var pw: java.lang.Long = null
    var ph: java.lang.Long = null
    var audioCodec: String = null
    var rate: java.lang.Long = null
    var channels: java.lang.Long = null
    var nClusters = 0
    var nBlocks = 0
    var frameBytes = 0L
    var nSubBlocks = 0
    val subText = new java.lang.StringBuilder()
    // track number -> is it an S_TEXT/UTF8 subtitle track (learned
    // from Tracks, which precedes Clusters in well-formed files)
    val subTracks = new java.util.HashSet[Long]()
    var budget = MaxElements

    def walkTrackEntry(lo: Long, hi: Long): Boolean = {
      var pos = lo
      var trackType = -1L
      var trackNo = -1L
      var codec: String = null
      var tPw, tPh, tRate, tCh: java.lang.Long = null
      while (pos < hi && budget > 0) {
        budget -= 1
        val e = element(b, pos, hi)
        if (e == null) return false
        e._1 match {
          case 0xD7L => trackNo = uintAt(b, e._2, e._3)
          case 0x83L => trackType = uintAt(b, e._2, e._3)
          case 0x86L => codec = strAt(b, e._2, e._3)
          case 0xE0L => // Video
            var p = e._2
            while (p < e._3 && budget > 0) {
              budget -= 1
              val v = element(b, p, e._3)
              if (v == null) return false
              v._1 match {
                case 0xB0L => tPw = uintAt(b, v._2, v._3)
                case 0xBAL => tPh = uintAt(b, v._2, v._3)
                case _ => ()
              }
              p = v._3
            }
          case 0xE1L => // Audio
            var p = e._2
            while (p < e._3 && budget > 0) {
              budget -= 1
              val a = element(b, p, e._3)
              if (a == null) return false
              a._1 match {
                case 0xB5L =>
                  val f = floatAt(b, a._2, a._3)
                  if (f != null && f >= 0 && f < 1e9)
                    tRate = math.floor(f).toLong
                case 0x9FL => tCh = uintAt(b, a._2, a._3)
                case _ => ()
              }
              p = a._3
            }
          case _ => ()
        }
        pos = e._3
      }
      nTracks += 1
      if (trackType == 1 && videoCodec == null) {
        videoCodec = codec; pw = tPw; ph = tPh
      } else if (trackType == 2 && audioCodec == null) {
        audioCodec = codec; rate = tRate; channels = tCh
      } else if (trackType == 17 && trackNo > 0 &&
        codec == "S_TEXT/UTF8") {
        subTracks.add(trackNo)
      }
      true
    }

    // strict UTF-8 (verified-or-nothing: a malformed subtitle frame
    // contributes nothing rather than replacement characters)
    def utf8Strict(lo: Long, hi: Long): String = {
      val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      try dec.decode(java.nio.ByteBuffer.wrap(b, lo.toInt,
        (hi - lo).toInt)).toString
      catch { case _: java.nio.charset.CharacterCodingException => null }
    }

    var pos = 0L
    while (pos < n && budget > 0) {
      budget -= 1
      val top = element(b, pos, n)
      if (top == null) return null
      top._1 match {
        case 0x1A45DFA3L => // EBML header
          var p = top._2
          while (p < top._3 && budget > 0) {
            budget -= 1
            val e = element(b, p, top._3)
            if (e == null) return null
            e._1 match {
              case 0x4282L => docType = strAt(b, e._2, e._3)
              case 0x4287L => docTypeVersion = uintAt(b, e._2, e._3)
              case _ => ()
            }
            p = e._3
          }
        case 0x18538067L => // Segment
          var p = top._2
          while (p < top._3 && budget > 0) {
            budget -= 1
            val e = element(b, p, top._3)
            if (e == null) return null
            e._1 match {
              case 0x1549A966L => // Info
                var q = e._2
                while (q < e._3 && budget > 0) {
                  budget -= 1
                  val f = element(b, q, e._3)
                  if (f == null) return null
                  f._1 match {
                    case 0x2AD7B1L =>
                      timestampScale = uintAt(b, f._2, f._3)
                    case 0x4489L =>
                      val d = floatAt(b, f._2, f._3)
                      if (d != null && d >= 0 && d < 1e15)
                        durationUnits = math.floor(d).toLong
                    case _ => ()
                  }
                  q = f._3
                }
              case 0x1654AE6BL => // Tracks
                var q = e._2
                while (q < e._3 && budget > 0) {
                  budget -= 1
                  val f = element(b, q, e._3)
                  if (f == null) return null
                  if (f._1 == 0xAE) {
                    if (!walkTrackEntry(f._2, f._3)) return null
                  }
                  q = f._3
                }
              case 0x1F43B675L => // Cluster: block census, no decode
                nClusters += 1
                var q = e._2
                while (q < e._3 && budget > 0) {
                  budget -= 1
                  val f = element(b, q, e._3)
                  if (f == null) return null
                  if (f._1 == 0xA3) { // SimpleBlock
                    // track varint + s16 timestamp + flags byte, then
                    // frame data (lacing structure counted as-is)
                    val tn = varint(b, f._2, f._3, keepMarker = false)
                    if (tn == null) return null
                    val hdrEnd = f._2 + tn._2 + 3
                    if (hdrEnd > f._3) return null
                    nBlocks += 1
                    frameBytes += f._3 - hdrEnd
                    if (subTracks.contains(tn._1) &&
                      subText.length() < (1 << 20)) {
                      val t = utf8Strict(hdrEnd, f._3)
                      if (t != null) {
                        if (subText.length() > 0) subText.append('\n')
                        subText.append(t)
                        nSubBlocks += 1
                      }
                    }
                  } else if (f._1 == 0xA0L) { // BlockGroup
                    var r = f._2
                    while (r < f._3 && budget > 0) {
                      budget -= 1
                      val g = element(b, r, f._3)
                      if (g == null) return null
                      if (g._1 == 0xA1L) { // Block
                        val tn = varint(b, g._2, g._3, keepMarker = false)
                        if (tn == null) return null
                        val hdrEnd = g._2 + tn._2 + 3
                        if (hdrEnd > g._3) return null
                        nBlocks += 1
                        frameBytes += g._3 - hdrEnd
                      }
                      r = g._3
                    }
                  }
                  q = f._3
                }
              case _ => () // SeekHead, Cues, ...: skip
            }
            p = e._3
          }
        case _ => ()
      }
      pos = top._3
    }
    if (docType == null) return null
    Mkv(docType, docTypeVersion, timestampScale, durationUnits, nTracks,
      videoCodec, pw, ph, audioCodec, rate, channels, nClusters,
      nBlocks, frameBytes, nSubBlocks,
      if (nSubBlocks == 0) null else subText.toString)
  }
}

/** WebM/Matroska metadata of a binary column: (ok, doctype,
  * doctype_version, timestamp_scale, duration_units, n_tracks,
  * video_codec, pixel_width, pixel_height, audio_codec, sample_rate,
  * channels, n_clusters, n_blocks, frame_bytes) — see [[MkvKernel]].
  * ok=false with null fields on dirty bytes. */
case class MkvMeta(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("ok", BooleanType, nullable = false),
    StructField("doctype", StringType),
    StructField("doctype_version", LongType),
    StructField("timestamp_scale", LongType),
    StructField("duration_units", LongType),
    StructField("n_tracks", LongType),
    StructField("video_codec", StringType),
    StructField("pixel_width", LongType),
    StructField("pixel_height", LongType),
    StructField("audio_codec", StringType),
    StructField("sample_rate", LongType),
    StructField("channels", LongType),
    StructField("n_clusters", LongType),
    StructField("n_blocks", LongType),
    StructField("frame_bytes", LongType),
    StructField("n_sub_blocks", LongType),
    StructField("subtitle_text", StringType)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mkv_meta requires binary, got $other")
  }

  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val bytes = child.eval(input) match {
      case null => null
      case v => v.asInstanceOf[Array[Byte]]
    }
    val m = MkvKernel.parse(bytes)
    if (m == null) return InternalRow(false, null, null, null, null,
      null, null, null, null, null, null, null, null, null, null,
      null, null)
    def s(v: String): Any =
      if (v == null) null else UTF8String.fromString(v)
    InternalRow(true, s(m.docType), m.docTypeVersion, m.timestampScale,
      m.durationUnits, m.nTracks.toLong, s(m.videoCodec), m.pixelWidth,
      m.pixelHeight, s(m.audioCodec), m.sampleRate, m.channels,
      m.nClusters.toLong, m.nBlocks.toLong, m.frameBytes,
      m.nSubBlocks.toLong, s(m.subtitleText))
  }

  override protected def withNewChildInternal(
      newChild: Expression): MkvMeta = copy(child = newChild)

  override def prettyName: String = "mkv_meta"
}

object MkvMeta {
  def apply(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      MkvMeta(org.apache.spark.sql.graftbridge.Bridge.expression(c)))
}

/** Deterministic REAL WebM/Matroska fixture: a full EBML header +
  * Segment(Info + Tracks + one Cluster of opaque SimpleBlocks). Per
  * seed s:
  *   doctype         = webm (even s) | matroska (odd s)
  *   doctype_version = 2 + s mod 3
  *   timestamp_scale = 1000000
  *   duration_units  = 1000 + s mod 50000  (float64, integer-valued)
  *   video track     : V_VP9 | V_VP8 (s mod 2),
  *                     width 320 + (s*3) mod 1280 (u16 range),
  *                     height 240 + (s*7) mod 720
  *   audio track     : A_OPUS | A_VORBIS (s mod 2), rate from
  *                     {8000,16000,22050,44100,48000}[s mod 5]
  *                     (float32, exact), channels 1 + s mod 2
  *   n_tracks        = 2 + (1 when s mod 3 == 0: a second audio)
  *   clusters        : n_clusters = 1 + s mod 3; cluster c holds
  *                     1 + (s+c) mod 2 SimpleBlocks; block k carries
  *                     8 + (s*5 + c*7 + k*3) mod 40 opaque frame
  *                     bytes — so n_blocks and frame_bytes replay
  *                     arithmetically while payloads stay opaque
  *   subtitles       : when s mod 5 < 2 an S_TEXT/UTF8 track (no 9,
  *                     TrackType 17) joins, and every cluster carries
  *                     one subtitle SimpleBlock whose frame is the
  *                     8-byte text `sub <c> w<(s*3+c) mod 10>` — the
  *                     text-from-video leg, replayed as EXACT strings
  *                     (newline-joined) in the oracle; these blocks
  *                     also count in n_blocks/frame_bytes */
case class MkvEncode(seed: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mkv_encode requires long, got $other")
  }

  override def child: Expression = seed

  override def nullSafeEval(input: Any): Any =
    MkvEncode.encode(input.asInstanceOf[Long])

  override protected def withNewChildInternal(
      newChild: Expression): MkvEncode = copy(seed = newChild)

  override def prettyName: String = "mkv_encode"
}

object MkvEncode {

  private def idBytes(id: Long): Array[Byte] = {
    // IDs are written with their marker bit already in the value
    var len = 1
    while (len < 8 && (id >>> (8 * len)) != 0) len += 1
    Array.tabulate[Byte](len)(i => (id >>> (8 * (len - 1 - i))).toByte)
  }

  private def sizeBytes(v: Long): Array[Byte] = {
    // shortest varint that holds v below the all-ones pattern
    var len = 1
    while (len < 8 && v >= (1L << (7 * len)) - 1) len += 1
    val marked = v | (1L << (7 * len))
    Array.tabulate[Byte](len)(i => (marked >>> (8 * (len - 1 - i))).toByte)
  }

  private def el(id: Long, payload: Array[Byte]): Array[Byte] =
    idBytes(id) ++ sizeBytes(payload.length.toLong) ++ payload

  private def uint(v: Long): Array[Byte] = {
    var len = 1
    while (len < 8 && (v >>> (8 * len)) != 0) len += 1
    Array.tabulate[Byte](len)(i => (v >>> (8 * (len - 1 - i))).toByte)
  }

  private def f32(v: Float): Array[Byte] = {
    val bits = java.lang.Float.floatToIntBits(v)
    Array((bits >>> 24).toByte, (bits >>> 16).toByte,
      (bits >>> 8).toByte, bits.toByte)
  }

  private def f64(v: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(v)
    Array.tabulate[Byte](8)(i => (bits >>> (8 * (7 - i))).toByte)
  }

  private val Rates = Array(8000L, 16000L, 22050L, 44100L, 48000L)

  def encode(s0: Long): Array[Byte] = {
    val s = ((s0 % 1000003) + 1000003) % 1000003
    val docType = if (s % 2 == 0) "webm" else "matroska"
    val ebml = el(0x1A45DFA3L,
      el(0x4286, uint(1)) ++
        el(0x42F7, uint(1)) ++
        el(0x42F2, uint(4)) ++
        el(0x42F3, uint(8)) ++
        el(0x4282, docType.getBytes("US-ASCII")) ++
        el(0x4287, uint(2 + s % 3)) ++
        el(0x4285, uint(2)))
    val info = el(0x1549A966L,
      el(0x2AD7B1, uint(1000000L)) ++
        el(0x4489, f64((1000 + s % 50000).toDouble)))
    val vCodec = if (s % 2 == 0) "V_VP9" else "V_VP8"
    val aCodec = if (s % 2 == 0) "A_OPUS" else "A_VORBIS"
    val video = el(0xAE,
      el(0xD7, uint(1)) ++
        el(0x83, uint(1)) ++
        el(0x86, vCodec.getBytes("US-ASCII")) ++
        el(0xE0, el(0xB0, uint(320 + (s * 3) % 1280)) ++
          el(0xBA, uint(240 + (s * 7) % 720))))
    def audio(trackNo: Long) = el(0xAE,
      el(0xD7, uint(trackNo)) ++
        el(0x83, uint(2)) ++
        el(0x86, aCodec.getBytes("US-ASCII")) ++
        el(0xE1, el(0xB5, f32(Rates((s % 5).toInt).toFloat)) ++
          el(0x9F, uint(1 + s % 2))))
    val subbed = s % 5 < 2
    val subTrack = el(0xAE,
      el(0xD7, uint(9)) ++
        el(0x83, uint(17)) ++
        el(0x86, "S_TEXT/UTF8".getBytes("US-ASCII")))
    val trackKids = {
      val base =
        if (s % 3 == 0) video ++ audio(2) ++ audio(3)
        else video ++ audio(2)
      if (subbed) base ++ subTrack else base
    }
    val tracks = el(0x1654AE6BL, trackKids)
    // clusters of opaque SimpleBlocks under the documented census
    val nClusters = (1 + s % 3).toInt
    val clusters = (0 until nClusters).map { c =>
      val nblk = (1 + (s + c) % 2).toInt
      val blocks = (0 until nblk).map { k =>
        val flen = (8 + (s * 5 + c * 7 + k * 3) % 40).toInt
        val payload = Array[Byte](0x81.toByte, 0, k.toByte, 0) ++
          Array.tabulate[Byte](flen)(j =>
            ((s * 31 + c * 17 + k * 7 + j) % 256).toByte)
        el(0xA3, payload)
      }.reduce(_ ++ _)
      val sub = if (!subbed) Array.empty[Byte] else {
        val text = s"sub $c w${(s * 3 + c) % 10}"
        el(0xA3, Array[Byte](0x89.toByte, 0, 0x20, 0) ++
          text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
      el(0x1F43B675L, el(0xE7, uint(c.toLong * 40)) ++ blocks ++ sub)
    }.reduce(_ ++ _)
    val segment = el(0x18538067L, info ++ tracks ++ clusters)
    ebml ++ segment
  }

  def apply(seed: Column): Column = {
    val b = org.apache.spark.sql.graftbridge.Bridge
    b.column(MkvEncode(b.expression(seed)))
  }
}
