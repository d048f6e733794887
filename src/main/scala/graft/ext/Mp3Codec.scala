package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MP3 container metadata — the dominant crawl-audio format's
  * structure WITHOUT entropy decode (honestly scoped like the MP4
  * sample-table leg: MDCT/Huffman audio decode needs a codec, but
  * duration, bitrate layout and the ID3 tags live in plain headers):
  * an optional ID3v2 block (syncsafe length; TIT2/TPE1/TALB text
  * frames — the audio EXIF), then a walk of MPEG1 Layer III frame
  * headers (sync, bitrate/samplerate indices, padding) whose sizes are
  * pure table arithmetic — 144·bitrate/samplerate + padding — so frame
  * count, total samples (1152/frame) and audio byte length are exact
  * integers an oracle replays. Dirty bytes → null, never a throw.
  *
  * SCOPE NOTE — full PCM synthesis is deliberately out (the H.264
  * stance, decided rather than deferred). Decoding Layer III audio to
  * samples requires the ISO 11172-3 entropy layer end to end: ~34
  * big-value/count1 Huffman tables, side-info bit reservoir tracking
  * (main_data_begin back-pointers across frames), scalefactor-band
  * requantization with pretab/scalefac_scale, stereo modes (MS +
  * intensity), alias reduction, the 18/6-point hybrid IMDCT with
  * window switching, and the 32-band polyphase synthesis filterbank —
  * a codec-sized project whose outputs are NOT exactly integer
  * (unlike the DC-exact JPEG fixture trick, every real Layer III
  * stream exercises float windows), and — decisive for this repo's
  * verification discipline — this JVM has NO independent MP3 decoder
  * (javax.sound.sampled reads WAV/AU only), so a hand-rolled decoder
  * could only ever be tested against itself. Every other content leg
  * here (PNG/JPEG/GIF/BMP/TIFF pixels, WAV/G.711 PCM) is gated by a
  * second implementation (ImageIO, javax.sound, system tar); MP3 PCM
  * cannot meet that bar in this environment. Crawl-pipeline
  * consequence: MP3 rows carry metadata/tag dedup signals
  * ([[Mp3Meta]]) but do not join the spectral-fingerprint near-dup
  * space WAV/G.711 content enjoys; on a cluster with a licensed codec
  * library the [[graft.streaming.AudioIngest]] door accepts any
  * decoder that lands PCM in the shared stat space. */
private[ext] object Mp3Kernel {

  final case class Mp3(frames: Int, samplesTotal: Long, sampleRate: Int,
      bytesAudio: Long, title: String, artist: String, album: String)

  /** MPEG1 Layer III bitrates (kbps) by header index 1..14. */
  val BitrateKbps: Array[Int] =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)

  /** MPEG1 sample rates (Hz) by header index 0..2. */
  val SampleRates: Array[Int] = Array(44100, 48000, 32000, 0)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF

  private def syncsafe(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 21) | (u8(b, i + 1) << 14) | (u8(b, i + 2) << 7) | u8(b, i + 3)

  /** Parse ID3v2 text frames (v2.3 plain sizes / v2.4 syncsafe),
    * returning (title, artist, album, lengthOfBlock) — nulls for
    * absent frames; (null, null, null, 0) when no ID3v2 block leads. */
  private def parseId3(b: Array[Byte]): (String, String, String, Int) = {
    if (b.length < 10 || b(0) != 'I' || b(1) != 'D' || b(2) != '3')
      return (null, null, null, 0)
    val ver = u8(b, 3)
    val size = syncsafe(b, 6)
    val end = 10 + size
    if (size < 0 || end > b.length) return (null, null, null, -1)
    var title: String = null; var artist: String = null; var album: String = null
    var pos = 10
    var guard = 0
    while (pos + 10 <= end && guard < 64) {
      val id = new String(b, pos, 4, java.nio.charset.StandardCharsets.US_ASCII)
      if (!id.forall(c => c.isLetterOrDigit)) {
        pos = end // padding reached
      } else {
        val fsize = if (ver >= 4) syncsafe(b, pos + 4)
          else ((u8(b, pos + 4) << 24) | (u8(b, pos + 5) << 16) |
            (u8(b, pos + 6) << 8) | u8(b, pos + 7))
        if (fsize < 0 || pos + 10 + fsize > end) return (null, null, null, -1)
        // text frames: encoding byte 0 (latin1) then the value
        if (fsize >= 1 && u8(b, pos + 10) == 0 &&
          (id == "TIT2" || id == "TPE1" || id == "TALB")) {
          val v = new String(b, pos + 11, fsize - 1,
            java.nio.charset.StandardCharsets.ISO_8859_1)
          id match {
            case "TIT2" => title = v
            case "TPE1" => artist = v
            case _ => album = v
          }
        }
        pos += 10 + fsize
      }
      guard += 1
    }
    (title, artist, album, end)
  }

  /** Walk the frame chain after any ID3v2 block. Null when the leading
    * bytes are neither ID3 nor a valid MPEG1-L3 sync, when frames mix
    * sample rates, or when more than `maxFrames` frames appear; clean
    * stop at EOF / first non-sync byte once ≥ 1 frame parsed. */
  def parse(mp3: Array[Byte], maxFrames: Int): Mp3 = {
    if (mp3 == null || mp3.length < 4) return null
    val (title, artist, album, id3End) = parseId3(mp3)
    if (id3End < 0) return null
    var pos = id3End
    var frames = 0
    var sampleRate = -1
    var bytesAudio = 0L
    while (pos + 4 <= mp3.length) {
      val h0 = u8(mp3, pos); val h1 = u8(mp3, pos + 1)
      if (h0 != 0xFF || (h1 & 0xE0) != 0xE0) {
        // not a sync: done if we have frames, dirty otherwise
        return if (frames > 0)
          Mp3(frames, frames.toLong * 1152L, sampleRate, bytesAudio,
            title, artist, album)
        else null
      }
      if ((h1 & 0x18) != 0x18 || (h1 & 0x06) != 0x02) return null // MPEG1 L3 only
      val h2 = u8(mp3, pos + 2)
      val brIdx = (h2 >> 4) & 0xF
      val srIdx = (h2 >> 2) & 0x3
      val pad = (h2 >> 1) & 0x1
      if (brIdx < 1 || brIdx > 14 || srIdx > 2) return null
      val sr = SampleRates(srIdx)
      if (sampleRate < 0) sampleRate = sr
      else if (sampleRate != sr) return null
      val size = 144 * (BitrateKbps(brIdx) * 1000) / sr + pad
      if (pos + size > mp3.length) return null // truncated frame
      frames += 1
      if (frames > maxFrames) return null
      bytesAudio += size
      pos += size
    }
    if (frames == 0) null
    else Mp3(frames, frames.toLong * 1152L, sampleRate, bytesAudio,
      title, artist, album)
  }

  /** Encode a REAL MP3 container under a documented contract: an
    * ID3v2.3 block with TIT2/TPE1/TALB, then `nFrames` MPEG1-L3
    * headers with
    *   brIdx(i) = 1 + (seed + i) mod 14,  srIdx = seed mod 3,
    *   pad(i)   = (seed + i) mod 2
    * and junk payload bytes — sizes/duration are pure functions the
    * oracle replays; only the headers are load-bearing. */
  def encode(seed: Long, nFrames: Int, title: String, artist: String,
      album: String): Array[Byte] = {
    require(nFrames >= 1 && nFrames <= 4096, s"bad nFrames=$nFrames")
    val bos = new java.io.ByteArrayOutputStream()
    def textFrame(id: String, v: String): Array[Byte] = {
      val body = Array(0.toByte) ++ v.getBytes(
        java.nio.charset.StandardCharsets.ISO_8859_1)
      id.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
        Array(((body.length >> 24) & 0xFF).toByte,
          ((body.length >> 16) & 0xFF).toByte,
          ((body.length >> 8) & 0xFF).toByte,
          (body.length & 0xFF).toByte, 0.toByte, 0.toByte) ++ body
    }
    val tags = textFrame("TIT2", title) ++ textFrame("TPE1", artist) ++
      textFrame("TALB", album)
    bos.write('I'); bos.write('D'); bos.write('3')
    bos.write(3); bos.write(0); bos.write(0) // v2.3, no flags
    val sz = tags.length
    bos.write((sz >> 21) & 0x7F); bos.write((sz >> 14) & 0x7F)
    bos.write((sz >> 7) & 0x7F); bos.write(sz & 0x7F)
    bos.write(tags, 0, tags.length)
    val srIdx = (seed % 3).toInt
    val sr = SampleRates(srIdx)
    var i = 0
    while (i < nFrames) {
      val brIdx = (1 + (seed + i) % 14).toInt
      val pad = ((seed + i) % 2).toInt
      val size = 144 * (BitrateKbps(brIdx) * 1000) / sr + pad
      bos.write(0xFF); bos.write(0xFB) // MPEG1 L3, no CRC
      bos.write((brIdx << 4) | (srIdx << 2) | (pad << 1))
      bos.write(0x00) // stereo etc: ignored by the walk
      var j = 4
      while (j < size) { bos.write(((seed + i * 31 + j * 7) % 256).toInt); j += 1 }
      i += 1
    }
    bos.toByteArray
  }
}

/** MP3 metadata struct from a binary column: (ok, n_frames,
  * samples_total, sample_rate, bytes_audio, title, artist, album).
  * ok=false (all null) for undecodable bytes — never a throw. */
case class Mp3Meta(child: Expression, maxFrames: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("ok", BooleanType, nullable = false),
    StructField("n_frames", LongType),
    StructField("samples_total", LongType),
    StructField("sample_rate", LongType),
    StructField("bytes_audio", LongType),
    StructField("title", StringType),
    StructField("artist", StringType),
    StructField("album", StringType)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mp3_meta requires binary, got $other")
  }

  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val bytes = child.eval(input) match {
      case null => null
      case b => b.asInstanceOf[Array[Byte]]
    }
    val m = Mp3Kernel.parse(bytes, maxFrames)
    if (m == null)
      return InternalRow(false, null, null, null, null, null, null, null)
    def s(v: String): Any = if (v == null) null else UTF8String.fromString(v)
    InternalRow(true, m.frames.toLong, m.samplesTotal, m.sampleRate.toLong,
      m.bytesAudio, s(m.title), s(m.artist), s(m.album))
  }

  override protected def withNewChildInternal(newChild: Expression): Mp3Meta =
    copy(child = newChild)

  override def prettyName: String = "mp3_meta"
}

object Mp3Meta {
  def apply(c: Column, maxFrames: Int = 65536): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      Mp3Meta(org.apache.spark.sql.graftbridge.Bridge.expression(c), maxFrames))
}

/** Deterministic MP3 fixture generator (distributed) under
  * [[Mp3Kernel.encode]]'s documented header/tag contract. */
case class Mp3Encode(seed: Expression, nFrames: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(seed, nFrames)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c => c.dataType == LongType || c.dataType == IntegerType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("mp3_encode requires integer children")

  override def eval(input: InternalRow): Any = {
    def longOf(e: Expression): java.lang.Long = e.eval(input) match {
      case null => null
      case i: java.lang.Integer => i.longValue()
      case l: java.lang.Long => l
    }
    val s = longOf(seed); val n = longOf(nFrames)
    if (s == null || n == null || n < 1 || n > 4096) return null
    val sv = s.longValue()
    Mp3Kernel.encode(sv, n.intValue(), s"TITLE-${sv % 13}",
      s"ARTIST-${sv % 11}", s"ALBUM-${sv % 7}")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Mp3Encode =
    Mp3Encode(newChildren(0), newChildren(1))

  override def prettyName: String = "mp3_encode"
}

object Mp3Encode {
  def apply(seed: Column, nFrames: Column): Column = {
    val b = org.apache.spark.sql.graftbridge.Bridge
    b.column(Mp3Encode(b.expression(seed), b.expression(nFrames)))
  }
}
