package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** RIFF/AVI container codec — the MOTION-JPEG video CONTENT leg. The
  * MP4 leg ([[Mp4Kernel]]) extracts frame PAYLOADS but honestly scopes
  * entropy decode out (H.264 needs a codec the sandbox lacks). MJPEG
  * closes that gap for the one video codec whose frames are a format we
  * already decode end-to-end: each `00dc` chunk in the `movi` list IS a
  * complete baseline JPEG, so the pure-JVM T.81 path ([[JpegKernel]])
  * turns a video into per-frame pixels, stats and perceptual hashes —
  * the SAME fingerprint space as still images, so a video frame and a
  * crawled thumbnail of it land in one Hamming ball.
  *
  * Container notes (all sizes LITTLE-endian, unlike ISO-BMFF):
  * `RIFF <sz> AVI ` wraps chunks `fourcc <sz> payload [pad-to-even]`;
  * `LIST <sz> <type> children...`; frames are `##dc`/`##db` chunks
  * inside `LIST movi` (optionally nested one level in `LIST rec `).
  * Dirty bytes → null, never a throw (crawl input is hostile). */
private[ext] object AviKernel {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def le4(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)) & 0xFFFFFFFFL
  private def cc(b: Array[Byte], i: Int): String =
    new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Slice every frame chunk's payload out of `LIST movi`, in stream
    * order. Null on non-AVI bytes, a missing movi list, out-of-bounds
    * chunk sizes, or more than `maxFrames` frames. */
  def decodeFrames(avi: Array[Byte], maxFrames: Int): Array[Array[Byte]] = {
    if (avi == null || avi.length < 12) return null
    if (!(avi(0) == 'R' && avi(1) == 'I' && avi(2) == 'F' && avi(3) == 'F'))
      return null
    if (!(avi(8) == 'A' && avi(9) == 'V' && avi(10) == 'I' && avi(11) == ' '))
      return null
    val n = math.min(avi.length.toLong, 8L + le4(avi, 4))
    // top-level walk: find LIST movi
    var pos = 12L
    var moviLo = -1L; var moviHi = -1L
    var guard = 0
    while (pos + 8 <= n && guard < 256 && moviLo < 0) {
      val size = le4(avi, (pos + 4).toInt)
      val bodyEnd = pos + 8 + size
      if (bodyEnd > n) return null
      if (cc(avi, pos.toInt) == "LIST" && size >= 4 &&
          cc(avi, (pos + 8).toInt) == "movi") {
        moviLo = pos + 12; moviHi = bodyEnd
      }
      pos = bodyEnd + (size & 1)
      guard += 1
    }
    if (moviLo < 0) return null
    val frames = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    pos = moviLo
    guard = 0
    // Long arithmetic: an SQL-supplied maxFrames near Int.MaxValue would
    // overflow `maxFrames * 4` to negative and reject every valid AVI.
    val guardMax = maxFrames.toLong * 4 + 64
    while (pos + 8 <= moviHi && guard < guardMax) {
      val id = cc(avi, pos.toInt)
      val size = le4(avi, (pos + 4).toInt)
      val dataLo = pos + 8
      if (dataLo + size > moviHi) return null
      val isFrame = id.length == 4 &&
        id(0) >= '0' && id(0) <= '9' && id(1) >= '0' && id(1) <= '9' &&
        (id(2) == 'd' && (id(3) == 'c' || id(3) == 'b'))
      if (isFrame) {
        if (frames.length >= maxFrames) return null
        frames += java.util.Arrays.copyOfRange(avi, dataLo.toInt,
          (dataLo + size).toInt)
        pos = dataLo + size + (size & 1)
      } else if (id == "LIST" && size >= 4 && cc(avi, dataLo.toInt) == "rec ") {
        pos = dataLo + 4 // descend: rec children are contiguous in movi
      } else {
        pos = dataLo + size + (size & 1) // skip ix##, ##wb audio, junk
      }
      guard += 1
    }
    if (guard >= guardMax) return null
    frames.toArray
  }

  /** Encode a REAL MJPEG AVI: RIFF(AVI ) → LIST hdrl (avih + LIST strl
    * (strh 'vids'/'MJPG' + strf BITMAPINFOHEADER)) → LIST movi with one
    * `00dc` chunk per frame. Frame f's payload is
    * [[JpegKernel.encodeGrayBlocks]] under the documented block
    * contract with per-frame seed `seed + f`:
    *   bv(bx, by) = (((bx·7 + by·11 + (seed+f)·131)² mod 251) + bx +
    *                 by·3 + (seed+f)) mod 256
    * so an oracle replays every decoded pixel of every frame. */
  def encodeMjpeg(seed: Long, nFrames: Int, wB: Int, hB: Int): Array[Byte] = {
    require(nFrames >= 0 && nFrames <= 512, s"bad nFrames=$nFrames")
    val w = wB * 8; val h = hB * 8
    def le(v: Long): Array[Byte] = Array(
      (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def le2(v: Int): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def ascii(s: String): Array[Byte] =
      s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = if ((body.length & 1) == 1) Array(0.toByte) else Array.empty[Byte]
      ascii(id) ++ le(body.length.toLong) ++ body ++ pad
    }
    def list(typ: String, children: Array[Byte]): Array[Byte] =
      chunk("LIST", ascii(typ) ++ children)

    val avih = chunk("avih", // MainAVIHeader, 56 bytes
      le(40000L) ++ le(0L) ++ le(0L) ++ le(0L) ++ le(nFrames.toLong) ++
        le(0L) ++ le(1L) ++ le(0L) ++ le(w.toLong) ++ le(h.toLong) ++
        le(0L) ++ le(0L) ++ le(0L) ++ le(0L))
    val strh = chunk("strh", // AVIStreamHeader, 56 bytes
      ascii("vids") ++ ascii("MJPG") ++ le(0L) ++ le2(0) ++ le2(0) ++
        le(0L) ++ le(1L) ++ le(25L) ++ le(0L) ++ le(nFrames.toLong) ++
        le(0L) ++ le(0L) ++ le(0L) ++ le2(0) ++ le2(0) ++ le2(w) ++ le2(h))
    val strf = chunk("strf", // BITMAPINFOHEADER, 40 bytes
      le(40L) ++ le(w.toLong) ++ le(h.toLong) ++ le2(1) ++ le2(24) ++
        ascii("MJPG") ++ le(w.toLong * h * 3) ++ le(0L) ++ le(0L) ++
        le(0L) ++ le(0L))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi",
      (0 until nFrames).iterator.map { f =>
        val s = seed + f
        chunk("00dc", JpegKernel.encodeGrayBlocks(wB, hB, (bx, by) => {
          val t = bx * 7L + by * 11L + s * 131L
          val tq = ((t % 251) * (t % 251)) % 251
          ((((tq + bx + by * 3L + s) % 256) + 256) % 256).toInt
        }))
      }.foldLeft(Array.empty[Byte])(_ ++ _))
    val body = ascii("AVI ") ++ hdrl ++ movi
    ascii("RIFF") ++ le(body.length.toLong) ++ body
  }
}

/** Container-sniffing single-image gray decode shared by
  * [[ImageGrayStats]] and the video leg: routes PNG/JPEG/GIF/BMP/TIFF/
  * WebP-lossless payloads to their kernels by magic bytes — one scan,
  * one fingerprint space, whatever container the crawl delivered. */
private[ext] object GraySniff {
  def decode(bytes: Array[Byte]): PngKernel.Gray = {
    if (bytes == null || bytes.length < 4) return null
    if ((bytes(0) & 0xFF) == 0x89 && bytes(1) == 'P')
      PngKernel.decodeGray(bytes)
    else if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == 'F' && bytes(8) == 'W' &&
      bytes(9) == 'E' && bytes(10) == 'B' && bytes(11) == 'P')
      WebpKernel.decodeGray(bytes)
    else if ((bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xD8)
      JpegKernel.decodeGrayY(bytes)
    else if (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == '8')
      GifKernel.decodeGrayFirstFrame(bytes)
    else if (bytes(0) == 'B' && bytes(1) == 'M')
      BmpKernel.decodeGray(bytes)
    else if ((bytes(0) == 'I' && bytes(1) == 'I' && bytes(2) == 0x2A &&
        bytes(3) == 0) ||
      (bytes(0) == 'M' && bytes(1) == 'M' && bytes(2) == 0 &&
        bytes(3) == 0x2A))
      TiffKernel.decodeGray(bytes)
    else if (bytes(0) == 0 && bytes(1) == 0 && bytes(2) == 1 &&
      bytes(3) == 0)
      IcoKernel.decodeGray(bytes)
    else null
  }
}

/** Media-kind triage by magic bytes — the first operator a crawl
  * pipeline runs on an opaque content column: ONE cheap scan tags every
  * row (png/jpeg/gif/bmp/tiff/webp/ico/avif/heic/wav/mp3/ogg/flac/
  * mp4/avi/webm/pdf/warc/gzip/zip/tar/unknown) so downstream decode
  * stages read only their own rows (partition-prune by kind instead of
  * each leg re-sniffing the full corpus). Detection only — no decode,
  * no allocation beyond the tag; dirty bytes are just 'unknown'.
  * ISO-BMFF ftyp brands split modern image containers (avif/heic) from
  * video (mp4) — they budget to different decode legs. */
case class MediaKind(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"media_kind requires binary, got $other")
  }

  override def eval(input: InternalRow): Any = {
    val bytes = child.eval(input) match {
      case null => return null
      case b => b.asInstanceOf[Array[Byte]]
    }
    org.apache.spark.unsafe.types.UTF8String.fromString(
      MediaKind.sniff(bytes))
  }

  override protected def withNewChildInternal(newChild: Expression): MediaKind =
    copy(child = newChild)

  override def prettyName: String = "media_kind"
}

object MediaKind {
  def sniff(b: Array[Byte]): String = {
    if (b == null || b.length < 12) return "unknown"
    if ((b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G')
      "png"
    else if ((b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8) "jpeg"
    else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') "gif"
    else if (b(0) == 'B' && b(1) == 'M') "bmp"
    else if ((b(0) == 'I' && b(1) == 'I' && b(2) == 0x2A && b(3) == 0) ||
      (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 0x2A)) "tiff"
    else if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') "wav"
    else if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' ') "avi"
    else if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P') "webp"
    else if (b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p') {
      // ISO-BMFF brand split: modern image brands get their own census
      // rows (they are NOT video and budget differently)
      val brand = new String(Array(b(8), b(9), b(10), b(11)),
        java.nio.charset.StandardCharsets.US_ASCII)
      brand match {
        case "avif" | "avis" => "avif"
        case "heic" | "heix" | "hevc" | "mif1" => "heic"
        case _ => "mp4"
      }
    }
    else if (b(0) == 0 && b(1) == 0 && b(2) == 1 && b(3) == 0) "ico"
    else if (b(0) == '%' && b(1) == 'P' && b(2) == 'D' && b(3) == 'F') "pdf"
    else if (b(0) == 'O' && b(1) == 'g' && b(2) == 'g' && b(3) == 'S') "ogg"
    else if (b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C') "flac"
    else if ((b(0) & 0xFF) == 0x1A && (b(1) & 0xFF) == 0x45 &&
      (b(2) & 0xFF) == 0xDF && (b(3) & 0xFF) == 0xA3) "webm"
    else if (b(0) == 'I' && b(1) == 'D' && b(2) == '3') "mp3"
    else if ((b(0) & 0xFF) == 0xFF && (b(1) & 0xE0) == 0xE0) "mp3"
    else if (b(0) == 'W' && b(1) == 'A' && b(2) == 'R' && b(3) == 'C' &&
      b(4) == '/') "warc"
    else if ((b(0) & 0xFF) == 0x1F && (b(1) & 0xFF) == 0x8B) "gzip"
    else if (b(0) == 'P' && b(1) == 'K' && b(2) == 3 && b(3) == 4) "zip"
    else if (b.length >= 263 && b(257) == 'u' && b(258) == 's' &&
      b(259) == 't' && b(260) == 'a' && b(261) == 'r') "tar"
    else "unknown"
  }

  def apply(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      MediaKind(org.apache.spark.sql.graftbridge.Bridge.expression(c)))
}

/** Per-frame gray content stats from an AVI binary column: one struct
  * holding (ok, frames[]) where each frame carries byte count + the
  * standard gray-stat block (same integers as [[JpegGrayStats]], so
  * frame hashes and image hashes share one fingerprint space). Frames
  * whose payload fails the image sniff (a codec we don't decode) keep
  * their row with f_ok=false and null stats; undecodable CONTAINERS
  * yield ok=false + empty frames — never a throw. */
case class AviFrameStats(child: Expression, maxFrames: Int)
    extends UnaryExpression with CodegenFallback {

  private val frameType = StructType(Seq(
    StructField("frame_idx", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("f_ok", BooleanType, nullable = false),
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

  override def dataType: DataType = StructType(Seq(
    StructField("ok", BooleanType, nullable = false),
    StructField("frames", ArrayType(frameType, containsNull = false),
      nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"avi_frame_stats requires binary, got $other")
  }

  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val bytes = child.eval(input) match {
      case null => null
      case b => b.asInstanceOf[Array[Byte]]
    }
    val frames = AviKernel.decodeFrames(bytes, maxFrames)
    if (frames == null)
      return InternalRow(false, new GenericArrayData(Array.empty[Any]))
    val rows: Array[Any] = frames.zipWithIndex.map { case (fb, idx) =>
      val g = GraySniff.decode(fb)
      if (g == null)
        InternalRow(idx.toLong, fb.length.toLong, false, null, null, null,
          null, null, null, null, null, null, null)
      else {
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
        InternalRow(idx.toLong, fb.length.toLong, true, g.width.toLong,
          g.height.toLong, n, sum, meanMilli, varMilli, hi(ah), lo(ah),
          hi(dh), lo(dh))
      }
    }
    InternalRow(true, new GenericArrayData(rows): ArrayData)
  }

  override protected def withNewChildInternal(newChild: Expression): AviFrameStats =
    copy(child = newChild)

  override def prettyName: String = "avi_frame_stats"
}

object AviFrameStats {
  def apply(c: Column, maxFrames: Int = 512): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      AviFrameStats(org.apache.spark.sql.graftbridge.Bridge.expression(c),
        maxFrames))
}

/** Deterministic MJPEG AVI fixture generator (distributed): a REAL RIFF
  * container whose `00dc` chunks are REAL baseline JPEGs under the
  * per-frame block contract documented on [[AviKernel.encodeMjpeg]]. */
case class AviMjpegEncode(seed: Expression, nFrames: Expression,
    wBlocks: Expression, hBlocks: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(seed, nFrames, wBlocks, hBlocks)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"avi_mjpeg_encode requires 4 longs, got ${children.map(_.dataType)}")

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    val Seq(s, nf, wb, hb) = vs.map(_.asInstanceOf[Long])
    if (nf < 0 || nf > 512 || wb < 1 || hb < 1 || wb > 512 || hb > 512)
      return null
    AviKernel.encodeMjpeg(s, nf.toInt, wb.toInt, hb.toInt)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): AviMjpegEncode =
    AviMjpegEncode(newChildren(0), newChildren(1), newChildren(2),
      newChildren(3))

  override def prettyName: String = "avi_mjpeg_encode"
}

object AviMjpegEncode {
  def apply(seed: Column, nFrames: Column, wBlocks: Column,
      hBlocks: Column): Column = {
    val b = org.apache.spark.sql.graftbridge.Bridge
    b.column(AviMjpegEncode(b.expression(seed), b.expression(nFrames),
      b.expression(wBlocks), b.expression(hBlocks)))
  }
}
