package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** ISO-BMFF (MP4) SAMPLE-TABLE codec — the video CONTENT leg. A video's
  * frame boundaries live in the container's own index (`stbl`: `stsz`
  * per-sample sizes + `stco` chunk offsets), not at fixed byte strides —
  * this walks moov→trak→mdia→minf→stbl, reads both tables, and slices
  * each sample's REAL bytes out of `mdat`. That is exactly the
  * frame-extraction step a multimodal pipeline runs before any codec:
  * per-frame payloads for hashing, sampling, or handing to a decoder
  * ([[Multimodal.frameSample]]'s scaladoc promised "boundaries from the
  * codec index" for real containers; this delivers it). Entropy decode
  * of the payloads (H.264 etc.) stays out of scope — the sandbox has no
  * codec — but sizes/offsets/bytes are real and byte-exact.
  *
  * Per-sample signals are exact integers (size, absolute offset, first
  * byte, full byte sum) so a SQL oracle replays every field; dirty or
  * sample-table-less containers yield an empty sample list, never a
  * throw. One CodegenFallback evaluation per row, zero shuffle. */
private[ext] object Mp4Kernel {

  final case class Sample(idx: Int, offset: Long, size: Long,
      firstByte: Int, byteSum: Long)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def be4(b: Array[Byte], i: Int): Long =
    ((u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) |
      (u8(b, i + 2) << 8) | u8(b, i + 3)) & 0xFFFFFFFFL

  /** Payload offset (0-based) of the first child box of `typ` within
    * [lo, hi), or -1. */
  private def findBox(b: Array[Byte], lo: Long, hi: Long,
      typ: String): Long = {
    var pos = lo
    var guard = 0
    while (pos + 8 <= hi && guard < 64) {
      val size = be4(b, pos.toInt)
      if (size < 8 || pos + size > hi) return -1
      val t = new String(b, pos.toInt + 4, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      if (t == typ) return pos + 8
      pos += size
      guard += 1
    }
    -1
  }

  /** End (exclusive, 0-based) of the box whose payload starts at
    * `payload` — the size field sits 8 bytes before. */
  private def boxEnd(b: Array[Byte], payload: Long): Long =
    payload - 8 + be4(b, payload.toInt - 8)

  /** Decode the sample table: sizes from `stsz`, absolute offsets from
    * `stco` under the one-chunk-per-sample layout (general chunking
    * would also consult `stsc`; the common faststart single-sample-
    * per-chunk shape is what the fixture generator emits and what this
    * reads). Null on non-BMFF bytes or a missing/oversized table. */
  def decodeSamples(mp4: Array[Byte], maxSamples: Int): Array[Sample] = {
    if (mp4 == null || mp4.length < 16) return null
    if (!(mp4(4) == 'f' && mp4(5) == 't' && mp4(6) == 'y' && mp4(7) == 'p'))
      return null
    val n = mp4.length.toLong
    val moov = findBox(mp4, 0, n, "moov")
    if (moov < 0) return null
    val trak = findBox(mp4, moov, boxEnd(mp4, moov), "trak")
    if (trak < 0) return null
    val mdia = findBox(mp4, trak, boxEnd(mp4, trak), "mdia")
    if (mdia < 0) return null
    val minf = findBox(mp4, mdia, boxEnd(mp4, mdia), "minf")
    if (minf < 0) return null
    val stbl = findBox(mp4, minf, boxEnd(mp4, minf), "stbl")
    if (stbl < 0) return null
    val stblEnd = boxEnd(mp4, stbl)
    val stsz = findBox(mp4, stbl, stblEnd, "stsz")
    val stco = findBox(mp4, stbl, stblEnd, "stco")
    if (stsz < 0 || stco < 0) return null
    // stsz v0: [ver+flags][sample_size][sample_count][sizes...]
    val fixedSize = be4(mp4, stsz.toInt + 4)
    val count = be4(mp4, stsz.toInt + 8)
    val coCount = be4(mp4, stco.toInt + 4)
    if (count != coCount || count > maxSamples || count < 0) return null
    if (stsz + 12 + 4 * count > stblEnd || stco + 8 + 4 * count > stblEnd)
      return null
    val out = new Array[Sample](count.toInt)
    var i = 0
    while (i < count) {
      val size = if (fixedSize != 0) fixedSize
        else be4(mp4, (stsz + 12 + 4 * i).toInt)
      val off = be4(mp4, (stco + 8 + 4 * i).toInt)
      // size == 0 with off == n passes `off + size > n` but the
      // first_byte read below would index past the buffer — a zero-size
      // sample is malformed, treat it like any other dirty table
      if (size <= 0 || off + size > n) return null
      var s = 0L; var j = 0
      while (j < size) { s += u8(mp4, (off + j).toInt); j += 1 }
      out(i) = Sample(i, off, size, u8(mp4, off.toInt), s)
      i += 1
    }
    out
  }

  /** Encode a minimal REAL ISO-BMFF file: ftyp + moov(trak(mdia(minf(
    * stbl(stsz + stco))))) + mdat, one chunk per sample. Sample
    * contract, replayable by any engine:
    *   size(i)  = 8 + (seed + i·7) mod 24
    *   byte(i,j) = (seed + i·31 + j·11) mod 256
    * and stco holds the true absolute offsets into mdat. */
  def encodeSamples(seed: Long, nSamples: Int): Array[Byte] = {
    require(nSamples >= 0 && nSamples <= 4096, s"bad nSamples=$nSamples")
    val sizes = Array.tabulate(nSamples)(i => (8 + (seed + i * 7) % 24).toInt)
    val payload = sizes.sum
    val stszLen = 20 + 4 * nSamples
    val stcoLen = 16 + 4 * nSamples
    val stblLen = 8 + stszLen + stcoLen
    val minfLen = 8 + stblLen
    val mdiaLen = 8 + minfLen
    val trakLen = 8 + mdiaLen
    val moovLen = 8 + trakLen
    val total = 16 + moovLen + 8 + payload
    val out = new Array[Byte](total)
    var p = 0
    def w4(v: Long): Unit = {
      out(p) = ((v >> 24) & 0xFF).toByte; out(p + 1) = ((v >> 16) & 0xFF).toByte
      out(p + 2) = ((v >> 8) & 0xFF).toByte; out(p + 3) = (v & 0xFF).toByte
      p += 4
    }
    def ascii(s: String): Unit = { s.foreach(c => { out(p) = c.toByte; p += 1 }) }
    w4(16); ascii("ftyp"); ascii("isom"); w4(0)
    w4(moovLen); ascii("moov")
    w4(trakLen); ascii("trak")
    w4(mdiaLen); ascii("mdia")
    w4(minfLen); ascii("minf")
    w4(stblLen); ascii("stbl")
    w4(stszLen); ascii("stsz"); w4(0); w4(0); w4(nSamples.toLong)
    sizes.foreach(sz => w4(sz.toLong))
    w4(stcoLen); ascii("stco"); w4(0); w4(nSamples.toLong)
    val mdatPayload = 16 + moovLen + 8
    var acc = mdatPayload.toLong
    sizes.foreach { sz => w4(acc); acc += sz }
    w4(8L + payload); ascii("mdat")
    var i = 0
    while (i < nSamples) {
      var j = 0
      while (j < sizes(i)) {
        out(p) = (((seed + i * 31 + j * 11) % 256 + 256) % 256).toByte
        p += 1; j += 1
      }
      i += 1
    }
    out
  }
}

/** Sample-table extraction from an MP4 binary column: one array of
  * per-sample structs per row (explode downstream). ok=false + empty
  * list on anything undecodable — never a throw. */
case class Mp4SampleTable(child: Expression, maxSamples: Int)
    extends UnaryExpression with CodegenFallback {

  private val sampleType = StructType(Seq(
    StructField("sample_idx", LongType, nullable = false),
    StructField("sample_offset", LongType, nullable = false),
    StructField("sample_size", LongType, nullable = false),
    StructField("first_byte", LongType, nullable = false),
    StructField("byte_sum", LongType, nullable = false)))

  override def dataType: DataType = StructType(Seq(
    StructField("ok", BooleanType, nullable = false),
    StructField("samples", ArrayType(sampleType, containsNull = false),
      nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mp4_sample_table requires binary, got $other")
  }

  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val bytes = child.eval(input) match {
      case null => null
      case b => b.asInstanceOf[Array[Byte]]
    }
    val samples = Mp4Kernel.decodeSamples(bytes, maxSamples)
    if (samples == null)
      return InternalRow(false, new GenericArrayData(Array.empty[Any]))
    val rows: Array[Any] = samples.map(s => InternalRow(
      s.idx.toLong, s.offset, s.size, s.firstByte.toLong, s.byteSum))
    InternalRow(true, new GenericArrayData(rows): ArrayData)
  }

  override protected def withNewChildInternal(newChild: Expression): Mp4SampleTable =
    copy(child = newChild)

  override def prettyName: String = "mp4_sample_table"
}

object Mp4SampleTable {
  def apply(c: Column, maxSamples: Int = 4096): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      Mp4SampleTable(org.apache.spark.sql.graftbridge.Bridge.expression(c),
        maxSamples))
}

/** Deterministic sample-bearing MP4 fixture generator (distributed). */
case class Mp4SamplesEncode(seed: Expression, nSamples: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(seed, nSamples)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c => c.dataType == LongType || c.dataType == IntegerType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "mp4_samples_encode requires integer children")

  override def eval(input: InternalRow): Any = {
    def longOf(e: Expression): java.lang.Long = e.eval(input) match {
      case null => null
      case i: java.lang.Integer => i.longValue()
      case l: java.lang.Long => l
    }
    val s = longOf(seed); val n = longOf(nSamples)
    if (s == null || n == null || n < 0 || n > 4096) return null
    Mp4Kernel.encodeSamples(s.longValue(), n.intValue())
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Mp4SamplesEncode =
    Mp4SamplesEncode(newChildren(0), newChildren(1))

  override def prettyName: String = "mp4_samples_encode"
}

object Mp4SamplesEncode {
  def apply(seed: Column, nSamples: Column): Column = {
    val b = org.apache.spark.sql.graftbridge.Bridge
    b.column(Mp4SamplesEncode(b.expression(seed), b.expression(nSamples)))
  }
}
