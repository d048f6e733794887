package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** POSIX ustar (tar) member walk — the WebDataset container: the
  * standard layout for multimodal training shards is a tar of
  * (sample.jpg, sample.txt, sample.json, …) members streamed in
  * order, so "read the shard" means exactly this: 512-byte headers
  * (octal sizes, verified checksums), payloads padded to block
  * boundaries, two zero blocks at the end. Gzip-membered shards
  * (.tar.gz) ride the same CRC-verified gunzip the WARC leg built.
  * Per-member signals are exact integers (size, first byte, byte sum)
  * plus the payload bytes for the triage/decode legs; a corrupt
  * checksum or truncated member → null, never a partial. */
private[ext] object TarKernel {

  final case class Member(idx: Int, name: String, size: Long,
      typeflag: Int, firstByte: Int, byteSum: Long, payload: Array[Byte])

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF

  /** Parse a NUL/space-terminated octal field; -1 on junk. */
  private def octal(b: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    var i = off
    val end = off + len
    // skip leading spaces
    while (i < end && b(i) == ' ') i += 1
    var any = false
    while (i < end && b(i) != 0 && b(i) != ' ') {
      val c = b(i)
      if (c < '0' || c > '7') return -1L
      v = v * 8 + (c - '0')
      any = true
      i += 1
    }
    if (any) v else -1L
  }

  private def asciiz(b: Array[Byte], off: Int, len: Int): String = {
    var end = off
    while (end < off + len && b(end) != 0) end += 1
    new String(b, off, end - off, java.nio.charset.StandardCharsets.US_ASCII)
  }

  def members(raw: Array[Byte], maxMembers: Int): Array[Member] = {
    if (raw == null || raw.length < 2) return null
    // .tar.gz rides the WARC leg's CRC-verified member gunzip (the
    // compressed stream can be far smaller than one tar block, so
    // gunzip BEFORE any length check)
    val b =
      if ((raw(0) & 0xFF) == 0x1F && (raw(1) & 0xFF) == 0x8B)
        WarcKernel.gunzip(raw)
      else raw
    if (b == null || b.length < 512) return null
    val out = scala.collection.mutable.ArrayBuffer[Member]()
    var pos = 0
    while (pos + 512 <= b.length) {
      // end-of-archive: a zero block
      var allZero = true
      var z = 0
      while (allZero && z < 512) { if (b(pos + z) != 0) allZero = false; z += 1 }
      if (allZero) return out.toArray
      // header checksum: bytes summed with the chksum field as spaces
      val stored = octal(b, pos + 148, 8)
      if (stored < 0) return null
      var sum = 0L
      var signedSum = 0L // historic writers summed SIGNED header bytes
      var i = 0
      while (i < 512) {
        if (i >= 148 && i < 156) { sum += ' '.toInt; signedSum += ' '.toInt }
        else { sum += u8(b, pos + i); signedSum += b(pos + i) }
        i += 1
      }
      // GNU tar accepts either convention; so do we (interop)
      if (sum != stored && signedSum != stored) return null
      val name = asciiz(b, pos, 100)
      val size = octal(b, pos + 124, 12)
      if (size < 0 || size > (1L << 28)) return null
      val typeflag = u8(b, pos + 156) match {
        case 0 => '0'.toInt // old tars: NUL means regular file
        case t => t
      }
      val dataLo = pos + 512
      if (dataLo + size > b.length) return null // truncated member
      if (out.length >= maxMembers) return null
      var bs = 0L
      var j = 0
      while (j < size) { bs += u8(b, dataLo + j); j += 1 }
      val first = if (size > 0) u8(b, dataLo) else -1
      out += Member(out.length, name, size, typeflag, first, bs,
        java.util.Arrays.copyOfRange(b, dataLo, (dataLo + size).toInt))
      val next = dataLo + (((size + 511) / 512) * 512).toInt
      // the member's FULL padded block must be present — a cut mid-pad
      // is a truncated archive; only the trailing zero-block
      // terminator is tolerated missing (streaming writers omit it)
      if (next > b.length) return null
      pos = next
    }
    if (out.nonEmpty) out.toArray else null
  }

  /** Encode a REAL ustar archive under a documented contract:
    *   name(i)    = shard/doc-(i).bin
    *   size(i)    = 10 + (seed + i·7) mod 100
    *   byte(i,j)  = (seed·13 + i·29 + j·7) mod 256
    * with correct checksums, block padding and the two-zero-block
    * terminator. */
  def encode(seed: Long, nMembers: Int): Array[Byte] = {
    require(nMembers >= 1 && nMembers <= 4096, s"bad nMembers=$nMembers")
    val bos = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < nMembers) {
      val size = 10 + (seed + i * 7) % 100
      val payload = Array.tabulate(size.toInt)(j =>
        (((seed * 13 + i * 29 + j * 7) % 256 + 256) % 256).toByte)
      bos.write(header(s"shard/doc-$i.bin", size))
      bos.write(payload)
      val pad = ((size + 511) / 512 * 512 - size).toInt
      bos.write(new Array[Byte](pad))
      i += 1
    }
    bos.write(new Array[Byte](1024)) // two zero blocks
    bos.toByteArray
  }

  /** One ustar header block with a correct checksum. */
  def header(name: String, size: Long): Array[Byte] = {
    val h = new Array[Byte](512)
    def put(off: Int, s: String): Unit = {
      var i = 0
      while (i < s.length) { h(off + i) = s.charAt(i).toByte; i += 1 }
    }
    put(0, name)
    put(100, "0000644"); put(108, "0000000"); put(116, "0000000")
    put(124, f"$size%011o"); put(136, "00000000000")
    h(156) = '0'
    put(257, "ustar"); h(262) = 0; put(263, "00")
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    var sum = 0L
    var i = 0
    while (i < 512) { sum += h(i) & 0xFF; i += 1 }
    put(148, f"$sum%06o")
    h(154) = 0; h(155) = ' '
    h
  }
}

/** Tar member extraction from a binary column (plain or .tar.gz): one
  * array of per-member structs per row. ok=false + empty list on
  * anything undecodable — never a throw. */
case class TarMembers(child: Expression, maxMembers: Int)
    extends UnaryExpression with CodegenFallback {

  private val memType = StructType(Seq(
    StructField("member_idx", LongType, nullable = false),
    StructField("name", StringType),
    StructField("size", LongType, nullable = false),
    StructField("first_byte", LongType, nullable = false),
    StructField("byte_sum", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  override def dataType: DataType = StructType(Seq(
    StructField("ok", BooleanType, nullable = false),
    StructField("members", ArrayType(memType, containsNull = false),
      nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"tar_members requires binary, got $other")
  }

  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val bytes = child.eval(input) match {
      case null => null
      case b => b.asInstanceOf[Array[Byte]]
    }
    val ms = TarKernel.members(bytes, maxMembers)
    if (ms == null)
      return InternalRow(false, new GenericArrayData(Array.empty[Any]))
    val rows: Array[Any] = ms.map(m => InternalRow(m.idx.toLong,
      if (m.name == null) null else UTF8String.fromString(m.name),
      m.size, m.firstByte.toLong, m.byteSum, m.payload))
    InternalRow(true, new GenericArrayData(rows): ArrayData)
  }

  override protected def withNewChildInternal(newChild: Expression): TarMembers =
    copy(child = newChild)

  override def prettyName: String = "tar_members"
}

object TarMembers {
  def apply(c: Column, maxMembers: Int = 4096): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      TarMembers(org.apache.spark.sql.graftbridge.Bridge.expression(c),
        maxMembers))
}

/** Deterministic ustar fixture generator (distributed) under
  * [[TarKernel.encode]]'s documented contract. */
case class TarEncode(seed: Expression, nMembers: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(seed, nMembers)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c => c.dataType == LongType || c.dataType == IntegerType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("tar_encode requires integer children")

  override def eval(input: InternalRow): Any = {
    def longOf(e: Expression): java.lang.Long = e.eval(input) match {
      case null => null
      case i: java.lang.Integer => i.longValue()
      case l: java.lang.Long => l
    }
    val s = longOf(seed); val n = longOf(nMembers)
    if (s == null || n == null || n < 1 || n > 4096) return null
    TarKernel.encode(s.longValue(), n.intValue())
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TarEncode =
    TarEncode(newChildren(0), newChildren(1))

  override def prettyName: String = "tar_encode"
}

object TarEncode {
  def apply(seed: Column, nMembers: Column): Column = {
    val b = org.apache.spark.sql.graftbridge.Bridge
    b.column(TarEncode(b.expression(seed), b.expression(nMembers)))
  }
}
