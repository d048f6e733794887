package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ZIP (APPNOTE) member walk — the third archive leg after WARC and
  * tar: dataset dumps and scraped bundles arrive zipped, and "read the
  * bundle" means the central-directory walk, NOT a local-header scan
  * (deflated entries written by streaming writers carry zeroed local
  * sizes + data descriptors, so only the CD knows the truth): find
  * EOCD (PK\05\06) from the end, walk PK\01\02 entries for
  * name/method/sizes/CRC/local offset, slice each member's data past
  * its local header, inflate method-8 members (raw `Inflater`, the
  * same engine as the gzip legs), and VERIFY the CD's CRC32 on the
  * uncompressed bytes — a flipped payload bit is a null archive,
  * never a silently-wrong member. Per-member exact integer signals +
  * payload bytes for the triage/decode legs. */
private[ext] object ZipKernel {

  final case class Member(idx: Int, name: String, size: Long, method: Int,
      firstByte: Int, byteSum: Long, payload: Array[Byte])

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def le2(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le4(b: Array[Byte], i: Int): Long =
    (le2(b, i).toLong | (le2(b, i + 2).toLong << 16)) & 0xFFFFFFFFL

  def members(b: Array[Byte], maxMembers: Int): Array[Member] = {
    if (b == null || b.length < 22) return null
    // EOCD scan from the end (comment can trail, up to 64 KiB)
    var eocd = -1
    var i = b.length - 22
    val lo = math.max(0, b.length - 22 - 65535)
    while (eocd < 0 && i >= lo) {
      if (u8(b, i) == 0x50 && u8(b, i + 1) == 0x4B && u8(b, i + 2) == 0x05 &&
        u8(b, i + 3) == 0x06) eocd = i
      i -= 1
    }
    if (eocd < 0) return null
    val nEntries = le2(b, eocd + 10)
    val cdOff = le4(b, eocd + 16)
    if (nEntries > maxMembers) return null
    if (cdOff < 0 || cdOff >= b.length) return null
    val out = new Array[Member](nEntries)
    var pos = cdOff
    var e = 0
    while (e < nEntries) {
      if (pos + 46 > b.length) return null
      if (!(u8(b, pos.toInt) == 0x50 && u8(b, (pos + 1).toInt) == 0x4B &&
        u8(b, (pos + 2).toInt) == 0x01 && u8(b, (pos + 3).toInt) == 0x02))
        return null
      val p = pos.toInt
      val method = le2(b, p + 10)
      val crc = le4(b, p + 16)
      val csize = le4(b, p + 20)
      val usize = le4(b, p + 24)
      val nameLen = le2(b, p + 28)
      val extraLen = le2(b, p + 30)
      val commentLen = le2(b, p + 32)
      val localOff = le4(b, p + 42)
      if (usize > (1L << 28) || csize > (1L << 28)) return null
      if (p + 46 + nameLen > b.length) return null
      val name = new String(b, p + 46, nameLen,
        java.nio.charset.StandardCharsets.UTF_8)
      // local header: skip ITS name/extra (can differ from the CD's)
      val lp = localOff.toInt
      if (localOff + 30 > b.length) return null
      if (!(u8(b, lp) == 0x50 && u8(b, lp + 1) == 0x4B &&
        u8(b, lp + 2) == 0x03 && u8(b, lp + 3) == 0x04)) return null
      val dataLo = localOff + 30 + le2(b, lp + 26) + le2(b, lp + 28)
      if (dataLo + csize > b.length) return null
      val data = method match {
        case 0 => // stored
          if (csize != usize) return null
          java.util.Arrays.copyOfRange(b, dataLo.toInt,
            (dataLo + csize).toInt)
        case 8 => // deflate
          val inf = new java.util.zip.Inflater(true)
          inf.setInput(b, dataLo.toInt, csize.toInt)
          val outB = new Array[Byte](usize.toInt)
          try {
            var got = 0
            while (got < usize && !inf.finished()) {
              val n = inf.inflate(outB, got, (usize - got).toInt)
              if (n == 0 && inf.needsInput()) return null
              got += n
            }
            if (got != usize) return null
          } catch {
            case _: java.util.zip.DataFormatException => return null
          } finally inf.end()
          outB
        case _ => return null // no other methods in scope
      }
      val check = new java.util.zip.CRC32()
      check.update(data)
      if (check.getValue != crc) return null
      var sum = 0L
      var j = 0
      while (j < data.length) { sum += data(j) & 0xFF; j += 1 }
      out(e) = Member(e, name, usize, method,
        if (data.length > 0) data(0) & 0xFF else -1, sum, data)
      pos += 46 + nameLen + extraLen + commentLen
      e += 1
    }
    out
  }

  /** Encode a REAL zip via the JDK writer (STORED or DEFLATED) under a
    * documented contract:
    *   name(i)   = bundle/doc-(i).bin
    *   size(i)   = 10 + (seed + i·5) mod 80
    *   byte(i,j) = (seed·17 + i·23 + j·9) mod 256 */
  def encode(seed: Long, nMembers: Int, deflated: Boolean): Array[Byte] = {
    require(nMembers >= 1 && nMembers <= 4096, s"bad nMembers=$nMembers")
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    if (!deflated) z.setMethod(java.util.zip.ZipOutputStream.STORED)
    var i = 0
    while (i < nMembers) {
      val size = 10 + (seed + i * 5) % 80
      val payload = Array.tabulate(size.toInt)(j =>
        (((seed * 17 + i * 23 + j * 9) % 256 + 256) % 256).toByte)
      val entry = new java.util.zip.ZipEntry(s"bundle/doc-$i.bin")
      if (!deflated) {
        entry.setMethod(java.util.zip.ZipEntry.STORED)
        entry.setSize(payload.length.toLong)
        entry.setCompressedSize(payload.length.toLong)
        val c = new java.util.zip.CRC32(); c.update(payload)
        entry.setCrc(c.getValue)
      }
      z.putNextEntry(entry)
      z.write(payload)
      z.closeEntry()
      i += 1
    }
    z.close()
    bos.toByteArray
  }
}

/** Zip member extraction from a binary column: one array of per-member
  * structs per row. ok=false + empty list on anything undecodable
  * (including any CRC mismatch) — never a throw. */
case class ZipMembers(child: Expression, maxMembers: Int)
    extends UnaryExpression with CodegenFallback {

  private val memType = StructType(Seq(
    StructField("member_idx", LongType, nullable = false),
    StructField("name", StringType),
    StructField("size", LongType, nullable = false),
    StructField("method", LongType, nullable = false),
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
      s"zip_members requires binary, got $other")
  }

  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val bytes = child.eval(input) match {
      case null => null
      case b => b.asInstanceOf[Array[Byte]]
    }
    val ms = ZipKernel.members(bytes, maxMembers)
    if (ms == null)
      return InternalRow(false, new GenericArrayData(Array.empty[Any]))
    val rows: Array[Any] = ms.map(m => InternalRow(m.idx.toLong,
      if (m.name == null) null else UTF8String.fromString(m.name),
      m.size, m.method.toLong, m.firstByte.toLong, m.byteSum, m.payload))
    InternalRow(true, new GenericArrayData(rows): ArrayData)
  }

  override protected def withNewChildInternal(newChild: Expression): ZipMembers =
    copy(child = newChild)

  override def prettyName: String = "zip_members"
}

object ZipMembers {
  def apply(c: Column, maxMembers: Int = 4096): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      ZipMembers(org.apache.spark.sql.graftbridge.Bridge.expression(c),
        maxMembers))
}

/** Deterministic zip fixture generator (distributed), stored or
  * deflated, under [[ZipKernel.encode]]'s documented contract. */
case class ZipEncode(seed: Expression, nMembers: Expression,
    deflated: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(seed, nMembers, deflated)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.take(2).forall(c =>
      c.dataType == LongType || c.dataType == IntegerType) &&
      children(2).dataType == BooleanType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "zip_encode requires (int, int, boolean)")

  override def eval(input: InternalRow): Any = {
    def longOf(e: Expression): java.lang.Long = e.eval(input) match {
      case null => null
      case i: java.lang.Integer => i.longValue()
      case l: java.lang.Long => l
    }
    val s = longOf(seed); val n = longOf(nMembers)
    val d = deflated.eval(input)
    if (s == null || n == null || d == null || n < 1 || n > 4096) return null
    ZipKernel.encode(s.longValue(), n.intValue(), d.asInstanceOf[Boolean])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZipEncode =
    ZipEncode(newChildren(0), newChildren(1), newChildren(2))

  override def prettyName: String = "zip_encode"
}

object ZipEncode {
  def apply(seed: Column, nMembers: Column, deflated: Column): Column = {
    val b = org.apache.spark.sql.graftbridge.Bridge
    b.column(ZipEncode(b.expression(seed), b.expression(nMembers),
      b.expression(deflated)))
  }
}
