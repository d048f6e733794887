package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** AVIF/HEIC structural metadata — the modern still-image containers
  * the triage census tags (`MediaKind`: ftyp brands avif/avis and
  * heic/heix/hevc/mif1) but, before r15, learned nothing else about.
  * Reference scope (SURVEY §7.4 multimodal): the reference has no
  * media pipeline at all; this leg is the LLM-curation extension.
  *
  * Both formats are ISO-BMFF item files (ISOBMFF = ISO/IEC 14496-12;
  * HEIF = ISO/IEC 23008-12): the image payload needs an AV1/HEVC
  * entropy decoder (codec-scale, out of scope like lossy VP8 —
  * `WebpCodec.scala` scope note), but the DIMENSIONS and item census
  * are plain box grammar with zero codec work:
  *
  *   meta (FullBox)
  *     ├─ pitm : primary item id (u16 at version 0, u32 at 1)
  *     ├─ iinf (FullBox): entry_count (u16 at version 0, else u32)
  *     └─ iprp
  *         └─ ipco: child boxes in PROPERTY-INDEX order, among them
  *            ispe (FullBox): image_width u32, image_height u32
  *
  * This kernel walks exactly that spine and reports the brand, the
  * iinf item count, every `ispe` (count + dims). WHICH ispe is the
  * primary image's is resolved the real way (r15 second pass): `pitm`
  * names the primary item id and the `ipma` association box maps item
  * ids to 1-based `ipco` property indexes (7- or 15-bit indexes per
  * the flags&1 bit, essential bit masked off, u16/u32 item ids per
  * version) — so a thumbnail-first ipco still reports the PRIMARY
  * dims. Files without pitm/ipma fall back to the first ispe (the
  * single-image shape, where they coincide).
  *
  * Box sizes ride the same Long-domain bounds discipline as the RIFF
  * walk after the r14 ADVICE fix: 32-bit sizes are read unsigned into
  * Long, size==1 (64-bit largesize) and size==0 (to-EOF) are honored,
  * and any box that escapes its parent's extent nulls the row. Dirty
  * bytes → null, never a throw (fuzz battery entry). */
private[ext] object BmffMetaKernel {

  final case class Meta(brand: String, nItems: Int, nIspe: Int,
      width: Long, height: Long)

  private def u8(b: Array[Byte], i: Long): Int = b(i.toInt) & 0xFF
  private def be2(b: Array[Byte], i: Long): Int =
    (u8(b, i) << 8) | u8(b, i + 1)
  private def be4(b: Array[Byte], i: Long): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) |
      (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def be8(b: Array[Byte], i: Long): Long =
    (be4(b, i) << 32) | be4(b, i + 4)

  /** One box header at `pos` within [pos, hi): (payloadStart, end,
    * type) or null when malformed. Handles size==0 (extends to hi,
    * legal only for a last top-level box) and size==1 (largesize). */
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

  /** Payload bounds of the first child box of `typ` in [lo, hi). */
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
    val brand = new String(b, 8, 4,
      java.nio.charset.StandardCharsets.US_ASCII) match {
      case "avif" | "avis" => "avif"
      case "heic" | "heix" | "hevc" | "mif1" => "heic"
      case _ => return null // mp4/mov etc.: the video leg's territory
    }
    val n = b.length.toLong
    val meta = findBox(b, 0, n, "meta")
    if (meta == null) return null
    // meta is a FullBox: 4 bytes version/flags precede its children
    val mLo = meta._1 + 4
    val mHi = meta._2
    if (mLo > mHi) return null
    var nItems = 0
    val iinf = findBox(b, mLo, mHi, "iinf")
    if (iinf != null && iinf._1 + 4 <= iinf._2) {
      val ver = u8(b, iinf._1)
      if (ver == 0) {
        if (iinf._1 + 6 > iinf._2) return null
        nItems = be2(b, iinf._1 + 4)
      } else {
        if (iinf._1 + 8 > iinf._2) return null
        val c = be4(b, iinf._1 + 4)
        if (c > Int.MaxValue) return null
        nItems = c.toInt
      }
    }
    val iprp = findBox(b, mLo, mHi, "iprp")
    if (iprp == null) return null
    val ipco = findBox(b, iprp._1, iprp._2, "ipco")
    if (ipco == null) return null
    // collect ipco children IN ORDER (ipma indexes are 1-based into
    // this sequence), remembering each ispe's dims
    val propW = new scala.collection.mutable.ArrayBuffer[Long]()
    val propH = new scala.collection.mutable.ArrayBuffer[Long]()
    var nIspe = 0
    var firstW = -1L
    var firstH = -1L
    var pos = ipco._1
    var guard = 0
    while (pos + 8 <= ipco._2 && guard < 256) {
      val bx = boxAt(b, pos, ipco._2)
      if (bx == null) return null
      if (bx._3 == "ispe") {
        if (bx._1 + 12 > bx._2) return null
        val iw = be4(b, bx._1 + 4)
        val ih = be4(b, bx._1 + 8)
        if (nIspe == 0) { firstW = iw; firstH = ih }
        nIspe += 1
        propW += iw; propH += ih
      } else {
        propW += -1L; propH += -1L
      }
      pos = bx._2
      guard += 1
    }
    if (nIspe == 0) return null
    // primary-item resolution: pitm names the item, ipma maps it to
    // property indexes; the first associated ispe carries the dims
    var w = firstW
    var h = firstH
    val pitm = findBox(b, mLo, mHi, "pitm")
    val ipma = findBox(b, mLo, mHi, "ipma")
    if (pitm != null && ipma != null) {
      val pv = u8(b, pitm._1)
      val primary: Long =
        if (pv == 0) {
          if (pitm._1 + 6 > pitm._2) return null
          be2(b, pitm._1 + 4).toLong
        } else {
          if (pitm._1 + 8 > pitm._2) return null
          be4(b, pitm._1 + 4)
        }
      val av = u8(b, ipma._1)
      val aflags = be4(b, ipma._1) & 0xFFFFFF
      if (ipma._1 + 8 > ipma._2) return null
      val nEntries = be4(b, ipma._1 + 4)
      if (nEntries > 4096) return null
      var q = ipma._1 + 8
      var e = 0L
      var found = false
      while (e < nEntries && !found) {
        val itemId: Long =
          if (av < 1) {
            if (q + 2 > ipma._2) return null
            val v = be2(b, q).toLong; q += 2; v
          } else {
            if (q + 4 > ipma._2) return null
            val v = be4(b, q); q += 4; v
          }
        if (q + 1 > ipma._2) return null
        val nAssoc = u8(b, q); q += 1
        var a = 0
        while (a < nAssoc) {
          var idx = 0
          if ((aflags & 1) == 1) {
            if (q + 2 > ipma._2) return null
            idx = be2(b, q) & 0x7FFF; q += 2
          } else {
            if (q + 1 > ipma._2) return null
            idx = u8(b, q) & 0x7F; q += 1
          }
          if (itemId == primary && !found && idx >= 1 &&
            idx <= propW.length && propW(idx - 1) >= 0) {
            w = propW(idx - 1); h = propH(idx - 1)
            found = true
          }
          a += 1
        }
        if (itemId == primary) found = true // entry consumed either way
        e += 1
      }
    }
    Meta(brand, nItems, nIspe, w, h)
  }
}

/** AVIF/HEIC metadata of a binary column: (ok, brand, n_items, n_ispe,
  * width, height) — dims from the first `ispe` property, item count
  * from `iinf`, zero codec decode (see [[BmffMetaKernel]]). ok=false
  * with null fields on dirty bytes or non-image brands. */
case class BmffImageMeta(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("ok", BooleanType, nullable = false),
    StructField("brand", StringType),
    StructField("n_items", LongType),
    StructField("n_ispe", LongType),
    StructField("width", LongType),
    StructField("height", LongType)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bmff_image_meta requires binary, got $other")
  }

  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val bytes = child.eval(input) match {
      case null => null
      case v => v.asInstanceOf[Array[Byte]]
    }
    val m = BmffMetaKernel.parse(bytes)
    if (m == null) return InternalRow(false, null, null, null, null, null)
    InternalRow(true, UTF8String.fromString(m.brand), m.nItems.toLong,
      m.nIspe.toLong, m.width, m.height)
  }

  override protected def withNewChildInternal(
      newChild: Expression): BmffImageMeta = copy(child = newChild)

  override def prettyName: String = "bmff_image_meta"
}

object BmffImageMeta {
  def apply(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      BmffImageMeta(org.apache.spark.sql.graftbridge.Bridge.expression(c)))
}

/** Deterministic REAL AVIF/HEIC metadata fixture (the box spine is
  * real ISO-BMFF; the codec payload is an honest opaque `mdat` blob —
  * the kernel never reads it). Per seed s, kind k (0=avif, 1=heic):
  *   brand    = avif | mif1
  *   n_items  = 1 + s mod 3
  *   n_ispe   = 1 + s mod 2   (second ispe = a 32x24 thumbnail)
  *   width    = 64 + (s*7) mod 101
  *   height   = 48 + (s*5) mod 67
  * iinf carries version 0 (even s) or 1 (odd s) — both count forms
  * must parse; meta rides version/flags 0. When s mod 4 == 3 the
  * THUMBNAIL ispe is written FIRST and an `ipma` box associates the
  * primary item with the second property — the first-ispe shortcut
  * would report 32x24 there, so the planted dims replay only through
  * the real pitm→ipma→ipco resolution. */
case class BmffMetaEncode(seed: Expression, kind: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(seed, kind)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bmff_meta_encode requires 2 longs, got ${children.map(_.dataType)}")

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    val Seq(s, k) = vs.map(_.asInstanceOf[Long])
    BmffMetaEncode.encode(s, k)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BmffMetaEncode =
    BmffMetaEncode(newChildren(0), newChildren(1))

  override def prettyName: String = "bmff_meta_encode"
}

object BmffMetaEncode {

  private def box(typ: String, payload: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](8 + payload.length)
    val size = out.length
    out(0) = (size >>> 24).toByte; out(1) = (size >>> 16).toByte
    out(2) = (size >>> 8).toByte; out(3) = size.toByte
    System.arraycopy(typ.getBytes("US-ASCII"), 0, out, 4, 4)
    System.arraycopy(payload, 0, out, 8, payload.length)
    out
  }

  private def be4(v: Long): Array[Byte] = Array(
    (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
  private def be2(v: Int): Array[Byte] = Array((v >>> 8).toByte, v.toByte)

  def encode(s: Long, kind: Long): Array[Byte] = {
    val seed = ((s % 1000003) + 1000003) % 1000003
    val brand = if (kind % 2 == 0) "avif" else "mif1"
    val nItems = (1 + seed % 3).toInt
    val nIspe = (1 + seed % 2).toInt
    val w = 64 + (seed * 7) % 101
    val h = 48 + (seed * 5) % 67
    val ftyp = box("ftyp",
      (brand + "    " + brand).getBytes("US-ASCII"))
    val pitm = box("pitm", Array[Byte](0, 0, 0, 0) ++ be2(1))
    val iinfVer = (seed % 2).toInt
    val iinf = box("iinf",
      if (iinfVer == 0) Array[Byte](0, 0, 0, 0) ++ be2(nItems)
      else Array[Byte](1, 0, 0, 0) ++ be4(nItems))
    def ispe(iw: Long, ih: Long) =
      box("ispe", Array[Byte](0, 0, 0, 0) ++ be4(iw) ++ be4(ih))
    val thumbFirst = seed % 4 == 3
    val ipcoKids =
      if (nIspe == 1) ispe(w, h)
      else if (thumbFirst) ispe(32, 24) ++ ispe(w, h)
      else ispe(w, h) ++ ispe(32, 24)
    val iprp = box("iprp", box("ipco", ipcoKids))
    // ipma: item 1 -> property index of the PRIMARY ispe (1-based)
    val primaryIdx = if (thumbFirst) 2 else 1
    val ipma = box("ipma", Array[Byte](0, 0, 0, 0) ++ be4(1) ++
      be2(1) ++ Array[Byte](1, (0x80 | primaryIdx).toByte))
    val meta = box("meta",
      Array[Byte](0, 0, 0, 0) ++ pitm ++ iinf ++ iprp ++ ipma)
    // honest opaque payload: the kernel must never look inside
    val mdat = box("mdat",
      Array.tabulate[Byte](16)(i => ((seed * 13 + i * 7) % 256).toByte))
    ftyp ++ meta ++ mdat
  }

  def apply(seed: Column, kind: Column): Column = {
    val b = org.apache.spark.sql.graftbridge.Bridge
    b.column(BmffMetaEncode(b.expression(seed), b.expression(kind)))
  }
}
