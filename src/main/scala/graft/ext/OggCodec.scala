package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Ogg container walk — the triage census sniffs "OggS" but, before
  * r15, learned nothing else. The page grammar (RFC 3533) is exact
  * integer plumbing with zero DSP: each page is a 27-byte header
  * (capture pattern, version 0, header-type flags, granule position
  * le64, serial le32, sequence le32, CRC le32, segment count) + a
  * lacing table (255 = packet continues, <255 ends it) + payload.
  *
  * Every page's CRC is VERIFIED (the Ogg CRC-32: polynomial
  * 0x04C11DB7, init 0, no reflection, no final xor, computed with the
  * CRC field zeroed) — a file with any corrupt page nulls, the
  * verified-or-nothing house contract (same bar as the FLAC frame
  * walk). Packets are counted by lacing closure across pages
  * (continued packets join), and the FIRST packet is probed for the
  * two public identification headers:
  *   Vorbis: 0x01 "vorbis", channels u8 @11, rate u32le @12
  *   Opus:   "OpusHead",     channels u8 @9,  rate u32le @12
  * Neither requires decoding a single audio sample. Unknown first
  * packets keep codec/rate/channels null (counted structure only).
  * Dirty bytes → null, never a throw (fuzz battery entry). */
private[ext] object OggKernel {

  final case class Ogg(nPages: Int, nPackets: Int, nStreams: Int,
      codec: String, channels: java.lang.Long,
      sampleRate: java.lang.Long, lastGranule: Long, serial: Long,
      vendor: String, artist: String, title: String,
      nComments: java.lang.Long)

  private final class Stream {
    var packetOpen = false
    // the first TWO packets: ident header + comment header
    val headBufs = Array(new java.io.ByteArrayOutputStream(),
      new java.io.ByteArrayOutputStream())
    val headPackets = new Array[Array[Byte]](2)
    var headIdx = 0
    var lastGranule = 0L
    var nPackets = 0
  }

  private final val MaxPages = 100000

  /** Ogg CRC-32 table: poly 0x04C11DB7, MSB-first. */
  private val CrcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var r = i << 24
      var j = 0
      while (j < 8) {
        r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04C11DB7 else r << 1
        j += 1
      }
      t(i) = r
      i += 1
    }
    t
  }

  private[ext] def crc(b: Array[Byte], off: Int, len: Int,
      zeroFrom: Int, zeroLen: Int): Int = {
    var r = 0
    var i = 0
    while (i < len) {
      val v =
        if (i + off >= zeroFrom && i + off < zeroFrom + zeroLen) 0
        else b(off + i) & 0xFF
      r = (r << 8) ^ CrcTable(((r >>> 24) ^ v) & 0xFF)
      i += 1
    }
    r
  }

  private def le4(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xFFL)) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)

  private def le8(b: Array[Byte], i: Int): Long =
    le4(b, i) | (le4(b, i + 4) << 32)

  def parse(b: Array[Byte]): Ogg = {
    if (b == null || b.length < 28) return null
    if (!(b(0) == 'O' && b(1) == 'g' && b(2) == 'g' && b(3) == 'S'))
      return null
    var pos = 0
    var nPages = 0
    // r15 second pass: real Ogg files MULTIPLEX logical streams —
    // pages of different serials interleave, and packet continuation
    // is PER-SERIAL state. LinkedHashMap keeps first-seen order; the
    // first stream is the reported one (codec/granule/serial).
    val streams =
      new java.util.LinkedHashMap[Long, Stream]()
    while (pos < b.length && nPages < MaxPages) {
      if (pos + 27 > b.length) return null
      if (!(b(pos) == 'O' && b(pos + 1) == 'g' && b(pos + 2) == 'g' &&
        b(pos + 3) == 'S')) return null
      if (b(pos + 4) != 0) return null // stream structure version
      val flags = b(pos + 5) & 0xFF
      val granule = le8(b, pos + 6)
      val pageSerial = le4(b, pos + 14)
      val storedCrc = le4(b, pos + 22)
      val nSegs = b(pos + 26) & 0xFF
      if (pos + 27 + nSegs > b.length) return null
      var payloadLen = 0
      var s = 0
      while (s < nSegs) { payloadLen += b(pos + 27 + s) & 0xFF; s += 1 }
      val pageLen = 27 + nSegs + payloadLen
      if (pos + pageLen > b.length) return null
      val computed = crc(b, pos, pageLen, pos + 22, 4)
      if ((computed & 0xFFFFFFFFL) != storedCrc) return null
      var st = streams.get(pageSerial)
      if (st == null) {
        // a stream's first page must carry BOS and not continuation
        if ((flags & 2) == 0 || (flags & 1) != 0) return null
        if (streams.size >= 64) return null
        st = new Stream
        streams.put(pageSerial, st)
      } else {
        // continued-packet flag must agree with this stream's carry
        if (((flags & 1) != 0) != st.packetOpen) return null
      }
      var dataOff = pos + 27 + nSegs
      s = 0
      while (s < nSegs) {
        val lace = b(pos + 27 + s) & 0xFF
        if (st.headIdx < 2 && st.headBufs(st.headIdx).size() < (1 << 20))
          st.headBufs(st.headIdx).write(b, dataOff, lace)
        if (lace < 255) {
          st.nPackets += 1
          st.packetOpen = false
          if (st.headIdx < 2) {
            st.headPackets(st.headIdx) =
              st.headBufs(st.headIdx).toByteArray
            st.headIdx += 1
          }
        } else st.packetOpen = true
        dataOff += lace
        s += 1
      }
      st.lastGranule = granule
      nPages += 1
      pos += pageLen
    }
    if (nPages == 0 || streams.isEmpty) return null
    val first = streams.values().iterator().next()
    val serial = streams.keySet().iterator().next()
    var nPackets = 0
    val it = streams.values().iterator()
    while (it.hasNext) nPackets += it.next().nPackets
    val lastGranule = first.lastGranule
    var codec: String = null
    var channels: java.lang.Long = null
    var rate: java.lang.Long = null
    val fp = first.headPackets(0)
    if (fp != null && fp.length >= 16) {
      if (fp(0) == 1 && fp(1) == 'v' && fp(2) == 'o' && fp(3) == 'r' &&
        fp(4) == 'b' && fp(5) == 'i' && fp(6) == 's') {
        codec = "vorbis"
        channels = (fp(11) & 0xFF).toLong
        rate = le4(fp, 12)
      } else if (fp(0) == 'O' && fp(1) == 'p' && fp(2) == 'u' &&
        fp(3) == 's' && fp(4) == 'H' && fp(5) == 'e' && fp(6) == 'a' &&
        fp(7) == 'd') {
        codec = "opus"
        channels = (fp(9) & 0xFF).toLong
        rate = le4(fp, 12)
      }
    }
    // comment header (the audio EXIF): packet 2 of the first stream —
    // Vorbis 0x03"vorbis" or "OpusTags", then the shared
    // vendor_len/vendor/count/(len,"KEY=value")* layout. Strict UTF-8,
    // verified-or-nothing: any malformed length or string nulls ALL
    // comment fields (never a partial tag set).
    var vendor: String = null
    var artist: String = null
    var title: String = null
    var nComments: java.lang.Long = null
    val cp = first.headPackets(1)
    val cOff =
      if (cp == null) -1
      else if (cp.length >= 7 && cp(0) == 3 && cp(1) == 'v' &&
        cp(2) == 'o' && cp(3) == 'r' && cp(4) == 'b' && cp(5) == 'i' &&
        cp(6) == 's') 7
      else if (cp.length >= 8 && cp(0) == 'O' && cp(1) == 'p' &&
        cp(2) == 'u' && cp(3) == 's' && cp(4) == 'T' && cp(5) == 'a' &&
        cp(6) == 'g' && cp(7) == 's') 8
      else -1
    if (cOff > 0) {
      val parsed = parseComments(cp, cOff)
      if (parsed != null) {
        vendor = parsed._1
        nComments = parsed._2.length.toLong
        for ((k, v) <- parsed._2) {
          val kl = k.toLowerCase
          if (kl == "artist" && artist == null) artist = v
          if (kl == "title" && title == null) title = v
        }
      }
    }
    Ogg(nPages, nPackets, streams.size, codec, channels, rate,
      lastGranule, serial, vendor, artist, title, nComments)
  }

  /** (vendor, [(key, value)...]) or null on any malformed frame. */
  private def parseComments(cp: Array[Byte], off0: Int)
      : (String, Array[(String, String)]) = {
    var off = off0
    def le4i(): Long = {
      if (off + 4 > cp.length) return -1L
      val v = le4(cp, off); off += 4; v
    }
    def utf8(len: Long): String = {
      if (len < 0 || len > 65536 || off + len > cp.length) return null
      val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      val s = try dec.decode(java.nio.ByteBuffer.wrap(cp, off,
        len.toInt)).toString
      catch { case _: java.nio.charset.CharacterCodingException =>
        return null }
      off += len.toInt
      s
    }
    val vlen = le4i()
    if (vlen < 0) return null
    val vendor = utf8(vlen)
    if (vendor == null) return null
    val n = le4i()
    if (n < 0 || n > 1024) return null
    val out = new Array[(String, String)](n.toInt)
    var i = 0
    while (i < n) {
      val clen = le4i()
      if (clen < 0) return null
      val c = utf8(clen)
      if (c == null) return null
      val eq = c.indexOf('=')
      if (eq < 1) return null // a tag without a key is malformed
      out(i) = (c.substring(0, eq), c.substring(eq + 1))
      i += 1
    }
    (vendor, out)
  }
}

/** Ogg structure of a binary column: (ok, n_pages, n_packets,
  * n_streams, codec, channels, sample_rate, last_granule, serial) —
  * every page CRC-verified, per-serial packet closure (real Ogg
  * multiplexes logical streams), ident header of the FIRST stream
  * probed without DSP (see [[OggKernel]]). ok=false with null fields
  * on dirty bytes or any CRC mismatch. */
case class OggMeta(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("ok", BooleanType, nullable = false),
    StructField("n_pages", LongType),
    StructField("n_packets", LongType),
    StructField("n_streams", LongType),
    StructField("codec", StringType),
    StructField("channels", LongType),
    StructField("sample_rate", LongType),
    StructField("last_granule", LongType),
    StructField("serial", LongType),
    StructField("vendor", StringType),
    StructField("artist", StringType),
    StructField("title", StringType),
    StructField("n_comments", LongType)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ogg_meta requires binary, got $other")
  }

  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val bytes = child.eval(input) match {
      case null => null
      case v => v.asInstanceOf[Array[Byte]]
    }
    val m = OggKernel.parse(bytes)
    if (m == null)
      return InternalRow(false, null, null, null, null, null, null,
        null, null, null, null, null, null)
    def s(v: String): Any =
      if (v == null) null else UTF8String.fromString(v)
    InternalRow(true, m.nPages.toLong, m.nPackets.toLong,
      m.nStreams.toLong, s(m.codec),
      m.channels, m.sampleRate, m.lastGranule, m.serial,
      s(m.vendor), s(m.artist), s(m.title), m.nComments)
  }

  override protected def withNewChildInternal(
      newChild: Expression): OggMeta = copy(child = newChild)

  override def prettyName: String = "ogg_meta"
}

object OggMeta {
  def apply(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      OggMeta(org.apache.spark.sql.graftbridge.Bridge.expression(c)))
}

/** Deterministic REAL Ogg fixture (verified CRCs — the encoder runs
  * the same polynomial the walk checks). Per seed s, nPages body
  * pages:
  *   codec     = vorbis (even s) | opus (odd s); the BOS page holds
  *               the real ident header
  *   channels  = 1 + s mod 2
  *   rate      = {8000,11025,16000,22050,44100}[s mod 5]
  *   serial    = 1 + s mod 100000
  *   body page p (0-based): 1 + (s+p) mod 3 packets, packet q of
  *     length 5 + (s*3 + p*7 + q*11) mod 40 bytes, byte j =
  *     (s*13 + p*31 + q*7 + j) mod 256; granule (p+1)*576; the last
  *     page carries the EOS flag
  * Every stream's second page carries its REAL comment header (the
  * audio EXIF): vendor `graft-fixture`, comments ARTIST=artist-(s mod
  * 13), TITLE=title-(s mod 9), plus GENRE=g(s mod 4) on odd s — so
  * vendor/artist/title/n_comments = 2 + s mod 2 replay as exact
  * strings through the Vorbis-comment/OpusTags layout.
  * When s mod 3 == 0 a SECOND logical stream multiplexes in (r15
  * second pass): serial+1, the opposite ident codec, one page after
  * every primary page (1 packet of 6 + (s+p) mod 20 bytes, byte j =
  * (s*17 + p*23 + j) mod 256, granule (p+1)*100) — the reported
  * codec/rate/granule/comments stay the FIRST stream's, per-serial
  * packet closure is load-bearing, and:
  *   n_streams = 1 + [s mod 3 == 0]
  *   n_pages   = (2 + nPages) · n_streams
  *   n_packets = 2 + Σ_p (1 + (s+p) mod 3)
  *               + [s mod 3 == 0] · (2 + nPages) */
case class OggEncode(seed: Expression, nPages: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(seed, nPages)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ogg_encode requires 2 longs, got ${children.map(_.dataType)}")

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    val Seq(s, n) = vs.map(_.asInstanceOf[Long])
    if (n < 0 || n > 256) return null
    OggEncode.encode(s, n.toInt)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): OggEncode =
    OggEncode(newChildren(0), newChildren(1))

  override def prettyName: String = "ogg_encode"
}

object OggEncode {

  private val Rates = Array(8000L, 11025L, 16000L, 22050L, 44100L)

  private def page(flags: Int, granule: Long, serial: Long, seq: Long,
      packets: Array[Array[Byte]]): Array[Byte] = {
    val lacing = new java.io.ByteArrayOutputStream()
    val payload = new java.io.ByteArrayOutputStream()
    for (p <- packets) {
      var rem = p.length
      var off = 0
      // all fixture packets are < 255 bytes, but keep the general form
      while (rem >= 255) { lacing.write(255); rem -= 255 }
      lacing.write(rem)
      payload.write(p, off, p.length - off)
    }
    val lb = lacing.toByteArray
    val pb = payload.toByteArray
    val out = new Array[Byte](27 + lb.length + pb.length)
    out(0) = 'O'; out(1) = 'g'; out(2) = 'g'; out(3) = 'S'
    out(4) = 0
    out(5) = flags.toByte
    var i = 0
    while (i < 8) { out(6 + i) = (granule >>> (8 * i)).toByte; i += 1 }
    i = 0
    while (i < 4) { out(14 + i) = (serial >>> (8 * i)).toByte; i += 1 }
    i = 0
    while (i < 4) { out(18 + i) = (seq >>> (8 * i)).toByte; i += 1 }
    // CRC filled below (bytes 22-25 stay zero during the computation)
    out(26) = lb.length.toByte
    System.arraycopy(lb, 0, out, 27, lb.length)
    System.arraycopy(pb, 0, out, 27 + lb.length, pb.length)
    val c = OggKernel.crc(out, 0, out.length, 22, 4)
    i = 0
    while (i < 4) { out(22 + i) = (c >>> (8 * i)).toByte; i += 1 }
    out
  }

  private def identFor(vorbis: Boolean, channels: Int, rate: Long)
      : Array[Byte] =
    if (vorbis) {
      // Vorbis identification header (30 bytes)
      val b = new Array[Byte](30)
      b(0) = 1
      "vorbis".getBytes("US-ASCII").copyToArray(b, 1)
      // version 0 @7..10
      b(11) = channels.toByte
      var i = 0
      while (i < 4) { b(12 + i) = (rate >>> (8 * i)).toByte; i += 1 }
      // blocksizes + framing bit: fixed legal values
      b(28) = 0x66; b(29) = 1
      b
    } else {
      // OpusHead (19 bytes)
      val b = new Array[Byte](19)
      "OpusHead".getBytes("US-ASCII").copyToArray(b, 0)
      b(8) = 1 // version
      b(9) = channels.toByte
      b(10) = 0x38; b(11) = 1 // pre-skip 312
      var i = 0
      while (i < 4) { b(12 + i) = (rate >>> (8 * i)).toByte; i += 1 }
      b
    }

  private def commentPacket(vorbis: Boolean, s: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    if (vorbis) {
      out.write(3)
      out.write("vorbis".getBytes("US-ASCII"))
    } else out.write("OpusTags".getBytes("US-ASCII"))
    def le32(v: Int): Unit = {
      out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
      out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF)
    }
    def str(t: String): Unit = {
      val b = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      le32(b.length); out.write(b, 0, b.length)
    }
    str("graft-fixture")
    val comments = Seq(s"ARTIST=artist-${s % 13}",
      s"TITLE=title-${s % 9}") ++
      (if (s % 2 == 1) Seq(s"GENRE=g${s % 4}") else Seq.empty)
    le32(comments.length)
    comments.foreach(str)
    if (vorbis) out.write(1) // framing bit
    out.toByteArray
  }

  def encode(s0: Long, nPages: Int): Array[Byte] = {
    val s = ((s0 % 1000003) + 1000003) % 1000003
    val serial = 1 + s % 100000
    val channels = (1 + s % 2).toInt
    val rate = Rates((s % 5).toInt)
    val muxed = s % 3 == 0
    val ident = identFor(s % 2 == 0, channels, rate)
    val out = new java.io.ByteArrayOutputStream()
    out.write(page(2, 0L, serial, 0L, Array(ident))) // BOS, stream 1
    if (muxed) {
      val ident2 = identFor(s % 2 != 0, (1 + (s + 1) % 2).toInt,
        Rates(((s + 1) % 5).toInt))
      out.write(page(2, 0L, serial + 1, 0L, Array(ident2)))
    }
    // comment headers on each stream's second page (the real layout)
    out.write(page(0, 0L, serial, 1L,
      Array(commentPacket(s % 2 == 0, s))))
    if (muxed)
      out.write(page(0, 0L, serial + 1, 1L,
        Array(commentPacket(s % 2 != 0, s + 1))))
    for (p <- 0 until nPages) {
      val npk = (1 + (s + p) % 3).toInt
      val packets = Array.tabulate(npk) { q =>
        val len = (5 + (s * 3 + p * 7 + q * 11) % 40).toInt
        Array.tabulate[Byte](len)(j =>
          ((s * 13 + p * 31 + q * 7 + j) % 256).toByte)
      }
      val flags = if (p == nPages - 1) 4 else 0
      out.write(page(flags, (p + 1) * 576L, serial, p + 2L, packets))
      if (muxed) {
        val len2 = (6 + (s + p) % 20).toInt
        val pkt2 = Array.tabulate[Byte](len2)(j =>
          ((s * 17 + p * 23 + j) % 256).toByte)
        out.write(page(flags, (p + 1) * 100L, serial + 1, p + 2L,
          Array(pkt2)))
      }
    }
    out.toByteArray
  }

  def apply(seed: Column, nPages: Column): Column = {
    val b = org.apache.spark.sql.graftbridge.Bridge
    b.column(OggEncode(b.expression(seed), b.expression(nPages)))
  }
}
