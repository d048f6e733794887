package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** MP4 movie-metadata walk: hand-typed box layouts pinned
  * independently of [[Mp4MovieEncode]], both mvhd versions, the tx3g
  * text contract, and the hostile battery. */
class Mp4MetaSpec extends SparkTestBase {

  private def be2(v: Int) = Array[Byte]((v >>> 8).toByte, v.toByte)
  private def be4(v: Long) = Array[Byte](
    (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
  private def bx(typ: String, payload: Array[Byte]): Array[Byte] =
    be4(payload.length + 8L) ++ typ.getBytes("US-ASCII") ++ payload

  test("hand-typed movie: mvhd v0 fields, vide handler picks tkhd " +
      "16.16 dims and the stsd fourcc") {
    val ftyp = bx("ftyp", "isom    isom".getBytes("ISO-8859-1"))
    val mvhd = bx("mvhd", Array[Byte](0, 0, 0, 0) ++ be4(0) ++ be4(0) ++
      be4(600) ++ be4(12345) ++ new Array[Byte](80))
    val tkhd = bx("tkhd", Array[Byte](0, 0, 0, 7) ++ be4(0) ++ be4(0) ++
      be4(1) ++ be4(0) ++ be4(12345) ++ new Array[Byte](52) ++
      be4(1920L << 16) ++ be4(1080L << 16))
    val hdlr = bx("hdlr", Array[Byte](0, 0, 0, 0) ++ be4(0) ++
      "vide".getBytes ++ new Array[Byte](13))
    val vEntry = be4(86L) ++ "av01".getBytes ++ new Array[Byte](6) ++
      be2(1) ++ new Array[Byte](16) ++ be2(1920) ++ be2(1080) ++
      new Array[Byte](50)
    val stsd = bx("stsd", Array[Byte](0, 0, 0, 0) ++ be4(1) ++ vEntry)
    val trak = bx("trak", tkhd ++ bx("mdia",
      hdlr ++ bx("minf", bx("stbl", stsd))))
    val m = Mp4MetaKernel.parse(ftyp ++ bx("moov", mvhd ++ trak))
    assert(m != null)
    assert(m.timescale == 600 && m.durationUnits == 12345)
    assert(m.nTracks == 1)
    assert(m.videoCodec == "av01" && m.width == 1920 && m.height == 1080)
    assert(m.audioCodec == null && m.nTextSamples == 0 && m.text == null)
  }

  test("tx3g samples: u16-length text walked via stsz/stco, trailing " +
      "modifier bytes ignored, malformed UTF-8 contributes nothing") {
    val ftyp = bx("ftyp", "isom    isom".getBytes("ISO-8859-1"))
    val mvhd = bx("mvhd", Array[Byte](0, 0, 0, 0) ++ be4(0) ++ be4(0) ++
      be4(1000) ++ be4(777) ++ new Array[Byte](80))
    val hdlr = bx("hdlr", Array[Byte](0, 0, 0, 0) ++ be4(0) ++
      "sbtl".getBytes ++ new Array[Byte](13))
    val tEntry = be4(16L) ++ "tx3g".getBytes ++ new Array[Byte](6) ++
      be2(1)
    val stsd = bx("stsd", Array[Byte](0, 0, 0, 0) ++ be4(1) ++ tEntry)
    // sample 1: "hi" + 4 trailing modifier bytes; sample 2: broken
    // UTF-8; sample 3: katakana
    val s1 = be2(2) ++ "hi".getBytes ++ Array[Byte](9, 9, 9, 9)
    val s2 = be2(2) ++ Array[Byte](0xC3.toByte, 0x28)
    val s3b = "アイ".getBytes("UTF-8")
    val s3 = be2(s3b.length) ++ s3b
    // offsets computed after assembling the head; place mdat LAST
    def movie(offs: Seq[Long]): Array[Byte] = {
      val stsz = bx("stsz", Array[Byte](0, 0, 0, 0) ++ be4(0) ++
        be4(3) ++ be4(s1.length.toLong) ++ be4(s2.length.toLong) ++
        be4(s3.length.toLong))
      val stco = bx("stco", Array[Byte](0, 0, 0, 0) ++ be4(3) ++
        offs.flatMap(o => be4(o)).toArray)
      val trak = bx("trak", bx("mdia",
        hdlr ++ bx("minf", bx("stbl", stsd ++ stsz ++ stco))))
      ftyp ++ bx("moov", mvhd ++ trak)
    }
    val head = movie(Seq(0L, 0L, 0L))
    val base = head.length + 8L
    val full = movie(Seq(base, base + s1.length,
      base + s1.length + s2.length)) ++
      bx("mdat", s1 ++ s2 ++ s3)
    val m = Mp4MetaKernel.parse(full)
    assert(m != null)
    assert(m.nTextSamples == 2, s"n=${m.nTextSamples}") // s2 dropped
    assert(m.text == "hi\nアイ", s"text=${m.text}")
  }

  test("encode -> parse round trip matches the documented contract") {
    val rates = Array(8000L, 16000L, 22050L, 44100L, 48000L)
    for (s <- 0L to 26L) {
      val m = Mp4MetaKernel.parse(Mp4MovieEncode.encode(s))
      assert(m != null, s"s=$s")
      assert(m.timescale == 1000L)
      assert(m.durationUnits == 5000 + s % 90000)
      val tx = if (s % 4 < 2) 1 else 0
      assert(m.nTracks == 2 + tx)
      assert(m.videoCodec == (if (s % 2 == 0) "avc1" else "hvc1"))
      assert(m.width == 320 + (s * 3) % 1280)
      assert(m.height == 240 + (s * 7) % 720)
      assert(m.audioCodec == "mp4a")
      assert(m.sampleRate == rates((s % 5).toInt))
      assert(m.channels == 1 + s % 2)
      assert(m.nTextSamples == tx * (1 + s % 3))
      if (tx == 1) {
        val exp = (0 until (1 + s % 3).toInt)
          .map(t => s"cue $t q${(s * 7 + t) % 10}").mkString("\n")
        assert(m.text == exp, s"s=$s text=${m.text}")
      } else assert(m.text == null)
    }
  }

  test("hostile bytes: junk, missing moov/mvhd, truncations null — " +
      "never a throw") {
    assert(Mp4MetaKernel.parse(null) == null)
    assert(Mp4MetaKernel.parse(Array.empty[Byte]) == null)
    assert(Mp4MetaKernel.parse("certainly not a movie file".getBytes)
      == null)
    val ftyp = bx("ftyp", "isom    isom".getBytes("ISO-8859-1"))
    assert(Mp4MetaKernel.parse(ftyp) == null) // no moov
    assert(Mp4MetaKernel.parse(ftyp ++ bx("moov", Array.empty[Byte]))
      == null) // no mvhd
    val good = Mp4MovieEncode.encode(5L)
    for (cut <- 0 until good.length)
      Mp4MetaKernel.parse(java.util.Arrays.copyOf(good, cut))
  }

  test("the DF verb: Mp4MovieEncode fixture -> Mp4MovieMeta, dirty " +
      "door") {
    import spark.implicits._
    val df = spark.range(0, 9).toDF("doc_id")
      .select(col("doc_id"),
        Mp4MovieEncode(col("doc_id") % 7).as("content"))
      .withColumn("content",
        when(col("doc_id") === 0,
          expr("concat(X'00000000', substring(content, 5))"))
          .otherwise(col("content")))
    val rows = df.select(col("doc_id"),
      Mp4MovieMeta(col("content")).as("m"))
      .select(col("doc_id"), col("m.ok"), col("m.video_codec"),
        col("m.width"), col("m.n_text_samples"))
      .as[(Long, Boolean, Option[String], Option[Long], Option[Long])]
      .collect().sortBy(_._1)
    assert(!rows(0)._2 && rows(0)._3.isEmpty)
    for (r <- rows.drop(1)) {
      val s = r._1 % 7
      assert(r._2, s"doc ${r._1}")
      assert(r._3.contains(if (s % 2 == 0) "avc1" else "hvc1"))
      assert(r._4.contains(320 + (s * 3) % 1280))
      val tx = if (s % 4 < 2) 1 else 0
      assert(r._5.contains(tx * (1 + s % 3)))
    }
  }
}
