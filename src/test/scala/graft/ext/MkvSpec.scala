package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Matroska/WebM EBML walk: hand-typed element layout pinned
  * independently of [[MkvEncode]] (varint forms, unknown-size
  * Segment), the encoder round trip against its documented contract,
  * and the hostile contract. */
class MkvSpec extends SparkTestBase {

  test("hand-typed EBML: 4-byte ID, 1-byte sizes, unknown-size " +
      "segment extends to EOF, float32 sampling rate") {
    // EBML header: ID 1A45DFA3, size 7: DocType (4282, size 4) "webm"
    val header = Array[Byte](0x1A, 0x45, 0xDF.toByte, 0xA3.toByte,
      0x87.toByte, // size 7 (1-byte varint, marker 0x80)
      0x42, 0x82.toByte, 0x84.toByte, 'w', 'e', 'b', 'm')
    // Segment: ID 18538067, UNKNOWN size (01 FF FF FF FF FF FF FF)
    val segStart = Array[Byte](0x18, 0x53, 0x80.toByte, 0x67,
      0x01, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte,
      0xFF.toByte, 0xFF.toByte, 0xFF.toByte)
    // Tracks > TrackEntry > (TrackType 2, Audio > SamplingFrequency
    // f32 16000.0, Channels 2)
    val audio = Array[Byte](0xE1.toByte, 0x89.toByte, // Audio, size 9
      0xB5.toByte, 0x84.toByte, 0x46, 0x7A, 0x00, 0x00, // f32 16000
      0x9F.toByte, 0x81.toByte, 2)
    val entry = Array[Byte](0xAE.toByte, (0x80 + 3 + audio.length).toByte,
      0x83.toByte, 0x81.toByte, 2) ++ audio
    val tracks = Array[Byte](0x16, 0x54, 0xAE.toByte, 0x6B,
      (0x80 + entry.length).toByte) ++ entry
    val m = MkvKernel.parse(header ++ segStart ++ tracks)
    assert(m != null)
    assert(m.docType == "webm" && m.nTracks == 1)
    assert(m.audioCodec == null) // none written
    assert(m.sampleRate == 16000L && m.channels == 2L)
    assert(m.timestampScale == 1000000L) // the spec default applies
  }

  test("encode -> parse round trip matches the documented contract") {
    val rates = Array(8000L, 16000L, 22050L, 44100L, 48000L)
    for (s <- 0L to 24L) {
      val m = MkvKernel.parse(MkvEncode.encode(s))
      assert(m != null, s"s=$s")
      assert(m.docType == (if (s % 2 == 0) "webm" else "matroska"))
      assert(m.docTypeVersion == 2 + s % 3)
      assert(m.timestampScale == 1000000L)
      assert(m.durationUnits == 1000 + s % 50000)
      val sb = if (s % 5 < 2) 1 else 0
      assert(m.nTracks == (if (s % 3 == 0) 3 else 2) + sb)
      assert(m.videoCodec == (if (s % 2 == 0) "V_VP9" else "V_VP8"))
      assert(m.pixelWidth == 320 + (s * 3) % 1280)
      assert(m.pixelHeight == 240 + (s * 7) % 720)
      assert(m.audioCodec == (if (s % 2 == 0) "A_OPUS" else "A_VORBIS"))
      assert(m.sampleRate == rates((s % 5).toInt))
      assert(m.channels == 1 + s % 2)
      // block census replay (r15 second pass)
      val nClusters = (1 + s % 3).toInt
      assert(m.nClusters == nClusters)
      val expBlocks = (0 until nClusters).map(c => 1 + (s + c) % 2).sum +
        sb * nClusters
      assert(m.nBlocks == expBlocks, s"s=$s blocks=${m.nBlocks}")
      val expBytes = (for {
        c <- 0 until nClusters
        k <- 0 until (1 + (s + c) % 2).toInt
      } yield 8 + (s * 5 + c * 7 + k * 3) % 40).sum + sb * 8L * nClusters
      assert(m.frameBytes == expBytes, s"s=$s bytes=${m.frameBytes}")
      // subtitle text-from-video: exact strings, newline-joined
      assert(m.nSubBlocks == sb * nClusters)
      if (sb == 1) {
        val expText = (0 until nClusters)
          .map(c => s"sub $c w${(s * 3 + c) % 10}").mkString("\n")
        assert(m.subtitleText == expText, s"s=$s text=${m.subtitleText}")
      } else assert(m.subtitleText == null)
    }
  }

  test("BlockGroup/Block census and 2-byte track varints count like " +
      "SimpleBlocks (hand-typed)") {
    val header = Array[Byte](0x1A, 0x45, 0xDF.toByte, 0xA3.toByte,
      0x87.toByte, 0x42, 0x82.toByte, 0x84.toByte, 'w', 'e', 'b', 'm')
    // BlockGroup(0xA0) holding Block(0xA1): 2-byte track varint
    // (0x4003 = track 3), s16 ts, flags, 5 frame bytes
    val block = Array[Byte](0xA1.toByte, 0x8A.toByte,
      0x40, 0x03, 0, 0, 0, 1, 2, 3, 4, 5)
    val group = Array[Byte](0xA0.toByte, (0x80 + block.length).toByte) ++
      block
    // plus one SimpleBlock: 1-byte varint, 4 frame bytes
    val simple = Array[Byte](0xA3.toByte, 0x88.toByte,
      0x81.toByte, 0, 0, 0, 9, 8, 7, 6)
    val clusterKids = group ++ simple
    val cluster = Array[Byte](0x1F, 0x43, 0xB6.toByte, 0x75,
      (0x80 + clusterKids.length).toByte) ++ clusterKids
    val segment = Array[Byte](0x18, 0x53, 0x80.toByte, 0x67,
      (0x80 + cluster.length).toByte) ++ cluster
    val m = MkvKernel.parse(header ++ segment)
    assert(m != null)
    assert(m.nClusters == 1 && m.nBlocks == 2)
    // group frame: 12 - 2(varint) - 3 = wait: payload 10 bytes after
    // the 0xA1 0x89 header; 10 - 2 - 3 = 5. simple: 8 - 1 - 3 = 4.
    assert(m.frameBytes == 9, s"frameBytes=${m.frameBytes}")
  }

  test("subtitle extraction is verified-or-nothing: a malformed-UTF8 " +
      "subtitle frame contributes no text and is not counted") {
    // track 9 declared S_TEXT/UTF8; one good block, one bad block
    val header = Array[Byte](0x1A, 0x45, 0xDF.toByte, 0xA3.toByte,
      0x87.toByte, 0x42, 0x82.toByte, 0x84.toByte, 'w', 'e', 'b', 'm')
    val subEntry = Array[Byte](0xAE.toByte, 0x8A.toByte,
      0xD7.toByte, 0x81.toByte, 9, // TrackNumber 9
      0x83.toByte, 0x81.toByte, 17, // TrackType subtitle
      0x86.toByte, 0x82.toByte, 'S', '_') // CodecID "S_" (wrong)
    // with the WRONG codec id the track is not a subtitle source
    val subEntryGood = Array[Byte](0xAE.toByte, 0x93.toByte,
      0xD7.toByte, 0x81.toByte, 9,
      0x83.toByte, 0x81.toByte, 17,
      0x86.toByte, 0x8B.toByte) ++ "S_TEXT/UTF8".getBytes
    def tracksOf(entry: Array[Byte]) = Array[Byte](0x16, 0x54,
      0xAE.toByte, 0x6B, (0x80 + entry.length).toByte) ++ entry
    val good = Array[Byte](0xA3.toByte, 0x87.toByte,
      0x89.toByte, 0, 0, 0, 'h', 'e', 'y')
    val bad = Array[Byte](0xA3.toByte, 0x86.toByte,
      0x89.toByte, 0, 0, 0, 0xC3.toByte, 0x28.toByte) // broken UTF-8
    def clusterOf(kids: Array[Byte]) = Array[Byte](0x1F, 0x43,
      0xB6.toByte, 0x75, (0x80 + kids.length).toByte) ++ kids
    def segOf(c: Array[Byte], t: Array[Byte]) = Array[Byte](0x18, 0x53,
      0x80.toByte, 0x67, (0x80 + t.length + c.length).toByte) ++ t ++ c
    val m = MkvKernel.parse(header ++
      segOf(clusterOf(good ++ bad), tracksOf(subEntryGood)))
    assert(m != null)
    assert(m.nBlocks == 2) // census counts both
    assert(m.nSubBlocks == 1 && m.subtitleText == "hey")
    val mWrong = MkvKernel.parse(header ++
      segOf(clusterOf(good), tracksOf(subEntry)))
    assert(mWrong != null && mWrong.nSubBlocks == 0 &&
      mWrong.subtitleText == null)
  }

  test("hostile bytes: junk, oversize element, truncations null — " +
      "never a throw") {
    assert(MkvKernel.parse(null) == null)
    assert(MkvKernel.parse(Array.empty[Byte]) == null)
    assert(MkvKernel.parse("utterly not matroska data".getBytes) == null)
    // an element whose declared size escapes the buffer nulls
    val bad = Array[Byte](0x1A, 0x45, 0xDF.toByte, 0xA3.toByte,
      0xC0.toByte, 1, 2, 3) // size 64 with 3 bytes present
    assert(MkvKernel.parse(bad) == null)
    // a 0x00 lead byte (varint > 8 bytes) nulls
    val nul = Array[Byte](0x1A, 0x45, 0xDF.toByte, 0xA3.toByte,
      0x00, 0x01)
    assert(MkvKernel.parse(nul) == null)
    val good = MkvEncode.encode(7L)
    for (cut <- 0 until good.length)
      MkvKernel.parse(java.util.Arrays.copyOf(good, cut))
  }

  test("the DF verb: MkvEncode fixture -> MkvMeta, dirty door") {
    import spark.implicits._
    val df = spark.range(0, 8).toDF("doc_id")
      .select(col("doc_id"),
        MkvEncode(col("doc_id") % 5).as("content"))
      .withColumn("content",
        when(col("doc_id") === 0,
          expr("concat(X'00000000', substring(content, 5))"))
          .otherwise(col("content")))
    val rows = df.select(col("doc_id"), MkvMeta(col("content")).as("m"))
      .select(col("doc_id"), col("m.ok"), col("m.doctype"),
        col("m.pixel_width"), col("m.sample_rate"))
      .as[(Long, Boolean, Option[String], Option[Long], Option[Long])]
      .collect().sortBy(_._1)
    assert(!rows(0)._2 && rows(0)._3.isEmpty)
    val rates = Array(8000L, 16000L, 22050L, 44100L, 48000L)
    for (r <- rows.drop(1)) {
      val s = r._1 % 5
      assert(r._2, s"doc ${r._1}")
      assert(r._3.contains(if (s % 2 == 0) "webm" else "matroska"))
      assert(r._4.contains(320 + (s * 3) % 1280))
      assert(r._5.contains(rates((s % 5).toInt)))
    }
  }
}
