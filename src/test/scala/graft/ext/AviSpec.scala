package graft.ext

import graft.SparkTestBase

import org.apache.spark.sql.functions._

/** The MJPEG/AVI video pixel leg: container walk against hand-built
  * RIFF bytes (junk chunks, `rec ` nesting, odd-size padding, hostile
  * sizes), frame payloads decoded to the planted per-frame block
  * contract, ImageIO cross-check on the extracted JPEGs, and the
  * cross-space claim — a video frame and a standalone JPEG of the same
  * picture carry the SAME perceptual hash. */
class AviSpec extends SparkTestBase {
  import spark.implicits._

  /** The documented MJPEG block contract, frame seed = seed + f. */
  private def bv(seed: Long, bx: Int, by: Int): Int = {
    val t = bx * 7L + by * 11L + seed * 131L
    val tq = ((t % 251) * (t % 251)) % 251
    ((((tq + bx + by * 3L + seed) % 256) + 256) % 256).toInt
  }

  private def le(v: Long): Array[Byte] = Array(
    (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
    ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
  private def ascii(s: String): Array[Byte] = s.getBytes("US-ASCII")
  private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
    val pad = if ((body.length & 1) == 1) Array(0.toByte)
      else Array.empty[Byte]
    ascii(id) ++ le(body.length.toLong) ++ body ++ pad
  }
  private def riffAvi(children: Array[Byte]): Array[Byte] = {
    val body = ascii("AVI ") ++ children
    ascii("RIFF") ++ le(body.length.toLong) ++ body
  }

  test("encode -> decodeFrames -> JPEG decode replays the per-frame " +
      "block contract; ImageIO agrees on every extracted frame") {
    val avi = AviKernel.encodeMjpeg(seed = 9, nFrames = 3, wB = 3, hB = 2)
    val frames = AviKernel.decodeFrames(avi, 512)
    assert(frames != null && frames.length == 3)
    for (f <- 0 until 3) {
      val g = JpegKernel.decodeGrayY(frames(f))
      assert(g != null && g.width == 24 && g.height == 16, s"frame $f")
      for (by <- 0 until 2; bx <- 0 until 3; dy <- 0 until 8; dx <- 0 until 8)
        assert(g.luma((by * 8 + dy) * 24 + bx * 8 + dx) == bv(9 + f, bx, by),
          s"frame $f block ($bx,$by) px ($dx,$dy)")
      // independent decoder: the chunk payload is a REAL baseline JPEG
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(frames(f)))
      assert(img != null && img.getWidth == 24 && img.getHeight == 16)
      val raster = img.getRaster
      for (by <- 0 until 2; bx <- 0 until 3)
        assert(raster.getSample(bx * 8 + 3, by * 8 + 4, 0) == bv(9 + f, bx, by))
    }
  }

  test("container walk: junk chunks skipped, rec-list frames found, " +
      "odd payloads padded, db chunks accepted") {
    val f0 = Array.tabulate(7)(i => (i * 3 + 1).toByte) // odd size: pad
    val f1 = Array.tabulate(4)(i => (i + 80).toByte)
    val movi = ascii("movi") ++
      chunk("01wb", Array.fill(10)(0x55.toByte)) ++ // audio: skipped
      chunk("00dc", f0) ++
      chunk("LIST", ascii("rec ") ++ chunk("00db", f1)) ++
      chunk("ix00", Array.fill(6)(0.toByte)) // index: skipped
    val avi = riffAvi(
      chunk("LIST", ascii("hdrl") ++ chunk("avih", Array.fill(56)(0.toByte))) ++
        chunk("LIST", movi) ++
        chunk("idx1", Array.fill(16)(0.toByte)))
    val frames = AviKernel.decodeFrames(avi, 512)
    assert(frames != null && frames.length == 2)
    assert(frames(0).toSeq == f0.toSeq)
    assert(frames(1).toSeq == f1.toSeq)
  }

  test("hostile bytes never throw: wrong magic, truncation, oversized " +
      "chunk, missing movi, frame-count cap") {
    assert(AviKernel.decodeFrames(null, 8) == null)
    assert(AviKernel.decodeFrames("RIFFxxxxWAVE".getBytes, 8) == null)
    assert(AviKernel.decodeFrames("short".getBytes, 8) == null)
    val good = AviKernel.encodeMjpeg(1, 2, 1, 1)
    // an SQL-supplied maxFrames near Int.MaxValue must not overflow the
    // walk guard (guardMax is computed in Long) — valid AVIs still decode
    assert(AviKernel.decodeFrames(good, 600000000) != null)
    assert(AviKernel.decodeFrames(good, Int.MaxValue).length == 2)
    // break the RIFF magic
    val dirty = good.clone(); dirty(0) = 'X'
    assert(AviKernel.decodeFrames(dirty, 8) == null)
    // truncate mid-movi
    assert(AviKernel.decodeFrames(
      java.util.Arrays.copyOfRange(good, 0, good.length - 10), 512) == null)
    // a movi chunk whose size runs past the list
    val bad = riffAvi(chunk("LIST", ascii("movi") ++
      ascii("00dc") ++ le(9999L) ++ Array.fill(4)(1.toByte)))
    assert(AviKernel.decodeFrames(bad, 8) == null)
    // no movi list at all
    val noMovi = riffAvi(chunk("LIST",
      ascii("hdrl") ++ chunk("avih", Array.fill(56)(0.toByte))))
    assert(AviKernel.decodeFrames(noMovi, 8) == null)
    // more frames than the cap
    assert(AviKernel.decodeFrames(good, 1) == null)
  }

  test("videoFrameContentStats: per-frame rows share the still-image " +
      "hash space; dirty containers yield zero rows; non-image frames " +
      "keep f_ok=false rows") {
    val docs = spark.range(0, 6).select(col("id").as("doc_id"))
    val vids = Multimodal.syntheticMjpegAviCorpus(docs, "doc_id",
      col("doc_id") % 3, lit(2), lit(2), lit(2))
      .withColumn("content",
        when(col("media_id") === 5,
          expr("concat(X'00', substring(content, 2))"))
          .otherwise(col("content")))
    val out = Multimodal.videoFrameContentStats(vids)
      .orderBy("media_id", "frame_idx").collect()
    assert(out.length == 10) // 5 decodable videos x 2 frames
    assert(!out.exists(_.getLong(0) == 5))
    assert(out.forall(_.getBoolean(3))) // every frame f_ok
    // frame f of video with seed s == standalone JPEG with seed s+f
    val stills = Multimodal.jpegContentStats(
      Multimodal.syntheticBlockJpegCorpus(
        spark.range(0, 4).select(col("id").as("doc_id")),
        "doc_id", col("doc_id"), lit(2), lit(2)))
      .collect().map(r => r.getLong(r.fieldIndex("media_id")) ->
        r.getLong(r.fieldIndex("ahash"))).toMap
    out.foreach { r =>
      val seed = (r.getLong(0) % 3) + r.getLong(1)
      assert(r.getAs[Long]("ahash") == stills(seed),
        s"video ${r.getLong(0)} frame ${r.getLong(1)}")
    }
    // a frame payload that is no image we decode: row kept, f_ok=false
    val junkFrame = riffAvi(chunk("LIST", ascii("movi") ++
      chunk("00dc", Array.fill(12)(0x42.toByte))))
    val jdf = Seq((77L, junkFrame)).toDF("media_id", "content")
    val jr = Multimodal.videoFrameContentStats(jdf).collect()
    assert(jr.length == 1 && !jr(0).getBoolean(3) && jr(0).isNullAt(4))
  }

  test("media triage: every container kind sniffs correctly; short/" +
      "null/junk bytes tag unknown; the census sums per kind") {
    assert(MediaKind.sniff(null) == "unknown")
    assert(MediaKind.sniff("short".getBytes) == "unknown")
    assert(MediaKind.sniff("not media but long enough".getBytes) == "unknown")
    assert(MediaKind.sniff(AviKernel.encodeMjpeg(1, 1, 1, 1)) == "avi")
    assert(MediaKind.sniff(Mp4Kernel.encodeSamples(1, 2)) == "mp4")
    assert(MediaKind.sniff(WavKernel.encodeG711Mono(70, 8000, 7, _ % 256))
      == "wav")
    assert(MediaKind.sniff(TiffKernel.encodeGray8(4, 4, (x, y) => x + y))
      == "tiff")
    assert(MediaKind.sniff(BmpKernel.encodeGray24(4, 4, (x, y) => x + y))
      == "bmp")
    assert(MediaKind.sniff(JpegKernel.encodeGrayBlocks(1, 1, (_, _) => 7))
      == "jpeg")
    // a WAV is RIFF too — the 'WAVE'/'AVI ' discriminator byte matters
    val wav = WavKernel.encodePcm16Mono(40, 8000, _ => 5)
    assert(MediaKind.sniff(wav) == "wav")
    // detection-only kinds (round 13): webp is RIFF as well; avif/heic
    // are ftyp-brand splits off mp4; plus ico/pdf/ogg/flac/webm magics
    def hex(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    assert(MediaKind.sniff(hex("52494646040000005745425000000000")) == "webp")
    assert(MediaKind.sniff(hex("000001000100101000000000")) == "ico")
    assert(MediaKind.sniff("%PDF-1.7 whatever".getBytes) == "pdf")
    assert(MediaKind.sniff(hex("0000001C667479706176696600000000")) == "avif")
    assert(MediaKind.sniff(hex("0000001C667479706865696300000000")) == "heic")
    assert(MediaKind.sniff(hex("0000001C667479706D69663100000000")) == "heic")
    assert(MediaKind.sniff(hex("0000001C6674797069736F6D00000000")) == "mp4")
    assert(MediaKind.sniff("OggS........".getBytes) == "ogg")
    assert(MediaKind.sniff("fLaC........".getBytes) == "flac")
    assert(MediaKind.sniff(hex("1A45DFA3000000000000000000000000")) == "webm")
    val media = Seq(
      (1L, AviKernel.encodeMjpeg(1, 1, 1, 1)),
      (2L, AviKernel.encodeMjpeg(2, 1, 1, 1)),
      (3L, wav),
      (4L, "junk junk junk".getBytes)).toDF("media_id", "content")
    val census = Multimodal.mediaTriageSummary(media)
      .orderBy("kind").collect()
    assert(census.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("avi", 2L), ("unknown", 1L), ("wav", 1L)))
  }
}
