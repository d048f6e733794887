package graft.ext

import graft.SparkTestBase

import org.apache.spark.sql.functions._

/** The G.711 telephony leg: exact expansion formulas cross-checked
  * against the JDK's own μ-law/A-law codecs (javax.sound.sampled reads
  * our wire bytes and must land on the same 16-bit linear samples),
  * header/format routing, and the DF verb over a mixed-law corpus. */
class G711Spec extends SparkTestBase {
  import spark.implicits._

  /** The documented fixture byte formula. */
  private def fixByte(seed: Long, j: Int): Int =
    ((seed * 37 + j.toLong * 11 + (j.toLong * j % 97)) % 256).toInt

  private def jdkExpand(encoding: javax.sound.sampled.AudioFormat.Encoding,
      payload: Array[Byte]): Array[Int] = {
    import javax.sound.sampled._
    val src = new AudioInputStream(
      new java.io.ByteArrayInputStream(payload),
      new AudioFormat(encoding, 8000f, 8, 1, 1, 8000f, false),
      payload.length.toLong)
    val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      8000f, 16, 1, 2, 8000f, false) // little-endian 16-bit
    val conv = AudioSystem.getAudioInputStream(target, src)
    val bytes = conv.readAllBytes()
    Array.tabulate(bytes.length / 2) { i =>
      val v = (bytes(2 * i) & 0xFF) | ((bytes(2 * i + 1) & 0xFF) << 8)
      if (v >= 0x8000) v - 0x10000 else v
    }
  }

  test("ulawExpand/alawExpand match the JDK codec on every byte value") {
    val all = Array.tabulate(256)(_.toByte)
    val jdkU = jdkExpand(
      javax.sound.sampled.AudioFormat.Encoding.ULAW, all)
    val jdkA = jdkExpand(
      javax.sound.sampled.AudioFormat.Encoding.ALAW, all)
    for (b <- 0 until 256) {
      assert(WavKernel.ulawExpand(b) == jdkU(b), s"ulaw byte $b")
      assert(WavKernel.alawExpand(b) == jdkA(b), s"alaw byte $b")
    }
  }

  test("decodePcm routes format tags: G.711 WAVs expand, other tags " +
      "and bit widths reject") {
    for (law <- Seq(6, 7)) {
      val wav = WavKernel.encodeG711Mono(100, 8000, law, j => fixByte(4, j))
      val pcm = WavKernel.decodePcm(wav)
      assert(pcm != null && pcm.channels == 1 && pcm.sampleRate == 8000 &&
        pcm.samples.length == 100, s"law $law")
      val expand: Int => Int =
        if (law == 6) WavKernel.alawExpand else WavKernel.ulawExpand
      for (j <- 0 until 100)
        assert(pcm.samples(j) == expand(fixByte(4, j)), s"law $law j=$j")
      // an unsupported format tag (IEEE float = 3) in the same header
      val bad = wav.clone(); bad(20) = 3
      assert(WavKernel.decodePcm(bad) == null)
      // a G.711 tag claiming 16 bits is malformed
      val bad16 = wav.clone(); bad16(34) = 16
      assert(WavKernel.decodePcm(bad16) == null)
    }
  }

  test("audioContentStats over a mixed-law corpus: stats are over the " +
      "EXPANDED samples; dirty bytes degrade to ok=false") {
    val docs = spark.range(0, 8).select(col("id").as("doc_id"))
    val media = Multimodal.syntheticG711Corpus(docs, "doc_id",
      col("doc_id") % 3, lit(80), lit(6) + col("doc_id") % 2)
      .withColumn("content",
        when(col("media_id") === 0,
          expr("concat(X'00000000', substring(content, 5))"))
          .otherwise(col("content")))
    val out = Multimodal.audioContentStats(media)
      .orderBy("media_id").collect()
    assert(out.length == 8)
    assert(!out(0).getBoolean(1) && out(0).isNullAt(4)) // dirty row
    for (r <- out.drop(1)) {
      val law = 6 + (r.getLong(0) % 2).toInt
      val seed = r.getLong(0) % 3
      val expand: Int => Int =
        if (law == 6) WavKernel.alawExpand else WavKernel.ulawExpand
      val samples = Array.tabulate(80)(j => expand(fixByte(seed, j)))
      assert(r.getAs[Long]("sum_abs") == samples.map(v => math.abs(v).toLong).sum)
      assert(r.getAs[Long]("peak_abs") == samples.map(v => math.abs(v).toLong).max)
      assert(r.getAs[Long]("sample_rate") == 8000L)
    }
  }

  /** Sun g711.c linear→μ-law companding (the inverse of ulawExpand up
    * to quantization) — test-side only, to build telephone re-encodes
    * of studio PCM. */
  private def linear2ulaw(pcm0: Int): Int = {
    val segEnd = Array(0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF, 0x3FFF, 0x7FFF)
    var pcm = pcm0; var mask = 0xFF
    if (pcm < 0) { pcm = 0x84 - pcm; mask = 0x7F } else pcm += 0x84
    var seg = 0
    while (seg < 8 && pcm > segEnd(seg)) seg += 1
    if (seg >= 8) 0x7F ^ mask
    else (((seg << 4) | ((pcm >> (seg + 3)) & 0xF)) ^ mask) & 0xFF
  }

  private def toneBytes(cls: Long): Array[Byte] =
    Multimodal.syntheticToneCorpus(
        Seq((cls, cls, 0L)).toDF("doc_id", "cls", "bump"), "doc_id",
        col("cls"), col("bump"), lit(320), lit(16000))
      .select("content").as[Array[Byte]].collect()(0)

  test("cross-coding near-dup: a mu-law telephone re-encode of a studio " +
      "PCM clip stays inside the spectral Hamming ball and DROPS in the " +
      "ingest stream") {
    // companding round-trip sanity on every representable magnitude class
    for (v <- Seq(0, 1, -1, 100, -100, 1000, -1000, 8000, -8000, 30000)) {
      val back = WavKernel.ulawExpand(linear2ulaw(v))
      assert(math.abs(back - v) <= math.max(8, math.abs(v) / 16), s"v=$v")
    }
    for (cls <- Seq(3L, 9L, 17L)) {
      val pcm = WavKernel.decodePcm(toneBytes(cls))
      assert(pcm != null && pcm.samples.length == 320)
      val tele = WavKernel.decodePcm(WavKernel.encodeG711Mono(
        pcm.samples.length, pcm.sampleRate, 7,
        j => linear2ulaw(pcm.samples(j))))
      val h = java.lang.Long.bitCount(
        WavKernel.spectralFingerprint(pcm.samples) ^
          WavKernel.spectralFingerprint(tele.samples))
      assert(h <= 4, s"cls $cls spectral hamming $h") // the ingest radius
    }
    // the ingest stream: studio PCM lands first, the telephone
    // re-encode of the SAME audio arrives later and is dropped
    val wh = new graft.snapshot.Warehouse(spark,
      graft.TempDirs.scratchDir("g711_wh").toString)
    val idx = graft.TempDirs.scratchDir("g711_idx").toString
    val studio = Seq((1L, toneBytes(3L), 2021L))
      .toDF("media_id", "content", "year")
    graft.streaming.AudioIngest.ingestBatch(studio, "media_id", "content",
      wh, "f", idx, 0L)
    val pcm3 = WavKernel.decodePcm(toneBytes(3L))
    val teleBytes = WavKernel.encodeG711Mono(pcm3.samples.length,
      pcm3.sampleRate, 7, j => linear2ulaw(pcm3.samples(j)))
    val b1 = Seq((10L, teleBytes, 2021L), (11L, toneBytes(9L), 2021L))
      .toDF("media_id", "content", "year")
    graft.streaming.AudioIngest.ingestBatch(b1, "media_id", "content",
      wh, "f", idx, 1L)
    val kept = wh.read("f").get.select("media_id")
      .as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 11L)) // the telephone copy dropped
  }
}
