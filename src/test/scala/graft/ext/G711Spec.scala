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
}
