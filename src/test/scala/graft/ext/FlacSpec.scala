package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** FLAC decode: CRC polynomials pinned on the standard check vectors,
  * the FIXED predictor pinned on a hand-built frame (so an encoder/
  * decoder error cannot cancel), the encoder round trip across every
  * subframe type / Rice method / escape partitions / all four stereo
  * assignments, and the cross-container identity: a FLAC re-encode of
  * the WAV fixture lands on IDENTICAL WavPcmStats rows. */
class FlacSpec extends SparkTestBase {

  private def ramp(seed: Long)(i: Int): Int =
    ((((seed * 7919 + i.toLong * 31 + (i.toLong * i % 101)) % 4001).toInt
      + 4001) % 4001) - 2000

  test("CRC pins: poly 0x07 and 0x8005 on the '123456789' check vector") {
    val v = "123456789".getBytes("US-ASCII")
    assert(FlacKernel.crc8(v, 0, v.length) == 0xF4) // CRC-8 (SMBus)
    assert(FlacKernel.crc16(v, 0, v.length) == 0xFEE8) // CRC-16/UMTS
  }

  test("hand-built FIXED-1 frame: warmup + Rice residuals decode to " +
      "the hand-computed samples (absolute predictor direction)") {
    val bw = new FlacKernel.BitWriter()
    // STREAMINFO: block 4, sr 8000, mono, 16-bit, 4 samples
    bw.writeBits(4, 16); bw.writeBits(4, 16)
    bw.writeBits(0, 24); bw.writeBits(0, 24)
    bw.writeBits(8000, 20); bw.writeBits(0, 3); bw.writeBits(15, 5)
    bw.writeBits(4L, 36)
    for (_ <- 0 until 16) bw.writeBits(0, 8)
    val si = bw.toBytes
    val fw = new FlacKernel.BitWriter()
    fw.writeBits(0x3FFE, 14); fw.writeBits(0, 2)
    fw.writeBits(7, 4) // explicit 16-bit blocksize
    fw.writeBits(0, 4); fw.writeBits(0, 4) // sr from SI, mono
    fw.writeBits(4, 3); fw.writeBits(0, 1) // 16-bit, reserved
    fw.writeBits(0, 8) // frame number 0
    fw.writeBits(3, 16) // blocksize - 1
    val head = fw.snapshot
    fw.writeBits(FlacKernel.crc8(head, 0, head.length), 8)
    // subframe FIXED order 1: warmup 100; residuals +1 +1 -2 under
    // Rice param 2 (zigzag: 1->2 = q0 rem 10; -2->3 = q0 rem 11)
    fw.writeBits(0, 1); fw.writeBits(8 | 1, 6); fw.writeBits(0, 1)
    fw.writeBits(100, 16)
    fw.writeBits(0, 2); fw.writeBits(0, 4) // method 0, 1 partition
    fw.writeBits(2, 4) // param 2
    fw.writeBits(1, 1); fw.writeBits(2, 2) // +1
    fw.writeBits(1, 1); fw.writeBits(2, 2) // +1
    fw.writeBits(1, 1); fw.writeBits(3, 2) // -2
    fw.alignZero()
    val body = fw.toBytes
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes)
    out.write(0x80); out.write(0); out.write(0); out.write(si.length)
    out.write(si)
    out.write(body)
    val c16 = FlacKernel.crc16(body, 0, body.length)
    out.write((c16 >> 8) & 0xFF); out.write(c16 & 0xFF)
    val p = FlacKernel.decodePcm(out.toByteArray)
    assert(p != null && p.channels == 1 && p.sampleRate == 8000)
    // hand: s0=100; s1=100+1=101; s2=101+1=102; s3=102-2=100
    assert(p.samples.toSeq == Seq(100, 101, 102, 100))
  }

  test("mono round trip across every subframe type (VERBATIM, FIXED-1 " +
      "Rice, FIXED-2 Rice2 partitioned, LPC-2 escaped)") {
    for ((seed, n, sr) <- Seq((3L, 1030, 8000), (7L, 256, 16000),
      (11L, 17, 44100), (0L, 1, 8000))) {
      val bytes = FlacKernel.encodeMono16(n, sr, ramp(seed))
      assert(MediaKind.sniff(bytes) == "flac")
      val p = FlacKernel.decodePcm(bytes)
      assert(p != null, s"seed=$seed n=$n")
      assert(p.channels == 1 && p.sampleRate == sr && p.bitsPerSample == 16)
      assert(p.samples.length == n)
      for (i <- 0 until n)
        assert(p.samples(i) == ramp(seed)(i), s"i=$i seed=$seed")
    }
  }

  test("stereo round trip across all four channel assignments " +
      "(independent, left/side, right/side, mid/side)") {
    val n = 300 // 5 frames of 64 -> every assignment appears
    def l(i: Int) = ramp(5L)(i)
    def r(i: Int) = ramp(9L)(i)
    val bytes = FlacKernel.encodeStereo16(n, 8000, l, r)
    val p = FlacKernel.decodePcm(bytes)
    assert(p != null && p.channels == 2 && p.samples.length == 2 * n)
    for (i <- 0 until n) {
      assert(p.samples(2 * i) == l(i), s"L at $i")
      assert(p.samples(2 * i + 1) == r(i), s"R at $i")
    }
  }

  test("hostile bytes: corruption anywhere rejects via CRC, " +
      "truncations and garbage null, never throw") {
    val good = FlacKernel.encodeMono16(500, 8000, ramp(1L))
    assert(FlacKernel.decodePcm(null) == null)
    assert(FlacKernel.decodePcm("not flac at all, not even close".getBytes)
      == null)
    // flip ONE byte in the frame region: CRC must reject (the header
    // region changes STREAMINFO fields — also null or a CRC break)
    val rnd = new scala.util.Random(7)
    var rejected = 0
    for (_ <- 0 until 60) {
      val m = good.clone()
      val at = 42 + rnd.nextInt(m.length - 42) // inside frames
      m(at) = (m(at) ^ (1 << rnd.nextInt(8))).toByte
      if (FlacKernel.decodePcm(m) == null) rejected += 1
    }
    assert(rejected == 60, s"only $rejected/60 corruptions rejected")
    for (cut <- 0 until good.length by 7)
      FlacKernel.decodePcm(java.util.Arrays.copyOf(good, cut))
  }

  test("FIXED subframe with order > blockSize nulls instead of " +
      "writing warmup past the array (r14 ADVICE)") {
    // STREAMINFO as in the hand-built frame test
    val bw = new FlacKernel.BitWriter()
    bw.writeBits(4, 16); bw.writeBits(4, 16)
    bw.writeBits(0, 24); bw.writeBits(0, 24)
    bw.writeBits(8000, 20); bw.writeBits(0, 3); bw.writeBits(15, 5)
    bw.writeBits(1L, 36)
    for (_ <- 0 until 16) bw.writeBits(0, 8)
    val si = bw.toBytes
    // frame header: bsCode 6 (8-bit blocksize-1 from end of header)
    // with value 0 -> blockSize 1; subframe FIXED order 2. Valid
    // CRC-8 so the guard, not the checksum, must do the rejecting.
    val fw = new FlacKernel.BitWriter()
    fw.writeBits(0x3FFE, 14); fw.writeBits(0, 2)
    fw.writeBits(6, 4) // blocksize: 8-bit at end of header
    fw.writeBits(0, 4); fw.writeBits(0, 4) // sr from SI, mono
    fw.writeBits(4, 3); fw.writeBits(0, 1) // 16-bit, reserved
    fw.writeBits(0, 8) // frame number 0
    fw.writeBits(0, 8) // blocksize - 1 = 0
    val head = fw.snapshot
    fw.writeBits(FlacKernel.crc8(head, 0, head.length), 8)
    fw.writeBits(0, 1); fw.writeBits(8 | 2, 6); fw.writeBits(0, 1)
    fw.writeBits(100, 16); fw.writeBits(101, 16) // would-be warmups
    fw.alignZero()
    val body = fw.toBytes
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes)
    out.write(0x80); out.write(0); out.write(0); out.write(si.length)
    out.write(si)
    out.write(body)
    val c16 = FlacKernel.crc16(body, 0, body.length)
    out.write((c16 >> 8) & 0xFF); out.write(c16 & 0xFF)
    assert(FlacKernel.decodePcm(out.toByteArray) == null)
  }

  test("cross-container identity: FlacPcmStats(FlacEncode) equals " +
      "WavPcmStats(PcmWavEncode) row for row — one audio stat space") {
    import spark.implicits._
    val src = spark.range(1, 30).toDF("doc_id")
    val flac = src.select(col("doc_id").as("media_id"),
      FlacPcmStats(FlacEncode(col("doc_id") % 9,
        lit(40L) + (col("doc_id") % 50) * 4,
        lit(8000L) + (col("doc_id") % 3) * 4000)).as("st"))
      .select("media_id", "st.*").orderBy("media_id").collect().toSeq
    val wav = src.select(col("doc_id").as("media_id"),
      WavPcmStats(graft.ext.PcmWavEncode(col("doc_id") % 9,
        lit(40L) + (col("doc_id") % 50) * 4,
        lit(8000L) + (col("doc_id") % 3) * 4000)).as("st"))
      .select("media_id", "st.*").orderBy("media_id").collect().toSeq
    assert(flac == wav)
  }
}
