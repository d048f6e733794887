package graft.ext

import graft.SparkTestBase

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The spectral audio fingerprint: kernel properties (scale
  * invariance, sentinel, reserved sign bit), the band-profile fixture's
  * MEASURED class separation (the FIXTURES.md discipline — these pins
  * are what licenses the radius-4 gates), expression parity with the
  * kernel, and banded-pair recall vs brute force. */
class AudioSpectralSpec extends SparkTestBase {
  import spark.implicits._

  private def fpOf(cls: Long, bump: Long, n: Int): Long = {
    val s = Array.tabulate(n)(i => WavKernel.toneSample(cls, bump, n, i))
    WavKernel.spectralFingerprint(s)
  }
  private def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)

  test("fixture separation pins: within-class <= 2, cross-class >= 6 " +
      "(200 classes x 5 bumps, n=256) — the radius-4 ball never crosses " +
      "classes and always joins same-class bumps") {
    val byCls = (0 until 200).map(c => (0 until 5).map(b => fpOf(c, b, 256)))
    val withinMax = byCls.map(fs =>
      (for (a <- fs; b <- fs) yield ham(a, b)).max).max
    assert(withinMax <= 2, s"within-class Hamming grew to $withinMax")
    var crossMin = 64
    for {
      c1 <- 0 until 200; c2 <- (c1 + 1) until 200
      a <- byCls(c1); b <- byCls(c2)
    } crossMin = math.min(crossMin, ham(a, b))
    assert(crossMin >= 6, s"cross-class Hamming min fell to $crossMin")
  }

  test("fixture separation at the stream-gate shape (40 classes, " +
      "n=320, exact dups): cross-class min well outside the ball") {
    val fps = (0 until 40).map(c => fpOf(c, 0L, 320))
    val crossMin = (for (i <- 0 until 40; j <- (i + 1) until 40)
      yield ham(fps(i), fps(j))).min
    assert(crossMin >= 10, s"cross-class Hamming min fell to $crossMin")
  }

  test("kernel: amplitude scaling leaves the fingerprint unchanged; " +
      "short clips hit the sentinel; bit 63 reserved") {
    val s = Array.tabulate(300)(i => WavKernel.toneSample(17L, 3L, 300, i))
    val f = WavKernel.spectralFingerprint(s)
    assert(WavKernel.spectralFingerprint(s.map(_ * 3)) == f)
    assert(f >= 0L) // sign bit never set
    assert(WavKernel.spectralFingerprint(s.take(255)) == Long.MinValue)
  }

  private def corpus(rows: Seq[(Long, Long, Long)], n: Int = 256): DataFrame =
    Multimodal.syntheticToneCorpus(rows.toDF("doc_id", "cls", "bump"),
      "doc_id", col("cls"), col("bump"), lit(n), lit(16000))

  test("WavSpectralStats matches the kernel; undecodable -> ok=false; " +
      "under-256-sample clips null the fingerprint") {
    val rows = Seq((1L, 5L, 0L), (2L, 5L, 2L), (3L, 9L, 0L))
    val got = Multimodal.audioSpectralStats(corpus(rows))
      .orderBy("media_id")
      .select("media_id", "ok", "n_samples", "sfp_hi", "sfp_lo")
      .as[(Long, Boolean, Long, Long, Long)].collect()
    rows.zip(got).foreach { case ((id, c, b), (gid, ok, n, hi, lo)) =>
      val f = fpOf(c, b, 256)
      assert(gid == id && ok && n == 256L)
      assert((hi << 32 | lo) == f && hi >= 0 && lo >= 0)
    }
    val dirty = Seq((1L, "junk".getBytes)).toDF("media_id", "content")
    val d = Multimodal.audioSpectralStats(dirty)
      .select("ok", "n_samples", "sfp_hi").as[(Boolean, Option[Long],
        Option[Long])].collect().head
    assert(d == ((false, None, None)))
    val short = Multimodal.audioSpectralStats(corpus(Seq((1L, 5L, 0L)), 64))
      .select("ok", "n_samples", "sfp_hi")
      .as[(Boolean, Option[Long], Option[Long])].collect().head
    assert(short == ((true, Some(64L), None)))
  }

  test("audioQualityScreen: every flag from exact integers, keep is " +
      "the conjunction, undecodable rows flagged not dropped") {
    val media = Multimodal.syntheticPcmCorpus(
      Seq((1L, 2L, 40L), (2L, 3L, 200L)).toDF("doc_id", "s", "n"),
      "doc_id", col("s"), col("n"), lit(8000))
      .unionByName(Seq((3L, "junk".getBytes)).toDF("media_id", "content"))
    val got = Multimodal.audioQualityScreen(
      Multimodal.audioContentStats(media),
      minSamples = 64L, minMeanAbsMilli = 998000L, clipFloor = 1995L)
      .orderBy("media_id")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean)].collect()
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(1L)._3) // 40 samples: too_short
    assert(!byId(2L)._2 && !byId(2L)._3) // decodable, long enough
    assert(byId(3L)._2 && !byId(3L)._6) // undecodable -> keep=false
    got.foreach { r =>
      assert(r._6 == (!r._2 && !r._3 && !r._4 && !r._5))
    }
  }

  test("audioTrimBounds: planted padding trims exactly, all-silent " +
      "clips trim from the lead, live clips keep everything") {
    val media = Seq(
      (1L, 2L, 128L, 256L, 64L), // 2 lead windows, live body, 1 tail
      (2L, 3L, 64L, 0L, 128L),   // all silent
      (3L, 4L, 0L, 320L, 0L))    // no padding
      .toDF("doc_id", "s", "nl", "nb", "nt")
      .select(col("doc_id").as("media_id"),
        PaddedWavEncode(col("s"), col("nl"), col("nb"), col("nt"),
          lit(8000)).as("content"))
    val got = Multimodal.audioTrimBounds(media, 64, 300000L)
      .orderBy("media_id")
      .as[(Long, Boolean, Long, Long, Long, Long)].collect()
    assert(got(0) == ((1L, true, 448L, 128L, 64L, 256L)))
    assert(got(1) == ((2L, true, 192L, 192L, 0L, 0L)))
    assert(got(2) == ((3L, true, 320L, 0L, 0L, 320L)))
  }

  test("audioNearDupPairs == brute-force pairs (banding recall) and " +
      "joins exactly the same-class bumps on the fixture") {
    val rows = for (c <- 0L until 10L; b <- 0L until 3L)
      yield (c * 3 + b, c, b)
    val media = corpus(rows)
    val got = Multimodal.audioNearDupPairs(media, maxHamming = 4)
      .select("i", "j").as[(Long, Long)].collect().toSet
    val fps = rows.map { case (id, c, b) => id -> fpOf(c, b, 256) }
    val brute = (for {
      (i, fi) <- fps; (j, fj) <- fps
      if i < j && ham(fi, fj) <= 4
    } yield (i, j)).toSet
    assert(got == brute)
    // and on THIS fixture the ball is exactly the same-class relation
    val sameClass = (for {
      (i, ci, _) <- rows; (j, cj, _) <- rows if i < j && ci == cj
    } yield (i, j)).toSet
    assert(got == sameClass)
  }
}
