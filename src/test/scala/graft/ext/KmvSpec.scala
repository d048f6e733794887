package graft.ext

import graft.SparkTestBase

import org.apache.spark.sql.functions._

/** KMV distinct sketch: hash replay parity with the CDC fold, exact
  * brute-force sketch equality, the small-set exact path, and the
  * statistical claims (distinct estimate and Broder Jaccard within
  * their k-derived tolerance on planted id spaces). */
class KmvSpec extends SparkTestBase {
  import spark.implicits._

  /** Brute-force twin of the documented recurrence (independent of the
    * kernel implementation): per BE byte, h = ((h+v)²+1) mod M. */
  private def mh(x: Long): Long = {
    require(x >= 0)
    var h = BigInt(0)
    for (i <- 0 until 8) {
      val b = ((x >>> (8 * (7 - i))) & 0xFF).toInt
      val v = ((b.toLong * 2654435761L + 98765L) % 2147483647L +
        i.toLong * 268435459L) % 2147483647L
      h = ((h + v) * (h + v) + 1) % BigInt(CdcKernel.M)
    }
    h.toLong
  }

  test("the hash follows the documented squaring recurrence; negatives " +
      "null out; the image spreads across the full Mersenne range") {
    for (x <- Seq(0L, 1L, 255L, 256L, 123456789L, Long.MaxValue))
      assert(mh(x) == MersenneLongHash.hash(x), s"x=$x")
    val got = Seq(5L, -3L).toDF("k")
      .select(MersenneLongHash(col("k")).as("h")).collect()
    assert(got(0).getLong(0) == mh(5L) && got(1).isNullAt(0))
    // uniformity smoke: sequential ids must NOT cluster in a narrow
    // window (the linear-fold failure mode this hash replaced)
    val hs = (0L until 1000L).map(MersenneLongHash.hash)
    assert(hs.max > CdcKernel.M / 2 && hs.min < CdcKernel.M / 100)
    val buckets = hs.groupBy(_ / (CdcKernel.M / 10)).size
    assert(buckets == 10, s"only $buckets deciles occupied")
  }

  test("sketch == brute-force k smallest distinct hashes; duplicates " +
      "collapse; under-full sketches are the exact distinct set") {
    val ids = (0L until 500L) ++ (0L until 500L) // every id twice
    val df = ids.toDF("doc_id")
    val got = Kmv.sketch(df, "doc_id", 32).orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val want = (0L until 500L).map(mh).distinct.sorted.take(32)
      .zipWithIndex.map { case (h, i) => (i + 1L, h) }
    assert(got.toSeq == want)
    // 10 distinct ids, k=64: the sketch IS the set, the estimate exact
    val small = Kmv.distinctEstimate((0L until 10L).toDF("doc_id"),
      "doc_id", 64).collect()(0)
    assert(small.getLong(0) == 10L && small.getLong(2) == 10L)
  }

  test("distinct estimate lands within the k-derived tolerance on 20k " +
      "planted ids; Jaccard and union estimates track a planted overlap") {
    val n = 20000L
    val est = Kmv.distinctEstimate(
      spark.range(0, n).select(col("id").as("doc_id")), "doc_id", 256)
      .collect()(0).getLong(2)
    // stderr ~ 1/sqrt(k-1) ~ 6.3%; 4 sigma
    assert(math.abs(est - n) < n / 4, s"est=$est")
    // A = [0, 10000), B = [5000, 15000): J = 1/3, |A u B| = 15000
    val a = spark.range(0, 10000).select(col("id").as("doc_id"))
    val b = spark.range(5000, 15000).select(col("id").as("doc_id"))
    val r = Kmv.overlap(a, b, "doc_id", 256).collect()(0)
    val jac = r.getAs[Long]("jaccard_micro") / 1e6
    assert(math.abs(jac - 1.0 / 3) < 0.12, s"jaccard=$jac")
    val uest = r.getAs[Long]("union_est")
    assert(math.abs(uest - 15000L) < 15000L / 4, s"union_est=$uest")
  }

  test("streaming MIN-UNION fold equals the one-shot sketch and is " +
      "idempotent under batch replay") {
    val wh = new graft.snapshot.Warehouse(spark,
      graft.TempDirs.scratchDir("kmv_wh").toString)
    val folded = graft.streaming.EventStream.runKmvIngest(
      spark, "/root/testdata/sf0.001", wh, "sk", k = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val oneShot = Kmv.sketch(
      graft.Tables.load(spark, "/root/testdata/sf0.001", "documents"),
      "doc_id", 32).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(folded.toSeq == oneShot.toSeq)
    // a second full run over the SAME corpus into the SAME state is a
    // replay: min-union must change nothing
    val again = graft.streaming.EventStream.runKmvIngest(
      spark, "/root/testdata/sf0.001", wh, "sk", k = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(again.toSeq == oneShot.toSeq)
  }
}
