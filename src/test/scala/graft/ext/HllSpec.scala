package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class HllSpec extends SparkTestBase {
  import spark.implicits._

  test("estimate lands within the 1.04/sqrt(m) error band on 20k keys") {
    val df = spark.range(20000).select(col("id"))
    val r = Hll.approxDistinct(df, "id", p = 8)
      .as[(Long, Long, Double)].collect()(0)
    val (m, present, est) = r
    assert(m == 256L && present == 256L)
    // standard error for m=256 is ~6.5%; 3 sigma ~ 20%
    assert(math.abs(est - 20000.0) / 20000.0 < 0.2, s"estimate $est")
  }

  test("sketch is deterministic and insensitive to duplicates and order") {
    val base = spark.range(5000).select(col("id"))
    val dup = base.unionAll(base).orderBy(rand(42))
    val a = Hll.approxDistinct(base, "id").as[(Long, Long, Double)].collect()(0)
    val b = Hll.approxDistinct(dup, "id").as[(Long, Long, Double)].collect()(0)
    assert(a == b, "duplicates and row order must not move a single register")
  }

  test("registers are hex-aligned buckets with ranks in [1, 61]") {
    val regs = Hll.registers(spark.range(10000).toDF("id"), "id", p = 8)
      .as[(Long, Int)].collect()
    assert(regs.length <= 256)
    assert(regs.forall { case (b, m) => b >= 0 && b < 256 && m >= 1 && m <= 61 })
    // p must be hex-aligned
    intercept[IllegalArgumentException] { Hll.registers(spark.range(1).toDF("id"), "id", p = 7) }
  }

  test("grouped sketch matches the global sketch run per group") {
    val df = spark.range(30000)
      .select((col("id") % 3).cast("string").as("g"), col("id"))
    val grouped = Hll.approxDistinctByGroup(df, "g", "id")
      .orderBy("g").as[(String, Long, Double)].collect().toSeq
    val singles = (0 to 2).map { g =>
      val r = Hll.approxDistinct(df.filter(col("g") === g.toString), "id")
        .as[(Long, Long, Double)].collect()(0)
      (g.toString, r._2, r._3)
    }
    assert(grouped == singles, "per-group registers must be independent")
  }

  test("empty input yields the raw estimator's floor alpha*m, not a null crash") {
    val r = Hll.approxDistinct(spark.range(0).toDF("id"), "id")
      .as[(Long, Long, Double)].collect()(0)
    // all 256 registers absent -> S = m, estimate = alpha*m (~184): the
    // documented raw-estimator small-range behavior (no ln-based
    // correction by design — that branch is the one libm-specific step)
    val alpha = 0.7213 / (1.0 + 1.079 / 256.0)
    assert(r._2 == 0L && math.abs(r._3 - alpha * 256.0) < 1e-9)
  }

  test("setAlgebra: union equals the sketch of the union, intersection tracks overlap") {
    import spark.implicits._
    val a = (1L to 3000L).toDF("id")
    val b = (2001L to 5000L).toDF("id") // overlap 1000, union 5000
    val r = Hll.setAlgebra(a, b, "id").head()
    val (ea, eb, eu, ei) = (r.getDouble(0), r.getDouble(1),
      r.getDouble(2), r.getDouble(3))
    // union estimate is EXACTLY the single-sketch estimate of a∪b:
    // per-bucket max merge = sketching the concatenation
    val direct = Hll.approxDistinct((1L to 5000L).toDF("id"), "id")
      .head().getDouble(2)
    assert(eu == direct)
    // inclusion-exclusion identity holds bit-for-bit
    assert(ei == (ea + eb) - eu)
    // estimates land in the ~2sigma band (sigma ~ 1.04/sqrt(256) ~ 6.5%)
    assert(math.abs(ea - 3000.0) < 450 && math.abs(eb - 3000.0) < 450)
    assert(math.abs(ei - 1000.0) < 900) // intersection carries both errors
    // disjoint sets: intersection estimate near zero (may be negative)
    val d = Hll.setAlgebra((1L to 2000L).toDF("id"),
      (100001L to 102000L).toDF("id"), "id").head()
    assert(math.abs(d.getDouble(3)) < 600)
  }

  test("rollingDistinct: window sketch == direct sketch of the window's users") {
    import spark.implicits._
    // 3 days, disjoint 400-user populations per day
    def day(n: Int) = java.sql.Timestamp.valueOf(s"2024-01-0${n + 1} 12:00:00")
    val ev = (0 until 3).flatMap(dd =>
      (1L to 400L).map(u => (day(dd), dd * 1000L + u))).toDF("ts", "user_id")
    val roll = Hll.rollingDistinct(ev, "ts", "user_id", windowSize = 2)
      .orderBy("day").collect()
    assert(roll.length == 3)
    // day 1's 2-day window == single sketch over day-0 ∪ day-1 users,
    // BIT-IDENTICAL (max merge is sketching the concatenation)
    val direct01 = Hll.approxDistinct(
      ((1L to 400L) ++ (1001L to 1400L)).toDF("user_id"), "user_id")
      .head().getDouble(2)
    assert(roll(1).getDouble(2) == direct01)
    // windowSize 1 degenerates to the per-day sketch
    val one = Hll.rollingDistinct(ev, "ts", "user_id", windowSize = 1)
      .orderBy("day").collect()
    val direct0 = Hll.approxDistinct((1L to 400L).toDF("user_id"), "user_id")
      .head().getDouble(2)
    assert(one(0).getDouble(2) == direct0)
  }
}
