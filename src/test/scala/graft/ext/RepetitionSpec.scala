package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.Row

class RepetitionSpec extends SparkTestBase {
  import spark.implicits._

  private def metricsOf(rows: Seq[(Long, String)],
      topNs: Seq[Int] = Seq(2, 3), dupNs: Seq[Int] = Seq(2, 3)) =
    Repetition.metrics(rows.toDF("doc_id", "text"), "doc_id", "text",
      topNs = topNs, dupNs = dupNs)
      .collect().map(r => r.getLong(0) -> r).toMap

  private def get(r: Row, name: String): Double =
    r.getDouble(r.fieldIndex(name))

  test("top and dup n-gram char fractions: hand-computed repetition") {
    val m = metricsOf(Seq(1L -> "a b a b a b", 2L -> "x y z w"))
    val d1 = m(1L)
    // "a b":3 of len 3 over 11 chars; dup mass 3*3+2*3=15 clamps to 1
    assert(math.abs(get(d1, "top_2gram_char_frac") - 9.0 / 11) < 1e-6)
    assert(get(d1, "dup_2gram_char_frac") == 1.0)
    // 3-gram tie at c=2 resolves to the lexicographically smallest "a b a"
    assert(math.abs(get(d1, "top_3gram_char_frac") - 10.0 / 11) < 1e-6)
    assert(get(d1, "dup_3gram_char_frac") == 1.0)
    val d2 = m(2L)
    // all unique: top mass is a single occurrence, dup mass is zero
    assert(math.abs(get(d2, "top_2gram_char_frac") - 3.0 / 7) < 1e-6)
    assert(get(d2, "dup_2gram_char_frac") == 0.0)
    assert(get(d2, "dup_line_frac") == 0.0)
  }

  test("line metrics: duplicate lines counted with all occurrences") {
    val m = metricsOf(Seq(3L -> "l1\nl2\nl1"))
    val d = m(3L)
    assert(math.abs(get(d, "dup_line_frac") - (1.0 - 2.0 / 3)) < 1e-6)
    // line "l1" twice, 2 chars each, over 8 doc chars
    assert(math.abs(get(d, "dup_line_char_frac") - 4.0 / 8) < 1e-6)
    // the text is one whitespace-free token: no 2-grams at all
    assert(get(d, "top_2gram_char_frac") == 0.0)
  }

  test("documents shorter than n yield zero metrics, not errors") {
    val m = metricsOf(Seq(4L -> "a", 5L -> ""))
    assert(get(m(4L), "top_3gram_char_frac") == 0.0)
    assert(get(m(4L), "dup_2gram_char_frac") == 0.0)
    assert(get(m(5L), "dup_line_frac") == 0.0)
    assert(m(5L).getLong(m(5L).fieldIndex("chars")) == 0L)
  }

  test("gopherFilter: diverse text keeps, repetitive and short-top fail") {
    val diverse = (1 to 40).map(i => s"w$i").mkString(" ")
    val df = Seq(10L -> diverse, 11L -> "a b a b a b", 12L -> "x y z w")
      .toDF("doc_id", "text")
    val kept = Repetition.gopherFilter(df, "doc_id", "text")
      .select("doc_id", "keep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(kept(10L))   // every metric far under its threshold
    assert(!kept(11L))  // dup/top masses blow every gram screen
    assert(!kept(12L))  // a 4-token doc: one 2-gram is 3/7 of its chars
  }

  test("metrics are a pure function of the count table: rerun-stable") {
    val rows = (1L to 50L).map(i =>
      i -> (s"t${i % 7} u${i % 5} " * (3 + (i % 4).toInt)).trim)
    val a = metricsOf(rows)
    val b = metricsOf(rows)
    assert(a.keySet == b.keySet)
    a.keys.foreach { k => assert(a(k) == b(k)) }
  }

  test("repetitionKeep: flag matches gopherFilter's keep row-for-row, " +
      "and a filter on it carries the kernel ONCE (pushdown fusion pin)") {
    val rows = ((1L to 40L).map(i =>
      i -> (s"w${i % 9} v${i % 6} u${i % 4} " * (2 + (i % 5).toInt)).trim) ++
      Seq(100L -> "a b a b a b a b", 101L -> "", 102L -> "solo")).toSeq
    val df = rows.toDF("doc_id", "text")
    val viaFilter = Repetition.gopherFilter(df, "doc_id", "text")
      .select($"doc_id", $"keep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val viaKeep = Repetition.repetitionKeep(df, "text", "__rk")
      .select($"doc_id", $"__rk").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(viaKeep == viaFilter)
    // the regression this exists to catch: .filter over the flag used to
    // substitute the kernel into every one of the 11 vote comparisons
    // (a parquet round-trip keeps ConvertToLocalRelation from folding
    // the whole plan away before the pin can see it)
    val pq = graft.TempDirs.scratchDir("repkeep_pin").toString
    df.write.mode("overwrite").parquet(pq)
    val filtered = Repetition.repetitionKeep(spark.read.parquet(pq),
        "text", "__rk")
      .filter($"__rk").select($"doc_id")
    val plan = filtered.queryExecution.optimizedPlan.toString
    assert("repetition_stats".r.findAllIn(plan).length == 1,
      s"kernel must appear exactly once in the optimized plan:\n$plan")
    assert(filtered.collect().map(_.getLong(0)).toSet ==
      viaFilter.collect { case (id, true) => id }.toSet)
  }
}
