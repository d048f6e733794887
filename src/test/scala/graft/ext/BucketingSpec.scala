package graft.ext

import graft.{SparkTestBase, Tables, TempDirs}

import org.apache.spark.sql.functions._

/** Co-located joins over bucketed tables: the join on the bucket keys
  * must plan WITHOUT any hash-partitioning exchange — the write-time
  * bucket placement replaces the per-query shuffle. */
class BucketingSpec extends SparkTestBase {

  test("co-bucketed join runs shuffle-free and returns the plain-join rows") {
    val dir = TempDirs.scratchDir("bucketing").toString
    val orders = Tables.load(spark, sf("sf0.001"), "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val customer = Tables.load(spark, sf("sf0.001"), "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    Bucketing.writeBucketed(orders, "b_orders", s"$dir/orders",
      Seq("o_custkey"), buckets = 8, sortCols = Seq("o_custkey"))
    Bucketing.writeBucketed(customer, "b_customer", s"$dir/customer",
      Seq("c_custkey"), buckets = 8, sortCols = Seq("c_custkey"))

    // force the sort-merge path (these toy tables would broadcast and
    // hide the property under test)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val bo = Bucketing.read(spark, "b_orders")
      val bc = Bucketing.read(spark, "b_customer")
      val joined = bo.join(bc, bo("o_custkey") === bc("c_custkey"))
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), s"expected SMJ:\n$p")
      assert(!p.contains("Exchange hashpartitioning"),
        s"co-bucketed join must not shuffle:\n$p")

      // value parity with the unbucketed join
      val got = joined.groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n")).orderBy(col("c_mktsegment")).collect().toSeq
      val want = orders.join(customer,
          orders("o_custkey") === customer("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n")).orderBy(col("c_mktsegment")).collect().toSeq
      assert(got == want && got.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("bucketed aggregation on the bucket key plans without exchange") {
    val dir = TempDirs.scratchDir("bucketing_agg").toString
    val orders = Tables.load(spark, sf("sf0.001"), "orders")
      .select(col("o_custkey"), col("o_totalprice"))
    Bucketing.writeBucketed(orders, "b_orders_agg", s"$dir/orders",
      Seq("o_custkey"), buckets = 8)
    try {
      val agg = Bucketing.read(spark, "b_orders_agg")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      val p = agg.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucket-key aggregation must not shuffle:\n$p")
      assert(agg.count() ==
        orders.select("o_custkey").distinct().count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders_agg")
    }
  }
}
