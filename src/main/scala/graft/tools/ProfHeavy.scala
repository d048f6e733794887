package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc wall-clock profiler for the heaviest bench queries (dev tool). */
object ProfHeavy {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.excludedRules",
        graft.Tables.excludedOptimizerRules)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"TIME $tag ${(System.nanoTime() - t0) / 1e9}%.2f")
      spark.catalog.clearCache()
    }
    graft.SparkEntry.queries("q03")(spark, d).write.mode("overwrite").format("noop").save()
    val qs = if (args.nonEmpty) args.toSeq
      else Seq("x_dedup_ngram", "x_dedup_clusters", "x_dedup_simhash",
        "x_stream_hourly", "x_stream_sink", "x_text_winnow")
    for (q <- qs; i <- 1 to 2) time(s"$q#$i") {
      graft.SparkEntry.queries(q)(spark, d).write.mode("overwrite").format("noop").save()
    }
    val plan = graft.ext.Dedup.ngramJaccardPairs(
      graft.Tables.load(spark, d, "documents"), "doc_id", "text", 3, 0.5)
    plan.write.mode("overwrite").format("noop").save()
    println(plan.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("Scan parquet") ||
        l.contains("Join") || l.contains("Aggregate")).mkString("\n"))
    spark.stop()
  }
}
