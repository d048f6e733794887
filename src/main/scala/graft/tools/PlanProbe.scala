package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off optimizer-plan probe (dev tool): prints how many times the
  * heavy per-row kernels appear in the OPTIMIZED plan of the curation
  * annotation fragments — the duplicated-expression check the
  * optimization guide's UDF-duplication section prescribes, applied to
  * native expressions. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.optimizer.excludedRules",
        graft.Tables.excludedOptimizerRules)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"), col("source"),
        concat(lit("https://"), col("source"), lit(".example.org/p/"),
          col("doc_id").cast("string")).as("url"))

    def count(tag: String, plan: String, needle: String): Unit =
      println(s"PROBE $tag: $needle x " + needle.r.findAllIn(plan).length)

    // repetitionKeep + filter (the curate stage shape)
    val rk = graft.ext.Repetition
      .repetitionKeep(docs, "text", "__rep_keep")
      .filter(col("__rep_keep")).select(col("doc_id"), col("text"))
    val rkPlan = rk.queryExecution.optimizedPlan.toString
    count("repetitionKeep+filter", rkPlan, "repetition_stats")
    count("repetitionKeep+filter", rkPlan, "struct_threshold_vote")

    // lexicalKeep annotate-only (the funnel flags shape)
    val lk = graft.ext.QualityRules.lexicalKeep(docs, "text", "__lex_keep")
    val lkPlan = lk.queryExecution.optimizedPlan.toString
    count("lexicalKeep", lkPlan, "split\\(text")

    // lexical + repetition chained, then selected (exact funnel shape)
    val both = graft.ext.Repetition.repetitionKeep(
      graft.ext.QualityRules.lexicalKeep(docs, "text", "__lex_keep"),
      "text", "__rep_keep")
      .select(col("doc_id"), col("text"), col("source"),
        col("__lex_keep"), col("__rep_keep"))
    val bothPlan = both.queryExecution.optimizedPlan.toString
    count("funnel-flags", bothPlan, "split\\(text")
    count("funnel-flags", bothPlan, "repetition_stats")
    count("funnel-flags", bothPlan, "struct_threshold_vote")
    println("=== lk optimized plan ===")
    println(lkPlan.take(5000))

    // web-extract chain: do the ok-filters double-evaluate the decode
    // kernels (pushdown duplication)?
    val web = graft.SparkEntry.queries("x_web_extract")(
      spark, "/root/testdata/sf0.001")
    val webPlan = web.queryExecution.optimizedPlan.toString
    for (k <- Seq("http_response_decode", "charset_text_decode",
        "warc_records", "html_strip", "warc_html_encode"))
      count("x_web_extract", webPlan, k)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/tmp/web_plan.txt"), webPlan)
    spark.stop()
  }
}
