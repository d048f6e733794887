package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query-name filter (dev loop only —
    // the driver always runs the full set)
    val (sfDir, outDir, onlyArg) = args match {
      case Array(s, o) => (s, o, None)
      case Array(s, o, q) => (s, o, Some(q.split(",").toSet))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.excludedRules",
        graft.Tables.excludedOptimizerRules)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Failures must surface as RED rows, not missing rows: a query that
    // dies in analysis gets a 1-row error-marker result (schema/hash can
    // never match an oracle), so a class-wide breakage (e.g. the r07
    // testdata timestamp-type flip) shows as red in CORRECTNESS_rN.json
    // instead of silently shrinking the gate count.
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val selected = onlyArg match {
      case Some(only) => SparkEntry.queries.filter { case (n, _) => only(n) }
      case None => SparkEntry.queries
    }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(500)}"
        System.err.println(s"[verify] $name failed: $msg")
        failures(name) = msg
        import spark.implicits._
        Seq(msg).toDF("__verify_error").coalesce(1)
          .write.mode("overwrite").parquet(s"$outDir/$name")
      }
      spark.catalog.clearCache() // queries are independent pipelines
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => onlyArg.forall(_(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    Files.writeString(Paths.get(s"$outDir/verify_errors.json"),
      failures.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    // Truncation-proofing (mirrors Bench): a fixed-path summary in the repo
    // root records what actually ran — query count, failure map — so the
    // round's verify signal survives even if the driver's captured log tail
    // is cut. The per-query parquet dumps in outDir remain the real data.
    val summary =
      s"""{"nqueries":${selected.size},"nfailed":${failures.size},""" +
        s""""failed":${failures.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")},""" +
        s""""sfDir":${q(sfDir)},"outDir":${q(outDir)}}"""
    try Files.writeString(
      Paths.get(sys.env.getOrElse("SPARK_GRAFT_VERIFY_OUT", "verify_out.json")), summary)
    catch { case e: Throwable => System.err.println(s"[verify] could not write verify_out.json: $e") }
    println(summary)
    spark.stop()
  }
}
