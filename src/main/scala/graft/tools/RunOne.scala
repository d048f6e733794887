package graft.tools

import graft.SparkEntry

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev loop helper (not part of the driver contract): run ONE named
  * SparkEntry query against a sf dir, write its parquet dump and its
  * oracle SQL, so a single gate can be DuckDB-compared in seconds
  * instead of re-running the full Verify set.
  * Usage: runMain graft.tools.RunOne <name> <sfDir> <outDir> */
object RunOne {
  def main(args: Array[String]): Unit = {
    if (args.length != 3) {
      System.err.println("usage: RunOne <queryName> <sfDir> <outDir>")
      sys.exit(2)
    }
    val Array(name, sfDir, outDir) = args
    if (!SparkEntry.queries.contains(name)) {
      System.err.println(s"unknown query '$name'; names: " +
        SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
      sys.exit(2)
    }
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.optimizer.excludedRules",
        graft.Tables.excludedOptimizerRules)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, sfDir).coalesce(1).write
      .mode("overwrite").parquet(s"$outDir/$name")
    try {
      println(f"[runone] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      SparkEntry.oracleSql.get(name).foreach { sql =>
        Files.writeString(Paths.get(s"$outDir/$name.sql"), sql)
      }
    } finally spark.stop()
  }
}
