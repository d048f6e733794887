package graft.snapshot

import java.time.LocalDate
import java.time.format.DateTimeFormatter

import graft.config.OlapConfig

import org.apache.spark.sql.SparkSession

/** CLI entry point mirroring the reference's
  * `php OLAP.php -c add -d YYYY-MM-DD [-f fact]` (OLAP.php:376-421,
  * lifecycle SURVEY §3.1):
  *
  *   runMain graft.snapshot.SnapshotCli -c add -d 2024-01-15 \
  *     -s settings.json -w /path/to/warehouse [-f factName] [--compat]
  *
  * `-c add` is the only implemented command, exactly like the reference
  * (its usage mentions delete but ships no code path — OLAP.php:385,393).
  * The date is validated strictly as Y-m-d (OLAP.php:397-401). Source
  * tables are expected in the session catalog; register them first via
  * spark-sql config or a wrapper (tests use temp views).
  */
object SnapshotCli {

  final case class Args(command: String, date: LocalDate, settings: String,
      warehouse: String, fact: Option[String], compat: Boolean)

  def parseArgs(argv: Seq[String]): Args = {
    val m = scala.collection.mutable.Map[String, String]()
    var compat = false
    var i = 0
    while (i < argv.length) {
      argv(i) match {
        case "--compat" => compat = true; i += 1
        case flag @ ("-c" | "-d" | "-f" | "-s" | "-w") =>
          require(i + 1 < argv.length, s"missing value for $flag")
          m(flag) = argv(i + 1); i += 2
        case other => throw new IllegalArgumentException(s"unknown argument: $other")
      }
    }
    val cmd = m.getOrElse("-c", usageFail("missing -c"))
    if (cmd != "add") usageFail(s"unsupported command: $cmd (only 'add')")
    val dateStr = m.getOrElse("-d", usageFail("missing -d"))
    val date = try LocalDate.parse(dateStr, DateTimeFormatter.ISO_LOCAL_DATE)
    catch { case _: Exception => usageFail(s"invalid date (want YYYY-MM-DD): $dateStr") }
    Args(cmd, date,
      m.getOrElse("-s", usageFail("missing -s <olapSettings.json>")),
      m.getOrElse("-w", usageFail("missing -w <warehouse dir>")),
      m.get("-f"), compat)
  }

  private def usageFail(msg: String): Nothing =
    throw new IllegalArgumentException(
      s"$msg\nusage: SnapshotCli -c add -d YYYY-MM-DD -s settings.json -w warehouseDir [-f fact] [--compat]")

  def main(argv: Array[String]): Unit = {
    val args = parseArgs(argv.toSeq)
    val spark = SparkSession.builder()
      .appName("graft-snapshot")
      // spark-submit injects spark.master; default to local outside it
      .config("spark.master",
        sys.props.getOrElse("spark.master", sys.env.getOrElse("SPARK_MASTER", "local[*]")))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    val settings = OlapConfig.parseSettings(
      java.nio.file.Files.readString(java.nio.file.Paths.get(args.settings)))
    val wh = new Warehouse(spark, args.warehouse)
    val written = SnapshotJob.run(spark, settings, wh, args.date,
      onlyFact = args.fact, compat = args.compat)
    println(s"[snapshot] ${args.date}: wrote ${written.size} fact(s): ${written.mkString(", ")}")
  }
}
