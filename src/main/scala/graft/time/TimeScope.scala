package graft.time

import java.time.LocalDate
import java.time.temporal.IsoFields

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Time-scope calculus of the reference's snapshot ETL.
  *
  * Reference semantics (library_olap/OLAP.php:6-44):
  *  - year  = 4-digit year                       (PHP `Y`, OLAP.php:38)
  *  - month = month number                       (PHP `m`, OLAP.php:39)
  *  - week  = "Y" + ISO-week-year + "-W" + zero-padded ISO week
  *                                               (PHP `o`/`W`, OLAP.php:40)
  *  - day   = day-of-year, 1-based               (PHP `z`+1, OLAP.php:41)
  *
  * Periodicity gate (TimeScope::getScope, OLAP.php:15-32): a fact with cron
  * in {daily, weekly, monthly, yearly} fires only when tomorrow's scope
  * differs from today's in the corresponding field — i.e. on the last day of
  * the period. When it fires, every field finer than the cron interval is
  * nulled (OLAP.php:21-27).
  */
object TimeScope {

  /** Scope fields, coarse-to-fine; None = nulled by the periodicity rules. */
  final case class Scope(
      year: Option[Int],
      month: Option[Int],
      week: Option[String],
      day: Option[Int])

  sealed abstract class Cron(val name: String, val fineness: Int)
  object Cron {
    case object Yearly extends Cron("yearly", 0)
    case object Monthly extends Cron("monthly", 1)
    case object Weekly extends Cron("weekly", 2)
    case object Daily extends Cron("daily", 3)
    val all: Seq[Cron] = Seq(Yearly, Monthly, Weekly, Daily)
    def byName(n: String): Cron = all.find(_.name == n.toLowerCase).getOrElse(
      throw new IllegalArgumentException(s"unknown cron: $n"))
  }

  /** PHP `'Y' . format('o') . '-W' . format('W')` — e.g. 2019-02-01 ->
    * "Y2019-W05"; 2018-12-31 -> "Y2019-W01" (ISO week-year rollover). */
  def weekLabel(d: LocalDate): String =
    f"Y${d.get(IsoFields.WEEK_BASED_YEAR)}%04d-W${d.get(IsoFields.WEEK_OF_WEEK_BASED_YEAR)}%02d"

  /** Full (daily) scope of a pivot date. */
  def fullScope(d: LocalDate): Scope =
    Scope(Some(d.getYear), Some(d.getMonthValue), Some(weekLabel(d)),
      Some(d.getDayOfYear))

  /** Does a fact with this cron fire on pivot date `d`? True iff the cron's
    * field changes between d and d+1 (OLAP.php:17-20). Daily always fires. */
  def fires(cron: Cron, d: LocalDate): Boolean = {
    val t = d.plusDays(1)
    cron match {
      case Cron.Daily   => true
      case Cron.Weekly  => weekLabel(d) != weekLabel(t)
      case Cron.Monthly => d.getMonthValue != t.getMonthValue
      case Cron.Yearly  => d.getYear != t.getYear
    }
  }

  /** Scope to store for a firing fact: fields finer than the cron interval
    * are nulled (OLAP.php:21-27). None if the fact does not fire today. */
  def scopeFor(cron: Cron, d: LocalDate): Option[Scope] =
    if (!fires(cron, d)) None
    else {
      val full = fullScope(d)
      Some(Scope(
        year = full.year,
        month = if (cron.fineness >= 1) full.month else None,
        week = if (cron.fineness >= 2) full.week else None,
        day = if (cron.fineness >= 3) full.day else None))
    }

  // ---- Column (expression) forms, for enriching event-time DataFrames ----
  // All built from codegen'd built-ins; no UDFs.

  /** ISO week-numbering year of a date/timestamp column (PHP `o`).
    * The ISO week-year of d is the calendar year of the Thursday in d's ISO
    * week; `weekday` is 0-based from Monday, so that Thursday is d+(3-wd). */
  def isoWeekYearCol(d: Column): Column = {
    val dt = to_date(d)
    year(date_add(dt, lit(3) - weekday(dt)))
  }

  /** The reference's week label (`"Y2019-W05"`) as a Column. */
  def weekLabelCol(d: Column): Column =
    concat(lit("Y"), lpad(isoWeekYearCol(d).cast("string"), 4, "0"),
      lit("-W"), lpad(weekofyear(d).cast("string"), 2, "0"))

  /** Day-of-year (1-based, matching PHP `z`+1) as a long Column. */
  def dayOfYearCol(d: Column): Column = dayofyear(d).cast("long")
}
