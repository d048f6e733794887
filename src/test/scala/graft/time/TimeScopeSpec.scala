package graft.time

import java.time.LocalDate

import graft.SparkTestBase
import graft.time.TimeScope._
import org.apache.spark.sql.functions._

/** Edge dates per FIXTURES.md §2.4 — exact PHP `o`/`W`/`z`+1 semantics. */
class TimeScopeSpec extends SparkTestBase {

  test("week label: ISO week-year rollovers") {
    assert(weekLabel(LocalDate.parse("2019-02-01")) == "Y2019-W05")
    assert(weekLabel(LocalDate.parse("2018-12-31")) == "Y2019-W01") // PHP o rolls forward
    assert(weekLabel(LocalDate.parse("2021-01-03")) == "Y2020-W53") // rolls back
    assert(weekLabel(LocalDate.parse("2024-12-29")) == "Y2024-W52") // Sunday
    assert(weekLabel(LocalDate.parse("2024-12-30")) == "Y2025-W01")
  }

  test("day-of-year is 1-based (PHP z+1)") {
    assert(fullScope(LocalDate.parse("2024-01-01")).day.contains(1))
    assert(fullScope(LocalDate.parse("2020-02-29")).day.contains(60))
    assert(fullScope(LocalDate.parse("2018-12-31")).day.contains(365))
    assert(fullScope(LocalDate.parse("2020-12-31")).day.contains(366)) // leap
  }

  test("periodicity gate fires on last day of period only") {
    val midMonth = LocalDate.parse("2024-01-15")
    assert(fires(Cron.Daily, midMonth))
    assert(!fires(Cron.Weekly, midMonth)) // Monday
    assert(!fires(Cron.Monthly, midMonth))
    assert(!fires(Cron.Yearly, midMonth))

    val sunday = LocalDate.parse("2024-01-14")
    assert(fires(Cron.Weekly, sunday))

    val monthEnd = LocalDate.parse("2019-02-28")
    assert(fires(Cron.Monthly, monthEnd))
    assert(!fires(Cron.Yearly, monthEnd))

    // 2018-12-31 is a Monday: its ISO week (Y2019-W01) continues into
    // January, so the weekly gate does NOT fire even at year end
    val yearEnd = LocalDate.parse("2018-12-31")
    assert(fires(Cron.Daily, yearEnd) && !fires(Cron.Weekly, yearEnd) &&
      fires(Cron.Monthly, yearEnd) && fires(Cron.Yearly, yearEnd))
    // a year end that is also a Sunday fires all four
    val sundayYearEnd = LocalDate.parse("2023-12-31")
    assert(fires(Cron.Weekly, sundayYearEnd) && fires(Cron.Yearly, sundayYearEnd))
  }

  test("scope nullification: fields finer than the cron interval are null") {
    val d = LocalDate.parse("2024-01-31") // fires daily + monthly
    assert(scopeFor(Cron.Daily, d).contains(
      Scope(Some(2024), Some(1), Some("Y2024-W05"), Some(31))))
    assert(scopeFor(Cron.Monthly, d).contains(
      Scope(Some(2024), Some(1), None, None)))
    assert(scopeFor(Cron.Weekly, d).isEmpty) // Wednesday: no weekly fire
    val ye = LocalDate.parse("2024-12-31")
    assert(scopeFor(Cron.Yearly, ye).contains(
      Scope(Some(2024), None, None, None)))
  }

  test("column forms agree with the pure functions across edge dates") {
    import spark.implicits._
    val dates = Seq("2018-12-31", "2019-02-01", "2020-02-29", "2021-01-03",
      "2024-01-15", "2024-12-29", "2024-12-30", "2025-01-01")
    val df = dates.toDF("d").select(to_date($"d").as("d"))
    val got = df.select($"d".cast("string"),
      TimeScope.weekLabelCol($"d"), TimeScope.dayOfYearCol($"d"))
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    dates.foreach { ds =>
      val d = LocalDate.parse(ds)
      assert(got(ds) == (weekLabel(d), d.getDayOfYear.toLong), s"mismatch at $ds")
    }
  }
}
