package graft

/** Driver-contract invariants: entry() smoke, oracle key alignment, and
  * column-name parity between queries and their oracle SQL (the driver
  * hashes after sorting columns BY NAME — a mismatch zeroes the query). */
class SmokeSpec extends SparkTestBase {

  test("entry() returns rows on sf0.001 (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query; oracle-less queries are known") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without queries: ${o -- q}")
    // every query is oracle-gated since round 6: the former rows-only set
    // (x_sim_lsh, x_sim_ivf, x_text_fingerprint, x_text_winnow) is now
    // gated via deterministic planted fixtures (graft.ext.Fixtures) whose
    // DuckDB CTEs rebuild the same input and check the operator's output
    val rowsOnly = q -- o
    assert(rowsOnly.isEmpty, s"unexpected rows-only set: $rowsOnly")
  }

  test("result column names match the oracle SQL aliases") {
    // static check: every column name of the Spark result appears verbatim
    // in the oracle text. Queries whose BUILD already executes side-effect
    // pipelines (snapshot ETL, streaming drain, pipe subprocesses) are
    // excluded here — their full results are hash-checked by the driver
    // gate anyway, and this test only inspects plan schemas.
    val heavy = Set("x_snapshot", "x_snapshot_monthly", "x_stream_hourly", "x_pipe")
    val dir = sf("sf0.001")
    SparkEntry.oracleSql.filterNot(kv => heavy(kv._1)).foreach { case (name, sql) =>
      val cols = SparkEntry.queries(name)(spark, dir).columns
      cols.foreach { c =>
        assert(sql.toLowerCase.contains(c.toLowerCase),
          s"$name: result column '$c' not present in oracle SQL")
      }
    }
  }
}
