package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Order-independent table fingerprint — the cheap equality witness for
  * cross-system data movement: export a table from one engine, load it
  * into another, compare two small rows instead of 100 TB of data. Used
  * after warehouse migrations, replication, or a [[graft.snapshot]]
  * backfill to prove the copy is the table.
  *
  * Each row hashes to a 60-bit integer (md5 over the chr(31)-joined
  * stringified columns — the repo-wide portable draw; nulls render as
  * chr(30) so ('a', NULL) never collides with ('a', '')); the
  * fingerprint is the EXACT decimal SUM of row hashes plus the row
  * count. Sum, not xor: xor is blind to duplicate-row multiplicity (two
  * identical rows cancel out), while a sum moves whenever any row
  * appears, disappears, or changes multiplicity. Summing exact decimals
  * keeps the result partition-order-independent and replayable on any
  * engine with md5.
  *
  * One map-side-combining aggregation over the table — no shuffle beyond
  * the 1-row combine; the hash is codegen'd string work per row.
  *
  * Portability contract on the caller: stringify floating-point columns
  * yourself (cast to DECIMAL) before fingerprinting — double-to-string
  * shortest-repr formatting is NOT identical across engines; integers,
  * strings, dates, and decimals render identically everywhere.
  */
object TableHash {

  /** The portable 60-bit row hash over `cols` in the given order. */
  def rowHash(cols: Seq[Column]): Column = {
    require(cols.nonEmpty, "rowHash needs at least one column")
    val rendered = cols.map(c => coalesce(c.cast("string"), lit("\u001e")))
    conv(substring(md5(concat_ws("\u001f", rendered: _*)), 1, 15), 16, 10)
      .cast("long")
  }

  /** One row: (n_rows, fingerprint) — fingerprint as the decimal-exact
    * digit string so engines compare it without float round-trips. */
  def fingerprint(df: DataFrame, cols: Seq[Column]): DataFrame =
    df.agg(count(lit(1)).as("n_rows"),
      sum(rowHash(cols).cast(DecimalType(38, 0))).cast("string")
        .as("fingerprint"))
}
