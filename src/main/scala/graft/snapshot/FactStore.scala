package graft.snapshot

import org.apache.spark.sql.DataFrame

/** The minimal sink surface the snapshot lifecycle drives
  * ([[SnapshotJob.run]]): probe-read for the idempotency gate, then a
  * schema-aware bulk append. [[Warehouse]] (parquet, the default) and
  * [[JdbcWarehouse]] (write-back to a live RDBMS — the reference's actual
  * sink, library_olap/OLAP.php:153-164) both implement it, so a migrating
  * deployment can keep existing dashboards pointed at the OLAP database
  * while the parquet warehouse takes over serving. */
trait FactStore {
  /** The current fact content, if the fact exists. */
  def read(fact: String): Option[DataFrame]

  /** Append a batch, creating the fact if absent (S5/S6). */
  def append(fact: String, batch: DataFrame): Unit
}
