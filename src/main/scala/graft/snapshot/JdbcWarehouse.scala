package graft.snapshot

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types._

/** JDBC write-back sink: the reference's sink IS a live MySQL database —
  * it creates the fact table on first load (library_olap/OLAP.php:153-164)
  * and bulk-inserts each snapshot batch (OLAP.php:306-312, a single
  * multi-row INSERT, never row-at-a-time). This is the Spark re-expression
  * for migrating deployments whose dashboards still point at the OLAP
  * database: same [[FactStore]] surface as the parquet [[Warehouse]], same
  * S10 idempotency gate in front (the probe filter pushes down to the
  * remote database, so the gate reads back a handful of rows, not the
  * fact).
  *
  * Scale notes: writes go through Spark's JDBC writer — one remote
  * connection per partition, statements batched `batchSize` rows at a time
  * (the executeBatch analog of the reference's multi-row INSERT). The
  * remote RDBMS is the throughput ceiling by design; this sink exists for
  * serving-sized facts (aggregated snapshots), not for landing raw 100 TB
  * data — that is the parquet warehouse's job.
  *
  * Schema evolution (S7): new batch columns are added with
  * `ALTER TABLE ... ADD COLUMN` (nullable, like the parquet path); batch
  * rows missing existing columns null-fill (the INSERT lists only the
  * batch's columns). A shared-column TYPE change is rejected loudly —
  * in-place column retyping is dialect-specific DDL the reference handles
  * with MySQL `CHANGE COLUMN` (OLAP.php:186-192); run it out-of-band.
  */
final class JdbcWarehouse(spark: SparkSession, url: String,
    props: Map[String, String] = Map.empty,
    batchSize: Int = 10000) extends FactStore {

  if (url.startsWith("jdbc:derby")) JdbcWarehouse.ensureDerbyVarcharDialect()

  private def withConnection[T](body: java.sql.Connection => T): T = {
    val p = new java.util.Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    val conn = java.sql.DriverManager.getConnection(url, p)
    try body(conn) finally conn.close()
  }

  /** Dialect-neutral existence probe: a zero-row SELECT succeeds iff the
    * table exists (metadata catalogs disagree on identifier case across
    * RDBMSs; a probe query never does). */
  def exists(fact: String): Boolean = withConnection { conn =>
    try {
      val st = conn.createStatement()
      try { st.executeQuery(s"SELECT 1 FROM $fact WHERE 1=0").close(); true }
      finally st.close()
    } catch { case _: java.sql.SQLException => false }
  }

  def read(fact: String): Option[DataFrame] =
    if (!exists(fact)) None
    else {
      val r = spark.read.format("jdbc")
        .option("url", url).option("dbtable", fact)
      Some(props.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load())
    }

  /** SQL type for an added column — the widening-safe core set shared by
    * MySQL/Derby/Postgres (matches what Spark's writer creates). */
  private def sqlType(dt: DataType): String = dt match {
    case LongType => "BIGINT"
    case IntegerType => "INTEGER"
    case ShortType => "SMALLINT"
    case DoubleType => "DOUBLE"
    case FloatType => "REAL"
    case BooleanType => "BOOLEAN"
    case DateType => "DATE"
    case TimestampType => "TIMESTAMP"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case StringType => "VARCHAR(4000)"
    case other => throw new IllegalArgumentException(
      s"JDBC sink cannot evolve a column of type $other")
  }

  /** String columns must land as VARCHAR, not the dialect's LOB default
    * (Derby maps StringType to CLOB, which its own engine then refuses to
    * compare against literals — breaking the pushed-down S10 probe; MySQL
    * would pick TEXT with the same non-indexable problem). Serving-sized
    * facts carry labels, not documents; 4000 chars matches the widest
    * common VARCHAR ceiling. */
  private def stringColumnTypes(schema: StructType): Option[String] = {
    val ss = schema.fields.filter(_.dataType == StringType)
    if (ss.isEmpty) None
    else Some(ss.map(f => s"`${f.name}` VARCHAR(4000)").mkString(", "))
  }

  def append(fact: String, batch: DataFrame): Unit = {
    read(fact) match {
      case None => // Spark's JDBC writer creates the table on first append
      case Some(existing) =>
        val byName = existing.schema.fields
          .map(f => f.name.toLowerCase -> f.dataType).toMap
        val conflicts = batch.schema.fields.filter(f =>
          byName.get(f.name.toLowerCase).exists(_ != f.dataType))
        require(conflicts.isEmpty,
          s"JDBC sink: column type change needs out-of-band DDL " +
            s"(${conflicts.map(f => s"${f.name}: ${byName(f.name.toLowerCase)} -> ${f.dataType}")
              .mkString(", ")})")
        val added = batch.schema.fields
          .filterNot(f => byName.contains(f.name.toLowerCase))
        if (added.nonEmpty) withConnection { conn =>
          val st = conn.createStatement()
          try added.foreach { f =>
            st.executeUpdate(
              s"""ALTER TABLE $fact ADD COLUMN "${f.name}" ${sqlType(f.dataType)}""")
          } finally st.close()
        }
    }
    val w0 = batch.write.format("jdbc")
      .option("url", url).option("dbtable", fact)
      .option("batchsize", batchSize.toString)
    val w = stringColumnTypes(batch.schema)
      .map(t => w0.option("createTableColumnTypes", t)).getOrElse(w0)
    props.foldLeft(w) { case (acc, (k, v)) => acc.option(k, v) }
      .mode(SaveMode.Append).save()
  }

  /** Replace the fact's content wholesale (the streaming complete-mode
    * sink against JDBC): `TRUNCATE` + bulk insert, preserving the remote
    * DDL (indexes, grants) rather than drop/recreate. */
  def overwrite(fact: String, batch: DataFrame): Unit = {
    val w0 = batch.write.format("jdbc")
      .option("url", url).option("dbtable", fact)
      .option("batchsize", batchSize.toString)
      .option("truncate", "true")
    val w = stringColumnTypes(batch.schema)
      .map(t => w0.option("createTableColumnTypes", t)).getOrElse(w0)
    props.foldLeft(w) { case (acc, (k, v)) => acc.option(k, v) }
      .mode(SaveMode.Overwrite).save()
  }

  /** Drop the fact (the reference's `delete` analog, OLAP.php:385). */
  def drop(fact: String): Unit =
    if (exists(fact)) withConnection { conn =>
      val st = conn.createStatement()
      try st.executeUpdate(s"DROP TABLE $fact") finally st.close()
    }
}

object JdbcWarehouse {

  /** Spark's Derby dialect maps StringType to CLOB, which breaks the sink
    * twice over: Derby refuses CLOB-vs-literal comparisons (the pushed-down
    * S10 probe) and refuses `setNull(Types.CLOB)` against the VARCHAR
    * columns `createTableColumnTypes` requests (any null string field —
    * e.g. a monthly scope's `week`). Register one overriding dialect that
    * keeps every other Derby mapping and pins StringType to VARCHAR, so
    * DDL, null setters, and pushdown agree. Registered lazily once;
    * affects only jdbc:derby URLs. */
  private lazy val ensureDerbyVarcharDialectOnce: Unit = {
    import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects, JdbcType}
    // capture the stock dialect BEFORE registering the override (get would
    // otherwise resolve to the override itself)
    val derby = JdbcDialects.get("jdbc:derby:")
    JdbcDialects.registerDialect(new JdbcDialect {
      override def canHandle(u: String): Boolean = u.startsWith("jdbc:derby")
      override def getJDBCType(dt: org.apache.spark.sql.types.DataType): Option[JdbcType] =
        dt match {
          case StringType => Some(JdbcType("VARCHAR(4000)", java.sql.Types.VARCHAR))
          case other => derby.getJDBCType(other)
        }
      override def getCatalystType(sqlType: Int, typeName: String, size: Int,
          md: org.apache.spark.sql.types.MetadataBuilder): Option[org.apache.spark.sql.types.DataType] =
        derby.getCatalystType(sqlType, typeName, size, md)
      override def quoteIdentifier(colName: String): String =
        derby.quoteIdentifier(colName)
      override def isCascadingTruncateTable(): Option[Boolean] =
        derby.isCascadingTruncateTable()
    })
  }

  private[snapshot] def ensureDerbyVarcharDialect(): Unit =
    ensureDerbyVarcharDialectOnce
}
