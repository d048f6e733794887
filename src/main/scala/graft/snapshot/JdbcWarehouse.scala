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
  * batch's columns). A shared-column TYPE change resolves through the same
  * widening lattice as the parquet path ([[SchemaEvolution.widen]], the
  * reference's `CHANGE COLUMN`, OLAP.php:186-192): a narrower batch casts
  * up with no DDL; a table that must widen does so in place on MySQL
  * (`MODIFY COLUMN`) and by staged copy-rewrite everywhere else (Derby has
  * no general retyping DDL) — stage the widened copy in `<fact>_evolve`,
  * then drop + rename, with [[vacuum]] finishing a crashed swap from the
  * staged copy. A type the lattice resolves to something the sink cannot
  * carry (arrays, structs, ...) still rejects loudly.
  */
final class JdbcWarehouse(spark: SparkSession, url: String,
    props: Map[String, String] = Map.empty,
    batchSize: Int = 10000) extends FactStore {

  if (url.startsWith("jdbc:derby")) JdbcWarehouse.ensureDerbyVarcharDialect()

  /** Fact names are interpolated into raw DDL/probe SQL; confine them to
    * identifier characters so an exotic or hostile name cannot inject or
    * break statements (same contract as `Warehouse.tag`). */
  private def validFact(fact: String): Unit =
    require(fact.matches("[A-Za-z0-9_]+"),
      s"fact name must match [A-Za-z0-9_]+, got '$fact'")

  private def withConnection[T](body: java.sql.Connection => T): T = {
    val p = new java.util.Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    val conn = java.sql.DriverManager.getConnection(url, p)
    try body(conn) finally conn.close()
  }

  private def execute(sql: String): Unit = withConnection { conn =>
    val st = conn.createStatement()
    try st.executeUpdate(sql) finally st.close()
  }

  private def quote(name: String): String =
    org.apache.spark.sql.jdbc.JdbcDialects.get(url).quoteIdentifier(name)

  /** Dialect-neutral existence probe: a zero-row SELECT succeeds iff the
    * table exists (metadata catalogs disagree on identifier case across
    * RDBMSs; a probe query never does). */
  def exists(fact: String): Boolean = {
    validFact(fact)
    withConnection { conn =>
      try {
        val st = conn.createStatement()
        try { st.executeQuery(s"SELECT 1 FROM $fact WHERE 1=0").close(); true }
        finally st.close()
      } catch { case _: java.sql.SQLException => false }
    }
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

  private def isMySql: Boolean =
    url.startsWith("jdbc:mysql") || url.startsWith("jdbc:mariadb")

  /** The in-place widening DDL (MySQL family; OLAP.php:186-192's
    * `CHANGE COLUMN` modulo the rename it never uses). Exposed for specs:
    * the sandbox has no MySQL server, so the statement text is the
    * testable surface. */
  private[snapshot] def modifyColumnSql(fact: String, name: String,
      dt: DataType): String =
    s"ALTER TABLE $fact MODIFY COLUMN ${quote(name)} ${sqlType(dt)}"

  /** Fallback widening for dialects without general retyping DDL: stage
    * the full widened table (existing ∪ batch through the lattice) as
    * `<fact>_evolve`, then drop + rename. The live table stays intact
    * until the staged copy has fully landed; a crash between the drop and
    * the rename leaves the complete copy staged, which [[vacuum]] swaps
    * in. Copy cost is the table size — acceptable by design: this sink
    * carries serving-sized facts, and retyping is a once-per-schema-life
    * event (the parquet path pays the same full rewrite). */
  private def copyRewrite(fact: String, existing: DataFrame,
      batch: DataFrame): Unit = {
    val merged = SchemaEvolution.unionEvolve(existing, batch)
    writeBatch(s"${fact}_evolve", merged, SaveMode.Overwrite, truncate = false)
    execute(s"DROP TABLE $fact")
    renameTable(s"${fact}_evolve", fact)
  }

  private def renameTable(from: String, to: String): Unit =
    execute(
      if (isMySql || url.startsWith("jdbc:derby")) s"RENAME TABLE $from TO $to"
      else s"ALTER TABLE $from RENAME TO $to")

  /** Finish or discard a crashed [[copyRewrite]]: a missing fact with a
    * staged `<fact>_evolve` swaps the (complete by protocol) copy in; a
    * leftover staging next to a live fact is junk from a crash before the
    * drop and is removed. Safe any time; no-op on a healthy fact. */
  def vacuum(fact: String): Unit = {
    validFact(fact)
    val tmp = s"${fact}_evolve"
    if (!exists(fact) && exists(tmp)) renameTable(tmp, fact)
    else if (exists(tmp)) execute(s"DROP TABLE $tmp")
  }

  /** Cast batch columns shared with the table up to the table's (possibly
    * just-widened) types, so the INSERT binds the remote column types
    * exactly. Casting to the same type is a no-op. */
  private def alignShared(batch: DataFrame,
      types: Map[String, DataType]): DataFrame = {
    import org.apache.spark.sql.functions.col
    batch.select(batch.columns.map { c =>
      types.get(c.toLowerCase).map(t => col(c).cast(t).as(c)).getOrElse(col(c))
    }.toIndexedSeq: _*)
  }

  def append(fact: String, batch: DataFrame): Unit = {
    validFact(fact)
    read(fact) match {
      case None => // Spark's JDBC writer creates the table on first append
        writeBatch(fact, batch, SaveMode.Append)
      case Some(existing) =>
        val byName = existing.schema.fields
          .map(f => f.name.toLowerCase -> f.dataType).toMap
        // shared columns whose batch type differs resolve through the
        // widening lattice; only a table-side widening needs DDL
        val tableWiden = batch.schema.fields.toSeq.flatMap { f =>
          byName.get(f.name.toLowerCase).flatMap { et =>
            val w = SchemaEvolution.widen(et, f.dataType)
            if (w == et) None else Some((f.name, w))
          }
        }
        // loud reject up front when the widened type has no SQL carrier —
        // before any DDL has touched the remote table
        tableWiden.foreach { case (_, w) => sqlType(w) }
        val target: Map[String, DataType] =
          if (tableWiden.isEmpty) byName
          else if (isMySql) {
            tableWiden.foreach { case (n, w) =>
              execute(modifyColumnSql(fact, n, w))
            }
            byName ++ tableWiden.map { case (n, w) => n.toLowerCase -> w }
          } else {
            copyRewrite(fact, existing, batch)
            return // the staged rewrite already contains the batch
          }
        val added = batch.schema.fields
          .filterNot(f => byName.contains(f.name.toLowerCase))
        added.foreach { f =>
          execute(s"ALTER TABLE $fact ADD COLUMN ${quote(f.name)} ${sqlType(f.dataType)}")
        }
        writeBatch(fact, alignShared(batch, target), SaveMode.Append)
    }
  }

  private def writeBatch(table: String, df: DataFrame, mode: SaveMode,
      truncate: Boolean = false): Unit = {
    val w0 = df.write.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("batchsize", batchSize.toString)
      .option("truncate", truncate.toString)
    val w = stringColumnTypes(df.schema)
      .map(t => w0.option("createTableColumnTypes", t)).getOrElse(w0)
    props.foldLeft(w) { case (acc, (k, v)) => acc.option(k, v) }
      .mode(mode).save()
  }

  /** Replace the fact's content wholesale (the streaming complete-mode
    * sink against JDBC): `TRUNCATE` + bulk insert, preserving the remote
    * DDL (indexes, grants) rather than drop/recreate. */
  def overwrite(fact: String, batch: DataFrame): Unit = {
    validFact(fact)
    writeBatch(fact, batch, SaveMode.Overwrite, truncate = true)
  }

  /** Drop the fact (the reference's `delete` analog, OLAP.php:385). */
  def drop(fact: String): Unit =
    if (exists(fact)) execute(s"DROP TABLE $fact")
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
