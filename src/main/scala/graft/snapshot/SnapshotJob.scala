package graft.snapshot

import java.time.LocalDate

import graft.time.TimeScope
import graft.time.TimeScope.{Cron, Scope}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The snapshot ETL lifecycle (reference: library_olap/OLAP.php:296-374,
  * traced in SURVEY.md §3.1), re-expressed as one declarative Spark job per
  * fact query:
  *
  *   source query -> time-field injection -> idempotency anti-probe ->
  *   schema-evolving append to a year-partitioned parquet fact table.
  *
  * No per-row driver traffic (the reference's scalability ceiling was its
  * row-at-a-time PHP copy loop, OLAP.php:373-374).
  */
object SnapshotJob {

  /** One configured fact query (reference: library_olap/README.md:32-36). */
  sealed trait Source
  /** SQL text executed against the session catalog (or JDBC-registered
    * views); `@date` is substituted with the pivot date (S11,
    * OLAP.php:338-339). */
  final case class SqlSource(sql: String) extends Source
  /** External command emitting a JSON array of objects on stdout; the pivot
    * date is passed as the last argv (S2, OLAP.php:73-79,344-348). */
  final case class ScriptSource(command: String) extends Source
  /** Live-RDBMS source (S1): the configured SQL runs on the remote database
    * through the JDBC reader, exactly the reference's read-only
    * production-DB role (OLAP.php:81-89). `props` carries driver, user,
    * password etc.
    *
    * Parallel reads (the 100 TB snapshot path — a single-stream JDBC pull
    * is the one serialization point a nightly production snapshot cannot
    * afford): either set `partitionColumn`/`lowerBound`/`upperBound`/
    * `numPartitions` in `props` (the query is wrapped as a `dbtable`
    * subselect, since Spark forbids `query` + `partitionColumn`), or pass
    * explicit `predicates` — one WHERE clause per partition, for
    * non-numeric or skewed split keys. Plain single-stream `query`
    * pushdown remains the default when neither is given. */
  final case class JdbcSource(url: String, sql: String,
      props: Map[String, String] = Map.empty,
      predicates: Seq[String] = Nil) extends Source
  /** Distributed script source: the command runs on EXECUTORS, one process
    * per shard (the 100 TB analog of S2's single driver-side exec). Shard
    * contract: the command receives the pivot date as argv and its shard
    * index on stdin, and emits JSON-LINES rows (one object per line). */
  final case class PipeSource(command: String, shards: Int) extends Source
  /** File-drop source — the Spark-native sibling the reference's DB-only
    * world lacks, and the dominant 100 TB arrival path (exports, log
    * shippers, upstream lake zones). `path` may contain `@date`
    * (substituted UNQUOTED, unlike S11's SQL form) so a daily drop like
    * `/landing/orders/@date/` resolves per pivot. `format` + `options`
    * pass through to the DataFrameReader (parquet/csv/json/orc/...); an
    * optional `schema` entry in `options` is applied as a DDL schema (the
    * production form — inference over a 100 TB drop is a full extra
    * scan). csv/json get the same S9 date-string promotion as the script
    * sources. */
  final case class FileSource(path: String, format: String = "parquet",
      options: Map[String, String] = Map.empty) extends Source

  final case class FactQuery(queryId: Long, enabled: Boolean, source: Source,
      info: String = "")

  final case class FactConfig(name: String, cron: Cron,
      queries: Seq[FactQuery], label: String = "", info: String = "")

  final case class Settings(facts: Seq[FactConfig])

  /** Names and order of the injected time fields — injected first, like the
    * reference's sink DDL (OLAP.php:356-365). */
  val timeFields: Seq[String] =
    Seq("queryId", "year", "month", "week", "day", "executionDate")

  /** `@date` substitution (S11): strip CRs, replace `@date` with the quoted
    * pivot date string — exactly the reference's form (OLAP.php:338-339),
    * which every SQL dialect (Spark, MySQL, Derby, ...) implicitly casts in
    * date comparisons. */
  def substitute(sql: String, pivot: LocalDate): String =
    sql.replace("\r", "").replace("@date", s"'$pivot'")

  /** Run a script source: pivot date as trailing argument, stdout parsed as
    * a JSON array of flat objects, schema inferred (S9) with the reference's
    * first-row date-sniff promoting parseable strings to timestamp. */
  def runScript(spark: SparkSession, command: String, pivot: LocalDate): DataFrame = {
    import scala.sys.process._
    val out = s"$command $pivot".!!
    readJsonRows(spark, out)
  }

  /** Run a PipeSource: `shards` executor-side processes via `RDD.pipe`,
    * each fed its shard index on stdin, each emitting JSON-lines. Output
    * schema is inferred the same way as the driver-side script path. */
  def runPipe(spark: SparkSession, command: String, pivot: LocalDate,
      shards: Int): DataFrame = {
    import spark.implicits._
    val lines = spark.sparkContext
      .parallelize(0 until shards, shards)
      .map(_.toString)
      .pipe(Seq(command, pivot.toString))
    promoteDateStrings(spark.read.json(spark.createDataset(lines)))
  }

  /** Run a JdbcSource: pushdown on the remote database — single-stream
    * `query`, range-partitioned `dbtable` subselect, or explicit
    * per-partition predicates (see JdbcSource). */
  def runJdbc(spark: SparkSession, src: JdbcSource, pivot: LocalDate): DataFrame = {
    val sql = substitute(src.sql, pivot)
    if (src.predicates.nonEmpty) {
      // one remote cursor per predicate; rows must partition the result
      // set (disjoint + covering), which is the caller's contract
      val props = new java.util.Properties()
      src.props.foreach { case (k, v) => props.setProperty(k, v) }
      spark.read.jdbc(src.url, s"($sql) graft_src", src.predicates.toArray, props)
    } else {
      val reader = spark.read.format("jdbc")
        .option("url", src.url)
      val keyed =
        if (src.props.contains("partitionColumn"))
          // Spark rejects `query` combined with partitionColumn — wrap the
          // configured SQL as a derived-table `dbtable` instead, so the
          // remote read fans out over numPartitions range slices
          reader.option("dbtable", s"($sql) graft_src")
        else reader.option("query", sql)
      src.props.foldLeft(keyed) { case (r, (k, v)) => r.option(k, v) }.load()
    }
  }

  /** Run a FileSource: resolve `@date` in the path (raw ISO form — paths
    * are not SQL), bind the explicit schema when given, and read through
    * the standard DataFrameReader. */
  def runFile(spark: SparkSession, src: FileSource, pivot: LocalDate): DataFrame = {
    val path = src.path.replace("\r", "").replace("@date", pivot.toString)
    val opts = src.options - "schema"
    val r0 = spark.read.format(src.format).options(opts)
    val r = src.options.get("schema").map(r0.schema).getOrElse(r0)
    val df = r.load(path)
    if (src.format == "csv" || src.format == "json") promoteDateStrings(df)
    else df
  }

  /** Parse a JSON array-of-objects string into a DataFrame, then promote
    * date-parseable string columns to timestamp — mirroring the reference's
    * first-row-only inference (OLAP.php:251-285) but sampling properly. */
  def readJsonRows(spark: SparkSession, json: String): DataFrame = {
    import spark.implicits._
    // spark.read.json over an in-memory dataset; each element one JSON doc
    val ds = spark.createDataset(Seq(json))
    val df = spark.read.option("multiLine", "true").json(ds)
    promoteDateStrings(df)
  }

  private val dateLike = "^\\d{4}-\\d{2}-\\d{2}([ T]\\d{2}:\\d{2}(:\\d{2})?)?$".r

  /** Promote string columns to timestamp when EVERY sampled non-null value
    * is date-shaped (the reference sniffs only the first row,
    * OLAP.php:252 — a quirk this rebuild fixes: one date-looking value must
    * not null out a free-text column). */
  def promoteDateStrings(df: DataFrame, sampleRows: Int = 100): DataFrame = {
    val sample = df.limit(sampleRows).collect()
    if (sample.isEmpty) return df
    val promote = df.schema.fields.zipWithIndex.collect {
      case (f, i) if f.dataType == org.apache.spark.sql.types.StringType &&
        sample.exists(_.get(i) != null) &&
        sample.forall(r => r.get(i) == null || dateLike.matches(r.getString(i))) =>
        f.name
    }.toSet
    if (promote.isEmpty) df
    else df.select(df.columns.map { c =>
      if (promote(c)) to_timestamp(col(c)).as(c) else col(c)
    }.toIndexedSeq: _*)
  }

  /** Inject the six time-scope fields, first (S5 ordering). `executionDate`
    * is wall-clock ISO-8601 (PHP date('c'), OLAP.php:372) — excluded from
    * correctness hashing by design. Source queries must not emit columns
    * with these reserved names — the injection would otherwise produce a
    * duplicate-name frame that fails only at some later, harder-to-blame
    * point (the reference's sink DDL would likewise reject it). */
  def withTimeFields(df: DataFrame, queryId: Long, scope: Scope): DataFrame = {
    val clash = df.columns.filter(c => timeFields.exists(_.equalsIgnoreCase(c)))
    require(clash.isEmpty,
      s"source query emits reserved time-scope column(s): ${clash.mkString(", ")}" +
        s" (reserved: ${timeFields.mkString(", ")})")
    def optLit[T](o: Option[T]) =
      o.map(v => lit(v)).getOrElse(lit(null))
    df.select(
      (lit(queryId).cast("long").as("queryId") ::
        optLit(scope.year).cast("long").as("year") ::
        optLit(scope.month).cast("long").as("month") ::
        optLit(scope.week).cast("string").as("week") ::
        optLit(scope.day).cast("long").as("day") ::
        date_format(current_timestamp(), "yyyy-MM-dd'T'HH:mm:ssXXX")
          .as("executionDate") ::
        df.columns.map(col).toList): _*)
  }

  /** Null-safe idempotency probe (S10): true if a batch with this
    * (queryId, scope) already exists. The reference builds `day = ` SQL for
    * NULL scope fields and silently fails for non-daily facts
    * (OLAP.php:166-175) — fixed here with `<=>`. */
  def alreadyLoaded(fact: DataFrame, queryId: Long, scope: Scope): Boolean = {
    def nullSafe(c: String, v: Option[Any]) =
      col(c) <=> v.map(lit(_)).getOrElse(lit(null))
    !fact.filter(col("queryId") === queryId &&
        nullSafe("year", scope.year) && nullSafe("month", scope.month) &&
        nullSafe("week", scope.week) && nullSafe("day", scope.day))
      .isEmpty
  }

  /** Reference-fidelity mode: the original stores NEWDECIMAL results as
    * INT(21), truncating SUM(...) fractions (OLAP.php:57 — a bug/quirk the
    * rebuild fixes by default, SURVEY §1.2). With compat=true, decimal
    * source columns are cast to long at ingest to reproduce byte-identical
    * historical fact tables during a migration. */
  def compatNarrow(df: DataFrame): DataFrame = {
    val decimals = df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType] => f.name
    }.toSet
    if (decimals.isEmpty) df
    else df.select(df.columns.map { c =>
      if (decimals(c)) col(c).cast("long").as(c) else col(c)
    }.toIndexedSeq: _*)
  }

  /** Run one snapshot pass for the pivot date over all configured facts.
    * Returns the fact names actually written. */
  def run(spark: SparkSession, settings: Settings, warehouse: FactStore,
      pivot: LocalDate, onlyFact: Option[String] = None,
      compat: Boolean = false): Seq[String] = {
    settings.facts.flatMap { fact =>
      if (onlyFact.exists(_ != fact.name)) None
      else TimeScope.scopeFor(fact.cron, pivot) match {
        case None => None // periodicity gate: not the last day of the period
        case Some(scope) =>
          // the idempotency read-check + append pair below is safe only
          // under ONE writer: hold the fact's lease for the whole pass
          // (a second concurrent job fails loudly instead of interleaving)
          def underLease[T](body: => T): T = warehouse match {
            case w: Warehouse =>
              w.withWriterLease(fact.name, holder = s"snapshot-$pivot")(body)
            case _ => body // JDBC stores serialize at the database
          }
          val wrote = underLease { fact.queries.filter(_.enabled).map { q =>
            val existing = warehouse.read(fact.name)
            if (existing.exists(alreadyLoaded(_, q.queryId, scope))) false
            else {
              val src0 = q.source match {
                case SqlSource(sql) => spark.sql(substitute(sql, pivot))
                case ScriptSource(cmd) => runScript(spark, cmd, pivot)
                case j: JdbcSource => runJdbc(spark, j, pivot)
                case PipeSource(cmd, shards) => runPipe(spark, cmd, pivot, shards)
                case fsrc: FileSource => runFile(spark, fsrc, pivot)
              }
              val src = if (compat) compatNarrow(src0) else src0
              warehouse.append(fact.name, withTimeFields(src, q.queryId, scope))
              true
            }
          } }
          if (wrote.exists(identity)) Some(fact.name) else None
      }
    }
  }
}
