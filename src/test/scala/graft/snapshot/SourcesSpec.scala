package graft.snapshot

import java.time.LocalDate

import graft.SparkTestBase
import graft.time.TimeScope.Cron

import org.apache.spark.sql.functions._

/** The remaining source/sink operators: live-JDBC (S1, against embedded
  * Derby), the distributed pipe script source, compaction, and rollup. */
class SourcesSpec extends SparkTestBase {
  import spark.implicits._

  test("JDBC source (S1): pushdown query on a live RDBMS incl. @date") {
    val url = "jdbc:derby:memory:graftdb;create=true"
    // seed the database through plain JDBC
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE loans (patron_id INT, amount DOUBLE, loan_date DATE)")
    st.execute("INSERT INTO loans VALUES (1, 10.5, '2024-01-10'), " +
      "(2, 20.0, '2024-01-20'), (3, 5.25, '2024-01-12')")
    conn.close()

    val src = SnapshotJob.JdbcSource(url,
      "SELECT patron_id, amount FROM loans WHERE loan_date <= @date")
    val df = SnapshotJob.runJdbc(spark, src, LocalDate.parse("2024-01-15"))
    assert(df.count() == 2) // date filter ran remotely
    assert(df.agg(sum("amount")).as[Double].collect()(0) == 15.75)

    // and through the full snapshot lifecycle
    val wh = new Warehouse(spark,
      java.nio.file.Files.createTempDirectory("jdbc_wh").toString)
    val settings = SnapshotJob.Settings(Seq(SnapshotJob.FactConfig(
      "loans", Cron.Daily, Seq(SnapshotJob.FactQuery(1, enabled = true, src)))))
    assert(SnapshotJob.run(spark, settings, wh, LocalDate.parse("2024-01-15")) ==
      Seq("loans"))
    assert(wh.read("loans").get.count() == 2)
  }

  test("JDBC source: range-partitioned parallel read (dbtable subselect)") {
    val url = "jdbc:derby:memory:graftdb_part;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE loans (patron_id INT, amount DOUBLE, loan_date DATE)")
    (1 to 20).foreach(i =>
      st.execute(s"INSERT INTO loans VALUES ($i, ${i * 1.5}, '2024-01-10')"))
    conn.close()

    val single = SnapshotJob.runJdbc(spark, SnapshotJob.JdbcSource(url,
      "SELECT patron_id, amount FROM loans WHERE loan_date <= @date"),
      LocalDate.parse("2024-01-15"))
    // Derby stores unquoted identifiers uppercase; Spark quotes the
    // partition column verbatim in its generated WHERE clauses, so the
    // configured name must match the stored case
    val part = SnapshotJob.runJdbc(spark, SnapshotJob.JdbcSource(url,
      "SELECT patron_id, amount FROM loans WHERE loan_date <= @date",
      props = Map("partitionColumn" -> "PATRON_ID", "lowerBound" -> "1",
        "upperBound" -> "21", "numPartitions" -> "4")),
      LocalDate.parse("2024-01-15"))
    assert(part.rdd.getNumPartitions > 1) // genuinely parallel remote read
    assert(part.count() == 20)
    // identical rows to the single-stream read
    assert(part.except(single).isEmpty && single.except(part).isEmpty)
  }

  test("JDBC source: explicit per-partition predicates") {
    val url = "jdbc:derby:memory:graftdb_pred;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE loans (patron_id INT, amount DOUBLE)")
    (1 to 10).foreach(i => st.execute(s"INSERT INTO loans VALUES ($i, $i)"))
    conn.close()

    val df = SnapshotJob.runJdbc(spark, SnapshotJob.JdbcSource(url,
      "SELECT patron_id, amount FROM loans",
      predicates = Seq("PATRON_ID <= 5", "PATRON_ID > 5")),
      LocalDate.parse("2024-01-15"))
    assert(df.rdd.getNumPartitions == 2)
    assert(df.count() == 10)
    assert(df.agg(sum("amount")).as[Double].collect()(0) == 55.0)
  }

  test("JDBC write-back sink: create-if-absent, bulk append, S10 idempotency") {
    val url = "jdbc:derby:memory:graftdb_sink;create=true"
    val jw = new JdbcWarehouse(spark, url)
    assert(jw.read("wb_fact").isEmpty)

    Seq(("a", 10L), ("b", 20L)).toDF("k", "value")
      .createOrReplaceTempView("wb_src")
    val settings = SnapshotJob.Settings(Seq(SnapshotJob.FactConfig(
      "wb_fact", Cron.Daily, Seq(SnapshotJob.FactQuery(3, enabled = true,
        SnapshotJob.SqlSource("SELECT k, value FROM wb_src"))))))
    // first run creates + loads; re-run must be a no-op against the RDBMS
    assert(SnapshotJob.run(spark, settings, jw, LocalDate.parse("2024-02-01"))
      == Seq("wb_fact"))
    assert(SnapshotJob.run(spark, settings, jw, LocalDate.parse("2024-02-01"))
      == Seq())
    val back = jw.read("wb_fact").get
    assert(back.count() == 2)
    assert(back.agg(sum("value")).as[Long].collect()(0) == 30L)
    // a different pivot date appends a second batch
    assert(SnapshotJob.run(spark, settings, jw, LocalDate.parse("2024-02-02"))
      == Seq("wb_fact"))
    assert(jw.read("wb_fact").get.count() == 4)
  }

  test("JDBC sink schema evolution: new columns ALTER in, older rows null-fill") {
    val url = "jdbc:derby:memory:graftdb_evo;create=true"
    val jw = new JdbcWarehouse(spark, url)
    jw.append("evo", Seq((1L, "x")).toDF("id", "name"))
    // batch ADDS a column -> ALTER TABLE ADD COLUMN, old rows read null
    jw.append("evo", Seq((2L, "y", 9.5)).toDF("id", "name", "score"))
    val back = jw.read("evo").get.orderBy("id")
    assert(back.columns.toSeq.map(_.toLowerCase) == Seq("id", "name", "score"))
    assert(back.select("score").collect().map(r =>
      Option(r.get(0))).toSeq == Seq(None, Some(9.5)))
    // batch MISSING a column -> insert lists only its columns, null-fills
    jw.append("evo", Seq(Tuple1(3L)).toDF("id"))
    assert(jw.read("evo").get.count() == 3)
    // NULL in a string column must survive the write path (Derby rejects
    // setNull(Types.CLOB) on VARCHAR — the dialect override's null-setter
    // contract; a monthly scope's null week hits exactly this)
    jw.append("evo", Seq((4L, null.asInstanceOf[String])).toDF("id", "name"))
    assert(jw.read("evo").get.filter(col("id") === 4L && col("name").isNull)
      .count() == 1)
    // overwrite replaces content, preserving the remote DDL
    jw.overwrite("evo", Seq((7L, "z", 1.0)).toDF("id", "name", "score"))
    assert(jw.read("evo").get.count() == 1)
    jw.drop("evo")
    assert(jw.read("evo").isEmpty)
  }

  test("JDBC sink type widening: lattice round-trip via copy-rewrite on Derby") {
    import org.apache.spark.sql.types._
    val url = "jdbc:derby:memory:graftdb_widen;create=true"
    val jw = new JdbcWarehouse(spark, url)
    jw.append("wide", Seq((1L, 10L), (2L, 20L)).toDF("id", "v"))
    // LONG -> DECIMAL: table must widen; Derby has no retyping DDL, so the
    // staged copy-rewrite path runs (S7 parity with the parquet rewrite)
    jw.append("wide", Seq((3L, BigDecimal("30.25")))
      .toDF("id", "v").select(col("id"),
        col("v").cast(DecimalType(18, 2)).as("v")))
    val back = jw.read("wide").get
    assert(back.schema("v").dataType.isInstanceOf[DecimalType])
    assert(back.count() == 3)
    assert(back.agg(sum(col("v")).cast("double")).as[Double].collect()(0)
      == 60.25)
    // narrower batch (INT into the now-DECIMAL column): casts up, no DDL
    jw.append("wide", Seq((4, 5)).toDF("id", "v"))
    assert(jw.read("wide").get.count() == 4)
    // LONG -> STRING on a widened re-read: id stays LONG, v already wide
    // enough; a STRING batch value for id widens id via a second rewrite
    jw.append("wide", Seq(Tuple1("not-a-long")).toDF("id"))
    val back2 = jw.read("wide").get
    assert(back2.schema("id").dataType == StringType)
    assert(back2.count() == 5)
    assert(back2.filter(col("id") === "1").count() == 1) // old rows retyped
  }

  test("JDBC sink: crashed widening swap is finished (or cleared) by vacuum") {
    val url = "jdbc:derby:memory:graftdb_vac;create=true"
    val jw = new JdbcWarehouse(spark, url)
    // crash between DROP and RENAME: only the staged copy exists
    jw.append("gone_evolve", Seq((1L, 2.0)).toDF("id", "v"))
    assert(jw.read("gone").isEmpty)
    jw.vacuum("gone")
    assert(jw.read("gone").get.count() == 1)
    // crash before the DROP: live fact + leftover staging -> staging junked
    jw.append("live", Seq((1L, 1.0)).toDF("id", "v"))
    jw.append("live_evolve", Seq((9L, 9.0)).toDF("id", "v"))
    jw.vacuum("live")
    assert(jw.read("live").get.count() == 1)
    assert(jw.read("live_evolve").isEmpty)
    // no-op on a healthy fact
    jw.vacuum("live")
    assert(jw.read("live").get.count() == 1)
  }

  test("JDBC sink rejects non-identifier fact names before any SQL runs") {
    val jw = new JdbcWarehouse(spark, "jdbc:derby:memory:graftdb_id;create=true")
    Seq("evil; DROP TABLE x", "a b", "x\"y", "").foreach { bad =>
      val e = intercept[IllegalArgumentException] { jw.exists(bad) }
      assert(e.getMessage.contains("fact name"))
    }
    // MySQL MODIFY statement shape (no MySQL server in the sandbox; the
    // statement text is the testable surface of the in-place path)
    assert(jw.modifyColumnSql("f", "v",
      org.apache.spark.sql.types.DecimalType(18, 2))
      == """ALTER TABLE f MODIFY COLUMN "v" DECIMAL(18,2)""")
  }

  test("file-drop source: @date path templating, explicit schema, S10 idempotency") {
    val drop = java.nio.file.Files.createTempDirectory("file_drop")
    Seq(("a", 10.5), ("b", 2.25)).toDF("k", "amount")
      .coalesce(1).write.option("header", "true").mode("overwrite")
      .csv(s"$drop/2024-02-01")
    val src = SnapshotJob.FileSource(s"$drop/@date", "csv",
      Map("header" -> "true", "schema" -> "k STRING, amount DOUBLE"))
    val df = SnapshotJob.runFile(spark, src, LocalDate.parse("2024-02-01"))
    assert(df.schema("amount").dataType ==
      org.apache.spark.sql.types.DoubleType) // explicit DDL schema bound
    assert(df.agg(sum("amount")).as[Double].collect()(0) == 12.75)

    val wh = new Warehouse(spark,
      java.nio.file.Files.createTempDirectory("file_wh").toString)
    val settings = SnapshotJob.Settings(Seq(SnapshotJob.FactConfig(
      "drops", Cron.Daily, Seq(SnapshotJob.FactQuery(4, enabled = true, src)))))
    assert(SnapshotJob.run(spark, settings, wh, LocalDate.parse("2024-02-01"))
      == Seq("drops"))
    assert(SnapshotJob.run(spark, settings, wh, LocalDate.parse("2024-02-01"))
      == Seq()) // S10: same scope never double-loads
    assert(wh.read("drops").get.count() == 2)
    // a fresh dated drop loads under its own scope
    Seq(("c", 1.0)).toDF("k", "amount")
      .coalesce(1).write.option("header", "true").mode("overwrite")
      .csv(s"$drop/2024-02-02")
    assert(SnapshotJob.run(spark, settings, wh, LocalDate.parse("2024-02-02"))
      == Seq("drops"))
    assert(wh.read("drops").get.count() == 3)
    // json drops get the S9 date-string promotion like the script sources
    val jdrop = java.nio.file.Files.createTempDirectory("json_drop")
    Seq("""{"k": "x", "seen": "2024-02-01"}""").toDF("value")
      .coalesce(1).write.mode("overwrite").text(s"$jdrop/2024-02-01")
    val jdf = SnapshotJob.runFile(spark,
      SnapshotJob.FileSource(s"$jdrop/@date", "json"),
      LocalDate.parse("2024-02-01"))
    assert(jdf.schema("seen").dataType ==
      org.apache.spark.sql.types.TimestampType)
  }

  test("ORC export + re-ingest: self-describing schema, types lossless") {
    import org.apache.spark.sql.types._
    val wh = new Warehouse(spark,
      java.nio.file.Files.createTempDirectory("orc_wh").toString)
    val src = Seq(
      ("a", BigDecimal("10.55"), java.sql.Date.valueOf("2024-01-03")),
      ("b", BigDecimal("2.25"), java.sql.Date.valueOf("2023-12-31")))
      .toDF("k", "amount", "seen")
      .select(col("k"), col("amount").cast(DecimalType(12, 2)).as("amount"),
        col("seen"))
    wh.append("f", src.withColumn("year", lit(2024L)))
    val out = java.nio.file.Files.createTempDirectory("orc_out")
    // column pruning drops the internal scope field for interchange
    wh.export("f", s"$out/2024-02-01", format = "orc",
      columns = Seq("k", "amount", "seen"))
    // re-ingest through the S9 file path: NO inference options needed —
    // ORC carries its schema, and the type lattice survives exactly
    val back = SnapshotJob.runFile(spark,
      SnapshotJob.FileSource(s"$out/@date", "orc"),
      LocalDate.parse("2024-02-01"))
    assert(back.schema("amount").dataType == DecimalType(12, 2))
    assert(back.schema("seen").dataType == DateType)
    assert(back.orderBy("k").collect().map(_.toSeq).toSeq ==
      src.orderBy("k").collect().map(_.toSeq).toSeq)
    // unknown fact fails loudly, not with an empty write
    intercept[IllegalArgumentException](wh.export("nope", s"$out/x"))
  }

  test("distributed pipe source: shard-per-executor-process JSON-lines") {
    val script = java.nio.file.Files.createTempFile("shard", ".sh")
    java.nio.file.Files.writeString(script,
      """#!/bin/sh
        |read idx
        |echo "{\"shard\": $idx, \"pivot\": \"$1\", \"n\": $((idx * 10))}"
        |""".stripMargin)
    script.toFile.setExecutable(true)
    val df = SnapshotJob.runPipe(spark, script.toString,
      LocalDate.parse("2024-02-01"), shards = 4)
    assert(df.count() == 4)
    assert(df.agg(sum("n")).as[Long].collect()(0) == 60) // 0+10+20+30
    // the date-sniff (S9) promotes the pivot string to timestamp
    assert(df.schema("pivot").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(df.select(to_date(col("pivot")).cast("string")).distinct()
      .as[String].collect().toSeq == Seq("2024-02-01"))
  }

  test("compaction rewrites each year partition into few files") {
    val wh = new Warehouse(spark,
      java.nio.file.Files.createTempDirectory("compact_wh").toString)
    Seq((1, "a")).toDF("k", "v").createOrReplaceTempView("cmp_src")
    val st = SnapshotJob.Settings(Seq(SnapshotJob.FactConfig("f", Cron.Daily,
      Seq(SnapshotJob.FactQuery(1, enabled = true,
        SnapshotJob.SqlSource("SELECT * FROM cmp_src"))))))
    (10 to 14).foreach { day =>
      SnapshotJob.run(spark, st, wh, LocalDate.parse(f"2024-01-$day%02d"))
    }
    val before = wh.read("f").get.count()
    def parquetFiles(dir: java.io.File): Seq[java.io.File] =
      Option(dir.listFiles()).toSeq.flatten.flatMap {
        case d if d.isDirectory => parquetFiles(d)
        case f if f.getName.endsWith(".parquet") => Seq(f)
        case _ => Nil
      }
    val whRoot = new java.io.File(wh.root)
    assert(parquetFiles(whRoot).size >= 5) // one small file per append
    wh.compact("f")
    assert(parquetFiles(whRoot).size == 1) // single year partition -> 1 file
    assert(wh.read("f").get.count() == before) // data intact
  }

  test("rollup computes all level-path prefixes in one pass") {
    import graft.model._
    import graft.olap.AggregateService
    val fact = Seq((2023L, 1L, 5L), (2023L, 2L, 7L), (2024L, 1L, 11L))
      .toDF("year", "month", "value")
    val meta = FactMeta("f", Seq(Dimension("date",
      Seq(Level("year", "year"), Level("month", "month")),
      Seq(Hierarchy("ym", Seq("year", "month"))))),
      Seq(Measure("value", "value", AggregateFn.Sum)))
    val r = AggregateService.rollup(fact, meta,
      AggregateService.Request.fromParams(None, Some("date:month"), None))
    val rows = r.collect().map(x => (Option(x.get(0)), Option(x.get(1)),
      x.getLong(2), x.getLong(3)))
    // grouping_id 0 = detail rows, 1 = per-year subtotal, 3 = grand total
    assert(rows.count(_._4 == 0L) == 3)
    assert(rows.filter(_._4 == 1L).map(_._3).toSet == Set(12L, 11L))
    assert(rows.filter(_._4 == 3L).map(_._3).toSeq == Seq(23L))
  }

  test("cube adds the per-month plane rollup lacks") {
    import graft.model._
    import graft.olap.AggregateService
    val fact = Seq((2023L, 1L, 5L), (2023L, 2L, 7L), (2024L, 1L, 11L))
      .toDF("year", "month", "value")
    val meta = FactMeta("f", Seq(Dimension("date",
      Seq(Level("year", "year"), Level("month", "month")),
      Seq(Hierarchy("ym", Seq("year", "month"))))),
      Seq(Measure("value", "value", AggregateFn.Sum)))
    val r = AggregateService.cube(fact, meta,
      AggregateService.Request.fromParams(None, Some("date:month"), None))
    val rows = r.collect().map(x => (Option(x.get(0)), Option(x.get(1)),
      x.getLong(2), x.getLong(3)))
    // all four planes: detail (0), year subtotal (1), MONTH subtotal (2 —
    // the plane ROLLUP cannot produce), grand total (3)
    assert(rows.count(_._4 == 0L) == 3)
    assert(rows.filter(_._4 == 1L).map(_._3).toSet == Set(12L, 11L))
    assert(rows.filter(_._4 == 2L)
      .map(x => (x._2.get, x._3)).toSet == Set((1L, 16L), (2L, 7L)))
    assert(rows.filter(_._4 == 3L).map(_._3).toSeq == Seq(23L))
  }
}
