package graft.snapshot

import graft.SparkTestBase

import org.apache.spark.sql.functions._

/** Targeted key erasure: partition-scoped rewrite, full-partition
  * deletion, untouched partitions byte-stable, null keys survive,
  * absent keys no-op. */
class PurgeSpec extends SparkTestBase {
  import spark.implicits._

  private def partFiles(wh: Warehouse, fact: String, year: Long): Seq[(String, Long)] = {
    val dir = new java.io.File(s"${wh.root}/$fact/year=$year")
    Option(dir.listFiles()).toSeq.flatten
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(f => (f.getName, f.lastModified())).sorted.toSeq
  }

  test("purgeKeys: partition-scoped rewrite, full-partition delete, no-op on absent keys") {
    val wh = new Warehouse(spark,
      java.nio.file.Files.createTempDirectory("purge_wh").toString)
    wh.append("f", Seq(
      (1L, 10.0, 2020L), (2L, 20.0, 2020L),
      (3L, 30.0, 2021L),
      (1L, 40.0, 2022L)).toDF("k", "v", "year"))
    val untouched = partFiles(wh, "f", 2021L)
    assert(untouched.nonEmpty)

    wh.purgeKeys("f", "k", Seq(1L))
    val left = wh.read("f").get.select("k", "v", "year").as[(Long, Double, Long)]
      .collect().toSet
    assert(left == Set((2L, 20.0, 2020L), (3L, 30.0, 2021L)))
    // year=2022 held ONLY the erased subject -> partition deleted outright
    assert(!new java.io.File(s"${wh.root}/f/year=2022").exists())
    // year=2021 contained no matches -> bytes untouched (same files, mtimes)
    assert(partFiles(wh, "f", 2021L) == untouched)

    // absent key: complete no-op, no partition rewrites at all
    val before = Seq(2020L, 2021L).map(partFiles(wh, "f", _))
    wh.purgeKeys("f", "k", Seq(999L))
    assert(Seq(2020L, 2021L).map(partFiles(wh, "f", _)) == before)

    // DataFrame-of-keys path (the beyond-IN-list scale form)
    wh.purgeKeys("f", "k", Seq(3L).toDF("key"))
    assert(wh.read("f").get.select("k").as[Long].collect().toSeq == Seq(2L))
    val e = intercept[IllegalArgumentException] {
      wh.purgeKeys("f", "k", Seq((1L, 2L)).toDF("a", "b"))
    }
    assert(e.getMessage.contains("exactly one column"))
  }

  test("vacuum rolls a crashed purge FORWARD: no resurrection of erased rows") {
    // Simulated crash state halfway through a purge of k=1 over years
    // 2020 (partial erase, crashed BETWEEN stage-out and swap-in: live dir
    // missing, old copy displaced, purged copy staged) and 2022 (full
    // erase, crashed BEFORE stage-out: live dir still holds the subject).
    val wh = new Warehouse(spark,
      java.nio.file.Files.createTempDirectory("purge_crash").toString)
    wh.append("f", Seq(
      (1L, 10.0, 2020L), (2L, 20.0, 2020L),
      (3L, 30.0, 2021L),
      (1L, 40.0, 2022L)).toDF("k", "v", "year"))
    val root = new java.io.File(wh.root)
    // staged purged copy of year=2020 (what swapYearPartitions writes)
    Seq((2L, 20.0, 2020L)).toDF("k", "v", "year")
      .repartition(1).write.partitionBy("year")
      .parquet(s"${root}/f.purge")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"${root}/f.purge/_purge_years.json"),
      "[2020,2022]")
    // displace year=2020 out (stage-out done), leave year=2022 in place
    new java.io.File(s"${root}/f.purge.old").mkdirs()
    assert(new java.io.File(s"${root}/f/year=2020")
      .renameTo(new java.io.File(s"${root}/f.purge.old/year=2020")))

    wh.vacuum("f")
    val left = wh.read("f").get.select("k", "v", "year").as[(Long, Double, Long)]
      .collect().toSet
    // k=1 stays erased from BOTH crash windows; untouched year intact
    assert(left == Set((2L, 20.0, 2020L), (3L, 30.0, 2021L)))
    assert(!new java.io.File(s"${root}/f/year=2022").exists())
    // staging fully cleared
    assert(!new java.io.File(s"${root}/f.purge").exists())
    assert(!new java.io.File(s"${root}/f.purge.old").exists())
    // and vacuum stays a no-op on the now-healthy fact
    wh.vacuum("f")
    assert(wh.read("f").get.count() == 2)
  }

  test("vacuum clears purge staging from a crash during the staged write") {
    // marker absent -> the live table was never touched; staging is junk
    val wh = new Warehouse(spark,
      java.nio.file.Files.createTempDirectory("purge_crash2").toString)
    wh.append("f", Seq((1L, 1.0, 2020L)).toDF("k", "v", "year"))
    new java.io.File(s"${wh.root}/f.purge/year=2020").mkdirs()
    wh.vacuum("f")
    assert(!new java.io.File(s"${wh.root}/f.purge").exists())
    assert(wh.read("f").get.count() == 1)
  }

  test("purgeKeys: NULL keys never match a purge list and are kept") {
    val wh = new Warehouse(spark,
      java.nio.file.Files.createTempDirectory("purge_wh_null").toString)
    wh.append("f", Seq(
      (Some(1L), 1.0, 2020L), (None, 2.0, 2020L), (Some(2L), 3.0, 2020L))
      .toDF("k", "v", "year"))
    wh.purgeKeys("f", "k", Seq(1L))
    assert(wh.read("f").get.select("v").as[Double].collect().toSet ==
      Set(2.0, 3.0))
  }
}
