package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def bruteForce(df: DataFrame, k: Int): Set[(Long, Long, Int)] = {
    val s = df.select(col("id").cast("long").as("id"), col("name"))
    s.as("a").join(s.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        levenshtein(col("a.name"), col("b.name")).as("d"))
      .filter(col("d") <= k)
      .as[(Long, Long, Int)].collect().toSet
  }

  private def engine(df: DataFrame, k: Int,
      maxDf: Option[Long] = Some(1000L)): Set[(Long, Long, Int)] =
    FuzzyJoin.editDistancePairs(df, "id", "name", k, maxDf = maxDf)
      .as[(Long, Long, Int)].collect().toSet

  test("planted fixture: pairs equal brute force at k=1 and k=2") {
    val names = Fixtures.plantedNames(spark, n = 120)
    assert(engine(names, 1) == bruteForce(names, 1))
    assert(engine(names, 2) == bruteForce(names, 2))
  }

  test("boilerplate prefix + tiny df-cap stays exact (hot-map restore)") {
    // every name shares the "customer#00" prefix, so ALL its grams blow
    // any small cap — pairs must still come out exact via the hot maps
    // and the saturated residual set
    val rows = (0 until 80).map { i =>
      (i.toLong, f"customer#00$i%03d")
    } ++ Seq((900L, "customer#00007x"), (901L, "customer#0007"))
    val df = rows.toDF("id", "name")
    assert(engine(df, 1, maxDf = Some(3L)) == bruteForce(df, 1))
    assert(engine(df, 1, maxDf = None) == bruteForce(df, 1))
  }

  test("short strings below the count-filter bound go through the residual path") {
    val df = Seq((1L, "ab"), (2L, "ac"), (3L, "a"), (4L, "b"), (5L, "abcd"),
      (6L, "abc"), (7L, "xyz"), (8L, "")).toDF("id", "name")
    assert(engine(df, 1) == bruteForce(df, 1))
  }

  test("eager mode leaves no cache entries behind") {
    spark.catalog.clearCache()
    val names = Fixtures.plantedNames(spark, n = 60)
    FuzzyJoin.editDistancePairs(names, "id", "name", 1, eager = true).count()
    assert(org.apache.spark.sql.graftbridge.Bridge.cacheEmpty(spark))
  }
}
