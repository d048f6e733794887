package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (the classic salting pattern; AQE's
  * skew-join handles sort-merge skew automatically, but salting is still
  * the tool of choice when one key dominates a shuffled hash join or the
  * skewed side feeds an aggregation).
  *
  * `saltedJoin`: the skewed (large) side gets a uniform random salt in
  * [0, salts); the small side is replicated `salts` times; the join key
  * becomes (key, salt), spreading each hot key over `salts` reducers.
  * Equi-join semantics are preserved exactly (inner/left).
  */
object Skew {

  private val supportedJoins = Set("inner", "left", "left_outer", "leftouter",
    "left_semi", "leftsemi", "left_anti", "leftanti")

  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    // right/full outer would emit each unmatched small-side row once per
    // salt — only large-side-preserving joins are semantics-safe here
    require(supportedJoins(joinType.toLowerCase),
      s"saltedJoin supports inner/left/left_semi/left_anti, not $joinType")
    val saltedLarge = large.withColumn("__salt",
      (rand(42) * salts).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedLarge.join(saltedSmall, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** Salted two-phase aggregation: partial-aggregate on (key, salt), then
    * final-aggregate on key. Use when one group dominates and map-side
    * combine alone leaves a hot reducer. `partial` and `fin` must compose
    * (e.g. partial=sum, fin=sum; partial=count, fin=sum). */
  def saltedAgg(df: DataFrame, key: String, valueCol: String, salts: Int,
      partial: Column => Column, fin: Column => Column): DataFrame =
    df.withColumn("__salt", (rand(42) * salts).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(partial(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(fin(col("__partial")).as(valueCol))
}
