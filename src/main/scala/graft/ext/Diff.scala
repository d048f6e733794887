package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff: classify every business key as added / removed / changed
  * between two versions of a table — the change-data-capture step between
  * consecutive warehouse snapshots (the reference only ever appends; it
  * cannot say WHAT changed between two runs, SURVEY §1.1 "Fact table").
  *
  * One full-outer equi-join shuffle on the keys; non-key columns compare
  * as null-safe structs (exact — no hashing, so no collision caveat), and
  * unchanged keys drop out. Output: key columns + `change`.
  */
object Diff {

  def rows(before: DataFrame, after: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diff needs at least one key column")
    val valueCols = after.columns.filter(!keys.contains(_)).toSeq
    require(valueCols == before.columns.filter(!keys.contains(_)).toSeq,
      "diff requires identical non-key columns on both sides")
    def packed(df: DataFrame, side: String) = df.select(
      keys.map(col) :+
        struct(valueCols.map(col): _*).as(s"__v_$side") :+
        lit(true).as(s"__p_$side"): _*)
    packed(before, "a").join(packed(after, "b"), keys, "full_outer")
      .withColumn("change",
        when(col("__p_a").isNull, "added")
          .when(col("__p_b").isNull, "removed")
          .when(!(col("__v_a") <=> col("__v_b")), "changed"))
      .filter(col("change").isNotNull)
      .select(keys.map(col) :+ col("change"): _*)
  }
}
