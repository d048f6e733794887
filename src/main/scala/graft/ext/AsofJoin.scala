package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (snapshot/backfill) join: for every left row, the single right
  * row with the greatest `rightTime <= leftTime` among matching keys —
  * joining events to the most recent fact snapshot in force at their
  * event time.
  *
  * Spark has no native as-of join; per the composition-first rule this is
  * expressed with built-ins rather than a custom physical operator:
  * union both sides tagged, sort each key group by (time, side) inside a
  * window, and carry the last non-null right payload forward. ONE shuffle
  * on the keys (the window's partitioning), no per-row search, and the
  * sort is the window's — Catalyst handles spilling. This beats the
  * naive theta-join (`l.key = r.key AND r.t <= l.t` + per-left max),
  * which explodes to all (left, earlier-right) pairs before reducing.
  *
  * Contract: right rows are unique per (keys, rightTime) — pre-aggregate
  * otherwise; a NULL in a right value column is transparent (treated as
  * no update at that timestamp) because the carry-forward skips nulls.
  */
object AsofJoin {

  def leftAsof(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      valueCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key")
    // the union/window plumbing reserves __t/__side/__v_<c>, and the final
    // select re-aliases each __v_<c> to its bare name next to the left
    // columns — collisions would silently produce wrong/duplicate columns
    val reserved = Set("__t", "__side") ++ valueCols.map(c => s"__v_$c")
    val inputCols = (left.columns ++ right.columns).toSet
    val clash = inputCols.intersect(reserved)
    require(clash.isEmpty,
      s"as-of join reserves column names ${clash.mkString(", ")} — rename them first")
    val leftClash = left.columns.toSet.intersect(valueCols.toSet)
    require(leftClash.isEmpty,
      s"left side already has value column(s) ${leftClash.mkString(", ")} — " +
        "rename them or drop them from valueCols")
    val r = right.select(
      (keys.map(col) :+ col(rightTime).as("__t") :+ lit(0).as("__side")) ++
        valueCols.map(c => col(c).as(s"__v_$c")): _*)
    val l = left.withColumn("__t", col(leftTime)).withColumn("__side", lit(1))
    // rights sort before lefts at equal time: a snapshot AT the event
    // time is visible to the event (<= semantics)
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = valueCols.foldLeft(u) { (df, c) =>
      df.withColumn(s"__v_$c", last(col(s"__v_$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1)
      .select(left.columns.map(col) ++
        valueCols.map(c => col(s"__v_$c").as(c)): _*)
  }
}
