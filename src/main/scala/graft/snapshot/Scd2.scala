package graft.snapshot

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Type-2 slowly-changing dimension maintenance: fold observation
  * batches (key, attrs, ts) into a versioned dimension where each row
  * is one attribute regime — (keys..., attrs..., valid_from, valid_to),
  * `valid_to` null on the current version. The warehouse-side answer to
  * "what did this customer's segment look like LAST March" that an
  * overwrite-in-place dimension destroys.
  *
  * Change semantics: a new version opens at an observation whose attrs
  * differ (null-safely) from the key's previous observation; repeated
  * identical observations collapse into the open regime. Folding
  * batches one at a time equals one-shot processing of the full
  * observation stream PROVIDED batches arrive in per-key timestamp
  * order (the snapshot-cadence contract — same monotonicity the
  * reference's daily scheduler guarantees its facts; late-arriving
  * history would need a [[Warehouse.merge]]-style rewrite instead).
  *
  * Scale shape: [[merge]] is key-scoped the way [[Warehouse.merge]] is
  * partition-scoped — only keys PRESENT IN THE BATCH have their version
  * chains re-derived (one window over those keys' versions + the batch,
  * keyed by business key, never a corpus-wide window); untouched keys'
  * rows pass through by anti-join. A daily batch touching 0.1% of keys
  * re-windows 0.1% of the dimension.
  */
object Scd2 {

  private def attrStruct(attrCols: Seq[String]) =
    struct(attrCols.map(col): _*)

  /** Derive the version chain from an observation frame
    * (keys..., attrs..., tsCol): drop consecutive per-key duplicates,
    * then [ts, next-change ts) windows. */
  private def chain(obs: DataFrame, keyCols: Seq[String],
      attrCols: Seq[String], tsCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tsCol))
    val changes = obs
      .withColumn("__prev", lag(attrStruct(attrCols), 1).over(w))
      // null-safe struct compare: first observation (__prev null) opens
      .filter(!(col("__prev") <=> attrStruct(attrCols)))
      .drop("__prev")
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(
        Window.partitionBy(keyCols.map(col): _*).orderBy(col(tsCol))))
      .drop(tsCol)
  }

  /** Bootstrap a dimension from the first observation batch. */
  def init(batch: DataFrame, keyCols: Seq[String], attrCols: Seq[String],
      tsCol: String): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty, "scd2 needs keys and attrs")
    chain(batch, keyCols, attrCols, tsCol)
  }

  /** Fold one observation batch into the dimension. Key-scoped: only
    * batch keys re-derive; every other row passes through untouched. */
  def merge(current: DataFrame, batch: DataFrame, keyCols: Seq[String],
      attrCols: Seq[String], tsCol: String): DataFrame = {
    val touchedKeys = batch.select(keyCols.map(col): _*).distinct()
    val untouched = current.join(touchedKeys, keyCols, "left_anti")
    // touched versions re-expand to observations (valid_from was the
    // observation time of each regime's opening row)
    val reopened = current.join(touchedKeys, keyCols, "left_semi")
      .select(keyCols.map(col) ++ attrCols.map(col) :+
        col("valid_from").as(tsCol): _*)
    val obs = reopened.unionByName(
      batch.select(keyCols.map(col) ++ attrCols.map(col) :+ col(tsCol): _*))
    untouched.unionByName(chain(obs, keyCols, attrCols, tsCol))
  }
}
