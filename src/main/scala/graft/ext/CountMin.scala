package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable Count-Min sketch (Cormode & Muthukrishnan 2005): approximate
  * per-key frequencies in `depth * width` integer counters — the
  * heavy-hitter / frequency-estimate sketch for streams and 100 TB scans
  * where an exact per-key count's shuffle is the dominant cost. The
  * sketch is a tiny table however many keys exist; estimates only ever
  * OVER-count (min over depth rows bounds the collision inflation), and
  * two sketches merge by cell-wise addition.
  *
  * Portability: like [[Hll]] and [[BloomJoin]], cell positions are
  * md5-derived — one md5 per key yields four independent 32-bit chunks,
  * so depth <= 4 costs a single hash per row and any SQL engine replays
  * the sketch exactly (counters are exact integers; there is nothing to
  * round anywhere).
  */
object CountMin {

  /** Row-i cell position for a key (depth <= 4: chunks of one md5). */
  private def position(key: Column, i: Int, width: Int): Column = {
    require(i < 4, "depth is capped at 4 (one md5 carries four 32-bit chunks)")
    conv(substring(md5(key.cast("string")), 1 + 8 * i, 8), 16, 10)
      .cast("long") % width
  }

  private def checkParams(width: Int, depth: Int): Unit = {
    require(width > 0 && width <= (1 << 30), s"width=$width out of (0, 2^30]")
    require(depth > 0 && depth <= 4, s"depth=$depth out of [1, 4]")
  }

  /** Build the sketch: (row, pos, cnt) — one map-side-combining
    * aggregation, at most depth*width output rows. */
  def sketch(df: DataFrame, keyCol: String, width: Int = 1024,
      depth: Int = 4): DataFrame = {
    checkParams(width, depth)
    df.select(explode(array((0 until depth).map(i =>
        struct(lit(i).as("row"), position(col(keyCol), i, width).as("pos"))): _*))
        .as("c"))
      .groupBy(col("c.row").as("row"), col("c.pos").as("pos"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Exact heavy hitters (true count >= minCount) with the shuffle
    * pruned by the sketch: pass 1 builds the depth×width sketch and
    * packs it into a literal (bounded by construction — the same
    * driver-side-bounded-state contract as [[Ivf]]'s sampled
    * centroids); pass 2 estimates every ROW's key map-side (element_at
    * into the packed literal, least over the depth cells — pure
    * codegen, no join, no shuffle) and drops rows whose estimate is
    * under the bar BEFORE the exact groupBy. CMS never undercounts, so
    * the candidate set is a superset of the true hitters — the output
    * is EXACT: estimate-pruned, then exactly counted and re-filtered.
    * At 100 TB the exact count's shuffle carries only heavy-candidate
    * rows (collision false-positives wash out in the recount), not
    * every key's — the point of sketching the first pass.
    * Output: (keyCol, cnt), exact counts. */
  def heavyHitters(df: DataFrame, keyCol: String, minCount: Long,
      width: Int = 1024, depth: Int = 4): DataFrame = {
    checkParams(width, depth)
    require(minCount > 0, s"minCount=$minCount must be positive")
    val cells = Array.fill(depth)(Array.fill(width)(0L))
    sketch(df, keyCol, width, depth).collect()
      .foreach(r => cells(r.getInt(0))(r.getLong(1).toInt) = r.getLong(2))
    val packed = typedlit(cells.map(_.toSeq).toSeq)
    val ests = (0 until depth).map(i =>
      element_at(element_at(packed, i + 1),
        (position(col(keyCol), i, width) + lit(1)).cast("int")))
    val est = if (ests.size == 1) ests.head else least(ests: _*)
    df.filter(est >= minCount)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
  }

  /** Point-estimate the frequency of each probe key: min over the key's
    * depth cells (absent cell = 0). The sketch side is tiny — Spark
    * broadcasts it; the probe table never shuffles. */
  def estimate(sk: DataFrame, probes: DataFrame, keyCol: String,
      width: Int = 1024, depth: Int = 4): DataFrame = {
    checkParams(width, depth)
    val ppos = probes.select(col(keyCol),
        explode(array((0 until depth).map(i =>
          struct(lit(i).as("row"), position(col(keyCol), i, width).as("pos"))): _*))
          .as("c"))
      .select(col(keyCol), col("c.row").as("row"), col("c.pos").as("pos"))
    ppos.join(broadcast(sk), Seq("row", "pos"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
