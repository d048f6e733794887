package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style repetition metrics (Rae et al. 2021, "Scaling Language
  * Models: Methods, Analysis & Insights from Training Gopher", App. A1.1)
  * — the standard within-document repetition screens a pretraining
  * pipeline runs between language ID and near-dedup:
  *
  *   - `dup_line_frac`        1 − distinct lines / lines
  *   - `dup_line_char_frac`   chars of lines occurring ≥2 times (all
  *                            occurrences) / doc chars
  *   - `top_{n}gram_char_frac`  chars covered by the single most frequent
  *                            word n-gram (count · chars of the space-
  *                            joined gram) / doc chars, n ∈ topNs
  *   - `dup_{n}gram_char_frac`  chars of word n-grams occurring ≥2 times
  *                            (count · gram chars, summed) / doc chars,
  *                            n ∈ dupNs
  *
  * The n-gram mass definitions are the char-weighted multiplicity form
  * (occurrences × the gram's literal space-joined length): overlapping
  * occurrences each count, so a frac can exceed 1 and is clamped there.
  * This is deliberately the order-independent form — it replays exactly
  * on any engine from the same (gram, count) table, unlike the
  * position-marking variant whose covered-character set depends on scan
  * order. Ties for the top gram resolve to the lexicographically
  * smallest gram, so "top" is a pure function of the count table too.
  *
  * Scale shape: one exploded (doc, n, gram) relation covers EVERY n in
  * one pass — a single hash-aggregate keyed (doc, n, gram) with map-side
  * partial counts, then one (doc) rollup; lines are a second, identical
  * fold. Work is linear in corpus tokens × |ns|; nothing is quadratic in
  * document length (a 100k-token document costs 100k·|ns| rows, never
  * 100k²), and no per-document state ever sits on the driver.
  */
object Repetition {

  /** Gopher App. A1 thresholds: a document is kept when every metric is
    * ≤ its threshold. Public numbers from the paper's filtering table. */
  val gopherThresholds: Map[String, Double] = Map(
    "dup_line_frac" -> 0.30,
    "dup_line_char_frac" -> 0.20,
    "top_2gram_char_frac" -> 0.20,
    "top_3gram_char_frac" -> 0.18,
    "top_4gram_char_frac" -> 0.16,
    "dup_5gram_char_frac" -> 0.15,
    "dup_6gram_char_frac" -> 0.14,
    "dup_7gram_char_frac" -> 0.13,
    "dup_8gram_char_frac" -> 0.12,
    "dup_9gram_char_frac" -> 0.11,
    "dup_10gram_char_frac" -> 0.10)

  /** Word n-gram structs (n, space-joined gram) for one n. The index
    * sequence is forced non-empty then filtered (sequence(1, 0) would
    * DESCEND in Spark), so short texts yield a typed empty array. */
  private def gramStructs(ws: Column, n: Int): Column = {
    val last = size(ws) - (n - 1)
    transform(
      filter(sequence(lit(1), greatest(last, lit(1))), i => i <= last),
      i => struct(lit(n).as("n"),
        array_join(slice(ws, i, lit(n)), " ").as("g")))
  }

  /** Per-document repetition metrics; one row per input row with the
    * fractions above, 6-dp rounded, clamped to [0, 1]. Documents too
    * short for an n contribute no grams → that metric is 0. */
  def metrics(df: DataFrame, idCol: String, textCol: String,
      topNs: Seq[Int] = Seq(2, 3, 4), dupNs: Seq[Int] = Seq(5, 6, 7, 8, 9, 10),
      lineSep: String = "\n"): DataFrame = {
    require(topNs.nonEmpty && dupNs.nonEmpty, "need at least one n per family")
    require((topNs ++ dupNs).forall(_ >= 1), "n-gram orders must be >= 1")
    val id = col(idCol)
    val ns = (topNs ++ dupNs).distinct.sorted

    val base = df.select(id, length(col(textCol)).cast("long").as("chars"),
      col(textCol).as("__t"))

    // One pass over every n: explode (n, gram), count, roll up per (id, n).
    val ws = split(col("__t"), " ")
    val grams = base
      .select(id, explode(flatten(array(ns.map(gramStructs(ws, _)): _*))).as("gr"))
      .select(id, col("gr.n").as("n"), col("gr.g").as("g"))
    val perGram = grams.groupBy(id, col("n"), col("g"))
      .agg(count(lit(1)).as("c"))
    val perN = perGram.groupBy(id, col("n")).agg(
      // min over (-c, gram): largest count, ties to the smallest gram
      min(struct((-col("c")).as("nc"), col("g"))).as("top"),
      sum(when(col("c") >= 2, col("c") * length(col("g"))).otherwise(0L))
        .as("dup_mass"))
      .select(id, col("n"),
        ((-col("top.nc")) * length(col("top.g"))).as("top_mass"),
        col("dup_mass"))
    val nAggs = topNs.map(n => max(when(col("n") === n, col("top_mass")))
      .as(s"__top_$n")) ++
      dupNs.map(n => max(when(col("n") === n, col("dup_mass")))
        .as(s"__dup_$n"))
    val nMetrics = perN.groupBy(id).agg(nAggs.head, nAggs.tail: _*)

    // Line fold: same shape, keyed (id, line).
    val lines = base.select(id,
      explode(split(col("__t"), java.util.regex.Pattern.quote(lineSep)))
        .as("l"))
    val perLine = lines.groupBy(id, col("l")).agg(count(lit(1)).as("c"))
    val lineMetrics = perLine.groupBy(id).agg(
      sum(col("c")).as("__nl"),
      count(lit(1)).as("__dl"),
      sum(when(col("c") >= 2, col("c") * length(col("l"))).otherwise(0L))
        .as("__dup_line_mass"))

    def frac(mass: Column): Column =
      round(least(lit(1.0),
        coalesce(mass, lit(0L)).cast("double") /
          when(col("chars") > 0, col("chars"))), 6)

    val out = base.drop("__t")
      .join(nMetrics, Seq(idCol), "left")
      .join(lineMetrics, Seq(idCol), "left")
    val metricCols: Seq[(String, Column)] =
      Seq("dup_line_frac" ->
        round(coalesce(lit(1.0) - col("__dl").cast("double") / col("__nl"),
          lit(0.0)), 6),
        "dup_line_char_frac" -> frac(col("__dup_line_mass"))) ++
        topNs.map(n => s"top_${n}gram_char_frac" -> frac(col(s"__top_$n"))) ++
        dupNs.map(n => s"dup_${n}gram_char_frac" -> frac(col(s"__dup_$n")))
    out.select(id +: col("chars") +:
      metricCols.map { case (nm, c) => coalesce(c, lit(0.0)).as(nm) }: _*)
  }

  /** [[metrics]] plus the Gopher keep decision: `keep` is true when every
    * computed metric is ≤ its threshold (metrics without a configured
    * threshold don't vote). The screen composes with the other quality
    * gates by filtering on the flag. */
  def gopherFilter(df: DataFrame, idCol: String, textCol: String,
      topNs: Seq[Int] = Seq(2, 3, 4), dupNs: Seq[Int] = Seq(5, 6, 7, 8, 9, 10),
      lineSep: String = "\n",
      thresholds: Map[String, Double] = gopherThresholds): DataFrame = {
    val m = metrics(df, idCol, textCol, topNs, dupNs, lineSep)
    val votes = m.columns.filter(thresholds.contains).map(c =>
      col(c) <= lit(thresholds(c)))
    m.withColumn("keep", votes.reduce(_ && _))
  }
}
