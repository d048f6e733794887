package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher's LEXICAL quality rules (Rae et al. 2021 App. A1 — the
  * non-repetition half; [[Repetition]] owns the other): per-document
  * surface statistics and the published keep thresholds:
  *
  *   - `word_count`        ∈ [minWords, maxWords]   (paper: 50..100k)
  *   - `mean_word_len`     ∈ [3, 10]
  *   - `symbol_word_ratio` ≤ 0.1   (`#` and `...` per word)
  *   - `alpha_word_frac`   ≥ 0.8   (words containing ≥1 letter)
  *   - `stopword_hits`     ≥ 2     (DISTINCT stopwords from the
  *                                  function-word list present in the
  *                                  document — Gopher's rule wants two
  *                                  different function words, so "the
  *                                  the" alone scores 1, not 2)
  *
  * Everything is a per-row projection of built-in expressions — zero
  * shuffles, codegen, linear in corpus tokens. The HOF lambdas here
  * reference only their element or a constant literal array — never an
  * O(len) outer expression — so the interpreted-HOF O(len²) trap does
  * not apply. Ratios round to 6 dp for cross-engine replay. */
object QualityRules {

  /** Per-document lexical metrics + the Gopher keep vote. */
  def gopherLexical(df: DataFrame, idCol: String, textCol: String,
      minWords: Long = 50L, maxWords: Long = 100000L,
      stopwords: Seq[String] = TextAnalysis.defaultStopwords): DataFrame = {
    val t = col(textCol)
    val ws = split(t, " ")
    val wc = size(ws).cast("long")
    val sumLen = aggregate(transform(ws, w => length(w)),
      lit(0L), (acc, x) => acc + x)
    val meanLen = round(sumLen.cast("double") / wc, 6)
    val hashes = length(t) - length(regexp_replace(t, "#", ""))
    val dots = (length(t) - length(regexp_replace(t, "\\.\\.\\.", ""))) / 3
    val symRatio = round((hashes + dots).cast("double") / wc, 6)
    val alphaFrac = round(
      size(filter(ws, w => w.rlike("[A-Za-z]"))).cast("double") / wc, 6)
    val sw = array(stopwords.map(lit): _*)
    val stopHits = size(array_intersect(
      array_distinct(transform(ws, w => lower(w))), sw)).cast("long")
    val out = df.select(col(idCol),
      wc.as("word_count"), meanLen.as("mean_word_len"),
      symRatio.as("symbol_word_ratio"), alphaFrac.as("alpha_word_frac"),
      stopHits.as("stopword_hits"))
    out.withColumn("keep",
      col("word_count") >= minWords && col("word_count") <= maxWords &&
        col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0 &&
        col("symbol_word_ratio") <= 0.1 &&
        col("alpha_word_frac") >= 0.8 &&
        col("stopword_hits") >= 2L)
  }
}
