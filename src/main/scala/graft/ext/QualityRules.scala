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

  /** The five lexical metrics of one text column, in output order —
    * ONE builder for [[gopherLexical]]'s flat projection and
    * [[lexicalKeep]]'s in-place struct. */
  private def lexMetrics(t: Column,
      stopwords: Seq[String]): Seq[(String, Column)] = {
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
    Seq("word_count" -> wc, "mean_word_len" -> meanLen,
      "symbol_word_ratio" -> symRatio, "alpha_word_frac" -> alphaFrac,
      "stopword_hits" -> stopHits)
  }

  /** The keep conjunction over metric accessors — shared by both forms. */
  private def vote(f: String => Column, minWords: Long,
      maxWords: Long): Column =
    f("word_count") >= minWords && f("word_count") <= maxWords &&
      f("mean_word_len") >= 3.0 && f("mean_word_len") <= 10.0 &&
      f("symbol_word_ratio") <= 0.1 &&
      f("alpha_word_frac") >= 0.8 &&
      f("stopword_hits") >= 2L

  /** Per-document lexical metrics + the Gopher keep vote. */
  def gopherLexical(df: DataFrame, idCol: String, textCol: String,
      minWords: Long = 50L, maxWords: Long = 100000L,
      stopwords: Seq[String] = TextAnalysis.defaultStopwords): DataFrame = {
    val out = df.select(col(idCol) +:
      lexMetrics(col(textCol), stopwords).map { case (n, c) => c.as(n) }: _*)
    out.withColumn("keep", vote(col, minWords, maxWords))
  }

  /** Annotate `df` IN PLACE with the lexical keep vote as `outCol`:
    * per-row, preserves every input column, verdict identical to
    * [[gopherLexical]]'s `keep` (same metric expressions, same vote).
    * The join-free composition form — see
    * [[Repetition.repetitionKeep]] for the rationale.
    *
    * The metrics bind to FLAT columns in their own projection (the
    * gopherLexical shape), NOT a `struct(...)`: the optimizer dissolves
    * `GetStructField(CreateNamedStruct(...))` into the raw metric
    * expressions, which re-evaluated `split(text)` once per vote
    * reference (7x per row, seen in the optimized plan). The flat
    * aliases are multiply referenced and expensive, so CollapseProject
    * leaves them materialized once per row. Callers filtering on
    * `outCol` over an UNmaterialized frame would still trigger the
    * pushdown-duplication trap — the curation callers checkpoint the
    * annotated frame before filtering. */
  def lexicalKeep(df: DataFrame, textCol: String, outCol: String,
      minWords: Long = 50L, maxWords: Long = 100000L,
      stopwords: Seq[String] = TextAnalysis.defaultStopwords): DataFrame = {
    val metricNames = lexMetrics(col(textCol), stopwords).map(_._1)
    df.select(col("*") +:
        lexMetrics(col(textCol), stopwords)
          .map { case (n, c) => c.as(s"__lex_$n") }: _*)
      .withColumn(outCol, vote(f => col(s"__lex_$f"), minWords, maxWords))
      .drop(metricNames.map(n => s"__lex_$n"): _*)
  }
}
