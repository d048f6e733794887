package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines
  * (beyond reference parity — SURVEY.md §7.4 item 6 / BASELINE north star).
  *
  * Everything is built from codegen'd built-ins and higher-order functions:
  * per-row work with no shuffle, so each operator scales linearly and
  * pipelines inside whole-stage codegen wherever the HOFs allow.
  */
object TextAnalysis {

  /** Whitespace tokenization. The testdata corpus is single-space word
    * soup; `split(_, " ")` matches DuckDB's `string_split(text, ' ')` for
    * oracle parity. */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword count: whitespace words plus punctuation splits —
    * approximates tokenizer token counts without a vocab. */
  def subwordCount(text: Column): Column =
    size(split(text, "[\\s\\p{Punct}]+")).cast("long")

  /** Word n-gram shingles (distinct), the unit for near-dup Jaccard.
    * Returns array<string>; empty when the document has fewer than n
    * tokens. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val count = size(toks)
    when(count >= n,
      array_distinct(transform(sequence(lit(0), count - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  /** Quality metrics per document: char count, token count, mean token
    * length, stopword ratio, punctuation ratio. Null-safe on empty text. */
  def quality(df: DataFrame, textCol: String, idCol: String,
      stopwords: Seq[String] = defaultStopwords): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val n = size(toks)
    val sw = array(stopwords.map(lit): _*)
    df.select(
      col(idCol),
      length(t).cast("long").as("chars"),
      n.cast("long").as("n_tokens"),
      round(length(t).cast("double") / n, 6).as("chars_per_token"),
      round(size(filter(toks, tk => array_contains(sw, tk))).cast("double") / n, 6)
        .as("stopword_ratio"),
      round((length(t) - length(regexp_replace(t, "[\\p{Punct}]", ""))).cast("double")
        / length(t), 6).as("punct_ratio"))
  }

  val defaultStopwords: Seq[String] = Seq("the", "a", "an", "of", "and", "to", "in")

  /** Language profiles: tiny per-language stopword/function-word sets for
    * the n-gram-free heuristic language ID. Public knowledge (most frequent
    * function words per language). */
  val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "por"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "den", "mit", "zu", "ein"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une", "est", "que"),
    "it" -> Seq("il", "la", "di", "che", "e", "un", "per", "con", "del", "una"))

  /** Heuristic language ID: argmax over per-language hit ratios of function
    * words; "und" (undetermined) when nothing matches. Pure per-row
    * expressions — no shuffle, no UDF. */
  def languageId(text: Column): Column = {
    val toks = tokens(text)
    val n = size(toks)
    val scores = langProfiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      val w = array(words.map(lit): _*)
      struct((size(filter(toks, t => array_contains(w, t))).cast("double") / n)
        .as("score"), lit(lang).as("lang"))
    }
    val best = array_max(array(scores: _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** 64-bit content fingerprint over normalized text (lowercase, collapsed
    * whitespace) — xxhash64, seed fixed by Spark. Exact-dup detection key. */
  def fingerprint(text: Column): Column =
    xxhash64(regexp_replace(lower(text), "\\s+", " "))
}
