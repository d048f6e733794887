package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-text front-end for the curation funnel: HTML boilerplate
  * stripping and Unicode-script profiling (beyond reference parity —
  * SURVEY §7.4 item 6; the reference's corpus arrives as clean rows,
  * a 100 TB pretraining crawl arrives as raw HTML).
  *
  * Both operators are pure per-row projections over codegen'd
  * built-ins (`regexp_replace`/`replace`/`length`): zero shuffles,
  * linear in corpus bytes, and replayable in plain SQL (RE2 spells the
  * same script classes `\p{Han}` where Java spells `\p{IsHan}`).
  */
object WebText {

  /** Strip HTML to text the way a WET-grade extractor does:
    * comments, then whole `<script>`/`<style>` blocks (their CONTENT is
    * code, not text), then every remaining tag (replaced by a space so
    * `</p><p>` doesn't weld words), then the six dominant character
    * entities (`&amp;` LAST, so `&amp;lt;` decodes to the literal
    * `&lt;` and not `<`), then whitespace-collapse + trim — the same
    * explicit class as [[TextNormalize]] so the output is
    * single-space-delimited for the word-based family downstream.
    *
    * Contract (documented, matched by the oracle): tags are
    * `<[^>]+>` — a raw `>` inside an attribute value splits the tag,
    * exactly as in the SQL replay; entity decode covers the named six
    * (lt gt quot #39 apos nbsp + amp), not the full HTML5 table.
    * Null-safe (null → empty string). */
  def htmlStrip(html: Column): Column = {
    val t0 = coalesce(html, lit(""))
    val noComment = regexp_replace(t0, "(?s)<!--.*?-->", " ")
    val noScript =
      regexp_replace(noComment, "(?is)<script\\b[^>]*>.*?</script\\s*>", " ")
    val noStyle =
      regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style\\s*>", " ")
    val noTags = regexp_replace(noStyle, "(?s)<[^>]+>", " ")
    val named = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ")
    val decoded = named.foldLeft(noTags) { case (c, (ent, ch)) =>
      replace(c, lit(ent), lit(ch))
    }
    val amp = replace(decoded, lit("&amp;"), lit("&"))
    trim(regexp_replace(amp, "[ \\t\\n\\r\\f]+", " "))
  }

  /** (column name, Java regex char-class) per profiled script —
    * Unicode TR#24 script properties. Kana folds Hiragana+Katakana
    * into one Japanese bucket. */
  private val scriptClasses: Seq[(String, String)] = Seq(
    "n_latin" -> "\\p{IsLatin}",
    "n_han" -> "\\p{IsHan}",
    "n_kana" -> "[\\p{IsHiragana}\\p{IsKatakana}]",
    "n_hangul" -> "\\p{IsHangul}",
    "n_cyrillic" -> "\\p{IsCyrillic}",
    "n_arabic" -> "\\p{IsArabic}",
    "n_thai" -> "\\p{IsThai}")

  /** Scripts that write WITHOUT word spaces — the ones whose documents
    * must be re-spaced ([[Tokenize.charGramsAsWords]]) before any
    * word-based operator sees them. Hangul is spaced; Kana/Han/Thai
    * are not. */
  private val wsFreeClass = "[\\p{IsHan}\\p{IsHiragana}\\p{IsKatakana}\\p{IsThai}]"

  private def countMatching(t: Column, cls: String): Column =
    (length(t) - length(regexp_replace(t, cls, ""))).cast("long")

  /** Per-document Unicode-script profile: char counts per script, total
    * letter count, the dominant script (argmax with the fixed
    * precedence order of [[scriptClasses]] on ties; `unknown` when the
    * document has no letters), and `needs_chargram` — true when more
    * than `threshold` of the letters belong to a whitespace-free
    * script. This is the ROUTER for the CJK contract: profile once at
    * ingest, then re-space exactly the flagged documents. */
  def scriptProfile(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.3): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val counted = df.select(
      (col(idCol) +:
        scriptClasses.map { case (name, cls) => countMatching(t, cls).as(name) } :+
        countMatching(t, "\\p{L}").as("n_letters") :+
        countMatching(t, wsFreeClass).as("__wsfree")): _*)
    val names = scriptClasses.map(_._1)
    val top = greatest(names.map(col): _*)
    val dominant = names.foldRight(lit("unknown")) { case (n, rest) =>
      when(col(n) > 0 && col(n) === top, lit(n.stripPrefix("n_"))).otherwise(rest)
    }
    counted.select(
      (col(idCol) +: names.map(col) :+ col("n_letters") :+
        dominant.as("script") :+
        (col("n_letters") > 0 &&
          col("__wsfree").cast("double") >
            col("n_letters").cast("double") * threshold)
          .as("needs_chargram")): _*)
  }

  /** Self-contained router column: re-space `text` into `n`-char
    * chunks iff its whitespace-free letter fraction exceeds
    * `threshold`, else pass it through unchanged. The profile is
    * recomputed inline (two regex passes per row — still linear and
    * codegen'd); profile-once-then-join when the flag is already
    * materialized by [[scriptProfile]]. */
  def autoRespace(text: Column, n: Int = 1,
      threshold: Double = 0.3): Column = {
    val t = coalesce(text, lit(""))
    val letters = countMatching(t, "\\p{L}")
    val wsfree = countMatching(t, wsFreeClass)
    when(letters > 0 &&
        wsfree.cast("double") > letters.cast("double") * threshold,
      Tokenize.charGramsAsWords(t, n)).otherwise(t)
  }
}
