package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tokenizer adapters for WHITESPACE-FREE scripts (CJK, Thai, Lao, …).
  *
  * The text family's operators are word-based: dedup tiles/windows
  * ([[Dedup.tileDuplication]], [[Dedup.windowDuplication]]), the Gopher
  * screens ([[QualityRules.gopherLexical]], [[Repetition]]), the LM
  * scorer ([[NgramLm]]), vocab/token counting, TF-IDF/BM25 and drift —
  * all split on spaces. On a script that writes without spaces, a whole
  * line or document collapses to ONE "word", and every one of those
  * screens degenerates (a 5,000-char Chinese document scores
  * word_count = 1 and carries a single unsharable dedup tile).
  *
  * Rather than fork each operator, [[charGramsAsWords]] re-spaces the
  * text ONCE: non-overlapping `n`-character chunks joined by single
  * spaces, turning the char stream into a token stream every word-based
  * operator consumes unchanged — dedup tiles become 8·n-char tiles, LM
  * trigrams become char-chunk trigrams (the standard char-n-gram LM),
  * Gopher's word_count becomes a chunk count. This is the documented
  * CJK contract for the whole family: pre-map, then operate. Operators
  * that stay WORD-based without the pre-map (because their semantics
  * are inherently about space-delimited words): `stopword_hits` and
  * `alpha_word_frac` in Gopher's lexical screen (function-word lists
  * don't survive re-chunking), and [[Bpe]] training (its words ARE the
  * corpus's space-split types by construction).
  *
  * Chunking (not sliding) keeps the output LINEAR in text length —
  * a sliding char-n-gram multiplies the corpus n×; for overlapping
  * shingles use [[Shingles]]/[[TextShingles]] on the re-spaced stream.
  * The final chunk may be shorter than `n` (kept, like the tilers'
  * sub-tile tail). Empty or null text maps to the empty string.
  * Pure per-row projection: codegen'd, zero shuffles, and replayable in
  * plain SQL — DuckDB:
  * `array_to_string([substr(s, i*n+1, n) for i in
  * range(0, (length(s)+n-1)//n)], ' ')`. */
object Tokenize {

  /** Re-space `text` into non-overlapping `n`-char chunks joined by
    * single spaces; `n = 1` spaces every character. ASCII spaces are
    * stripped FIRST (the pre-map's callers all strip them anyway — an
    * unspaced script has none, and any stragglers would smuggle spaces
    * inside chunks), so the output is always single-space-delimited.
    *
    * Implementation note: ONE compiled-regex pass ((?s) so chunks cross
    * line breaks), not a `transform`+`substr` HOF — the interpreted
    * lambda re-evaluates the text per element (the round-9 O(len²)
    * trap; measured 17.5 s → expected scan-cost on the sf0.1 Gopher
    * gate). The final sub-`n` chunk survives unmatched; rtrim drops the
    * boundary-case trailing space. Null maps to the empty string. */
  def charGramsAsWords(text: Column, n: Int = 1): Column = {
    require(n >= 1, s"n=$n must be >= 1")
    val s = translate(coalesce(text, lit("")), " ", "")
    rtrim(regexp_replace(s, s"(?s)(.{$n})", "$1 "))
  }
}
