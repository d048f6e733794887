package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Character-reference decode for [[WebText.htmlStrip]] — one pass,
  * never re-examining emitted text (so `&amp;lt;` lands as the literal
  * `&lt;` and `&amp;#39;` as the literal `&#39;` BY CONSTRUCTION, not
  * by replace ordering). Covers, per the WHATWG numeric-reference end
  * state:
  *   - decimal `&#\d+;` and hex `&#x…;`/`&#X…;` references;
  *   - 0x00, surrogates (D800–DFFF) and > 0x10FFFF → U+FFFD (the spec
  *     replacement — never a guessed char, never a throw);
  *   - 0x80–0x9F remapped through the windows-1252 table (the WHATWG
  *     C1 remap: `&#150;` is an en dash on real legacy pages); the
  *     five holes (81 8D 8F 90 9D) pass through as their code point;
  *   - NBSP (named `&nbsp;` or numeric 160) lands as a PLAIN SPACE —
  *     the funnel treats it as word whitespace (documented divergence
  *     from WHATWG's U+00A0, kept from the r13 contract);
  *   - the named set: the original six (amp lt gt quot apos nbsp)
  *     plus the common dozen (copy reg trade hellip mdash ndash lsquo
  *     rsquo ldquo rdquo middot deg). Unknown names, missing
  *     semicolons and digit-less `&#;` stay LITERAL — unknown refs
  *     ship as typed, never guessed. */
private[ext] object HtmlEntityKernel {

  /** WHATWG C1 remap (= cp1252's 0x80–0x9F block). Index b - 0x80;
    * 0 marks a hole (pass the code point through). */
  private val C1: Array[Int] = {
    val t = new Array[Int](32)
    val pairs = Seq(0x80 -> 0x20AC, 0x82 -> 0x201A, 0x83 -> 0x0192,
      0x84 -> 0x201E, 0x85 -> 0x2026, 0x86 -> 0x2020, 0x87 -> 0x2021,
      0x88 -> 0x02C6, 0x89 -> 0x2030, 0x8A -> 0x0160, 0x8B -> 0x2039,
      0x8C -> 0x0152, 0x8E -> 0x017D, 0x91 -> 0x2018, 0x92 -> 0x2019,
      0x93 -> 0x201C, 0x94 -> 0x201D, 0x95 -> 0x2022, 0x96 -> 0x2013,
      0x97 -> 0x2014, 0x98 -> 0x02DC, 0x99 -> 0x2122, 0x9A -> 0x0161,
      0x9B -> 0x203A, 0x9C -> 0x0153, 0x9E -> 0x017E, 0x9F -> 0x0178)
    for ((b, cp) <- pairs) t(b - 0x80) = cp
    t
  }

  private val Named: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String]()
    m.put("amp", "&"); m.put("lt", "<"); m.put("gt", ">")
    m.put("quot", "\""); m.put("apos", "'"); m.put("nbsp", " ")
    m.put("copy", "©"); m.put("reg", "®")
    m.put("trade", "™"); m.put("hellip", "…")
    m.put("mdash", "—"); m.put("ndash", "–")
    m.put("lsquo", "‘"); m.put("rsquo", "’")
    m.put("ldquo", "“"); m.put("rdquo", "”")
    m.put("middot", "·"); m.put("deg", "°")
    m
  }

  private def mapCp(cp0: Long): String = {
    if (cp0 == 0 || cp0 > 0x10FFFF ||
      (cp0 >= 0xD800 && cp0 <= 0xDFFF)) return "�"
    val cp = cp0.toInt
    if (cp == 0xA0) return " " // NBSP-as-space, see scaladoc
    if (cp >= 0x80 && cp <= 0x9F) {
      val r = C1(cp - 0x80)
      return new String(Character.toChars(if (r != 0) r else cp))
    }
    new String(Character.toChars(cp))
  }

  def decode(s: String): String = {
    var i = s.indexOf('&')
    if (i < 0) return s
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    sb.append(s, 0, i)
    while (i < n) {
      val c = s.charAt(i)
      if (c != '&') { sb.append(c); i += 1 }
      else if (i + 2 < n && s.charAt(i + 1) == '#') {
        val hex = s.charAt(i + 2) == 'x' || s.charAt(i + 2) == 'X'
        var j = i + (if (hex) 3 else 2)
        var v = 0L
        var digits = 0
        var ok = true
        while (ok && j < n && {
          val d = Character.digit(s.charAt(j), if (hex) 16 else 10)
          if (d >= 0) {
            v = v * (if (hex) 16 else 10) + d
            if (v > 0x7FFFFFFFL) v = 0x7FFFFFFFL // saturate, stays >max
            digits += 1; j += 1; true
          } else false
        }) ()
        if (digits == 0 || j >= n || s.charAt(j) != ';') ok = false
        if (ok) { sb.append(mapCp(v)); i = j + 1 }
        else { sb.append('&'); i += 1 }
      } else {
        var j = i + 1
        while (j < n && j - i <= 10 && {
          val ch = s.charAt(j)
          (ch >= 'a' && ch <= 'z') || (ch >= 'A' && ch <= 'Z')
        }) j += 1
        val rep = if (j < n && j > i + 1 && s.charAt(j) == ';')
          Named.get(s.substring(i + 1, j)) else null
        if (rep != null) { sb.append(rep); i = j + 1 }
        else { sb.append('&'); i += 1 }
      }
    }
    sb.toString
  }
}

/** [[HtmlEntityKernel.decode]] as an expression — the entity stage of
  * [[WebText.htmlStrip]]. */
case class HtmlEntityDecode(child: org.apache.spark.sql.catalyst
    .expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types.{DataType, StringType}

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis
        .TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"html_entity_decode requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      HtmlEntityKernel.decode(
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
          .toString))

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : HtmlEntityDecode = copy(child = newChild)

  override def prettyName: String = "html_entity_decode"
}

object HtmlEntityDecode {
  def apply(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(HtmlEntityDecode(
      org.apache.spark.sql.graftbridge.Bridge.expression(c)))
}

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
    * `</p><p>` doesn't weld words), then character-reference decode
    * ([[HtmlEntityKernel]]: numeric `&#…;`/`&#x…;` per the WHATWG end
    * state incl. the C1/cp1252 remap, plus the common named set; one
    * pass that never re-examines emitted text, so `&amp;lt;` lands as
    * the literal `&lt;`), then whitespace-collapse + trim — the same
    * explicit class as [[TextNormalize]] so the output is
    * single-space-delimited for the word-based family downstream.
    *
    * Contract (documented, matched by the oracle): tags are
    * `<[^>]+>` — a raw `>` inside an attribute value splits the tag,
    * exactly as in the SQL replay; unknown entity names ship
    * literally; NBSP lands as a plain space. Null-safe (null →
    * empty string). */
  def htmlStrip(html: Column): Column = {
    val t0 = coalesce(html, lit(""))
    val noComment = regexp_replace(t0, "(?s)<!--.*?-->", " ")
    val noScript =
      regexp_replace(noComment, "(?is)<script\\b[^>]*>.*?</script\\s*>", " ")
    val noStyle =
      regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style\\s*>", " ")
    val noTags = regexp_replace(noStyle, "(?s)<[^>]+>", " ")
    val decoded = HtmlEntityDecode(noTags)
    trim(regexp_replace(decoded, "[ \\t\\n\\r\\f]+", " "))
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
