package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

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
  * order. Ties for the top gram resolve to the smallest gram in UTF-8
  * byte order, so "top" is a pure function of the count table too.
  *
  * Scale shape: every metric is WITHIN-document, so the whole operator
  * is one native per-row expression ([[RepetitionStats]]) — a single
  * O(tokens · |ns|) pass with per-document hash maps, ZERO shuffles,
  * embarrassingly parallel at any corpus size. (The first formulation
  * exploded a (doc, n, gram) relation through two hash-aggregates; the
  * explode was linear but the interpreted HOF gram builder re-split the
  * text once per gram — O(len²) per document, the same trap
  * [[TextKernel]] documents. Per-row native is both asymptotically
  * smaller on the wire — nothing moves — and constant-factor faster.) */
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

  /** Per-document repetition metrics; one row per input row with the
    * fractions above, 6-dp rounded, clamped to [0, 1]. Documents too
    * short for an n contribute no grams → that metric is 0. */
  def metrics(df: DataFrame, idCol: String, textCol: String,
      topNs: Seq[Int] = Seq(2, 3, 4), dupNs: Seq[Int] = Seq(5, 6, 7, 8, 9, 10),
      lineSep: String = "\n"): DataFrame = {
    require(topNs.nonEmpty && dupNs.nonEmpty, "need at least one n per family")
    require((topNs ++ dupNs).forall(_ >= 1), "n-gram orders must be >= 1")
    val m = RepetitionStats(col(textCol), topNs, dupNs, lineSep)
    val fields = RepetitionStats.fieldNames(topNs, dupNs)
    df.select(col(idCol) +: m.as("__m") +: Nil: _*)
      .select(col(idCol) +: fields.map(f => col(s"__m.$f").as(f)): _*)
  }

  /** [[metrics]] plus the Gopher keep decision: `keep` is true when every
    * computed metric is ≤ its threshold (metrics without a configured
    * threshold don't vote; no overlapping threshold at all → everything
    * keeps, vacuously). The screen composes with the other quality
    * gates by filtering on the flag. */
  def gopherFilter(df: DataFrame, idCol: String, textCol: String,
      topNs: Seq[Int] = Seq(2, 3, 4), dupNs: Seq[Int] = Seq(5, 6, 7, 8, 9, 10),
      lineSep: String = "\n",
      thresholds: Map[String, Double] = gopherThresholds): DataFrame = {
    val m = metrics(df, idCol, textCol, topNs, dupNs, lineSep)
    m.withColumn("keep", vote(col, topNs, dupNs, thresholds))
  }

  /** The keep conjunction over metric accessors — ONE vote builder for
    * [[gopherFilter]]'s flat columns and [[repetitionKeep]]'s struct
    * fields (metrics without a configured threshold don't vote; none
    * configured → vacuous true, as before). */
  private def vote(fieldOf: String => Column, topNs: Seq[Int],
      dupNs: Seq[Int], thresholds: Map[String, Double]): Column =
    RepetitionStats.fieldNames(topNs, dupNs)
      .filter(thresholds.contains)
      .map(f => fieldOf(f) <= lit(thresholds(f)))
      .reduceOption(_ && _).getOrElse(lit(true))

  /** Annotate `df` IN PLACE with the Gopher repetition vote as
    * `outCol`: per-row, preserves every input column, verdict identical
    * to [[gopherFilter]]'s `keep` (same kernel, same vote semantics).
    * The join-free composition form — a pipeline that only needs the
    * flag (Curation's funnel, QualityGate's screen) annotates-and-
    * filters instead of screening a projection and joining the
    * survivors back, which at corpus scale removed one id-keyed shuffle
    * join per screen.
    *
    * The vote is [[StructThresholdVote]] — ONE expression with ONE
    * reference to the kernel — NOT a column-level conjunction: filter
    * pushdown substitutes a filtered alias into every reference, so the
    * conjunction form re-evaluated the kernel once per thresholded
    * metric (11x per row, measured in the optimized plan) the moment a
    * caller wrote `.filter(col(outCol))`. */
  def repetitionKeep(df: DataFrame, textCol: String, outCol: String,
      topNs: Seq[Int] = Seq(2, 3, 4), dupNs: Seq[Int] = Seq(5, 6, 7, 8, 9, 10),
      lineSep: String = "\n",
      thresholds: Map[String, Double] = gopherThresholds): DataFrame = {
    val voted = RepetitionStats.fieldNames(topNs, dupNs)
      .filter(thresholds.contains)
    df.withColumn(outCol, StructThresholdVote(
      RepetitionStats(col(textCol), topNs, dupNs, lineSep),
      voted, voted.map(thresholds)))
  }
}

/** One-pass per-row evaluator for every Gopher repetition metric: tokens
  * split once, one count map per n-gram order, one line-count map —
  * O(tokens · |ns|) time, no shuffle, no re-evaluation traps. Fractions
  * round exactly like Spark's `round(x, 6)` (BigDecimal HALF_UP on the
  * shortest decimal repr) so results are bit-identical to the relational
  * formulation and its DuckDB oracle. */
case class RepetitionStats(child: Expression, topNs: Seq[Int],
    dupNs: Seq[Int], lineSep: String)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(
    RepetitionStats.fieldNames(topNs, dupNs).map {
      case "chars" => StructField("chars", LongType, nullable = false)
      case f => StructField(f, DoubleType, nullable = false)
    })

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats requires string, got $other")
  }

  override def nullable: Boolean = false

  private val ns = (topNs ++ dupNs).distinct.sorted.toArray

  override def eval(input: InternalRow): Any = {
    val text = child.eval(input) match {
      case null => ""
      case s => s.asInstanceOf[UTF8String].toString
    }
    val chars = text.codePointCount(0, text.length).toLong

    // per-n gram counts in one pass over the token stream
    val toks = text.split(" ", -1)
    val sb = new java.lang.StringBuilder()
    val topMass = new java.util.HashMap[Int, Long]()
    val dupMass = new java.util.HashMap[Int, Long]()
    ns.foreach { n =>
      val counts = new java.util.HashMap[String, Long]()
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        counts.merge(sb.toString, 1L, (a, b) => a + b)
        i += 1
      }
      var bestC = 0L
      var bestG: String = null
      var dup = 0L
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue
        val g = e.getKey
        if (c > bestC || (c == bestC && bestG != null &&
            RepetitionStats.utf8Less(g, bestG))) {
          bestC = c; bestG = g
        }
        if (c >= 2) dup += c * g.codePointCount(0, g.length)
      }
      if (bestG != null)
        topMass.put(n, bestC * bestG.codePointCount(0, bestG.length).toLong)
      dupMass.put(n, dup)
    }

    // line stats: literal separator, Spark split(-1) semantics
    val lines = text.split(java.util.regex.Pattern.quote(lineSep), -1)
    val lineCounts = new java.util.HashMap[String, Long]()
    lines.foreach(l => lineCounts.merge(l, 1L, (a, b) => a + b))
    var dupLineMass = 0L
    val lit2 = lineCounts.entrySet().iterator()
    while (lit2.hasNext) {
      val e = lit2.next()
      if (e.getValue >= 2)
        dupLineMass += e.getValue * e.getKey.codePointCount(0, e.getKey.length)
    }
    val nl = lines.length.toLong
    val dl = lineCounts.size.toLong

    def frac(mass: Long): Double =
      if (chars <= 0) 0.0
      else RepetitionStats.round6(math.min(1.0, mass.toDouble / chars))
    val out = new Array[Any](3 + topNs.size + dupNs.size)
    out(0) = chars
    out(1) = RepetitionStats.round6(1.0 - dl.toDouble / nl)
    out(2) = frac(dupLineMass)
    var k = 3
    topNs.foreach { n =>
      out(k) = frac(Option(topMass.get(n)).map(_.longValue).getOrElse(0L))
      k += 1
    }
    dupNs.foreach { n =>
      out(k) = frac(Option(dupMass.get(n)).map(_.longValue).getOrElse(0L))
      k += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
  }

  override protected def withNewChildInternal(
      newChild: Expression): RepetitionStats = copy(child = newChild)

  override def prettyName: String = "repetition_stats"
}

object RepetitionStats {
  def fieldNames(topNs: Seq[Int], dupNs: Seq[Int]): Seq[String] =
    Seq("chars", "dup_line_frac", "dup_line_char_frac") ++
      topNs.map(n => s"top_${n}gram_char_frac") ++
      dupNs.map(n => s"dup_${n}gram_char_frac")

  /** Spark's round(x, 6): HALF_UP over the shortest decimal repr. */
  def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** a < b in UTF-8 byte order (what Spark's struct-min and DuckDB's
    * binary collation both compare). */
  def utf8Less(a: String, b: String): Boolean =
    UTF8String.fromString(a).compareTo(UTF8String.fromString(b)) < 0

  def apply(c: Column, topNs: Seq[Int], dupNs: Seq[Int],
      lineSep: String): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      new RepetitionStats(
        org.apache.spark.sql.graftbridge.Bridge.expression(c),
        topNs, dupNs, lineSep))
}

/** `AND` of `child.field_i <= bound_i` over a struct-valued child, as
  * ONE expression with ONE child reference. The unfused form — a
  * boolean conjunction over `GetStructField` references — is torn apart
  * by filter pushdown, which substitutes the aliased struct into EVERY
  * reference: `.filter(keep)` over an 11-metric vote re-evaluated the
  * [[RepetitionStats]] kernel 11 times per row (seen in the optimized
  * plan; the native-expression analog of the guide's duplicated-UDF
  * trap). Fused, the pushed predicate carries the kernel once.
  *
  * Semantics are bit-identical to the SQL conjunction, including
  * three-valued logic: NULL child → NULL; any violated bound → false
  * (even if another field is NULL, as `false AND NULL = false`); all
  * bounds held with a NULL field → NULL. Fields must be DoubleType. */
case class StructThresholdVote(child: Expression, fields: Seq[String],
    bounds: Seq[Double]) extends UnaryExpression with CodegenFallback {
  require(fields.length == bounds.length, "one bound per voted field")

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "struct_threshold_vote"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case st: StructType
        if fields.forall(f => st.fields.exists(sf =>
          sf.name == f && sf.dataType == DoubleType)) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expected a struct with double fields ${fields.mkString(", ")}, " +
        s"got ${other.simpleString(8)}")
  }

  private lazy val ordinals: Array[Int] = {
    val st = child.dataType.asInstanceOf[StructType]
    fields.map(st.fieldIndex).toArray
  }
  private lazy val boundArr: Array[Double] = bounds.toArray

  override def eval(input: InternalRow): Any = {
    val row = child.eval(input).asInstanceOf[InternalRow]
    if (row == null) return null
    var sawNull = false
    var i = 0
    while (i < ordinals.length) {
      if (row.isNullAt(ordinals(i))) sawNull = true
      else if (row.getDouble(ordinals(i)) > boundArr(i)) return false
      i += 1
    }
    if (sawNull) null else true
  }

  override protected def withNewChildInternal(
      newChild: Expression): StructThresholdVote = copy(child = newChild)
}

object StructThresholdVote {
  def apply(c: Column, fields: Seq[String], bounds: Seq[Double]): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      new StructThresholdVote(
        org.apache.spark.sql.graftbridge.Bridge.expression(c),
        fields, bounds))
}
