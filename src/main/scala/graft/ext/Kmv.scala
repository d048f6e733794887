package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Replayable 64-bit key hash for ORDER-STATISTIC sketches: per
  * big-endian byte of a nonnegative BIGINT key,
  *   h ← ((h + v_i)² + 1) mod 2^61−1,  v_i = (G[b_i] + i·268435459)
  *                                            mod 2147483647
  * (G the CDC mixing table). The SQUARING is the point: KMV's
  * estimator needs hashes ~uniform on the FULL [0, M) range, and any
  * linear byte fold concentrates an 8-byte key's image in a ~2^40
  * window (measured: a Horner fold estimated 20k ids as 4·10^11) —
  * iterated squaring mod a prime equidistributes in eight rounds.
  * Mersenne-modular AND square-based so a SQL replay engine verifies
  * every hash with HUGEINT intermediates (the x_cdc lesson:
  * wrap-mod-2^64 hashes THROW in DuckDB); negative keys → null (sign
  * bits have no byte contract). */
case class MersenneLongHash(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mersenne_long_hash requires an integer key, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val x = input match {
      case i: java.lang.Integer => i.longValue()
      case l: java.lang.Long => l.longValue()
    }
    if (x < 0) return null
    java.lang.Long.valueOf(MersenneLongHash.hash(x))
  }

  override protected def withNewChildInternal(newChild: Expression): MersenneLongHash =
    copy(child = newChild)

  override def prettyName: String = "mersenne_long_hash"
}

object MersenneLongHash {

  private val MB = BigInt(CdcKernel.M)

  /** The documented recurrence (kernel form, shared with the spec's
    * brute-force twin). */
  def hash(x: Long): Long = {
    require(x >= 0, s"negative key $x")
    var h = BigInt(0)
    var i = 0
    while (i < 8) {
      val b = ((x >>> (8 * (7 - i))) & 0xFF).toInt
      val v = (CdcKernel.G(b) + i.toLong * 268435459L) % 2147483647L
      val s = h + v
      h = (s * s + 1) % MB
      i += 1
    }
    h.toLong
  }

  def apply(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      MersenneLongHash(org.apache.spark.sql.graftbridge.Bridge.expression(c)))
}

/** KMV (k-minimum-values) distinct sketch — the SET-ALGEBRA sketch the
  * HLL fold can't be: because the sketch IS a uniform sample of the
  * distinct-hash space (Bar-Yossef '02 / Beyer '07), two sketches
  * support intersection and Jaccard estimates (Broder resemblance),
  * not just union — "how many documents does crawl B add over crawl
  * A" / "how contaminated is corpus X by benchmark Y's id space" with
  * k·8 bytes per corpus instead of a join.
  *
  * 100 TB shape: one linear scan computes the 8-byte hash, Catalyst's
  * partial-distinct dedups map-side, the exchange carries DISTINCT
  * hashes of one 8-byte column once, and TakeOrdered keeps k — no
  * payload ever moves. For a pure count at minimum cost use the HLL
  * fold instead; KMV's price buys the intersections. All outputs are
  * exact integers (estimates in truncated integer arithmetic) so the
  * DuckDB oracle replays every value bit-for-bit. */
object Kmv {

  val M: Long = CdcKernel.M

  /** The k smallest DISTINCT key hashes, ranked: (rank 1..k, h). */
  def sketch(df: DataFrame, keyCol: String, k: Int): DataFrame =
    df.select(MersenneLongHash(col(keyCol).cast("long")).as("h"))
      .filter(col("h").isNotNull)
      .distinct().orderBy(col("h")).limit(k)
      .select(row_number().over(Window.orderBy(col("h")))
        .cast("long").as("rank"), col("h"))

  /** One-row distinct-count estimate: (n_minima, kth_hash,
    * distinct_est). A full sketch estimates (k−1)·M/h_k — kept in
    * truncated integer form (M // h_k) · (k−1), identical in every
    * engine, relative truncation error ≤ h_k/M (vanishing for any
    * corpus that fills the sketch); a sketch with fewer than k minima
    * IS the distinct set, so the estimate is exact. */
  def distinctEstimate(df: DataFrame, keyCol: String, k: Int): DataFrame =
    sketch(df, keyCol, k)
      .agg(count(lit(1)).as("n_minima"), max(col("h")).as("kth_hash"))
      .select(col("n_minima"), col("kth_hash"),
        when(col("n_minima") < k, col("n_minima"))
          // NULLIF guard: hash 0 is in the squaring recurrence's codomain;
          // Spark DIV 0 and DuckDB // 0 disagree (NULL vs error) — both
          // engines agree on NULL once the denominator is NULLIF'd.
          .otherwise(expr(s"${M}L DIV nullif(kth_hash, 0L)") * (k - 1))
          .as("distinct_est"))

  /** Broder resemblance over two sketches: X = the k smallest hashes
    * of sketch(A) ∪ sketch(B); y = |X ∩ sketch(A) ∩ sketch(B)|.
    * Output one row (n_x, y, jaccard_micro = y·10^6 // n_x, union_kth,
    * union_est) — Jaccard, intersection and union estimates from
    * 2k·8 bytes, no corpus join. */
  def overlap(a: DataFrame, b: DataFrame, keyCol: String,
      k: Int): DataFrame = {
    val sa = sketch(a, keyCol, k).select(col("h"))
    val sb = sketch(b, keyCol, k).select(col("h"))
    val x = sa.unionByName(sb).distinct().orderBy(col("h")).limit(k)
    val y = x.join(sa, "h").join(sb, "h")
    val xAgg = x.agg(count(lit(1)).as("n_x"), max(col("h")).as("union_kth"))
    val yAgg = y.agg(count(lit(1)).as("y"))
    xAgg.crossJoin(yAgg).select(
      col("n_x"), col("y"),
      expr("y * 1000000 DIV n_x").as("jaccard_micro"),
      col("union_kth"),
      when(col("n_x") < k, col("n_x"))
        .otherwise(expr(s"${M}L DIV nullif(union_kth, 0L)") * (k - 1))
        .as("union_est"))
  }
}
