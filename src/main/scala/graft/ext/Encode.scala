package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Categorical feature encoding against a numeric target — the
  * leakage-prone step a feature pipeline wants centralized and exact:
  * high-cardinality categoricals (domain, user agent, merchant) become
  * one smoothed-mean column instead of a million one-hot dimensions
  * (Micci-Barreca SIGKDD Explorations 2001).
  *
  * enc(c) = (Σ_c y + m·μ) / (n_c + m): the category mean shrunk toward
  * the global mean μ with pseudo-count weight `m` — a rare category
  * reports ≈ μ, a populous one ≈ its own mean, and nothing explodes on
  * n_c = 1. The target quantizes to integer cents so every sum is
  * exact; μ and the final blend are fixed-order divisions of identical
  * operands — identical doubles on every engine (the repo's
  * no-transcendentals discipline, see [[graft.ext.Stats]]).
  *
  * Scale shape: ONE map-side-combining aggregation over the fact builds
  * the category table (bounded by cardinality, not rows); the global
  * totals fold from the category table itself, so the second use of the
  * fact's shuffle is a ReusedExchange, and the totals ride back as a
  * broadcast scalar row.
  */
object Encode {

  /** (category, n, enc) for every distinct category; `enc` is in the
    * target's original currency units. */
  def targetEncode(df: DataFrame, catCol: String, yCol: String,
      m: Long = 10L): DataFrame = {
    require(m >= 0, s"m=$m must be nonnegative")
    val d2 = org.apache.spark.sql.types.DecimalType(18, 2)
    val cents = (col(yCol).cast(d2) * lit(100))
      .cast(org.apache.spark.sql.types.DecimalType(20, 0)).cast("long")
    val perCat = df.select(col(catCol).as("category"), cents.as("__y"))
      .groupBy(col("category"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("__sy"))
    val totals = perCat.agg(sum(col("n")).as("__nt"),
      sum(col("__sy")).as("__syt"))
    // mu in cents; enc = (sy + m*mu) / (n + m), then /100 to currency —
    // fixed expression-tree order for bit-identical cross-engine replay
    val mu = col("__syt").cast("double") / col("__nt").cast("double")
    perCat.crossJoin(broadcast(totals))
      .select(col("category"), col("n"),
        ((col("__sy").cast("double") + lit(m).cast("double") * mu) /
          (col("n") + lit(m)).cast("double") / lit(100.0)).as("enc"))
  }

  /** Rare-category collapsing — replace categories below `minCount`
    * occurrences with a single `other` label, the standard cardinality
    * guard before one-hot/target encoding (a million-level categorical
    * with a hapax tail otherwise leaks noise into every encoder). The
    * frequent-category set is cardinality-bounded and broadcasts back;
    * the rewrite is one per-row `when` in codegen. Deterministic: pure
    * function of the category's count. */
  def collapseRare(df: DataFrame, catCol: String, minCount: Long,
      other: String = "OTHER"): DataFrame = {
    require(minCount >= 1, s"minCount=$minCount must be >= 1")
    val keep = df.groupBy(col(catCol)).agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= minCount)
      .select(col(catCol), lit(true).as("__keep"))
    df.join(broadcast(keep), Seq(catCol), "left")
      .withColumn(catCol,
        when(col("__keep"), col(catCol)).otherwise(lit(other)))
      .drop("__keep")
  }

  /** Dense surrogate ids for a key column: every distinct key gets a
    * stable integer in [0, n) — the embedding-row / dimension-key
    * assignment step. The order is the md5 draw (uniform however skewed
    * the keys), and the rank is the DISTRIBUTED PREFIX COUNT of
    * [[graft.ext.TextAnalysis.packSequences]]: hash-prefix range buckets
    * (prefix order IS global order), per-bucket rank windows, and a
    * |buckets|-row offset frame cumulated on one partition and broadcast
    * back — no global sort, no single-partition window over the keys,
    * no RDD zipWithIndex. Deterministic: same keys → same ids on any
    * cluster/partitioning. Output (key, id). */
  def denseIds(df: DataFrame, keyCol: String, buckets: Int = 64): DataFrame = {
    require(buckets > 0 && buckets <= 65536 && (buckets & (buckets - 1)) == 0,
      s"buckets=$buckets must be a power of two <= 65536")
    val bstep = 65536 / buckets
    val base = df.select(col(keyCol)).distinct()
      .withColumn("__h", md5(col(keyCol).cast("string")))
      .withColumn("__b",
        (conv(substring(col("__h"), 1, 4), 16, 10).cast("long") / bstep)
          .cast("long"))
    val offsets = base.groupBy(col("__b"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__off",
        sum(col("__c")).over(org.apache.spark.sql.expressions.Window
          .orderBy(col("__b"))) - col("__c"))
      .select(col("__b"), col("__off"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__b")).orderBy(col("__h"), col(keyCol))
    base.join(broadcast(offsets), "__b")
      .select(col(keyCol),
        (col("__off") + row_number().over(w).cast("long") - 1L).as("id"))
  }
}
