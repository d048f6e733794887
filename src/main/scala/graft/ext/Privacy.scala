package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy/compliance operators — the pass a training-data pipeline runs
  * before a corpus leaves its trust boundary. The reference has nothing
  * of the kind (its PII story is "the production DB is read-only",
  * library_olap/README.md); at 100 TB the pipeline itself must carry it.
  * Three mechanisms, complementing `TextAnalysis.redact` (free-text
  * scrubbing) and `Warehouse.purgeKeys` (storage-side erasure):
  *
  *  - [[pseudonymize]]: deterministic keyed tokenization of identifier
  *    COLUMNS — joins still line up across tables tokenized with the
  *    same secret, but the identity is unrecoverable without it.
  *  - [[kAnonymityCounts]] / [[kAnonymize]]: quasi-identifier group
  *    sizes (Sweeney's k-anonymity), and the suppression filter that
  *    keeps only rows whose combination at least k rows share.
  *
  * Both are single-shuffle-or-less, codegen'd builtins only.
  */
object Privacy {

  /** Deterministic keyed pseudonymization: each listed column's value is
    * replaced by `sha2_256(secret ␁ value)` (␁ = a separator no key or
    * stringified value contains, so (secret, value) pairs cannot collide
    * by concatenation). Same (secret, value) → same token everywhere:
    * referential integrity survives across tables and batches — the
    * property plain row-dropping or masking destroys — while inversion
    * requires the secret. NULLs stay NULL (concat propagates them).
    * Rotating the secret re-keys the corpus.
    *
    * Scale shape: pure per-row codegen'd expressions (sha2 over a
    * concat) — no shuffle, no UDF, stays inside WholeStageCodegen.
    * Engine-portable: any SQL engine replays `sha256(secret || chr(1)
    * || CAST(v AS VARCHAR))`, so tokens minted here match tokens minted
    * by an external system given the same secret. */
  def pseudonymize(df: DataFrame, cols: Seq[String], secret: String): DataFrame = {
    require(cols.nonEmpty, "pseudonymize needs at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"no such column(s): ${missing.mkString(", ")}")
    val keep = cols.toSet
    df.select(df.columns.map { c =>
      if (keep(c))
        sha2(concat(lit(secret), lit("\u0001"), col(c).cast("string")), 256).as(c)
      else col(c)
    }.toIndexedSeq: _*)
  }

  /** Quasi-identifier group sizes: the input plus `k_count` = how many
    * rows share this row's combination of `quasiCols` — the k-anonymity
    * statistic (a row is k-anonymous iff k_count >= k).
    *
    * Scale shape (the repo's zscore pattern): aggregate the combo table
    * (map-side partial count, combo-cardinality rows out), then join it
    * back onto the scan — typically a broadcast, but the strategy is left
    * to the optimizer/AQE, NOT hinted: the k-anonymity failure mode is
    * precisely near-unique quasi combos (combo count ~ row count), and a
    * forced broadcast of that table would OOM the driver exactly when the
    * operator matters most. When combos are genuinely low-cardinality AQE
    * broadcasts anyway (runtime size, not estimate); when they are not,
    * it degrades to a shuffle join that still completes. A count WINDOW
    * over the combo partition would shuffle and SORT all 100 TB by combo
    * instead. Null-safe join: NULL quasi values form their own group,
    * exactly like GROUP BY. */
  def kAnonymityCounts(df: DataFrame, quasiCols: Seq[String]): DataFrame = {
    require(quasiCols.nonEmpty, "k-anonymity needs at least one quasi-identifier")
    val missing = quasiCols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"no such column(s): ${missing.mkString(", ")}")
    val counts = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("k_count"))
    val renamed = quasiCols.foldLeft(counts)((d, c) =>
      d.withColumnRenamed(c, s"__q_$c"))
    val cond = quasiCols.map(c => col(c) <=> col(s"__q_$c")).reduce(_ && _)
    df.join(renamed, cond)
      .drop(quasiCols.map(c => s"__q_$c"): _*)
  }

  /** Suppression to k-anonymity: keep only rows whose quasi-identifier
    * combination at least `k` rows share. The released dataset then
    * guarantees every individual hides among >= k records with identical
    * quasi-identifiers (Sweeney 2002). Suppression is the conservative
    * baseline; generalization (coarsening values until groups merge) is
    * the caller's domain decision — compose by bucketing columns first
    * (e.g. `Profile.histogram` edges, date truncation) and suppressing
    * the remainder. */
  def kAnonymize(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    kAnonymityCounts(df, quasiCols).filter(col("k_count") >= k).drop("k_count")
  }

  /** Sensitive-attribute diversity per quasi-identifier group: the
    * input plus `l_count` = how many DISTINCT values of `sensitiveCol`
    * this row's quasi combination carries — the l-diversity statistic
    * (Machanavajjhala 2007). k-anonymity alone leaks when a group's
    * sensitive attribute is uniform: hiding among k records all labeled
    * "diagnosis=X" hides nothing. NULL sensitive values add no
    * diversity (distinct-count semantics on both engines), so an
    * all-NULL group scores 0 and suppresses at any l ≥ 1 — the
    * conservative direction. Same scale shape and null-safe join as
    * [[kAnonymityCounts]]; same deliberate no-broadcast-hint stance
    * (near-unique quasi combos are exactly when this matters). */
  def lDiversityCounts(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String): DataFrame = {
    require(quasiCols.nonEmpty, "l-diversity needs at least one quasi-identifier")
    val missing = (quasiCols :+ sensitiveCol).filterNot(df.columns.contains)
    require(missing.isEmpty, s"no such column(s): ${missing.mkString(", ")}")
    require(!quasiCols.contains(sensitiveCol),
      s"$sensitiveCol cannot be both quasi-identifier and sensitive")
    val counts = df.groupBy(quasiCols.map(col): _*)
      .agg(countDistinct(col(sensitiveCol)).as("l_count"))
    val renamed = quasiCols.foldLeft(counts)((d, c) =>
      d.withColumnRenamed(c, s"__q_$c"))
    val cond = quasiCols.map(c => col(c) <=> col(s"__q_$c")).reduce(_ && _)
    df.join(renamed, cond)
      .drop(quasiCols.map(c => s"__q_$c"): _*)
  }

  /** Suppression to l-diversity: keep only rows whose quasi group
    * carries at least `l` distinct sensitive values. Run AFTER (or
    * with) [[kAnonymize]] — the two guarantees are orthogonal and a
    * release usually needs both. */
  def lDiversify(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, l: Long): DataFrame = {
    require(l >= 1, s"l must be >= 1, got $l")
    lDiversityCounts(df, quasiCols, sensitiveCol)
      .filter(col("l_count") >= l).drop("l_count")
  }

  /** t-closeness distances (Li 2007) — the leak l-diversity can't see:
    * a group can carry l distinct sensitive values yet still be
    * SKEWED (99% "positive" in a group vs 1% globally reveals plenty).
    * Per quasi group, the total-variation distance between the group's
    * sensitive distribution and the corpus-wide one, kept EXACT by
    * clearing denominators: TVD = ½·Σ_s |n_gs/n_g − n_s/n| scales to
    * `tvd_scaled = Σ_s |n_gs·n − n_s·n_g|` over the common denominator
    * `denom = 2·n_g·n` — pure long arithmetic, exact while
    * n_g·n < 2⁶³ (corpora to ~3 billion rows; beyond that, release by
    * partition). The display quotient `tvd = tvd_scaled/denom` and its
    * `tvd_micro` floor are divisions of IDENTICAL long-derived doubles
    * (int64→double is correctly rounded everywhere), so they replay
    * bit-identically. NULL sensitive values form their own distribution
    * mass, exactly like GROUP BY (the expansion joins null-safely).
    *
    * Scale shape: three hash-aggregates — (group, s) counts, global s
    * counts (sensitive-cardinality rows, broadcast), group sizes — then
    * the full (group × sensitive-value) expansion so a value a group
    * never carries contributes its |0 − n_s·n_g| mass, one null-safe
    * join against the observed counts, one per-group sum. Output: one
    * row per quasi combination + (n_g, tvd_scaled, denom, tvd_micro,
    * tvd). */
  def tClosenessDistances(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String): DataFrame = {
    require(quasiCols.nonEmpty, "t-closeness needs at least one quasi-identifier")
    val missing = (quasiCols :+ sensitiveCol).filterNot(df.columns.contains)
    require(missing.isEmpty, s"no such column(s): ${missing.mkString(", ")}")
    require(!quasiCols.contains(sensitiveCol),
      s"$sensitiveCol cannot be both quasi-identifier and sensitive")
    val qs = quasiCols.map(col)
    val s = col(sensitiveCol)
    val gs0 = df.groupBy((qs :+ s): _*).agg(count(lit(1)).as("__ngs"))
    val gsR = quasiCols.foldLeft(
      gs0.withColumnRenamed(sensitiveCol, "__sv2"))((d, c) =>
      d.withColumnRenamed(c, s"__g_$c"))
    val sTot = df.groupBy(s.as("__sv")).agg(count(lit(1)).as("__ns"))
    val gTot = df.groupBy(qs: _*).agg(count(lit(1)).as("__ng"))
    val n = df.agg(count(lit(1)).as("__n"))
    val joinCond = (quasiCols.map(c => col(c) <=> col(s"__g_$c")) :+
      (col("__sv") <=> col("__sv2"))).reduce(_ && _)
    gTot.crossJoin(broadcast(sTot))
      .join(gsR, joinCond, "left")
      .na.fill(0L, Seq("__ngs"))
      .crossJoin(broadcast(n))
      .groupBy((qs :+ col("__ng") :+ col("__n")): _*)
      .agg(sum(abs(col("__ngs") * col("__n") - col("__ns") * col("__ng")))
        .as("tvd_scaled"))
      .select((qs :+ col("__ng").as("n_g") :+
        col("tvd_scaled") :+
        (lit(2L) * col("__ng") * col("__n")).as("denom") :+
        floor(col("tvd_scaled").cast("double") /
          ((lit(2L) * col("__ng") * col("__n")).cast("double"))
          * lit(1e6)).cast("long").as("tvd_micro") :+
        (col("tvd_scaled").cast("double") /
          (lit(2L) * col("__ng") * col("__n")).cast("double")).as("tvd")): _*)
  }

  /** Generalization to k-anonymity for a NUMERIC quasi-identifier —
    * the practical release path [[kAnonymize]]'s suppression-only
    * stance leaves to the caller: instead of dropping every row in an
    * under-k group, COARSEN the numeric column (bucket width ladder,
    * finest first) until every (categorical-quasi, bucket) group
    * reaches k, then suppress whatever residue remains (a no-op when a
    * rung satisfies; the safety net when even the coarsest doesn't).
    * Buckets are `floor(v/w)·w` (bucket start — the value a release
    * actually publishes), NULLs form their own group like GROUP BY,
    * and the rung choice is deterministic: the FIRST ladder width
    * whose minimum group size ≥ k, else the last. The probe loop is
    * |ladder| bounded hash-aggregates with 1-row driver reads — group
    * counts, never rows. Output: the input plus `<numCol>_gen` (the
    * published bucket start) and the constant `gen_width`, original
    * `numCol` DROPPED (releasing both would defeat the point). */
  def generalizeNumericToK(df: DataFrame, quasiCols: Seq[String],
      numCol: String, k: Long, ladder: Seq[Long]): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(ladder.nonEmpty && ladder.forall(_ > 0) &&
      ladder == ladder.sorted && ladder.distinct == ladder,
      s"ladder must be ascending positive widths, got $ladder")
    val missing = (quasiCols :+ numCol).filterNot(df.columns.contains)
    require(missing.isEmpty, s"no such column(s): ${missing.mkString(", ")}")
    def bucketed(w: Long): DataFrame = df.withColumn("__b",
      floor(col(numCol).cast("double") / lit(w.toDouble)).cast("long") * w)
    def minGroup(w: Long): Long = {
      val r = bucketed(w)
        .groupBy((quasiCols.map(col) :+ col("__b")): _*)
        .agg(count(lit(1)).as("__n"))
        .agg(min(col("__n"))).head()
      if (r.isNullAt(0)) Long.MaxValue else r.getLong(0) // empty: vacuous
    }
    val w = ladder.find(minGroup(_) >= k).getOrElse(ladder.last)
    val gen = bucketed(w)
      .drop(numCol)
      .withColumnRenamed("__b", s"${numCol}_gen")
      .withColumn("gen_width", lit(w))
    kAnonymize(gen, quasiCols :+ s"${numCol}_gen", k)
  }

  /** Suppression to t-closeness: keep rows whose group's sensitive
    * distribution sits within total-variation `tNum/tDen` of the
    * corpus-wide one. The threshold is a RATIONAL so the decision is
    * the exact cross-multiplication `tvd_scaled·tDen ≤ tNum·denom` —
    * no float wavers at the boundary, and small denominators (3/10,
    * 1/4…) keep the products in long range at any realistic release
    * size. Compose with [[kAnonymize]] and [[lDiversify]] — the three
    * guarantees are orthogonal. */
  def tCloseness(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, tNum: Long, tDen: Long): DataFrame = {
    require(tNum >= 0 && tDen > 0, s"t = $tNum/$tDen must be >= 0")
    val dist = tClosenessDistances(df, quasiCols, sensitiveCol)
      .filter(col("tvd_scaled") * lit(tDen) <= lit(tNum) * col("denom"))
      .select(quasiCols.map(c => col(c).as(s"__q_$c")): _*)
    val cond = quasiCols.map(c => col(c) <=> col(s"__q_$c")).reduce(_ && _)
    df.join(dist, cond).drop(quasiCols.map(c => s"__q_$c"): _*)
  }
}
