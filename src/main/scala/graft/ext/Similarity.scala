package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * - Brute-force cosine top-k: broadcast the (small) query set, map-side
  *   score everything, per-query top-k. Exact; the baseline.
  * - Sign-LSH (random hyperplanes, Charikar 2002): per-table bit signature
  *   buckets; candidates = bucket collisions; exact rerank. The scale path:
  *   candidate generation is an equi-join on (table, signature), no O(n^2).
  *
  * All vector math is double-precision HOFs (`zip_with`/`aggregate`) —
  * per-row, shuffle-free, deterministic (sequential array-order sums).
  */
object Similarity {

  /** Dot product of two array columns in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors for each query row. `queries` should be
    * small (it is broadcast); corpus scans once. Ties broken by neighbor
    * id for determinism. Output: qid, nid, rank, cos. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nv"))
    val scored = c.crossJoin(q)
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos", cosine(col("qv"), col("nv")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"), col("cos"))
  }

  /** Deterministic pseudo-random hyperplanes: `tables` tables x `bits`
    * planes x `dim` components, from a fixed seed. */
  private def planes(tables: Int, bits: Int, dim: Int, seed: Long): Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(tables, bits, dim)(rnd.nextGaussian())
  }

  /** Sign-LSH signature for one table: an int whose b-th bit is the sign of
    * dot(plane_b, v). */
  private def signature(v: Column, tablePlanes: Array[Array[Double]]): Column =
    tablePlanes.zipWithIndex.map { case (plane, b) =>
      val planeCol = array(plane.map(lit).toIndexedSeq: _*)
      when(dot(v, planeCol) >= 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Approximate top-k: candidates from any-table signature collision with
    * the query, exact cosine rerank. Recall rises with `tables`, bucket
    * selectivity with `bits`. Output shape matches bruteForceTopK. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, tables: Int = 8, bits: Int = 12,
      dim: Int = 64, seed: Long = 42L): DataFrame = {
    val pl = planes(tables, bits, dim, seed)
    def withSigs(df: DataFrame, id: String, vec: String): DataFrame =
      df.select(col(id), col(vec),
        explode(array((0 until tables).map { t =>
          struct(lit(t).as("t"), signature(col(vec), pl(t)).as("sig"))
        }: _*)).as("s"))
        .select(col(id), col(vec), col("s.t").as("t"), col("s.sig").as("sig"))
    val cs = withSigs(corpus.select(col(idCol).as("nid"), col(vecCol).as("nv")), "nid", "nv")
    val qs = broadcast(withSigs(
      queries.select(col(idCol).as("qid"), col(vecCol).as("qv")), "qid", "qv"))
    val cands = cs.join(qs, Seq("t", "sig"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("qv"), col("nid"), col("nv")).distinct()
    val scored = cands.withColumn("cos", cosine(col("qv"), col("nv")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"), col("cos"))
  }

  /** All pairs with cosine >= threshold, sign-LSH bucketed: docs sharing a
    * signature in any table are candidates; exact rerank filters. */
  def cosinePairsLsh(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, tables: Int = 8, bits: Int = 12, dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    val pl = planes(tables, bits, dim, seed)
    val sigs = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      explode(array((0 until tables).map { t =>
        struct(lit(t).as("t"), signature(col(vecCol), pl(t)).as("sig"))
      }: _*)).as("s"))
      .select(col("id"), col("v"), col("s.t").as("t"), col("s.sig").as("sig"))
    sigs.as("a").join(sigs.as("b"),
        col("a.t") === col("b.t") && col("a.sig") === col("b.sig") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("i"), col("a.v").as("vi"),
        col("b.id").as("j"), col("b.v").as("vj")).distinct()
      .withColumn("cos", cosine(col("vi"), col("vj")))
      .filter(col("cos") >= threshold)
      .select(col("i"), col("j"), col("cos"))
  }
}
