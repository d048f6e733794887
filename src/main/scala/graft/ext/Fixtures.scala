package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic planted fixtures for conformance-gating the approximate
  * operators (ANN, winnowing) whose quality CANNOT be oracle-gated on the
  * natural testdata: the `embeddings` table is pure noise (no near
  * neighbors to recall), and winnow fingerprints are engine-native hashes
  * with no DuckDB counterpart. Both fixtures are pure functions of
  * `range(n)` built from engine-portable primitives (integer arithmetic,
  * md5), so the DuckDB oracle reconstructs the SAME input with a CTE and
  * gates the operator's OUTPUT exactly — rank-vs-brute-force for ANN, the
  * shared-run guarantee for winnowing.
  */
object Fixtures {

  /** Planted vector clusters: `nClusters * members` unit-ish vectors,
    * cluster c of vector `id` = id / members occupying basis dims
    * {c, c + nClusters} — so distinct clusters are exactly orthogonal
    * (cosine 0) while members of one cluster differ only in a small
    * perturbation eps * 2^(id % members) on the second dim.
    *
    * Geometry (why ranks are oracle-safe): for members with perturbation
    * magnitudes p, q, cos ~= 1 - (p - q)^2 / 2, so each member's neighbor
    * ranking is by |p - q| ascending. The magnitudes are eps-scaled
    * DISTINCT powers of two, whose pairwise differences are all distinct
    * (unique binary representation) — no ties, and adjacent cosine values
    * are separated by >= ~3*eps^2/2 (6e-6 at the default eps), orders of
    * magnitude above both engines' float error. Cross-cluster cosine is
    * exactly 0, so top-(members-1) is always the own cluster.
    *
    * Max intra-cluster angle at eps=0.002 is atan(0.064) ~ 3.5 degrees:
    * near-identical directions, so sign-LSH buckets and IVF coarse lists
    * keep clusters together and approximate top-k == exact top-k — which
    * is precisely the gateable property. */
  def plantedVectors(spark: SparkSession, nClusters: Int = 10,
      members: Int = 6, dim: Int = 64, eps: Double = 0.002): DataFrame = {
    require(dim >= 2 * nClusters, "need dim >= 2*nClusters for disjoint support")
    spark.range(nClusters.toLong * members).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), i => {
        val c = expr(s"id div $members")
        val mag = lit(eps) * pow(lit(2.0), (col("id") % members).cast("double"))
        when(i === c, lit(1.0))
          .when(i === c + nClusters, mag)
          .otherwise(lit(0.0))
      }).cast("array<float>").as("embedding"))
  }

  /** DuckDB CTE reconstructing plantedVectors (same defaults). */
  def plantedVectorsSql(nClusters: Int = 10, members: Int = 6,
      dim: Int = 64, eps: Double = 0.002): String =
    s"SELECT id AS vec_id, [CAST(CASE WHEN i = (id // $members) THEN 1.0 " +
      s"WHEN i = (id // $members) + $nClusters " +
      s"THEN $eps * power(2.0, CAST(id % $members AS DOUBLE)) " +
      s"ELSE 0.0 END AS REAL) for i in range(0, $dim)] AS embedding " +
      s"FROM range(0, ${nClusters * members}) t(id)"

  /** Planted shared-run documents for the winnowing containment gate:
    * `nDocs` docs of `nWords` md5-derived filler words (unique per
    * (doc, slot) — no accidental cross-doc n-grams), except docs
    * [nDocs/2, nDocs/2 + nPairs) which embed words [runFrom, runFrom+runLen)
    * copied verbatim from partner doc (id - nDocs/2) positions
    * [srcFrom, srcFrom+runLen).
    *
    * Result: the pairs sharing ANY word 3-gram are EXACTLY the planted
    * (i, i + nDocs/2) pairs, each sharing a runLen-word run. With
    * runLen >= w + k - 1 the Schleimer'03 winnowing guarantee makes every
    * such pair share >= 1 fingerprint, and no other pair shares even a
    * k-gram — so "pairs sharing >= 1 winnow fingerprint" must equal the
    * DuckDB-computable "pairs sharing >= 1 word k-gram". */
  def plantedRunDocs(spark: SparkSession, nDocs: Int = 40, nWords: Int = 30,
      nPairs: Int = 10, runFrom: Int = 10, runLen: Int = 15,
      srcFrom: Int = 5): DataFrame = {
    val half = nDocs / 2
    require(nPairs <= half && runFrom + runLen <= nWords &&
      srcFrom + runLen <= nWords, "planted run out of bounds")
    spark.range(nDocs.toLong).select(
      col("id").as("doc_id"),
      array_join(transform(sequence(lit(0), lit(nWords - 1)), j => {
        val inRun = col("id") >= half && col("id") < half + nPairs &&
          j >= runFrom && j < runFrom + runLen
        val si = when(inRun, col("id") - half).otherwise(col("id"))
        val sj = when(inRun, j - (runFrom - srcFrom)).otherwise(j)
        substring(md5(concat(si.cast("string"), lit(":"), sj.cast("string"))),
          1, 8)
      }), " ").as("text"))
  }

  /** Planted name table for the fuzzy-join gate: `n` md5-hex base names
    * of length 8 + (id % 5), plus a one-char SUBSTITUTION variant (id + n)
    * for every id % 3 == 0 and a one-char DELETION variant (id + 2n) for
    * every id % 4 == 0 — known edit-distance <= 1 pairs planted into a
    * corpus whose unrelated names are random hex (pairwise distance far
    * above any small threshold). Pure function of range(n) from md5 +
    * integer arithmetic, so the DuckDB twin reconstructs it exactly and
    * brute-force `levenshtein` over all pairs is the oracle. */
  def plantedNames(spark: SparkSession, n: Int = 300): DataFrame = {
    val base = spark.range(n.toLong).selectExpr("id",
      s"substring(md5(cast(id as string)), 1, 8 + cast(id % 5 as int)) AS name")
    val subst = base.filter(col("id") % 3 === 0).selectExpr(s"id + $n AS id",
      "concat(substring(name, 1, cast(id % length(name) as int)), " +
        "substring(md5(concat(cast(id as string), 's')), 1, 1), " +
        "substring(name, cast(id % length(name) as int) + 2)) AS name")
    val del = base.filter(col("id") % 4 === 0).selectExpr(s"id + ${2 * n} AS id",
      "concat(substring(name, 1, cast(id % length(name) as int)), " +
        "substring(name, cast(id % length(name) as int) + 2)) AS name")
    base.unionByName(subst).unionByName(del)
  }

  /** DuckDB CTE reconstructing plantedNames (same defaults). */
  def plantedNamesSql(n: Int = 300): String =
    s"WITH base AS (SELECT id, substr(md5(CAST(id AS VARCHAR)), 1, " +
      s"8 + CAST(id % 5 AS INT)) AS name FROM range(0, $n) t(id)) " +
      s"SELECT id, name FROM base " +
      s"UNION ALL SELECT id + $n, substr(name, 1, CAST(id % len(name) AS INT)) || " +
      s"substr(md5(CAST(id AS VARCHAR) || 's'), 1, 1) || " +
      s"substr(name, CAST(id % len(name) AS INT) + 2) FROM base WHERE id % 3 = 0 " +
      s"UNION ALL SELECT id + ${2 * n}, substr(name, 1, CAST(id % len(name) AS INT)) || " +
      s"substr(name, CAST(id % len(name) AS INT) + 2) FROM base WHERE id % 4 = 0"

  /** Planted directed graph for the PageRank gate: every node i emits
    * edges i -> (2i+1) mod n and i -> (3i+7) mod n (so no dangling
    * nodes), plus a hub edge i -> 0 for i % 10 == 0 — node 0 accumulates
    * rank, the rest spread. Pure integer arithmetic over range(n);
    * duplicate edges (i = n-6 mod n emits both arithmetic edges to the
    * same target) are kept — multigraph semantics, identical in the
    * DuckDB twin. */
  def plantedEdges(spark: SparkSession, n: Int = 400): DataFrame = {
    val base = spark.range(n.toLong)
    base.selectExpr("id AS src", s"(2*id + 1) % $n AS dst")
      .unionAll(base.selectExpr("id AS src", s"(3*id + 7) % $n AS dst"))
      .unionAll(base.filter(col("id") % 10 === 0)
        .selectExpr("id AS src", "CAST(0 AS BIGINT) AS dst"))
  }

  /** DuckDB CTE reconstructing plantedEdges (same defaults). */
  def plantedEdgesSql(n: Int = 400): String =
    s"SELECT id AS src, (2*id + 1) % $n AS dst FROM range(0, $n) t(id) " +
      s"UNION ALL SELECT id, (3*id + 7) % $n FROM range(0, $n) t(id) " +
      s"UNION ALL SELECT id, 0 FROM range(0, $n) t(id) WHERE id % 10 = 0"

  /** Planted multi-component graph for the connected-components gate:
    * n nodes in rings of g (node i links to the next node of its ring),
    * plus a bridge (i, i+g) for every i % bridgeEvery == 0 merging two
    * adjacent rings — with the defaults, 30 rings and 6 bridges leave
    * exactly 24 components of known sizes (6 of 16 nodes, 18 of 8).
    * Pure integer arithmetic over range(n), twin below. */
  def plantedComponents(spark: SparkSession, n: Int = 240, g: Int = 8,
      bridgeEvery: Int = 40): DataFrame = {
    val base = spark.range(n.toLong)
    base.selectExpr("id AS src", s"id - id % $g + (id + 1) % $g AS dst")
      .unionAll(base.filter(col("id") % bridgeEvery === 0)
        .selectExpr("id AS src", s"(id + $g) % $n AS dst"))
  }

  /** Planted forest for the hierarchy gate: `trees` complete binary
    * trees of `size` nodes each (node i%size==0 is its tree's root;
    * child local index l hangs off parent (l-1)/2). Pure integer
    * arithmetic over range(trees*size), twin below. */
  def plantedForest(spark: SparkSession, trees: Int = 20,
      size: Int = 31): DataFrame =
    spark.range(trees.toLong * size)
      .filter(col("id") % size =!= 0)
      .selectExpr(s"id - id % $size + (id % $size - 1) DIV 2 AS parent",
        "id AS child")

  /** DuckDB CTE reconstructing plantedForest (same defaults). */
  def plantedForestSql(trees: Int = 20, size: Int = 31): String =
    s"SELECT id - id % $size + (id % $size - 1) // 2 AS parent, id AS child " +
      s"FROM range(0, ${trees * size}) t(id) WHERE id % $size <> 0"

  /** DuckDB CTE reconstructing plantedComponents (same defaults). */
  def plantedComponentsSql(n: Int = 240, g: Int = 8,
      bridgeEvery: Int = 40): String =
    s"SELECT id AS src, id - id % $g + (id + 1) % $g AS dst FROM range(0, $n) t(id) " +
      s"UNION ALL SELECT id, (id + $g) % $n FROM range(0, $n) t(id) WHERE id % $bridgeEvery = 0"

  /** Planted peel graph for the k-core gate: [[plantedForest]]'s binary
    * trees (internal degree 3, leaves degree 1) hung root-by-root off a
    * `trees`-node double-ring core (successor + skip chords: degree 4).
    * At k=3 the trees peel level by level — 5 rounds for size 31 — and
    * exactly the ring survives, every node at degree 4. Pure integer
    * arithmetic over range, twin below. */
  def plantedCore(spark: SparkSession, trees: Int = 20,
      size: Int = 31): DataFrame = {
    val base = trees * size
    val core = spark.range(trees.toLong)
    plantedForest(spark, trees, size)
      .selectExpr("parent AS src", "child AS dst")
      .unionAll(core.selectExpr(s"$base + id AS src",
        s"$base + (id + 1) % $trees AS dst"))
      .unionAll(core.selectExpr(s"$base + id AS src",
        s"$base + (id + 2) % $trees AS dst"))
      .unionAll(core.selectExpr(s"id * $size AS src", s"$base + id AS dst"))
  }

  /** DuckDB CTE reconstructing plantedCore (same defaults). */
  def plantedCoreSql(trees: Int = 20, size: Int = 31): String = {
    val base = trees * size
    s"SELECT id - id % $size + (id % $size - 1) // 2 AS src, id AS dst " +
      s"FROM range(0, $base) t(id) WHERE id % $size <> 0 " +
      s"UNION ALL SELECT $base + id, $base + (id + 1) % $trees FROM range(0, $trees) t(id) " +
      s"UNION ALL SELECT $base + id, $base + (id + 2) % $trees FROM range(0, $trees) t(id) " +
      s"UNION ALL SELECT id * $size, $base + id FROM range(0, $trees) t(id)"
  }

  /** Planted weighted DAG for the shortest-path gate: `layers` layers of
    * `width` nodes (node id = layer·width + j); every non-terminal node
    * sends two forward edges — to the next layer's (j+1)%width at weight
    * 1 + id%5 and to (j+3)%width at weight 2 + id%7. Layered, so
    * Bellman-Ford settles in exactly `layers − 1` relaxation rounds.
    * Pure integer arithmetic over range, twin below. */
  def plantedDag(spark: SparkSession, layers: Int = 12,
      width: Int = 20): DataFrame = {
    val base = spark.range((layers - 1).toLong * width)
    base.selectExpr("id AS src",
        s"(id DIV $width + 1) * $width + (id % $width + 1) % $width AS dst",
        "1 + id % 5 AS w")
      .unionAll(base.selectExpr("id AS src",
        s"(id DIV $width + 1) * $width + (id % $width + 3) % $width AS dst",
        "2 + id % 7 AS w"))
  }

  /** DuckDB CTE reconstructing plantedDag (same defaults). */
  def plantedDagSql(layers: Int = 12, width: Int = 20): String = {
    val n = (layers - 1) * width
    s"SELECT id AS src, (id // $width + 1) * $width + (id % $width + 1) % $width AS dst, " +
      s"1 + id % 5 AS w FROM range(0, $n) t(id) " +
      s"UNION ALL SELECT id, (id // $width + 1) * $width + (id % $width + 3) % $width, " +
      s"2 + id % 7 FROM range(0, $n) t(id)"
  }

  /** DuckDB CTE reconstructing plantedRunDocs (same defaults) as
    * (doc_id, words LIST(VARCHAR)). */
  def plantedRunDocsSql(nDocs: Int = 40, nWords: Int = 30, nPairs: Int = 10,
      runFrom: Int = 10, runLen: Int = 15, srcFrom: Int = 5): String = {
    val half = nDocs / 2
    s"SELECT id AS doc_id, [CASE WHEN id >= $half AND id < ${half + nPairs} " +
      s"AND j >= $runFrom AND j < ${runFrom + runLen} " +
      s"THEN substr(md5(CAST(id - $half AS VARCHAR) || ':' || " +
      s"CAST(j - ${runFrom - srcFrom} AS VARCHAR)), 1, 8) " +
      s"ELSE substr(md5(CAST(id AS VARCHAR) || ':' || CAST(j AS VARCHAR)), 1, 8) " +
      s"END for j in range(0, $nWords)] AS words " +
      s"FROM range(0, $nDocs) t(id)"
  }
}
