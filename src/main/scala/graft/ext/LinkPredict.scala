package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Common-neighbor / Jaccard link prediction over an undirected edge
  * list — score every non-adjacent pair that shares at least one
  * neighbor (the classic "people you may know" / related-entity
  * candidate generator, Liben-Nowell & Kleinberg CIKM'03).
  *
  * Candidates come from wedge enumeration: for each center u, every
  * pair of u's neighbors (a < b) is a candidate sharing u; one
  * (a, b) hash-aggregation counts the shared centers, one broadcast-
  * degree join adds |Γ(a)|, |Γ(b)|, and one anti-join removes pairs
  * that are already edges. jaccard = common / (deg_a + deg_b − common)
  * divides exact integer counts once — identical operands, identical
  * double on every engine.
  *
  * Scale shape: wedge count is Σ_u deg(u)² — dominated by hubs, like
  * every common-neighbor method. `maxDegree` drops wedge CENTERS above
  * the cap before enumeration (a documented approximation: a
  * 10^6-degree hub contributes no wedges but still counts in the
  * degree/denominator — the standard skew guard, same policy as
  * [[EventAnalytics.cooccurrence]]'s basket cap). Degrees are computed
  * BEFORE the cap so scores stay exact; everything shuffles on pair or
  * node keys, never collects.
  */
object LinkPredict {

  /** (a, b, common, deg_a, deg_b, jaccard) for every non-adjacent pair
    * with ≥ `minCommon` shared neighbors, a < b. */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
      minCommon: Long = 1L, maxDegree: Long = Long.MaxValue): DataFrame = {
    val sym = edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .unionAll(edges
        .select(col(dstCol).cast("long").as("a"), col(srcCol).cast("long").as("b")))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)
    val deg = sym.groupBy(col("a").as("node")).agg(count(lit(1)).as("deg"))
    // wedges: center u -> neighbor pairs (x < y); hub centers above the
    // cap are dropped WHOLE before the quadratic step
    val nbr = sym.select(col("a").as("u"), col("b").as("x"))
      .join(deg.filter(col("deg") <= maxDegree)
        .select(col("node").as("u")), "u")
    val wedges = nbr.join(
        nbr.select(col("u"), col("x").as("y")), "u")
      .filter(col("x") < col("y"))
    val common = wedges.groupBy(col("x"), col("y"))
      .agg(count(lit(1)).as("common"))
      .filter(col("common") >= minCommon)
    // drop already-linked pairs: sym holds both directions, so one
    // direction's (a,b) equality is enough
    val existing = sym.filter(col("a") < col("b"))
    val cand = common.join(existing,
        common("x") === existing("a") && common("y") === existing("b"),
        "left_anti")
    cand
      .join(deg.select(col("node").as("x"), col("deg").as("deg_a")), "x")
      .join(deg.select(col("node").as("y"), col("deg").as("deg_b")), "y")
      .select(col("x").as("a"), col("y").as("b"), col("common"),
        col("deg_a"), col("deg_b"),
        (col("common").cast("double") /
          (col("deg_a") + col("deg_b") - col("common")).cast("double"))
          .as("jaccard"))
  }
}
