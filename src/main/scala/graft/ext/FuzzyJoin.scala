package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Fuzzy string self-join (record linkage / spelling-variant detection):
  * all pairs within Levenshtein distance `maxDist`, EXACTLY, without the
  * O(n^2) cross join.
  *
  * Candidate generation is the q-gram count filter of Gravano et al.,
  * VLDB 2001 ("Approximate String Joins in a Database (Almost) for
  * Free"): an edit operation destroys at most q of a string's
  * overlapping q-grams, so ed(a,b) <= k implies the q-gram MULTISET
  * intersection is >= max(|a|,|b|) - q + 1 - k*q. The engine builds an
  * inverted index of per-string q-gram counts, equi-joins on the gram
  * hash (8-byte shuffle keys), aggregates the exact multiset overlap
  * map-side (`sum(least(ca, cb))` over one shuffle), applies the count
  * and length (|len_a - len_b| <= k) filters, and only then verifies
  * surviving candidates with the codegen'd `levenshtein` — pairs sharing
  * no gram never materialize.
  *
  * `maxDf` (ON by default — the 100 TB guard) removes grams present in
  * more than maxDf strings from the JOIN: a gram with document frequency
  * df contributes C(df,2) candidates, so one boilerplate prefix gram
  * ("Customer#…") makes candidate generation quadratic. Exactness is
  * preserved, not approximated:
  *  - capped grams ride along as a small per-string (gram -> count) map,
  *    and the exact overlap is restored per candidate via `map_zip_with`
  *    before the count filter — so any pair sharing >= 1 sub-cap gram is
  *    judged on its TRUE overlap;
  *  - a true pair can evade the join only if EVERY gram it shares is
  *    capped, which forces each member's capped-gram mass to exceed its
  *    own count-filter bound (dropped >= len - q + 1 - k*q). Those
  *    "saturated" strings — plus strings too short to carry a positive
  *    bound (len <= k*q + q - 1), whose bound is vacuous — form a small
  *    residual set handled all-pairs through a length-bucket equi-join
  *    and the same exact verify. The two paths partition the pair space
  *    (index path skips both-residual pairs), so the union is exact with
  *    no dedup step. Residual size is bounded by boilerplate density,
  *    not corpus size, on natural zipfian data — same contract as the
  *    hot-shingle sets in [[Dedup.ngramJaccardPairs]].
  *
  * Output: (i, j, dist) with i < j, dist <= maxDist.
  */
object FuzzyJoin {

  /** Exact multiset overlap of two (gramHash -> count) maps — HOF-only,
    * deterministic integer sum. */
  private def mapOverlap(a: Column, b: Column): Column =
    coalesce(aggregate(
      map_values(map_zip_with(a, b,
        (_, va, vb) => least(coalesce(va, lit(0L)), coalesce(vb, lit(0L))))),
      lit(0L), (acc, v) => acc + v), lit(0L))

  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, q: Int = 2, maxDf: Option[Long] = Some(1000L),
      eager: Boolean = false): DataFrame = {
    require(maxDist >= 1 && q >= 2, s"maxDist=$maxDist must be >=1, q=$q >=2")
    val k = maxDist
    val vacuousLen = k * q + q - 1 // count-filter bound <= 0 at this length
    val s = df.select(col(idCol).cast("long").as("id"),
        col(strCol).as("s"), length(col(strCol)).cast("int").as("len"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // per-string q-gram multiset counts, keyed by 64-bit gram hash
    val gramCounts = s.filter(col("len") >= q)
      .select(col("id"), col("len"),
        explode(expr(s"transform(sequence(0, len - $q), " +
          s"i -> substring(s, i + 1, $q))")).as("g0"))
      .groupBy(col("id"), col("len"), xxhash64(col("g0")).as("g"))
      .agg(count(lit(1)).as("c"))

    // df-cap split: cold grams drive the join; capped grams become a
    // small per-string map restoring the exact overlap per candidate.
    // hotMaps stays None when the cap removes nothing (the common case —
    // one cheap existence probe on the persisted index), so the
    // hot-restore joins and the saturated-set scan never enter the plan
    val (cold, hotMaps, caches) = maxDf match {
      case None => (gramCounts, None, Nil)
      case Some(cap) =>
        val gc = gramCounts.persist(StorageLevel.MEMORY_AND_DISK)
        val hotG = gc.groupBy(col("g")).agg(count(lit(1)).as("dfreq"))
          .filter(col("dfreq") > cap).select(col("g"))
        if (hotG.limit(1).count() == 0L) (gc, None, Seq(gc))
        else {
          val coldIdx = gc.join(broadcast(hotG), Seq("g"), "left_anti")
          val hm = s.select(col("id")).join(
              gc.join(broadcast(hotG), Seq("g"), "left_semi")
                .groupBy(col("id"))
                .agg(map_from_entries(collect_list(struct(col("g"), col("c"))))
                  .as("hot")), Seq("id"), "left")
            .select(col("id"), coalesce(col("hot"),
              map_from_entries(array().cast("array<struct<g:bigint,c:bigint>>")))
              .as("hot"))
            .withColumn("dropped",
              coalesce(aggregate(map_values(col("hot")), lit(0L),
                (acc, v) => acc + v), lit(0L)))
            .persist(StorageLevel.MEMORY_AND_DISK)
          (coldIdx, Some(hm), Seq(gc, hm))
        }
    }

    // residual set: vacuous count-filter bound (short strings), plus —
    // only when hot grams exist — strings saturated by capped mass
    val resid = (hotMaps match {
      case None => s.filter(col("len") <= vacuousLen)
      case Some(hots) => hots.join(s, Seq("id"))
        .filter(col("len") <= vacuousLen ||
          col("dropped") >= col("len") - q + 1 - k * q)
    }).select(col("id"), col("s"), col("len"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val residIds = resid.select(col("id")).withColumn("residual", lit(true))

    // ---- index path: candidates from cold-gram overlap ----
    val idx = cold
      .join(broadcast(residIds), Seq("id"), "left")
      .withColumn("residual", coalesce(col("residual"), lit(false)))
    val cand = idx.as("a").join(idx.as("b"),
        col("a.g") === col("b.g") && col("a.id") < col("b.id") &&
          abs(col("a.len") - col("b.len")) <= k &&
          !(col("a.residual") && col("b.residual")))
      .groupBy(col("a.id").as("i"), col("b.id").as("j"))
      .agg(sum(least(col("a.c"), col("b.c"))).as("common_cold"),
        first(col("a.len")).as("len_i"), first(col("b.len")).as("len_j"))
    val withHot = (hotMaps match {
      case None => cand.withColumn("common", col("common_cold"))
      case Some(hots) => cand
        .join(hots.select(col("id").as("i"), col("hot").as("hot_i")), Seq("i"))
        .join(hots.select(col("id").as("j"), col("hot").as("hot_j")), Seq("j"))
        .withColumn("common",
          col("common_cold") + mapOverlap(col("hot_i"), col("hot_j")))
    }).filter(col("common") >=
        greatest(col("len_i"), col("len_j")) - q + 1 - k * q)
    val idxPairs = withHot
      .join(s.select(col("id").as("i"), col("s").as("s_i")), Seq("i"))
      .join(s.select(col("id").as("j"), col("s").as("s_j")), Seq("j"))
      .withColumn("dist", levenshtein(col("s_i"), col("s_j")))
      .filter(col("dist") <= k)
      .select(col("i"), col("j"), col("dist"))

    // ---- residual path: all pairs within the residual set, met through
    // a length-bucket equi-join (each row probes lengths len..len+k; the
    // shorter side always reaches up, so every unordered pair joins once)
    val probe = resid.select(col("id"), col("s"), col("len"),
      explode(sequence(col("len"), col("len") + k)).as("tl"))
    val residPairs = probe.as("a").join(resid.as("b"),
        col("a.tl") === col("b.len") &&
          (col("a.len") < col("b.len") ||
            (col("a.len") === col("b.len") && col("a.id") < col("b.id"))))
      .withColumn("dist", levenshtein(col("a.s"), col("b.s")))
      .filter(col("dist") <= k)
      .select(least(col("a.id"), col("b.id")).as("i"),
        greatest(col("a.id"), col("b.id")).as("j"), col("dist"))

    val out = idxPairs.unionByName(residPairs)
    Dedup.finishEager(out, eager, Seq(s, resid) ++ caches)
  }
}
