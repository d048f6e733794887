package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Behavioral event analytics at lake scale: ordered funnels and cohort
  * retention — the two queries every product-analytics warehouse runs
  * hourly over its event firehose. Both are compositions of hash
  * aggregations and user-keyed equi-joins: no windows over the whole
  * event stream, no per-user collect_list, so they scale with executor
  * count and survive skewed users (a user's events never have to fit
  * in one buffer).
  *
  * Reference scope: §2.5 beyond-parity (the reference's MySQL engine has
  * no event-sequence queries); pairs with [[graft.streaming.EventStream]]
  * sessionization over the same table.
  */
object EventAnalytics {

  /** Ordered funnel: for each user, the earliest time of step 0, then
    * the earliest step-1 event STRICTLY AFTER that, and so on — the
    * strict sequential-conversion semantics (a purchase before the
    * first view does not convert).
    *
    * Output: one row per user who completed step 0, with nullable
    * `t0..t{n-1}` step timestamps (null = never reached).
    *
    * Scale shape: step 0 is one filtered aggregation; each later step is
    * one user-keyed equi-join of the (already tiny) per-user frame onto
    * the events of that step plus a re-aggregation. Filters sit inside
    * the scan, so each step reads only its own event type; per-user
    * state is one timestamp per step, never an event list. */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val s0 = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t0"))
    steps.zipWithIndex.drop(1).foldLeft(s0) { case (prev, (step, i)) =>
      val reached = events.filter(col(typeCol) === step)
        .join(prev.select(col(userCol), col(s"t${i - 1}")), userCol)
        .filter(col(tsCol) > col(s"t${i - 1}"))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as(s"t$i"))
      // left join: users stuck before this step keep their earlier
      // timestamps, t_i stays null
      prev.join(reached, Seq(userCol), "left")
    }
  }

  /** Funnel conversion summary: one row per step — (step, step_name,
    * users reaching it). */
  def funnelCounts(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String]): DataFrame = {
    val f = funnel(events, userCol, typeCol, tsCol, steps)
    val cs = steps.indices.map(i => count(col(s"t$i")).as(s"n$i"))
    val counts = f.agg(cs.head, cs.tail: _*)
    counts.select(posexplode(array(
        steps.indices.map(i => col(s"n$i")): _*)).as(Seq("step", "users")))
      .select(col("step").cast("long").as("step"),
        element_at(typedlit(steps), col("step").cast("int") + 1)
          .as("step_name"),
        col("users"))
  }

  /** Session path mining: the top-k event-type trigram paths users walk
    * WITHIN a session (the "what do people actually do" complement to
    * the hypothesis-driven [[funnel]]). Sessions are the same
    * gap-threshold windows the sessionizer emits; paths come from two
    * LEADs over each session's ordered events — no per-session
    * collect_list, so a marathon session never has to fit one buffer.
    *
    * Scale shape: one user-keyed shuffle serves the session-id running
    * sum and the path windows (same partitioning), then a path-keyed
    * hash aggregation and TakeOrderedAndProject for the top-k.
    * `orderCol` breaks timestamp ties deterministically (LEAD on tied
    * orderings is engine-defined otherwise). */
  def sessionPaths(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, orderCol: String, gapMinutes: Int = 30,
      k: Int = 20): DataFrame = {
    require(gapMinutes > 0 && k > 0, s"gapMinutes=$gapMinutes k=$k must be positive")
    import org.apache.spark.sql.expressions.Window
    val wu = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(orderCol))
    // millisecond gap arithmetic — EXACTLY sessionizeBatch's comparison,
    // so paths and sessions agree on gaps within a second of the boundary
    val flagged = events.withColumn("__ns",
      when(lag(col(tsCol), 1).over(wu).isNull ||
        unix_millis(col(tsCol)) - unix_millis(lag(col(tsCol), 1).over(wu))
          > gapMinutes * 60000L, 1L).otherwise(0L))
    val sess = flagged.withColumn("__sid",
      sum(col("__ns")).over(wu.rowsBetween(Window.unboundedPreceding, 0)))
    val ws = Window.partitionBy(col(userCol), col("__sid"))
      .orderBy(col(tsCol), col(orderCol))
    sess
      .withColumn("__t2", lead(col(typeCol), 1).over(ws))
      .withColumn("__t3", lead(col(typeCol), 2).over(ws))
      .filter(col("__t3").isNotNull)
      .select(concat_ws(">", col(typeCol), col("__t2"), col("__t3"))
        .as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(k)
  }

  /** Cohort retention: users are cohorted by the period of their FIRST
    * event; each (cohort, period) cell counts the cohort's users active
    * in that period. `period` is a truncation expression over the
    * timestamp (default ISO week start). Output: (cohort, period,
    * users), the classic retention triangle (period >= cohort).
    *
    * Scale shape: first-touch is one user-keyed min-aggregation; the
    * activity set is one distinct over (user, period) — which shrinks
    * the firehose to at most users x periods — then one equi-join on
    * user and one final hash aggregation. */
  def retention(events: DataFrame, userCol: String, tsCol: String,
      period: Column => Column = c => date_trunc("week", c).cast("date"))
      : DataFrame = {
    val first = events.groupBy(col(userCol))
      .agg(min(period(col(tsCol))).as("cohort"))
    val active = events.select(col(userCol),
      period(col(tsCol)).as("period")).distinct()
    active.join(first, userCol)
      .groupBy(col("cohort"), col("period"))
      .agg(count(lit(1)).as("users"))
  }

  /** Item-pair co-occurrence (market-basket mining): how many baskets
    * contain BOTH items, for every unordered pair above `minSupport`.
    * Output: (item_a, item_b, n_baskets) with item_a < item_b.
    *
    * Scale shape: the basket table first shrinks to DISTINCT
    * (basket, item) — one shuffle, after which both self-join sides
    * share the basket partitioning (ReusedExchange: the exchange runs
    * once). The `<` predicate halves the pair blow-up and the final
    * hash-agg combines map-side. The quadratic hazard is a pathological
    * basket (a crawler user touching every item contributes |items|²/2
    * pairs): `maxItemsPerBasket` drops those baskets whole before the
    * join — the standard basket-cap mitigation, applied to the basket,
    * never biasing surviving pairs. */
  def cooccurrence(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long = 1L,
      maxItemsPerBasket: Option[Int] = None): DataFrame = {
    val items = df.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .distinct()
    val capped = maxItemsPerBasket match {
      case Some(m) =>
        val ok = items.groupBy(col("__b")).agg(count(lit(1)).as("__n"))
          .filter(col("__n") <= m).select(col("__b"))
        items.join(ok, "__b")
      case None => items
    }
    val a = capped.select(col("__b"), col("__i").as("item_a"))
    val b = capped.select(col("__b"), col("__i").as("item_b"))
    a.join(b, Seq("__b")).filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_baskets"))
      .filter(col("n_baskets") >= minSupport)
  }

  /** Trending items — rank by the smoothed ratio of recent to prior
    * volume, (c_now + 1)/(c_prev + 1): the "what's rising" list where a
    * raw top-N by count just returns the perennial heavy hitters.
    * Add-one smoothing keeps new items (c_prev = 0) finite and damps
    * one-event noise; the score divides exact integers once, so the
    * ranking replays bit-for-bit.
    *
    * Scale shape: ONE conditional-sum hash aggregation over the fact
    * (both windows in the same pass — no self-join of two period
    * scans); top-k leaves as TakeOrderedAndProject. */
  def trending(events: DataFrame, tsCol: String, itemCol: String,
      splitTs: String, k: Int = 20): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val split = lit(splitTs).cast("timestamp")
    events.select(col(itemCol).as("item"), col(tsCol).as("__ts"))
      .groupBy(col("item"))
      .agg(sum(when(col("__ts") < split, 1L).otherwise(0L)).as("c_prev"),
        sum(when(col("__ts") >= split, 1L).otherwise(0L)).as("c_now"))
      .withColumn("score",
        (col("c_now") + lit(1L)).cast("double") /
          (col("c_prev") + lit(1L)).cast("double"))
      .orderBy(col("score").desc, col("item"))
      .limit(k)
  }

  /** Time-to-convert distribution: for users with a `fromType` event and
    * a later `toType` event, the latency from FIRST `fromType` to the
    * first `toType` at-or-after it — the "how long from signup to
    * purchase" funnel-velocity metric that [[funnel]]'s pure counts
    * don't carry. Latencies are exact epoch-microsecond differences
    * (LONG); the summary row interpolates exact integers (the
    * quantile_cont parity proven by the boxplot gate).
    *
    * Scale shape: both event types filter inside the scan; per-user
    * state is ONE timestamp per side (min-aggregations with map-side
    * combine), the join is user-keyed, and only the bounded per-user
    * latency table reaches the percentile. Output one row:
    * (n, med_us, p90_us). */
  def timeToConvert(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, fromType: String, toType: String): DataFrame = {
    val first = events.filter(col(typeCol) === fromType)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t0"))
    val conv = events.filter(col(typeCol) === toType)
      .select(col(userCol), col(tsCol).as("__tc"))
    first.join(conv, Seq(userCol))
      .filter(col("__tc") >= col("__t0"))
      .groupBy(col(userCol), col("__t0")).agg(min(col("__tc")).as("__t1"))
      .select((unix_micros(col("__t1")) - unix_micros(col("__t0"))).as("__us"))
      .agg(count(lit(1)).as("n"),
        expr("percentile(__us, 0.5)").as("med_us"),
        expr("percentile(__us, 0.9)").as("p90_us"))
  }
}
