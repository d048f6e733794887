package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = (0 until 2000).map(i => (i.toLong, s"doc $i"))
    .toDF("id", "text")

  test("splits are deterministic, exhaustive, and near the weights") {
    val w = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = Sampling.assignSplit(docs, "id", w)
      .select("id", "split").as[(Long, String)].collect().toMap
    val b = Sampling.assignSplit(docs, "id", w)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(a == b) // stable across runs
    assert(a.size == 2000)
    val frac = a.values.groupBy(identity).view.mapValues(_.size / 2000.0)
    assert(math.abs(frac("train") - 0.8) < 0.05, frac)
    assert(math.abs(frac("val") - 0.1) < 0.03, frac)
    assert(math.abs(frac("test") - 0.1) < 0.03, frac)
  }

  test("rounding cannot starve a trailing split (cumulative bounds)") {
    // per-increment rounding gave bounds (5, 10) here, leaving "c" empty
    val w = Seq("a" -> 0.45, "b" -> 0.45, "c" -> 0.1)
    val splits = Sampling.assignSplit(docs, "id", w, buckets = 10,
      hashOf = c => c.cast("long"))
      .select("split").as[String].collect().toSet
    assert(splits == Set("a", "b", "c"))
  }

  test("sampleFraction is a stable subset of the right size") {
    val s10 = Sampling.sampleFraction(docs, "id", 0.1)
      .select("id").as[Long].collect().toSet
    val s20 = Sampling.sampleFraction(docs, "id", 0.2)
      .select("id").as[Long].collect().toSet
    assert(s10.subsetOf(s20)) // nested: growing the fraction only adds rows
    assert(math.abs(s10.size / 2000.0 - 0.1) < 0.03)
    assert(math.abs(s20.size / 2000.0 - 0.2) < 0.03)
  }

  test("upsample replicates by weight and drops non-positive") {
    val weighted = Seq((1L, 3L), (2L, 1L), (3L, 0L)).toDF("id", "rep")
    val up = Sampling.upsample(weighted, "rep")
      .groupBy("id").count().as[(Long, Long)].collect().toMap
    assert(up == Map(1L -> 3L, 2L -> 1L))
  }

  test("quotaSample: exact counts per stratum, small strata kept whole") {
    val strat = spark.range(1000).selectExpr("id",
      "CASE WHEN id < 900 THEN 'big' WHEN id < 995 THEN 'mid' ELSE 'tiny' END AS s")
    val counts = Sampling.quotaSample(strat, "id", "s", quota = 50)
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(counts == Map("big" -> 50L, "mid" -> 50L, "tiny" -> 5L))
    // deterministic: same draw twice
    val a = Sampling.quotaSample(strat, "id", "s", 10).select("id", "rank")
      .as[(Long, Long)].collect().toSet
    val b = Sampling.quotaSample(strat, "id", "s", 10).select("id", "rank")
      .as[(Long, Long)].collect().toSet
    assert(a == b)
    // the rank predicate compiles to a WindowGroupLimit (map-side prune)
    val plan = Sampling.quotaSample(strat, "id", "s", 10)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("WindowGroupLimit"), plan.take(500))
  }

  test("mixtureSample: weight-allocated quotas, absent sources drop, shortfall passes") {
    val strat = spark.range(300).selectExpr("id",
      "CASE WHEN id < 200 THEN 'web' WHEN id < 290 THEN 'books' ELSE 'code' END AS s")
    val counts = Sampling.mixtureSample(strat, "id", "s",
      Seq("web" -> 0.5, "books" -> 0.25, "code" -> 0.125), total = 128)
      .groupBy("s").count().as[(String, Long)].collect().toMap
    // quotas 64/32/16; 'code' has only 10 rows -> yields what it has
    assert(counts == Map("web" -> 64L, "books" -> 32L, "code" -> 10L))
    // unweighted stratum never appears
    assert(!Sampling.mixtureSample(strat, "id", "s",
      Seq("web" -> 0.5), total = 10)
      .select("s").as[String].collect().contains("books"))
    // the draw is the quotaSample draw: same keys for matching quotas
    val viaQuota = Sampling.quotaSample(
      strat.filter(col("s") === "web"), "id", "s", quota = 64)
      .select("id").as[Long].collect().toSet
    val viaMix = Sampling.mixtureSample(strat, "id", "s",
      Seq("web" -> 0.5), total = 128)
      .select("id").as[Long].collect().toSet
    assert(viaMix == viaQuota)
    // map-side prune survives the data-dependent quota
    val plan = Sampling.mixtureSample(strat, "id", "s",
      Seq("web" -> 0.5), total = 128)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("WindowGroupLimit"), plan.take(500))
  }

  test("globalSample: exact n, deterministic, TakeOrderedAndProject plan") {
    val df = spark.range(5000).toDF("id")
    val s1 = Sampling.globalSample(df, "id", 100).select("id")
      .as[Long].collect().toSet
    val s2 = Sampling.globalSample(df, "id", 100).select("id")
      .as[Long].collect().toSet
    assert(s1.size == 100 && s1 == s2)
    val plan = Sampling.globalSample(df, "id", 100)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("TakeOrderedAndProject"), plan.take(500))
  }

  test("temperatureSample: sqrt quotas flatten skew, exact counts") {
    import spark.implicits._
    val df = ((1L to 900L).map(i => (i, "big")) ++
      (1001L to 1100L).map(i => (i, "small"))).toDF("id", "lang")
    val got = Sampling.temperatureSample(df, "id", "lang", total = 200L)
    val byLang = got.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    // w = (30, 10), W = 40 -> quotas floor(200*30/40)=150, floor(200*10/40)=50
    assert(byLang == Map("big" -> 150L, "small" -> 50L))
    // proportional would have drawn 180:20 — sqrt flattens 9:1 to 3:1
    val quotas = got.select("lang", "quota").distinct()
      .as[(String, Long)].collect().toMap
    assert(quotas == Map("big" -> 150L, "small" -> 50L))
    // the draw itself is the deterministic md5 order (rank 1..quota)
    val ranks = got.filter(col("lang") === "small")
      .select("rank").as[Long].collect().sorted
    assert(ranks.toSeq == (1L to 50L))
  }

  test("weightedSystematic matches the single-axis brute force") {
    import spark.implicits._
    val df = (1L to 500L).map(i => (i, 1L + i % 97)).toDF("id", "w")
    val step = 100L
    val got = Sampling.weightedSystematic(df, "id", "w", step, buckets = 8)
      .select("id", "weight", "g").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    // brute force: one global cumsum in (md5, id) order
    val md5 = java.security.MessageDigest.getInstance("MD5")
    def h(i: Long) = md5.digest(i.toString.getBytes)
      .map("%02x".format(_)).mkString
    val ordered = (1L to 500L).map(i => (i, 1L + i % 97, h(i)))
      .sortBy { case (i, _, hh) => (hh, i) }
    var cum = 0L
    val want = ordered.flatMap { case (i, w, _) =>
      val g = cum; cum += w
      if ((g + w) / step > g / step) Some((i, w, g)) else None
    }.sortBy(_._1)
    assert(got.toSeq == want)
    // spacing: every multiple of step up to the total is covered exactly
    // once, so the draw is within one row of total/step
    assert(math.abs(got.length - cum / step) <= 1)
    // a row at least as heavy as the step can never be skipped
    val heavy = Sampling.weightedSystematic(
      (1L to 50L).map(i => (i, if (i % 5 == 0) 120L else 3L)).toDF("id", "w"),
      "id", "w", step = 100L, buckets = 4)
      .select("id").as[Long].collect().toSet
    assert((5L to 50L by 5).forall(heavy.contains))
  }

  test("dsirWeights matches the brute-force estimator and ranks target-like docs up") {
    val corpus = Seq(
      (1L, "good clean prose text", true),
      (2L, "good clean words here", true),
      (3L, "spam spam junk junk", false),
      (4L, "good clean prose here", false), // raw doc that LOOKS target-like
      (5L, "junk spam junk spam", false))   // raw doc that looks raw
    val df = corpus.toDF("id", "text", "t")
    val got = Sampling.dsirWeights(df, "id", "text", col("t"))
      .select("id", "weight").as[(Long, Double)].collect().toMap
    // brute force with the same formula
    val toks = corpus.flatMap { case (i, s, t) => s.split(" ").map(w => (i, w, t)) }
    val byW = toks.groupBy(_._2)
    val v = byW.size
    val rt = toks.size
    val tt = toks.count(_._3)
    def lr(w: String): BigDecimal = {
      val r = byW(w).size
      val tc = byW(w).count(_._3)
      BigDecimal(math.log((tc + 1.0) * (rt + v) / ((r + 1.0) * (tt + v))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    val want = corpus.map { case (i, s, _) =>
      i -> s.split(" ").map(lr).sum.toDouble }.toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (i, g) => assert(math.abs(g - want(i)) < 1e-9, s"doc $i") }
    // the target-like raw doc outranks the raw-like one
    assert(got(4L) > got(5L))
    // selection takes the top by weight with key tie-break
    val sel = Sampling.dsirSelect(df, "id", "text", col("t"), n = 2)
      .select("id").as[Long].collect().toSet
    val top2 = want.toSeq.sortBy { case (i, w) => (-w, i) }.take(2).map(_._1).toSet
    assert(sel == top2)
  }

  test("shuffleShards: stable bijective positions, no shard gaps") {
    val out = Sampling.shuffleShards(docs, "id", numShards = 7)
      .select("id", "shard", "seq").as[(Long, Long, Long)].collect()
    assert(out.length == 2000)
    // every shard's seqs are exactly 1..count (dense, no dup, no gap)
    out.groupBy(_._2).foreach { case (sh, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq, s"shard $sh")
    }
    assert(out.map(_._2).distinct.sorted.toSeq == (0L until 7L).toSeq)
    // pure function of the key: a second run reproduces positions exactly
    val again = Sampling.shuffleShards(docs, "id", numShards = 7)
      .select("id", "shard", "seq").as[(Long, Long, Long)].collect()
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    // roughly balanced buckets under xxhash64
    val sizes = out.groupBy(_._2).values.map(_.length)
    assert(sizes.min > 2000 / 7 / 2, sizes.toSeq)
  }

  test("leakFreeSplit: near-dup clusters never straddle a split boundary") {
    // 30 singleton docs with disjoint vocabularies + one 3-member
    // near-dup cluster (ids 100, 101, 102 share almost all trigrams)
    val base = (1L to 30L).map(i =>
      i -> (0 until 12).map(j => s"w${i}_$j").mkString(" "))
    val nearDups = Seq(
      100L -> "shared words all across this entire document body here now",
      101L -> "shared words all across this entire document body here soon",
      102L -> "shared words all across this entire document body here then")
    val docs = (base ++ nearDups).toDF("doc_id", "text")
    val split = Sampling.leakFreeSplit(docs, "doc_id", "text",
      Seq("train" -> 0.5, "val" -> 0.5), maxDf = None)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(split.size == 33)
    // the cluster moves atomically, keyed on its min-id root
    assert(split(100L) == split(101L) && split(101L) == split(102L))
    // singletons match the plain per-document assignment (key = own id)
    val plain = Sampling.assignSplit(docs.filter(col("doc_id") <= 30L),
      "doc_id", Seq("train" -> 0.5, "val" -> 0.5))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    (1L to 30L).foreach(i => assert(split(i) == plain(i), s"doc $i"))
    // rerun-stable
    val again = Sampling.leakFreeSplit(docs, "doc_id", "text",
      Seq("train" -> 0.5, "val" -> 0.5), maxDf = None)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(split == again)
  }

  test("mixtureSampleTokens: budgets spend tokens, crossing doc included, bucketed == brute") {
    // 40 docs across two strata with known token weights
    val rows = (1L to 40L).map(i =>
      (i, if (i % 2 == 0) "a" else "b", (i % 7 + 1).toString,
        (1L to (i % 7 + 1)).map(j => s"t$j").mkString(" ")))
    val docs = rows.map { case (id, s, _, t) => (id, s, t) }
      .toDF("doc_id", "source", "text")
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
    val weights = Seq("a" -> 0.5, "b" -> 0.25)
    val wmap = weights.toMap
    val total = 64L  // budgets 32 and 16 tokens — both strata partial
    val got = Sampling.mixtureSampleTokens(docs, "doc_id", "source",
      "n_tokens", weights, total)
      .select("doc_id", "source", "n_tokens", "tok_start")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    // brute force: md5 order per stratum, greedy prefix, crossing doc in
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val brute = rows.map { case (id, s, _, t) =>
      (id, s, t.split(" ").length.toLong, md5hex(id.toString))
    }.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
      val budget = math.floor(wmap(src) * total).toLong
      var cum = 0L
      ds.sortBy(d => (d._4, d._1)).flatMap { case (id, s, w, _) =>
        val start = cum; cum += w
        if (start < budget) Some((id, s, w, start)) else None
      }
    }.sortBy(_._1)
    assert(got == brute)
    // realized tokens: within budget + at most one crossing doc each
    weights.foreach { case (src, wt) =>
      val budget = math.floor(wt * total).toLong
      val sel = got.filter(_._2 == src)
      val tokens = sel.map(_._3).sum
      assert(tokens >= budget, s"$src under-spent: $tokens < $budget")
      assert(sel.map(_._4).max < budget, s"$src start past budget")
    }
    // a stratum absent from the weights never appears
    assert(got.forall(r => Set("a", "b")(r._2)))
    // many-bucket path == few-bucket path (the bucketed prefix is exact)
    val b2 = Sampling.mixtureSampleTokens(docs, "doc_id", "source",
      "n_tokens", weights, total, buckets = 2)
      .select("doc_id", "source", "n_tokens", "tok_start")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(b2 == got)
  }

  test("temperatureSampleTokens: sqrt budgets flatten token skew, spend is exact") {
    // 'big' holds 1600 tokens (100 docs x 16), 'small' 100 (25 x 4):
    // proportional budgets would split 94:6; sqrt splits 40:10 -> 80:20
    val rows = (1L to 100L).map(i => (i, "big", 16L)) ++
      (101L to 125L).map(i => (i, "small", 4L))
    val docs = rows.toDF("doc_id", "lang", "n_tokens")
    val total = 500L
    val got = Sampling.temperatureSampleTokens(docs, "doc_id", "lang",
      "n_tokens", total)
      .select("doc_id", "lang", "n_tokens", "budget", "tok_start")
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    val budgets = got.map(r => r._2 -> r._4).toMap
    // W = sqrt(1600)+sqrt(100) = 50; budgets floor(500*40/50), floor(500*10/50)
    assert(budgets == Map("big" -> 400L, "small" -> 100L), budgets.toString)
    // each stratum spends its budget: starts inside, total covers it
    Seq("big", "small").foreach { lang =>
      val sel = got.filter(_._2 == lang)
      assert(sel.map(_._5).max < budgets(lang), s"$lang start past budget")
      assert(sel.map(_._3).sum >= budgets(lang), s"$lang under-spent")
    }
    // deterministic rerun
    val again = Sampling.temperatureSampleTokens(docs, "doc_id", "lang",
      "n_tokens", total)
      .select("doc_id", "lang", "n_tokens", "budget", "tok_start")
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(got.sortBy(_._1) == again.sortBy(_._1))
  }
}
