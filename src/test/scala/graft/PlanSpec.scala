package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan contracts for the scale-critical queries: these are the
  * properties that keep the engine viable at 100 TB (broadcast star
  * joins, scan-level filter pushdown, column pruning, partition pruning),
  * asserted against the formatted plan so a regression fails CI instead
  * of surfacing as a cluster-scale incident. */
class PlanSpec extends SparkTestBase {

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def formatted(df: DataFrame): String = {
    import org.apache.spark.sql.execution.debug._
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("q19 star join: every dimension side broadcasts, no sort-merge join") {
    val df = SparkEntry.queries("q19")(spark, sf("sf0.001"))
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), "expected broadcast joins")
    assert(!p.contains("SortMergeJoin"),
      "star-schema dimensions must broadcast, not shuffle-sort")
  }

  test("q20 snowflake chain: broadcasts only") {
    val p = plan(SparkEntry.queries("q20")(spark, sf("sf0.001")))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("point-slice cut pushes its predicate into the parquet scan") {
    val p = formatted(SparkEntry.queries("q05")(spark, sf("sf0.001")))
    // assert the semantic fragment, not the whole filter list: attribute
    // order / list formatting shift across Spark minors and AQE re-plans
    val pushed = p.linesIterator.find(_.contains("PushedFilters"))
      .getOrElse(fail(s"no PushedFilters in formatted plan:\n$p"))
    assert(pushed.contains("EqualTo(l_returnflag,R)"),
      s"cut predicate not pushed: $pushed")
  }

  test("projection prunes the scan to the referenced columns only") {
    // q01 touches a single measure column: the scan must not read the
    // other 15 lineitem columns
    val p = formatted(SparkEntry.queries("q01")(spark, sf("sf0.001")))
    val read = p.linesIterator.find(_.contains("ReadSchema"))
      .getOrElse(fail("no ReadSchema in formatted plan"))
    assert(read.contains("l_extendedprice"))
    assert(!read.contains("l_comment") && !read.contains("l_shipdate"),
      s"scan reads unreferenced columns: $read")
  }

  test("warehouse year cut prunes partitions at the source") {
    val root = TempDirs.scratchDir("plan_wh").toString
    val wh = new snapshot.Warehouse(spark, root)
    import spark.implicits._
    val batch = Seq((1L, "a", 2023L), (2L, "b", 2024L), (3L, "c", 2025L))
      .toDF("k", "v", "year")
    wh.append("f_plan", batch)
    val cut = wh.read("f_plan").get.filter(col("year") === 2024L)
    val p = formatted(cut)
    // the year predicate must land in the scan's PartitionFilters (directory
    // pruning — no data file of other years is opened), not PushedFilters
    val pf = p.linesIterator.find(_.contains("PartitionFilters"))
      .getOrElse(fail(s"no partition filters:\n$p"))
    assert(pf.contains("= 2024"), s"year cut not pruning partitions: $pf")
    // and the executed scan must actually read one of the three partitions
    val scanned = cut.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount
    }
    assert(scanned.contains(1), s"expected 1 surviving partition, got $scanned")
  }

  test("exact dedup plan is one shuffle (partial then final aggregate)") {
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    val p = plan(ext.Dedup.exact(docs, "doc_id", "text"))
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected exactly 1 shuffle, saw $exchanges:\n$p")
    assert(p.contains("partial_"), "missing map-side partial aggregation")
  }

  test("tfidfTopK: WindowGroupLimit prunes the rank window; no extra job") {
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    val df = ext.TextAnalysis.tfidfTopK(docs, "doc_id", "text", k = 3)
    val p = plan(df)
    // the k filter must reach the window operator (map-side top-k per doc,
    // not rank-everything-then-filter)
    assert(p.contains("WindowGroupLimit"),
      s"rank window not WindowGroupLimit-pruned:\n$p")
    // n_docs comes from the persisted tf in-plan (broadcast 1-row frame),
    // never a separate count() job — the plan itself proves it: building
    // the DataFrame launched no Spark job at all
    assert(p.contains("BroadcastNestedLoopJoin"),
      "in-plan corpus-size broadcast missing")
    spark.catalog.clearCache()
  }

  test("lshTopK: candidate dedup groups on ids, never a cartesian product") {
    val emb = ext.Fixtures.plantedVectors(spark)
    val p = plan(ext.Similarity.lshTopK(emb, emb.filter(col("vec_id") < 12),
      "vec_id", "embedding", k = 5))
    assert(!p.contains("CartesianProduct"),
      "LSH candidate generation must be an equi-join on (table, signature)")
    // the dedup aggregation keys are the id pair; vectors ride as first()
    // aggregation buffers (16-byte grouping keys, not 2x64-float rows)
    assert(p.contains("first("), s"vectors not riding as first() buffers:\n$p")
  }

  test("int8 quantization: codebook broadcasts back, codes never shuffle by id") {
    val emb = Tables.load(spark, sf("sf0.001"), "embeddings")
    val p = plan(ext.Quantize.int8Codes(emb, "vec_id", "embedding"))
    assert(p.contains("BroadcastHashJoin"),
      "codebook must broadcast-join the exploded corpus")
    assert(!p.contains("SortMergeJoin"),
      "code computation must not shuffle the corpus by dim")
    spark.catalog.clearCache()
  }

  test("fuzzy join: equi-join candidates only, residual stays bucketed") {
    val names = ext.Fixtures.plantedNames(spark, n = 80)
    val p = plan(ext.FuzzyJoin.editDistancePairs(names, "id", "name", 1))
    assert(!p.contains("CartesianProduct"),
      "both the gram index and the residual path must be equi-joins")
    assert(p.contains("levenshtein"), "exact verify must be in-plan")
    spark.catalog.clearCache()
  }

  test("search: term filter reaches the scan side of the explode, top-k never sorts globally") {
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    val p = plan(ext.TextAnalysis.search(docs, "doc_id", "text",
      Seq("spark", "hash"), k = 5))
    assert(p.contains("TakeOrderedAndProject"),
      "top-k must compile to TakeOrderedAndProject")
    assert(!p.contains("CartesianProduct"))
  }

  test("pagerank iteration: per-round checkpoint keeps the final plan shallow") {
    // r15: each power iteration localCheckpoints (the iterative-lineage
    // discipline — the next round references the rank frame three times,
    // and an unmaterialized chain grows 3^iters). The contract pinned
    // here is the RESULT of that: the final plan reads the checkpointed
    // last iteration — no Exchange, no join machinery left — so plan
    // size is independent of `iters`.
    val p = plan(ext.PageRank.run(ext.Fixtures.plantedEdges(spark, 50),
      iters = 1))
    assert(p.contains("ExistingRDD"),
      "final rank frame must read the checkpointed iteration:\n" + p.take(400))
    assert(!p.contains("Exchange"),
      "no exchange may survive above the checkpointed iteration:\n" + p.take(400))
    spark.catalog.clearCache()
  }

  test("pack: prefix sum shuffles bucket-keyed pairs, offsets broadcast, no global sort") {
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    val p = plan(ext.TextAnalysis.packSequences(docs, "doc_id", "text",
      budget = 512, buckets = 16))
    assert(p.contains("hashpartitioning(__b"),
      "the per-bucket window must shuffle by bucket, not sort globally")
    assert(p.contains("BroadcastExchange"),
      "bucket offsets must broadcast back onto the corpus")
    assert(!p.contains("CartesianProduct"))
  }

  test("funnel: every step is a user-keyed equi-join — no cartesian, no NL join") {
    val ev = Tables.load(spark, sf("sf0.001"), "events")
    val p = plan(ext.EventAnalytics.funnel(ev, "user_id", "event_type",
      "ts", Seq("view", "click", "purchase")))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(400))
  }

  test("bloom prune: codegen filter above the scan, zero exchanges, no driver re-collect") {
    val li = Tables.load(spark, sf("sf0.001"), "lineitem")
      .select(col("l_partkey"), col("l_extendedprice"))
    val words = ext.BloomJoin.buildFilter(
      Tables.load(spark, sf("sf0.001"), "part").select(col("p_partkey")),
      "p_partkey", bits = 1 << 14, k = 4)
    val p = plan(ext.BloomJoin.pruneProbe(li, "l_partkey", words, 1 << 14, 4))
    assert(!p.contains("Exchange"),
      "the prune is a per-partition filter — any exchange means rows shuffled before pruning:\n" + p.take(400))
    assert(p.contains("Filter"), p.take(400))
  }

  test("histogram: one tiny stats row broadcasts; binning never shuffles the fact by value") {
    val o = Tables.load(spark, sf("sf0.001"), "orders")
      .select(col("o_orderpriority").as("g"), col("o_totalprice").as("v"))
    val p = plan(ext.Profile.histogram(o, "g", "v", bins = 20))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "global edges must ride a broadcast, not a shuffle:\n" + p.take(400))
    // exactly the final (group, bin) hash-agg exchanges; the stats pass
    // aggregates to a single row without partitioning the fact by value
    assert(!p.contains("rangepartitioning"), p.take(400))
  }

  test("linearFit/correlation: one aggregation, no join back onto the fact") {
    val o = Tables.load(spark, sf("sf0.001"), "orders")
      .select(col("o_orderpriority").as("g"),
        datediff(col("o_orderdate"), lit("1992-01-01")).cast("long").as("x"),
        col("o_totalprice").as("y"))
    for (df <- Seq(ext.Profile.linearFit(o, "g", "x", "y"),
        ext.Profile.correlation(o, "g", "x", "y"))) {
      val p = plan(df)
      assert(!p.contains("Join"), "the fit is pure aggregation:\n" + p.take(400))
      assert(p.sliding("HashAggregate".length).count(_ == "HashAggregate") >= 2,
        "partial+final aggregate expected")
    }
  }

  test("scd2 merge: version windows are key-partitioned, never single-partition") {
    val obs = spark.range(200).selectExpr("id % 20 AS k",
      "CAST(date_add(DATE'2024-01-01', CAST(id / 20 AS INT)) AS DATE) AS ts",
      "CASE WHEN id % 3 = 0 THEN 'a' ELSE 'b' END AS prio")
    val dim = graft.snapshot.Scd2.init(obs, Seq("k"), Seq("prio"), "ts")
    val p = plan(graft.snapshot.Scd2.merge(dim,
      obs.filter(col("k") < 5), Seq("k"), Seq("prio"), "ts"))
    assert(!p.contains("Exchange SinglePartition"),
      "SCD2 must never window the whole dimension on one task:\n" + p.take(400))
  }

  test("collocations: two corpus scans, vocab joins broadcast, top-k never sorts globally") {
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    val p = formatted(ext.TextAnalysis.collocations(docs, "text", 5L, 20))
    // the tokenized corpus is read for the unigram and bigram passes
    // only; totals fold from the checkpointed vocab tables
    assert(p.sliding("Scan parquet".length).count(_ == "Scan parquet") <= 2,
      "totals must not cost extra corpus scans:\n" + p.take(600))
    assert(p.contains("TakeOrderedAndProject"), p.take(400))
    assert(!p.contains("SortMergeJoin"),
      "post-cut pair table and vocab tables must broadcast:\n" + p.take(600))
  }

  test("weightedSystematic: windows bucket-partitioned, span test in codegen filter") {
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
      .select(col("doc_id"), ext.TextAnalysis.tokenCount(col("text")).as("w"))
    val p = plan(ext.Sampling.weightedSystematic(docs, "doc_id", "w", 256, 16))
    // the only single-partition work is the |buckets|-row offset frame
    val se = "Exchange SinglePartition"
    assert(p.sliding(se.length).count(_ == se) <= 1,
      "data windows must partition by bucket:\n" + p.take(600))
    assert(p.contains("BroadcastHashJoin"), "offsets must broadcast back")
  }

  test("zscore: stats broadcast back onto the scan, no fact-by-group sort join") {
    val o = Tables.load(spark, sf("sf0.001"), "orders")
      .select(col("o_orderpriority").as("g"), col("o_orderkey").as("id"),
        col("o_totalprice").as("v"))
    val p = plan(ext.Profile.zscore(o, "g", "id", "v"))
    assert(p.contains("BroadcastHashJoin"), p.take(400))
    assert(!p.contains("SortMergeJoin"),
      "per-group stats are cardinality-bounded and must broadcast:\n" + p.take(400))
  }

  test("exactQuantile: target buckets broadcast back, no full-fact sort") {
    val o = Tables.load(spark, sf("sf0.001"), "orders")
      .select(col("o_orderpriority").as("g"), col("o_totalprice").as("v"))
    val p = plan(ext.Profile.exactQuantile(o, "g", "v", 0.5))
    assert(p.contains("BroadcastHashJoin"), p.take(400))
    assert(!p.contains("SortMergeJoin"),
      "the groups-sized target-bucket table must broadcast:\n" + p.take(400))
  }

  test("bitmap setOps: word tables fold without any sort-merge machinery") {
    val rows = spark.range(5000).selectExpr(
      "CASE WHEN id % 2 = 0 THEN 'A' ELSE 'B' END AS seg", "id AS k")
    val bm = ext.Bitmap.build(rows, "seg", "k")
    val p = plan(ext.Bitmap.setOps(bm, "A", "B"))
    assert(p.contains("HashAggregate"), p.take(400))
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      p.take(400))
  }

  test("denseIds: offsets broadcast, rank windows bucket-partitioned") {
    val df = spark.range(10000).selectExpr("CAST(id AS STRING) AS key")
    val p = plan(ext.Encode.denseIds(df, "key", buckets = 16))
    val se = "Exchange SinglePartition"
    assert(p.sliding(se.length).count(_ == se) <= 1,
      "only the |buckets|-row offset frame may single-partition:\n" + p.take(600))
    assert(p.contains("BroadcastHashJoin"), p.take(400))
  }

  test("rollingDistinct: day frame broadcasts into the range join, fact scanned once") {
    val ev = Tables.load(spark, sf("sf0.001"), "events")
    val p = formatted(ext.Hll.rollingDistinct(ev, "ts", "user_id", 7))
    // registers checkpoint after ONE fact aggregation; the window merge
    // runs on the register table alone
    assert(p.sliding("Scan parquet".length).count(_ == "Scan parquet") == 0,
      "window merge must run on checkpointed registers, not rescan:\n" + p.take(600))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "tiny day frame must broadcast:\n" + p.take(600))
  }

  test("pseudonymize: pure per-row projection — zero exchanges, stays codegen'd") {
    val cust = Tables.load(spark, sf("sf0.001"), "customer")
    val p = plan(ext.Privacy.pseudonymize(cust, Seq("c_custkey", "c_name"), "s"))
    assert(!p.contains("Exchange"),
      "tokenization must never shuffle — it is a projection:\n" + p.take(600))
    // toString marks whole-stage-codegen stages with the *(n) prefix
    assert(p.contains("*(1) Project"),
      "sha2-over-concat must stay inside codegen:\n" + p.take(600))
  }

  test("PNG decode: pure per-row projection — zero exchanges over the media scan") {
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
      .select(col("doc_id").as("id"), lit(8L).as("w"), lit(6L).as("h"))
    val png = ext.Multimodal.syntheticPng(docs, "id", "w", "h")
    val p = plan(ext.Multimodal.decodePngMeta(png))
    assert(!p.contains("Exchange"),
      "container decode must never shuffle:\n" + p.take(600))
  }

  test("sketch profile: one scan, register partial-agg map-side, no row explosion past the agg") {
    val o = Tables.load(spark, sf("sf0.001"), "orders")
    val p = formatted(ext.Profile.columnsSketch(o,
      Seq("o_custkey", "o_orderstatus"), p = 8))
    // exactly one parquet scan feeds the unpivot + register aggregation
    // (count the formatted detail headers "(n) Scan parquet" — each node
    // appears once in the tree and once as a detail section)
    assert(p.linesIterator.count(_.matches("""\(\d+\) Scan parquet\s*""")) == 1,
      "sketch profile must read the fact once:\n" + p.take(800))
    assert(p.contains("HashAggregate"),
      "registers must fold through hash aggregation (map-side partial):\n" + p.take(600))
  }

  test("tile dedup: count-join on the tile key only — no cartesian, no broadcast of corpus-sized sides") {
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    val p = plan(ext.Dedup.tileDuplication(docs, "doc_id", "text"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "tile counting must stay an equi-join:\n" + p.take(800))
    // the tile-count table is corpus-sized: it must NOT be forced into a
    // broadcast (AQE may still choose one at toy scale — assert only that
    // the hash-agg partial/final split is present, the 100 TB shape)
    assert(p.contains("HashAggregate"),
      "tile counts must partial-aggregate map-side:\n" + p.take(600))
    // shuffle/join keys are xxhash64(tile), 8 bytes — the ~50–100-byte
    // tile TEXT must never be the count-shuffle key (~10× wire volume)
    assert(p.contains("xxhash64"),
      "tile counting must key on xxhash64(tile), not tile text:\n" + p.take(800))
    assert(!p.contains("hashpartitioning(__tile"),
      "tile text must not be a shuffle key:\n" + p.take(800))
  }

  test("window dedup: only 8-byte window hashes cross the shuffle, never window text") {
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    val p = plan(ext.Dedup.windowDuplication(docs, "doc_id", "text",
      windowWords = 8, stride = 2))
    assert(p.contains("xxhash64"),
      "window counting must key on xxhash64(window):\n" + p.take(800))
    assert(!p.contains("hashpartitioning(__win,") &&
      !p.contains("hashpartitioning(__win#"),
      "window text must not be a shuffle key:\n" + p.take(800))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }

  test("line dedup: line-hash keys only, no cartesian, map-side partials") {
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    val p = plan(ext.Dedup.lineDedup(docs, "doc_id", "text"))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "line counting must stay an equi-join:\n" + p.take(800))
    assert(p.contains("xxhash64"),
      "line counting must key on xxhash64(line), not line text:\n" +
        p.take(800))
    assert(!p.contains("hashpartitioning(__line"),
      "line text must not be a shuffle key:\n" + p.take(800))
    assert(p.contains("HashAggregate"))
  }

  test("pii scrub: one per-row projection, zero shuffles; regex-only chain codegens") {
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    val p = plan(docs.select(col("doc_id"),
      ext.Pii.scrub(col("text")).as("t")))
    assert(!p.contains("Exchange"),
      "the scrub chain must add no shuffle:\n" + p.take(600))
    // the full chain includes the native Luhn scanner (CodegenFallback
    // by design), which drops its projection out of codegen; the three
    // regexp stages alone must stay inside a codegen star
    val regexOnly = plan(docs.select(col("doc_id"),
      ext.Pii.maskIps(ext.Pii.maskPhones(ext.Pii.maskEmails(col("text"))))
        .as("t")))
    assert(regexOnly.linesIterator.exists(l =>
      l.contains("*(") && l.contains("Project")),
      "regexp-only masking must stay inside codegen:\n" + regexOnly.take(600))
  }

  test("dsir: selection is TakeOrderedAndProject, never a global sort") {
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    val df = ext.Sampling.dsirSelect(docs, "doc_id", "text",
      col("lang") === "en", n = 100)
    val p = plan(df)
    assert(p.contains("TakeOrderedAndProject"),
      "top-n must be per-partition heads + driver merge:\n" + p.take(800))
    assert(!p.contains("CartesianProduct"),
      "the scalar totals row must broadcast, not cross-join NL:\n" + p.take(800))
  }

  test("shuffleShards: seq windows are shard-partitioned, never single-partition") {
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
      .select(col("doc_id"))
    val p = plan(ext.Sampling.shuffleShards(docs, "doc_id", numShards = 8))
    assert(!p.contains("SinglePartition"),
      "a global row_number would serialize the export:\n" + p.take(800))
    assert(p.contains("Window"), "seq must come from a partitioned window")
  }

  test("gopher metrics add zero shuffles: one native per-row pass") {
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    val p = plan(ext.Repetition.metrics(docs, "doc_id", "text"))
    assert(!p.contains("Exchange"),
      "within-document metrics must not move data:\n" + p.take(800))
    assert(p.contains("repetition_stats"),
      "expected the native single-pass expression:\n" + p.take(600))
  }

  test("lm score: the backoff ladder resolves via equi-joins only") {
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    val m = ext.NgramLm.train(docs.filter(col("lang") === "en"), "text")
    val p = plan(ext.NgramLm.score(m, docs, "doc_id", "text"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "count-table probes must be key joins (AQE picks the strategy):\n" +
        p.take(800))
    assert(p.contains("partial_"),
      "per-doc sums must partial-aggregate map-side:\n" + p.take(600))
    spark.catalog.clearCache()
  }

  test("lr predict adds zero shuffles: scoring is a pure projection") {
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
      .select(col("doc_id"), (length(col("text")) / lit(100.0)).as("f1"))
    val p = plan(ext.LogReg.predict(docs, Seq("f1"), Array(0.1, 0.2)))
    assert(!p.contains("Exchange"),
      "sigmoid scoring must not move data:\n" + p.take(800))
  }

  test("mixtureSampleTokens: prefix windows are (stratum, bucket)-partitioned") {
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val p = plan(ext.Sampling.mixtureSampleTokens(docs, "doc_id", "source",
      "n_tokens", Seq("src0" -> 0.5, "src2" -> 0.25), totalTokens = 1024))
    // the data-scale cumsum must never serialize a whole stratum; the
    // only single-partition window is over the strata × buckets offsets
    // frame, which is bounded — assert the data window's partition keys
    assert(p.contains("partitionBy=[source") || p.contains("hashpartitioning(source"),
      "the running sum must partition by (stratum, bucket):\n" + p.take(1200))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"))
  }

  test("ivfAdcTopKRefined: candidates broadcast into the corpus scan") {
    val emb = Tables.load(spark, sf("sf0.001"), "embeddings")
    val p = plan(ext.Pq.ivfAdcTopKRefined(emb, "vec_id", "embedding",
      queryIds = Seq(0L, 1L), k = 5, refine = 2))
    // the exact re-rank must fetch vectors via a broadcast join — the
    // corpus never shuffles for the refine stage
    assert(p.contains("BroadcastHashJoin"),
      "candidate fetch must broadcast:\n" + p.take(1200))
    assert(!p.contains("CartesianProduct"))
    spark.catalog.clearCache()
  }

  test("pca covariance: matrix-keyed shuffle with map-side partials, means broadcast") {
    val emb = Tables.load(spark, sf("sf0.001"), "embeddings")
    // the corpus-sized half: pair products must collapse BEFORE the
    // exchange (partial aggregation) — the shuffle carries 2080 keys
    val pm = plan(ext.Pca.moments(emb, "vec_id", "embedding"))
    assert(pm.contains("partial_sum") || pm.contains("Partial"),
      "pair products must combine map-side:\n" + pm.take(1200))
    // the derivation half runs over the checkpointed matrix-scale frame:
    // the 64-row mean slices must broadcast, nothing corpus-sized joins
    val p = plan(ext.Pca.covariance(emb, "vec_id", "embedding"))
    assert(p.contains("BroadcastHashJoin"),
      "dim means must broadcast:\n" + p.take(1200))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("rocAuc: rank prefix windows are bucket-partitioned, offsets broadcast") {
    val scored = Tables.load(spark, sf("sf0.001"), "documents")
      .select(col("doc_id"),
        pmod(xxhash64(col("doc_id")), lit(1000000L)).as("s"),
        (col("doc_id") % 3 === 0).cast("long").as("y"))
    val p = plan(ext.Eval.rocAuc(scored, "s", "y", buckets = 64))
    // the distinct-score running sum must never serialize globally: the
    // window partitions by the range bucket, offsets ride a broadcast
    assert(p.contains("partitionBy=[bucket") ||
      p.contains("hashpartitioning(bucket"),
      "the rank prefix must partition by bucket:\n" + p.take(1200))
    assert(p.contains("BroadcastHashJoin"),
      "bucket offsets must broadcast:\n" + p.take(1200))
    assert(!p.contains("CartesianProduct"))
  }

  test("canonicalizeUrl: pure projection, zero shuffles; dedup adds one agg + key join") {
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
      .select(col("doc_id"), concat(lit("https://h"),
        (col("doc_id") % 97).cast("string"), lit(".com/p")).as("url"))
    val p0 = plan(docs.select(
      ext.UrlFilter.canonicalizeUrl(col("url")).as("c")))
    assert(!p0.contains("Exchange"),
      "canonicalization must ride the scan:\n" + p0.take(800))
    val p1 = plan(ext.UrlFilter.annotateUrlDup(docs, "doc_id", "url"))
    assert(!p1.contains("CartesianProduct") &&
      !p1.contains("BroadcastNestedLoopJoin"),
      "keeper lookup must be a key join:\n" + p1.take(800))
    assert(p1.contains("partial_"),
      "keeper min must partial-aggregate map-side:\n" + p1.take(600))
  }

  test("decontaminateSpans: 8-byte hash keys only, no cartesian") {
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    val bench = docs.limit(5).select(col("text").as("btext"))
    val p = plan(ext.Dedup.decontaminateSpans(docs, "doc_id", "text",
      bench, "btext"))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "bench probe must be an equi-join:\n" + p.take(800))
    assert(p.contains("xxhash64"),
      "tile/window keys must be hashed, never the text:\n" + p.take(600))
  }

  test("domain screen: one profile hash-agg with map-side partials, key join back") {
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
      .select(col("doc_id"), concat(lit("https://h"),
        (col("doc_id") % 97).cast("string"), lit(".com/p")).as("url"),
        (col("doc_id") % 1000).as("score_micro"),
        (col("doc_id") % 7 === 0).as("flagged"))
    val p = plan(ext.UrlFilter.annotateDomainScreen(docs, "doc_id", "url",
      "score_micro", "flagged", 500000L, 500000L))
    assert(p.contains("partial_"),
      "profile sums must partial-aggregate map-side:\n" + p.take(600))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "block verdicts join back by host:\n" + p.take(800))
  }

  test("wordpiece encodeDocs: native greedy pass, types resolve via equi-joins") {
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    val enc = ext.Wordpiece.encodeDocs(docs, "doc_id", "text",
      Seq("s", "t", "a") ++ ('a' to 'z').map(c => s"##$c"))
    val p = formatted(enc)
    assert(p.contains("wordpiece_encode"),
      "expected the native greedy segmenter:\n" + p.take(600))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "type stats re-join documents by word:\n" + p.take(800))
  }

  test("word entropy adds zero shuffles: one native per-row pass") {
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    val p = plan(docs.select(col("doc_id"),
      ext.TextAnalysis.wordEntropy(col("text")).as("e")))
    assert(!p.contains("Exchange"),
      "the entropy pass must add no shuffle:\n" + p.take(600))
  }

  test("textBigramFeatures: one doc-keyed hash-agg with map-side partials") {
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    val p = plan(ext.FeatureHash.textBigramFeatures(
      docs, "doc_id", "text", buckets = 8))
    assert(p.contains("partial_"),
      "bucket pivot must combine map-side:\n" + p.take(800))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "featurization is explode + one hash-agg, never a join:\n" + p.take(800))
  }

  test("clusterQuality: the scorecard pass carries the book as a literal — no join at all") {
    // r15: the centroid book is a collected k×dim model riding as an
    // array literal (the KMeans driver-book discipline), so the
    // per-point distance pass is a pure projection over the persisted
    // points — stronger than the old broadcast-join pin.
    val emb = Tables.load(spark, sf("sf0.001"), "embeddings")
    val p = plan(ext.KMeans.clusterQuality(emb, "vec_id", "embedding",
      k = 8, iters = 2))
    assert(!p.contains("Join"),
      "no join of any kind in the scorecard pass:\n" + p.take(800))
    assert(p.contains("HashAggregate"),
      "per-cluster sums must hash-aggregate:\n" + p.take(800))
    spark.catalog.clearCache()
  }

  test("recallAtK: rows-not-corpus — the overlap join is AQE-planned") {
    val a = spark.range(40).select((col("id") / 10).cast("long").as("qid"),
      col("id").as("nid"))
    val p = plan(ext.Eval.recallAtK(a, a, "qid", "nid"))
    assert(!p.contains("CartesianProduct"),
      "the scorecard must equi-join on (q, n):\n" + p.take(600))
  }

  test("image/audio content stats: one native pass, zero shuffles") {
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    val png = ext.Multimodal.syntheticGrayPngCorpus(docs, "doc_id",
      col("doc_id") % 5, lit(16), lit(12), lit(1))
    val p0 = plan(ext.Multimodal.imageContentStats(png))
    assert(!p0.contains("Exchange"),
      "pixel decode + hashes must ride the scan:\n" + p0.take(800))
    val wav = ext.Multimodal.syntheticPcmCorpus(docs, "doc_id",
      col("doc_id") % 5, lit(128), lit(8000))
    val p1 = plan(ext.Multimodal.audioContentStats(wav))
    assert(!p1.contains("Exchange"),
      "sample decode must ride the scan:\n" + p1.take(800))
  }

  test("binaryExactDedup: one digest hash-agg, payloads never shuffle") {
    val docs = Tables.load(spark, sf("sf0.001"), "documents")
    val png = ext.Multimodal.syntheticGrayPngCorpus(docs, "doc_id",
      col("doc_id") % 5, lit(16), lit(12), lit(0))
    val p = plan(ext.Multimodal.binaryExactDedup(png))
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected exactly 1 shuffle, saw $exchanges:\n$p")
    assert(p.contains("partial_"),
      "digest groups must partial-aggregate map-side:\n" + p.take(600))
    // the shuffle key is the digest — the binary payload is projected
    // away BEFORE the exchange (the content column never shuffles)
    assert(p.linesIterator.filter(_.contains("Exchange"))
      .forall(!_.contains("content#")),
      "payload bytes must not appear in the exchange:\n" + p.take(800))
  }

  test("Hamming64.pairs: banding tables equi-join, never a cross product") {
    val fps = spark.range(200).select(col("id"),
      (col("id") * 2654435761L).as("fp"))
    val p = plan(ext.Hamming64.pairs(fps, "id", "fp", maxHamming = 4))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "candidates must come from the (table, key) equi-join:\n" + p.take(800))
  }

  test("bloom readEquals: the equality predicate pushes into the pruned scan") {
    val wh = new snapshot.Warehouse(spark,
      TempDirs.scratchDir("plan_bloom").toString)
    val df = spark.range(2000).select(col("id").as("k"),
      lit(2020L).as("year"))
    wh.append("f", df)
    wh.optimize("f", Seq("k"), targetFiles = 4)
    wh.collectBloom("f", "k")
    val p = formatted(wh.readEquals("f", "k", 123L).get)
    val pushed = p.linesIterator.find(_.contains("PushedFilters"))
    assert(pushed.exists(_.contains("EqualTo(k,123)")),
      "row predicate must reach the parquet scan even after the file skip:\n" +
        pushed.getOrElse(p.take(800)))
  }
}
