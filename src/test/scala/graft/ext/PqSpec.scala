package graft.ext

import graft.SparkTestBase

import org.apache.spark.sql.functions._

class PqSpec extends SparkTestBase {
  import spark.implicits._

  /** 3 planted clusters per SUBSPACE, independently: the first half of
    * each vector clusters by i%3 (offsets 0/10/20), the second half by
    * i%2 (offsets 0/30) — so codes must recover (i%3-ish, i%2-ish)
    * structure and cluster-mates share codes. */
  private lazy val planted = {
    val rnd = new scala.util.Random(17)
    (0 until 90).map { i =>
      val lo = Array.fill(8)((i % 3) * 10.0 + rnd.nextGaussian() * 0.1)
      val hi = Array.fill(8)((i % 2) * 30.0 + rnd.nextGaussian() * 0.1)
      (i.toLong, (lo ++ hi).map(_.toFloat).toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("codes recover the independent per-subspace planted structure") {
    // k=4 > 3 planted groups: Lloyd from the md5 seed draw may split a
    // planted group (a local optimum) but must never MERGE two — so the
    // invariant is: distinct planted groups get disjoint code sets
    val cb = Pq.train(planted, "vec_id", "embedding", m = 2, k = 4, iters = 5)
      .localCheckpoint(true)
    val codes = Pq.encode(planted, "vec_id", "embedding", cb, m = 2)
      .select(col("vec_id"), col("code")(0).as("c0"), col("code")(1).as("c1"))
      .as[(Long, Long, Long)].collect().toSeq
    val g0 = codes.groupBy(_._1 % 3).values.map(_.map(_._2).toSet).toSeq
    val g1 = codes.groupBy(_._1 % 2).values.map(_.map(_._3).toSet).toSeq
    def disjoint(gs: Seq[Set[Long]]) = (for {
      (a, i) <- gs.zipWithIndex; (b, j) <- gs.zipWithIndex if i < j
    } yield (a & b).isEmpty).forall(identity)
    assert(disjoint(g0), s"subspace 0 merged planted groups: $g0")
    assert(disjoint(g1), s"subspace 1 merged planted groups: $g1")
  }

  test("encode is shuffle-free; adcTopK compiles to TakeOrderedAndProject") {
    val cb = Pq.train(planted, "vec_id", "embedding", m = 2, k = 3, iters = 2)
      .localCheckpoint(true)
    val enc = Pq.encode(planted, "vec_id", "embedding", cb, m = 2)
    val encPlan = enc.queryExecution.executedPlan.toString()
    // the k×m codebook pack may exchange its tiny frame; the CORPUS must
    // never shuffle (same contract as KMeans assignment)
    assert(!encPlan.contains("hashpartitioning(vec_id"),
      "encoding must not shuffle the corpus:\n" + encPlan.take(500))
    val top = Pq.adcTopK(enc, "vec_id", cb, Seq.fill(16)(0.0), k = 5)
    val topPlan = top.queryExecution.executedPlan.toString()
    assert(topPlan.contains("TakeOrderedAndProject"), topPlan.take(500))
    spark.catalog.clearCache()
  }

  test("adcTopK matches a Scala brute-force ADC ranking exactly") {
    val cb = Pq.train(planted, "vec_id", "embedding", m = 2, k = 3, iters = 3)
      .localCheckpoint(true)
    val enc = Pq.encode(planted, "vec_id", "embedding", cb, m = 2)
    val q = planted.filter(col("vec_id") === 0).select(col("embedding"))
      .head.getSeq[Float](0).map(_.toDouble)
    val got = Pq.adcTopK(enc, "vec_id", cb, q, k = 7)
      .as[(Long, Double)].collect().toSeq
    // brute force: same LUT arithmetic over collected codes
    val books = cb.groupBy(col("sub"), col("cid"))
      .agg(sort_array(collect_list(struct(col("dim"), col("c")))).as("p"))
      .select(col("sub"), col("cid"),
        transform(col("p"), x => x.getField("c")).as("cvec"))
      .as[(Long, Long, Seq[Double])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val codes = enc.as[(Long, Seq[Long])].collect()
    val brute = codes.map { case (id, code) =>
      val dist = code.zipWithIndex.map { case (cid, s) =>
        val cv = books((s.toLong, cid))
        val qs = q.slice(s * 8, s * 8 + 8)
        qs.zip(cv).foldLeft(0.0) { case (a, (x, y)) => a + (x - y) * (x - y) }
      }.sum
      (id, dist)
    }.sortBy(r => (r._2, r._1)).take(7).toSeq
    assert(got == brute)
    // the query's own planted cluster pair (i%3==0, i%2==0) dominates
    assert(got.map(_._1).forall(i => i % 3 == 0 && i % 2 == 0))
    spark.catalog.clearCache()
  }

  test("ivfAdcTopK: dists match full ADC, candidates honor probed lists, self at rank 1") {
    val got = Pq.ivfAdcTopK(planted, "vec_id", "embedding",
      queryIds = Seq(0L, 1L), k = 5)
      .select("qid", "nid", "rank", "dist")
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3)).toMap
    assert(got.keySet == Set(0L, 1L))
    got.foreach { case (q, rows) =>
      assert(rows.map(_._3).toSeq == (1L to rows.length), s"qid $q ranks")
      // the query's own coarse list is always its rank-1 probe, and its
      // PQ self-distance is the cell minimum on this planted layout
      assert(rows.head._2 == q, s"qid $q self hit")
    }
    // every returned dist equals the FULL corpus ADC distance for that
    // (query, neighbor) — IVF only prunes candidates, never rescores
    val cb = Pq.train(planted, "vec_id", "embedding", m = 2, k = 8, iters = 2)
      .localCheckpoint(true)
    val enc = Pq.encode(planted, "vec_id", "embedding", cb, m = 2)
    Seq(0L, 1L).foreach { q =>
      val qv = planted.filter(col("vec_id") === q).select(col("embedding"))
        .head.getSeq[Float](0).map(_.toDouble)
      val full = Pq.adcTopK(enc, "vec_id", cb, qv, k = 90)
        .as[(Long, Double)].collect().toMap
      got(q).foreach { case (_, nid, _, d) =>
        assert(math.abs(full(nid) - d) == 0.0, s"qid $q nid $nid") }
    }
    // determinism: a rerun reproduces the ranking exactly
    val again = Pq.ivfAdcTopK(planted, "vec_id", "embedding",
      queryIds = Seq(0L, 1L), k = 5)
      .select("qid", "nid", "rank", "dist")
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3)).toMap
    assert(got(0L).toSeq == again(0L).toSeq && got(1L).toSeq == again(1L).toSeq)
    spark.catalog.clearCache()
  }

  test("ivfAdcTopKRes: prune-only vs full probe, self at rank 1, deterministic") {
    val got = Pq.ivfAdcTopKRes(planted, "vec_id", "embedding",
      queryIds = Seq(0L, 1L), k = 5)
      .select("qid", "nid", "rank", "dist")
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3)).toMap
    assert(got.keySet == Set(0L, 1L))
    got.foreach { case (q, rows) =>
      assert(rows.map(_._3).toSeq == (1L to rows.length), s"qid $q ranks")
      assert(rows.map(_._4).toSeq == rows.map(_._4).sorted.toSeq,
        s"qid $q dist order")
      // self's residual re-quantizes near-exactly on the planted layout
      assert(rows.head._2 == q, s"qid $q self hit")
    }
    // nprobe = nlist probes EVERY list -> the unpruned residual-ADC
    // ranking; the nprobe=2 result must be a dist-identical subset
    // (training is nprobe-independent; IVF prunes, never rescores —
    // a row's LUT is keyed by its own fixed coarse list)
    val full = Pq.ivfAdcTopKRes(planted, "vec_id", "embedding",
      queryIds = Seq(0L, 1L), k = 90, nlist = 8, nprobe = 8)
      .select("qid", "nid", "dist")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    got.foreach { case (q, rows) =>
      rows.foreach { case (_, nid, _, d) =>
        assert(full((q, nid)) == d, s"qid $q nid $nid rescored") }
    }
    // determinism: a rerun reproduces the ranking exactly
    val again = Pq.ivfAdcTopKRes(planted, "vec_id", "embedding",
      queryIds = Seq(0L, 1L), k = 5)
      .select("qid", "nid", "rank", "dist")
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3)).toMap
    assert(got(0L).toSeq == again(0L).toSeq && got(1L).toSeq == again(1L).toSeq)
    spark.catalog.clearCache()
  }

  test("ivfAdcTopKRefined: exact distances, self at dist 0 rank 1, subset of ADC candidates") {
    val got = Pq.ivfAdcTopKRefined(planted, "vec_id", "embedding",
      queryIds = Seq(0L, 1L), k = 5, refine = 3)
      .select("qid", "nid", "rank", "dist")
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3)).toMap
    assert(got.keySet == Set(0L, 1L))
    val vecs = planted.as[(Long, Seq[Float])].collect()
      .map { case (id, v) => id -> v.map(_.toDouble) }.toMap
    got.foreach { case (q, rows) =>
      assert(rows.map(_._3).toSeq == (1L to rows.length))
      // refine scores with TRUE distances: self is exactly 0 at rank 1
      assert(rows.head._2 == q && rows.head._4 == 0.0)
      rows.foreach { case (_, nid, _, d) =>
        val brute = vecs(q).zip(vecs(nid))
          .foldLeft(0.0) { case (a, (x, y)) => a + (x - y) * (x - y) }
        assert(d == brute, s"qid $q nid $nid: $d != $brute")
      }
    }
    // every refined hit came from the ADC candidate pool (k*refine)
    val pool = Pq.ivfAdcTopKRes(planted, "vec_id", "embedding",
      queryIds = Seq(0L, 1L), k = 15)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    got.foreach { case (q, rows) =>
      rows.foreach { case (_, nid, _, _) => assert(pool((q, nid))) } }
    spark.catalog.clearCache()
  }

  test("ResIndex: frozen re-encode parity, save/load roundtrip, frozen ingestion") {
    val even = planted.filter(col("vec_id") % 2 === 0)
    val odd = planted.filter(col("vec_id") % 2 === 1)
    val idx = Pq.buildIndexRes(even, "vec_id", "embedding")
    // re-encoding the training set against the frozen books reproduces
    // the build's own entries exactly (encode is a pure function)
    val reenc = Pq.addBatchRes(idx, even, "vec_id", "embedding")
      .select("vec_id", "__ccid", "code")
      .as[(Long, Long, Seq[Long])].collect().toSet
    val built = idx.entries.select("vec_id", "__ccid", "code")
      .as[(Long, Long, Seq[Long])].collect().toSet
    assert(reenc == built)
    // ingest the odd half, query from the combined index
    val full = idx.copy(entries =
      idx.entries.unionByName(Pq.addBatchRes(idx, odd, "vec_id", "embedding")))
    val qs = planted.filter(col("vec_id").isin(0L, 1L))
      .select(col("vec_id").as("qid"),
        transform(col("embedding"), x => x.cast("double")).as("__qv"))
    val got = Pq.searchIndexRes(full, qs, "vec_id", k = 5)
      .select("qid", "nid", "rank", "dist")
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._3)).toSeq
    assert(got.map(_._1).toSet == Set(0L, 1L))
    // save/load roundtrip answers identically
    val dir = graft.TempDirs.scratchDir("pq_idx").toString
    Pq.save(full, dir)
    val loaded = Pq.load(spark, dir)
    val again = Pq.searchIndexRes(loaded, qs, "vec_id", k = 5)
      .select("qid", "nid", "rank", "dist")
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._3)).toSeq
    assert(got == again)
    spark.catalog.clearCache()
  }

  test("ResIndex maintenance: tombstones hide ids, top-k refills, compaction identical") {
    val even = planted.filter(col("vec_id") % 2 === 0)
    val idx = Pq.buildIndexRes(even, "vec_id", "embedding")
    val qs = planted.filter(col("vec_id").isin(0L, 2L))
      .select(col("vec_id").as("qid"),
        transform(col("embedding"), x => x.cast("double")).as("__qv"))
    val before = Pq.searchIndexRes(idx, qs, "vec_id", k = 5)
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._3)).toSeq
    // delete each query's own top-1 (itself): it must vanish AND the
    // top-k must refill from survivors (still k rows per query)
    val victims = before.filter(_._3 == 1L).map(_._2)
    val tombed = Pq.deleteRes(idx,
      victims.toDF("vec_id"), "vec_id")
    val after = Pq.searchIndexRes(tombed, qs, "vec_id", k = 5)
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._3)).toSeq
    assert(after.forall(r => !victims.contains(r._2)))
    assert(after.count(_._1 == 0L) == 5 && after.count(_._1 == 2L) == 5)
    // survivors keep their relative order with ranks recomputed; the
    // 5th slot REFILLS with a candidate `before` never surfaced
    before.groupBy(_._1).foreach { case (q, rs) =>
      val surv = rs.sortBy(_._3).filterNot(r => victims.contains(r._2))
        .zipWithIndex.map { case (r, i) => (q, r._2, i + 1L, r._4) }
      val afterQ = after.filter(_._1 == q).sortBy(_._3)
      assert(afterQ.take(surv.size) == surv, s"qid $q survivor order")
      assert(afterQ.size == 5 && !rs.exists(_._2 == afterQ.last._2),
        s"qid $q refill")
    }
    // physical compaction answers identically with no tombstone set
    val compacted = Pq.compactRes(tombed, "vec_id")
    assert(compacted.tombstones.isEmpty)
    val again = Pq.searchIndexRes(compacted, qs, "vec_id", k = 5)
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._3)).toSeq
    assert(again == after)
    // save/load carries the tombstone set
    val dir = graft.TempDirs.scratchDir("pq_tomb").toString
    Pq.save(tombed, dir)
    val loaded = Pq.load(spark, dir)
    val viaLoad = Pq.searchIndexRes(loaded, qs, "vec_id", k = 5)
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._3)).toSeq
    assert(viaLoad == after)
    spark.catalog.clearCache()
  }

  test("retrainSignal: in-distribution batch quiet, shifted batch fires") {
    // this fixture's clusters are PARITY-keyed (hi-subspace = i % 2), so
    // the in-distribution batch must be the training half itself — its
    // list mass mirrors the entries exactly, PSI = 0 by construction
    val even = planted.filter(col("vec_id") % 2 === 0)
    val idx = Pq.buildIndexRes(even, "vec_id", "embedding")
    val quiet = Pq.retrainSignal(idx, even, "vec_id", "embedding")
      .select("psi_pico", "retrain").as[(Long, Boolean)].collect()
    assert(quiet.forall(r => r._1 == 0L && !r._2),
      s"identical batch fired: ${quiet.head._1} pico")
    val shifted = even.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double") + lit(100.0))
        .as("embedding"))
    val loud = Pq.retrainSignal(idx, shifted, "vec_id", "embedding")
      .select("psi_pico", "retrain").as[(Long, Boolean)].collect()
    assert(loud.forall(_._2), s"shifted batch quiet: ${loud.head._1} pico")
    spark.catalog.clearCache()
  }

  test("maybeRetrain: quiet keeps the index, shift rebuilds, empty never fires") {
    val even = planted.filter(col("vec_id") % 2 === 0)
    val idx = Pq.buildIndexRes(even, "vec_id", "embedding")
    val (same, fired0) = Pq.maybeRetrain(idx, even, even,
      "vec_id", "embedding")
    assert(!fired0 && (same eq idx), "identical batch must not rebuild")
    val (still, firedE) = Pq.maybeRetrain(idx, even,
      even.filter(col("vec_id") < 0), "vec_id", "embedding")
    assert(!firedE && (still eq idx), "empty batch must not fire")
    val shifted = even.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double") + lit(100.0))
        .as("embedding"))
    val corpus = even.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
      .unionByName(shifted.select(col("vec_id") + 10000L, col("embedding"))
        .toDF("vec_id", "embedding"))
    val (rebuilt, fired1) = Pq.maybeRetrain(idx, corpus, shifted,
      "vec_id", "embedding")
    assert(fired1 && !(rebuilt eq idx))
    // default geometry args INHERIT from the live index, not library
    // defaults: the rebuild reproduces the serving shape
    def geo(i: Pq.ResIndex) = (
      i.coarse.select("cid").distinct.count(),
      i.books.select("sub").distinct.count(),
      i.books.select("sub", "cid").distinct.count())
    assert(geo(rebuilt) == geo(idx), s"${geo(rebuilt)} != ${geo(idx)}")
    // the rebuilt index serves the shifted region its old coarse book
    // couldn't: a shifted query's top-1 is itself
    val qs = shifted.filter(col("vec_id") === 0L)
      .select((col("vec_id") + 10000L).as("qid"), col("embedding").as("__qv"))
    val top = Pq.searchIndexRes(rebuilt, qs, "vec_id", k = 1)
      .select("nid").as[Long].head()
    assert(top == 10000L)
    spark.catalog.clearCache()
  }

  test("residual codes quantize at noise scale on the planted layout") {
    // the point of residual encoding: codewords model the within-list
    // displacement, not the absolute position. On the planted layout the
    // displacement is N(0, 0.1²) per dim, so a query's residual-ADC
    // self-distance must sit at noise scale (≪ 1), orders of magnitude
    // under the planted cell separation (offsets 10/20/30 → ≥ 100 in
    // squared distance). (No per-instance residual-vs-raw inequality is
    // asserted — Lloyd local optima can break it on any single draw.)
    // self may lose rank 1 to a same-cell near-duplicate whose code lands
    // closer (ADC self-distance is the quantization error, not 0), so the
    // contract is: self in the top-3, at noise-scale distance
    val ids = (0L until 90L by 7L).toSeq
    val res = Pq.ivfAdcTopKRes(planted, "vec_id", "embedding",
      queryIds = ids, k = 3)
      .select("qid", "nid", "dist")
      .as[(Long, Long, Double)].collect()
      .collect { case (q, n, d) if q == n => d }
    assert(res.length == ids.length, "every query must self-hit in its top-3")
    assert(res.forall(_ < 1.0),
      s"residual self-error must be noise-scale: ${res.toSeq}")
    spark.catalog.clearCache()
  }
}
