package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Dedup family on PLANTED near-duplicates: the real corpus has no labels,
  * so correctness = recovering known mutated copies, and agreement between
  * the approximate (MinHash/SimHash) and exact (inverted-index Jaccard)
  * paths. */
class DedupSpec extends SparkTestBase {
  import spark.implicits._

  /** 40 random base docs + 10 near-dup copies (one word in ~30 changed)
    * + 2 exact dups. Fixed seed. */
  private lazy val corpus = {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omi", "pi")
    def doc() = Seq.fill(80)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val bases = (0 until 40).map(i => (i.toLong, doc()))
    val nearDups = (0 until 10).map { i =>
      val (bid, text) = bases(i)
      val words = text.split(" ")
      val idx = rnd.nextInt(words.length)
      words(idx) = "MUTATED"
      (100L + i, words.mkString(" "))
    }
    val exactDups = Seq((200L, bases(20)._2), (201L, bases(21)._2))
    (bases ++ nearDups ++ exactDups).toDF("doc_id", "text")
  }

  test("exact dedup collapses exact copies only") {
    val d = Dedup.exact(corpus, "doc_id", "text")
    assert(d.count() == 50) // 52 docs - 2 exact copies
    assert(d.agg(sum("n_copies")).as[Long].collect()(0) == 52)
  }

  test("exact ngram Jaccard finds every planted pair (and exact dups at 1.0)") {
    val pairs = Dedup.ngramJaccardPairs(corpus, "doc_id", "text",
      n = 3, threshold = 0.5)
      .select("i", "j").as[(Long, Long)].collect().toSet
    val expected = (0 until 10).map(i => (i.toLong, 100L + i)).toSet ++
      Set((20L, 200L), (21L, 201L))
    assert(expected.subsetOf(pairs),
      s"missing: ${expected -- pairs}")
  }

  test("minhash+LSH recovers the same pairs as exact Jaccard at 0.8") {
    val exact = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", 3, 0.8)
      .select("i", "j").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashPairs(corpus, "doc_id", "text", 3, 128, 32, 0.8)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    assert(lsh == exact)
  }

  test("simhash recovers the same pairs as exact Jaccard at 0.9") {
    val exact = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", 3, 0.9)
      .select("i", "j").as[(Long, Long)].collect().toSet
    val sim = Dedup.simhashPairs(corpus, "doc_id", "text", 3, 12, 0.9)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    assert(sim == exact)
  }

  test("df-cap bounds candidates under a corpus-wide hot shingle") {
    // every doc opens with the same boilerplate prefix -> its shingles have
    // df = n; with the cap those shingles leave the candidate index, so
    // unrelated docs generate NO candidates, while planted near-dups are
    // still found through their rare content shingles.
    val rnd = new scala.util.Random(23)
    val vocab = Vector.tabulate(2000)(i => s"v$i")
    val boiler = "terms of service apply to all content here"
    def doc() = boiler + " " + Seq.fill(40)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val bases = (0 until 60).map(i => (i.toLong, doc()))
    val dup = (500L, bases(0)._2.replaceFirst("v[0-9]+$", "MUT"))
    val corpus = (bases :+ dup).toDF("doc_id", "text")
    // threshold 0 makes the result set == the candidate set
    val capped = Dedup.ngramJaccardPairs(corpus, "doc_id", "text",
      n = 3, threshold = 0.0, maxDf = Some(5)).count()
    val uncapped = Dedup.ngramJaccardPairs(corpus, "doc_id", "text",
      n = 3, threshold = 0.0, maxDf = None).count()
    assert(uncapped == 61L * 60 / 2) // hot shingles pair everything
    assert(capped <= 5, s"capped candidates: $capped")
    // the planted near-dup pair still surfaces at a real threshold
    val found = Dedup.ngramJaccardPairs(corpus, "doc_id", "text",
      n = 3, threshold = 0.8, maxDf = Some(5))
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(found.contains((0L, 500L)), s"planted pair lost: $found")
  }

  test("simhash candidate volume grows ~linearly with corpus size") {
    // K disjoint batches of distinct random docs (large vocab -> background
    // similarity ~0) with 10% planted near-dups: candidate count must track
    // corpus size, not corpus^2 (byte-value banding scaled ~n^2/32 here).
    val rnd = new scala.util.Random(13)
    val vocab = Vector.tabulate(4000)(i => s"w$i")
    def doc() = Seq.fill(80)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    def corpusOf(n: Int) = {
      val bases = (0 until n).map(i => (i.toLong, doc()))
      val dups = (0 until n / 10).map { i =>
        val words = bases(i)._2.split(" ")
        words(rnd.nextInt(words.length)) = "MUTATED"
        (1000000L + i, words.mkString(" "))
      }
      (bases ++ dups).toDF("doc_id", "text")
    }
    val counts = Seq(250, 500, 1000).map { n =>
      val sh = corpusOf(n).select(col("doc_id").as("id"),
        TextAnalysis.shingles(col("text"), 3).as("sh"))
      val keyed = Dedup.simhashKeys(sh, minhashAssistMaxShingles = 512)
      val c = Dedup.simhashCandidates(keyed).count()
      keyed.unpersist()
      n -> c
    }
    counts.foreach { case (n, c) =>
      assert(c <= 3L * n, s"candidates $c superlinear at corpus size $n")
    }
  }

  test("connected components resolve non-transitive near-dup chains") {
    // a~b and b~c similar, a~c NOT a pair: one cluster of 3 under the
    // minimum id; unrelated pair (10,11) stays its own cluster
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("i", "j")
    val cc = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    // a longer chain still converges (diameter 5)
    val chain = (1L to 5L).map(k => (k, k + 1)).toDF("i", "j")
    val roots = Dedup.connectedComponents(chain)
      .as[(Long, Long)].collect().map(_._2).toSet
    assert(roots == Set(1L))
  }

  test("simhash64 expression: deterministic, order-insensitive on sets") {
    val a = Seq(Seq("x", "y", "z")).toDF("arr")
      .select(SimHash64(col("arr"))).as[Long].collect()(0)
    val b = Seq(Seq("z", "x", "y")).toDF("arr")
      .select(SimHash64(col("arr"))).as[Long].collect()(0)
    assert(a == b) // bag semantics: order never matters
    val c = Seq(Seq("x", "y", "q")).toDF("arr")
      .select(SimHash64(col("arr"))).as[Long].collect()(0)
    assert(a != c)
  }

  test("embedding near-dup pairs on planted vectors") {
    val rnd = new scala.util.Random(11)
    def vec() = Array.fill(64)(rnd.nextGaussian().toFloat)
    val bases = (0 until 30).map(i => (i.toLong, vec()))
    val dups = (0 until 5).map { i =>
      val v = bases(i)._2.clone()
      v(0) = v(0) + 0.01f // tiny perturbation -> cosine ~0.9999
      (300L + i, v)
    }
    val df = (bases ++ dups).map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingPairs(df, "vec_id", "embedding", 0.99)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(pairs == (0 until 5).map(i => (i.toLong, 300L + i)).toSet)
  }

  test("semanticDedup: within-cluster copies drop keep-first; survivors match brute force") {
    val rnd = new scala.util.Random(13)
    // 3 planted clusters of 20 around orthogonal unit directions with
    // enough ANGULAR spread that ordinary cluster-mates sit near cosine
    // 0.5 (nowhere near the 0.999 bar), plus near-copies of the first
    // two members of each cluster (ids 900+, cosine ~1) — the copies
    // must drop, everything else survives
    val bases = (0 until 3).flatMap { c =>
      (0 until 20).map { i =>
        (c * 100L + i, Array.tabulate(16)(j =>
          ((if (j == c) 1.0 else 0.0) + rnd.nextGaussian() * 0.25).toFloat))
      }
    }
    val copies = (0 until 3).flatMap { c =>
      (0 until 2).map { i =>
        val v = bases.find(_._1 == c * 100L + i).get._2.clone()
        v(0) = v(0) + 0.001f
        (900L + c * 10 + i, v)
      }
    }
    val df = (bases ++ copies).map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding")
    val kept = Dedup.semanticDedup(df, "vec_id", "embedding",
      k = 3, iters = 3, threshold = 0.999)
      .select("id").as[Long].collect().toSet
    assert(kept == bases.map(_._1).toSet,
      s"copies must drop, bases survive; got ${kept.toSeq.sorted}")
    // brute-force parity: recompute drops from the SAME assignment
    val assigned = KMeans.fitAssign(df, "vec_id", "embedding", k = 3, iters = 3)
      .select("id", "cid", "v").as[(Long, Long, Seq[Float])].collect()
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      d / (na * nb)
    }
    val dropsBrute = for {
      a <- assigned.toSeq; b <- assigned.toSeq
      if a._2 == b._2 && a._1 < b._1 && cos(a._3, b._3) >= 0.999
    } yield b._1
    val brute = assigned.map(_._1).toSet -- dropsBrute
    assert(kept == brute)
    spark.catalog.clearCache()
  }

  test("dropNearDuplicates on a clean corpus returns it unchanged") {
    // zero near-dup pairs -> empty components frame; must pass the corpus
    // through, not NPE on the empty convergence aggregate
    val rnd = new scala.util.Random(31)
    val vocab = Vector.tabulate(5000)(i => s"c$i")
    val clean = (0 until 20)
      .map(i => (i.toLong, Seq.fill(60)(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
      .toDF("doc_id", "text")
    val kept = Dedup.dropNearDuplicates(clean, "doc_id", "text",
      n = 3, threshold = 0.9)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == (0L until 20L).toSet)
    // the cluster summary on the same corpus is simply empty
    assert(Dedup.ngramClusters(clean, "doc_id", "text", 3, 0.9).count() == 0)
  }

  test("dropNearDuplicates keeps exactly the cluster roots + singletons") {
    // corpus: bases 0-39, near-dups 100-109 of bases 0-9, exact copies
    // 200/201 of bases 20/21 -> at 0.5 the kept set is precisely the bases
    val kept = Dedup.dropNearDuplicates(corpus, "doc_id", "text",
      n = 3, threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == (0L until 40L).toSet, s"got: ${kept.toSeq.sorted}")
  }

  test("dropNearDuplicatesKeepBest keeps the longest member, not the root") {
    import spark.implicits._
    // a 3-doc near-dup cluster where the LONGEST copy has the LARGEST id:
    // base (10 words), a truncation (7 words, shares >0.5 of shingles),
    // and an extended copy (14 words) — keepBest keeps id 30, min-id
    // policy would keep id 10; unrelated doc 99 survives either way
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (10L, base),
      (20L, "alpha beta gamma delta epsilon zeta eta"),
      (30L, base + " lambda mu nu xi"),
      (99L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val best = Dedup.dropNearDuplicatesKeepBest(docs, "doc_id", "text",
      n = 3, threshold = 0.3, maxDf = None)
      .select("doc_id").as[Long].collect().toSet
    assert(best == Set(30L, 99L), s"got: ${best.toSeq.sorted}")
    val root = Dedup.dropNearDuplicates(docs, "doc_id", "text",
      n = 3, threshold = 0.3, maxDf = None)
      .select("doc_id").as[Long].collect().toSet
    assert(root == Set(10L, 99L), s"got: ${root.toSeq.sorted}")
    // score keeper: a quality signal on the TRUNCATION outranks both the
    // min-id and the longest pick — three policies, three different picks
    val byScore = Dedup.dropNearDuplicatesKeepBestBy(docs, "doc_id", "text",
      score = org.apache.spark.sql.functions
        .when(org.apache.spark.sql.functions.col("doc_id") === 20L, 5.0)
        .otherwise(1.0),
      n = 3, threshold = 0.3, maxDf = None)
      .select("doc_id").as[Long].collect().toSet
    assert(byScore == Set(20L, 99L), s"got: ${byScore.toSeq.sorted}")
    // equal scores fall back to the keep-longest tie-break exactly
    val tied = Dedup.dropNearDuplicatesKeepBestBy(docs, "doc_id", "text",
      score = org.apache.spark.sql.functions.lit(1.0),
      n = 3, threshold = 0.3, maxDf = None)
      .select("doc_id").as[Long].collect().toSet
    assert(tied == Set(30L, 99L), s"got: ${tied.toSeq.sorted}")
  }

  test("incremental pairs == batch pairs restricted to the new side") {
    // old = even ids, batch = odd ids (near-dup ids 100-109/200/201 land
    // on both sides, so the restricted set has old-new AND new-new pairs)
    val old = corpus.filter($"doc_id" % 2 === 0)
    val batch = corpus.filter($"doc_id" % 2 === 1)
    val idx = Dedup.minhashIndex(old, "doc_id", "text")
    val incr = Dedup.incrementalMinhashPairs(batch, "doc_id", "text", idx)
      .select("i", "j").as[(Long, Long)].collect().toSet
    val full = Dedup.minhashPairs(corpus, "doc_id", "text")
      .select("i", "j").as[(Long, Long)].collect().toSet
    val restricted = full.filter { case (i, j) => i % 2 == 1 || j % 2 == 1 }
    assert(incr == restricted, s"incr-only: ${incr -- restricted}; " +
      s"missing: ${restricted -- incr}")
    assert(incr.nonEmpty) // the fixture must actually exercise the path
  }

  test("minhash index round-trips through parquet") {
    val old = corpus.filter($"doc_id" % 2 === 0)
    val batch = corpus.filter($"doc_id" % 2 === 1)
    val dir = graft.TempDirs.scratchDir("dedup_idx").toString
    val built = Dedup.minhashIndex(old, "doc_id", "text")
    built.bands.write.parquet(s"$dir/bands")
    built.shingles.write.parquet(s"$dir/shingles")
    val loaded = Dedup.MinhashIndex(
      spark.read.parquet(s"$dir/bands"), spark.read.parquet(s"$dir/shingles"))
    val live = Dedup.incrementalMinhashPairs(batch, "doc_id", "text", built)
      .select("i", "j").as[(Long, Long)].collect().toSet
    val persisted = Dedup.incrementalMinhashPairs(batch, "doc_id", "text", loaded)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(live == persisted && persisted.nonEmpty)
  }

  test("filterNovel: corpus matches drop, clusters keep roots, taint drops whole") {
    // distinct-token docs: a single-word mutation changes exactly 3 of the
    // 38 grams -> jac = 35/41 ~ 0.85, safely above the 0.8 threshold
    val docA = (0 until 40).map(i => s"a$i").mkString(" ")
    val docB = (0 until 40).map(i => s"b$i").mkString(" ")
    val idxDocs = Seq((10L, docA)).toDF("doc_id", "text")
    val idx = Dedup.minhashIndex(idxDocs, "doc_id", "text")
    val batch = Seq(
      // 21 ~ indexed 10 -> dropped (near-identical text)
      (21L, docA.split(" ").updated(20, "X").mkString(" ")),
      // 22/23 a within-batch cluster with no corpus contact -> keep 22
      (22L, docB), (23L, docB.split(" ").updated(20, "MUT").mkString(" ")),
      // 24 a singleton -> kept
      (24L, (0 until 40).map(i => s"c$i").mkString(" "))
    ).toDF("doc_id", "text")
    val kept = Dedup.filterNovel(batch, "doc_id", "text", idx)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(22L, 24L), s"got: ${kept.toSeq.sorted}")
    // taint: make the within-batch cluster touch the corpus through one
    // member -> the WHOLE cluster drops, not just the touching member
    val idx2 = Dedup.minhashIndex(
      idxDocs.unionByName(Seq((11L, docB)).toDF("doc_id", "text")),
      "doc_id", "text")
    val kept2 = Dedup.filterNovel(batch, "doc_id", "text", idx2)
      .select("doc_id").as[Long].collect().toSet
    assert(kept2 == Set(24L), s"got: ${kept2.toSeq.sorted}")
  }

  test("tileDuplication strips corpus-duplicated tiles, keeps the tail") {
    // docs share one exact 4-word tile; each has a unique tile and a
    // sub-tile tail that must always survive
    val shared = "alpha beta gamma delta"
    val rows = Seq(
      (1L, s"$shared one two three four tail1"),
      (2L, s"$shared five six seven eight t2a t2b"),
      (3L, "lone words only here short")) // 5 words -> 1 tile + 1-word tail
    val out = Dedup.tileDuplication(rows.toDF("doc_id", "text"),
      "doc_id", "text", tileWords = 4)
      .orderBy("doc_id")
      .select("doc_id", "n_tiles", "dup_tiles", "dup_ratio", "clean_text")
      .as[(Long, Long, Long, Double, String)].collect()
    assert(out(0) == ((1L, 2L, 1L, 0.5, "one two three four tail1")))
    assert(out(1) == ((2L, 2L, 1L, 0.5, "five six seven eight t2a t2b")))
    assert(out(2) == ((3L, 1L, 0L, 0.0, "lone words only here short")))
  }

  test("tileDuplication: self-repetition inside one doc counts as dup") {
    val rep = "w1 w2 w3 w4"
    val out = Dedup.tileDuplication(
      Seq((7L, s"$rep $rep endbit")).toDF("doc_id", "text"),
      "doc_id", "text", tileWords = 4)
      .select("n_tiles", "dup_tiles", "clean_text")
      .as[(Long, Long, String)].head()
    assert(out == ((2L, 2L, "endbit")))
  }

  test("tileDuplication: doc shorter than one tile passes through whole") {
    val out = Dedup.tileDuplication(
      Seq((9L, "just three words")).toDF("doc_id", "text"),
      "doc_id", "text", tileWords = 8)
      .select("n_tiles", "dup_tiles", "dup_ratio", "clean_text")
      .as[(Long, Long, Double, String)].head()
    assert(out == ((0L, 0L, 0.0, "just three words")))
  }

  test("tileDuplication: grid-aligned duplication detected, misaligned documented miss") {
    val run = "r1 r2 r3 r4 r5 r6 r7 r8"
    // same offset mod 4 in both docs -> identical tile content -> caught
    val aligned = Dedup.tileDuplication(
      Seq((1L, s"$run ax ay"), (2L, s"b1 b2 b3 b4 $run")).toDF("doc_id", "text"),
      "doc_id", "text", tileWords = 4)
      .orderBy("doc_id").select("dup_tiles").as[Long].collect()
    assert(aligned.forall(_ >= 2L), aligned.toSeq)
    // offsets 0 vs 2 (mod 4) -> tiles differ -> the documented miss;
    // windowDuplication below is the detector that closes it
    val missed = Dedup.tileDuplication(
      Seq((1L, s"$run ax ay"), (2L, s"b1 b2 $run")).toDF("doc_id", "text"),
      "doc_id", "text", tileWords = 4)
      .orderBy("doc_id").select("dup_tiles").as[Long].collect()
    assert(missed.forall(_ == 0L), missed.toSeq)
  }

  test("tileDuplicationIncremental equals batch mode restricted to the batch; corpus text never read") {
    val shared = "s1 s2 s3 s4"
    val corpus = Seq((2L, s"$shared c1 c2 c3 c4"), (4L, "d1 d2 d3 d4 extra"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (1L, s"$shared b1 b2 b3 b4 tail"), // shares a tile with the corpus
      (3L, "n1 n2 n3 n4"),               // novel
      (5L, "short one"))                 // tile-less
      .toDF("doc_id", "text")
    val idx = Dedup.tileIndex(corpus, "doc_id", "text", tileWords = 4)
    val got = Dedup.tileDuplicationIncremental(batch, "doc_id", "text", idx,
      tileWords = 4)
      .orderBy("doc_id")
      .select("doc_id", "n_tiles", "dup_tiles", "clean_text")
      .as[(Long, Long, Long, String)].collect()
    // batch-mode over corpus ∪ batch, restricted to batch rows
    val want = Dedup.tileDuplication(corpus.unionByName(batch),
      "doc_id", "text", tileWords = 4)
      .filter(col("doc_id").isin(1L, 3L, 5L)).orderBy("doc_id")
      .select("doc_id", "n_tiles", "dup_tiles", "clean_text")
      .as[(Long, Long, Long, String)].collect()
    assert(got.toSeq == want.toSeq)
    assert(got(0) == ((1L, 2L, 1L, "b1 b2 b3 b4 tail")))
    // within-batch duplication also counts (both batch copies drop)
    val twin = Seq((11L, "t1 t2 t3 t4"), (13L, "t1 t2 t3 t4")).toDF("doc_id", "text")
    val dup = Dedup.tileDuplicationIncremental(twin, "doc_id", "text", idx,
      tileWords = 4).select("dup_tiles").as[Long].collect()
    assert(dup.toSeq == Seq(1L, 1L))
  }

  test("mergeTileIndex folds batch counts; accepted batches raise n_refs") {
    val a = Dedup.tileIndex(Seq((1L, "x1 x2 x3 x4")).toDF("doc_id", "text"),
      "doc_id", "text", tileWords = 4)
    val b = Dedup.tileIndex(
      Seq((2L, "x1 x2 x3 x4"), (3L, "y1 y2 y3 y4")).toDF("doc_id", "text"),
      "doc_id", "text", tileWords = 4)
    // the index is keyed by xxhash64(tile text), never the text itself
    val hashes = Seq("x1 x2 x3 x4", "y1 y2 y3 y4").toDF("t")
      .select(xxhash64(col("t"))).as[Long].collect()
    val merged = Dedup.mergeTileIndex(a, b)
      .as[(Long, Long)].collect().toMap
    assert(merged == Map(hashes(0) -> 2L, hashes(1) -> 1L))
    // a batch whose only tile matches the merged index is fully duplicated
    val probe = Dedup.tileDuplicationIncremental(
      Seq((9L, "y1 y2 y3 y4")).toDF("doc_id", "text"),
      "doc_id", "text", Dedup.mergeTileIndex(a, b), tileWords = 4)
      .select("dup_tiles", "clean_text").as[(Long, String)].head()
    assert(probe == ((1L, "")))
  }

  test("windowDuplication detects every run >= windowWords at any alignment") {
    val run = "r1 r2 r3 r4"
    val out = Dedup.windowDuplication(
      Seq((1L, s"$run ax ay"), (2L, s"b1 b2 $run bz")).toDF("doc_id", "text"),
      "doc_id", "text", windowWords = 4)
      .orderBy("doc_id")
      .select("doc_id", "n_windows", "dup_windows")
      .as[(Long, Long, Long)].collect()
    // doc1: windows at 0..2 (6 words), doc2: 0..3 (7 words); exactly the
    // run window duplicates in each
    assert(out(0) == ((1L, 3L, 1L)))
    assert(out(1) == ((2L, 4L, 1L)))
    // stride > 1 trades recall for cost: stride 2 still yields windows,
    // and a doc shorter than the window has zero
    val s2 = Dedup.windowDuplication(
      Seq((1L, "w1 w2 w3 w4 w5 w6"), (2L, "tiny doc")).toDF("doc_id", "text"),
      "doc_id", "text", windowWords = 4, stride = 2)
      .orderBy("doc_id").select("n_windows").as[Long].collect()
    assert(s2.toSeq == Seq(2L, 0L)) // positions 0,2 ; none
  }

  test("lineDedup strips cross-document boilerplate lines, keeps order") {
    val docs = Seq(
      (1L, "COOKIE BANNER\nunique alpha one\nfooter"),
      (2L, "COOKIE BANNER\nunique beta two\nfooter"),
      (3L, "solo headline\nunique gamma three")).toDF("doc_id", "text")
    val out = Dedup.lineDedup(docs, "doc_id", "text").orderBy("doc_id")
      .select("doc_id", "n_lines", "dup_lines", "clean_text")
      .as[(Long, Long, Long, String)].collect()
    assert(out(0) == ((1L, 3L, 2L, "unique alpha one")))
    assert(out(1) == ((2L, 3L, 2L, "unique beta two")))
    assert(out(2) == ((3L, 2L, 0L, "solo headline\nunique gamma three")))
  }

  test("lineDedup: exact-bytes matching, blank lines are lines, maxDocs dial") {
    val docs = Seq(
      (1L, "Header\n\nbody a"),
      (2L, "header\n\nbody b"), // case differs -> 'Header' != 'header'
      (3L, "Header\nbody c")).toDF("doc_id", "text")
    val strict = Dedup.lineDedup(docs, "doc_id", "text").orderBy("doc_id")
      .select("doc_id", "dup_lines", "clean_text")
      .as[(Long, Long, String)].collect()
    // 'Header' in docs 1+3 dups; 'header' only doc 2 survives; the
    // blank line (docs 1+2) dups
    assert(strict(0) == ((1L, 2L, "body a")))
    assert(strict(1) == ((2L, 1L, "header\nbody b")))
    assert(strict(2) == ((3L, 1L, "body c")))
    // maxDocs=2 tolerates 2-document lines: nothing here strips
    val lax = Dedup.lineDedup(docs, "doc_id", "text", maxDocs = 2L)
      .agg(sum("dup_lines")).as[Long].head()
    assert(lax == 0L)
  }

  test("lineDedupIncremental == batch restricted to the batch; index merge is additive") {
    val corpus = Seq(
      (1L, "banner\nalpha one"),
      (2L, "banner\nbeta two")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "banner\ngamma three"),     // banner indexed twice -> strips
      (11L, "fresh\ndelta four"),       // 'fresh' also in 12 -> strips
      (12L, "fresh\nepsilon five")).toDF("doc_id", "text")
    val idx = Dedup.lineIndex(corpus, "doc_id", "text")
    val inc = Dedup.lineDedupIncremental(batch, "doc_id", "text", idx)
      .orderBy("doc_id").collect().map(_.toSeq)
    val full = Dedup.lineDedup(corpus.unionByName(batch), "doc_id", "text")
      .filter(col("doc_id") >= 10L).orderBy("doc_id")
      .collect().map(_.toSeq)
    assert(inc.toSeq == full.toSeq)
    // merging the batch's index reproduces the one-shot full index
    val merged = Dedup.mergeLineIndex(idx,
        Dedup.lineIndex(batch, "doc_id", "text"))
      .orderBy("line_hash").collect().map(_.toSeq)
    val oneShot = Dedup.lineIndex(corpus.unionByName(batch), "doc_id", "text")
      .orderBy("line_hash").collect().map(_.toSeq)
    assert(merged.toSeq == oneShot.toSeq)
  }

  test("lineDedup: within-doc repetition does not strip (distinct-doc counting); empty doc safe") {
    val docs = Seq(
      (1L, "same line\nsame line\nother"),
      (2L, "")).toDF("doc_id", "text")
    val out = Dedup.lineDedup(docs, "doc_id", "text").orderBy("doc_id")
      .select("doc_id", "n_lines", "dup_lines", "clean_text")
      .as[(Long, Long, Long, String)].collect()
    // 'same line' appears twice but in ONE document: not boilerplate
    assert(out(0) == ((1L, 3L, 0L, "same line\nsame line\nother")))
    // empty text splits to one empty line, unique here -> survives
    assert(out(1) == ((2L, 1L, 0L, "")))
  }

  test("corpusOverlap: hand-counted trigram sets, jaccard and containment") {
    // A: "a b c d" -> trigrams {abc, bcd}; "x y z w" -> {xyz, yzw}
    // B: "a b c d e" -> {abc, bcd, cde}; "p q r" -> {pqr}
    val a = Seq((1L, "a b c d"), (2L, "x y z w")).toDF("doc_id", "text")
    val b = Seq((3L, "a b c d e"), (4L, "p q r")).toDF("doc_id", "text")
    val r = Dedup.corpusOverlap(a, b, "text", n = 3).collect().head
    assert(r.getAs[Long]("n_a") == 4L)
    assert(r.getAs[Long]("n_b") == 4L)
    assert(r.getAs[Long]("n_inter") == 2L)  // abc, bcd
    assert(r.getAs[Long]("n_union") == 6L)
    assert(r.getAs[Double]("jaccard") == 2.0 / 6.0)
    assert(r.getAs[Double]("containment_b_in_a") == 2.0 / 4.0)
  }

  test("corpusOverlap: short docs contribute no shingles; disjoint corpora -> zero") {
    val a = Seq((1L, "a b")).toDF("doc_id", "text") // < n words
    val b = Seq((2L, "p q r s")).toDF("doc_id", "text")
    val r = Dedup.corpusOverlap(a, b, "text", n = 3).collect().head
    assert(r.getAs[Long]("n_a") == 0L)
    assert(r.getAs[Long]("n_inter") == 0L)
    assert(r.getAs[Double]("jaccard") == 0.0)
    // n_a = 0 but union nonempty: jaccard defined, containment defined
    assert(r.getAs[Double]("containment_b_in_a") == 0.0)
  }

  test("corpusOverlapKmv tracks exact jaccard on the planted corpus halves") {
    val half1 = corpus.filter(col("doc_id") % 2 === 0)
    val half2 = corpus.filter(col("doc_id") % 2 === 1)
    val exact = Dedup.corpusOverlap(half1, half2, "text", n = 3)
      .collect().head.getAs[Double]("jaccard")
    val est = Dedup.corpusOverlapKmv(half1, half2, "text", n = 3, k = 256)
      .collect().head.getAs[Double]("kmv_jaccard")
    // k=256 over a few-thousand-shingle union: estimator s.d. ~ sqrt(J/k)
    assert(math.abs(est - exact) < 0.15, s"est=$est exact=$exact")
  }

  test("kmvSketch: k rows, deterministic, and small-corpus sketch is the full hash set") {
    val s1 = Dedup.kmvSketch(corpus, "text", n = 3, k = 64).collect().map(_.getLong(0))
    val s2 = Dedup.kmvSketch(corpus, "text", n = 3, k = 64).collect().map(_.getLong(0))
    assert(s1.length == 64 && s1.toSeq == s2.toSeq)
    // a corpus with fewer distinct shingles than k: sketch = whole set
    val tiny = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    assert(Dedup.kmvSketch(tiny, "text", n = 3, k = 64).count() == 3L)
  }

  test("containmentAgainst a persisted index == corpusOverlap's containment; merge is additive") {
    val half1 = corpus.filter(col("doc_id") % 2 === 0)
    val half2 = corpus.filter(col("doc_id") % 2 === 1)
    val direct = Dedup.corpusOverlap(half1, half2, "text", n = 3)
      .collect().head
    // round-trip the index through parquet: corpus A text never re-read
    val dir = java.nio.file.Files.createTempDirectory("shidx").toString
    Dedup.shingleIndex(half1, "text", n = 3)
      .write.mode("overwrite").parquet(dir)
    val viaIndex = Dedup.containmentAgainst(
      spark.read.parquet(dir), half2, "text", n = 3).collect().head
    assert(viaIndex.getAs[Long]("n_b") == direct.getAs[Long]("n_b"))
    assert(viaIndex.getAs[Long]("n_inter") == direct.getAs[Long]("n_inter"))
    assert(viaIndex.getAs[Double]("containment") ==
      direct.getAs[Double]("containment_b_in_a"))
    // merging the dump in == one-shot index over the union
    val merged = Dedup.mergeShingleIndex(
      spark.read.parquet(dir), Dedup.shingleIndex(half2, "text", n = 3))
    val oneShot = Dedup.shingleIndex(half1.unionByName(half2), "text", n = 3)
    assert(merged.count() == oneShot.count())
    assert(merged.except(oneShot).count() == 0L)
    // everything ingested is fully contained afterwards
    val post = Dedup.containmentAgainst(merged, half2, "text", n = 3)
      .collect().head
    assert(post.getAs[Double]("containment") == 1.0)
  }

  test("corpusOverlapKmv: identical corpora estimate exactly 1.0") {
    val r = Dedup.corpusOverlapKmv(corpus, corpus, "text", n = 3, k = 128)
      .collect().head
    assert(r.getAs[Double]("kmv_jaccard") == 1.0)
    assert(r.getAs[Long]("s_both") == r.getAs[Long]("s_size"))
  }

  test("decontaminateSpans: any-alignment benchmark hit strips the covered tile only") {
    import spark.implicits._
    // doc 1: tiles [a..h], [i..p], tail "q r"
    val corpus = Seq(
      1L -> "a b c d e f g h i j k l m n o p q r",
      2L -> "totally unrelated words that no benchmark quotes here at all")
      .toDF("id", "text")
    // the benchmark quotes i..p mid-sentence — a different alignment
    // than the corpus tile grid; the overlapping windows still find it
    val bench = Seq("x y i j k l m n o p z").toDF("btext")
    val got = Dedup.decontaminateSpans(corpus, "id", "text", bench, "btext")
      .orderBy("id").collect()
    assert(got(0).getAs[Long]("n_tiles") == 2L)
    assert(got(0).getAs[Long]("hit_tiles") == 1L)
    assert(got(0).getAs[String]("clean_text") == "a b c d e f g h q r")
    assert(got(1).getAs[Long]("hit_tiles") == 0L)
    assert(got(1).getAs[String]("clean_text") ==
      "totally unrelated words that no benchmark quotes here at all")
  }

  test("decontaminateSpans: partial span overlap straddling tiles is a documented miss") {
    import spark.implicits._
    val corpus = Seq(1L -> "a b c d e f g h i j k l m n o p")
      .toDF("id", "text")
    // the quote covers d..l: 9 words, but no corpus TILE lies wholly
    // inside it — both tiles keep their flanks (the tileWords-1 bound)
    val bench = Seq("d e f g h i j k l").toDF("btext")
    val got = Dedup.decontaminateSpans(corpus, "id", "text", bench, "btext")
      .collect()(0)
    assert(got.getAs[Long]("hit_tiles") == 0L)
    assert(got.getAs[String]("clean_text") ==
      "a b c d e f g h i j k l m n o p")
  }

  test("decontaminateSpans: sub-tile docs, short benchmarks, empty benchmark") {
    import spark.implicits._
    val corpus = Seq(
      1L -> "too short for tiles",
      2L -> "a b c d e f g h tail")
      .toDF("id", "text")
    val got = Dedup.decontaminateSpans(corpus, "id", "text",
      Seq("short bench").toDF("btext"), "btext").orderBy("id").collect()
    assert(got(0).getAs[Long]("n_tiles") == 0L)
    assert(got(0).getAs[String]("clean_text") == "too short for tiles")
    assert(got(1).getAs[Long]("hit_tiles") == 0L)
    val empty = Dedup.decontaminateSpans(corpus, "id", "text",
      Seq.empty[String].toDF("btext"), "btext").orderBy("id").collect()
    assert(empty.map(_.getAs[Long]("hit_tiles")).sum == 0L)
    assert(empty(1).getAs[String]("clean_text") == "a b c d e f g h tail")
  }
}
