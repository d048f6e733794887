package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BpeSpec extends SparkTestBase {
  import spark.implicits._

  test("train learns the textbook merges on a hand corpus") {
    // classic example: "low" x5, "lower" x2, "newest" x6, "widest" x3
    val docs = Seq(
      (1L, Seq.fill(5)("low").mkString(" ")),
      (2L, Seq.fill(2)("lower").mkString(" ")),
      (3L, Seq.fill(6)("newest").mkString(" ")),
      (4L, Seq.fill(3)("widest").mkString(" ")))
      .toDF("doc_id", "text")
    val m = Bpe.train(docs, "text", merges = 3)
      .orderBy("step").as[(Int, String, String, Long)].collect().toSeq
    // es(9) -> est(9) -> lo(7): counts weight by word frequency
    assert(m == Seq((1, "e", "s", 9L), (2, "es", "t", 9L), (3, "l", "o", 7L)))
  }

  test("greedy application: aaa -> [aa, a], aaaa -> [aa, aa]") {
    val words = Seq("aaa", "aaaa", "aba").toDF("w")
    val got = words.select(col("w"),
        Bpe.encode(col("w"), Seq(("a", "a"))).as("syms"))
      .as[(String, Seq[String])].collect().toMap
    assert(got("aaa") == Seq("aa", "a"))
    assert(got("aaaa") == Seq("aa", "aa"))
    assert(got("aba") == Seq("a", "b", "a"))
  }

  test("encode folds merges in rank order (second-order merges land)") {
    val words = Seq("lower", "low", "slow").toDF("w")
    val merges = Seq(("l", "o"), ("lo", "w"))
    val got = words.select(col("w"), Bpe.encode(col("w"), merges).as("s"))
      .as[(String, Seq[String])].collect().toMap
    assert(got("lower") == Seq("low", "e", "r"))
    assert(got("low") == Seq("low"))
    assert(got("slow") == Seq("s", "low"))
  }

  test("encode takes deep merge lists (the HOF fold blew the analyzer past ~8)") {
    // 12 chained merges collapsing "abcdefghijklm" one pair at a time;
    // the nested-lambda formulation died with "Max iterations reached"
    val chain = (0 until 12).map { i =>
      val merged = ('a' to ('a' + i + 1).toChar).mkString
      (merged.dropRight(1), merged.last.toString)
    }
    val got = Seq("abcdefghijklm").toDF("w")
      .select(Bpe.encode(col("w"), chain).as("s"))
      .as[Seq[String]].collect()(0)
    assert(got == Seq("abcdefghijklm"))
  }

  test("ties break on (count desc, left, right) deterministically") {
    // "ab" and "cd" both occur 3 times; (a,b) < (c,d) lexically
    val docs = Seq((1L, "ab cd ab cd ab cd")).toDF("doc_id", "text")
    val m = Bpe.train(docs, "text", merges = 1)
      .as[(Int, String, String, Long)].collect()(0)
    assert(m == ((1, "a", "b", 3L)))
  }

  test("training stops early when the corpus runs out of pairs") {
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val m = Bpe.train(docs, "text", merges = 5)
      .orderBy("step").as[(Int, String, String, Long)].collect().toSeq
    // merge 1 fuses ab; single-symbol words have no pairs left
    assert(m == Seq((1, "a", "b", 2L)))
  }

  test("trainBatched: bit-identical to sequential at 50 merges in fewer rounds") {
    val docs = graft.Tables.load(spark, sf("sf0.001"), "documents")
      .select(col("doc_id"), col("text"))
    val seqM = Bpe.train(docs, "text", merges = 50)
      .orderBy("step").as[(Int, String, String, Long)].collect().toSeq
    val (bdf, rounds) = Bpe.trainBatchedWithRounds(docs, "text", merges = 50)
    val batM = bdf.orderBy("step").as[(Int, String, String, Long)]
      .collect().toSeq
    assert(seqM.size == 50 && batM == seqM)
    // batching compresses what independence exists; exact BPE's merge
    // chain is inherently sequential on this corpus (each argmax extends
    // the previous product: c,o -> co,l -> col,u), so the bound is
    // "strictly fewer rounds than merges" — the chain-free production
    // path is trainLocal below
    assert(rounds < 50, s"expected <50 driver rounds for 50 merges, got $rounds")
  }

  test("trainLocal: bit-identical to sequential at 50 merges; 300-merge runs are cheap") {
    val docs = graft.Tables.load(spark, sf("sf0.001"), "documents")
      .select(col("doc_id"), col("text"))
    val seqM = Bpe.train(docs, "text", merges = 50)
      .orderBy("step").as[(Int, String, String, Long)].collect().toSeq
    val locM = Bpe.trainLocal(docs, "text", merges = 50)
      .orderBy("step").as[(Int, String, String, Long)].collect().toSeq
    assert(locM == seqM)
    // the deep-merge route: 300 merges in ONE Spark round + driver
    // chain (the testdata's 31-word vocab exhausts at ~89 merges, so
    // the deep corpus is synthetic: 2000 distinct numeric types)
    val deepDocs = (1 to 2000).map(i => ((i * 2654435761L) & 0xffffffL).toString)
      .grouped(50).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val deep = Bpe.trainLocal(deepDocs, "text", merges = 300)
      .orderBy("step").as[(Int, String, String, Long)].collect().toSeq
    assert(deep.size == 300)
    // counts are positive and steps are 1..300 in order
    assert(deep.map(_._1) == (1 to 300) && deep.forall(_._4 > 0))
    // spot-check the chain against sequential training on a prefix
    val deepSeq = Bpe.train(deepDocs, "text", merges = 12)
      .orderBy("step").as[(Int, String, String, Long)].collect().toSeq
    assert(deep.take(12) == deepSeq)
    // maxTypes guard refuses instead of silently sampling
    intercept[IllegalArgumentException] {
      Bpe.trainLocal(docs, "text", merges = 5, maxTypes = 10)
    }
  }

  test("trainSharded: bit-identical to trainLocal at 300 merges, deep vocab") {
    val deepDocs = (1 to 2000).map(i => ((i * 2654435761L) & 0xffffffL).toString)
      .grouped(50).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val loc = Bpe.trainLocal(deepDocs, "text", merges = 300)
      .orderBy("step").as[(Int, String, String, Long)].collect().toSeq
    val (sdf, rounds) = Bpe.trainShardedWithRounds(deepDocs, "text",
      merges = 300, numShards = 8, probe = 64)
    val sh = sdf.orderBy("step").as[(Int, String, String, Long)]
      .collect().toSeq
    assert(sh == loc, "sharded merge table must be bit-identical to local")
    // flat-count corpora (2000 near-uniform types) are certification's
    // worst case: the unseen-tail bound forces page escalations, so
    // rounds can EXCEED merges here (~2.6x measured) — the bound proves
    // the escalation valve terminates, not batching wins (natural
    // zipfian text batches; see the probe=1 sf0.001 test below)
    assert(rounds <= 3 * 300, s"escalation did not converge: $rounds rounds")
  }

  test("trainSharded: probe escalation certifies the argmax at probe=1") {
    // probe=1 makes the unseen-tail bound Σ per-shard top counts — the
    // head usually can't certify, forcing the doubling valve; the
    // learned table must STILL be exact
    val docs = graft.Tables.load(spark, sf("sf0.001"), "documents")
      .select(col("doc_id"), col("text"))
    val seqM = Bpe.train(docs, "text", merges = 20)
      .orderBy("step").as[(Int, String, String, Long)].collect().toSeq
    val shM = Bpe.trainSharded(docs, "text", merges = 20, numShards = 4,
      probe = 1)
      .orderBy("step").as[(Int, String, String, Long)].collect().toSeq
    assert(shM == seqM)
    // the refusal valve: an impossible maxProbe must throw, not drift
    intercept[IllegalArgumentException] {
      Bpe.trainSharded(docs, "text", merges = 20, numShards = 4,
        probe = 1, maxProbe = 1)
    }
  }

  test("shard state is copy-on-apply: retries replay pure, rounds never " +
      "mutate cached state") {
    // the per-round map over the cached shard RDD runs withMergesApplied;
    // a task retry or speculative duplicate re-running it against the
    // SAME cached object must see the unmutated original and produce an
    // identical result — prove both halves directly on the state
    val st = new BpeShardState(
      Array("low".split(""), "lower".split(""), "lowest".split("")),
      Array(5L, 2L, 3L))
    val pageBefore = st.page(100)._1.toSeq
    val once = st.withMergesApplied(Seq(("l", "o")))
    assert(st.page(100)._1.toSeq == pageBefore,
      "receiver mutated by withMergesApplied")
    val twice = st.withMergesApplied(Seq(("l", "o"))) // the retry
    assert(once.page(100)._1.toSeq == twice.page(100)._1.toSeq)
    assert(once.page(100)._1.toSeq != pageBefore) // it did apply
    // chained rounds from a clone match the mutating driver-side path
    val mut = new BpeShardState(
      Array("low".split(""), "lower".split(""), "lowest".split("")),
      Array(5L, 2L, 3L))
    mut.applyMergesInOrder(Seq(("l", "o")))
    mut.applyMergesInOrder(Seq(("lo", "w")))
    val cloned = once.withMergesApplied(Seq(("lo", "w")))
    assert(cloned.page(100)._1.toSeq == mut.page(100)._1.toSeq)
  }

  test("trainSharded: reliable-checkpoint switch is bit-identical") {
    val docs = Seq((1L, "low lower lowest low low slow slower"),
      (2L, "new newer newest new slow slowest")).toDF("doc_id", "text")
    val plain = Bpe.trainSharded(docs, "text", merges = 10, numShards = 4)
      .orderBy("step").as[(Int, String, String, Long)].collect().toSeq
    val ckDir = java.nio.file.Files.createTempDirectory("bpe_ck").toString
    spark.sparkContext.setCheckpointDir(ckDir)
    spark.conf.set("spark.graft.eagerCheckpoint.reliable", "true")
    try {
      val durable = Bpe.trainSharded(docs, "text", merges = 10,
        numShards = 4)
        .orderBy("step").as[(Int, String, String, Long)].collect().toSeq
      assert(durable == plain)
      // the durable run actually wrote round states to the checkpoint dir
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(ckDir))
        .filter(p => java.nio.file.Files.isRegularFile(p)).count()
      assert(wrote > 0, "reliable mode must write checkpoint files")
    } finally spark.conf.unset("spark.graft.eagerCheckpoint.reliable")
  }

  test("trainSharded: exhausts cleanly when the corpus runs out of pairs") {
    val tiny = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    val sh = Bpe.trainSharded(tiny, "text", merges = 50, numShards = 4)
      .orderBy("step").as[(Int, String, String, Long)].collect().toSeq
    val seqM = Bpe.train(tiny, "text", merges = 50)
      .orderBy("step").as[(Int, String, String, Long)].collect().toSeq
    assert(sh == seqM && sh.size < 50)
  }

  test("trainBatched: self-pairs and interacting tops degrade safely to sequential picks") {
    // "aaaa"x4: (a,a)=12 is a self-pair -> its round batches nothing
    // after it; the follow-ups (aa,aa) then... must match sequential
    val runs = Seq((1L, Seq.fill(4)("aaaa").mkString(" "))).toDF("doc_id", "text")
    val s1 = Bpe.train(runs, "text", merges = 3)
      .orderBy("step").as[(Int, String, String, Long)].collect().toSeq
    val b1 = Bpe.trainBatched(runs, "text", merges = 3)
      .orderBy("step").as[(Int, String, String, Long)].collect().toSeq
    assert(b1 == s1)
    // chained alphabet: every next-best pair interacts with the last
    // merge's product, so batches collapse to singletons — equality is
    // the whole claim
    val chain = Seq((1L, Seq.fill(6)("abcde").mkString(" "))).toDF("doc_id", "text")
    val s2 = Bpe.train(chain, "text", merges = 4)
      .orderBy("step").as[(Int, String, String, Long)].collect().toSeq
    val b2 = Bpe.trainBatched(chain, "text", merges = 4)
      .orderBy("step").as[(Int, String, String, Long)].collect().toSeq
    assert(b2 == s2)
  }
}
