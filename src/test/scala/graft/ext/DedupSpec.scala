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
}
