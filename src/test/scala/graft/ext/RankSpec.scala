package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RankSpec extends SparkTestBase {
  import spark.implicits._

  test("rrfFuse: exact integer femto-scores, both-runs beats one-run") {
    val runA = Seq((101L, 1L), (102L, 2L), (103L, 3L)).toDF("doc", "rank")
    val runB = Seq((102L, 1L), (104L, 2L)).toDF("doc", "rank")
    val got = Rank.rrfFuse(Seq(runA, runB), "doc", "rank", k0 = 60L, k = 10)
      .as[(Long, Long, Long, Double)].collect()
    val U = 1000000000000000L
    val byId = got.map(r => r._1 -> r).toMap
    // doc 102: rank 2 in A, rank 1 in B
    assert(byId(102L) == ((102L, 2L, U / 62 + U / 61,
      (U / 62 + U / 61).toDouble / 1.0e15)))
    assert(byId(101L)._3 == U / 61 && byId(101L)._2 == 1L)
    assert(byId(104L)._3 == U / 62)
    assert(byId(103L)._3 == U / 63)
    // fused order: 102 (two runs) first, then 101, 104, 103
    assert(got.map(_._1).toSeq == Seq(102L, 101L, 104L, 103L))
  }

  test("k limits output; femto ties break by id") {
    val runA = (1L to 30L).map(i => (i, i)).toDF("doc", "rank")
    val top = Rank.rrfFuse(Seq(runA), "doc", "rank", k0 = 60L, k = 5)
      .as[(Long, Long, Long, Double)].collect()
    assert(top.length == 5 && top.map(_._1).toSeq == (1L to 5L))
    // two docs at the same rank in different runs tie on femto -> id order
    val t1 = Seq((7L, 1L)).toDF("doc", "rank")
    val t2 = Seq((3L, 1L)).toDF("doc", "rank")
    val tie = Rank.rrfFuse(Seq(t1, t2), "doc", "rank", k0 = 60L, k = 5)
      .as[(Long, Long, Long, Double)].collect()
    assert(tie.map(_._1).toSeq == Seq(3L, 7L))
  }

  test("evalRun: hand-checked MRR, P@k, R@k; empty intersection safe") {
    val run = (1L to 20L).map(i => (i * 10, i)).toDF("doc", "rank")
    // relevant: docs 30 (rank 3), 150 (rank 15), 999 (not retrieved)
    val rel = Seq(30L, 150L, 999L).toDF("doc")
    val r = Rank.evalRun(run, rel, "doc", "rank", k = 10).head()
    assert(r.getLong(0) == 3L)               // n_rel
    assert(r.getLong(1) == 2L)               // n_hit (retrieved anywhere)
    assert(r.getLong(2) == 3L)               // first relevant at rank 3
    assert(r.getLong(3) == 1000000000000000L / 3) // exact femto MRR
    assert(r.getDouble(4) == 1.0 / 10.0)     // P@10: one hit in top 10
    assert(r.getDouble(5) == 1.0 / 3.0)      // R@10
    // no relevant retrieved: zeros, not nulls or crashes
    val none = Rank.evalRun(run, Seq(777L).toDF("doc"), "doc", "rank").head()
    assert(none.getLong(1) == 0L && none.isNullAt(2))
    assert(none.getLong(3) == 0L && none.getDouble(4) == 0.0)
  }

  test("ndcgAtK: hand-checked femto sums; perfect ranking = exactly 1.0; edges") {
    def f(r: Long): Long =
      math.floor(1.0e15 / (math.log(r + 1.0) / math.log(2.0))).toLong
    val run = (1L to 20L).map(i => (i * 10, i)).toDF("doc", "rank")
    // hits at ranks 3 and 15 (outside k=10) + one never retrieved
    val r = Rank.ndcgAtK(run, Seq(30L, 150L, 999L).toDF("doc"),
      "doc", "rank", k = 10).head()
    assert(r.getLong(0) == 3L)                        // n_rel
    assert(r.getLong(1) == 1L)                        // hits inside k
    assert(r.getLong(2) == f(3))                      // dcg
    assert(r.getLong(3) == f(1) + f(2) + f(3))        // idcg: min(k, 3) terms
    assert(r.getDouble(4) == f(3).toDouble / (f(1) + f(2) + f(3)).toDouble)
    // perfect ranking: the top-3 docs ARE the relevant set -> exactly 1.0
    val perfect = Rank.ndcgAtK(run, Seq(10L, 20L, 30L).toDF("doc"),
      "doc", "rank", k = 10).head()
    assert(perfect.getDouble(4) == 1.0)
    // n_rel > k: idcg truncates at k terms
    val many = Rank.ndcgAtK(run, (1L to 20L).map(_ * 10).toDF("doc"),
      "doc", "rank", k = 3).head()
    assert(many.getLong(3) == f(1) + f(2) + f(3))
    assert(many.getDouble(4) == 1.0)
    // empty relevance set: zeros, no sequence(1,0) trap
    val none = Rank.ndcgAtK(run, spark.emptyDataset[Long].toDF("doc"),
      "doc", "rank").head()
    assert(none.getLong(0) == 0L && none.getLong(3) == 0L
      && none.getDouble(4) == 0.0)
  }
}
