package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class FeatureHashSpec extends SparkTestBase {
  import spark.implicits._

  private val df = Seq(
    (Some("gold"), Some(1L)), (Some("gold"), Some(2L)),
    (Some("silver"), None), (None, Some(1L))
  ).toDF("tier", "nk")

  test("buckets stay in range and nulls contribute nothing") {
    val t = FeatureHash.hashTokens(df, Seq("tier", "nk"), buckets = 8)
      .as[(Long, Long)].collect().toSeq
    assert(t.length == 6) // 8 cells minus 2 null features
    assert(t.forall { case (b, s) =>
      b >= 0 && b < 8 && (s == 1L || s == -1L) })
  }

  test("same value always lands in the same signed bucket") {
    val t = FeatureHash.hashTokens(df, Seq("tier"), buckets = 16)
      .as[(Long, Long)].collect().toSeq
    assert(t.count(_ == t.head) >= 2) // the two "gold" rows collide exactly
  }

  test("hashedProfile aggregates weight and count per bucket") {
    val p = FeatureHash.hashedProfile(df, Seq("tier", "nk"), buckets = 4)
      .orderBy(col("bucket")).collect()
    assert(p.map(_.getLong(2)).sum == 6L)            // token conservation
    assert(p.forall(r => math.abs(r.getLong(1)) <= r.getLong(2)))
    // feature name is part of the token: same raw value, different column
    val a = FeatureHash.hashedProfile(
      Seq(Tuple1("x")).toDF("f1"), Seq("f1"), buckets = 1024).head()
    val b = FeatureHash.hashedProfile(
      Seq(Tuple1("x")).toDF("f2"), Seq("f2"), buckets = 1024).head()
    assert(a.getLong(0) != b.getLong(0) || a.getLong(1) != b.getLong(1))
  }

  test("textBigramFeatures: normalized signed counts, every doc present") {
    val docs = Seq((1L, "a b a b"), (2L, ""), (3L, "z")).toDF("id", "text")
    val f = FeatureHash.textBigramFeatures(docs, "id", "text", buckets = 4)
      .orderBy("id").collect()
    assert(f.length == 3) // empty text still featurizes (the <s> pad)
    // every feature bounded by 1 in magnitude, and doc 1's features are
    // exact quarters (4 padded bigrams: <s>a, ab, ba, ab)
    f.foreach(r => (1 to 4).foreach(j => assert(math.abs(r.getDouble(j)) <= 1.0)))
    (1 to 4).foreach { j =>
      val v = math.abs(f(0).getDouble(j)) * 4
      assert(v == math.rint(v))
    }
    // repeated bigram "a b" doubles its bucket's magnitude vs one hit:
    // total absolute mass of doc 1 counts 4 signed tokens
    val mass = (1 to 4).map(j => f(0).getDouble(j)).map(math.abs)
    assert(mass.sum > 0.0)
  }

  test("textBigramFeatures: null text behaves as empty, doc still present") {
    val f = FeatureHash.textBigramFeatures(
      Seq((1L, null: String), (2L, "")).toDF("id", "text"),
      "id", "text", buckets = 4).orderBy("id").collect()
    assert(f.length == 2)
    assert((1 to 4).forall(j => f(0).getDouble(j) == f(1).getDouble(j)))
  }

  test("textBigramFeatures + LogReg learn a planted content split") {
    // class 1 talks about one thing, class 0 another — shape features
    // (length, TTR) are IDENTICAL by construction, only content differs
    val docs = (0 until 80).map { i =>
      if (i % 2 == 0) (i.toLong, 1.0, "good solid prose flows here")
      else (i.toLong, 0.0, "spam junk words stuffed there")
    }.toDF("id", "y", "text")
    val fcols = (0 until 8).map(b => s"f$b")
    val feats = FeatureHash.textBigramFeatures(docs, "id", "text", 8)
      .join(docs.select(col("id"), col("y")), "id")
    val w = LogReg.train(feats, fcols, "y", iters = 30, lr = 2.0)
    val scored = LogReg.predict(feats, fcols, w)
      .select(col("y"), col("score")).collect()
    val pos = scored.filter(_.getDouble(0) == 1.0).map(_.getDouble(1))
    val neg = scored.filter(_.getDouble(0) == 0.0).map(_.getDouble(1))
    // perfect separation: every positive outscores every negative
    assert(pos.min > neg.max)
  }
}
