package graft.streaming

import graft.SparkTestBase
import graft.ext.{Fixtures, SignLshSignatures}
import graft.snapshot.Warehouse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EmbeddingIngest rides the shared [[FpIngest]]/[[ScrubEngine]]
  * protocol; here the focus is the embedding family's own semantics —
  * sign-LSH angular near-dups drop across batches, NULL embeddings
  * ride along — and the MEASURED separation of the planted-cluster
  * corpus under the gate's exact plane draw (dim=128, seed=42,
  * eps=0.0005), pinned before the gate's class oracle was written. */
class EmbeddingIngestSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(p: String) = graft.TempDirs.scratchDir(p).toString
  private val Dim = 128

  private def corpus(): DataFrame =
    Fixtures.plantedVectors(spark, nClusters = 40, members = 6,
      dim = Dim, eps = 0.0005)

  test("separation pin under the gate's plane draw: within-cluster " +
      "<= 4, cross-cluster >= 10 (the radius-4 ball is exactly the " +
      "cluster relation)") {
    val fps = corpus()
      .select(col("vec_id"),
        element_at(SignLshSignatures(col("embedding"), 1, 63, Dim, 42L), 1)
          .as("fp"))
      .as[(Long, Long)].collect().sortBy(_._1)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val byCluster = fps.grouped(6).toSeq
    val withinMax = byCluster.map(g =>
      (for (a <- g; b <- g) yield ham(a._2, b._2)).max).max
    assert(withinMax <= 4, s"within-cluster Hamming grew to $withinMax")
    var crossMin = 64
    for {
      g1 <- byCluster.indices; g2 <- (g1 + 1) until byCluster.size
      a <- byCluster(g1); b <- byCluster(g2)
    } crossMin = math.min(crossMin, ham(a._2, b._2))
    assert(crossMin >= 10, s"cross-cluster Hamming min fell to $crossMin")
    fps.foreach { case (_, f) => assert(f >= 0L) } // bit 63 reserved
  }

  test("angular near-dups drop across batches; novel clusters keep; " +
      "NULL embeddings ride along") {
    val wh = new Warehouse(spark, tmp("ei_wh1"))
    val idx = tmp("ei_idx1")
    val all = corpus().withColumn("year", lit(2022L))
    // batch 0: cluster 0 member 0 and cluster 1 member 0
    EmbeddingIngest.ingestBatch(all.filter(col("vec_id").isin(0L, 6L)),
      "vec_id", "embedding", wh, "f", idx, 0L, Dim)
    // batch 1: 3 is cluster 0 member 3 (near-dup, different bytes),
    // 13 is a novel cluster, 7 is a NULL embedding
    val b1 = all.filter(col("vec_id").isin(3L, 13L))
      .unionByName(all.filter(col("vec_id") === 7L)
        .withColumn("embedding",
          lit(null).cast("array<float>")))
    EmbeddingIngest.ingestBatch(b1, "vec_id", "embedding", wh, "f", idx,
      1L, Dim)
    val got = wh.read("f").get.select("vec_id", "emb_fp")
      .as[(Long, Option[Long])].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(0L, 6L, 7L, 13L))
    assert(got(1)._2.isDefined && got(2)._2.isEmpty) // NULL fp rides
  }

  test("min id dominates within a batch; probe plan never re-derives " +
      "stored keys") {
    val wh = new Warehouse(spark, tmp("ei_wh2"))
    val idx = tmp("ei_idx2")
    val all = corpus().withColumn("year", lit(2022L))
    // 12, 14 share cluster 2; 30 is cluster 5
    EmbeddingIngest.ingestBatch(all.filter(col("vec_id").isin(12L, 14L, 30L)),
      "vec_id", "embedding", wh, "f", idx, 0L, Dim)
    assert(wh.read("f").get.select("vec_id").as[Long].collect().toSet ==
      Set(12L, 30L))
    val index = spark.read.parquet(s"$idx/embfps/batch=0")
    assert(Set("emb_fp", "n_refs", "t", "v").subsetOf(index.columns.toSet))
    val out = EmbeddingIngest.novelAgainst(
      all.filter(col("vec_id") === 36L), "vec_id", "embedding", index, Dim)
    val gens = out.queryExecution.optimizedPlan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }
    assert(gens.nonEmpty)
    gens.foreach { g =>
      val leaves = g.collectLeaves().map(_.getClass.getSimpleName)
      assert(!leaves.exists(_.contains("LogicalRelation")),
        s"index scan under a Generate: ${g.treeString.take(400)}")
    }
    assert(out.count() == 1) // 36 (cluster 6) is novel against {2, 5}
  }

  test("run(): a seeded corpus index blocks a streamed near-duplicate") {
    val wh = new Warehouse(spark, tmp("ei_wh3"))
    val idx = tmp("ei_idx3")
    val ck = tmp("ei_ck3")
    val src = tmp("ei_src3")
    val all = corpus().withColumn("year", lit(2022L))
    EmbeddingIngest.seedIndex(all.filter(col("vec_id") === 18L), "vec_id",
      "embedding", idx, Dim)
    // 20 shares cluster 3 with the seed, 24 opens cluster 4
    all.filter(col("vec_id").isin(20L, 24L))
      .write.mode("overwrite").parquet(src)
    val q = EmbeddingIngest.run(
      spark.readStream.schema(spark.read.parquet(src).schema).parquet(src),
      "vec_id", "embedding", wh, "f", idx, ck, Dim)
    q.processAllAvailable(); q.stop()
    assert(wh.read("f").get.select("vec_id").as[Long].collect().toSet ==
      Set(24L))
  }
}
