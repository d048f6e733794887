package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class KCoreSpec extends SparkTestBase {
  import spark.implicits._

  test("planted forest-on-ring: trees peel, exactly the ring survives at degree 4") {
    val core = KCore.run(Fixtures.plantedCore(spark), "src", "dst", k = 3)
      .orderBy($"node").as[(Long, Long)].collect()
    val base = 20 * 31
    assert(core.map(_._1).toSeq == (base until base + 20).map(_.toLong),
      "the 20 ring nodes and nothing else")
    assert(core.forall(_._2 == 4L), "ring degree: successor + skip chords, both directions")
  }

  test("k=1 keeps every non-isolated node; oversized k empties the graph") {
    val g = Fixtures.plantedCore(spark)
    val n1 = KCore.run(g, "src", "dst", k = 1).count()
    assert(n1 == 20L * 31 + 20, "every node has an edge, all survive at k=1")
    assert(KCore.run(g, "src", "dst", k = 5).isEmpty,
      "no 5-core anywhere in the planted graph")
  }

  test("star graph collapses entirely at k=2: leaves peel, then the hub") {
    val star = (1L to 30L).map(i => (0L, i)).toDF("src", "dst")
    assert(KCore.run(star, "src", "dst", k = 2).isEmpty)
    // but a plain ring IS its own 2-core
    val ring = (0L until 12L).map(i => (i, (i + 1) % 12)).toDF("src", "dst")
    val r = KCore.run(ring, "src", "dst", k = 2).as[(Long, Long)].collect()
    assert(r.length == 12 && r.forall(_._2 == 2L))
  }

  test("scale shape: per-round work is hash-agg + semi-joins, no cartesian") {
    val g = Fixtures.plantedCore(spark)
    // one peel round's plan (degree filter + endpoint restriction)
    val sym = g.select($"src".cast("long").as("a"), $"dst".cast("long").as("b"))
      .unionAll(g.select($"dst".cast("long").as("a"), $"src".cast("long").as("b")))
      .filter($"a" =!= $"b").distinct()
    val keep = sym.groupBy($"a").agg(count(lit(1)).as("deg"))
      .filter($"deg" >= 3).select($"a")
    val round = sym.join(keep, Seq("a"), "left_semi")
      .join(keep.select($"a".as("b")), Seq("b"), "left_semi")
    val plan = round.queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      "peel rounds must stay equi-join shaped:\n" + plan.take(500))
  }
}
