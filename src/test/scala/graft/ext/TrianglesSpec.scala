package graft.ext

import graft.SparkTestBase

import org.apache.spark.sql.DataFrame

class TrianglesSpec extends SparkTestBase {
  import spark.implicits._

  private def edges(es: (Long, Long)*): DataFrame = es.toDF("src", "dst")

  private def counts(df: DataFrame): Map[Long, Long] =
    Triangles.perNode(df).as[(Long, Long)].collect().toMap

  test("K4: four triangles, every node in three") {
    val k4 = edges((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L))
    assert(counts(k4) == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("star graph has none; self-loops, duplicates, reverses don't inflate") {
    val star = edges((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
    assert(counts(star).isEmpty)
    val messy = edges(
      (0L, 1L), (1L, 0L), (0L, 1L),  // duplicate + reverse
      (1L, 2L), (2L, 0L),
      (2L, 2L))                      // self-loop
    assert(counts(messy) == Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }

  test("matches a brute-force count on a pseudo-random graph") {
    val rnd = new scala.util.Random(23)
    val es = (0 until 300).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val got = counts(edges(es: _*))
    // brute force over canonical undirected pairs
    val und = es.map { case (a, b) => (a min b, a max b) }
      .filter { case (a, b) => a != b }.toSet
    val nodes = und.flatMap { case (a, b) => Seq(a, b) }.toSeq.sorted
    val brute = (for {
      a <- nodes; b <- nodes if a < b && und((a, b))
      c <- nodes if b < c && und((b, c)) && und((a, c))
    } yield Seq(a, b, c)).flatten
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    assert(got == brute)
  }
}
