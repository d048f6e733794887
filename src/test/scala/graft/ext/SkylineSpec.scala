package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SkylineSpec extends SparkTestBase {
  import spark.implicits._

  test("front2d: hand-checked dominance, ties on one dim, duplicates collapse") {
    // points: (1,9) (5,5) (9,1) form the front; (4,4) dominated by (5,5);
    // (5,3) dominated by (5,5) via the x-tie; duplicate (5,5) collapses
    val pts = Seq((1.0, 9.0), (5.0, 5.0), (9.0, 1.0), (4.0, 4.0),
      (5.0, 3.0), (5.0, 5.0)).map { case (x, y) => ("g", x, y) }
      .toDF("grp", "x", "y")
    val got = Skyline.front2d(pts, "grp", "x", "y")
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("g", 100L, 900L), ("g", 500L, 500L), ("g", 900L, 100L)))
  }

  test("front2d matches the brute-force dominance definition per group") {
    val pts = (1 to 400).map(i =>
      ((i % 3).toString, (i * 37 % 101).toDouble, (i * 53 % 97).toDouble))
      .toDF("grp", "x", "y")
    val got = Skyline.front2d(pts, "grp", "x", "y")
      .as[(String, Long, Long)].collect().toSet
    val raw = (1 to 400).map(i =>
      ((i % 3).toString, (i * 37 % 101).toLong * 100, (i * 53 % 97).toLong * 100))
      .distinct
    val brute = raw.filter { case (g, x, y) =>
      !raw.exists { case (g2, x2, y2) =>
        g2 == g && x2 >= x && y2 >= y && (x2 > x || y2 > y) }
    }.toSet
    assert(got == brute)
  }

  test("a single point and a totally ordered chain") {
    val one = Seq(("g", 3.0, 4.0)).toDF("grp", "x", "y")
    assert(Skyline.front2d(one, "grp", "x", "y").count() == 1L)
    // chain (1,1) < (2,2) < (3,3): only the top survives
    val chain = Seq((1.0, 1.0), (2.0, 2.0), (3.0, 3.0))
      .map { case (x, y) => ("g", x, y) }.toDF("grp", "x", "y")
    val got = Skyline.front2d(chain, "grp", "x", "y")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("g", 300L, 300L)))
  }
}
