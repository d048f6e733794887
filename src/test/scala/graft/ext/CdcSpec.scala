package graft.ext

import graft.SparkTestBase

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class CdcSpec extends SparkTestBase {
  import spark.implicits._

  private def blob(seed: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(i =>
      Math.floorMod(seed * 31 + i.toLong * 17 + (i.toLong * i % 251),
        256L).toByte)

  test("kernel: rolling boundary hash == direct per-window fold; " +
      "boundary rate tracks the mask") {
    val bytes = blob(5L, 4096)
    val bs = CdcKernel.boundaries(bytes, maskBits = 8)
    // direct recompute of every window
    val direct = (CdcKernel.W - 1 until bytes.length).filter { i =>
      (CdcKernel.fold(bytes, i - CdcKernel.W + 1, i + 1) & 255L) == 0L
    }
    assert(bs.toSeq == direct)
    assert(bs.length >= 4 && bs.length <= 64) // ~4096/256 expected
  }

  test("chunks partition the input exactly; chunk hash is the fold of " +
      "the chunk's own bytes; empty input -> no chunks") {
    val bytes = blob(9L, 2000)
    val cs = CdcKernel.chunks(bytes, maskBits = 8)
    assert(cs.head._1 == 0 && cs.map(_._2).sum == 2000)
    cs.foreach { case (off, len, h) =>
      assert(h == CdcKernel.fold(bytes, off, off + len))
    }
    assert(cs.sliding(2).forall {
      case Array((o1, l1, _), (o2, _, _)) => o1 + l1 == o2
      case _ => true
    })
    assert(CdcKernel.chunks(Array.emptyByteArray, 8).isEmpty)
  }

  test("insertion robustness — the point of CDC: a junk prefix " +
      "re-aligns, fixed tiles lose everything") {
    val a = blob(3L, 3000)
    val b = blob(77L, 7) ++ a // 7 inserted bytes at the front
    val ca = CdcKernel.chunks(a, 8).map(_._3).toSet
    val cb = CdcKernel.chunks(b, 8).map(_._3).toSet
    val sharedCdc = ca.intersect(cb).size
    assert(sharedCdc >= (ca.size * 3) / 4,
      s"CDC shared only $sharedCdc of ${ca.size}")
    // fixed 256-byte tiles: the 7-byte shift kills every tile hash
    def tiles(x: Array[Byte]) = x.grouped(256).filter(_.length == 256)
      .map(t => CdcKernel.fold(t, 0, t.length)).toSet
    assert(tiles(a).intersect(tiles(b)).isEmpty)
  }

  private def media(rows: Seq[(Long, Long, Int)]): DataFrame =
    rows.toDF("media_id", "seed", "n")
      .select(col("media_id"),
        FormulaBlobEncode(col("seed"), col("n")).as("content"))

  test("chunkRows: chash matches the kernel, csha matches sha2 of the " +
      "slice; NULL content contributes nothing") {
    val df = media(Seq((1L, 4L, 1500))).unionByName(
      Seq((2L, null.asInstanceOf[Array[Byte]])).toDF("media_id", "content"))
    val rows = Cdc.chunkRows(df).orderBy("media_id", "chunk_idx")
      .as[(Long, Long, Long, Long, Long, String)].collect()
    assert(rows.forall(_._1 == 1L))
    val bytes = blob(4L, 1500)
    val expect = CdcKernel.chunks(bytes, 8)
    assert(rows.length == expect.length)
    rows.zip(expect).foreach { case ((_, _, off, len, h, sha), (eo, el, eh)) =>
      assert(off == eo && len == el && h == eh)
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val want = md.digest(bytes.slice(eo, eo + el))
        .map("%02x".format(_)).mkString
      assert(sha == want)
    }
  }

  test("chunkDedup finds the planted copies with min-(id, idx) keepers; " +
      "sharedChunkPairs links shifted documents") {
    // 2, 4 are byte-identical; 6 is 2 with a junk prefix (insertion)
    val base = media(Seq((2L, 5L, 2000), (4L, 5L, 2000), (9L, 8L, 2000)))
    val shifted = media(Seq((6L, 5L, 2000)))
      .select(col("media_id"),
        concat(FormulaBlobEncode(lit(99L), lit(11)), col("content"))
          .as("content"))
    val all = base.unionByName(shifted)
    val dup = Cdc.chunkDedup(all)
      .select("n_copies", "keep_media").as[(Long, Long)].collect()
    assert(dup.nonEmpty && dup.forall(_._2 == 2L)) // keeper is min id 2
    assert(dup.exists(_._1 >= 3L)) // 2, 4 and 6's tail share chunks
    val pairs = Cdc.sharedChunkPairs(all)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(pairs.contains((2L, 4L)) && pairs.contains((2L, 6L)) &&
      pairs.contains((4L, 6L)))
    assert(!pairs.exists(p => p._1 == 9L || p._2 == 9L))
  }
}
