package graft.ext

import graft.SparkTestBase

import org.apache.spark.sql.functions._

/** PNG textual metadata: round trip (tEXt, zlib-deflated zTXt, iTXt
  * plain and compressed), CRC enforcement, pixel-path transparency,
  * ImageIO cross-reads, and the DF verb. */
class PngTextSpec extends SparkTestBase {
  import spark.implicits._

  private def base: Array[Byte] =
    PngKernel.encodeGray(9, 8, (x, y) => (x * 7 + y * 3) % 256, _ => 0)

  test("tEXt/zTXt/iTXt round-trip; pixels and ImageIO are undisturbed") {
    val itxtBody = "Caption".getBytes("ISO-8859-1") ++
      Array[Byte](0, 0, 0) ++ "en".getBytes ++ Array[Byte](0) ++
      Array[Byte](0) ++ "hello caption".getBytes("UTF-8")
    val itxt = {
      val bos = new java.io.ByteArrayOutputStream()
      def w4(v: Long): Unit = { bos.write(((v >> 24) & 0xFF).toInt)
        bos.write(((v >> 16) & 0xFF).toInt); bos.write(((v >> 8) & 0xFF).toInt)
        bos.write((v & 0xFF).toInt) }
      w4(itxtBody.length.toLong); bos.write("iTXt".getBytes, 0, 4)
      bos.write(itxtBody, 0, itxtBody.length)
      val crc = new java.util.zip.CRC32()
      crc.update("iTXt".getBytes); crc.update(itxtBody)
      w4(crc.getValue)
      bos.toByteArray
    }
    val png = PngTextKernel.withText(base, Seq(
      PngTextKernel.chunk("tEXt", "Author", "jane doe", deflate = false),
      PngTextKernel.chunk("zTXt", "Description", "a long deflated note",
        deflate = true),
      itxt))
    val es = PngTextKernel.entries(png)
    assert(es != null && es.length == 3)
    assert(es(0).key == "Author" && es(0).value == "jane doe")
    assert(es(1).key == "Description" && es(1).value == "a long deflated note")
    assert(es(2).key == "Caption" && es(2).value == "hello caption")
    // the text chunks are transparent to the pixel paths
    val g = PngKernel.decodeGray(png)
    assert(g != null && g.luma.toSeq == PngKernel.decodeGray(base).luma.toSeq)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img != null && img.getWidth == 9)
    // a plain PNG has zero entries, ok (not null)
    assert(PngTextKernel.entries(base).toSeq == Seq())
  }

  test("a flipped bit in a text chunk fails its CRC -> null; dirty " +
      "magic -> null; the DF verb surfaces planted rows") {
    val png = PngTextKernel.withText(base, Seq(
      PngTextKernel.chunk("tEXt", "Author", "x", deflate = false)))
    val bad = png.clone()
    bad(33 + 9) = (bad(33 + 9) ^ 0x20).toByte // inside the tEXt chunk
    assert(PngTextKernel.entries(bad) == null)
    assert(PngTextKernel.entries("not png".getBytes) == null)
    assert(PngTextKernel.entries(null) == null)
    val docs = spark.range(1, 7).select(col("id").as("doc_id"))
    val out = Multimodal.pngTextEntries(
      docs.select(col("doc_id").as("media_id"),
        PngWithTextEncode(col("doc_id"), lit(9L), lit(8L)).as("content")))
      .orderBy("media_id", "key").collect()
    assert(out.length == 12)
    for (r <- out) {
      val s = r.getLong(0)
      if (r.getString(1) == "Author") assert(r.getString(2) == s"author-${s % 9}")
      else assert(r.getString(1) == "Description" &&
        r.getString(2) == s"desc-${s % 6}")
    }
  }

  test("FDICT zlib stream in a zTXt chunk nulls out instead of hanging; " +
      "a walk that runs off the end without IEND is a partial read -> null") {
    // CRC-valid zTXt whose zlib header sets FDICT (CMF=0x78 FLG=0x20 passes
    // the %31 check): Inflater stalls at 0 with needsDictionary()=true —
    // the loop must bail, not spin.
    val body = "K".getBytes("ISO-8859-1") ++ Array[Byte](0, 0) ++
      Array(0x78, 0x20, 0x01, 0x02, 0x03, 0x04, 0x63, 0x00).map(_.toByte)
    val bos = new java.io.ByteArrayOutputStream()
    def w4(v: Long): Unit = { bos.write(((v >> 24) & 0xFF).toInt)
      bos.write(((v >> 16) & 0xFF).toInt); bos.write(((v >> 8) & 0xFF).toInt)
      bos.write((v & 0xFF).toInt) }
    w4(body.length.toLong); bos.write("zTXt".getBytes, 0, 4)
    bos.write(body, 0, body.length)
    val crc = new java.util.zip.CRC32()
    crc.update("zTXt".getBytes); crc.update(body)
    w4(crc.getValue)
    val png = PngTextKernel.withText(base, Seq(bos.toByteArray))
    val done = new java.util.concurrent.CountDownLatch(1)
    @volatile var res: Array[PngTextKernel.Entry] = Array(
      PngTextKernel.Entry("sentinel", ""))
    val t = new Thread(() => { res = PngTextKernel.entries(png)
      done.countDown() })
    t.setDaemon(true); t.start()
    assert(done.await(10, java.util.concurrent.TimeUnit.SECONDS),
      "entries() hung on an FDICT zlib stream")
    assert(res == null)
    // truncation: drop the IEND chunk — previously returned the partial
    // entry list with ok=true; verified-or-nothing demands null
    val withTxt = PngTextKernel.withText(base, Seq(
      PngTextKernel.chunk("tEXt", "Author", "x", deflate = false)))
    assert(PngTextKernel.entries(withTxt.dropRight(12)) == null)
  }
}
