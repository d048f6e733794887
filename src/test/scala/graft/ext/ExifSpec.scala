package graft.ext

import graft.SparkTestBase

import org.apache.spark.sql.functions._

/** The EXIF leg: APP1/TIFF-IFD round trip against the planted field
  * contract, pixel-decode transparency (APP1 must not disturb the
  * T.81 path or ImageIO), a hand-built big-endian EXIF block, marker
  * walks past other APPn segments, and hostile-byte rejection. */
class ExifSpec extends SparkTestBase {
  import spark.implicits._

  test("withExif round-trips all four fields; the pixel path and " +
      "ImageIO are undisturbed by the APP1 block") {
    val base = JpegKernel.encodeGrayBlocks(2, 2, (bx, by) => bx * 50 + by * 20)
    val exifd = ExifKernel.withExif(base, "CAM-3", "MODEL-5", 6,
      "2017:04:09 12:34:56")
    val x = ExifKernel.extract(exifd)
    assert(x != null && x.make == "CAM-3" && x.model == "MODEL-5" &&
      x.orientation == 6 && x.dateTime == "2017:04:09 12:34:56")
    // pixels identical with and without the APP1 segment
    val g0 = JpegKernel.decodeGrayY(base)
    val g1 = JpegKernel.decodeGrayY(exifd)
    assert(g1 != null && g1.luma.toSeq == g0.luma.toSeq)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(exifd))
    assert(img != null && img.getWidth == 16 && img.getHeight == 16)
  }

  test("a hand-built BIG-endian EXIF block extracts; other APPn " +
      "segments are walked past; EXIF-less and dirty bytes reject") {
    val base = JpegKernel.encodeGrayBlocks(1, 1, (_, _) => 7)
    // big-endian TIFF with ONLY orientation (SHORT inline: value in
    // the FIRST two bytes of the field in BE)
    def be2(v: Int) = Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def be4(v: Long) = Array(((v >> 24) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    val tiff = Array[Byte]('M', 'M') ++ be2(42) ++ be4(8L) ++
      be2(1) ++ // one tag
      be2(0x0112) ++ be2(3) ++ be4(1) ++ be2(8) ++ be2(0) ++
      be4(0L)
    val payload = Array[Byte]('E', 'x', 'i', 'f', 0, 0) ++ tiff
    val seg = Array(0xFF.toByte, 0xE1.toByte,
      (((payload.length + 2) >> 8) & 0xFF).toByte,
      ((payload.length + 2) & 0xFF).toByte) ++ payload
    // an XMP-style APP1 (not Exif) BEFORE it: must be walked past
    val xmp = "http://ns.adobe.com/xap/1.0/".getBytes
    val xmpSeg = Array(0xFF.toByte, 0xE1.toByte,
      (((xmp.length + 2) >> 8) & 0xFF).toByte,
      ((xmp.length + 2) & 0xFF).toByte) ++ xmp
    val jpeg = base.take(2) ++ xmpSeg ++ seg ++ base.drop(2)
    val x = ExifKernel.extract(jpeg)
    assert(x != null && x.orientation == 8 && x.make == null)
    // EXIF-less, dirty, truncated
    assert(ExifKernel.extract(base) == null)
    assert(ExifKernel.extract(null) == null)
    assert(ExifKernel.extract("not a jpeg".getBytes) == null)
    val exifd = ExifKernel.withExif(base, "A", "B", 1, "2001:01:01 00:00:00")
    assert(ExifKernel.extract(exifd.take(12)) == null)
  }

  test("orient: hand-pinned transforms, inverse identity, and " +
      "orientation-normalized hashing collapses rotation variance") {
    // stored [A B; C D] (w=2, h=2)
    val g = PngKernel.Gray(2, 2, Array(10, 20, 30, 40))
    def px(gg: PngKernel.Gray) = (gg.width, gg.height, gg.luma.toSeq)
    assert(px(ExifKernel.orient(g, 1)) == ((2, 2, Seq(10, 20, 30, 40))))
    assert(px(ExifKernel.orient(g, 2)) == ((2, 2, Seq(20, 10, 40, 30))))
    assert(px(ExifKernel.orient(g, 3)) == ((2, 2, Seq(40, 30, 20, 10))))
    assert(px(ExifKernel.orient(g, 4)) == ((2, 2, Seq(30, 40, 10, 20))))
    assert(px(ExifKernel.orient(g, 5)) == ((2, 2, Seq(10, 30, 20, 40))))
    // rot90CW of [A B; C D] is [C A; D B]
    assert(px(ExifKernel.orient(g, 6)) == ((2, 2, Seq(30, 10, 40, 20))))
    assert(px(ExifKernel.orient(g, 7)) == ((2, 2, Seq(40, 20, 30, 10))))
    assert(px(ExifKernel.orient(g, 8)) == ((2, 2, Seq(20, 40, 10, 30))))
    // a non-square strip: rot90CW moves the left end to the top
    val strip = PngKernel.Gray(2, 1, Array(7, 9))
    assert(px(ExifKernel.orient(strip, 6)) == ((1, 2, Seq(7, 9))))
    // inverse identity over every orientation
    val r = PngKernel.Gray(3, 2, Array(1, 2, 3, 4, 5, 6))
    for (o <- 1 to 8)
      assert(px(ExifKernel.orient(
        ExifKernel.orient(r, ExifKernel.inverseOrientation(o)), o)) == px(r),
        s"o=$o")
    // four camera rotations of ONE picture -> ONE fingerprint
    val docs = spark.range(0, 4).select(col("id").as("doc_id"))
    val media = docs.select(col("doc_id").as("media_id"),
      OrientedJpegEncode(lit(9L), lit(6L), lit(4L),
        when(col("doc_id") === 0, 1L).when(col("doc_id") === 1, 3L)
          .when(col("doc_id") === 2, 6L).otherwise(8L)).as("content"))
    val hs = Multimodal.orientedImageContentStats(media)
      .select("ahash").as[Long].collect().toSet
    assert(hs.size == 1, s"rotation variance survived: $hs")
    // without normalization the same four bytes hash apart
    val raw = Multimodal.jpegContentStats(media)
      .select("ahash").as[Long].collect().toSet
    assert(raw.size == 4)
  }

  test("exifMeta over a mixed corpus: planted fields come back row by " +
      "row; EXIF-less rows keep ok=false") {
    val docs = spark.range(0, 12).select(col("id").as("doc_id"))
    val media = docs.select(col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0,
        BlockJpegEncode(col("doc_id") % 5, lit(1L), lit(1L)))
        .otherwise(ExifJpegEncode(col("doc_id") % 5, lit(1L), lit(1L)))
        .as("content"))
    val out = Multimodal.exifMeta(media).orderBy("media_id").collect()
    assert(out.length == 12)
    for (r <- out) {
      val id = r.getLong(0); val s = id % 5
      if (id % 3 == 0) assert(!r.getBoolean(1) && r.isNullAt(2))
      else {
        assert(r.getBoolean(1))
        assert(r.getString(2) == s"CAM-${s % 5}")
        assert(r.getString(3) == s"MODEL-${s % 7}")
        assert(r.getLong(4) == 1 + s % 8)
        assert(r.getString(5) ==
          f"${2000 + s % 26}%04d:${1 + s % 12}%02d:${1 + s % 28}%02d 12:34:56")
      }
    }
  }
}
