package graft.ext

import graft.SparkTestBase

import org.apache.spark.sql.functions._

/** The WebDataset-shard (tar) leg: member walk against the planted
  * contract, system-tar cross-check (both directions where the binary
  * exists), .tar.gz transparency, the shard→triage→decode composition,
  * and checksum/truncation rejection. */
class TarSpec extends SparkTestBase {
  import spark.implicits._

  test("encode -> members replays the planted contract; .tar.gz " +
      "parses identically") {
    val plain = TarKernel.members(TarKernel.encode(5L, 4), 4096)
    assert(plain != null && plain.length == 4)
    for (m <- plain) {
      assert(m.name == s"shard/doc-${m.idx}.bin")
      assert(m.size == 10 + (5 + m.idx * 7) % 100)
      val want = Array.tabulate(m.size.toInt)(j =>
        ((5 * 13 + m.idx * 29 + j * 7) % 256).toLong)
      assert(m.byteSum == want.sum && m.firstByte == want(0))
    }
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(TarKernel.encode(5L, 4)); g.close()
    val gz = TarKernel.members(bos.toByteArray, 4096)
    assert(gz != null && gz.length == 4)
    for ((p, z) <- plain.zip(gz))
      assert(p.copy(payload = null).toString == z.copy(payload = null).toString &&
        p.payload.toSeq == z.payload.toSeq)
  }

  test("system tar reads our archives and we read system tar's") {
    val tarBin = new java.io.File("/bin/tar")
    val tarBin2 = new java.io.File("/usr/bin/tar")
    assume(tarBin.exists || tarBin2.exists, "no tar binary on this host")
    val dir = graft.TempDirs.scratchDir("tar_x").toFile
    // ours -> system tar -t
    val ours = new java.io.File(dir, "ours.tar")
    java.nio.file.Files.write(ours.toPath, TarKernel.encode(2L, 3))
    val list = new ProcessBuilder("tar", "-tf", ours.getAbsolutePath)
      .redirectErrorStream(true).start()
    val names = new String(list.getInputStream.readAllBytes()).trim
    assert(list.waitFor() == 0, s"tar -tf failed: $names")
    assert(names.split("\n").toSeq ==
      (0 until 3).map(i => s"shard/doc-$i.bin"))
    // system tar's archive -> our walk
    val payloadDir = new java.io.File(dir, "in"); payloadDir.mkdirs()
    val f1 = new java.io.File(payloadDir, "a.txt")
    java.nio.file.Files.write(f1.toPath, "hello tar".getBytes)
    val f2 = new java.io.File(payloadDir, "b.bin")
    java.nio.file.Files.write(f2.toPath, Array.tabulate(600)(_.toByte))
    val theirs = new java.io.File(dir, "theirs.tar")
    val mk = new ProcessBuilder("tar", "-cf", theirs.getAbsolutePath,
      "-C", payloadDir.getAbsolutePath, "a.txt", "b.bin")
      .redirectErrorStream(true).start()
    assert(mk.waitFor() == 0)
    val ms = TarKernel.members(
      java.nio.file.Files.readAllBytes(theirs.toPath), 4096)
    assert(ms != null && ms.length == 2)
    assert(ms(0).name == "a.txt" && ms(0).size == 9L)
    assert(new String(ms(0).payload) == "hello tar")
    assert(ms(1).name == "b.bin" && ms(1).size == 600L)
    assert(ms(1).payload.toSeq == Array.tabulate(600)(_.toByte).toSeq)
  }

  test("a shard member image decodes: tar -> triage -> pixel stats; " +
      "corrupt checksum / truncation / junk reject") {
    val png = PngKernel.encodeGray(9, 8, (x, y) => (x * 7 + y * 3) % 256,
      _ => 0)
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(TarKernel.header("0001.png", png.length.toLong))
    bos.write(png)
    bos.write(new Array[Byte](((png.length + 511) / 512) * 512 - png.length))
    bos.write(new Array[Byte](1024))
    val shard = Seq((1L, bos.toByteArray)).toDF("media_id", "content")
    val members = Multimodal.tarMembers(shard)
    val payloads = members.select(col("media_id"),
      col("name"), col("payload").as("content"))
    assert(Multimodal.mediaTriage(payloads.select(col("media_id"),
      col("content"))).collect()(0).getString(1) == "png")
    val stats = Multimodal.mixedImageContentStats(payloads
      .select(col("media_id"), col("content"))).collect()(0)
    assert(stats.getBoolean(1) && stats.getLong(2) == 9L)
    // signed-checksum interop: historic writers summed SIGNED header
    // bytes; a name with a high-bit byte makes the conventions differ —
    // GNU tar accepts both, so must members()
    val signedHdr = TarKernel.header("caf?.bin", 4L)
    signedHdr(3) = 0xE9.toByte // 'é' (ISO-8859-1) in the name field
    java.util.Arrays.fill(signedHdr, 148, 156, ' '.toByte)
    var sSum = 0L
    for (i <- 0 until 512) sSum += signedHdr(i) // SIGNED bytes
    for ((c, i) <- f"$sSum%06o".zipWithIndex) signedHdr(148 + i) = c.toByte
    signedHdr(154) = 0; signedHdr(155) = ' '
    val sBos = new java.io.ByteArrayOutputStream()
    sBos.write(signedHdr); sBos.write("data".getBytes)
    sBos.write(new Array[Byte](512 - 4)); sBos.write(new Array[Byte](1024))
    val sMs = TarKernel.members(sBos.toByteArray, 16)
    assert(sMs != null && sMs.length == 1 && sMs(0).size == 4L)
    // rejection battery
    val good = TarKernel.encode(1L, 2)
    val badSum = good.clone(); badSum(150) = 'x'.toByte
    assert(TarKernel.members(badSum, 4096) == null)
    assert(TarKernel.members(good.take(600), 4096) == null) // truncated member
    assert(TarKernel.members("tiny".getBytes, 4096) == null)
    assert(TarKernel.members(good, 1) == null) // member cap
    assert(MediaKind.sniff(good) == "tar")
  }
}
