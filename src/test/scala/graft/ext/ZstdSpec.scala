package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** zstd (RFC 8878) decoder conformance. The load-bearing check is the
  * SYSTEM `zstd` CLI cross-check (the system-tar precedent): frames
  * produced by the reference implementation at several compression
  * levels — exercising FSE-compressed Huffman weights, 4-stream
  * literals, fresh/repeat sequence tables, RLE blocks and repeat
  * offsets — must decode byte-exact, and their XXH64 checksums are
  * verified on the way (so the checksum implementation is
  * reference-tested implicitly). Plus XXH64 published vectors, our
  * raw/RLE writer round trips, multi-frame/skippable walks, and the
  * corruption/truncation battery. */
class ZstdSpec extends AnyFunSuite {

  private val cli: String = Seq("/root/miniconda/bin/zstd",
    "/usr/bin/zstd", "/usr/local/bin/zstd", "/opt/homebrew/bin/zstd")
    .find(p => new java.io.File(p).canExecute)
    .getOrElse("zstd") // PATH fallback; tests fail loudly if absent

  private def cliCompress(data: Array[Byte], args: String*): Array[Byte] = {
    val in = java.io.File.createTempFile("zstdspec", ".bin")
    val out = new java.io.File(in.getPath + ".zst")
    try {
      java.nio.file.Files.write(in.toPath, data)
      val cmd = (Seq(cli, "-q", "-f") ++ args ++
        Seq(in.getPath, "-o", out.getPath))
      val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
      val rc = p.waitFor()
      assert(rc == 0, s"zstd CLI failed (rc=$rc) for args $args")
      java.nio.file.Files.readAllBytes(out.toPath)
    } finally { in.delete(); out.delete() }
  }

  // deterministic corpora spanning the entropy paths: repetitive text
  // (long matches + repeat offsets), small-alphabet (heavy Huffman),
  // structured binary, and incompressible-ish bytes (raw literals)
  private def corpora: Seq[(String, Array[Byte])] = Seq(
    "repetitive-text" -> {
      val sb = new StringBuilder
      val words = Array("alpha", "beta", "gamma", "delta", "epsilon")
      for (i <- 0 until 4000)
        sb.append(words(i % 5)).append(' ').append(words((i * 7) % 5))
          .append(if (i % 13 == 0) ".\n" else " ")
      sb.toString.getBytes("US-ASCII")
    },
    "small-alphabet" -> Array.tabulate[Byte](30000)(i =>
      ("aabcde" ((i * i + i / 7) % 6)).toByte),
    "structured-binary" -> Array.tabulate[Byte](25000)(i =>
      (((i / 64) * 31 + (i % 64) * 7) % 256).toByte),
    "noisy" -> {
      var x = 0x12345678L
      Array.fill[Byte](20000) {
        x = x * 6364136223846793005L + 1442695040888963407L
        (x >>> 33).toByte
      }
    },
    "tiny" -> "hello zstd".getBytes("US-ASCII"),
    "empty" -> Array.empty[Byte])

  test("CLI cross-check: reference frames at levels 1/3/9/19 decode " +
      "byte-exact (checksums verified on the way)") {
    for ((name, data) <- corpora; level <- Seq("-1", "-3", "-9", "-19")) {
      val frame = cliCompress(data, level)
      val dec = ZstdKernel.decode(frame)
      assert(dec != null, s"$name @$level: decode null")
      assert(dec.toSeq == data.toSeq, s"$name @$level: content mismatch")
    }
  }

  test("CLI cross-check, wide battery: 40 seeded corpora x high/ultra " +
      "levels and --long windows decode byte-exact") {
    val rnd = new scala.util.Random(20260816L)
    val words = Array("the", "of", "and", "data", "stream", "frame",
      "block", "entropy", "sequence", "match", "offset", "literal")
    for (i <- 0 until 40) {
      val shape = i % 4
      val size = 2000 + rnd.nextInt(120000)
      val data: Array[Byte] = shape match {
        case 0 => // natural-ish text
          val sb = new StringBuilder
          while (sb.length < size)
            sb.append(words(rnd.nextInt(words.length))).append(' ')
          sb.toString.take(size).getBytes("US-ASCII")
        case 1 => // runs + structure (RLE blocks, long matches)
          val b = new Array[Byte](size)
          var p = 0
          while (p < size) {
            val run = 1 + rnd.nextInt(200)
            val v = rnd.nextInt(8).toByte
            var j = 0
            while (j < run && p < size) { b(p) = v; p += 1; j += 1 }
          }
          b
        case 2 => // periodic binary (repeat offsets)
          Array.tabulate[Byte](size)(j => ((j % 97) * 3).toByte)
        case _ => // incompressible
          val b = new Array[Byte](size); rnd.nextBytes(b); b
      }
      val args = (i % 5) match {
        case 0 => Seq("-19")
        case 1 => Seq("--ultra", "-22")
        case 2 => Seq("-12", "--long=24")
        case 3 => Seq("-5")
        case _ => Seq("-1", "--no-check")
      }
      val frame = cliCompress(data, args: _*)
      val dec = ZstdKernel.decode(frame)
      assert(dec != null, s"corpus $i (${args.mkString(" ")}): null")
      assert(java.util.Arrays.equals(dec, data),
        s"corpus $i (${args.mkString(" ")}): content mismatch")
    }
  }

  test("CLI cross-check: --no-check frames (no checksum field) decode") {
    for ((name, data) <- corpora.take(3)) {
      val frame = cliCompress(data, "-3", "--no-check")
      val dec = ZstdKernel.decode(frame)
      assert(dec != null && dec.toSeq == data.toSeq, name)
    }
  }

  test("multi-frame concatenation and skippable frames walk") {
    val a = corpora(0)._2
    val b = corpora(1)._2
    val fa = cliCompress(a, "-5")
    val fb = cliCompress(b, "-5")
    val skippable = Array[Byte](0x52, 0x2A, 0x4D, 0x18, 6, 0, 0, 0,
      1, 2, 3, 4, 5, 6)
    val dec = ZstdKernel.decode(fa ++ skippable ++ fb)
    assert(dec != null && dec.toSeq == (a ++ b).toSeq)
    // a skippable frame alone holds no content frame: null, not empty
    assert(ZstdKernel.decode(skippable) == null)
  }

  test("XXH64 published vectors") {
    assert(ZstdKernel.xxh64(Array.empty[Byte], 0, 0, 0L) ==
      0xEF46DB3751D8E999L)
    val abc = "abc".getBytes("US-ASCII")
    assert(ZstdKernel.xxh64(abc, 0, 3, 0L) == 0x44BC2CF5AD770999L)
  }

  test("our raw/RLE writer round-trips through both our decoder and " +
      "the reference CLI") {
    for (seed <- 0L to 8L; nBlocks <- Seq(1, 2, 5)) {
      val frame = ZstdKernel.encodeFixture(seed, nBlocks)
      val dec = ZstdKernel.decode(frame)
      assert(dec != null, s"seed=$seed n=$nBlocks")
      // replay the documented contract
      val expect = new java.io.ByteArrayOutputStream()
      for (j <- 0 until nBlocks) {
        if (j % 2 == 0) {
          val n = (10 + (seed + 7L * j) % 50).toInt
          for (k <- 0 until n)
            expect.write(((seed * 11 + j * 13 + k * 5) % 256).toInt)
        } else {
          val n = (5 + (seed + j) % 90).toInt
          val v = ((seed * 7 + 3L * j) % 256).toInt
          for (_ <- 0 until n) expect.write(v)
        }
      }
      assert(dec.toSeq == expect.toByteArray.toSeq)
      // the reference CLI accepts our frames byte-for-byte
      val in = java.io.File.createTempFile("zstdfix", ".zst")
      val out = new java.io.File(in.getPath + ".out")
      try {
        java.nio.file.Files.write(in.toPath, frame)
        val p = new ProcessBuilder(cli, "-q", "-f", "-d", in.getPath,
          "-o", out.getPath).redirectErrorStream(true).start()
        assert(p.waitFor() == 0, "reference CLI rejected our frame")
        assert(java.nio.file.Files.readAllBytes(out.toPath).toSeq ==
          dec.toSeq)
      } finally { in.delete(); out.delete() }
    }
    // encodeRaw, incl. the empty body
    for (data <- Seq(Array.empty[Byte], "xyz".getBytes,
      Array.tabulate[Byte](200000)(i => (i * 7).toByte))) {
      val dec = ZstdKernel.decode(ZstdKernel.encodeRaw(data))
      assert(dec != null && dec.toSeq == data.toSeq)
    }
  }

  test("corruption battery: flipped bytes in reference frames never " +
      "throw and never ship altered content") {
    val data = corpora(0)._2
    val frame = cliCompress(data, "-3")
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 400) {
      val m = frame.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      val dec = ZstdKernel.decode(m)
      // the checksum (or the parse) must catch any content change
      assert(dec == null || dec.toSeq == data.toSeq)
    }
    for (cut <- 0 until frame.length)
      assert(ZstdKernel.decode(java.util.Arrays.copyOf(frame, cut)) ==
        null)
  }

  test("dictionary frames and junk are rejected, not guessed") {
    assert(ZstdKernel.decode(null) == null)
    assert(ZstdKernel.decode(Array.empty[Byte]) == null)
    assert(ZstdKernel.decode("not zstd at all, honest".getBytes) == null)
    // a frame declaring a dictionary id nulls (no dictionary support)
    val dict = java.io.File.createTempFile("zdict", ".bin")
    try {
      // build a trivial dictionary via the CLI and compress with it
      val sample = corpora(0)._2
      val dir = java.nio.file.Files.createTempDirectory("zs").toFile
      val samples = (0 until 16).map { i =>
        val f = new java.io.File(dir, s"s$i.txt")
        java.nio.file.Files.write(f.toPath,
          java.util.Arrays.copyOfRange(sample, i * 500, i * 500 + 500))
        f
      }
      val tr = new ProcessBuilder((Seq(cli, "-q", "-f", "--train") ++
        samples.map(_.getPath) ++ Seq("-o", dict.getPath)): _*)
        .redirectErrorStream(true).start()
      if (tr.waitFor() == 0) {
        val framed = cliCompress(sample, "-3", "-D", dict.getPath)
        assert(ZstdKernel.decode(framed) == null,
          "dictionary frame must null, not misdecode")
      } // trainer can fail on tiny corpora: the reject path is still
        // covered by the FHD dictionary-id bits in hostile fuzzing
      samples.foreach(_.delete()); dir.delete()
    } finally dict.delete()
  }

  test("HTTP integration: Content-Encoding zstd round-trips; corrupt " +
      "zstd bodies null") {
    val body = Array.tabulate[Byte](300)(i => ((i * 37) % 256).toByte)
    val wire = HttpKernel.encode(200, "text/html", body,
      chunked = false, gzipBody = false, zstdBody = true)
    val r = HttpKernel.parse(wire)
    assert(r != null && r.body.toSeq == body.toSeq)
    // chunked + zstd stack like chunked + gzip
    val wire2 = HttpKernel.encode(200, "text/html", body,
      chunked = true, gzipBody = false, zstdBody = true)
    val r2 = HttpKernel.parse(wire2)
    assert(r2 != null && r2.body.toSeq == body.toSeq)
    // flip a byte inside the frame: verified-or-nothing
    val bad = wire.clone()
    bad(bad.length - 9) = (bad(bad.length - 9) ^ 0x7F).toByte
    assert(HttpKernel.parse(bad) == null)
    // a reference-CLI body under the token decodes too
    val cliBody = cliCompress(body, "-19")
    val wire3 = ("HTTP/1.1 200 OK\r\nContent-Encoding: zstd\r\n" +
      s"Content-Length: ${cliBody.length}\r\n\r\n").getBytes("US-ASCII") ++
      cliBody
    val r3 = HttpKernel.parse(wire3)
    assert(r3 != null && r3.body.toSeq == body.toSeq)
  }
}
