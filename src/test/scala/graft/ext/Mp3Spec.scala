package graft.ext

import graft.SparkTestBase

import org.apache.spark.sql.functions._

/** The MP3 metadata leg: frame-size table arithmetic against the
  * planted header contract, ID3v2.3/2.4 tag parsing, clean-stop vs
  * dirty-stop semantics, the triage sniff, and the DF verb. */
class Mp3Spec extends SparkTestBase {
  import spark.implicits._

  test("encode -> parse replays the documented header contract") {
    val m = Mp3Kernel.parse(Mp3Kernel.encode(5L, 7, "T", "A", "B"), 4096)
    assert(m != null && m.frames == 7 && m.samplesTotal == 7 * 1152L)
    assert(m.sampleRate == Mp3Kernel.SampleRates((5 % 3).toInt))
    val expect = (0 until 7).map { i =>
      val br = Mp3Kernel.BitrateKbps((1 + (5 + i) % 14).toInt)
      144 * (br * 1000) / m.sampleRate + ((5 + i) % 2).toInt
    }.sum
    assert(m.bytesAudio == expect)
    assert(m.title == "T" && m.artist == "A" && m.album == "B")
  }

  test("ID3v2.4 syncsafe frame sizes parse; tag-less streams parse " +
      "with null tags; hostile bytes reject, trailing junk clean-stops") {
    val base = Mp3Kernel.encode(2L, 3, "X", "Y", "Z")
    // strip the ID3 block: bare frame chain, tags null
    val id3Len = 10 + (((base(6) & 0x7F) << 21) | ((base(7) & 0x7F) << 14) |
      ((base(8) & 0x7F) << 7) | (base(9) & 0x7F))
    val bare = base.drop(id3Len)
    val m = Mp3Kernel.parse(bare, 4096)
    assert(m != null && m.frames == 3 && m.title == null)
    // hand-build a v2.4 block (syncsafe frame size) around the chain
    val v = "HELLO".getBytes("ISO-8859-1")
    val body = Array(0.toByte) ++ v
    val fr = "TIT2".getBytes ++ Array[Byte](0, 0, 0, body.length.toByte,
      0, 0) ++ body // syncsafe == plain for tiny sizes
    val hdr = Array[Byte]('I', 'D', '3', 4, 0, 0,
      0, 0, 0, fr.length.toByte)
    val v24 = hdr ++ fr ++ bare
    val m24 = Mp3Kernel.parse(v24, 4096)
    assert(m24 != null && m24.title == "HELLO" && m24.frames == 3)
    // trailing junk AFTER complete frames: clean stop, frames kept
    val junked = bare ++ "0 not a sync".getBytes
    val mj = Mp3Kernel.parse(junked, 4096)
    assert(mj != null && mj.frames == 3)
    // truncated mid-frame / non-MP3 / frame cap / mixed rates reject
    assert(Mp3Kernel.parse(bare.take(bare.length - 10), 4096) == null)
    assert(Mp3Kernel.parse("random text".getBytes, 4096) == null)
    assert(Mp3Kernel.parse(null, 4096) == null)
    assert(Mp3Kernel.parse(bare, 2) == null)
    // a 48 kHz frame appended to the 32 kHz chain: mixed rates reject
    val frame48 = Array(0xFF.toByte, 0xFB.toByte,
      ((1 << 4) | (1 << 2)).toByte, 0.toByte) ++
      Array.fill(144 * 32000 / 48000 - 4)(0.toByte)
    assert(Mp3Kernel.parse(bare ++ frame48, 4096) == null)
  }

  test("the triage sniff tags mp3 (ID3-led and bare-sync); the DF " +
      "verb surfaces tags and duration columns") {
    assert(MediaKind.sniff(Mp3Kernel.encode(1L, 2, "t", "a", "b")) == "mp3")
    val bare = {
      val b = Mp3Kernel.encode(1L, 2, "t", "a", "b")
      val id3Len = 10 + (((b(6) & 0x7F) << 21) | ((b(7) & 0x7F) << 14) |
        ((b(8) & 0x7F) << 7) | (b(9) & 0x7F))
      b.drop(id3Len)
    }
    assert(MediaKind.sniff(bare) == "mp3")
    val docs = spark.range(1, 5).select(col("id").as("doc_id"))
    val out = Multimodal.mp3Meta(
      Multimodal.syntheticMp3Corpus(docs, "doc_id", col("doc_id"), lit(4)))
      .orderBy("media_id").collect()
    assert(out.length == 4 && out.forall(_.getBoolean(1)))
    for (r <- out) {
      val s = r.getLong(0)
      assert(r.getLong(2) == 4L && r.getLong(3) == 4 * 1152L)
      assert(r.getString(6) == s"TITLE-${s % 13}")
      assert(r.getString(7) == s"ARTIST-${s % 11}")
      assert(r.getString(8) == s"ALBUM-${s % 7}")
    }
  }
}
