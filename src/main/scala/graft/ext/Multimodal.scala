package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media as opaque `binary` content + typed
  * metadata struct, with decode/feature-extraction as partition-batched
  * transforms (the Scala analog of `mapInPandas` batch UDFs).
  *
  * Container-level decode is REAL: [[decodePngMeta]] parses the PNG
  * signature + IHDR chunk (width/height/bit-depth/color-type, big-endian
  * integer fields) and verifies the chunk CRC — pure byte arithmetic over
  * codegen'd builtins (`substring`/`hex`/`conv`/`crc32`), no codec
  * library, no UDF. Pixel-level decode (inflating IDAT) would need a
  * codec the sandbox lacks; [[extractFeatures]]' byte-histogram features
  * are computed over the raw bytes instead — a real, deterministic
  * featurizer, just not a pixel decoder.
  */
object Multimodal {

  /** Canonical multimodal schema: id + opaque bytes + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("n_bytes", LongType),
      StructField("tag", StringType))))))

  /** Wrap a text table as a media table (bytes = utf-8 of text) — the
    * testdata has no binary media, so documents stand in. */
  def asMedia(docs: DataFrame, idCol: String, textCol: String,
      tagCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "utf-8").as("content"),
      struct(lit("text/plain").as("format"),
        octet_length(encode(col(textCol), "utf-8")).cast("long").as("n_bytes"),
        col(tagCol).as("tag")).as("meta"))

  /** Frame sampling: split the opaque content into fixed-size byte frames
    * and keep every `every`-th one — the video-keyframe execution shape
    * (one output row per sampled frame, explode-fanout, all declarative:
    * the per-frame slice is a codegen'd binary substring, no UDF). With a
    * real container format the frame boundaries come from the codec index
    * instead of fixed offsets; the plumbing — fanout, ordering, per-frame
    * metadata — is identical. */
  def frameSample(media: DataFrame, frameBytes: Int = 64,
      every: Int = 2): DataFrame = {
    require(frameBytes > 0 && every > 0, "frameBytes and every must be positive")
    val nBytes = col("meta.n_bytes")
    val nFrames = ceil(nBytes.cast("double") / frameBytes).cast("long")
    media
      .withColumn("frame_idx",
        explode(when(nFrames > 0, sequence(lit(0L), nFrames - 1))
          .otherwise(array().cast("array<bigint>"))))
      .filter(col("frame_idx") % every === 0)
      .select(col("media_id"), col("frame_idx"),
        expr(s"substring(content, frame_idx * $frameBytes + 1, $frameBytes)")
          .as("frame"))
  }

  // ---------------- PNG container codec (header-level) ----------------

  /** 4-byte big-endian encoding of an integer column (PNG's integer
    * wire format): zero-padded hex -> bytes. */
  private def be4(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    unhex(lpad(hex(c.cast("long")), 8, "0"))

  /** Big-endian integer decode of `len` bytes of `content` at 1-based
    * `pos`. */
  private def beInt(pos: Int, len: Int): org.apache.spark.sql.Column =
    conv(hex(expr(s"substring(content, $pos, $len)")), 16, 10).cast("long")

  private val pngSigHex = "89504E470D0A1A0A"
  // 00 00 00 00 "IEND" + the IEND CRC (constant: crc32 over "IEND")
  private val iendHex = "0000000049454E44AE426082"

  /** Assemble a minimal standards-layout PNG: signature, IHDR chunk
    * (13-byte payload: width, height, bit depth 8, color type 2 =
    * truecolor, compression/filter/interlace 0) with its real CRC-32
    * (computed over chunk type + payload, per the PNG spec), and an IEND
    * chunk. No IDAT — header-complete, pixel-free; the deterministic
    * fixture generator for [[decodePngMeta]]. Fully declarative: every
    * step is a codegen'd builtin, so synthesis runs distributed. */
  def syntheticPng(df: DataFrame, idCol: String, widthCol: String,
      heightCol: String): DataFrame = {
    val ihdrPayload = concat(
      be4(col(widthCol)), be4(col(heightCol)),
      unhex(lit("0802000000"))) // depth 8, truecolor, defaults
    // 49484452 = "IHDR"; the CRC covers chunk type + payload (PNG spec §5.3)
    val typeAndData = concat(unhex(lit("49484452")), ihdrPayload)
    val ihdrChunk = concat(be4(lit(13)), typeAndData, be4(crc32(typeAndData)))
    df.select(col(idCol).cast("long").as("media_id"),
      concat(unhex(lit(pngSigHex)), ihdrChunk, unhex(lit(iendHex)))
        .as("content"))
  }

  /** Parse PNG container metadata from the raw bytes: signature check,
    * IHDR width/height/bit-depth/color-type (big-endian fields at fixed
    * offsets — the IHDR chunk MUST be first per the PNG spec), and CRC
    * verification of the IHDR chunk (crc32 over bytes 13..29: type +
    * payload, compared to the stored CRC at bytes 30..33). Non-PNG
    * content yields sig_ok=false with null fields — decode never throws
    * on dirty data (the 100 TB crawl reality). All codegen'd builtins;
    * the scan stays in one WholeStageCodegen span. */
  def decodePngMeta(media: DataFrame): DataFrame = {
    val sigOk = hex(expr("substring(content, 1, 8)")) === lit(pngSigHex)
    val typeOk = hex(expr("substring(content, 13, 4)")) === lit("49484452")
    val crcStored = beInt(30, 4)
    val crcComputed = crc32(expr("substring(content, 13, 17)"))
    val ok = sigOk && typeOk
    media.select(
      col("media_id"),
      ok.as("sig_ok"),
      when(ok, beInt(17, 4)).as("width"),
      when(ok, beInt(21, 4)).as("height"),
      when(ok, beInt(25, 1)).as("bit_depth"),
      when(ok, beInt(26, 1)).as("color_type"),
      when(ok, crcStored === crcComputed).otherwise(lit(false)).as("crc_ok"))
  }

  final case class MediaFeature(media_id: Long, n_bytes: Long, dim: Int,
      features: Array[Float])

  /** Deterministic fake "decode + feature extract": byte histogram folded
    * into `dim` buckets, L1-normalized. STUB — replace with a real codec
    * for production media. Runs partition-batched: one feature buffer per
    * partition, no per-row allocation churn, the same execution shape a
    * real decoder needs. */
  def extractFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val out: Dataset[MediaFeature] = media
      .select(col("media_id"), col("content"), col("meta.n_bytes").as("n_bytes"))
      .mapPartitions { rows =>
        val buf = new Array[Float](dim) // reused per batch element
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val nb = r.getLong(2)
          java.util.Arrays.fill(buf, 0.0f)
          var i = 0
          while (i < bytes.length) { buf((bytes(i) & 0xff) % dim) += 1.0f; i += 1 }
          val total = math.max(1, bytes.length).toFloat
          val feats = new Array[Float](dim)
          var j = 0
          while (j < dim) { feats(j) = buf(j) / total; j += 1 }
          MediaFeature(id, nb, dim, feats)
        }
      }
    out.toDF()
  }
}
