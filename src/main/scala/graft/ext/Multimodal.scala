package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media as opaque `binary` content + typed
  * metadata struct, with decode/feature-extraction as partition-batched
  * transforms (the Scala analog of `mapInPandas` batch UDFs).
  *
  * The decode step is a clearly-marked deterministic STUB (no image/audio
  * codecs in this environment — builder prompt); the Spark-side plumbing —
  * schema, batch iteration, partitioning, output shape — is real and
  * tested. Swapping `decodeStub` for a JNI/codec call is the only change
  * needed for real media.
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
