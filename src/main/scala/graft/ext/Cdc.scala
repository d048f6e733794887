package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Content-defined chunking (CDC) — byte-level dedup for BINARY
  * columns, the insertion-robust complement of the word-tile text
  * substring dedup: chunk boundaries are cut where a rolling hash of
  * the last [[CdcKernel.W]] bytes matches a mask, so inserting or
  * deleting bytes re-aligns every boundary past the edit and the
  * unchanged tail dedups chunk-for-chunk (fixed tiles lose ALL
  * alignment after one inserted byte). The shape of LBFS
  * (Muthitacharoen '01) and Gear/FastCDC (Xia '16), re-expressed for
  * a SQL engine:
  *
  *  - chunking is ONE native expression per row — a zero-shuffle
  *    linear scan, O(1)/byte via the rolling window update;
  *  - chunk identity keys are 8-byte integers mod 2^61−1, so the
  *    dedup groupBy shuffles 8-byte keys, never payloads (the
  *    binaryExactDedup discipline, at sub-file granularity);
  *  - all arithmetic is EXACT int64 (Mersenne-prime modulus — the
  *    wrap-mod-2^64 of classic Gear cannot be replayed by engines
  *    whose BIGINT overflow throws), so a DuckDB list_reduce replays
  *    every boundary and every chunk hash bit-for-bit.
  *
  * The pure form is deliberately STATELESS (no min/max chunk-length
  * normalization): the boundary set is a pure function of local
  * content, which is what makes both the oracle replay and the
  * incremental/streaming story exact. FastCDC-style normalization is
  * a policy layer a caller can add by merging small chunks AFTER the
  * cut — it never has to live inside the boundary rule. For
  * production identity keys, [[Cdc.chunkRows]] also emits sha256 over
  * the chunk bytes (Spark-native, engine-side only). */
object CdcKernel {

  /** Mersenne prime 2^61 − 1: multiply-free Horner updates stay inside
    * int64 in every engine. */
  val M: Long = (1L << 61) - 1

  /** Boundary locality window (bytes): a boundary decision sees exactly
    * the last W bytes, nothing else — the CDC locality guarantee. */
  val W: Int = 32

  /** Per-byte mixing table, replayable as a SQL comprehension:
    * G[b] = (b·2654435761 + 98765) mod 2147483647 (values < 2^31). */
  val G: Array[Long] =
    Array.tabulate(256)(b => (b.toLong * 2654435761L + 98765L) % 2147483647L)

  private val P31: Long = 1L << (W - 1) // 2^(W-1) < M

  /** Horner fold h → (2h + G[b]) mod M over `bytes[from, until)`. */
  def fold(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0L
    var i = from
    while (i < until) {
      h = (2 * h + G(bytes(i) & 0xFF)) % M
      i += 1
    }
    h
  }

  /** Boundary positions: i (W−1 ≤ i < n) such that the window hash of
    * bytes (i−W+1 .. i] matches the mask — the chunk CUT sits after i.
    * O(1)/byte rolling update; ChunkSpec pins parity with the direct
    * per-window [[fold]]. */
  def boundaries(bytes: Array[Byte], maskBits: Int): Array[Int] = {
    val n = bytes.length
    val mask = (1L << maskBits) - 1
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    if (n < W) return out.toArray
    var h = fold(bytes, 0, W)
    if ((h & mask) == 0L) out += (W - 1)
    var i = W
    while (i < n) {
      // drop byte i−W (leading coefficient 2^(W−1)), shift, add byte i
      val lead = G(bytes(i - W) & 0xFF) * P31 % M
      val sub = (h - lead + M) % M
      h = (2 * sub + G(bytes(i) & 0xFF)) % M
      if ((h & mask) == 0L) out += i
      i += 1
    }
    out.toArray
  }

  /** (off, len, hash) chunks partitioning [0, n): cuts after every
    * boundary position plus the end of input. hash = [[fold]] over the
    * chunk's own bytes. Empty input → zero chunks. */
  def chunks(bytes: Array[Byte], maskBits: Int): Array[(Int, Int, Long)] = {
    val n = bytes.length
    if (n == 0) return Array.empty
    val bs = boundaries(bytes, maskBits)
    val cuts = (bs.map(_ + 1) :+ n).distinct // boundary at n−1 == end
    val out = new Array[(Int, Int, Long)](cuts.length)
    var off = 0
    var c = 0
    while (c < cuts.length) {
      val end = cuts(c)
      out(c) = (off, end - off, fold(bytes, off, end))
      off = end
      c += 1
    }
    out
  }
}

/** Content-defined chunks of a binary column: array of
  * (off, len, chash) structs per row ([[CdcKernel.chunks]]). NULL
  * content → NULL; empty content → empty array. One zero-shuffle pass. */
case class CdcChunks(child: Expression, maskBits: Int)
    extends UnaryExpression with CodegenFallback {
  require(maskBits >= 1 && maskBits <= 30, s"bad maskBits $maskBits")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("off", LongType, nullable = false),
    StructField("len", LongType, nullable = false),
    StructField("chash", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks requires binary, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    new GenericArrayData(CdcKernel.chunks(bytes, maskBits).map {
      case (off, len, h) => InternalRow(off.toLong, len.toLong, h)
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)

  override def prettyName: String = "cdc_chunks"
}

object CdcChunks {
  def apply(c: Column, maskBits: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      CdcChunks(org.apache.spark.sql.graftbridge.Bridge.expression(c),
        maskBits))
}

/** Deterministic byte-blob fixture: b(i) = (seed·31 + i·17 + (i·i mod
  * 251)) mod 256 — the CDC twin of the mdat byte formula, replayable
  * as one SQL comprehension. */
case class FormulaBlobEncode(seed: Expression, nBytes: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(seed, nBytes)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c => c.dataType == LongType || c.dataType == IntegerType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "formula_blob requires integer children")

  override def eval(input: InternalRow): Any = {
    val s = seed.eval(input); val n = nBytes.eval(input)
    if (s == null || n == null) return null
    val sv = s match { case i: java.lang.Integer => i.longValue(); case l: java.lang.Long => l.longValue() }
    val nv = n match { case i: java.lang.Integer => i.longValue(); case l: java.lang.Long => l.longValue() }
    if (nv < 0 || nv > (1L << 24)) return null
    val out = new Array[Byte](nv.toInt)
    var i = 0
    while (i < out.length) {
      out(i) = (Math.floorMod(sv * 31 + i.toLong * 17 + (i.toLong * i % 251),
        256L)).toByte
      i += 1
    }
    out
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FormulaBlobEncode =
    FormulaBlobEncode(newChildren(0), newChildren(1))

  override def prettyName: String = "formula_blob"
}

object FormulaBlobEncode {
  def apply(seed: Column, nBytes: Column): Column = {
    val b = org.apache.spark.sql.graftbridge.Bridge
    b.column(FormulaBlobEncode(b.expression(seed), b.expression(nBytes)))
  }
}

object Cdc {

  /** One row per chunk: (media_id, chunk_idx, off, len, chash, csha) —
    * chash is the replayable mod-(2^61−1) Horner key, csha the
    * production-strength sha256 over the chunk bytes (Spark-native
    * substring + sha2, engine-side). Rows with NULL content contribute
    * nothing. */
  def chunkRows(media: DataFrame, maskBits: Int = 8): DataFrame =
    media
      .select(col("media_id"), col("content"),
        posexplode(CdcChunks(col("content"), maskBits))
          .as(Seq("chunk_idx", "ch")))
      .select(col("media_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("ch.off").as("off"), col("ch.len").as("len"),
        col("ch.chash").as("chash"),
        sha2(expr("substring(content, CAST(ch.off + 1 AS INT), " +
          "CAST(ch.len AS INT))"), 256).as("csha"))

  /** Chunk-level dedup: one row per chunk-content group with ≥ minCopies
    * members — (chash, len, n_copies, keep_media, keep_idx), keeper =
    * lexicographic-min (media_id, chunk_idx). The shuffle moves 8-byte
    * keys + counts; payload bytes never move. */
  def chunkDedup(media: DataFrame, maskBits: Int = 8,
      minCopies: Long = 2L): DataFrame = {
    val rows = chunkRows(media, maskBits)
    rows.groupBy(col("chash"), col("len"))
      .agg(count(lit(1)).as("n_copies"),
        min(struct(col("media_id"), col("chunk_idx"))).as("__k"))
      .filter(col("n_copies") >= minCopies)
      .select(col("chash"), col("len"), col("n_copies"),
        col("__k.media_id").as("keep_media"),
        col("__k.chunk_idx").as("keep_idx"))
  }

  /** (chash, n_refs) chunk-content index of a corpus — the unit table
    * the streaming [[graft.streaming.CdcScrub]] probes (occurrence
    * counts, not doc counts — a doc repeating a chunk contributes each
    * instance, the tileIndex convention). */
  def chunkIndex(df: DataFrame, idCol: String, contentCol: String,
      maskBits: Int = 8): DataFrame =
    df.select(explode(CdcChunks(col(contentCol), maskBits)).as("ch"))
      .groupBy(col("ch.chash").as("chash"))
      .agg(count(lit(1)).as("n_refs"))

  /** Incremental chunk-duplication stats of an arriving batch against
    * (indexed corpus ∪ the batch itself): per doc, how many of its
    * content-defined chunks already exist anywhere — the binary-stream
    * twin of [[Dedup.tileDuplicationIncremental]]. A batch chunk is
    * duplicated iff its batch occurrences plus its indexed n_refs
    * exceed one. Output (idCol, n_chunks, dup_chunks, dup_ratio_micro)
    * — the ratio in exact integer micro-units (dup·10^6 div n, floor;
    * never a rounded double quotient), NULL-content rows scoring
    * (0, 0, NULL). Cost O(batch) + one 8-byte-keyed join against the
    * (bloom-prunable) index. */
  def chunkDupIncremental(batch: DataFrame, idCol: String,
      contentCol: String, index: DataFrame, maskBits: Int = 8): DataFrame = {
    val rows = batch.select(col(idCol),
      explode_outer(CdcChunks(col(contentCol), maskBits)).as("ch"))
      .select(col(idCol), col("ch.chash").as("__h"))
    val counts = rows.filter(col("__h").isNotNull)
      .groupBy(col("__h")).agg(count(lit(1)).as("__bc"))
      .join(index.select(col("chash").as("__h"), col("n_refs").as("__ic")),
        Seq("__h"), "left")
      .select(col("__h"),
        (col("__bc") + coalesce(col("__ic"), lit(0L))).as("__cnt"))
    rows.join(counts, Seq("__h"), "left")
      .groupBy(col(idCol))
      .agg(count(col("__h")).as("n_chunks"),
        count(when(col("__cnt") > 1, lit(1))).as("dup_chunks"))
      .select(col(idCol), col("n_chunks"), col("dup_chunks"),
        when(col("n_chunks") > 0,
          expr("dup_chunks * 1000000 DIV n_chunks"))
          .as("dup_ratio_micro"))
  }

  /** Corpus-level storage-savings estimate of chunk dedup — the number
    * a lake team sizes a chunk store with: one row
    * (total_bytes, unique_bytes, savings_micro) where total counts
    * every chunk instance, unique one copy per distinct chunk content,
    * and savings_micro = (total − unique)·10^6 div total (exact
    * integers). Two aggregations over 8-byte keys; payload bytes never
    * move. */
  def dedupSavings(media: DataFrame, maskBits: Int = 8): DataFrame = {
    val rows = media
      .select(explode(CdcChunks(col("content"), maskBits)).as("ch"))
      .select(col("ch.chash").as("chash"), col("ch.len").as("len"))
    rows.agg(sum(col("len")).as("total_bytes"))
      .crossJoin(rows.distinct()
        .agg(sum(col("len")).as("unique_bytes")))
      .select(col("total_bytes"), col("unique_bytes"),
        when(col("total_bytes") > 0,
          expr("(total_bytes - unique_bytes) * 1000000 DIV total_bytes"))
          .as("savings_micro"))
  }

  /** Document pairs sharing ≥ minShared chunk contents (i < j) with the
    * shared count — the binary-payload overlap detector (inverted index
    * on chunk hash, never all-pairs; hashes seen in ≥ maxDf documents
    * are dropped first — the df-cap that keeps boilerplate chunks from
    * going quadratic, the n-gram dedup discipline). */
  def sharedChunkPairs(media: DataFrame, maskBits: Int = 8,
      minShared: Long = 1L, maxDf: Long = 64L): DataFrame = {
    val byDoc = chunkRows(media, maskBits)
      .select(col("media_id"), col("chash"), col("len")).distinct()
    val rare = byDoc.groupBy("chash", "len")
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDf)
      .select("chash", "len")
    val posting = byDoc.join(rare, Seq("chash", "len"))
    posting.as("a").join(posting.as("b"),
        col("a.chash") === col("b.chash") && col("a.len") === col("b.len") &&
          col("a.media_id") < col("b.media_id"))
      .groupBy(col("a.media_id").as("i"), col("b.media_id").as("j"))
      .agg(count(lit(1)).as("shared_chunks"))
      .filter(col("shared_chunks") >= minShared)
  }
}
