package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer training (Kudo '18, "Subword Regularization" —
  * the SentencePiece unigram model), hard-EM form, beside [[Bpe]] as
  * the second of the two standard subword families.
  *
  * The corpus never drives per-occurrence work: everything trains over
  * the DISTINCT word-type table (the [[Bpe]] discipline — a 100 TB
  * corpus has a bounded type table), and documents re-join the per-type
  * segmentation by word. Scores are integer micro-units
  * (`floor(log10(p)·1e6)` — floor of an identical double is identical
  * on every engine), so the Viterbi DP compares exact LONGs and the
  * whole train/encode pipeline replays bit-for-bit in SQL.
  *
  * Hard EM (Viterbi-EM): the E-step segments each type with the current
  * scores (one native [[UnigramSegment]] pass per type), the M-step
  * recounts pieces over those one-best segmentations with add-one
  * smoothing over the FIXED vocab set (no piece ever hits log 0, and
  * the piece set stays stable across rounds — [[prune]] shrinks it
  * explicitly between rounds when wanted). Soft EM (forward-backward
  * expected counts) changes the counts, not the shape.
  */
object Unigram {

  /** Distinct word types with corpus frequencies — the only frame the
    * trainer ever scans repeatedly. */
  def types(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** Every substring of `w` with length 1..maxLen, with multiplicity
    * (the seed-candidate enumeration). HOF over nested sequences —
    * interpreted lambdas re-evaluate per element, so this is strictly
    * a TYPE-TABLE-sized operation (vocab-bounded), never corpus-sized. */
  private[ext] def allSubstrings(w: Column, maxLen: Int): Column =
    flatten(transform(sequence(lit(1), lit(maxLen)), l =>
      when(length(w) >= l,
        transform(sequence(lit(0), length(w) - l), i => w.substr(i + 1, l)))
        .otherwise(array().cast("array<string>"))))

  /** Seed vocabulary: substring candidates weighted by type frequency
    * per occurrence; ALL single characters are kept (segmentation
    * closure — every word must stay segmentable), plus the top
    * `maxVocab - |singles|` multi-char pieces by (weight desc, piece).
    * Scores: micro log10 of weight / total-selected-weight.
    * Columns: (piece, weight, score_micro). */
  def seedVocab(df: DataFrame, textCol: String, maxPieceLen: Int = 4,
      maxVocab: Int = 100): DataFrame =
    seedFromTypes(types(df, textCol), maxPieceLen, maxVocab)

  /** [[seedVocab]] over an already-built (word, cnt) type table — lets
    * [[train]] reuse ONE persisted type table for seeding and every EM
    * round instead of re-running the corpus-scale explode+count per
    * consumer. The candidate table is persisted too: the singles count
    * (an action) and the singles/multis union both read it. */
  private def seedFromTypes(t: DataFrame, maxPieceLen: Int,
      maxVocab: Int): DataFrame = {
    require(maxPieceLen >= 1, s"maxPieceLen=$maxPieceLen must be >= 1")
    require(maxVocab >= 1, s"maxVocab=$maxVocab must be >= 1")
    val cand = t
      .select(explode(allSubstrings(col("word"), maxPieceLen)).as("piece"),
        col("cnt"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("weight"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val singles = cand.filter(length(col("piece")) === 1)
    // alphabet-bounded driver scalar (same stance as the k-means k)
    val nSingles = singles.count()
    val nMulti = math.max(0, maxVocab - nSingles).toInt
    val multis = cand.filter(length(col("piece")) > 1)
      .orderBy(col("weight").desc, col("piece")).limit(nMulti)
    rescore(singles.unionByName(multis))
  }

  /** micro-log10 scores over the (piece, weight) frame: one 1-row total
    * broadcast, floor-quantized LONG scores. */
  private def rescore(pw: DataFrame): DataFrame = {
    val tot = pw.agg(sum(col("weight")).as("__W"))
    pw.crossJoin(broadcast(tot))
      .select(col("piece"), col("weight"),
        floor(log10(col("weight").cast("double") / col("__W").cast("double"))
          * lit(1e6)).cast("long").as("score_micro"))
  }

  /** One hard-EM round over a FIXED piece set: Viterbi-segment every
    * type with the current scores, recount pieces weighted by type
    * frequency, add-one smooth, rescore. The vocab (≤ maxVocab rows)
    * is collected to the driver for the segmenter — the bounded-model
    * stance every trainer here shares (k-means centroids, BPE merges). */
  def emRound(typesDf: DataFrame, vocab: DataFrame,
      unkMicro: Long = UnkMicro): DataFrame = {
    val vseq = collectVocab(vocab)
    val seg = typesDf.select(col("word"), col("cnt"),
      UnigramSegment(col("word"), vseq, unkMicro).as("path"))
    val counts = seg
      .select(explode(col("path")).as("piece"), col("cnt"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("__c"))
    rescore(vocab.select(col("piece"))
      .join(counts, Seq("piece"), "left")
      .select(col("piece"),
        (coalesce(col("__c"), lit(0L)) + lit(1L)).as("weight")))
  }

  /** Drop the weakest multi-char pieces, keeping all singles (closure)
    * and the top `keep` others by (weight desc, piece). */
  def prune(vocab: DataFrame, keep: Int): DataFrame = {
    val singles = vocab.filter(length(col("piece")) === 1)
    val multis = vocab.filter(length(col("piece")) > 1)
      .orderBy(col("weight").desc, col("piece")).limit(keep)
    rescore(singles.unionByName(multis).select(col("piece"), col("weight")))
  }

  /** Seed + `rounds` hard-EM rounds. (piece, weight, score_micro).
    *
    * The type table is persisted ONCE and feeds seeding plus every EM
    * round (the corpus-scale explode+count used to re-run per round —
    * and, via plan-cache substitution, a later [[encodeDocs]] over the
    * same corpus reuses it too). Each round's vocab (≤ maxVocab rows)
    * is localCheckpointed: the next round references it from both its
    * collect and its recount join, and an unmaterialized chain re-runs
    * every earlier round's segmentation per reference. Scores are
    * identical either way (exact LONG arithmetic throughout). */
  def train(df: DataFrame, textCol: String, maxPieceLen: Int = 4,
      maxVocab: Int = 100, rounds: Int = 2): DataFrame = {
    require(rounds >= 0, s"rounds=$rounds must be >= 0")
    val t = types(df, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var v = seedFromTypes(t, maxPieceLen, maxVocab)
    (0 until rounds).foreach { _ => v = emRound(t, v).localCheckpoint(true) }
    v
  }

  /** Encode documents with a trained vocab: per document the word
    * count, total piece count, and summed micro log-prob (the unigram
    * analog of [[NgramLm.score]]'s logprob_micro). Distinct words
    * segment ONCE; documents re-join per-word stats by word — the
    * corpus never re-segments per occurrence. */
  def encodeDocs(df: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, unkMicro: Long = UnkMicro): DataFrame = {
    val vseq = collectVocab(vocab)
    val t = types(df, textCol)
    val seg = t.select(col("word"),
      UnigramSegment(col("word"), vseq, unkMicro).as("path"))
    val scores = vocab.select(col("piece"), col("score_micro"))
    val wordStats = seg
      .select(col("word"), explode(col("path")).as("piece"))
      .join(scores, Seq("piece"), "left")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("__np"),
        sum(coalesce(col("score_micro"), lit(unkMicro))).as("__lp"))
    df.select(col(idCol), explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .join(wordStats, Seq("word"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("__np")).as("n_pieces"),
        sum(col("__lp")).as("logprob_micro"))
  }

  /** Default unknown-single-char score: log10(1e-9) in micro-units —
    * far below any trained piece, never taken when the char is known. */
  val UnkMicro: Long = -9000000L

  private def collectVocab(vocab: DataFrame): Seq[(String, Long)] =
    vocab.select(col("piece"), col("score_micro"))
      .orderBy(col("piece"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq

  /** Column form of the Viterbi segmenter for ad-hoc use. */
  def segment(word: Column, vocab: Seq[(String, Long)],
      unkMicro: Long = UnkMicro): Column =
    UnigramSegment(word, vocab, unkMicro)
}

/** Viterbi segmentation of one word under micro-integer unigram scores:
  * best[p] = max over pieces w[j..p) in vocab of best[j] + score;
  * ties prefer the SMALLEST j (the longest final piece) — the exact
  * order a `ROW_NUMBER() OVER (ORDER BY best DESC, j ASC)` replay
  * picks. Unknown single characters fall back to `unkMicro`, so every
  * word is segmentable even off-vocabulary. One pass, O(len · maxLen),
  * exact LONG arithmetic. */
case class UnigramSegment(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    vocab: Seq[(String, Long)], unkMicro: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.types._
  import org.apache.spark.unsafe.types.UTF8String

  @transient private lazy val scores: Map[String, Long] = vocab.toMap
  @transient private lazy val maxPieceLen: Int =
    if (vocab.isEmpty) 1 else vocab.map(_._1.length).max

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unigram_segment requires string, got $other")
  }

  override def nullable: Boolean = child.nullable

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input) match {
      case null => null
      case s =>
        val w = s.asInstanceOf[UTF8String].toString
        val n = w.length
        if (n == 0) return new GenericArrayData(Array.empty[Any])
        val best = new Array[Long](n + 1)
        val back = new Array[Int](n + 1)
        java.util.Arrays.fill(back, -1)
        best(0) = 0L
        var p = 1
        while (p <= n) {
          var chosen = Long.MinValue
          var cj = -1
          var j = math.max(0, p - maxPieceLen)
          while (j < p) {
            if (back(j) != -1 || j == 0) {
              val piece = w.substring(j, p)
              val sc = scores.get(piece) match {
                case Some(v) => v
                case None => if (p - j == 1) unkMicro else Long.MinValue
              }
              if (sc != Long.MinValue) {
                val cand = best(j) + sc
                // strict > keeps the smallest j among equals (j ascends)
                if (cj == -1 || cand > chosen) { chosen = cand; cj = j }
              }
            }
            j += 1
          }
          best(p) = chosen; back(p) = cj
          p += 1
        }
        // backtrack (always reachable: single chars are always scoreable)
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var q = n
        while (q > 0) { out.prepend(w.substring(back(q), q)); q = back(q) }
        new GenericArrayData(
          out.toArray.map(UTF8String.fromString(_).asInstanceOf[Any]))
    }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : UnigramSegment = copy(child = newChild)

  override def prettyName: String = "unigram_segment"
}

object UnigramSegment {
  def apply(c: Column, vocab: Seq[(String, Long)], unkMicro: Long): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      new UnigramSegment(
        org.apache.spark.sql.graftbridge.Bridge.expression(c), vocab, unkMicro))
}
