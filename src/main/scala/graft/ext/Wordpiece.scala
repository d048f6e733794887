package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece tokenizer (Schuster & Nakajima, ICASSP 2012; the BERT
  * tokenizer of Devlin et al. 2019) — the third standard subword family
  * beside BPE ([[Bpe]]) and unigram-LM ([[Unigram]]), completing the
  * tokenizer-construction surface a pretraining pipeline chooses from.
  *
  * TRAINING is BPE's merge loop with a different argmax: instead of the
  * raw pair count, WordPiece merges the pair maximizing the likelihood
  * gain `count(ab) / (count(a) · count(b))` — the merge that most
  * increases a unigram LM's corpus likelihood. The loop therefore
  * reuses [[Bpe]]'s distributed shape verbatim (corpus collapses once
  * to the weighted unique-word table; per round one pair-count
  * hash-agg, here plus one symbol-count hash-agg off the same table,
  * one 1-row argmax to the driver, one literal-parameterized fold
  * rewrite). The score compares as
  * `floor((log10 c_ab − log10 c_a − log10 c_b) · 1e6)` LONG micro-units
  * — the repo-wide cross-engine log discipline ([[NgramLm]]) — with
  * ties broken (score DESC, a ASC, b ASC), so replays are exact.
  *
  * Symbols carry BERT's continuation marker: a word splits as
  * `[c₀, ##c₁, ##c₂, …]` and merging `(x, ##y)` produces `x‖y` with the
  * `##` of the RIGHT side stripped (continuation-ness is carried by the
  * left symbol). A piece therefore reads exactly like a BERT vocab
  * entry: `un`, `##able`.
  *
  * ENCODING is greedy longest-match-first against a finished VOCAB (the
  * algorithm BERT runs at inference — merge replay is not needed once
  * the vocab exists): at each position take the longest vocab piece
  * matching (plain pieces at word start, `##` pieces after); if no
  * piece matches, the WHOLE word becomes the unknown token (BERT
  * semantics — not a partial segmentation). [[WordpieceEncode]] is the
  * per-word native pass; [[encodeDocs]] segments each distinct word
  * TYPE once and re-joins documents by word, the [[Bpe]]/[[Unigram]]
  * corpus-encode discipline (the corpus never re-segments per
  * occurrence). */
object Wordpiece {

  /** Initial WordPiece symbols of a word: first char plain, every
    * subsequent char `##`-marked. */
  def initialSyms(word: Column): Column =
    transform(split(word, ""), (c, i) =>
      when(i === 0, c).otherwise(concat(lit("##"), c)))

  private def stripCont(s: String): String =
    if (s.startsWith("##")) s.substring(2) else s

  /** One merge rule (a, b) → a‖strip(b) applied greedily left-to-right
    * (the [[Bpe.applyMerge]] fold with the ##-aware product). */
  def applyMerge(syms: Column, a: String, b: String): Column = {
    val prod = a + stripCont(b)
    aggregate(
      Bpe.pairView(syms),
      struct(typedLit(Seq.empty[String]).as("out"), lit(false).as("skip")),
      (acc, p) =>
        when(acc.getField("skip"),
          struct(acc.getField("out").as("out"), lit(false).as("skip")))
        .when(p.getField("cur") === a && p.getField("nxt") === b,
          struct(concat(acc.getField("out"), array(lit(prod))).as("out"),
            lit(true).as("skip")))
        .otherwise(
          struct(concat(acc.getField("out"),
            array(p.getField("cur"))).as("out"),
            lit(false).as("skip"))),
      acc => acc.getField("out"))
  }

  /** Train `merges` likelihood-scored rules; returns the merge table
    * (step, sym_a, sym_b, cnt, score_micro) in training order. Stops
    * early if the corpus runs out of pairs. `minCount` is the standard
    * frequency cutoff: pairs below it never merge (without one, the
    * likelihood score degenerates to merging one-off symbol pairs first
    * — any count-1 pair of unique symbols scores a perfect 1).
    *
    * Scale note: this is the sequential one-driver-round-per-merge
    * loop. [[Bpe.trainBatched]]'s prefix-batching does NOT transfer:
    * its soundness rests on a merge only LOWERING other pairs' raw
    * counts, but merging (a,b) here also shrinks the unigram counts
    * c(a), c(b), which RAISES the likelihood score of every remaining
    * pair touching a or b — a candidate far below the barrier can jump
    * the queue, so no accepted prefix is provably final. The
    * large-merge-count route is a [[Bpe.trainLocal]]-style exact
    * driver chain over the collapsed type table (one distributed pass,
    * heap-backed rounds); at typical WordPiece vocab sizes trained
    * from a type table the sequential distributed loop is already
    * bounded by #merges small rounds. */
  def train(docs: DataFrame, textCol: String, merges: Int,
      minCount: Long = 1L): DataFrame = {
    require(merges > 0, s"merges=$merges must be positive")
    val spark = docs.sparkSession
    var cur = Bpe.wordTable(docs, textCol)
      .select(col("freq").cast("long").as("freq"),
        initialSyms(col("word")).as("syms"))
      .localCheckpoint(true)
    val learned =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long, Long)]
    var step = 1
    var exhausted = false
    while (step <= merges && !exhausted) {
      val uni = cur.select(col("freq"), explode(col("syms")).as("s"))
        .groupBy(col("s")).agg(sum(col("freq")).as("ucnt"))
      val best = cur
        .select(col("freq"), explode(Bpe.pairView(col("syms"))).as("p"))
        .filter(col("p.nxt").isNotNull)
        .groupBy(col("p.cur").as("a"), col("p.nxt").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .filter(col("cnt") >= minCount)
        .join(uni.select(col("s").as("a"), col("ucnt").as("ca")), Seq("a"))
        .join(uni.select(col("s").as("b"), col("ucnt").as("cb")), Seq("b"))
        .select(col("a"), col("b"), col("cnt"),
          floor((log10(col("cnt").cast("double")) -
            log10(col("ca").cast("double")) -
            log10(col("cb").cast("double"))) * lit(1e6))
            .cast("long").as("score_micro"))
        .orderBy(col("score_micro").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b) = (best(0).getString(0), best(0).getString(1))
        learned += ((step, a, b, best(0).getLong(2), best(0).getLong(3)))
        cur = cur.withColumn("syms", applyMerge(col("syms"), a, b))
          .localCheckpoint(true)
        step += 1
      }
    }
    import spark.implicits._
    learned.toSeq.toDF("step", "sym_a", "sym_b", "cnt", "score_micro")
  }

  /** The finished vocabulary of a training run: the corpus's initial
    * alphabet (plain first chars and `##` continuations, each a
    * guaranteed fallback for encodable words) plus every merge product
    * in training order. */
  def vocab(docs: DataFrame, textCol: String, mergeTable: DataFrame):
      DataFrame = {
    val alphabet = Bpe.wordTable(docs, textCol)
      .select(explode(initialSyms(col("word"))).as("piece")).distinct()
    val products = mergeTable.select(
      concat(col("sym_a"), when(col("sym_b").startsWith("##"),
        expr("substring(sym_b, 3)")).otherwise(col("sym_b"))).as("piece"))
      .distinct()
    alphabet.unionByName(products).distinct()
  }

  /** Per-document encode stats against a fixed vocab: `n_words`,
    * `n_pieces` (an unknown word costs exactly one `[UNK]` piece),
    * `n_unk_words`. Distinct word types segment once; documents re-join
    * by word. */
  def encodeDocs(df: DataFrame, idCol: String, textCol: String,
      pieces: Seq[String], unk: String = "[UNK]"): DataFrame = {
    val types = df.select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0).distinct()
    val seg = types.select(col("word"),
      WordpieceEncode(col("word"), pieces, unk).as("path"))
      .select(col("word"), size(col("path")).cast("long").as("__np"),
        (col("path") === array(lit(unk))).as("__unk"))
    df.select(col(idCol), explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .join(seg, Seq("word"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("__np")).as("n_pieces"),
        sum(col("__unk").cast("long")).as("n_unk_words"))
  }

  /** Column form of the greedy segmenter for ad-hoc use. */
  def segment(word: Column, pieces: Seq[String],
      unk: String = "[UNK]"): Column =
    WordpieceEncode(word, pieces, unk)
}

/** Greedy longest-match-first WordPiece segmentation of one word: at
  * position 0 only plain pieces match, after that only `##` pieces; the
  * longest matching piece wins each step, and a position with NO match
  * collapses the whole word to `[unk]` (BERT semantics). O(len ·
  * maxPieceLen) per word with a hash-set vocab probe per candidate
  * length. */
case class WordpieceEncode(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    pieces: Seq[String], unk: String)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.types._
  import org.apache.spark.unsafe.types.UTF8String

  @transient private lazy val vocabSet: Set[String] = pieces.toSet
  // longest SURFACE a match can have (## prefix is positional, not text)
  @transient private lazy val maxSurface: Int =
    if (pieces.isEmpty) 1
    else pieces.map(p => if (p.startsWith("##")) p.length - 2 else p.length).max

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wordpiece_encode requires string, got $other")
  }

  override def nullable: Boolean = child.nullable

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input) match {
      case null => null
      case s =>
        val w = s.asInstanceOf[UTF8String].toString
        val n = w.length
        if (n == 0) return new GenericArrayData(Array.empty[Any])
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var pos = 0
        var failed = false
        while (pos < n && !failed) {
          var len = math.min(maxSurface, n - pos)
          var hit: String = null
          while (len >= 1 && hit == null) {
            val cand =
              if (pos == 0) w.substring(0, len)
              else "##" + w.substring(pos, pos + len)
            if (vocabSet.contains(cand)) hit = cand
            else len -= 1
          }
          if (hit == null) failed = true
          else { out += hit; pos += len }
        }
        val res = if (failed) Array[String](unk) else out.toArray
        new GenericArrayData(
          res.map(UTF8String.fromString(_).asInstanceOf[Any]))
    }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : WordpieceEncode = copy(child = newChild)

  override def prettyName: String = "wordpiece_encode"
}

object WordpieceEncode {
  def apply(c: Column, pieces: Seq[String], unk: String): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      new WordpieceEncode(
        org.apache.spark.sql.graftbridge.Bridge.expression(c), pieces, unk))
}
