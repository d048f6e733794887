package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer training (Sennrich et al.
  * ACL 2016) — the tokenizer-construction step of an LLM data pipeline,
  * run where the data is instead of sampling a sliver to a single
  * machine.
  *
  * Shape at scale: the corpus collapses ONCE into the unique-word
  * frequency table (the classic BPE trick — a billion-document corpus
  * has a few million unique words, and pair statistics are identical on
  * the weighted word table). Each merge round is then one explode +
  * map-side-combining hash-agg over per-word symbol pairs, one 1-ROW
  * argmax to the driver (the merge rule itself — the only thing the
  * driver ever sees), and one literal-parameterized higher-order-
  * function rewrite of the symbol arrays (no shuffle). Symbol tables
  * are localCheckpointed per round to cut the growing lineage, the
  * repo-wide iterative-algorithm discipline.
  *
  * Determinism: pair counts are exact integers and the argmax tie-break
  * is (count DESC, left ASC, right ASC) — no floats anywhere in
  * training, so any engine replaying the same rounds picks the same
  * merges bit for bit.
  *
  * Semantics notes: greedy left-to-right application within a word (in
  * "aaa", merge (a,a) yields [aa, a]); pair counting does count both
  * pairs of "aaa" (the standard formulation); no end-of-word marker —
  * callers wanting GPT-style boundary tokens append one to each word
  * before training.
  */
object Bpe {

  /** Unique-word frequency table of a corpus: (word, freq). */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** The (cur, nxt) pair view of a symbol array (nxt null at the end). */
  private def pairView(syms: Column): Column =
    transform(syms, (s, i) =>
      struct(s.as("cur"), try_element_at(syms, i + lit(2)).as("nxt")))

  /** One merge rule (a, b) -> ab applied greedily left-to-right. */
  def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(
      pairView(syms),
      struct(typedLit(Seq.empty[String]).as("out"), lit(false).as("skip")),
      (acc, p) =>
        when(acc.getField("skip"),
          struct(acc.getField("out").as("out"), lit(false).as("skip")))
        .when(p.getField("cur") === a && p.getField("nxt") === b,
          struct(concat(acc.getField("out"), array(lit(a + b))).as("out"),
            lit(true).as("skip")))
        .otherwise(
          struct(concat(acc.getField("out"), array(p.getField("cur"))).as("out"),
            lit(false).as("skip"))),
      acc => acc.getField("out"))

  /** Train `merges` rules on a corpus; returns the merge table
    * (step, sym_a, sym_b, cnt) in training order. Stops early if the
    * corpus runs out of pairs. */
  def train(docs: DataFrame, textCol: String, merges: Int): DataFrame = {
    require(merges > 0, s"merges=$merges must be positive")
    val spark = docs.sparkSession
    val words = wordTable(docs, textCol)
    var cur = words
      .select(col("freq").cast("long").as("freq"),
        split(col("word"), "").as("syms"))
      .localCheckpoint(true)
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= merges && !exhausted) {
      val best = cur
        .select(col("freq"), explode(pairView(col("syms"))).as("p"))
        .filter(col("p.nxt").isNotNull)
        .groupBy(col("p.cur").as("a"), col("p.nxt").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, cnt) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        learned += ((step, a, b, cnt))
        cur = cur.withColumn("syms", applyMerge(col("syms"), a, b))
          .localCheckpoint(true)
        step += 1
      }
    }
    import spark.implicits._
    learned.toSeq.toDF("step", "sym_a", "sym_b", "cnt")
  }

  /** Encode one word column with a learned merge list (rank order).
    * Native single pass ([[BpeEncode]]): the HOF fold of N
    * [[applyMerge]] steps nests N aggregate lambdas and blows the
    * analyzer's resolution budget past ~8 merges (Max iterations
    * reached), besides the per-element re-evaluation trap — training
    * avoids both by checkpointing between rounds, but encode applies
    * the whole learned list to one column at once. Semantics are
    * bit-identical: same char split, same greedy left-to-right skip. */
  def encode(word: Column, merges: Seq[(String, String)]): Column =
    BpeEncode(word, merges)
}

/** Greedy merge-list application as one per-row pass: word -> chars,
  * then each (a, b) rule left-to-right with pair-skip — exactly
  * [[Bpe.applyMerge]] folded, without the nested-lambda plans. */
case class BpeEncode(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    merges: Seq[(String, String)])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.types._
  import org.apache.spark.unsafe.types.UTF8String

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode requires string, got $other")
  }

  override def nullable: Boolean = child.nullable

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input) match {
      case null => null
      case s =>
        // Spark split(word, "") semantics: chars, no trailing empty
        // (the x_bpe oracle's substr(1..len) agrees); "" -> [""]
        var syms: Array[String] =
          s.asInstanceOf[UTF8String].toString.split("")
        merges.foreach { case (a, b) =>
          val ab = a + b
          val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              out += ab; i += 2
            } else { out += syms(i); i += 1 }
          }
          syms = out.toArray
        }
        new GenericArrayData(syms.map(UTF8String.fromString(_).asInstanceOf[Any]))
    }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): BpeEncode =
    copy(child = newChild)

  override def prettyName: String = "bpe_encode"
}

object BpeEncode {
  def apply(c: Column, merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      new BpeEncode(
        org.apache.spark.sql.graftbridge.Bridge.expression(c), merges))
}
