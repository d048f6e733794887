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

  /** Encode one word column with a learned merge list (rank order). */
  def encode(word: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(split(word, "")) { case (syms, (a, b)) =>
      applyMerge(syms, a, b)
    }
}
