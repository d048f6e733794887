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
  private[ext] def pairView(syms: Column): Column =
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

  /** [[train]] with BATCHED merge rounds — the form that makes 32k-merge
    * tokenizer training feasible: sequential training pays one driver
    * round (pair-count shuffle + 1-row collect) PER MERGE, which is fine
    * at 10 and hopeless at 32,000. Each batched round fetches the top
    * `probe` pairs once and accepts a PREFIX of them whose merges
    * provably cannot interact, so one shuffle buys many merges while the
    * learned merge table stays BIT-IDENTICAL to sequential training's.
    *
    * Soundness of the batch rule (why the output cannot differ):
    * greedily merging (a,b) → ab consumes exactly the a's followed by b
    * and the b's preceded by a, so the ONLY old pairs whose counts
    * change are those with SECOND symbol a or FIRST symbol b (plus
    * (a,b) itself), and the only new pairs are (x,ab)/(ab,y), bounded
    * by the old (x,a)/(b,y) counts. Scanning candidates in (cnt DESC,
    * a ASC, b ASC) order with A = accepted left symbols, B = accepted
    * right symbols, P = accepted products, a candidate (c,d) is
    * accepted while d ∉ A, c ∉ B, and neither c nor d ∈ P — pairs
    * merely SHARING a left (or right) symbol batch together, which is
    * what makes natural-text batches big (e.g. (e,s), (e,r), (e,n) all
    * in one round). The scan STOPS at the first interacting candidate
    * (or after a self-pair a = b, whose run-merges spawn pairs bounded
    * only by its own count). Every changed-or-new pair is then bounded
    * by some interacting old pair, which sits at or after the stop
    * position — i.e. at or below the stop candidate's count (the
    * "barrier"). Accepted pairs with cnt strictly above the barrier
    * remain exactly the next argmaxes of sequential training, in order;
    * accepted pairs at or below it are dropped (except the first, which
    * is the literal round argmax and always correct). When the probe
    * page was full, the last fetched count is the barrier for the
    * unseen tail.
    *
    * Batch application is one native per-row pass ([[BpeApplyMerges]] —
    * the array-input sibling of [[BpeEncode]]), so a round's cost is one
    * explode + hash-agg + `probe`-row collect + one projection,
    * regardless of how many merges it accepts. */
  def trainBatched(docs: DataFrame, textCol: String, merges: Int,
      probe: Int = 64): DataFrame =
    trainBatchedWithRounds(docs, textCol, merges, probe)._1

  /** [[trainBatched]] plus the number of driver rounds it took — the
    * measurable claim (rounds ≪ merges) the spec pins. */
  private[ext] def trainBatchedWithRounds(docs: DataFrame, textCol: String,
      merges: Int, probe: Int = 64): (DataFrame, Int) = {
    require(merges > 0, s"merges=$merges must be positive")
    require(probe >= 1, s"probe=$probe must be >= 1")
    val spark = docs.sparkSession
    var cur = wordTable(docs, textCol)
      .select(col("freq").cast("long").as("freq"),
        split(col("word"), "").as("syms"))
      .localCheckpoint(true)
    val learned =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rounds = 0
    var exhausted = false
    while (learned.size < merges && !exhausted) {
      val cand = cur
        .select(col("freq"), explode(pairView(col("syms"))).as("p"))
        .filter(col("p.nxt").isNotNull)
        .groupBy(col("p.cur").as("a"), col("p.nxt").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(probe).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      rounds += 1
      if (cand.isEmpty) exhausted = true
      else {
        val lefts = scala.collection.mutable.Set.empty[String]
        val rights = scala.collection.mutable.Set.empty[String]
        val products = scala.collection.mutable.Set.empty[String]
        val batch =
          scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        val limit = merges - learned.size
        var barrier: Option[Long] = None
        var idx = 0
        var stop = false
        while (!stop && idx < cand.length && batch.size < limit) {
          val (a, b, cnt) = cand(idx)
          val interacts = batch.nonEmpty && (lefts(b) || rights(a) ||
            products(a) || products(b))
          if (interacts) { barrier = Some(cnt); stop = true }
          else {
            batch += ((a, b, cnt))
            lefts += a; rights += b; products += (a + b)
            if (a == b) stop = true // run-building: bounds break past it
          }
          idx += 1
        }
        // unseen candidates (limit stop, self-pair stop, or a full probe
        // page) bound at the next/last fetched count
        if (barrier.isEmpty) {
          if (idx < cand.length) barrier = Some(cand(idx)._3)
          else if (cand.length == probe) barrier = Some(cand.last._3)
        }
        val kept = barrier match {
          case Some(bar) =>
            batch.head +: batch.tail.filter(_._3 > bar)
          case None => batch.toSeq
        }
        kept.foreach { case (a, b, cnt) =>
          learned += ((learned.size + 1, a, b, cnt))
        }
        cur = cur.withColumn("syms",
          BpeApplyMerges(col("syms"), kept.map(p => (p._1, p._2)).toList))
          .localCheckpoint(true)
      }
    }
    import spark.implicits._
    (learned.toSeq.toDF("step", "sym_a", "sym_b", "cnt"), rounds)
  }

  /** The PRODUCTION route to deep merge lists (32k-merge tokenizers):
    * one distributed pass collapses the corpus to its unique-word
    * frequency table (the classic BPE reduction — pair statistics are
    * identical on the weighted type table, and a 100 TB corpus has
    * millions of types, not trillions), then training runs EXACTLY on
    * the driver with incrementally-maintained pair counts and a sorted
    * pair set: argmax is O(log P), and each merge touches only the
    * types that contain its pair. Merge tables are bit-identical to
    * [[train]]'s (same counts, same (cnt DESC, a ASC, b ASC) tie-break
    * compared on UTF-8 bytes exactly like Spark's string sort).
    *
    * Why this beats per-merge Spark rounds past ~100 merges: exact BPE
    * is inherently chain-sequential (the argmax routinely extends the
    * previous round's product — c,o → co,l → col,u…), so distributed
    * rounds can't parallelize away the merge chain ([[trainBatched]]
    * batches what little is independent); the type table, however, fits
    * one machine by construction, where the chain costs microseconds a
    * link. `minFreq` drops hapax types first (the standard vocabulary
    * floor — also the dial that bounds driver memory on an open-ended
    * corpus); `maxTypes` is an explicit guard, NOT a silent cap: the
    * call refuses rather than subsample behind the caller's back. */
  def trainLocal(docs: DataFrame, textCol: String, merges: Int,
      minFreq: Long = 1L, maxTypes: Int = 2000000): DataFrame = {
    require(merges > 0, s"merges=$merges must be positive")
    val spark = docs.sparkSession
    val wt = wordTable(docs, textCol).filter(col("freq") >= minFreq)
      .select(col("word"), col("freq").cast("long").as("freq"))
    val rows = wt.limit(maxTypes + 1).collect()
    require(rows.length <= maxTypes,
      s"word-type table exceeds maxTypes=$maxTypes; raise minFreq " +
        "(vocabulary floor), maxTypes, or switch to trainSharded " +
        "(the distributed fallback for type tables no driver holds)")
    val st = new BpeShardState(rows.map(_.getString(0).split("")),
      rows.map(_.getLong(1)))
    val learned =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 1
    var head = st.head
    while (step <= merges && head.isDefined) {
      val (cnt, a, b) = head.get
      learned += ((step, a, b, cnt))
      st.applyMergesInOrder(Seq((a, b)))
      head = st.head
      step += 1
    }
    import spark.implicits._
    learned.toSeq.toDF("step", "sym_a", "sym_b", "cnt")
  }

  /** The distributed fallback for the [[trainLocal]] maxTypes refusal:
    * deep merge lists over a type table NO driver can hold. The type
    * table shards by word hash; each shard holds the SAME incremental
    * state trainLocal keeps (pair counts + sorted pair set + touched-type
    * index), and pair statistics are additive across shards because every
    * pair occurrence lives inside one word. Per driver round:
    *
    *  1. one tiny job collects each shard's top-`probe` page (plus the
    *     page-bottom count — any pair ABSENT from a shard's page has at
    *     most that count there, so Σ bottoms bounds every unseen pair);
    *  2. one job fetches the EXACT global counts of the union candidate
    *     set (broadcast out, reduceByKey back — candidate-sized, never
    *     corpus-sized);
    *  3. the driver runs [[trainBatched]]'s interaction-free acceptance
    *     scan over the exactly-counted candidates, additionally stopping
    *     at the unseen-tail bound: a candidate is certified as the next
    *     sequential argmax only while its count strictly exceeds both
    *     the interaction barrier and Σ bottoms. If even the head can't
    *     certify, the page size doubles and the round retries (`maxProbe`
    *     caps the escalation — refusal, never silent drift);
    *  4. one job applies the accepted merges in order on every shard
    *     (incremental: only types containing a merged pair are touched).
    *
    * The learned table is therefore BIT-IDENTICAL to [[train]] /
    * [[trainLocal]] — same counts, same (cnt DESC, a, b) UTF-8 tie-break
    * — while no single machine ever holds the type table: driver traffic
    * per round is O(shards × probe), state lives in executor memory
    * (localCheckpoint per round, the [[trainBatched]] lineage
    * discipline; set spark.graft.eagerCheckpoint.reliable + a
    * checkpoint dir for durable per-round state that survives executor
    * loss). Round application is copy-on-apply — see
    * [[BpeShardState.withMergesApplied]].
    * 32k merges at a few-per-round acceptance rate is a few thousand
    * seconds-long rounds on a warm cluster — hours, not the months the
    * per-occurrence formulation would cost, and with no maxTypes ceiling. */
  def trainSharded(docs: DataFrame, textCol: String, merges: Int,
      numShards: Int = 32, probe: Int = 64, minFreq: Long = 1L,
      maxProbe: Int = 8192): DataFrame =
    trainShardedWithRounds(docs, textCol, merges, numShards, probe,
      minFreq, maxProbe)._1

  private[ext] def trainShardedWithRounds(docs: DataFrame, textCol: String,
      merges: Int, numShards: Int = 32, probe: Int = 64, minFreq: Long = 1L,
      maxProbe: Int = 8192): (DataFrame, Int) = {
    require(merges > 0, s"merges=$merges must be positive")
    require(numShards > 0 && probe > 0 && maxProbe >= probe,
      s"bad numShards=$numShards probe=$probe maxProbe=$maxProbe")
    val spark = docs.sparkSession
    val sc = spark.sparkContext
    val wt = wordTable(docs, textCol).filter(col("freq") >= minFreq)
      .select(col("word"), col("freq").cast("long").as("freq"))
    // Per-round state persistence: localCheckpoint by default (fast,
    // executor-memory blocks — an executor loss mid-training is fatal
    // and the run restarts); flip spark.graft.eagerCheckpoint.reliable
    // (the Dedup.finishEager switch) to write each round's shard state
    // to the durable checkpoint dir instead, so a 32k-merge run
    // survives executor churn at the cost of a serialize+write per
    // round. Either way the round map is copy-on-apply
    // ([[BpeShardState.withMergesApplied]]) — cached states are never
    // mutated in place, so task retry/speculation replays are pure.
    val reliable = spark.conf
      .getOption("spark.graft.eagerCheckpoint.reliable").exists(_.toBoolean)
    if (reliable) require(sc.getCheckpointDir.isDefined,
      "reliable BPE shard checkpoint needs sparkContext.setCheckpointDir " +
        "(durable storage) before trainSharded")
    def persistRound(r: org.apache.spark.rdd.RDD[BpeShardState]): Unit =
      if (reliable) {
        r.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        r.checkpoint(); r.count(); ()
      } else { r.localCheckpoint(); r.count(); () }
    var shards = wt.rdd
      .map(r => (math.floorMod(r.getString(0).hashCode, numShards),
        (r.getString(0), r.getLong(1))))
      .partitionBy(new org.apache.spark.HashPartitioner(numShards))
      .mapPartitions { it =>
        val rows = it.map(_._2).toArray
        Iterator.single(new BpeShardState(
          rows.map(_._1.split("")), rows.map(_._2)))
      }
    persistRound(shards)
    val learned =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rounds = 0
    var curProbe = probe
    var exhausted = false
    while (learned.size < merges && !exhausted) {
      val p = curProbe
      val pages = shards.map(_.page(p)).collect()
      rounds += 1
      val unseenBound = pages.map(_._2).sum
      val candNames = pages.flatMap(_._1).map(t => (t._2, t._3)).distinct
      if (candNames.isEmpty) exhausted = true
      else {
        val bc = sc.broadcast(candNames)
        val cand = shards.flatMap(_.countsFor(bc.value))
          .reduceByKey(_ + _).collect()
          .map { case ((a, b), c) => (c, a, b) }
          .sorted(BpeShardState.pairOrd)
        val lefts = scala.collection.mutable.Set.empty[String]
        val rights = scala.collection.mutable.Set.empty[String]
        val products = scala.collection.mutable.Set.empty[String]
        val batch =
          scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        val limit = merges - learned.size
        var barrier = unseenBound // nothing below it is certifiable
        var idx = 0
        var stop = false
        while (!stop && idx < cand.length && batch.size < limit) {
          val (cnt, a, b) = cand(idx)
          val interacts = lefts(b) || rights(a) || products(a) || products(b)
          if (cnt <= barrier || interacts) {
            barrier = math.max(barrier, if (interacts) cnt else barrier)
            stop = true
          } else {
            batch += ((a, b, cnt))
            lefts += a; rights += b; products += (a + b)
            if (a == b) stop = true // run-building: bounds break past it
          }
          idx += 1
        }
        // a limit/self-pair stop leaves unscanned exact candidates: they
        // bound the batch tail exactly like trainBatched's next-count rule
        if (stop && idx < cand.length)
          barrier = math.max(barrier, cand(idx)._1)
        val kept = batch.toSeq.filter(_._3 > barrier) match {
          case k if k.nonEmpty => k
          case _ if batch.nonEmpty && batch.head._3 > unseenBound =>
            Seq(batch.head) // head above the unseen tail IS the argmax
          case _ => Seq.empty
        }
        if (kept.isEmpty) {
          // even the head can't certify against the unseen tail: widen
          require(curProbe < maxProbe,
            s"cannot certify the global argmax at probe=$maxProbe; " +
              "raise maxProbe or numShards")
          curProbe = math.min(curProbe * 2, maxProbe)
        } else {
          kept.foreach { case (a, b, cnt) =>
            learned += ((learned.size + 1, a, b, cnt))
          }
          val bm = sc.broadcast(kept.map(t => (t._1, t._2)))
          val next = shards.map(_.withMergesApplied(bm.value))
          persistRound(next)
          // the previous round's blocks are dead weight once `next` is
          // materialized — without this, a 32k-merge run caches every
          // round's full state simultaneously
          shards.unpersist(blocking = false)
          shards = next
          curProbe = probe
        }
      }
    }
    import spark.implicits._
    (learned.toSeq.toDF("step", "sym_a", "sym_b", "cnt"), rounds)
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

/** The incremental BPE training state over a slice of the word-type
  * table — pair counts, the (cnt DESC, a, b)-sorted pair set, and the
  * pair→types touch index. [[Bpe.trainLocal]] holds ONE of these on the
  * driver; [[Bpe.trainSharded]] holds one per executor shard (pair
  * statistics are additive across shards since every pair occurrence
  * lives inside a single word). Mutable by design: applyMergesInOrder
  * touches only the types containing a merged pair. */
private[ext] final class BpeShardState private (
    private val syms: Array[Array[String]],
    private val freq: Array[Long],
    initIndexes: Boolean) extends Serializable {
  require(syms.length == freq.length, "syms/freq length mismatch")

  def this(syms: Array[Array[String]], freq: Array[Long]) =
    this(syms, freq, true)

  private val pairCnt = scala.collection.mutable.HashMap
    .empty[(String, String), Long]
  private val pairWords = scala.collection.mutable.HashMap
    .empty[(String, String), scala.collection.mutable.Set[Int]]
  private val sorted = scala.collection.mutable.TreeSet
    .empty[(Long, String, String)](BpeShardState.pairOrd)

  private def wordPairs(s: Array[String])
      : scala.collection.mutable.HashMap[(String, String), Long] = {
    val m = scala.collection.mutable.HashMap.empty[(String, String), Long]
    var i = 0
    while (i < s.length - 1) {
      val p = (s(i), s(i + 1))
      m.update(p, m.getOrElse(p, 0L) + 1L)
      i += 1
    }
    m
  }

  private def bump(p: (String, String), delta: Long, w: Int,
      present: Boolean): Unit = {
    val old = pairCnt.getOrElse(p, 0L)
    if (old != 0L) sorted.remove((old, p._1, p._2))
    val nu = old + delta
    if (nu != 0L) { pairCnt.update(p, nu); sorted.add((nu, p._1, p._2)) }
    else pairCnt.remove(p)
    val set = pairWords.getOrElseUpdate(p,
      scala.collection.mutable.Set.empty[Int])
    if (present) set.add(w) else set.remove(w)
    if (set.isEmpty) pairWords.remove(p)
  }

  locally {
    if (initIndexes) {
      var w = 0
      while (w < syms.length) {
        wordPairs(syms(w)).foreach { case (p, k) =>
          bump(p, k * freq(w), w, present = true)
        }
        w += 1
      }
    }
  }

  /** Copy-on-apply: a NEW state with `ms` applied in order, sharing no
    * mutable structure with the receiver. The per-round map over the
    * cached shard RDD must NOT mutate the cached objects in place —
    * under task retry or speculation two attempts would mutate the same
    * cached state concurrently (HashMap/TreeSet corruption), and an
    * evicted localCheckpoint block could never be recomputed to the
    * pre-mutation value. Structural clone is O(pairs-in-shard): the
    * indexes are copied, not recomputed from the word table (inner
    * symbol arrays are immutable-by-convention — [[applyLocal]] always
    * allocates — so only the outer array needs cloning). */
  def withMergesApplied(ms: Seq[(String, String)]): BpeShardState = {
    val c = new BpeShardState(syms.clone(), freq, initIndexes = false)
    pairCnt.foreach { case (p, n) => c.pairCnt.update(p, n) }
    pairWords.foreach { case (p, s) => c.pairWords.update(p, s.clone()) }
    c.sorted ++= sorted
    c.applyMergesInOrder(ms)
    c
  }

  private def applyLocal(s: Array[String], a: String,
      b: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](s.length)
    val ab = a + b
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { out += ab; i += 2 }
      else { out += s(i); i += 1 }
    }
    out.toArray
  }

  /** The state's current argmax pair as (cnt, a, b), if any pair remains. */
  def head: Option[(Long, String, String)] = sorted.headOption

  /** Top-`p` page in global order plus the page-bottom bound: any pair
    * NOT on this page has count ≤ the returned bound in THIS shard (0
    * when the page holds every pair the shard has). */
  def page(p: Int): (Array[(Long, String, String)], Long) = {
    val top = sorted.iterator.take(p).toArray
    val bottom = if (sorted.size <= p) 0L else top.last._1
    (top, bottom)
  }

  /** Exact counts of the given pairs in this shard (absent pairs omitted). */
  def countsFor(pairs: Array[(String, String)])
      : Iterator[((String, String), Long)] =
    pairs.iterator.flatMap(p => pairCnt.get(p).map(c => (p, c)))

  /** Apply merges IN ORDER, each with incremental count/index updates —
    * only types containing the merged pair are touched. */
  def applyMergesInOrder(ms: Seq[(String, String)]): Unit =
    ms.foreach { case (a, b) =>
      val affected = pairWords.getOrElse((a, b),
        scala.collection.mutable.Set.empty[Int]).toArray
      affected.foreach { wi =>
        val before = wordPairs(syms(wi))
        syms(wi) = applyLocal(syms(wi), a, b)
        val after = wordPairs(syms(wi))
        (before.keySet ++ after.keySet).foreach { p =>
          val d = after.getOrElse(p, 0L) - before.getOrElse(p, 0L)
          val presentNow = after.contains(p)
          if (d != 0L || before.contains(p) != presentNow)
            bump(p, d * freq(wi), wi, presentNow)
        }
      }
    }
}

private[ext] object BpeShardState {

  /** UTF-8 byte order == Spark's UTF8String sort order. */
  private def cmpUtf8(x: String, y: String): Int = {
    val bx = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val by = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(bx.length, by.length)
    while (i < n) {
      val c = (bx(i) & 0xff) - (by(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    bx.length - by.length
  }

  /** (cnt DESC, a ASC, b ASC) on UTF-8 bytes — the training tie-break,
    * shared by every trainer so merge tables stay bit-identical. */
  val pairOrd: Ordering[(Long, String, String)] =
    new Ordering[(Long, String, String)] with Serializable {
      def compare(x: (Long, String, String),
          y: (Long, String, String)): Int = {
        val c = java.lang.Long.compare(y._1, x._1) // cnt DESC
        if (c != 0) c
        else {
          val ca = cmpUtf8(x._2, y._2)
          if (ca != 0) ca else cmpUtf8(x._3, y._3)
        }
      }
    }
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

/** [[BpeEncode]]'s array-input sibling: applies a merge list to an
  * existing symbol array (the training loop's per-round rewrite) in one
  * per-row pass — same greedy left-to-right pair-skip semantics as
  * [[Bpe.applyMerge]] folded over the list, without the nested-lambda
  * analyzer blowup a chained HOF formulation hits past ~8 rules. */
case class BpeApplyMerges(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    merges: Seq[(String, String)])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
  import org.apache.spark.sql.types._
  import org.apache.spark.unsafe.types.UTF8String

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_apply_merges requires array<string>, got $other")
  }

  override def nullable: Boolean = child.nullable

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input) match {
      case null => null
      case arr =>
        val in = arr.asInstanceOf[ArrayData]
        var syms = new Array[String](in.numElements())
        var k = 0
        while (k < syms.length) {
          syms(k) = in.getUTF8String(k).toString; k += 1
        }
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
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): BpeApplyMerges =
    copy(child = newChild)

  override def prettyName: String = "bpe_apply_merges"
}

object BpeApplyMerges {
  def apply(c: Column, merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      new BpeApplyMerges(
        org.apache.spark.sql.graftbridge.Bridge.expression(c), merges))
}
