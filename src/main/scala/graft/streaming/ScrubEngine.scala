package graft.streaming

import graft.snapshot.Warehouse

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** The shared micro-batch scrub machinery behind [[TileScrub]] and
  * [[LineScrub]]: the two families differ ONLY in their text unit
  * (disjoint word tiles vs lines), i.e. the index builder, the
  * incremental judge, and the column names — while the partitioned-
  * index crash protocol, the fact intent/marker leg, and the
  * foreachBatch loop are identical and live here once.
  *
  * Protocol (documented in full at [[TileScrub]], the original):
  * per-batch index partitions under `indexDir/<subdir>/batch=<id>`
  * written with idempotent overwrite; the index read excludes the
  * current batch's partition so replays recompute identical verdicts;
  * the fact leg uses the intent/marker pair under
  * `checkpointDir/_graft_markers` with an anti-join on crash replay.
  *
  * FILE-LEVEL pruning (round 13): every batch partition carries a
  * `_keybloom.json` sidecar — a packed bloom filter over the
  * partition's probe-join keys, written once at ingest. The index read
  * tests the BATCH's (trigger-bounded) key set against each sidecar on
  * the driver and opens only the partitions that might hold a matching
  * key, so per-trigger IO — not just exchange — tracks the batch, the
  * same manifest-skipping idea the Warehouse `_bloom.json` implements
  * for fact scans. False positives only cost an extra partition scan;
  * a missing sidecar (pre-round-13 layout) or an over-cap batch key
  * set falls back to the full read — results identical either way. */
private[streaming] final case class ScrubFamily(
    subdir: String,
    keyCol: String,
    cntCol: String,
    statCols: Seq[String],
    indexOf: (DataFrame, String, String) => DataFrame,
    incremental: (DataFrame, String, String, DataFrame) => DataFrame,
    // shared per-trigger preparation: BOTH legs of a trigger (the index
    // write and the incremental judge) consume this frame, so a family
    // whose unit derivation is expensive (the fp families' content
    // decode) materializes it HERE once instead of once per leg — the
    // default is the plain (id, unit-source) projection every family's
    // indexOf/incremental already selected for itself.
    prepare: (DataFrame, String, String) => DataFrame =
      (df, idCol, textCol) => df.select(col(idCol), col(textCol)),
    // collapse = true: the index read folds per-batch partitions into
    // one (keyCol, Σ cntCol) row per key. false: the raw stored rows
    // pass through untouched (minus the own-batch partition) — for
    // families whose index carries precomputed probe columns the judge
    // equi-joins directly (ImageIngest's persisted band keys), where a
    // per-batch O(corpus) groupBy shuffle would defeat the point.
    collapse: Boolean = true,
    // extra all-LongType index columns beyond (keyCol, cntCol), for the
    // empty-index schema when no partition exists yet
    extraIndexCols: Seq[String] = Nil,
    // bloom-prune the index read with the BATCH's own unit keys: the
    // incremental judge only consumes index rows whose keyCol appears
    // in the batch (equi-join semantics), so a filter built from the
    // trigger-bounded batch keys discards the rest of the index scan
    // map-side — BEFORE the collapse groupBy / join exchange. False
    // positives only pass harmless extra rows. The pattern generalizes
    // to every collapse family (line/URL); families that join on
    // derived keys (ImageIngest's band keys) need the bloom keyed on
    // those instead.
    bloomPrune: Boolean = false,
    // the columns the probe EQUI-JOINS stored rows on — the sidecar
    // bloom key. Empty = Seq(keyCol); fp families join on the band
    // keys (t, v) instead.
    fileKeyCols: Seq[String] = Nil)

/** Public instrumentation window onto the scrub probe reads (the
  * ScaleDemo files-read evidence): partitions opened vs present on the
  * last sidecar-pruned index read. */
object ScrubMetrics {
  def lastPartsRead: Int = ScrubEngine.lastPartsRead
  def lastPartsTotal: Int = ScrubEngine.lastPartsTotal
}

private[streaming] object ScrubEngine {

  // sidecar bloom sizing: 16 KiB/partition, ~1% fp at ~10^4 keys
  private val SideBits = 1 << 17
  private val SideK = 4
  // cap on driver-collected batch probe keys; a batch deriving more
  // falls back to the unpruned read (bounded driver traffic, O(batch))
  private val MaxProbeKeys = 100000

  /** Instrumentation for specs and ScaleDemo: partitions opened vs
    * present on the LAST pruned index read (-1 until one happens). */
  @volatile var lastPartsRead: Int = -1
  @volatile var lastPartsTotal: Int = -1

  private def probeKeyCols(fam: ScrubFamily): Seq[String] =
    if (fam.fileKeyCols.nonEmpty) fam.fileKeyCols else Seq(fam.keyCol)

  /** The canonical probe-key string of a row: colon-joined column
    * values, matching Spark's CAST-to-string of longs on the driver
    * side (the [[graft.ext.BloomJoin]] portability contract). */
  private def keyed(rows: DataFrame, fam: ScrubFamily): DataFrame =
    rows.select(concat_ws(":",
      probeKeyCols(fam).map(c => col(c).cast("string")): _*).as("__k"))

  private def writeSidecar(fs: FileSystem, partDir: Path, rows: DataFrame,
      fam: ScrubFamily, precomputed: Option[Array[Long]] = None): Unit = {
    val words = precomputed.getOrElse(graft.ext.BloomJoin.buildFilter(
      keyed(rows, fam), "__k", SideBits, SideK))
    val out = fs.create(new Path(partDir, "_keybloom.json"), true)
    try out.write(
      (s"""{"bits":$SideBits,"k":$SideK,"words":[${words.mkString(",")}]}""")
        .getBytes("UTF-8"))
    finally out.close()
  }

  /** Driver-side bloom build from an already-collected key set — the
    * positionsLocal twin of BloomJoin.buildFilter, bit-identical for
    * string keys; used wherever the trigger-bounded batch keys are on
    * the driver anyway, saving a Spark job per filter. */
  private def wordsOf(keys: Array[String], bits: Int, k: Int): Array[Long] = {
    val arr = new Array[Long](bits / 64)
    var i = 0
    while (i < keys.length) {
      graft.ext.BloomJoin.positionsLocal(keys(i), bits, k).foreach { p =>
        arr((p / 64).toInt) |= 1L << (p % 64).toInt
      }
      i += 1
    }
    arr
  }

  private def readSidecar(fs: FileSystem, partDir: Path):
      Option[(Int, Int, Array[Long])] = {
    val p = new Path(partDir, "_keybloom.json")
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    // fixed shape written above — a tiny hand parse keeps this
    // dependency-free (same stance as the Warehouse manifests)
    def field(name: String): Option[String] = {
      val i = txt.indexOf(s""""$name":""")
      if (i < 0) None else {
        val s = i + name.length + 3
        val e0 = txt.indexWhere(c => c == ',' || c == '}', s)
        if (e0 < 0) None else Some(txt.substring(s, e0))
      }
    }
    try {
      val bits = field("bits").get.trim.toInt
      val k = field("k").get.trim.toInt
      val ws = txt.indexOf("[", txt.indexOf("\"words\":"))
      val we = txt.indexOf("]", ws)
      val words = txt.substring(ws + 1, we).split(",").map(_.trim.toLong)
      if (words.length == bits / 64) Some((bits, k, words)) else None
    } catch { case _: RuntimeException => None }
  }

  def seedIndex(fam: ScrubFamily, corpus: DataFrame, idCol: String,
      textCol: String, indexDir: String): Unit =
    withIndexLease(corpus.sparkSession, fam, indexDir, "seed") {
      seedLocked(fam, corpus, idCol, textCol, indexDir)
    }

  private def seedLocked(fam: ScrubFamily, corpus: DataFrame, idCol: String,
      textCol: String, indexDir: String): Unit = {
    val idx = fam.indexOf(fam.prepare(corpus, idCol, textCol), idCol, textCol)
      .localCheckpoint(true)
    val part = new Path(s"$indexDir/${fam.subdir}/batch=-1")
    idx.write.mode("overwrite").parquet(part.toString)
    val fs = part.getFileSystem(
      corpus.sparkSession.sparkContext.hadoopConfiguration)
    writeSidecar(fs, part, idx, fam)
  }

  /** The current index EXCLUDING `batchId`'s own partition, collapsed
    * to one row per unit hash; `prune` runs on the RAW stored rows,
    * before any collapse shuffle (the bloom-prune hook point).
    * `batchKeys` (the trigger-bounded probe-key strings, None when
    * over cap) drives SIDEBAR file skipping: only partitions whose
    * `_keybloom.json` might contain a batch key are opened at all. */
  private def readIndex(fam: ScrubFamily, batch: DataFrame,
      indexDir: String, batchId: Long,
      prune: DataFrame => DataFrame = identity,
      batchKeys: Option[Array[String]] = None): DataFrame = {
    val spark = batch.sparkSession
    val dir = s"$indexDir/${fam.subdir}"
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val parts =
      if (!fs.exists(new Path(dir))) Array.empty[Path]
      else fs.listStatus(new Path(dir))
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
        .map(_.getPath)
        .filterNot(_.getName == s"batch=$batchId")
    def emptyIndex: DataFrame =
      spark.emptyDataFrame
        .select((Seq(fam.keyCol, fam.cntCol) ++ fam.extraIndexCols)
          .map(c => lit(0L).as(c)): _*).limit(0)
    if (parts.isEmpty) return emptyIndex
    // file-level skip: keep a partition iff ANY batch key might be in
    // its sidecar; partitions without a sidecar are always kept
    val selected = batchKeys match {
      case Some(keys) =>
        val keep = parts.filter { p =>
          readSidecar(fs, p) match {
            case Some((bits, k, words)) =>
              keys.exists(key =>
                graft.ext.BloomJoin.mightContain(key, words, bits, k))
            case None => true // legacy partition: cannot prove absence
          }
        }
        lastPartsRead = keep.length; lastPartsTotal = parts.length
        keep
      case None => parts
    }
    if (selected.isEmpty) return emptyIndex
    val raw = prune(spark.read.option("basePath", dir)
      .parquet(selected.map(_.toString): _*)
      .filter(col("batch") =!= batchId))
    if (fam.collapse)
      raw.groupBy(col(fam.keyCol)).agg(sum(col(fam.cntCol)).as(fam.cntCol))
    else raw.drop("batch")
  }

  def ingestBatch(fam: ScrubFamily, batch: DataFrame, idCol: String,
      textCol: String, wh: Warehouse, fact: String, indexDir: String,
      batchId: Long, dedupFact: Boolean): Unit =
    withIndexLease(batch.sparkSession, fam, indexDir, "ingest") {
      ingestLocked(fam, batch, idCol, textCol, wh, fact, indexDir,
        batchId, dedupFact)
    }

  private def ingestLocked(fam: ScrubFamily, batch: DataFrame, idCol: String,
      textCol: String, wh: Warehouse, fact: String, indexDir: String,
      batchId: Long, dedupFact: Boolean): Unit = {
    // the trigger's unit frame is consumed by BOTH legs (index write +
    // incremental judge): prepare it once — fp families materialize the
    // decoded (id, fp) rows here, so the batch decodes ONCE per trigger
    val prep = fam.prepare(batch, idCol, textCol)
    // the batch's own index view is used three times (probe-key set +
    // bloom keys + the final index write); compute once
    val batchIndex = fam.indexOf(prep, idCol, textCol)
      .localCheckpoint(true)
    // trigger-bounded probe keys for sidecar skipping (O(batch) driver
    // traffic, capped — over the cap we read the index unpruned)
    val keyRows = keyed(batchIndex, fam).distinct()
      .limit(MaxProbeKeys + 1).collect()
    val batchKeys =
      if (keyRows.length > MaxProbeKeys) None
      else Some(keyRows.map(_.getString(0)))
    val prune: DataFrame => DataFrame =
      if (!fam.bloomPrune) identity
      else { raw =>
        val bits = 1 << 17 // 16 KiB filter: ~1% fp at 10^4 batch keys
        // batch keys already collected (capped) -> build the filter on
        // the driver, no extra Spark job; over-cap falls back to the
        // distributed build. bloomPrune families key on keyCol, which
        // is exactly the collected probe-key string.
        val words = batchKeys match {
          case Some(keys) if probeKeyCols(fam) == Seq(fam.keyCol) =>
            wordsOf(keys, bits, 4)
          case _ => graft.ext.BloomJoin.buildFilter(
            batchIndex.select(col(fam.keyCol)), fam.keyCol, bits, 4)
        }
        graft.ext.BloomJoin.pruneProbe(raw, fam.keyCol, words, bits, 4)
      }
    val index = readIndex(fam, batch, indexDir, batchId, prune, batchKeys)
    val part = new Path(s"$indexDir/${fam.subdir}/batch=$batchId")
    val fs = part.getFileSystem(
      batch.sparkSession.sparkContext.hadoopConfiguration)
    // The trigger's two legs are independent once batchIndex is
    // checkpointed and the (own-batch-excluding) index read above has
    // listed its partitions: the index write touches only
    // batch=<batchId> (idempotent overwrite; replay reads exclude it),
    // the judge/fact leg only the fact. Either crash order is already
    // covered by the intent/marker replay (the fact-first and
    // index-first windows are both spec'd in TileScrubSpec), and an
    // un-leased reader seeing the partition a leg earlier is the
    // dup-safe over-count direction. So OVERLAP them: the index-write
    // job back-fills the executor slots the judge's stages leave idle
    // instead of adding its own serial scheduler round-trip.
    Concurrent.overlap { () =>
      batchIndex.write.mode("overwrite").parquet(part.toString)
      // the sidecar keys ARE the collected probe keys — driver-side
      // build unless the cap forced the unpruned path
      writeSidecar(fs, part, batchIndex, fam,
        batchKeys.map(ks => wordsOf(ks, SideBits, SideK)))
    } {
      val scrubbed = fam.incremental(prep, idCol, textCol, index)
        .join(batch.select(col(idCol), col("year")), idCol)
        .select((col(idCol) :: col("year") ::
          fam.statCols.map(col).toList): _*)
        .localCheckpoint(true)
      val factLeg =
        if (!dedupFact) scrubbed
        else wh.read(fact) match {
          case None => scrubbed
          case Some(existing) =>
            val years = scrubbed.select(col("year")).distinct()
              .collect().map(_.getLong(0))
            scrubbed.join(existing
              .filter(col("year").isin(years.map(Long.box): _*))
              .select(col(idCol)), Seq(idCol), "left_anti")
        }
      if (!factLeg.isEmpty) wh.append(fact, factLeg)
    }
  }

  // ------------------------- compaction -------------------------
  //
  // Every trigger writes one batch=<id> directory forever — the classic
  // small-file accumulation. compactIndex folds all partitions with
  // id <= upToBatchId into the seed partition (batch=-1), preserving
  // the own-partition-exclusion replay contract PROVIDED the caller
  // only compacts batches the streaming checkpoint can no longer
  // replay (id < the committed horizon): a replayable batch B > upTo
  // still excludes batch=B and still sees every other row — now inside
  // batch=-1 instead of its original directory.
  //
  // Crash safety: the merge is staged under .compact_tmp with a
  // _MERGED manifest naming the source directories, then swapped in.
  // A crash mid-swap is finished by the recovery pass at the next
  // compactIndex call (the manifest tells it which sources remain).
  //
  // Concurrency (round 14): compactIndex is a public maintenance API a
  // job may call while the stream runs, so compact and ingest BOTH take
  // the per-family writer lease (the Warehouse single-admission
  // protocol, at `indexDir/_locks/<subdir>.lock`) — a probe can never
  // list the directory mid-swap. Defense in depth for any reader
  // outside the lease, the swap itself is rename-IN-first: the staged
  // fold becomes visible as `batch=-2` BEFORE any source is deleted,
  // then sources go, then -2 is atomically renamed to -1 — every
  // intermediate listing holds each key's rows at least once (worst
  // case transiently twice = over-count, the dup-safe direction), never
  // the old delete-first empty window that judged batches against a
  // near-empty index.

  /** Fold index partitions `batch <= upToBatchId` into `batch=-1`.
    * Returns the number of partitions folded (0 = nothing to do).
    * Counts are summed per key, so probe semantics are unchanged
    * (collapse families re-collapse anyway; fp families' probes ignore
    * `n_refs` and dedup hits). */
  /** Exclusive per-family writer lease over the scrub index — the same
    * single-admission lock protocol the Warehouse facts use (atomic
    * create-no-overwrite + TTL break), rooted at
    * `indexDir/_locks/<subdir>.lock`. Taken by BOTH ingestBatch and
    * compactIndex so a maintenance compaction can never swap partitions
    * under a running trigger's index read. */
  private def withIndexLease[T](spark: SparkSession, fam: ScrubFamily,
      indexDir: String, holder: String)(body: => T): T = {
    val wh = new Warehouse(spark, indexDir)
    // the Warehouse lease THROWS on live contention (the snapshot jobs
    // want fail-fast); here the contender is a trigger vs a maintenance
    // compaction — both finish in bounded time, so WAIT, bounded by a
    // deadline far past any sane trigger/compaction wall
    val deadline = System.currentTimeMillis() + 10 * 60 * 1000L
    var token: String = null
    while (token == null) {
      try token = wh.acquireWriterLease(fam.subdir, holder)
      catch {
        case e: IllegalStateException =>
          if (System.currentTimeMillis() >= deadline) throw e
          Thread.sleep(50)
      }
    }
    try body finally wh.releaseWriterLease(fam.subdir, token)
  }

  def compactIndex(spark: SparkSession, fam: ScrubFamily,
      indexDir: String, upToBatchId: Long): Int =
    withIndexLease(spark, fam, indexDir, "compact") {
      compactLocked(spark, fam, indexDir, upToBatchId)
    }

  private def compactLocked(spark: SparkSession, fam: ScrubFamily,
      indexDir: String, upToBatchId: Long): Int = {
    val dir = new Path(s"$indexDir/${fam.subdir}")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverCompaction(fs, dir)
    if (!fs.exists(dir)) return 0
    val parts = fs.listStatus(dir)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .map(_.getPath)
      .filter { p =>
        val id = p.getName.stripPrefix("batch=")
        scala.util.Try(id.toLong).toOption.exists(_ <= upToBatchId)
      }
    if (parts.length <= 1) return 0
    val tmp = new Path(dir, ".compact_tmp")
    fs.delete(tmp, true)
    val cols = Seq(fam.keyCol) ++ fam.extraIndexCols
    val folded = spark.read.option("basePath", dir.toString)
      .parquet(parts.map(_.toString): _*)
      .groupBy(cols.map(col): _*)
      .agg(sum(col(fam.cntCol)).as(fam.cntCol))
      .select((Seq(fam.keyCol, fam.cntCol) ++ fam.extraIndexCols)
        .map(col): _*)
      .localCheckpoint(true)
    val data = new Path(tmp, "data")
    folded.write.mode("overwrite").parquet(data.toString)
    writeSidecar(fs, data, folded, fam)
    // manifest last: its existence marks the stage complete
    val man = fs.create(new Path(tmp, "_MERGED"), true)
    try man.write(parts.map(_.getName).mkString("\n").getBytes("UTF-8"))
    finally man.close()
    finishSwap(fs, dir, tmp, parts.map(_.getName))
    parts.length
  }

  /** Reader-safe swap order (round 14): rename IN first. The staged
    * fold becomes visible as `batch=-2` (a readable partition name no
    * real batch id can take) BEFORE any source partition is deleted, so
    * a directory listing at any intermediate point serves every key's
    * rows at least once — transient worst case is seeing a row in both
    * the fold and its source (over-count, which only strengthens a dup
    * verdict), never the old delete-first window where a probe saw
    * neither and judged duplicates novel. Old `batch=-1` is itself one
    * of the sources, so the final -2→-1 promotion is a single atomic
    * rename onto a free name. Idempotent: recovery replays skip the
    * steps whose effects already landed. */
  private def finishSwap(fs: FileSystem, dir: Path, tmp: Path,
      sources: Seq[String]): Unit = {
    val data = new Path(tmp, "data")
    val staged = new Path(dir, "batch=-2")
    if (fs.exists(data)) fs.rename(data, staged)
    sources.foreach { name =>
      val p = new Path(dir, name)
      if (fs.exists(p)) fs.delete(p, true)
    }
    if (fs.exists(staged)) fs.rename(staged, new Path(dir, "batch=-1"))
    fs.delete(tmp, true)
  }

  /** Finish an interrupted compaction swap: with a complete stage
    * (`_MERGED` present), the remaining sources are deleted and the
    * stage promoted; without one, the half-written stage is discarded
    * (the source partitions are all still in place). */
  private def recoverCompaction(fs: FileSystem, dir: Path): Unit = {
    val tmp = new Path(dir, ".compact_tmp")
    if (!fs.exists(tmp)) return
    val man = new Path(tmp, "_MERGED")
    if (!fs.exists(man)) { fs.delete(tmp, true); return }
    val in = fs.open(man)
    val sources = try scala.io.Source.fromInputStream(in, "UTF-8")
      .mkString.split("\n").toSeq.filter(_.nonEmpty)
      finally in.close()
    finishSwap(fs, dir, tmp, sources)
  }

  def run(fam: ScrubFamily, stream: DataFrame, idCol: String,
      textCol: String, wh: Warehouse, fact: String, indexDir: String,
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val markerRoot = new Path(checkpointDir, "_graft_markers")
        val fs = markerRoot.getFileSystem(
          batch.sparkSession.sparkContext.hadoopConfiguration)
        fs.mkdirs(markerRoot)
        val marker = new Path(markerRoot, s"_batch_$batchId")
        val intent = new Path(markerRoot, s"_intent_$batchId")
        if (!fs.exists(marker)) {
          val crashReplay = fs.exists(intent)
          if (!crashReplay) fs.create(intent, true).close()
          ingestBatch(fam, batch, idCol, textCol, wh, fact, indexDir,
            batchId, dedupFact = crashReplay)
          fs.create(marker, true).close()
          fs.delete(intent, false)
        }
        ()
      }
      .start()
}
