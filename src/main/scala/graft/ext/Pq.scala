package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., TPAMI 2011 — public paper): the
  * vector-compression half of IVF-PQ, the standard recipe for ANN over
  * corpora too large to hold float vectors in memory. Vectors split into
  * `m` contiguous subspaces; each subspace gets its own k-codeword
  * codebook ([[KMeans]] per subspace — the full corpus trains, not a
  * driver-side sample); a vector compresses to `m` small codes
  * (64 dims × 4 bytes → 2 bytes at m=2, k=8; 32× in the paper's
  * m=8, k=256 setup). Queries score compressed rows via asymmetric
  * distance (ADC): one k×m lookup table of exact query-to-codeword
  * distances, then a per-row sum of `m` table entries — no float vector
  * ever reloaded.
  *
  * Scale shape: training is m KMeans runs (each the shuffle-free
  * assignment + (cid,dim)-keyed update of [[KMeans]]); encoding is one
  * broadcast of the packed codebooks (m×k×(d/m) doubles — k×d total,
  * same size as one centroid set) and a per-row nested-HOF argmin in
  * codegen, zero shuffle; ADC search broadcasts a k×m LUT literal and
  * compiles top-k to TakeOrderedAndProject.
  *
  * Determinism: everything inherits [[KMeans]]' engine-portable
  * arithmetic (md5 seeds, index-ordered folds, decimal centroid sums,
  * argmin ties to the lower cid), and ADC sums run in subspace order —
  * a SQL engine replays training, codes, and ranked results exactly.
  */
object Pq {

  /** Per-subspace codebooks: (sub, cid, dim, c) with `dim` relative to
    * the subspace. `m` must divide the vector dimension.
    *
    * All m subspaces train in ONE [[KMeans.fitGrouped]] DAG — the
    * corpus explodes to (sub, id, slice) rows and every Lloyd phase
    * keys on (sub, cid) — rather than m unioned [[KMeans.fit]] DAGs
    * each persisting its own slice. What that buys is at the TRAINING
    * FRONT: the per-fit loop materializes m separate slice caches,
    * each scanning the raw corpus once (m corpus scans at production
    * m = 8–16); the grouped form scans once, explodes, persists one
    * frame of the same total bytes, and draws seeds in one pass.
    * Locally the two measure within host noise (AQE already runs the
    * unioned fits' independent stages concurrently — A/B'd at sf0.1,
    * ±8%). Per-subspace seeds, argmin scans, and decimal centroid
    * sums are bit-identical to the sequential loop (the fitGrouped
    * equivalence contract), so codes, ADC ranks, and the replay
    * oracles are unchanged. */
  def train(df: DataFrame, idCol: String, vecCol: String, m: Int,
      k: Int, iters: Int = 2): DataFrame = {
    require(m > 0, s"m=$m must be positive")
    val w = (size(col("__fv")) / lit(m)).cast("int")
    val sliced = df.select(col(idCol), col(vecCol).as("__fv"))
      .select(col(idCol), col("__fv"),
        explode(sequence(lit(0L), lit(m - 1L))).as("sub"))
      .select(col("sub"), col(idCol),
        slice(col("__fv"), col("sub").cast("int") * w + 1, w).as("__sv"))
    KMeans.fitGrouped(sliced, "sub", idCol, "__sv", k, iters)
      .select(col("g").as("sub"), col("cid"), col("dim"), col("c"))
  }

  /** Collected codebooks: (sub, cid, components) sorted by (sub, cid) —
    * the m×k×(d/m) MODEL, one bounded driver round-trip (the
    * [[KMeans]] collected-book discipline: [[adcTopK]] already collects
    * exactly this frame). Replaces the old 3-aggregation + broadcast-
    * exchange packing that every encode/probe site re-ran. */
  private def collectBooks(codebooks: DataFrame)
      : Array[(Long, Array[(Long, Array[Double])])] = {
    val rows = codebooks.select(col("sub").cast("long"),
      col("cid").cast("long"), col("dim").cast("long"), col("c")).collect()
    rows.groupBy(_.getLong(0)).toArray.sortBy(_._1).map { case (sub, rs) =>
      (sub, rs.groupBy(_.getLong(1)).toArray.sortBy(_._1).map {
        case (cid, cs) =>
          val dim = cs.map(_.getLong(2)).max.toInt + 1
          val v = new Array[Double](dim)
          cs.foreach(r => v(r.getLong(2).toInt) = r.getDouble(3))
          (cid, v)
      })
    }
  }

  /** One codebook as an array-of-(cid, cvec)-structs literal, sorted by
    * cid — the same rows in the same order as the old packed frame. */
  private def bookLit(book: Array[(Long, Array[Double])]): Column =
    array(book.map { case (cid, cv) =>
      struct(lit(cid).as("cid"), typedlit(cv.toSeq).as("cvec")) }: _*)

  /** `cbs` literal: array over subs (sorted) of codebook arrays. */
  private def booksLit(codebooks: DataFrame): Column =
    array(collectBooks(codebooks).map { case (_, book) => bookLit(book) }: _*)

  /** Books as a NESTED literal — subs (sorted) × cids (sorted) × cvec:
    * exactly the positional layout the old per-query
    * collect_list(array_sort) LUT aggregations produced, now a constant
    * so the LUT is a pure projection (zero explode, zero shuffle). */
  private def lutBooksLit(
      booksC: Array[(Long, Array[(Long, Array[Double])])]): Column =
    array(booksC.map { case (_, book) =>
      array(book.map { case (_, cv) => typedlit(cv.toSeq) }: _*) }: _*)

  /** The nprobe nearest coarse lists per query as an ARRAY EXPRESSION:
    * array_sort over (d, cid[, cvec]) structs is the same (__d, __ccid)
    * ordering the old row_number window used — ties to the lower cid,
    * cvec unique-keyed behind them — so slice(.., 1, nprobe) selects the
    * identical probe set with no window exchange. */
  private def probeArr(coarse: Column, qv: Column, nprobe: Int,
      carryCvec: Boolean): Column = {
    val entries = transform(coarse, c =>
      if (carryCvec)
        struct(KMeans.sqDist(qv, c.getField("cvec")).as("d"),
          c.getField("cid").as("cid"), c.getField("cvec").as("cvec"))
      else
        struct(KMeans.sqDist(qv, c.getField("cvec")).as("d"),
          c.getField("cid").as("cid")))
    slice(array_sort(entries), 1, nprobe)
  }

  /** The encode argmin as a pure COLUMN EXPRESSION over `vec` — exactly
    * [[encode]]'s arithmetic (same structs, same order, ties to the
    * lower cid), exposed so one corpus projection can carry the coarse
    * list AND the PQ code without an id-keyed join between two scans. */
  private def codeExpr(vec: Column, cbs: Column, m: Int): Column = {
    val w = (size(vec) / m).cast("int")
    transform(sequence(lit(0), lit(m - 1)), s =>
      array_min(transform(element_at(cbs, s.cast("int") + 1), c =>
        struct(KMeans.sqDist(
            slice(vec, s.cast("int") * w + 1, w),
            c.getField("cvec")).as("d"),
          c.getField("cid").as("cid")))).getField("cid"))
  }

  /** Compress each vector to its `m` nearest-codeword ids:
    * (id, code array<long>). Broadcast codebooks, per-row argmin per
    * subspace — no shuffle, no row multiplication. */
  def encode(df: DataFrame, idCol: String, vecCol: String,
      codebooks: DataFrame, m: Int): DataFrame =
    df.select(col(idCol), col(vecCol).as("__v"))
      .select(col(idCol),
        codeExpr(col("__v"), booksLit(codebooks), m).as("code"))

  /** ADC top-k: exact query-to-codeword distance table (k×m entries,
    * computed once from the collected codebooks — bounded, never data-
    * scale), then each compressed row scores as the sum of its `m`
    * table entries in subspace order. Returns (id, dist) for the k
    * closest, ties to the lower id; plan is TakeOrderedAndProject. */
  def adcTopK(codes: DataFrame, idCol: String, codebooks: DataFrame,
      query: Seq[Double], k: Int): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    // (sub, cid) -> cvec, collected: k×m rows of d/m doubles each
    val books = codebooks.groupBy(col("sub"), col("cid"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("c")))),
        x => x.getField("c")).as("cvec"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getSeq[Double](2)))
      .toMap
    val m = books.keys.map(_._1).max.toInt + 1
    val kCodes = books.keys.map(_._2).max.toInt + 1
    val w = query.length / m
    // LUT[sub*kCodes + cid] = ||q_sub - c_(sub,cid)||², index-ordered fold
    val lut = Array.tabulate(m * kCodes) { i =>
      books.get((i / kCodes).toLong -> (i % kCodes).toLong).map { cv =>
        val q = query.slice((i / kCodes) * w, (i / kCodes) * w + w)
        q.zip(cv).foldLeft(0.0) { case (acc, (a, b)) =>
          acc + (a - b) * (a - b) }
      }.getOrElse(Double.MaxValue) // codeword died in training: unreachable
    }
    val lutLit = typedlit(lut.toSeq)
    codes.select(col(idCol),
        aggregate(zip_with(col("code"),
            sequence(lit(0L), lit(m - 1L)), (cid, s) =>
            element_at(lutLit, (s * kCodes + cid).cast("int") + 1)),
          lit(0.0), (acc, v) => acc + v).as("dist"))
      .orderBy(col("dist"), col(idCol))
      .limit(k)
  }

  /** IVF-PQ (Jégou et al. 2011 §IV — the combined recipe both halves
    * exist for, and THE standard billion-scale ANN configuration):
    * a coarse [[KMeans]] quantizer partitions the corpus into `nlist`
    * inverted lists; every vector also compresses to `m` PQ codes; each
    * query probes its `nprobe` nearest coarse lists and scores ONLY
    * those candidates by ADC — so per query the scan is ~nprobe/nlist of
    * the corpus and no float vector is ever reloaded. (This scores raw-
    * vector codes rather than the paper's residual encoding — the
    * candidate-pruning and compression economics are identical; residual
    * codebooks would double the replay-oracle's training chains for a
    * constant-factor accuracy gain.)
    *
    * Queries are corpus rows named by id (the benchmark contract the
    * sibling topK operators share). Multi-query ADC is relational: the
    * per-(query, subspace, codeword) distance table is queries × m × k
    * rows — broadcast — and each candidate row folds its `m` entries in
    * subspace order (the [[adcTopK]] determinism discipline, per query).
    *
    * Scale: two bounded trainings (coarse + PQ, all [[KMeans]]
    * machinery); candidate generation is `lists ⋈ broadcast(probes)`;
    * the per-query top-k is a qid-partitioned window with a LITERAL
    * bound (WindowGroupLimit prunes map-side). Everything replays on any
    * SQL engine: md5 seeds, index-ordered folds, argmin ties to the
    * lower cid. */
  def ivfAdcTopK(df: DataFrame, idCol: String, vecCol: String,
      queryIds: Seq[Long], k: Int, nlist: Int = 8, nprobe: Int = 2,
      m: Int = 2, kCodes: Int = 8, iters: Int = 2): DataFrame = {
    require(k > 0 && nprobe > 0 && nprobe <= nlist,
      s"k=$k nprobe=$nprobe nlist=$nlist")
    val pts = df.select(col(idCol).cast("long").as(idCol), col(vecCol))
    val coarseCb = KMeans.fit(pts, idCol, vecCol, nlist, iters)
      .select(lit(0L).as("sub"), col("cid"), col("dim"), col("c"))
      .localCheckpoint(true)
    val cb = train(pts, idCol, vecCol, m, kCodes, iters).localCheckpoint(true)
    // ONE corpus projection carries the coarse list AND the PQ code —
    // both argmins are map-only, so the old two encode scans and the
    // id-keyed join pairing them collapse into a single scan
    val entries = pts.select(col(idCol),
      element_at(codeExpr(col(vecCol), booksLit(coarseCb), 1), 1)
        .as("__ccid"),
      codeExpr(col(vecCol), booksLit(cb), m).as("code"))
    val qs = pts.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("qid"),
        transform(col(vecCol), x => x.cast("double")).as("__qv"))
    // each query's nprobe nearest coarse lists (ties to the lower cid) —
    // a pure projection over the collected coarse book (no window)
    val probes = qs
      .select(col("qid"),
        explode(probeArr(element_at(booksLit(coarseCb), 1), col("__qv"),
          nprobe, carryCvec = false)).as("__p"))
      .select(col("qid"), col("__p").getField("cid").as("__ccid"))
    // per-(query, sub, cid) exact distances, packed cid-indexed per query
    // — the same positional (sub, cid) layout the old
    // collect_list(array_sort) chain aggregated, projected per query row
    // from the nested book literal (no explode, no shuffle)
    val wcol = (size(col("__qv")) / m).cast("int")
    val booksNested = lutBooksLit(collectBooks(cb))
    val luts = qs.select(col("qid"),
      transform(booksNested, (book, s) =>
        transform(book, cv =>
          KMeans.sqDist(slice(col("__qv"), s * wcol + 1, wcol), cv)))
        .as("__luts"))
    val cands = entries.join(broadcast(probes), Seq("__ccid"))
      .select(col("qid"), col(idCol), col("code"))
    val kw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("dist"), col(idCol))
    cands.join(broadcast(luts), "qid")
      .select(col("qid"), col(idCol),
        aggregate(zip_with(col("code"),
            sequence(lit(0L), lit(m - 1L)), (cid, s) =>
            element_at(element_at(col("__luts"), s.cast("int") + 1),
              cid.cast("int") + 1)),
          lit(0.0), (acc, v) => acc + v).as("dist"))
      .withColumn("rank", row_number().over(kw).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col(idCol).as("nid"), col("rank"), col("dist"))
  }

  /** Residual-encoding IVF-PQ — the paper's actual §IV recipe (Jégou et
    * al. 2011): PQ codebooks train on the RESIDUAL r = v − c_coarse(v)
    * rather than the raw vector, so the quantizer spends its codewords
    * on the (much tighter) within-list displacement distribution — the
    * standard recall boost over [[ivfAdcTopK]]'s raw-vector codes at
    * identical storage and scan cost.
    *
    * What changes relative to [[ivfAdcTopK]]:
    *  - residuals are computed in the SAME broadcast pass as the coarse
    *    assignment (argmin carries the winning centroid vector along, so
    *    no second join) — one map-only pass, zero shuffle;
    *  - the ADC lookup table becomes per-(query, probed list): the query
    *    residualizes against EACH probed coarse centroid, so the LUT is
    *    queries × nprobe × m × kCodes rows — still bounded, still
    *    broadcast;
    *  - candidates join the LUT on (qid, coarse list) instead of qid
    *    alone (a row's code only scores against the LUT of its own
    *    list's residual frame).
    *
    * Scale: the corpus-side work is identical to [[ivfAdcTopK]] (two
    * bounded trainings, pruned candidate scan, WindowGroupLimit top-k);
    * the residual pass adds one codegen'd zip_with per row. The residual
    * frame is recomputed per training scan rather than checkpointed —
    * at 100 TB a map-only recompute from the checkpointed coarse
    * centroids is cheaper than materializing a second copy of the
    * corpus. Determinism: residual subtraction is exact IEEE on
    * identical operands, and every training/ranking stage inherits the
    * [[KMeans]] replay discipline — a SQL engine reproduces codes and
    * ranks bit-for-bit. */
  def ivfAdcTopKRes(df: DataFrame, idCol: String, vecCol: String,
      queryIds: Seq[Long], k: Int, nlist: Int = 8, nprobe: Int = 2,
      m: Int = 2, kCodes: Int = 8, iters: Int = 2): DataFrame = {
    val idx = buildIndexRes(df, idCol, vecCol, nlist, m, kCodes, iters)
    val qs = df.select(col(idCol).cast("long").as(idCol),
        transform(col(vecCol), x => x.cast("double")).as("__qv"))
      .filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("qid"), col("__qv"))
    searchIndexRes(idx, qs, idCol, k, nprobe)
  }

  /** The residual-IVF-PQ SERVING index — the persisted artifact the
    * training-time operators exist to produce: coarse centroids, PQ
    * codebooks (both FROZEN after [[buildIndexRes]]) and the entries
    * table (id, coarse list, PQ code — the only data-scale piece, ~
    * (8 + 2m) bytes/vector). [[addBatchRes]] ingests new vectors
    * against the frozen codebooks (one broadcast argmin pass — no
    * retraining, the production serving contract; retrain when the
    * residual distribution drifts), [[searchIndexRes]] answers queries
    * from the index alone, and [[save]]/[[load]] round-trip all three
    * frames as parquet. */
  case class ResIndex(coarse: DataFrame, books: DataFrame,
      entries: DataFrame, tombstones: Option[DataFrame] = None)

  def save(idx: ResIndex, dir: String): Unit = {
    idx.coarse.write.mode("overwrite").parquet(s"$dir/coarse")
    idx.books.write.mode("overwrite").parquet(s"$dir/books")
    idx.entries.write.mode("overwrite").parquet(s"$dir/entries")
    idx.tombstones.getOrElse(
        idx.entries.sparkSession.range(0).select(col("id").as("__tid")))
      .write.mode("overwrite").parquet(s"$dir/tombs")
  }

  def load(spark: org.apache.spark.sql.SparkSession, dir: String): ResIndex = {
    // Only a MISSING tombs dir (pre-tombstone save) may read as "no
    // tombstones" — a corrupt/unreadable tombs dir must propagate, or
    // logically deleted ids silently resurface in search results.
    val tombsPath = new org.apache.hadoop.fs.Path(s"$dir/tombs")
    val fs = tombsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    ResIndex(spark.read.parquet(s"$dir/coarse"),
      spark.read.parquet(s"$dir/books"),
      spark.read.parquet(s"$dir/entries"),
      if (fs.exists(tombsPath)) Some(spark.read.parquet(s"$dir/tombs"))
      else None)
  }

  /** Logical delete from a frozen serving index: ids land in a
    * TOMBSTONE table, the entry table is untouched — deletion is O(ids),
    * never an O(corpus) rewrite (the LSM discipline). [[searchIndexRes]]
    * anti-joins candidates against the tombstones (broadcast — the set
    * is bounded by the delete traffic between [[compactRes]] runs);
    * amortize with compaction once the set stops being small. */
  def deleteRes(idx: ResIndex, ids: DataFrame, idCol: String): ResIndex = {
    val t = ids.select(col(idCol).cast("long").as("__tid")).distinct()
    idx.copy(tombstones = Some(idx.tombstones match {
      case Some(old) => old.unionByName(t).distinct()
      case None => t
    }))
  }

  /** Physical compaction: drop tombstoned entries (one anti-join over
    * the entry table — the only O(corpus) maintenance op, run on YOUR
    * schedule, not per delete) and clear the tombstone set. */
  def compactRes(idx: ResIndex, idCol: String): ResIndex =
    idx.copy(
      entries = idx.tombstones match {
        case Some(t) => idx.entries.join(
          broadcast(t.withColumnRenamed("__tid", idCol)), Seq(idCol),
          "left_anti")
        case None => idx.entries
      },
      tombstones = None)

  /** Retrain-on-drift trigger for a frozen serving index: PSI of a new
    * batch's coarse-list assignment mass against the index entries'
    * list mass — the structural signal that the frozen coarse quantizer
    * no longer fits the data (lists going over/under-full degrade both
    * recall at fixed nprobe and ADC error). Same engine-exact
    * discipline as [[Drift]]: add-one smoothing over the FULL list set
    * (every cid of the coarse book, so V is fixed and empty lists stay
    * finite), per-list floor-quantized pico terms, long sum. The global
    * window is bounded by nlist — never a data-scale sort.
    *
    * Output, one row per coarse list: (ccid, n_base, n_new,
    * psi_term_pico) plus the constant (psi_pico, retrain) decision
    * columns; `retrain` is psi_pico > threshold (default 0.25 — the
    * classic "significant shift" PSI bar). The batch pays ONE broadcast
    * argmin assignment pass; entry mass is one count aggregate. */
  /** The retrain loop closed: evaluate [[retrainSignal]] for the batch
    * and REBUILD from `trainCorpus` when it fires (fresh codebooks,
    * fresh entries, tombstones gone), else return the index unchanged.
    * `trainCorpus` is the caller's full current corpus — the entry
    * table stores codes, not vectors, so only the caller can supply
    * training data (include the batch in it if the batch was ingested).
    * An empty batch never fires (its smoothed mass is all-uniform
    * noise, not evidence). The signal collect is ONE row; the rebuild
    * costs what [[buildIndexRes]] costs, on YOUR trigger — which is the
    * point: retraining is a scheduled decision, not a per-batch tax.
    * Geometry (nlist/m/kCodes) defaults to -1 = INHERIT from the live
    * index (coarse-list count, book count, codes per book — three
    * aggregates over the two codebook-sized frames), so a rebuild
    * reproduces the serving shape instead of silently snapping to
    * library defaults. */
  def maybeRetrain(idx: ResIndex, trainCorpus: DataFrame, batch: DataFrame,
      idCol: String, vecCol: String, nlist: Int = -1, m: Int = -1,
      kCodes: Int = -1, iters: Int = 2,
      psiPicoThreshold: Long = 250000000000L): (ResIndex, Boolean) = {
    if (batch.isEmpty) return (idx, false)
    val fired = retrainSignal(idx, batch, idCol, vecCol, psiPicoThreshold)
      .select(col("retrain")).limit(1).head().getBoolean(0)
    if (!fired) (idx, false)
    else {
      val useNlist = if (nlist > 0) nlist
        else idx.coarse.select(col("cid")).distinct().count().toInt
      val geo = idx.books.agg(
        countDistinct(col("sub")).as("m"),
        (countDistinct(col("sub"), col("cid")) /
          countDistinct(col("sub"))).cast("int").as("k")).head()
      val useM = if (m > 0) m else geo.getLong(0).toInt
      val useK = if (kCodes > 0) kCodes else geo.getInt(1)
      (buildIndexRes(trainCorpus, idCol, vecCol, useNlist, useM, useK,
        iters), true)
    }
  }

  def retrainSignal(idx: ResIndex, batch: DataFrame, idCol: String,
      vecCol: String,
      psiPicoThreshold: Long = 250000000000L): DataFrame = {
    val pts = batch.select(col(idCol).cast("long").as(idCol),
      transform(col(vecCol), x => x.cast("double")).as("__v"))
    val asg = residualsOf(pts, idCol, coarseLit(idx.coarse))
      .groupBy(col("__ccid")).agg(count(lit(1)).as("n_new"))
    val base = idx.entries.groupBy(col("__ccid"))
      .agg(count(lit(1)).as("n_base"))
    val lists = idx.coarse.select(col("cid").as("__ccid")).distinct()
    val joined = lists
      .join(base, Seq("__ccid"), "left")
      .join(asg, Seq("__ccid"), "left")
      .select(col("__ccid"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
    val tot = joined.agg(sum(col("n_base")).as("__ta"),
      sum(col("n_new")).as("__tb"), count(lit(1)).as("__vv"))
    val pa = (col("n_base") + 1).cast("double") / (col("__ta") + col("__vv"))
    val pb = (col("n_new") + 1).cast("double") / (col("__tb") + col("__vv"))
    val terms = joined.crossJoin(broadcast(tot))
      .select(col("__ccid").as("ccid"), col("n_base"), col("n_new"),
        floor((pa - pb) * log(pa / pb) * lit(1e12)).cast("long")
          .as("psi_term_pico"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    terms
      .withColumn("psi_pico", sum(col("psi_term_pico")).over(w))
      .withColumn("retrain", col("psi_pico") > psiPicoThreshold)
  }

  /** Coarse book literal from (cid, dim, c) rows — collected once (the
    * nlist×dim model), sorted by cid; same rows/order as the old packed
    * broadcast frame. */
  private def coarseLit(coarseCb: DataFrame): Column = {
    val rows = coarseCb.select(col("cid").cast("long"),
      col("dim").cast("long"), col("c")).collect()
    bookLit(rows.groupBy(_.getLong(0)).toArray.sortBy(_._1).map {
      case (cid, cs) =>
        val dim = cs.map(_.getLong(1)).max.toInt + 1
        val v = new Array[Double](dim)
        cs.foreach(r => v(r.getLong(1).toInt) = r.getDouble(2))
        (cid, v)
    })
  }

  /** Coarse assignment + residual in ONE literal argmin: the winning
    * (d, cid, cvec) struct carries the centroid, so r = v − cvec costs
    * no extra join ((d, cid) is unique per row — cvec never
    * tie-breaks). Output (id, __ccid, __rv). */
  private def residualsOf(pts: DataFrame, idCol: String,
      coarse: Column): DataFrame =
    pts
      .withColumn("__best", array_min(transform(coarse, c =>
        struct(KMeans.sqDist(col("__v"), c.getField("cvec")).as("d"),
          c.getField("cid").as("cid"), c.getField("cvec").as("cvec")))))
      .select(col(idCol), col("__best").getField("cid").as("__ccid"),
        zip_with(col("__v"), col("__best").getField("cvec"),
          (a, b) => a - b).as("__rv"))

  /** Train coarse + residual PQ codebooks on `df` and encode its rows —
    * the index build. */
  def buildIndexRes(df: DataFrame, idCol: String, vecCol: String,
      nlist: Int = 8, m: Int = 2, kCodes: Int = 8, iters: Int = 2)
      : ResIndex = {
    val pts = df.select(col(idCol).cast("long").as(idCol),
      transform(col(vecCol), x => x.cast("double")).as("__v"))
    val coarseCb = KMeans.fit(pts, idCol, "__v", nlist, iters)
      .localCheckpoint(true)
    val res = residualsOf(pts, idCol, coarseLit(coarseCb))
    val cb = train(res, idCol, "__rv", m, kCodes, iters)
      .localCheckpoint(true)
    // one projection: the residual frame already carries the list, and
    // the PQ argmin is map-only — no second scan, no id-keyed join
    val entries = res.select(col(idCol), col("__ccid"),
      codeExpr(col("__rv"), booksLit(cb), m).as("code"))
    ResIndex(coarseCb, cb, entries)
  }

  /** Encode a NEW batch against the index's FROZEN codebooks: one
    * broadcast argmin pass for list + residual, one for the PQ codes —
    * no retraining, no index shuffle. Returns the batch's entries
    * (append to `entries`, or [[save]] a new index). */
  def addBatchRes(idx: ResIndex, batch: DataFrame, idCol: String,
      vecCol: String, m: Int = 2): DataFrame = {
    val pts = batch.select(col(idCol).cast("long").as(idCol),
      transform(col(vecCol), x => x.cast("double")).as("__v"))
    val res = residualsOf(pts, idCol, coarseLit(idx.coarse))
    res.select(col(idCol), col("__ccid"),
      codeExpr(col("__rv"), booksLit(idx.books), m).as("code"))
  }

  /** Query the index: `queries` is (qid, __qv double vector); same
    * probe/LUT/ADC arithmetic as [[ivfAdcTopKRes]] (which is literally
    * build + this). */
  def searchIndexRes(idx: ResIndex, queries: DataFrame, idCol: String,
      k: Int, nprobe: Int = 2): DataFrame = {
    require(k > 0 && nprobe > 0, s"k=$k nprobe=$nprobe")
    val booksC = collectBooks(idx.books) // the m*k*(d/m) model, once
    val m = booksC.map(_._1).max.toInt + 1
    val coarse = coarseLit(idx.coarse)
    // nprobe nearest coarse lists per query, each probe carrying the
    // query's residual against THAT list's centroid — a pure projection
    // (array_sort over the coarse literal, slice nprobe), no window
    val probes = queries
      .select(col("qid"),
        explode(probeArr(coarse, col("__qv"), nprobe, carryCvec = true))
          .as("__p"), col("__qv"))
      .select(col("qid"), col("__p").getField("cid").as("__ccid"),
        zip_with(col("__qv"), col("__p").getField("cvec"),
          (a, b) => a - b).as("__qr"))
    // per-(query, list, sub, codeword) exact residual distances, packed
    // cid-indexed per (query, list) — the old collect_list(array_sort)
    // layout projected from the nested book literal (no explode, no
    // shuffle): queries × nprobe rows, each carrying the m×kCodes LUT
    val wcol = (size(col("__qr")) / m).cast("int")
    val booksNested = lutBooksLit(booksC)
    val luts = probes.select(col("qid"), col("__ccid"),
      transform(booksNested, (book, s) =>
        transform(book, cv =>
          KMeans.sqDist(slice(col("__qr"), s * wcol + 1, wcol), cv)))
        .as("__luts"))
    // tombstoned ids never surface (logical delete — anti-join against
    // the bounded tombstone set BEFORE ranking, so top-k refills)
    val alive = idx.tombstones match {
      case Some(t) => idx.entries.join(
        broadcast(t.withColumnRenamed("__tid", idCol)), Seq(idCol),
        "left_anti")
      case None => idx.entries
    }
    // the entries scan already carries each row's code (id is unique in
    // the entry table) — no second entries scan, no id-keyed join
    val cands = alive.select(col(idCol), col("__ccid"), col("code"))
      .join(broadcast(probes.select(col("qid"), col("__ccid"))), Seq("__ccid"))
    val kw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("dist"), col(idCol))
    cands.join(broadcast(luts), Seq("qid", "__ccid"))
      .select(col("qid"), col(idCol),
        aggregate(zip_with(col("code"),
            sequence(lit(0L), lit(m - 1L)), (cid, s) =>
            element_at(element_at(col("__luts"), s.cast("int") + 1),
              cid.cast("int") + 1)),
          lit(0.0), (acc, v) => acc + v).as("dist"))
      .withColumn("rank", row_number().over(kw).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col(idCol).as("nid"), col("rank"), col("dist"))
  }

  /** Exact re-rank ("refine") on top of [[ivfAdcTopKRes]] — the standard
    * completion of the IVF-PQ recipe (FAISS's RefineFlat stage): ADC
    * ranks `k × refine` candidates per query from the compressed codes,
    * then ONLY those rows reload their float vectors for an exact
    * squared-L2 re-rank to the final top-k. Buys back the quantization
    * error at the cost of touching k·refine·queries raw vectors — a
    * bounded frame regardless of corpus size.
    *
    * Scale: the candidate set (queries × k·refine ids) broadcasts into
    * ONE corpus scan to fetch vectors — the corpus never shuffles and no
    * index structure beyond the ADC pipeline exists; the re-rank window
    * is per-query over k·refine rows. Determinism: exact distances fold
    * in index order on identical operands; ties to the lower id — the
    * full chain (three trainings + ADC + refine) replays on any SQL
    * engine. */
  def ivfAdcTopKRefined(df: DataFrame, idCol: String, vecCol: String,
      queryIds: Seq[Long], k: Int, refine: Int = 4, nlist: Int = 8,
      nprobe: Int = 2, m: Int = 2, kCodes: Int = 8, iters: Int = 2)
      : DataFrame = {
    require(refine >= 1, s"refine=$refine must be >= 1")
    val approx = ivfAdcTopKRes(df, idCol, vecCol, queryIds, k * refine,
      nlist, nprobe, m, kCodes, iters)
    val pts = df.select(col(idCol).cast("long").as(idCol),
      transform(col(vecCol), x => x.cast("double")).as("__v"))
    val qs = pts.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("qid"), col("__v").as("__qv"))
    val kw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("dist"), col("nid"))
    broadcast(approx.select(col("qid"), col("nid")))
      .join(pts.withColumnRenamed(idCol, "nid"), "nid")
      .join(broadcast(qs), "qid")
      .select(col("qid"), col("nid"),
        KMeans.sqDist(col("__v"), col("__qv")).as("dist"))
      .withColumn("rank", row_number().over(kw).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"), col("dist"))
  }
}
