package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines
  * (beyond reference parity — SURVEY.md §7.4 item 6 / BASELINE north star).
  *
  * Everything is built from codegen'd built-ins and higher-order functions:
  * per-row work with no shuffle, so each operator scales linearly and
  * pipelines inside whole-stage codegen wherever the HOFs allow.
  */
object TextAnalysis {

  /** Whitespace tokenization. The testdata corpus is single-space word
    * soup; `split(_, " ")` matches DuckDB's `string_split(text, ' ')` for
    * oracle parity. */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword count: whitespace words plus punctuation splits —
    * approximates tokenizer token counts without a vocab. */
  def subwordCount(text: Column): Column =
    size(split(text, "[\\s\\p{Punct}]+")).cast("long")

  /** Word n-gram shingles (distinct), the unit for near-dup Jaccard.
    * Returns array<string>; empty when the document has fewer than n
    * tokens. Native single-pass expression (see Shingles): the HOF
    * formulation re-split the text once per output gram. */
  def shingles(text: Column, n: Int): Column = Shingles(text, n)

  /** Quality metrics per document: char count, token count, mean token
    * length, stopword ratio, punctuation ratio. Null-safe on empty text. */
  def quality(df: DataFrame, textCol: String, idCol: String,
      stopwords: Seq[String] = defaultStopwords): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val n = size(toks)
    val sw = array(stopwords.map(lit): _*)
    df.select(
      col(idCol),
      length(t).cast("long").as("chars"),
      n.cast("long").as("n_tokens"),
      round(length(t).cast("double") / n, 6).as("chars_per_token"),
      round(size(filter(toks, tk => array_contains(sw, tk))).cast("double") / n, 6)
        .as("stopword_ratio"),
      round((length(t) - length(regexp_replace(t, "[\\p{Punct}]", ""))).cast("double")
        / length(t), 6).as("punct_ratio"))
  }

  val defaultStopwords: Seq[String] = Seq("the", "a", "an", "of", "and", "to", "in")

  /** Language profiles: tiny per-language stopword/function-word sets for
    * the n-gram-free heuristic language ID. Public knowledge (most frequent
    * function words per language). */
  val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "por"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "den", "mit", "zu", "ein"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une", "est", "que"),
    "it" -> Seq("il", "la", "di", "che", "e", "un", "per", "con", "del", "una"))

  /** Heuristic language ID: argmax over per-language function-word hit
    * counts; "und" (undetermined) when nothing matches; ties resolve to
    * the lexicographically greatest language. Single-pass native Catalyst
    * expression (see LanguageId) — no shuffle, no UDF. */
  def languageId(text: Column): Column = LanguageId(text, langProfiles)

  /** Per-document Shannon word entropy — the diversity quality signal
    * (RedPajama-v2's unigram_entropy): see [[WordEntropyStats]] for the
    * exact-integer contract. struct(n_tokens, n_types, entropy_nano). */
  def wordEntropy(text: Column): Column = WordEntropyStats(text)

  /** Within-document repetition ratio: fraction of word n-grams that are
    * repeats of an earlier n-gram (1 - distinct/total). The standard
    * boilerplate/degenerate-text quality signal — high values flag looped
    * or template-stuffed documents. Pure per-row arithmetic over the
    * native shingle kernel. */
  def repetitionRatio(text: Column, n: Int = 3): Column = {
    val total = tokenCount(text) - (n - 1)
    round(when(total > 0,
      lit(1.0) - size(shingles(text, n)).cast("double") / total)
      .otherwise(lit(0.0)), 6)
  }

  /** 64-bit content fingerprint over normalized text (lowercase, collapsed
    * whitespace) — xxhash64, seed fixed by Spark. Exact-dup detection key. */
  def fingerprint(text: Column): Column =
    xxhash64(regexp_replace(lower(text), "\\s+", " "))

  /** PII / identifier redaction — the standard pre-training scrub: URLs,
    * then emails, then long digit runs (phone numbers, account ids)
    * replaced with placeholder tokens. A chain of codegen'd
    * regexp_replace calls, per-row and shuffle-free; the patterns are
    * RE2-compatible so an engine-independent oracle can replay them
    * verbatim. URL first: an email-shaped userinfo inside a URL must be
    * swallowed by the URL token, not split in two. `\d{6,}` deliberately
    * spares short numbers (years, quantities) — six consecutive digits is
    * where identifiers start and natural text stops. */
  def redact(text: Column, urlToken: String = "<URL>",
      emailToken: String = "<EMAIL>", numToken: String = "<NUM>"): Column = {
    val url = regexp_replace(text, "https?://[^\\s]+", urlToken)
    val mail = regexp_replace(url,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", emailToken)
    regexp_replace(mail, "\\d{6,}", numToken)
  }

  /** Winnowing fingerprints (Schleimer, Wilkerson, Aiken 2003, "Winnowing:
    * local algorithms for document fingerprinting"): hash every word
    * k-gram, slide a window of `w` consecutive hashes, keep the window
    * minimum, dedupe. Guarantees every shared run of >= w+k-1 tokens
    * between two documents shares >= 1 fingerprint — the basis for
    * CONTAINMENT detection (doc-inside-doc), which whole-doc hashes and
    * set-Jaccard both miss. Native linear-time expression (see
    * WinnowFingerprints): the doubly-nested HOF formulation rebuilt the
    * gram-hash array once per window — O(len^3) per document. */
  def winnowFingerprints(text: Column, k: Int = 3, w: Int = 4): Column =
    WinnowFingerprints(text, k, w)

  /** Per-document top-k TF-IDF keywords — the standard corpus-level
    * term-salience signal (domain tagging, topic routing, dedup features).
    *
    * score = (cnt / doc_len) * (n_docs / df): plain tf * idf without the
    * log so both engines compute the identical IEEE double from identical
    * integer operands (log implementations differ in the last ulp across
    * runtimes; a monotone transform would not change the ranking anyway).
    * Ties (same tf and df) break on the term string, so top-k is fully
    * deterministic.
    *
    * Scale shape: explode -> groupBy (doc, term) [one shuffle, map-side
    * partial counts]; document frequency by aggregate on term [shuffle
    * bounded by vocabulary]; then ONE doc-keyed shuffle serves both the
    * doc-length window (whole-partition sum, no sort) and the rank window
    * (row_number with k pushed down — WindowGroupLimit prunes to k rows
    * per doc map-side). Nothing is ever all-pairs or collected. */
  def tfidfTopK(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5, eager: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = df.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("term"))
    // two consumers (scores, document frequencies) — persist rather than
    // recompute the explode+count per branch. Session-scoped lifecycle,
    // same as Dedup.shingleSets: clearCache() between corpora.
    val tf = tok.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // corpus size derived IN-PLAN from the already-persisted tf (distinct
    // doc ids), broadcast as a 1-row frame — not a separate df.count() job,
    // which would pay a whole extra corpus scan at 100 TB. (Every doc emits
    // >= 1 term row — split(" ") of even an empty string yields [""] — so
    // the distinct-doc count equals the row count of non-null-text docs.)
    val nDocs = broadcast(tf.select(col("doc_id")).distinct()
      .agg(count(lit(1)).as("__n_docs")))
    val byDoc = Window.partitionBy(col("doc_id"))
    val out = tf.join(dfreq, "term")
      .crossJoin(nDocs)
      .withColumn("len", sum(col("cnt")).over(byDoc))
      .withColumn("score",
        (col("cnt").cast("double") / col("len")) *
          (col("__n_docs").cast("double") / col("df")))
      .withColumn("rank", row_number().over(
        byDoc.orderBy(col("score").desc, col("term"))))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank").cast("long").as("rank"),
        col("term"), round(col("score"), 6).as("score"))
    Dedup.finishEager(out, eager, Seq(tf))
  }

  /** Overlapping token-window chunking — the standard long-document to
    * context-window preprocessing step. With stride = chunkTokens -
    * overlap, chunk i covers tokens [i*stride, i*stride + chunkTokens);
    * a document of n tokens yields 1 + ceil((n - chunkTokens) / stride)
    * chunks (always >= 1; the last chunk may be short). Pure per-row
    * fan-out (sequence + slice inside codegen), no shuffle — the chunk
    * count is data-proportional exactly like frame sampling.
    * Output: (idCol, chunk_idx, chunk, n_chunk_tokens). */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlap: Int = 0): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      "need 0 <= overlap < chunkTokens")
    val stride = chunkTokens - overlap
    val toks = tokens(col(textCol))
    val n = size(toks)
    val nc = when(n <= chunkTokens, lit(1))
      .otherwise(ceil((n - chunkTokens).cast("double") / stride).cast("int") + 1)
    df.select(col(idCol), toks.as("__toks"),
        explode(sequence(lit(0), nc - 1)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        slice(col("__toks"), col("chunk_idx") * stride + 1, lit(chunkTokens))
          .as("__ct"))
      .select(col(idCol), col("chunk_idx"),
        array_join(col("__ct"), " ").as("chunk"),
        size(col("__ct")).cast("long").as("n_chunk_tokens"))
  }

  /** Sentence-aware chunking — the RAG-prep form of [[chunk]]: fixed
    * word windows cut sentences mid-clause, which embeds badly; this
    * variant splits on sentence terminators (`[.!?]+`, a trailing
    * terminator-less fragment counts as a sentence) and GREEDY-packs
    * whole sentences into chunks of at most `maxWords` words — a chunk
    * always takes at least one sentence, so an oversized sentence
    * becomes its own (over-budget) chunk rather than being split or
    * dropped. Output per chunk: (idCol, chunk_idx, chunk — sentences
    * re-joined with single spaces, n_chunk_words). Documents with no
    * sentences emit nothing.
    *
    * Scale shape: one regexp extraction + one linear per-row fold (the
    * accumulator only appends — no per-element re-slicing of the
    * source, the [[graft.ext.Repetition]] HOF lesson) + one
    * posexplode; zero shuffles. */
  def chunkBySentences(df: DataFrame, idCol: String, textCol: String,
      maxWords: Int): DataFrame = {
    require(maxWords > 0, s"maxWords=$maxWords must be positive")
    val raw = regexp_extract_all(col(textCol),
      lit("[^.!?]+(?:[.!?]+|$)"), lit(0))
    val sents = filter(transform(raw, s => trim(s)), s => length(s) > 0)
    val seed = struct(
      typedLit(Seq.empty[(String, Long)]).as("done"),
      lit("").as("curt"), lit(0L).as("curw"))
    val folded = aggregate(
      sents, seed,
      (acc, s) => {
        val w = size(split(s, "\\s+")).cast("long")
        val done = acc.getField("done")
        val curt = acc.getField("curt")
        val curw = acc.getField("curw")
        when(curw === 0L,
          struct(done.as("done"), s.as("curt"), w.as("curw")))
        .when(curw + w > maxWords,
          struct(concat(done,
            array(struct(curt.as("_1"), curw.as("_2")))).as("done"),
            s.as("curt"), w.as("curw")))
        .otherwise(
          struct(done.as("done"),
            concat(curt, lit(" "), s).as("curt"),
            (curw + w).as("curw")))
      },
      acc => when(acc.getField("curw") > 0L,
        concat(acc.getField("done"),
          array(struct(acc.getField("curt").as("_1"),
            acc.getField("curw").as("_2")))))
        .otherwise(acc.getField("done")))
    df.select(col(idCol), posexplode(folded).as(Seq("chunk_idx", "__c")))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        col("__c._1").as("chunk"),
        col("__c._2").as("n_chunk_words"))
  }

  /** Containment pairs via the winnowing inverted index: fraction of a's
    * fingerprints found in b (and vice versa) for every pair sharing at
    * least one fingerprint. `containment` is directional:
    * |FP(a) n FP(b)| / |FP(a)| — near 1.0 when a is quoted inside b.
    * Same linear-shuffle shape as Dedup.ngramJaccardPairs, with the same
    * 100 TB guard: `maxDf` (ON by default) keeps corpus-hot fingerprints
    * (boilerplate shared by > maxDf docs) out of the candidate join — a
    * fingerprint in df docs contributes C(df,2) candidates. Containment
    * values stay exact: hot fingerprints return to the intersection count
    * via small per-doc hot sets (Dedup.splitHot). A pair is missed only
    * when EVERY fingerprint it shares is corpus-hot. */
  def containmentPairs(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, k: Int = 3, w: Int = 4, threshold: Double = 0.8,
      maxDf: Option[Long] = Some(1000L),
      eager: Boolean = false): org.apache.spark.sql.DataFrame = {
    val fp = df.select(col(idCol).as("id"),
      winnowFingerprints(col(textCol), k, w).as("fp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // fingerprint-set sizes ride the index (8 bytes/row) so the pair
    // aggregation emits them directly — two join stages cheaper than
    // attaching sizes afterwards (same trick as ngramJaccardPairs; no
    // size-ratio pruning though: containment is one-directional, so a
    // tiny quoted doc legitimately pairs with a huge one)
    val inv0 = fp.select(col("id"), size(col("fp")).as("sz"),
      explode(col("fp")).as("h"))
    val (inv, hotCorrection, invCaches) = Dedup.splitHot(inv0, "h", maxDf)
    val shared = inv.as("a").join(inv.as("b"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("i"), col("b.id").as("j"))
      .agg(count(lit(1)).as("inter_cold"),
        first(col("a.sz")).as("sz_i"), first(col("b.sz")).as("sz_j"))
    val out = hotCorrection(shared)
      .withColumn("containment_i", col("inter").cast("double") / col("sz_i"))
      .withColumn("containment_j", col("inter").cast("double") / col("sz_j"))
      .filter(col("containment_i") >= threshold || col("containment_j") >= threshold)
      .select(col("i"), col("j"), col("containment_i"), col("containment_j"))
    Dedup.finishEager(out, eager, fp +: invCaches)
  }

  /** Corpus-wide top-k vocabulary terms (heavy hitters) by document
    * frequency or total occurrences — the vocabulary-building / stopword-
    * discovery primitive. One explode + one term-keyed aggregation with
    * map-side partial counts (shuffle bounded by vocabulary, not corpus),
    * then top-k compiles to TakeOrderedAndProject: per-partition heaps +
    * a driver merge of k rows per partition, never a global sort. Ties
    * break on the term string, so the result is fully deterministic. */
  def topTerms(df: DataFrame, idCol: String, textCol: String, k: Int,
      byDocFreq: Boolean = true): DataFrame = {
    val terms =
      if (byDocFreq)
        // shingles(n=1) = distinct tokens per doc, so the count is the
        // document frequency without a (doc, term) distinct shuffle
        df.select(explode(shingles(col(textCol), 1)).as("term"))
      else
        df.select(explode(tokens(col(textCol))).as("term"))
    terms.groupBy(col("term")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term"))
      .limit(k)
  }

  /** Benchmark decontamination — flag every corpus document sharing any
    * word n-gram with a benchmark/eval set, the standard pre-training
    * hygiene step (a training corpus containing eval n-grams inflates the
    * benchmark score it was supposed to measure). The conventional n is
    * ~13 tokens (long enough that natural reuse is implausible); it is a
    * policy knob, not a correctness one.
    *
    * Scale shape — the asymmetry IS the design: the benchmark is small by
    * contract (an eval set, thousands of documents), the corpus is the
    * 100 TB side. The benchmark's distinct gram hashes BROADCAST, so the
    * corpus is scanned exactly once with a map-side broadcast-hash
    * semi-probe — the corpus never shuffles to find its matches. Only the
    * matched (doc, gram) rows — rare by construction — reach the per-doc
    * aggregation, and the flag joins back to the corpus keyed on id (AQE
    * broadcasts the hit table when it is small, which it is when
    * contamination is rare). Grams travel as xxhash64 longs, not strings:
    * 8 bytes/row through the probe regardless of n.
    *
    * Output: the corpus with `n_bench_grams` (distinct benchmark grams
    * matched) and `contaminated` appended. Use [[dropContaminated]] for
    * the filter form (an anti-join — no count, one stage fewer). */
  def decontaminate(corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String, n: Int = 13): DataFrame = {
    val benchGrams = broadcast(
      benchmark.select(explode(shingles(col(benchTextCol), n)).as("g"))
        .select(xxhash64(col("g")).as("__bg")).distinct())
    val hits = corpus
      .select(col(idCol), explode(shingles(col(textCol), n)).as("g"))
      .select(col(idCol), xxhash64(col("g")).as("__bg"))
      .join(benchGrams, "__bg")
      // shingles() already dedupes grams per document, so count(*) is the
      // distinct-gram hit count — no countDistinct buffer needed
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_bench_grams"))
    corpus.join(hits, Seq(idCol), "left")
      .withColumn("contaminated", col("n_bench_grams").isNotNull)
      .withColumn("n_bench_grams", coalesce(col("n_bench_grams"), lit(0L)))
  }

  /** Multi-benchmark contamination REPORT — production decontamination
    * screens against DOZENS of eval sets at once and must say WHICH one
    * leaked (dropping a doc is cheap; knowing your MMLU split is the
    * contaminated one is the actionable part). One labeled benchmark
    * frame in, one (doc, benchmark) overlap table out:
    * `(idCol, benchIdCol, n_bench_grams)` for every contaminated pair —
    * distinct n-grams shared, rows only where overlap exists (join the
    * corpus back for the clean majority).
    *
    * Scale shape: identical to [[decontaminate]] — the union of all
    * benchmarks' distinct (bench, gram-hash) rows broadcasts (eval sets
    * are small by contract, and a gram shared by two benchmarks carries
    * one row per benchmark); ONE corpus scan probes it; only matched
    * rows reach the (doc, bench) aggregation. A gram repeated within a
    * document still counts once per (doc, bench): document shingles are
    * distinct by construction. */
  def contaminationReport(corpus: DataFrame, idCol: String,
      textCol: String, benchmarks: DataFrame, benchIdCol: String,
      benchTextCol: String, n: Int = 13): DataFrame = {
    val benchGrams = broadcast(
      benchmarks.select(col(benchIdCol),
          explode(shingles(col(benchTextCol), n)).as("g"))
        .select(col(benchIdCol), xxhash64(col("g")).as("__bg"))
        .distinct())
    corpus
      .select(col(idCol), explode(shingles(col(textCol), n)).as("g"))
      .select(col(idCol), xxhash64(col("g")).as("__bg"))
      .join(benchGrams, "__bg")
      .groupBy(col(idCol), col(benchIdCol))
      .agg(count(lit(1)).as("n_bench_grams"))
  }

  /** Decontamination as a filter: corpus rows sharing NO word n-gram with
    * the benchmark. Broadcast anti-join against the hit ids — the corpus
    * is scanned once and never shuffled. */
  def dropContaminated(corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String, n: Int = 13): DataFrame = {
    val benchGrams = broadcast(
      benchmark.select(explode(shingles(col(benchTextCol), n)).as("g"))
        .select(xxhash64(col("g")).as("__bg")).distinct())
    val hitIds = corpus
      .select(col(idCol), explode(shingles(col(textCol), n)).as("g"))
      .select(col(idCol), xxhash64(col("g")).as("__bg"))
      .join(benchGrams, "__bg")
      .select(col(idCol)).distinct()
    corpus.join(hitIds, Seq(idCol), "left_anti")
  }

  /** Ranked keyword retrieval over the corpus — the inverted-index
    * search primitive (find the training documents about X; the recall
    * half of a retrieval pipeline before any embedding rerank). Ranked
    * OR: a document matching ANY query term scores, score = Σ over
    * matched terms of (tf/len) * (n/df) — the same log-free TF-IDF the
    * keyword extractor uses, so scores are pure rationals of integer
    * counts and replay exactly on any engine. Ties break on id.
    *
    * Scale shape: the `isin(queryTerms)` filter runs inside the scan's
    * codegen right after the per-row tokenize, so only (doc, matched
    * term) rows — rare for selective queries — ever reach a shuffle; df
    * comes from the surviving rows (for query terms, that IS the
    * document frequency), n rides as a broadcast 1-row count (no extra
    * corpus pass), and top-k compiles to TakeOrderedAndProject, never a
    * global sort. */
  def search(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int): DataFrame = {
    require(queryTerms.nonEmpty && k > 0, "search needs terms and k > 0")
    val n = broadcast(df.agg(count(lit(1)).as("n")))
    val tf = df.select(col(idCol), size(tokens(col(textCol))).as("len"),
        explode(tokens(col(textCol))).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy(col(idCol), col("len"), col("term"))
      .agg(count(lit(1)).as("cnt"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "term").crossJoin(n)
      .withColumn("s", col("cnt").cast("double") / col("len") *
        (col("n").cast("double") / col("df")))
      // per-doc sum in floor-quantized LONG units: 3+ double addends
      // would otherwise sum in partition order (see PageRank — round()
      // is NOT the fix, floor of the same double is)
      .groupBy(col(idCol))
      .agg(sum(floor(col("s") * lit(1e12)).cast("long")).as("su"),
        count(lit(1)).as("n_terms"))
      .withColumn("score", col("su").cast("double") / lit(1e12))
      .orderBy(col("su").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("score"), col("n_terms"))
  }

  /** Corpus-wide exact line DEDUP (C4's other line-level scrub): every
    * line keeps only its FIRST occurrence — the occurrence with the
    * smallest (id, pos) — and every later copy anywhere in the corpus
    * drops; documents stitched back in order, emptied documents drop.
    * Where [[dropBoilerplateLines]] removes corpus-hot chrome from
    * every document, this keeps one canonical copy of EVERY repeated
    * line (df >= 2 suffices to dedup, not a hot threshold).
    *
    * Scale shape: lines travel as xxhash64 longs; the argmin-occurrence
    * is one hash-keyed aggregation (min on the (id, pos) struct — a
    * map-side-combining partial min, no window over the whole corpus),
    * re-joined to the line rows on the hash. The reassembly shuffle is
    * the same per-doc collect the boilerplate scrub pays. */
  def dedupLines(df: DataFrame, idCol: String, textCol: String,
      sep: String = "\n"): DataFrame = {
    val lines = df.select(col(idCol),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
          .as(Seq("pos", "line")))
      .withColumn("__lh", xxhash64(col("line")))
    val firstOcc = lines
      .groupBy(col("__lh"))
      .agg(min(struct(col(idCol), col("pos"))).as("first"))
      .select(col("__lh"), col("first").getField(idCol).as("__fid"),
        col("first").getField("pos").as("__fpos"))
    lines.join(firstOcc, Seq("__lh"))
      .filter(col(idCol) === col("__fid") && col("pos") === col("__fpos"))
      .groupBy(col(idCol))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x.getField("line")), sep).as(textCol))
  }

  /** Corpus-level boilerplate-LINE removal (the C4-style scrub): a line
    * occurring in more than `maxLineDf` distinct documents is template
    * chrome (cookie banners, nav bars, license footers), not content —
    * strip it from every document and stitch the remaining lines back in
    * their original order. Documents left with zero lines drop out
    * entirely (an empty page is not a training document).
    *
    * Scale shape: lines travel as xxhash64 longs; the df count is one
    * (id, hash)-distinct aggregation; the boilerplate set — distinct
    * lines ABOVE the cap, bounded by corpus/maxLineDf, small by
    * construction — broadcasts into a map-side anti-probe, so the corpus
    * is never shuffled to find its boilerplate. The reassembly is the
    * one per-doc shuffle (collect_list + array_sort on (pos, line)),
    * which any restructuring of documents necessarily pays.
    *
    * Lines are matched byte-exact; run [[TextNormalize]] upstream when
    * near-identical chrome should collapse first.
    *
    * Sibling: [[Dedup.lineDedup]] is the AUDITED form of this screen —
    * per-doc n_lines/dup_lines/dup_ratio, emptied documents kept, the
    * count join left to AQE (safe at maxDocs = 1, where the duplicated
    * set is unbounded and this operator's forced broadcast would not),
    * plus the persisted-index incremental and streaming variants. Use
    * this one for a large-cap scrub-only pass; use the Dedup family
    * when the funnel needs accounting, small caps, or continuous
    * ingestion. */
  def dropBoilerplateLines(df: DataFrame, idCol: String, textCol: String,
      maxLineDf: Long, sep: String = "\n"): DataFrame = {
    val lines = df.select(col(idCol),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
          .as(Seq("pos", "line")))
      .withColumn("__lh", xxhash64(col("line")))
    val hot = lines.select(col(idCol), col("__lh")).distinct()
      .groupBy(col("__lh")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxLineDf).select(col("__lh"))
    lines.join(broadcast(hot), Seq("__lh"), "left_anti")
      .groupBy(col(idCol))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x.getField("line")), sep).as(textCol))
  }

  /** Corpus-trained bigram fluency score — the shape of perplexity
    * filtering (keep documents whose word transitions the corpus itself
    * uses often, drop gibberish/noise) without the transcendental:
    * score(doc) = mean over its bigram positions of the corpus JOINT
    * frequency P(w1,w2) = count(w1,w2) / total bigrams. Joint, not
    * conditional, deliberately: an unsmoothed conditional MLE scores a
    * chain of once-only bigrams as perfectly predictable (every hapax
    * prefix has one continuation), inverting the quality signal exactly
    * on the gibberish it should catch — commonness has no such failure
    * mode. Log-free on purpose — IEEE log differs in the last ulp
    * across engines, but a quotient of identical integers replays
    * exactly; position sums go through the usual floor-quantized LONG
    * units (raise the 1e12 quantum when corpus bigram counts approach
    * it). Hapax-dense documents score near 1/B, formulaic ones orders
    * of magnitude higher — the ordering a perplexity filter induces for
    * threshold purposes.
    *
    * Scale shape: documents explode to bigram rows (corpus-linear); the
    * bigram table is one map-side-combining aggregation of that SAME
    * exploded frame and the total rides as a broadcast 1-row frame;
    * scoring is one equi-join keyed by (w1, w2) — vocabulary-sized,
    * shuffle volume linear in corpus bigrams. Docs under 2 tokens drop
    * (no bigram evidence either way). */
  def bigramFluency(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val w = tokens(col(textCol))
    val pairs = df
      .select(col(idCol), w.as("w"))
      .filter(size(col("w")) >= 2)
      .select(col(idCol), explode(zip_with(
        slice(col("w"), lit(1), size(col("w")) - 1),
        slice(col("w"), lit(2), size(col("w")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val c2 = pairs.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c2"))
    val total = broadcast(pairs.agg(count(lit(1)).as("B")))
    pairs.join(c2, Seq("w1", "w2")).crossJoin(total)
      .withColumn("p", col("c2").cast("double") / col("B"))
      .groupBy(col(idCol))
      .agg(sum(floor(col("p") * lit(1e12)).cast("long")).as("su"),
        count(lit(1)).as("n_bigrams"))
      .select(col(idCol), col("n_bigrams"),
        (col("su").cast("double") / lit(1e12) / col("n_bigrams"))
          .as("score"))
  }

  /** Per-domain quality filtering — the curation step that keeps the
    * best `keepFrac` of every SOURCE by [[bigramFluency]] score (a
    * per-source quota, so one clean domain never crowds out another the
    * way a global threshold would). Exact integer quota per stratum:
    * ceil(keepFrac · |stratum|), ranks tie-broken on id.
    *
    * Scale shape: scoring is [[bigramFluency]]'s linear pipeline; the
    * keep decision is one source-keyed window (rank + count over the
    * same partitioning — one shuffle, no global sort). Output:
    * (id, stratum, score, rank) for the kept documents. */
  def qualityFilter(df: DataFrame, idCol: String, textCol: String,
      strataCol: String, keepFrac: Double): DataFrame = {
    require(keepFrac > 0 && keepFrac <= 1, s"keepFrac=$keepFrac not in (0,1]")
    import org.apache.spark.sql.expressions.Window
    val scored = bigramFluency(df, idCol, textCol)
      .join(df.select(col(idCol), col(strataCol)), idCol)
    val byStratum = Window.partitionBy(col(strataCol))
    val w = byStratum.orderBy(col("score").desc, col(idCol))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("__q",
        ceil(lit(keepFrac) * count(lit(1)).over(byStratum)).cast("long"))
      .filter(col("rank") <= col("__q"))
      .select(col(idCol), col(strataCol), col("score"), col("rank"))
  }

  /** Materialized inverted index: one posting row per (doc, term) with
    * the occurrence count and the doc's token length — the exact integer
    * operands [[search]] computes on the fly, persisted once so queries
    * stop re-tokenizing the corpus. Write it to a warehouse fact (or
    * bucket it by term) and [[searchIndex]] serves every subsequent
    * query from a term-pruned scan of THIS table: at 100 TB the corpus
    * is read once per index build instead of once per query. Appends
    * compose: a new batch's postings are disjoint rows (doc ids are
    * new), so index maintenance is a plain append. */
  def buildIndex(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), size(tokens(col(textCol))).as("len"),
        explode(tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("len"), col("term"))
      .agg(count(lit(1)).as("cnt"))

  /** [[search]] served from a prebuilt [[buildIndex]] postings table:
    * identical scoring — (cnt/len)·(n/df) summed in floor-quantized
    * units — so the two return bit-identical rankings. `nDocs` is the
    * corpus size the index owner tracks (a warehouse stat; postings
    * alone cannot see token-less documents). The term filter prunes the
    * postings scan; everything downstream of it is the same plan shape
    * as [[search]] minus the tokenize. */
  def searchIndex(postings: DataFrame, idCol: String,
      queryTerms: Seq[String], k: Int, nDocs: Long): DataFrame = {
    require(queryTerms.nonEmpty && k > 0, "searchIndex needs terms and k > 0")
    val tf = postings.filter(col("term").isin(queryTerms: _*))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "term")
      .withColumn("s", col("cnt").cast("double") / col("len") *
        (lit(nDocs).cast("double") / col("df")))
      .groupBy(col(idCol))
      .agg(sum(floor(col("s") * lit(1e12)).cast("long")).as("su"),
        count(lit(1)).as("n_terms"))
      .withColumn("score", col("su").cast("double") / lit(1e12))
      .orderBy(col("su").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("score"), col("n_terms"))
  }

  /** Corpus length statistics for [[searchBm25]] — (n_docs,
    * total_tokens) in one aggregation pass. At 100 TB these are
    * warehouse stats the index owner maintains incrementally (both are
    * plain sums, so appends compose); computing them here is the
    * bootstrap path. */
  def docLenStats(df: DataFrame, textCol: String): (Long, Long) = {
    val r = df.agg(count(lit(1)), sum(size(tokens(col(textCol))))).head()
    (r.getLong(0), r.getLong(1))
  }

  /** BM25-ranked retrieval from a [[buildIndex]] postings table: the
    * production relevance function (Robertson-Spärck Jones; the tf
    * SATURATES — a term's 50th occurrence adds almost nothing — and
    * long documents are penalized toward the corpus mean length), vs
    * [[searchIndex]]'s linear tf/len weighting.
    *
    * score = Σ_t idf(t) · (tf·(k1+1)) / (tf + k1·(1-b+b·len/avgdl))
    * with the repo's log-free idf = n/df (order-preserving vs the
    * ln-based form for any fixed corpus, and exactly portable — ln is
    * the one operation IEEE does NOT pin down). All other operands are
    * rationals of exact integers plus avgdl = totalTokens/nDocs (one
    * IEEE division), so scores replay bit-identically; per-doc sums go
    * through floor-quantized LONG units, ties break on id.
    *
    * Scale shape: identical to [[searchIndex]] — the term filter prunes
    * the postings scan, df comes from the surviving rows, top-k
    * compiles to TakeOrderedAndProject. The saturation arithmetic is
    * per-posting codegen; nothing new shuffles. */
  def searchBm25(postings: DataFrame, idCol: String,
      queryTerms: Seq[String], k: Int, nDocs: Long, totalTokens: Long,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty && k > 0, "searchBm25 needs terms and k > 0")
    require(nDocs > 0 && totalTokens >= 0, "corpus stats must be non-negative")
    val avgdl = totalTokens.toDouble / nDocs
    val tf = postings.filter(col("term").isin(queryTerms: _*))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = lit(nDocs).cast("double") / col("df")
    val s = idf * (col("cnt").cast("double") * lit(k1 + 1.0)) /
      (col("cnt").cast("double") + lit(k1) *
        (lit(1.0 - b) + lit(b) * (col("len").cast("double") / lit(avgdl))))
    tf.join(broadcast(dfreq), "term")
      .groupBy(col(idCol))
      .agg(sum(floor(s * lit(1e9)).cast("long")).as("su"),
        count(lit(1)).as("n_terms"))
      .withColumn("score", col("su").cast("double") / lit(1e9))
      .orderBy(col("su").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("score"), col("n_terms"))
  }

  /** Corpus vocabulary construction (the term table a tokenizer/BPE
    * trainer or an index builder starts from): per-term total count `tf`
    * and document frequency `df`, rare terms cut at `minDf`, heaviest
    * `k` kept. Output: (term, tf, df), ordered by tf desc then term.
    *
    * Scale shape: the classic two-level aggregation — (doc, term) counts
    * first (map-side combine collapses each document's repeats before
    * anything shuffles), then one term-keyed aggregation producing both
    * measures in a single pass (tf = sum of per-doc counts, df = row
    * count). The final top-k compiles to TakeOrderedAndProject, so the
    * full vocabulary is never globally sorted — at 100 TB the term table
    * is billions of rows, but only k of them ever leave the reduce side. */
  def vocabulary(df: DataFrame, idCol: String, textCol: String,
      minDf: Long, k: Int): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    val tf = df.select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("cnt"))
    tf.groupBy(col("term"))
      .agg(sum(col("cnt")).as("tf"), count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .orderBy(col("tf").desc, col("term"))
      .limit(k)
  }

  /** Out-of-vocabulary rate per document against a FROZEN vocabulary —
    * the tokenizer-coverage check a pretraining mix runs before
    * committing to a vocab (a domain whose tokens the tokenizer has
    * never seen trains as `<unk>` soup): per doc `n_tokens`, `n_oov`
    * (tokens absent from `vocab`'s `wordCol`), and the 6-dp ratio.
    *
    * Scale shape: one explode, one word-keyed left join (strategy left
    * to AQE — a 32k-entry tokenizer vocab broadcasts, a corpus-derived
    * one shuffles), one per-doc hash-agg. Matching is exact tokens on
    * the plain space tokenizer — compose [[TextNormalize]] /
    * [[Tokenize.charGramsAsWords]] upstream for other token regimes. */
  def oovRate(df: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, wordCol: String = "word"): DataFrame = {
    val v = vocab.select(col(wordCol).as("__w"), lit(1).as("__in"))
      .distinct()
    df.select(col(idCol), explode(split(col(textCol), " ")).as("__w"))
      .join(v, Seq("__w"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        coalesce(sum(when(col("__in").isNull, 1L)), lit(0L)).as("n_oov"))
      .select(col(idCol), col("n_tokens"), col("n_oov"),
        round(col("n_oov").cast("double") / col("n_tokens"), 6)
          .as("oov_ratio"))
  }

  /** Per-group vocabulary: the [[vocabulary]] term table per corpus
    * stratum (language, source domain) — the per-domain token budget /
    * drift check corpus curation wants. Same two-level aggregation with
    * the group carried through; the per-group top-k is a rank window
    * with a LITERAL bound, so WindowGroupLimit prunes each group's term
    * list to k rows map-side — no group ever sorts its whole vocabulary
    * in one task. */
  def vocabularyByGroup(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, minDf: Long, k: Int): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    import org.apache.spark.sql.expressions.Window
    val tf = df.select(col(groupCol), col(idCol),
        explode(tokens(col(textCol))).as("term"))
      .groupBy(col(groupCol), col(idCol), col("term"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("tf").desc, col("term"))
    tf.groupBy(col(groupCol), col("term"))
      .agg(sum(col("cnt")).as("tf"), count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Sequence packing (concatenate-then-chunk): lay the corpus out on a
    * single global token axis in a deterministic pseudo-random order
    * (md5 of the id — the same engine-portable draw the samplers use)
    * and assign each document the fixed-size training sequence its first
    * token lands in: `seq_id = floor(global_offset / budget)`,
    * `seq_off = global_offset % budget`. This is the GPT-style packing
    * step that turns a document corpus into uniform context windows
    * without padding waste.
    *
    * Scale shape — a distributed prefix sum, NOT a global sort:
    *  - documents land in `buckets` range buckets by their md5 prefix
    *    (the prefix is monotone in the full hash, so bucket order IS
    *    global order); only (id, n_tokens) pairs shuffle, never text;
    *  - per-bucket running sums are a window WITHIN each bucket
    *    (bounded local sort of N/buckets rows);
    *  - bucket offsets come from one `buckets`-row aggregate cumulated
    *    on a single tiny frame and broadcast back.
    * Offsets and ids stay in exact integer arithmetic (`div`/`%` on
    * longs) end to end, so any engine replays the layout bit-for-bit.
    *
    * `buckets` must be a power of two <= 65536 (the bucket is carved
    * from the first 4 hex chars); size it to executor count at scale. */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      budget: Long, buckets: Int = 64): DataFrame = {
    require(budget > 0, s"budget=$budget must be positive")
    require(buckets > 0 && buckets <= 65536 && (buckets & (buckets - 1)) == 0,
      s"buckets=$buckets must be a power of two <= 65536")
    val step = 65536 / buckets
    val base = df.select(col(idCol),
        md5(col(idCol).cast("string")).as("__h"),
        tokenCount(col(textCol)).as("n_tokens"))
      .withColumn("__b",
        (conv(substring(col("__h"), 1, 4), 16, 10).cast("long") / step)
          .cast("long"))
    val perBucket = base.groupBy(col("__b"))
      .agg(sum(col("n_tokens")).as("__tot"))
    // cumulate the tiny per-bucket frame (|buckets| rows) on one
    // partition — the single-partition window is on k rows, not the data
    val offsets = perBucket.withColumn("__off",
      sum(col("__tot")).over(org.apache.spark.sql.expressions.Window
        .orderBy(col("__b"))) - col("__tot"))
      .select(col("__b"), col("__off"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__b")).orderBy(col("__h"), col(idCol))
    base.join(broadcast(offsets), "__b")
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .withColumn("__g", col("__off") + col("__cum") - col("n_tokens"))
      // `div` keeps the layout in pure long arithmetic: no double hop to
      // lose low bits past 2^53 global tokens
      .select(col(idCol), col("n_tokens"),
        expr(s"__g div ${budget}L").as("seq_id"),
        pmod(col("__g"), lit(budget)).cast("long").as("seq_off"))
  }

  /** Characteristic terms per class (log-free c-TF-IDF, the BERTopic
    * topic-labeling step): for documents already grouped — by cluster
    * id, language, source — rank each class's terms by how much the
    * term's in-class rate outruns its corpus rate:
    * score(t,c) = (tf_tc · T) / (w_c · f_t), the per-class twin of
    * [[collocations]]' lift. log(1 + ·) in the original only dampens —
    * it is monotone in the ratio, so ranking is unchanged and the score
    * replays bit-for-bit from four exact integer counts.
    *
    * Scale shape: ONE corpus scan builds the (class, term) table; class
    * weights, term totals and T fold from that table (checkpointed —
    * consumed four ways); the per-class top-k is a rank window with a
    * LITERAL bound, so WindowGroupLimit prunes each class's term list
    * map-side. Output: (cls, term, tf, score, rk), k rows per class. */
  def classTerms(df: DataFrame, classCol: String, textCol: String,
      k: Int = 5, minTf: Long = 3L): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val tf = df.select(col(classCol).as("cls"),
        explode(tokens(col(textCol))).as("term"))
      .groupBy(col("cls"), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val wc = tf.groupBy(col("cls")).agg(sum(col("tf")).as("__wc"))
    val ft = tf.groupBy(col("term")).agg(sum(col("tf")).as("__ft"))
    val tot = tf.agg(sum(col("tf")).as("__t"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cls")).orderBy(col("score").desc, col("term"))
    tf.filter(col("tf") >= minTf)
      .join(broadcast(wc), "cls")
      .join(ft, "term")
      .crossJoin(broadcast(tot))
      .withColumn("score",
        (col("tf").cast("double") * col("__t").cast("double")) /
          (col("__wc").cast("double") * col("__ft").cast("double")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("cls"), col("term"), col("tf"), col("score"), col("rk"))
  }

  /** PMI collocation mining — the top-k adjacent word pairs that co-occur
    * far more than their unigram frequencies predict ("new york", not
    * "of the"). The phrase-detection pass a tokenizer-training pipeline
    * runs to decide which bigrams deserve a single vocabulary slot
    * (word2vec's phrase step, Mikolov et al. NIPS'13 §4).
    *
    * Log-free by the repo's portability discipline: PMI = log of
    * lift = P(w₁w₂)/(P(w₁)P(w₂)) = (c₁₂·T²)/(N·c₁·c₂), and log is
    * monotone, so ranking by the lift RATIO is ranking by PMI. All five
    * operands are exact integer counts; the score multiplies/divides
    * them in one fixed expression-tree order, every step correctly
    * rounded — identical doubles on every engine.
    *
    * Scale shape: bigrams come from a per-row array zip (no positional
    * self-join, no window over the corpus); one (w₁,w₂) hash aggregation
    * with map-side combine + one unigram twin are the only shuffles, both
    * bounded by vocabulary size after the combine. `minCount` prunes the
    * hapax tail before the join; unigram counts join the PAIR table
    * (vocab-sized, post-cut), and top-k leaves as TakeOrderedAndProject —
    * k rows to the driver, never the pair table. */
  def collocations(df: DataFrame, textCol: String, minCount: Long = 5L,
      k: Int = 20): DataFrame = {
    val toks = df.select(tokens(col(textCol)).as("__t"))
    // the corpus is scanned exactly TWICE (unigram pass, bigram pass);
    // both vocab tables checkpoint eagerly because each is consumed more
    // than once below — T = Σ unigram counts and N = Σ pre-cut bigram
    // counts fall out of the tables instead of costing a third scan
    val uni = toks.select(explode(col("__t")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val pairs = toks.select(explode(expr(
        "transform(slice(__t, 1, size(__t) - 1), " +
          "(w, i) -> struct(w AS w1, element_at(__t, i + 2) AS w2))"))
        .as("p"))
      .select(col("p.w1"), col("p.w2"))
    val big0 = pairs.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
      .localCheckpoint(true)
    val big = big0.filter(col("c12") >= minCount)
    // single-row scalars, crossJoin'd as a broadcast — never a shuffle
    val totals = big0.agg(sum(col("c12")).as("n_big"))
      .crossJoin(uni.agg(sum(col("c")).as("t_tok")))
    val c1 = uni.select(col("w").as("w1"), col("c").as("c1"))
    val c2 = uni.select(col("w").as("w2"), col("c").as("c2"))
    big.join(c1, "w1").join(c2, "w2")
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("c12"), col("c1"), col("c2"),
        (col("c12").cast("double") * col("t_tok").cast("double") *
          col("t_tok").cast("double") /
          (col("n_big").cast("double") * col("c1").cast("double") *
            col("c2").cast("double"))).as("lift"))
      .orderBy(col("lift").desc, col("w1"), col("w2"))
      .limit(k)
  }
}
