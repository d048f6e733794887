package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  test("token counts and shingles") {
    val df = Seq("one two three four", "solo").toDF("text")
    assert(df.select(TextAnalysis.tokenCount($"text")).as[Long]
      .collect().toSeq == Seq(4L, 1L))
    val sh = df.select(TextAnalysis.shingles($"text", 3)).as[Seq[String]]
      .collect()
    assert(sh(0) == Seq("one two three", "two three four"))
    assert(sh(1) == Seq()) // shorter than n -> empty, not null/error
  }

  test("language ID picks the dominant function-word profile") {
    val samples = Seq(
      ("en", "the cat sat on the mat and the dog is in the house"),
      ("es", "el perro y la casa de un amigo que vive en la ciudad"),
      ("de", "der hund und die katze sind mit dem kind zu hause"),
      ("fr", "le chien et le chat sont dans la maison des amis"),
      ("und", "xyzzy plugh quux"), // nothing matches
      ("fr", "la de")) // es/fr tie -> lexicographically greatest lang
    val got = samples.toDF("want", "text")
      .select($"want", TextAnalysis.languageId($"text").as("got"))
      .as[(String, String)].collect()
    got.foreach { case (want, g) => assert(g == want, s"want $want got $g") }
  }

  test("fingerprint is normalization-invariant") {
    val df = Seq("Hello  World", "hello world", "different").toDF("text")
    val fps = df.select(TextAnalysis.fingerprint($"text")).as[Long].collect()
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("quality metrics on a known document") {
    val df = Seq((1L, "the quick brown fox")).toDF("doc_id", "text")
    val r = TextAnalysis.quality(df, "text", "doc_id").collect()(0)
    assert(r.getLong(1) == 19) // chars
    assert(r.getLong(2) == 4)  // tokens
    assert(r.getDouble(3) == 4.75)
    assert(r.getDouble(4) == 0.25) // "the" of 4
    assert(r.getDouble(5) == 0.0)
  }

  test("wordEntropy: hand-computed nano terms, degenerate and empty text") {
    val df = Seq(
      (1L, "a b a b"),        // two types at p=1/2: H = ln 2
      (2L, "x x x x"),        // one type: H = 0
      (3L, "p q r s"),        // four types at p=1/4: H = ln 4
      (4L, "")                // one empty token: H = 0
    ).toDF("doc_id", "text")
    val r = df.select(col("doc_id"),
        TextAnalysis.wordEntropy(col("text")).as("e"))
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getStruct(1).getLong(0),
        x.getStruct(1).getLong(1), x.getStruct(1).getLong(2)))
    def term(c: Long, n: Long): Long =
      math.floor(c.toDouble / n * math.log(n.toDouble / c) * 1e9).toLong
    assert(r(0) == (1L, 4L, 2L, 2 * term(2, 4)))
    assert(r(1) == (2L, 4L, 1L, 0L))
    assert(r(2) == (3L, 4L, 4L, 4 * term(1, 4)))
    assert(r(3) == (4L, 1L, 1L, 0L))
    // and the quantized values sit where the math says: ln 2, ln 4
    assert(math.abs(r(0)._4 / 1e9 - math.log(2)) < 1e-8)
    assert(math.abs(r(2)._4 / 1e9 - math.log(4)) < 1e-8)
    // repeated text scores strictly below diverse text of the same length
    assert(r(1)._4 < r(0)._4 && r(0)._4 < r(2)._4)
  }

  test("wordEntropy: null text behaves as empty") {
    val r = Seq((1L, null: String)).toDF("doc_id", "text")
      .select(TextAnalysis.wordEntropy(col("text")).as("e"))
      .collect()(0).getStruct(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (1L, 1L, 0L))
  }

  test("winnowing: shared runs guarantee shared fingerprints; containment detected") {
    val rnd = new scala.util.Random(5)
    val vocab = Vector("red", "blue", "green", "oak", "elm", "fir", "sun",
      "moon", "tide", "rock", "sand", "mist", "fog", "ash", "ice", "ember")
    def doc(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val a = doc(60)
    val b = doc(80)
    val quoted = doc(30) + " " + a + " " + doc(25) // a contained in quoted
    val corpus = Seq((1L, a), (2L, b), (3L, quoted), (4L, doc(70)))
      .toDF("doc_id", "text")
    val pairs = TextAnalysis.containmentPairs(corpus, "doc_id", "text",
      threshold = 0.8)
      .select($"i", $"j", $"containment_i").as[(Long, Long, Double)].collect()
    // the (a, quoted) pair must surface with containment_a ~ 1.0
    val hit = pairs.find(p => p._1 == 1L && p._2 == 3L)
    assert(hit.isDefined, s"containment pair not found in ${pairs.toSeq}")
    assert(hit.get._3 >= 0.9, s"containment ${hit.get._3}")
    // unrelated pair must not appear
    assert(!pairs.exists(p => (p._1, p._2) == (2L, 4L)))
  }

  test("winnowing guarantee: shared runs of >= w+k-1 tokens share a fingerprint") {
    // the Schleimer et al. guarantee the containment detector rests on —
    // checked over 30 seeded random doc pairs with planted shared runs
    val rnd = new scala.util.Random(31)
    val vocab = Vector.tabulate(3000)(i => s"t$i")
    def words(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.size)))
    val k = 3; val w = 4
    val pairs = (0 until 30).map { i =>
      val run = words(k + w - 1 + rnd.nextInt(6)).mkString(" ")
      val a = (words(10 + rnd.nextInt(30)) :+ run) ++ words(rnd.nextInt(20))
      val b = (words(5 + rnd.nextInt(40)) :+ run) ++ words(rnd.nextInt(10))
      (i.toLong, a.mkString(" "), b.mkString(" "))
    }
    val got = pairs.toDF("id", "a", "b").select($"id",
      size(array_intersect(
        TextAnalysis.winnowFingerprints($"a", k, w),
        TextAnalysis.winnowFingerprints($"b", k, w))).as("shared"))
      .as[(Long, Int)].collect()
    got.foreach { case (id, shared) =>
      assert(shared >= 1, s"pair $id shares no fingerprint")
    }
  }

  test("winnowing edge cases: short docs never error") {
    val df = Seq("one two three", "ab", "").toDF("text")
    val fps = df.select(TextAnalysis.winnowFingerprints($"text", 3, 4))
      .as[Seq[Long]].collect()
    assert(fps(0).size == 1) // one 3-gram -> one fingerprint
    assert(fps(1).isEmpty && fps(2).isEmpty)
  }

  test("null text: HOF-parity (empty arrays / 'und', never null)") {
    val df = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "text")
    val r = df.select(
      TextAnalysis.shingles($"text", 3).as("sh"),
      TextAnalysis.winnowFingerprints($"text", 3, 4).as("fp"),
      TextAnalysis.languageId($"text").as("lang")).collect()(0)
    assert(r.getSeq[String](0).isEmpty && !r.isNullAt(0))
    assert(r.getSeq[Long](1).isEmpty && !r.isNullAt(1))
    assert(r.getString(2) == "und")
  }

  test("tfidf top-k ranks rare terms above common ones, ties on term") {
    // N=3; df(rare)=df(other)=1, df(shared)=3. All docs are 4 tokens.
    // doc1: rare (1/4)*(3/1)=0.75, shared (3/4)*(3/3)=0.75 — a tie, so
    // rank order falls to the term string; doc3: other (2/4)*3=1.5
    val docs = Seq(
      (1L, "rare shared shared shared"),
      (2L, "shared shared shared shared"),
      (3L, "shared other other shared")).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfTopK(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rank")
      .as[(Long, Long, String, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, "rare", 0.75), (1L, 2L, "shared", 0.75),
      (2L, 1L, "shared", 1.0),
      (3L, 1L, "other", 1.5), (3L, 2L, "shared", 0.5)))
  }

  test("chunk: overlapping windows cover every token; short docs 1 chunk") {
    // 10 tokens, window 4, overlap 1 (stride 3): chunks at 0,3,6,9 ->
    // nc = 1 + ceil(6/3) = 3 covers tokens 0..9; wait: starts 0,3,6 cover
    // 0..9 exactly (6+4=10) -> nc 3
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "x y"),
      (3L, "p q r s t")).toDF("doc_id", "text")
    val got = TextAnalysis.chunk(docs, "doc_id", "text",
      chunkTokens = 4, overlap = 1)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Long, String, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 0L, "a b c d", 4L), (1L, 1L, "d e f g", 4L), (1L, 2L, "g h i j", 4L),
      (2L, 0L, "x y", 2L),
      (3L, 0L, "p q r s", 4L), (3L, 1L, "s t", 2L)))
    // coverage invariant on a bigger doc: concatenating chunks with the
    // overlap removed reproduces the document
    val doc = (1 to 97).map(i => s"w$i").mkString(" ")
    val chunks = TextAnalysis.chunk(Seq((9L, doc)).toDF("doc_id", "text"),
      "doc_id", "text", chunkTokens = 40, overlap = 8)
      .orderBy("chunk_idx").as[(Long, Long, String, Long)].collect()
    val rebuilt = chunks.zipWithIndex.flatMap { case ((_, _, c, _), i) =>
      val toks = c.split(" ").toSeq
      if (i == 0) toks else toks.drop(8)
    }
    assert(rebuilt.mkString(" ") == doc)
  }

  test("redact: URL swallows embedded email; short numbers survive") {
    val docs = Seq(
      (1L, "mail me at bob.smith+x@corp.example.co today"),
      (2L, "docs at https://user@site.example/a/b?id=9999999 here"),
      (3L, "order 123 of 45 units ref 12345678 done"),
      (4L, "plain text with no identifiers at all")).toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        TextAnalysis.redact(col("text")).as("red"))
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(got == Seq(
      // email token replaces the full address
      (1L, "mail me at <EMAIL> today"),
      // URL runs first: the email-shaped userinfo inside it must NOT
      // split the URL into two tokens
      (2L, "docs at <URL> here"),
      // 3- and 2-digit numbers survive; the 8-digit id is scrubbed
      (3L, "order 123 of 45 units ref <NUM> done"),
      (4L, "plain text with no identifiers at all")))
  }

  test("decontaminate flags exactly the docs sharing a benchmark n-gram") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"),   // contains bench gram
      (2L, "beta gamma alpha zeta eta"),        // same words, no shared 3-gram
      (3L, "totally unrelated words here now"), // clean
      (4L, "x y alpha beta gamma z")            // bench gram mid-document
    ).toDF("doc_id", "text")
    val bench = Seq("alpha beta gamma q r").toDF("text")
    val got = TextAnalysis.decontaminate(corpus, "doc_id", "text",
        bench, "text", n = 3)
      .select($"doc_id", $"n_bench_grams", $"contaminated")
      .orderBy($"doc_id").as[(Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, true), (2L, 0L, false), (3L, 0L, false), (4L, 1L, true)))
    val kept = TextAnalysis.dropContaminated(corpus, "doc_id", "text",
        bench, "text", n = 3)
      .select($"doc_id").as[Long].collect().toSeq.sorted
    assert(kept == Seq(2L, 3L))
    // multi-gram hits count distinct benchmark grams matched
    val multi = Seq((9L, "alpha beta gamma q r s")).toDF("doc_id", "text")
    val n = TextAnalysis.decontaminate(multi, "doc_id", "text",
        bench, "text", n = 3)
      .select($"n_bench_grams").as[Long].collect().head
    assert(n == 3L) // "alpha beta gamma", "beta gamma q", "gamma q r"
  }

  test("search ranks by tf-idf: rare terms dominate, top-k exact, no global sort") {
    val docs = Seq(
      (1L, "rare word filler filler filler"),
      (2L, "common common common filler filler"),
      (3L, "common filler filler filler filler"),
      (4L, "rare rare common filler filler"),
      (5L, "filler filler filler filler filler")
    ).toDF("doc_id", "text")
    val hits = TextAnalysis.search(docs, "doc_id", "text",
      Seq("rare", "common"), k = 3)
    val ids = hits.select("doc_id").as[Long].collect().toSeq
    // doc 4: 2x rare (df=2 of n=5) + 1x common -> highest; doc 1 next
    assert(ids.head == 4L && ids.contains(1L) && !ids.contains(5L))
    val plan = hits.queryExecution.executedPlan.toString()
    assert(plan.contains("TakeOrderedAndProject"), plan.take(400))
  }

  test("bigramFluency: corpus MLE means, short docs drop") {
    val docs = Seq(
      (1L, "a b a b"),   // bigrams (a,b),(b,a),(a,b)
      (2L, "a c"),       // bigram (a,c)
      (3L, "solo")       // no bigram -> absent
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bigramFluency(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    // c2: (a,b)=2 (b,a)=1 (a,c)=1; B = 4 corpus bigrams
    def fl(x: Double) = math.floor(x * 1e12)
    val s1 = (fl(2.0 / 4) + fl(1.0 / 4) + fl(2.0 / 4)) / 1e12 / 3
    val s2 = fl(1.0 / 4) / 1e12 / 1
    assert(got == Seq((1L, 3L, s1), (2L, 1L, s2)))
  }

  test("qualityFilter keeps the per-source quota of most-fluent docs") {
    // formulaic docs repeat corpus-common bigrams -> high MLE score;
    // 'gibberish' docs use once-only bigrams -> low score
    val docs = Seq(
      (1L, "x y x y x y", "a"), (2L, "x y x y z q", "a"),
      (3L, "q1 q2 q3 q4 q5 q6", "a"), (4L, "r1 r2 r3 r4 r5 r6", "a"),
      (5L, "x y x y x y", "b"), (6L, "s1 s2 s3 s4 s5 s6", "b")
    ).toDF("doc_id", "text", "source")
    val kept = TextAnalysis.qualityFilter(docs, "doc_id", "text",
      "source", keepFrac = 0.5)
      .select("doc_id", "source", "rank")
      .as[(Long, String, Long)].collect().toSeq.sortBy(_._1)
    // quota: ceil(0.5*4)=2 for source a, ceil(0.5*2)=1 for source b
    assert(kept.map(_._1) == Seq(1L, 2L, 5L),
      s"formulaic docs must win their source quota: $kept")
    assert(kept.map(r => (r._2, r._3)).toSet ==
      Set(("a", 1L), ("a", 2L), ("b", 1L)))
  }

  test("searchIndex over a built index returns search's exact rows") {
    val docs = Seq(
      (1L, "rare word filler filler filler"),
      (2L, "common common common filler filler"),
      (3L, "common filler filler filler filler"),
      (4L, "rare rare common filler filler"),
      (5L, "filler filler filler filler filler")
    ).toDF("doc_id", "text")
    val direct = TextAnalysis.search(docs, "doc_id", "text",
      Seq("rare", "common"), k = 4)
      .orderBy(col("score").desc, col("doc_id"))
      .as[(Long, Double, Long)].collect().toSeq
    val postings = TextAnalysis.buildIndex(docs, "doc_id", "text")
    val viaIndex = TextAnalysis.searchIndex(postings, "doc_id",
      Seq("rare", "common"), k = 4, nDocs = 5L)
      .orderBy(col("score").desc, col("doc_id"))
      .as[(Long, Double, Long)].collect().toSeq
    assert(viaIndex == direct && direct.nonEmpty)
  }

  test("vocabulary: two-level counts, minDf cut, tf-desc/term ties, top-k plan") {
    val docs = Seq(
      (1L, "apple apple banana cherry"),
      (2L, "apple banana banana"),
      (3L, "apple cherry date"),
      (4L, "banana date")
    ).toDF("doc_id", "text")
    val v = TextAnalysis.vocabulary(docs, "doc_id", "text", minDf = 2, k = 10)
    val rows = v.as[(String, Long, Long)].collect().toSeq
    // apple tf=4 df=3, banana tf=4 df=3 (tie -> apple first), cherry tf=2
    // df=2, date tf=2 df=2; singletons cut by minDf
    assert(rows == Seq(("apple", 4L, 3L), ("banana", 4L, 3L),
      ("cherry", 2L, 2L), ("date", 2L, 2L)))
    val k1 = TextAnalysis.vocabulary(docs, "doc_id", "text", minDf = 2, k = 1)
    assert(k1.as[(String, Long, Long)].collect().toSeq == Seq(("apple", 4L, 3L)))
    val plan = k1.queryExecution.executedPlan.toString()
    assert(plan.contains("TakeOrderedAndProject"), plan.take(400))
  }

  test("vocabularyByGroup: independent per-group tables, map-side rank prune") {
    val docs = Seq(
      (1L, "apple apple banana", "en"), (2L, "apple cherry", "en"),
      (3L, "pomme pomme poire", "fr"), (4L, "pomme raisin", "fr")
    ).toDF("doc_id", "text", "lang")
    val v = TextAnalysis.vocabularyByGroup(docs, "doc_id", "text", "lang",
      minDf = 2, k = 5)
    val rows = v.orderBy("lang", "rank")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    // per-language df: only terms in BOTH docs of their language survive
    assert(rows == Seq(("en", "apple", 3L, 2L, 1L),
      ("fr", "pomme", 3L, 2L, 1L)))
    val plan = v.queryExecution.executedPlan.toString()
    assert(plan.contains("WindowGroupLimit"), plan.take(400))
  }

  test("packSequences matches the single-axis brute force; offsets exact") {
    val docs = (1L to 60L).map(i => (i, Seq.fill(3 + (i % 7).toInt)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val packed = TextAnalysis.packSequences(docs, "doc_id", "text",
        budget = 16, buckets = 8)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // brute force: one global cumsum over (md5(id), id)
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(i: Long) = md.digest(i.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val inOrder = (1L to 60L).map(i => (i, 3 + (i % 7))).sortBy { case (i, _) => (h(i), i) }
    var cum = 0L
    val brute = inOrder.map { case (i, n) =>
      val prev = cum; cum += n
      (i, n, prev / 16, prev % 16)
    }.sortBy(_._1)
    assert(packed == brute)
    // every offset strictly inside the budget; token totals conserved
    assert(packed.forall(_._4 < 16) && packed.map(_._2).sum == cum)
  }

  test("dropBoilerplateLines strips corpus-hot lines, keeps order, drops emptied docs") {
    val banner = "accept cookies to continue"
    val docs = Seq(
      (1L, s"alpha one\n$banner\nalpha two"),
      (2L, s"$banner\nbeta one"),
      (3L, s"gamma one\ngamma two\n$banner"),
      (4L, banner) // nothing but chrome -> drops out entirely
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dropBoilerplateLines(docs, "doc_id", "text",
      maxLineDf = 2).as[(Long, String)].collect().toMap
    assert(out == Map(
      1L -> "alpha one\nalpha two",
      2L -> "beta one",
      3L -> "gamma one\ngamma two"))
    // below the cap nothing is chrome
    val keep = TextAnalysis.dropBoilerplateLines(docs, "doc_id", "text",
      maxLineDf = 10).as[(Long, String)].collect().toMap
    assert(keep(4L) == banner && keep(1L) == s"alpha one\n$banner\nalpha two")
  }

  test("dedupLines keeps only the first occurrence corpus-wide") {
    val docs = Seq(
      (1L, "alpha\nshared one\nbeta"),
      (2L, "shared one\ngamma\nshared two"),
      (3L, "shared two\nshared one\ndelta")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.dedupLines(docs, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(out == Map(
      1L -> "alpha\nshared one\nbeta",
      2L -> "gamma\nshared two",
      3L -> "delta"))
    // a doc that is all-duplicates vanishes
    val all = Seq((1L, "x\ny"), (2L, "y\nx")).toDF("doc_id", "text")
    val out2 = TextAnalysis.dedupLines(all, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(out2 == Map(1L -> "x\ny"))
  }

  test("searchBm25: tf saturates, length normalizes, top-k ties on id") {
    val docs = Seq(
      (1L, "rare filler filler filler filler"),              // tf=1, len 5
      (2L, "rare rare rare rare rare rare rare rare filler"), // tf=8, len 9
      (3L, "rare filler"),                                    // tf=1, len 2
      (4L, "filler filler filler filler filler")
    ).toDF("doc_id", "text")
    val postings = TextAnalysis.buildIndex(docs, "doc_id", "text")
    val (n, tl) = TextAnalysis.docLenStats(docs, "text")
    assert(n == 4L && tl == 21L)
    val out = TextAnalysis.searchBm25(postings, "doc_id", Seq("rare"),
      k = 3, nDocs = n, totalTokens = tl)
      .as[(Long, Double, Long)].collect().toSeq
    assert(out.map(_._1) == Seq(2L, 3L, 1L)) // tf wins, then shorter doc
    // saturation: 8x the tf is nowhere near 8x the score
    val s = out.map(o => o._1 -> o._2).toMap
    assert(s(2L) < 3.0 * s(1L) && s(2L) > s(3L))
    // linear searchIndex would also rank 2 first but scores diverge:
    // BM25's doc-2 advantage over doc-3 is compressed by saturation
    assert(out.forall(_._3 == 1L))
  }

  test("multimodal plumbing: schema + batched features") {
    val docs = Seq((1L, "abc", "en"), (2L, "abcabc", "de")).toDF("doc_id", "text", "lang")
    val media = Multimodal.asMedia(docs, "doc_id", "text", "lang")
    assert(media.schema.fieldNames.toSeq == Seq("media_id", "content", "meta"))
    val feats = Multimodal.extractFeatures(media, dim = 4).orderBy("media_id").collect()
    assert(feats.length == 2)
    assert(feats(0).getInt(2) == 4)
    // histogram of "abc" and "abcabc" normalize identically
    assert(feats(0).getSeq[Float](3).toSeq == feats(1).getSeq[Float](3).toSeq)
  }

  test("PNG codec: synthesized container decodes exactly; dirty bytes fail clean") {
    val dims = Seq((1L, 640L, 480L), (2L, 1L, 1L), (3L, 1920L, 1080L))
      .toDF("id", "w", "h")
    val png = Multimodal.syntheticPng(dims, "id", "w", "h")
    // cross-check against a reference implementation: java.util.zip.CRC32
    // over the IHDR type+payload must equal the declarative crc32 field
    val bytes = png.orderBy("media_id").collect().map(_.getAs[Array[Byte]]("content"))
    bytes.foreach { b =>
      assert(b.length == 8 + (4 + 4 + 13 + 4) + 12) // sig + IHDR + IEND
      val crc = new java.util.zip.CRC32()
      crc.update(b, 12, 17) // chunk type + payload
      val stored = java.nio.ByteBuffer.wrap(b, 29, 4).getInt & 0xffffffffL
      assert(stored == crc.getValue)
    }
    val dec = Multimodal.decodePngMeta(png).orderBy("media_id").collect()
    assert(dec.map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((1L, 640L, 480L), (2L, 1L, 1L), (3L, 1920L, 1080L)))
    assert(dec.forall(r => r.getBoolean(1) && r.getBoolean(6))) // sig_ok, crc_ok
    assert(dec.forall(r => r.getLong(4) == 8L && r.getLong(5) == 2L))
    // a real PNG encoder's output decodes identically: ImageIO writes a
    // 2x3 image; our parser must read its true header
    val img = new java.awt.image.BufferedImage(2, 3,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val real = Seq((9L, bos.toByteArray)).toDF("media_id", "content")
    val rd = Multimodal.decodePngMeta(real).collect()(0)
    assert(rd.getBoolean(1) && rd.getLong(2) == 2L && rd.getLong(3) == 3L &&
      rd.getBoolean(6))
    // corrupted signature and flipped CRC byte fail clean, never throw
    val bad = Seq(
      (10L, Array.fill[Byte](40)(0)),
      (11L, { val c = bytes(0).clone(); c(30) = (c(30) ^ 1).toByte; c }))
      .toDF("media_id", "content")
    val bd = Multimodal.decodePngMeta(bad).orderBy("media_id").collect()
    assert(!bd(0).getBoolean(1) && bd(0).isNullAt(2)) // sig_ok false, width null
    assert(bd(1).getBoolean(1) && !bd(1).getBoolean(6)) // sig ok, crc mismatch
  }

  test("JPEG codec: segment walk finds SOF behind APP0; real encoder round-trips") {
    val dims = Seq((1L, 640L, 480L), (2L, 1L, 1L), (3L, 65535L, 2L))
      .toDF("id", "w", "h")
    val jpg = Multimodal.syntheticJpeg(dims, "id", "w", "h")
    val dec = Multimodal.decodeJpegMeta(jpg).orderBy("media_id").collect()
    assert(dec.map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((1L, 640L, 480L), (2L, 1L, 1L), (3L, 65535L, 2L)))
    assert(dec.forall(r => r.getBoolean(1) && r.getBoolean(6))) // sig_ok, eoi_ok
    assert(dec.forall(r => r.getLong(4) == 8L && r.getLong(5) == 1L))
    // a real JPEG encoder's output decodes identically (SOF sits behind
    // JFIF + quantization tables — the walk must skip segments by length)
    val img = new java.awt.image.BufferedImage(5, 7,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val rd = Multimodal.decodeJpegMeta(
      Seq((9L, bos.toByteArray)).toDF("media_id", "content")).collect()(0)
    assert(rd.getBoolean(1) && rd.getLong(2) == 5L && rd.getLong(3) == 7L)
    assert(rd.getLong(5) == 3L && rd.getBoolean(6)) // 3 components, EOI
    // dirty bytes fail clean: zeroed signature; SOI but garbage segments;
    // truncated tail (valid SOF, missing EOI)
    val sofless = Array[Byte](0xff.toByte, 0xd8.toByte, 0x00, 0x01, 0x02)
    val truncated = jpg.orderBy("media_id").collect()(0)
      .getAs[Array[Byte]]("content").dropRight(2)
    val bad = Seq((10L, Array.fill[Byte](40)(0)), (11L, sofless),
      (12L, truncated)).toDF("media_id", "content")
    val bd = Multimodal.decodeJpegMeta(bad).orderBy("media_id").collect()
    assert(!bd(0).getBoolean(1) && bd(0).isNullAt(2))
    assert(!bd(1).getBoolean(1) && bd(1).isNullAt(2)) // walk found no SOF
    assert(bd(2).getBoolean(1) && bd(2).getLong(2) == 640L &&
      !bd(2).getBoolean(6)) // header reads, trailer check fails
  }

  test("GIF codec: little-endian screen descriptor; real encoder round-trips") {
    val dims = Seq((1L, 640L, 480L), (2L, 1L, 1L), (3L, 300L, 65535L))
      .toDF("id", "w", "h")
    val gif = Multimodal.syntheticGif(dims, "id", "w", "h")
    val dec = Multimodal.decodeGifMeta(gif).orderBy("media_id").collect()
    assert(dec.map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSeq ==
      Seq((1L, 640L, 480L), (2L, 1L, 1L), (3L, 300L, 65535L)))
    assert(dec.forall(r => r.getBoolean(1) && r.getString(2) == "89a" &&
      !r.getBoolean(5) && r.getBoolean(6)))
    // a real GIF encoder's output decodes identically (and carries a GCT)
    val img = new java.awt.image.BufferedImage(4, 6,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", bos)
    val rd = Multimodal.decodeGifMeta(
      Seq((9L, bos.toByteArray)).toDF("media_id", "content")).collect()(0)
    assert(rd.getBoolean(1) && rd.getLong(3) == 4L && rd.getLong(4) == 6L &&
      rd.getBoolean(5) && rd.getBoolean(6))
    // dirty bytes fail clean; a "GIF00x" near-miss is not a signature
    val bad = Seq((10L, Array.fill[Byte](20)(0)),
      (11L, "GIF00xzzzz".getBytes("UTF-8"))).toDF("media_id", "content")
    val bd = Multimodal.decodeGifMeta(bad).orderBy("media_id").collect()
    assert(bd.forall(r => !r.getBoolean(1) && r.isNullAt(3)))
  }

  test("WAV codec: chunk walk reads fmt/data; real javax.sound encoder round-trips") {
    val dims = Seq((1L, 1L, 8000L, 16000L), (2L, 2L, 44100L, 1764000L),
      (3L, 1L, 22050L, 0L)).toDF("id", "ch", "sr", "db")
    val wav = Multimodal.syntheticWav(dims, "id", "ch", "sr", "db")
    val dec = Multimodal.decodeWavMeta(wav).orderBy("media_id").collect()
    assert(dec.map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(6)))
      .toSeq == Seq((1L, 1L, 8000L, 16000L), (2L, 2L, 44100L, 1764000L),
        (3L, 1L, 22050L, 0L)))
    assert(dec.forall(r => r.getBoolean(1) && r.getBoolean(2) &&
      r.getLong(5) == 16L)) // sig_ok, PCM, 16-bit
    // duration: 16000 bytes at 8000 Hz mono 16-bit = 1000 ms; 1764000 at
    // 44100 stereo = 10000 ms
    assert(dec.map(_.getLong(7)).toSeq == Seq(1000L, 10000L, 0L))
    // a real JDK-encoded WAV decodes identically
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val frames = 4000
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(new Array[Byte](frames * 2)), fmt, frames)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val rd = Multimodal.decodeWavMeta(
      Seq((9L, bos.toByteArray)).toDF("media_id", "content")).collect()(0)
    assert(rd.getBoolean(1) && rd.getBoolean(2) && rd.getLong(3) == 1L &&
      rd.getLong(4) == 8000L && rd.getLong(6) == frames * 2L &&
      rd.getLong(7) == 500L)
    // dirty bytes fail clean: zeroed signature; RIFF but chunk-less tail
    val bad = Seq((10L, Array.fill[Byte](30)(0)),
      (11L, "RIFF    WAVExx".getBytes("ISO-8859-1")))
      .toDF("media_id", "content")
    val bd = Multimodal.decodeWavMeta(bad).orderBy("media_id").collect()
    assert(!bd(0).getBoolean(1) && bd(0).isNullAt(3))
    assert(!bd(1).getBoolean(1)) // fmt never found -> not ok
  }

  test("MP4 codec: box walk to moov/mvhd; dirty and moov-less streams fail clean") {
    val dims = Seq((1L, 1000L, 5000L), (2L, 600L, 600L), (3L, 90000L, 0L))
      .toDF("id", "tsc", "dur")
    val mp4 = Multimodal.syntheticMp4(dims, "id", "tsc", "dur")
    val dec = Multimodal.decodeMp4Meta(mp4).orderBy("media_id").collect()
    assert(dec.map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSeq == Seq((1L, 1000L, 5000L, 5000L), (2L, 600L, 600L, 1000L),
        (3L, 90000L, 0L, 0L)))
    assert(dec.forall(r => r.getBoolean(1) && r.getString(2) == "isom"))
    // mvhd box size in the fixture is the spec's 108 bytes
    val bytes = mp4.orderBy("media_id").collect()(0).getAs[Array[Byte]]("content")
    assert(java.nio.ByteBuffer.wrap(bytes, 24, 4).getInt == 108)
    // dirty: zeros; ftyp-only (no moov); ftyp + free box then truncation
    val ftypOnly = bytes.take(16)
    val bad = Seq((10L, Array.fill[Byte](24)(0)), (11L, ftypOnly))
      .toDF("media_id", "content")
    val bd = Multimodal.decodeMp4Meta(bad).orderBy("media_id").collect()
    assert(!bd(0).getBoolean(1) && bd(0).isNullAt(3))
    assert(!bd(1).getBoolean(1) && bd(1).getString(2) == "isom") // brand reads, no moov
  }

  test("classTerms: distinctive words top their class, shared words score ~1") {
    import spark.implicits._
    val docs = (
      (1 to 10).map(_ => (0, "alpha alpha the words here")) ++
      (1 to 10).map(_ => (1, "beta beta the words there"))
    ).toDF("label", "text")
    val t = TextAnalysis.classTerms(docs, "label", "text", k = 3, minTf = 3L)
      .collect().map(r => (r.getInt(0), r.getLong(4)) ->
        (r.getString(1), r.getLong(2), r.getDouble(3))).toMap
    // rank 1 per class is the class-exclusive doubled word
    assert(t((0, 1L))._1 == "alpha" && t((0, 1L))._2 == 20L)
    assert(t((1, 1L))._1 == "beta")
    // "alpha": tf=20, wc=50, ft=20, T=100 -> score = 20*100/(50*20) = 2
    assert(t((0, 1L))._3 == 2.0)
    // "the" appears at the base rate everywhere -> score exactly 1
    val theScores = t.collect { case (_, ("the", _, s)) => s }
    assert(theScores.nonEmpty && theScores.forall(_ == 1.0))
  }

  test("collocations: planted phrase tops the lift ranking, counts exact") {
    import spark.implicits._
    // "new york" appears 30x and its words appear nowhere else; "of the"
    // also appears 30x but both words are everywhere — high c12 with
    // huge c1*c2 means low lift
    val docs = (
      (1 to 30).map(i => (i.toLong, "new york of the tour")) ++
      (31 to 60).map(i => (i.toLong, "best of the day of all"))
    ).toDF("doc_id", "text")
    val top = TextAnalysis.collocations(docs, "text", minCount = 5L, k = 5)
      .collect()
    assert(top.head.getString(0) == "new" && top.head.getString(1) == "york")
    assert(top.head.getLong(2) == 30L) // c12
    assert(top.head.getLong(3) == 30L && top.head.getLong(4) == 30L)
    val lifts = top.map(_.getDouble(5)).toSeq
    assert(lifts == lifts.sorted.reverse)
    // "of the" is the most FREQUENT pair (60x) yet never cracks the
    // lift top-5 — frequency is not association
    val pairs = top.map(r => (r.getString(0), r.getString(1))).toSet
    assert(!pairs.contains(("of", "the")))
    val all = TextAnalysis.collocations(docs, "text", minCount = 5L, k = 100)
      .collect()
    val ofThe = all.find(r => r.getString(0) == "of" && r.getString(1) == "the").get
    assert(ofThe.getLong(2) == 60L)
    assert(ofThe.getDouble(5) < top.head.getDouble(5))
    // minCount prunes the hapax tail: no pair below 5 occurrences
    assert(all.forall(_.getLong(2) >= 5L))
  }

  test("oovRate: exact counts against a frozen vocab, full-OOV and full-covered edges") {
    import spark.implicits._
    val vocab = Seq("the", "cat", "sat").toDF("word")
    val docs = Seq(
      (1L, "the cat sat"),          // fully covered
      (2L, "the dog ran"),          // 2 of 3 OOV
      (3L, "zz yy")).toDF("doc_id", "text") // fully OOV
    val got = TextAnalysis.oovRate(docs, "doc_id", "text", vocab)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 3L, 0L, 0.0), (2L, 3L, 2L, 0.666667),
      (3L, 2L, 2L, 1.0)))
    // duplicate vocab rows must not multiply matches
    val dup = TextAnalysis.oovRate(docs,
      "doc_id", "text", Seq("the", "the").toDF("word"))
      .agg(org.apache.spark.sql.functions.sum("n_tokens"))
      .as[Long].head()
    assert(dup == 8L)
  }

  test("chunkBySentences: greedy whole-sentence packing under the word budget") {
    val df = Seq((1L, "a b c. d e. f g h i. j.")).toDF("id", "text")
    val got = TextAnalysis.chunkBySentences(df, "id", "text", maxWords = 5)
      .orderBy("chunk_idx")
      .select("chunk_idx", "chunk", "n_chunk_words")
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq(
      (0L, "a b c. d e.", 5L),     // 3 + 2 fits exactly
      (1L, "f g h i. j.", 5L)))    // 4 would overflow chunk 0; 4 + 1 packs
  }

  test("chunkBySentences: oversized sentence owns its chunk; tail without terminator counts") {
    val df = Seq(
      (1L, "one two three four five six."),
      (2L, "a b. c d")).toDF("id", "text")
    val got = TextAnalysis.chunkBySentences(df, "id", "text", maxWords = 3)
      .orderBy("id", "chunk_idx")
      .select("id", "chunk", "n_chunk_words")
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "one two three four five six.", 6L), // over budget, intact
      (2L, "a b.", 2L), (2L, "c d", 2L)))
  }

  test("chunkBySentences: empty and punctuation-only docs emit nothing") {
    val df = Seq((1L, ""), (2L, "!!!"), (3L, "ok.")).toDF("id", "text")
    val got = TextAnalysis.chunkBySentences(df, "id", "text", maxWords = 5)
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(3L))
  }
}
