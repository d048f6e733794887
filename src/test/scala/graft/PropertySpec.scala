package graft

import java.sql.Date

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll

/** Property tests for the operators whose correctness is an ALGEBRAIC
  * invariant (distributed formulation == logical one-machine spec) —
  * the conformance gates pin these on fixed corpora; the properties pin
  * them on randomized ones. Spark jobs are slow per example, so the
  * generators run few, structurally varied cases rather than hundreds.
  */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  /** Spark jobs are slow per example: few, structurally varied cases. */
  private def checkProp(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(5), p)
    assert(res.passed, res.status.toString)
  }

  test("packSequences is bucket-count invariant and equals the global cumsum") {
    val docsGen = for {
      n <- Gen.choose(5, 60)
      lens <- Gen.listOfN(n, Gen.choose(1, 30))
    } yield lens.zipWithIndex.map { case (l, i) =>
      (i.toLong, Seq.fill(l)("w").mkString(" "))
    }
    checkProp(forAll(docsGen) { rows =>
      val df = rows.toDF("doc_id", "text")
      def packed(buckets: Int) =
        ext.TextAnalysis.packSequences(df, "doc_id", "text",
          budget = 16, buckets = buckets)
          .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      val p4 = packed(4)
      // logical spec: one global cumsum in (md5(id), id) order
      val md = java.security.MessageDigest.getInstance("MD5")
      def h(i: Long) = md.digest(i.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      var cum = 0L
      val brute = rows.map { case (i, t) => (i, t.split(" ").length.toLong) }
        .sortBy { case (i, _) => (h(i), i) }
        .map { case (i, n) =>
          val prev = cum; cum += n; (i, n, prev / 16, prev % 16)
        }.sortBy(_._1)
      p4 == brute && p4 == packed(16)
    })
  }

  test("scd2: any ts-ordered batch split folds to the one-shot chain") {
    val obsGen = for {
      nKeys <- Gen.choose(1, 4)
      nDays <- Gen.choose(2, 8)
      attrs <- Gen.listOfN(nKeys * nDays, Gen.oneOf("a", "b", "c"))
      cut1 <- Gen.choose(1, nDays - 1)
    } yield {
      val obs = for {
        k <- 0 until nKeys; d <- 0 until nDays
      } yield (k.toLong, attrs(k * nDays + d),
        Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(d)))
      (obs, Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(cut1)))
    }
    checkProp(forAll(obsGen) { case (obs, cutDate) =>
      val all = obs.toDF("k", "prio", "ts")
      def result(dim: org.apache.spark.sql.DataFrame) =
        dim.orderBy("k", "valid_from")
          .as[(Long, String, Date, Option[Date])].collect().toSeq
      val oneShot = result(
        snapshot.Scd2.init(all, Seq("k"), Seq("prio"), "ts"))
      val b1 = all.filter(col("ts") < lit(cutDate))
      val b2 = all.filter(col("ts") >= lit(cutDate))
      val folded = result(snapshot.Scd2.merge(
        snapshot.Scd2.init(b1, Seq("k"), Seq("prio"), "ts"),
        b2, Seq("k"), Seq("prio"), "ts"))
      folded == oneShot
    })
  }

  test("materialized agg: any batch split folds to the direct aggregation") {
    val rowsGen = for {
      n <- Gen.choose(3, 30)
      rows <- Gen.listOfN(n, for {
        y <- Gen.choose(2023L, 2025L)
        g <- Gen.oneOf("p", "q")
        v <- Gen.choose(0, 99999)
      } yield (y, g, v / 100.0))
      cut <- Gen.choose(1, n - 1)
    } yield (rows, cut)
    checkProp(forAll(rowsGen) { case (rows, cut) =>
      val wh = new snapshot.Warehouse(spark,
        TempDirs.scratchDir("prop_mv").toString)
      Seq(rows.take(cut), rows.drop(cut)).filter(_.nonEmpty).foreach { b =>
        snapshot.MaterializedAgg.appendWithAgg(wh, "f",
          b.toDF("year", "grp", "value"), Seq("grp"), "value")
      }
      val got = snapshot.MaterializedAgg.readAgg(wh, "f", Seq("grp"))
        .select("grp", "total", "n").orderBy("grp")
        .as[(String, Double, Long)].collect().toSeq
      val direct = rows.toDF("year", "grp", "value").groupBy("grp")
        .agg(sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("total"), count(lit(1)).as("n"))
        .orderBy("grp").as[(String, Double, Long)].collect().toSeq
      got == direct
    })
  }

  test("RepetitionStats equals an independent one-machine reference on random text") {
    // independent reference: Scala collections, NOT the expression's
    // hashmap walk — grams via sliding, counts via groupBy
    def ref(text: String, topNs: Seq[Int], dupNs: Seq[Int],
        sep: String): Map[String, Double] = {
      val chars = text.codePointCount(0, text.length).toLong
      def cp(s: String) = s.codePointCount(0, s.length).toLong
      def r6(x: Double) = java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      def frac(m: Long) = if (chars <= 0) 0.0 else r6(math.min(1.0, m.toDouble / chars))
      val toks = text.split(" ", -1).toSeq
      def gramCounts(n: Int) =
        (if (toks.length < n) Seq.empty else toks.sliding(n).map(_.mkString(" ")).toSeq)
          .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val tops = topNs.map { n =>
        val c = gramCounts(n)
        val m = if (c.isEmpty) 0L else {
          val mx = c.values.max
          val g = c.filter(_._2 == mx).keys.reduceLeft((x, y) =>
            if (ext.RepetitionStats.utf8Less(y, x)) y else x)
          mx * cp(g)
        }
        s"top_${n}gram_char_frac" -> frac(m)
      }
      val dups = dupNs.map { n =>
        val c = gramCounts(n)
        s"dup_${n}gram_char_frac" ->
          frac(c.collect { case (g, k) if k >= 2 => k * cp(g) }.sum)
      }
      val lines = text.split(java.util.regex.Pattern.quote(sep), -1).toSeq
      val lc = lines.groupBy(identity).view.mapValues(_.size.toLong).toMap
      (Map(
        "dup_line_frac" -> r6(1.0 - lc.size.toDouble / lines.size),
        "dup_line_char_frac" ->
          frac(lc.collect { case (l, k) if k >= 2 => k * cp(l) }.sum)) ++
        tops ++ dups)
    }
    val word = Gen.oneOf("a", "bb", "ccc", "\u00e9", "x")
    val docGen = for {
      n <- Gen.choose(0, 25)
      ws <- Gen.listOfN(n, word)
      nl <- Gen.choose(0, 3)  // sprinkle line breaks
    } yield {
      val t = ws.mkString(" ")
      if (nl == 0 || t.isEmpty) t
      else t.replaceFirst(" ", "\n")
    }
    checkProp(forAll(Gen.listOfN(6, docGen)) { texts =>
      val topNs = Seq(2, 3); val dupNs = Seq(2, 4)
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = ext.Repetition.metrics(rows.toDF("doc_id", "text"),
        "doc_id", "text", topNs, dupNs).collect()
        .map(r => r.getLong(0) -> r).toMap
      rows.forall { case (i, t) =>
        val e = ref(t, topNs, dupNs, "\n")
        val r = got(i)
        e.forall { case (k, v) => r.getDouble(r.fieldIndex(k)) == v }
      }
    })
  }

  test("PaddedNgrams equals the sliding-window reference on random text") {
    val word = Gen.oneOf("a", "bb", "<s>", "x", "")
    val docGen = Gen.choose(0, 12).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ")))
    checkProp(forAll(Gen.listOfN(8, docGen)) { texts =>
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = rows.toDF("doc_id", "text")
        .select(col("doc_id"), ext.PaddedNgrams(col("text"), 3, 2).as("g"))
        .as[(Long, Seq[(String, String, String)])].collect().toMap
      rows.forall { case (i, t) =>
        val p = Seq("<s>", "<s>") ++ t.split(" ", -1).toSeq
        val exp = p.sliding(3).map { case Seq(a, b, c) => (a, b, c) }.toSeq
        got(i) == exp
      }
    })
  }

  test("BpeEncode equals the HOF applyMerge fold on random words") {
    val word = Gen.choose(0, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString))
    val merge = Gen.oneOf(("a", "b"), ("a", "a"), ("b", "c"), ("ab", "c"))
    checkProp(forAll(Gen.listOfN(10, word), Gen.listOfN(3, merge)) {
      (words, merges) =>
        val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
          .toDF("id", "w")
        val native = df.select(col("id"),
          ext.Bpe.encode(col("w"), merges).as("s"))
          .as[(Long, Seq[String])].collect().toMap
        val hof = df.select(col("id"),
          merges.foldLeft(split(col("w"), "")) { case (syms, (a, b)) =>
            ext.Bpe.applyMerge(syms, a, b)
          }.as("s")).as[(Long, Seq[String])].collect().toMap
        native == hof
    })
  }
}
