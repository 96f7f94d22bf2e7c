package graft

import org.apache.spark.sql.functions._

import graft.ext.TextOps

class TextQualitySpec extends SparkTestBase {
  import spark.implicits._

  test("compressionRatio: exact vs a local Deflater; repetitive << natural; gates through Cleaning") {
    def expected(s: String): Double = {
      val bytes = s.getBytes("UTF-8")
      val d = new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
      try {
        d.setInput(bytes); d.finish()
        val buf = new Array[Byte](8192)
        var total = 0
        while (!d.finished()) total += d.deflate(buf)
        total.toDouble / bytes.length
      } finally d.end()
    }
    val rep = ("spam spam spam spam " * 50).trim
    val nat = "The quick brown fox jumps over a lazy dog while seven " +
      "wizards briskly mix foamy quartz globes under vexing July skies."
    val rows = Seq((1L, rep), (2L, nat), (3L, ""), (4L, null))
      .toDF("id", "text")
      .select(col("id"), TextOps.compressionRatio(col("text")).as("cr"))
      .orderBy("id").collect()
    // byte-exact against the same JDK Deflater (never hardcoded — the
    // zlib build owns the constant)
    assert(rows(0).getDouble(1) == expected(rep))
    assert(rows(1).getDouble(1) == expected(nat))
    assert(rows(0).getDouble(1) < 0.2 && rows(1).getDouble(1) > 0.5,
      s"separation lost: rep=${rows(0).getDouble(1)} nat=${rows(1).getDouble(1)}")
    assert(rows(2).isNullAt(1) && rows(3).isNullAt(1))
    // the Cleaning knob resolves the feature name; a floor between the
    // two ratios keeps natural prose and kills the template spam
    import graft.ext.Cleaning
    val docs = Seq((1L, rep + " extra tail words here", "s"),
      (2L, nat + " and more natural words follow on", "s")).toDF("doc_id", "text", "source")
    val kept = Cleaning.gate(docs, Cleaning.Config(lang = None,
        minTokens = 1, maxTokens = 100000,
        minQuality = Some(("compression_ratio", 0.35))))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L))
  }

  test("dupLineFraction / dupLineCharFraction / dupParagraphFraction hand-checked") {
    val doc = Seq(
      (1L, "aaa\nbbb\naaa\nccc"),          // 4 lines, 1 repeat
      (2L, "one\ntwo\nthree"),             // no repeats
      (3L, "p1 text\n\np2 text\n\np1 text"), // 3 paragraphs, 1 repeat
      (4L, "x")                            // single line
    ).toDF("id", "text")
    val r = doc.select(col("id"),
        TextOps.dupLineFraction(col("text")).as("dlf"),
        TextOps.dupLineCharFraction(col("text")).as("dlcf"),
        TextOps.dupParagraphFraction(col("text")).as("dpf"))
      .orderBy("id").collect()
    assert(r(0).getDouble(1) == 0.25)              // 1 of 4 lines repeated
    assert(math.abs(r(0).getDouble(2) - 3.0 / 12) < 1e-12) // 3 of 12 line chars
    assert(r(1).getDouble(1) == 0.0)
    assert(math.abs(r(2).getDouble(3) - 1.0 / 3) < 1e-12)
    assert(r(3).getDouble(1) == 0.0 && r(3).getDouble(3) == 0.0)
  }

  test("wordNgrams: n-gram construction and short-doc guard") {
    val df = Seq((1L, "A b c d"), (2L, "solo")).toDF("id", "text")
    val g2 = df.select(col("id"), TextOps.wordNgrams(col("text"), 2).as("g"))
      .orderBy("id").as[(Long, Seq[String])].collect()
    assert(g2(0)._2 == Seq("a b", "b c", "c d"))
    assert(g2(1)._2 == Seq.empty, "doc shorter than n must yield NO grams (and never a descending sequence)")
  }

  test("ngramRepetitionStats: counts, tie-break, coverage fractions") {
    // "ab ab cd ab" -> bigrams: "ab ab", "ab cd", "cd ab" each once:
    // tie on cnt=1 -> lexicographically greatest gram "cd ab"
    val df = Seq(
      (1L, "ab ab cd ab"),
      (2L, "x y x y x y")  // "x y" x3, "y x" x2
    ).toDF("id", "text")
    val r = TextOps.ngramRepetitionStats(df, "id", "text", 2).orderBy("id").collect()
    assert(r(0).getAs[String]("top_gram") == "cd ab" && r(0).getAs[Long]("top_cnt") == 1L)
    assert(r(1).getAs[String]("top_gram") == "x y" && r(1).getAs[Long]("top_cnt") == 3L)
    // doc2: top covers 3*3=9 chars of 11; duplicated grams: "x y"(3)+"y x"(2) -> 15 chars
    assert(math.abs(r(1).getAs[Double]("top_frac") - 9.0 / 11) < 1e-12)
    assert(math.abs(r(1).getAs[Double]("dup_frac") - 15.0 / 11) < 1e-12)
    // doc1: no duplicated bigram
    assert(r(0).getAs[Double]("dup_frac") == 0.0)
  }

  test("ngramRepetitionStats keeps sub-n-token docs with zero fractions (total metric)") {
    val df = Seq((1L, "only"), (2L, "two words here")).toDF("id", "text")
    val r = TextOps.ngramRepetitionStats(df, "id", "text", 3).orderBy("id").collect()
    assert(r.length == 2)
    assert(r(0).getAs[Long]("top_cnt") == 0L && r(0).getAs[Double]("top_frac") == 0.0)
    assert(r(1).getAs[Long]("top_cnt") == 1L)
  }

  test("repetitionKeep: repetitive docs rejected, clean docs kept") {
    val clean = "the quick brown fox jumps over one lazy dog while seven crows watch from distant maple trees"
    val loopy = "buy now buy now buy now buy now buy now buy now buy now buy now"
    val df = Seq((1L, clean), (2L, loopy)).toDF("id", "text")
    val keep = TextOps.repetitionKeep(df, "id", "text")
      .select("id", "keep").as[(Long, Boolean)].collect().toMap
    assert(keep(1L), "clean doc must pass")
    assert(!keep(2L), "looped doc must fail the top-2-gram char gate")
  }

  test("n-gram stats are a shuffle-free scan: no exchange, no aggregate in the plan") {
    // the run-length fold over the sorted gram array is linear per
    // document (after an O(g log g) array_sort) and needs no shuffle —
    // the whole Gopher gate rides the scan
    val df = Seq((1L, "a b c a b")).toDF("id", "text")
    val plan = TextOps.ngramRepetitionStats(df, "id", "text", 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected a shuffle-free plan:\n$plan")
    assert(!plan.contains("HashAggregate"), s"expected no aggregate:\n$plan")
  }

  test("fold matches a brute-force recount on varied docs") {
    val docs = Seq(
      (1L, "a b c a b"),           // top 2-gram "a b" ×2
      (2L, "x x x x"),             // "x x" ×3 (overlapping runs)
      (3L, "solo"),                // no 2-grams
      (4L, ""),                    // empty
      (5L, "p q p q p q r p q")).toDF("id", "text")
    val got = TextOps.ngramRepetitionStats(docs, "id", "text", 2)
      .select("id", "top_gram", "top_cnt", "dup_frac")
      .as[(Long, String, Long, Double)].collect().map(r => r._1 -> r).toMap
    def brute(text: String) = {
      val t = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val grams = t.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      val cnt = grams.groupBy(identity).map { case (g, o) => g -> o.size.toLong }
      val top = if (cnt.isEmpty) ("", 0L)
        else { val m = cnt.values.max; (cnt.filter(_._2 == m).keys.max, m) }
      val dup = cnt.collect { case (g, c) if c > 1 => c * g.length }.sum
      (top._1, top._2, if (text.isEmpty) 0.0 else dup.toDouble / text.length)
    }
    for ((id, text) <- Seq((1L, "a b c a b"), (2L, "x x x x"), (3L, "solo"),
        (4L, ""), (5L, "p q p q p q r p q"))) {
      val (bg, bc, bd) = brute(text)
      val (_, g, c, d) = got(id)
      assert(g == bg && c == bc, s"doc $id: got ($g,$c) want ($bg,$bc)")
      assert(math.abs(d - bd) < 1e-12, s"doc $id dup_frac: got $d want $bd")
    }
  }

  test("piiCounts: each class counted independently, no cross-class bleed") {
    val s = "mail a.b+c@ex-1.org and x@y.io, ip 192.168.0.1, " +
      "call 555-867-5309 or 555 867 5309, ssn 123-45-6789"
    val df = Seq(Tuple1(s)).toDF("t")
    val row = df.select(TextOps.piiCounts(col("t")).map { case (n, c) => c.as(n) }: _*)
      .collect()(0)
    assert(row.getInt(0) == 2, "emails")
    assert(row.getInt(1) == 1, "ipv4")
    assert(row.getInt(2) == 2, "phones")
    assert(row.getInt(3) == 1, "ssn — the 2-digit middle must NOT count as a phone")
  }

  test("piiRedact replaces every class with its typed placeholder") {
    val df = Seq(Tuple1(
      "from bob@corp.example.com at 10.0.0.7 phone 555-123-4567 ssn 078-05-1120 end"
    )).toDF("t")
    val got = df.select(TextOps.piiRedact(col("t"))).as[String].collect()(0)
    assert(got == "from <EMAIL> at <IP> phone <PHONE> ssn <SSN> end", got)
  }

  test("piiRedact: SSN runs before phone so the shapes don't collide") {
    // 123-45-6789 is an SSN (3-2-4); 123-456-7890 is a phone (3-3-4) —
    // both present, each must get its own placeholder
    val df = Seq(Tuple1("a 123-45-6789 b 123-456-7890 c")).toDF("t")
    val got = df.select(TextOps.piiRedact(col("t"))).as[String].collect()(0)
    assert(got == "a <SSN> b <PHONE> c", got)
  }

  test("c4 line rules: terminal punctuation, min words, blacklist") {
    val lines = Seq(
      "A good sentence with enough words here.",   // keep
      "Too short.",                                 // < 5 words
      "no terminal punctuation in this line",       // no punct
      "Enable javascript to view this content.",    // blacklist
      "Ends with a question does it not?",          // keep (?)
      "He said \"stop right there.\""               // keep (quote)
    ).toDF("line")
    val kept = lines.filter(TextOps.c4LineKeep(col("line"))).as[String].collect()
    assert(kept.toSeq == Seq(
      "A good sentence with enough words here.",
      "Ends with a question does it not?",
      "He said \"stop right there.\""))
  }

  test("c4LineStats: counts and surviving char mass, inside codegen (no shuffle)") {
    val df = Seq(Tuple1(Seq(
      "Keep this line it is long enough.",
      "drop",
      "Another keeper with the right shape."))).toDF("lines")
    val row = df.select(TextOps.c4LineStats(col("lines")).map { case (n, c) => c.as(n) }: _*)
      .collect()(0)
    assert(row.getLong(0) == 3 && row.getLong(1) == 2)
    assert(row.getLong(2) ==
      "Keep this line it is long enough.".length + "Another keeper with the right shape.".length)
    val plan = df.select(TextOps.c4LineStats(col("lines")).map { case (n, c) => c.as(n) }: _*)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"line filtering must not shuffle:\n$plan")
  }

  test("unicode normalization: NFC composes, NFKC also folds compatibility forms, idempotent") {
    import spark.implicits._
    val df = Seq(
      "cafe\u0301",        // decomposed acute
      "\u212Bngstr\u00F6m", // Angstrom sign composes to oA under NFC
      "\uFB01le \uFF21",    // fi ligature + fullwidth A: NFC keeps, NFKC folds
      "plain ascii").toDF("t")
    val out = df.select(
        TextOps.normalizeUnicode(col("t")).as("nfc"),
        TextOps.normalizeUnicode(col("t"), "NFKC").as("nfkc"))
      .as[(String, String)].collect()
    assert(out(0) == ("caf\u00E9", "caf\u00E9"))
    assert(out(1) == ("\u00C5ngstr\u00F6m", "\u00C5ngstr\u00F6m"))
    assert(out(2)._1 == "\uFB01le \uFF21" && out(2)._2 == "file A")
    assert(out(3) == ("plain ascii", "plain ascii"))
    // idempotence: NFC(NFC(x)) == NFC(x)
    val once = df.select(TextOps.normalizeUnicode(col("t")).as("t"))
    val twice = once.select(TextOps.normalizeUnicode(col("t")))
    assert(once.as[String].collect().toSeq == twice.as[String].collect().toSeq)
  }

  test("mojibake repair: mis-decoded UTF-8 fixed (Windows-1252 block incl.), real Latin-1 untouched") {
    import spark.implicits._
    val df = Seq(
      "caf\u00C3\u00A9",          // 'e-acute' mis-decoded as Latin-1
      "it\u00E2\u20AC\u2122s",    // right single quote mis-decoded (1252 0x80-0x9F block)
      "touch\u00E9!",             // genuine accented text: must pass through
      "100% ascii").toDF("t")
    val out = df.select(TextOps.fixMojibake(col("t"))).as[String].collect()
    assert(out(0) == "caf\u00E9")
    assert(out(1) == "it\u2019s")
    assert(out(2) == "touch\u00E9!")
    assert(out(3) == "100% ascii")
  }

  test("vocabDivergence: identity is zero, JS symmetric and bounded, disjoint vocab maximal, alpha guard") {
    import graft.ext.TextOps
    val a = Seq("alpha beta beta gamma", "alpha delta").toDF("text")
    val b = Seq("alpha beta", "epsilon zeta zeta").toDF("text")
    def row(x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame) =
      TextOps.vocabDivergence(x, y, "text").collect().head
    // KL(P||P) == 0 exactly (every per-term contribution is ln(1) = 0)
    val self = row(a, a)
    assert(self.getAs[Double]("kl_ab") == 0.0 && self.getAs[Double]("js") == 0.0)
    // symmetry: JS(a,b) == JS(b,a); KL directions swap
    val ab = row(a, b); val ba = row(b, a)
    assert(ab.getAs[Double]("js") == ba.getAs[Double]("js"))
    assert(ab.getAs[Double]("kl_ab") == ba.getAs[Double]("kl_ba"))
    assert(ab.getAs[Double]("js") > 0.0 &&
      ab.getAs[Double]("js") <= math.log(2) + 1e-9) // JS bound (nats)
    // a disjoint-vocab pair diverges more than an overlapping one
    val c = Seq("eta theta iota").toDF("text")
    assert(row(a, c).getAs[Double]("js") > ab.getAs[Double]("js"))
    // union-vocab bookkeeping
    assert(ab.getAs[Long]("n_terms") == 6) // alpha beta gamma delta epsilon zeta
    assert(ab.getAs[Long]("n_tokens_a") == 6 && ab.getAs[Long]("n_tokens_b") == 5)
    intercept[IllegalArgumentException] {
      TextOps.vocabDivergence(a, b, "text", alpha = 0.0)
    }
  }
}
