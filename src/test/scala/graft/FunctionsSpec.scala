package graft

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._

import graft.functions.{GraftExtensions, SketchAggregates, VectorExpressions}

class FunctionsSpec extends SparkTestBase {
  import spark.implicits._

  test("graft_dot is bit-identical to the aggregate/zip_with form") {
    val df = Tables_embeddings()
    val hof = df.select(col("vec_id"),
      aggregate(zip_with(col("embedding"), col("embedding"),
        (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (a, x) => a + x).as("d"))
    val fused = df.select(col("vec_id"),
      VectorExpressions.dotF(col("embedding"), col("embedding")).as("d"))
    val j = hof.as("h").join(fused.as("f"), "vec_id")
      .filter(col("h.d") =!= col("f.d")) // exact inequality, not tolerance
    assert(j.count() == 0)
  }

  test("graft_lsh_signature is bit-identical to the 64-dot expression-tree form") {
    val df = Tables_embeddings()
    val planes = graft.ext.Similarity.hyperplanes(64, 64)
    val bitsPerBand = 8
    // the pre-kernel reference: 64 when(dot >= 0) bits packed per band
    val bits: Seq[Column] = planes.toIndexedSeq.map { p =>
      val planeLit = array(p.toIndexedSeq.map(v => lit(v.toFloat)): _*)
      when(VectorExpressions.dotF(col("embedding"), planeLit) >= 0, lit(1L)).otherwise(lit(0L))
    }
    val treeBands = array((0 until planes.length / bitsPerBand).map { b =>
      (0 until bitsPerBand).map(i => bits(b * bitsPerBand + i) * (1L << i)).reduce(_ + _)
    }: _*)
    val tree = df.select(col("vec_id"), treeBands.as("bands"))
    val fused = df.select(col("vec_id"),
      graft.ext.Similarity.lshSignature(col("embedding"), planes, bitsPerBand).as("bands"))
    val j = tree.as("t").join(fused.as("f"), "vec_id")
      .filter(col("t.bands") =!= col("f.bands"))
    assert(j.count() == 0)
    assert(fused.count() > 0)
    // interpreted path agrees with codegen on one row
    val e = VectorExpressions.LshSignatureFloat(
      org.apache.spark.sql.graft.ColumnBridge.expr(lit(Array.fill(4)(1f))),
      Array.fill(8 * 4)(1f), nPlanes = 8, dim = 4, bitsPerBand = 4)
    val viaEval = e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    assert(viaEval.toSeq == Seq(15L, 15L)) // all dots positive -> all bits set
  }

  test("graft_bounded_topk == sorted-collect_list top-k, partition-order invariant") {
    val docs = graft.store.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("source"), explode(split(trim(col("text")), "\\s+")).as("term"))
      .select(col("source"), col("term"), length(col("term")).cast("double").as("score"))
    val cmp = (l: Column, r: Column) =>
      when(l.getField("score") > r.getField("score"), -1)
        .when(l.getField("score") < r.getField("score"), 1)
        .when(l.getField("term") < r.getField("term"), -1)
        .when(l.getField("term") > r.getField("term"), 1)
        .otherwise(0)
    val ref = docs.groupBy("source")
      .agg(slice(array_sort(collect_list(struct(col("score"), col("term"))), cmp), 1, 5).as("top"))
      .select(col("source"), posexplode(col("top")))
      .select(col("source"), col("pos"), col("col.term"), col("col.score"))
    for (parts <- Seq(1, 13)) {
      val got = docs.repartition(parts).groupBy("source")
        .agg(graft.functions.TopKAggregate.boundedTopK(col("score"), col("term"), 5).as("top"))
        .select(col("source"), posexplode(col("top")))
        .select(col("source"), col("pos"), col("col.term"), col("col.score"))
      assert(got.count() > 0)
      assert(got.except(ref).isEmpty && ref.except(got).isEmpty, s"parts=$parts")
    }
  }

  test("graft_lsh_signature raises on a dimension-mismatched vector") {
    val planes = graft.ext.Similarity.hyperplanes(8, dim = 8)
    val err = intercept[Exception] {
      spark.range(1)
        .select(graft.ext.Similarity.lshSignature(lit(Array(1f, 2f)), planes, 4))
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(_.contains("embedding dimension 2 != configured dim 8")))
  }

  test("graft_dot computes through both eval paths") {
    // codegen path (DataFrame select)
    val viaDf = spark.range(1)
      .select(VectorExpressions.dotF(lit(Array(1f, 2f, 3f)), lit(Array(4f, 5f, 6f))).as("d"))
      .head.getDouble(0)
    assert(viaDf == 32.0)
    // interpreted path (direct expression eval on literals)
    val e = VectorExpressions.DotProductFloat(
      org.apache.spark.sql.graft.ColumnBridge.expr(lit(Array(1f, 2f, 3f))),
      org.apache.spark.sql.graft.ColumnBridge.expr(lit(Array(4f, 5f, 6f))))
    assert(e.eval(null) == 32.0)
  }

  test("sortedIntersectCount == size(array_intersect) on sorted distinct arrays") {
    val df = Seq(
      (Array(1L, 3L, 5L, 9L), Array(2L, 3L, 9L, 11L)), // {3,9}
      (Array.empty[Long], Array(1L, 2L)),
      (Array(7L), Array(7L)))
      .toDF("a", "b")
    val out = df.select(
      VectorExpressions.sortedIntersectCount(col("a"), col("b")).as("fused"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("builtin")).collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("SQL surface: functions usable from spark.sql after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d, " +
      "graft_intersect_count(array(1L, 2L, 5L), array(2L, 5L, 9L)) AS c")
      .head
    assert(r.getDouble(0) == 11.0 && r.getLong(1) == 2L)
    val r2 = spark.sql(
      "SELECT graft_word_ngrams(array('a', 'b', 'c'), 2) AS g, " +
      "graft_uni_bigrams(array('a', 'b')) AS u, " +
      "graft_ngram_repetition(array('x', 'x', 'y')).top AS t, " +
      "graft_double_order_bits(1.0D) AS k").head
    assert(r2.getSeq[String](0) == Seq("a b", "b c"))
    assert(r2.getSeq[String](1) == Seq("a", "b", "a b"))
    assert(r2.getLong(2) == 2L)
    assert(r2.getLong(3) == java.lang.Double.doubleToLongBits(1.0))
    val r3 = spark.sql(
      "SELECT graft_space_saving_topk(k, 8) AS sk FROM VALUES ('a'), ('a'), ('b') t(k)")
      .selectExpr("inline(sk)").collect()
    assert(r3.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("a", 2L), ("b", 1L)))
    // round-11 additions: extraction kernels + the bounded top-k agg
    val r4 = spark.sql(
      "SELECT graft_html_blocks('<nav>x</nav><p>Body text</p>') AS b").head
    assert(r4.getSeq[Row](0).map(x => (x.getString(0), x.getString(3))) ==
      Seq(("x", "nav"), ("Body text", "content")))
    val warcSql = "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n"
    val r5 = spark.sql("SELECT graft_warc_records(cast('" +
      warcSql.replace("\r\n", "' || chr(13) || chr(10) || '") +
      "' AS BINARY)) AS r").selectExpr("inline(r)").head
    assert(r5.getString(0) == "1.0" &&
      new String(r5.getAs[Array[Byte]]("payload"), "UTF-8") == "hi")
    val r6 = spark.sql(
      "SELECT graft_bounded_topk(s, t, 2) AS top FROM VALUES " +
        "(3.0D, 'a'), (1.0D, 'b'), (2.0D, 'c') t(s, t)")
      .selectExpr("inline(top)").collect()
    assert(r6.map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      Seq(("a", 3.0), ("c", 2.0)))
    // round-14 additions: URL normalize, sitemap parse, fused HTTP body
    // text, unicode normalize, mojibake repair
    val r7 = spark.sql(
      "SELECT graft_normalize_url('HTTPS://A.Example:443/p?b=2&utm_x=1&a=1') AS u, " +
      "graft_unicode_normalize('cafe\u0301', 'NFC') AS n, " +
      "graft_fix_mojibake('caf\u00C3\u00A9') AS m").head
    assert(r7.getString(0) == "https://a.example/p?a=1&b=2")
    assert(r7.getString(1) == "caf\u00E9" && r7.getString(2) == "caf\u00E9")
    val r8 = spark.sql(
      "SELECT graft_sitemap_entries(cast('<urlset><url><loc>https://e.x/p</loc>" +
        "</url></urlset>' AS BINARY)) AS e").selectExpr("inline(e)").head
    assert(r8.getString(0) == "https://e.x/p" && r8.getString(2) == "url")
    val httpSql = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>hi</p>"
    val r9 = spark.sql("SELECT graft_http_body_text(cast('" +
      httpSql.replace("\r\n", "' || chr(13) || chr(10) || '") +
      "' AS BINARY)) AS t").head
    assert(r9.getString(0) == "<p>hi</p>")
  }

  test("graft_uni_bigrams is bit-identical to the transform/element_at form") {
    import graft.functions.TextExpressions
    val docs = graft.store.Tables.documents(spark, "/root/testdata/sf0.001")
    val w = split(trim(lower(col("text"))), "\\s+")
    val hof = when(size(w) >= 2,
        transform(sequence(lit(1), size(w) - 1),
          i => concat(element_at(w, i), lit(" "), element_at(w, i + 1))))
      .otherwise(array().cast("array<string>"))
    val bad = docs.select(
        TextExpressions.uniBigrams(w).as("fused"),
        concat(w, hof).as("ref"))
      .filter(not(col("fused") <=> col("ref")))
    assert(bad.count() == 0)
    // edge cases through both eval paths: empty-ish, single, two tokens
    val cases = Seq("x", "a b", "a b c", "  lone  ").toDF("text")
    val edge = cases.select(
        TextExpressions.uniBigrams(split(trim(lower(col("text"))), "\\s+")).as("fused"),
        concat(split(trim(lower(col("text"))), "\\s+"),
          when(size(split(trim(lower(col("text"))), "\\s+")) >= 2,
            transform(sequence(lit(1), size(split(trim(lower(col("text"))), "\\s+")) - 1),
              i => concat(element_at(split(trim(lower(col("text"))), "\\s+"), i), lit(" "),
                element_at(split(trim(lower(col("text"))), "\\s+"), i + 1))))
          .otherwise(array().cast("array<string>"))).as("ref"))
      .filter(not(col("fused") <=> col("ref")))
    assert(edge.count() == 0)
    // interpreted path (direct eval)
    val e = TextExpressions.UnigramBigramConcat(
      org.apache.spark.sql.graft.ColumnBridge.expr(lit(Array("a", "b", "c"))))
    val got = e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toArray[org.apache.spark.unsafe.types.UTF8String](
        org.apache.spark.sql.types.StringType).map(_.toString).toSeq
    assert(got == Seq("a", "b", "c", "a b", "b c"))
  }

  test("graft_word_ngrams is bit-identical to the zip_with chain and the transform form") {
    import graft.functions.TextExpressions
    val docs = graft.store.Tables.documents(spark, "/root/testdata/sf0.001")
    for (n <- Seq(2, 3, 5)) {
      val toks = split(trim(lower(col("text"))), "\\s+")
      // the zip_with-chain reference (the previous wordNgrams body)
      val joined = (2 to n).foldLeft(toks) { (acc, k) =>
        zip_with(acc, when(size(toks) >= k, slice(toks, lit(k), size(toks)))
            .otherwise(array().cast("array<string>")),
          (a, b) => concat(a, lit(" "), b))
      }
      val ref = filter(joined, g => g.isNotNull)
      // the transform/element_at reference (the previous shingles body)
      val ref2 = when(size(toks) < n, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
      val bad = docs.select(
          TextExpressions.wordNgramsOf(toks, n).as("fused"),
          ref.as("r1"), ref2.as("r2"))
        .filter(not(col("fused") <=> col("r1")) || not(col("fused") <=> col("r2")))
      assert(bad.count() == 0, s"n=$n mismatch")
    }
    // interpreted path + short-doc edge
    val e = TextExpressions.WordNgramConcat(
      org.apache.spark.sql.graft.ColumnBridge.expr(lit(Array("a", "b", "c"))), 2)
    val got = e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toArray[org.apache.spark.unsafe.types.UTF8String](
        org.apache.spark.sql.types.StringType).map(_.toString).toSeq
    assert(got == Seq("a b", "b c"))
    val short = TextExpressions.WordNgramConcat(
      org.apache.spark.sql.graft.ColumnBridge.expr(lit(Array("solo"))), 3)
    assert(short.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .numElements() == 0)
  }

  test("graft_ngram_repetition is bit-identical to the sorted struct-fold reference") {
    import graft.functions.TextExpressions
    import graft.ext.TextOps
    val docs = graft.store.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("text"))
      .union(Seq("", "a", "a a a a", "b a b a b a", "x y x y z z z").toDF("text"))
    for (n <- Seq(2, 3)) {
      val grams = TextExpressions.wordNgramsOf(
        split(trim(lower(col("text"))), "\\s+"), n)
      // the previous formulation: sort (hash, gram) structs, fold runs
      val sorted = array_sort(transform(grams,
        g => struct(xxhash64(g).as("h"), g.as("g"))))
      val z = struct(lit(0L).as("prevh"), lit("").as("prev"), lit(0L).as("cur"),
        lit(0L).as("top"), lit("").as("topg"), lit(0L).as("dup"))
      def newTop(st: Column) =
        when(st.getField("cur") > st.getField("top"), st.getField("cur"))
          .otherwise(st.getField("top"))
      def newTopg(st: Column) =
        when(st.getField("cur") > st.getField("top"), st.getField("prev"))
          .when(st.getField("cur") > 0 && st.getField("cur") === st.getField("top"),
            greatest(st.getField("topg"), st.getField("prev")))
          .otherwise(st.getField("topg"))
      def newDup(st: Column) =
        when(st.getField("cur") > 1,
          st.getField("dup") + st.getField("cur") * length(st.getField("prev")))
          .otherwise(st.getField("dup"))
      val ref = aggregate(sorted, z,
        (st, e) => when(
          st.getField("cur") > 0 && st.getField("prevh") === e.getField("h")
            && st.getField("prev") === e.getField("g"),
          struct(e.getField("h").as("prevh"), e.getField("g").as("prev"),
            (st.getField("cur") + 1).as("cur"),
            st.getField("top").as("top"), st.getField("topg").as("topg"),
            st.getField("dup").as("dup")))
        .otherwise(
          struct(e.getField("h").as("prevh"), e.getField("g").as("prev"),
            lit(1L).as("cur"),
            newTop(st).as("top"), newTopg(st).as("topg"), newDup(st).as("dup"))),
        st => struct(newTop(st).as("top"), newTopg(st).as("topg"),
          newDup(st).as("dup")))
      val bad = docs.select(
          TextExpressions.ngramRepetitionOf(grams).as("fused"), ref.as("ref"))
        .filter(not(col("fused") <=> col("ref")))
      assert(bad.count() == 0, s"n=$n mismatch")
    }
  }

  test("graft_double_order_bits: signed key order == double order, both eval paths") {
    val battery = Seq(Double.NegativeInfinity, -1.7e308, -42.0, -1.0,
      -java.lang.Double.MIN_VALUE, -0.0, 0.0, java.lang.Double.MIN_VALUE,
      0.5, 1.0, 42.0, 42.0 + 1e-13, 1.7e308, Double.PositiveInfinity, Double.NaN)
    // codegen path: keys of the sorted battery must be strictly increasing
    // except for -0.0/0.0 (distinct bits, adjacent keys — both orderings
    // of the pair are consistent with double ordering)
    val keys = battery.toDF("v")
      .select(VectorExpressions.doubleOrderBits(col("v")).as("k"))
      .collect().map(_.getLong(0))
    keys.sliding(2).foreach { case Array(a, b) => assert(a < b, s"$a !< $b") }
    // interpreted path agrees with the closed form
    battery.foreach { v =>
      val e = VectorExpressions.DoubleOrderBits(
        org.apache.spark.sql.graft.ColumnBridge.expr(lit(v)))
      val bits = java.lang.Double.doubleToLongBits(v)
      assert(e.eval(null) == (bits ^ ((bits >> 63) & Long.MaxValue)))
    }
  }

  test("spaceSavingTopK exact regime == groupBy count, partition-order invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val keys = (1 to 2000).map(_ => s"k${rnd.nextInt(40)}")
    val expected = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(3, 7)) {
      val out = keys.toDF("k").repartition(parts)
        .agg(SketchAggregates.spaceSavingTopK(col("k"), capacity = 64).as("sk"))
        .select(explode(col("sk")).as("e"))
        .select(col("e.term"), col("e.count"), col("e.err"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(out.length == expected.size, s"parts=$parts")
      out.foreach { case (t, c, err) =>
        assert(c == expected(t) && err == 0L, s"parts=$parts term=$t")
      }
      // output order is the documented (count desc, term asc)
      assert(out.sortBy { case (t, c, _) => (-c, t) }.toSeq == out.toSeq)
    }
  }

  test("spaceSavingTopK eviction regime: Space-Saving bounds hold, heavy keys survive") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    // zipf-ish: a few heavy keys + a long tail, forcing eviction at cap 8
    val keys = (1 to 600).map { _ =>
      val r = rnd.nextInt(100)
      if (r < 35) "heavy1" else if (r < 60) "heavy2" else if (r < 75) "heavy3"
      else s"tail${rnd.nextInt(200)}"
    }
    val truth = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cap = 8
    val out = keys.toDF("k").repartition(5)
      .agg(SketchAggregates.spaceSavingTopK(col("k"), cap).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.term"), col("e.count"), col("e.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.length == cap)
    out.foreach { case (t, est, err) =>
      val tru = truth.getOrElse(t, 0L)
      assert(est >= tru, s"$t: est $est < true $tru (must overcount)")
      assert(est - err <= tru, s"$t: est-err ${est - err} > true $tru")
    }
    // every key with true count > N/capacity must be in the summary
    val n = keys.size
    truth.filter(_._2 > n.toLong / cap).keys.foreach { hk =>
      assert(out.exists(_._1 == hk), s"heavy key $hk missing from summary")
    }
  }

  test("spaceSavingTopK in a streaming aggregation == the batch sketch") {
    // the governance summary as a live stream: the TypedImperativeAggregate
    // rides Structured Streaming's complete-mode aggregation state —
    // batch ≡ streaming, the house discipline
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(31)
    val keys = (1 to 500).map(_ => s"k${rnd.nextInt(30)}")
    val ms = MemoryStream[String]
    keys.grouped(120).foreach(b => ms.addData(b: _*)) // several micro-batches
    val q = ms.toDF().toDF("k")
      .agg(SketchAggregates.spaceSavingTopK(col("k"), capacity = 64).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.term"), col("e.count"), col("e.err"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("ss_stream").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("ss_stream")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    val batch = keys.toDF("k")
      .agg(SketchAggregates.spaceSavingTopK(col("k"), capacity = 64).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.term"), col("e.count"), col("e.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    assert(streamed.toSeq == batch.toSeq)
  }

  // -- quantile sketch ----------------------------------------------------

  private def sketchRows(df: org.apache.spark.sql.DataFrame, skCol: String)
      : (Seq[(Double, Long)], Boolean) = {
    val r = df.select(col(s"$skCol.items"), col(s"$skCol.exact")).head
    val items = r.getSeq[org.apache.spark.sql.Row](0)
      .map(x => (x.getDouble(0), x.getLong(1)))
    (items, r.getBoolean(1))
  }

  test("quantileSketch exact regime == quantile_cont formula, partition-order invariant") {
    import graft.functions.QuantileSketches
    val rnd = new scala.util.Random(7)
    val data = (1 to 800).map(_ => math.rint(rnd.nextDouble() * 1e6) / 1e3)
    val sorted = data.sorted
    val probs = Seq(0.0, 0.25, 0.5, 0.9, 0.99, 1.0)
    def refQ(p: Double): Double = {
      val h = (data.size - 1) * p
      val lo = math.floor(h).toInt
      val hi = math.ceil(h).toInt
      if (lo == hi) sorted(lo) else sorted(lo) + (h - lo) * (sorted(hi) - sorted(lo))
    }
    for (parts <- Seq(3, 7)) {
      val agg = data.toDF("v").repartition(parts)
        .agg(QuantileSketches.quantileSketch(col("v"), 1024).as("sk"))
      val (items, exact) = sketchRows(agg, "sk")
      assert(exact, s"parts=$parts: exact flag must hold below capacity")
      assert(items.map(_._1) == sorted, s"parts=$parts: summary IS the sorted multiset")
      assert(items.forall(_._2 == 1L))
      val got = agg.select(
          QuantileSketches.sketchQuantiles(col("sk"), probs).as("q"))
        .head.getSeq[Double](0)
      probs.zip(got).foreach { case (p, v) =>
        assert(v == refQ(p), s"parts=$parts p=$p: $v != ${refQ(p)}")
      }
    }
  }

  test("quantileSketch compaction regime: weight preserved, rank-error bound holds") {
    import graft.functions.QuantileSketches
    val rnd = new scala.util.Random(13)
    val n = 5000
    val data = (1 to n).map(_ => rnd.nextDouble() * 1000.0)
    val sorted = data.sorted
    val k = 32
    val agg = data.toDF("v").repartition(6)
      .agg(QuantileSketches.quantileSketch(col("v"), k).as("sk"))
    val (items, exact) = sketchRows(agg, "sk")
    assert(!exact, "n >> k must force compaction")
    assert(items.map(_._2).sum == n.toLong, "total weight must equal n")
    assert(items.size < n / 4, "summary must actually be compact")
    // documented bound: any rank perturbed by <= levels * n / (2k)
    val levels = items.map(_._2).max.toDouble
    val bound = (math.log(levels) / math.log(2) + 1.0) * n / (2.0 * k) + 1.0
    val probs = Seq(0.05, 0.25, 0.5, 0.75, 0.95)
    val got = agg.select(
        QuantileSketches.sketchQuantiles(col("sk"), probs).as("q"))
      .head.getSeq[Double](0)
    probs.zip(got).foreach { case (p, v) =>
      val h = (n - 1) * p
      val rankLo = sorted.count(_ < v)
      val rankHi = sorted.count(_ <= v)
      val err = math.max(rankLo - h, h - rankHi).max(0.0)
      assert(err <= bound, s"p=$p: rank error $err > bound $bound")
    }
  }

  test("quantileSketchMerge of exact partials is bit-identical to the direct sketch") {
    import graft.functions.QuantileSketches
    val rnd = new scala.util.Random(17)
    val data = (1 to 600).map(i => (s"g${i % 3}", math.rint(rnd.nextDouble() * 1e5) / 100.0))
    val df = data.toDF("slice", "v")
    // partials per slice (each exact at k=1024), persisted and re-read —
    // the sketch-rollup store round trip
    val tmp = java.nio.file.Files.createTempDirectory("qsketch-spec").toString
    df.groupBy("slice")
      .agg(QuantileSketches.quantileSketch(col("v"), 1024).as("sk"))
      .write.mode("overwrite").parquet(tmp)
    val merged = spark.read.parquet(tmp)
      .agg(QuantileSketches.quantileSketchMerge(col("sk"), 1024).as("sk"))
    val direct = df.agg(QuantileSketches.quantileSketch(col("v"), 1024).as("sk"))
    val (mItems, mExact) = sketchRows(merged, "sk")
    val (dItems, dExact) = sketchRows(direct, "sk")
    assert(mExact && dExact)
    assert(mItems == dItems, "merged persisted partials != direct sketch")
    // and in the compaction regime the merged bounds still hold
    val k = 16
    df.groupBy("slice")
      .agg(QuantileSketches.quantileSketch(col("v"), k).as("sk"))
      .write.mode("overwrite").parquet(tmp)
    val mc = spark.read.parquet(tmp)
      .agg(QuantileSketches.quantileSketchMerge(col("sk"), k).as("sk"))
    val (mcItems, mcExact) = sketchRows(mc, "sk")
    assert(!mcExact)
    assert(mcItems.map(_._2).sum == data.size.toLong)
  }

  test("quantileSketch in a streaming aggregation == the batch sketch") {
    import graft.functions.QuantileSketches
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(19)
    val vals = (1 to 500).map(_ => math.rint(rnd.nextDouble() * 1e4) / 10.0)
    val ms = MemoryStream[Double]
    vals.grouped(120).foreach(b => ms.addData(b: _*))
    val q = ms.toDF().toDF("v")
      .agg(QuantileSketches.quantileSketch(col("v"), 1024).as("sk"))
      .select(QuantileSketches.sketchQuantiles(col("sk"), Seq(0.5, 0.9)).as("q"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("qs_stream").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("qs_stream").head.getSeq[Double](0)
    val batch = vals.toDF("v")
      .agg(QuantileSketches.quantileSketch(col("v"), 1024).as("sk"))
      .select(QuantileSketches.sketchQuantiles(col("sk"), Seq(0.5, 0.9)).as("q"))
      .head.getSeq[Double](0)
    assert(streamed == batch)
  }

  test("quantile sketch SQL surface + interpreted extraction path") {
    import graft.functions.QuantileSketches
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_sketch_quantiles(
        |  graft_quantile_sketch(CAST(v AS DOUBLE), 64), array(0.0D, 0.5D, 1.0D)) AS q
        |FROM VALUES (1), (2), (3), (4), (5) t(v)""".stripMargin)
      .head.getSeq[Double](0)
    assert(r == Seq(1.0, 3.0, 5.0))
    val m = spark.sql(
      """WITH p AS (
        |  SELECT v % 2 AS g, graft_quantile_sketch(CAST(v AS DOUBLE), 64) AS sk
        |  FROM VALUES (1), (2), (3), (4) t(v) GROUP BY v % 2)
        |SELECT graft_sketch_quantiles(graft_quantile_merge(sk, 64), array(0.5D)) AS q
        |FROM p""".stripMargin).head.getSeq[Double](0)
    assert(m == Seq(2.5))
    // interpreted path: the shared static body on a hand-built summary
    val row = org.apache.spark.sql.catalyst.InternalRow(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(
        org.apache.spark.sql.catalyst.InternalRow(10.0, 1L),
        org.apache.spark.sql.catalyst.InternalRow(20.0, 2L),
        org.apache.spark.sql.catalyst.InternalRow(30.0, 1L))),
      true)
    // virtual rows: 10, 20, 20, 30 -> p=0.5 at h=1.5 -> 20.0
    val got = QuantileSketches.quantilesOf(row, Array(0.0, 0.5, 1.0))
    assert(got.toDoubleArray().toSeq == Seq(10.0, 20.0, 30.0))
    assert(QuantileSketches.quantilesOf(
      org.apache.spark.sql.catalyst.InternalRow(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any]),
        true), Array(0.5)) == null)
  }

  test("SQL surface: bad literal args are analysis errors naming the function, not CCE/NPE") {
    GraftExtensions.register(spark)
    def analysisMsg(sql: String): String =
      intercept[org.apache.spark.sql.AnalysisException](spark.sql(sql).collect()).getMessage
    // non-foldable capacity/k
    assert(analysisMsg(
      "SELECT graft_space_saving_topk(v, v) FROM VALUES (1) t(v)")
      .contains("graft_space_saving_topk"))
    assert(analysisMsg(
      "SELECT graft_quantile_sketch(CAST(v AS DOUBLE), v) FROM VALUES (1) t(v)")
      .contains("graft_quantile_sketch"))
    // wrong-typed literals
    assert(analysisMsg(
      "SELECT graft_quantile_sketch(CAST(v AS DOUBLE), 'big') FROM VALUES (1) t(v)")
      .contains("graft_quantile_sketch"))
    assert(analysisMsg(
      """SELECT graft_sketch_quantiles(
        |  graft_quantile_sketch(CAST(v AS DOUBLE), 64), array('a', 'b'))
        |FROM VALUES (1) t(v)""".stripMargin)
      .contains("graft_sketch_quantiles"))
    // decimal probs literal (array(0.5, 1) parses as decimal) WIDENS,
    // not crashes — the advice-noted case
    val q = spark.sql(
      """SELECT graft_sketch_quantiles(
        |  graft_quantile_sketch(CAST(v AS DOUBLE), 64), array(0.5, 1)) AS q
        |FROM VALUES (1), (2), (3) t(v)""".stripMargin).head.getSeq[Double](0)
    assert(q == Seq(2.0, 3.0))
    // BIGINT literal k within int range widens too
    assert(spark.sql(
      """SELECT graft_sketch_quantiles(
        |  graft_quantile_sketch(CAST(v AS DOUBLE), CAST(64 AS BIGINT)), array(0.5D)) AS q
        |FROM VALUES (1), (2), (3) t(v)""".stripMargin).head.getSeq[Double](0) == Seq(2.0))
  }

  test("null tokens: word-ngram kernel drops null-component grams == the zip_with reference; repetition fold ignores null grams") {
    import graft.functions.TextExpressions
    val docs = Seq(
      (1L, Seq[String]("a", null, "b")),
      (2L, Seq[String]("a", "b", null, "c", "d")),
      (3L, Seq[String](null, null)),
      (4L, Seq[String]("x", "y", "z"))).toDF("id", "toks")
    for (n <- Seq(2, 3)) {
      val toks = col("toks")
      val joined = (2 to n).foldLeft(toks) { (acc, k) =>
        zip_with(acc, when(size(toks) >= k, slice(toks, lit(k), size(toks)))
            .otherwise(array().cast("array<string>")),
          (a, b) => concat(a, lit(" "), b))
      }
      val ref = filter(joined, g => g.isNotNull)
      val bad = docs.select(TextExpressions.wordNgramsOf(toks, n).as("fused"),
          ref.as("r"))
        .filter(not(col("fused") <=> col("r")))
      assert(bad.count() == 0, s"n=$n null-token mismatch vs reference")
    }
    // the repetition fold must not NPE on null grams and must count
    // only the non-null ones
    val withNulls = Seq(Seq[String]("g", null, "g", null)).toDF("grams")
      .select(graft.functions.TextExpressions
        .ngramRepetitionOf(col("grams")).as("st"))
      .select(col("st.top"), col("st.topg"), col("st.dup")).head
    assert(withNulls.getLong(0) == 2L && withNulls.getString(1) == "g" &&
      withNulls.getLong(2) == 2L)
  }

  test("SQL surface: wrong arity and value-constraint violations are analysis errors naming the function") {
    GraftExtensions.register(spark)
    def analysisMsg(sql: String): String =
      intercept[org.apache.spark.sql.AnalysisException](spark.sql(sql).collect()).getMessage
    assert(analysisMsg("SELECT graft_dot(array(1.0F))").contains("graft_dot"))
    assert(analysisMsg(
      "SELECT graft_word_ngrams(array('a'), 2, 3) FROM VALUES (1) t(v)")
      .contains("graft_word_ngrams"))
    // odd k violates the sketch's constructor require
    assert(analysisMsg(
      "SELECT graft_quantile_sketch(CAST(v AS DOUBLE), 3) FROM VALUES (1) t(v)")
      .contains("graft_quantile_sketch"))
    assert(analysisMsg(
      "SELECT graft_space_saving_topk(CAST(v AS STRING), 0) FROM VALUES (1) t(v)")
      .contains("graft_space_saving_topk"))
    // round-11 functions: arity + non-positive k
    assert(analysisMsg("SELECT graft_html_blocks('a', 'b')")
      .contains("graft_html_blocks"))
    assert(analysisMsg(
      "SELECT graft_bounded_topk(CAST(v AS DOUBLE), 't', 0) FROM VALUES (1) t(v)")
      .contains("graft_bounded_topk"))
    // integer VALUE columns widen implicitly (the approx_percentile
    // convention) — no manual CAST needed at the SQL surface
    assert(spark.sql(
      """SELECT graft_sketch_quantiles(graft_quantile_sketch(v, 64), array(0.5D)) AS q
        |FROM VALUES (1), (2), (3) t(v)""".stripMargin).head.getSeq[Double](0)
      == Seq(2.0))
  }

  test("spaceSavingTopK orders ties in BINARY term order (supplementary chars)") {
    import graft.functions.SketchAggregates
    // U+E000 (UTF-8 0xEE..) sorts BEFORE U+10000 (UTF-8 0xF0..) in
    // binary order, but AFTER it in Java's UTF-16 code-unit order
    // (U+10000 encodes as the 0xD800 surrogate) — the sketch must agree
    // with Spark/DuckDB binary order, not java.lang.String
    val hi = "𐀀" // U+10000
    val lo = ""
    val rows = Seq(hi, lo, hi, lo).toDF("t")
    val out = rows.agg(SketchAggregates.spaceSavingTopK(col("t"), 8).as("s"))
      .selectExpr("s[0].term AS first", "s[1].term AS second").head
    assert(out.getString(0) == lo && out.getString(1) == hi,
      "tie order must be binary (UTF-8) term order")
    // and Spark's own sort agrees
    val sparkOrder = rows.distinct().orderBy("t").as[String].collect().toSeq
    assert(sparkOrder == Seq(lo, hi))
  }

  test("quantileSketch boundary: exactly k values per path stays exact") {
    import graft.functions.QuantileSketches
    val k = 64
    // one partition holding exactly k rows: the compaction trigger is
    // STRICTLY over capacity, so this is still the exact regime
    val df = spark.range(0, k, 1, 1).selectExpr("CAST(id AS DOUBLE) AS v")
      .agg(QuantileSketches.quantileSketch(col("v"), k).as("sk"))
      .select(col("sk.exact").as("exact"),
        QuantileSketches.sketchQuantiles(col("sk"), Seq(0.0, 0.5, 1.0)).as("q"))
    val row = df.head
    assert(row.getBoolean(0), s"exactly $k items must not compact")
    assert(row.getSeq[Double](1) == Seq(0.0, (k - 1) / 2.0, (k - 1).toDouble))
  }

  private def Tables_embeddings() =
    graft.store.Tables.embeddings(spark, "/root/testdata/sf0.001")
}
