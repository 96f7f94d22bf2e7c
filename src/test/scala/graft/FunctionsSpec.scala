package graft

import org.apache.spark.sql.functions._

import graft.functions.{GraftExtensions, VectorExpressions}

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

  private def Tables_embeddings() =
    graft.store.Tables.embeddings(spark, "/root/testdata/sf0.001")
}
