package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.ext.Dsir

/** DSIR importance weights: equality against a pure-Scala reference of
  * the same hashed-ngram math, the planted domain-fit signal, the
  * unseen-bucket smoothing path, and partition-order invariance. */
class DsirSpec extends SparkTestBase {
  import spark.implicits._

  // the reference implementation: same tokenization, same md5-prefix
  // bucketing, same add-one smoothing, 9-decimal HALF_UP rounds summed
  // exactly — what Dsir.fit/weights must reproduce distributed
  private def refGrams(text: String): Seq[String] = {
    val w = text.trim.toLowerCase.split("\\s+").toSeq
    w ++ w.sliding(2).filter(_.size == 2).map(_.mkString(" "))
  }
  private def bkt(g: String): String =
    MessageDigest.getInstance("MD5").digest(g.getBytes("UTF-8"))
      .take(2).map("%02x".format(_)).mkString

  private def refWeights(raw: Seq[(Long, String)], target: Seq[String],
      scored: Seq[(Long, String)]): Map[Long, BigDecimal] = {
    val tb = target.flatMap(refGrams).map(bkt)
    val rb = raw.flatMap { case (_, t) => refGrams(t) }.map(bkt)
    val (tc, rc) = (tb.groupBy(identity).view.mapValues(_.size.toLong).toMap,
      rb.groupBy(identity).view.mapValues(_.size.toLong).toMap)
    val (nt, nr) = (tb.size.toDouble, rb.size.toDouble)
    def lr(b: String): BigDecimal = BigDecimal(
      math.log(((tc.getOrElse(b, 0L) + 1.0) * (nr + 65536.0)) /
               ((rc.getOrElse(b, 0L) + 1.0) * (nt + 65536.0))))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    scored.map { case (id, t) =>
      id -> refGrams(t).map(g => lr(bkt(g))).sum
    }.toMap
  }

  private val target = Seq("alpha beta gamma delta", "alpha beta retrieval corpus")
  private val raw = Seq(
    (1L, "alpha beta gamma text"),
    (2L, "unrelated noise tokens here"),
    (3L, "alpha beta retrieval"),
    (4L, "zzz yyy xxx www vvv"))

  test("weights == the pure-Scala reference, exactly") {
    val model = Dsir.fit(raw.toDF("id", "text"), target.map(Tuple1(_)).toDF("text"), "text")
    val got = Dsir.weights(model, raw.toDF("id", "text"), "id", "text")
      .select(col("id"), col("weight_dec"))
      .as[(Long, java.math.BigDecimal)].collect().toMap
    val want = refWeights(raw, target, raw)
    assert(got.keySet == want.keySet)
    got.foreach { case (id, w) =>
      assert(BigDecimal(w) == want(id), s"doc $id") }
  }

  test("domain fit: target-echoing docs outscore unrelated docs per gram") {
    val model = Dsir.fit(raw.toDF("id", "text"), target.map(Tuple1(_)).toDF("text"), "text")
    val s = Dsir.scored(model, raw.toDF("id", "text"), "id", "text")
      .select(col("id"), col("dsir_score")).as[(Long, Double)].collect().toMap
    assert(s(1L) > s(2L) && s(3L) > s(2L))
    assert(s(1L) > s(4L) && s(3L) > s(4L))
  }

  test("unseen buckets score the exact smoothed default, not a silent skip") {
    val model = Dsir.fit(raw.toDF("id", "text"), target.map(Tuple1(_)).toDF("text"), "text")
    // a doc whose grams the raw corpus never produced
    val novel = Seq((9L, "qqq ppp")).toDF("id", "text")
    val got = Dsir.weights(model, novel, "id", "text")
      .select(col("id"), col("n_grams"), col("weight_dec"))
      .as[(Long, Long, java.math.BigDecimal)].collect().head
    assert(got._2 == 3L) // qqq, ppp, "qqq ppp"
    val want = refWeights(raw, target, Seq((9L, "qqq ppp")))(9L)
    assert(BigDecimal(got._3) == want)
  }

  test("grams: single-token doc emits only the unigram (no descending-sequence bigram)") {
    val g = Seq(Tuple1("solo")).toDF("text")
      .select(Dsir.grams(col("text")).as("g")).as[Seq[String]].collect().head
    assert(g == Seq("solo"))
  }

  test("model is metadata-sized and weights are partition-order invariant") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.store.Tables.documents(spark, dir)
    val model = Dsir.fit(docs, docs.filter(col("source") === "src0"), "text")
    assert(model.ratios.count() <= 65536L && model.stats.count() == 1L)
    val a = Dsir.weights(model, docs, "doc_id", "text")
      .as[(Long, Long, java.math.BigDecimal)].collect().toSet
    val b = Dsir.weights(model, docs.repartition(7, col("lang")), "doc_id", "text")
      .as[(Long, Long, java.math.BigDecimal)].collect().toSet
    assert(a.nonEmpty && a == b)
  }
}
