package graft

import org.apache.spark.sql.functions._

import graft.ext.LangModel

/** n-gram-LM perplexity scoring: hand-checked probabilities on a tiny
  * corpus at n=2 and n=3, the CCNet band-filter behavior
  * (in-distribution text scores lower than out-of-distribution), and
  * edge discipline. */
class LangModelSpec extends SparkTestBase {
  import spark.implicits._

  test("bigrams: guarded explode emits nothing for 0/1-token docs") {
    val df = Seq((1L, "a b c"), (2L, "solo"), (3L, ""), (4L, "  x  y  "))
      .toDF("id", "text")
    val out = LangModel.bigrams(df, "id", "text")
      .as[(Long, String, String)].collect().toSet
    assert(out == Set((1L, "a", "b"), (1L, "b", "c"), (4L, "x", "y")))
  }

  test("score matches the closed-form add-α probability on a hand corpus") {
    // corpus: "a b", "a b", "a c" → c(a)=3 (as context), V={a,b,c}=3
    val ref = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("id", "text")
    val m = LangModel.train(ref, "id", "text")
    assert(m.vocabSize == 3L)
    // P(b|a) = (2+0.1)/(3+0.1*3) = 2.1/3.3 ; doc "a b" has one bigram
    val scored = LangModel.score(Seq((9L, "a b")).toDF("id", "text"), m, "id", "text")
      .select("n_grams", "avg_nll").as[(Long, Double)].collect().head
    val expected = BigDecimal(-math.log(2.1 / 3.3))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(scored._1 == 1L)
    assert(math.abs(scored._2 - expected) < 1e-9, s"got ${scored._2}, want $expected")
  }

  test("unseen bigram in a seen context is penalized; unseen context backs off to uniform 1/V") {
    // ref bigrams: (a,b)×2, (b,a)×2, (a,c); V = {a,b,c} = 3
    val ref = Seq((1L, "a b a b a c")).toDF("id", "text")
    val m = LangModel.train(ref, "id", "text")
    val docs = Seq((1L, "a b"), (2L, "a z"), (3L, "q z")).toDF("id", "text")
    val s = LangModel.score(docs, m, "id", "text")
      .select("id", "avg_nll").as[(Long, Double)].collect().toMap
    // P(b|a)=(2+0.1)/(3+0.3)≈0.64 < P=α/(c(a)+αV)≈0.03 for (a,z);
    // unseen context q → exactly uniform α/(αV)=1/V≈0.33
    assert(s(1L) < s(3L), "seen bigram beats the uniform backoff")
    assert(s(3L) < s(2L), "uniform backoff beats an unseen word in a strong context")
    val uniform = BigDecimal(-math.log(1.0 / 3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(s(3L) - uniform) < 1e-6)
  }

  test("perplexityFilter keeps the low-ppl band and (by default) unscored docs") {
    val ref = (1L to 50L).map(i => (i, "the quick brown fox jumps over the lazy dog"))
      .toDF("id", "text")
    val m = LangModel.train(ref, "id", "text")
    val docs = Seq(
      (1L, "the quick brown fox jumps"),   // in-distribution
      (2L, "zebra xylophone quantum jazz waffles"), // OOD
      (3L, "solo")).toDF("id", "text")     // unscoreable (no bigram)
    val scored = LangModel.score(docs, m, "id", "text")
      .select("id", "ppl").as[(Long, Double)].collect().toMap
    assert(scored(1L) < scored(2L))
    val kept = LangModel.perplexityFilter(docs, m, "id", "text",
        maxPpl = (scored(1L) + scored(2L)) / 2)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
    val strict = LangModel.perplexityFilter(docs, m, "id", "text",
        maxPpl = (scored(1L) + scored(2L)) / 2, keepUnscored = false)
      .select("id").as[Long].collect().toSet
    assert(strict == Set(1L))
  }

  test("perplexitySplit: tercile buckets ordered by ppl, unscored isolated, fractions respected") {
    val docs = graft.store.Tables.documents(spark, "/root/testdata/sf0.001")
    val m = LangModel.train(docs, "doc_id", "text")
    val withShort = docs.select(col("doc_id"), col("text"))
      .union(Seq((9001L, "solo")).toDF("doc_id", "text")) // unscoreable
    val split = LangModel.perplexitySplit(withShort, m, "doc_id", "text")
      .as[(Long, Option[Double], String)].collect()
    val byBucket = split.groupBy(_._3).view.mapValues(_.toSeq).toMap
    assert(byBucket("unscored").map(_._1) == Seq(9001L))
    // every head ppl ≤ every middle ppl ≤ every tail ppl
    def ppls(b: String) = byBucket(b).flatMap(_._2)
    assert(ppls("head").max <= ppls("middle").min)
    assert(ppls("middle").max <= ppls("tail").min)
    // terciles: head holds ≥ a third of scored docs (ties may spill in),
    // tail ≤ a third (strict > on the upper threshold)
    val n = split.count(_._3 != "unscored")
    assert(ppls("head").size >= n / 3, s"head ${ppls("head").size} of $n")
    assert(ppls("tail").size <= n / 3 + 1, s"tail ${ppls("tail").size} of $n")
  }

  test("trigram model (n=3) matches closed-form add-α probabilities") {
    // ref trigrams: (a b → c), (a b → d); ctx (a,b) count 2;
    // V = {a,b,c,d} = 4
    val ref = Seq((1L, "a b c"), (2L, "a b d")).toDF("id", "text")
    val m = LangModel.train(ref, "id", "text", n = 3)
    assert(m.n == 3 && m.vocabSize == 4L)
    val docs = Seq(
      (1L, "a b c"),   // seen trigram: P(c|a b) = (1+0.1)/(2+0.1·4)
      (2L, "a b z"),   // unseen word, seen context: 0.1/2.4
      (3L, "q r s"),   // unseen context: uniform 0.1/(0.1·4) = 1/4
      (4L, "a b")).toDF("id", "text") // shorter than n → unscored
    val s = LangModel.score(docs, m, "id", "text")
      .select("id", "avg_nll").as[(Long, Double)].collect().toMap
    def nll(p: Double) = BigDecimal(-BigDecimal(math.log(p))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(s(1L) - nll(1.1 / 2.4)) < 1e-9, s"seen: ${s(1L)}")
    assert(math.abs(s(2L) - nll(0.1 / 2.4)) < 1e-9, s"unseen w: ${s(2L)}")
    assert(math.abs(s(3L) - nll(0.25)) < 1e-9, s"unseen ctx: ${s(3L)}")
    assert(!s.contains(4L), "sub-n documents must contribute no score row")
  }

  test("decimal term sums are order-independent: repartitioned corpus scores identically") {
    val docs = graft.store.Tables.documents(spark, "/root/testdata/sf0.001")
    val m = LangModel.train(docs, "doc_id", "text")
    val a = LangModel.score(docs, m, "doc_id", "text")
      .select("doc_id", "avg_nll").as[(Long, Double)].collect().toMap
    val b = LangModel.score(docs.repartition(17), m, "doc_id", "text")
      .select("doc_id", "avg_nll").as[(Long, Double)].collect().toMap
    assert(a == b)
  }
}
