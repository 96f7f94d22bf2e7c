package graft

import org.apache.spark.sql.functions._

import graft.ext.QualityClassifier
import graft.store.Tables

/** Hashed-feature logistic regression: the model separates a learnable
  * label on real corpus text, training is partition-order invariant
  * (decimal-summed gradients), and the scale contract holds (weights ≤
  * dim, scoring = one broadcast join). */
class QualityClassifierSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  /** Label derivable from token counts (the corpus's `lang` column is
    * assigned independently of the text, so it is unlearnable by
    * construction — any text classifier would flatline at the base
    * rate). A count-comparison label is linearly separable in the
    * L1-normalized bag-of-words, so the trainer must recover it. */
  private def labeled = {
    val t = split(trim(lower(col("text"))), "\\s+")
    Tables.documents(spark, dir).withColumn("y",
      (size(filter(t, x => x === "data")) > size(filter(t, x => x === "the")))
        .cast("int"))
  }

  test("learns a token-count label from text; holdout accuracy ≥ 0.8") {
    val docs = labeled
    val train = docs.filter(col("doc_id") % 5 =!= 0)
    val test = docs.filter(col("doc_id") % 5 === 0)
    val base = test.agg(avg(col("y"))).as[Double].collect().head
    assert(base > 0.2 && base < 0.8, s"label must be non-degenerate (got $base)")
    val m = QualityClassifier.train(train, "doc_id", "text", "y",
      dim = 1024, iters = 60, lr = 200.0, lrIntercept = 1.0)
    assert(m.weights.size <= 1024)
    val scored = QualityClassifier.score(test, m, "doc_id", "text")
      .join(test.select(col("doc_id"), col("y")), "doc_id")
      .select((col("score") > 0.5).cast("int").as("pred"), col("y"))
      .as[(Int, Int)].collect()
    val acc = scored.count { case (p, y) => p == y }.toDouble / scored.length
    assert(acc >= 0.8, s"holdout accuracy $acc on ${scored.length} docs (base rate $base)")
  }

  test("training is partition-order invariant: repartitioned input → identical model") {
    val docs = Tables.documents(spark, dir)
      .withColumn("y", (col("lang") === "en").cast("int"))
      .filter(col("doc_id") < 200)
    val m1 = QualityClassifier.train(docs, "doc_id", "text", "y",
      dim = 256, iters = 5, lr = 1.0)
    val m2 = QualityClassifier.train(docs.repartition(17), "doc_id", "text", "y",
      dim = 256, iters = 5, lr = 1.0)
    assert(m1.intercept == m2.intercept)
    assert(m1.weights == m2.weights)
  }

  test("filterByScore keeps exactly the ≥-threshold docs") {
    val docs = Tables.documents(spark, dir)
      .withColumn("y", (col("lang") === "en").cast("int"))
    val m = QualityClassifier.train(docs.filter(col("doc_id") < 300),
      "doc_id", "text", "y", dim = 512, iters = 20, lr = 2.0)
    val scores = QualityClassifier.score(docs, m, "doc_id", "text")
      .as[(Long, Double)].collect().toMap
    val kept = QualityClassifier.filterByScore(docs, m, "doc_id", "text", 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == scores.filter(_._2 >= 0.5).keySet)
  }

  test("L1-normalized features: duplicated text scores identically") {
    val docs = Seq((1L, "hash join scan filter"), (2L, "hash join scan filter " * 4))
      .toDF("doc_id", "text")
    val m = graft.ext.QualityClassifier.Model(64, 0.1,
      Map(0 -> 0.3, 1 -> -0.2, 5 -> 1.0, 17 -> -0.4))
    val s = QualityClassifier.score(docs, m, "doc_id", "text")
      .as[(Long, Double)].collect().toMap
    assert(math.abs(s(1L) - s(2L)) < 1e-12)
  }
}
