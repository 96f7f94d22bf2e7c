package graft

import org.apache.spark.sql.functions._

import graft.ext.Retrieval

/** BM25 retrieval: hand-checked scores on a tiny corpus, ranking
  * sanity (term frequency up, document length down, rare terms weigh
  * more), and decimal-sum order independence. */
class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark catalyst optimizer rules"),
    (2L, "spark spark spark streaming"),
    (3L, "duckdb vectorized execution engine with many extra words padding length"),
    (4L, "catalyst expression codegen")).toDF("id", "text")

  test("postings and doc lengths are exact") {
    val p = Retrieval.postings(corpus, "id", "text")
      .as[(String, Long, Double)].collect().toSet
    assert(p.contains(("spark", 2L, 3.0)))
    assert(p.contains(("catalyst", 1L, 1.0)))
    val dl = Retrieval.docLengths(corpus, "id", "text")
      .as[(Long, Double)].collect().toMap
    assert(dl == Map(1L -> 4.0, 2L -> 4.0, 3L -> 10.0, 4L -> 3.0))
  }

  test("bm25 matches the closed form on a single-term query") {
    // term "catalyst": df=2, N=4, avgdl=(4+4+10+3)/4=5.25
    val idf = math.log((4.0 - 2 + 0.5) / (2 + 0.5) + 1.0)
    def cf(tf: Double, dl: Double): Double =
      BigDecimal(idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / 5.25)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Retrieval.bm25TopK(corpus, "id", "text", Seq("catalyst"), k = 10)
      .as[(Long, Double)].collect().toMap
    assert(got.keySet == Set(1L, 4L))
    assert(math.abs(got(1L) - BigDecimal(cf(1, 4)).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    // shorter doc 4 outranks doc 1 at equal tf
    assert(got(4L) > got(1L))
  }

  test("ranking: higher tf wins; rare term outweighs common term") {
    val top = Retrieval.bm25TopK(corpus, "id", "text", Seq("spark"), k = 1)
      .as[(Long, Double)].collect()
    assert(top.head._1 == 2L, "tf=3 doc must rank first")
    // "duckdb" (df=1) must contribute more than "spark" (df=2) at tf=1, same doc length
    val both = Retrieval.bm25(corpus, "id", "text", Seq("spark", "duckdb"))
      .withColumn("score", col("score_dec").cast("double"))
      .select("id", "score").as[(Long, Double)].collect().toMap
    assert(both(3L) > both(1L))
  }

  test("plan: the query-term filter is pushed below the postings aggregate") {
    // at 100 TB this is the difference between scanning 3 terms'
    // postings and aggregating the whole corpus: Catalyst's
    // PushDownPredicates moves `term IN (...)` (a grouping column)
    // under both the tf and df aggregates, directly above the explode;
    // the corpus stats side rides a broadcast hint
    val docs = graft.store.Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = Retrieval.bm25(docs, "doc_id", "text", Seq("data", "dup"))
      .queryExecution.optimizedPlan.toString
    val pushed = "IN \\(data,dup\\)".r.findAllIn(plan).length
    assert(pushed >= 2, s"expected the term filter below both aggregates:\n$plan")
    assert(plan.contains("strategy=broadcast"), "stats row should broadcast")
  }

  test("decimal contributions: repartitioned corpus returns identical scores and order") {
    val docs = graft.store.Tables.documents(spark, "/root/testdata/sf0.001")
    val q = Seq("data", "dup", "spark")
    val a = Retrieval.bm25TopK(docs, "doc_id", "text", q, 25)
      .as[(Long, Double)].collect().toSeq
    val b = Retrieval.bm25TopK(docs.repartition(13), "doc_id", "text", q, 25)
      .as[(Long, Double)].collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }
}
