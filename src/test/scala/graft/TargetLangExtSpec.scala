package graft

import org.apache.spark.sql.functions._

import graft.dsl.TargetLang

/** Round-5 target-function surface: sorters, name surgery, generators,
  * aggregation variants, display no-ops. */
class TargetLangExtSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val store = Seq(
    ("a.one.x", ts("00:00"), 1.0), ("a.one.x", ts("00:01"), 3.0),
    ("a.two.x", ts("00:00"), 10.0), ("a.two.x", ts("00:01"), 30.0),
    ("b.one.y", ts("00:00"), 100.0), ("b.one.y", ts("00:01"), 50.0))
    .toDF("metric", "ts", "value")

  private def ts(hm: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $hm:00")

  test("highestCurrent / lowestCurrent pick by last point") {
    val hi = TargetLang.plan("highestCurrent(*.*.*, 1)", store)
      .select("metric").distinct().as[String].collect().toSeq
    assert(hi == Seq("b.one.y"), s"last values are 3/30/50 -> b.one.y, got $hi")
    val lo = TargetLang.plan("lowestCurrent(*.*.*, 1)", store)
      .select("metric").distinct().as[String].collect().toSeq
    assert(lo == Seq("a.one.x"))
  }

  test("sortByName / sortByMaxima order whole series without dropping any") {
    val byName = TargetLang.plan("sortByName(*.*.*)", store).collect()
    assert(byName.length == 6)
    assert(byName.map(_.getAs[String]("metric")).distinct.toSeq ==
      Seq("a.one.x", "a.two.x", "b.one.y"))
    val byMax = TargetLang.plan("sortByMaxima(*.*.*)", store).collect()
    assert(byMax.map(_.getAs[String]("metric")).distinct.toSeq ==
      Seq("b.one.y", "a.two.x", "a.one.x"), "descending by series max")
  }

  test("sortByMinima drops never-positive series then sorts ascending by min") {
    val withNeg = store.union(Seq(("c.neg.z", ts("00:00"), -5.0),
      ("c.neg.z", ts("00:01"), -1.0)).toDF("metric", "ts", "value"))
    val out = TargetLang.plan("sortByMinima(*.*.*)", withNeg).collect()
    assert(!out.exists(_.getAs[String]("metric") == "c.neg.z"), "max<=0 dropped")
    assert(out.map(_.getAs[String]("metric")).distinct.toSeq ==
      Seq("a.one.x", "a.two.x", "b.one.y"), "ascending by series min (1, 10, 50)")
  }

  test("substr trims path nodes") {
    val out = TargetLang.plan("substr(a.one.x, 1)", store)
      .select("metric").distinct().as[String].collect().toSeq
    assert(out == Seq("one.x"))
    val mid = TargetLang.plan("substr(a.one.x, 1, 2)", store)
      .select("metric").distinct().as[String].collect().toSeq
    assert(mid == Seq("one"))
  }

  test("removeEmptySeries drops all-null series") {
    val withNull = store.union(
      Seq(("d.null.q", ts("00:00"), null.asInstanceOf[java.lang.Double]))
        .map(t => (t._1, t._2, Option(t._3).map(_.doubleValue)))
        .toDF("metric", "ts", "value"))
    val out = TargetLang.plan("removeEmptySeries(*.*.*)", withNull)
      .select("metric").distinct().as[String].collect().toSet
    assert(out == Set("a.one.x", "a.two.x", "b.one.y"))
  }

  test("cactiStyle decorates names with Current/Max/Min") {
    val out = TargetLang.plan("cactiStyle(a.one.x)", store)
      .select("metric").distinct().as[String].collect()
    assert(out.toSeq == Seq("a.one.x Current:3.00 Max:3.00 Min:1.00"))
  }

  test("stddevSeries is the per-ts population stddev across series") {
    val out = TargetLang.plan("stddevSeries(*.one.*)", store).orderBy("ts").collect()
    // ts0: {1, 100} -> pop stddev 49.5; ts1: {3, 50} -> 23.5
    assert(out.map(_.getAs[Double]("value")).toSeq == Seq(49.5, 23.5))
  }

  test("groupByNodes combines on multiple kept nodes") {
    val out = TargetLang.plan("groupByNodes(*.*.*, \"sum\", 1, 2)", store)
      .orderBy("metric", "ts").collect()
    assert(out.map(_.getAs[String]("metric")).distinct.toSeq ==
      Seq("one.x", "one.y", "two.x"))
    val oneX = out.filter(_.getAs[String]("metric") == "one.x")
    assert(oneX.map(_.getAs[Double]("value")).toSeq == Seq(1.0, 3.0))
  }

  test("smartSummarize aligns buckets to the window start, not the epoch grid") {
    // points at 00:01/00:02/00:03 with a 2-min step: epoch grid buckets
    // 00:00|00:02; from-aligned buckets 00:01|00:03
    val s2 = Seq(("m", java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 1.0),
      ("m", java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), 2.0),
      ("m", java.sql.Timestamp.valueOf("2024-01-01 00:03:00"), 4.0))
      .toDF("metric", "ts", "value")
    val out = TargetLang.plan("smartSummarize(m, \"2min\", \"sum\")", s2)
      .orderBy("ts").collect()
    assert(out.map(r => (r.getAs[java.sql.Timestamp]("ts").toString, r.getAs[Double]("value"))).toSeq ==
      Seq(("2024-01-01 00:01:00.0", 3.0), ("2024-01-01 00:03:00.0", 4.0)))
  }

  test("useSeriesAbove fetches the renamed series from the store") {
    val st = Seq(
      ("reqs.web", ts("00:00"), 500.0), ("reqs.web", ts("00:01"), 700.0),
      ("errors.web", ts("00:00"), 3.0), ("errors.web", ts("00:01"), 4.0),
      ("reqs.db", ts("00:00"), 5.0))
      .toDF("metric", "ts", "value")
    val out = TargetLang.plan("useSeriesAbove(reqs.*, 100, \"reqs\", \"errors\")", st)
      .select("metric").distinct().as[String].collect().toSeq
    assert(out == Seq("errors.web"), "only reqs.web clears 100; its errors twin is fetched")
  }

  test("generators: constantLine, threshold, timeFunction, sinFunction, randomWalk") {
    val const = TargetLang.plan("constantLine(42)", store).collect()
    assert(const.length == 2 && const.forall(_.getAs[Double]("value") == 42.0))
    val thr = TargetLang.plan("threshold(10, \"limit\")", store)
      .select("metric").distinct().as[String].collect()
    assert(thr.toSeq == Seq("limit"))
    val tf = TargetLang.plan("timeFunction(\"t\")", store).orderBy("ts").collect()
    assert(tf.map(_.getAs[Double]("value")).toSeq ==
      tf.map(_.getAs[java.sql.Timestamp]("ts").getTime / 1000.0).toSeq)
    val sf = TargetLang.plan("sinFunction(\"s\", 2)", store).collect()
    assert(sf.forall(r => math.abs(r.getAs[Double]("value")) <= 2.0))
    val rw1 = TargetLang.plan("randomWalkFunction(\"w\")", store).orderBy("ts").collect()
    val rw2 = TargetLang.plan("randomWalkFunction(\"w\")", store).orderBy("ts").collect()
    assert(rw1.map(_.getAs[Double]("value")).toSeq == rw2.map(_.getAs[Double]("value")).toSeq,
      "seeded walk must be reproducible")
    assert(rw1.map(_.getAs[Double]("value")).distinct.length > 1, "walk must move")
  }

  test("aliases and display no-ops pass series through") {
    val log10 = TargetLang.plan("log(a.two.x)", store).orderBy("ts").collect()
    assert(log10.map(_.getAs[Double]("value")).toSeq == Seq(1.0, math.log10(30.0)))
    val tn = TargetLang.plan("transformNull(a.one.x)", store).count()
    assert(tn == 2)
    Seq("secondYAxis(a.one.x)", "color(a.one.x, \"red\")", "lineWidth(a.one.x, 2)",
      "drawAsInfinite(a.one.x)", "stacked(a.one.x)", "consolidateBy(a.one.x, \"max\")",
      "cumulative(a.one.x)").foreach { t =>
      val out = TargetLang.plan(t, store).orderBy("ts").collect()
      assert(out.map(_.getAs[Double]("value")).toSeq == Seq(1.0, 3.0), s"$t must pass through")
    }
  }
}
