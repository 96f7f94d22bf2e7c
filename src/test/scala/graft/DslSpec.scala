package graft

import java.sql.Timestamp
import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

import graft.dsl.{Cron, Glob, MonitorDsl, TargetLang}
import graft.engine.Planner
import graft.model.MonitorSpec

class GlobSpec extends AnyFunSuite {
  test("star does not cross path segments") {
    val g = Glob.compile("stats.web.*.latency")
    assert(g.matches("stats.web.host1.latency"))
    assert(!g.matches("stats.web.host1.extra.latency"))
    assert(g.literalPrefix == "stats.web.")
  }
  test("brace alternation and char class") {
    val g = Glob.compile("events.{click,view}")
    assert(g.matches("events.click") && g.matches("events.view"))
    assert(!g.matches("events.clickview") && !g.matches("events.error"))
    val c = Glob.compile("host[0-9].cpu")
    assert(c.matches("host3.cpu") && !c.matches("hostx.cpu"))
  }
  test("literal dots are escaped (no regex dot-any)") {
    val g = Glob.compile("a.b")
    assert(!g.matches("aXb"))
  }
  test("property: expanded brace members always match their own glob (100 seeded cases)") {
    val rnd = new scala.util.Random(42)
    (1 to 100).foreach { _ =>
      val names = (1 to (1 + rnd.nextInt(5))).map(_ => s"m${rnd.nextInt(100)}").distinct
      val g = Glob.compile(s"root.{${names.mkString(",")}}.leaf")
      names.foreach(n => assert(g.matches(s"root.$n.leaf"), s"glob for $names vs $n"))
      assert(!g.matches("root.notamember.leaf"))
    }
  }
}

class CronSpec extends AnyFunSuite {
  private def next(expr: String, after: String): String =
    Cron.parse(expr).nextAfter(Instant.parse(after)).get.toString

  test("every-5-minutes") {
    assert(next("*/5 * * * *", "2024-01-01T00:02:00Z") == "2024-01-01T00:05:00Z")
  }
  test("daily at 09:30") {
    assert(next("30 9 * * *", "2024-01-01T10:00:00Z") == "2024-01-02T09:30:00Z")
  }
  test("weekday constraint (dow 1-5)") {
    // 2024-01-05 is a Friday; next 09:00 weekday run after Friday 10:00 is Monday
    assert(next("0 9 * * 1-5", "2024-01-05T10:00:00Z") == "2024-01-08T09:00:00Z")
  }
  test("dow 7 aliases Sunday") {
    assert(next("0 0 * * 7", "2024-01-01T00:00:00Z") == "2024-01-07T00:00:00Z")
  }
  test("vixie OR rule when both dom and dow restricted") {
    // dom 15 OR Monday: after Jan 8 (Mon) 00:01, next is Jan 15 (Mon)…
    // after Jan 9, next is Jan 15 (dom match, also a Monday); after Jan 2,
    // next is Jan 8 (Monday before the 15th)
    assert(next("0 0 15 * 1", "2024-01-02T01:00:00Z") == "2024-01-08T00:00:00Z")
    assert(next("0 0 15 * 1", "2024-01-08T01:00:00Z") == "2024-01-15T00:00:00Z")
  }
  test("star-with-step dom stays UNrestricted for the vixie OR rule") {
    // vixie sets the dom star flag for any field starting with '*', so
    // "*/2 * 1" is dom-unrestricted: AND semantics — Mondays that fall
    // on odd days only, NOT every odd day plus Mondays.
    // Jan 8 2024 is a Monday on an even dom (8): skipped; the next
    // Monday on an odd dom is Jan 15.
    assert(next("0 0 */2 * 1", "2024-01-02T01:00:00Z") == "2024-01-15T00:00:00Z")
  }
  test("minute list + range") {
    assert(next("0,30 * * * *", "2024-01-01T00:10:00Z") == "2024-01-01T00:30:00Z")
  }
  test("bad field count rejected") {
    intercept[IllegalArgumentException](Cron.parse("* * * *"))
  }

  test("vixie value/step means value-to-max/step") {
    // '5/15' in the minute field = 5,20,35,50
    assert(next("5/15 * * * *", "2024-01-01T00:06:00Z") == "2024-01-01T00:20:00Z")
    assert(next("5/15 * * * *", "2024-01-01T00:51:00Z") == "2024-01-01T01:05:00Z")
  }

  test("property: nextAfter returns the FIRST matching minute (100 seeded cases)") {
    val rnd = new scala.util.Random(13)
    (1 to 100).foreach { _ =>
      val expr = Seq(
        if (rnd.nextBoolean()) s"*/${1 + rnd.nextInt(29)}" else rnd.nextInt(60).toString,
        if (rnd.nextBoolean()) "*" else rnd.nextInt(24).toString,
        "*", "*",
        if (rnd.nextBoolean()) "*" else rnd.nextInt(7).toString).mkString(" ")
      val cron = Cron.parse(expr)
      val after = Instant.parse("2024-03-01T00:00:00Z")
        .plusSeconds(rnd.nextInt(86400 * 10).toLong)
      cron.nextAfter(after) match {
        case Some(next) =>
          val z = java.time.ZonedDateTime.ofInstant(next, java.time.ZoneOffset.UTC)
          assert(cron.matches(z), s"'$expr' nextAfter($after) → $next does not match")
          assert(next.isAfter(after), "strictly after")
          // brute-force: no earlier matching minute in between (bounded scan)
          var t = java.time.ZonedDateTime.ofInstant(after, java.time.ZoneOffset.UTC)
            .withSecond(0).withNano(0).plusMinutes(1)
          var steps = 0
          while (t.toInstant.isBefore(next) && steps < 20000) {
            assert(!cron.matches(t), s"'$expr' skipped earlier match $t (returned $next)")
            t = t.plusMinutes(1); steps += 1
          }
        case None => fail(s"'$expr' found no fire time")
      }
    }
  }
}

class TargetLangSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private lazy val store = Seq(
    ("events.click", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 10.0),
    ("events.click", java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 20.0),
    ("events.view", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 5.0),
    ("events.view", java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 40.0))
    .toDF("metric", "ts", "value")

  test("parse: nested calls with globs, numbers, strings") {
    val e = TargetLang.parse("movingAverage(summarize(events.{click,view}, \"1h\", \"sum\"), 5)")
    assert(e.isRight)
    assert(TargetLang.render(e.toOption.get) ==
      "movingAverage(summarize(events.{click,view},\"1h\",\"sum\"),5)")
  }

  test("unknown function fails loudly") {
    intercept[IllegalArgumentException](TargetLang.plan("frobnicate(events.click)", store))
  }

  test("literal path compiles to equality filter; glob to prefix+rlike") {
    assert(TargetLang.plan("events.click", store).count() == 2)
    assert(TargetLang.plan("events.*", store).count() == 4)
  }

  test("sumSeries combines point-wise across matched series") {
    val out = TargetLang.plan("sumSeries(events.*)", store).orderBy("ts").collect()
    assert(out.map(_.getAs[Double]("value")).toSeq == Seq(15.0, 60.0))
  }

  test("scale + alias pipeline") {
    val out = TargetLang.plan("alias(scale(events.click, 2), \"double_click\")", store)
      .orderBy("ts").collect()
    assert(out.map(_.getAs[Double]("value")).toSeq == Seq(20.0, 40.0))
    assert(out.forall(_.getAs[String]("metric") == "double_click"))
  }

  test("divideSeries aligns by ts") {
    val out = TargetLang.plan("divideSeries(events.click, events.view)", store)
      .orderBy("ts").collect()
    assert(out.map(_.getAs[Double]("value")).toSeq == Seq(2.0, 0.5))
  }

  test("duration parsing") {
    assert(TargetLang.durationSeconds("7d") == 604800L)
    assert(TargetLang.durationSeconds("10min") == 600L)
    assert(TargetLang.durationSeconds("90s") == 90L)
  }

  test("movingAverage by TIME windows the gap correctly (vs by points)") {
    val gappy = Seq(
      ("m", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 10.0),
      ("m", java.sql.Timestamp.valueOf("2024-01-01 00:05:00"), 20.0),
      ("m", java.sql.Timestamp.valueOf("2024-01-01 00:20:00"), 40.0))
      .toDF("metric", "ts", "value")
    val byTime = TargetLang.plan("movingAverage(m, \"10min\")", gappy)
      .orderBy("ts").collect().map(_.getAs[Double]("value")).toSeq
    // at 00:20 the [00:10, 00:20] window holds only the 40 — the gap is
    // respected, unlike the 2-point frame which would reach back to 20
    assert(byTime == Seq(10.0, 15.0, 40.0))
    val byPoints = TargetLang.plan("movingAverage(m, 2)", gappy)
      .orderBy("ts").collect().map(_.getAs[Double]("value")).toSeq
    assert(byPoints == Seq(10.0, 15.0, 30.0))
  }

  test("aliasSub rewrites metric names by regex") {
    val out = TargetLang.plan("aliasSub(events.*, \"^events\\.\", \"ev_\")", store)
    assert(out.select("metric").distinct().collect().map(_.getString(0)).sorted.toSeq ==
      Seq("ev_click", "ev_view"))
  }

  test("limit keeps the first n series in name order") {
    val out = TargetLang.plan("limit(events.*, 1)", store)
    assert(out.select("metric").distinct().collect().map(_.getString(0)).toSeq ==
      Seq("events.click"))
    assert(out.count() == 2)
  }

  test("mostDeviant keeps the highest-stddev series") {
    // click: (10,20) stddev ~7.1; view: (5,40) stddev ~24.7
    val out = TargetLang.plan("mostDeviant(events.*, 1)", store)
    assert(out.select("metric").distinct().collect().map(_.getString(0)).toSeq ==
      Seq("events.view"))
  }

  test("groupByNode combines series sharing a path node") {
    val deep = Seq(
      ("events.click.us", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0),
      ("events.click.eu", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 2.0),
      ("events.view.us", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 10.0),
      ("events.view.eu", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 20.0))
      .toDF("metric", "ts", "value")
    // node 2 = region: collapse event types per region
    val byRegion = TargetLang.plan("groupByNode(events.*.*, 2, \"sum\")", deep)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("value")).toMap
    assert(byRegion == Map("us" -> 11.0, "eu" -> 22.0))
    // node 1 = event type: collapse regions per type, averaged
    val byType = TargetLang.plan("groupByNode(events.*.*, 1, \"avg\")", deep)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("value")).toMap
    assert(byType == Map("click" -> 1.5, "view" -> 15.0))
  }

  test("pow/squareRoot/changed/isNonNull point transforms") {
    val s = Seq(
      ("m", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), Double.box(4.0)),
      ("m", java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), Double.box(4.0)),
      ("m", java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), null.asInstanceOf[java.lang.Double]),
      ("m", java.sql.Timestamp.valueOf("2024-01-01 00:03:00"), Double.box(9.0)))
      .toDF("metric", "ts", "value")
    def vals(t: String) = TargetLang.plan(t, s).orderBy("ts").collect()
      .map(r => Option(r.get(r.fieldIndex("value"))))
    assert(vals("pow(m, 2)").toSeq == Seq(Some(16.0), Some(16.0), None, Some(81.0)))
    assert(vals("squareRoot(m)").toSeq == Seq(Some(2.0), Some(2.0), None, Some(3.0)))
    // first point counts as changed (no prior), repeat is 0, null stays null
    assert(vals("changed(m)").toSeq == Seq(Some(1.0), Some(0.0), None, Some(1.0)))
    assert(vals("isNonNull(m)").toSeq == Seq(Some(1.0), Some(1.0), Some(0.0), Some(1.0)))
  }

  test("counter wrap, delay, and per-interval integral") {
    val s = Seq(
      ("m", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 250.0),
      ("m", java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 254.0),
      ("m", java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), 3.0)) // wrapped at 255
      .toDF("metric", "ts", "value")
    val wrapped = TargetLang.plan("nonNegativeDerivative(m, 255)", s)
      .orderBy("ts").collect().map(r => Option(r.get(r.fieldIndex("value"))))
    assert(wrapped.toSeq == Seq(None, Some(4.0), Some(5.0))) // 3-254+255+1 = 5
    val delayed = TargetLang.plan("delay(m, 1)", s)
      .orderBy("ts").collect().map(r => Option(r.get(r.fieldIndex("value"))))
    assert(delayed.toSeq == Seq(None, Some(250.0), Some(254.0)))
    val integ = TargetLang.plan("integralByInterval(m, \"2min\")", s)
      .orderBy("ts").collect().map(_.getAs[Double]("value"))
    assert(integ.toSeq == Seq(250.0, 504.0, 3.0)) // resets at 00:02
  }

  test("averageOutsidePercentile keeps only outlier series") {
    val many = (1 to 10).flatMap { i =>
      Seq(("s" + "%02d".format(i), java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        if (i == 10) 1000.0 else i.toDouble))
    }.toDF("metric", "ts", "value")
    val out = TargetLang.plan("averageOutsidePercentile(s*, 10)", many)
      .select("metric").distinct().collect().map(_.getString(0)).sorted.toSeq
    // band = [p10, p90] of the 10 averages: s01 (below) and s10 (above) fall outside
    assert(out == Seq("s01", "s10"))
  }

  test("exponentialMovingAverage folds in ts order; nulls skip state") {
    val s = Seq(
      ("m", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), Double.box(10.0)),
      ("m", java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), Double.box(20.0)),
      ("m", java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), null.asInstanceOf[java.lang.Double]),
      ("m", java.sql.Timestamp.valueOf("2024-01-01 00:03:00"), Double.box(30.0)))
      .toDF("metric", "ts", "value")
    // n=3 ⇒ α=0.5: 10, 15, null, 22.5 (the null neither emits nor decays)
    val out = TargetLang.plan("exponentialMovingAverage(m, 3)", s)
      .orderBy("ts").collect().map(r => Option(r.get(r.fieldIndex("value"))))
    assert(out.toSeq == Seq(Some(10.0), Some(15.0), None, Some(22.5)))
  }

  test("negative Graphite nodes count from the end (aliasByNode/groupByNode)") {
    val s = Seq(
      ("web.api.us.errors", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0),
      ("web.api.eu.errors", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 2.0))
      .toDF("metric", "ts", "value")
    // aliasByNode(-1) = last segment; (0, -2) mixes ends
    val a = TargetLang.plan("aliasByNode(web.*.*.errors, -1)", s)
      .select("metric").distinct().as[String].collect().toSeq
    assert(a == Seq("errors"))
    val b = TargetLang.plan("aliasByNode(web.*.*.errors, 0, -2)", s)
      .select("metric").distinct().as[String].collect().sorted.toSeq
    assert(b == Seq("web.eu", "web.us"))
    // groupByNode(-2) groups on the region segment
    val g = TargetLang.plan("groupByNode(web.*.*.errors, -2, \"sum\")", s)
      .select("metric").as[String].collect().sorted.toSeq
    assert(g == Seq("eu", "us"))
  }

  test("alignBinary raises on a multi-series operand instead of silently mixing") {
    val multi = Seq(
      ("a.x", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0),
      ("a.y", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 2.0))
      .toDF("metric", "ts", "value")
    val single = multi.filter(col("metric") === "a.x")
    // single ÷ single works
    assert(graft.series.SeriesOps.divideSeries(single, single).count() == 1)
    // multi-series dividend: loud, not a silent per-ts cross product
    intercept[Exception] {
      graft.series.SeriesOps.divideSeries(multi, single).collect()
    }
  }

  test("timeShift sign convention: bare/minus pulls past data forward, plus pulls back") {
    val s = Seq(("m", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0))
      .toDF("metric", "ts", "value")
    def tsOf(target: String) = TargetLang.plan(target, s)
      .select("ts").head.getTimestamp(0).toString
    assert(tsOf("timeShift(m, \"1h\")") == "2024-01-01 01:00:00.0")
    assert(tsOf("timeShift(m, \"-1h\")") == "2024-01-01 01:00:00.0")
    assert(tsOf("timeShift(m, \"+1h\")") == "2023-12-31 23:00:00.0")
  }

  test("digit-leading path segments parse as paths, not numbers") {
    val s = Seq(
      ("5xx.count", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 3.0),
      ("2xx.count", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 7.0))
      .toDF("metric", "ts", "value")
    val out = TargetLang.plan("sumSeries(5xx.count)", s).collect()
    assert(out.length == 1 && out(0).getDouble(out(0).fieldIndex("value")) == 3.0)
  }

  test("timeSlice keeps only the inner range") {
    val out = TargetLang.plan(
      "timeSlice(events.*, \"2024-01-01 00:01:00\", \"2024-01-01 00:01:00\")", store)
    assert(out.count() == 2) // one point per series at 00:01
  }

  test("asPercent single-arg normalizes per ts; offsetToZero baselines per series") {
    val pct = TargetLang.plan("asPercent(events.*)", store)
      .orderBy("metric", "ts").collect().map(_.getAs[Double]("value")).toSeq
    // t0 total 15, t1 total 60
    assert(pct.map(v => math.rint(v * 100) / 100) ==
      Seq(66.67, 33.33, 33.33, 66.67))
    val zeroed = TargetLang.plan("offsetToZero(events.*)", store)
      .orderBy("metric", "ts").collect().map(_.getAs[Double]("value")).toSeq
    assert(zeroed == Seq(0.0, 10.0, 0.0, 35.0))
  }

  test("removeAbovePercentile nulls points above the series' own p50") {
    val out = TargetLang.plan("removeAbovePercentile(events.*, 50)", store)
      .orderBy("metric", "ts").collect()
    // exact p50 of (10,20)=15, of (5,40)=22.5 → second point of each nulled
    assert(out.map(r => Option(r.get(r.fieldIndex("value")))).toSeq ==
      Seq(Some(10.0), None, Some(5.0), None))
    assert(out.length == 4) // shape preserved
  }

  test("threshold series filters keep/drop whole series") {
    // click avg = 15, view avg = 22.5
    assert(TargetLang.plan("averageAbove(events.*, 20)", store)
      .select("metric").distinct().as[String].collect().toSet == Set("events.view"))
    assert(TargetLang.plan("averageBelow(events.*, 20)", store)
      .select("metric").distinct().as[String].collect().toSet == Set("events.click"))
    assert(TargetLang.plan("maximumAbove(events.*, 100)", store).count() == 0)
    assert(TargetLang.plan("currentAbove(events.*, 25)", store)
      .select("metric").distinct().as[String].collect().toSet == Set("events.view"))
  }

  test("countSeries and rangeOfSeries combine per ts") {
    val c = TargetLang.plan("countSeries(events.*)", store).orderBy("ts").collect()
    assert(c.map(_.getAs[Double]("value")).toSeq == Seq(2.0, 2.0))
    val r = TargetLang.plan("rangeOfSeries(events.*)", store).orderBy("ts").collect()
    assert(r.map(_.getAs[Double]("value")).toSeq == Seq(5.0, 20.0))
  }

  test("removeAboveValue nulls outliers but keeps the series shape") {
    val out = TargetLang.plan("removeAboveValue(events.view, 30)", store).orderBy("ts").collect()
    assert(out.length == 2)
    assert(out(0).getDouble(2) == 5.0)
    assert(out(1).isNullAt(2)) // 40.0 clipped to None
    val clipped = TargetLang.plan("clip(events.view, 10, 30)", store).orderBy("ts").collect()
    assert(clipped.map(_.getDouble(2)).toSeq == Seq(10.0, 30.0))
  }

  test("sortByTotal keeps the top-k series by total") {
    assert(TargetLang.plan("sortByTotal(events.*, 1)", store)
      .select("metric").distinct().as[String].collect().toSet == Set("events.view"))
  }
}

class MonitorDslSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("parse + reductions extraction") {
    val ast = MonitorDsl.parse("mean < 100 && p95 > 2 * stddev").toOption.get
    assert(MonitorDsl.reductions(ast) == Set("mean", "p95", "stddev"))
  }

  test("rejects unknown identifiers") {
    assert(MonitorDsl.parse("bogus < 1").isLeft)
  }

  test("compiles and evaluates against red_ columns") {
    val ast = MonitorDsl.parse("mean < 100 || max > 500").toOption.get
    val df = Seq((50.0, 200.0), (150.0, 600.0), (150.0, 400.0))
      .toDF("red_mean", "red_max")
      .withColumn("passed", MonitorDsl.compile(ast))
    assert(df.select("passed").collect().map(_.getBoolean(0)).toSeq ==
      Seq(true, true, false))
  }

  test("arithmetic precedence: 2 + 3 * 4 == 14") {
    val ast = MonitorDsl.parse("mean == 2 + 3 * 4").toOption.get
    val df = Seq(14.0).toDF("red_mean").withColumn("p", MonitorDsl.compile(ast))
    assert(df.select("p").head.getBoolean(0))
  }

  test("p100 and fractional p99.9 parse; p101 rejected") {
    val ast = MonitorDsl.parse("p100 > 0 && p99.9 > 0").toOption.get
    assert(MonitorDsl.reductions(ast) == Set("p100", "p99.9"))
    assert(MonitorDsl.parse("p101 > 0").isLeft)
    assert(MonitorDsl.parse("p999 > 0").isLeft)
  }

  test("fractional percentile evaluates end-to-end (sanitized column)") {
    val store = (1 to 1000).map(i => ("m", Timestamp.valueOf("2024-01-15 11:30:00"), i.toDouble))
      .toDF("metric", "ts", "value")
    val spec = MonitorSpec(1, "frac", Seq("m"), minutes = 60,
      toDate = Some(Timestamp.valueOf("2024-01-15 12:00:00")),
      cronExpr = "* * * * *", monitorExpr = "p99.9 >= 999 && p100 == 1000")
    val row = Planner.plan(spark, store, spec, Timestamp.valueOf("2024-01-15 12:00:00")).head
    assert(row.schema.fieldNames.contains("red_p99_9"))
    assert(row.getBoolean(row.fieldIndex("passed")))
  }
}
