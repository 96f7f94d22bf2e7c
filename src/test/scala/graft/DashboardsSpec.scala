package graft

import org.apache.spark.sql.functions._

import graft.engine.Dashboards

class DashboardsSpec extends SparkTestBase {
  import spark.implicits._

  //        1 (root)
  //       / \
  //      2   3
  //     /     \
  //    4       5
  //   10 (second root)
  private lazy val apps = Seq(
    (1L, "root", null.asInstanceOf[String]),
    (2L, "web", "1"),
    (3L, "api", "1"),
    (4L, "web-eu", "1/2"),
    (5L, "api-batch", "1/3"),
    (10L, "other", null.asInstanceOf[String]))
    .toDF("id", "name", "ancestry")

  test("depth / root / parent derivations") {
    val d = apps.select(col("id"),
      Dashboards.depth(col("ancestry")).as("d"),
      Dashboards.rootId(col("id"), col("ancestry")).as("r"),
      Dashboards.parentId(col("ancestry")).as("p"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(d(1L) == ((0, 1L, -1L)))
    assert(d(4L) == ((2, 1L, 2L)))
    assert(d(10L) == ((0, 10L, -1L)))
  }

  test("subtree by id: node + all descendants, nothing across trees") {
    assert(Dashboards.subtree(apps, 2L).select("id").as[Long].collect().toSet == Set(2L, 4L))
    assert(Dashboards.subtree(apps, 1L).select("id").as[Long].collect().toSet ==
      Set(1L, 2L, 3L, 4L, 5L))
    assert(Dashboards.subtree(apps, 99L).count() == 0)
  }

  test("prefix match does not leak sibling paths (1 vs 10)") {
    // descendants of "1" must not include children of root 10
    val d = Dashboards.descendants(apps.withColumn("ancestry",
      when(col("id") === 10L, lit(null)).otherwise(col("ancestry"))), "1")
    assert(!d.select("id").as[Long].collect().contains(10L))
  }

  test("per-subtree job rollup counts jobs at every ancestor") {
    val jobs = Seq((100L, 4L), (101L, 4L), (102L, 3L), (103L, 10L))
      .toDF("job_id", "app_id")
    val counts = Dashboards.jobCountsPerSubtree(apps, jobs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts(4L) == 2) // own jobs
    assert(counts(2L) == 2) // via child 4
    assert(counts(1L) == 3) // whole tree 1: jobs 100,101,102
    assert(counts(10L) == 1)
    assert(!counts.contains(5L)) // no jobs anywhere in that subtree
  }
}
