package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** Bucketed range join must be pair-identical to the naive BETWEEN join
  * while never planning a nested-loop or cartesian.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  // intervals spanning 1–4 buckets at width 10, plus a degenerate one
  private def fixture = {
    val intervals = Seq(
      (1L, "i1", 0L, 9L),    // 1 bucket
      (1L, "i2", 5L, 24L),   // 3 buckets, overlaps i1
      (2L, "i3", 100L, 139L),// 4 buckets
      (2L, "i4", 50L, 40L),  // degenerate: end < start — matches nothing
      (3L, "i5", 7L, 7L)     // single-point interval
    ).toDF("k", "iid", "lo", "hi")
    val points = Seq(
      (1L, "p1", 0L), (1L, "p2", 7L), (1L, "p3", 9L), (1L, "p4", 10L),
      (1L, "p5", 24L), (1L, "p6", 25L),
      (2L, "p7", 100L), (2L, "p8", 139L), (2L, "p9", 140L), (2L, "p10", 45L),
      (3L, "p11", 7L), (3L, "p12", 8L),
      (4L, "p13", 7L) // key with no interval
    ).toDF("k", "pid", "t")
    (points, intervals)
  }

  private def naive(points: org.apache.spark.sql.DataFrame, intervals: org.apache.spark.sql.DataFrame) =
    points.as("p").join(intervals.as("i"),
        col("p.k") === col("i.k") && col("p.t") >= col("i.lo") && col("p.t") <= col("i.hi"))
      .select(col("p.pid"), col("i.iid"))
      .as[(String, String)].collect().sorted.toSeq

  test("bucketed join equals the naive BETWEEN join, pairs produced exactly once") {
    val (points, intervals) = fixture
    val got = RangeJoin.pointInInterval(points, intervals, Seq("k"), "t", "lo", "hi", bucketWidth = 10L)
      .select(col("pid"), col("iid")).as[(String, String)].collect().sorted.toSeq
    val want = naive(points, intervals)
    assert(want.contains(("p2", "i1")) && want.contains(("p2", "i2")),
      "fixture sanity: overlapping intervals both match p2")
    assert(got == want)
  }

  test("inclusive bounds: points exactly at lo and hi match, one past hi does not") {
    val (points, intervals) = fixture
    val got = RangeJoin.pointInInterval(points, intervals, Seq("k"), "t", "lo", "hi", 10L)
      .select(col("pid"), col("iid")).as[(String, String)].collect().toSet
    assert(got.contains(("p7", "i3")) && got.contains(("p8", "i3")), "lo and hi are inclusive")
    assert(!got.exists(_._1 == "p9"), "hi+1 is out")
    assert(got.contains(("p11", "i5")), "single-point interval matches its point")
  }

  test("degenerate intervals (end < start) match nothing") {
    val (points, intervals) = fixture
    val got = RangeJoin.pointInInterval(points, intervals, Seq("k"), "t", "lo", "hi", 10L)
      .select(col("iid")).as[String].collect().toSet
    assert(!got.contains("i4"))
  }

  test("result is width-invariant (width only tunes cost, never semantics)") {
    val (points, intervals) = fixture
    val want = naive(points, intervals)
    for (w <- Seq(1L, 3L, 100L)) {
      val got = RangeJoin.pointInInterval(points, intervals, Seq("k"), "t", "lo", "hi", w)
        .select(col("pid"), col("iid")).as[(String, String)].collect().sorted.toSeq
      assert(got == want, s"width $w diverged")
    }
  }

  test("plan is an equi-join on (key, bucket): no cartesian, no nested loop") {
    val (points, intervals) = fixture
    val df = RangeJoin.pointInInterval(points, intervals, Seq("k"), "t", "lo", "hi", 10L)
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct"), "range join must never plan a cartesian")
    assert(!physical.contains("BroadcastNestedLoopJoin"), "range join must never plan a nested loop")
  }

  test("autoWidth is the median interval length, degenerate rows excluded, floor 1") {
    val (_, intervals) = fixture
    // live lengths: 10, 20, 40, 1 → median (p50 of {1,10,20,40}) is 10
    assert(RangeJoin.autoWidth(intervals, "lo", "hi") == 10L)
    val empty = Seq.empty[(Long, Long)].toDF("lo", "hi")
    assert(RangeJoin.autoWidth(empty, "lo", "hi") == 1L)
  }

  test("colliding non-key column names are refused, not silently shadowed") {
    val (points, intervals) = fixture
    val clash = intervals.withColumnRenamed("iid", "pid")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, clash, Seq("k"), "t", "lo", "hi", 10L)
    }
    assert(e.getMessage.contains("pid"))
  }
}
