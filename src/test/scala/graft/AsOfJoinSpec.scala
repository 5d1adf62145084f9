package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

/** As-of join semantics: inclusive most-recent-prior match, null when no
  * prior right row exists, deterministic tiebreak at equal timestamps,
  * and a shuffle-once (no cross product) physical plan.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private val right = Seq(
    (1L, ts(10), 100L, 1.0),
    (1L, ts(20), 101L, 2.0),
    (1L, ts(20), 102L, 3.0), // same key+time as 101: max event_id must win
    (2L, ts(50), 200L, 9.0)
  ).toDF("user_id", "ts", "event_id", "value")

  private val left = Seq(
    (1L, ts(5), 900L),  // before any right row -> null
    (1L, ts(10), 901L), // exactly at a right row -> inclusive match 100
    (1L, ts(25), 902L), // after the tie -> 102 (not 101)
    (2L, ts(60), 903L),
    (3L, ts(99), 904L)  // key with no right rows -> null
  ).toDF("user_id", "ts", "event_id")

  private def run() =
    AsOfJoin
      .backward(left, right, Seq("user_id"), "ts", "ts",
        payload = Seq("event_id", "value"), rightOrder = "event_id")
      .select("event_id", "prev_event_id", "prev_value")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
      .sortBy(_._1)

  test("inclusive prior match, nulls, and max-rightOrder tiebreak") {
    assert(run().toSeq == Seq(
      (900L, None, None),
      (901L, Some(100L), Some(1.0)),
      (902L, Some(102L), Some(3.0)),
      (903L, Some(200L), Some(9.0)),
      (904L, None, None)
    ))
  }

  test("a legitimately NULL payload on the latest right row is carried as NULL, not a stale value") {
    // per-column last(ignoreNulls) would resurrect the ts=10 row's
    // price AND stitch its fields with the ts=20 row's qty — the
    // payload must travel as one struct
    val r = Seq(
      (1L, ts(10), 1L, Option(100.0), Option(5L)),
      (1L, ts(20), 2L, Option.empty[Double], Option(7L))
    ).toDF("user_id", "ts", "event_id", "price", "qty")
    val l = Seq((1L, ts(30), 900L)).toDF("user_id", "ts", "event_id")
    val got = AsOfJoin
      .backward(l, r, Seq("user_id"), "ts", "ts",
        payload = Seq("price", "qty"), rightOrder = "event_id")
      .select("prev_price", "prev_qty")
      .collect().map(row => (Option(row.get(0)), Option(row.get(1)))).toSeq
    assert(got == Seq((None, Some(7L))),
      s"latest right row has price=NULL, qty=7 — got $got (stale or stitched payload)")
  }

  test("plan has no cross product and a single exchange feeding the window") {
    val plan = AsOfJoin
      .backward(left, right, Seq("user_id"), "ts", "ts",
        payload = Seq("value"), rightOrder = "event_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"as-of must not plan a cross product:\n$plan")
    assert(plan.contains("Window"), "carried payload must come from a window")
  }

  test("matches the per-row lookup semantics on fixture data") {
    val e = graft.sources.Tables.events(spark, sfDir)
    val got = AsOfJoin.backward(
      e.filter(col("event_type") === "error").select("event_id", "user_id", "ts"),
      e.filter(col("event_type") === "click"),
      Seq("user_id"), "ts", "ts", Seq("event_id"), "event_id", "prev_")
      .select("event_id", "prev_event_id")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    // brute-force reference computed on the driver (fixture is tiny)
    val clicks = e.filter(col("event_type") === "click")
      .select("user_id", "ts", "event_id")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
    val errors = e.filter(col("event_type") === "error")
      .select("event_id", "user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2)))
    errors.foreach { case (id, u, t) =>
      val expect = clicks.filter(c => c._1 == u && !c._2.after(t))
        .sortBy(c => (c._2.getTime, c._3)).lastOption.map(_._3)
      assert(got(id) == expect, s"error $id (user $u)")
    }
  }

  test("refuses a prefixed payload column that collides with a left column") {
    import spark.implicits._
    val left = Seq((1L, 10L, "x")).toDF("k", "ts", "prev_v")
    val right = Seq((1L, 5L, "y")).toDF("k", "ts", "v")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.backward(left, right, Seq("k"), "ts", "ts", Seq("v"), "ts", "prev_")
    }
    assert(e.getMessage.contains("prev_v"))
  }
}
