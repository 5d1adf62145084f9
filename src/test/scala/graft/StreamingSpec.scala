package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventsStream
import graft.sources.Tables

/** Structured Streaming tier: the streaming daily rollup must equal its
  * batch twin (SURVEY §2.9 — the reference's incremental-refresh seam).
  */
class StreamingSpec extends SparkSpec {

  test("streaming tumbling-daily rollup equals batch aggregation") {
    val streamed = EventsStream
      .runToCompletion(EventsStream.tumblingDaily(spark, sfDir), "streaming_spec")
      .collect()
      .map(r => (r.getDate(0).toString, r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    val batch = Tables.events(spark, sfDir)
      .groupBy(to_date(col("ts")).as("jour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("total_value")
      )
      .collect()
      .map(r => (r.getDate(0).toString, r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("foreachBatch incremental MERGE load equals the one-shot batch build") {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_incremental_etl"
    val streamed = graft.streaming.IncrementalEtl.run(spark, sfDir, out)
      .collect().map(_.toString).sorted
    val batch = graft.streaming.IncrementalEtl.batchBuild(spark, sfDir)
      .collect().map(_.toString).sorted
    assert(streamed.nonEmpty)
    assert(streamed.sameElements(batch))
  }

  test("mapGroupsWithState sessionization equals the batch LAG-window formulation") {
    val streamed = EventsStream
      .runToCompletion(EventsStream.sessionCounts(spark, sfDir), "streaming_spec_sessions", mode = "update")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val batch = SparkEntry.queries("q24_sessionization")(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }
}
