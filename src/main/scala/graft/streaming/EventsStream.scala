package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming tier (SURVEY §2.9): the reference is batch-only;
  * this re-expresses its incremental-refresh seam as a streaming query.
  * The daily rollup here is the streaming twin of EventsQueries.q23's
  * batch aggregation and is asserted equal in StreamingSpec.
  */
object EventsStream {

  /** Raw events schema with ts as nanosecond LONG (the parquet physical
    * type, read via the nanosAsLong legacy conf).
    */
  private val rawSchema = StructType(
    Seq(
      StructField("event_id", LongType),
      StructField("ts", LongType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)
    )
  )

  /** Streaming daily tumbling-window rollup over the events file source.
    * Watermark bounds state at 1 day past the max seen event time — on an
    * unbounded feed, state size stays O(open windows).
    */
  def tumblingDaily(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(rawSchema)
      // the streaming file source lists a directory; select only the
      // events file out of the shared fixture dir
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(12, 2))).as("total_value_dec")
      )
      .select(
        col("window.start").cast(DateType).as("jour"),
        col("event_type"),
        col("n_events"),
        col("total_value_dec").cast(DoubleType).as("total_value")
      )
  }

  /** Run a streaming DataFrame to completion against the static files and
    * return the materialized result (memory sink, complete mode).
    */
  def runToCompletion(streamDF: DataFrame, name: String): DataFrame = {
    val spark = streamDF.sparkSession
    val q = streamDF.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    val out = spark.table(name).localCheckpoint(eager = true)
    q.stop()
    out
  }
}
