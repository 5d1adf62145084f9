package graft

import java.nio.file.Files
import java.sql.Timestamp
import java.time.LocalDateTime

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** The events fixture's `ts` physical encoding has drifted across driver
  * generations (TIMESTAMP(NANOS)-as-long → micros NTZ). `Tables.events`
  * must resolve the encoding from the parquet footer and decode
  * accordingly — this spec writes each encoding and asserts all three
  * decode to the SAME instant (2024-03-05 06:07:08 UTC).
  */
class EventTsSpec extends SparkSpec {

  private val wallClock = LocalDateTime.of(2024, 3, 5, 6, 7, 8)
  private val epochS    = 1709618828L // 2024-03-05T06:07:08Z

  private def row(ts: Any) = Row(1L, ts, 10L, "click", 1.5, "{}")

  private def schemaWith(tsType: DataType) = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)
  ))

  private def writeFixture(tsType: DataType, ts: Any): String = {
    val dir = Files.createTempDirectory("graft_ts_enc").toString
    val df = spark.createDataFrame(
      java.util.Arrays.asList(row(ts)), schemaWith(tsType))
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def decodedEpochS(dir: String): Long = {
    val e = Tables.events(spark, dir)
    assert(e.schema("ts").dataType == TimestampType,
      "events.ts must normalize to a session-TZ TIMESTAMP")
    e.select(unix_timestamp(col("ts"))).head().getLong(0)
  }

  test("legacy nanos-as-long fixture decodes via div-1000") {
    val dir = writeFixture(LongType, epochS * 1000000000L) // nanoseconds
    assert(decodedEpochS(dir) == epochS)
  }

  test("a REAL TIMESTAMP(NANOS) file trips the footer probe and decodes") {
    // Spark cannot write TIMESTAMP(NANOS); build the file with the
    // parquet example writer so the probe's nanos branch (the only one
    // that sets the legacy nanosAsLong conf) is exercised against a
    // genuinely annotated footer — the driver-fixture encoding that
    // broke round 9.
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val schema: MessageType = Types.buildMessage()
      .addField(Types.required(INT64).named("event_id"))
      .addField(Types.required(INT64)
        .as(LogicalTypeAnnotation.timestampType(false, LogicalTypeAnnotation.TimeUnit.NANOS))
        .named("ts"))
      .addField(Types.required(INT64).named("user_id"))
      .addField(Types.required(BINARY)
        .as(LogicalTypeAnnotation.stringType()).named("event_type"))
      .addField(Types.required(DOUBLE).named("value"))
      .addField(Types.required(BINARY)
        .as(LogicalTypeAnnotation.stringType()).named("props"))
      .named("events")
    val dir = Files.createTempDirectory("graft_ts_nanos").toString
    val path = new org.apache.hadoop.fs.Path(s"$dir/events.parquet")
    val writer = ExampleParquetWriter.builder(path).withType(schema).build()
    try {
      val g = new SimpleGroupFactory(schema).newGroup()
      g.add("event_id", 1L)
      g.add("ts", epochS * 1000000000L)
      g.add("user_id", 10L)
      g.add("event_type", "click")
      g.add("value", 1.5)
      g.add("props", "{}")
      writer.write(g)
    } finally writer.close()
    assert(decodedEpochS(dir) == epochS)
  }

  test("micros NTZ fixture reinterprets wall-clock in session TZ (UTC)") {
    val dir = writeFixture(TimestampNTZType, wallClock)
    assert(decodedEpochS(dir) == epochS)
  }

  test("UTC-adjusted timestamp fixture passes through") {
    val dir = writeFixture(TimestampType, Timestamp.from(
      java.time.Instant.ofEpochSecond(epochS)))
    assert(decodedEpochS(dir) == epochS)
  }

  test("driver fixture decodes end-to-end (fixture drift fails HERE, not in 7 downstream suites)") {
    assert(Tables.events(spark, sfDir).count() > 0)
  }

  test("streaming raw schema resolves from the footer") {
    val dir = writeFixture(TimestampNTZType, wallClock)
    assert(Tables.eventsRawSchema(spark, dir)("ts").dataType == TimestampNTZType)
  }

  test("sharded directory layout: batch and streaming readers both take it") {
    // the ScaleStress files=cores tier writes events.parquet as a
    // DIRECTORY of part files; the layout-adaptive stream source must
    // list its parts (the driver fixture's plain-file layout is covered
    // by every other test here)
    val dir = Files.createTempDirectory("graft_ts_shard").toString
    val rows = (0 until 8).map(i => row(Timestamp.from(
      java.time.Instant.ofEpochSecond(epochS + i * 3600))))
    spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), schemaWith(TimestampType))
      .repartition(4)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val nParts = new java.io.File(s"$dir/events.parquet").listFiles()
      .count(f => f.getName.startsWith("part-"))
    assert(nParts > 1, s"fixture should be multi-file, got $nParts part file(s)")
    assert(Tables.events(spark, dir).count() == 8)
    val streamed = graft.streaming.EventsStream.runToCompletion(
      graft.streaming.EventsStream.tumblingDaily(spark, dir), "shard_spec")
    assert(streamed.agg(sum(col("n_events"))).head().getLong(0) == 8,
      "the stream must see every sharded part file")
  }
}
