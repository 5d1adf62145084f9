package graft

import org.apache.spark.sql.functions._
import graft.operators.Compact
import graft.sources.Tables

/** Compaction: many small files in, few range-clustered files out, with
  * exact row parity and tighter per-file key ranges (the stat-pruning
  * property that makes compaction worth running).
  */
class CompactSpec extends SparkSpec {

  test("compaction merges small files, preserves rows, clusters key ranges") {
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_compact"
    val src = s"$base/src"; val dst = s"$base/dst"
    // simulate a streaming writer: 64 tiny files
    Tables.events(spark, sfDir).repartition(64)
      .write.mode("overwrite").parquet(src)
    val before = spark.read.parquet(src)
    assert(before.inputFiles.length >= 32, "fixture must start fragmented")

    val after = Compact.parquet(spark, src, dst, Seq(col("ts")), targetFileBytes = 4L * 1024 * 1024)
    assert(after.inputFiles.length < before.inputFiles.length / 4,
      s"expected big file-count reduction, got ${after.inputFiles.length}")
    assert(after.count() == before.count())
    assert(
      after.agg(sum(col("value").cast("decimal(12,2)"))).collect().head.getDecimal(0) ==
        before.agg(sum(col("value").cast("decimal(12,2)"))).collect().head.getDecimal(0)
    )

    // range-clustering: per-file ts ranges must not all overlap (each
    // output file covers a contiguous slice of the sort key)
    val ranges = after
      .groupBy(input_file_name().as("f"))
      .agg(min(col("ts")).as("lo"), max(col("ts")).as("hi"))
      .collect()
    if (ranges.length > 1) {
      val sorted = ranges.sortBy(_.getTimestamp(1).getTime)
      val overlaps = sorted.sliding(2).count {
        case Array(a, b) => b.getTimestamp(1).getTime < a.getTimestamp(2).getTime
        case _ => false
      }
      assert(overlaps == 0, "range partitions must be disjoint on the sort key")
    }
  }
}
