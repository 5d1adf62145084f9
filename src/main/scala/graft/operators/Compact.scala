package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Small-file compaction (the operational other-half of S3 partitioned
  * storage: streaming/incremental writers leave many small files; scans
  * then pay per-file open cost and lose row-group locality).
  *
  * Strategy: range-repartition on the sort key so each output file
  * covers a contiguous key range (min/max file stats become selective —
  * the poor-man's clustering that replaces btree indexes at scale,
  * SURVEY §4), with the target file count derived from data size.
  */
object Compact {

  /** Rewrite `src` parquet dir into `dst` with ~targetFileBytes files,
    * range-clustered on `sortKeys`. A partitioned store passes its
    * partition columns in `partitionCols` (they must lead `sortKeys` so
    * each range task holds contiguous partition values and writes ~one
    * file per directory instead of scattering). Returns the compacted
    * DataFrame.
    */
  def parquet(
      spark: org.apache.spark.sql.SparkSession,
      src: String,
      dst: String,
      sortKeys: Seq[Column],
      targetFileBytes: Long = 128L * 1024 * 1024,
      partitionCols: Seq[String] = Nil
  ): DataFrame = {
    val df = spark.read.parquet(src)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val nFiles = math.max(1, (bytes / BigInt(targetFileBytes)).toInt +
      (if (bytes % BigInt(targetFileBytes) > 0) 1 else 0))
    val clustered = df.repartitionByRange(nFiles, sortKeys: _*)
      .sortWithinPartitions(sortKeys: _*)
    val writer = clustered.write.mode("overwrite")
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(dst)
    spark.read.parquet(dst)
  }
}
