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

  test("AnnIndex.compact: append-fragmented codes/ collapses to few cell-clustered files, serve unchanged") {
    val em = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val idx = s"${System.getProperty("java.io.tmpdir")}/graft_compact_ann/index"
    graft.operators.AnnIndex.write(em.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", idx, nList = 8, m = 4, codes = 8, iters = 2)
    // simulate daily ingest: 6 per-batch appends fragment codes/
    (0 until 6).foreach { b =>
      graft.operators.AnnIndex.append(
        em.filter(col("vec_id") % 2 === 1 && col("vec_id") % 6 === b % 6)
          .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")),
        "vec_id", "embedding", idx)
    }
    val before = graft.operators.AnnIndex.codes(spark, idx)
    val nFilesBefore = before.inputFiles.length
    val rowsBefore = before
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).sortBy(_._1)
    assert(nFilesBefore >= 7, s"appends must fragment the store, saw $nFilesBefore files")

    graft.operators.AnnIndex.compact(spark, idx)

    val after = graft.operators.AnnIndex.codes(spark, idx)
    // file-count cut + exact row parity (ids, cells, every code byte)
    assert(after.inputFiles.length < nFilesBefore / 2,
      s"expected a big file cut, got ${after.inputFiles.length} of $nFilesBefore")
    val rowsAfter = after
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).sortBy(_._1)
    assert(rowsAfter.toSeq == rowsBefore.toSeq, "compaction must preserve every code row")
    // cell-clustered: per-file cell ranges disjoint (the serve path
    // filters by probed cell — min/max stats prune compacted files)
    val ranges = after.groupBy(input_file_name().as("f"))
      .agg(min(col("cell")).as("lo"), max(col("cell")).as("hi"))
      .collect().sortBy(_.getInt(1))
    val overlaps = ranges.sliding(2).count {
      case Array(a, b) => b.getInt(1) < a.getInt(2)
      case _ => false
    }
    assert(overlaps == 0, "compacted files must cover disjoint cell ranges")
  }
}
