package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Range (interval-containment) join — the second temporal operator the
  * reference's SQL surface has no native form for (alongside
  * [[AsOfJoin]]): for each point row, find every interval row of the
  * same key whose `[start, end]` contains the point (both bounds
  * inclusive, the SQL `BETWEEN` contract).
  *
  * Scale design: NO range cross product and NO nested-loop join. Both
  * sides are mapped onto a shared epoch-bucket grid of `bucketWidth`
  * units: each interval explodes into the buckets it overlaps
  * (`sequence(floor(start/W), floor(end/W))`), each point lands in
  * exactly ONE bucket, and the match becomes an equi-join on
  * `(keys…, bucket)` with the exact `BETWEEN` predicate as a residual
  * filter. Because a point occupies a single bucket, no
  * dedup is needed — every true (point, interval) pair is produced
  * exactly once, by the point's own bucket. Catalyst plans the
  * equi-join as a shuffled hash / sort-merge join (never
  * BroadcastNestedLoop or CartesianProduct — pinned in RangeJoinSpec),
  * so the cost is one shuffle of |P| + Σ⌈len/W⌉ rows and AQE absorbs
  * bucket skew. This is the bucketed range-join formulation the
  * dedicated engines use for interval joins, re-expressed as a plain
  * Catalyst equi-join so every optimizer rule (pushdown, AQE, codegen)
  * still applies.
  *
  * Choosing `bucketWidth`: the replication factor of an interval is
  * ⌈len/W⌉ + 1 at worst, while a too-wide W puts unrelated rows in one
  * bucket and shifts work to the residual filter. W ≈ the typical
  * interval length (see [[autoWidth]]) keeps replication ≤ 2× while
  * bounding bucket population — the standard tuning rule. Degenerate
  * intervals (`end < start`) can contain no point and are dropped
  * before expansion (they would otherwise hit `sequence`'s
  * descending-step inference and replicate uselessly).
  */
object RangeJoin {

  /** Inner containment join of `points` to `intervals` on `keys` plus
    * `pointCol ∈ [startCol, endCol]`. All three bound columns must be
    * integral epochs on the same unit (cast timestamps with
    * `unix_micros` first — second-truncation would move sub-second
    * points across interval edges). Non-key output columns of the two
    * sides must be disjoint (same contract as a SQL `USING` join).
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      pointCol: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long
  ): DataFrame = {
    require(bucketWidth > 0, "range join: bucketWidth must be positive")
    val overlap = points.columns.filterNot(keys.contains)
      .intersect(intervals.columns.filterNot(keys.contains))
    require(overlap.isEmpty,
      s"range join: non-key column(s) ${overlap.mkString(", ")} exist on both sides; alias one side first")
    val reserved = Seq("__bucket").intersect(points.columns.toSeq ++ intervals.columns.toSeq)
    require(reserved.isEmpty, s"range join: column name(s) ${reserved.mkString(", ")} are reserved")

    def bucketOf(c: Column): Column = floor(c.cast(LongType) / bucketWidth).cast(LongType)

    val ib = intervals
      .filter(col(endCol) >= col(startCol))
      .withColumn("__bucket", explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol)))))
    val pb = points.withColumn("__bucket", bucketOf(col(pointCol)))
    pb.join(ib, keys :+ "__bucket")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bucket")
  }

  /** Data-derived bucket width: the median interval length (one bounded
    * scalar aggregate over the interval side — the Decontaminate sizing
    * pattern), clamped ≥ 1. Deterministic for a given interval set
    * (approx_percentile is a deterministic sketch).
    */
  def autoWidth(intervals: DataFrame, startCol: String, endCol: String): Long = {
    val Array(w) = intervals
      .filter(col(endCol) >= col(startCol))
      .agg(coalesce(
        percentile_approx(
          (col(endCol).cast(LongType) - col(startCol).cast(LongType)) + 1L,
          lit(0.5), lit(10000)),
        lit(1L)))
      .collect().map(_.getLong(0))
    math.max(w, 1L)
  }
}
