package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed deterministic surrogate keys.
  *
  * `row_number().over(Window.orderBy(...))` — the reference's sequence
  * semantics (SURVEY §1.1) — plans an Exchange SinglePartition: one task
  * sorts the whole relation. Deliberate and harmless for the
  * reference-scale dims (≤ thousands of rows, see `filmdb/Warehouse`),
  * but a billion-row dim needs the two-phase formulation this operator
  * provides: range-partition on the order key (distributed sort — the
  * range boundaries come from Spark's deterministic per-partition-seed
  * sampling), count rows per partition (one lightweight job — exactly
  * what RDD.zipWithIndex runs), then assign each partition's ids from
  * its offset in a map pass. Same ids as the window formulation
  * whenever the order key is unique (asserted in SurrogateSpec and
  * oracle-gated as etl06); ties are ordered arbitrarily in BOTH
  * formulations.
  */
object Surrogate {

  /** Append a dense 1-based LongType id column ordered by `orderCols`. */
  def denseId(
      df: DataFrame,
      idName: String,
      orderCols: Seq[Column],
      numPartitions: Int = 0
  ): DataFrame = {
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val sorted = df
      .repartitionByRange(parts, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val schema = StructType(sorted.schema.fields :+ StructField(idName, LongType, nullable = false))
    val withId = sorted.rdd
      .zipWithIndex()
      .map { case (row, i) => Row.fromSeq(row.toSeq :+ (i + 1L)) }
    df.sparkSession.createDataFrame(withId, schema)
  }
}
