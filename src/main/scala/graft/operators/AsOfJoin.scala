package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (most-recent-prior) join — the temporal lookup the reference's
  * SQL surface has no operator for and Spark lacks natively: for each
  * left row, attach the latest right row of the same key with
  * right.time <= left.time.
  *
  * Scale design: NO range cross product and NO per-row subquery. Both
  * sides are tagged and unioned, then a single shuffle on the key sorts
  * each key's timeline once; a running `last(payload, ignoreNulls)` over
  * (time, tag) carries the newest right payload forward onto every left
  * row. Cost is one shuffle + one sort-within-partition of |L|+|R| rows
  * — the same plan shape at 100 TB, with AQE absorbing key skew. This is
  * the standard distributed as-of formulation (union + ordered window)
  * rather than the single-node merge DuckDB's ASOF JOIN runs.
  *
  * Determinism: right rows sharing (key, time) resolve to the one with
  * the greatest `rightOrder` value (they sort ascending before the
  * window's `last`); a right row exactly at the left row's time IS
  * visible (inclusive bound), because right rows (tag 0) order before
  * left rows (tag 1) at equal times.
  */
object AsOfJoin {

  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      rightOrder: String,
      prefix: String = "prev_"
  ): DataFrame = {
    val leftCols = left.columns.filterNot(keys.contains).toSeq
    // a prefixed payload column sharing a left column's name would let the
    // carried-forward right value silently shadow (or be shadowed by) the
    // left column — refuse instead of guessing
    val clash = payload.map(prefix + _).intersect(left.columns.toSeq)
    require(
      clash.isEmpty,
      s"as-of join: prefixed payload column(s) ${clash.mkString(", ")} collide with left columns; choose a different prefix")
    val reserved = Seq("__ts", "__tag", "__ord").intersect(left.columns.toSeq ++ payload.map(prefix + _))
    require(reserved.isEmpty, s"as-of join: column name(s) ${reserved.mkString(", ")} are reserved")

    val rTagged = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as("__ts"), lit(0).as("__tag"), col(rightOrder).as("__ord")) ++
        payload.map(c => col(c).as(prefix + c)) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*
    )
    val lTagged = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("__ts"), lit(1).as("__tag"), lit(null).cast(right.schema(rightOrder).dataType).as("__ord")) ++
        payload.map(c => lit(null).cast(right.schema(c).dataType).as(prefix + c)) ++
        leftCols.map(col): _*
    )

    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__tag"), col("__ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = payload.foldLeft(rTagged.unionByName(lTagged)) { (df, c) =>
      df.withColumn(prefix + c, last(col(prefix + c), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("__tag") === 1)
      .drop("__ts", "__tag", "__ord")
  }
}
