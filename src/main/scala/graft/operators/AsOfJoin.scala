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
  * each key's timeline once; a running `last(ignoreNulls)` over
  * (time, tag) carries the newest right row's payload STRUCT forward
  * onto every left row (struct-wholesale, so null payload FIELDS are
  * real data, never confused with the no-prior-row sentinel). Cost is one shuffle + one sort-within-partition of |L|+|R| rows
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
    val reserved = Seq("__ts", "__tag", "__ord", "__pay")
      .intersect(left.columns.toSeq ++ payload.map(prefix + _))
    require(reserved.isEmpty, s"as-of join: column name(s) ${reserved.mkString(", ")} are reserved")

    // The payload travels as ONE struct, not per-column: right rows get
    // a non-null struct (its FIELDS may be legitimately null), left
    // rows a null struct. last(ignoreNulls) then skips exactly the
    // left rows and carries the most recent right row WHOLESALE — a
    // per-column carry would overload null as both the "no prior right
    // row" sentinel and real data, resurrecting a stale older value
    // when the true latest right row holds null, and could even stitch
    // fields of DIFFERENT right rows into one output row.
    val payType = org.apache.spark.sql.types.StructType(
      payload.map(c => org.apache.spark.sql.types.StructField(
        prefix + c, right.schema(c).dataType, nullable = true)))
    val rTagged = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as("__ts"), lit(0).as("__tag"), col(rightOrder).as("__ord"),
          struct(payload.map(c => col(c).as(prefix + c)): _*).as("__pay")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*
    )
    val lTagged = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("__ts"), lit(1).as("__tag"),
          lit(null).cast(right.schema(rightOrder).dataType).as("__ord"),
          lit(null).cast(payType).as("__pay")) ++
        leftCols.map(col): _*
    )

    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__tag"), col("__ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    rTagged.unionByName(lTagged)
      .withColumn("__pay", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(
        keys.map(col) ++
          payload.map(c => col("__pay." + prefix + c).as(prefix + c)) ++
          leftCols.map(col): _*
      )
  }
}
