package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Surrogate
import graft.sources.Tables

/** Two-phase distributed surrogate keys: identical ids to the
  * single-task window formulation on a unique order key, without the
  * Exchange SinglePartition bottleneck.
  */
class SurrogateSpec extends SparkSpec {

  test("denseId == row_number window formulation on a unique key") {
    val c = Tables.customer(spark, sfDir).select("c_custkey", "c_name")
    val got = Surrogate.denseId(c, "sk", Seq(col("c_name")))
      .select("c_name", "sk").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ref = c.select(col("c_name"),
        row_number().over(Window.orderBy(col("c_name"))).cast("long").as("sk"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == ref)
    assert(got.values.min == 1L && got.values.max == got.size.toLong)
  }

  test("denseId never plans a single-partition exchange") {
    val c = Tables.customer(spark, sfDir)
    val plan = Surrogate.denseId(c, "sk", Seq(col("c_name")))
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("SinglePartition"),
      s"two-phase numbering must not serialize into one task:\n$plan")
    // the window twin DOES — that is the bottleneck this replaces
    val windowPlan = c.select(row_number().over(Window.orderBy(col("c_name"))))
      .queryExecution.executedPlan.toString()
    assert(windowPlan.contains("SinglePartition"))
  }

  test("denseId is deterministic across runs") {
    val c = Tables.customer(spark, sfDir)
    def ids() = Surrogate.denseId(c, "sk", Seq(col("c_name")))
      .select("c_custkey", "sk").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ids() == ids())
  }
}
