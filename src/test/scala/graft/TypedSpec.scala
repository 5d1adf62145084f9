package graft

import org.apache.spark.sql.functions._
import graft.typed.Typed

/** Typed Dataset + custom Aggregator surface. */
class TypedSpec extends SparkSpec {
  import spark.implicits._

  test("typed groupByKey + Aggregators equal the untyped decimal aggregation") {
    val typed = Typed.caByStatus(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val untyped = graft.sources.Tables.orders(spark, sfDir)
      .groupBy($"o_orderstatus")
      .agg(
        sum($"o_totalprice".cast("decimal(12,2)")).cast("double").as("ca"),
        count(lit(1)).as("n")
      )
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(typed == untyped)
  }

  test("ordered-concat Aggregator matches the sort-normalized collect_set formulation") {
    val words = Seq("delta", "alpha", "charlie", "alpha", "bravo").toDS()
    val agg = words.select(new Typed.OrderedConcat(", ").toColumn).collect().head
    assert(agg == "alpha, bravo, charlie, delta")
    val untyped = words.toDF("w")
      .agg(array_join(array_sort(collect_set($"w")), ", ")).collect().head.getString(0)
    assert(agg == untyped)
  }

  test("typed aggregation plans a real distributed aggregate (no collect shortcut)") {
    val p = Typed.caByStatus(spark, sfDir).queryExecution.executedPlan.toString()
    assert(p.contains("Aggregate") || p.contains("aggregate"), p)
    assert(p.contains("Exchange"), "typed agg must shuffle like any aggregate")
  }
}
