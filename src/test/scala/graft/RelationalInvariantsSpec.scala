package graft

import org.apache.spark.sql.DataFrame

/** Cross-query invariants on the sf0.001 fixture. The per-value gate is
  * the DuckDB oracle (tools/check_oracle.py); these assert internal
  * consistency: different operator formulations must agree on totals.
  */
class RelationalInvariantsSpec extends SparkSpec {

  private def run(name: String): DataFrame = SparkEntry.queries(name)(spark, sfDir)

  test("every catalog query returns rows and its oracle names exist") {
    val qs = SparkEntry.queries
    assert(qs.size >= 40, s"expected >= 40 catalog entries, got ${qs.size}")
    SparkEntry.oracleSql.keys.foreach(k => assert(qs.contains(k), s"oracle for unknown query $k"))
  }

  test("entry: flagship query smoke (driver contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("global KPIs equal segment rollup totals (q11 vs q12 vs q21)") {
    val kpi = run("q11_global_kpis").collect().head
    val caTotal = kpi.getAs[Double]("ca_total")
    val nOrders = kpi.getAs[Long]("n_orders")
    val segs = run("q12_case_segments").collect()
    assert(math.abs(segs.map(_.getAs[Double]("ca")).sum - caTotal) < 1e-6)
    assert(segs.map(_.getAs[Long]("n_orders")).sum == nOrders)
    val rollup = run("q21_rollup_total").collect()
    val total = rollup.find(_.getString(0) == "TOTAL").get
    val parts = rollup.filter(_.getString(0) != "TOTAL")
    assert(math.abs(parts.map(_.getAs[Double]("ca")).sum - total.getAs[Double]("ca")) < 1e-6)
  }

  test("pareto cumulative share ends at exactly 1 (q19)") {
    val rows = run("q19_pareto").collect()
    assert(math.abs(rows.last.getAs[Double]("part_cumul") - 1.0) < 1e-12)
    val cum = rows.map(_.getAs[Double]("part_cumul"))
    assert(cum.zip(cum.tail).forall { case (a, b) => a <= b + 1e-12 }, "cumulative share non-decreasing")
  }

  test("anti join consistent with orders (q05)") {
    val never = run("q05_never_ordered").collect().map(_.getLong(0)).toSet
    val withOrders = graft.sources.Tables.orders(spark, sfDir)
      .select("o_custkey").distinct().collect().map(_.getLong(0)).toSet
    assert(never.intersect(withOrders).isEmpty)
    val all = graft.sources.Tables.customer(spark, sfDir).count()
    assert(never.size + withOrders.size == all)
  }

  test("date spine covers every day with zero-fill (q09)") {
    val rows = run("q09_date_spine").collect()
    val days = rows.map(_.getDate(0).toLocalDate)
    assert(days.zip(days.tail).forall { case (a, b) => b == a.plusDays(1) }, "dense daily spine")
    assert(rows.map(_.getAs[Long]("n_orders")).sum ==
      graft.sources.Tables.orders(spark, sfDir).count())
  }

  test("monthly growth window math (q16)") {
    val rows = run("q16_monthly_growth").collect()
    assert(rows.head.isNullAt(rows.head.fieldIndex("ca_prec")), "first month has no predecessor")
    rows.sliding(2).foreach {
      case Array(prev, cur) =>
        assert(cur.getAs[Double]("ca_prec") == prev.getAs[Double]("ca"))
        val mom = cur.getAs[Double]("croissance_mom")
        val expected = (cur.getAs[Double]("ca") - prev.getAs[Double]("ca")) / prev.getAs[Double]("ca")
        assert(math.abs(mom - expected) < 1e-12)
      case _ =>
    }
  }

  test("rfm ntile scores partition customers into 5 balanced tiles (q18)") {
    val rows = run("q18_rfm_ntile").collect()
    val byTile = rows.groupBy(_.getAs[Int]("score_m")).view.mapValues(_.length)
    assert(byTile.keys.toSet == Set(1, 2, 3, 4, 5))
    assert(byTile.values.max - byTile.values.min <= 1, "NTILE balance property")
  }

  test("rolling 7-row window sums trailing daily values (q17)") {
    val rows = run("q17_rolling_7d").collect().groupBy(_.getString(0))
    rows.values.foreach { days =>
      val sorted = days.sortBy(_.getDate(1).toLocalDate.toEpochDay)
      sorted.zipWithIndex.foreach { case (r, i) =>
        val expected = sorted.slice(math.max(0, i - 6), i + 1).map(_.getAs[Double]("ca")).sum
        assert(math.abs(r.getAs[Double]("ca_7j") - expected) < 1e-6)
      }
    }
  }

  test("upsert query arithmetic (u01): merged price bump visible") {
    val merged = run("u01_upsert_merge").collect().map(_.getAs[Double]("ca")).sum
    val base = run("q11_global_kpis").collect().head.getAs[Double]("ca_total")
    assert(merged != base, "merge must change totals (bumped prices + dropped keys)")
  }
}
