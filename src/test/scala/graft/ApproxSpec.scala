package graft

import org.apache.spark.sql.functions._

/** Approximate-aggregate alternates (q28): HLL++ distinct counts and
  * approx percentiles must land within tight relative error of the
  * exact aggregates — the accuracy contract that justifies using them
  * at 100 TB where exact COUNT(DISTINCT) shuffles every value.
  */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  test("raw sketches: approx distinct and approx median within 2% of exact") {
    val o = graft.sources.Tables.orders(spark, sfDir)
    val rows = o.groupBy($"o_orderstatus")
      .agg(
        countDistinct($"o_custkey").as("d"),
        expr("percentile(o_totalprice, 0.5)").as("med"),
        approx_count_distinct($"o_custkey", 0.01).as("da"),
        expr("approx_percentile(o_totalprice, 0.5, 5000)").as("meda")
      )
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (d, da) = (r.getAs[Long]("d"), r.getAs[Long]("da"))
      val (med, meda) = (r.getAs[Double]("med"), r.getAs[Double]("meda"))
      assert(math.abs(da - d).toDouble / d <= 0.02, s"${r.getString(0)} distinct: approx $da vs exact $d")
      assert(math.abs(meda - med) / med <= 0.02, s"${r.getString(0)} median: approx $meda vs exact $med")
    }
  }

  test("q28 carries the bound check in-plan: approx_ok true for every group") {
    val rows = SparkEntry.queries("q28_approx_kpis")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Boolean]("approx_ok"), s"${r.getString(0)} sketch out of bound"))
  }
}
