package graft

import org.apache.spark.sql.functions._

/** Approximate-aggregate alternates (q28): HLL++ distinct counts and
  * approx percentiles must land within tight relative error of the
  * exact aggregates — the accuracy contract that justifies using them
  * at 100 TB where exact COUNT(DISTINCT) shuffles every value.
  */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  test("approx distinct within 2% and approx median within 2% of exact") {
    val o = graft.sources.Tables.orders(spark, sfDir)
    val exact = o.groupBy($"o_orderstatus")
      .agg(
        countDistinct($"o_custkey").as("d"),
        expr("percentile(o_totalprice, 0.5)").as("med")
      )
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val approx = SparkEntry.queries("q28_approx_kpis")(spark, sfDir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, (d, med)) =>
      val (da, meda) = approx(k)
      assert(math.abs(da - d).toDouble / d <= 0.02, s"$k distinct: approx $da vs exact $d")
      assert(math.abs(meda - med) / med <= 0.02, s"$k median: approx $meda vs exact $med")
    }
  }
}
