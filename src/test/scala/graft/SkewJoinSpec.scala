package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

/** Salted skew join must be row-identical to the plain inner join. */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on a skewed fixture (no loss, no dup)") {
    // hot key: 'a' carries 1000 of 1003 rows
    val big = ((1 to 1000).map(i => ("a", i)) ++ Seq(("b", 1), ("c", 2), ("d", 3)))
      .toDF("k", "v")
    val small = Seq(("a", 10.0), ("b", 20.0), ("c", 30.0)).toDF("k", "w")
    val plain = big.join(small, Seq("k")).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).sorted
    val salted = SkewJoin.salted(big, small, "k", salts = 16).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).sorted
    assert(salted.length == 1002, "d has no match; a/b/c rows all survive once")
    assert(salted.toSeq == plain.toSeq)
  }

  test("salting actually spreads the hot key across salt values") {
    val big = (1 to 1000).map(i => ("hot", i)).toDF("k", "v")
    val salts = big
      .withColumn("__salt", pmod(xxhash64(struct(col("k"), col("v"))), lit(16)).cast("int"))
      .select("__salt").distinct().count()
    assert(salts >= 12, s"expected most of 16 salt values used, got $salts")
  }
}
