package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

/** Salted skew join must be row-identical to the plain inner join. */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  // hot key: 'a' carries 1000 of 1003 rows
  private def fixture = {
    val big = ((1 to 1000).map(i => ("a", i)) ++ Seq(("b", 1), ("c", 2), ("d", 3)))
      .toDF("k", "v")
    val small = Seq(("a", 10.0), ("b", 20.0), ("c", 30.0)).toDF("k", "w")
    (big, small)
  }

  test("salted join equals plain join on a skewed fixture (no loss, no dup)") {
    val (big, small) = fixture
    val plain = big.join(small, Seq("k")).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).sorted
    val salted = SkewJoin.salted(big, small, "k", salts = 16).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).sorted
    assert(salted.length == 1002, "d has no match; a/b/c rows all survive once")
    assert(salted.toSeq == plain.toSeq)
  }

  test("saltAll (the pre-split primitive) also equals the plain join") {
    val (big, small) = fixture
    val plain = big.join(small, Seq("k")).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).sorted
    val salted = SkewJoin.saltAll(big, small, "k", salts = 16).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).sorted
    assert(salted.toSeq == plain.toSeq)
  }

  test("sampled census finds exactly the hot key") {
    val (big, _) = fixture
    assert(SkewJoin.hotKeys(big, "k") == Seq("a"),
      "only 'a' (1000 of 1003 rows) crosses the reducer-load threshold")
  }

  test("cold keys are not replicated: the plan splits into a salted and a plain join") {
    val (big, small) = fixture
    val df = SkewJoin.salted(big, small, "k", salts = 16)
    val joins = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    val (saltedJoins, plainJoins) =
      joins.partition(_.condition.exists(_.toString.contains("__salt")))
    assert(saltedJoins.nonEmpty, "hot branch must join on (key, __salt)")
    assert(plainJoins.nonEmpty, "cold branch must join on the bare key — no salt, no replication")
    // the explode that replicates the small side appears ONLY under the
    // hot branch: the whole plan carries exactly one explode
    val explodes = df.queryExecution.optimizedPlan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }
    assert(explodes.size == 1, s"expected one explode (hot small side), got ${explodes.size}")
  }

  test("no hot keys -> pure plain join (no salt machinery in the plan)") {
    // uniform keys: nobody crosses the threshold
    val big = (1 to 64).map(i => (s"k$i", i)).toDF("k", "v")
    val small = (1 to 64).map(i => (s"k$i", i * 1.0)).toDF("k", "w")
    assert(SkewJoin.hotKeys(big, "k").isEmpty)
    val df = SkewJoin.salted(big, small, "k", salts = 16)
    assert(!df.queryExecution.optimizedPlan.toString.contains("__salt"))
    assert(df.count() == 64)
  }

  test("census truncation past MaxHotKeys never inflates hotness (full-sample denominator)") {
    // 475k singleton-ish keys (20 rows each) push the collected census
    // far past the 65536-key head; one 500k-row key holds a 5% share —
    // well under hotFactor x avg-reducer (2 x 10M/8 = 2.5M), so it must
    // NOT be hot. A head-only total (~1.8M) would halve the threshold
    // into wrongly salting it.
    import spark.implicits._
    val big = spark.range(0, 9500000L, 1, 8)
      .select((col("id") % 475000L).cast("string").as("k"))
      .unionAll(spark.range(0, 500000L, 1, 8).select(lit("whale").as("k")))
    val hot = SkewJoin.hotKeys(big, "k", sampleFraction = 1.0)
    assert(hot.isEmpty, s"no key holds a 2x reducer share, but got hot=$hot")
  }

  test("salting actually spreads the hot key across salt values") {
    val big = (1 to 1000).map(i => ("hot", i)).toDF("k", "v")
    val salts = big
      .withColumn("__salt", pmod(xxhash64(struct(col("k"), col("v"))), lit(16)).cast("int"))
      .select("__salt").distinct().count()
    assert(salts >= 12, s"expected most of 16 salt values used, got $salts")
  }
}
