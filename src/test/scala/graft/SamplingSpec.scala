package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.Sampling

/** Stratified quota sampling must equal the naive full-rank formulation
  * exactly (same docs, same ranks) while only ranking the candidate
  * slice.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (1 to 3000).map { i =>
    (i.toLong, if (i % 3 == 0) "web" else if (i % 3 == 1) "books" else "code")
  }.toDF("doc_id", "stratum")

  private def naive(quotas: Map[String, Int], default: Int = 0) = {
    val w = Window.partitionBy(col("stratum"))
      .orderBy(md5(concat(col("stratum"), lit(":"), col("doc_id").cast("string"))), col("doc_id"))
    docs
      .withColumn("__q", coalesce(element_at(typedLit(quotas), col("stratum")), lit(default)))
      .withColumn("rang", row_number().over(w))
      .filter(col("rang") <= col("__q"))
      .select(col("doc_id"), col("stratum"), col("rang").cast("long").as("rang"))
      .as[(Long, String, Long)].collect().sorted.toSeq
  }

  test("two-phase sample equals the naive full rank, exact quota sizes") {
    val quotas = Map("web" -> 100, "books" -> 7, "code" -> 1)
    val got = Sampling.stratifiedQuota(docs, "doc_id", "stratum", quotas)
      .as[(Long, String, Long)].collect().sorted.toSeq
    assert(got == naive(quotas))
    val sizes = got.groupBy(_._2).view.mapValues(_.size).toMap
    assert(sizes == Map("web" -> 100, "books" -> 7, "code" -> 1))
  }

  test("quota >= stratum size keeps the whole stratum; 0/unlisted drops it") {
    val quotas = Map("web" -> 100000, "books" -> 0)
    val got = Sampling.stratifiedQuota(docs, "doc_id", "stratum", quotas)
      .as[(Long, String, Long)].collect().sorted.toSeq
    assert(got == naive(quotas))
    assert(got.count(_._2 == "web") == 1000, "web has 1000 docs, all kept")
    assert(!got.exists(_._2 == "books"), "explicit 0 quota drops")
    assert(!got.exists(_._2 == "code"), "unlisted stratum at defaultQuota=0 drops")
  }

  test("defaultQuota applies to unlisted strata") {
    val got = Sampling.stratifiedQuota(docs, "doc_id", "stratum", Map("web" -> 5), defaultQuota = 3)
      .as[(Long, String, Long)].collect().sorted.toSeq
    assert(got == naive(Map("web" -> 5), default = 3))
    assert(got.count(_._2 == "books") == 3 && got.count(_._2 == "code") == 3)
  }

  test("sample is partitioning-invariant (determinism contract)") {
    val quotas = Map("web" -> 50, "books" -> 50, "code" -> 50)
    val a = Sampling.stratifiedQuota(docs.repartition(1), "doc_id", "stratum", quotas)
      .as[(Long, String, Long)].collect().sorted.toSeq
    val b = Sampling.stratifiedQuota(docs.repartition(17, col("doc_id")), "doc_id", "stratum", quotas)
      .as[(Long, String, Long)].collect().sorted.toSeq
    assert(a == b)
  }

  test("stats and fallback joins broadcast — the corpus side never sort-merge-joins") {
    val df = Sampling.stratifiedQuota(docs, "doc_id", "stratum", Map("web" -> 10))
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("SortMergeJoin"),
      "per-stratum stats must come back as broadcast joins, not corpus shuffles")
    assert(!physical.contains("CartesianProduct") && !physical.contains("BroadcastNestedLoopJoin"))
  }

  test("null stratum and null id hash like values — never dropped by the hash") {
    val withNulls = docs.unionByName(Seq(
      (9001L, null.asInstanceOf[String]), (9002L, null.asInstanceOf[String])
    ).toDF("doc_id", "stratum"))
    val got = Sampling.stratifiedQuota(withNulls, "doc_id", "stratum",
        Map("web" -> 2), defaultQuota = 5)
      .as[(Long, String, Long)].collect().toSeq
    // NULL is an unlisted stratum -> defaultQuota=5 covers both rows
    assert(got.count(_._2 == null) == 2, "null-stratum docs sampled under defaultQuota")
  }
}
