package graft

import org.apache.spark.sql.functions._
import graft.operators.Curate

/** The curation selectors (d33/d34/d35): token-budget selection,
  * deterministic training order, quality-aware cluster survivors —
  * exact boundary semantics and the two-phase plan shape (no
  * single-partition exchange anywhere in the selection path).
  */
class CurateSpec extends SparkSpec {
  import spark.implicits._

  private def noSinglePartitionExchange(df: org.apache.spark.sql.DataFrame): Unit = {
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"selection path planned a single-partition exchange:\n$plan")
  }

  test("budgetSelect: greedy prefix under the budget, ties broken by id") {
    val prepared = Seq(
      // (id, score, weight)
      (1L, 1.0, 40L), (2L, 0.5, 30L), (3L, 1.0, 40L), (4L, 0.25, 10L), (5L, 0.5, 25L)
    ).toDF("doc_id", "score", "poids")
    // order: 1 (1.0), 3 (1.0), 2 (0.5), 5 (0.5), 4 (0.25)
    // cums:  40, 80, 110, 135, 145 — budget 110 keeps 1, 3, 2
    val got = Curate.budgetSelect(prepared, "doc_id", "score", "poids", budget = 110L)
      .orderBy(col("rang"))
      .select(col("doc_id"), col("rang"), col("cum"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 1L, 40L), (3L, 2L, 80L), (2L, 3L, 110L)))
  }

  test("budgetSelect: a non-long weight column is cast, not a runtime ClassCastException") {
    // the public contract advertises arbitrary prepared relations —
    // an INT (or DOUBLE) weight must behave like its long value
    val prepared = Seq((1L, 1.0, 40), (2L, 0.5, 30), (3L, 0.25, 10))
      .toDF("doc_id", "score", "poids")
    val got = Curate.budgetSelect(prepared, "doc_id", "score", "poids", budget = 70L)
      .orderBy(col("rang"))
      .select(col("doc_id"), col("cum"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 40L), (2L, 70L)))
  }

  test("budgetSelect: fractional and non-numeric weights are rejected, not truncated") {
    // cast(LongType) truncates 0.9 → 0 (a doc consuming NO budget) and
    // turns a non-numeric weight into null — both must fail loudly with
    // the integral-weights message instead of silently changing the
    // selection semantics
    val fractional = Seq((1L, 1.0, 40.9), (2L, 0.5, 30.0))
      .toDF("doc_id", "score", "poids")
    val e1 = intercept[Exception] {
      Curate.budgetSelect(fractional, "doc_id", "score", "poids", budget = 100L).collect()
    }
    assert(e1.getMessage.contains("non-integral") || e1.getMessage.contains("integral"))
    val nonNumeric = Seq((1L, 1.0, "forty"), (2L, 0.5, "30"))
      .toDF("doc_id", "score", "poids")
    val e2 = intercept[Exception] {
      Curate.budgetSelect(nonNumeric, "doc_id", "score", "poids", budget = 100L).collect()
    }
    assert(e2.getMessage.contains("non-numeric") || e2.getMessage.contains("integral"))
    // an integral DOUBLE is a valid long value — it must pass the
    // exactness check, not be rejected alongside true fractions
    val integralDouble = Seq((1L, 1.0, 40.0), (2L, 0.5, 30.0))
      .toDF("doc_id", "score", "poids")
    val ok = Curate.budgetSelect(integralDouble, "doc_id", "score", "poids", budget = 70L)
      .orderBy(col("rang")).select(col("doc_id"), col("cum"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(ok.toSeq == Seq((1L, 40L), (2L, 70L)))
  }

  test("budgetSelect: a document crossing the budget is dropped with everything after it") {
    val prepared = Seq((1L, 2.0, 60L), (2L, 1.0, 50L), (3L, 0.5, 5L))
      .toDF("doc_id", "score", "poids")
    // cums 60, 110, 115 — budget 100 keeps only doc 1 (prefix semantics:
    // doc 3 alone would fit, but the running total is already past)
    val got = Curate.budgetSelect(prepared, "doc_id", "score", "poids", budget = 100L)
      .select(col("doc_id")).as[Long].collect().toSeq
    assert(got == Seq(1L))
  }

  test("budgetSelect: budget 0 selects nothing; budget >= total selects and ranks everything") {
    val prepared = Seq((1L, 1.0, 10L), (2L, 0.5, 10L)).toDF("doc_id", "score", "poids")
    assert(Curate.budgetSelect(prepared, "doc_id", "score", "poids", 0L).count() == 0L)
    val all = Curate.budgetSelect(prepared, "doc_id", "score", "poids", 1000L)
      .orderBy(col("rang")).select(col("doc_id"), col("cum"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(all.toSeq == Seq((1L, 10L), (2L, 20L)))
  }

  test("budgetSelect plans the two-phase pass, never a single-partition window") {
    val docs = sources.Tables.documents(spark, sfDir)
    val prepared = docs.select(
      col("doc_id"),
      functions.Text.qualityScore(col("text")).as("q"),
      functions.Text.tokenCount(col("text")).cast("long").as("w"))
    noSinglePartitionExchange(Curate.budgetSelect(prepared, "doc_id", "q", "w", 5000L))
  }

  test("trainingOrder: a dense deterministic permutation, stable across runs") {
    val docs = sources.Tables.documents(spark, sfDir)
    val n = docs.count()
    val a = Curate.trainingOrder(docs, "doc_id", "epoch1")
    val rows = a.collect()
    assert(rows.length == n)
    // dense gapless ranks 1..n
    assert(rows.map(_.getLong(2)).sorted.toSeq == (1L to n).toSeq)
    // deterministic: a second independent run agrees exactly
    val b = Curate.trainingOrder(docs, "doc_id", "epoch1").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(2))).toMap ==
      b.map(r => (r.getLong(0), r.getLong(2))).toMap)
    // a different seed is a different permutation
    val c = Curate.trainingOrder(docs, "doc_id", "epoch2").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(2))).toMap !=
      c.map(r => (r.getLong(0), r.getLong(2))).toMap)
    noSinglePartitionExchange(Curate.trainingOrder(docs, "doc_id", "epoch1"))
  }

  test("bestSurvivors: highest score wins, ties go to the lowest id, singletons pass through") {
    val clusters = Seq((10L, 1L), (11L, 1L), (12L, 1L), (20L, 2L), (21L, 2L), (30L, 3L))
      .toDF("id", "cluster_id")
    val scored = Seq(
      (10L, 0.5), (11L, 0.75), (12L, 0.75), // tie at 0.75 -> 11 (lowest id)
      (20L, 0.25), (21L, 1.0),              // clear max -> 21
      (30L, 0.0)                            // singleton -> itself
    ).toDF("doc_id", "q")
    val got = Curate.bestSurvivors(scored, clusters, "doc_id", "q")
      .orderBy(col("cluster_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 11L, 0.75, 3L),
      (2L, 21L, 1.0, 2L),
      (3L, 30L, 0.0, 1L)))
  }

  test("bestSurvivors plans a partial-aggregating groupBy, not a per-cluster window") {
    val clusters = Seq((10L, 1L), (11L, 1L)).toDF("id", "cluster_id")
    val scored = Seq((10L, 0.5), (11L, 0.75)).toDF("doc_id", "q")
    val plan = Curate.bestSurvivors(scored, clusters, "doc_id", "q")
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_max") || plan.contains("HashAggregate"),
      s"expected an aggregate-based argmax:\n$plan")
    assert(!plan.contains("Window"), s"argmax must not plan a window:\n$plan")
  }

  test("percentileRank: ties share the percentile, rang stays dense; the (n-1) floor guards a 1-row corpus") {
    val prepared = Seq(
      (1L, 0.2), (2L, 0.5), (3L, 0.5), (4L, 0.9)
    ).toDF("doc_id", "q")
    val got = Curate.percentileRank(prepared, "doc_id", "q")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2), r.getDouble(3)))).toMap
    // order (q, id): 1 → rang 1 pct 0/3; 2,3 tie at rank 2 → pct 1/3; 4 → rank 4 pct 3/3
    def r6(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Map(
      1L -> ((0.2, 1L, 0.0)),
      2L -> ((0.5, 2L, r6(1.0 / 3))),
      3L -> ((0.5, 3L, r6(1.0 / 3))),
      4L -> ((0.9, 4L, 1.0))
    ))
    val single = Curate.percentileRank(Seq((7L, 0.4)).toDF("doc_id", "q"), "doc_id", "q")
      .collect().head
    assert(single.getLong(2) == 1L && single.getDouble(3) == 0.0)
    // the scale guard here is "no corpus-order window": the n scalar's
    // 1-row final aggregate legitimately plans a SinglePartition
    // exchange carrying one row per partition, but a
    // percent_rank().over(Window.orderBy(score)) — the formulation this
    // operator exists to avoid — would sort the corpus in ONE task
    val plan = Curate.percentileRank(prepared, "doc_id", "q")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"percentile must derive from the two-phase rank:\n$plan")
  }

  test("sourceDrift: a single source IS the corpus — KL exactly zero, argmax tie goes to token asc") {
    val docs = Seq((1L, "a b", "s0"), (2L, "b", "s0")).toDF("doc_id", "text", "source")
    val got = Curate.sourceDrift(docs, "doc_id", "text", "source").collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getString(0) == "s0" && r.getLong(1) == 2L && r.getLong(2) == 3L)
    assert(r.getDouble(3) == 0.0, "p == q exactly when the source is the whole corpus")
    assert(r.getString(4) == "a", "all contributions tie at 0.0 — smallest token wins")
    assert(r.getDouble(5) == 0.0)
  }

  test("sourceDrift: two divergent sources match the hand formula; top contributor is the enriched token") {
    val docs = Seq(
      (1L, "x x x", "A"),
      (2L, "y", "B"),
      (3L, null.asInstanceOf[String], "B") // counted in n_docs, contributes no tokens
    ).toDF("doc_id", "text", "source")
    val got = Curate.sourceDrift(docs, "doc_id", "text", "source").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4), r.getDouble(5)))).toMap
    // vocab = {x: 3, y: 1}, K = 2, Nq = 4; add-half smoothing
    def p(c: Long, n: Long) = (c + 0.5) / (n + 0.5 * 2)
    def contrib(c: Long, n: Long, ct: Long) =
      p(c, n) * math.log(p(c, n) / p(ct, 4))
    def r6(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val klA = r6(contrib(3, 3, 3) + contrib(0, 3, 1))
    val klB = r6(contrib(0, 1, 3) + contrib(1, 1, 1))
    assert(got("A") == ((1L, 3L, klA, "x", r6(contrib(3, 3, 3)))))
    assert(got("B") == ((2L, 1L, klB, "y", r6(contrib(1, 1, 1)))))
    assert(got("A")._3 > 0.0 && got("B")._3 > 0.0)
  }

  test("sourceDrift plans aggregates only — no window, and the KL path never windows the corpus") {
    val docs = Seq((1L, "x", "A"), (2L, "y", "B")).toDF("doc_id", "text", "source")
    val plan = Curate.sourceDrift(docs, "doc_id", "text", "source")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"drift must aggregate, never window:\n$plan")
  }
}
