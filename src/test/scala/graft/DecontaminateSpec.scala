package graft

import org.apache.spark.sql.functions._
import graft.operators.Decontaminate

/** Benchmark decontamination: planted contamination is flagged with the
  * right distinct-gram overlap counts, clean docs stay clean, and the
  * past-budget shuffled fallback returns the identical screen.
  */
class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val train = Seq(
    (1L, "alpha beta gamma delta"),            // shares "alpha beta gamma" with eval
    (2L, "one two three four"),                // zero-overlap control
    (3L, ""),                                  // blank: zero grams, never contaminated
    (4L, "alpha beta gamma alpha beta gamma"), // within-doc repeats count once
    (5L, "tiny doc")                           // shorter than the gram width
  ).toDF("doc_id", "text")
  private val eval = Seq(
    (100L, "alpha beta gamma zzz")
  ).toDF("doc_id", "text")

  private val expected = Map(
    1L -> ((2, 1L, true)),
    2L -> ((2, 0L, false)),
    3L -> ((0, 0L, false)),
    // distinct 3-grams of doc 4: "alpha beta gamma", "beta gamma alpha",
    // "gamma alpha beta" — exactly one occurs in the eval set
    4L -> ((3, 1L, true)),
    5L -> ((0, 0L, false))
  )

  private def screen(budget: Long) =
    Decontaminate.ngramOverlap(train, eval, "doc_id", "text", n = 3, gramBroadcastBytes = budget)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getBoolean(3))))
      .toMap

  test("planted contamination flagged; clean, blank and short docs stay clean") {
    assert(screen(-1L) == expected)
  }

  test("past-budget shuffled fallback returns the identical screen") {
    // budget 0 forces the non-broadcast path; results must not depend on
    // which join strategy carried the eval grams
    assert(screen(0L) == expected)
  }

  test("contaminatedIds == ngramOverlap's contaminated set, text and tokens variants, both join paths") {
    val want = expected.collect { case (id, (_, _, true)) => id }.toSet
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.collect().map(_.getLong(0)).toSet
    assert(ids(Decontaminate.contaminatedIds(train, eval, "doc_id", "text", n = 3)) == want)
    // budget 0 forces the un-collected eval side (shuffled semi join)
    assert(ids(Decontaminate.contaminatedIds(train, eval, "doc_id", "text", n = 3,
      gramBroadcastBytes = 0L)) == want)
    val trainToks = train.select($"doc_id", graft.functions.Text.tokens($"text").as("a"))
    assert(ids(Decontaminate.contaminatedIdsTokens(
      trainToks, "doc_id", "a", eval, "text", n = 3)) == want)
  }

  test("disjoint corpora: nothing contaminated") {
    val cleanEval = Seq((200L, "p q r s t u v w")).toDF("doc_id", "text")
    val got = Decontaminate.ngramOverlap(train, cleanEval, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(got.values.forall(_ == false) && got.size == 5)
  }

  private def bloomScreen(bitsPerGram: Int, numHashes: Int) =
    Decontaminate.ngramOverlapBloom(train, eval, "doc_id", "text", n = 3,
        bitsPerGram = bitsPerGram, numHashes = numHashes)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getBoolean(3))))
      .toMap

  test("bloom-pruned screen equals the exact screen") {
    assert(bloomScreen(12, 5) == expected)
  }

  test("a saturated bloom (high fpp) still yields the exact result — false positives die in the verify") {
    // 2 bits/gram with 1 hash ≈ everything collides; only the exact
    // semi-join keeps the answer right
    assert(bloomScreen(2, 1) == expected)
  }

  test("bloom bit budget is enforced") {
    val e = intercept[IllegalArgumentException] {
      Decontaminate.ngramOverlapBloom(train, eval, "doc_id", "text", n = 3, maxBits = 16L)
    }
    assert(e.getMessage.contains("maxBits"))
  }

  test("the probe is a map-side filter on the train grams (bloom literal, no gram broadcast)") {
    val df = Decontaminate.ngramOverlapBloom(train, eval, "doc_id", "text", n = 3)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("shiftright"), "k-probe bit tests must appear in the plan")
  }
}
