package graft

import org.apache.spark.sql.functions._
import graft.operators.LangModel

/** Bigram-LM perplexity scoring (d29): a hand-checked tiny corpus, the
  * score's defining invariants, and edge rows (empty / single-token).
  */
class LangModelSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "a b a b a b"),      // the common pattern — should score best
    (2L, "a b a b x y"),      // half common, half rare
    (3L, "x y q z w v"),      // all-rare bigrams — worst score
    (4L, "a"),                // one token: no bigram to condition on
    (5L, "")                  // empty text
  ).toDF("doc_id", "text")

  private lazy val scored =
    LangModel.bigramScore(corpus, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> r)
      .toMap

  test("hand-checked score on a 2-doc corpus") {
    // corpus: "a b" and "a b" -> bigrams: (a,b)x2; vocab {a,b} V=2
    val two = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    val out = LangModel.bigramScore(two, "doc_id", "text").collect()
    // P(b|a) = (2 + 0.5) / (2 + 0.5*2) = 2.5/3 ; score = ln(2.5/3)
    val expect = BigDecimal(math.log(2.5 / 3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    out.foreach { r =>
      assert(r.getLong(1) === 1L)
      assert(r.getDouble(2) === expect)
    }
  }

  test("ordering: common-pattern doc beats mixed beats all-rare") {
    val s1 = scored(1L).getDouble(2)
    val s2 = scored(2L).getDouble(2)
    val s3 = scored(3L).getDouble(2)
    assert(s1 > s2 && s2 > s3, s"expected $s1 > $s2 > $s3")
  }

  test("scores are log-probabilities: strictly negative, ppl = exp(-score)") {
    Seq(1L, 2L, 3L).foreach { id =>
      val r = scored(id)
      val s = r.getDouble(2)
      assert(s < 0.0)
      val ppl = r.getDouble(3)
      assert(math.abs(ppl - math.exp(-s)) < 1e-4, s"doc $id ppl $ppl vs exp(-$s)")
      assert(ppl > 1.0)
    }
  }

  test("n_bigrams = tokens - 1; sub-2-token docs carry 0 and null scores") {
    assert(scored(1L).getLong(1) === 5L)
    assert(scored(2L).getLong(1) === 5L)
    Seq(4L, 5L).foreach { id =>
      val r = scored(id)
      assert(r.getLong(1) === 0L)
      assert(r.isNullAt(2) && r.isNullAt(3))
    }
  }

  test("deterministic across runs and identical texts score identically") {
    val again = LangModel.bigramScore(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val twin = Seq((10L, "a b a b a b"), (11L, "a b a b a b")).toDF("doc_id", "text")
      .union(corpus.select($"doc_id" + 100, $"text"))
    val tw = LangModel.bigramScore(twin, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    scored.foreach { case (id, r) =>
      assert(again(id) === (if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    }
    assert(tw(10L) === tw(11L))
  }

  test("bigramScore == independent collections reference on a pseudo-random corpus") {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val vocab = Vector("alpha", "beta", "gamma", "dd", "ee", "f")
    val texts = (0L until 40L).map { id =>
      val n = 1 + math.floorMod(mix(id), 9L).toInt
      id -> (0 until n)
        .map(i => vocab(math.floorMod(mix(id * 100 + i), vocab.size.toLong).toInt))
        .mkString(" ")
    }
    // independent reference: plain-Scala counts and scoring
    val toks = texts.map { case (id, t) => id -> t.split("\\s+").toSeq.filter(_.nonEmpty) }.toMap
    val allBigrams = toks.values.flatMap(ts => ts.zip(ts.drop(1))).toSeq
    val c12 = allBigrams.groupBy(identity).map { case (kk, vs) => kk -> vs.size.toLong }
    val c1 = allBigrams.groupBy(_._1).map { case (w, vs) => w -> vs.size.toLong }
    val v = toks.values.flatten.toSet.size
    def expected(id: Long): Option[Double] = {
      val bs = toks(id).zip(toks(id).drop(1))
      if (bs.isEmpty) None
      else {
        val s = bs.map(b => math.log((c12(b) + 0.5) / (c1(b._1) + 0.5 * v))).sum
        Some(BigDecimal(s / bs.size).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
    val df = texts.toDF("doc_id", "text")
    val got = LangModel.bigramScore(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    texts.foreach { case (id, _) =>
      assert(got(id) === expected(id), s"doc $id (text '${texts.toMap.apply(id)}')")
    }
  }

  test("model state never exceeds bigram types: plan has no per-token join") {
    // the scoring join sides are grouped aggregates (bigram/unigram types),
    // so the physical plan must aggregate BEFORE both joins
    val plan = LangModel.bigramScore(corpus, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"))
    assert(!plan.toLowerCase.contains("cartesian"))
  }
}
