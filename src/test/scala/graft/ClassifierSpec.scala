package graft

import org.apache.spark.sql.functions._
import graft.operators.QualityClassifier
import graft.functions.Text

/** Hashed-NB quality classifier (d24): planted separable classes, an
  * independent driver-side recomputation of the dot product, and
  * determinism.
  */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  // planted: positive docs speak quality, negative docs speak junk, one
  // ambiguous word ("the") on both sides
  private lazy val planted = Seq(
    (1L, true, "the clear well written prose reads beautifully"),
    (2L, true, "clear structured prose with well chosen words"),
    (3L, true, "beautifully written and clear throughout"),
    (4L, false, "spam spam click here buy now the spam"),
    (5L, false, "click buy spam now cheap cheap click"),
    (6L, false, "buy now spam click cheap garbage")
  ).toDF("doc_id", "pos", "text")

  test("planted separable classes: every doc scores on its own side") {
    val model = QualityClassifier.train(planted, "text", col("pos"))
    val scored = planted
      .select(col("doc_id"), col("pos"), model.score(col("text")).as("s"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getDouble(2)))
    scored.foreach { case (id, pos, s) =>
      assert((s > 0) == pos, s"doc $id scored $s against its class")
    }
    // margins: the weakest positive clears the strongest negative
    val posMin = scored.filter(_._2).map(_._3).min
    val negMax = scored.filterNot(_._2).map(_._3).max
    assert(posMin > negMax)
  }

  test("kernel dot product == independent driver-side recomputation") {
    val model = QualityClassifier.train(planted, "text", col("pos"))
    // recompute each score from raw counts, sharing NO code with the
    // kernel: java MessageDigest here vs the codegen'd expression there
    def bucketOf(tok: String): Int = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(
        tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      ((d(0) & 0xff) << 8) | (d(1) & 0xff)
    }
    val rows = planted.select(col("doc_id"), col("text"),
      model.score(col("text")).as("s")).collect()
    rows.foreach { r =>
      val toks = r.getString(1).trim.split("\\s+").filter(_.nonEmpty)
      val expected = model.prior + toks.map(t => model.weights(bucketOf(t))).sum
      assert(math.abs(r.getDouble(2) - expected) < 1e-12,
        s"doc ${r.getLong(0)} kernel score ${r.getDouble(2)} != recomputed $expected")
    }
  }

  test("bucket column == d13 md5-slot convention (shared with the oracle)") {
    val toks = Seq("the", "spam", "prose", "72", "").toDF("tok")
    val viaCol = toks.select(QualityClassifier.bucket(col("tok"))).collect().map(_.getInt(0))
    val viaJava = Seq("the", "spam", "prose", "72", "").map { t =>
      val d = java.security.MessageDigest.getInstance("MD5").digest(
        t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      ((d(0) & 0xff) << 8) | (d(1) & 0xff)
    }
    assert(viaCol.toSeq == viaJava)
  }

  test("deterministic across runs; unseen tokens get the smoothing default") {
    val m1 = QualityClassifier.train(planted, "text", col("pos"))
    val m2 = QualityClassifier.train(planted, "text", col("pos"))
    assert(m1.prior == m2.prior && m1.weights.toSeq == m2.weights.toSeq)
    // a doc of entirely unseen tokens scores prior + n·default — finite,
    // and with balanced token totals here the default is ~0
    val unseen = Seq((9L, "zzz qqq www")).toDF("doc_id", "text")
    val s = unseen.select(m1.score(col("text"))).collect()(0).getDouble(0)
    assert(!s.isNaN && !s.isInfinite)
  }

  test("training shuffles a bounded relation: no exchange wider than the bucket space") {
    // the training aggregation's exchange key space is ≤ 65 536 buckets
    // regardless of corpus size — assert the plan aggregates on the
    // bucket, not on raw tokens
    val toks = planted
      .select(col("pos"), explode(Text.tokens(col("text"))).as("tok"))
      .select(col("pos"), QualityClassifier.bucket(col("tok")).as("b"))
      .groupBy(col("b"))
      .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("cp"))
    val plan = toks.queryExecution.executedPlan.toString()
    assert(plan.contains("HashAggregate"), plan)
  }
}
