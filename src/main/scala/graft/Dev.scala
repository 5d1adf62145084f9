package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.Text
import org.apache.spark.sql.graft.TextExpr

/** Scratch dev runner: schema/plan inspection (not part of the driver contract). */
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Session.local(8)
    val dir = "/root/testdata/sf0.1"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[dev] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, dir)
    t("warmup")(docs.count())
    val k = 64; val bands = 32; val r = 2; val shingleN = 3
    val withSig = docs
      .select(col("doc_id"), TextExpr.minhashSig(Text.tokens(col("text")), shingleN, k).as("sig"))
      .filter(col("sig").isNotNull)
      .cache()
    t("sig cache")(withSig.count())
    val buckets = withSig.select(
      col("doc_id"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"), xxhash64(b, slice(col("sig"), b * r + 1, lit(r))).as("bucket")))).as("bb"))
    val l = buckets.select(col("doc_id").as("id_a"), col("bb"))
    val rr = buckets.select(col("doc_id").as("id_b"), col("bb"))
    val rawCandidates = l.join(rr, Seq("bb")).filter(col("id_a") < col("id_b")).select("id_a", "id_b").distinct()
    t("rawCandidates")(println("n=" + rawCandidates.count()))
    val sigFor = (a: String) => withSig.select(col("doc_id").as(a), col("sig").as(s"sig_$a"))
    val candidates = rawCandidates
      .join(sigFor("id_a"), Seq("id_a")).join(sigFor("id_b"), Seq("id_b"))
      .withColumn("est", aggregate(zip_with(col("sig_id_a"), col("sig_id_b"), (x, y) => when(x === y, 1).otherwise(0)), lit(0), (acc, v) => acc + v).cast("double") / k)
      .filter(col("est") >= 0.3125)
      .select("id_a", "id_b").cache()
    t("est filter")(println("n=" + candidates.count()))
    val candDocs = candidates.select(col("id_a").as("doc_id")).union(candidates.select(col("id_b").as("doc_id"))).distinct()
    val shSets = docs.select(col("doc_id"), col("text"))
      .join(candDocs, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), Text.shingles(col("text"), shingleN).as("sh")).cache()
    val out = candidates
      .join(shSets.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(shSets.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard", round(Text.jaccard(col("sh_a"), col("sh_b")), 6))
      .filter(col("jaccard") >= 0.5)
      .select(col("id_a"), col("id_b"), col("jaccard"))
    t("verify")(println("n=" + out.count()))
    spark.stop()
  }
}
