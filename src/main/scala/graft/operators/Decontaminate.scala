package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Benchmark decontamination: flag training documents that share token
  * n-grams with an evaluation set — the standard pre-training hygiene
  * pass (n-gram collision screening of the training corpus against every
  * benchmark that will be used to evaluate the model).
  *
  * Scale design: the eval side is SMALL by contract (benchmarks are
  * thousands of docs; the training corpus is the 100 TB side), so the
  * distinct eval-gram set is broadcast and the training corpus streams
  * through ONE map-side semi-join pass — the corpus is never shuffled on
  * the gram key. Gram extraction is the compiled ShinglesOf kernel (pure
  * map). The only exchange is the per-doc overlap count, a groupBy on
  * doc id whose input is the (rare) collision rows only. Past broadcast
  * size the join degrades to a shuffled semi-join on the gram hash —
  * still O(collisions) wide rows, never all-pairs.
  */
object Decontaminate {

  /** Per-training-doc n-gram overlap against `eval`.
    *
    * Returns every training doc with its distinct n-gram count, the
    * number of those n-grams that also occur anywhere in the eval set,
    * and the contamination flag (any overlap). Grams are DISTINCT per
    * doc on both sides — overlap is set intersection, so a boilerplate
    * gram repeated 100× in one doc counts once.
    */
  def ngramOverlap(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5
  ): DataFrame = {
    def grams(df: DataFrame) = df.select(
      col(idCol).as("doc_id"),
      explode(Text.shingles(col(textCol), n)).as("g")
    )
    // distinct gram VALUES only — the broadcast payload is the benchmark
    // vocabulary, not the benchmark corpus
    val evalGrams = grams(eval).select("g").distinct()
    val shared = grams(train)
      .join(broadcast(evalGrams), Seq("g"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_partages"))
    train
      .select(col(idCol).as("doc_id"), size(Text.shingles(col(textCol), n)).as("n_grams"))
      .join(shared, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_grams"),
        coalesce(col("n_partages"), lit(0L)).as("n_partages"),
        (coalesce(col("n_partages"), lit(0L)) > 0).as("contamine")
      )
  }
}
