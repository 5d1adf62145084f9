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
  * doc id whose input is the (rare) collision rows only. The broadcast
  * is SIZED before it is forced: one aggregate over the (small) eval
  * side measures the distinct-gram payload against the budget, and past
  * it the screen degrades to a shuffled semi-join on the gram value —
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
    *
    * `gramBroadcastBytes` bounds the eval-gram broadcast; < 0 (default)
    * reads `spark.graft.decontaminate.gramBroadcastBytes` (default
    * 512 MB — hundreds of benchmarks' worth of 5-gram vocabulary).
    * Sizing runs one aggregate over the eval side only (small by
    * contract); the 100 TB train side is never touched to decide.
    */
  def ngramOverlap(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5,
      gramBroadcastBytes: Long = -1L
  ): DataFrame = {
    def grams(df: DataFrame) = df.select(
      col(idCol).as("doc_id"),
      explode(Text.shingles(col(textCol), n)).as("g")
    )
    // distinct gram VALUES only — the broadcast payload is the benchmark
    // vocabulary, not the benchmark corpus
    val evalGrams = grams(eval).select("g").distinct()
    // clamped to the driver's collect ceiling like every dedup budget:
    // a broadcast the driver cannot collect must degrade, not die
    val budget = Dedup.clampToDriverLimit(train.sparkSession,
      if (gramBroadcastBytes >= 0) gramBroadcastBytes
      else train.sparkSession.conf
        .getOption("spark.graft.decontaminate.gramBroadcastBytes")
        .map(Dedup.parseBytes)
        .getOrElse(512L * 1024 * 1024))
    // UTF-8 payload + per-row object overhead, same accounting as the
    // minhashLsh sig budget; the agg re-derives evalGrams once more but
    // the eval side is the small one
    val Array(gramBytes) = evalGrams
      .agg(coalesce(sum(octet_length(col("g")) + lit(48L)), lit(0L)))
      .collect().map(_.getLong(0))
    val evalSide = if (budget > 0 && gramBytes <= budget) broadcast(evalGrams) else evalGrams
    val shared = grams(train)
      .join(evalSide, Seq("g"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_partages"))
    // The per-doc gram total is a SECOND map pass of the shingle kernel
    // over the train side — deliberate: folding it into the exploded
    // pass (size carried per gram row, aggregated per doc) would need
    // the per-doc rollup to run over ALL gram rows instead of the rare
    // collision survivors, turning the one narrow exchange into a
    // corpus-wide-grams exchange. Recomputing a compiled map kernel is
    // the cheaper side of that trade at any corpus size.
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
