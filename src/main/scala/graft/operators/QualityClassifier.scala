package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{ClassifierExpr, HashedWeights}
import graft.functions.Text

/** Hashed-bag-of-words linear quality classifier — the fastText-style
  * pipeline filter (label a bounded set of documents, learn token
  * weights, score the whole corpus cheaply).
  *
  * The model is multinomial Naive Bayes log-odds over md5-hashed token
  * buckets (65 536), which keeps BOTH halves scale-honest:
  *
  *  - TRAINING is one distributed aggregation: explode tokens, bucket
  *    them (the d13 md5-slot convention), groupBy bucket × label with
  *    map-side combine — the exchange carries at most 65 536 narrow
  *    rows REGARDLESS of corpus size, and the collected model is 512 KB
  *    of doubles. No driver-side SGD loop over collected documents, no
  *    per-iteration jobs: counting IS the closed-form fit, which is
  *    also what makes the whole pipeline recomputable by an
  *    engine-independent SQL oracle (the d24 gate recomputes training
  *    counts AND scores in DuckDB — a gradient model could only be
  *    spot-checked).
  *  - SCORING is the compiled [[org.apache.spark.sql.graft.HashedScore]]
  *    kernel: one md5 + one array lookup per token, pure map, weights
  *    broadcast by codegen reference.
  *
  * Laplace-smoothed: w(b) = ln((cp_b + 1) / (Np + B)) −
  * ln((cn_b + 1) / (Nn + B)) with B = 65 536; the prior is the label
  * log-ratio. score = prior + Σ_tokens w(bucket(tok)); > 0 ⇒ positive.
  */
object QualityClassifier {

  final case class Model(weights: Array[Double], prior: Double) {
    /** Raw (un-rounded) score column for a text column. */
    def score(text: Column): Column =
      ClassifierExpr.hashedScore(Text.tokens(text), weights) + lit(prior)
  }

  /** The d13 md5 slot of a token — the shared Spark/oracle bucket. */
  def bucket(tok: Column): Column =
    conv(substring(md5(tok), 1, 4), 16, 10).cast("int")

  /** Fit on labeled documents. `label` must be a non-null boolean
    * column (the bounded labeled sample is the caller's contract — at
    * 100 TB you train on the labeled slice, then score everything).
    */
  def train(docs: DataFrame, textCol: String, label: Column): Model = {
    val b = HashedWeights.Buckets
    val toks = docs
      .select(label.cast("boolean").as("pos"), explode(Text.tokens(col(textCol))).as("tok"))
      .select(col("pos"), bucket(col("tok")).as("b"))
    val counts = toks
      .groupBy(col("b"))
      .agg(
        sum(when(col("pos"), 1L).otherwise(0L)).as("cp"),
        sum(when(col("pos"), 0L).otherwise(1L)).as("cn"))
      .collect()
    val np = counts.map(_.getLong(1)).sum
    val nn = counts.map(_.getLong(2)).sum
    val w = new Array[Double](b)
    val base = math.log(1.0 / (np + b)) - math.log(1.0 / (nn + b))
    java.util.Arrays.fill(w, base)
    counts.foreach { r =>
      w(r.getInt(0)) = math.log((r.getLong(1) + 1.0) / (np + b)) -
        math.log((r.getLong(2) + 1.0) / (nn + b))
    }
    val dc = docs
      .agg(
        sum(when(label.cast("boolean"), 1L).otherwise(0L)),
        sum(when(label.cast("boolean"), 0L).otherwise(1L)))
      .collect()(0)
    Model(w, math.log(dc.getLong(0).toDouble / dc.getLong(1)))
  }

  /** Persist a trained model — the PUBLISH step (train once on the
    * labeled slice, freeze, every later batch scores with the stored
    * weights; the Bpe.writeModel / AnnIndex store convention). Both
    * relations are model-bounded: 65 536 weight rows + the one-row
    * prior, never corpus-scale.
    */
  def writeModel(
      spark: org.apache.spark.sql.SparkSession, model: Model, dir: String): Unit = {
    import spark.implicits._
    model.weights.zipWithIndex
      .map { case (w, i) => (i, w) }.toSeq
      .toDF("b", "w")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/poids")
    Seq(model.prior).toDF("prior")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/prior")
  }

  /** Load a published model (driver-bounded, 512 KB class) — read
    * driver-direct (graft.sources.DriverParquet): the former two
    * spark.read...collect() actions were plan/schedule round trips for
    * a model-bounded store (the AnnIndex.readModel convention).
    */
  def readModel(spark: org.apache.spark.sql.SparkSession, dir: String): Model = {
    import graft.sources.DriverParquet
    val conf = spark.sparkContext.hadoopConfiguration
    val w = new Array[Double](HashedWeights.Buckets)
    DriverParquet.rows(conf, s"$dir/poids")
      .foreach(g => w(DriverParquet.int(g, "b")) = DriverParquet.double(g, "w"))
    Model(w, DriverParquet.double(DriverParquet.rows(conf, s"$dir/prior").head, "prior"))
  }
}
