package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType}

/** Dataset mixing: the per-source sampling-weight step of a
  * pre-training data recipe. Each source carries a weight w ≥ 0:
  * `floor(w)` guaranteed copies of every document plus one more with
  * probability `frac(w)` — so w = 0.25 downsamples to a quarter,
  * w = 1 passes through, w = 2.5 upsamples to 2–3 epochs per doc. The
  * fractional decision is a deterministic 16-bit md5 slot of
  * (source, id), so re-runs, resharding and other engines agree on
  * every document's copy count (the d13 split contract applied to
  * mixing), and the emitted `epoque` index (0-based copy number) lets
  * a downstream shard writer interleave epochs instead of
  * concatenating them.
  *
  * Scale design: pure map — the weight lookup is a broadcast map
  * literal (recipes are tens of sources), the slot is one md5 per row,
  * and the explode emits at most ceil(w) rows per doc. No exchange at
  * any corpus size; a corpus-wide rate audit is the caller's
  * one-line groupBy (the d21 oracle recomputes it in SQL).
  */
object Mix {

  /** One output row per kept copy: (id, source, poids, n_copies,
    * epoque). Docs from unlisted sources use `defaultWeight`.
    */
  def weightedSample(
      docs: DataFrame,
      idCol: String,
      sourceCol: String,
      weights: Map[String, Double],
      defaultWeight: Double = 1.0
  ): DataFrame = {
    require(weights.values.forall(_ >= 0) && defaultWeight >= 0,
      "mixing weights must be non-negative")
    val wmap = typedLit(weights)
    val w = coalesce(element_at(wmap, col(sourceCol).cast(StringType)), lit(defaultWeight))
    val slot = conv(
      substring(md5(concat(col(sourceCol).cast(StringType), lit(":"),
        col(idCol).cast(StringType))), 1, 4), 16, 10).cast(IntegerType)
    val base = floor(w).cast(IntegerType)
    val extra = (slot < ((w - floor(w)) * 65536).cast(IntegerType)).cast(IntegerType)
    docs
      .select(
        col(idCol).as("doc_id"),
        col(sourceCol).as("source"),
        w.as("poids"),
        (base + extra).as("n_copies")
      )
      .filter(col("n_copies") >= 1)
      .select(
        col("doc_id"), col("source"), col("poids"), col("n_copies"),
        explode(sequence(lit(0), col("n_copies") - 1)).as("epoque")
      )
  }
}
