package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorExpr

/** Dense-vector column functions over `array<float>` / `array<double>`
  * embedding columns.
  *
  * Hot kernels (dot, cosine, projections) are custom codegen'd Catalyst
  * expressions (graft.expressions) — the higher-order-function versions
  * interpret one lambda call per element and are ~100x slower on wide
  * vectors. Floats are widened to double before arithmetic: float math
  * would diverge between engines and lose precision at dim 64+.
  */
object Vectors {

  def toDouble(v: Column): Column = v.cast("array<double>")

  /** Dot product — codegen'd single pass, sequential accumulation order
    * (deterministic, engine-comparable).
    */
  def dot(a: Column, b: Column): Column = VectorExpr.dot(a, b)

  def norm2(a: Column): Column = VectorExpr.dot(a, a)

  /** Cosine similarity dot / sqrt(‖a‖²·‖b‖²); 0.0 on zero norm. */
  def cosine(a: Column, b: Column): Column = VectorExpr.cosine(a, b)

  /** Multi-table random-hyperplane LSH buckets from a MATERIALIZED
    * projections column (see VectorExpr.randomProjections — pass an
    * attribute, not the raw expression, or interpreted lambda evaluation
    * re-projects per element). For each of `nTables` tables the bucket id
    * packs `nBits` projection sign bits.
    *
    * Recall for a pair at angle θ: per-bit collision p = 1 − θ/π, so
    * P(candidate) = 1 − (1 − p^nBits)^nTables — tables multiply recall
    * where extra bits multiply precision.
    */
  def packBuckets(proj: Column, nBits: Int, nTables: Int): Column =
    VectorExpr.packBuckets(proj, nBits, nTables)

  /** Convenience: projections + packing in one column expression. Only
    * safe on small nBits·nTables; operators materialize the projections
    * column explicitly instead.
    */
  def hyperplaneBuckets(v: Column, nBits: Int, nTables: Int): Column =
    packBuckets(VectorExpr.randomProjections(toDouble(v), nBits * nTables), nBits, nTables)

  /** Single-table variant (one bucket id per row). */
  def hyperplaneBucket(v: Column, nBits: Int): Column =
    element_at(hyperplaneBuckets(v, nBits, 1), 1)("bucket")
}
