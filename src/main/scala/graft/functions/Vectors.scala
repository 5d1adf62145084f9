package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column functions over `array<float>` embedding columns.
  *
  * Built on higher-order functions (zip_with / aggregate) — codegen'd,
  * no UDF. Floats are widened to double before arithmetic: float math
  * would diverge between engines and lose precision at dim 64+.
  */
object Vectors {

  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential-fold dot product — deterministic summation order. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm2(a: Column): Column = dot(a, a)

  /** Cosine similarity, computed as dot / sqrt(n2a * n2b) (single sqrt —
    * matches the common vector-library formulation).
    */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val den = sqrt(norm2(a) * norm2(b))
    when(den === 0, lit(0.0)).otherwise(d / den)
  }

  /** Multi-table random-hyperplane LSH buckets: for each of `nTables`
    * hash tables, `nBits` sign bits of projections onto pseudo-random
    * hyperplanes form the bucket id. Hyperplane component h[t·nBits+i][j]
    * derives from xxhash64 mapped to [-1, 1] — deterministic, shippable
    * to any cluster without a trained side file.
    *
    * Recall for a pair at angle θ: per-bit collision p = 1 − θ/π, so
    * P(candidate) = 1 − (1 − p^nBits)^nTables — tables multiply recall
    * where extra bits multiply precision.
    *
    * Scale note: cost is nTables·nBits·dim multiplies per row inside
    * codegen. For very wide vectors/bit counts, a mapPartitions BLAS-style
    * matrix multiply would amortize better; at dim ≤ 1k this form keeps
    * the whole pipeline in WholeStageCodegen with zero extra shuffles.
    */
  def hyperplaneBuckets(v: Column, nBits: Int, nTables: Int): Column =
    transform(
      sequence(lit(0), lit(nTables - 1)),
      t => {
        val bits = transform(
          sequence(lit(0), lit(nBits - 1)),
          i => {
            val proj = aggregate(
              zip_with(
                v,
                sequence(lit(0), size(v) - 1),
                (x, j) => x * (xxhash64(t * nBits + i, j).cast("double") / lit(Long.MaxValue.toDouble))
              ),
              lit(0.0),
              (acc, p) => acc + p
            )
            when(proj >= 0, lit(1L)).otherwise(lit(0L))
          }
        )
        struct(
          t.as("table"),
          aggregate(
            zip_with(bits, sequence(lit(0), lit(nBits - 1)), (b, p) => call_function("shiftleft", b, p)),
            lit(0L),
            (acc, x) => acc.bitwiseOR(x)
          ).as("bucket")
        )
      }
    )

  /** Single-table variant (one bucket id per row). */
  def hyperplaneBucket(v: Column, nBits: Int): Column =
    element_at(hyperplaneBuckets(v, nBits, 1), 1)("bucket")
}
