package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalog entry: a Spark query over the synthetic tables plus (when
  * SQL-expressible) the equivalent DuckDB oracle SQL. Column names of the
  * Spark result and the oracle MUST match — the driver's comparator sorts
  * columns by name before hashing (see the builder contract).
  *
  * Numeric-parity conventions used across the catalog (so Spark and DuckDB
  * hash-match bit-for-bit):
  *   - Money doubles are 2-decimal values: cast to DECIMAL before SUM
  *     (exact, order-independent), cast the final aggregate to DOUBLE.
  *   - Ratios/averages: double division of exact values, never decimal
  *     division (scale rules differ between engines).
  *   - Window sums run over DECIMAL (exact) — double window sums are
  *     evaluation-order-dependent and diverge between engines.
  *   - Every ORDER BY / LIMIT / NTILE ordering is made total with a unique
  *     key tiebreak (top-k tie order is otherwise nondeterministic).
  */
final case class Q(
    name: String,
    doc: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)
