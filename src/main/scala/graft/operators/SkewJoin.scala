package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (SURVEY §4 spill/skew row; the 100 TB
  * answer when one join key carries a disproportionate share of rows —
  * AQE's skew-join split handles sort-merge cases, salting also covers
  * aggregations and broadcast-averse shapes).
  *
  * The big side gets a deterministic salt derived from the full row
  * (xxhash64 — no RNG, so retries/speculative tasks agree); the small
  * side is exploded to every salt value. Each big row then matches
  * exactly one replica of its key's small-side row, so the result is
  * row-identical to the unsalted inner join while the hot key's rows
  * spread over `salts` reducers.
  */
object SkewJoin {

  def salted(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltedBig = big.withColumn(
      "__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(salts)).cast("int")
    )
    val saltedSmall = small.withColumn(
      "__salt",
      explode(sequence(lit(0), lit(salts - 1)).cast("array<int>"))
    )
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
