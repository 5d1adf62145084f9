package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (SURVEY §4 spill/skew row; the 100 TB
  * answer when one join key carries a disproportionate share of rows —
  * AQE's skew-join split handles sort-merge cases, salting also covers
  * aggregations and broadcast-averse shapes).
  *
  * Split-join: only keys the big side's sampled histogram shows as HOT
  * are salted — the cold tail takes the plain join, so the small side
  * is never replicated `salts`× for keys that didn't need it and cold
  * rows never pay the wider (key, salt) shuffle. Uniform salting (the
  * [[saltAll]] primitive this wraps) measured 5.5×/decade at the
  * SCALE.md 1000× tier precisely because every key paid the salt;
  * the split keeps that machinery for the keys that earn it.
  *
  * On the hot slice the big side gets a deterministic salt derived
  * from the full row (xxhash64 — no RNG, so retries/speculative tasks
  * agree); the small side is exploded to every salt value. Each big
  * row then matches exactly one replica of its key's small-side row,
  * so the union of the two branches is row-identical to the unsalted
  * inner join (gated as k01 against the plain-join oracle).
  *
  * NOTE: unlike the metadata-sized operators (Dedup's no-hidden-job
  * rule), [[salted]] DOES run a job at construction time — the sampled
  * census — and the hot/cold branches each re-execute `big`'s lineage.
  * That is inherent to data-dependent skew statistics (AQE pays the
  * same price from runtime stats); callers joining an EXPENSIVE derived
  * pipeline should checkpoint it first, or pass a pre-computed hot set
  * via [[saltedWithHotKeys]] and skip the census.
  */
object SkewJoin {

  /** Driver-side bound on the collected hot-key census. */
  private val MaxHotKeys = 65536

  /** Hot keys of the big side, estimated from a deterministic sample
    * (seeded, so retries agree): a key is hot when its sampled share
    * exceeds `hotFactor` average-reducer loads — i.e. its rows would
    * overfill one post-shuffle partition by that factor. One
    * key-column-only sampled aggregation; at most [[MaxHotKeys]]
    * (heaviest first) come back to the driver, and since hotness only
    * picks the branch — never the result — a truncated census stays
    * correct, it just salts less.
    */
  def hotKeys(
      big: DataFrame,
      key: String,
      sampleFraction: Double = 0.05,
      hotFactor: Double = 2.0
  ): Seq[Any] = {
    require(sampleFraction > 0 && sampleFraction <= 1, "sampleFraction must be in (0, 1]")
    val parts = big.sparkSession.sessionState.conf.numShufflePartitions
    // eager localCheckpoint: the grouped census serves TWO actions (the
    // full-sample total and the top-k head) — without it the sampled
    // scan + groupBy would recompute per action
    val grouped = big.select(col(key))
      .sample(withReplacement = false, sampleFraction, seed = 42L)
      .groupBy(col(key)).agg(count(lit(1)).as("__cnt"))
      .localCheckpoint(true)
    // threshold in SAMPLED rows — the fraction cancels out of the
    // share comparison, so no scale-up arithmetic is needed. The total
    // MUST be the whole sample, not the collected head: past MaxHotKeys
    // distinct keys a head-only sum undercounts the denominator and
    // classifies warm/cold keys hot (replicating the small side for
    // them — the exact cost the split join exists to avoid). The
    // absolute floor keeps noise out: a key seen a handful of times in
    // the sample has no trustworthy frequency estimate (on a tiny
    // input, EVERY key lands there — and a tiny input needs no salt).
    val sampledTotal = grouped.agg(coalesce(sum(col("__cnt")), lit(0L))).head().getLong(0)
    val top = grouped
      .orderBy(col("__cnt").desc, col(key))
      .limit(MaxHotKeys)
      .collect()
    val threshold =
      math.max(hotFactor * sampledTotal / math.max(parts, 1), 7.0)
    top.filter(_.getLong(1) > threshold).map(_.get(0)).toSeq
  }

  /** Split salted join: salt the sampled-hot keys, plain-join the rest. */
  def salted(
      big: DataFrame,
      small: DataFrame,
      key: String,
      salts: Int,
      sampleFraction: Double = 0.05,
      hotFactor: Double = 2.0
  ): DataFrame =
    saltedWithHotKeys(big, small, key, salts, hotKeys(big, key, sampleFraction, hotFactor))

  /** The census-free form: callers who already know (or precomputed)
    * the hot set skip the sampled job entirely.
    */
  def saltedWithHotKeys(
      big: DataFrame,
      small: DataFrame,
      key: String,
      salts: Int,
      hot: Seq[Any]
  ): DataFrame = {
    require(salts > 0, "salts must be positive")
    if (hot.isEmpty) big.join(small, Seq(key))
    else {
      // isin compiles to an O(1)-per-row InSet past a few items and the
      // predicate pushes into the scans; NULL keys fall out of both
      // branches, exactly as the plain inner join drops them
      val isHot = col(key).isin(hot: _*)
      saltAll(big.filter(isHot), small.filter(isHot), key, salts)
        .unionByName(big.filter(!isHot).join(small.filter(!isHot), Seq(key)))
    }
  }

  /** Salt EVERY key — the pre-split primitive (and the right call when
    * the caller already knows all keys are hot).
    */
  def saltAll(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
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
