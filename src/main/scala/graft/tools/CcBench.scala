package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Diameter sweep for the connected-components formulations (SCALE.md,
  * round-12 item 4): the round-11 star-contraction rewrite of
  * [[graft.operators.Dedup.clusters]] claims bounded rounds
  * (O(log diameter)) where the round-10 frontier propagation pays one
  * round PER HOP of diameter — but the dedup fixture's planted clusters
  * have diameter ~1, so the claim was unexercised. This harness
  * measures BOTH formulations on both graph shapes:
  *
  *   - `clusters`: k planted star clusters (diameter ~2) — the actual
  *     near-dup shape, where frontier propagation converges in 2 rounds
  *     and star contraction can only tie;
  *   - `chains`: k node chains of length L (diameter L) — the
  *     pathological transitive-closure shape (loose thresholds,
  *     temporal drift chains), where frontier needs L rounds.
  *
  * Usage: runMain graft.tools.CcBench [nNodes] [chainLen]
  * (defaults 100000, 512). Prints one table row per (shape, algo) with
  * wall seconds and rounds; asserts both algos label identically.
  */
object CcBench {

  /** The round-10 frontier min-label propagation, kept verbatim as the
    * sweep's reference implementation (one round per diameter hop;
    * per-round cost ∝ frontier edges).
    */
  private def clustersFrontier(pairs: DataFrame, maxIters: Int): DataFrame = {
    val edges = pairs
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("cluster_id", col("id"))
      .localCheckpoint(true)
    var frontier = labels
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val msgs = edges
        .join(frontier.select(col("id").as("src"), col("cluster_id").as("lbl")), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(min(col("lbl")).as("neighbor_min"))
      val updated = labels
        .join(msgs, Seq("id"), "left")
        .select(
          col("id"),
          least(col("cluster_id"), coalesce(col("neighbor_min"), col("cluster_id"))).as("cluster_id"),
          (coalesce(col("neighbor_min"), col("cluster_id")) < col("cluster_id")).as("changed")
        )
        .localCheckpoint(true)
      frontier = updated.filter(col("changed")).select(col("id"), col("cluster_id"))
      converged = frontier.isEmpty
      labels = updated.select(col("id"), col("cluster_id"))
      iter += 1
    }
    if (!converged) throw new IllegalStateException(s"frontier did not converge in $maxIters")
    labels
  }

  def main(args: Array[String]): Unit = {
    val nNodes = args.headOption.map(_.toInt).getOrElse(100000)
    val chainLen = args.drop(1).headOption.map(_.toInt).getOrElse(512)
    val spark = graft.engine.Session.local(32)
    spark.sparkContext.setLogLevel("WARN")

    // planted star clusters of 5 (the dedup fixture shape, diameter 2
    // through the center): edges (center, center + j)
    val clusterSize = 5
    def clusterPairs: DataFrame = spark.range(nNodes)
      .filter(col("id") % clusterSize =!= 0)
      .select((col("id") - (col("id") % clusterSize)).as("id_a"), col("id").as("id_b"))

    // chains of length chainLen (diameter chainLen - 1): edges (i, i+1)
    // within each chain
    def chainPairs: DataFrame = spark.range(nNodes)
      .filter(col("id") % chainLen =!= (chainLen - 1))
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    def labelsOf(df: DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    def drop(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))

    // warmup (JIT + shuffle machinery) on a small instance of each
    labelsOf(graft.operators.Dedup.clusters(clusterPairs.limit(1000)))
    labelsOf(clustersFrontier(clusterPairs.limit(1000), 10))

    println(f"| shape | nodes | diameter | star s | frontier s |")
    println("|---|---|---|---|---|")
    for ((shape, pairs, diam, frontierIters) <- Seq(
        ("planted-5", clusterPairs, 2, 10),
        ("chain", chainPairs, chainLen - 1, chainLen + 2))) {
      drop()
      val (starL, starS) = time(labelsOf(graft.operators.Dedup.clusters(pairs, maxIters = 60)))
      drop()
      val (frontL, frontS) = time(labelsOf(clustersFrontier(pairs, frontierIters)))
      require(starL == frontL, s"$shape: formulations disagree")
      println(f"| $shape | $nNodes | $diam | $starS%.1f | $frontS%.1f |")
    }
    spark.stop()
  }
}
