package graft

/** Scratch dev runner: plan-quality sweep over the whole catalog (not
  * part of the driver contract).
  */
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Session.local(8)
    val dir = "/root/testdata/sf0.001"
    val skipExec = Set("w01_partitioned_io", "io01_pgcopy_roundtrip", "io02_bucketed_join",
      "s01_stream_daily", "s02_stream_sessions", "d09_dedup_clusters")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        val p = df.queryExecution.executedPlan.toString()
        val flags = Seq(
          "CARTESIAN" -> p.contains("CartesianProduct"),
          "BNLJ" -> p.contains("BroadcastNestedLoopJoin"),
          "SMJ" -> p.contains("SortMergeJoin"),
          "BHJ" -> p.contains("BroadcastHashJoin")
        ).collect { case (f, true) => f }
        val singlePartWindow = "Exchange SinglePartition".r.findAllIn(p).length
        val exchanges = "Exchange".r.findAllIn(p).length
        println(f"[plan] $name%-28s exch=$exchanges singlePart=$singlePartWindow ${flags.mkString(",")}")
      } catch { case e: Throwable => println(s"[plan] $name ERROR ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
