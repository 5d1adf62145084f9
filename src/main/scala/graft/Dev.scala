package graft

import java.nio.file.{Files, Paths}

/** Scratch dev runner: dumps formatted plans for the headline queries
  * (feeds PLANS.md; not part of the driver contract).
  */
object Dev {
  def main(args: Array[String]): Unit = {
    // `Dev bench <name>[,<name>...] <sfDir> [reps]` — time queries through
    // the same noop-sink path the driver bench uses.
    // `Dev plan <name>[,<name>...] <sfDir>` — dump formatted plans.
    if (args.length >= 2 && args(0) == "plan") {
      val spark = graft.engine.Session.local(8)
      spark.sparkContext.setLogLevel("WARN")
      val sb = new StringBuilder
      args(1).split(",").foreach { name =>
        val df = SparkEntry.queries(name)(spark, args(2))
        val formatted = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        sb.append(s"## $name\n\n```\n").append(formatted).append("\n```\n\n")
      }
      Files.writeString(Paths.get("/tmp/plans_raw.md"), sb.toString)
      println("[dev] plans written")
      spark.stop()
      return
    }
    if (args.length >= 2 && args(0) == "bench") {
      val spark = graft.engine.Session.local(32)
      spark.sparkContext.setLogLevel("WARN")
      val names = args(1).split(",").toSeq
      val dir = args(2)
      val reps = if (args.length > 3) args(3).toInt else 1
      names.foreach { name =>
        (1 to reps).foreach { r =>
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(spark, dir).write.mode("overwrite").format("noop").save()
          println(f"[dev] $name rep $r: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
      }
      spark.stop()
      return
    }
    val spark = graft.engine.Session.local(8)
    val dir = "/root/testdata/sf0.001"
    val names = Seq("q02_revenue_by_nation", "q22_filtered_scan", "d06_minhash_pairs",
      "e01_knn_brute", "io02_bucketed_join", "q17_rolling_7d")
    val sb = new StringBuilder
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      sb.append(s"## $name\n\n```\n").append(formatted).append("\n```\n\n")
    }
    Files.writeString(Paths.get("/tmp/plans_raw.md"), sb.toString)
    println("[dev] plans written")
    spark.stop()
  }
}
