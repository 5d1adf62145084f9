package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Scratch dev runner (not part of the driver contract):
  *
  *   - `Dev plan <name>[,<name>...] <sfDir>` — dump formatted plans to
  *     /tmp/plans_raw.md (feeds PLANS.md).
  *   - `Dev bench <name>[,<name>...] <sfDir> [reps]` — time queries
  *     through the same noop-sink path the driver bench uses.
  *   - no args — plan-dump the headline queries at sf0.001.
  */
object Dev {

  private def dumpPlans(spark: SparkSession, names: Seq[String], dir: String): Unit = {
    val sb = new StringBuilder
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      sb.append(s"## $name\n\n```\n").append(formatted).append("\n```\n\n")
    }
    Files.writeString(Paths.get("/tmp/plans_raw.md"), sb.toString)
    println("[dev] plans written")
  }

  def main(args: Array[String]): Unit = args.headOption match {
    case Some(cmd @ ("plan" | "bench")) =>
      require(args.length >= 3, s"usage: Dev $cmd <name>[,<name>...] <sfDir>" +
        (if (cmd == "bench") " [reps]" else ""))
      val names = args(1).split(",").toSeq
      val dir = args(2)
      val spark = graft.engine.Session.local(if (cmd == "bench") 32 else 8)
      spark.sparkContext.setLogLevel("WARN")
      if (cmd == "plan") dumpPlans(spark, names, dir)
      else {
        val reps = if (args.length > 3) args(3).toInt else 1
        names.foreach { name =>
          (1 to reps).foreach { r =>
            val t0 = System.nanoTime()
            SparkEntry.queries(name)(spark, dir).write.mode("overwrite").format("noop").save()
            println(f"[dev] $name rep $r: ${(System.nanoTime() - t0) / 1e9}%.2f s")
          }
        }
      }
      spark.stop()
    case Some(other) =>
      sys.error(s"unknown Dev command '$other' (expected: plan | bench)")
    case None =>
      val spark = graft.engine.Session.local(8)
      spark.sparkContext.setLogLevel("WARN")
      dumpPlans(
        spark,
        Seq("q02_revenue_by_nation", "q22_filtered_scan", "d06_minhash_pairs",
          "e01_knn_brute", "io02_bucketed_join", "q17_rolling_7d"),
        "/root/testdata/sf0.001")
      spark.stop()
  }
}
