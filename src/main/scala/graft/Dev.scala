package graft

/** Scratch dev runner: schema/plan inspection (not part of the driver contract). */
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Session.local(8)
    val dir = "/root/testdata/sf0.1"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[dev] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    t("warmup")(spark.read.parquet(s"$dir/documents.parquet").count())
    t("d09")(force(SparkEntry.queries("d09_dedup_clusters")(spark, dir)))
    spark.stop()
  }
}
