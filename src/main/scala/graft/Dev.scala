package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.Dedup

/** Scratch dev runner: schema/plan inspection (not part of the driver contract). */
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Session.local(8)
    val dir = "/root/testdata/sf0.1"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[dev] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val d06 = Dedup.minhashLsh(Tables.documents(spark, dir), "doc_id", "text",
      shingleN = 3, k = 64, bands = 32, threshold = 0.5)
    t("d06 full")(println("pairs=" + d06.count()))
    spark.stop()
  }
}
