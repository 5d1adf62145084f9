package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** The reference's monthly partition roll (payment_p2022_MM attach,
  * SURVEY §2.9): dynamic partition overwrite rewrites ONLY the incoming
  * month's partition — other months' files stay physically untouched.
  */
class PartitionRollSpec extends SparkSpec {

  test("dynamic partition overwrite touches only the rolled day") {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_partition_roll_daily"
    val prior = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val events = Tables.events(spark, sfDir)
        .withColumn("jour", date_format(col("ts"), "yyyy-MM-dd"))
      events.write.mode("overwrite").partitionBy("jour").parquet(out)

      val months = spark.read.parquet(out).select("jour").distinct()
        .collect().map(_.get(0).toString).sorted
      assert(months.length >= 2, s"fixture must span >= 2 days, got ${months.toSeq}")
      val rollDay = months.last
      val untouched = months.head

      def files(m: String) =
        new java.io.File(s"$out/jour=$m").listFiles().filter(_.getName.endsWith(".parquet"))
      val beforeStamp = files(untouched).map(f => f.getName -> f.lastModified).toMap
      val beforeCountRoll = spark.read.parquet(out).filter(col("jour") === rollDay).count()

      // roll: re-deliver the last month with bumped values (the daily batch)
      events.filter(col("jour") === rollDay)
        .withColumn("value", col("value") + 1000.0)
        .write.mode("overwrite").partitionBy("jour").parquet(out)

      val after = spark.read.parquet(out)
      // untouched partition: same files, same mtimes
      val afterStamp = files(untouched).map(f => f.getName -> f.lastModified).toMap
      assert(afterStamp == beforeStamp, "non-rolled partition files must be untouched")
      // rolled partition: replaced, not appended
      assert(after.filter(col("jour") === rollDay).count() == beforeCountRoll)
      assert(after.filter(col("jour") === rollDay).agg(min(col("value"))).collect().head.getDouble(0) >= 1000.0)
      // totals: all days still present
      assert(after.select("jour").distinct().count() == months.length)
    } finally {
      prior match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None    => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }
}
