package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Upsert

/** Streaming incremental warehouse load (SURVEY §2.9): the reference's
  * re-runnable ON CONFLICT ETL re-expressed as a Structured Streaming
  * file source + foreachBatch MERGE — each micro-batch of new fact rows
  * upserts into the parquet target keyed on the business id. The result
  * must equal the one-shot batch build (asserted in StreamingSpec).
  *
  * Scale notes: the sink is rewritten via merge per batch here (plain
  * parquet has no row-level MERGE); on a table format with MERGE INTO
  * the same foreachBatch body becomes a keyed merge. State is bounded:
  * the stream side carries no aggregation, so no watermark is needed.
  */
object IncrementalEtl {

  /** Schema of the incoming order facts (events-style file feed). */
  private val orderSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)
  ))

  /** Stream the orders file and maintain a parquet fact table by MERGE
    * upserts; returns the final table after the stream drains.
    */
  def run(spark: SparkSession, dir: String, targetDir: String): DataFrame = {
    val target = s"$targetDir/fact"
    // start from an empty target with the fact schema
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], factSchema)
      .write.mode("overwrite").parquet(target)

    val stream = spark.readStream
      .schema(orderSchema)
      .option("pathGlobFilter", "orders.parquet")
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .select(
        col("o_orderkey").as("source_commande_id"),
        (year(col("o_orderdate")) * 10000 + month(col("o_orderdate")) * 100 +
          dayofmonth(col("o_orderdate"))).cast(IntegerType).as("date_key"),
        col("o_totalprice").cast(DecimalType(12, 2)).as("montant"),
        col("o_orderstatus").as("statut")
      )

    val q = stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val current = batch.sparkSession.read.parquet(target)
        val merged = Upsert.merge(current, batch, Seq("source_commande_id"))
        // write-then-swap: plain parquet cannot merge in place
        val tmp = s"$target.next"
        merged.write.mode("overwrite").parquet(tmp)
        val fs = org.apache.hadoop.fs.FileSystem.get(
          batch.sparkSession.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(target), true)
        fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(target))
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    spark.read.parquet(target)
  }

  private val factSchema = StructType(Seq(
    StructField("source_commande_id", LongType),
    StructField("date_key", IntegerType),
    StructField("montant", DecimalType(12, 2)),
    StructField("statut", StringType)
  ))

  /** The batch twin: the same fact built in one pass. */
  def batchBuild(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/orders.parquet")
      .select(
        col("o_orderkey").as("source_commande_id"),
        (year(col("o_orderdate")) * 10000 + month(col("o_orderdate")) * 100 +
          dayofmonth(col("o_orderdate"))).cast(IntegerType).as("date_key"),
        col("o_totalprice").cast(DecimalType(12, 2)).as("montant"),
        col("o_orderstatus").as("statut")
      )
}
