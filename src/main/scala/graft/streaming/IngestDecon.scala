package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Text
import graft.operators.Decontaminate

/** Streaming benchmark-decontamination screen (SURVEY §2.9 composed
  * with the d16 operator): arriving training-document micro-batches are
  * screened for eval-set n-gram collisions inside foreachBatch, and the
  * per-doc contamination report appends to a parquet log — the
  * continuous form of the one-shot d16 screen, and the hygiene pass a
  * production ingest actually runs (a crawl batch must be checked
  * against every benchmark BEFORE it joins the training corpus, not in
  * a later batch sweep).
  *
  * Stored-model shape: the benchmark gram vocabulary is derived ONCE
  * when the eval set lands and persisted beside it
  * ([[Decontaminate.ngramOverlapGrams]] — the IngestDedup
  * signature-store convention), so a trigger never re-shingles the
  * benchmarks; the store is drain-scope persisted and each batch runs
  * ONE map-side budgeted-broadcast semi-join over its own grams. Stream
  * state is empty — the screen carries no cross-batch aggregation (each
  * doc's verdict depends on the doc and the frozen eval store only), so
  * the drained log equals the one-shot screen over the whole feed
  * row-for-row (the d16 oracle gates it; StreamingSpec asserts the
  * equality directly).
  *
  * Scale shape per trigger: gram explode over the BATCH only (compiled
  * kernel), collision rows → one narrow per-doc rollup; the eval side
  * is bytes-bounded by the broadcast budget with the shuffled semi-join
  * fallback past it. Nothing corpus-scale is touched per batch.
  */
object IngestDecon {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)
  ))

  private val reportSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_grams", IntegerType),
    StructField("n_partages", LongType),
    StructField("contamine", BooleanType)
  ))

  /** Bump when the gram store layout or n changes. */
  private val format = "decon-ngram3-gramstore-v1"
  private val N = 3

  private def isEval = col("doc_id") % 50 === 0 && col("doc_id") > 0

  /** One-time setup: stage the arriving train feed as 4 files (real
    * micro-batches) and PUBLISH the eval-gram store — the distinct
    * benchmark gram vocabulary, derived once when the eval set lands.
    * Idempotent per input via the (length, mtime, format) fingerprint.
    */
  def setup(spark: SparkSession, dir: String, workDir: String): Unit = synchronized {
    val srcPath = new org.apache.hadoop.fs.Path(s"$dir/documents.parquet")
    val fs = srcPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val src = fs.getFileStatus(srcPath)
    val fingerprint = s"documents:${src.getLen}:${src.getModificationTime}:$format"
    val marker = new java.io.File(s"$workDir/_SETUP_DONE")
    val markerFresh = marker.exists() &&
      new String(java.nio.file.Files.readAllBytes(marker.toPath)) == fingerprint
    if (!markerFresh) {
      val docs = spark.read.schema(docSchema).parquet(s"$dir/documents.parquet")
      docs.filter(!isEval)
        .repartition(4, pmod(col("doc_id"), lit(4)))
        .write.mode("overwrite").parquet(s"$workDir/feed")
      docs.filter(isEval)
        .select(explode(Text.shingles(col("text"), N)).as("g"))
        .distinct()
        .write.mode("overwrite").parquet(s"$workDir/eval_grams")
      java.nio.file.Files.write(marker.toPath, fingerprint.getBytes)
    }
  }

  /** Screen each staged micro-batch against the published eval-gram
    * store and append the per-doc report. Returns the drained log.
    */
  def run(spark: SparkSession, dir: String, workDir: String): DataFrame = {
    setup(spark, dir, workDir)
    val outDir = s"$workDir/report"
    val outPath = new org.apache.hadoop.fs.Path(outDir)
    val outFs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    outFs.delete(outPath, true)
    outFs.mkdirs(outPath)
    // drain-scoped persist: the store is eval-bounded; the first
    // trigger materializes it, every later trigger scans memory
    val evalGrams = spark.read.parquet(s"$workDir/eval_grams")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val q = spark.readStream
        .schema(docSchema)
        .option("maxFilesPerTrigger", "2")
        .parquet(s"$workDir/feed")
        .writeStream
        .outputMode("append")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          Decontaminate
            .ngramOverlapGrams(batch, evalGrams, "doc_id", "text", N)
            .write.mode("append").parquet(outDir)
          ()
        }
        .start()
      q.processAllAvailable()
      q.stop()
    } finally evalGrams.unpersist()
    spark.read.schema(reportSchema).parquet(outDir)
  }
}
