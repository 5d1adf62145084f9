package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-provided synthetic tables (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. Plain `spark.read.parquet`
  * gives `FileSourceScanExec` with column pruning + predicate pushdown
  * (SURVEY.md §2.1 S2) — at 100 TB these same reads become multi-file
  * partitioned scans; nothing here assumes single-file layout.
  */
object Tables {
  /** Schema memo: `spark.read.parquet` without an explicit schema runs a
    * footer-read JOB per call for inference — a real catalog (metastore)
    * carries schemas, so a query catalog should not re-infer per query.
    * First read of a path infers once; every later read passes the
    * schema and constructs jobless (asserted by DedupSpec's e03
    * job-count case).
    */
  private val schemaMemo =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val known = schemaMemo.get(path)
    if (known != null) spark.read.schema(known).parquet(path)
    else {
      val df = spark.read.parquet(path)
      schemaMemo.put(path, df.schema)
      df
    }
  }

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects;
    * read nanos as LONG (legacy conf) and convert to a microsecond
    * timestamp (truncating — queries only depend on ≥second granularity).
    * The conf is DELIBERATELY left set for the session (here and in the
    * EventsStream builders): the conf is read at scan planning, which
    * for a lazily-built events DataFrame can happen long after this
    * call, so an eager unset elsewhere could fail a not-yet-executed
    * plan. Every nanos-typed read in this library re-sets it; readers
    * of OTHER nanos-typed parquet in the same session should be aware
    * they inherit the legacy long-typed behavior.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Remote relational source (SURVEY §2.1 S4: the reference's dblink
    * pull). In a live deployment the ETL reads the OLTP source through
    * JDBC with predicate pushdown and `partitionColumn` parallelism; in
    * this project the staged tables are read directly (same engine-side
    * semantics). No database ships in this environment, so this helper
    * is deployment-time only.
    */
  def jdbc(
      spark: SparkSession,
      url: String,
      tableOrQuery: String,
      partitionColumn: Option[(String, Long, Long, Int)] = None,
      props: Map[String, String] = Map.empty
  ): DataFrame = {
    var r = spark.read.format("jdbc").option("url", url).option("dbtable", tableOrQuery)
    partitionColumn.foreach { case (c, lo, hi, n) =>
      r = r.option("partitionColumn", c)
        .option("lowerBound", lo).option("upperBound", hi).option("numPartitions", n)
    }
    props.foreach { case (k, v) => r = r.option(k, v) }
    r.load()
  }
}
