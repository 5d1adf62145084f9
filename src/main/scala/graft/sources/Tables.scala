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
  /** The events table's `ts` physical encoding has varied across fixture
    * generations: parquet TIMESTAMP(NANOS) (which Spark's vectorized
    * reader rejects — read as LONG via the legacy conf, then decode),
    * TIMESTAMP(MICROS) with isAdjustedToUTC=false (read as
    * TIMESTAMP_NTZ), or a UTC-adjusted TIMESTAMP. The reference resolves
    * column types from the catalog at read time
    * (sql/source_filmdb/filmdb.sql:211-219); the Spark analogue is to
    * resolve from the parquet footer — `events()` branches on the type
    * the scan actually produces instead of assuming one encoding, so a
    * regenerated fixture cannot silently break every event reader.
    *
    * The nanosAsLong conf is set ONLY when the footer probe says the
    * file really is TIMESTAMP(NANOS) — a micros fixture leaves the
    * session conf untouched, so other nanos-typed reads in the same
    * session are not silently re-typed. On the nanos branch the conf is
    * DELIBERATELY left set for the session afterwards: it is read at
    * scan planning, which for a lazily-built events DataFrame can
    * happen long after this call, so an eager unset elsewhere could
    * fail a not-yet-executed plan.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    if (eventsTsIsNanos(spark, s"$dir/events.parquet"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(table(spark, dir, "events"))
  }

  /** Footer probe: is the events `ts` column physically
    * TIMESTAMP(NANOS)? (Spark's reader rejects nanos unless the legacy
    * nanosAsLong conf is on, so the probe must not go through
    * `spark.read`.) One driver-side footer read per probed file,
    * memoized on (path, length, mtime) — a fixture regenerated in place
    * mid-session changes the fingerprint and re-probes, like
    * IngestDedup's signature-store fingerprint. A directory-layout
    * table probes its first part file (one writer produces one encoding
    * per table; mixed-encoding parts would need a per-file probe).
    */
  private val nanosMemo =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()
  private def eventsTsIsNanos(spark: SparkSession, path: String): Boolean = {
    val conf = spark.sessionState.newHadoopConf()
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(conf)
    // a directory layout with no top-level part files (empty write,
    // partitioned layout) probes as not-nanos: the ordinary read path
    // then reports whatever is actually wrong with the table
    val file: Option[org.apache.hadoop.fs.Path] =
      if (fs.getFileStatus(hp).isDirectory)
        fs.listStatus(hp).map(_.getPath).find(_.getName.startsWith("part-"))
      else Some(hp)
    file.exists { f =>
      val st = fs.getFileStatus(f)
      val key = s"$f#${st.getLen}#${st.getModificationTime}"
      nanosMemo.computeIfAbsent(key, { _ =>
        import org.apache.parquet.hadoop.ParquetFileReader
        import org.apache.parquet.hadoop.util.HadoopInputFile
        import org.apache.parquet.schema.LogicalTypeAnnotation
        val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
        try {
          val schema = reader.getFooter.getFileMetaData.getSchema
          schema.containsField("ts") &&
          (schema.getType(schema.getFieldIndex("ts")).getLogicalTypeAnnotation match {
            case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
              t.getUnit == LogicalTypeAnnotation.TimeUnit.NANOS
            case _ => false
          })
        } finally reader.close()
      })
    }
  }

  /** Normalize a raw events frame so `ts` is a session-TZ TIMESTAMP
    * regardless of the file's physical encoding:
    *   - LONG      → legacy nanos-as-long fixture: truncate to micros
    *                 (queries only depend on ≥second granularity);
    *   - NTZ       → wall-clock micros: reinterpret in the session TZ
    *                 (UTC here — identical instants to what DuckDB's
    *                 naive read gives the oracle);
    *   - TIMESTAMP → already the target type.
    */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df
      case other =>
        throw new IllegalStateException(s"events.ts has unsupported parquet type: $other")
    }
  }

  /** Footer-resolved raw schema for the events STREAMING reader (the file
    * stream source requires an explicit schema; this one matches whatever
    * encoding the fixture actually has, memoized like every other read).
    * Same conf discipline as `events()`: the legacy conf is only touched
    * on a genuinely nanos-typed fixture.
    */
  def eventsRawSchema(spark: SparkSession, dir: String): org.apache.spark.sql.types.StructType = {
    if (eventsTsIsNanos(spark, s"$dir/events.parquet"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events").schema
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
