package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Vectors

/** Persisted IVF-PQ vector index — the stored-model pattern
  * (IngestDedup's signature store, IngestQuality's LM store) applied to
  * ANN search: the index is TRAINED AND ENCODED ONCE when the corpus is
  * published, and every later consumer — batch queries (e08), streaming
  * vector screens (s12) — serves from the store without touching the
  * raw corpus again except for the final exact re-rank.
  *
  * Store layout under `dir`:
  *   - `centroids/`  (cell INT, v ARRAY&lt;DOUBLE&gt;) — the nList coarse
  *     centroids; tiny, read driver-side, shipped as a task reference.
  *   - `codebooks/`  (sub INT, code INT, v ARRAY&lt;DOUBLE&gt;) — the m PQ
  *     sub-codebooks; same footprint class as one centroid set.
  *   - `codes/`      (idCol, cell INT, codes ARRAY&lt;INT&gt;) — one row per
  *     corpus vector: its coarse cell plus m small-int PQ codes. This
  *     is the scan target at serve time — a few bytes per vector
  *     against dim·4 raw, which is what fits in cluster memory at
  *     100 TB while the float vectors stay in the cold exact store.
  *
  * Versioning: callers fingerprint the store with the corpus file
  * status plus a format string carrying (nList, m, codes, iters) — the
  * IngestDrift.setup convention — so a parameter or corpus change
  * re-publishes instead of serving stale codes.
  */
object AnnIndex {

  /** Train (driver-side, bounded deterministic sample — O(1) in corpus
    * size) and encode (one compiled map pass over the corpus), then
    * persist all three store components.
    */
  def write(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dir: String,
      nList: Int = 16,
      m: Int = 8,
      codes: Int = 16,
      iters: Int = 3
  ): Unit = {
    import org.apache.spark.sql.graft.VectorExpr
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = Similarity.trainCentroids(corpus, idCol, vecCol, nList, iters)
    val books = Similarity.trainPqCodebooks(corpus, idCol, vecCol, m, codes, iters)
    cents.zipWithIndex
      .map { case (v, i) => (i, v.toSeq) }.toSeq
      .toDF("cell", "v")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    books.zipWithIndex
      .flatMap { case (b, s) => b.zipWithIndex.map { case (v, c) => (s, c, v.toSeq) } }.toSeq
      .toDF("sub", "code", "v")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/codebooks")
    // the corpus-scale component: pure map (assign + encode), no
    // shuffle — PARTITIONED BY COARSE CELL: the serve path joins the
    // store on `cell`, so a cell-partitioned layout lets the scan prune
    // to probed cells (dynamic partition pruning against the broadcast
    // probe side — the PlanSpec-pinned production-serve plan), which at
    // 100 TB is the difference between scanning nProbe/nList of the
    // store and all of it
    corpus
      .select(col(idCol), Vectors.toDouble(col(vecCol)).as("v_c"))
      .select(col(idCol),
        VectorExpr.argMaxIndex(VectorExpr.centroidScores(col("v_c"), cents)).as("cell"),
        VectorExpr.pqEncode(col("v_c"), books).as("codes"))
      .write.partitionBy("cell").mode("overwrite").parquet(s"$dir/codes")
  }

  /** Incremental store maintenance: encode an ARRIVING batch with the
    * PUBLISHED model — centroids and codebooks are FROZEN at publish
    * time (the IVF-PQ operating contract: retraining is a re-publish
    * decision, taken when recall drift says so, never per batch) — and
    * append its code rows to `codes/`. Pure map over the batch + an
    * append write: the standing corpus is never touched, so daily
    * ingest keeps the index current at the cost of encoding the day's
    * vectors only. Served results over the appended store are
    * identical to a store whose codes were written in one shot with
    * the same model (the e09 gate proves it against the brute oracle
    * over the union corpus).
    */
  def append(batch: DataFrame, idCol: String, vecCol: String, dir: String): Unit = {
    appendCounted(batch, idCol, vecCol, dir)
    ()
  }

  /** [[append]] whose write carries its own row count (Observation):
    * the one action answers "how many rows landed" as well, so policy
    * callers ([[maintainAppend]]) need no separate emptiness probe.
    */
  private def appendCounted(
      batch: DataFrame, idCol: String, vecCol: String, dir: String): Long = {
    import org.apache.spark.sql.graft.VectorExpr
    val (cents, books) = readModel(batch.sparkSession, dir)
    val obs = org.apache.spark.sql.Observation(s"ann_append_${System.nanoTime()}")
    batch
      .select(col(idCol), Vectors.toDouble(col(vecCol)).as("v_c"))
      .select(col(idCol),
        VectorExpr.argMaxIndex(VectorExpr.centroidScores(col("v_c"), cents)).as("cell"),
        VectorExpr.pqEncode(col("v_c"), books).as("codes"))
      .observe(obs, count(lit(1)).as("n"))
      .write.partitionBy("cell").mode("append").parquet(s"$dir/codes")
    obs.get("n").asInstanceOf[Long]
  }

  /** Appends landed since the last compaction — the compaction
    * policy's watermark counter ([[maintainAppend]]). A GENERATION
    * count, not a file count: file counts vary with input partitioning
    * and fixture size, while "how many frozen-model appends has this
    * store absorbed" is deterministic per store history — the same
    * doctrine as the chain-depth watermark (RefreshPipeline
    * .CompactDepth counts layers, never bytes).
    */
  def appendsSinceCompact(spark: SparkSession, dir: String): Int = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/_APPENDS_SINCE_COMPACT")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0
    else {
      val in = fs.open(p)
      try in.readInt() finally in.close()
    }
  }

  private def writeAppendsSinceCompact(spark: SparkSession, dir: String, n: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/_APPENDS_SINCE_COMPACT")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.writeInt(n) finally out.close()
  }

  /** One POLICY-GOVERNED append of the index maintenance loop (the
    * [[graft.queries.RefreshPipeline.maintainedRefresh]] twin in the
    * vector tier): append the batch with the frozen model, then — when
    * the store has absorbed `appendsWatermark` appends since its last
    * compaction — run [[compact]] on the spot. Every append leaves a
    * per-batch file set, so an unbounded append chain's serve scan
    * pays per-file open cost without bound (the chain-depth law's
    * file-grain analogue); the watermark bounds it, and the fold is
    * maintenance-cadence work whose serve-identity e13 gates. Returns
    * the post-append counter (0 when the policy just compacted).
    *
    * Maintenance windows are SERIALIZED by contract (the refresh-loop
    * convention shared with [[tombstone]]/[[republish]]: one maintainer
    * owns a store) — the counter marker is not a concurrency primitive.
    * A crash between the append and the marker write under-counts by
    * one and merely defers the fold a window; the store itself stays
    * consistent (append is atomic per batch, compact is staged+swapped).
    */
  def maintainAppend(
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      dir: String,
      appendsWatermark: Int = 6
  ): Int = {
    require(appendsWatermark >= 1, "appendsWatermark must be >= 1")
    val spark = batch.sparkSession
    // an EMPTY batch is not an append: it adds no file generation, so
    // it must not advance the watermark — a warm re-run whose
    // append-missing delta is empty (the e13 retry path) would
    // otherwise drift the counter up and fire a spurious full-store
    // rewrite on the Nth re-run (r19 review finding). The emptiness
    // bit rides the append write's own Observation (appendCounted) —
    // an empty batch's write lands zero part files (dynamic partition
    // tasks with no rows create none), so the store is untouched and
    // the former separate limit-1 isEmpty job per window is gone.
    if (appendCounted(batch, idCol, vecCol, dir) == 0L)
      return appendsSinceCompact(spark, dir)
    val n = appendsSinceCompact(spark, dir) + 1
    if (n >= appendsWatermark) {
      compact(spark, dir) // resets the counter
      0
    } else {
      writeAppendsSinceCompact(spark, dir, n)
      n
    }
  }

  /** Read the two model components back (tiny — driver-side arrays,
    * cell/sub/code order restored from the stored keys).
    */
  def readModel(spark: SparkSession, dir: String): (Array[Array[Double]], Array[Array[Array[Double]]]) = {
    recoverStore(spark, dir)
    // driver-direct parquet read (DriverParquet): the two model
    // components are KB-scale coalesce(1) stores, and the former
    // spark.read...collect() paid two full plan/schedule/collect round
    // trips per call — on the serve/append/maintain paths that read the
    // model every window, almost pure driver-floor cost (guide §1.2/§5)
    import graft.sources.DriverParquet
    val conf = spark.sparkContext.hadoopConfiguration
    val cents = DriverParquet.rows(conf, s"$dir/centroids")
      .map(g => DriverParquet.int(g, "cell") -> DriverParquet.doubleArray(g, "v"))
      .toArray.sortBy(_._1).map(_._2)
    val rows = DriverParquet.rows(conf, s"$dir/codebooks")
      .map(g => (DriverParquet.int(g, "sub"), DriverParquet.int(g, "code"),
        DriverParquet.doubleArray(g, "v")))
      .toArray
    val m = rows.map(_._1).max + 1
    val books = Array.tabulate(m)(s => rows.filter(_._1 == s).sortBy(_._2).map(_._3))
    (cents, books)
  }

  /** The stored per-vector index rows (idCol, cell, codes). The store
    * is cell-partitioned on disk (partition columns read back LAST), so
    * the canonical column order is restored here for positional
    * readers; `cell` stays the partition column in the plan, so a
    * downstream cell join still prunes the scan.
    */
  def codes(spark: SparkSession, dir: String): DataFrame = {
    recoverStore(spark, dir)
    val df = spark.read.parquet(s"$dir/codes")
    val idName = df.schema.fieldNames.head
    df.select(col(idName), col("cell"), col("codes"))
  }

  /** Recall probe — the measurement behind the RE-PUBLISH decision the
    * frozen-model contract defers (appends encode with publish-time
    * centroids/codebooks; as the data distribution drifts away from
    * them, the PRODUCTION serve configuration silently loses recall).
    * Serves `queries` (a bounded deterministic sample) from the stored
    * index at (nProbe, shortlist) and compares against brute force over
    * `corpus` (the true-vector relation for everything the store
    * indexes): per query, hits = |served ∩ brute top-k|, recall =
    * hits / |brute top-k|. Output (query_id, n_verite, n_touches,
    * rappel). Cost: |sample|·|corpus| brute pass + one probed-cell
    * serve — O(sample), never O(corpus²).
    */
  def recallProbe(
      spark: SparkSession,
      dir: String,
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nProbe: Int,
      shortlist: Int
  ): DataFrame = {
    val (cents, books) = readModel(spark, dir)
    val stored = codes(spark, dir)
    val storedIdCol = stored.schema.fieldNames.head
    recallProbeCoded(
      stored.select(col(storedIdCol).as("neighbor_id"), col("cell"), col("codes")),
      cents, books, queries, corpus, idCol, vecCol, k, nProbe, shortlist)
  }

  /** [[recallProbe]] over an explicit code relation + model — the
    * monitor entry point when the probe must be RESTRICTED (e.g. a
    * per-batch drift row measures base ∪ this batch only, so the row is
    * deterministic whatever order earlier appends landed in).
    */
  def recallProbeCoded(
      coded: DataFrame,
      cents: Array[Array[Double]],
      books: Array[Array[Array[Double]]],
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nProbe: Int,
      shortlist: Int
  ): DataFrame = {
    val vecs = corpus
      .select(col(idCol).as("neighbor_id"), Vectors.toDouble(col(vecCol)).as("v_c"))
    val brute = Similarity
      .bruteForceKnn(corpus, queries, idCol, vecCol, k)
      .select(col("query_id"), col("neighbor_id"))
    recallProbeCodedAgainst(coded, cents, books, queries, vecs, brute,
      idCol, vecCol, k, nProbe, shortlist)
  }

  /** [[recallProbeCoded]] against a PRECOMPUTED ground truth — the
    * monitor kernel when the brute pass is shared across measurements
    * (e12's transition probes the store pre AND post republish over the
    * SAME sample and corpus: the model changes, never the data, so the
    * truth is computed once and both probes adjudicate against it).
    * `vecs` is the corpus pre-projected to (neighbor_id, v_c) — the
    * shape [[Similarity.pqKnnIvfCoded]] re-ranks against — and `truth`
    * is (query_id, neighbor_id) exact rows. Keeping the serve-vs-truth
    * join/rollup HERE (one definition) means a future change to the
    * recall semantics (tie handling, rounding) reaches every monitor.
    */
  def recallProbeCodedAgainst(
      coded: DataFrame,
      cents: Array[Array[Double]],
      books: Array[Array[Array[Double]]],
      queries: DataFrame,
      vecs: DataFrame,
      truth: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nProbe: Int,
      shortlist: Int
  ): DataFrame = {
    val served = Similarity
      .pqKnnIvfCoded(coded, vecs, queries, idCol, vecCol, k, cents, books, nProbe, shortlist)
      .select(col("query_id"), col("neighbor_id"))
    truth
      .join(served.withColumn("touche", lit(1)), Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(
        count(lit(1)).as("n_verite"),
        coalesce(sum(col("touche")), lit(0L)).as("n_touches"))
      .select(col("query_id"), col("n_verite"), col("n_touches"),
        round(col("n_touches").cast("double") / col("n_verite").cast("double"), 6)
          .as("rappel"))
  }

  /** The publish generation of a store: the `_PUBLISH_VERSION` marker,
    * or 1 for a store [[write]] created before any [[republish]] (the
    * marker is observability, the files are the truth).
    */
  def version(spark: SparkSession, dir: String): Long = {
    recoverStore(spark, dir)
    val p = new org.apache.hadoop.fs.Path(s"$dir/_PUBLISH_VERSION")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 1L
    else {
      val in = fs.open(p)
      try in.readLong() finally in.close()
    }
  }

  /** The RE-PUBLISH decision's action — what [[recallProbe]] /
    * IngestAnnDrift's alarm calls for: retrain the coarse centroids and
    * PQ codebooks on the corpus AS IT NOW STANDS (base plus every
    * frozen-model appended batch — the distribution the publish-time
    * model drifted away from), re-encode EVERY vector with the new
    * model, and swap the rebuilt store in atomically (write aside,
    * delete, rename — the [[compact]] contract at whole-store grain).
    * Readers serve the old generation until the swap instant; the
    * `_PUBLISH_VERSION` marker records the new generation. Returns the
    * new version.
    *
    * Scale shape: retraining is the bounded driver-side sample
    * (O(1) in corpus size) and the re-encode is ONE pure-map pass over
    * the corpus — the honest cost of a republish at 100 TB is exactly
    * that linear encode pass, which is why it is an alarm-driven
    * decision and not a per-batch reflex (the [[append]] contract).
    */
  def republish(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dir: String,
      nList: Int = 16,
      m: Int = 8,
      codes: Int = 16,
      iters: Int = 3
  ): Long = {
    val spark = corpus.sparkSession
    val newVersion = version(spark, dir) + 1L
    val tmpDir = s"${dir}_republish_tmp"
    val hc = spark.sparkContext.hadoopConfiguration
    val tmpPath = new org.apache.hadoop.fs.Path(tmpDir)
    val fs = tmpPath.getFileSystem(hc)
    fs.delete(tmpPath, true)
    write(corpus, idCol, vecCol, tmpDir, nList, m, codes, iters)
    val vp = new org.apache.hadoop.fs.Path(s"$tmpDir/_PUBLISH_VERSION")
    val out = fs.create(vp, true)
    try out.writeLong(newVersion) finally out.close()
    // crash-safe two-rename publication: the live store never has a
    // does-not-exist window (a crash inside the old delete-then-rename
    // left readers seeing an EMPTY index) — Swap.recover in the read
    // paths repairs any interrupted state
    Swap.publish(fs, tmpPath, new org.apache.hadoop.fs.Path(dir))
    newVersion
  }

  /** Repair any crashed [[republish]]/[[compact]]/[[tombstone]] swap —
    * called by the store read paths before touching files.
    */
  private def recoverStore(spark: SparkSession, dir: String): Unit = {
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Swap.recover(fs, new org.apache.hadoop.fs.Path(s"${dir}_republish_tmp"), dirPath)
    Swap.recover(fs, new org.apache.hadoop.fs.Path(s"$dir/codes_compact_tmp"),
      new org.apache.hadoop.fs.Path(s"$dir/codes"))
    Swap.recover(fs, new org.apache.hadoop.fs.Path(s"$dir/codes_tombstone_tmp"),
      new org.apache.hadoop.fs.Path(s"$dir/codes"))
  }

  /** DELETION for the index store — the refresh loop's evictee path
    * ([[graft.operators.Pack.tombstone]]'s twin in the vector tier,
    * and the op that makes e09/e10's append/republish pair a full
    * maintenance set): drop every indexed row whose id is in `ids`,
    * rewriting `codes/` aside and swapping it in atomically (the
    * [[compact]] staging contract; [[recoverStore]] repairs a crash).
    * Codes rows carry no positional provenance — the packed TEXT store
    * must pad-mask in place to freeze global offsets, but an index row
    * set just shrinks — so deletion is an honest anti-join rewrite:
    * O(store) NARROW bytes (a few per vector, the [[compact]] cost
    * class, never the raw dim·4 vectors), and a cell-partitioned
    * production store would prune the rewrite to touched files.
    * Idempotent: re-running with the same ids converges to the same
    * row set. Centroids/codebooks are untouched — deletion never
    * retrains (the frozen-model contract; the drift monitor decides
    * when retraining is due).
    */
  def tombstone(spark: SparkSession, dir: String, ids: DataFrame): Unit = {
    recoverStore(spark, dir)
    val codesDir = s"$dir/codes"
    val tmpDir = s"$dir/codes_tombstone_tmp"
    val stored = spark.read.parquet(codesDir)
    val idName = stored.schema.fieldNames.head
    val idType = stored.schema.fields.head.dataType
    // fail LOUDLY on an id relation the store cannot address
    // (Pack.tombstone's contract — its integral-id require is pinned in
    // PackSpec): a silent cast-to-null here would "delete" nothing and
    // read as a clean maintenance pass. Integral widths may differ
    // (value-preserving widening/narrowing is checked by the no-new-
    // nulls assertion below via try_cast), and an integral list may
    // address a STRING-id store — cast-to-string is value-preserving
    // ('5' matches CAST(5 AS STRING)), so that widening is allowed
    // explicitly (SimilaritySpec pins it). Anything else is a caller
    // bug.
    val idField = ids.schema.fields.head
    val integral = Set[org.apache.spark.sql.types.DataType](
      org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
    require(idField.dataType == idType ||
        (integral.contains(idField.dataType) &&
          (integral.contains(idType) ||
            idType == org.apache.spark.sql.types.StringType)),
      s"tombstone id column '${idField.name}' has type " +
        s"${idField.dataType.simpleString}, incompatible with the store's " +
        s"id type ${idType.simpleString}")
    val tmpPath = new org.apache.hadoop.fs.Path(tmpDir)
    val fs = tmpPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(tmpPath, true)
    // the integral→string widening matches CANONICALLY-formatted string
    // ids only (CAST(5 AS STRING) = '5'); against a store holding '05'
    // or ' 5' the anti join would silently delete nothing — the exact
    // silent-no-op class this contract exists to prevent (r19 ADVICE
    // #5), and the try_cast guard below can't fire since long→string
    // never nulls. Guard on the STORED side, inside the same rewrite
    // scan the anti join pays anyway: any store id that try_casts to a
    // bigint but does not round-trip back to itself is integrally-
    // intended-but-non-canonical, so an integral eviction list cannot
    // address it — fail loudly instead of no-op'ing. (Ids that are not
    // numeric at all pass through: an integral list genuinely cannot
    // mean them, so leaving them untouched is correct.)
    val integralWidening = integral.contains(idField.dataType) &&
      idType == org.apache.spark.sql.types.StringType
    val storedGuarded = if (!integralWidening) stored else
      stored.withColumn(idName,
        when(col(idName).isNotNull &&
            col(idName).try_cast("bigint").isNotNull &&
            col(idName).try_cast("bigint").cast("string") =!= col(idName),
          raise_error(concat(lit("tombstone: integral eviction ids cannot " +
            "address a non-canonical string id in the store (would silently " +
            "delete nothing): '"), col(idName), lit("'"))))
          .otherwise(col(idName)))
    // the null and out-of-range guards ride the anti join's build side:
    // a NULL eviction id has no deletion semantics — silently dropping
    // it (the pre-r19 behavior) "deleted" fewer rows than the caller
    // sent, so it fails the job (Pack.tombstone's shared contract), and
    // a non-null id that try_casts to null (an out-of-range narrowing)
    // fails the same way instead of silently deleting nothing
    storedGuarded.join(
        ids.select(col(idField.name).as("__src"))
          .select(when(col("__src").isNull,
              raise_error(lit("tombstone: eviction id list contains NULL — " +
                "a null id has no deletion semantics; resolve or drop nulls " +
                "explicitly before calling")))
            .when(col("__src").try_cast(idType).isNull,
              raise_error(concat(lit("tombstone: id out of range for the " +
                s"store's ${idType.simpleString} id column: "), col("__src").cast("string"))))
            .otherwise(col("__src").try_cast(idType)).as(idName)),
        Seq(idName), "left_anti")
      .write.partitionBy("cell").mode("overwrite").parquet(tmpDir)
    Swap.publish(fs, tmpPath, new org.apache.hadoop.fs.Path(codesDir))
  }

  /** Compact the append-fragmented `codes/` store: every [[append]]
    * leaves a per-batch file set, and a daily-ingest index accumulates
    * thousands of small files whose per-file open cost dominates the
    * serve scan. Range-clusters on (cell, id) — the serve path filters
    * by probed cell, so cell-contiguous files give the scan min/max
    * pruning — and swaps the rewrite in atomically (write aside,
    * delete, rename: the [[graft.operators.Compact]] contract applied
    * to the index store). Row content is untouched; the e08/e09 serve
    * gates hold verbatim over the compacted store.
    */
  def compact(
      spark: SparkSession, dir: String, targetFileBytes: Long = 128L * 1024 * 1024): Unit = {
    recoverStore(spark, dir)
    val codesDir = s"$dir/codes"
    val tmpDir = s"$dir/codes_compact_tmp"
    val idName = spark.read.parquet(codesDir).schema.fieldNames.head
    Compact.parquet(spark, codesDir, tmpDir,
      Seq(col("cell"), col(idName)), targetFileBytes, partitionCols = Seq("cell"))
    val codesPath = new org.apache.hadoop.fs.Path(codesDir)
    val tmpPath = new org.apache.hadoop.fs.Path(tmpDir)
    val fs = codesPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Swap.publish(fs, tmpPath, codesPath)
    // the compaction-policy watermark resets with the fold it schedules
    writeAppendsSinceCompact(spark, dir, 0)
  }
}
