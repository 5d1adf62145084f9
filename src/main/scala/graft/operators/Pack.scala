package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Sequence packing: lay the corpus's token streams end to end in a
  * deterministic document order and cut the concatenation into
  * fixed-budget training sequences (the GPT-style concat-and-chunk
  * packing step). Each document is annotated with the sequence range it
  * lands in: `seq_debut` / `seq_fin` (0-based indices of the first and
  * last sequence holding any of its tokens) and `n_seqs` — the inputs a
  * shard writer needs to emit sequences, and the statistic (documents
  * split across sequence boundaries) that packing-quality dashboards
  * track.
  *
  * Scale design: the global token offset of each document is a WEIGHTED
  * prefix sum in doc order — the same shape as [[Surrogate.denseId]]'s
  * two-phase dense ids, and like there a plain
  * `sum().over(Window.orderBy(id))` would plan an Exchange
  * SinglePartition (one task sorts and scans the corpus). Instead:
  * range-partition on the order key (distributed sort), count ONE
  * narrow (partition, token-total) row per partition to the driver,
  * and convert to per-partition starting offsets applied in a second
  * per-partition pass — every partition computes its documents' global
  * offsets in parallel from its own prefix. Token counting is the
  * compiled tokenizer (pure map) and runs before the range exchange,
  * so the shuffle carries only (doc_id, n_tokens) — the text never
  * moves.
  *
  * CRITICAL single-materialization contract: Spark's RangePartitioner
  * seeds its boundary sampling with the RDD id, so two INDEPENDENT
  * executions of the same `repartitionByRange` are NOT guaranteed the
  * same partition boundaries once input partitions exceed the sample
  * size — a totals job and a data job run as separate queries could
  * silently disagree on which partition a boundary document belongs
  * to, corrupting its offset. Both passes therefore run on ONE RDD
  * instance ([[Surrogate.denseId]]'s `zipWithIndex` pattern): the
  * totals job executes the shuffle once, and the data pass reuses the
  * SAME materialized shuffle output, making the boundary choice —
  * whatever it sampled — shared by construction.
  */
object Pack {

  /** Annotate each document with its packed-sequence range under a
    * `seqTokens`-token budget, concatenating in ascending `idCol`
    * order. Zero-token documents get the zero-width range at their
    * offset's sequence. Output: (doc_id, n_tokens, tok_debut,
    * seq_debut, seq_fin, n_seqs).
    *
    * The order key must be UNIQUE (the corpus PK): the cumulative
    * window's default RANGE frame makes duplicate keys peers that
    * share one running total, so duplicates would overlap in the
    * packed stream — in this formulation AND in the single-window
    * twin. Same contract as [[Surrogate.denseId]] determinism.
    */
  def sequences(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      seqTokens: Int,
      numPartitions: Int = 0,
      startOffset: Long = 0L
  ): DataFrame =
    sequencesCounted(docs, idCol, Text.tokenCount(col(textCol)),
      seqTokens, numPartitions, startOffset)

  /** [[sequences]] over a PRE-TOKENIZED relation (idCol, tokensCol) —
    * the id-shard path: a corpus already encoded to trained-tokenizer
    * ids (array&lt;int&gt;) packs on id counts, so the budget is counted
    * in the unit a trainer bills (BPE tokens), not whitespace words.
    */
  def sequencesTokens(
      toks: DataFrame,
      idCol: String,
      tokensCol: String,
      seqTokens: Int,
      numPartitions: Int = 0,
      startOffset: Long = 0L
  ): DataFrame =
    sequencesCounted(toks, idCol, size(col(tokensCol)),
      seqTokens, numPartitions, startOffset)

  private def sequencesCounted(
      docs: DataFrame,
      idCol: String,
      nTokens: Column,
      seqTokens: Int,
      numPartitions: Int,
      startOffset: Long
  ): DataFrame = {
    require(seqTokens > 0, "seqTokens must be positive")
    require(startOffset >= 0, "startOffset must be non-negative")
    val spark = docs.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val counted = docs
      .select(col(idCol).as("doc_id"), nTokens.cast("long").as("n_tokens"))
      .repartitionByRange(parts, col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
    // ONE RDD instance for both jobs (see the scale-design contract
    // above): the totals job runs the shuffle, the data pass below
    // reuses its map output — identical boundaries by construction
    val rdd = counted.rdd
    val idType = counted.schema("doc_id").dataType
    // one narrow (partition, token-total) row per partition (empty
    // partitions included), then a running prefix + startOffset (the
    // incremental-ingest continuation — see streaming/IngestPack)
    val sums = rdd
      .mapPartitionsWithIndex { case (i, it) =>
        var s = 0L; it.foreach(r => s += r.getLong(1)); Iterator(i -> s)
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = sums.scanLeft(startOffset)(_ + _) // offsets(i) = prefix before partition i
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", idType),
      org.apache.spark.sql.types.StructField("n_tokens",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("cum",
        org.apache.spark.sql.types.LongType)))
    val withCum = spark.createDataFrame(
      rdd.mapPartitionsWithIndex { case (i, it) =>
        var acc = offsets(i)
        it.map { r =>
          acc += r.getLong(1)
          org.apache.spark.sql.Row(r.get(0), r.getLong(1), acc)
        }
      }, schema)
    withCum.select(Seq(col("doc_id"), col("n_tokens")) ++ seqRange(seqTokens): _*)
  }

  /** tok_debut (the document's global token offset — what a shard
    * writer seeks to) and seq_debut/seq_fin/n_seqs from a global
    * running token total `cum` — `div` (exact integer division on
    * longs), never `/` (double, which drifts past 2^53 tokens).
    */
  private def seqRange(seqTokens: Int): Seq[Column] = {
    val debut = expr(s"(cum - n_tokens) div ${seqTokens}L")
    val fin = greatest(debut, expr(s"(greatest(cum, 1L) - 1L) div ${seqTokens}L"))
    Seq(
      (col("cum") - col("n_tokens")).as("tok_debut"),
      debut.as("seq_debut"),
      fin.as("seq_fin"),
      (fin - debut + lit(1L)).as("n_seqs"))
  }

  /** The per-sequence manifest: how many documents and tokens each
    * packed sequence holds — the no-gaps-no-overlaps proof of
    * [[sequences]] (every sequence except the last must hold exactly
    * `seqTokens` tokens; PackSpec asserts it, the d20 oracle recomputes
    * it). A doc spanning sequences s..t contributes the overlap of its
    * global token interval [tok_debut, tok_debut + n_tokens) with each
    * sequence's [s·budget, (s+1)·budget).
    *
    * Scale shape: the explode emits ~(total_tokens / seqTokens +
    * n_docs) rows — one per (doc, touched sequence), never per token —
    * and the rollup groupBy(seq_id) is map-side combinable over keys
    * uniform by construction (consecutive integers). One narrow
    * exchange on top of [[sequences]]'s two.
    */
  def manifest(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      seqTokens: Int,
      numPartitions: Int = 0
  ): DataFrame = {
    val b = lit(seqTokens.toLong)
    sequences(docs, idCol, textCol, seqTokens, numPartitions)
      .filter(col("n_tokens") > 0) // zero-width docs hold no tokens
      .select(col("doc_id"), col("tok_debut"), col("n_tokens"),
        explode(sequence(col("seq_debut"), col("seq_fin"))).as("seq_id"))
      .withColumn("contrib",
        least((col("seq_id") + 1L) * b, col("tok_debut") + col("n_tokens")) -
          greatest(col("seq_id") * b, col("tok_debut")))
      .groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("contrib")).as("n_tokens"))
  }

  /** The materialized packed sequences — what a training job actually
    * reads. One row per sequence: its token stream (every sequence
    * except the last holds exactly `seqTokens` tokens) and its
    * provenance (`docs`: which document slices built it, at which
    * in-sequence offsets) — the round-trip evidence that no token was
    * dropped, duplicated or reordered.
    *
    * Scale shape: [[sequences]] contributes its two narrow exchanges;
    * on top of that the corpus text moves exactly twice — once through
    * the doc_id join that meets each document with its range
    * annotation, once through the groupBy(seq_id) re-cut. That second
    * exchange is the irreducible cost of shard emission (the output IS
    * the corpus re-cut on sequence boundaries); the slice rows it
    * carries are one per (doc, touched sequence), never per token, and
    * seq_id keys are consecutive integers — uniform by construction,
    * no skew. Nothing is collected to the driver.
    */
  def packedSequences(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      seqTokens: Int,
      numPartitions: Int = 0
  ): DataFrame =
    packedSequencesTokens(
      docs.select(col(idCol), Text.tokens(col(textCol)).as("__graft_toks")),
      idCol, "__graft_toks", seqTokens, numPartitions)

  /** [[packedSequences]] over a PRE-TOKENIZED relation — the element
    * type is free (string words, int BPE ids), the packing arithmetic
    * identical; emitted `tokens` arrays carry the input element type.
    */
  def packedSequencesTokens(
      docsToks: DataFrame,
      idCol: String,
      tokensCol: String,
      seqTokens: Int,
      numPartitions: Int = 0
  ): DataFrame =
    assembleSequences(
      packedSlicesTokens(docsToks, idCol, tokensCol, seqTokens, numPartitions),
      seqTokens)

  /** The per-(doc, touched-sequence) SLICE rows of the packed stream —
    * the append grain of shard emission. Each row is one document's
    * overlap with one sequence window: (seq_id, doc_id, deb, n,
    * tranche) with `deb` the slice's GLOBAL token position — so slices
    * are computable batch-locally given a running `startOffset`, and a
    * streaming loader (IngestIdShards) can append a batch's slices
    * without waiting for sequences straddling the batch boundary to
    * close. Grouping on seq_id ([[assembleSequences]]) yields the
    * materialized sequences.
    */
  def packedSlicesTokens(
      docsToks: DataFrame,
      idCol: String,
      tokensCol: String,
      seqTokens: Int,
      numPartitions: Int = 0,
      startOffset: Long = 0L
  ): DataFrame = {
    val b = lit(seqTokens.toLong)
    val toks = docsToks.select(col(idCol).as("doc_id"), col(tokensCol).as("toks"))
    val ann = sequencesTokens(docsToks, idCol, tokensCol, seqTokens, numPartitions, startOffset)
      .filter(col("n_tokens") > 0) // zero-token docs hold no slice
    // budget-gated static broadcast of the NARROW range annotation
    // (one ~64 B row per doc) into the token join: un-hinted, the
    // corpus token arrays paid their doc_id shuffle WRITE before AQE's
    // runtime flip (the d29/d28/d10 lesson — SCALE.md r13 measured the
    // d22 join inflating its byte growth exactly at the threshold
    // crossing). Sized from scan metadata only (no hidden job); inputs
    // whose cardinality is not metadata-derivable, and corpora past
    // the budget (~8 M docs at the default), keep the shuffled join —
    // the honest both-sides-huge plan.
    val annSide = graft.sources.ScanStats.exactRowCountNoJob(docsToks) match {
      case Some(n) if n <= Dedup.sigBroadcastBudget(docsToks.sparkSession) / 64L => broadcast(ann)
      case _ => ann
    }
    annSide
      .join(toks, Seq("doc_id"))
      .select(col("doc_id"), col("tok_debut"), col("n_tokens"), col("toks"),
        explode(sequence(col("seq_debut"), col("seq_fin"))).as("seq_id"))
      .withColumn("deb", greatest(col("seq_id") * b, col("tok_debut")))
      .withColumn("fin", least((col("seq_id") + 1L) * b, col("tok_debut") + col("n_tokens")))
      // `fin` (= deb + n, the slice's global END) stays in the output:
      // persisted with the slice log, it makes the log's token
      // high-water mark max(fin) a parquet FOOTER-STATISTICS question —
      // [[recoveredOffset]] and [[finalizeSliceLog]] read it driver-side
      // with no Spark job (the io05 maxLongNoJob doctrine, guide §6)
      .select(col("seq_id"), col("doc_id"), col("deb"), (col("fin") - col("deb")).as("n"),
        col("fin"),
        expr("slice(toks, CAST(deb - tok_debut + 1 AS INT), CAST(fin - deb AS INT))").as("tranche"))
  }

  /** Group slice rows ([[packedSlicesTokens]] columns) into the
    * materialized sequences: (seq_id, tokens, docs provenance).
    * sort_array on array&lt;struct&gt; orders by the leading field:
    * deb — global token position, unique within a sequence (slices are
    * disjoint), so splicing is deterministic even when the slices of
    * one sequence arrived in DIFFERENT appended batches.
    */
  def assembleSequences(slices: DataFrame, seqTokens: Int): DataFrame = {
    val b = lit(seqTokens.toLong)
    slices
      .groupBy(col("seq_id"))
      .agg(sort_array(collect_list(struct(
        col("deb"), col("doc_id"), col("n"), col("tranche")))).as("parts"))
      .select(
        col("seq_id"),
        flatten(transform(col("parts"), p => p.getField("tranche"))).as("tokens"),
        transform(col("parts"), p => struct(
          p.getField("doc_id").as("doc_id"),
          (p.getField("deb") - col("seq_id") * b).cast("int").as("debut_dans_seq"),
          p.getField("n").cast("int").as("n_tokens"))).as("docs"))
  }

  /** Write packed training shards: `seqsPerShard` consecutive sequences
    * per shard directory (`shard_id=K/` parquet, one or two files each —
    * the range repartition keeps every shard's rows contiguous). Fixed
    * sequence count IS fixed token count — the d20 manifest proves every
    * sequence except the last holds exactly `seqTokens` tokens, so a
    * shard is seqsPerShard·seqTokens tokens and output files come out
    * uniformly sized by construction.
    */
  def writeShards(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      seqTokens: Int,
      seqsPerShard: Int,
      outDir: String,
      numPartitions: Int = 0
  ): Unit =
    writeShardsOf(packedSequences(docs, idCol, textCol, seqTokens, numPartitions),
      seqsPerShard, outDir, numPartitions)

  /** [[writeShards]] over a PRE-TOKENIZED relation — the trained-
    * tokenizer shard emitter: shards carry id sequences (the artifact a
    * trainer reads), not whitespace words.
    */
  def writeShardsTokens(
      docsToks: DataFrame,
      idCol: String,
      tokensCol: String,
      seqTokens: Int,
      seqsPerShard: Int,
      outDir: String,
      numPartitions: Int = 0
  ): Unit =
    writeShardsOf(
      packedSequencesTokens(docsToks, idCol, tokensCol, seqTokens, numPartitions),
      seqsPerShard, outDir, numPartitions)

  private def writeShardsOf(
      packed: DataFrame, seqsPerShard: Int, outDir: String, numPartitions: Int): Unit = {
    require(seqsPerShard > 0, "seqsPerShard must be positive")
    val parts =
      if (numPartitions > 0) numPartitions
      else packed.sparkSession.sessionState.conf.numShufflePartitions
    packed
      .withColumn("shard_id", expr(s"seq_id div ${seqsPerShard}L"))
      .repartitionByRange(parts, col("shard_id"), col("seq_id"))
      .write.mode("overwrite").partitionBy("shard_id").parquet(outDir)
  }

  /** Read emitted shards back: (shard_id, seq_id, tokens, docs). */
  def readShards(spark: org.apache.spark.sql.SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir)
      .select(col("shard_id").cast("long").as("shard_id"),
        col("seq_id"), col("tokens"), col("docs"))

  /** Outcome of one [[finalizeSliceLog]] pass: how many whole shards
    * were emitted by THIS call, the store's sequence watermark after it
    * (sequences `[0, watermarkSeqs)` live in shard files; the log holds
    * only `seq_id >= watermarkSeqs`), and the residual open-tail slice
    * count left in the trimmed log (-1 when the caller passed
    * `countResidual = false` — the count is reporting-only, one whole
    * job a hot loop like the p06 refresh skips).
    */
  final case class FinalizeResult(newShards: Long, watermarkSeqs: Long, residualSlices: Long)

  private def watermarkPath(shardDir: String) =
    new org.apache.hadoop.fs.Path(s"$shardDir/_WATERMARK_SEQS")

  /** The shard store's sequence watermark: max of the marker file and
    * the store's own files (max committed shard_id + 1, times the shard
    * grain). The marker is a CACHE, the files are the truth — finalize
    * appends shards first and writes the marker last, so a crash
    * between the two leaves a stale marker; trusting it alone would
    * re-emit [marker, filesWm) in append mode and duplicate sequences
    * in the write-once store. The files side costs no Spark job: shard
    * ids are partition directory names, probed highest-first until one
    * holds committed part files (normally the first probe).
    *
    * "Files are the truth" is safe because finalize PUBLISHES shards by
    * staged per-dir rename in ascending id order (never a task-committed
    * append into the live store): a visible shard dir is complete, and
    * a crash mid-publication leaves a contiguous prefix — never a
    * partial highest shard or a hole the probe would skip past.
    */
  def shardWatermarkSeqs(
      spark: org.apache.spark.sql.SparkSession,
      shardDir: String,
      seqsPerShard: Int
  ): Long = {
    val p = watermarkPath(shardDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker =
      if (fs.exists(p)) {
        val in = fs.open(p)
        try in.readLong() finally in.close()
      } else 0L
    val sd = new org.apache.hadoop.fs.Path(shardDir)
    val files =
      if (!fs.exists(sd)) 0L
      else {
        val ids = fs.listStatus(sd).iterator
          .filter(_.isDirectory)
          .map(_.getPath)
          .filter(_.getName.startsWith("shard_id="))
          .flatMap(q => scala.util.Try(q.getName.stripPrefix("shard_id=").toLong)
            .toOption.map(_ -> q))
          .toArray
          .sortBy(-_._1)
        ids.find { case (_, q) => hasParquetData(fs, q) }
          .map { case (id, _) => (id + 1L) * seqsPerShard } getOrElse 0L
      }
    math.max(marker, files)
  }

  /** True global token high-water mark of an appended slice log WITH a
    * shard store: max over the log's own `deb + n` and the store
    * watermark — after a finalize pass trimmed the log exactly at a
    * shard boundary the log can be EMPTY while the stream is mid-
    * corpus, so offset recovery (a restarted incremental loader's
    * first act) must consult both. One scalar read, no corpus pass:
    * the log agg is over the bounded open tail.
    */
  def recoveredOffset(
      spark: org.apache.spark.sql.SparkSession,
      logDir: String,
      shardDir: String,
      seqTokens: Int,
      seqsPerShard: Int
  ): Long = {
    val lp = new org.apache.hadoop.fs.Path(logDir)
    val fs = lp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // repair a finalize crashed mid-swap BEFORE concluding "no log":
    // treating a swapped-aside log as absent would silently fall back
    // to the store watermark and drop the open tail
    Swap.recover(fs, finalizeTmpPath(logDir), lp)
    val logHw = if (hasParquetData(fs, lp)) logHighWater(spark, logDir) else 0L
    math.max(logHw, shardWatermarkSeqs(spark, shardDir, seqsPerShard) * seqTokens.toLong)
  }

  /** The log's token high-water mark, max(deb + n) over its slices:
    * answered from parquet FOOTER STATISTICS of the persisted `fin`
    * column (= deb + n — [[packedSlicesTokens]] writes it for exactly
    * this) with NO Spark job when derivable, else the aggregate — the
    * fallback for a log written before `fin` existed or a stats-less
    * file. Same value either way (fin is exact per row, the footer max
    * is exact under [[graft.sources.ScanStats.maxLongNoJob]]'s
    * contract); the recovery still reads only the on-disk artifact.
    */
  private def logHighWater(
      spark: org.apache.spark.sql.SparkSession, logDir: String): Long = {
    val df = spark.read.parquet(logDir)
    val footer =
      if (df.columns.contains("fin"))
        graft.sources.ScanStats.maxLongNoJob(df, "fin")
      else None
    footer.getOrElse(
      df.agg(coalesce(max(col("deb") + col("n")), lit(0L))).collect()(0).getLong(0))
  }

  private def finalizeTmpPath(logDir: String) =
    new org.apache.hadoop.fs.Path(s"${logDir}__finalize_tmp")

  private def hasParquetData(
      fs: org.apache.hadoop.fs.FileSystem, p: org.apache.hadoop.fs.Path): Boolean =
    fs.exists(p) && {
      val it = fs.listFiles(p, true)
      var found = false
      while (!found && it.hasNext) {
        val f = it.next()
        found = f.getPath.getName.startsWith("part-") && f.getLen > 0
      }
      found
    }

  /** Finalize an appended slice log ([[packedSlicesTokens]] rows) into
    * immutable training-shard files, and TRIM the log to its open tail
    * — the maintenance pass of continuous shard emission (io03's
    * Compact applied to the packed stream; the AnnIndex.compact
    * precedent). A sequence is CLOSED once the log's token high-water
    * mark passes its end — slice coverage of `[0, hw)` is gapless by
    * the pack arithmetic, so closure is pure arithmetic, no scan. Only
    * WHOLE shards (`seqsPerShard` consecutive closed sequences) are
    * emitted, so a shard directory is written exactly once and never
    * rewritten — the immutability a trainer's shard manifest relies
    * on; the trailing partial shard stays in the log until it fills.
    *
    * Idempotent and incremental: the store watermark says where the
    * previous pass stopped; a call with nothing newly closed emits
    * nothing and leaves the log untouched. The trimmed tail is
    * BOUNDED — under `seqsPerShard + 1` sequences of tokens plus the
    * still-open document overhang — so the rewrite coalesces to one
    * file regardless of corpus size, and every pass over the log
    * (watermark agg, emit filter, trim) touches only tail-scale data
    * once the previous trim ran.
    */
  def finalizeSliceLog(
      spark: org.apache.spark.sql.SparkSession,
      logDir: String,
      shardDir: String,
      seqTokens: Int,
      seqsPerShard: Int,
      numPartitions: Int = 0,
      countResidual: Boolean = true
  ): FinalizeResult = {
    require(seqTokens > 0, "seqTokens must be positive")
    require(seqsPerShard > 0, "seqsPerShard must be positive")
    val lp = new org.apache.hadoop.fs.Path(logDir)
    val fs = lp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Swap.recover(fs, finalizeTmpPath(logDir), lp) // repair a crashed prior trim
    val before = shardWatermarkSeqs(spark, shardDir, seqsPerShard)
    if (!hasParquetData(fs, lp))
      return FinalizeResult(0L, before, 0L)

    val slices = spark.read.parquet(logDir)
    val hw = logHighWater(spark, logDir) // footer-stats `fin` max, agg fallback
    val closedSeqs = hw / seqTokens
    val after = (closedSeqs / seqsPerShard) * seqsPerShard
    if (after <= before) {
      val residual =
        if (countResidual) slices.filter(col("seq_id") >= before).count() else -1L
      return FinalizeResult(0L, before, residual)
    }

    // emit the newly-closed whole shards: sequence assembly over the
    // [before, after) slice window, shard-contiguous files (the
    // writeShards layout — readShards reads both stores identically).
    // STAGED publication: a direct append(partitionBy) into the live
    // store commits task-by-task, so a crash mid-job can leave a
    // PARTIAL highest shard or holes in lower ones — and the
    // files-derived watermark (max committed shard id + 1) would then
    // advance past sequences that never landed, so finalize never
    // re-emits them: silent permanent gaps. Stage the whole emission in
    // a sibling tmp dir (job-committed before anything becomes visible),
    // then rename each completed shard dir into the store in ASCENDING
    // id order — a crash mid-loop leaves a contiguous committed prefix,
    // exactly the invariant the highest-first watermark probe assumes,
    // and the untrimmed log re-emits the rest on the next pass.
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val emitTmp = new org.apache.hadoop.fs.Path(s"${shardDir}__emit_tmp")
    fs.delete(emitTmp, true) // garbage from a crashed prior emission
    assembleSequences(
      slices.filter(col("seq_id") >= before && col("seq_id") < after), seqTokens)
      .withColumn("shard_id", expr(s"seq_id div ${seqsPerShard}L"))
      .repartitionByRange(parts, col("shard_id"), col("seq_id"))
      .write.mode("overwrite").partitionBy("shard_id").parquet(emitTmp.toString)
    val sdPath = new org.apache.hadoop.fs.Path(shardDir)
    fs.mkdirs(sdPath)
    fs.listStatus(emitTmp).iterator
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter(_.getName.startsWith("shard_id="))
      .toArray
      .sortBy(p => p.getName.stripPrefix("shard_id=").toLong)
      .foreach { p =>
        val dst = new org.apache.hadoop.fs.Path(sdPath, p.getName)
        require(fs.rename(p, dst), s"finalize: publishing shard $p -> $dst failed")
      }
    fs.delete(emitTmp, true)

    // trim the log to the open tail (bounded — see scaladoc), then
    // swap: the tmp write is an ACTION, so the residual is fully
    // materialized before the crash-safe two-rename publication (the
    // live log dir never has a does-not-exist window — Swap's contract)
    val tmp = finalizeTmpPath(logDir)
    fs.delete(tmp, true)
    slices.filter(col("seq_id") >= after)
      .coalesce(1)
      .write.mode("overwrite").parquet(tmp.toString)
    Swap.publish(fs, tmp, lp)

    val wm = watermarkPath(shardDir)
    val out = wm.getFileSystem(spark.sparkContext.hadoopConfiguration).create(wm, true)
    try out.writeLong(after) finally out.close()

    FinalizeResult((after - before) / seqsPerShard, after,
      if (countResidual) spark.read.parquet(logDir).count() else -1L)
  }

  /** Re-cut an existing shard store at a NEW sequence budget — the
    * context-length migration a trainer config change forces (say
    * 512 → 2048 tokens), WITHOUT re-tokenizing or re-reading the raw
    * corpus: the store's provenance entries recover every document
    * slice's GLOBAL token position (seq_id·oldBudget + in-seq offset),
    * and global positions are INVARIANT under a re-cut — only the
    * window boundaries move. Output is therefore IDENTICAL to a direct
    * [[packedSequencesTokens]] of the original corpus at the new
    * budget, provenance included (PackSpec pins the equality; the
    * original pack laid docs at these offsets, and this pass preserves
    * them bit-for-bit).
    *
    * Scale shape: two exchanges, same class as the pack itself — one
    * doc-keyed merge that splices each document's slices back into its
    * contiguous global run (keys unique per doc, no skew), one
    * seq-keyed assembly at the new budget (consecutive-integer keys).
    * No prefix sum, no driver scalar: the offsets already exist in the
    * store. The re-window between them is pure map arithmetic.
    */
  def reshard(shards: DataFrame, oldSeqTokens: Int, newSeqTokens: Int): DataFrame = {
    require(oldSeqTokens > 0 && newSeqTokens > 0, "budgets must be positive")
    val bOld = lit(oldSeqTokens.toLong)
    val b = lit(newSeqTokens.toLong)
    val docSlices = shards
      .select(col("seq_id"), col("tokens"), explode(col("docs")).as("d"))
      .select(col("d.doc_id").as("doc_id"),
        (col("seq_id") * bOld + col("d.debut_dans_seq")).as("deb"),
        expr("slice(tokens, d.debut_dans_seq + 1, d.n_tokens)").as("tranche"))
    val docs = docSlices
      .groupBy(col("doc_id"))
      .agg(min(col("deb")).as("tok_debut"),
        flatten(transform(array_sort(collect_list(struct(col("deb"), col("tranche")))),
          p => p.getField("tranche"))).as("toks"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
    val slices = docs
      .select(col("doc_id"), col("tok_debut"), col("n_tokens"), col("toks"),
        explode(sequence(expr(s"tok_debut div ${newSeqTokens}L"),
          expr(s"(tok_debut + n_tokens - 1) div ${newSeqTokens}L"))).as("seq_id"))
      .withColumn("deb", greatest(col("seq_id") * b, col("tok_debut")))
      .withColumn("fin", least((col("seq_id") + 1L) * b, col("tok_debut") + col("n_tokens")))
      .select(col("seq_id"), col("doc_id"), col("deb"), (col("fin") - col("deb")).as("n"),
        expr("slice(toks, CAST(deb - tok_debut + 1 AS INT), CAST(fin - deb AS INT))").as("tranche"))
    assembleSequences(slices, newSeqTokens)
  }

  /** Scrub documents OUT of a packed shard store — the deletion-request
    * path (right-to-be-forgotten against training data) for an artifact
    * whose whole design is immutable offsets: REMOVING a document would
    * shift every global position after it and invalidate all downstream
    * shards, manifests and slice logs, so the compliance-honest
    * operation is masking — overwrite the document's token ranges with
    * `pad` IN PLACE, keeping every sequence id, length, boundary and
    * provenance entry frozen (the provenance row must survive: it is
    * the auditable record that a deletion happened there).
    *
    * Scale shape: deletion requests are a BOUNDED set by the common
    * case (thousands of ids against billions of docs), so the ids
    * collect to the driver under `maxIds` and ship as a plan literal;
    * the scrub itself is ONE pure-map pass over the sequences — per
    * sequence, per provenance entry, an id probe and (on the rare hit)
    * an in-place range fill. No exchange, no join. PAST `maxIds` the
    * call degrades to [[tombstoneJoin]] — the distributed-relation mask
    * with identical semantics — instead of failing: oversize deletions
    * (a source takedown, a licensing sweep) stay a green path.
    */
  def tombstone(
      shards: DataFrame,
      tombstoneIds: DataFrame,
      pad: Column,
      maxIds: Int = 1000000
  ): DataFrame = {
    val idField = tombstoneIds.schema.fields.head
    // the probe kernel is a LONG hash set: require an integral id
    // column up front (a string/decimal relation would otherwise die in
    // an opaque ClassCastException at collect time) and widen narrower
    // integrals to long; a NULL id has no deletion semantics — it FAILS
    // the job (the AnnIndex.tombstone shared contract, r18 verdict:
    // silently dropping nulls "deleted" fewer rows than the caller sent
    // and read as a clean maintenance pass)
    require(Set[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
        .contains(idField.dataType),
      s"tombstone id column '${idField.name}' must be an integral type " +
        s"(got ${idField.dataType.simpleString}) — the in-place scrub probes a long hash set")
    val collected = tombstoneIds
      .select(when(col(idField.name).isNull,
          raise_error(lit("tombstone: deletion id list contains NULL — a null " +
            "id has no deletion semantics; resolve or drop nulls explicitly " +
            "before calling")))
        .otherwise(col(idField.name).cast("long")).as("id"))
      .distinct()
      .limit(maxIds + 1).collect()
    if (collected.length > maxIds)
      // oversize deletion set: the driver-literal probe would blow the
      // plan budget — degrade to the distributed join mask (identical
      // result, PackSpec pins the equality; the Decontaminate
      // budget-fallback convention)
      return tombstoneJoin(shards, tombstoneIds, pad)
    maskWithIds(shards, collected.map(_.getLong(0)), pad)
  }

  /** The in-place pad mask over a PRE-COLLECTED deletion id set — the
    * shared kernel of [[tombstone]] and [[readShardsMasked]] (the
    * latter already pays a registry collect for its emptiness answer;
    * re-collecting inside tombstone was a second job for the same ids).
    *
    * docs entries are ordered by in-sequence position (assembleSequences
    * builds them from the sorted slices), so rebuilding tokens as the
    * concat of per-entry ranges reproduces untouched sequences
    * bit-for-bit; the provenance schema is deliberately UNCHANGED —
    * whether an entry was scrubbed is re-derivable from the tombstone
    * list, and keeping the store schema stable means every reader
    * (readShards, reshard, manifest audits) works on a scrubbed store
    * verbatim. Membership is the compiled O(1) hash probe — an
    * array_contains plan literal scans the WHOLE id set per entry,
    * which the x1000 probe measured going quadratic across decades
    * (both the deletion set and the entry count grow with the corpus).
    */
  private def maskWithIds(shards: DataFrame, ids: Array[Long], pad: Column): DataFrame =
    shards.withColumn("tokens",
      flatten(transform(col("docs"), d =>
        when(org.apache.spark.sql.graft.TextExpr.inLongSet(d.getField("doc_id"), ids),
          array_repeat(pad, d.getField("n_tokens")))
          .otherwise(slice(col("tokens"),
            d.getField("debut_dans_seq") + lit(1), d.getField("n_tokens"))))))

  /** [[tombstone]]'s OVERSIZE path — the deletion set as a distributed
    * RELATION instead of a driver plan literal, for the day a deletion
    * request outgrows the bounded-set contract (a source-level takedown,
    * a licensing sweep: millions of ids against the store). Identical
    * masking semantics — same pad, same frozen offsets/boundaries/
    * provenance — via joins end to end:
    *
    * Scale shape: the store's PROVENANCE entries (narrow columns only —
    * seq_id, entry index, doc_id; never the token arrays) meet the
    * deletion relation in one equi-join (Catalyst broadcasts the smaller
    * side or shuffles both — the honest both-sides-huge plan), and the
    * hit ENTRY INDICES roll up per sequence: ≤ entries-per-sequence
    * values, so the second join back to the token-carrying store is a
    * bounded-payload left join keyed on seq_id (unique — no skew) and
    * the in-row mask probes a tiny per-row index set. The token arrays
    * cross exactly one exchange (the seq_id join), nothing is collected
    * to the driver at any deletion-set size. [[tombstone]] dispatches
    * here automatically past its `maxIds` budget.
    */
  def tombstoneJoin(
      shards: DataFrame,
      tombstoneIds: DataFrame,
      pad: Column
  ): DataFrame = {
    val idField = tombstoneIds.schema.fields.head
    require(Set[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
        .contains(idField.dataType),
      s"tombstone id column '${idField.name}' must be an integral type " +
        s"(got ${idField.dataType.simpleString})")
    val ids = tombstoneIds
      .select(when(col(idField.name).isNull,
          raise_error(lit("tombstone: deletion id list contains NULL — a null " +
            "id has no deletion semantics; resolve or drop nulls explicitly " +
            "before calling")))
        .otherwise(col(idField.name).cast("long")).as("doc_id"))
      .distinct()
    val hits = shards
      .select(col("seq_id"), posexplode(col("docs")).as(Seq("entree", "d")))
      .select(col("seq_id"), col("entree"), col("d.doc_id").as("doc_id"))
      .join(ids, Seq("doc_id"), "left_semi")
      .groupBy(col("seq_id"))
      .agg(collect_set(col("entree")).as("entrees_effacees"))
    shards
      .join(hits, Seq("seq_id"), "left")
      .withColumn("tokens",
        when(col("entrees_effacees").isNull, col("tokens"))
          .otherwise(flatten(transform(col("docs"), (d, i) =>
            when(array_contains(col("entrees_effacees"), i),
              array_repeat(pad, d.getField("n_tokens")))
              .otherwise(slice(col("tokens"),
                d.getField("debut_dans_seq") + lit(1), d.getField("n_tokens")))))))
      .drop("entrees_effacees")
  }

  // -------------------------------------------------------------------
  // Policy-driven shard-store maintenance: logical deletes + a
  // dead-fraction watermark that triggers repack (the p08/e13 doctrine
  // applied to the third store family).
  // -------------------------------------------------------------------

  private def tombstoneRegistryPath(shardDir: String) =
    new org.apache.hadoop.fs.Path(s"$shardDir/_TOMBSTONES")

  private def repackVersionPath(shardDir: String) =
    new org.apache.hadoop.fs.Path(s"$shardDir/_REPACK_VERSION")

  /** The store's pending LOGICAL deletions — doc ids registered by
    * [[maintainTombstone]] but not yet physically removed by a repack.
    * Underscore-prefixed, so [[readShards]]' parquet scan never sees the
    * registry. Distinct at read: re-registering an id (a duplicate
    * deletion request across waves) must stay idempotent in the
    * dead-token measure and the repack anti-join alike.
    */
  def pendingTombstones(
      spark: org.apache.spark.sql.SparkSession, shardDir: String): DataFrame = {
    if (tombstoneRegistryHasFiles(spark, shardDir))
      spark.read.parquet(tombstoneRegistryPath(shardDir).toString)
        .select(col("doc_id")).distinct()
    else spark.range(0).select(col("id").as("doc_id"))
  }

  /** FS-only registry probe: does the store's tombstone registry hold
    * any parquet part file at all? For RESTORE PREDICATES ("is this
    * store exactly the pristine pre-window state") this is the right
    * question — a registry DIRECTORY is already not pristine — and it
    * costs a listing, never a Spark job (the former
    * `pendingTombstones(...).isEmpty` paid a full plan/schedule round
    * to answer the same bit; a zero-row part file, unreachable through
    * [[maintainTombstone]], reads as non-pristine here, which errs
    * toward restoring — the conservative direction).
    */
  def tombstoneRegistryHasFiles(
      spark: org.apache.spark.sql.SparkSession, shardDir: String): Boolean = {
    val p = tombstoneRegistryPath(shardDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet"))
  }

  /** The store's repack generation: 1 for a freshly-written store, +1
    * per policy-fired repack (observability + the io09 gate pin — the
    * files are the truth, the marker is the generation label).
    */
  def repackVersion(
      spark: org.apache.spark.sql.SparkSession, shardDir: String): Long = {
    val p = repackVersionPath(shardDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 1L
    else {
      val in = fs.open(p)
      try in.readLong() finally in.close()
    }
  }

  private def writeRepackVersion(
      spark: org.apache.spark.sql.SparkSession, dir: String, v: Long): Unit = {
    val p = repackVersionPath(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.writeLong(v) finally out.close()
  }

  /** Dead-token fraction of the store: tokens belonging to registry ids
    * over all tokens, measured from the NARROW provenance columns only
    * (explode of `docs` — column pruning keeps the token arrays out of
    * the scan), so the policy decision costs a metadata-weight pass at
    * any store size. Registry ids absent from the store contribute
    * nothing (deleting an already-deleted doc is a no-op, not an error).
    */
  def deadTokenFraction(
      spark: org.apache.spark.sql.SparkSession, shardDir: String): Double =
    deadStats(spark, shardDir, pendingTombstones(spark, shardDir))._1

  /** One-job policy measurement: the dead-token fraction AND the
    * registry cardinality, from a single collect. [[maintainTombstone]]
    * needs both on every below-watermark window; computing them as two
    * actions paid a second full plan/schedule round per wave for a
    * 1-row answer (the measured driver floor is per-ACTION, not
    * per-byte — guide §1/§7: the planning round trips, not the task
    * work, dominate a metadata-weight decision). The two aggregates
    * ride one plan via a 1-row × 1-row cross join (the scalar-CTE
    * shape, never a cartesian of data relations).
    */
  private def deadStats(
      spark: org.apache.spark.sql.SparkSession,
      shardDir: String,
      reg: DataFrame,
      maxIds: Int = 1000000): (Double, Long) = {
    val prov = spark.read.parquet(shardDir)
      .select(explode(col("docs")).as("d"))
      .select(col("d.doc_id").as("doc_id"), col("d.n_tokens").cast("long").as("n"))
    // the registry is request-scale by the same bounded-set contract as
    // [[tombstone]]'s plan-literal probe: collect it once (a KB scan)
    // and measure dead tokens with a compiled in-set probe — NO join,
    // no crossJoin, so the provenance agg is one partial+final pass and
    // AQE schedules ~2 stage-jobs where the former join+crossJoin plan
    // ran ~7 per wave (JobTrace, r22). The collected ids double as the
    // pending cardinality, which the old plan paid a crossJoin for.
    // Past `maxIds` the measure degrades to the join formulation —
    // identical numbers (reg is distinct; a left join of distinct ids
    // marks exactly the in-set rows).
    val ids = reg.limit(maxIds + 1).collect()
    if (ids.length <= maxIds) {
      val idArr = ids.map(_.getLong(0))
      val row = prov
        .agg(sum(col("n")).as("total"),
          sum(when(org.apache.spark.sql.graft.TextExpr.inLongSet(col("doc_id"), idArr),
            col("n")).otherwise(lit(0L))).as("morts"))
        .collect()(0)
      val total = if (row.isNullAt(0)) 0L else row.getLong(0)
      val dead = if (row.isNullAt(1)) 0L else row.getLong(1)
      (if (total == 0L) 0.0 else dead.toDouble / total.toDouble, idArr.length.toLong)
    } else {
      val row = prov
        .join(reg.withColumn("__mort", lit(1)), Seq("doc_id"), "left")
        .agg(sum(col("n")).as("total"),
          sum(when(col("__mort") === 1, col("n")).otherwise(lit(0L))).as("morts"))
        .crossJoin(reg.agg(count(lit(1)).cast("long").as("pending")))
        .collect()(0)
      val total = if (row.isNullAt(0)) 0L else row.getLong(0)
      val dead = if (row.isNullAt(1)) 0L else row.getLong(1)
      val pending = if (row.isNullAt(2)) 0L else row.getLong(2)
      (if (total == 0L) 0.0 else dead.toDouble / total.toDouble, pending)
    }
  }

  /** [[readShards]] with the pending logical deletions applied — the
    * SERVE path between repacks: one pure-map [[tombstone]] mask over
    * the registry (bounded-set plan literal, join fallback past
    * `maxIds`), so a reader never sees a registered doc's tokens even
    * though the files still hold them.
    */
  def readShardsMasked(
      spark: org.apache.spark.sql.SparkSession,
      shardDir: String,
      pad: Column,
      maxIds: Int = 1000000
  ): DataFrame = {
    // ONE registry read decides emptiness AND feeds the mask: an absent
    // registry costs a listing (no job); a present one costs one KB
    // collect whose ids go straight into the compiled probe — the
    // former isEmpty-then-tombstone pair planned and collected the same
    // registry twice per serve (guide §1.2: per-action floor)
    if (!tombstoneRegistryHasFiles(spark, shardDir)) readShards(spark, shardDir)
    else {
      val reg = pendingTombstones(spark, shardDir)
      val collected = reg.limit(maxIds + 1).collect()
      if (collected.isEmpty) readShards(spark, shardDir)
      else if (collected.length > maxIds)
        tombstoneJoin(readShards(spark, shardDir), reg, pad)
          .select(col("shard_id"), col("seq_id"), col("tokens"), col("docs"))
      else
        maskWithIds(readShards(spark, shardDir), collected.map(_.getLong(0)), pad)
          .select(col("shard_id"), col("seq_id"), col("tokens"), col("docs"))
    }
  }

  /** Outcome of one [[maintainTombstone]] window: the dead-token
    * fraction measured after registering the wave (the policy's
    * decision input), whether the repack fired, the store's repack
    * generation after the window, and the registry size left pending.
    */
  final case class RepackResult(
      deadFrac: Double, repacked: Boolean, version: Long, pending: Long)

  /** One POLICY-GOVERNED deletion window of the shard-store maintenance
    * loop — the [[graft.queries.RefreshPipeline.maintainedRefresh]] /
    * [[AnnIndex.maintainAppend]] doctrine applied to the packed-shard
    * store. Deletion requests are LOGICAL first: the wave's ids are
    * validated (integral, non-null — [[tombstone]]'s shared contract:
    * a null id has no deletion semantics and FAILS the job) and appended
    * to the `_TOMBSTONES` registry; readers mask them at serve time
    * ([[readShardsMasked]]) without touching the immutable files. The
    * policy then measures the store's dead-token fraction and — at
    * `deadFracWatermark` — repacks: surviving documents are reassembled
    * from the store's own offsets (never a corpus re-read), re-packed at
    * the same budget in the original document order, and the new
    * generation is staged and [[Swap]]-published atomically with a
    * CLEARED registry and a bumped generation marker. The repacked store
    * equals the one-shot pack of the surviving corpus (the io09 gate).
    *
    * Scale shape: registering is O(wave); the fraction measure is a
    * narrow provenance scan (token arrays pruned out); the repack is
    * corpus-LINEAR — the honest maintenance-cadence cost, identical in
    * class to [[reshard]] — and the watermark bounds how much dead
    * weight serves carry before paying it. An EMPTY wave is not a
    * deletion window: it registers nothing and never fires the repack
    * (the [[AnnIndex.maintainAppend]] empty-batch rule), so warm re-runs
    * with nothing to delete cannot spuriously rewrite the store.
    *
    * Maintenance windows are SERIALIZED by contract (one maintainer owns
    * a store). A crash mid-repack is repaired by [[Swap.recover]] at the
    * next window's entry; a crash after the registry append simply
    * leaves the wave pending — the next window re-measures and the
    * policy converges. The store must retain at least one document: a
    * full-corpus takedown is store deletion, not maintenance.
    */
  def maintainTombstone(
      spark: org.apache.spark.sql.SparkSession,
      shardDir: String,
      deletions: DataFrame,
      deadFracWatermark: Double,
      seqTokens: Int,
      seqsPerShard: Int
  ): RepackResult = {
    require(deadFracWatermark > 0 && deadFracWatermark <= 1,
      "deadFracWatermark must be in (0, 1]")
    val livePath = new org.apache.hadoop.fs.Path(shardDir)
    val tmpDir = s"${shardDir}__repack_tmp"
    val tmpPath = new org.apache.hadoop.fs.Path(tmpDir)
    val fs = livePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Swap.recover(fs, tmpPath, livePath)
    val idField = deletions.schema.fields.head
    require(Set[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
        .contains(idField.dataType),
      s"maintainTombstone id column '${idField.name}' must be an integral type " +
        s"(got ${idField.dataType.simpleString}) — the registry is a long id relation")
    // ONE action registers the wave AND answers "was the wave empty":
    // the registry append's own Observation carries the row count, so
    // the former separate deletions.isEmpty probe (a full plan/schedule
    // round per window for one bit) folds into the write. An empty wave
    // appends zero rows — a zero-row task writes no part file, and any
    // stray zero-row file is swept below — so registry state matches
    // the old skip-the-write path exactly, and the empty-wave rule
    // (registers nothing, never fires the repack) is preserved.
    val regPath = tombstoneRegistryPath(shardDir)
    val partsBefore: Set[String] =
      if (!fs.exists(regPath)) Set.empty
      else fs.listStatus(regPath).map(_.getPath.getName).toSet
    val waveObs = org.apache.spark.sql.Observation(
      s"tombstone_wave_${System.nanoTime()}")
    deletions
      .select(when(col(idField.name).isNull,
          raise_error(lit("maintainTombstone: deletion id list contains NULL — " +
            "a null id has no deletion semantics; resolve or drop nulls " +
            "explicitly before calling")))
        .otherwise(col(idField.name).cast("long")).as("doc_id"))
      .distinct()
      // one file per wave: the registry is request-scale (ids only) and
      // a 32-partition shuffle write of a KB relation is pure stage floor
      .coalesce(1)
      .observe(waveObs, count(lit(1)).as("n"))
      .write.mode("append").parquet(regPath.toString)
    if (waveObs.get("n").asInstanceOf[Long] == 0L) {
      // sweep anything the empty append left behind (normally nothing:
      // an empty task writes no file) so the registry is byte-identical
      // to the former skip-the-write path
      if (fs.exists(regPath))
        fs.listStatus(regPath).map(_.getPath)
          .filter(p => !partsBefore.contains(p.getName) && p.getName.startsWith("part-"))
          .foreach(p => fs.delete(p, false))
      val (frac0, pending0) = deadStats(spark, shardDir, pendingTombstones(spark, shardDir))
      return RepackResult(frac0, repacked = false,
        repackVersion(spark, shardDir), pending0)
    }
    // one registry frame serves the measurement AND (on the fired path)
    // the repack anti-join — the registry parquet is listed/planned
    // once per decision instead of once per consumer
    val reg = pendingTombstones(spark, shardDir)
    val (frac, pending) = deadStats(spark, shardDir, reg)
    val version = repackVersion(spark, shardDir)
    if (frac < deadFracWatermark)
      return RepackResult(frac, repacked = false, version, pending)
    // the documented floor, now enforced (r20 ADVICE #3): frac == 1.0
    // means every stored token belongs to a registered id (zero-token
    // docs hold no slices), so the survivor set is EMPTY — repacking it
    // would Swap-publish a store with no parquet rows that every later
    // read fails on with an opaque schema-inference error. The check is
    // free: it reuses the fraction the policy already measured.
    require(frac < 1.0,
      "maintainTombstone: the deletion wave covers every stored document — " +
        "the store must retain at least one document; a full-corpus " +
        "takedown is store deletion, not maintenance")
    // watermark crossed: repack the survivors from the store's own
    // offsets into a fresh staged generation, then swap it live —
    // registry cleared and generation bumped atomically with the
    // publish (the new generation simply does not carry them)
    val survivors = spark.read.parquet(shardDir)
      .select(col("seq_id"), col("tokens"), explode(col("docs")).as("d"))
      .select(col("d.doc_id").as("doc_id"),
        (col("seq_id") * lit(seqTokens.toLong) + col("d.debut_dans_seq")).as("deb"),
        expr("slice(tokens, d.debut_dans_seq + 1, d.n_tokens)").as("tranche"))
      .join(reg, Seq("doc_id"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("deb"), col("tranche")))),
        p => p.getField("tranche"))).as("toks"))
    writeShardsOf(
      packedSequencesTokens(survivors, "doc_id", "toks", seqTokens),
      seqsPerShard, tmpDir, numPartitions = 0)
    writeRepackVersion(spark, tmpDir, version + 1)
    Swap.publish(fs, tmpPath, livePath)
    RepackResult(frac, repacked = true, version + 1, pending = 0L)
  }

  /** The single-window formulation `sequences` must equal whenever the
    * order key is unique — the spec's reference implementation (an
    * Exchange SinglePartition plan, so test-scale only).
    */
  private[graft] def sequencesSingleTask(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      seqTokens: Int
  ): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), Text.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(Window.orderBy(col("doc_id"))))
      .select(Seq(col("doc_id"), col("n_tokens")) ++ seqRange(seqTokens): _*)
}
