package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Text
import graft.operators.{Curate, Decontaminate, Dedup, Pack}

/** p06 — INCREMENTAL CORPUS REFRESH: the production loop a 100 TB
  * training-data pipeline actually runs, composed from the persisted
  * screens and store-maintenance ops the catalog gates one by one.
  *
  * A corpus generation is PUBLISHED once ([[setup]]): scrubbed tokens,
  * span-gram store, minhash signature store, duplicate-cluster labels,
  * benchmark eval-gram store, survivor quality stats, the budget
  * selection, and the packed shard store + open-tail slice log. When a
  * new document batch arrives ([[refresh]]), the standing corpus is
  * NEVER re-scrubbed, re-screened or re-read at corpus scale:
  *
  *   1. batch repetition scrub — pure map (d19 kernel);
  *   2. incremental span screen against the published gram store
  *      ([[Dedup.spanScrubTokensAgainst]] — batch grams broadcast into
  *      one map-side store scan; DedupSpec pins ≡ one-shot∪ restricted
  *      to batch);
  *   3. near-dup: batch-internal LSH pairs + batch-vs-corpus pairs
  *      against the published SIGNATURE store (corpus streams one
  *      map-side probe pass), then connected components over
  *      (published cluster labels ∪ new pairs) — labels are a spanning
  *      structure of the published pair graph, so components equal the
  *      one-shot graph's; a batch doc BRIDGING two published clusters
  *      correctly evicts the higher-canonical one;
  *   4. decontamination both ways in ONE merged screen, run
  *      CONCURRENTLY with the near-dup chain (no data dependency): the
  *      batch and the published survivors against (published ∪ new)
  *      eval grams — survivors cannot hit the published grams (they
  *      passed that screen at publish), so their verdicts reduce to the
  *      new-grams check, and new benchmarks can evict old docs; the
  *      survivor pass reads the persisted scrubbed parquet, never raw;
  *   5. budget RE-selection over narrow survivor stats (persisted stats
  *      minus evictions, plus fresh batch stats) — evictions can free
  *      budget that admits previously-just-over-the-line corpus docs;
  *   6. store maintenance ([[Pack]]): tombstone-mask evictees in the
  *      published shards and open tail (io07), append entrant slices at
  *      the recovered offset (s14), finalize whole shards (io05) —
  *      survivors keep their PUBLISHED positions, entrants append at
  *      the tail (positions differ from a one-shot permutation by
  *      design; selection and content must not).
  *
  * GATE: the final report (selection + per-doc fingerprints DECODED
  * from the refreshed store read back from disk) must hash-equal the
  * ORACLE'S ONE-SHOT p04-style rebuild over corpus ∪ batch — the
  * equality that certifies the whole incremental loop. The split is
  * doc_id ≤ ⌊9·max(doc_id)/10⌋ = corpus, rest = batch (the append-only
  * id contract every incremental screen's equality proof relies on:
  * batch ids order after corpus ids).
  *
  * Equality arguments, stage by stage (each pinned by a spec or a
  * prior gate): corpus rows are INVARIANT under appending higher-id
  * docs in every screen — a batch can steal neither a span first
  * occurrence (ordering), nor a cluster canonical (min only falls:
  * once non-canonical, always non-canonical), nor decontaminate
  * backwards (eval grams only grow) — so published stores stay the
  * truth for the corpus side; batch rows see exactly the one-shot's
  * cross-split state through the stores. The selection can only evict
  * or admit corpus docs through those monotone channels, and
  * [[Curate.budgetSelect]] over the merged stats reproduces the
  * one-shot prefix exactly.
  *
  * Scale shape: everything batch-scale except (a) one map-side probe
  * pass of the published sig store, (b) one map-side scan of the
  * persisted scrubbed corpus against the broadcast NEW eval grams, and
  * (c) the store maintenance — bounded by the TRAINING BUDGET, not the
  * corpus (the packed store holds ≤ budget tokens; at a trillion-token
  * budget the tombstone pass would prune to touched shard dirs via the
  * provenance manifest and republish per-dir through Swap, the io07 /
  * finalize staging path). The corpus-scale relations move ZERO bytes
  * through any exchange.
  */
private[graft] object RefreshPipeline {

  private val GramTokens = 8 // span grams (d30/d32 convention)
  private val ShingleN = 3 // near-dup shingles (d06)
  private val SigK = 64
  private val Bands = 32
  private val Threshold = 0.5
  private val DeconN = 5 // benchmark gram width (d16)
  private val Budget = 10000L // training token budget (d33)
  private val SeqTokens = 256
  private val SeqsPerShard = 8
  private val Pad = "<scrub>" // tombstone mask token (io07)

  /** Bump when any published-store layout or convention changes. */
  private val format = "p06-refresh-v3"

  def workDir(dir: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_p06_${Integer.toHexString(dir.hashCode)}"

  /** The corpus/batch split point: docs with id ≤ ⌊9·max/10⌋ are the
    * published generation, the rest arrive as the refresh batch (the
    * oracle hardcodes the same expression — the engine-side convention
    * RefreshSpec pins).
    */
  private def splitThreshold(spark: SparkSession, dir: String): Long = {
    val row = graft.sources.Tables.documents(spark, dir)
      .agg(coalesce(max(col("doc_id")), lit(0L))).collect()(0)
    9L * row.getLong(0) / 10L
  }

  // -------------------------------------------------------------------
  // publish — one-time corpus-generation build (load-phase setup: in
  // production these stores are what "the corpus is ingested" MEANS;
  // Bench runs it untimed, the s06/s13/s15 store-publish convention)
  // -------------------------------------------------------------------

  /** Idempotent per input via the (length, mtime, format) fingerprint. */
  def setup(spark: SparkSession, dir: String): Unit = synchronized {
    val srcPath = new org.apache.hadoop.fs.Path(s"$dir/documents.parquet")
    val fs = srcPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val src = fs.getFileStatus(srcPath)
    val fingerprint = s"documents:${src.getLen}:${src.getModificationTime}:$format"
    val work = workDir(dir)
    val marker = new java.io.File(s"$work/_SETUP_DONE")
    val markerFresh = marker.exists() &&
      new String(java.nio.file.Files.readAllBytes(marker.toPath)) == fingerprint
    if (!markerFresh) {
      fs.delete(new org.apache.hadoop.fs.Path(work), true)
      val t = splitThreshold(spark, dir)
      val corpus = graft.sources.Tables.documents(spark, dir).filter(col("doc_id") <= t)
      publish(spark, corpus, work)
      new java.io.File(work).mkdirs()
      // the split point is part of the published generation — persisted
      // so the per-batch refresh never re-aggregates the corpus for it
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$work/_SPLIT_T"), t.toString.getBytes)
      java.nio.file.Files.write(marker.toPath, fingerprint.getBytes)
    }
  }

  /** The published generation's split point (written by [[setup]]). */
  private def publishedThreshold(work: String): Long =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$work/_SPLIT_T"))).trim.toLong

  /** Build and persist every store of a corpus generation. Mirrors the
    * p04 one-shot stages exactly (curationKept/deconKept conventions),
    * materializing each cross-batch artifact the refresh will probe.
    */
  private def publish(spark: SparkSession, corpus: DataFrame, work: String): Unit = {
    // stage 1: repetition scrub — the span stage's input streams
    val rep = corpus.select(col("doc_id"),
      org.apache.spark.sql.graft.TextExpr
        .repetitionScrub(Text.tokens(col("text")), 3).as("a1"))
    // span-gram store: the corpus AS THE SPAN SCRUB SAW IT (pre-removal
    // streams — spanGramStore's contract), 8 B/gram on the xxhash path
    Dedup.spanGramStore(rep, "doc_id", "a1", GramTokens, exactFingerprints = false)
      .write.mode("overwrite").parquet(s"$work/span_grams")
    // stage 2: corpus span scrub → THE persisted cleaned corpus (every
    // span survivor, including docs later dropped by near-dup/decon —
    // the refresh needs their tokens for pair verification)
    Dedup.spanScrubTokens(rep, "doc_id", "a1", GramTokens, exactFingerprints = false)
      .select(col("doc_id"), col("jetons_gardes").as("jetons"),
        col("n_tokens_gardes").as("n_jetons"))
      .filter(col("n_jetons") > 0)
      .write.mode("overwrite").parquet(s"$work/scrubbed")
    val scrubbed = spark.read.parquet(s"$work/scrubbed")
    // stage 3: signature store + near-dup pairs + cluster labels (the
    // labels persist CONNECTIVITY: every member → its canonical, so the
    // refresh can merge new edges without the corpus pair recompute)
    Dedup.signaturesTokens(scrubbed, "doc_id", "jetons", ShingleN, SigK)
      .write.mode("overwrite").parquet(s"$work/sigs")
    // the pruned band index + hot-bucket list, published beside the sig
    // store (the bandIndex/hotBandBuckets contract): every refresh
    // probes the PERSISTED index instead of re-exploding and
    // re-censusing the corpus signatures per batch
    val sigStore = spark.read.parquet(s"$work/sigs")
    Dedup.hotBandBuckets(sigStore, SigK, Bands)
      .write.mode("overwrite").parquet(s"$work/hot")
    Dedup.bandIndex(sigStore, SigK, Bands,
        hotBuckets = Some(spark.read.parquet(s"$work/hot")), narrow = true)
      .write.mode("overwrite").parquet(s"$work/bands")
    val pairs = Dedup.minhashLshTokens(
      scrubbed, "doc_id", "jetons", ShingleN, SigK, Bands, Threshold)
    Dedup.clusters(pairs)
      .write.mode("overwrite").parquet(s"$work/labels")
    val removed = spark.read.parquet(s"$work/labels")
      .filter(col("id") =!= col("cluster_id")).select(col("id").as("doc_id"))
    val kept = scrubbed.join(removed, Seq("doc_id"), "left_anti")
    // stage 4: benchmark eval-gram store (raw-text grams — the d16
    // convention: benchmarks arrive as external text) + decon screen
    corpus.filter(col("doc_id") % 50 === 0 && col("doc_id") > 0)
      .select(explode(Text.shingles(col("text"), DeconN)).as("g")).distinct()
      .write.mode("overwrite").parquet(s"$work/eval_grams")
    val cont = Decontaminate.contaminatedIdsTokensVsGrams(
      kept, "doc_id", "jetons", spark.read.parquet(s"$work/eval_grams"), DeconN)
    val cln = kept.join(cont, Seq("doc_id"), "left_anti")
    // stage 5: survivor stats — the NARROW relation re-selection reads
    cln.select(col("doc_id"),
        Text.qualityScore(concat_ws(" ", col("jetons"))).as("qualite"), col("n_jetons"))
      .write.mode("overwrite").parquet(s"$work/stats")
    // stage 6: budget selection + packed store (slice log → finalize;
    // pack key = doc_id, so store provenance needs no rank mapping and
    // entrants appended later keep globally-unique keys)
    Curate.budgetSelect(
        spark.read.parquet(s"$work/stats"), "doc_id", "qualite", "n_jetons", Budget)
      .select(col("doc_id"), col("qualite"), col("n_jetons"), col("cum"))
      .write.mode("overwrite").parquet(s"$work/selection")
    val packIn = scrubbed.join(
      broadcast(spark.read.parquet(s"$work/selection").select(col("doc_id"))),
      Seq("doc_id"), "left_semi")
    Pack.packedSlicesTokens(packIn, "doc_id", "jetons", SeqTokens, numPartitions = 1)
      .write.mode("overwrite").parquet(s"$work/store/log")
    Pack.finalizeSliceLog(spark, s"$work/store/log", s"$work/store/shards",
      SeqTokens, SeqsPerShard, numPartitions = 1)
  }

  // -------------------------------------------------------------------
  // refresh — the timed incremental loop
  // -------------------------------------------------------------------

  /** Per-doc token streams of a (shards + open-tail log) store, spliced
    * from slice provenance at global positions — the read-back side of
    * the gate's losslessness check. Handles a store whose shard tier or
    * log tier is empty/absent (tiny corpora close no whole shard).
    */
  private def storePerDoc(spark: SparkSession, storeDir: String): DataFrame = {
    val hc = spark.sparkContext.hadoopConfiguration
    def nonEmpty(p: String): Boolean = {
      val path = new org.apache.hadoop.fs.Path(p)
      val fs = path.getFileSystem(hc)
      fs.exists(path) && {
        val it = fs.listFiles(path, true)
        var found = false
        while (!found && it.hasNext) {
          val f = it.next()
          found = f.getPath.getName.startsWith("part-") && f.getLen > 0
        }
        found
      }
    }
    val b = lit(SeqTokens.toLong)
    val fromShards =
      if (!nonEmpty(s"$storeDir/shards")) None
      else Some(Pack.readShards(spark, s"$storeDir/shards")
        .select(col("seq_id"), col("tokens"), explode(col("docs")).as("d"))
        .select(col("d.doc_id").as("doc_id"),
          (col("seq_id") * b + col("d.debut_dans_seq")).as("deb"),
          expr("slice(tokens, d.debut_dans_seq + 1, d.n_tokens)").as("tranche")))
    val fromLog =
      if (!nonEmpty(s"$storeDir/log")) None
      else Some(spark.read.parquet(s"$storeDir/log")
        .select(col("doc_id"), col("deb"), col("tranche")))
    val slices = (fromShards.toSeq ++ fromLog.toSeq).reduce(_.unionByName(_))
    slices
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("deb"), col("tranche")))).as("parts"))
      .select(col("doc_id"),
        flatten(transform(col("parts"), p => p.getField("tranche"))).as("toks"))
  }

  /** The incremental refresh: batch screens against the published
    * stores, budget re-selection, store maintenance into a NEW
    * generation dir (`refreshed/` — published stores stay immutable, a
    * production loop would Swap the generation live), returning the
    * refreshed selection report read back THROUGH the refreshed store.
    */
  def run(spark: SparkSession, dir: String): DataFrame = {
    setup(spark, dir)
    val trace = sys.env.contains("SPARK_GRAFT_P06_TRACE")
    var t0 = System.nanoTime()
    def mark(stage: String): Unit = if (trace) {
      val t1 = System.nanoTime()
      System.err.println(f"P06TRACE $stage ${(t1 - t0) / 1e9}%.2f s")
      t0 = t1
    }
    val work = workDir(dir)
    val t = publishedThreshold(work)
    val fs = new org.apache.hadoop.fs.Path(work)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$work/refreshed"), true)

    val batch = graft.sources.Tables.documents(spark, dir).filter(col("doc_id") > t)
    // 1-2: repetition scrub (map) + incremental span screen vs the
    // published gram store; checkpointed — five downstream consumers
    val bScrubbed = Dedup.spanScrubTokensAgainst(
        batch.select(col("doc_id"),
          org.apache.spark.sql.graft.TextExpr
            .repetitionScrub(Text.tokens(col("text")), 3).as("a1")),
        "doc_id", "a1", spark.read.parquet(s"$work/span_grams"),
        GramTokens, exactFingerprints = false)
      .select(col("doc_id"), col("jetons_gardes").as("jetons"),
        col("n_tokens_gardes").as("n_jetons"))
      .filter(col("n_jetons") > 0)
      .localCheckpoint(true)
    mark("span_screen")

    // 3: near-dup — ONE union probe produces batch-vs-corpus AND
    // batch-internal pairs: the batch's own band rows union the
    // PUBLISHED pruned band index (no per-refresh census or corpus
    // band explode), the batch signatures — computed once here — serve
    // both the probe side and the sig store union, and components run
    // over (published cluster labels ∪ new pairs). The narrow index +
    // sig-broadcast shape is valid while the sig store fits the
    // broadcast budget (the bandIndex contract; bounded here by the
    // parquet footprint check) — past it the screen falls back to the
    // in-flight FAT band build, sig_c riding the rows, with the
    // published hot list still skipping the census.
    val scrubbedStore = spark.read.parquet(s"$work/scrubbed")
    val sigStore = spark.read.parquet(s"$work/sigs")
    val stats = spark.read.parquet(s"$work/stats")
    // the near-dup chain and the decontamination screen share NO data
    // dependency (contamination is a per-doc property of the scrubbed
    // grams; removing near-dups first only shrinks the screened set, and
    // removed ∩ contaminated double-removal is harmless) — so the two
    // screen chains run CONCURRENTLY, the way a production refresh
    // overlaps independent stages. Spark schedules jobs from both
    // threads; each future ends in an eager checkpoint, so nothing
    // lazy escapes its thread.
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val removedF = scala.concurrent.Future {
      val bSigs = Dedup.signaturesTokens(bScrubbed, "doc_id", "jetons", ShingleN, SigK)
        .localCheckpoint(true)
      val bandR = SigK / Bands
      val bBands = bSigs.select(
        col("doc_id").as("id_corpus"),
        explode(org.apache.spark.sql.graft.TextExpr
          .minhashBands(col("sig"), Bands, bandR)).as("bb"))
      // parquet-footprint stats (no job); ×4 headroom for the columnar →
      // row-object inflation of a broadcast build
      val sigBytes = sigStore.queryExecution.optimizedPlan.stats.sizeInBytes
      val narrowOk = sigBytes * 4 <= BigInt(Dedup.sigBroadcastBudget(spark))
      val unionBands =
        if (narrowOk) Some(spark.read.parquet(s"$work/bands").unionByName(bBands))
        else None
      val unionToks = scrubbedStore.select(col("doc_id"), col("jetons"))
        .unionByName(bScrubbed.select(col("doc_id"), col("jetons")))
      val newPairs = Dedup.minhashLshAgainstTokens(
          bScrubbed, unionToks, "doc_id", "jetons", ShingleN, SigK, Bands, Threshold,
          corpusSigs = Some(sigStore.unionByName(bSigs)),
          hotBuckets = Some(spark.read.parquet(s"$work/hot")),
          corpusBands = unionBands,
          batchSigs = Some(bSigs))
        .filter(col("id_batch") =!= col("id_corpus"))
        .select(col("id_batch").as("id_a"), col("id_corpus").as("id_b"))
      val labelEdges = spark.read.parquet(s"$work/labels")
        .select(col("id").as("id_a"), col("cluster_id").as("id_b"))
      Dedup.clusters(labelEdges.unionByName(newPairs))
        .filter(col("id") =!= col("cluster_id"))
        .select(col("id").as("doc_id"))
        .localCheckpoint(true)
    }
    // 4: decontamination — ONE merged screen: the batch (pre-near-dup)
    // AND the published survivors, against (published ∪ new) eval
    // grams. Survivors cannot hit the published grams (they passed that
    // exact screen at publish), so their verdicts reduce to the
    // new-grams check; batch docs need the full union — one screen
    // stack replaces the former two, and it runs while the LSH chain
    // does.
    val contaminatedF = scala.concurrent.Future {
      val newEvalGrams = batch.filter(col("doc_id") % 50 === 0)
        .select(explode(Text.shingles(col("text"), DeconN)).as("g")).distinct()
      Decontaminate.contaminatedIdsTokensVsGrams(
          bScrubbed.select(col("doc_id"), col("jetons"))
            .unionByName(scrubbedStore
              .join(stats.select(col("doc_id")), Seq("doc_id"), "left_semi")
              .select(col("doc_id"), col("jetons"))),
          "doc_id", "jetons",
          spark.read.parquet(s"$work/eval_grams").unionByName(newEvalGrams), DeconN)
        .localCheckpoint(true)
    }
    val removed = scala.concurrent.Await
      .result(removedF, scala.concurrent.duration.Duration.Inf)
    val contaminated = scala.concurrent.Await
      .result(contaminatedF, scala.concurrent.duration.Duration.Inf)
    mark("screens")
    val dropped = removed.unionByName(contaminated)
    val bFinal = bScrubbed.join(dropped, Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    mark("batch_final")

    // 5: budget RE-selection over narrow merged stats
    val evicted = stats.select(col("doc_id"))
      .join(dropped, Seq("doc_id"), "left_semi")
    val newStats = stats.join(evicted, Seq("doc_id"), "left_anti")
      .unionByName(bFinal.select(col("doc_id"),
        Text.qualityScore(concat_ws(" ", col("jetons"))).as("qualite"), col("n_jetons")))
    val sel = Curate.budgetSelect(newStats, "doc_id", "qualite", "n_jetons", Budget)
      .select(col("doc_id"), col("qualite"), col("n_jetons"),
        col("cum").as("jetons_cumules"))
      .localCheckpoint(true)
    mark("reselect")

    // 6: store maintenance into the refreshed generation — tombstone
    // evictees, carry the masked open tail, append entrants, finalize.
    // Both delta sides are budget-bounded (⊆ a ≤-budget selection).
    val published = spark.read.parquet(s"$work/selection")
    val evictees = published.select(col("doc_id"))
      .join(sel.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .localCheckpoint(true) // three consumers across two threads
    val entrants = sel.select(col("doc_id"))
      .join(published.select(col("doc_id")), Seq("doc_id"), "left_anti")
    // the two mask writes and the selection write touch disjoint dirs
    // and share no inputs beyond checkpointed frames — run them
    // concurrently (the screens' convention above)
    val shardsF = scala.concurrent.Future {
      Pack.tombstone(Pack.readShards(spark, s"$work/store/shards"), evictees, lit(Pad))
        .write.mode("overwrite").partitionBy("shard_id")
        .parquet(s"$work/refreshed/store/shards")
    }
    val logF = scala.concurrent.Future {
      spark.read.parquet(s"$work/store/log")
        .join(broadcast(evictees.withColumn("__evince", lit(true))), Seq("doc_id"), "left")
        .withColumn("tranche",
          when(col("__evince"), array_repeat(lit(Pad), col("n").cast("int")))
            .otherwise(col("tranche")))
        .drop("__evince")
        .write.mode("overwrite").parquet(s"$work/refreshed/store/log")
    }
    val selF = scala.concurrent.Future {
      sel.withColumn("statut",
          when(col("doc_id") <= t, lit("conserve")).otherwise(lit("entrant")))
        .write.mode("overwrite").parquet(s"$work/refreshed/selection")
    }
    scala.concurrent.Await.result(shardsF, scala.concurrent.duration.Duration.Inf)
    scala.concurrent.Await.result(logF, scala.concurrent.duration.Duration.Inf)
    scala.concurrent.Await.result(selF, scala.concurrent.duration.Duration.Inf)
    mark("mask_and_publish")
    val offset = Pack.recoveredOffset(spark,
      s"$work/refreshed/store/log", s"$work/refreshed/store/shards", SeqTokens, SeqsPerShard)
    val entrantToks = scrubbedStore
      .unionByName(bFinal.select(col("doc_id"), col("jetons"), col("n_jetons")))
      .join(broadcast(entrants), Seq("doc_id"), "left_semi")
    Pack.packedSlicesTokens(entrantToks, "doc_id", "jetons", SeqTokens,
        numPartitions = 1, startOffset = offset)
      .write.mode("append").parquet(s"$work/refreshed/store/log")
    Pack.finalizeSliceLog(spark, s"$work/refreshed/store/log",
      s"$work/refreshed/store/shards", SeqTokens, SeqsPerShard, numPartitions = 1)
    mark("append_finalize")

    // GATE: report read back THROUGH the refreshed STORE — the selection
    // (checkpointed above, persisted to refreshed/selection for readers)
    // joined with per-doc fingerprints decoded from the store files
    // (evictee slices are pad-masked and their ids absent from the
    // selection, so they drop out here)
    sel.withColumn("statut",
        when(col("doc_id") <= t, lit("conserve")).otherwise(lit("entrant")))
      .join(storePerDoc(spark, s"$work/refreshed/store"), Seq("doc_id"))
      .select(col("doc_id"), col("statut"),
        md5(concat_ws(" ", col("toks"))).as("empreinte"),
        col("qualite"), col("n_jetons"), col("jetons_cumules"))
      .orderBy(col("doc_id"))
  }
}
