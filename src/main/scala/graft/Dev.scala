package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Scratch dev runner (not part of the driver contract):
  *
  *   - `Dev plan <name>[,<name>...] <sfDir>` — dump formatted plans to
  *     /tmp/plans_raw.md (feeds PLANS.md).
  *   - `Dev bench <name>[,<name>...] <sfDir> [reps]` — time queries
  *     through the same noop-sink path the driver bench uses.
  *   - no args — plan-dump the headline queries at sf0.001.
  */
object Dev {

  private def dumpPlans(spark: SparkSession, names: Seq[String], dir: String): Unit = {
    val sb = new StringBuilder
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      sb.append(s"## $name\n\n```\n").append(formatted).append("\n```\n\n")
    }
    Files.writeString(Paths.get("/tmp/plans_raw.md"), sb.toString)
    println("[dev] plans written")
  }

  def main(args: Array[String]): Unit = args.headOption match {
    case Some(cmd @ ("plan" | "bench")) =>
      require(args.length >= 3, s"usage: Dev $cmd <name>[,<name>...] <sfDir>" +
        (if (cmd == "bench") " [reps]" else ""))
      val names = args(1).split(",").toSeq
      val dir = args(2)
      val spark = graft.engine.Session.local(if (cmd == "bench") 32 else 8)
      spark.sparkContext.setLogLevel("WARN")
      if (cmd == "plan") dumpPlans(spark, names, dir)
      else {
        val reps = if (args.length > 3) args(3).toInt else 1
        names.foreach { name =>
          (1 to reps).foreach { r =>
            val t0 = System.nanoTime()
            val rows = SparkEntry.queries(name)(spark, dir).count()
            println(f"[dev] $name rep $r: ${(System.nanoTime() - t0) / 1e9}%.2f s, $rows rows")
          }
        }
      }
      spark.stop()
    // LSH knob experiments against an arbitrary fixture dir:
    //   Dev lsh <dir> <maxBucket> — minhashLsh pairs: time + row count
    //   Dev elsh <dir> <nBits>    — embeddingNearDup: time + row count
    case Some(cmd @ ("lsh" | "elsh")) =>
      require(args.length >= 3, s"usage: Dev $cmd <dir> <knob>")
      val dir = args(1); val knob = args(2).toInt
      val spark = graft.engine.Session.local(32)
      spark.sparkContext.setLogLevel("WARN")
      val t0 = System.nanoTime()
      val rows =
        if (cmd == "lsh")
          operators.Dedup.minhashLsh(
            sources.Tables.documents(spark, dir), "doc_id", "text", maxBucket = knob).count()
        else
          operators.Dedup.embeddingNearDup(
            sources.Tables.embeddings(spark, dir), "vec_id", "embedding", nBits = knob).count()
      println(f"[dev] $cmd knob=$knob: ${(System.nanoTime() - t0) / 1e9}%.2f s, $rows rows")
      spark.stop()
    // Metered fixed-batch refresh law at an arbitrary corpus size — the
    // SCALE.md documentation run for decades past RefreshSpec's 10×
    // gate: `Dev refreshlaw <nCorpus>` builds the law fixture (n
    // corpus docs, a FIXED 10-doc batch), meters setup (gen-0 publish +
    // gen-1 maintenance) and the timed hop-2 refresh with ShuffleMeter,
    // and prints bytes + seconds. Expected shape: refresh bytes =
    // batch-scale work + ONLY the narrow per-doc survivor-stats
    // exchange (∼30 B/doc — the exact-global-re-selection price),
    // publish bytes corpus-scale.
    case Some("refreshlaw") =>
      val n = args(1).toLong
      val spark = graft.engine.Session.local(32)
      spark.sparkContext.setLogLevel("WARN")
      import org.apache.spark.sql.functions._
      val dir = Files.createTempDirectory(s"graft_rlaw_${n}_").toString
      try {
        val corpus = spark.range(1, n + 1, 1, 32).selectExpr(
          "id AS doc_id",
          "concat_ws(' ', transform(sequence(1, 60), j -> concat('c', id, 'w', j))) AS text")
        val batch = spark.range(1, 11).selectExpr(
          s"id + ${10L * n} AS doc_id",
          "concat_ws(' ', transform(sequence(1, 60), " +
            "j -> if(j = 2, 'the', concat('b', id, 'w', j)))) AS text")
        corpus.unionByName(batch)
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
        val (_, _, wPub) = org.apache.spark.graft.ShuffleMeter
          .measure(spark.sparkContext) {
            graft.queries.RefreshPipeline.setup(spark, dir)
          }
        val t0 = System.nanoTime()
        val (rows, _, wRef) = org.apache.spark.graft.ShuffleMeter
          .measure(spark.sparkContext) {
            graft.queries.RefreshPipeline.run(spark, dir).collect()
          }
        val sec = (System.nanoTime() - t0) / 1e9
        require(rows.exists(_.getString(1) == "entrant"), "fixture drifted: no entrants")
        println(f"[refreshlaw] n=$n publish_shw=${wPub / 1e6}%.1f MB " +
          f"refresh_shw=${wRef / 1e6}%.1f MB refresh_sec=$sec%.2f rows=${rows.length}")
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
        org.apache.commons.io.FileUtils.deleteDirectory(
          new java.io.File(graft.queries.RefreshPipeline.workDir(dir)))
      }
      spark.stop()
    // Chain-depth refresh probe (SCALE.md): `Dev chaindepth <nCorpus>
    // <depth>` publishes gen-0 over n docs, runs <depth> maintaining
    // 10-doc refreshes (each adds a layer), metering every hop — the
    // probe-cost-vs-layer-count curve the layered-union readers imply —
    // then folds the chain with compactGen and re-runs the SAME final
    // batch against (a) the full chain and (b) the single compacted
    // layer: the depth tax and what the fold buys back, plus the fold's
    // own (publish-class) cost.
    case Some("chaindepth") =>
      val n = args(1).toLong; val depth = args(2).toInt
      val spark = graft.engine.Session.local(32)
      spark.sparkContext.setLogLevel("WARN")
      val RP = graft.queries.RefreshPipeline
      val dir = Files.createTempDirectory(s"graft_cdepth_${n}_").toString
      val work = Files.createTempDirectory(s"graft_cdepthw_${n}_").toString
      try {
        val corpus = spark.range(1, n + 1, 1, 32).selectExpr(
          "id AS doc_id",
          "concat_ws(' ', transform(sequence(1, 60), j -> concat('c', id, 'w', j))) AS text")
        val batches = spark.range(1, (depth + 1) * 10 + 1).selectExpr(
          s"id + ${n} AS doc_id",
          "concat_ws(' ', transform(sequence(1, 60), " +
            "j -> if(j = 2, 'the', concat('b', id, 'w', j)))) AS text")
        corpus.unionByName(batches)
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
        val docs = graft.sources.Tables.documents(spark, dir)
        import org.apache.spark.sql.functions.col
        graft.queries.RefreshPipeline.publish(
          spark, docs.filter(col("doc_id") <= n), s"$work/g0")
        var layers = List(s"$work/g0")
        def hopBatch(h: Int) = docs.filter(
          col("doc_id") > n + (h - 1) * 10L && col("doc_id") <= n + h * 10L)
        // harness parity with Bench.time(): drop blocks pinned by the
        // PREVIOUS stage before each timed stage — without this the
        // later stages (the folded probe runs LAST) inherit an
        // ever-growing block-manager + GC burden and read 2× slow for
        // identical work (measured: folded probe 7.7 s clean vs 19.1 s
        // after six unpersist-free maintaining hops)
        def dropBlocks(): Unit = {
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
          System.gc()
        }
        (1 to depth).foreach { h =>
          dropBlocks()
          val t0 = System.nanoTime()
          val (rows, _, w) = org.apache.spark.graft.ShuffleMeter
            .measure(spark.sparkContext) {
              RP.refreshGen(spark, layers, hopBatch(h), s"$work/g$h",
                threshold = n + (h - 1) * 10L,
                maintainThreshold = Some(n + h * 10L)).collect()
            }
          println(f"[chaindepth] hop=$h layers=${layers.size} " +
            f"sec=${(System.nanoTime() - t0) / 1e9}%.2f shw=${w / 1e6}%.2f MB " +
            f"rows=${rows.length}")
          layers = s"$work/g$h" :: layers
        }
        val fin = depth + 1
        def probe(tag: String, ls: Seq[String], out: String): Unit = {
          dropBlocks()
          val t0 = System.nanoTime()
          val (rows, _, w) = org.apache.spark.graft.ShuffleMeter
            .measure(spark.sparkContext) {
              RP.refreshGen(spark, ls, hopBatch(fin), out,
                threshold = n + depth * 10L).collect()
            }
          println(f"[chaindepth] probe=$tag layers=${ls.size} " +
            f"sec=${(System.nanoTime() - t0) / 1e9}%.2f shw=${w / 1e6}%.2f MB " +
            f"rows=${rows.length}")
        }
        probe("chain", layers, s"$work/pa")
        dropBlocks()
        val t0 = System.nanoTime()
        val (_, _, wc) = org.apache.spark.graft.ShuffleMeter
          .measure(spark.sparkContext) { RP.compactGen(spark, layers, s"$work/gc") }
        println(f"[chaindepth] compact layers=${layers.size} " +
          f"sec=${(System.nanoTime() - t0) / 1e9}%.2f shw=${wc / 1e6}%.2f MB")
        probe("folded", Seq(s"$work/gc"), s"$work/pb")
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(work))
      }
      spark.stop()
    // Policy-driven chain (SCALE.md, r18 ask #2): `Dev chainpolicy
    // <nCorpus> <hops>` publishes gen-0 over n docs then runs <hops>
    // maintaining 10-doc refreshes through RefreshPipeline
    // .maintainedRefresh — the CompactDepth watermark fires the fold
    // INSIDE the loop — metering every hop with its live layer count.
    // Expected shape: hop cost climbs with depth, resets on the hop
    // after each policy fold (the probe-cost reset the policy buys),
    // refresh bytes stay batch-scale throughout (the depth law).
    case Some("chainpolicy") =>
      val n = args(1).toLong; val hops = args(2).toInt
      val spark = graft.engine.Session.local(32)
      spark.sparkContext.setLogLevel("WARN")
      val RP = graft.queries.RefreshPipeline
      val dir = Files.createTempDirectory(s"graft_cpol_${n}_").toString
      val work = Files.createTempDirectory(s"graft_cpolw_${n}_").toString
      try {
        val corpus = spark.range(1, n + 1, 1, 32).selectExpr(
          "id AS doc_id",
          "concat_ws(' ', transform(sequence(1, 60), j -> concat('c', id, 'w', j))) AS text")
        val batches = spark.range(1, hops * 10 + 1).selectExpr(
          s"id + ${n} AS doc_id",
          "concat_ws(' ', transform(sequence(1, 60), " +
            "j -> if(j = 2, 'the', concat('b', id, 'w', j)))) AS text")
        corpus.unionByName(batches)
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
        val docs = graft.sources.Tables.documents(spark, dir)
        import org.apache.spark.sql.functions.col
        RP.publish(spark, docs.filter(col("doc_id") <= n), s"$work/g0")
        var chain: Seq[String] = Seq(s"$work/g0")
        def dropBlocks(): Unit = {
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
          System.gc()
        }
        (1 to hops).foreach { h =>
          dropBlocks()
          val depthIn = chain.size
          val t0 = System.nanoTime()
          val (_, _, w) = org.apache.spark.graft.ShuffleMeter
            .measure(spark.sparkContext) {
              chain = RP.maintainedRefresh(spark, chain,
                docs.filter(col("doc_id") > n + (h - 1) * 10L &&
                  col("doc_id") <= n + h * 10L),
                s"$work/g$h", threshold = n + (h - 1) * 10L,
                newThreshold = n + h * 10L)
            }
          val folded = chain.size < depthIn + 1
          println(f"[chainpolicy] hop=$h layers_in=$depthIn layers_out=${chain.size} " +
            f"folded=$folded sec=${(System.nanoTime() - t0) / 1e9}%.2f " +
            f"shw=${w / 1e6}%.2f MB")
        }
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(work))
      }
      spark.stop()
    // Shard-store repack policy, steady state (SCALE.md round 20):
    //   Dev repackpolicy <nDocs> <waves>
    // Packs an nDocs x 60-token corpus, then runs <waves> deletion
    // windows of ~6% of the original tokens each through
    // Pack.maintainTombstone (watermark 0.15). Expected shape: the
    // policy fires every ~3rd wave (logical waves cost a narrow
    // provenance measure — bytes near zero; repack waves pay the
    // corpus-linear re-pack — the reshard cost class), the registry
    // clears with each fold, and the generation counts the folds.
    case Some("repackpolicy") =>
      val n = args(1).toLong; val waves = args(2).toInt
      val spark = graft.engine.Session.local(32)
      spark.sparkContext.setLogLevel("WARN")
      val dir = Files.createTempDirectory(s"graft_rpol_${n}_").toString
      try {
        import org.apache.spark.sql.functions.col
        val docs = spark.range(1, n + 1, 1, 32).selectExpr(
          "id AS doc_id",
          "transform(sequence(1, 60), j -> concat('d', id, 't', j)) AS toks")
        val store = s"$dir/store"
        operators.Pack.writeShardsTokens(docs, "doc_id", "toks",
          seqTokens = 256, seqsPerShard = 16, outDir = store)
        val band = math.max(1L, (n * 0.06).toLong)
        (1 to waves).foreach { h =>
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = true))
          val lo = (h - 1) * band; val hi = h * band
          val t0 = System.nanoTime()
          var res: operators.Pack.RepackResult = null
          val (_, _, w) = org.apache.spark.graft.ShuffleMeter
            .measure(spark.sparkContext) {
              res = operators.Pack.maintainTombstone(spark, store,
                docs.filter(col("doc_id") > lo && col("doc_id") <= hi)
                  .select("doc_id"),
                deadFracWatermark = 0.15, seqTokens = 256, seqsPerShard = 16)
            }
          println(f"[repackpolicy] wave=$h deadFrac=${res.deadFrac}%.3f " +
            f"repacked=${res.repacked} version=${res.version} " +
            f"pending=${res.pending} sec=${(System.nanoTime() - t0) / 1e9}%.2f " +
            f"shw=${w / 1e6}%.2f MB")
        }
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      }
      spark.stop()
    // Composed production loop, steady state (SCALE.md, r19 ask #2):
    // `Dev composedloop <nCorpus> <hops>` runs <hops> maintenance
    // windows in which ALL the per-tier policies cycle together — the
    // text chain-depth fold (maintainedRefresh, CompactDepth=3), the
    // vector append-watermark compaction (maintainAppend, watermark 3)
    // and the recall-drift republish gate — each window driven by the
    // hop's REAL selection delta (the p09 window, looped). Expected
    // shape: both watermarks cycle on their own cadences (fold every
    // other hop once the chain saturates, compact every 3rd non-empty
    // entrant wave), the drift gate stays quiet on same-distribution
    // entrants, and refresh bytes stay batch-scale at every hop.
    case Some("composedloop") =>
      val n = args(1).toLong; val hops = args(2).toInt
      val spark = graft.engine.Session.local(32)
      spark.sparkContext.setLogLevel("WARN")
      val RP = graft.queries.RefreshPipeline
      val AI = graft.operators.AnnIndex
      val dir = Files.createTempDirectory(s"graft_cloop_${n}_").toString
      val work = Files.createTempDirectory(s"graft_cloopw_${n}_").toString
      try {
        import org.apache.spark.sql.functions._
        val corpus = spark.range(1, n + 1, 1, 32).selectExpr(
          "id AS doc_id",
          "concat_ws(' ', transform(sequence(1, 60), j -> concat('c', id, 'w', j))) AS text")
        val batches = spark.range(1, hops * 10 + 1).selectExpr(
          s"id + ${n} AS doc_id",
          "concat_ws(' ', transform(sequence(1, 60), " +
            "j -> if(j = 2, 'the', concat('b', id, 'w', j)))) AS text")
        corpus.unionByName(batches)
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
        // deterministic same-distribution embeddings for every doc id —
        // the drift gate must stay quiet on an honest loop
        spark.range(1, n + hops * 10 + 1, 1, 32).selectExpr(
            "id AS vec_id",
            "transform(sequence(1, 8), j -> cast(sin(id * j) as float)) AS embedding")
          .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
        val docs = graft.sources.Tables.documents(spark, dir)
        val em = graft.sources.Tables.embeddings(spark, dir)
        // the ANN store tracks the CLEANED corpus (the generation's
        // stats ids — p09's membership convention), so every hop's
        // entrant wave is the batch's survivors, nonempty by
        // construction
        def statsOf(g: String) =
          spark.read.parquet(s"$g/stats").select(col("doc_id"))
        RP.publish(spark, docs.filter(col("doc_id") <= n), s"$work/g0")
        val ix = s"$work/index"
        AI.write(em.join(statsOf(s"$work/g0").withColumnRenamed("doc_id", "vec_id"),
            Seq("vec_id"), "left_semi"),
          "vec_id", "embedding", ix, nList = 8, m = 4, codes = 16, iters = 2)
        var chain: Seq[String] = Seq(s"$work/g0")
        def dropBlocks(): Unit = {
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
          System.gc()
        }
        (1 to hops).foreach { h =>
          dropBlocks()
          val depthIn = chain.size
          val prevHead = chain.head
          val t0 = System.nanoTime()
          val (_, _, shw) = org.apache.spark.graft.ShuffleMeter
            .measure(spark.sparkContext) {
              // text tier: the policy-governed maintaining refresh
              chain = RP.maintainedRefresh(spark, chain,
                docs.filter(col("doc_id") > n + (h - 1) * 10L &&
                  col("doc_id") <= n + h * 10L),
                s"$work/g$h", threshold = n + (h - 1) * 10L,
                newThreshold = n + h * 10L)
              // vector tier: the hop's real survivor delta through the
              // append watermark; the eviction tombstone only when the
              // batch's screens evicted anyone (the p09 steady-state
              // guard — an empty anti-join rewrite is a whole store
              // rewrite for zero deletions)
              val statsPrev = statsOf(prevHead)
              val statsNew = statsOf(chain.head)
              val entrants = statsNew.join(statsPrev, Seq("doc_id"), "left_anti")
              val evictees = statsPrev.join(statsNew, Seq("doc_id"), "left_anti")
              val waveEmpty = entrants.isEmpty
              val counter = AI.maintainAppend(
                em.join(broadcast(entrants.withColumnRenamed("doc_id", "vec_id")),
                  Seq("vec_id"), "left_semi"),
                "vec_id", "embedding", ix, appendsWatermark = 3)
              if (!evictees.isEmpty)
                AI.tombstone(spark, ix, evictees.withColumnRenamed("doc_id", "vec_id"))
              // drift gate: bounded production-config probe
              val vecCorpus = em.join(
                broadcast(statsNew.withColumnRenamed("doc_id", "vec_id")),
                Seq("vec_id"), "left_semi")
              val recall = AI.recallProbe(spark, ix,
                  vecCorpus.orderBy(col("vec_id")).limit(16), vecCorpus,
                  "vec_id", "embedding", k = 1, nProbe = 4, shortlist = 8)
                .agg(avg(col("rappel"))).collect()(0).getDouble(0)
              val alarm = recall < 0.05
              if (alarm)
                AI.republish(vecCorpus.select(col("vec_id"), col("embedding")),
                  "vec_id", "embedding", ix, nList = 8, m = 4, codes = 16, iters = 2)
              val folded = chain.size < depthIn + 1
              // "compacted" must mean THE POLICY FIRED THIS HOP: an
              // empty entrant wave leaves the counter untouched, so a
              // post-compaction hop with no entrants reads counter 0
              // without any append or compact having run — counter==0
              // alone would transcribe it as an extra policy firing in
              // the SCALE.md decade rows
              println(f"[composedloop] hop=$h layers_in=$depthIn " +
                f"layers_out=${chain.size} folded=$folded vec_counter=$counter " +
                f"compacted=${!waveEmpty && counter == 0} recall=$recall%.3f alarm=$alarm " +
                f"version=${AI.version(spark, ix)}")
            }
          println(f"[composedloop] hop=$h sec=${(System.nanoTime() - t0) / 1e9}%.2f " +
            f"shw=${shw / 1e6}%.2f MB")
        }
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(work))
      }
      spark.stop()
    // Scratch probe: does DPP fire on the ANN serve join shape
    // (partitioned scan ⋈ broadcast probe side on the partition col)?
    case Some("dppprobe") =>
      val spark = graft.engine.Session.local(8)
      spark.sparkContext.setLogLevel("WARN")
      val tmp = Files.createTempDirectory("graft_dpp_").toString
      try {
        spark.range(0, 100000).selectExpr("id", "cast(id % 16 as int) as cell")
          .write.partitionBy("cell").mode("overwrite").parquet(tmp)
        val part = spark.read.parquet(tmp)
        import org.apache.spark.sql.functions._
        // probe side shaped like qProbes: filtered queries → exploded cells
        val probe = spark.range(0, 1000).filter(col("id") < 7)
          .select(col("id").as("qid"),
            explode(expr("array(cast(id % 16 as int), cast((id+1) % 16 as int))")).as("cell"))
        val j = part.join(broadcast(probe), Seq("cell"))
        j.write.mode("overwrite").format("noop").save()
        val plan = j.queryExecution.executedPlan.toString
        println("[dppprobe] dynamicpruning=" + plan.contains("dynamicpruning") +
          " partitionFilters=" + plan.linesIterator.filter(_.contains("PartitionFilters")).take(2).mkString(" | ").take(300))
        // and the UNfiltered probe side (production serve: raw queries)
        val probe2 = spark.range(0, 1000)
          .select(col("id").as("qid"),
            explode(expr("array(cast(id % 16 as int))")).as("cell"))
        val j2 = part.join(broadcast(probe2), Seq("cell"))
        println("[dppprobe] nofilter dynamicpruning=" +
          j2.queryExecution.executedPlan.toString.contains("dynamicpruning"))
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
      }
      spark.stop()
    // e13 file-count row (SCALE.md): rebuild the fragmented store from
    // scratch, count codes/ part files, compact, count again.
    case Some("e13files") =>
      val dir = args(1)
      val spark = graft.engine.Session.local(32)
      spark.sparkContext.setLogLevel("WARN")
      val w = s"${System.getProperty("java.io.tmpdir")}/graft_e13_${Integer.toHexString(dir.hashCode)}"
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(w))
      graft.queries.PipelineQueries.e13Setup(spark, dir)
      def parts(): Int = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
        walk(new java.io.File(s"$w/index/codes"))
          .count(f => f.getName.startsWith("part-") && f.length > 0)
      }
      val before = parts()
      val t0 = System.nanoTime()
      graft.operators.AnnIndex.compact(spark, s"$w/index")
      println(f"[e13files] files_before=$before files_after=${parts()} " +
        f"compact_sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      // this harness compacted the SHARED e13 workdir out-of-band
      // (marker still fresh, sixth wave never appended, counter reset):
      // left in place, the next Bench's e13 cell would skip setup and
      // never fire the compaction it exists to time (r19 review
      // finding) — delete the workdir so the next run rebuilds clean
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(w))
      spark.stop()
    // Diagnostic: Hamming distribution of known-true e03 pairs (each
    // original vs its jittered twin) under the packed sign-bit sketch.
    case Some("ham") =>
      val dir = args(1); val bits = args(2).toInt; val nTables = 8
      val spark = graft.engine.Session.local(32)
      spark.sparkContext.setLogLevel("WARN")
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types._
      import org.apache.spark.sql.graft.VectorExpr
      val em = sources.Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
      val jit = em.select(
        (col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), (x, j) =>
          (x.cast(DoubleType) * (lit(1.0) + (pmod(col("vec_id") * 31 + j.cast(LongType) * 7, lit(100L)).cast(DoubleType) / 100.0 - 0.5) * 0.04)).cast(FloatType)
        ).as("embedding"))
      val all = em.unionByName(jit)
      val packed = all.select(col("vec_id"),
        VectorExpr.packSignBits(
          VectorExpr.randomProjections(col("embedding").cast(ArrayType(DoubleType)), bits * nTables)).as("pb"))
      val pairs = packed.select(col("vec_id").as("id_a"), col("pb").as("pa"))
        .join(packed.select((col("vec_id") - 1000000L).as("id_a"), col("pb").as("pb2")), Seq("id_a"))
        .select(VectorExpr.packedHamming(col("pa"), col("pb2")).as("d"))
      pairs.groupBy(col("d")).count().orderBy(col("d")).show(40)
      spark.stop()
    case Some(other) =>
      sys.error(s"unknown Dev command '$other' (expected: plan | bench | lsh | elsh)")
    case None =>
      val spark = graft.engine.Session.local(8)
      spark.sparkContext.setLogLevel("WARN")
      dumpPlans(
        spark,
        Seq("q02_revenue_by_nation", "q22_filtered_scan", "d06_minhash_pairs",
          "e01_knn_brute", "io02_bucketed_join", "q17_rolling_7d"),
        "/root/testdata/sf0.001")
      spark.stop()
  }
}
