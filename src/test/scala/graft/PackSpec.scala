package graft

import org.apache.spark.sql.functions._
import graft.operators.Pack
import graft.sources.Tables

/** Sequence packing: the two-phase distributed prefix sum must equal
  * the single-window formulation, pin the boundary semantics exactly,
  * and never plan the Exchange SinglePartition it exists to avoid.
  */
class PackSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) = df
    .select("doc_id", "n_tokens", "tok_debut", "seq_debut", "seq_fin", "n_seqs")
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    .sortBy(_._1)

  test("two-phase == single-window formulation (documents table + empty docs)") {
    val docs = Tables.documents(spark, sfDir)
    assert(rows(Pack.sequences(docs, "doc_id", "text", 1024, numPartitions = 7)) ===
      rows(Pack.sequencesSingleTask(docs, "doc_id", "text", 1024)))
    // a budget smaller than most docs forces many boundary crossings
    assert(rows(Pack.sequences(docs, "doc_id", "text", 8, numPartitions = 3)) ===
      rows(Pack.sequencesSingleTask(docs, "doc_id", "text", 8)))
  }

  test("boundary semantics: crossings, zero-width docs at exact boundaries") {
    val df = Seq(
      (1L, "a b c"),       // tokens [0,3) of budget 4 -> seq 0 only
      (2L, "d e"),         // [3,5) -> crosses into seq 1
      (3L, ""),            // zero-width at offset 5 -> lands in seq 1
      (4L, "f g h i j")    // [5,10) -> seqs 1..2
    ).toDF("doc_id", "text")
    assert(rows(Pack.sequences(df, "doc_id", "text", 4, numPartitions = 2)) === Seq(
      (1L, 3L, 0L, 0L, 0L, 1L),
      (2L, 2L, 3L, 0L, 1L, 2L),
      (3L, 0L, 5L, 1L, 1L, 1L),
      (4L, 5L, 5L, 1L, 2L, 2L)
    ))
    // zero-width doc sitting exactly ON a boundary belongs to the NEXT
    // sequence (its offset's sequence), not the one that just closed
    val atBoundary = Seq((1L, "a b c d"), (2L, ""), (3L, "e")).toDF("doc_id", "text")
    assert(rows(Pack.sequences(atBoundary, "doc_id", "text", 4, numPartitions = 2)) === Seq(
      (1L, 4L, 0L, 0L, 0L, 1L),
      (2L, 0L, 4L, 1L, 1L, 1L),
      (3L, 1L, 4L, 1L, 1L, 1L)
    ))
  }

  test("manifest: every sequence except the last holds exactly the budget (no gaps, no overlaps)") {
    val docs = Tables.documents(spark, sfDir)
    val budget = 128
    val m = Pack.manifest(docs, "doc_id", "text", budget, numPartitions = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(m.nonEmpty)
    // contiguous sequence ids from 0
    assert(m.map(_._1).toSeq == (0L until m.length.toLong))
    // full budget everywhere but the tail; total == corpus token count
    m.init.foreach { case (sid, _, nTok) =>
      assert(nTok == budget.toLong, s"sequence $sid holds $nTok of $budget tokens")
    }
    assert(m.last._3 >= 1L && m.last._3 <= budget.toLong)
    val totalTokens = docs
      .select(sum(graft.functions.Text.tokenCount(col("text")).cast("long")))
      .collect().head.getLong(0)
    assert(m.map(_._3).sum == totalTokens)
  }

  test("never plans a single-partition exchange (the window twin does)") {
    val docs = Tables.documents(spark, sfDir)
    val plan = Pack.sequences(docs, "doc_id", "text", 1024)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("SinglePartition"),
      s"two-phase packing must not serialize the corpus into one task:\n$plan")
    val windowPlan = Pack.sequencesSingleTask(docs, "doc_id", "text", 1024)
      .queryExecution.executedPlan.toString()
    assert(windowPlan.contains("SinglePartition"))
  }

  test("NULL text counts as zero tokens — never -1 into the prefix sum") {
    // size(null) = -1 under the default non-ANSI config; a single dirty
    // row must not shift every later document's global offset
    val df = Seq((1L, Option("a b c")), (2L, Option.empty[String]), (3L, Option("d e")))
      .toDF("doc_id", "text")
    assert(rows(Pack.sequences(df, "doc_id", "text", 4, numPartitions = 2)) === Seq(
      (1L, 3L, 0L, 0L, 0L, 1L),
      (2L, 0L, 3L, 0L, 0L, 1L), // zero-width at offset 3
      (3L, 2L, 3L, 0L, 1L, 2L)  // still starts at 3, crosses into seq 1
    ))
  }

  test("startOffset continues a split corpus exactly where the prefix ended") {
    val docs = Tables.documents(spark, sfDir)
    val whole = rows(Pack.sequences(docs, "doc_id", "text", 64))
    val cut = 250L // sf0.001 docs span ids 0..499; any split point works
    val head = docs.filter(col("doc_id") < cut)
    val tail = docs.filter(col("doc_id") >= cut)
    val headPacked = rows(Pack.sequences(head, "doc_id", "text", 64))
    val offset = headPacked.map(r => r._2).sum // Σ n_tokens of the prefix
    val tailPacked = rows(Pack.sequences(tail, "doc_id", "text", 64, startOffset = offset))
    assert((headPacked ++ tailPacked).sortBy(_._1).toSeq == whole.toSeq)
    assert(headPacked.nonEmpty && tailPacked.nonEmpty)
  }

  test("deterministic across runs") {
    val docs = Tables.documents(spark, sfDir)
    def ids() = rows(Pack.sequences(docs, "doc_id", "text", 64)).toSeq
    assert(ids() == ids())
  }

  test("shard round-trip: emitted files reconstruct every doc exactly once, boundaries per manifest") {
    val docs = Tables.documents(spark, sfDir)
    val budget = 128
    val out = java.nio.file.Files.createTempDirectory("graft_packspec_").toString
    try {
      Pack.writeShards(docs, "doc_id", "text", budget, seqsPerShard = 4, outDir = out,
        numPartitions = 5)
      val shards = Pack.readShards(spark, out).cache()

      // every sequence except the last holds exactly the budget, and the
      // (seq -> n_tokens, n_docs) rollup equals the d20 manifest
      val fromFiles = shards
        .select(col("seq_id"), size(col("tokens")).cast("long").as("n_tokens"),
          size(col("docs")).cast("long").as("n_docs"))
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(1))).sortBy(_._1)
      val manifest = Pack.manifest(docs, "doc_id", "text", budget, numPartitions = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      assert(fromFiles.toSeq == manifest.toSeq)
      assert(fromFiles.init.forall(_._3 == budget.toLong))

      // shard ids group consecutive sequences in fours
      val badShard = shards.filter(col("shard_id") =!= expr("seq_id div 4")).count()
      assert(badShard == 0L)

      // provenance reconstructs every non-empty doc exactly once:
      // re-assemble each doc's tokens from its slices at global
      // positions seq_id*budget + debut_dans_seq and compare to the
      // original tokenization
      val rebuilt = shards
        .select(col("seq_id"), explode(col("docs")).as("d"),
          col("tokens"))
        .select(col("d.doc_id").as("doc_id"),
          (col("seq_id") * budget + col("d.debut_dans_seq")).as("pos"),
          expr("slice(tokens, d.debut_dans_seq + 1, d.n_tokens)").as("tranche"))
        .groupBy(col("doc_id"))
        .agg(flatten(transform(array_sort(collect_list(struct(col("pos"), col("tranche")))),
          p => p.getField("tranche"))).as("toks"))
      val original = docs
        .select(col("doc_id"), graft.functions.Text.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) > 0)
      val diff = rebuilt.as("a")
        .join(original.as("b"), Seq("doc_id"), "full_outer")
        .filter(col("a.toks").isNull || col("b.toks").isNull ||
          col("a.toks") =!= col("b.toks"))
        .count()
      assert(diff == 0L, "every non-empty doc must reconstruct bit-for-bit from shard slices")
      shards.unpersist()
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }

  test("BPE-id shards: exact sequence lengths in id units; streams decode back to every doc's text") {
    val docs = Tables.documents(spark, sfDir)
    val model = graft.functions.Bpe.train(docs, "text", numMerges = 120, topWords = 500)
    val budget = 96
    val out = java.nio.file.Files.createTempDirectory("graft_packspec_ids_").toString
    try {
      Pack.writeShardsTokens(
        docs.select(col("doc_id"),
          graft.functions.Bpe.encodeIdStream(model, col("text")).as("ids")),
        "doc_id", "ids", budget, seqsPerShard = 4, outDir = out, numPartitions = 5)
      val shards = Pack.readShards(spark, out).cache()
      // the budget is counted in BPE ids: every sequence except the
      // last holds exactly `budget` ids (int element type end to end)
      val lens = shards.select(col("seq_id"), size(col("tokens")).as("n"))
        .collect().sortBy(_.getLong(0)).map(_.getInt(1))
      assert(lens.init.forall(_ == budget), "non-final sequence not at the id budget")
      // slice reassembly + decode rebuilds every non-empty doc's
      // whitespace-normalized text (losslessness THROUGH the sink)
      val rebuilt = shards
        .select(col("seq_id"), explode(col("docs")).as("d"), col("tokens"))
        .select(col("d.doc_id").as("doc_id"),
          (col("seq_id") * budget + col("d.debut_dans_seq")).as("pos"),
          expr("slice(tokens, d.debut_dans_seq + 1, d.n_tokens)").as("tranche"))
        .groupBy(col("doc_id"))
        .agg(flatten(transform(array_sort(collect_list(struct(col("pos"), col("tranche")))),
          p => p.getField("tranche"))).as("ids"))
        .select(col("doc_id"),
          graft.functions.Bpe.decodeIdStream(model, col("ids")).as("texte"))
      val diff = rebuilt.as("a")
        .join(docs.select(col("doc_id"),
          concat_ws(" ", graft.functions.Text.tokens(col("text"))).as("norm"))
          .filter(length(col("norm")) > 0).as("b"), Seq("doc_id"), "full_outer")
        .filter(col("a.texte").isNull || col("b.norm").isNull ||
          col("a.texte") =!= col("b.norm"))
        .count()
      assert(diff == 0L, "every non-empty doc must decode bit-for-bit from id shards")
      shards.unpersist()
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }

  test("p03 shard round-trip: the emitted bytes reassemble every selected doc to its gate fingerprint") {
    // run the full pipeline gate, then prove the FILES it emitted
    // reconstruct each selected document exactly: reassembling a doc's
    // slices across sequences (in global token order) must hash to the
    // empreinte the gate reported for that doc — so the fingerprints
    // the oracle verifies describe the bytes on disk, not just the
    // in-memory annotation.
    val res = SparkEntry.queries("p03_curation_pipeline")(spark, sfDir)
      .select(col("rang"), col("empreinte"), col("n_jetons")).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(res.nonEmpty)
    val shards = Pack.readShards(spark, graft.queries.PipelineQueries.p03ShardDir(sfDir))
    val rebuilt = shards
      .select(col("seq_id"), explode(col("docs")).as("d"), col("tokens"))
      .select(col("d.doc_id").as("rang"),
        (col("seq_id") * 256 + col("d.debut_dans_seq")).as("pos"),
        expr("slice(tokens, d.debut_dans_seq + 1, d.n_tokens)").as("tranche"))
      .groupBy(col("rang"))
      .agg(flatten(transform(array_sort(collect_list(struct(col("pos"), col("tranche")))),
        p => p.getField("tranche"))).as("toks"))
      .select(col("rang"), md5(concat_ws(" ", col("toks"))).as("h"),
        size(col("toks")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(rebuilt == res,
      "shard slices must reassemble to the gate's per-doc fingerprints and token counts")
    // every emitted sequence except the last is exactly the 256-token budget
    val seqs = shards.select(col("seq_id"), size(col("tokens")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).sortBy(_._1)
    assert(seqs.init.forall(_._2 == 256))
  }

  test("p05 id shards: selection == p04's, decoded fingerprints match, sequences at the id budget") {
    // p05 must select exactly p04's decontaminated set (the id emission
    // changes the ARTIFACT, never the curation), and its gate empreinte
    // — md5 of the DECODED id stream read back from disk — must equal
    // p04's direct text fingerprint for every selected doc. Different
    // seeds permute rang, so compare keyed on doc_id.
    val p04 = SparkEntry.queries("p04_decon_pipeline")(spark, sfDir)
      .select(col("doc_id"), col("empreinte"), col("qualite"), col("n_jetons"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2), r.getLong(3)))).toMap
    val p05 = SparkEntry.queries("p05_idshard_pipeline")(spark, sfDir)
      .select(col("doc_id"), col("empreinte"), col("qualite"), col("n_jetons"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(p05.nonEmpty)
    assert(p05 == p04,
      "p05 must pack p04's exact selection and decode to its exact fingerprints")
    // the emitted sequences are budgeted in BPE IDS: every non-final
    // sequence holds exactly 256 ids, and the streams are ints
    val shards = Pack.readShards(spark, graft.queries.PipelineQueries.p05ShardDir(sfDir))
    // parquet round-trips arrays as containsNull=true; the element type
    // is the pin (int ids, not strings)
    assert(shards.schema("tokens").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType === org.apache.spark.sql.types.IntegerType)
    val seqs = shards.select(col("seq_id"), size(col("tokens")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).sortBy(_._1)
    assert(seqs.init.forall(_._2 == 256), "non-final sequence not at the 256-id budget")
    // id streams are LONGER than the whitespace token streams they
    // encode (pieces + separators) — the budget unit really changed
    val totalIds = seqs.map(_._2.toLong).sum
    val totalWords = p05.values.map(_._3).sum
    assert(totalIds > totalWords)
  }

  test("slice-log finalize: immutable whole shards, idempotent, trimmed one-file tail, store ∪ tail == one-shot") {
    val budget = 128
    val perShard = 4
    val docsToks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), graft.functions.Text.tokens(col("text")).as("toks"))
    val wd = java.nio.file.Files.createTempDirectory("graft_finalize_").toString
    val logDir = s"$wd/slices"
    val store = s"$wd/shards"
    def files(dir: String): Map[String, (Long, Long)] = {
      val base = java.nio.file.Paths.get(dir)
      if (!java.nio.file.Files.exists(base)) Map.empty
      else {
        import scala.jdk.CollectionConverters._
        val s = java.nio.file.Files.walk(base)
        try s.iterator().asScala
          .filter(p => java.nio.file.Files.isRegularFile(p) &&
            p.getFileName.toString.startsWith("part-"))
          .map(p => p.toString -> (java.nio.file.Files.size(p),
            java.nio.file.Files.getLastModifiedTime(p).toMillis)).toMap
        finally s.close()
      }
    }
    try {
      val maxId = docsToks.agg(max(col("doc_id"))).collect()(0).getLong(0)
      val batches = Seq(
        docsToks.filter(col("doc_id") <= maxId / 3),
        docsToks.filter(col("doc_id") > maxId / 3 && col("doc_id") <= 2 * maxId / 3),
        docsToks.filter(col("doc_id") > 2 * maxId / 3))
      Pack.packedSlicesTokens(batches(0), "doc_id", "toks", budget,
        startOffset = Pack.recoveredOffset(spark, logDir, store, budget, perShard))
        .write.mode("append").parquet(logDir)
      val r1 = Pack.finalizeSliceLog(spark, logDir, store, budget, perShard)
      assert(r1.newShards > 0, "first finalize must close whole shards")
      val firstFiles = files(store)
      assert(firstFiles.nonEmpty)
      // idempotence: an immediate second finalize is a pure no-op
      val logRows = spark.read.parquet(logDir).count()
      val r1b = Pack.finalizeSliceLog(spark, logDir, store, budget, perShard)
      assert(r1b.newShards == 0L && r1b.watermarkSeqs == r1.watermarkSeqs)
      assert(spark.read.parquet(logDir).count() == logRows,
        "a no-op finalize must not rewrite the log")
      assert(files(store) == firstFiles, "a no-op finalize must not touch the store")
      // remaining batches, finalize between appends; offsets recovered
      Seq(1, 2).foreach { i =>
        Pack.packedSlicesTokens(batches(i), "doc_id", "toks", budget,
          startOffset = Pack.recoveredOffset(spark, logDir, store, budget, perShard))
          .write.mode("append").parquet(logDir)
        Pack.finalizeSliceLog(spark, logDir, store, budget, perShard)
      }
      // batch-1 shard files were never rewritten by later passes
      val now = files(store)
      assert(firstFiles.forall { case (p, sig) => now.get(p).contains(sig) },
        "a finalized shard file must never be rewritten")
      // final state: watermark at the whole-shard grain, recovered
      // offset == the true corpus token total, tail after it, one file
      val state = Pack.finalizeSliceLog(spark, logDir, store, budget, perShard)
      val total = docsToks.agg(sum(size(col("toks")))).collect()(0).getLong(0)
      assert(state.watermarkSeqs == (total / budget / perShard) * perShard)
      assert(Pack.recoveredOffset(spark, logDir, store, budget, perShard) == total)
      val tail = spark.read.parquet(logDir)
      assert(tail.filter(col("seq_id") < state.watermarkSeqs).count() == 0L,
        "trim must drop every finalized slice")
      assert(files(logDir).size == 1, "the trimmed tail is bounded — one file")
      // the trainer's view: store ∪ tail equals the one-shot pack
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0),
          r.getSeq[String](1).mkString(" "),
          r.getSeq[org.apache.spark.sql.Row](2).map(d =>
            (d.getLong(0), d.getInt(1), d.getInt(2))).mkString(";"))
      val union = Pack.readShards(spark, store)
        .select(col("seq_id"), col("tokens"), col("docs"))
        .unionByName(Pack.assembleSequences(tail, budget))
        .collect().map(key)
      val oneShot = Pack.packedSequencesTokens(docsToks, "doc_id", "toks", budget)
        .collect().map(key)
      assert(union.toSet == oneShot.toSet, "store ∪ tail must equal the one-shot pack")
      assert(union.length == oneShot.length, "no sequence duplicated across store and tail")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(wd))
    }
  }

  test("reshard: re-cutting at a new budget equals the direct pack at that budget, provenance included") {
    val docsToks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), graft.functions.Text.tokens(col("text")).as("toks"))
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0),
        r.getSeq[String](1).mkString(" "),
        r.getSeq[org.apache.spark.sql.Row](2).map(d =>
          (d.getLong(0), d.getInt(1), d.getInt(2))).mkString(";"))
    def keys(df: org.apache.spark.sql.DataFrame) = df.collect().map(key)
    val at256 = Pack.packedSequencesTokens(docsToks, "doc_id", "toks", 256)
    // upshard to a NON-DIVISOR budget: windows cross old boundaries
    val up = keys(Pack.reshard(at256, 256, 384))
    val direct384 = keys(Pack.packedSequencesTokens(docsToks, "doc_id", "toks", 384))
    assert(up.toSet == direct384.toSet && up.length == direct384.length,
      "reshard 256→384 must equal the direct pack at 384 exactly")
    // downshard: one old sequence fans out into several new ones
    val down = keys(Pack.reshard(at256, 256, 100))
    val direct100 = keys(Pack.packedSequencesTokens(docsToks, "doc_id", "toks", 100))
    assert(down.toSet == direct100.toSet && down.length == direct100.length,
      "reshard 256→100 must equal the direct pack at 100 exactly")
    // same budget: identity
    val same = keys(Pack.reshard(at256, 256, 256))
    val base = keys(at256)
    assert(same.toSet == base.toSet && same.length == base.length,
      "reshard at the same budget must be the identity")
  }

  test("tombstone: pad-masking commutes with packing; untouched sequences bit-identical; cap enforced") {
    val docsToks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), graft.functions.Text.tokens(col("text")).as("toks"))
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0),
        r.getSeq[String](1).mkString(" "),
        r.getSeq[org.apache.spark.sql.Row](2).map(d =>
          (d.getLong(0), d.getInt(1), d.getInt(2))).mkString(";"))
    val packed = Pack.packedSequencesTokens(docsToks, "doc_id", "toks", 256)
      .persist()
    val tombIds = docsToks.filter(col("doc_id") % 97 === 0).select(col("doc_id"))
    val tombSet = tombIds.collect().map(_.getLong(0)).toSet
    assert(tombSet.nonEmpty, "fixture must contain tombstoned docs")
    val out = Pack.tombstone(packed, tombIds, lit("~PAD~")).persist()
    // the commutation law: scrubbing the packed store == packing the
    // scrubbed corpus (pad preserves token counts, so every offset,
    // boundary and provenance entry is identical by construction)
    val expected = Pack.packedSequencesTokens(
      docsToks.select(col("doc_id"),
        when(col("doc_id") % 97 === 0,
          transform(col("toks"), _ => lit("~PAD~")))
          .otherwise(col("toks")).as("toks")),
      "doc_id", "toks", 256)
      .collect().map(key)
    val got = out.collect().map(key)
    assert(got.toSet == expected.toSet && got.length == expected.length,
      "tombstone(pack(corpus)) must equal pack(scrub(corpus)) exactly")
    // sequences holding no tombstoned doc are bit-identical rows
    val untouchedBefore = packed
      .filter(!exists(col("docs"), d => d.getField("doc_id").isin(tombSet.toSeq: _*)))
      .collect().map(key).toSet
    val outKeys = got.toSet
    assert(untouchedBefore.subsetOf(outKeys),
      "a sequence without tombstoned docs must pass through bit-identical")
    // past the bounded-set budget the call DEGRADES to the distributed
    // join mask instead of failing — identical result on the same ids
    // (here maxIds=1 forces the fallback for the same tombstone set)
    val viaJoin = Pack.tombstone(packed, tombIds, lit("~PAD~"), maxIds = 1)
      .collect().map(key)
    assert(viaJoin.toSet == expected.toSet && viaJoin.length == expected.length,
      "the oversize join fallback must mask identically to the literal path")
    // and the direct tombstoneJoin entry point agrees too
    val direct = Pack.tombstoneJoin(packed, tombIds, lit("~PAD~"))
      .collect().map(key)
    assert(direct.toSet == expected.toSet && direct.length == expected.length)
    packed.unpersist(); out.unpersist()
  }

  test("interleaved multimodal round trip: streams reassemble exactly, at least one media run straddles a sequence boundary") {
    val inter = graft.multimodal.Multimodal
      .interleaved(Tables.documents(spark, sfDir)).persist()
    val packed = Pack.packedSequencesTokens(
      inter.select(col("doc_id"), col("jetons")), "doc_id", "jetons", 256).persist()
    // full-array round trip: the re-cut must reproduce every interleaved
    // stream bit-for-bit, placeholder runs included
    val back = packed
      .select(col("seq_id"), col("tokens"), explode(col("docs")).as("d"))
      .select(col("d.doc_id").as("doc_id"),
        (col("seq_id") * 256L + col("d.debut_dans_seq")).as("deb"),
        expr("slice(tokens, d.debut_dans_seq + 1, d.n_tokens)").as("tranche"))
      .groupBy(col("doc_id"))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("deb"), col("tranche")))),
        p => p.getField("tranche"))).as("toks"))
    val mismatches = inter.select(col("doc_id"), col("jetons"))
      .join(back, Seq("doc_id"), "full")
      .filter(col("jetons").isNull || col("toks").isNull ||
        !(col("jetons") === col("toks")))
      .count()
    assert(mismatches == 0, "interleaved streams must round-trip the pack exactly")
    // the claim only bites if some media run CROSSES a sequence cut:
    // compute each image run's global interval from the provenance
    val docStart = packed
      .select(col("seq_id"), explode(col("docs")).as("d"))
      .select(col("d.doc_id").as("doc_id"),
        (col("seq_id") * 256L + col("d.debut_dans_seq")).as("deb"))
      .groupBy(col("doc_id")).agg(min(col("deb")).as("g0"))
    val straddling = inter.select(col("doc_id"), col("debut_image"))
      .join(docStart, Seq("doc_id"))
      .withColumn("gs", col("g0") + col("debut_image"))
      .filter(expr("gs div 256 != (gs + 7) div 256"))
      .count()
    assert(straddling > 0,
      "fixture must contain an image run straddling a sequence boundary")
    inter.unpersist(); packed.unpersist()
  }

  test("interleaved store MAINTENANCE: reshard migration and tombstone masking preserve " +
      "media-run provenance (text hash, run positions/widths, payload fingerprint pairing)") {
    // the m06 gate packs the interleaved store; this law runs the
    // MAINTENANCE ops over it — io06's context-length migration and
    // io07's deletion masking, then their composition — and requires
    // the media-run provenance to survive: every surviving doc's
    // reassembly must reproduce the placeholder-stripped text hash,
    // each run's position and width in the stream, and (through the
    // doc-keyed parallel media columns) the payload fingerprint
    // pairing; every masked doc must be pad end to end, runs included.
    val inter = graft.multimodal.Multimodal
      .interleaved(Tables.documents(spark, sfDir)).persist()
    val at256 = Pack.packedSequencesTokens(
      inter.select(col("doc_id"), col("jetons")), "doc_id", "jetons", 256).persist()

    def reassemble(shards: org.apache.spark.sql.DataFrame, seqTokens: Int) = shards
      .select(col("seq_id"), col("tokens"), explode(col("docs")).as("d"))
      .select(col("d.doc_id").as("doc_id"),
        (col("seq_id") * seqTokens.toLong + col("d.debut_dans_seq")).as("deb"),
        expr("slice(tokens, d.debut_dans_seq + 1, d.n_tokens)").as("tranche"))
      .groupBy(col("doc_id"))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("deb"), col("tranche")))),
        p => p.getField("tranche"))).as("toks"))

    // the provenance report of a reassembled (or source) token stream:
    // the m06 gate columns plus the payload pairing fingerprints
    def report(toks: org.apache.spark.sql.DataFrame) = toks
      .join(inter.select(col("doc_id"), col("media_image"), col("media_audio")),
        Seq("doc_id"))
      .select(
        col("doc_id"),
        md5(concat_ws(" ",
          filter(col("toks"), t => t =!= "<img>" && t =!= "<aud>"))).as("texte"),
        (array_position(col("toks"), "<img>") - 1).as("debut_image"),
        size(filter(col("toks"), t => t === "<img>")).as("n_img"),
        (array_position(col("toks"), "<aud>") - 1).as("debut_audio"),
        size(filter(col("toks"), t => t === "<aud>")).as("n_aud"),
        sha2(encode(col("media_image"), "UTF-8"), 256).as("empreinte_image"),
        sha2(encode(col("media_audio"), "UTF-8"), 256).as("empreinte_audio"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap

    val expected = rows(report(inter.select(col("doc_id"), col("jetons").as("toks"))))
    assert(expected.nonEmpty, "fixture drifted: no interleaved docs")

    // (1) io06-class migration: re-cut 256 → 384 from stored offsets
    val migrated = rows(report(reassemble(Pack.reshard(at256, 256, 384), 384)))
    assert(migrated == expected,
      "context-length migration must preserve every doc's media-run provenance")

    // (2) io07-class deletion: mask a doc subset in place
    val tomb = inter.filter(col("doc_id") % 9 === 0).select(col("doc_id"))
    val tombSet = tomb.collect().map(_.getLong(0)).toSet
    assert(tombSet.nonEmpty, "fixture drifted: empty deletion set")
    val masked = Pack.tombstone(at256, tomb, lit("<scrub>")).persist()
    val mReassembled = reassemble(masked, 256).persist()
    val mSurvivors = rows(report(
      mReassembled.join(tomb, Seq("doc_id"), "left_anti")))
    assert(mSurvivors == expected.view.filterKeys(!tombSet(_)).toMap,
      "survivors of a masked interleaved store must keep full provenance")
    // masked docs: pad end to end — media runs erased WITH the text
    val maskedLeft = mReassembled
      .join(tomb, Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        size(filter(col("toks"), t => t =!= "<scrub>")).as("nonpad"))
      .collect()
    assert(maskedLeft.nonEmpty && maskedLeft.forall(_.getInt(1) == 0),
      "masked interleaved docs must be pad end to end, placeholder runs included")

    // (3) composition: deletion then migration — a store lifecycle
    val comp = reassemble(Pack.reshard(masked, 256, 384), 384).persist()
    val cSurvivors = rows(report(comp.join(tomb, Seq("doc_id"), "left_anti")))
    assert(cSurvivors == expected.view.filterKeys(!tombSet(_)).toMap,
      "tombstone ∘ reshard must preserve surviving media-run provenance")
    assert(comp.join(tomb, Seq("doc_id"), "left_semi")
      .select(size(filter(col("toks"), t => t =!= "<scrub>")).as("nonpad"))
      .collect().forall(_.getInt(0) == 0),
      "masked docs must stay pad through the migration")
    inter.unpersist(); at256.unpersist(); masked.unpersist()
    mReassembled.unpersist(); comp.unpersist()
  }

  test("tombstone id typing: narrower integrals widen, nulls fail loud, non-integral ids fail loud") {
    val docsToks = Seq(
      (1L, Seq("a", "b")), (2L, Seq("c", "d")), (3L, Seq("e", "f"))
    ).toDF("doc_id", "toks")
    val packed = Pack.packedSequencesTokens(docsToks, "doc_id", "toks", 4)
    // INT id relation widens to long — doc 2 scrubbed, the rest untouched
    val ints = Seq(2).toDF("id")
    val got = Pack.tombstone(packed, ints, lit("~P~"))
      .select(explode(col("tokens")).as("t")).collect().map(_.getString(0)).sorted
    assert(got.toSeq == Seq("a", "b", "e", "f", "~P~", "~P~"))
    // a null-bearing deletion list fails LOUDLY (the AnnIndex.tombstone
    // shared contract — a dropped null would silently delete fewer rows
    // than the caller sent), on both the driver-literal and the
    // distributed join-mask path
    val withNull = Seq[(java.lang.Integer, String)]((2, "x"), (null, "y"))
      .toDF("id", "why").select(col("id"))
    val eNull = intercept[Exception] {
      Pack.tombstone(packed, withNull, lit("~P~"))
        .select(explode(col("tokens"))).collect()
    }
    assert(eNull.getMessage.contains("NULL") ||
      Option(eNull.getCause).exists(_.getMessage.contains("NULL")))
    val eNullJoin = intercept[Exception] {
      Pack.tombstoneJoin(packed, withNull, lit("~P~"))
        .select(explode(col("tokens"))).collect()
    }
    assert(eNullJoin.getMessage.contains("NULL") ||
      Option(eNullJoin.getCause).exists(_.getMessage.contains("NULL")))
    // a string id relation dies at the contract, not in a cast NPE
    val e = intercept[IllegalArgumentException] {
      Pack.tombstone(packed, Seq("2").toDF("id"), lit("~P~"))
    }
    assert(e.getMessage.contains("integral"))
  }

  test("plan pins: reshard is exactly two hash exchanges; tombstone is exchange-free") {
    val docsToks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), graft.functions.Text.tokens(col("text")).as("toks"))
    val dir = java.nio.file.Files.createTempDirectory("graft_packplan_").toString
    try {
      // materialize the store so the measured plans are the INCREMENTAL
      // maintenance ops over a published artifact, not the pack lineage
      Pack.packedSequencesTokens(docsToks, "doc_id", "toks", 256)
        .write.parquet(s"$dir/store")
      val store = spark.read.parquet(s"$dir/store")
      val rp = Pack.reshard(store, 256, 384)
        .queryExecution.executedPlan.toString()
      assert(!rp.contains("SinglePartition"),
        s"reshard must never collapse to one task:\n$rp")
      val exchanges = "Exchange".r.findAllIn(rp).size
      assert(exchanges == 2,
        s"reshard must plan exactly the doc-splice and seq-assembly exchanges, found $exchanges:\n$rp")
      val tp = Pack.tombstone(store,
        docsToks.filter(col("doc_id") % 97 === 0).select(col("doc_id")),
        lit("~PAD~"))
        .queryExecution.executedPlan.toString()
      assert(!tp.contains("Exchange"),
        s"tombstone must be a pure map pass — no exchange:\n$tp")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("finalize at an exact shard boundary: the emptied log still recovers the true offset from the store") {
    val budget = 4
    val perShard = 2
    // 8 docs × 4 tokens = 32 tokens = exactly 8 sequences = 4 shards:
    // the trim leaves an EMPTY log, so offset recovery must fall back
    // to the store watermark
    val docs = (0L until 8L)
      .map(i => (i, (0 until 4).map(j => s"w${i}_$j")))
      .toDF("doc_id", "toks")
    val wd = java.nio.file.Files.createTempDirectory("graft_finalize_edge_").toString
    val logDir = s"$wd/slices"
    val store = s"$wd/shards"
    try {
      Pack.packedSlicesTokens(docs, "doc_id", "toks", budget)
        .write.mode("append").parquet(logDir)
      val res = Pack.finalizeSliceLog(spark, logDir, store, budget, perShard)
      assert(res.watermarkSeqs == 8L && res.residualSlices == 0L)
      assert(Pack.recoveredOffset(spark, logDir, store, budget, perShard) == 32L,
        "an emptied log must recover the offset from the store watermark")
      // a continuing append starts exactly at the recovered offset
      val more = Seq((100L, Seq("x", "y", "z"))).toDF("doc_id", "toks")
      Pack.packedSlicesTokens(more, "doc_id", "toks", budget,
        startOffset = Pack.recoveredOffset(spark, logDir, store, budget, perShard))
        .write.mode("append").parquet(logDir)
      val appended = spark.read.parquet(logDir).collect()
      assert(appended.length == 1)
      assert(appended(0).getAs[Long]("seq_id") == 8L &&
        appended(0).getAs[Long]("deb") == 32L)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(wd))
    }
  }

  test("finalize crash windows: stale watermark marker never re-emits; an interrupted log swap never drops the tail") {
    val budget = 4
    val perShard = 2
    // 10 docs × 4 tokens + 1 × 3 = 43 tokens → 10 closed sequences
    // (5 whole shards) + a 3-token open tail past the shard boundary
    val docs = ((0L until 10L).map(i => (i, (0 until 4).map(j => s"w${i}_$j"))) :+
      (100L -> Seq("t0", "t1", "t2"))).toDF("doc_id", "toks")
    val wd = java.nio.file.Files.createTempDirectory("graft_finalize_crash_").toString
    val logDir = s"$wd/slices"
    val store = s"$wd/shards"
    val hc = spark.sparkContext.hadoopConfiguration
    val lp = new org.apache.hadoop.fs.Path(logDir)
    val tmp = new org.apache.hadoop.fs.Path(s"${logDir}__finalize_tmp")
    val fs = lp.getFileSystem(hc)
    def storeRows() = Pack.readShards(spark, store).count()
    try {
      Pack.packedSlicesTokens(docs, "doc_id", "toks", budget)
        .write.mode("append").parquet(logDir)
      val r1 = Pack.finalizeSliceLog(spark, logDir, store, budget, perShard)
      assert(r1.watermarkSeqs == 10L && r1.newShards == 5L && r1.residualSlices == 1L)
      val rowsAfterFirst = storeRows()

      // (a) crash between shard append and marker write == a STALE
      // marker beside newer shard files: the files are the truth, so a
      // re-finalize must emit NOTHING (re-emitting [0, 10) in append
      // mode would duplicate sequences in the write-once store)
      val wm = new org.apache.hadoop.fs.Path(s"$store/_WATERMARK_SEQS")
      val out = fs.create(wm, true)
      try out.writeLong(0L) finally out.close()
      assert(Pack.shardWatermarkSeqs(spark, store, perShard) == 10L,
        "the files-derived watermark must override a stale marker")
      val r2 = Pack.finalizeSliceLog(spark, logDir, store, budget, perShard)
      assert(r2.newShards == 0L && r2.watermarkSeqs == 10L)
      assert(storeRows() == rowsAfterFirst, "a stale marker must never duplicate sequences")

      val offset = Pack.recoveredOffset(spark, logDir, store, budget, perShard)
      assert(offset == 43L)

      // (b) crash between the trim's two renames: the live log is
      // aside, a CERTIFIED tmp (complete trimmed tail) is in place —
      // recovery must promote it, not conclude "no log" and fall back
      // to the 40-token store watermark (the silent-tail-loss bug)
      org.apache.commons.io.FileUtils.copyDirectory(
        new java.io.File(logDir), new java.io.File(tmp.toString))
      fs.create(new org.apache.hadoop.fs.Path(tmp, "_SWAP_COMMIT"), true).close()
      assert(fs.rename(lp, graft.operators.Swap.oldPath(lp)))
      assert(Pack.recoveredOffset(spark, logDir, store, budget, perShard) == 43L,
        "a mid-swap crash must recover the open tail from the certified tmp")
      assert(fs.exists(lp) && !fs.exists(tmp) && !fs.exists(graft.operators.Swap.oldPath(lp)))

      // (c) crash before the tmp was certified: only the aside dir
      // exists — recovery restores the previous log generation
      assert(fs.rename(lp, graft.operators.Swap.oldPath(lp)))
      assert(Pack.recoveredOffset(spark, logDir, store, budget, perShard) == 43L,
        "with no certified tmp the aside generation must be restored")

      // (d) a leftover UNcertified tmp beside a healthy log may be a
      // CONCURRENT trim mid-write: the read path must leave it alone
      // (writer-side cleanup — finalize deletes tmp before it writes)
      fs.mkdirs(tmp)
      fs.create(new org.apache.hadoop.fs.Path(tmp, "part-junk"), true).close()
      assert(Pack.recoveredOffset(spark, logDir, store, budget, perShard) == 43L)
      assert(fs.exists(tmp),
        "a read path must never delete a tmp a concurrent trim may be writing")
      fs.delete(tmp, true)

      // the recovered state is fully functional: a continuing append
      // then finalize closes nothing new (tail is 3 tokens < 1 shard)
      val r3 = Pack.finalizeSliceLog(spark, logDir, store, budget, perShard)
      assert(r3.newShards == 0L && r3.watermarkSeqs == 10L && r3.residualSlices == 1L)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(wd))
    }
  }

  test("maintainTombstone: logical waves serve masked below the watermark, the policy repack " +
      "equals the one-shot pack of the survivors, registry and generation cycle") {
    // synthetic corpus with CONTROLLED token weight: 40 docs x 5 tokens,
    // so every wave's dead fraction is exact by construction
    val docsToks = (1L to 40L)
      .map(i => (i, (1 to 5).map(j => s"d${i}t$j")))
      .toDF("doc_id", "toks")
    val wd = java.nio.file.Files.createTempDirectory("graft_repack_").toString
    val store = s"$wd/shards"
    try {
      Pack.writeShardsTokens(docsToks, "doc_id", "toks",
        seqTokens = 16, seqsPerShard = 4, outDir = store)
      def filesOf(dir: String) = new java.io.File(dir).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("shard_id="))
        .flatMap(_.listFiles()).map(_.getName).sorted.toSeq

      // wave 1: docs 1..4 = 20/200 tokens = 10% < 15% watermark —
      // logical only: files untouched, registry holds the wave, v1
      val before = filesOf(store)
      val r1 = Pack.maintainTombstone(spark, store,
        docsToks.filter(col("doc_id") <= 4).select("doc_id"),
        deadFracWatermark = 0.15, seqTokens = 16, seqsPerShard = 4)
      assert(!r1.repacked && r1.version == 1L && r1.pending == 4L)
      assert(math.abs(r1.deadFrac - 0.10) < 1e-9)
      assert(filesOf(store) == before, "a below-watermark wave must not rewrite the store")

      // the masked serve hides registered docs NOW (files still hold them)
      val maskedToks = Pack.readShardsMasked(spark, store, lit("~P~"))
        .select(explode(col("tokens")).as("t"))
        .filter(col("t") === "~P~").count()
      assert(maskedToks == 20L, "4 registered docs x 5 tokens must read as pad")

      // an EMPTY wave is not a deletion window: nothing registers,
      // nothing fires (the maintainAppend empty-batch rule)
      val r2 = Pack.maintainTombstone(spark, store,
        docsToks.filter(lit(false)).select("doc_id"),
        deadFracWatermark = 0.15, seqTokens = 16, seqsPerShard = 4)
      assert(!r2.repacked && r2.pending == 4L && math.abs(r2.deadFrac - 0.10) < 1e-9)

      // re-registering the same ids is idempotent in the measure
      val r2b = Pack.maintainTombstone(spark, store,
        docsToks.filter(col("doc_id") <= 4).select("doc_id"),
        deadFracWatermark = 0.15, seqTokens = 16, seqsPerShard = 4)
      assert(!r2b.repacked && r2b.pending == 4L && math.abs(r2b.deadFrac - 0.10) < 1e-9)

      // wave 3: docs 5..10 -> 50/200 = 25% >= 15% — the repack fires:
      // registry cleared, generation bumped
      val r3 = Pack.maintainTombstone(spark, store,
        docsToks.filter(col("doc_id").between(5, 10)).select("doc_id"),
        deadFracWatermark = 0.15, seqTokens = 16, seqsPerShard = 4)
      assert(r3.repacked && r3.version == 2L && r3.pending == 0L)
      assert(math.abs(r3.deadFrac - 0.25) < 1e-9)
      assert(Pack.repackVersion(spark, store) == 2L)
      assert(Pack.pendingTombstones(spark, store).isEmpty)

      // the repacked store IS the one-shot pack of the survivors —
      // sequence boundaries, token streams and provenance all equal
      def canon(df: org.apache.spark.sql.DataFrame) = df
        .select(col("seq_id"), md5(array_join(col("tokens"), " ")).as("h"),
          to_json(col("docs")).as("prov"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .sortBy(_._1).toSeq
      val oneShot = Pack.packedSequencesTokens(
        docsToks.filter(col("doc_id") > 10), "doc_id", "toks", 16)
      assert(canon(Pack.readShards(spark, store)) === canon(oneShot))

      // with the registry cleared, the masked serve is the plain read
      assert(Pack.readShardsMasked(spark, store, lit("~P~"))
        .select(explode(col("tokens")).as("t"))
        .filter(col("t") === "~P~").count() == 0L)

      // the shared deletion-id contract holds at REGISTRATION time:
      // nulls fail loud, non-integral ids die at the require
      val withNull = Seq[java.lang.Long](11L, null).toDF("doc_id")
      val eNull = intercept[Exception] {
        Pack.maintainTombstone(spark, store, withNull, 0.15, 16, 4)
      }
      assert(eNull.getMessage.contains("NULL") ||
        Option(eNull.getCause).exists(_.getMessage.contains("NULL")))
      val eStr = intercept[IllegalArgumentException] {
        Pack.maintainTombstone(spark, store, Seq("11").toDF("doc_id"), 0.15, 16, 4)
      }
      assert(eStr.getMessage.contains("integral"))

      // full-corpus takedown: every surviving doc registered at once
      // must FAIL the window with the documented message instead of
      // Swap-publishing an empty store later reads die on (r20 ADVICE
      // #3 — the "store must retain at least one document" floor,
      // previously documented but unenforced). The store is untouched:
      // same generation, nothing repacked.
      val vBefore = Pack.repackVersion(spark, store)
      val eAll = intercept[IllegalArgumentException] {
        Pack.maintainTombstone(spark, store,
          docsToks.filter(col("doc_id") > 10).select(col("doc_id")), 0.15, 16, 4)
      }
      assert(eAll.getMessage.contains("store deletion, not maintenance"))
      assert(Pack.repackVersion(spark, store) == vBefore)
      assert(Pack.readShards(spark, store).count() > 0L)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(wd))
    }
  }
}
