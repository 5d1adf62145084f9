package graft

import org.apache.spark.sql.functions._
import graft.queries.RefreshPipeline
import graft.functions.Text

/** Engine-side mechanics of the p06 incremental refresh that the DuckDB
  * oracle gate cannot see (it hashes the final report only): a
  * CONSTRUCTED corpus forces every hard refresh path at once —
  *
  *   - a batch doc BRIDGING two published near-dup clusters (similar to
  *     both A and B while A≁B), evicting the higher-canonical survivor;
  *   - a NEW benchmark doc in the batch contaminating a doc the
  *     published generation had SELECTED (eviction through the
  *     corpus-survivors-vs-new-eval-grams pass, in the SHARD tier);
  *   - budget RE-ADMISSION: the evictions free enough tokens that a
  *     corpus doc the published selection had cut at the budget line
  *     enters — a 'conserve'-statut doc that must nonetheless APPEND to
  *     the store (its tokens read from the persisted scrubbed corpus,
  *     never raw);
  *   - store invariants: evictee slices pad-masked in BOTH tiers
  *     (shards and open-tail log), surviving conserve docs keep their
  *     PUBLISHED global positions bit-for-bit, entrants land at
  *     deb ≥ the published high-water mark.
  *
  * Layout arithmetic of the fixture (budget 10000, seq 256, shard 8):
  * publish selects D(id1,2400) F(2,3,4 ×2400) A(10,9) B(11,9) = 9618
  * tokens → 4 whole shards cover [0,8192), log holds the tail — so the
  * contaminated D lives in the SHARD tier and the bridge-evicted B in
  * the LOG tier, exercising both mask paths. W(70, 500 tok, quality
  * 0.25) crosses the line at 10118 → published OUT; after D+B evict,
  * the refreshed prefix is F 7200, G(95) 7250, A 7259, W 7759 → W in.
  */
class RefreshSpec extends SparkSpec {

  private val core = "corea coreb corec cored coree coref"

  private def fill(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").updated(1, "the").mkString(" ")

  private val phrase = "zeta orbit helium quartz nimbus"

  private def docs(): Seq[(Long, String)] = Seq(
    1L -> (fill("d", 2395) + " " + phrase), // D: contaminated by the NEW benchmark at refresh
    2L -> fill("fa", 2400),
    3L -> fill("fb", 2400),
    4L -> fill("fc", 2400),
    10L -> (core + " alfa1 alfa2 alfa3"), // A: bridge cluster canonical (survives)
    11L -> (core + " beta1 beta2 beta3"), // B: bridge-evicted (jaccard(A,B)=0.4 < 0.5)
    50L -> fill("ev", 30), // published-generation benchmark (id%50=0): self-removes at publish
    // W: 13-char dotty tokens → punct 0.214 > 0.2, mean length 13 > 12,
    // no EN stopword ('a' would hit the \b list) → quality 0.25 exactly
    70L -> (1 to 500).map(i => f"w$i%04d.qq.xx.z").mkString(" "),
    93L -> core, // the BRIDGE (jaccard 4/7 to both A and B); non-canonical, self-removes
    95L -> fill("g", 50), // plain batch entrant
    100L -> (fill("e", 20) + " " + phrase + " " + (21 to 30).map(i => s"e$i").mkString(" "))
  ) // 100: the NEW benchmark (id%50=0) whose grams evict D

  private def withFixture(f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft_refresh_").toString
    try {
      import spark.implicits._
      docs().toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      f(dir)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(RefreshPipeline.workDir(dir)))
    }
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("p06 refresh: bridge eviction, new-benchmark eviction, budget re-admission, store masking and append positions") {
    withFixture { dir =>
      // fixture guard: the engineered quality tiers the arithmetic
      // above assumes (drifting Text.qualityScore would invalidate
      // the layout math silently otherwise)
      import spark.implicits._
      val q = docs().toDF("doc_id", "text")
        .select(col("doc_id"), Text.qualityScore(col("text")).as("q"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(Seq(1L, 2L, 3L, 4L, 95L).forall(q(_) == 1.0), s"filler tier drifted: $q")
      assert(q(10L) == 0.5 && q(11L) == 0.5 && q(93L) == 0.5, s"core tier drifted: $q")
      assert(q(70L) == 0.25, s"budget-line doc drifted: ${q(70L)}")

      val report = RefreshPipeline.run(spark, dir)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(4), r.getLong(5)))
      val work = RefreshPipeline.workDir(dir)

      // the published generation selected D and B and cut W at the line
      val published = spark.read.parquet(s"$work/selection")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(published == Set(1L, 2L, 3L, 4L, 10L, 11L),
        s"published selection drifted: $published")

      // refreshed selection: D(1) contaminated-evicted, B(11)
      // bridge-evicted, W(70) re-admitted, G(95) the entrant;
      // statut is corpus membership (id ≤ 9·max/10 = 90)
      assert(report.map(t => (t._1, t._2)).toSeq ==
        Seq((2L, "conserve"), (3L, "conserve"), (4L, "conserve"),
          (10L, "conserve"), (70L, "conserve"), (95L, "entrant")))
      // running totals of the re-selection (quality desc, id asc)
      assert(report.map(t => t._1 -> t._5).toMap ==
        Map(2L -> 2400L, 3L -> 4800L, 4L -> 7200L, 95L -> 7250L, 10L -> 7259L, 70L -> 7759L))
      // fingerprints decode bit-for-bit through the refreshed store
      val txt = docs().toMap
      report.foreach { case (id, _, emp, n, _) =>
        assert(emp == md5Hex(txt(id)), s"doc $id fingerprint drifted through the store")
        assert(n == txt(id).split("\\s+").length.toLong)
      }

      // store forensics: per-slice rows of both refreshed tiers
      val shardSlices = Pack.readShards(spark, s"$work/refreshed/store/shards")
        .select(col("seq_id"), col("tokens"), explode(col("docs")).as("d"))
        .select(col("d.doc_id").as("doc_id"),
          (col("seq_id") * 256L + col("d.debut_dans_seq")).as("deb"),
          expr("slice(tokens, d.debut_dans_seq + 1, d.n_tokens)").as("tranche"))
      val logSlices = spark.read.parquet(s"$work/refreshed/store/log")
        .select(col("doc_id"), col("deb"), col("tranche"))
      val slices = shardSlices.unionByName(logSlices).cache()

      // (a) evictee masking in BOTH tiers: D(1) lives in the shard
      // region [0,2400), B(11) in the log tail — every slice token of
      // both must be the pad, provenance rows intact (auditable)
      val masked = slices.filter(col("doc_id").isin(1L, 11L))
        .select(col("doc_id"), col("deb"),
          size(filter(col("tranche"), t => t =!= "<scrub>")).as("nonpad"))
        .collect()
      assert(masked.nonEmpty && masked.exists(_.getLong(1) < 2400L),
        "fixture drifted: the contaminated doc must have slices in the shard tier")
      assert(masked.forall(_.getInt(2) == 0), "evictee ranges must be fully pad-masked")
      assert(slices.filter(col("doc_id") === 11L && col("deb") < 8192L).count() == 0 &&
        slices.filter(col("doc_id") === 11L).count() > 0,
        "fixture drifted: the bridge evictee must sit in the log tier")

      // (b) conserve docs keep their PUBLISHED positions bit-for-bit
      val pubShardSlices = Pack.readShards(spark, s"$work/store/shards")
        .select(col("seq_id"), col("tokens"), explode(col("docs")).as("d"))
        .select(col("d.doc_id").as("doc_id"),
          (col("seq_id") * 256L + col("d.debut_dans_seq")).as("deb"),
          expr("slice(tokens, d.debut_dans_seq + 1, d.n_tokens)").as("tranche"))
      val pubLogSlices = spark.read.parquet(s"$work/store/log")
        .select(col("doc_id"), col("deb"), col("tranche"))
      val pub = pubShardSlices.unionByName(pubLogSlices)
        .filter(col("doc_id").isin(2L, 3L, 4L, 10L))
      assert(slices.filter(col("doc_id").isin(2L, 3L, 4L, 10L))
        .unionByName(pub).distinct().count() == pub.count(),
        "surviving conserve docs must keep their published slices verbatim")

      // (c) entrants — including the re-ADMITTED conserve doc W(70) —
      // append at deb ≥ the published high-water mark (9618)
      val entrantDebs = slices.filter(col("doc_id").isin(70L, 95L))
        .agg(min(col("deb"))).collect()(0).getLong(0)
      assert(entrantDebs >= 9618L,
        s"entrants must append after the published region, got min deb $entrantDebs")
      slices.unpersist()
    }
  }

  private def Pack = graft.operators.Pack

  test("incremental scaling law: refresh shuffle bytes track the BATCH, not the corpus") {
    // two fixtures, IDENTICAL 10-doc batch, corpus 10× apart: the
    // refresh must probe every corpus-scale artifact map-side (span-gram
    // store, signature store + band index, persisted scrubbed corpus),
    // so its shuffled bytes stay nearly flat while the publish — which
    // legitimately pays corpus-scale exchanges — grows with the corpus.
    // This is THE property that makes p06 the 100 TB loop rather than a
    // re-run: a corpus-keyed exchange sneaking into the refresh shows up
    // here as ~10× bytes. Both fixtures exercise live deltas (the
    // 1.0-quality batch displaces 0.75-quality corpus tail docs).
    def mkDocs(n: Int): Seq[(Long, String)] = {
      // every corpus doc quality 0.75 (no stopword), every batch doc 1.0
      // ("the") — so the batch ALWAYS heads the re-selection whatever n,
      // displacing the corpus tail: entrants and evictees live at both
      // fixture sizes
      val corpus = (1 to n).map { i =>
        (i.toLong, (1 to 60).map(j => s"c${i}w$j").mkString(" "))
      }
      val batch = (1 to 10).map { i =>
        ((10L * n) + i, (1 to 60).map(j => s"b${i}w$j").updated(1, "the").mkString(" "))
      }
      corpus ++ batch
    }
    def measured(n: Int): (Long, Long) = {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_rsc_${n}_").toString
      try {
        import spark.implicits._
        mkDocs(n).toDF("doc_id", "text").coalesce(1)
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
        val (_, _, wPub) = org.apache.spark.graft.ShuffleMeter
          .measure(spark.sparkContext) { RefreshPipeline.setup(spark, dir) }
        val (rows, _, wRef) = org.apache.spark.graft.ShuffleMeter
          .measure(spark.sparkContext) { RefreshPipeline.run(spark, dir).collect() }
        // deltas must be LIVE in both fixtures or the law is vacuous
        assert(rows.exists(_.getString(1) == "entrant"),
          s"fixture n=$n drifted: the batch must enter the selection")
        (wPub, wRef)
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
        org.apache.commons.io.FileUtils.deleteDirectory(
          new java.io.File(RefreshPipeline.workDir(dir)))
      }
    }
    val (pubSmall, refSmall) = measured(200)
    val (pubBig, refBig) = measured(2000)
    // sanity: the corpus really did grow — publish bytes scale with it
    assert(pubBig > pubSmall * 4,
      s"fixture drifted: publish bytes $pubSmall -> $pubBig should grow with the corpus")
    // the law: refresh bytes near-flat under 10× corpus (narrow survivor
    // stats are the only corpus-∝ exchange — ~bytes-per-doc, far under
    // the 3× allowance; a corpus-keyed token exchange would read ~10×)
    assert(refBig < refSmall * 3 + (1L << 20),
      s"refresh shuffled $refSmall -> $refBig bytes under a 10× corpus — " +
        "a corpus-scale relation is crossing an exchange")
  }
}
