package graft

import org.apache.spark.sql.functions._
import graft.functions.Text
import graft.operators.Dedup
import graft.sources.Tables

/** Dedup operators: exact, MinHash-LSH (recall vs exhaustive Jaccard),
  * SimHash blocking, embedding near-dup recall on planted pairs.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("exact dedup: min-id winner, copy counts") {
    val df = Seq(
      (10L, "aaa"), (3L, "aaa"), (7L, "aaa"),
      (5L, "bbb"), (1L, "ccc")
    ).toDF("doc_id", "text")
    val got = Dedup.exact(df, "doc_id", col("text")).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got == Map(3L -> 3L, 5L -> 1L, 1L -> 1L))
  }

  test("spanDedup: shared run found at UNALIGNED offsets, maximal-span merge, edges") {
    // the shared 6-token run sits at pos 1 in doc 1 and pos 3 in doc 2 —
    // a fixed-chunk pass (chunk width 4) sees different chunks and
    // misses it; the sliding gram (k=3) must flag it in both, merging
    // the overlapping gram hits into ONE maximal span of 6 tokens.
    val run = "r1 r2 r3 r4 r5 r6"
    val df = Seq(
      (1L, s"$run u1 u2 u3"),
      (2L, s"v1 v2 $run w1"),
      (3L, "x1 x2 x3 x4 x5 x6 x7 x8 x9"), // nothing shared
      (4L, "y1 y2"),                       // shorter than the gram
      (5L, "")
    ).toDF("doc_id", "text")
    val got = Dedup.spanDedup(df, "doc_id", "text", gramTokens = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got(1L) == ((9L, 1L, 6L, 0.666667)))
    assert(got(2L) == ((9L, 1L, 6L, 0.666667)))
    assert(got(3L) == ((9L, 0L, 0L, 0.0)))
    assert(got(4L) == ((2L, 0L, 0L, 0.0)))
    assert(got(5L) == ((0L, 0L, 0L, 0.0)))
    // the fixed-chunk operator misses the doc-2 occurrence entirely at
    // width 4 with these alignments — that gap is WHY spanDedup exists
    val chunks = Dedup.chunkDedup(df, "doc_id", "text", chunkTokens = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(chunks(2L) === 0L)
  }

  test("spanDedup: within-doc repetition and disjoint spans stay separate") {
    // "a b c" repeats inside doc 10 at pos 1 and pos 7 (gap of 3 > k) —
    // two islands, 3 tokens each
    val df = Seq(
      (10L, "a b c p q r a b c"),
      (11L, "m n o m n o m n o m n o") // overlapping self-repeats: one full-cover span
    ).toDF("doc_id", "text")
    val got = Dedup.spanDedup(df, "doc_id", "text", gramTokens = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(10L) == ((9L, 2L, 6L)))
    assert(got(11L) == ((12L, 1L, 12L)))
  }

  test("spanScrub: survivor occurrence kept, unaligned span removed where chunk scrub misses") {
    // the shared 6-token run sits at pos 1 in doc 1 and pos 3 in doc 2:
    // doc 1 holds the global first occurrence of every duplicated gram
    // (the survivor) and must keep its full text; doc 2 loses exactly
    // the run — REGARDLESS of chunk alignment (chunkScrub at width 4
    // sees different chunks in the two docs and removes nothing).
    val run = "r1 r2 r3 r4 r5 r6"
    val df = Seq(
      (1L, s"$run u1 u2 u3"),
      (2L, s"v1 v2 $run w1"),
      (3L, "x1 x2 x3 x4 x5 x6 x7 x8 x9"), // nothing shared → untouched
      (4L, "y1 y2"),                       // sub-width → untouched (unlike chunkScrub)
      (5L, "")
    ).toDF("doc_id", "text")
    val got = Dedup.spanScrub(df, "doc_id", "text", gramTokens = 3).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got == Map(
      1L -> ((s"$run u1 u2 u3", 9L)),
      2L -> (("v1 v2 w1", 3L)),
      3L -> (("x1 x2 x3 x4 x5 x6 x7 x8 x9", 9L)),
      4L -> (("y1 y2", 2L)),
      5L -> (("", 0L))
    ))
    // tokenized entry-point parity: spanScrubTokens over a
    // pre-tokenized relation rebuilds to the same rows as the raw
    // entry (the p03 composition contract — tokenize once, scrub in
    // token space)
    val toks = df.select(col("doc_id").as("id"), Text.tokens(col("text")).as("jetons"))
    val viaToks = Dedup.spanScrubTokens(toks, "id", "jetons", gramTokens = 3)
      .select(col("doc_id"), concat_ws(" ", col("jetons_gardes")), col("n_tokens_gardes"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(viaToks == got)
    // the chunk-grain scrub misses the doc-2 occurrence entirely at
    // width 4 with these alignments — that gap is WHY spanScrub exists
    val chunked = Dedup.chunkScrub(df, "doc_id", "text", chunkTokens = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(chunked(2L) === 2L, "chunk scrub keeps both doc-2 chunks (no aligned duplicate)")
  }

  test("spanScrub: within-doc repeat loses its second occurrence; full duplicate scrubs to empty") {
    val df = Seq(
      (10L, "a b c p q r a b c"),    // "a b c" repeats at pos 1 and 7: keep the first
      (11L, "m n o q s t u"),        // global first occurrence of the whole doc
      (12L, "m n o q s t u")         // exact copy → every gram non-first → empty
    ).toDF("doc_id", "text")
    val got = Dedup.spanScrub(df, "doc_id", "text", gramTokens = 3).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got == Map(
      10L -> (("a b c p q r", 6L)),
      11L -> (("m n o q s t u", 7L)),
      12L -> (("", 0L))
    ))
  }

  test("repetitionScrub: intra-doc repeats collapse to first occurrence, cross-doc content untouched") {
    val df = Seq(
      (1L, "a b c p q r a b c"),          // "a b c" repeats at pos 7: keep the first only
      (2L, "x x x x x x x x x x"),        // one gram repeated: collapses to the survivor window's start
      (3L, "m n o q s t u"),              // no intra-doc repeat → unchanged
      (4L, "m n o q s t u"),              // exact copy of doc 3 — CROSS-doc dup must be ignored here
      (5L, "y1 y2"),                      // sub-width → untouched
      (6L, "")
    ).toDF("doc_id", "text")
    val got = Dedup.repetitionScrub(df, "doc_id", "text", gramTokens = 3).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got == Map(
      // grams at pos 1..7; pos 7 "a b c" repeats pos 1 → tokens 7-9 drop
      1L -> (("a b c p q r", 6L)),
      // grams at pos 1..8 all "x x x": hits 2..8 cover tokens 2..10 → first token survives
      2L -> (("x", 1L)),
      3L -> (("m n o q s t u", 7L)),
      4L -> (("m n o q s t u", 7L)),
      5L -> (("y1 y2", 2L)),
      6L -> (("", 0L))
    ))
  }

  test("repetitionScrub: disjoint islands each drop their repeat; whitespace is normalized") {
    val df = Seq(
      // "a b c" repeats at 7 (island 1); "d e f" from pos 4 repeats at 13 (island 2)
      (1L, "a b c d e f a b c z1 z2 z3 d e f"),
      (2L, "  w1   w2  w3 ")               // no repeat, messy spacing → normalized rebuild
    ).toDF("doc_id", "text")
    val got = Dedup.repetitionScrub(df, "doc_id", "text", gramTokens = 3).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got == Map(
      1L -> (("a b c d e f z1 z2 z3", 9L)),
      2L -> (("w1 w2 w3", 3L))
    ))
  }

  test("span operators: the xxhash64 fast path equals the md5-gated path (sf0.001)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("doc_id")).collect().map(_.toSeq).toSeq
    assert(
      rows(Dedup.spanDedup(docs, "doc_id", "text", 8, exactFingerprints = false)) ==
        rows(Dedup.spanDedup(docs, "doc_id", "text", 8, exactFingerprints = true)))
    assert(
      rows(Dedup.spanScrub(docs, "doc_id", "text", 8, exactFingerprints = false)) ==
        rows(Dedup.spanScrub(docs, "doc_id", "text", 8, exactFingerprints = true)))
  }

  test("chunkDedup: cross-doc boilerplate, within-doc repeats, short and blank docs") {
    val df = Seq(
      (1L, "a b c d e f g h"),         // "a b c d" shared with doc 2
      (2L, "a b c d x y z w"),
      (3L, "p q r s p q r s"),         // within-doc repeat: both chunks duplicated
      (4L, ""),                        // blank: zero chunks
      (5L, "one two three")            // shorter than the chunk width: zero chunks
    ).toDF("doc_id", "text")
    val got = Dedup.chunkDedup(df, "doc_id", "text", chunkTokens = 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == Map(
      1L -> ((2L, 1L, 0.5)),
      2L -> ((2L, 1L, 0.5)),
      3L -> ((2L, 2L, 1.0)),
      4L -> ((0L, 0L, 0.0)),
      5L -> ((0L, 0L, 0.0))
    ))
  }

  test("broadcast budgets clamp to maxResultSize AND the driver heap (collect ceiling)") {
    val maxResult = org.apache.spark.network.util.JavaUtils
      .byteStringAsBytes(spark.conf.get("spark.driver.maxResultSize"))
    assert(maxResult > 0, "test session must have a finite maxResultSize")
    // a budget past the driver's collect ceiling must be cut to it —
    // at the 1000x stress tier an unclamped 4 GB budget chose a 2.7 GB
    // broadcast that died in collect instead of degrading to the
    // shuffled path. The ceiling is min(maxResultSize, heap/3):
    // maxResultSize is a conf, not a capacity, and a result-size
    // ceiling above what the heap can hold would OOM the collect.
    val ceiling = math.min(maxResult, Runtime.getRuntime.maxMemory() / 3)
    assert(Dedup.clampToDriverLimit(spark, Long.MaxValue / 4) == ceiling)
    assert(Dedup.clampToDriverLimit(spark, 1024L) == 1024L)
  }

  test("chunkScrub: boilerplate chunks removed in place, order kept, tail dropped") {
    val df = Seq(
      (1L, "a b c d e f g h tail1"),     // "a b c d" shared with doc 2; tail dropped
      (2L, "x y z w a b c d"),           // shared chunk removed from the MIDDLE position
      (3L, "p q r s p q r s"),           // fully boilerplate (within-doc repeat) → empty
      (4L, ""),                          // blank → empty
      (5L, "unique little doc")          // sub-width → empty
    ).toDF("doc_id", "text")
    val got = Dedup.chunkScrub(df, "doc_id", "text", chunkTokens = 4).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got == Map(
      1L -> (("e f g h", 1L)),
      2L -> (("x y z w", 1L)),
      3L -> (("", 0L)),
      4L -> (("", 0L)),
      5L -> (("", 0L))
    ))
  }

  test("chunkDedup: duplicate-free corpus flags nothing") {
    val df = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (2L, "v1 v2 v3 v4")
    ).toDF("doc_id", "text")
    val got = Dedup.chunkDedup(df, "doc_id", "text", chunkTokens = 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(1L -> ((2L, 0L)), 2L -> ((1L, 0L))))
  }

  test("minhashLshAgainst == full-corpus LSH restricted to the batch/corpus split") {
    val docs = Tables.documents(spark, sfDir)
    val isBatch = col("doc_id") % 50 === 0 && col("doc_id") > 0
    val inc = Dedup
      .minhashLshAgainst(docs.filter(isBatch), docs.filter(!isBatch), "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    // every emitted pair crosses the split in the declared direction
    inc.keys.foreach { case (b, c) =>
      assert(b % 50 == 0 && b > 0, s"id_batch $b must be a batch doc")
      assert(!(c % 50 == 0 && c > 0), s"id_corpus $c must be a corpus doc")
    }
    // equality with the full-corpus pass, restricted to cross-split pairs
    val full = Dedup.minhashLsh(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .filter { case ((a, b), _) =>
        (a % 50 == 0 && a > 0) != (b % 50 == 0 && b > 0)
      }
      .map { case ((a, b), j) => // orient as (batch, corpus)
        if (a % 50 == 0 && a > 0) (a, b) -> j else (b, a) -> j
      }
      .toMap
    assert(inc == full,
      "incremental screen must find the same cross-split pairs at the same jaccard")
    assert(inc.nonEmpty, "the planted every-50th near-dups straddle the split")
  }

  test("minhashLshAgainst: stored-signature path == recompute path") {
    val docs = Tables.documents(spark, sfDir)
    val isBatch = col("doc_id") % 50 === 0 && col("doc_id") > 0
    val batch = docs.filter(isBatch)
    val corpus = docs.filter(!isBatch)
    def pairs(sigs: Option[org.apache.spark.sql.DataFrame]) = Dedup
      .minhashLshAgainst(batch, corpus, "doc_id", "text", corpusSigs = sigs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val stored = Dedup.signatures(corpus, "doc_id", "text")
    val got = pairs(Some(stored))
    assert(got == pairs(None), "precomputed corpus sigs must screen identically")
    assert(got.nonEmpty)
  }

  test("minhashLshAgainst: past the sig budget the two-broadcast/shuffled fallbacks screen identically") {
    val docs = Tables.documents(spark, sfDir)
    val isBatch = col("doc_id") % 50 === 0 && col("doc_id") > 0
    val batch = docs.filter(isBatch)
    val corpus = docs.filter(!isBatch)
    def pairs() = Dedup
      .minhashLshAgainst(batch, corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val fat = pairs() // default budget: single fat batch-band broadcast
    try {
      // a budget too small for the fat band broadcast but enough for
      // the narrow bands + sig pair → the two-broadcast shape
      spark.conf.set("spark.graft.dedup.sigBroadcastBytes", "20000")
      assert(pairs() == fat, "two-broadcast fallback must screen identically")
      // a budget too small for anything → plain shuffled joins
      spark.conf.set("spark.graft.dedup.sigBroadcastBytes", "1")
      assert(pairs() == fat, "fully shuffled fallback must screen identically")
    } finally spark.conf.unset("spark.graft.dedup.sigBroadcastBytes")
    assert(fat.nonEmpty)
  }

  test("minhash LSH finds exactly the exhaustive-Jaccard pairs on sf0.001 docs") {
    val docs = Tables.documents(spark, sfDir)
    val got = Dedup.minhashLsh(docs, "doc_id", "text", shingleN = 3, k = 64, bands = 32, threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exhaustive ground truth (fixture is small enough to cross-join)
    val sh = docs.select(col("doc_id"), Text.shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    val truth = sh.as("a").crossJoin(sh.as("b"))
      .filter($"a.doc_id" < $"b.doc_id")
      .filter(Text.jaccard($"a.sh", $"b.sh") >= 0.5)
      .select($"a.doc_id", $"b.doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "fixture must contain planted near-dups")
    assert(got == truth, s"LSH pairs must equal exhaustive pairs (missing=${truth -- got}, extra=${got -- truth})")
  }

  test("simhash near-dup: identical docs at hamming 0; blocking finds them") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "iota kappa lambda mu nu xi omicron pi")
    ).toDF("doc_id", "text")
    val got = Dedup.simhashNearDup(df, "doc_id", "text", maxDist = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((1L, 2L, 0)))
  }

  test("ngram jaccard join: delegates with exact verification") {
    val df = Seq(
      (1L, "one two three four five six"),
      (2L, "one two three four five seven"),
      (3L, "a b c d e f")
    ).toDF("doc_id", "text")
    val got = Dedup.ngramJaccardJoin(df, "doc_id", "text", n = 2, threshold = 0.5).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    val j = got.head.getDouble(2)
    // shingle sets of size 5, 4 common bigrams -> jaccard 4/6
    assert(math.abs(j - 4.0 / 6.0) < 1e-6)
  }

  test("embedding near-dup: 100% recall on planted jittered pairs (e03 shape)") {
    val out = queries.PipelineQueries.all.find(_.name == "e03_embedding_neardup").get
      .run(spark, sfDir)
      .collect()
    val nEmb = Tables.embeddings(spark, sfDir).count()
    assert(out.length == nEmb, s"expected $nEmb planted pairs, got ${out.length}")
    out.foreach { r =>
      assert(r.getLong(1) == r.getLong(0) + 1000000L, "pairs must match id with its jittered copy")
      assert(r.getDouble(2) >= 0.99)
    }
  }

  test("connected components: chain and islands cluster to min ids") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val got = Dedup.clusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("connected components: union-find finish == distributed contraction on a mixed graph") {
    // deterministic pseudo-random graph: chains, a star, a cycle, and
    // duplicate/reversed edges — the two paths must label every node
    // identically (both tag with the component minimum)
    val edges = (
      (1L to 40L).sliding(2).map(s => (s(0), s(1))).toSeq ++      // long chain
        (50L to 60L).map(i => (55L, i)) ++                        // star w/ self-edge
        Seq((70L, 71L), (71L, 72L), (72L, 70L), (71L, 70L)) ++    // cycle + reverse dup
        Seq((80L, 81L))
    ).toDF("id_a", "id_b")
    val viaUf = Dedup.clusters(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.conf.set("spark.graft.dedup.ccDriverEdges", "0")
    val viaStar =
      try Dedup.clusters(edges).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      finally spark.conf.unset("spark.graft.dedup.ccDriverEdges")
    assert(viaUf == viaStar)
    assert(viaUf(40L) == 1L && viaUf(60L) == 50L && viaUf(72L) == 70L && viaUf(81L) == 80L)
  }

  test("incremental span scrub against a published gram store == one-shot over the union (batch rows)") {
    // split corpus with every cross-split duplication shape: a run
    // shared base↔batch (batch occurrence must scrub even though it is
    // unique WITHIN the batch), a batch-internal repeat (first batch
    // occurrence survives — the store has never seen it), a run the
    // base scrubbed out of ITSELF (still in the store: the screen keys
    // on what the scrub SAW, not what it kept), and untouched docs.
    val shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    val baseDup = "b1 b2 b3 b4 b5 b6 b7 b8"
    val batchRun = "c1 c2 c3 c4 c5 c6 c7 c8"
    val docs = Seq(
      (1L, s"$shared u1 u2"),                 // base: first occurrence, kept
      (2L, s"$baseDup x1 $baseDup"),          // base: scrubs its own repeat
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8 z9"),     // base: unique
      (10L, s"v1 $shared v2"),                 // batch: duplicates base → scrub
      (11L, s"$batchRun w1"),                  // batch: first of a batch pair
      (12L, s"w2 $batchRun"),                  // batch: second → scrub
      (13L, s"y1 $baseDup y2"),                // batch: duplicates a base-scrubbed run
      (14L, "q1 q2 q3 q4 q5 q6 q7 q8 q9")      // batch: unique
    ).toDF("doc_id", "text")
    val toks = docs.select(col("doc_id"), Text.tokens(col("text")).as("a"))
    val base = toks.filter(col("doc_id") < 10L)
    val batch = toks.filter(col("doc_id") >= 10L)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).mkString(" "), r.getLong(2))).toSet
    for (exact <- Seq(true, false)) {
      val oneShot = rows(Dedup.spanScrubTokens(toks, "doc_id", "a", 8, exact)
        .filter(col("doc_id") >= 10L))
      val store = Dedup.spanGramStore(base, "doc_id", "a", 8, exact)
      val inc = rows(Dedup.spanScrubTokensAgainst(batch, "doc_id", "a", store, 8, exact))
      assert(inc == oneShot, s"incremental != one-shot (exactFingerprints=$exact)")
    }
    // and the base side is invariant under the union (the ordering
    // argument the equality rests on)
    assert(
      rows(Dedup.spanScrubTokens(toks, "doc_id", "a", 8).filter(col("doc_id") < 10L)) ==
        rows(Dedup.spanScrubTokens(base, "doc_id", "a", 8)))
  }

  test("clusterDelta: batch bridge merges two published clusters and evicts the losing survivor") {
    // published pair graph: {1,2} (label 1) and {5,6} (label 5); doc 9
    // is pairless (implicit self-cluster). Batch 20 bridges 2 and 6;
    // batch 21-22 pair only each other; batch 23 pairs the pairless 9.
    val published = Seq((1L, 1L), (2L, 1L), (5L, 5L), (6L, 5L)).toDF("id", "cluster_id")
    val internal = Seq((21L, 22L)).toDF("id_a", "id_b")
    val cross = Seq((20L, 2L), (20L, 6L), (23L, 9L)).toDF("id_batch", "id_corpus")
    val got = Dedup.clusterDelta(internal, cross, published).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the bridge: label 5's component now has minimum 1 — its survivor
    // (doc 5) is evicted; every batch member of the merged component drops
    assert(got(5L) == 1L, "the losing published survivor must be relabeled")
    assert(got(20L) == 1L)
    // pairless published doc: self-label coalesced, batch member drops
    assert(got(23L) == 9L && got(9L) == 9L)
    // pure-batch component: min-id batch survivor
    assert(got(21L) == 21L && got(22L) == 21L)
    // one-shot union equivalence on the same graph (published edges
    // restored): identical labels for every batch id and published label
    val union = Dedup.clusters(
      Seq((1L, 2L), (5L, 6L), (20L, 2L), (20L, 6L), (21L, 22L), (23L, 9L))
        .toDF("id_a", "id_b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { case (id, lab) =>
      assert(union.getOrElse(id, id) == lab, s"node $id: delta=$lab union=${union.get(id)}")
    }
  }

  test("connected components: string labels use UTF-8 binary order on BOTH paths (supplementary plane)") {
    // U+10000 ("𐀀") sorts BELOW U+FFFF in Java's UTF-16
    // code-unit order but ABOVE it in UTF-8 binary order (F0.. > EF..),
    // which is what Spark's least/min uses — a UTF-16 comparator in the
    // union-find finish would make the cluster label depend on which
    // path ran (the budget, not the data)
    val supp = new String(Character.toChars(0x10000)) // "𐀀"
    val bmp = "\uFFFF"
    assert(supp.compareTo(bmp) < 0, "precondition: UTF-16 order disagrees with UTF-8 here")
    val edges = Seq((supp, bmp), ("aa", "ab")).toDF("id_a", "id_b")
    val viaUf = Dedup.clusters(edges).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    spark.conf.set("spark.graft.dedup.ccDriverEdges", "0")
    val viaStar =
      try Dedup.clusters(edges).collect().map(r => r.getString(0) -> r.getString(1)).toMap
      finally spark.conf.unset("spark.graft.dedup.ccDriverEdges")
    assert(viaUf == viaStar, "labels must not depend on which CC path the edge budget picked")
    assert(viaUf(supp) == bmp && viaUf(bmp) == bmp,
      s"component min must be UTF-8 order (expected U+FFFF, got ${viaUf(supp).codePointAt(0)})")
    assert(viaUf("ab") == "aa")
  }

  test("neardup scrub: keeps min-id survivor per cluster plus all uniques, full rows") {
    val docs = Tables.documents(spark, sfDir)
    val kept = Dedup.neardupScrub(docs, "doc_id", "text",
      shingleN = 3, k = 64, bands = 32, threshold = 0.5)
    // survivors = corpus minus non-canonical cluster members, computed
    // independently from the same pair graph
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text",
      shingleN = 3, k = 64, bands = 32, threshold = 0.5)
    val nonCanon = Dedup.clusters(pairs).collect()
      .collect { case r if r.getLong(0) != r.getLong(1) => r.getLong(0) }.toSet
    assert(nonCanon.nonEmpty, "fixture must contain planted near-dups")
    val keptIds = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val allIds = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptIds == allIds -- nonCanon)
    // rows survive intact: schema unchanged, spot-check a survivor's text
    assert(kept.schema == docs.schema)
  }

  test("connected components: refuses to return partially-merged labels at maxIters") {
    // a path graph of diameter 9 needs ~9 rounds; capping at 3 must
    // throw, not hand back one cluster silently split into several.
    // ccDriverEdges=0 forces the DISTRIBUTED contraction — the budget-
    // gated union-find finish would otherwise label this tiny graph in
    // one collect and never iterate
    val chain = (1L until 10L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    spark.conf.set("spark.graft.dedup.ccDriverEdges", "0")
    try {
      val e = intercept[IllegalStateException] { Dedup.clusters(chain, maxIters = 3) }
      assert(e.getMessage.contains("did not converge"))
      // with enough rounds the same chain converges to the min id
      val got = Dedup.clusters(chain, maxIters = 20).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.values.toSet == Set(1L) && got.size == 10)
    } finally spark.conf.unset("spark.graft.dedup.ccDriverEdges")
    // the union-find finish labels the same chain identically
    val uf = Dedup.clusters(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(uf.values.toSet == Set(1L) && uf.size == 10)
  }

  test("minhash broadcast cutoff follows spark.sql.autoBroadcastJoinThreshold (branch flip, identical pairs)") {
    val docs = Tables.documents(spark, sfDir)
    def pairs() = Dedup.minhashLsh(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // sf0.001 signature table is ~tens of KB — well under the 512 MB
    // default, so the default run takes the broadcast map-side-kill branch
    val viaBroadcast = pairs()
    try {
      // 0-byte budget disables the sig broadcast -> the dedup-first branch
      spark.conf.set("spark.graft.dedup.sigBroadcastBytes", "0")
      val viaShuffle = pairs()
      assert(viaShuffle == viaBroadcast,
        "both sides of the sig-broadcast cutoff must emit identical verified pairs")
    } finally spark.conf.unset("spark.graft.dedup.sigBroadcastBytes")
    // explicit knob overrides the conf in the other direction
    val viaParam = Dedup.minhashLsh(docs, "doc_id", "text", sigBroadcastBytes = 0L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaParam == viaBroadcast)
  }

  test("shuffled fallback fails fast past the local shuffle ceiling, naming the knobs") {
    val docs = Tables.documents(spark, sfDir)
    try {
      // force the fallback branch, then make the local-disk ceiling
      // impossible to satisfy — the operator must refuse BEFORE the
      // pair shuffle runs, not fill the disk and die downstream
      spark.conf.set("spark.graft.dedup.fallbackShuffleBytes", "1")
      val e = intercept[IllegalStateException] {
        Dedup.minhashLsh(docs, "doc_id", "text", sigBroadcastBytes = 0L)
      }
      assert(e.getMessage.contains("sigBroadcastBytes") &&
        e.getMessage.contains("fallbackShuffleBytes"),
        s"error must name both recourse knobs, got: ${e.getMessage}")
      // 0 disables the ceiling: same forced fallback now runs
      spark.conf.set("spark.graft.dedup.fallbackShuffleBytes", "0")
      assert(Dedup.minhashLsh(docs, "doc_id", "text", sigBroadcastBytes = 0L)
        .collect().nonEmpty)
    } finally spark.conf.unset("spark.graft.dedup.fallbackShuffleBytes")
  }

  test("e03 construction launches no Spark job (bucket width from scan metadata)") {
    // first-ever read of a path pays one schema-inference job (memoized
    // in Tables); warm it so the measurement isolates e03's construction
    Tables.embeddings(spark, sfDir)
    val tracker = spark.sparkContext.statusTracker
    val before = tracker.getJobIdsForGroup(null).length
    val df = queries.PipelineQueries.all.find(_.name == "e03_embedding_neardup").get
      .run(spark, sfDir)
    val after = tracker.getJobIdsForGroup(null).length
    assert(after == before,
      s"embeddingNearDup auto-sizing must not run a job at construction time (saw ${after - before})")
    // the derived width must equal the explicit metadata-count sizing
    val n = Tables.embeddings(spark, sfDir).count()
    assert(graft.sources.ScanStats
      .exactRowCountNoJob(Tables.embeddings(spark, sfDir)).contains(n))
    assert(df.count() > 0) // plan still executes green
  }

  test("maxLongNoJob: footer-stats max equals the aggregate, None when not derivable") {
    val docs = Tables.documents(spark, sfDir)
    val agg = docs.agg(org.apache.spark.sql.functions.max(col("doc_id")))
      .collect()(0).getLong(0)
    assert(graft.sources.ScanStats.maxLongNoJob(docs, "doc_id").contains(agg))
    // a filter changes which rows exist — stats over the unfiltered files
    // must NOT be trusted for it
    assert(graft.sources.ScanStats
      .maxLongNoJob(docs.filter(col("doc_id") % 2 === 0), "doc_id").isEmpty)
    // absent column, non-INT64 column: both decline
    assert(graft.sources.ScanStats.maxLongNoJob(docs, "no_such_col").isEmpty)
    assert(graft.sources.ScanStats.maxLongNoJob(docs, "text").isEmpty)
  }

  test("md5GramHexes: compiled kernel ≡ the md5(concat_ws(slice)) HOF, bit for bit") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), Text.tokens(col("text")).as("a"))
    def viaKernel(k: Int) = docs
      .select(col("doc_id"),
        org.apache.spark.sql.graft.TextExpr.md5GramHexes(col("a"), k).as("hs"))
    def viaHof(k: Int) = docs
      .select(col("doc_id"),
        when(size(col("a")) >= k,
          transform(sequence(lit(1), size(col("a")) - k + 1),
            i => md5(concat_ws(" ", slice(col("a"), i, lit(k))))))
          .otherwise(array().cast("array<string>")).as("hs"))
    Seq(3, 8).foreach { k =>
      val a = viaKernel(k).collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val b = viaHof(k).collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      assert(a == b, s"k=$k")
    }
    // null tokens take the concat_ws null-skip fallback — same strings
    val withNull = spark.sql(
      "SELECT array('a', CAST(NULL AS STRING), 'b', 'c') AS a")
    val kr = withNull.select(org.apache.spark.sql.graft.TextExpr.md5GramHexes(col("a"), 2))
      .collect()(0).getSeq[String](0)
    val hf = withNull.select(
      transform(sequence(lit(1), size(col("a")) - 1),
        i => md5(concat_ws(" ", slice(col("a"), i, lit(2))))))
      .collect()(0).getSeq[String](0)
    assert(kr == hf)
  }

  test("maxLongNoJob: aliasing Projects resolve to the PHYSICAL column or decline") {
    val em = Tables.embeddings(spark, sfDir)
    val aggVec = em.agg(org.apache.spark.sql.functions.max(col("vec_id")))
      .collect()(0).getLong(0)
    // a rename must follow the alias chain to the renamed column's stats
    // — asking for "doc_id" here must answer with vec_id's max, never a
    // physical doc_id's (the r21 verdict's rename hazard)
    assert(graft.sources.ScanStats
      .maxLongNoJob(em.select(col("vec_id").as("doc_id")), "doc_id").contains(aggVec))
    // a COMPUTED column has no footer stats — decline, never guess
    assert(graft.sources.ScanStats
      .maxLongNoJob(em.select((col("vec_id") + 1).as("doc_id")), "doc_id").isEmpty)
    // the hazard case in one file: documents holds a physical doc_id;
    // select ANOTHER long column AS doc_id — the answer must be the
    // aliased column's stats, never the physical doc_id's
    val docs = Tables.documents(spark, sfDir)
    val aggChars = docs.agg(org.apache.spark.sql.functions.max(col("n_chars")))
      .collect()(0).getLong(0)
    graft.sources.ScanStats
      .maxLongNoJob(docs.select(col("n_chars").as("doc_id")), "doc_id") match {
      case Some(m) => assert(m == aggChars, "must read n_chars' stats, not doc_id's")
      case None => // a stats-less fixture may decline — but it must not misread
    }
  }

  test("non-metadata-derivable input requires explicit nBits") {
    val em = Tables.embeddings(spark, sfDir).filter(col("vec_id") % 2 === 0)
    val err = intercept[IllegalArgumentException] {
      Dedup.embeddingNearDup(em, "vec_id", "embedding")
    }
    assert(err.getMessage.contains("nBits"))
    // and the explicit path still works on the same input
    assert(Dedup.embeddingNearDup(em, "vec_id", "embedding",
      nBits = graft.operators.Dedup.autoBits(100)).columns.sameElements(Seq("id_a", "id_b", "cosine")))
  }

  test("minhash LSH is deterministic across runs") {
    val docs = Tables.documents(spark, sfDir)
    def run() = Dedup.minhashLsh(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(run() == run())
  }

  test("semantic scrub (d26): every planted jitter copy removed, every original survives") {
    val survivors = SparkEntry.queries("d26_semantic_scrub")(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    val originals = Tables.embeddings(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(survivors == originals,
      "the min-id survivor of each (original, original+1e6) cluster is the original")
  }
}
