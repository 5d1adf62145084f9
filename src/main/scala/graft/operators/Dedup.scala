package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Deduplication operators for large text corpora (the LLM-pipeline tier).
  *
  * Scale design: every variant is a shuffle-on-key plan — hash-group for
  * exact, band-bucket join for MinHash-LSH, chunk join for SimHash. None
  * cross-joins the corpus; candidate generation is O(n · bands) rows
  * shuffled, verification touches candidate pairs only. At 100 TB the
  * shuffle keys (text hash / band hash / chunk) stay well distributed:
  * hot buckets only arise from pathological boilerplate, which AQE skew
  * splitting absorbs.
  */
object Dedup {

  /** The broadcast budget a session can actually honor: a broadcast is
    * COLLECTED to the driver first, so any budget above
    * `spark.driver.maxResultSize` (default 1g; 0 = unlimited) would die
    * with "Tasks result size has exceeded maxResultSize" instead of
    * degrading — measured at the 1000× stress tier (5 M docs, 2.7 GB
    * sig table vs the 1 GB default). The budget is ALSO clamped to a
    * third of the driver's actual heap: maxResultSize is a conf, not a
    * capacity — a 4 GB result-size ceiling on a 2 GB-heap driver would
    * pass the conf check and then die in collect with OutOfMemoryError
    * (the collect holds serialized task results AND the deserialized
    * relation simultaneously, so 1/3 leaves honest headroom). Clamping
    * keeps the documented fallback (dedup-first, shuffled sig joins)
    * the worst case at every scale and every heap size.
    */
  /** Budget confs accept Spark size strings ("4g", "512m") as well as
    * raw byte counts — a "4g" that silently failed to parse would strand
    * an operator on its fallback path with no indication why.
    */
  private[graft] def parseBytes(s: String): Long =
    org.apache.spark.network.util.JavaUtils.byteStringAsBytes(s)

  private[graft] def clampToDriverLimit(
      spark: org.apache.spark.sql.SparkSession, budget: Long): Long = {
    val maxResult = org.apache.spark.network.util.JavaUtils
      .byteStringAsBytes(spark.conf.get("spark.driver.maxResultSize", "1g"))
    val heapRoom = Runtime.getRuntime.maxMemory() / 3
    val ceiling = if (maxResult <= 0) heapRoom else math.min(maxResult, heapRoom)
    math.min(budget, ceiling)
  }

  /** The session's dedup broadcast budget (`spark.graft.dedup
    * .sigBroadcastBytes`, default 512 MB), clamped to what the driver
    * can actually collect — the single knob every sig/sketch broadcast
    * decision in this tier reads.
    */
  private[graft] def sigBroadcastBudget(spark: org.apache.spark.sql.SparkSession): Long =
    clampToDriverLimit(spark,
      spark.conf
        .getOption("spark.graft.dedup.sigBroadcastBytes")
        .map(parseBytes)
        .getOrElse(512L * 1024 * 1024))

  /** Whether a published signature store ((id, sig) rows, the
    * [[signatures]] contract) fits the dedup broadcast budget — the
    * decision that lets ingest screens cache the NARROW band index
    * (16 B/band row) and re-attach sig payloads map-side from a
    * broadcast of the store. The per-row weight is derived from the
    * STORE ITSELF (first row's signature length), not a hardcoded k:
    * the signature scheme is otherwise carried only by the caller's
    * sigFormat fingerprint string, and a scheme change would silently
    * under/over-size a hardcoded estimate. Empty stores trivially fit;
    * comparison is by DIVISION (the embeddingNearDup overflow
    * convention).
    */
  def sigStoreFitsBroadcast(sigs: DataFrame): Boolean = {
    val budget = sigBroadcastBudget(sigs.sparkSession)
    sigs.select(size(col("sig")).as("k")).head(1).headOption.forall { r =>
      val perRow = r.getInt(0) * 8L + 16L
      sigs.count() <= budget / perRow
    }
  }

  /** Exact dedup on a key expression (default: the full text). Keeps the
    * smallest id per group — deterministic winner, unlike dropDuplicates
    * (whose survivor is partition-order dependent).
    */
  def exact(docs: DataFrame, idCol: String, keyCol: Column): DataFrame =
    docs
      .groupBy(keyCol.as("dedup_key"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** The duplicated-fingerprint set shared by [[chunkDedup]] and
    * [[chunkScrub]]: distinct md5 fingerprints occurring ≥ 2 times
    * anywhere in the corpus, cached (it is narrow — 32 hex chars per
    * DISTINCT hot value, however many million rows repeat it) and
    * wrapped in `broadcast()` when its measured payload fits the
    * dedup broadcast budget (`spark.graft.dedup.sigBroadcastBytes`,
    * clamped to the driver's collect ceiling). Past the budget the
    * caller's join degrades to a shuffle on h, where AQE skew
    * splitting absorbs hot fingerprints — the probe rows for one hot
    * h land in one partition, but each build row is unique, so the
    * split replicates a single narrow row.
    *
    * The frequency pass itself is a `groupBy(h)` — map-side
    * combinable, so a fingerprint repeated a million times collapses
    * to one (h, count) row per map partition before the (tiny)
    * exchange. This deliberately replaces a
    * `count() over (partition by h)` window, which shuffles every
    * full chunk row and serializes ALL occurrences of a hot
    * fingerprint through one task: the 1000× stress (5 M docs,
    * boilerplate-heavy fixture) measured the window at 65.9×/decade
    * (192 s) vs linear for this shape. The price is that the caller's
    * pure-map chunk subplan is derived twice (once feeding the
    * frequency pass, once feeding the join-back) — recomputing a
    * compiled map kernel beats both caching a corpus-scale
    * intermediate and the skewed full-width window exchange.
    */
  private def duplicatedFingerprints(chunks: DataFrame, keyBytes: Long = 32L): DataFrame = {
    val spark = chunks.sparkSession
    // eager localCheckpoint, NOT cache(): it materializes once for the
    // sizing count + the join reuse like a cache would, but its blocks
    // are released by the ContextCleaner when the result goes out of
    // scope — a cache() here would pin one relation in executor
    // storage per chunkDedup/chunkScrub call for the whole session
    // (CacheManager entries are never auto-evicted)
    val dup = chunks
      .groupBy(col("h"))
      .agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") >= 2)
      .select(col("h"))
      .localCheckpoint(true)
    val budget = clampToDriverLimit(spark,
      spark.conf
        .getOption("spark.graft.dedup.sigBroadcastBytes")
        .map(parseBytes)
        .getOrElse(512L * 1024 * 1024))
    // key payload (32 hex chars UTF-8 for md5, 8 for a long) + per-row
    // overhead, same accounting as the sig budget; the checkpoint above
    // already materialized the set
    val nDup = dup.count()
    if (nDup * (keyBytes + 48L) <= budget) broadcast(dup) else dup
  }

  /** Chunk-level dedup signals (the paragraph-dedup pass of CCNet-style
    * pipelines, over fixed token windows since the corpus has no
    * structural separators): each doc is cut into non-overlapping
    * `chunkTokens`-token chunks; a chunk is DUPLICATED when its md5
    * fingerprint occurs ≥ 2 times anywhere in the corpus (within-doc
    * repeats count — they are boilerplate too). Returns every doc with
    * its chunk count, duplicated-chunk count, and duplicated fraction.
    *
    * Scale design: chunking is pure map (compiled tokenization + a
    * per-doc transform) on the full 128-bit md5 fingerprint
    * (collision-free at any corpus size, unlike a 64-bit truncation
    * whose birthday bound is reached by ~10^10 chunks). The corpus
    * frequency pass and its skew story live in
    * [[duplicatedFingerprints]]; the mark join is map-side under the
    * broadcast budget, and both rollups (frequency, per-doc) are
    * map-side combinable — no full-width skewed exchange anywhere.
    */
  def chunkDedup(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int = 16
  ): DataFrame = {
    val chunks = docs
      .select(
        col(idCol).as("doc_id"),
        explode(Text.chunks(Text.tokens(col(textCol)), chunkTokens)).as("chunk")
      )
      .select(col("doc_id"), md5(col("chunk")).as("h"))
    val dup = duplicatedFingerprints(chunks).withColumn("dup", lit(1))
    val perDoc = chunks
      .join(dup, Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("dup") === 1, 1L).otherwise(0L)).as("n_chunks_dupliques")
      )
    docs
      .select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        coalesce(col("n_chunks_dupliques"), lit(0L)).as("n_chunks_dupliques"),
        round(
          coalesce(col("n_chunks_dupliques"), lit(0L)).cast("double") /
            greatest(coalesce(col("n_chunks"), lit(0L)), lit(1L)).cast("double"),
          6
        ).as("ratio_duplique")
      )
  }

  /** The APPLY side of [[chunkDedup]]: rebuild each document keeping
    * only the chunks whose corpus-wide fingerprint count is 1 — the
    * CCNet-style duplicated-paragraph scrub. Output per doc: the
    * scrubbed text (kept full chunks, original order, space-joined —
    * the trailing partial chunk is dropped with the same full-chunks
    * contract as [[chunkDedup]]) and the kept-chunk count; fully
    * boilerplate or sub-width docs scrub to the empty string.
    *
    * Scale design: the corpus frequency pass and its skew story live
    * in [[duplicatedFingerprints]] (map-side-combinable groupBy, never
    * a fingerprint window); boilerplate chunks die in a map-side
    * anti join under the broadcast budget, so the per-doc rollup
    * carries chunk text only for SURVIVING chunks, and order is
    * restored in-row (array_sort over (pos, chunk) structs) — no sort
    * of the corpus ever happens. A 100 TB scrub moves each kept chunk
    * through exactly one exchange (the rollup).
    */
  def chunkScrub(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int = 16
  ): DataFrame = {
    val chunks = docs
      .select(
        col(idCol).as("doc_id"),
        posexplode(Text.chunks(Text.tokens(col(textCol)), chunkTokens)).as(Seq("pos", "chunk"))
      )
      .select(col("doc_id"), col("pos"), col("chunk"), md5(col("chunk")).as("h"))
    val kept = chunks
      .join(duplicatedFingerprints(chunks.select(col("h"))), Seq("h"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_chunks_gardes"),
        concat_ws(" ",
          transform(
            array_sort(collect_list(struct(col("pos"), col("chunk")))),
            x => x.getField("chunk"))
        ).as("texte_nettoye")
      )
    docs
      .select(col(idCol).as("doc_id"))
      .join(kept, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("texte_nettoye"), lit("")).as("texte_nettoye"),
        coalesce(col("n_chunks_gardes"), lit(0L)).as("n_chunks_gardes")
      )
  }

  /** Exact duplicated-SPAN detection over SLIDING token grams — the
    * "exact substring dedup" stage of pretraining pipelines (suffix-
    * array-style: any ≥ `gramTokens`-token run occurring twice anywhere
    * in the corpus, within-doc repeats included). Distinct from
    * [[chunkDedup]]: fixed non-overlapping chunks miss duplicated runs
    * that straddle a chunk boundary; the sliding gram catches every
    * aligned-or-not repetition of at least gram width, and overlapping
    * /adjacent duplicated grams merge into MAXIMAL spans (gaps-and-
    * islands over hit positions).
    *
    * Output per doc: token count, merged duplicated-span count, tokens
    * covered by duplicated spans, and the covered fraction.
    *
    * Scale design: gram fingerprinting is a pure map (positions via an
    * in-row transform; only (doc_id, pos, md5) ever shuffles — 128-bit
    * fingerprints, collision-free at any corpus size, the text itself
    * never moves). The corpus frequency pass and the broadcast-vs-
    * shuffle mark join share [[duplicatedFingerprints]] with the chunk
    * operators. The island merge windows over HIT positions only —
    * rows ∝ duplicated grams, not the corpus — partitioned by doc_id
    * (no global sort, no skew beyond a single document's own length).
    */
  /** The shared tokenized base of the span operators: (doc_id, a). */
  private def tokenBase(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), Text.tokens(col(textCol)).as("a"))

  /** Sliding k-gram fingerprint rows (doc_id, pos, h) over a tokenized
    * base — pure map (positions via an in-row transform; only the
    * fingerprint ever shuffles, never text). `exactFingerprints` picks
    * the key: full 128-bit md5 (collision-free at any corpus size,
    * cross-engine verifiable — the gated config) vs xxhash64 (8-byte
    * long keys — ~4× less key weight through the frequency exchange,
    * the hottest shuffle of the span operators; the d05 md5-gated /
    * xxhash64-production precedent. A collision manufactures a false
    * duplicated span; birthday-bounded ≈ m²/2⁶⁵ ≈ 0.2% TOTAL across
    * 3·10⁸ grams, each mislabeling one k-token window — the standard
    * production trade).
    */
  private def slidingGrams(base: DataFrame, k: Int, exactFingerprints: Boolean): DataFrame = {
    if (!exactFingerprints) {
      // compiled per-position fingerprint loop (GramHashes) — the
      // interpreted transform(sequence(...)) HOF it replaces rebuilt a
      // string and evaluated a lambda PER CORPUS GRAM, the dominant
      // cost of the span-scrub stage (identical hashes: xxhash64 seed
      // 42 over the space-joined window)
      base
        .where(size(col("a")) >= k)
        .select(col("doc_id"),
          posexplode(org.apache.spark.sql.graft.TextExpr.gramHashes(col("a"), k))
            .as(Seq("p0", "h")))
        .select(col("doc_id"), (col("p0") + 1).as("pos"), col("h"))
    } else
      // compiled per-position md5 loop (Md5GramHexes) — the interpreted
      // transform(sequence(...)) HOF it replaces rebuilt a string and
      // evaluated a lambda per corpus gram, the dominant in-task cost
      // of the exact-fingerprint span cells (identical lowercase hex:
      // md5 over the same space-joined window bytes)
      base
        .where(size(col("a")) >= k)
        .select(col("doc_id"),
          posexplode(org.apache.spark.sql.graft.TextExpr.md5GramHexes(col("a"), k))
            .as(Seq("p0", "h")))
        .select(col("doc_id"), (col("p0") + 1).as("pos"), col("h"))
  }

  /** Gaps-and-islands merge of duplicated-gram HIT positions into
    * maximal spans (doc_id, island, s, e). Windows over hits only —
    * rows ∝ duplicated grams, not the corpus — partitioned by doc_id.
    */
  private def mergeSpans(hits: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val prev = lag(col("pos"), 1).over(w)
    // same island while the next gram starts inside-or-adjacent to the
    // running span (pos ≤ prev + k); strictly past it starts a new one
    hits
      .withColumn("brk", when(prev.isNull || col("pos") > prev + k, 1).otherwise(0))
      .withColumn("island", sum(col("brk")).over(w))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + k - 1).as("e"))
  }

  def spanDedup(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      gramTokens: Int = 8,
      exactFingerprints: Boolean = true
  ): DataFrame =
    spanDedupTokens(tokenBase(docs, idCol, textCol), "doc_id", "a", gramTokens, exactFingerprints)

  /** [[spanDedup]] over a PRE-TOKENIZED relation (idCol, tokensCol) —
    * the composition entry point: a pipeline that also trains/scores an
    * LM or packs sequences tokenizes the corpus ONCE and feeds the same
    * relation everywhere (p02 measured ~4 independent tokenizations
    * before this split; see LangModel's token-relation twins).
    */
  def spanDedupTokens(
      toks: DataFrame,
      idCol: String,
      tokensCol: String,
      gramTokens: Int = 8,
      exactFingerprints: Boolean = true
  ): DataFrame = {
    val k = gramTokens
    val base = toks.select(col(idCol).as("doc_id"), col(tokensCol).as("a"))
    val grams = slidingGrams(base, k, exactFingerprints)
    val keyBytes = if (exactFingerprints) 32L else 8L
    val hits = grams
      .join(
        duplicatedFingerprints(grams.select(col("h")), keyBytes).withColumn("dup", lit(1)),
        Seq("h"))
      .select(col("doc_id"), col("pos"))
    val perDoc = mergeSpans(hits, k)
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(col("e") - col("s") + 1).as("dup_tokens")
      )
    base
      .select(col("doc_id"), size(col("a")).cast("long").as("n_tokens"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        round(
          coalesce(col("dup_tokens"), lit(0L)).cast("double") /
            greatest(col("n_tokens"), lit(1L)).cast("double"),
          6
        ).as("ratio_duplique")
      )
  }

  /** The duplicated-gram set WITH its survivor: fingerprints occurring
    * ≥ 2 times anywhere, each carrying the global FIRST occurrence
    * (lexicographic min over (doc_id, pos) — deterministic, engine-
    * agnostic). Same map-side-combinable groupBy + budgeted-broadcast
    * contract as [[duplicatedFingerprints]]; the payload is three
    * narrow columns per DISTINCT duplicated fingerprint.
    */
  /** `maxRowsHint`: a caller-known upper bound on the duplicated-gram
    * count (e.g. the batch's distinct-key count in the incremental span
    * screen — dup keys ⊆ batch keys). When ≥ 0 and within budget, the
    * broadcast decision needs no counting job at all; otherwise the
    * relation is counted (cache + count — one materializing job).
    */
  private def duplicatedFirstOccurrences(
      grams: DataFrame, keyBytes: Long, maxRowsHint: Long = -1L): DataFrame = {
    val spark = grams.sparkSession
    val dup = grams
      .groupBy(col("h"))
      .agg(
        count(lit(1)).as("n_occ"),
        min(struct(col("doc_id"), col("pos"))).as("f"))
      .filter(col("n_occ") >= 2)
      .select(
        col("h"),
        col("f").getField("doc_id").as("first_doc"),
        col("f").getField("pos").as("first_pos"))
    val budget = clampToDriverLimit(spark,
      spark.conf
        .getOption("spark.graft.dedup.sigBroadcastBytes")
        .map(parseBytes)
        .getOrElse(512L * 1024 * 1024))
    def fits(n: Long) = n * (keyBytes + 12L + 48L) <= budget
    if (maxRowsHint >= 0L && fits(maxRowsHint)) broadcast(dup)
    else {
      val mat = dup.localCheckpoint(false) // counted next — one job, cleaner-managed
      if (fits(mat.count())) broadcast(mat) else mat
    }
  }

  /** The APPLY side of [[spanDedup]] — ExactSubstr-style duplicated-span
    * REMOVAL: rebuild each document with every corpus-duplicated span
    * scrubbed, keeping ONE survivor occurrence per gram (the global
    * first occurrence in (doc_id, pos) order — deterministic, so the
    * duplicated content survives exactly once in the corpus instead of
    * vanishing entirely). A gram occurrence is a removal hit iff its
    * fingerprint occurs ≥ 2 times corpus-wide AND this occurrence is
    * not the survivor; hits merge into maximal spans (the d30 islands)
    * and every token covered by a span is dropped. Unlike
    * [[chunkScrub]]'s fixed 16-token chunks, this removes duplicated
    * runs at ANY offset — the unaligned-boilerplate case chunk-grain
    * scrubbing misses. Sub-width and unique docs keep their full
    * (whitespace-normalized) text.
    *
    * Output per doc: (doc_id, texte_nettoye, n_tokens_gardes); a fully
    * duplicated non-survivor doc scrubs to the empty string.
    *
    * Scale shape: gram fingerprinting is pure map; the survivor pass is
    * the same map-side-combinable groupBy(h) as every span/chunk
    * operator (min(struct) combines partially — no (h)-keyed window,
    * no per-occurrence serialization of hot boilerplate); the mark join
    * is map-side under the broadcast budget; islands window over HITS
    * only. The rebuild joins the tokenized corpus LEFT to the per-doc
    * span lists — the span side is ∝ duplicated docs and narrow, so AQE
    * broadcasts it at low dup rates and the corpus is never shuffled at
    * all; the token drop itself is in-row (filter over merged DISJOINT
    * spans, O(tokens · spans/doc) with spans/doc ≤ tokens/k).
    */
  def spanScrub(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      gramTokens: Int = 8,
      exactFingerprints: Boolean = true
  ): DataFrame =
    spanScrubTokens(tokenBase(docs, idCol, textCol), "doc_id", "a", gramTokens, exactFingerprints)
      .select(
        col("doc_id"),
        concat_ws(" ", col("jetons_gardes")).as("texte_nettoye"),
        col("n_tokens_gardes"))

  /** [[spanScrub]] over a PRE-TOKENIZED relation (idCol, tokensCol) —
    * the composition entry point, [[spanDedupTokens]]' apply-side twin:
    * a pipeline that scrubs and then screens/scores/packs tokenizes the
    * corpus ONCE and keeps working in token space. Returns the KEPT
    * TOKEN ARRAY (`jetons_gardes`) instead of re-concatenated text so
    * downstream stages (p03's near-dup screen, budget select, packing)
    * never re-tokenize; [[spanScrub]] is exactly this plus one
    * concat_ws. Same plan shape as [[spanScrub]] (one Generate over the
    * corpus, map-side-combinable survivor pass, islands over hits only).
    */
  def spanScrubTokens(
      toks: DataFrame,
      idCol: String,
      tokensCol: String,
      gramTokens: Int = 8,
      exactFingerprints: Boolean = true
  ): DataFrame = {
    val k = gramTokens
    val base = toks.select(col(idCol).as("doc_id"), col(tokensCol).as("a"))
    val grams = slidingGrams(base, k, exactFingerprints)
    val keyBytes = if (exactFingerprints) 32L else 8L
    val hits = grams
      .join(duplicatedFirstOccurrences(grams, keyBytes), Seq("h"))
      .filter(!(col("doc_id") === col("first_doc") && col("pos") === col("first_pos")))
      .select(col("doc_id"), col("pos"))
    applySpanRemoval(base, hits, k)
  }

  /** Shared rebuild tail of the span scrubs: merge hit positions into
    * maximal spans and drop every covered token. Hits-only windows,
    * corpus left-joined to the (∝ duplicated docs) span lists.
    */
  private def applySpanRemoval(base: DataFrame, hits: DataFrame, k: Int): DataFrame = {
    val spanLists = mergeSpans(hits, k)
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("s"), col("e"))).as("spans"))
    base
      .join(spanLists, Seq("doc_id"), "left")
      .withColumn(
        "kept",
        when(col("spans").isNull, col("a"))
          .otherwise(filter(col("a"), (_, i) =>
            !exists(col("spans"), sp =>
              (i + 1) >= sp.getField("s") && (i + 1) <= sp.getField("e")))))
      .select(
        col("doc_id"),
        col("kept").as("jetons_gardes"),
        size(col("kept")).cast("long").as("n_tokens_gardes"))
  }

  /** The published gram-fingerprint store for the INCREMENTAL span
    * screen ([[spanScrubTokensAgainst]]): the distinct sliding-gram
    * fingerprints of the corpus AS THE SPAN SCRUB SAW IT (its input
    * token arrays, BEFORE its own removals — a later batch occurrence
    * of any gram the corpus ever contained is a non-first occurrence,
    * whether or not the corpus kept it). Computed once when the corpus
    * is published, persisted columnar (8 B/gram on the xxhash64 fast
    * path) — the [[signatures]] contract applied to span grams.
    */
  def spanGramStore(
      toks: DataFrame,
      idCol: String,
      tokensCol: String,
      gramTokens: Int = 8,
      exactFingerprints: Boolean = true
  ): DataFrame =
    slidingGrams(
      toks.select(col(idCol).as("doc_id"), col(tokensCol).as("a")),
      gramTokens, exactFingerprints)
      .select(col("h"))
      .distinct()

  /** Incremental span scrub: scrub an ARRIVING batch against a
    * published corpus gram store ([[spanGramStore]]) — the 100 TB
    * ingestion shape of [[spanScrubTokens]], where the standing corpus
    * is never re-read. EXACTLY equals the one-shot
    * `spanScrubTokens(corpus ∪ batch)` restricted to batch rows,
    * PROVIDED every batch id orders after every corpus id (the
    * append-only id contract): the one-shot's global first occurrence
    * of any gram the corpus contains lies in the corpus, so every
    * batch occurrence of a stored gram is a hit; grams the corpus has
    * never seen resolve first-occurrence WITHIN the batch. (Corpus
    * rows are invariant under the union by the same ordering argument
    * — a batch can never steal a first occurrence.) DedupSpec pins the
    * equality on a split corpus.
    *
    * Scale shape: the batch is the small side by contract. Its
    * distinct gram keys broadcast INTO one map-side scan of the store
    * (the store — corpus-scale — is never shuffled and never carries
    * more than the batch-bounded intersection out); everything else is
    * the batch-scale [[spanScrubTokens]] machinery. Past the broadcast
    * budget the probe degrades to a shuffled semi-join — the honest
    * giant-batch behavior.
    */
  def spanScrubTokensAgainst(
      batchToks: DataFrame,
      idCol: String,
      tokensCol: String,
      storeGrams: DataFrame,
      gramTokens: Int = 8,
      exactFingerprints: Boolean = true
  ): DataFrame = {
    val k = gramTokens
    val spark = batchToks.sparkSession
    val base = batchToks.select(col(idCol).as("doc_id"), col(tokensCol).as("a"))
    val keyBytes = if (exactFingerprints) 32L else 8L
    // batch grams feed three consumers (key build, store-hit probe,
    // fresh-gram dedup) — materialized once, batch-scale rows only.
    // LAZY checkpoints + one count: one job materializes the gram
    // blocks AND the key blocks AND yields the budget-gate cardinality,
    // where the eager-checkpoint pattern paid a separate job per frame
    // (the p06 job-floor lesson: at batch scale every extra action is
    // pure scheduling floor); blocks stay ContextCleaner-managed, so a
    // per-trigger caller leaks nothing (no CacheManager pin)
    val grams = slidingGrams(base, k, exactFingerprints).localCheckpoint(false)
    val batchKeys = grams.select(col("h")).distinct().localCheckpoint(false)
    val nKeys = batchKeys.count()
    val budget = sigBroadcastBudget(spark)
    val keysFit = nKeys * (keyBytes + 48L) <= budget
    // the store∩batch intersection: ≤ batch keys rows either way, so the
    // batch-key budget check covers it — no second count job, and the
    // corpus-scale store scan happens ONCE inside the first consumer's
    // job (the cache serves the other two consumers). Past the budget
    // the whole screen is already on the honest shuffled-join path.
    val present = storeGrams
      .select(col(storeGrams.columns.head).as("h"))
      .join(if (keysFit) broadcast(batchKeys) else batchKeys, Seq("h"), "left_semi")
      .localCheckpoint(false)
    val presentSide = if (keysFit) broadcast(present) else present
    // every batch occurrence of a stored gram is a hit; fresh grams
    // resolve first-occurrence within the batch (the one-shot order)
    val storeHits = grams.join(presentSide, Seq("h"), "left_semi")
      .select(col("doc_id"), col("pos"))
    val fresh = grams.join(presentSide, Seq("h"), "left_anti")
    // dup keys ⊆ fresh keys ⊆ batch keys: nKeys (already counted for the
    // probe gate) bounds the dup relation, so no second counting job
    val internalHits = fresh
      .join(duplicatedFirstOccurrences(fresh, keyBytes, maxRowsHint = nKeys), Seq("h"))
      .filter(!(col("doc_id") === col("first_doc") && col("pos") === col("first_pos")))
      .select(col("doc_id"), col("pos"))
    applySpanRemoval(base, storeHits.unionByName(internalHits), k)
  }

  /** Intra-document repetition scrub — the APPLY side of the d19
    * Gopher repetition signals and the doc-scoped twin of [[spanScrub]]:
    * within each document, every k-token gram occurrence that repeats
    * an EARLIER same-document gram is dropped with its full window (the
    * first occurrence survives); the text is rebuilt from the kept
    * tokens. Collapses repeated runs (a phrase pasted 50 times keeps
    * one copy; a 20-token run of one word collapses to that word)
    * without touching cross-document content — the cleanup the
    * corpus-level span scrub deliberately leaves alone when a document
    * is globally unique.
    *
    * Scale shape: the ideal one — the entire operator is ONE compiled
    * per-row kernel (graft_repetition_scrub) inside WholeStageCodegen.
    * No exchange, no state, no model, no broadcast: at 100 TB this runs
    * at scan speed on every executor independently.
    */
  def repetitionScrub(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      gramTokens: Int = 8
  ): DataFrame =
    tokenBase(docs, idCol, textCol)
      .select(
        col("doc_id"),
        org.apache.spark.sql.graft.TextExpr
          .repetitionScrub(col("a"), gramTokens)
          .as("kept"))
      .select(
        col("doc_id"),
        concat_ws(" ", col("kept")).as("texte_nettoye"),
        size(col("kept")).cast("long").as("n_tokens_gardes"))

  /** MinHash + LSH near-duplicate pairs.
    *
    * shingle(n) → k-signature (custom MinHashSig expression, pure map) →
    * b bands of r = k/b rows → exploded band buckets → self equi-join on
    * (band, bucket hash) → signature-estimate prefilter (matching
    * signature components / k estimates Jaccard; candidates below
    * threshold − 3σ are dropped without touching text) → exact-Jaccard
    * verification ≥ threshold on the survivors' shingle sets.
    *
    * Probability a pair at Jaccard s becomes a candidate: 1-(1-s^r)^b;
    * defaults (k=64, b=32, r=2) catch s ≥ 0.5 with ≥ 99.99%. The 3σ
    * estimate margin (σ = sqrt(s(1-s)/k)) keeps prefilter false-drop
    * probability below 1e-3 at s = threshold and ~0 above it.
    *
    * `maxBucket` drops band buckets holding more than that many docs
    * from candidate generation. Mega-buckets arise when a corpus-hot
    * minimum shingle degenerates a band (boilerplate, tiny
    * vocabularies): one such bucket enumerates |bucket|²/2 pairs inside
    * ONE task — quadratic join output that AQE cannot split, and
    * essentially all of it fails verification. Recall cost is
    * negligible: a pair at J ≥ threshold+ε collides in ~b·J^r bands
    * (~8 of 32 at J = 0.5), and losing a pair requires EVERY one of
    * its colliding buckets to be degenerate — probability
    * (capped-fraction)^(b·J^r). The 512 default comes from the 100×
    * stress (500 k docs, adversarial 27-word vocab): enumeration cost
    * is bounded by cap·n·bands, and caps 4096/1024/512/256 measured
    * 206/38/28/30 s with IDENTICAL output (9999 pairs — 100 % planted
    * recall at every cap, all three tiers); 512 sits at the flat bottom
    * of that curve, and on boilerplate-light corpora the cap simply
    * never binds.
    *
    * `sigBroadcastBytes` bounds the signature-table broadcast that
    * enables the map-side estimate kill; < 0 (default) reads
    * `spark.graft.dedup.sigBroadcastBytes` (default 512 MB — covers
    * ~1 M docs at k = 64). This is deliberately NOT the generic
    * `spark.sql.autoBroadcastJoinThreshold`: that conf prices a
    * broadcast against a SHUFFLE OF THE SAME RELATION, while here the
    * broadcast replaces shuffling the raw band-pair relation, which is
    * orders of magnitude larger (measured on the adversarial 10× stress
    * fixture: a 27 MB sig broadcast vs 141 s through the shuffle path —
    * 10× the fast path; tying this to the 10 MB generic threshold
    * silently fell off the cliff at the second decade). Past the budget
    * the operator degrades to dedup-first + shuffled sig joins — the
    * honest behavior once the sig table outgrows executor memory.
    * Dedup-heavy pipelines on large
    * corpora should raise the conf (or pass the knob): the broadcast is
    * n·(8k+32) bytes and replaces shuffling the raw band-pair relation,
    * which is orders of magnitude larger on boilerplate-heavy data.
    */
  def minhashLsh(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      k: Int = 64,
      bands: Int = 32,
      threshold: Double = 0.5,
      maxBucket: Int = 512,
      sigBroadcastBytes: Long = -1L
  ): DataFrame =
    minhashLshTokens(
      docs.select(col(idCol), Text.tokens(col(textCol)).as("__graft_toks")),
      idCol, "__graft_toks", shingleN, k, bands, threshold, maxBucket, sigBroadcastBytes)

  /** [[minhashLsh]] over a PRE-TOKENIZED relation (idCol, tokensCol) —
    * the composition entry point (the spanDedupTokens / trainTokens
    * convention): a pipeline whose upstream stage already produced the
    * token arrays (p03's span scrub keeps the rebuilt corpus in token
    * space) feeds them straight in instead of re-joining the tokens
    * into a string for this operator to split again. Identical result:
    * `Text.tokens(concat_ws(" ", a)) == a` for any whitespace-free
    * token array, and every kernel here consumes tokens.
    */
  def minhashLshTokens(
      toks: DataFrame,
      idCol: String,
      tokensCol: String,
      shingleN: Int = 3,
      k: Int = 64,
      bands: Int = 32,
      threshold: Double = 0.5,
      maxBucket: Int = 512,
      sigBroadcastBytes: Long = -1L
  ): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    val docs = toks

    // Signatures via the MinHashSig custom expression: one pass per row,
    // shingle hashed once + k cheap long mixes. Pure map — NO shuffle for
    // signature computation at any corpus size. Cached: consumed by the
    // bucket self-join AND the two estimate-join sides (n·k·8 bytes; at
    // corpus sizes beyond memory this spills to disk and still beats
    // recomputation).
    val withSig = docs
      .select(
        col(idCol).as("doc_id"),
        org.apache.spark.sql.graft.TextExpr
          .minhashSig(col(tokensCol), shingleN, k)
          .as("sig")
      )
      .filter(col("sig").isNotNull)
      .cache()

    // banding runs once per corpus row — compiled MinHashBands, not an
    // interpreted transform(sequence(...)) lambda (bit-identical buckets)
    val buckets = withSig.select(
      col("doc_id"),
      explode(org.apache.spark.sql.graft.TextExpr.minhashBands(col("sig"), bands, r)).as("bb")
    )
    // the oversized-bucket list broadcasts UNGATED, on a counting
    // argument rather than a measured payload: |hot| is bounded by
    // n·bands/maxBucket (every member bucket holds > maxBucket docs),
    // and reaching even a 1 GB broadcast (~3·10^7 16-byte keys) needs
    // ~10^9 docs where EVERY band bucket sits exactly at the cap — a
    // corpus that degenerate signals maxBucket is far too low, not a
    // path to degrade silently. The sizing aggregation shuffles the
    // same narrow rows the self-join shuffles anyway.
    val hot = buckets
      .groupBy(col("bb"))
      .agg(count(lit(1)).as("m"))
      .filter(col("m") > maxBucket)
      .select("bb")
    val pruned = buckets.join(broadcast(hot), Seq("bb"), "left_anti")
    val l = pruned.select(col("doc_id").as("id_a"), col("bb"))
    val rr = pruned.select(col("doc_id").as("id_b"), col("bb"))
    val rawPairs = l
      .join(rr, Seq("bb"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")

    // Estimate prefilter: fraction of equal signature components is an
    // unbiased Jaccard estimator (σ = sqrt(j(1-j)/k)); band candidates
    // far below the threshold (r=2 lets j ≈ 0.1 noise through) die here
    // on cached 64-long arrays instead of reaching text verification.
    // est does not depend on pair multiplicity, so the kill commutes
    // with dedup — apply it on whichever side of the distinct is cheap.
    val sigma = math.sqrt(threshold * (1 - threshold) / k)
    val cut = math.max(0.0, threshold - 3 * sigma)
    val sigFor = (alias: String) =>
      withSig.select(col("doc_id").as(alias), col("sig").as(s"sig_$alias"))
    val est = org.apache.spark.sql.graft.TextExpr
      .sigMatchCount(col("sig_id_a"), col("sig_id_b"))
      .cast("double") / k
    // Boilerplate-heavy corpora produce mega-buckets (every doc sharing
    // a hot minimum shingle hash lands in one band bucket), and raw
    // band pairs then dwarf the final candidates — Σ|bucket|²/2 rows.
    // While the signature table fits a broadcast, stream the raw pairs
    // MAP-SIDE through broadcast sig lookups and kill on the estimate
    // BEFORE any shuffle: the distinct then runs on survivors only
    // (222M raw → ~1M on the adversarial 10× stress). Past broadcast
    // size, dedup first — the narrow distinct is then cheaper than
    // shuffling sig-wide raw pairs twice.
    val nDocs = withSig.count() // materializes the cache (reused by every branch)
    val broadcastCutoff = clampToDriverLimit(docs.sparkSession,
      if (sigBroadcastBytes >= 0) sigBroadcastBytes
      else docs.sparkSession.conf
        .getOption("spark.graft.dedup.sigBroadcastBytes")
        .map(parseBytes)
        .getOrElse(512L * 1024 * 1024))
    val sigBroadcastable = broadcastCutoff > 0 && nDocs * (k * 8L + 32L) <= broadcastCutoff
    val candidates = (if (sigBroadcastable) {
      // ONE compact signature table broadcast by reference into a
      // compiled expression: the estimate kill becomes a pure map over
      // the raw pairs (two O(1) lookups + a k-long compare, inside
      // whole-stage codegen), and the only exchange left on this path
      // is the distinct over survivors. The two-broadcast-join
      // formulation this replaces materialized TWO hashed-relation
      // copies of the sig table — AQE plans the exchanges over distinct
      // TableCacheQueryStages and provably never unifies them (checked
      // on the final adaptive plan) — which at the 1000× tier (2.7 GB
      // of raw signatures) meant a 142-second full-GC driver freeze
      // that failed the stage. The compact table is bounded by the same
      // budget the joins were: it IS the collect the broadcast would
      // have done, landing in primitive arrays instead of UnsafeRows.
      val collected = withSig
        .select(col("doc_id").cast("long"), col("sig"))
        .collect().map { r =>
          // fast path: Spark hands array<bigint> back as ArraySeq.ofLong;
          // unwrap to avoid boxing n·k longs on the driver
          val sig = (r.get(1): Any) match {
            case a: scala.collection.mutable.ArraySeq.ofLong => a.array
            case _ => r.getSeq[Long](1).toArray
          }
          (r.getLong(0), sig)
        }
      val bc = docs.sparkSession.sparkContext
        .broadcast(SigTable.build(collected, k))
      rawPairs
        .withColumn("est", org.apache.spark.sql.graft.ClassifierExpr
          .sigTableMatchCount(col("id_a"), col("id_b"), bc).cast("double") / k)
        .filter(col("est") >= cut)
        .select("id_a", "id_b")
        .distinct()
    } else {
      // Fail-fast guard for the shuffled fallback (SCALE.md §6): the
      // distinct below shuffle-writes the FULL raw pair relation — on a
      // boilerplate-heavy corpus that is Σ|bucket|²/2 rows, measured
      // > 40 GB of local shuffle at the 1000× stress tier, which on a
      // single box fills the disk and poisons every later write with
      // "No space left on device". A cluster has the shuffle capacity
      // (the default there is unlimited); a local session gets a
      // ceiling and a clear error naming the knobs instead of a full
      // disk. The estimate reuses the bucket-size aggregation shape
      // that `hot` already shuffles (narrow (bb, count) rows).
      val sess = docs.sparkSession
      val ceiling = sess.conf
        .getOption("spark.graft.dedup.fallbackShuffleBytes").map(parseBytes)
        .getOrElse(if (sess.sparkContext.isLocal) 64L * 1024 * 1024 * 1024 else 0L)
      if (ceiling > 0) {
        val pairRows = buckets
          .groupBy(col("bb")).agg(count(lit(1)).as("m"))
          .filter(col("m") <= maxBucket)
          .agg(coalesce(sum(col("m") * (col("m") - 1)), lit(0L)))
          .collect()(0).getLong(0) / 2
        // ~48 B per shuffled pair row: two longs + serialization frame
        val estBytes = pairRows * 48L
        if (estBytes > ceiling) throw new IllegalStateException(
          f"minhashLsh shuffled fallback would write ~${estBytes / 1e9}%.1f GB " +
            f"of shuffle (≈ $pairRows raw candidate pairs) — over the local " +
            f"ceiling of ${ceiling / 1e9}%.1f GB. The signature table " +
            f"(${nDocs * (k * 8L + 32L)} B) exceeds the broadcast budget " +
            f"($broadcastCutoff B): raise spark.graft.dedup.sigBroadcastBytes " +
            "(and spark.driver.maxResultSize) to restore the map-side path, " +
            "raise maxBucket pruning, or raise/disable " +
            "spark.graft.dedup.fallbackShuffleBytes (0 = unlimited) if this " +
            "session really has the shuffle capacity.")
      }
      rawPairs
        .distinct()
        .join(sigFor("id_a"), Seq("id_a"))
        .join(sigFor("id_b"), Seq("id_b"))
        .withColumn("est", est)
        .filter(col("est") >= cut)
        .select("id_a", "id_b")
    })
      .cache() // feeds two candDocs branches + the verification join

    // Exact-Jaccard verification builds shingle SETS only for surviving
    // candidate docs (a left-semi prune BEFORE the shingle transform):
    // that is a few hundred docs regardless of corpus size, so the
    // interpreted HOF shingle build is off the hot path.
    val candDocs = candidates
      .select(col("id_a").as("doc_id"))
      .union(candidates.select(col("id_b").as("doc_id")))
      .distinct()
    // STATIC budget-gated broadcast of the candidate-doc list into the
    // corpus-side semi join: un-hinted, the token-carrying corpus
    // relation pays its full shuffle WRITE before AQE's late flip (the
    // d29/d28/d10/d22 byte lesson — seconds never showed it). The
    // count materializes the candidates cache its two later consumers
    // reuse anyway; the broadcast payload is one id per candidate doc.
    val nCandPairs = candidates.count()
    val candSide =
      if (nCandPairs * 2L * 64L <= broadcastCutoff) broadcast(candDocs) else candDocs
    val shSets = docs
      .select(col(idCol).as("doc_id"), col(tokensCol).as("__a"))
      .join(candSide, Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        org.apache.spark.sql.graft.TextExpr.shinglesOf(col("__a"), shingleN).as("sh"))
      .cache()
    val verified = candidates
      .join(shSets.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(shSets.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard", round(Text.jaccard(col("sh_a"), col("sh_b")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      // eager materialization of the (small) verified pair list lets the
      // intermediate caches be dropped NOW instead of leaking into the
      // session for the rest of a long-running catalog
      .localCheckpoint(true)
    withSig.unpersist()
    candidates.unpersist()
    shSets.unpersist()
    verified
  }

  /** Incremental near-dup: which docs in `batch` duplicate (Jaccard ≥
    * threshold) anything already in `corpus` — the 100 TB ingestion
    * flow, where each arriving batch is screened against the standing
    * corpus instead of re-running all-pairs dedup over everything.
    *
    * Asymmetric by design: the batch is the SMALL side by contract
    * (a day's crawl vs the corpus). Corpus signatures/bands are a pure
    * map over the corpus — or, the production path, read PRECOMPUTED
    * from `corpusSigs` (an (idCol, sig) frame built once at ingest by
    * [[signatures]] and stored columnar beside the text), so repeated
    * screens never re-tokenize the corpus; the batch's band table
    * broadcasts into the probe join, so the corpus is never shuffled —
    * it streams through one map-side join pass (narrow sig columns
    * only when sigs are stored). The corpus-side `maxBucket` cap drops
    * boilerplate mega-buckets exactly as [[minhashLsh]] does, and the
    * batch-sig broadcast estimate kill removes band noise before the
    * distinct. Verification builds shingle sets only for candidate docs
    * on both sides.
    *
    * Returns (id_batch, id_corpus, jaccard).
    */
  /** The stored-signature contract: the (idCol, sig) frame a 100 TB
    * pipeline computes ONCE at ingest and persists columnar beside the
    * text, so every later screen ([[minhashLshAgainst]] with
    * `corpusSigs`) reads narrow sig columns instead of re-tokenizing
    * the corpus. Pure map, no shuffle.
    */
  def signatures(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      k: Int = 64
  ): DataFrame = docs
    .select(
      col(idCol),
      org.apache.spark.sql.graft.TextExpr
        .minhashSig(Text.tokens(col(textCol)), shingleN, k)
        .as("sig"))
    .filter(col("sig").isNotNull)

  /** [[signatures]] over a PRE-TOKENIZED relation — the store-publish
    * entry point for pipelines whose corpus already lives in token
    * space (the p06 refresh publishes the scrubbed corpus's signatures
    * without rebuilding text: `Text.tokens(concat_ws(" ", a)) == a`).
    */
  def signaturesTokens(
      toks: DataFrame,
      idCol: String,
      tokensCol: String,
      shingleN: Int = 3,
      k: Int = 64
  ): DataFrame = toks
    .select(
      col(idCol),
      org.apache.spark.sql.graft.TextExpr
        .minhashSig(col(tokensCol), shingleN, k)
        .as("sig"))
    .filter(col("sig").isNotNull)

  /** The degenerate-bucket census over a published signature store —
    * the corpus-only half of [[minhashLshAgainst]]'s `maxBucket`
    * pruning, factored out so ingest pipelines compute it ONCE when the
    * corpus is published (beside [[signatures]]) instead of paying a
    * corpus-band exchange on EVERY micro-batch: the hot list depends
    * only on the corpus, never on the arriving batch. Returns the
    * (bb) rows of buckets holding more than `maxBucket` docs — tiny
    * (boilerplate buckets only), broadcast by the screen's anti join.
    * `bands`/`k` must match the store's signature scheme (the setup
    * fingerprint convention carries them).
    */
  def hotBandBuckets(
      sigs: DataFrame,
      k: Int = 64,
      bands: Int = 32,
      maxBucket: Int = 512
  ): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    sigs
      .select(explode(
        org.apache.spark.sql.graft.TextExpr.minhashBands(col("sig"), bands, r)).as("bb"))
      .groupBy(col("bb")).agg(count(lit(1)).as("m"))
      .filter(col("m") > maxBucket)
      .select(col("bb"))
  }

  /** The pruned corpus band index (id_corpus, sig_c, bb): the exploded
    * band rows of a published signature store minus the degenerate
    * buckets — the corpus-side relation every [[minhashLshAgainst]]
    * probe joins. Corpus-only, so a screen draining MANY batches
    * against one corpus builds it ONCE (and typically persists it for
    * the drain: first batch pays materialization, the rest scan
    * executor memory instead of re-exploding the sig store per
    * trigger — the IngestDedup/IngestCurate pattern). Derived state,
    * rebuilt from the sig store at will; ~bands × sig bytes per doc in
    * cache, spill-safe under MEMORY_AND_DISK.
    */
  def bandIndex(
      sigs: DataFrame,
      k: Int = 64,
      bands: Int = 32,
      maxBucket: Int = 512,
      hotBuckets: Option[DataFrame] = None,
      narrow: Boolean = false
  ): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    val bandsC = sigs
      .select(col(sigs.columns.head).as("id_corpus"), col("sig").as("sig_c"))
      .select(
        col("id_corpus"),
        col("sig_c"),
        explode(org.apache.spark.sql.graft.TextExpr.minhashBands(col("sig_c"), bands, r)).as("bb"))
    val hot = hotBuckets.getOrElse(
      bandsC.select("id_corpus", "bb").groupBy(col("bb")).agg(count(lit(1)).as("m"))
        .filter(col("m") > maxBucket).select("bb"))
    val pruned = bandsC.join(broadcast(hot), Seq("bb"), "left_anti")
    // narrow drops the signature payload from the cached rows (16 B vs
    // ~sig bytes per band row) — ONLY valid when the sig store itself
    // fits the broadcast budget, because the probe then re-attaches
    // sig_c from a broadcast of the store ([[minhashLshAgainst]])
    if (narrow) pruned.select(col("id_corpus"), col("bb")) else pruned
  }

  /** [[minhashLshAgainst]] over PRE-TOKENIZED relations — the
    * incremental screen for pipelines whose batch and corpus already
    * live in token space (the p06 refresh probes the arriving batch's
    * scrubbed tokens against the published scrubbed corpus + signature
    * store). Identical result to the text form on the rebuilt strings:
    * `Text.tokens(concat_ws(" ", a)) == a` for whitespace-free tokens,
    * and the rebuild projection only evaluates on candidate rows (the
    * verification side semi-joins ids before building shingles).
    */
  def minhashLshAgainstTokens(
      batchToks: DataFrame,
      corpusToks: DataFrame,
      idCol: String,
      tokensCol: String,
      shingleN: Int = 3,
      k: Int = 64,
      bands: Int = 32,
      threshold: Double = 0.5,
      maxBucket: Int = 512,
      corpusSigs: Option[DataFrame] = None,
      hotBuckets: Option[DataFrame] = None,
      corpusBands: Option[DataFrame] = None,
      batchSigs: Option[DataFrame] = None,
      eager: Boolean = true
  ): DataFrame = {
    def asText(df: DataFrame) = df.select(
      col(idCol), concat_ws(" ", col(tokensCol)).as("__graft_text"))
    minhashLshAgainst(asText(batchToks), asText(corpusToks), idCol, "__graft_text",
      shingleN, k, bands, threshold, maxBucket, corpusSigs, hotBuckets, corpusBands,
      batchSigs, eager)
  }

  def minhashLshAgainst(
      batch: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      k: Int = 64,
      bands: Int = 32,
      threshold: Double = 0.5,
      maxBucket: Int = 512,
      corpusSigs: Option[DataFrame] = None,
      hotBuckets: Option[DataFrame] = None,
      corpusBands: Option[DataFrame] = None,
      batchSigs: Option[DataFrame] = None,
      eager: Boolean = true
  ): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    def sigOf(df: DataFrame, idAs: String, sigAs: String) = df
      .select(
        col(idCol).as(idAs),
        org.apache.spark.sql.graft.TextExpr
          .minhashSig(Text.tokens(col(textCol)), shingleN, k)
          .as(sigAs))
      .filter(col(sigAs).isNotNull)
    // cached: consumed by the count below, the probe-side band build
    // and (past the fat budget) the sig re-attach join. A caller whose
    // pipeline already built the batch signatures (the p06 refresh
    // computes them once for its published-index probe rows) passes
    // them in and skips the recompute — same (idCol, sig) contract as
    // corpusSigs.
    val sigB = batchSigs
      .map(_.select(col(idCol).as("id_batch"), col("sig").as("sig_b")))
      .getOrElse(sigOf(batch, "id_batch", "sig_b"))
      .cache()
    val sigC = corpusSigs
      .map(_.select(col(idCol).as("id_corpus"), col("sig").as("sig_c")))
      .getOrElse(sigOf(corpus, "id_corpus", "sig_c"))
    // ONE batch-side broadcast by default: the band rows CARRY sig_b, so
    // the probe and the estimate kill ride a single broadcast join (two
    // separate broadcasts — bands then sigs — paid a second build + join
    // per screen call, which a multi-trigger drain multiplies). The fat
    // shape weighs ~bands × sig bytes per batch doc (~16× the narrow
    // bands + sigs pair), so it is GATED on the sig broadcast budget:
    // the same code path serves one-shot screens whose "batch" is a
    // whole feed split, and an unbudgeted fat broadcast there could
    // blow the driver ceiling the repo guards everywhere else. Past the
    // budget the screen degrades to the two-broadcast shape (each side
    // budget-checked on its own weight), and past THAT to plain
    // shuffled joins — the honest giant-batch behavior.
    val nB = sigB.count()
    val budget = sigBroadcastBudget(batch.sparkSession)
    val bandsFatFits = nB <= budget / (bands.toLong * (k * 8L + 48L))
    // corpus bands CARRY sig_c: the column is wide in flight but these
    // rows are never shuffled — every step below down to the estimate
    // kill is map-side, so only kill survivors reach an exchange.
    // Degenerate corpus buckets are capped (the corpus carries the
    // boilerplate); the hot list is tiny → broadcast anti join, same
    // as minhashLsh. A published hot list ([[hotBandBuckets]]) skips
    // the census — and with it the SECOND corpus band explode; a
    // published/persisted [[bandIndex]] skips the corpus side here
    // entirely (the multi-batch drain shape).
    // A narrow (id_corpus, bb) index — [[bandIndex]]'s `narrow = true`
    // shape, bands × 16 B/doc in cache instead of bands × sig bytes —
    // re-attaches sig_c map-side from a BROADCAST of the sig store;
    // only valid when the caller has checked the store against the
    // broadcast budget (the sigBroadcastBytes convention). Past the
    // budget the fat index stays the shape: sig_c rides the band rows
    // and nothing is ever shuffled to fetch it.
    val prunedC0 = corpusBands.getOrElse {
      val bandsC = sigC.select(
        col("id_corpus"),
        col("sig_c"),
        explode(org.apache.spark.sql.graft.TextExpr.minhashBands(col("sig_c"), bands, r)).as("bb"))
      val hot = hotBuckets.getOrElse(
        bandsC.select("id_corpus", "bb").groupBy(col("bb")).agg(count(lit(1)).as("m"))
          .filter(col("m") > maxBucket).select("bb"))
      bandsC.join(broadcast(hot), Seq("bb"), "left_anti")
    }
    val prunedC =
      if (prunedC0.columns.contains("sig_c")) prunedC0
      else prunedC0.join(broadcast(sigC), Seq("id_corpus"))
    val sigma = math.sqrt(threshold * (1 - threshold) / k)
    val cut = math.max(0.0, threshold - 3 * sigma)
    val est = org.apache.spark.sql.graft.TextExpr
      .sigMatchCount(col("sig_b"), col("sig_c"))
      .cast("double") / k
    // ONE map-side pass over the corpus: band probe against the
    // broadcast batch bands, then the estimate kill against the
    // broadcast batch sigs — raw band collisions die in place; the only
    // exchange in candidate generation is the distinct over survivors
    val probed =
      if (bandsFatFits) {
        val bandsB = sigB.select(
          col("id_batch"),
          col("sig_b"),
          explode(org.apache.spark.sql.graft.TextExpr.minhashBands(col("sig_b"), bands, r)).as("bb"))
        prunedC.join(broadcast(bandsB), Seq("bb"))
      } else {
        // two-broadcast fallback: narrow (id, bb) bands probe first,
        // sig_b re-attached on the survivors' id — each side broadcast
        // only under its own measured weight
        val bandsNarrow = sigB.select(
          col("id_batch"),
          explode(org.apache.spark.sql.graft.TextExpr.minhashBands(col("sig_b"), bands, r)).as("bb"))
        val bandsSide =
          if (nB <= budget / (bands.toLong * 48L)) broadcast(bandsNarrow) else bandsNarrow
        val sigSide = sigB.select(col("id_batch"), col("sig_b"))
        val sigAttach =
          if (nB <= budget / (k * 8L + 48L)) broadcast(sigSide) else sigSide
        prunedC.join(bandsSide, Seq("bb")).join(sigAttach, Seq("id_batch"))
      }
    val candCached = probed
      .withColumn("e", est)
      .filter(col("e") >= cut)
      .select("id_batch", "id_corpus")
      .distinct()
      .cache()
    // the verification side must NOT shuffle the corpus: the candidate
    // id lists are kill-survivor-bounded (batch-scale by the estimate
    // cut), but they sit behind a cache with no size stats, so the semi
    // joins below would otherwise SORT-MERGE the token relations
    // against them — measured 58 MB / 200 k docs of corpus-keyed
    // exchange in every incremental screen, ∝ corpus and invisible at
    // gate scale. ONE capped collect (the TOCTOU-capped
    // preparedEvalGrams convention — the cap bounds the driver pull
    // BEFORE it happens) yields the list and its cardinality together:
    // under the budget the candidates become a DRIVER-LOCAL relation,
    // so the three verification joins broadcast it with zero further
    // jobs — where the count-then-broadcast shape paid a counting job
    // plus a broadcast build per join. Past the cap the screen keeps
    // the cached distributed relation — the honest dup-storm price.
    // 128 B/row accounting, not the 48 B/row the distributed relation
    // weighs: the capped collect holds BOXED GenericRows on the driver
    // (~2-4× the compact encoding) and createDataFrame+broadcast briefly
    // doubles the footprint, so a near-cap candidate storm must still
    // fit the clamped budget (r18 ADVICE #2)
    val maxCand = math.min(budget / 128L, Int.MaxValue.toLong - 1L)
    val capped = candCached.limit(maxCand.toInt + 1).collect()
    val candFits = capped.length <= maxCand
    val candidates =
      if (candFits) {
        candCached.unpersist()
        broadcast(batch.sparkSession.createDataFrame(
          java.util.Arrays.asList(capped: _*), candCached.schema))
      } else candCached
    def shingleSide(docs0: DataFrame, cand: DataFrame, idAs: String, shAs: String) = docs0
      .select(col(idCol).as(idAs), col(textCol).as("text"))
      .join(if (candFits) broadcast(cand) else cand, Seq(idAs), "left_semi")
      .select(col(idAs), Text.shingles(col("text"), shingleN).as(shAs))
    val shB = shingleSide(batch, candidates.select("id_batch"), "id_batch", "sh_b")
    val shC = shingleSide(corpus, candidates.select("id_corpus"), "id_corpus", "sh_c")
    val verified = candidates
      .join(shB, Seq("id_batch"))
      .join(shC, Seq("id_corpus"))
      .withColumn("jaccard", round(Text.jaccard(col("sh_b"), col("sh_c")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id_batch"), col("id_corpus"), col("jaccard"))
    // eager (the default, the multi-trigger streaming-screen contract):
    // materialize the verification once and release the working caches —
    // a per-batch caller must not accumulate cache entries across
    // triggers. eager = false (the p06 refresh): the caller's OWN next
    // materializing action (the cluster-merge edge count) computes the
    // verify in ITS job, skipping a whole checkpoint job; the working
    // caches stay pinned for that consumer and drop with the cell's
    // per-query unpersist sweep.
    if (eager) {
      val out = verified.localCheckpoint(true)
      candCached.unpersist()
      sigB.unpersist()
      out
    } else verified
  }

  /** The stored-sketch contract for the embedding screen (the
    * [[signatures]] analogue in vector space): the (idCol, buckets, pb)
    * frame a pipeline computes ONCE when the corpus is published —
    * hyperplane-LSH bucket ids for all nTables tables plus the packed
    * sign-bit sketch — and persists columnar beside the vectors, so
    * every later [[embeddingNearDupAgainst]] screen reads narrow sketch
    * columns ((nTables structs + nBits·nTables/64 longs) per row)
    * instead of re-projecting dim-wide corpus vectors. Pure map, no
    * shuffle. The reader must pass the SAME (nBits, nTables) the store
    * was built with — version the store path/marker on them.
    */
  def vectorSketches(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      nBits: Int,
      nTables: Int = 8
  ): DataFrame = {
    require(nBits > 0 && nTables > 0, "nBits and nTables must be positive")
    import graft.functions.Vectors
    import org.apache.spark.sql.graft.VectorExpr
    embeddings
      .select(
        col(idCol),
        VectorExpr.randomProjections(Vectors.toDouble(col(vecCol)), nBits * nTables).as("proj"))
      .select(
        col(idCol),
        Vectors.packBuckets(col("proj"), nBits, nTables).as("buckets"),
        VectorExpr.packSignBits(col("proj")).as("pb"))
  }

  /** Batch-vs-corpus embedding near-dup screen — [[minhashLshAgainst]]
    * transplanted to vector space (the incremental form of
    * [[embeddingNearDup]]): each arriving batch of embeddings is probed
    * against the standing corpus, returning only CROSS-split pairs
    * (id_batch, id_corpus, cosine ≥ threshold).
    *
    * Asymmetric by contract: the batch is small. Corpus sketches come
    * precomputed from `corpusSketches` (built once by
    * [[vectorSketches]]) or as a pure map over the corpus; the batch's
    * bucket and sketch tables broadcast into the probe join, so the
    * corpus is never shuffled — bucket probe and the packed-Hamming
    * kill (the e03 4σ bound) run in ONE map-side pass, and only kill
    * survivors reach the candidate distinct. Exact cosine verification
    * touches corpus vectors only for candidate ids.
    */
  def embeddingNearDupAgainst(
      batch: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double = 0.95,
      nBits: Int = -1,
      nTables: Int = 8,
      corpusSketches: Option[DataFrame] = None
  ): DataFrame = {
    import graft.functions.Vectors
    import org.apache.spark.sql.graft.VectorExpr
    val bits =
      if (nBits > 0) nBits
      else if (corpusSketches.isDefined)
        throw new IllegalArgumentException(
          "embeddingNearDupAgainst: pass the nBits the sketch store was built with")
      else
        graft.sources.ScanStats.exactRowCountNoJobOrReason(corpus) match {
          case Right(n) => autoBits(n)
          case Left(reason) => throw new IllegalArgumentException(
            s"embeddingNearDupAgainst: corpus size is not derivable from scan metadata ($reason); " +
              "pass nBits explicitly — e.g. nBits = Dedup.autoBits(n) for a known corpus size n")
        }
    val nBitsTotal = bits * nTables
    val sketchB = vectorSketches(batch, idCol, vecCol, bits, nTables)
      .select(col(idCol).as("id_batch"), col("buckets").as("bk_b"), col("pb").as("pb_b"))
      .cache()
    val sketchC = corpusSketches
      .map(_.select(col(idCol).as("id_corpus"), col("buckets").as("bk_c"), col("pb").as("pb_c")))
      .getOrElse(vectorSketches(corpus, idCol, vecCol, bits, nTables)
        .select(col(idCol).as("id_corpus"), col("buckets").as("bk_c"), col("pb").as("pb_c")))
    val bucketsB = sketchB.select(col("id_batch"), explode(col("bk_b")).as("tb"))
    // corpus buckets CARRY pb_c: wide in flight but never shuffled —
    // probe join + Hamming kill are map-side against the broadcast
    // batch tables; only survivors reach the distinct exchange
    val bucketsC = sketchC.select(col("id_corpus"), col("pb_c"), explode(col("bk_c")).as("tb"))
    val pThresh = 1.0 - math.acos(math.min(threshold, 1.0)) / math.Pi
    val hamSigma = math.sqrt(pThresh * (1 - pThresh) / nBitsTotal)
    val maxDist = math.floor((1.0 - (pThresh - 4 * hamSigma)) * nBitsTotal).toInt
    val candidates = bucketsC
      .join(broadcast(bucketsB), Seq("tb"))
      .join(broadcast(sketchB.select(col("id_batch"), col("pb_b"))), Seq("id_batch"))
      .filter(VectorExpr.packedHamming(col("pb_b"), col("pb_c")) <= maxDist)
      .select("id_batch", "id_corpus")
      .distinct()
    val vB = batch.select(col(idCol).as("id_batch"), Vectors.toDouble(col(vecCol)).as("v_b"))
    val vC = corpus.select(col(idCol).as("id_corpus"), Vectors.toDouble(col(vecCol)).as("v_c"))
    val verified = candidates
      .join(vC, Seq("id_corpus"))
      .join(broadcast(vB), Seq("id_batch"))
      .withColumn("cosine", round(Vectors.cosine(col("v_b"), col("v_c")), 6))
      .filter(col("cosine") >= threshold)
      .select(col("id_batch"), col("id_corpus"), col("cosine"))
      .localCheckpoint(true)
    sketchB.unpersist()
    verified
  }

  /** SimHash near-duplicate pairs at Hamming distance ≤ maxDist.
    *
    * Pigeonhole blocking: the 64-bit fingerprint splits into maxDist+1
    * chunks; any pair within maxDist shares at least one exact chunk, so
    * an equi-join per chunk finds all such pairs without a cross join.
    */
  def simhashNearDup(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxDist: Int = 3
  ): DataFrame = {
    val chunks = maxDist + 1
    val width = 64 / chunks
    val fp = docs
      .select(col(idCol).as("doc_id"), Text.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) > 0)
      .withColumn("simhash", Text.simhash64(col("toks")))
    val blocked = fp.select(
      col("doc_id"),
      col("simhash"),
      explode(org.apache.spark.sql.graft.TextExpr.simhashChunks(col("simhash"), chunks, width))
        .as("blk")
    )
    val a = blocked.select(col("doc_id").as("id_a"), col("simhash").as("h_a"), col("blk"))
    val b = blocked.select(col("doc_id").as("id_b"), col("simhash").as("h_b"), col("blk"))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), Text.hamming64(col("h_a"), col("h_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  /** Exact n-gram Jaccard similarity join: LSH candidates verified with
    * the true shingle-set Jaccard (the non-approximate variant of
    * minhashLsh — same plan, threshold applied on the exact measure).
    */
  def ngramJaccardJoin(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double
  ): DataFrame =
    // r = 2 bands: candidate recall ≥ 99.99% at the threshold, so the
    // exact-verified result is effectively the true similarity join
    minhashLsh(docs, idCol, textCol, shingleN = n, k = 64, bands = 32, threshold = threshold)

  /** Connected components over a near-duplicate pair list — each doc
    * ends labeled with the smallest doc id reachable through the pair
    * graph, which is the canonical survivor of its duplicate cluster.
    *
    * Large-star/small-star alternation (the "Connected Components in
    * MapReduce and Beyond" shape — the same alternation GraphFrames
    * ships for its CC):
    *   - large-star: every node links its LARGER neighbors to the
    *     minimum of its neighborhood (incl. itself);
    *   - small-star: every node links its smaller neighbors (and
    *     itself) to the minimum of the smaller neighborhood.
    * Both steps are plain groupBy-min + join — the per-node minimum is
    * a partially-aggregated reduction, so a 200k-member cluster's hot
    * label never funnels through one reducer the way per-round message
    * fan-in does. Each pass CONTRACTS the edge set toward stars, so
    * later rounds run over shrinking data and the round count scales
    * with log(diameter), not diameter. At the fixpoint every edge is
    * (member, component-min) and the labels fall straight out.
    *
    * Convergence check: edge sets are distinct and checkpointed, so
    * `same count && newEdges.except(oldEdges).isEmpty` is exact set
    * equality — no hash-collision shortcut.
    */
  def clusters(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    // LAZY checkpoint + count: one job materializes the (possibly
    // expensive) pair pipeline once, so the loop/union-find never
    // re-derives it — and unlike the former eager checkpoint + count
    // pair it costs ONE action, not two (the p06 job-floor lesson),
    // with blocks ContextCleaner-managed like every repo checkpoint.
    // Loop iterations still checkpoint their own output, so the plan
    // does not grow with the iteration count. Edges are canonical
    // (hi, lo) with hi > lo — both star steps preserve that invariant.
    var edges = pairs
      .select(
        greatest(col("id_a"), col("id_b")).as("hi"),
        least(col("id_a"), col("id_b")).as("lo"))
      .filter(col("hi") =!= col("lo"))
      .distinct()
      .localCheckpoint(false)
    var cnt = edges.count()
    // Budget-gated in-memory finish (the GraphX/Kiveris "finish small"
    // hybrid): when the DEDUPLICATED edge set — already counted for the
    // convergence loop, so the decision is free — fits the driver
    // budget, union-find labels the components in one collect instead
    // of log(diameter) contraction rounds, each of which pays ~5 fixed
    // job floors (two checkpointed star passes + count + the exact
    // set-equality check). At sf0.1 the dup graph is a few hundred
    // edges and the rounds are pure floor (measured: d09 3.7 s warm →
    // the collect path is one job); past the budget — the 100 TB LSH
    // graph — the distributed contraction below is unchanged. Labels
    // are identical by construction: both paths tag every node with
    // its component minimum.
    val ccCap = math.min(
      pairs.sparkSession.conf
        .getOption("spark.graft.dedup.ccDriverEdges").map(_.toLong)
        .getOrElse(2000000L),
      // ~96 B per collected edge row (two boxed ids + Row + map entry)
      sigBroadcastBudget(pairs.sparkSession) / 96L)
    val idType = edges.schema("hi").dataType
    val comparableId = idType match {
      case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType | org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.StringType => true
      case _ => false
    }
    if (cnt > 0 && cnt <= ccCap && comparableId) return ccUnionFind(edges, idType)
    var converged = cnt == 0L
    var iter = 0
    while (!converged && iter < maxIters) {
      // large-star over the symmetric neighborhood: m = min(Γ(u) ∪ u);
      // emit (v, m) for v ∈ Γ(u), v > u  (so hi=v > u ≥ m=lo)
      val sym = edges.select(col("hi").as("u"), col("lo").as("v"))
        .unionByName(edges.select(col("lo").as("u"), col("hi").as("v")))
      val lsMin = sym.groupBy("u").agg(min(col("v")).as("mn"))
      val ls = sym.join(lsMin, Seq("u"))
        .filter(col("v") > col("u"))
        .select(col("v").as("hi"), least(col("u"), col("mn")).as("lo"))
        .distinct()
        .localCheckpoint(true)
      // small-star over each node's smaller neighbors: m = min(Γ⁻(u));
      // emit (u, m) and (w, m) for the other smaller neighbors w
      val ssMin = ls.groupBy("hi").agg(min(col("lo")).as("m"))
      val j = ls.join(ssMin, Seq("hi"))
      val ss = j.select(col("hi"), col("m").as("lo"))
        .unionByName(j.filter(col("lo") =!= col("m"))
          .select(col("lo").as("hi"), col("m").as("lo")))
        .distinct()
        .localCheckpoint(true)
      val newCnt = ss.count()
      converged = newCnt == cnt && ss.except(edges).isEmpty
      edges = ss
      cnt = newCnt
      iter += 1
    }
    // exhausting maxIters without a fixpoint means some component is
    // still merging — returning would hand the caller one duplicate
    // cluster split into several "canonical" survivors with NO
    // indication anything is wrong. Refuse instead: rounds scale with
    // log(diameter), so a non-converging run at maxIters=20 means a
    // pathological graph (the pair threshold is far too loose).
    if (!converged) throw new IllegalStateException(
      s"clusters: star contraction did not converge within $maxIters rounds — " +
        "raise maxIters or tighten the pair threshold")
    // stars: every non-center node appears exactly once as hi with its
    // component min as lo; centers label themselves
    edges.select(col("hi").as("id"), col("lo").as("cluster_id"))
      .unionByName(edges.select(col("lo").as("id"), col("lo").as("cluster_id")).distinct())
  }

  /** Union connected-component labels of (published clusters ⊕ an
    * arriving batch's pair graph) WITHOUT recomputing published-side
    * pairs — the near-dup piece of an incremental corpus refresh.
    * Published components are CONTRACTED to their labels (contracting
    * a connected subgraph preserves global connectivity, the star-
    * contraction trick applied at the store boundary), cross pairs are
    * rewritten (batch id, published label), and [[clusters]] runs over
    * batch-scale edges only — never the published pair graph.
    *
    * Returns (id, cluster_id) for every node of the contracted graph:
    * batch ids and published labels. Callers derive
    *   - batch drops: a batch id with `cluster_id =!= id`;
    *   - published-survivor EVICTIONS: a published label L with
    *     `cluster_id =!= L` — two published clusters merged through a
    *     batch bridge doc, so the losing cluster's canonical survivor
    *     is no longer the component minimum (the correctness case a
    *     naive drop-batch-members-only screen misses).
    * Exactness requires batch ids to order after all published ids
    * (the append-only id contract): every mixed component then has a
    * published minimum, and pure-batch components are identical in the
    * union and contracted graphs. `publishedLabels` must cover every
    * doc that ever entered the published pair graph (docs with no pair
    * are implicit self-clusters — the left join coalesces them).
    */
  def clusterDelta(
      internalPairs: DataFrame,
      crossPairs: DataFrame,
      publishedLabels: DataFrame
  ): DataFrame = {
    val lab = publishedLabels.select(
      col(publishedLabels.columns(0)).as("id_corpus"),
      col(publishedLabels.columns(1)).as("__lab"))
    val crossLab = crossPairs
      .select(
        col(crossPairs.columns(0)).as("id_batch"),
        col(crossPairs.columns(1)).as("id_corpus"))
      .join(lab, Seq("id_corpus"), "left")
      .select(
        col("id_batch").as("id_a"),
        coalesce(col("__lab"), col("id_corpus")).as("id_b"))
    clusters(
      internalPairs.select(col("id_a"), col("id_b")).unionByName(crossLab))
  }

  /** The in-memory finish of [[clusters]]: union-find over a collected
    * budget-bounded edge set, labels = component minimum (the larger
    * root always links under the smaller, path-compressed find) —
    * bit-identical to the star-contraction fixpoint. One row per node.
    */
  private def ccUnionFind(
      edges: DataFrame, idType: org.apache.spark.sql.types.DataType): DataFrame = {
    val spark = edges.sparkSession
    val rows = edges.collect()
    val parent = new java.util.HashMap[Any, Any]()
    // label order must match the distributed star-contraction path,
    // whose least/min on strings is UTF8String's UTF-8 BINARY order —
    // java.lang.String.compareTo is UTF-16 code-unit order, which
    // disagrees on supplementary-plane characters, so the two finishes
    // could pick different cluster labels for the same component
    def lt(a: Any, b: Any): Boolean = (a, b) match {
      case (x: String, y: String) =>
        org.apache.spark.unsafe.types.UTF8String.fromString(x)
          .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(y)) < 0
      case _ => a.asInstanceOf[Comparable[Any]].compareTo(b) < 0
    }
    def find(x: Any): Any = {
      var r = x
      while (parent.getOrDefault(r, r) != r) r = parent.get(r)
      var c = x // path compression
      while (c != r) { val n = parent.get(c); parent.put(c, r); c = n }
      r
    }
    rows.foreach { r =>
      val (a, b) = (r.get(0), r.get(1))
      parent.putIfAbsent(a, a); parent.putIfAbsent(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (lt(ra, rb)) parent.put(rb, ra) else parent.put(ra, rb) }
    }
    val out = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row](parent.size)
    parent.keySet().forEach(k => out += org.apache.spark.sql.Row(k, find(k)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.toSeq, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", idType),
        org.apache.spark.sql.types.StructField("cluster_id", idType))))
  }

  /** Apply side of document-level near-dup — the scrub a training
    * pipeline actually runs: MinHash-LSH pairs → connected components →
    * drop every non-canonical cluster member, keeping one survivor (the
    * minimum id) per duplicate cluster plus all unique documents. Same
    * contract as [[exactDedup]]'s min-id winner, lifted to NEAR
    * duplicates.
    *
    * Scale shape: everything up to the removal list is the adjudicated
    * d06/d09 machinery (banded self-join + broadcast sig-table estimate
    * kill; frontier label propagation). The removal list itself is
    * O(duplicate members) rows — corpus minus survivors, NOT the corpus
    * — and the final `left_anti` join shuffles on the id alone (AQE
    * broadcasts it outright when the dup rate is small). No stage here
    * touches text after pair generation.
    */
  def neardupScrub(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      k: Int = 64,
      bands: Int = 32,
      threshold: Double = 0.5
  ): DataFrame =
    neardupScrubPairs(docs,
      minhashLsh(docs, idCol, textCol, shingleN, k, bands, threshold), idCol)

  /** [[neardupScrub]] over a PRE-COMPUTED verified pair relation — the
    * production shape when the pair screen's output is a published
    * ingest artifact (the p06 loop persists and maintains exactly this
    * relation as its label store's edge set): connected components +
    * the min-id-survivor anti join only.
    */
  def neardupScrubPairs(docs: DataFrame, pairs: DataFrame, idCol: String): DataFrame = {
    val remove = clusters(pairs)
      .filter(col("id") =!= col("cluster_id"))
      .select(col("id").as(idCol))
    docs.join(remove, Seq(idCol), "left_anti")
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold, candidates from
    * multi-table hyperplane-LSH buckets — no cross join. Shuffles
    * O(n · nTables) bucket rows; verification runs on candidate pairs
    * only. nBits controls precision (bucket size ≈ n / 2^nBits per
    * table), nTables recall (1 − (1 − p^nBits)^nTables).
    *
    * nBits ≤ 0 (the default) auto-scales to the corpus:
    * ceil(log2(n / 16)) clamped to [6, 20]. Candidate volume within a
    * table is Σ|bucket|²/2 ≈ n²/2^nBits — with FIXED bits it grows
    * quadratically in n, so bucket width must track log2(n) to keep
    * verification linear. Recall for near-identical pairs (the near-dup
    * regime: p per bit ≥ 0.99) stays ≈ 1 across that whole clamp range.
    */
  /** Bucket width for a corpus of n vectors: constant expected bucket
    * size (~16), clamped to [6, 20] bits.
    */
  def autoBits(n: Long): Int =
    math.min(20, math.max(6, math.ceil(math.log(math.max(n, 1L) / 16.0) / math.log(2)).toInt))

  def embeddingNearDup(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double = 0.95,
      nBits: Int = -1,
      nTables: Int = 8
  ): DataFrame = {
    import graft.functions.Vectors
    import org.apache.spark.sql.graft.VectorExpr
    val base = embeddings.select(col(idCol).as("vec_id"), Vectors.toDouble(col(vecCol)).as("v"))
    // Auto-sizing must not run a hidden job over the caller's input plan
    // at DataFrame-construction time: corpus size comes from scan
    // metadata only (parquet footers / local relations / unions thereof,
    // all driver-side). Inputs whose cardinality is NOT metadata-derivable
    // (filters, joins) must size explicitly — a silent count() here would
    // execute an arbitrary upstream plan twice.
    val bits =
      if (nBits > 0) nBits
      else
        graft.sources.ScanStats.exactRowCountNoJobOrReason(embeddings) match {
          case Right(n) => autoBits(n)
          case Left(reason) => throw new IllegalArgumentException(
            s"embeddingNearDup: corpus size is not derivable from scan metadata ($reason); " +
              "pass nBits explicitly — e.g. nBits = Dedup.autoBits(n) for a known corpus size n")
        }
    // projections materialized as their own column BEFORE packing: the
    // pack lambda references the array per bit, and an inlined projection
    // expression would re-project per element under interpreted HOF eval.
    // Deliberately NOT cached/checkpointed although three branches
    // consume it (bucket explode + both packed sketch sides): the
    // projection row is WIDE (bits·nTables doubles), and materializing
    // it was measured STRICTLY WORSE than recomputing the codegen'd
    // kernel — 80–191 s vs ~34 s at the 1000× tier (2 M vectors,
    // ~2.4 GB persisted) — because storage/serialization pressure
    // dwarfs the pure-CPU dot products. minhashLsh caches its sig
    // table because sigs are NARROW (k longs); this one is not.
    val projected = base
      .select(col("vec_id"), VectorExpr.randomProjections(col("v"), bits * nTables).as("proj"))
    val v = projected
      .select(col("vec_id"), explode(Vectors.packBuckets(col("proj"), bits, nTables)).as("tb"))
    val a = v.select(col("vec_id").as("id_a"), col("tb"))
    val b = v.select(col("vec_id").as("id_b"), col("tb"))
    val rawCand = a
      .join(b, Seq("tb"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    // Map-side Hamming kill (the d06 estimate-kill pattern for vectors):
    // agreement fraction over ALL bits·nTables sign bits estimates the
    // pair's angle — P(bit agrees) = 1 − θ/π (Goemans–Williamson). A
    // pair at cosine ≥ threshold has p ≥ pThresh, so requiring
    // Hamming ≤ (1 − (pThresh − 4σ))·N keeps true pairs with
    // P(false drop) < 3e-5 per pair while killing the low-cosine bulk
    // of bucket candidates BEFORE the distinct shuffle and the dim-wide
    // vector joins. The packed sketch (N/64 longs per row) broadcasts at
    // corpus sizes where dim-wide vectors never could.
    val nBitsTotal = bits * nTables
    val pThresh = 1.0 - math.acos(math.min(threshold, 1.0)) / math.Pi
    val hamSigma = math.sqrt(pThresh * (1 - pThresh) / nBitsTotal)
    val maxDist = math.floor((1.0 - (pThresh - 4 * hamSigma)) * nBitsTotal).toInt
    val packedFor = (alias: String) =>
      projected.select(col("vec_id").as(alias), VectorExpr.packSignBits(col("proj")).as(s"pb_$alias"))
    // same broadcast budget as the minhash sig kill: the sketch table is
    // n·((N/64)·8+32) bytes; past the budget fall back to dedup-first
    // (the kill then runs post-shuffle on the narrow distinct output)
    val sketchBudget = clampToDriverLimit(embeddings.sparkSession,
      embeddings.sparkSession.conf
        .getOption("spark.graft.dedup.sigBroadcastBytes")
        .map(parseBytes)
        .getOrElse(512L * 1024 * 1024))
    val nVecs = graft.sources.ScanStats.exactRowCountNoJob(embeddings).getOrElse(Long.MaxValue)
    // compare by DIVISION: an unknown corpus size falls back to
    // Long.MaxValue, and multiplying that by the per-row bytes wraps
    // negative (any multiple of 8 does), which would silently flip the
    // check to "broadcastable" on exactly the inputs whose size we do
    // not know — the opposite of the intended assume-huge fallback
    val sketchBroadcastable = nVecs <= sketchBudget / ((nBitsTotal / 64 + 1) * 8L + 32L)
    val candidates = (if (sketchBroadcastable)
      rawCand
        .join(broadcast(packedFor("id_a")), Seq("id_a"))
        .join(broadcast(packedFor("id_b")), Seq("id_b"))
        .filter(VectorExpr.packedHamming(col("pb_id_a"), col("pb_id_b")) <= maxDist)
        .select("id_a", "id_b")
        .distinct()
    else
      rawCand
        .distinct()
        .join(packedFor("id_a"), Seq("id_a"))
        .join(packedFor("id_b"), Seq("id_b"))
        .filter(VectorExpr.packedHamming(col("pb_id_a"), col("pb_id_b")) <= maxDist)
        .select("id_a", "id_b"))
    val vecs = base
    candidates
      .join(vecs.select(col("vec_id").as("id_a"), col("v").as("v_a")), Seq("id_a"))
      .join(vecs.select(col("vec_id").as("id_b"), col("v").as("v_b")), Seq("id_b"))
      .withColumn("cosine", round(Vectors.cosine(col("v_a"), col("v_b")), 6))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
