package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-trained bigram language-model scoring — the CCNet/Gopher
  * "perplexity filter" stage of an LLM data pipeline (beyond-reference
  * tier of the build brief; the reference DW has no text-quality layer).
  *
  * Trains an add-k-smoothed bigram LM and scores documents with their
  * mean per-bigram log-likelihood (and perplexity = exp(-mean)).
  * Low-likelihood documents are the gibberish/boilerplate tail a
  * pretraining pipeline drops; the score is also the standard prune
  * signal for quality-stratified sampling. [[train]] + [[scoreWith]]
  * separate model fitting from scoring so a published corpus model can
  * screen ARRIVING batches (the streaming ingest-quality screen, s09);
  * [[bigramScore]] is the one-shot self-trained form (d29).
  *
  * Scale shape (the 100 TB lens):
  *   - tokenize + bigram expansion are pure per-row maps (no exchange);
  *   - the model is two aggregations whose result cardinality is the
  *     number of observed bigram/unigram TYPES — vocabulary-bounded
  *     (Heaps' law), orders of magnitude below token volume;
  *   - scoring joins per-document bigram-type counts (not raw tokens)
  *     to the model on (w1, w2) / (w1) — linear shuffles with partial
  *     aggregation on both sides, and AQE broadcasts the model sides
  *     when they fit (they do for any natural-language vocabulary);
  *   - the only driver-side values are two scalars (vocab size, total).
  *   No per-document state, no windows, no all-pairs anything.
  *
  * Numeric parity (Q.scala conventions): per-bigram weights are doubles
  * summed per document; magnitudes are O(1)–O(10) while double-sum
  * associativity noise is ~1e-13, so ROUND(_, 6) hashes identically in
  * Spark and DuckDB (the d24 NB classifier gates the same way).
  */
object LangModel {

  /** A fitted bigram LM: bigram-type counts (w1, w2, c12), first-
    * position unigram counts (w1, c1), the corpus distinct-token count,
    * and the smoothing constant. The two count relations are exactly
    * what [[graft.streaming.IngestQuality]] persists as the published
    * model store.
    */
  final case class BigramLm(bic: DataFrame, uni: DataFrame, vocabSize: Long, k: Double)

  // the canonical tokenizer shared with the dedup/packing tier — the LM
  // must never diverge from the tokens spanDedup/p02 compose it with
  private def tokenArray(textCol: org.apache.spark.sql.Column) =
    graft.functions.Text.tokens(textCol)

  /** Raw per-occurrence bigram rows (doc, w1, w2): a map-only expansion,
    * deliberately NOT pre-aggregated — keying an exchange on
    * (doc, w1, w2) would shuffle ~one row per corpus token (within-doc
    * bigram-type repeats are rare, so that "aggregation" reduces almost
    * nothing and costs a corpus-wide exchange; measured 208 s → the
    * dominant cost at the 5 M-doc stress tier). Both consumers instead
    * aggregate on keys that DO collapse map-side: (w1, w2) for the
    * model (vocabulary-bounded), doc_id for scoring (scan-contiguous).
    * Guarded transform: sequence(1, 0) would step DOWNWARD, so only
    * build the index list when >= 2 tokens.
    */
  private def rawBigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    rawBigramsFromTokens(docs.select(col(idCol), tokenArray(col(textCol)).as("a")), idCol)

  private def rawBigramsFromTokens(base: DataFrame, idCol: String): DataFrame =
    base
      .where(size(col("a")) >= 2)
      .select(
        col(idCol),
        explode(
          transform(
            sequence(lit(1), size(col("a")) - 1),
            i => struct(element_at(col("a"), i).as("w1"), element_at(col("a"), i + 1).as("w2"))
          )
        ).as("b")
      )
      .select(col(idCol), col("b.w1").as("w1"), col("b.w2").as("w2"))

  /** Fit the model: one vocabulary-bounded aggregation (partial
    * aggregation collapses to bigram TYPES before the exchange) plus
    * one driver scalar (the vocabulary count, not the corpus).
    */
  def train(docs: DataFrame, idCol: String, textCol: String, k: Double = 0.5): BigramLm =
    trainTokens(docs.select(col(idCol), tokenArray(col(textCol)).as("a")), idCol, "a", k)

  /** [[train]] over a PRE-TOKENIZED relation (idCol, tokensCol) — the
    * composition entry point (see [[Dedup.spanDedupTokens]]): a pipeline
    * that also span-screens or packs tokenizes the corpus ONCE and feeds
    * every stage the same relation.
    */
  def trainTokens(toks: DataFrame, idCol: String, tokensCol: String, k: Double = 0.5): BigramLm = {
    val base = toks.select(col(idCol), col(tokensCol).as("a"))
    // checkpointed: the model relation is read ≥3 times downstream (uni
    // folds from it, the broadcast byte-sizing rollup scans it, the
    // scoring join probes it) — without the checkpoint every read
    // re-runs the corpus-scale bigram aggregation. Vocabulary-bounded
    // rows; blocks released by the ContextCleaner (repo convention).
    val bic = rawBigramsFromTokens(base, idCol)
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
      .localCheckpoint(true)
    // first-position counts fold out of the bigram-type counts — the
    // input here is the vocabulary-bounded model, NOT a second expansion
    // of the corpus (c(w1,·) = Σ_w2 c(w1,w2) exactly)
    val uni = bic.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val v = base
      .select(explode(col("a")).as("tok"))
      .agg(countDistinct(col("tok")))
      .head()
      .getLong(0)
    BigramLm(bic, uni, v, k)
  }

  /** Score documents under a (possibly separately-trained) model.
    *
    * Output: (idCol, n_bigrams, lm_score, ppl), one row per input doc;
    * documents with fewer than two tokens carry n_bigrams=0 and null
    * score/ppl (nothing to condition on). Bigrams/unigrams the model
    * never saw coalesce to count 0 — add-k smoothing stays well-defined
    * on out-of-corpus text (P = k / (0 + k·V) at worst).
    *
    * P(w2|w1) = (c(w1,w2) + k) / (c(w1,·) + k·V) with c(w1,·) the
    * first-position count (so probabilities sum to 1 over the observed
    * vocabulary) and V the training corpus distinct-token count.
    */
  def scoreWith(model: BigramLm, docs: DataFrame, idCol: String, textCol: String): DataFrame =
    scoreWithTokens(model, docs.select(col(idCol), tokenArray(col(textCol)).as("a")), idCol, "a")

  /** [[scoreWith]] over a PRE-TOKENIZED relation (idCol, tokensCol). */
  def scoreWithTokens(
      model: BigramLm, toks: DataFrame, idCol: String, tokensCol: String): DataFrame = {
    val base = toks.select(col(idCol), col(tokensCol).as("a"))
    // STATIC broadcast of the model sides when vocabSize — a driver
    // scalar the model already carries — proves them bounded: uni rows
    // ≤ vocab, bic rows ≤ vocab², so each side broadcasts iff its
    // worst-case payload fits the dedup broadcast budget. Leaving this
    // to AQE is not free: AQE only re-plans after the leaf exchanges
    // MATERIALIZE, so the corpus-scale bigram relation pays its two
    // full shuffle WRITES (on (w1,w2) then on (w1) — measured 330 MB
    // at the 100× tier, 10×/decade) before the runtime flip; the
    // static hint removes both writes. A production corpus whose
    // unbounded vocabulary fails the check keeps the linear SMJ — the
    // honest plan once the model genuinely outgrows executor memory
    // (CCNet-style pipelines bound the vocab precisely to avoid this).
    val budget = Dedup.sigBroadcastBudget(toks.sparkSession)
    // Sides sized by MEASURED bytes (the Decontaminate.verifySide
    // convention), not rows × an assumed width: a long-token vocabulary
    // near the row ceiling would otherwise broadcast far past the byte
    // budget (driver-collect / executor-memory risk). The rollup scans
    // the vocabulary-bounded model relations (bic is checkpointed at
    // train — never the corpus); a 16 B/row floor on the driver-scalar
    // vocabSize skips even that for models that cannot possibly fit.
    def measuredBytes(df: DataFrame, payload: org.apache.spark.sql.Column): Long =
      df.agg(coalesce(sum(payload.cast(LongType) + lit(48L)), lit(0L))).head().getLong(0)
    val uniFits = model.vocabSize > 0 && model.vocabSize <= budget / 16L &&
      measuredBytes(model.uni, octet_length(col("w1"))) <= budget
    val bicFits = uniFits && model.vocabSize <= math.sqrt(budget / 16.0).toLong &&
      measuredBytes(model.bic, octet_length(col("w1")) + octet_length(col("w2"))) <= budget
    val bicSide = if (bicFits) broadcast(model.bic) else model.bic
    val uniSide = if (uniFits) broadcast(model.uni) else model.uni
    // raw occurrences join the model, then roll up straight to doc_id:
    // partial aggregation collapses map-side because a document's
    // bigrams are scan-contiguous — the exchange carries ~|docs| rows,
    // never a row per token
    val scored = rawBigramsFromTokens(base, idCol)
      .join(bicSide, Seq("w1", "w2"), "left")
      .join(uniSide, Seq("w1"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("nb"),
        sum(
          log((coalesce(col("c12"), lit(0L)).cast(DoubleType) + lit(model.k)) /
            (coalesce(col("c1"), lit(0L)).cast(DoubleType) + lit(model.k * model.vocabSize)))
        ).as("s")
      )
    base
      .select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("nb"), lit(0L)).as("n_bigrams"),
        round(col("s") / col("nb").cast(DoubleType), 6).as("lm_score"),
        round(exp(-col("s") / col("nb").cast(DoubleType)), 6).as("ppl")
      )
  }

  /** Per-document mean bigram log-likelihood under the corpus's own
    * bigram LM (train and score on the same relation — the d29 gate).
    */
  def bigramScore(docs: DataFrame, idCol: String, textCol: String, k: Double = 0.5): DataFrame =
    scoreWith(train(docs, idCol, textCol, k), docs, idCol, textCol)
}
