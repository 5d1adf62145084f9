package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the LLM-data-pipeline tier.
  *
  * All built from codegen'd built-ins (split/transform/aggregate/xxhash64)
  * — no UDFs, so every expression stays inside WholeStageCodegen and runs
  * identically at any scale (pure per-row work, no shuffle).
  */
object Text {

  /** Whitespace tokenization; NULL and empty/blank text both give an
    * empty array — NULL must not propagate, because a null token array
    * turns `size()` into -1 under the default non-ANSI config and a
    * single dirty row would then silently corrupt any running total
    * built on token counts (the packing prefix sum, decontamination
    * gram totals).
    */
  def tokens(text: Column): Column =
    when(text.isNull || length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Contiguous word n-gram shingles (space-joined), deduplicated.
    * The canonical unit for MinHash / Jaccard near-dup detection.
    * Compiled ShinglesOf expression — the array_distinct(transform(...))
    * formulation it replaces evaluated interpreted per element, which
    * dominated exact-Jaccard verification once candidate docs numbered
    * in the thousands.
    */
  def shingles(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.TextExpr.shinglesOf(tokens(text), n)

  /** Contiguous word n-grams over an ALREADY-TOKENIZED column, with
    * multiplicity (unlike [[shingles]], which dedupes) — the unit for
    * corpus frequency statistics / vocabulary building. Compiled
    * NgramsOf expression: the transform(sequence(...)) HOF it replaces
    * evaluated an interpreted lambda per gram, which dominated the
    * vocabulary-building passes at the 100× stress.
    */
  def ngramsAll(tokenCol: Column, n: Int): Column =
    org.apache.spark.sql.graft.TextExpr.ngramsOf(tokenCol, n)

  /** Non-overlapping token chunks of `width` tokens (space-joined), full
    * chunks only — the paragraph-dedup unit for corpora whose documents
    * carry no structural separators. floor(n/width) chunks per doc,
    * pure map. Compiled ChunksOf expression (the transform(sequence)
    * HOF it replaces ran an interpreted lambda per chunk).
    */
  def chunks(tokenCol: Column, width: Int): Column =
    org.apache.spark.sql.graft.TextExpr.chunksOf(tokenCol, width)

  /** Exact Jaccard similarity of two shingle-set columns. */
  def jaccard(a: Column, b: Column): Column = {
    val union = size(array_union(a, b))
    when(union === 0, lit(0.0))
      .otherwise(size(array_intersect(a, b)).cast("double") / union.cast("double"))
  }

  /** Array of k MinHash signature components over a TOKEN array (min of
    * per-seed shingle hashes) — delegates to the MinHashSig custom
    * expression: one string hash per shingle + k cheap long mixes, pure
    * map, no shuffle (the interpreted higher-order fold it replaced ran
    * k·|shingles| lambda steps per row).
    */
  def minhashSignature(tokenCol: Column, n: Int, k: Int): Column =
    org.apache.spark.sql.graft.TextExpr.minhashSig(tokenCol, n, k)

  /** SimHash-64: per token, xxhash64 sets/clears each bit weighted ±1;
    * the sign of each accumulated bit weight forms the fingerprint.
    * Returned as BIGINT (may be negative — bit 63 is the sign bit).
    * Custom expression: the HOF fold interprets 64·|tokens| lambda calls
    * per row.
    */
  def simhash64(tokenCol: Column): Column =
    org.apache.spark.sql.graft.TextExpr.simhash64(tokenCol)

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** MD5-based SimHash as a 64-char bit string — same semantics as
    * [[simhash64]] but defined over md5 so any engine can reproduce it
    * (the cross-engine-verifiable flavor; xxhash64 keeps the fast path).
    */
  def md5SimhashBits(tokenCol: Column): Column =
    org.apache.spark.sql.graft.TextExpr.md5SimhashBits(tokenCol)

  /** Chained rolling-hash fingerprint over the token stream — a cheap
    * order-sensitive document identity (same tokens reordered hash apart,
    * unlike MinHash). acc' = xxhash64(acc, token): overflow-free under
    * ANSI mode, loop-compiled as a custom expression.
    */
  def rollingFingerprint(tokenCol: Column): Column =
    org.apache.spark.sql.graft.TextExpr.rollingHash(tokenCol)

  /** Winnowing-style fingerprint: the w smallest distinct n-gram shingle
    * hashes of the token array, ascending — a compact sketch for
    * containment checks.
    */
  def winnowFingerprint(tokenCol: Column, n: Int, w: Int): Column =
    org.apache.spark.sql.graft.TextExpr.winnowSketch(tokenCol, n, w)

  // ------------------------------------------------------------------
  // Quality scoring / language ID (n-gram + stopword heuristics).
  // ------------------------------------------------------------------

  /** Count of regex matches in text (non-overlapping). */
  def matchCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** PII redaction (CCNet-style scrub): the pattern classes, their
    * placeholders, and the one scrub order that makes them compose.
    * Patterns stay in the Java∩RE2 common dialect (no lookaround, no
    * backrefs, ASCII classes only) so a DuckDB oracle applies the
    * IDENTICAL rewrite. Order is load-bearing:
    *   email → phone → ip → number
    * — emails contain dots and digits (must go before everything);
    * dotted phones (5+ groups, FR style) must beat the IP quad or
    * `06.12.34.56.78` loses its first four groups to `<IP>`; the
    * phone shapes are chosen so a dotted QUAD can never match them
    * (dotted needs ≥ 5 groups, hyphenated quads aren't IPs), so
    * phone-before-ip steals nothing; and everything contains plain
    * digit runs, so `number` goes last. Each placeholder is
    * digit-free, so a later class never re-matches an earlier
    * replacement. Pure map — codegen'd regexp kernels, no shuffle at
    * any corpus size.
    */
  object Pii {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
    val ip = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
    /** Separator-delimited digit groups, three shapes: a +CC prefix
      * admits any group sizes (+33-6-12-34-56-78); bare hyphenated
      * needs three or more 2-4 digit groups (555-867-5309); bare
      * dotted needs five or more (06.12.34.56.78) so version strings
      * (v1.2.3), ranges (10-20) and IP quads stay untouched.
      */
    val phone = "\\+[0-9]{1,3}([-.][0-9]{1,4})+|" +
      "[0-9]{2,4}(-[0-9]{2,4}){2,}|" +
      "[0-9]{2,4}(\\.[0-9]{2,4}){4,}"
    val number = "[0-9]+"
    /** (pattern, placeholder) in scrub order. */
    val classes: Seq[(String, String)] = Seq(
      email -> "<EMAIL>", phone -> "<TEL>", ip -> "<IP>", number -> "<NUM>")
  }

  /** Text with all [[Pii]] classes redacted, in scrub order. */
  def piiScrub(text: Column): Column =
    Text.Pii.classes.foldLeft(text) { case (t, (p, mark)) =>
      regexp_replace(t, p, mark)
    }

  /** The six counters of [[langScores]]/[[qualityScore]] in ONE compiled
    * text scan (en/fr/de/es stopword hits, CJK chars, punctuation) —
    * regex-equivalent by construction; the five separate
    * regexp_extract_all passes it replaces each re-walked the document
    * (2.9×/decade at the 100× stress).
    */
  private def langCounts(text: Column): Column =
    org.apache.spark.sql.graft.TextExpr.langQualityCounts(text)

  /** Per-language stopword-density scores; CJK by unicode-range density. */
  def langScores(text: Column): Column = {
    val k = langCounts(text)
    val nTok = greatest(tokenCount(text), lit(1)).cast("double")
    struct(
      (element_at(k, 1).cast("double") / nTok).as("en"),
      (element_at(k, 2).cast("double") / nTok).as("fr"),
      (element_at(k, 3).cast("double") / nTok).as("de"),
      (element_at(k, 4).cast("double") / nTok).as("es"),
      (element_at(k, 5).cast("double") /
        greatest(length(text), lit(1)).cast("double")).as("zh")
    )
  }

  /** argmax of langScores with deterministic tiebreak (field order);
    * 'und' when every score is zero.
    */
  def langGuess(text: Column): Column = {
    val s = langScores(text)
    val best = greatest(s("en"), s("fr"), s("de"), s("es"), s("zh"))
    when(best === 0, lit("und"))
      .when(s("en") === best, lit("en"))
      .when(s("fr") === best, lit("fr"))
      .when(s("de") === best, lit("de"))
      .when(s("es") === best, lit("es"))
      .otherwise(lit("zh"))
  }

  /** Heuristic document quality in [0,1]: length band, punctuation
    * density, stopword presence, mean token length band — the classic
    * pre-training corpus filters (Gopher-style rules).
    */
  def qualityScore(text: Column): Column = {
    val k = langCounts(text)
    val nChar = length(text).cast("double")
    val nTok = tokenCount(text).cast("double")
    val meanTokLen = when(nTok > 0, (nChar - (nTok - 1)) / nTok).otherwise(lit(0.0))
    val punctRatio = element_at(k, 6).cast("double") / greatest(nChar, lit(1.0))
    val stopRatio = element_at(k, 1).cast("double") / greatest(nTok, lit(1.0))
    val lenOk = when(nTok >= 10 && nTok <= 100000, lit(1.0)).otherwise(lit(0.0))
    val tokLenOk = when(meanTokLen >= 2 && meanTokLen <= 12, lit(1.0)).otherwise(lit(0.0))
    val punctOk = when(punctRatio <= 0.2, lit(1.0)).otherwise(lit(0.0))
    val stopBonus = when(stopRatio > 0, lit(1.0)).otherwise(lit(0.0))
    round((lenOk + tokLenOk + punctOk + stopBonus) / 4.0, 6)
  }

  /** Gopher-style repetition counters over a TOKEN array, one compiled
    * in-row pass: [n_tokens, top-token count, n_bigrams, top-bigram
    * count, duplicated-bigram instances]. The repetition family of
    * quality filters (most-common-word fraction, top-2-gram fraction,
    * duplicate-2-gram fraction) derives directly; a per-doc statistic
    * computed in-row, never via a corpus-wide (doc, gram) shuffle.
    */
  def repetitionCounts(tokenCol: Column): Column =
    org.apache.spark.sql.graft.TextExpr.repetitionCounts(tokenCol)
}
