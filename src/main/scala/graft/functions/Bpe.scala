package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trainable byte-pair-encoding subword tokenizer (the d23 operator):
  * learn a merge table on the corpus, apply it corpus-wide as a
  * compiled expression emitting subword pieces and token ids — the
  * `n_tokens` producer a production packing pipeline would budget with,
  * instead of the whitespace token count.
  *
  * Scale design, in two halves:
  *
  *  - TRAINING collapses the corpus to its distinct-word frequency
  *    table with ONE map-side-combinable groupBy (the same shape as
  *    d10's document-frequency aggregation — Zipf-skew-free keys), then
  *    truncates to the deterministic top-`topWords` head before the
  *    merge loop runs driver-side. The truncation is the same bounded
  *    -sample contract as [[graft.operators.Similarity]]'s Lloyd
  *    trainer: O(1) in corpus size, justified by Zipf — the head
  *    carries the overwhelming majority of token mass, so pair counts
  *    from the tail cannot change which merges win except in the far,
  *    low-impact tail of the merge sequence. A 100 TB corpus trains
  *    from the same ≤`topWords` rows as a 1 GB one.
  *  - APPLICATION is a pure map: [[graft.expressions.BpeEncode]] walks
  *    each document once with the learned ranks (greedy lowest-rank
  *    merging, the canonical BPE apply), memoizing word → pieces per
  *    partition (Zipf again: the cache hit rate IS the head mass). No
  *    shuffle, no UDF — a codegen'd expression holding the bounded
  *    model by reference.
  *
  * The merge loop itself indexes pair → affected words, so each merge
  * recounts only the words that contain it — O(affected · word length)
  * per merge, not O(vocabulary) (the naive full recount is the spec's
  * independent reference implementation).
  */
object Bpe {

  /** A learned model: `merges` in application order; `vocab` maps every
    * known piece (base characters + merge products) to a dense id,
    * assignment order = base chars sorted, then merges. Unknown pieces
    * at apply time (characters never seen in training) encode as
    * [[UnkId]].
    */
  final case class Model(merges: Seq[(String, String)], vocab: Map[String, Int]) {
    def codec: BpeCodec = new BpeCodec(merges.toArray)
  }

  val UnkId: Int = -1

  /** Learn `numMerges` merges from the corpus's top-`topWords` distinct
    * words by frequency (ties broken lexicographically — fully
    * deterministic, no sampling seed at all).
    */
  def train(
      docs: DataFrame,
      textCol: String,
      numMerges: Int,
      topWords: Int = 50000
  ): Model =
    trainTokens(docs.select(Text.tokens(col(textCol)).as("__graft_toks")),
      "__graft_toks", numMerges, topWords)

  /** [[train]] over a PRE-TOKENIZED relation (array&lt;string&gt; words) —
    * the token-space composition contract (p05 trains on the already-
    * scrubbed curation corpus without rebuilding text). Same
    * deterministic top-`topWords` histogram, same merge loop.
    */
  def trainTokens(
      toks: DataFrame,
      tokensCol: String,
      numMerges: Int,
      topWords: Int = 50000
  ): Model = {
    require(numMerges >= 0, "numMerges must be non-negative")
    require(topWords > 0, "topWords must be positive")
    val freqs: Array[(String, Long)] = toks
      .select(explode(col(tokensCol)).as("mot"))
      .groupBy(col("mot"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("mot"))
      .limit(topWords)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))

    // word -> current symbol sequence
    val words = freqs.map { case (w, _) => w.toCharArray.map(_.toString) }
    val wordFreq = freqs.map(_._2)

    // pair -> indices of words currently containing it (the merge-local
    // recount index)
    val occurs = new scala.collection.mutable.HashMap[(String, String),
      scala.collection.mutable.BitSet]()
    val pairCounts = new scala.collection.mutable.HashMap[(String, String), Long]()
    def countWord(i: Int, sign: Long): Unit = {
      val s = words(i)
      var j = 0
      while (j < s.length - 1) {
        val p = (s(j), s(j + 1))
        val c = pairCounts.getOrElse(p, 0L) + sign * wordFreq(i)
        if (c <= 0L) pairCounts.remove(p) else pairCounts.update(p, c)
        if (sign > 0) occurs.getOrElseUpdate(p, new scala.collection.mutable.BitSet()) += i
        j += 1
      }
    }
    words.indices.foreach(countWord(_, 1L))

    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var m = 0
    while (m < numMerges && pairCounts.nonEmpty) {
      // deterministic winner: max count, then lexicographically smallest
      // pair (both components) — no hash-iteration order dependence
      val best = pairCounts.foldLeft(null: ((String, String), Long)) { (acc, kv) =>
        if (acc == null) kv
        else {
          val cmp = java.lang.Long.compare(kv._2, acc._2)
          val better = cmp > 0 || (cmp == 0 && {
            val c1 = kv._1._1.compareTo(acc._1._1)
            c1 < 0 || (c1 == 0 && kv._1._2.compareTo(acc._1._2) < 0)
          })
          if (better) kv else acc
        }
      }._1
      merges += best
      val affected = occurs.getOrElse(best, scala.collection.mutable.BitSet.empty).toArray
      val joined = best._1 + best._2
      affected.foreach { i =>
        countWord(i, -1L) // retract this word's pairs
        val s = words(i)
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < s.length) {
          if (j < s.length - 1 && s(j) == best._1 && s(j + 1) == best._2) {
            out += joined; j += 2
          } else { out += s(j); j += 1 }
        }
        words(i) = out.toArray
        countWord(i, 1L) // re-add with the merge applied
      }
      occurs.remove(best)
      m += 1
    }

    val baseChars = freqs.iterator.flatMap(_._1.toCharArray).map(_.toString).toSeq
      .distinct.sorted
    val pieces = baseChars ++ merges.map(p => p._1 + p._2)
    Model(merges.toSeq, pieces.distinct.zipWithIndex.toMap)
  }

  /** Persist a trained model as a two-relation parquet store (merges
    * in application order + the piece vocabulary) — the tokenizer
    * PUBLISH step of a production pipeline (the AnnIndex store
    * convention: train once, freeze, every later batch encodes with
    * the stored model). Both relations are model-bounded
    * (≤ base chars + numMerges pieces), never corpus-scale.
    */
  def writeModel(spark: org.apache.spark.sql.SparkSession, model: Model, dir: String): Unit = {
    import spark.implicits._
    model.merges.zipWithIndex
      .map { case ((g, d), i) => (i, g, d) }.toDF("rang", "gauche", "droite")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/merges")
    model.vocab.toSeq.toDF("piece", "id")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/vocab")
  }

  /** Load a published model — driver-direct parquet read
    * (graft.sources.DriverParquet, the AnnIndex.readModel convention):
    * both relations are model-bounded, and the former two
    * spark.read...collect() actions were plan/schedule round trips the
    * per-batch encode paths paid on every call.
    */
  def readModel(spark: org.apache.spark.sql.SparkSession, dir: String): Model = {
    import graft.sources.DriverParquet
    val conf = spark.sparkContext.hadoopConfiguration
    val merges = DriverParquet.rows(conf, s"$dir/merges")
      .map(g => (DriverParquet.int(g, "rang"),
        DriverParquet.string(g, "gauche"), DriverParquet.string(g, "droite")))
      .sortBy(_._1).map(r => (r._2, r._3))
    val vocab = DriverParquet.rows(conf, s"$dir/vocab")
      .map(g => (DriverParquet.string(g, "piece"), DriverParquet.int(g, "id"))).toMap
    Model(merges, vocab)
  }

  /** Subword pieces per word: array&lt;array&lt;string&gt;&gt; — one inner
    * array per whitespace word, inner concat reconstructs the word
    * exactly (the losslessness the d23 oracle hash-checks).
    */
  def encodePieces(model: Model, text: Column): Column =
    org.apache.spark.sql.graft.TextExpr.bpeEncode(Text.tokens(text), model.codec)

  /** Flat token ids (vocab lookup over the flattened pieces; unknown
    * pieces — unseen base characters — become [[UnkId]]).
    */
  def encodeIds(model: Model, text: Column): Column = {
    val vm = typedLit(model.vocab)
    transform(flatten(encodePieces(model, text)),
      p => coalesce(element_at(vm, p), lit(UnkId)))
  }

  /** BPE token count — the packing-budget `n_tokens` producer. */
  def tokenCount(model: Model, text: Column): Column =
    size(flatten(encodePieces(model, text)))

  /** The reserved word-separator id: one past the learned vocabulary —
    * the id-stream twin of the space character. [[encodeIds]]' flat
    * stream loses word boundaries (pieces concatenate, but where one
    * word ends is gone); a trainer-consumable id stream must be
    * losslessly decodable, so [[encodeIdStream]] interleaves this id
    * between words exactly as the text put spaces there.
    */
  def sepId(model: Model): Int = model.vocab.size

  /** The serializable apply-side ID codec: merges + vocab + the
    * reserved separator, shipped into the compiled stream expressions
    * as ONE codegen reference object (the BpeCodec pattern — the
    * interpreted transform/element_at(map) formulation this replaces
    * evaluated a lambda and a map probe per corpus PIECE, ~2× the d39
    * shard-emit cell at the 100× stress tier).
    */
  def idCodec(model: Model): BpeIdCodec =
    new BpeIdCodec(model.codec, model.vocab.toArray, sepId(model))

  /** Flat DECODABLE id stream: each word's piece ids, with [[sepId]]
    * between consecutive words (none at either end — exactly the
    * single-space join [[detokenize]] performs). Empty/blank text
    * encodes as the empty array. Unknown pieces become [[UnkId]] and
    * make that document's stream lossy — count them before shipping
    * shards (a training corpus re-trains the tokenizer instead).
    * Compiled (BpeEncodeIdStream): one kernel pass per document.
    */
  def encodeIdStream(model: Model, text: Column): Column =
    org.apache.spark.sql.graft.TextExpr
      .bpeEncodeIdStream(Text.tokens(text), idCodec(model))

  /** Exact inverse of [[encodeIdStream]] for unk-free streams: ids map
    * back to their pieces, the separator to a single space, and the
    * concatenation IS the whitespace-normalized text. Compiled
    * (BpeDecodeIdStream); an [[UnkId]] in the stream fails loudly.
    */
  def decodeIdStream(model: Model, ids: Column): Column =
    org.apache.spark.sql.graft.TextExpr.bpeDecodeIdStream(ids, idCodec(model))

  /** Reconstruction from pieces: words re-joined with single spaces —
    * equals the whitespace-normalized input whenever encoding is
    * lossless.
    */
  def detokenize(pieces: Column): Column =
    array_join(transform(pieces, w => array_join(w, "")), " ")

  /** The learned vocabulary as a DataFrame (id, piece) — the artifact a
    * training run stores beside its shards.
    */
  def vocabDf(spark: org.apache.spark.sql.SparkSession, model: Model): DataFrame = {
    import spark.implicits._
    model.vocab.toSeq.map { case (p, i) => (i, p) }.sortBy(_._1).toDF("id", "piece")
  }
}

/** The serializable apply-side model: greedy lowest-rank merging with a
  * per-executor-instance memo (word → pieces). Shared by the compiled
  * expression via `addReferenceObj`.
  */
final class BpeCodec(val merges: Array[(String, String)]) extends Serializable {

  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val h = new java.util.HashMap[String, Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) {
      // NUL (\u0000) never occurs inside a piece (pieces come from text that
      // tokenized on whitespace); safe composite key
      h.put(merges(i)._1 + "\u0000" + merges(i)._2, i); i += 1
    }
    h
  }

  // Zipf makes the hit rate the head mass; the bound keeps a
  // pathological all-distinct corpus from growing the memo without
  // limit. Concurrent: one codec instance serves every task thread in
  // the executor JVM.
  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
  private val MemoBound = 65536

  def encodeWord(w: String): Array[String] = {
    val hit = memo.get(w)
    if (hit != null) return hit
    var s: Array[String] = w.toCharArray.map(_.toString)
    var done = false
    while (!done && s.length > 1) {
      // lowest-rank adjacent pair present in the word
      var bestRank = Int.MaxValue
      var j = 0
      while (j < s.length - 1) {
        val r = ranks.get(s(j) + "\u0000" + s(j + 1))
        if (r != null && r < bestRank) bestRank = r
        j += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        val (a, b) = merges(bestRank)
        val out = new scala.collection.mutable.ArrayBuffer[String](s.length)
        var i = 0
        while (i < s.length) {
          if (i < s.length - 1 && s(i) == a && s(i + 1) == b) { out += a + b; i += 2 }
          else { out += s(i); i += 1 }
        }
        s = out.toArray
      }
    }
    if (memo.size >= MemoBound) memo.clear()
    memo.put(w, s)
    s
  }
}

/** The serializable id-stream codec: [[BpeCodec]] word→pieces plus a
  * dense piece→id vocabulary and the reserved word-separator id. One
  * instance ships per plan as a codegen reference object and serves
  * every task thread (lazy transient lookup structures, the BpeCodec
  * concurrency contract).
  */
final class BpeIdCodec(
    val codec: BpeCodec,
    vocabEntries: Array[(String, Int)],
    val sepId: Int
) extends Serializable {

  @transient private lazy val vocab: java.util.HashMap[String, Integer] = {
    val h = new java.util.HashMap[String, Integer](vocabEntries.length * 2)
    vocabEntries.foreach { case (p, i) => h.put(p, i) }
    h
  }

  @transient private lazy val piecesById: Array[String] = {
    val a = new Array[String](vocabEntries.length)
    vocabEntries.foreach { case (p, i) => a(i) = p }
    a
  }

  /** Piece ids of one word (unknown piece → [[Bpe.UnkId]]). */
  def idsOf(word: String): Array[Int] = {
    val pieces = codec.encodeWord(word)
    val out = new Array[Int](pieces.length)
    var i = 0
    while (i < pieces.length) {
      val id = vocab.get(pieces(i))
      out(i) = if (id == null) Bpe.UnkId else id.intValue()
      i += 1
    }
    out
  }

  /** Piece text of one id; the separator and unknowns are the CALLER's
    * cases (decode maps sep → space and refuses unknowns loudly).
    */
  def pieceOf(id: Int): String =
    if (id >= 0 && id < piecesById.length) piecesById(id) else null
}
