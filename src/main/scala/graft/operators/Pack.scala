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
  * range-partition on the order key (distributed sort; deterministic
  * per-partition-seed sampling picks the boundaries), aggregate ONE
  * narrow (partition, token-total) row per partition to the driver,
  * and convert to per-partition starting offsets broadcast back into a
  * within-partition cumulative window — every partition computes its
  * documents' global offsets in parallel from its own prefix. Token
  * counting is the compiled tokenizer (pure map), and it runs before
  * the range exchange, so BOTH passes shuffle only (doc_id, n_tokens) —
  * the text never moves. The per-partition totals job re-derives the
  * narrow shuffle input once (recomputing a compiled map kernel beats
  * caching a corpus-scale intermediate — the same trade as the chunk
  * dedup frequency pass).
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
  ): DataFrame = {
    require(seqTokens > 0, "seqTokens must be positive")
    require(startOffset >= 0, "startOffset must be non-negative")
    val spark = docs.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    // EXPLICIT partition count, deliberately: a user-numbered
    // repartition (REPARTITION_BY_NUM) is exempt from AQE partition
    // coalescing, so the totals job and the main job — two separate
    // executions of this exchange — are guaranteed the same
    // pid→key-range mapping. A column-only repartitionByRange would be
    // AQE-coalescible, and the two jobs could then disagree on pid,
    // silently corrupting every offset.
    val counted = docs
      .select(col(idCol).as("doc_id"), Text.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .repartitionByRange(parts, col("doc_id"))
      .withColumn("pid", spark_partition_id())
    // one narrow row per partition to the driver; running prefix gives
    // each partition's starting global token offset
    val totals = counted
      .groupBy(col("pid"))
      .agg(sum(col("n_tokens")).as("t"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    val offsets = totals
      .scanLeft((0, 0L)) { case ((_, acc), (pid, t)) => (pid, acc + t) }
      .init // scanLeft emits the seed plus one entry per element; the
      .zip(totals) // i-th prefix pairs with the i-th partition's pid
      .map { case ((_, off), (pid, _)) => (pid, off) }
    val offDf = broadcast(
      spark.createDataFrame(offsets.toSeq).toDF("pid", "part_offset"))
    // startOffset: resume packing AFTER an already-packed prefix of the
    // stream (the incremental-ingest continuation — see
    // streaming/IngestPack); 0 packs from the stream origin
    val cum = sum(col("n_tokens"))
      .over(Window.partitionBy(col("pid")).orderBy(col("doc_id"))) +
      col("part_offset") + lit(startOffset)
    counted
      .join(offDf, Seq("pid"))
      .withColumn("cum", cum)
      .select(Seq(col("doc_id"), col("n_tokens")) ++ seqRange(seqTokens): _*)
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
