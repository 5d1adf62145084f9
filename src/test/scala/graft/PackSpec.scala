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
}
