package graft

import org.apache.spark.sql.functions._
import graft.functions.{Bpe, Text}
import graft.sources.Tables

/** Trainable BPE (d23): the indexed distributed-count trainer and the
  * compiled apply expression, pinned against an INDEPENDENT naive
  * reference implementation (full pair recount every iteration, plain
  * Scala collections — shares no code with Bpe.train/BpeCodec).
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // -- independent reference implementation ------------------------------

  /** Naive BPE train: recount ALL pairs each iteration. */
  private def refTrain(wordFreq: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    var words: Seq[(Seq[String], Long)] =
      wordFreq.map { case (w, f) => (w.map(_.toString): Seq[String], f) }
    val merges = Seq.newBuilder[(String, String)]
    var m = 0
    var continue = true
    while (m < numMerges && continue) {
      val counts = new scala.collection.mutable.HashMap[(String, String), Long]()
      for ((s, f) <- words; j <- 0 until s.length - 1)
        counts((s(j), s(j + 1))) = counts.getOrElse((s(j), s(j + 1)), 0L) + f
      if (counts.isEmpty) continue = false
      else {
        // same deterministic tiebreak as the trainer: count desc, then
        // lexicographic pair
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.map { case (s, f) => (refMergeOnce(s, best), f) }
        m += 1
      }
    }
    merges.result()
  }

  private def refMergeOnce(s: Seq[String], p: (String, String)): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < s.length) {
      if (i < s.length - 1 && s(i) == p._1 && s(i + 1) == p._2) { out += p._1 + p._2; i += 2 }
      else { out += s(i); i += 1 }
    }
    out.result()
  }

  /** Naive apply: run the merges in learned order, each to fixpoint in
    * sequence order (equivalent to greedy lowest-rank: rank order IS
    * merge order, and earlier merges can never be re-enabled by later
    * ones applying).
    */
  private def refEncode(w: String, merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(w.map(_.toString): Seq[String]) { (s, p) =>
      var cur = s
      var prev: Seq[String] = null
      while (prev != cur) { prev = cur; cur = refMergeOnce(cur, p) }
      cur
    }

  // -- specs --------------------------------------------------------------

  test("hand-checkable corpus: merge sequence and encodings match the worked example") {
    // 'abab' x10, 'abc' x5 -> pairs: (a,b)=25, (b,a)=10, (b,c)=5
    // merge1 = (a,b); then 'ab ab' x10 -> (ab,ab)=10, 'ab c' -> (ab,c)=5
    // merge2 = (ab,ab); merge3 = (ab,c)
    val docs = (Seq.fill(10)("abab") ++ Seq.fill(5)("abc")).zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val model = Bpe.train(docs, "text", numMerges = 3)
    assert(model.merges == Seq(("a", "b"), ("ab", "ab"), ("ab", "c")))
    val codec = model.codec
    assert(codec.encodeWord("abab").toSeq == Seq("abab"))
    assert(codec.encodeWord("abc").toSeq == Seq("abc")) // (a,b) then (ab,c)
    // greedy lowest rank: [ab,ab,c] takes (ab,ab) rank 1 over (ab,c)
    // rank 2, and (abab,c) was never learned
    assert(codec.encodeWord("ababc").toSeq == Seq("abab", "c"))
    assert(codec.encodeWord("xbc").toSeq == Seq("x", "b", "c")) // unseen char passes through
    // vocab: base chars sorted first, then merge products, dense ids
    assert(model.vocab("a") == 0 && model.vocab("b") == 1 && model.vocab("c") == 2)
    assert(model.vocab("ab") == 3 && model.vocab("abab") == 4 && model.vocab("abc") == 5)
  }

  test("trainer == independent naive reference on the documents fixture") {
    val docs = Tables.documents(spark, sfDir)
    val wordFreq = docs
      .select(explode(Text.tokens(col("text"))).as("mot"))
      .groupBy("mot").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("mot")).limit(500)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val fast = Bpe.train(docs, "text", numMerges = 120, topWords = 500)
    val slow = refTrain(wordFreq, 120)
    assert(fast.merges == slow, "indexed trainer must learn the exact naive merge sequence")
  }

  test("compiled expression == naive apply on fixture docs; reconstruction lossless; ids consistent") {
    val docs = Tables.documents(spark, sfDir)
    val model = Bpe.train(docs, "text", numMerges = 120, topWords = 500)
    val sample = docs.orderBy("doc_id").limit(40)
      .select(col("doc_id"), col("text"), Bpe.encodePieces(model, col("text")).as("p"),
        Bpe.encodeIds(model, col("text")).as("ids"))
      .collect()
    for (r <- sample) {
      val text = r.getString(1)
      val words = text.trim.split("\\s+").filter(_.nonEmpty).toSeq
      val got = r.getSeq[scala.collection.Seq[String]](2).map(_.toSeq)
      assert(got == words.map(w => refEncode(w, model.merges)),
        s"doc ${r.getLong(0)} pieces diverge from the reference apply")
      // lossless: inner concat rebuilds each word
      assert(got.map(_.mkString) == words)
      // ids are the vocab lookup of the flattened pieces
      val ids = r.getSeq[Int](3)
      assert(ids == got.flatten.map(p => model.vocab.getOrElse(p, Bpe.UnkId)))
    }
  }

  test("encodeIdStream/decodeIdStream: lossless round trip with word boundaries; sep id reserved") {
    val docs = Tables.documents(spark, sfDir)
    val model = Bpe.train(docs, "text", numMerges = 120, topWords = 500)
    assert(Bpe.sepId(model) == model.vocab.size &&
      !model.vocab.values.exists(_ == Bpe.sepId(model)))
    val sample = docs.orderBy("doc_id").limit(40)
      .select(col("text"),
        Bpe.encodeIdStream(model, col("text")).as("s"),
        Bpe.decodeIdStream(model, Bpe.encodeIdStream(model, col("text"))).as("d"))
      .collect()
    for (r <- sample) {
      val norm = r.getString(0).trim.split("\\s+").filter(_.nonEmpty).mkString(" ")
      // decode is the exact whitespace-normalized inverse — the property
      // the flat encodeIds stream CANNOT offer (boundaries lost)
      assert(r.getString(2) == norm)
      // separator count = word count - 1 (none at the ends)
      val stream = r.getSeq[Int](1)
      val nWords = if (norm.isEmpty) 0 else norm.split(" ").length
      assert(stream.count(_ == Bpe.sepId(model)) == math.max(0, nWords - 1))
      if (norm.isEmpty) assert(stream.isEmpty)
    }
  }

  test("deterministic across runs; n_tokens producer plugs into packing budgets") {
    val docs = Tables.documents(spark, sfDir)
    def m() = Bpe.train(docs, "text", numMerges = 60, topWords = 300)
    val m1 = m(); val m2 = m()
    assert(m1.merges == m2.merges && m1.vocab == m2.vocab)
    // BPE token counts are a valid n_tokens source: non-negative, zero
    // iff the doc has no words, and ≥ word count (pieces split words)
    val stats = docs.select(
      Text.tokenCount(col("text")).as("nw"),
      Bpe.tokenCount(m1, col("text")).as("nb")).collect()
    stats.foreach { r =>
      val (nw, nb) = (r.getInt(0), r.getInt(1))
      assert(nb >= nw && (nb == 0) == (nw == 0))
    }
  }
}
