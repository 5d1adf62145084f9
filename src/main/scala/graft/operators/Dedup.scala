package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
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

  /** Exact dedup on a key expression (default: the full text). Keeps the
    * smallest id per group — deterministic winner, unlike dropDuplicates
    * (whose survivor is partition-order dependent).
    */
  def exact(docs: DataFrame, idCol: String, keyCol: Column): DataFrame =
    docs
      .groupBy(keyCol.as("dedup_key"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** MinHash + LSH near-duplicate pairs.
    *
    * shingle(n) → k-signature → b bands of r = k/b rows → exploded band
    * buckets → self equi-join on (band, bucket hash) → exact-Jaccard
    * verification ≥ threshold. Probability a pair at Jaccard s collides:
    * 1-(1-s^r)^b; defaults (k=64, b=16, r=4) catch s ≥ 0.5 with ~87%+
    * per-band union. Candidates are deduplicated before verification.
    */
  def minhashLsh(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      k: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5
  ): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    val sh = docs
      .select(col(idCol).as("doc_id"), Text.shingles(col(textCol), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)

    // Signature via explode + k parallel min-hash aggregates: stays in
    // WholeStageCodegen end-to-end (the per-row higher-order-function
    // formulation in Text.minhashSignature evaluates k·|shingles|
    // interpreted lambda steps — ~100x slower on large corpora) and gets
    // map-side partial combine for free, so the shuffle carries one
    // k-long row per (doc, partition), not per shingle.
    val exploded = sh.select(col("doc_id"), explode(col("sh")).as("s"))
    val sigAggs = (0 until k).map(i => min(xxhash64(lit(i), col("s"))).as(s"h$i"))
    val withSig = exploded
      .groupBy(col("doc_id"))
      .agg(sigAggs.head, sigAggs.tail: _*)
      .select(col("doc_id"), array((0 until k).map(i => col(s"h$i")): _*).as("sig"))

    val buckets = withSig.select(
      col("doc_id"),
      explode(
        transform(
          sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"), xxhash64(b, slice(col("sig"), b * r + 1, lit(r))).as("bucket"))
        )
      ).as("bb")
    )
    val l = buckets.select(col("doc_id").as("id_a"), col("bb"))
    val rr = buckets.select(col("doc_id").as("id_b"), col("bb"))
    val candidates = l
      .join(rr, Seq("bb"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()

    candidates
      .join(sh.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sh", "sh_a"), Seq("id_a"))
      .join(sh.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sh", "sh_b"), Seq("id_b"))
      .withColumn("jaccard", round(Text.jaccard(col("sh_a"), col("sh_b")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
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
      explode(
        transform(
          sequence(lit(0), lit(chunks - 1)),
          c =>
            struct(
              c.as("chunk"),
              call_function("shiftright", col("simhash"), c * width)
                .bitwiseAND(lit((1L << width) - 1))
                .as("ckey")
            )
        )
      ).as("blk")
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
    minhashLsh(docs, idCol, textCol, shingleN = n, threshold = threshold)

  /** Embedding near-duplicate pairs: cosine ≥ threshold, candidates from
    * multi-table hyperplane-LSH buckets — no cross join. Shuffles
    * O(n · nTables) bucket rows; verification runs on candidate pairs
    * only. nBits controls precision (bucket size ≈ n / 2^nBits per
    * table), nTables recall (1 − (1 − p^nBits)^nTables).
    */
  def embeddingNearDup(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double = 0.95,
      nBits: Int = 8,
      nTables: Int = 8
  ): DataFrame = {
    import graft.functions.Vectors
    val base = embeddings.select(col(idCol).as("vec_id"), Vectors.toDouble(col(vecCol)).as("v"))
    val v = base.select(
      col("vec_id"),
      explode(Vectors.hyperplaneBuckets(col("v"), nBits, nTables)).as("tb")
    )
    val a = v.select(col("vec_id").as("id_a"), col("tb"))
    val b = v.select(col("vec_id").as("id_b"), col("tb"))
    // candidate ids dedup BEFORE pulling vectors back in: the distinct
    // shuffles narrow (id, id) rows, not dim-wide arrays
    val candidates = a
      .join(b, Seq("tb"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    val vecs = base
    candidates
      .join(vecs.select(col("vec_id").as("id_a"), col("v").as("v_a")), Seq("id_a"))
      .join(vecs.select(col("vec_id").as("id_b"), col("v").as("v_b")), Seq("id_b"))
      .withColumn("cosine", round(Vectors.cosine(col("v_a"), col("v_b")), 6))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
