package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Vectors

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Three tiers (per the pipeline brief):
  *   - bruteForceKnn: exact baseline. The query side is broadcast (queries
  *     are few); the corpus streams through once; per-partition top-k via
  *     window. Cost O(|queries| · |corpus|) — correct at any corpus size
  *     as long as the query set is small.
  *   - ivfKnn: scale path. Corpus is clustered into nList coarse cells
  *     (hash-derived seed directions — zero training); queries probe the
  *     nProbe nearest cells only, cutting the scanned fraction to
  *     nProbe/nList. All shuffles are on cell id.
  *   - trainCentroids + ivfKnnTrained: the same scale path with REAL
  *     Lloyd k-means centroids, fitted FAISS-style on a bounded
  *     deterministic sample (training cost O(1) in corpus size); the
  *     corpus-wide assignment is one compiled kernel call per row with
  *     the k × dim centroid matrix shipped as a task reference.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query vector. */
  def bruteForceKnn(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int
  ): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), Vectors.toDouble(col(vecCol)).as("v_c"))
    val q = queries.select(col(idCol).as("query_id"), Vectors.toDouble(col(vecCol)).as("v_q"))
    val scored = c
      .crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(Vectors.cosine(col("v_q"), col("v_c")), 6))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** Nearest-centroid id for a vector column, given driver-side
    * centroids (shipped once per task as the CentroidScores reference
    * object — k·dim doubles, the model). One compiled kernel call per
    * row; ties break toward the lower cell id.
    */
  private def nearestCell(v: org.apache.spark.sql.Column, cents: Array[Array[Double]]) = {
    import org.apache.spark.sql.graft.VectorExpr
    VectorExpr.argMaxIndex(VectorExpr.centroidScores(v, cents))
  }

  /** Lloyd k-means over cosine geometry, fitted on a bounded
    * DETERMINISTIC sample (hash-ordered TakeOrdered, default
    * max(4096, 128·k) vectors) and iterated on the driver: centroid
    * quality needs O(100·k) training points, not the corpus, so the fit
    * cost is O(1) in corpus size — the FAISS-style train-on-sample
    * pattern (a full-corpus distributed Lloyd shuffled |corpus|·dim
    * rows per iteration and grew ~5× per 10× rows in the SCALE.md
    * stress). Only the sample (≤ cap·dim doubles) reaches the driver;
    * ties prefer the lower cell, matching `nearestCell`.
    */
  def trainCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int = 5,
      sampleCap: Int = 0
  ): Array[Array[Double]] = {
    val cap = if (sampleCap > 0) sampleCap else math.max(4096, 128 * k)
    val vecs: Array[Array[Double]] = corpus
      .select(col(idCol).as("vec_id"), Vectors.toDouble(col(vecCol)).as("v"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id")) // TakeOrdered, no full sort
      .limit(cap)
      .collect()
      .map(_.getSeq[Double](1).toArray)
    require(vecs.nonEmpty, "empty training corpus")
    @inline def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var j = 0
      val n = math.min(a.length, b.length)
      while (j < n) { dot += a(j) * b(j); na += a(j) * a(j); nb += b(j) * b(j); j += 1 }
      val den = math.sqrt(na * nb)
      if (den == 0.0) 0.0 else dot / den
    }
    var cents = vecs.take(k)
    val dim = cents(0).length
    for (_ <- 1 to iters) {
      val sums = Array.fill(cents.length)(new Array[Double](dim))
      val counts = new Array[Long](cents.length)
      vecs.foreach { v =>
        var best = 0; var bestScore = Double.NegativeInfinity
        var c = 0
        while (c < cents.length) {
          val s = cos(v, cents(c))
          if (s > bestScore) { bestScore = s; best = c } // strict > : ties keep lower cell
          c += 1
        }
        var j = 0
        while (j < dim) { sums(best)(j) += v(j); j += 1 }
        counts(best) += 1
      }
      // empty cells keep their previous centroid
      cents = cents.indices.map(i =>
        if (counts(i) == 0) cents(i) else sums(i).map(_ / counts(i))).toArray
    }
    cents
  }

  /** IVF search against trained centroids: corpus assigned once, queries
    * probe their nProbe nearest cells. Same output schema as
    * bruteForceKnn.
    */
  def ivfKnnTrained(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      cents: Array[Array[Double]],
      nProbe: Int = 4
  ): DataFrame = {
    import org.apache.spark.sql.graft.VectorExpr
    val c = corpus
      .select(col(idCol).as("neighbor_id"), Vectors.toDouble(col(vecCol)).as("v_c"))
      .withColumn("cell", nearestCell(col("v_c"), cents))
    val q = queries
      .select(col(idCol).as("query_id"), Vectors.toDouble(col(vecCol)).as("v_q"))
      .withColumn("cell",
        explode(VectorExpr.topKIndices(VectorExpr.centroidScores(col("v_q"), cents), nProbe)))
    val scored = c
      .join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(Vectors.cosine(col("v_q"), col("v_c")), 6))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** Product-quantization codebooks: the vector splits into `m`
    * contiguous subspaces and each gets its own `codes`-codeword L2
    * Lloyd fit, trained on the SAME bounded deterministic sample as
    * [[trainCentroids]] (training O(1) in corpus size; only the sample
    * reaches the driver). The model is m·codes·(dim/m) = codes·dim
    * doubles — the same footprint as one IVF centroid set. Ties prefer
    * the lower codeword, matching the encode kernel.
    */
  def trainPqCodebooks(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int,
      codes: Int,
      iters: Int = 5,
      sampleCap: Int = 0
  ): Array[Array[Array[Double]]] = {
    require(m > 0 && codes > 0, "m and codes must be positive")
    val cap = if (sampleCap > 0) sampleCap else math.max(4096, 128 * codes)
    val vecs: Array[Array[Double]] = corpus
      .select(col(idCol).as("vec_id"), Vectors.toDouble(col(vecCol)).as("v"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(cap)
      .collect()
      .map(_.getSeq[Double](1).toArray)
    require(vecs.nonEmpty, "empty training corpus")
    val dim = vecs(0).length
    require(dim % m == 0, s"vector dim $dim must divide into $m subspaces")
    val d = dim / m
    Array.tabulate(m) { s =>
      val sub = vecs.map(v => java.util.Arrays.copyOfRange(v, s * d, (s + 1) * d))
      var cents = sub.take(codes)
      for (_ <- 1 to iters) {
        val sums = Array.fill(cents.length)(new Array[Double](d))
        val counts = new Array[Long](cents.length)
        sub.foreach { v =>
          var best = 0; var bestD = Double.PositiveInfinity
          var c = 0
          while (c < cents.length) {
            val cw = cents(c)
            var dist = 0.0; var j = 0
            while (j < d) { val x = v(j) - cw(j); dist += x * x; j += 1 }
            if (dist < bestD) { bestD = dist; best = c } // strict < : ties keep lower code
            c += 1
          }
          var j = 0
          while (j < d) { sums(best)(j) += v(j); j += 1 }
          counts(best) += 1
        }
        cents = cents.indices.map(i =>
          if (counts(i) == 0) cents(i) else sums(i).map(_ / counts(i))).toArray
      }
      cents
    }
  }

  /** PQ-ADC search with exact re-ranking — the memory-bound scale path:
    * the corpus is encoded ONCE to m small-int codes per vector (8–16
    * bytes against dim·4 raw — at 100 TB the code table is what fits in
    * cluster memory while the float vectors do not), each query carries
    * its flattened subspace distance tables, and the scan scores a
    * (query, vector) pair with m table LOOKUPS instead of a
    * dim-dimension product. The `shortlist` ADC survivors per query are
    * then re-ranked with exact cosine against the true vectors — the
    * production PQ shape (IVFADC re-rank). With `shortlist` ≥ |corpus|
    * the re-rank covers every pair and the result equals
    * [[bruteForceKnn]] exactly — the gated configuration (e05), so the
    * brute-force oracle checks the encode/table/ADC/shortlist/re-rank
    * machinery bit-for-bit; the approximate small-shortlist path is
    * recall-tested in SimilaritySpec. Same output schema as
    * bruteForceKnn.
    */
  def pqKnn(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      books: Array[Array[Array[Double]]],
      shortlist: Int
  ): DataFrame = {
    import org.apache.spark.sql.graft.VectorExpr
    require(shortlist >= k, "shortlist must be at least k")
    val codesPerSub = books(0).length
    val vecs = corpus
      .select(col(idCol).as("neighbor_id"), Vectors.toDouble(col(vecCol)).as("v_c"))
    val q = queries
      .select(col(idCol).as("query_id"), Vectors.toDouble(col(vecCol)).as("v_q"))
      .withColumn("dts", VectorExpr.pqDistTables(col("v_q"), books))
    // the ADC scan moves ONLY (id, codes) — the code table, not the
    // float vectors; this is the whole point of PQ at corpus scale
    val adcScored = vecs
      .select(col("neighbor_id"), VectorExpr.pqEncode(col("v_c"), books).as("codes"))
      .crossJoin(broadcast(q.select(col("query_id"), col("dts"))))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc", VectorExpr.pqAdc(col("codes"), col("dts"), codesPerSub))
    // ADC ascending (squared-distance); deterministic id tiebreak
    val wAdc = Window.partitionBy(col("query_id")).orderBy(col("adc"), col("neighbor_id"))
    val shortlisted = adcScored
      .withColumn("adc_rank", row_number().over(wAdc))
      .filter(col("adc_rank") <= shortlist)
      .select(col("query_id"), col("neighbor_id"))
    exactRerank(vecs, q.select(col("query_id"), col("v_q")), shortlisted, k, shortlist)
  }

  /** A production shortlist (a few · k rows per query) is broadcastable;
    * the exhaustive gated configuration (`shortlist` ≥ |corpus|) is the
    * full pair set and must NOT carry the hint — it would grow with the
    * corpus past the driver/broadcast limits. Above this bound the plan
    * falls back to AQE's choice (which still broadcasts if the actual
    * size turns out small).
    */
  private val BroadcastableShortlist = 4096

  /** Exact cosine re-rank of ADC survivors: the shortlist fetches its
    * true vectors through a join against the corpus — never the other
    * way around.
    */
  private def exactRerank(
      vecs: DataFrame,
      q: DataFrame,
      shortlisted: DataFrame,
      k: Int,
      shortlist: Int
  ): DataFrame = {
    val hinted =
      if (shortlist <= BroadcastableShortlist) broadcast(shortlisted) else shortlisted
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    vecs
      .join(hinted, Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("cosine", round(Vectors.cosine(col("v_q"), col("v_c")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** IVF-PQ: the composed 100 TB vector-search shape. The stored
    * "index" is one coarse-cell id (nearest trained centroid) plus m
    * small-int PQ codes per vector — computed once, a few bytes per
    * vector; the float vectors stay in the cold exact store and are
    * touched only by the final re-rank. A query (a) picks its nProbe
    * nearest coarse cells, (b) ADC-scans ONLY the code rows inside
    * those cells with its flattened subspace distance tables (m table
    * lookups per pair — [[pqKnn]]'s kernel, but over nProbe/nList of
    * the corpus instead of all of it), (c) exact-re-ranks the
    * `shortlist` ADC survivors. Codes encode the raw vector (IVFFlat-PQ,
    * not residual encoding), so with nProbe = nList and `shortlist` ≥
    * |corpus| every pair is scored exactly once — each corpus vector
    * lives in exactly one cell — and the result equals
    * [[bruteForceKnn]]: the gated configuration (e06), same pattern as
    * e04/e05. Recall at realistic nProbe/shortlist is spec-tested in
    * SimilaritySpec. All data-sized shuffles are on cell id; the models
    * ship as task references (centroids k·dim, codebooks codes·dim
    * doubles).
    */
  def pqKnnIvf(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      cents: Array[Array[Double]],
      books: Array[Array[Array[Double]]],
      nProbe: Int,
      shortlist: Int
  ): DataFrame = {
    import org.apache.spark.sql.graft.VectorExpr
    val vecs = corpus
      .select(col(idCol).as("neighbor_id"), Vectors.toDouble(col(vecCol)).as("v_c"))
    // the stored index rows: (id, cell, codes) — built once per corpus
    val coded = vecs
      .withColumn("cell", nearestCell(col("v_c"), cents))
      .select(col("neighbor_id"), col("cell"),
        VectorExpr.pqEncode(col("v_c"), books).as("codes"))
    pqKnnIvfCoded(coded, vecs, queries, idCol, vecCol, k, cents, books, nProbe, shortlist)
  }

  /** [[pqKnnIvf]] against PRE-BUILT index rows — the stored-index serve
    * path ([[graft.operators.AnnIndex]]): `coded` is the (neighbor_id,
    * cell, codes) relation written once at publish time, `vecs` the
    * exact (neighbor_id, v_c) store touched only by the re-rank.
    * Queries never retrain or re-encode anything; the models ship as
    * task references. A streaming drain persists `coded`/`vecs` across
    * triggers (the IngestDedup corpus-side pattern).
    */
  def pqKnnIvfCoded(
      coded: DataFrame,
      vecs: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      cents: Array[Array[Double]],
      books: Array[Array[Array[Double]]],
      nProbe: Int,
      shortlist: Int
  ): DataFrame = {
    import org.apache.spark.sql.graft.VectorExpr
    require(shortlist >= k, "shortlist must be at least k")
    val codesPerSub = books(0).length
    val qBase = queries
      .select(col(idCol).as("query_id"), Vectors.toDouble(col(vecCol)).as("v_q"))
    val qProbes = qBase
      .withColumn("dts", VectorExpr.pqDistTables(col("v_q"), books))
      .withColumn("cell",
        explode(VectorExpr.topKIndices(VectorExpr.centroidScores(col("v_q"), cents), nProbe)))
      .select(col("query_id"), col("cell"), col("dts"))
    // cell-join prunes the scan to probed cells; the probe side is
    // |queries|·nProbe rows + per-query tables — broadcast by contract
    val adcScored = coded
      .join(broadcast(qProbes), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc", VectorExpr.pqAdc(col("codes"), col("dts"), codesPerSub))
    val wAdc = Window.partitionBy(col("query_id")).orderBy(col("adc"), col("neighbor_id"))
    val shortlisted = adcScored
      .withColumn("adc_rank", row_number().over(wAdc))
      .filter(col("adc_rank") <= shortlist)
      .select(col("query_id"), col("neighbor_id"))
    exactRerank(vecs, qBase, shortlisted, k, shortlist)
  }

  /** IVF-style ANN: assign corpus vectors to their nearest of nList
    * deterministic centroids (unit-less hash-derived seed directions);
    * queries scan only their nProbe nearest cells. Returns the same
    * schema as bruteForceKnn; recall < 1 by construction.
    */
  def ivfKnn(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nList: Int = 16,
      nProbe: Int = 4
  ): DataFrame = {
    import org.apache.spark.sql.graft.VectorExpr
    // centroid direction c[i][j] from xxhash64(i,j) in [-1,1] — derived,
    // not trained, so no side-file ships to executors. Cell pick =
    // compiled argmax/top-k over the materialized projections column;
    // ties prefer the lower cell (same break as nearestCell).
    val c = corpus
      .select(col(idCol).as("neighbor_id"), Vectors.toDouble(col(vecCol)).as("v_c"))
      .withColumn("scores", VectorExpr.randomProjections(col("v_c"), nList))
      .withColumn("cell", VectorExpr.argMaxIndex(col("scores")))
      .drop("scores")
    val q = queries
      .select(col(idCol).as("query_id"), Vectors.toDouble(col(vecCol)).as("v_q"))
      .withColumn("scores", VectorExpr.randomProjections(col("v_q"), nList))
      .withColumn("cell", explode(VectorExpr.topKIndices(col("scores"), nProbe)))
      .drop("scores")

    val scored = c
      .join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(Vectors.cosine(col("v_q"), col("v_c")), 6))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** Contrastive TRIPLET mining for embedding-model training data
    * (anchor, positive, hard negative — the InfoNCE/triplet-loss feed):
    *   - anchors are every vector with at least one near-duplicate
    *     (rounded cosine ≥ `threshold`), found by the banded-LSH pass
    *     ([[graft.operators.Dedup.embeddingNearDup]] — never all-pairs);
    *   - the positive is the anchor's highest-cosine duplicate partner
    *     (ties toward the lower id);
    *   - the hard negative is the highest-cosine NON-duplicate
    *     (rounded cosine < threshold) among the anchor's `nProbe`
    *     trained IVF cells — the closest thing that is NOT a copy,
    *     which is exactly the negative a contrastive batch wants.
    *
    * Output: (anchor_id, positive_id, pos_cosine, negative_id,
    * neg_cosine, margin). With nProbe = |cents| the probe is exhaustive
    * and the negative is exact — the gating configuration; production
    * uses small nProbe and accepts approximate negatives.
    *
    * Scale shape: positives inherit the LSH pass's bucketed plan (and
    * are eagerly checkpointed — two consumers, one execution); the
    * negative scan is the e04 probe join keyed on cell. The probe side
    * carries only ANCHORS and broadcasts under the dedup broadcast
    * budget (`spark.graft.dedup.sigBroadcastBytes`, driver-clamped);
    * past it the probe join falls back to a cell-keyed shuffle.
    * `maxAnchors` bounds one mining BATCH (lowest anchor ids first,
    * deterministic): candidate volume is then
    * maxAnchors · nProbe · |corpus| / |cents| — LINEAR in the corpus —
    * and a full mining run is the standard production loop over anchor
    * batches, each batch this operator unchanged. 0 = all anchors
    * (fine when duplication density is low; on a dup-saturated corpus
    * that degenerates toward all-pairs, which is what the batch bound
    * exists to prevent).
    */
  def tripletMine(
      em: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      cents: Array[Array[Double]],
      nProbe: Int,
      nTables: Int = 8,
      maxAnchors: Int = 0,
      nearDupPairs: Option[DataFrame] = None
  ): DataFrame = {
    import org.apache.spark.sql.graft.VectorExpr
    // a pipeline that already published the corpus's verified near-dup
    // pair relation (the e03 screen's output as an ingest artifact)
    // passes it in and skips the in-flight LSH pass — the positives ARE
    // that relation; the mining (probe-pruned hard negatives) is what
    // this operator adds
    val pairs = nearDupPairs.getOrElse(
      Dedup.embeddingNearDup(em, idCol, vecCol, threshold, nTables = nTables))
    val sym = pairs
      .select(col("id_a").as("anchor_id"), col("id_b").as("partner_id"), col("cosine"))
      .unionByName(
        pairs.select(col("id_b").as("anchor_id"), col("id_a").as("partner_id"), col("cosine")))
    val wp = Window.partitionBy(col("anchor_id")).orderBy(col("cosine").desc, col("partner_id"))
    val allPositives = sym
      .withColumn("rn", row_number().over(wp))
      .filter(col("rn") === 1)
      .select(col("anchor_id"), col("partner_id").as("positive_id"), col("cosine").as("pos_cosine"))
    // batch bound: TakeOrdered on anchor_id — deterministic, no full sort.
    // Eagerly checkpointed: the LSH pair pipeline above is the expensive
    // half of this operator and positives feed TWO consumers (the probe
    // join and the final result join) — without materialization the whole
    // banded pass would execute twice per mining batch. Rows are narrow
    // (two ids + a double), bounded by the anchor count.
    val positives =
      (if (maxAnchors > 0) allPositives.orderBy(col("anchor_id")).limit(maxAnchors)
       else allPositives)
        .localCheckpoint(false) // materialized by the nAnchors count — one job, cleaner-managed
    val c = em
      .select(col(idCol).as("neighbor_id"), Vectors.toDouble(col(vecCol)).as("v_c"))
      .withColumn("cell", nearestCell(col("v_c"), cents))
    val probed = em
      .select(col(idCol).as("anchor_id"), Vectors.toDouble(col(vecCol)).as("v_q"))
      .join(positives.select(col("anchor_id")), Seq("anchor_id"))
      .withColumn("cell",
        explode(VectorExpr.topKIndices(VectorExpr.centroidScores(col("v_q"), cents), nProbe)))
    // The probe side carries every anchor's FULL double vector × nProbe
    // exploded cells — broadcast it only under the dedup broadcast budget
    // (anchors · nProbe · (dim·8 + 48) bytes, the sigBroadcastBytes
    // convention); an unbounded maxAnchors on a dup-dense corpus would
    // otherwise collect an arbitrarily large relation onto the driver.
    // Past the budget the probe join degrades to a shuffle on cell —
    // correct, just not map-side. Both scalars are bounded driver work:
    // the count reads the checkpointed narrow positives, dim one row.
    val nAnchors = positives.count()
    val dim = em.limit(1).select(size(Vectors.toDouble(col(vecCol))).as("d"))
      .collect().headOption.map(_.getInt(0)).getOrElse(0)
    val probeBudget = Dedup.clampToDriverLimit(em.sparkSession,
      em.sparkSession.conf
        .getOption("spark.graft.dedup.sigBroadcastBytes")
        .map(Dedup.parseBytes)
        .getOrElse(512L * 1024 * 1024))
    val probeBroadcastable = nAnchors <= probeBudget / math.max(nProbe.toLong * (dim * 8L + 48L), 1L)
    val probeSide = if (probeBroadcastable) broadcast(probed) else probed
    val wn = Window.partitionBy(col("anchor_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    val negatives = c
      .join(probeSide, Seq("cell"))
      .filter(col("anchor_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(Vectors.cosine(col("v_q"), col("v_c")), 6))
      .filter(col("cosine") < threshold)
      .withColumn("rn", row_number().over(wn))
      .filter(col("rn") === 1)
      .select(col("anchor_id"), col("neighbor_id").as("negative_id"), col("cosine").as("neg_cosine"))
    positives
      .join(negatives, Seq("anchor_id"))
      .select(
        col("anchor_id"),
        col("positive_id"),
        col("pos_cosine"),
        col("negative_id"),
        col("neg_cosine"),
        round(col("pos_cosine") - col("neg_cosine"), 6).as("margin")
      )
  }
}
