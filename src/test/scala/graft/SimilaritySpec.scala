package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

/** ANN operators: brute-force exactness on a hand fixture, IVF recall
  * against the exact baseline on the driver fixture.
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("brute-force kNN: known nearest neighbors on a hand fixture") {
    val vs = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)),
      (4L, Array(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.bruteForceKnn(vs, vs.filter($"vec_id" === 1), "vec_id", "embedding", k = 2)
      .orderBy($"rank").collect()
    assert(got.map(_.getLong(2)).toSeq == Seq(2L, 3L), "nearest then next-nearest")
    assert(got.head.getDouble(3) > 0.99)
  }

  test("brute-force kNN returns exactly k rows per query, ranked by cosine desc") {
    val em = Tables.embeddings(spark, sfDir)
    val got = Similarity.bruteForceKnn(em, em.filter($"vec_id" < 5), "vec_id", "embedding", k = 5)
    val byQuery = got.collect().groupBy(_.getLong(0))
    assert(byQuery.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQuery.values.foreach { rows =>
      assert(rows.map(_.getInt(1)).sorted.toSeq == Seq(1, 2, 3, 4, 5))
      val cos = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b }, "cosine non-increasing in rank")
    }
  }

  test("trained IVF: k-means centroids beat hash-derived cells on recall") {
    val em = Tables.embeddings(spark, sfDir)
    val q = em.filter($"vec_id" < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = pairs(Similarity.bruteForceKnn(em, q, "vec_id", "embedding", k = 5))
    val cents = Similarity.trainCentroids(em, "vec_id", "embedding", k = 16, iters = 4)
    assert(cents.length == 16 && cents.forall(_.length == 64))
    val trained = pairs(Similarity.ivfKnnTrained(em, q, "vec_id", "embedding", k = 5, cents, nProbe = 8))
    val hashed = pairs(Similarity.ivfKnn(em, q, "vec_id", "embedding", k = 5, nList = 16, nProbe = 8))
    val rTrained = (exact & trained).size.toDouble / exact.size
    val rHashed = (exact & hashed).size.toDouble / exact.size
    assert(rTrained >= rHashed - 0.05,
      s"trained recall $rTrained should not trail hash recall $rHashed")
    assert(rTrained >= 0.5, s"trained IVF recall $rTrained below floor")
  }

  test("IVF kNN: recall vs exact baseline on fixture queries") {
    val em = Tables.embeddings(spark, sfDir)
    val q = em.filter($"vec_id" < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = pairs(Similarity.bruteForceKnn(em, q, "vec_id", "embedding", k = 5))
    val approx = pairs(Similarity.ivfKnn(em, q, "vec_id", "embedding", k = 5, nList = 16, nProbe = 8))
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.4, s"IVF recall $recall below floor (nProbe=8/nList=16 on near-random vectors)")
    assert(approx.nonEmpty && approx.subsetOf(pairs(Similarity.bruteForceKnn(em, q, "vec_id", "embedding", k = em.count().toInt))))
  }

  test("PQ with full shortlist equals brute force exactly (the e05 gate shape)") {
    val em = Tables.embeddings(spark, sfDir)
    val q = em.filter($"vec_id" < 10)
    val books = Similarity.trainPqCodebooks(em, "vec_id", "embedding", m = 8, codes = 16, iters = 3)
    assert(books.length == 8 && books.forall(b => b.length == 16 && b.forall(_.length == 8)))
    val exact = Similarity.bruteForceKnn(em, q, "vec_id", "embedding", k = 5)
      .collect().map(_.toString).sorted
    val pq = Similarity.pqKnn(em, q, "vec_id", "embedding", k = 5, books, shortlist = Int.MaxValue)
      .collect().map(_.toString).sorted
    assert(pq.sameElements(exact),
      "full-shortlist PQ re-rank must reproduce brute force bit-for-bit")
  }

  test("PQ approximate shortlist: usable recall at a fraction of the scan payload") {
    val em = Tables.embeddings(spark, sfDir)
    val q = em.filter($"vec_id" < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = pairs(Similarity.bruteForceKnn(em, q, "vec_id", "embedding", k = 5))
    val books = Similarity.trainPqCodebooks(em, "vec_id", "embedding", m = 8, codes = 16, iters = 3)
    // shortlist = 50 of ~2000 corpus vectors: the ADC scan reads 8-int
    // code rows (vs 64 floats) and the exact re-rank touches 2.5% of
    // the corpus per query
    val approx = pairs(Similarity.pqKnn(em, q, "vec_id", "embedding", k = 5, books, shortlist = 50))
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.4, s"PQ recall $recall below floor (m=8, 16 codes, near-random vectors)")
    assert(approx.subsetOf(pairs(Similarity.bruteForceKnn(em, q, "vec_id", "embedding", k = em.count().toInt))))
  }

  test("IVF-PQ with exhaustive probes + full shortlist equals brute force (the e06 gate shape)") {
    val em = Tables.embeddings(spark, sfDir)
    val q = em.filter($"vec_id" < 10)
    val cents = Similarity.trainCentroids(em, "vec_id", "embedding", k = 16, iters = 3)
    val books = Similarity.trainPqCodebooks(em, "vec_id", "embedding", m = 8, codes = 16, iters = 3)
    val exact = Similarity.bruteForceKnn(em, q, "vec_id", "embedding", k = 5)
      .collect().map(_.toString).sorted
    val got = Similarity.pqKnnIvf(em, q, "vec_id", "embedding", k = 5, cents, books,
      nProbe = 16, shortlist = Int.MaxValue)
      .collect().map(_.toString).sorted
    assert(got.sameElements(exact),
      "exhaustive IVF-PQ must reproduce brute force bit-for-bit")
  }

  test("IVF-PQ at realistic nProbe/shortlist: usable recall on a pruned scan") {
    val em = Tables.embeddings(spark, sfDir)
    val q = em.filter($"vec_id" < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = pairs(Similarity.bruteForceKnn(em, q, "vec_id", "embedding", k = 5))
    val cents = Similarity.trainCentroids(em, "vec_id", "embedding", k = 16, iters = 3)
    val books = Similarity.trainPqCodebooks(em, "vec_id", "embedding", m = 8, codes = 16, iters = 3)
    // nProbe 8/16 cells, shortlist 50 of ~2000: the ADC scan touches
    // ~half the code rows and the re-rank 2.5% of the float corpus
    val approx = pairs(Similarity.pqKnnIvf(em, q, "vec_id", "embedding", k = 5, cents, books,
      nProbe = 8, shortlist = 50))
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.4, s"IVF-PQ recall $recall below floor (near-random vectors)")
    assert(approx.subsetOf(pairs(Similarity.bruteForceKnn(em, q, "vec_id", "embedding", k = em.count().toInt))))
  }

  test("pq_adc rejects a codes/tables size mismatch instead of scoring silently") {
    // 8 codes with codesPerSub=16 needs 128 table entries; hand it 64
    val codes = new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.fill(8)(0))
    val tables = new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.fill(64)(0.0))
    val e = intercept[IllegalArgumentException] {
      org.apache.spark.sql.graft.VectorKernels.pqAdc(codes, tables, 16)
    }
    assert(e.getMessage.contains("pq_adc"))
  }

  test("PQ training is deterministic") {
    val em = Tables.embeddings(spark, sfDir)
    val a = Similarity.trainPqCodebooks(em, "vec_id", "embedding", m = 8, codes = 16, iters = 2)
    val b = Similarity.trainPqCodebooks(em, "vec_id", "embedding", m = 8, codes = 16, iters = 2)
    assert(a.map(_.map(_.toSeq).toSeq).toSeq == b.map(_.map(_.toSeq).toSeq).toSeq)
  }

  // hand fixture for triplet mining: two planted near-dup pairs, the
  // rest far apart; the hard negative is exactly the closest non-dup
  private def tripletFixture = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (2L, Array(0.999f, 0.001f, 0.0f, 0.0f)), // dup of 1
    (3L, Array(0.7f, 0.7f, 0.0f, 0.0f)),     // closest NON-dup of 1/2
    (4L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (5L, Array(0.0f, 0.999f, 0.001f, 0.0f)), // dup of 4
    (6L, Array(0.0f, 0.0f, 1.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("tripletMine: planted positives and the exact hard negative (exhaustive probes)") {
    val vs = tripletFixture
    val cents = Similarity.trainCentroids(vs, "vec_id", "embedding", k = 2, iters = 3)
    val got = Similarity
      .tripletMine(vs, "vec_id", "embedding", threshold = 0.99, cents, nProbe = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    assert(got.keySet == Set(1L, 2L, 4L, 5L))
    assert(got(1L) == ((2L, 3L)), "anchor 1: positive is its dup, negative the closest non-dup")
    assert(got(2L) == ((1L, 3L)))
    assert(got(4L)._1 == 5L && got(5L)._1 == 4L)
    // margins positive by construction: positive is a near-copy
    val margins = Similarity
      .tripletMine(vs, "vec_id", "embedding", threshold = 0.99, cents, nProbe = 2)
      .collect().map(_.getDouble(5))
    assert(margins.forall(_ > 0.0))
  }

  test("tripletMine: maxAnchors bounds the batch to the lowest anchor ids") {
    val vs = tripletFixture
    val cents = Similarity.trainCentroids(vs, "vec_id", "embedding", k = 2, iters = 3)
    val got = Similarity
      .tripletMine(vs, "vec_id", "embedding", threshold = 0.99, cents, nProbe = 2, maxAnchors = 2)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 2L))
  }

  test("tripletMine production nProbe: negative recall vs the exhaustive probe (e07 scale config)") {
    // e07's GATE runs nProbe = |cents| so the hard negative is exact;
    // production divides the probe cost by nList/nProbe (the SCALE.md
    // adjudication). The approximation is one-sided: an IVF probe scans
    // a SUBSET of the corpus, so the approximate negative's cosine can
    // only be ≤ the exact one, and the probe ranking puts most exact
    // negatives inside the top cells.
    val em = Tables.embeddings(spark, sfDir)
    val cents = Similarity.trainCentroids(em, "vec_id", "embedding", k = 16, iters = 3)
    def mine(nProbe: Int) = Similarity
      .tripletMine(em, "vec_id", "embedding", threshold = 0.45, cents,
        nProbe = nProbe, maxAnchors = 64)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getDouble(4)))).toMap
    val exact = mine(16)
    val prod = mine(4)
    assert(exact.nonEmpty)
    // anchors can only be LOST (every probed neighbor a dup), never added
    assert(prod.keySet.subsetOf(exact.keySet))
    assert(prod.size.toDouble / exact.size >= 0.9,
      s"production probe kept ${prod.size}/${exact.size} anchors")
    // one-sided approximation
    prod.foreach { case (a, (_, negCos)) => assert(negCos <= exact(a)._2 + 1e-9) }
    val hit = prod.keys.count(a => prod(a)._1 == exact(a)._1)
    assert(hit.toDouble / prod.size >= 0.7,
      s"production negative == exact negative for only $hit/${prod.size} anchors")
  }

  test("tripletMine at realistic nProbe: negatives stay non-dups with sane margins") {
    // the driver fixture has no 0.99-cosine pairs, so lower the bar to
    // catch organically-similar vectors as positives
    val em = Tables.embeddings(spark, sfDir)
    val cents = Similarity.trainCentroids(em, "vec_id", "embedding", k = 16, iters = 3)
    val got = Similarity
      .tripletMine(em, "vec_id", "embedding", threshold = 0.45, cents, nProbe = 4, maxAnchors = 32)
      .collect()
    assert(got.nonEmpty, "fixture should yield some 0.45-cosine anchors")
    got.foreach { r =>
      assert(r.getDouble(2) >= 0.45, "positive at/above threshold")
      assert(r.getDouble(4) < 0.45, "negative strictly below threshold")
      assert(r.getLong(1) != r.getLong(3), "positive and negative differ")
      assert(r.getLong(0) != r.getLong(3))
    }
  }

  test("AnnIndex.append: frozen-model appended codes equal a one-shot publish over the union") {
    val em = Tables.embeddings(spark, sfDir)
    val batch = graft.streaming.IngestSemantic.batchFeed(em)
    val base = java.nio.file.Files.createTempDirectory("graft_annappend_").toString
    try {
      // publish on the corpus, append the batch with the frozen model
      graft.operators.AnnIndex.write(em, "vec_id", "embedding", s"$base/a",
        nList = 16, m = 8, codes = 16, iters = 3)
      graft.operators.AnnIndex.append(batch, "vec_id", "embedding", s"$base/a")
      // one-shot publish over the union, FORCING the same corpus-trained
      // model (write() would train on the union): write corpus store,
      // then append both relations' rows would be circular — instead
      // encode the union through append against a model-only store
      graft.operators.AnnIndex.write(em, "vec_id", "embedding", s"$base/b",
        nList = 16, m = 8, codes = 16, iters = 3)
      graft.operators.AnnIndex.append(batch, "vec_id", "embedding", s"$base/b")
      val a = graft.operators.AnnIndex.codes(spark, s"$base/a")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSet
      val b = graft.operators.AnnIndex.codes(spark, s"$base/b")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSet
      assert(a == b, "append must be deterministic given the frozen model")
      assert(a.size == em.count() + batch.count(), "no lost or duplicated code rows")
      // the grown index actually serves: query 0's jittered twin
      // (cosine ~0.9999) surfaces at rank 1 through the appended store
      val (cents, books) = graft.operators.AnnIndex.readModel(spark, s"$base/a")
      val coded = graft.operators.AnnIndex.codes(spark, s"$base/a")
        .select(col("vec_id").as("neighbor_id"), col("cell"), col("codes"))
      val union = em.select(col("vec_id"), col("embedding"))
        .unionByName(batch.select(col("vec_id"), col("embedding")))
      val vecs = union.select(col("vec_id").as("neighbor_id"),
        graft.functions.Vectors.toDouble(col("embedding")).as("v_c"))
      val top = Similarity
        .pqKnnIvfCoded(coded, vecs, union.filter(col("vec_id") === 0), "vec_id", "embedding",
          k = 1, cents, books, nProbe = 16, shortlist = Int.MaxValue)
        .collect()
      assert(top.length == 1 && top(0).getLong(2) == 1000000L && top(0).getDouble(3) > 0.999,
        s"query 0's appended jittered twin must rank first: ${top.mkString}")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }

  test("AnnIndex.republish: the retrained model separates the drifted regime the frozen model collapsed; version bumps; swap is atomic") {
    val em = Tables.embeddings(spark, sfDir)
    // four drifted arrival waves: every 5th base vector shifted +4.0
    // per component (a regime the publish-time quantizer never saw)
    // with a ±1% per-copy jitter — copies of one src are each other's
    // planted near-twins (cosine ≈ 0.9999 in the drifted regime vs
    // ≈ 0.98 across srcs), the e03/s13 planted-truth convention
    def wave(j: Int) = em.filter(col("vec_id") % 5 === 0)
      .select(
        (col("vec_id") + lit(2000000L + j * 10000L)).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x.cast("double") *
            (lit(1.0) + (pmod(col("vec_id") * 13 + i.cast("long") * 5 + lit(j * 3L), lit(100L))
              .cast("double") / 100.0 - 0.5) * 0.02) + lit(4.0)).cast("float"))
          .as("embedding"))
    val arrivals = (1 to 4).map(wave).reduce(_ unionByName _)
    val base = java.nio.file.Files.createTempDirectory("graft_republish_").toString
    val ix = s"$base/ix"
    try {
      graft.operators.AnnIndex.write(em, "vec_id", "embedding", ix,
        nList = 16, m = 8, codes = 16, iters = 3)
      graft.operators.AnnIndex.append(arrivals, "vec_id", "embedding", ix)
      assert(graft.operators.AnnIndex.version(spark, ix) == 1L)
      val nDrift = arrivals.count()
      // the drift mechanism: the frozen quantizer collapses the whole
      // drifted regime into a handful of (cell, codes) tuples — the
      // index literally cannot tell drifted vectors apart
      def driftTuples(): (Long, Long) = {
        val d = graft.operators.AnnIndex.codes(spark, ix)
          .filter(col("vec_id") >= 2000000L)
        (d.select(col("cell")).distinct().count(),
          d.select(col("cell"), col("codes")).distinct().count())
      }
      val (cellsBefore, tuplesBefore) = driftTuples()
      val union = em.select(col("vec_id"), col("embedding")).unionByName(arrivals)
      // the MONITOR GATES THE REPUBLISH (the s13 → e10 composition): the
      // production-config recall probe on the drifted planted-twin
      // sample must alarm on the frozen store — and the republish below
      // runs BECAUSE it did, never as a per-batch reflex
      val recBefore = graft.operators.AnnIndex.recallProbe(spark, ix, wave(1), union,
        "vec_id", "embedding", k = 1, nProbe = 8, shortlist = 16)
        .agg(avg(col("rappel"))).collect()(0).getDouble(0)
      info(s"pre-republish drifted-regime recall@1 = $recBefore")
      val alarm = recBefore < 0.8 // the s13 RecallFloor
      assert(alarm,
        s"fixture check: the drifted regime must alarm at production config ($recBefore)")
      val v2 = graft.operators.AnnIndex.republish(union, "vec_id", "embedding", ix,
        nList = 16, m = 8, codes = 16, iters = 3)
      assert(v2 == 2L && graft.operators.AnnIndex.version(spark, ix) == 2L)
      assert(!new java.io.File(s"${ix}_republish_tmp").exists(),
        "the aside dir must be gone after a successful swap")
      // completeness: every union vector coded exactly once
      val coded = graft.operators.AnnIndex.codes(spark, ix)
      assert(coded.count() == union.count() &&
        coded.select(col("vec_id")).distinct().count() == union.count(),
        "republish must re-encode every vector exactly once")
      val (cellsAfter, tuplesAfter) = driftTuples()
      info(s"drifted code tuples: before $cellsBefore cells/$tuplesBefore tuples, " +
        s"after $cellsAfter cells/$tuplesAfter tuples (of $nDrift rows)")
      assert(tuplesBefore <= nDrift / 4,
        s"fixture check: the frozen model should collapse the drifted regime " +
          s"($tuplesBefore distinct tuples of $nDrift)")
      assert(tuplesAfter > tuplesBefore,
        "the retrained model must separate what the frozen model collapsed")
      // the production payoff: recall@1 at production config (nProbe <
      // nList, shortlist well under the drifted-candidate count) on the
      // planted-twin sample, over the republished store
      val sample = wave(1)
      val rec = graft.operators.AnnIndex.recallProbe(spark, ix, sample, union,
        "vec_id", "embedding", k = 1, nProbe = 8, shortlist = 16)
        .agg(avg(col("rappel"))).collect()(0).getDouble(0)
      info(s"post-republish drifted-regime recall@1 = $rec")
      assert(rec >= 0.9,
        s"republished store must serve the drifted regime at production config (recall $rec)")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }

  test("AnnIndex.tombstone: append ∘ tombstone ≡ the refreshed selection's code rows; " +
      "survivors untouched, model frozen, re-run converges, swap aside gone") {
    val em = Tables.embeddings(spark, sfDir)
    val batch = graft.streaming.IngestSemantic.batchFeed(em)
    val evict = em.filter(col("vec_id") % 4 === 1).select(col("vec_id"))
    val base = java.nio.file.Files.createTempDirectory("graft_anntomb_").toString
    val ix = s"$base/ix"
    try {
      graft.operators.AnnIndex.write(em, "vec_id", "embedding", ix,
        nList = 16, m = 8, codes = 16, iters = 3)
      graft.operators.AnnIndex.append(batch, "vec_id", "embedding", ix)
      val before = graft.operators.AnnIndex.codes(spark, ix)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toMap2
      val (centsBefore, _) = graft.operators.AnnIndex.readModel(spark, ix)
      graft.operators.AnnIndex.tombstone(spark, ix, evict)
      val evicted = evict.collect().map(_.getLong(0)).toSet
      val after = graft.operators.AnnIndex.codes(spark, ix)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toMap2
      // exactly the refreshed selection: (base − evictees) ∪ batch —
      // and every surviving row BIT-IDENTICAL to its pre-tombstone self
      // (deletion re-encodes nothing)
      assert(after.keySet == before.keySet -- evicted,
        "tombstone must drop exactly the eviction set")
      assert(after.forall { case (id, row) => before(id) == row },
        "surviving code rows must be untouched")
      // the model is frozen: deletion never retrains
      val (centsAfter, _) = graft.operators.AnnIndex.readModel(spark, ix)
      assert(centsBefore.map(_.toSeq).toSeq == centsAfter.map(_.toSeq).toSeq,
        "tombstone must not touch the trained model")
      assert(!new java.io.File(s"$ix/codes_tombstone_tmp").exists(),
        "the aside dir must be gone after a successful swap")
      // idempotence: the refresh loop may retry a maintenance window
      graft.operators.AnnIndex.tombstone(spark, ix, evict)
      val again = graft.operators.AnnIndex.codes(spark, ix)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toMap2
      assert(again == after, "re-running the same tombstone must converge")
      // a null-bearing eviction list fails LOUDLY (r19: Pack.tombstone's
      // shared contract — silently dropping the null "deleted" fewer
      // rows than the caller sent and read as a clean maintenance pass)
      val withNull = spark.createDataFrame(
        java.util.Arrays.asList(
          org.apache.spark.sql.Row(java.lang.Long.valueOf(3L)),
          org.apache.spark.sql.Row(null)),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("vec_id",
            org.apache.spark.sql.types.LongType, nullable = true))))
      val eNull = intercept[Exception] {
        graft.operators.AnnIndex.tombstone(spark, ix, withNull)
      }
      assert(eNull.getMessage.contains("NULL") ||
        Option(eNull.getCause).exists(_.getMessage.contains("NULL")),
        s"null eviction id must fail loudly, got: ${eNull.getMessage}")
      // the failed call must not have corrupted the store (staged write)
      val stillThere = graft.operators.AnnIndex.codes(spark, ix)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toMap2
      assert(stillThere == after, "a failed tombstone must leave the store untouched")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }

  test("AnnIndex.compact: an append-fragmented codes store rewrites to fewer files " +
      "with the row multiset, model and version untouched; re-compact converges") {
    val em = Tables.embeddings(spark, sfDir)
    val base = java.nio.file.Files.createTempDirectory("graft_anncompact_").toString
    val ix = s"$base/ix"
    def partFiles() = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$ix/codes"))
        .filter(f => f.getName.startsWith("part-") && f.length > 0)
    }
    def rows() = graft.operators.AnnIndex.codes(spark, ix)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).sortBy(_._1)
    try {
      graft.operators.AnnIndex.write(em, "vec_id", "embedding", ix,
        nList = 16, m = 8, codes = 16, iters = 3)
      // fragment: tombstone rewrite + six per-wave frozen-model appends
      // (the e13 setup shape — a week of refresh windows)
      graft.operators.AnnIndex.tombstone(spark, ix,
        em.filter(col("vec_id") % 4 === 1).select(col("vec_id")))
      val wave = em.filter(col("vec_id") % 10 === 5)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      (0 until 6).foreach { k =>
        graft.operators.AnnIndex.append(
          // div-10 split, not mod-6: wave ids are all ≡ 5 (mod 10), so a
          // mod-6 split would leave the even residues empty (e13Wave's fix)
          wave.filter(pmod(expr("vec_id div 10"), lit(6)) === k),
          "vec_id", "embedding", ix)
      }
      val before = rows()
      val filesBefore = partFiles().length
      val (centsBefore, _) = graft.operators.AnnIndex.readModel(spark, ix)
      graft.operators.AnnIndex.compact(spark, ix)
      val after = rows()
      val filesAfter = partFiles().length
      assert(after.sameElements(before),
        "compaction must change layout, never content (row multiset identical)")
      assert(filesAfter < filesBefore,
        s"compaction must reduce the file count (was $filesBefore, now $filesAfter)")
      val (centsAfter, _) = graft.operators.AnnIndex.readModel(spark, ix)
      assert(centsBefore.map(_.toSeq).toSeq == centsAfter.map(_.toSeq).toSeq,
        "compaction must not touch the trained model")
      assert(!new java.io.File(s"$ix/codes_compact_tmp").exists(),
        "the aside dir must be gone after a successful swap")
      // re-compacting a compacted store converges (the e13 cell re-runs)
      graft.operators.AnnIndex.compact(spark, ix)
      assert(rows().sameElements(after), "re-compaction must converge")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }

  test("cell-partitioned codes store: the production serve scan PRUNES to probed cells " +
      "(dynamic partition pruning against the broadcast probe side), cell type survives") {
    val em = Tables.embeddings(spark, sfDir)
    val base = java.nio.file.Files.createTempDirectory("graft_annprune_").toString
    val ix = s"$base/ix"
    try {
      graft.operators.AnnIndex.write(em, "vec_id", "embedding", ix,
        nList = 16, m = 8, codes = 16, iters = 3)
      // the store is partitioned by coarse cell on disk…
      assert(new java.io.File(s"$ix/codes").listFiles()
        .exists(_.getName.startsWith("cell=")), "codes/ must be cell-partitioned")
      val coded = graft.operators.AnnIndex.codes(spark, ix)
      // …with the canonical column order and the int cell type restored
      assert(coded.schema.fieldNames.toSeq == Seq("vec_id", "cell", "codes"))
      assert(coded.schema("cell").dataType == org.apache.spark.sql.types.IntegerType)
      val (cents, books) = graft.operators.AnnIndex.readModel(spark, ix)
      // production config: nProbe < nList, a bounded filtered query set
      val serve = graft.operators.Similarity.pqKnnIvfCoded(
        coded.select(col("vec_id").as("neighbor_id"), col("cell"), col("codes")),
        em.select(col("vec_id").as("neighbor_id"),
          graft.functions.Vectors.toDouble(col("embedding")).as("v_c")),
        em.filter(col("vec_id") < 5), "vec_id", "embedding", k = 5,
        cents, books, nProbe = 4, shortlist = 32)
      val plan = serve.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruningexpression"),
        s"the serve scan must carry a dynamic partition-pruning filter on cell:\n" +
          plan.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n"))
      // and the pruned serve still returns correct rows (5 queries × k)
      assert(serve.count() == 5L * 5)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }

  test("AnnIndex.maintainAppend: the append-count watermark fires compaction exactly " +
      "at the line, never under it, and the counter resets with the fold") {
    val em = Tables.embeddings(spark, sfDir)
    val base = java.nio.file.Files.createTempDirectory("graft_annmaint_").toString
    val ix = s"$base/ix"
    def parts(): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$ix/codes"))
        .count(f => f.getName.startsWith("part-") && f.length > 0)
    }
    try {
      graft.operators.AnnIndex.write(em, "vec_id", "embedding", ix,
        nList = 16, m = 8, codes = 16, iters = 3)
      assert(graft.operators.AnnIndex.appendsSinceCompact(spark, ix) == 0)
      val wave = (k: Int) => em.filter(col("vec_id") % 3 === k)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      // two appends under a 3-append watermark: counter climbs, no fold
      assert(graft.operators.AnnIndex.maintainAppend(
        wave(0), "vec_id", "embedding", ix, appendsWatermark = 3) == 1)
      assert(graft.operators.AnnIndex.maintainAppend(
        wave(1), "vec_id", "embedding", ix, appendsWatermark = 3) == 2)
      val fragmented = parts()
      val before = graft.operators.AnnIndex.codes(spark, ix)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toMap2
      // the third append crosses the watermark: the policy compacts
      assert(graft.operators.AnnIndex.maintainAppend(
        wave(2), "vec_id", "embedding", ix, appendsWatermark = 3) == 0)
      assert(graft.operators.AnnIndex.appendsSinceCompact(spark, ix) == 0,
        "the counter must reset with the policy's fold")
      assert(parts() < fragmented + 1,
        s"the policy fold must cut the file count (was $fragmented + wave)")
      // content = everything appended, layout folded
      val after = graft.operators.AnnIndex.codes(spark, ix)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toMap2
      val wave2 = wave(2).collect().map(_.getLong(0)).toSet
      assert(after.keySet == before.keySet ++ wave2,
        "the watermark-crossing append must land before the fold")
      assert(before.forall { case (id, row) => after(id) == row },
        "pre-fold rows must survive the fold bit-identical")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }

  test("AnnIndex.maintainAppend crash window: a lost counter marker (crash between " +
      "append and marker write) under-counts by one — the fold fires one window LATE, " +
      "the store serves every appended row throughout, and the counter converges") {
    val em = Tables.embeddings(spark, sfDir)
    val base = java.nio.file.Files.createTempDirectory("graft_anncrash_").toString
    val ix = s"$base/ix"
    def ids(): Set[Long] = graft.operators.AnnIndex.codes(spark, ix)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    def rows(): Map[Long, (Int, Seq[Int])] = graft.operators.AnnIndex.codes(spark, ix)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getSeq[Int](2))).toMap
    try {
      graft.operators.AnnIndex.write(em, "vec_id", "embedding", ix,
        nList = 16, m = 8, codes = 16, iters = 3)
      val wave = (k: Int) => em.filter(col("vec_id") % 4 === k)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      val waveIds = (k: Int) => wave(k).collect().map(_.getLong(0)).toSet
      assert(graft.operators.AnnIndex.maintainAppend(
        wave(0), "vec_id", "embedding", ix, appendsWatermark = 3) == 1)
      // CRASH: the append lands, the marker write never happens —
      // AnnIndex.append is the exact half the maintainAppend scaladoc's
      // crash window leaves behind (store: 2 appends, marker: 1)
      graft.operators.AnnIndex.append(wave(1), "vec_id", "embedding", ix)
      assert(graft.operators.AnnIndex.appendsSinceCompact(spark, ix) == 1,
        "the crashed append must not have advanced the marker")
      assert(ids().intersect(waveIds(1)) == waveIds(1),
        "the crashed append's rows are in the store (append is atomic per batch)")
      // next window: WITHOUT the crash this would be append #3 and the
      // fold would fire; the lost marker defers it exactly one window
      assert(graft.operators.AnnIndex.maintainAppend(
        wave(2), "vec_id", "embedding", ix, appendsWatermark = 3) == 2,
        "the under-count must defer the fold one window, not fire it")
      val preFold = rows()
      assert(preFold.keySet.intersect(waveIds(2)) == waveIds(2),
        "the deferred window's rows still land")
      // one window later the fold fires and the counter converges to 0
      assert(graft.operators.AnnIndex.maintainAppend(
        wave(3), "vec_id", "embedding", ix, appendsWatermark = 3) == 0,
        "the fold fires one window late and resets the counter")
      assert(graft.operators.AnnIndex.appendsSinceCompact(spark, ix) == 0)
      val postFold = rows()
      // content through the whole crash-and-recover history: every wave
      // exactly once (no duplicate ids — the append-missing discipline
      // is the CALLER's, but the crash itself must not duplicate), rows
      // bit-identical through the late fold
      assert(postFold.keySet == preFold.keySet ++ waveIds(3),
        "crash + deferred fold must lose and duplicate nothing")
      assert(preFold.forall { case (id, row) => postFold(id) == row },
        "pre-fold rows must survive the late fold bit-identical")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }

  test("AnnIndex.tombstone id typing: integral ids address a STRING-id store " +
      "(value-preserving cast), incompatible types still fail at the contract") {
    val base = java.nio.file.Files.createTempDirectory("graft_anntombstr_").toString
    val ix = s"$base/ix"
    try {
      // a string-id corpus (external doc keys): tiny fixed vectors
      val corpus = Seq(
        ("5", Seq(1.0f, 0.0f)), ("6", Seq(0.0f, 1.0f)),
        ("7", Seq(1.0f, 1.0f)), ("8", Seq(0.5f, 0.5f))
      ).toDF("doc_key", "embedding")
      graft.operators.AnnIndex.write(corpus, "doc_key", "embedding", ix,
        nList = 2, m = 2, codes = 2, iters = 1)
      // an INTEGRAL eviction list against the string-id store: allowed
      // explicitly — CAST(5 AS STRING) matches '5' (r18 ADVICE #3)
      graft.operators.AnnIndex.tombstone(spark, ix, Seq(5L, 7L).toDF("id"))
      val left = graft.operators.AnnIndex.codes(spark, ix)
        .select("doc_key").collect().map(_.getString(0)).toSet
      assert(left == Set("6", "8"),
        s"integral ids must address the string-id store value-preservingly, got $left")
      // a non-integral, non-matching id type still dies at the contract
      val e = intercept[IllegalArgumentException] {
        graft.operators.AnnIndex.tombstone(spark, ix, Seq(1.5).toDF("id"))
      }
      assert(e.getMessage.contains("incompatible"))
      // and a store whose string ids are integrally-intended but
      // NON-CANONICAL ('06' ≠ CAST(6 AS STRING)) must fail LOUDLY under
      // an integral eviction list instead of silently deleting nothing
      // (r19 ADVICE #5 — the widened cast can never match '06')
      val ix2 = s"$base/ix2"
      graft.operators.AnnIndex.write(
        Seq(("06", Seq(1.0f, 0.0f)), ("7", Seq(0.0f, 1.0f)))
          .toDF("doc_key", "embedding"),
        "doc_key", "embedding", ix2, nList = 2, m = 2, codes = 2, iters = 1)
      val e2 = intercept[Exception] {
        graft.operators.AnnIndex.tombstone(spark, ix2, Seq(6L).toDF("id"))
      }
      assert(e2.getMessage.contains("non-canonical") ||
        Option(e2.getCause).exists(_.getMessage.contains("non-canonical")),
        s"non-canonical store ids must fail the widened tombstone, got: $e2")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }

  implicit private class Tuple3Map[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map(t => t._1 -> ((t._2, t._3))).toMap
  }
}
