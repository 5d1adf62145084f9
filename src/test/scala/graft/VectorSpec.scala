package graft

import org.apache.spark.sql.functions._
import graft.functions.Vectors
import org.apache.spark.sql.graft.VectorExpr

/** Dense-vector kernels: dot/cosine custom expressions vs hand values
  * and vs the HOF formulations they replaced.
  */
class VectorSpec extends SparkSpec {
  import spark.implicits._

  private val vs = Seq(
    (1L, Array(1.0, 0.0, 0.0)),
    (2L, Array(0.0, 1.0, 0.0)),
    (3L, Array(2.0, 0.0, 0.0)),
    (4L, Array(1.0, 1.0, 0.0)),
    (5L, Array(0.0, 0.0, 0.0))
  ).toDF("id", "v")

  test("dot product: hand-checked values") {
    val pairs = vs.as("a").crossJoin(vs.as("b"))
      .select($"a.id".as("ia"), $"b.id".as("ib"), Vectors.dot($"a.v", $"b.v").as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 1L)) == 1.0)
    assert(pairs((1L, 2L)) == 0.0)
    assert(pairs((1L, 3L)) == 2.0)
    assert(pairs((4L, 4L)) == 2.0)
  }

  test("cosine: orthogonal 0, parallel 1, zero-vector 0") {
    val pairs = vs.as("a").crossJoin(vs.as("b"))
      .select($"a.id".as("ia"), $"b.id".as("ib"), Vectors.cosine($"a.v", $"b.v").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 2L)) == 0.0)
    assert(pairs((1L, 3L)) == 1.0)
    assert(math.abs(pairs((1L, 4L)) - 1.0 / math.sqrt(2)) < 1e-15)
    assert(pairs((1L, 5L)) == 0.0, "zero vector must give 0, not NaN")
  }

  test("dot/cosine match the HOF formulations bit-for-bit") {
    val em = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(20)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val pairs = em.as("a").crossJoin(em.as("b"))
    def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val rows = pairs.select(
      Vectors.dot($"a.v", $"b.v").as("fastDot"),
      hofDot($"a.v", $"b.v").as("refDot"),
      Vectors.cosine($"a.v", $"b.v").as("fastCos"),
      (hofDot($"a.v", $"b.v") / sqrt(hofDot($"a.v", $"a.v") * hofDot($"b.v", $"b.v"))).as("refCos")
    ).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), "dot mismatch")
      assert(r.getDouble(2) == r.getDouble(3), "cosine mismatch")
    }
  }

  test("random projections match the xxhash64-derived HOF hyperplanes bit-for-bit") {
    val em = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(10)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val n = 8
    // reference: projection i = sum_j v[j] * (xxhash64(i, j) / Long.MaxValue)
    val ref = transform(
      sequence(lit(0), lit(n - 1)),
      i =>
        aggregate(
          zip_with($"v", sequence(lit(0), size($"v") - 1),
            (x, j) => x * (xxhash64(i, j).cast("double") / lit(Long.MaxValue.toDouble))),
          lit(0.0),
          (acc, p) => acc + p
        )
    )
    val rows = em.select(VectorExpr.randomProjections($"v", n).as("fast"), ref.as("ref")).collect()
    rows.foreach { r =>
      val f = r.getSeq[Double](0); val g = r.getSeq[Double](1)
      assert(f.size == n && g.size == n)
      f.indices.foreach(i => assert(math.abs(f(i) - g(i)) < 1e-12, s"projection $i differs"))
    }
  }

  test("packBuckets: bucket ids stable and table-indexed") {
    val em = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(5)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .withColumn("proj", VectorExpr.randomProjections($"v", 16))
    val rows = em.select(Vectors.packBuckets($"proj", 8, 2).as("b")).collect()
    rows.foreach { r =>
      val tables = r.getSeq[org.apache.spark.sql.Row](0)
      assert(tables.map(_.getInt(0)) == Seq(0, 1))
      tables.foreach(t => assert(t.getLong(1) >= 0 && t.getLong(1) < 256))
    }
  }

  test("packSignBits: bit i equals sign of projection i (parity with a scala fold)") {
    val em = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(10)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .withColumn("proj", VectorExpr.randomProjections($"v", 100)) // 100 -> 2 words, 28 pad bits
    val rows = em.select($"proj", VectorExpr.packSignBits($"proj").as("pb")).collect()
    rows.foreach { r =>
      val proj = r.getSeq[Double](0)
      val packed = r.getSeq[Long](1)
      assert(packed.length == 2, "100 bits pack into 2 words")
      val expected = Array.ofDim[Long](2)
      proj.zipWithIndex.foreach { case (p, i) => if (p >= 0) expected(i >>> 6) |= (1L << (i & 63)) }
      assert(packed == expected.toSeq)
    }
  }

  test("packedHamming: distance matches an unpacked bit count, pads cancel") {
    val em = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(8)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .withColumn("pb", VectorExpr.packSignBits(VectorExpr.randomProjections($"v", 100)))
    val rows = em.as("a").crossJoin(em.as("b"))
      .select($"a.pb".as("pa"), $"b.pb".as("pb2"),
        VectorExpr.packedHamming($"a.pb", $"b.pb").as("d"))
      .collect()
    rows.foreach { r =>
      val a = r.getSeq[Long](0); val b = r.getSeq[Long](1)
      val expected = a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
      assert(r.getInt(2) == expected)
      assert(r.getInt(2) <= 100, "pad bits beyond the projection count never differ")
    }
    // distance 0 on the diagonal
    assert(rows.count(_.getInt(2) == 0) >= 8)
  }
}
