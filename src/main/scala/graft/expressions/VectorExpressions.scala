package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the dense-vector hot path.
  *
  * The higher-order-function formulations (zip_with + aggregate) are
  * evaluated interpreted, one lambda call per element — ~100x slower than
  * codegen on wide vectors. These expressions compile to (or JIT as) a
  * tight loop over the unsafe array data, keeping ANN/near-dup kernels
  * CPU-bound instead of interpreter-bound. Semantics (accumulation order,
  * zero-denominator handling) match the HOF versions bit-for-bit so the
  * DuckDB oracle comparison is unaffected.
  */
object VectorExpr {
  private def col(e: Expression): Column = ExpressionUtils.column(e)
  private def expr(c: Column): Expression = ExpressionUtils.expression(c)

  /** Σ a[i]·b[i] over array<double> columns (codegen'd). */
  def dot(a: Column, b: Column): Column = col(DotProduct(expr(a), expr(b)))

  /** Single-pass cosine similarity: dot / sqrt(‖a‖²·‖b‖²), 0.0 when a
    * norm is zero (codegen'd).
    */
  def cosine(a: Column, b: Column): Column = col(CosineSim(expr(a), expr(b)))

  /** n pseudo-random projections Σ_j v[j]·h(i,j) with hyperplane
    * components h(i,j) = xxhash64(i, j) / Long.MaxValue ∈ [-1, 1] — the
    * same derivation as the HOF version, but with the hyperplane matrix
    * materialized once per task instead of re-hashed per row.
    */
  def randomProjections(v: Column, n: Int): Column = col(RandomProjections(expr(v), n))

  /** Multi-table sign-bit bucket packing of a projections array:
    * (table, bucket) structs, bucket bit i = sign of projection
    * table·nBits+i. Compiled — the transform+aggregate fold ran
    * nTables·nBits interpreted lambda steps per corpus row.
    */
  /** Sign bits of a projection array packed into array<long> (64/word).
    * The packed row is a compact LSH sketch: broadcastable at corpus
    * scale (2 longs for 112 projections vs dim-wide doubles), feeding
    * the map-side Hamming kill in embedding near-dup.
    */
  def packSignBits(proj: Column): Column = col(PackSignBits(expr(proj)))

  /** Hamming distance between two packed sign-bit arrays (codegen'd
    * xor+popcount per word). Zero padding beyond the projection count
    * cancels in the xor, so no bit-length bookkeeping is needed.
    */
  def packedHamming(a: Column, b: Column): Column = col(PackedHamming(expr(a), expr(b)))

  def packBuckets(proj: Column, nBits: Int, nTables: Int): Column =
    col(PackBuckets(expr(proj), nBits, nTables))

  /** Cosine similarity of a vector against every row of a fixed
    * centroid matrix (array<double> result) — the IVF assign kernel,
    * with the matrix shipped once per task as a reference object.
    */
  def centroidScores(v: Column, cents: Array[Array[Double]]): Column =
    col(CentroidScores(expr(v), cents))

  /** Index of the maximum of an array<double>; ties prefer the LOWER
    * index (matching the descending (score, -index) struct sort).
    */
  def argMaxIndex(scores: Column): Column = col(ArgMaxIndex(expr(scores)))

  /** Indices of the k largest values, descending by value, ties by
    * lower index first.
    */
  def topKIndices(scores: Column, k: Int): Column = col(TopKIndices(expr(scores), k))

  /** PQ codes of a vector against per-subspace codebooks: array<int>,
    * one L2-nearest codeword index per subspace (codegen'd).
    */
  def pqEncode(v: Column, books: Array[Array[Array[Double]]]): Column =
    col(PqEncode(expr(v), books))

  /** Flattened per-query ADC distance tables against the same codebooks
    * (array<double> of m·k squared subspace distances, codegen'd).
    */
  def pqDistTables(v: Column, books: Array[Array[Array[Double]]]): Column =
    col(PqDistTables(expr(v), books))

  /** ADC distance from a codes array and a flattened table array: m
    * lookups replacing a full-dimension distance (codegen'd).
    */
  def pqAdc(codes: Column, tables: Column, codesPerSub: Int): Column =
    col(PqAdc(expr(codes), expr(tables), codesPerSub))
}

/** Static kernels callable from generated code (see TextKernels). */
object VectorKernels {
  def argMax(a: ArrayData): Int = {
    val n = a.numElements()
    var best = 0
    var bestV = Double.NegativeInfinity
    var i = 0
    while (i < n) {
      val v = a.getDouble(i)
      if (v > bestV) { bestV = v; best = i } // strict > : ties keep lower index
      i += 1
    }
    best
  }

  def topK(a: ArrayData, k: Int): ArrayData = {
    val n = a.numElements()
    val idx = Array.tabulate(n)(identity)
    // stable sort by descending value keeps lower indices first on ties
    val sorted = idx.sortBy(i => -a.getDouble(i))
    new GenericArrayData(sorted.take(math.min(k, n)))
  }

  def packBuckets(proj: ArrayData, nBits: Int, nTables: Int): ArrayData = {
    val out = new Array[Any](nTables)
    var t = 0
    while (t < nTables) {
      var b = 0L
      var i = 0
      while (i < nBits) {
        if (proj.getDouble(t * nBits + i) >= 0) b |= (1L << i)
        i += 1
      }
      out(t) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](t, b))
      t += 1
    }
    new GenericArrayData(out)
  }

  def packSignBits(proj: ArrayData): ArrayData = {
    val n = proj.numElements()
    val out = new Array[Long]((n + 63) >>> 6)
    var i = 0
    while (i < n) {
      if (proj.getDouble(i) >= 0) out(i >>> 6) |= (1L << (i & 63))
      i += 1
    }
    new GenericArrayData(out)
  }

  def packedHamming(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var d = 0
    var i = 0
    while (i < n) { d += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i)); i += 1 }
    d
  }

  def pqAdc(codes: ArrayData, tables: ArrayData, codesPerSub: Int): Double = {
    val m = codes.numElements()
    val nt = tables.numElements()
    // a codes/tables mismatch (wrong codesPerSub, codebooks from another
    // training run) must fail loudly, not score as a silently-small sum
    if (m * codesPerSub != nt)
      throw new IllegalArgumentException(
        s"pq_adc: codes has m=$m subspaces but tables has $nt entries != m*codesPerSub=${m * codesPerSub}")
    var s = 0
    var sum = 0.0
    while (s < m) {
      sum += tables.getDouble(s * codesPerSub + codes.getInt(s))
      s += 1
    }
    sum
  }
}

/** Sign-bit LSH bucket packing (compiled loop). */
case class PackBuckets(child: Expression, nBits: Int, nTables: Int)
    extends UnaryExpression
    with ImplicitCastInputTypes {
  require(nBits > 0 && nTables > 0, "nBits and nTables must be positive")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("table", IntegerType, nullable = false),
      StructField("bucket", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_pack_buckets"

  override def nullSafeEval(input: Any): Any =
    VectorKernels.packBuckets(input.asInstanceOf[ArrayData], nBits, nTables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"org.apache.spark.sql.graft.VectorKernels.packBuckets($x, $nBits, $nTables)")

  override protected def withNewChildInternal(newChild: Expression): PackBuckets =
    copy(child = newChild)
}

/** Projection sign bits packed into array<long> (compiled loop). */
case class PackSignBits(child: Expression)
    extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_pack_sign_bits"

  override def nullSafeEval(input: Any): Any =
    VectorKernels.packSignBits(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"org.apache.spark.sql.graft.VectorKernels.packSignBits($x)")

  override protected def withNewChildInternal(newChild: Expression): PackSignBits =
    copy(child = newChild)
}

/** Hamming distance of two packed sign-bit arrays (xor + popcount). */
case class PackedHamming(left: Expression, right: Expression)
    extends BinaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_packed_hamming"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.packedHamming(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, y) => s"org.apache.spark.sql.graft.VectorKernels.packedHamming($x, $y)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PackedHamming =
    copy(left = newLeft, right = newRight)
}

/** Dot product of two array<double> columns. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (x, y) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        s"""
        int $n = java.lang.Math.min($x.numElements(), $y.numElements());
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) { $s += $x.getDouble($i) * $y.getDouble($i); }
        ${ev.value} = $s;
        """
      }
    )

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity of two array<double> columns in one pass. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    val den = math.sqrt(na * nb)
    if (den == 0.0) 0.0 else dot / den
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (x, y) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val dot = ctx.freshName("dot")
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val xv = ctx.freshName("xv")
        val yv = ctx.freshName("yv")
        val den = ctx.freshName("den")
        s"""
        int $n = java.lang.Math.min($x.numElements(), $y.numElements());
        double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $xv = $x.getDouble($i); double $yv = $y.getDouble($i);
          $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
        }
        double $den = java.lang.Math.sqrt($na * $nb);
        ${ev.value} = ($den == 0.0) ? 0.0 : $dot / $den;
        """
      }
    )

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** n pseudo-random projections of an array<double> vector. The
  * hyperplane matrix (n × dim doubles, derived from xxhash64 so no
  * trained side-file ships to executors) is built lazily once per task
  * and reused across rows — the dominant cost drops from
  * O(rows·n·dim) hashes to O(rows·n·dim) multiply-adds.
  * Codegen calls back into this instance (reference object) so the
  * per-task hyperplane cache is preserved while the child expression
  * stays inside WholeStageCodegen.
  */
case class RandomProjections(child: Expression, n: Int)
    extends UnaryExpression
    with ImplicitCastInputTypes {
  require(n > 0, "n must be positive")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_random_projections"

  @transient private var planes: Array[Double] = _
  @transient private var planesDim: Int = -1

  /** Row-major n × dim hyperplane components h(i,j) = xxhash64(i,j)
    * scaled to [-1,1]; xxhash64(i,j) = hashInt(j, hashInt(i, 42)) —
    * identical to Spark's two-argument xxhash64 over int columns.
    */
  private def planesFor(dim: Int): Array[Double] = {
    if (planesDim != dim) {
      val arr = new Array[Double](n * dim)
      var i = 0
      while (i < n) {
        val hi = XXH64.hashInt(i, 42L)
        var j = 0
        while (j < dim) {
          arr(i * dim + j) = XXH64.hashInt(j, hi).toDouble / Long.MaxValue.toDouble
          j += 1
        }
        i += 1
      }
      planes = arr
      planesDim = dim
    }
    planes
  }

  /** Kernel shared by interpreted eval and generated code. */
  def project(v: ArrayData): ArrayData = {
    val dim = v.numElements()
    val h = planesFor(dim)
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      var s = 0.0
      var j = 0
      val off = i * dim
      while (j < dim) { s += v.getDouble(j) * h(off + j); j += 1 }
      out(i) = s
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = project(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftProj", this, classOf[RandomProjections].getName)
    defineCodeGen(ctx, ev, x => s"$ref.project($x)")
  }

  override protected def withNewChildInternal(newChild: Expression): RandomProjections =
    copy(child = newChild)
}

/** Cosine of a vector against each row of a per-task centroid matrix. */
case class CentroidScores(child: Expression, cents: Array[Array[Double]])
    extends UnaryExpression
    with ImplicitCastInputTypes {
  require(cents.nonEmpty, "empty centroid matrix")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_centroid_scores"

  def score(input: ArrayData): ArrayData = {
    val dim = input.numElements()
    val v = new Array[Double](dim)
    var j = 0
    while (j < dim) { v(j) = input.getDouble(j); j += 1 }
    var nv = 0.0
    j = 0
    while (j < dim) { nv += v(j) * v(j); j += 1 }
    val out = new Array[Double](cents.length)
    var c = 0
    while (c < cents.length) {
      val ct = cents(c)
      val n = math.min(dim, ct.length)
      var dot = 0.0; var nc = 0.0
      var i = 0
      while (i < n) { dot += v(i) * ct(i); nc += ct(i) * ct(i); i += 1 }
      val den = math.sqrt(nv * nc)
      out(c) = if (den == 0.0) 0.0 else dot / den
      c += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = score(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftCents", this, classOf[CentroidScores].getName)
    defineCodeGen(ctx, ev, x => s"$ref.score($x)")
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidScores =
    copy(child = newChild)
}

/** argmax over array<double>; ties prefer the lower index. */
case class ArgMaxIndex(child: Expression)
    extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_argmax_index"

  override def nullSafeEval(input: Any): Any =
    VectorKernels.argMax(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"org.apache.spark.sql.graft.VectorKernels.argMax($x)")

  override protected def withNewChildInternal(newChild: Expression): ArgMaxIndex =
    copy(child = newChild)
}

/** Indices of the k largest values, descending, ties by lower index. */
case class TopKIndices(child: Expression, k: Int)
    extends UnaryExpression
    with ImplicitCastInputTypes {
  require(k > 0, "k must be positive")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_topk_indices"

  override def nullSafeEval(input: Any): Any =
    VectorKernels.topK(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"org.apache.spark.sql.graft.VectorKernels.topK($x, $k)")

  override protected def withNewChildInternal(newChild: Expression): TopKIndices =
    copy(child = newChild)
}

/** Product-quantization encoder: the vector splits into one contiguous
  * subspace per codebook; the output int array holds, per subspace, the
  * index of the L2-nearest codeword (ties prefer the lower code, the
  * ArgMaxIndex convention). The codebook tensor ships once per task as
  * a reference object — m·k·subDim doubles, the model.
  */
case class PqEncode(child: Expression, books: Array[Array[Array[Double]]])
    extends UnaryExpression
    with ImplicitCastInputTypes {
  require(books.nonEmpty && books.forall(_.nonEmpty), "empty PQ codebooks")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  def encode(input: ArrayData): ArrayData = {
    val out = new Array[Int](books.length)
    var off = 0
    var s = 0
    while (s < books.length) {
      val book = books(s)
      val d = book(0).length
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < book.length) {
        val cw = book(c)
        var dist = 0.0
        var j = 0
        while (j < d) {
          val x = (if (off + j < input.numElements()) input.getDouble(off + j) else 0.0) - cw(j)
          dist += x * x
          j += 1
        }
        if (dist < bestD) { bestD = dist; best = c } // strict < : ties keep lower code
        c += 1
      }
      out(s) = best
      off += d
      s += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftPqBooks", this, classOf[PqEncode].getName)
    defineCodeGen(ctx, ev, x => s"$ref.encode($x)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Per-query PQ distance tables, flattened: out[s·k + c] = squared L2
  * between the query's s-th subvector and codeword c of subspace s. The
  * asymmetric-distance (ADC) companion of [[PqEncode]]: the query keeps
  * full precision, the corpus only its codes.
  */
case class PqDistTables(child: Expression, books: Array[Array[Array[Double]]])
    extends UnaryExpression
    with ImplicitCastInputTypes {
  require(books.nonEmpty && books.forall(_.nonEmpty), "empty PQ codebooks")
  require(books.forall(_.length == books(0).length),
    "all subspaces must carry the same codeword count (flattened table layout)")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_pq_dist_tables"

  def tables(input: ArrayData): ArrayData = {
    val k = books(0).length
    val out = new Array[Double](books.length * k)
    var off = 0
    var s = 0
    while (s < books.length) {
      val book = books(s)
      val d = book(0).length
      var c = 0
      while (c < k) {
        val cw = book(c)
        var dist = 0.0
        var j = 0
        while (j < d) {
          val x = (if (off + j < input.numElements()) input.getDouble(off + j) else 0.0) - cw(j)
          dist += x * x
          j += 1
        }
        out(s * k + c) = dist
        c += 1
      }
      off += d
      s += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = tables(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftPqBooks", this, classOf[PqDistTables].getName)
    defineCodeGen(ctx, ev, x => s"$ref.tables($x)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqDistTables =
    copy(child = newChild)
}

/** ADC distance: Σ_s tables[s·codesPerSub + codes[s]] — the m table
  * lookups that replace a full-dimension distance in a PQ scan.
  */
case class PqAdc(left: Expression, right: Expression, codesPerSub: Int)
    extends BinaryExpression
    with ImplicitCastInputTypes {
  require(codesPerSub > 0, "codesPerSub must be positive")
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc"

  override def nullSafeEval(codes: Any, tables: Any): Any =
    VectorKernels.pqAdc(codes.asInstanceOf[ArrayData], tables.asInstanceOf[ArrayData], codesPerSub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, y) => s"org.apache.spark.sql.graft.VectorKernels.pqAdc($x, $y, $codesPerSub)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}
