package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** The compiled scoring side of the hashed-n-gram linear classifier
  * (graft.operators.QualityClassifier): per document, sum the learned
  * per-bucket weights of its tokens' md5 hash buckets — the
  * fastText-style pipeline-filter hot path, pure map, no shuffle, no
  * UDF. The weight vector (65 536 doubles, 512 KB) rides along as a
  * codegen reference object.
  *
  * The bucket function is EXACTLY the d13 slot convention —
  * `CAST('0x' || substr(md5(tok), 1, 4) AS INT)`, i.e. the first two
  * digest bytes big-endian — so an engine-independent oracle (DuckDB)
  * can recompute both training counts and scores bit-for-bit.
  */
object ClassifierExpr {
  def hashedScore(tokens: Column, weights: Array[Double]): Column =
    TextExpr.columnOf(HashedScore(TextExpr.expressionOf(tokens), weights))

  def sigTableMatchCount(
      a: Column,
      b: Column,
      table: org.apache.spark.broadcast.Broadcast[graft.operators.SigTable]): Column =
    TextExpr.columnOf(SigTableMatchCount(
      TextExpr.expressionOf(a), TextExpr.expressionOf(b), table))
}

final class HashedWeights(val w: Array[Double]) extends Serializable {
  require(w.length == HashedWeights.Buckets, s"expected ${HashedWeights.Buckets} buckets")
  def score(a: ArrayData): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    var s = 0.0
    val n = a.numElements()
    var i = 0
    while (i < n) {
      val t = a.getUTF8String(i)
      if (t != null) {
        md.reset()
        val d = md.digest(t.getBytes)
        s += w(((d(0) & 0xff) << 8) | (d(1) & 0xff))
      }
      i += 1
    }
    s
  }
}
object HashedWeights { val Buckets = 65536 }

/** Equal-component count of two corpus signatures looked up by id in a
  * broadcast [[graft.operators.SigTable]] — the map-side MinHash
  * estimate kill as ONE compiled binary expression instead of two
  * broadcast hash joins (whose exchanges AQE provably cannot unify
  * over a cached build side — see SigTable's doc). -1 when either id
  * is unknown to the table.
  */
case class SigTableMatchCount(
    left: Expression,
    right: Expression,
    table: org.apache.spark.broadcast.Broadcast[graft.operators.SigTable])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sig_table_match_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    table.value.matchCount(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sigTableBc", table,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    defineCodeGen(ctx, ev, (a, b) =>
      s"((graft.operators.SigTable) $ref.value()).matchCount($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SigTableMatchCount =
    copy(left = newLeft, right = newRight)
}

case class HashedScore(child: Expression, weights: Array[Double])
    extends UnaryExpression
    with ImplicitCastInputTypes {
  private val holder = new HashedWeights(weights)
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_hashed_score"

  override def nullSafeEval(input: Any): Any =
    holder.score(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hashedWeights", holder,
      classOf[HashedWeights].getName)
    defineCodeGen(ctx, ev, x => s"$ref.score($x)")
  }

  override protected def withNewChildInternal(newChild: Expression): HashedScore =
    copy(child = newChild)
}
