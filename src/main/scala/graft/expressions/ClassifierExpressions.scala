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
