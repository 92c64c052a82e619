package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.toColumn
import org.apache.spark.sql.types._

/** Vector kernels for embedding similarity (SURVEY.md §2.3).
  *
  * The brute-force ANN inner loop is `cosine(query, candidate)` executed
  * N×Q times — at 100 TB this is THE hot path, so it's a primitive float
  * loop behind a codegen'd static call (no Row boxing, no
  * `functions.aggregate` chain of per-element Catalyst evals).
  */
object VectorMath {
  /** Cosine similarity of two float vectors; 0.0 for zero-norm inputs. */
  def cosineF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** Sign-bit LSH bucket from `nPlanes` seeded pseudo-random hyperplanes.
    * Plane weights are derived from splitmix64 streams — identical on
    * every executor with zero broadcast.
    */
  def hyperplaneBucket(v: ArrayData, nPlanes: Int): Long = {
    val n = v.numElements()
    var bucket = 0L
    var p = 0
    while (p < nPlanes) {
      var dot = 0.0
      var i = 0
      while (i < n) {
        // deterministic N(0,1)-ish weight from the mixed bits (uniform
        // in [-1,1) is enough for sign-LSH)
        val h = TextHashes.mix64(p.toLong * 0x9e3779b97f4a7c15L + i)
        val w = (h >> 11).toDouble / (1L << 52).toDouble // [-1, 1)
        dot += v.getFloat(i) * w
        i += 1
      }
      if (dot >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }
}

case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.cosineF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorMath.cosineF($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CosineSimExpr = copy(left = l, right = r)
  override def prettyName: String = "cosine_sim"
}

case class HyperplaneBucketExpr(child: Expression, nPlanes: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    VectorMath.hyperplaneBucket(v.asInstanceOf[ArrayData], nPlanes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorMath.hyperplaneBucket($c, $nPlanes)")
  override protected def withNewChildInternal(c: Expression): HyperplaneBucketExpr =
    copy(child = c)
  override def prettyName: String = "hyperplane_bucket"
}

object vectors {
  def cosine_sim(a: Column, b: Column): Column =
    toColumn(CosineSimExpr(text.expression(a), text.expression(b)))
  def hyperplane_bucket(v: Column, nPlanes: Int = 16): Column =
    toColumn(HyperplaneBucketExpr(text.expression(v), nPlanes))
}
