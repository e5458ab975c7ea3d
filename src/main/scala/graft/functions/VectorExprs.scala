package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector math for the similarity operators. Same motivation as
  * [[NativeHash]]: `zip_with`/`aggregate` formulations are interpreted;
  * these run one JIT pass per pair while producing bit-identical doubles
  * (each accumulator is summed in index order — the same sequential
  * association as the HOF fold and the DuckDB `list_reduce` twin).
  */
object NativeVector {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** dot(a,b), ‖a‖², ‖b‖² in one pass; cosine from the three. */
  def cosineData(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var dot = 0.0
    var aa = 0.0
    var bb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      aa += x * x
      bb += y * y
      i += 1
    }
    dot / (math.sqrt(aa) * math.sqrt(bb))
  }

  def dotData(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var dot = 0.0
    var i = 0
    while (i < n) { dot += a.getDouble(i) * b.getDouble(i); i += 1 }
    dot
  }

  def cosine(a: Column, b: Column): Column =
    column(CosineSimExpr(expression(a), expression(b)))
  def dot(a: Column, b: Column): Column =
    column(DotExpr(expression(a), expression(b)))

  /** All `planes` hyperplane projections in one pass (coefficient formula
    * identical to graft.ext.Similarity.planeCoef, 1-based dim index);
    * each projection accumulates in dim order — bit-identical to the
    * per-plane HOF folds.
    */
  def lshBucketData(emb: ArrayData, planes: Int): Long = {
    val n = emb.numElements()
    val acc = new Array[Double](planes)
    var i = 0
    while (i < n) {
      val x = emb.getDouble(i)
      var j = 0
      while (j < planes) {
        val w = ((j.toLong * 131071L + (i + 1).toLong * 524287L) % 2000001L
          - 1000000L).toDouble
        acc(j) += x * w
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < planes) {
      if (acc(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  def lshBucket(emb: Column, planes: Int): Column =
    column(LshBucketExpr(expression(emb), planes))

  /** Integer dot over int8 code vectors (stored as array<long>) — the
    * quantized-retrieval hot path: exact BIGINT arithmetic (|q| ≤ 127 ⇒
    * |dot| ≤ 127²·dim, nowhere near overflow), so scores are bit-equal
    * in any engine with no float caveat at all.
    */
  def qdotData(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    var dot = 0L
    var i = 0
    while (i < n) { dot += a.getLong(i) * b.getLong(i); i += 1 }
    dot
  }

  def qdot(a: Column, b: Column): Column =
    column(QDotExpr(expression(a), expression(b)))
}

/** lshBucket(array<double>) → long bucket id from hyperplane sign bits. */
case class LshBucketExpr(child: Expression, planes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    NativeVector.lshBucketData(v.asInstanceOf[ArrayData], planes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NativeVector.lshBucketData($c, $planes)")
  override protected def withNewChildInternal(c: Expression): LshBucketExpr =
    copy(child = c)
}

/** cosine(array<double>, array<double>) → double. */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    NativeVector.cosineData(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.NativeVector.cosineData($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CosineSimExpr = copy(left = l, right = r)
}

/** qdot(array<long>, array<long>) → long (exact integer dot). */
case class QDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    NativeVector.qdotData(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.NativeVector.qdotData($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): QDotExpr = copy(left = l, right = r)
}

/** dot(array<double>, array<double>) → double. */
case class DotExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    NativeVector.dotData(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.NativeVector.dotData($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DotExpr = copy(left = l, right = r)
}
