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

  /** dot(a,b), ‖a‖², ‖b‖² in one pass; cosine from the three.
    *
    * Zero-norm sides (all-zero vectors — real corpora carry them as
    * failed/padded embeds; found by the fuzz-corpus gate) are DEFINED
    * as cosine 0.0, not NaN: a direction-free vector is similar to
    * nothing, so it can never out-rank a genuine neighbor, and NaN —
    * which poisons every comparison and diverges across engines — never
    * enters a top-k heap. The HOF and SQL twins carry the same CASE.
    */
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
    val den = math.sqrt(aa) * math.sqrt(bb)
    if (den == 0.0) 0.0 else dot / den
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

  /** One-pass int8 quantization (codes contract: graft.ext.Similarity
    * .quantizeInt8Hof — max|v| scan, s = 127/max|v|, half-up
    * floor(v·s + 0.5), clamp ±127; all-zero → all-zero codes). The HOF
    * form re-evaluates `array_max` INSIDE the per-element lambda
    * (O(d²) interpreted per vector — the round-8 q86 hot spot); this is
    * O(d) and JIT'd, with the identical IEEE double op sequence.
    */
  def quantizeData(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(a.getDouble(i))
      if (v > maxAbs) maxAbs = v
      i += 1
    }
    val out = new Array[Long](n)
    if (maxAbs != 0.0) {
      val s = 127.0 / maxAbs
      i = 0
      while (i < n) {
        val c = math.floor(a.getDouble(i) * s + 0.5).toLong
        out(i) = if (c < -127L) -127L else if (c > 127L) 127L else c
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def quantizeInt8(embD: Column): Column =
    column(QuantizeInt8Expr(expression(embD)))

  /** JL random projection to `outDim` dims (coefficient contract:
    * graft.ext.Similarity.randomProjectHof — sign from the parity of a
    * double PortableHash.affine pass over j·1024+k). Accumulation runs
    * k-ascending per output dim — the same sequential association as
    * the HOF fold and DuckDB's `list_reduce`, so projections are
    * bit-identical. The HOF form interprets outDim·dim affine hashes
    * per row; this is one JIT'd loop.
    */
  def randomProjectData(emb: ArrayData, outDim: Int, seed: Int): ArrayData = {
    val P = 1000000007L
    val n = emb.numElements()
    val out = new Array[Double](outDim)
    val a1 = (seed.toLong * 40503L + 17L) % P
    val b1 = (seed.toLong * 97L + 1L) % P
    val j2 = seed.toLong + 4L
    val a2 = (j2 * 40503L + 17L) % P
    val b2 = (j2 * 97L + 1L) % P
    var j = 0
    while (j < outDim) {
      var acc = 0.0
      var k = 0
      while (k < n) {
        val x = j.toLong * 1024L + k.toLong
        val h1 = (a1 * x % P + b1) % P
        val h2 = (a2 * h1 % P + b2) % P
        acc += emb.getDouble(k) * (if (h2 % 2L == 0L) 1.0 else -1.0)
        k += 1
      }
      out(j) = acc
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def randomProject(embD: Column, outDim: Int, seed: Int): Column =
    column(RandomProjectExpr(expression(embD), outDim, seed))
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

/** quantizeInt8(array<double>) → array<long> int8 codes. */
case class QuantizeInt8Expr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    NativeVector.quantizeData(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NativeVector.quantizeData($c)")
  override protected def withNewChildInternal(c: Expression): QuantizeInt8Expr =
    copy(child = c)
}

/** randomProject(array<double>, outDim, seed) → array<double>. */
case class RandomProjectExpr(child: Expression, outDim: Int, seed: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    NativeVector.randomProjectData(v.asInstanceOf[ArrayData], outDim, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NativeVector.randomProjectData($c, $outDim, $seed)")
  override protected def withNewChildInternal(c: Expression): RandomProjectExpr =
    copy(child = c)
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
