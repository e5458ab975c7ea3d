package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native string counting for the text-analysis hot paths. */
object NativeString {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Non-overlapping occurrence count — exactly the number of removals a
    * single-pass `replace(s, sub, '')` performs, i.e. identical to the
    * `(length(s) - length(replace(s, sub, ''))) / length(sub)` formula
    * the HOF form and the DuckDB oracle use.
    */
  def countOccurrences(s: String, sub: String): Long = {
    if (sub.isEmpty) return 0L
    var n = 0L
    var i = s.indexOf(sub)
    while (i >= 0) {
      n += 1
      i = s.indexOf(sub, i + sub.length)
    }
    n
  }

  def countOccurrencesU(s: UTF8String, sub: String): Long =
    countOccurrences(s.toString, sub)

  def countSubstr(c: Column, sub: String): Column =
    column(CountSubstrExpr(expression(c), sub))
}

/** countSubstr(string) → long (non-overlapping). */
case class CountSubstrExpr(child: Expression, sub: String)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    NativeString.countOccurrencesU(v.asInstanceOf[UTF8String], sub)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val subRef = ctx.addReferenceObj("sub", sub, "java.lang.String")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NativeString.countOccurrencesU($c, $subRef)")
  }
  override protected def withNewChildInternal(c: Expression): CountSubstrExpr =
    copy(child = c)
}
