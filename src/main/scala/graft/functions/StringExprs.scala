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

  /** Jaccard of the DISTINCT char n-gram STRING sets of two texts (set
    * semantics on the strings themselves, exactly like
    * `array_intersect(array_distinct(...))` — no hash-collision slack).
    * Returns -1.0 when both sets are empty; [[charJaccard]] maps that to
    * NULL (sentinel keeps the codegen primitive-typed).
    */
  def charJaccardRaw(a: String, b: String, n: Int): Double = {
    val sa = new java.util.HashSet[String]()
    var i = 0
    while (i + n <= a.length) { sa.add(a.substring(i, i + n)); i += 1 }
    val sb = new java.util.HashSet[String]()
    i = 0
    while (i + n <= b.length) { sb.add(b.substring(i, i + n)); i += 1 }
    var inter = 0
    val it = sb.iterator()
    while (it.hasNext) { if (sa.contains(it.next())) inter += 1 }
    val union = sa.size + sb.size - inter
    if (union == 0) -1.0 else inter.toDouble / union
  }

  def charJaccardRawU(a: UTF8String, b: UTF8String, n: Int): Double =
    charJaccardRaw(a.toString, b.toString, n)

  def charJaccard(a: Column, b: Column, n: Int): Column = {
    import org.apache.spark.sql.functions.{lit, nullif}
    nullif(column(CharJaccardExpr(expression(a), expression(b), n)),
      lit(-1.0))
  }

  /** Word n-gram shingle STRINGS in one pass — value-identical to the
    * HOF form `transform(sequence(...), i -> array_join(slice(split(s,
    * ' '), i, n), ' '))` (equality asserted in tests), but ~10× faster:
    * higher-order functions run interpreted per element and allocate a
    * slice array per gram, which made the 3-gram pass the dominant cost
    * of every quality/decontamination scan.
    */
  def wordShinglesRaw(s: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    // split(" ", -1): trailing empty tokens kept, same as Spark's
    // split(text, " ") (regex, default limit -1)
    val toks = s.toString.split(" ", -1)
    val m = toks.length - (n - 1)
    if (m < 1)
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    else {
      val out = new Array[Any](m)
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i < m) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  def wordShingles(c: Column, n: Int): Column =
    column(WordShinglesExpr(expression(c), n))
}

/** charJaccard(string, string) → double (-1.0 sentinel for empty∪empty). */
case class CharJaccardExpr(left: Expression, right: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    NativeString.charJaccardRawU(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.NativeString.charJaccardRawU($a, $b, $n)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CharJaccardExpr =
    copy(left = l, right = r)
}

/** wordShingles(string) → array<string> of word n-grams, one codegen pass. */
case class WordShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    NativeString.wordShinglesRaw(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NativeString.wordShinglesRaw($c, $n)")
  override protected def withNewChildInternal(c: Expression): WordShinglesExpr =
    copy(child = c)
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
