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

  /** True iff `s` contains no surrogate code unit — every code unit IS
    * a code point, so code-point windows collapse to code-unit windows.
    * The round-11 tax trim (round-10 review item #4): the astral-plane
    * totality fixes routed every char operation through
    * [[codePointOffsets]] (two walks + an offsets allocation per call);
    * this one-pass, zero-allocation probe lets pure-BMP text — the
    * overwhelming majority of any real corpus — keep the flat layout,
    * while surrogate-bearing text still takes the exact code-point
    * path (spec-pinned in EdgeSemanticsSpec).
    */
  def isBmp(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (ch >= 0xD800 && ch <= 0xDFFF) return false
      i += 1
    }
    true
  }

  /** Code-unit offset of every code point of `s`, plus the end mark:
    * `offs(k)` is where the k-th code point starts; length = count+1.
    * Shared by every native path that windows or symbolizes per code
    * point (char shingles, char jaccard, BPE symbolization) — the walk
    * exists ONCE, so a boundary fix can't drift the twins apart.
    * Hot callers gate on [[isBmp]] first and skip this entirely for
    * surrogate-free text.
    */
  def codePointOffsets(s: String): Array[Int] = {
    val n = s.codePointCount(0, s.length)
    val offs = new Array[Int](n + 1)
    var i = 0
    var k = 0
    while (i < s.length) {
      offs(k) = i
      i += Character.charCount(s.codePointAt(i))
      k += 1
    }
    offs(n) = s.length
    offs
  }

  def countSubstr(c: Column, sub: String): Column =
    column(CountSubstrExpr(expression(c), sub))

  /** Jaccard of the DISTINCT char n-gram STRING sets of two texts (set
    * semantics on the strings themselves, exactly like
    * `array_intersect(array_distinct(...))` — no hash-collision slack).
    * Returns -1.0 when both sets are empty; [[charJaccard]] maps that to
    * NULL (sentinel keeps the codegen primitive-typed).
    */
  def charJaccardRaw(a: String, b: String, n: Int): Double = {
    // n-gram windows of n CODE POINTS (not UTF-16 units): the SQL twin
    // windows DuckDB's per-code-point char list, so astral-plane chars
    // must occupy one slot here too
    def grams(s: String): java.util.HashSet[String] = {
      val set = new java.util.HashSet[String]()
      if (isBmp(s)) {
        // BMP fast path: code points == code units, window directly
        var t = 0
        while (t + n <= s.length) { set.add(s.substring(t, t + n)); t += 1 }
      } else {
        val offs = codePointOffsets(s)
        val cps = offs.length - 1
        var t = 0
        while (t + n <= cps) {
          set.add(s.substring(offs(t), offs(t + n))); t += 1
        }
      }
      set
    }
    val sa = grams(a)
    val sb = grams(b)
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

  /** BPE merge application (tokenizer INFERENCE — [[graft.ext.Text.bpePairStats]]
    * is the training half): each whitespace word starts as its character
    * sequence; each merge rule `(a, b)`, in list order, runs ONE greedy
    * left-to-right pass replacing adjacent symbol pairs `a, b` with the
    * merged symbol `a+b` (the standard BPE apply step, Sennrich et al.
    * 2016). Cascading within one rule is impossible (`a+b ≠ a` since `b`
    * is non-empty), so the greedy pair scan and a left fold that
    * re-checks the accumulator tail are the SAME function — the DuckDB
    * twin uses the fold form over the same separator-joined symbol
    * string.
    *
    * Output encoding: per word, symbols joined by U+001F (the ASCII
    * unit separator — a control char absent from real document text;
    * an earlier printable separator collided with ordinary
    * punctuation); words joined by a single space. U+001F and space
    * are reserved: a word containing U+001F fails loudly rather than
    * encode ambiguously.
    */
  def bpeEncodeRaw(s: String, merges: Array[String]): String = {
    val words = s.split(" ", -1)
    val out = new java.lang.StringBuilder(s.length * 2)
    var first = true
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        // U+001F (unit separator) — a C0 control char no real document
        // text carries (a printable separator like ';' collided with
        // ordinary punctuation, found by the fuzz-corpus gate). Still
        // loud on collision: silent ambiguity would corrupt token
        // counts downstream.
        require(w.indexOf('\u001F') < 0,
          s"bpeEncode: U+001F is reserved as the symbol separator: '$w'")
        // initial symbols are CODE POINTS (the SQL twin's
        // string_split_regex(w, '') yields per-code-point chars; a
        // code-unit split would halve astral-plane chars into lone
        // surrogates and double-count them as symbols). BMP words —
        // the common case — symbolize straight off the char array.
        var syms =
          if (isBmp(w)) {
            val a = new Array[String](w.length)
            var si = 0
            while (si < a.length) {
              a(si) = String.valueOf(w.charAt(si)); si += 1
            }
            a
          } else {
            val offs = NativeString.codePointOffsets(w)
            val a = new Array[String](offs.length - 1)
            var si = 0
            while (si < a.length) {
              a(si) = w.substring(offs(si), offs(si + 1)); si += 1
            }
            a
          }
        var m = 0
        while (m < merges.length) {
          val a = merges(m); val b = merges(m + 1)
          val nxt = new Array[String](syms.length)
          var n = 0
          var j = 0
          while (j < syms.length) {
            if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
              nxt(n) = a + b; n += 1; j += 2
            } else { nxt(n) = syms(j); n += 1; j += 1 }
          }
          syms = java.util.Arrays.copyOf(nxt, n)
          m += 2
        }
        if (!first) out.append(' ')
        first = false
        var k = 0
        while (k < syms.length) {
          if (k > 0) out.append('\u001F')
          out.append(syms(k))
          k += 1
        }
      }
      wi += 1
    }
    out.toString
  }

  def bpeEncodeRawU(s: UTF8String, merges: Array[String]): UTF8String =
    UTF8String.fromString(bpeEncodeRaw(s.toString, merges))

  def bpeEncode(c: Column, merges: Seq[(String, String)]): Column =
    column(BpeEncodeExpr(expression(c),
      merges.flatMap(p => Seq(p._1, p._2))))
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

/** bpeEncode(string) → string (`;`-joined symbols per word, words
  * space-joined). `merges` is the flattened (a0, b0, a1, b1, ...) rule
  * list — a plan-time constant, shipped once per task via the codegen
  * reference array, never per row.
  */
case class BpeEncodeExpr(child: Expression, merges: Seq[String])
    extends UnaryExpression {
  private lazy val mergeArr: Array[String] = merges.toArray
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any =
    NativeString.bpeEncodeRawU(v.asInstanceOf[UTF8String], mergeArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("merges", mergeArr, "java.lang.String[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NativeString.bpeEncodeRawU($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): BpeEncodeExpr =
    copy(child = c)
}
