package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot hashing paths.
  *
  * The higher-order-function formulations in [[PortableHash]] /
  * graft.ext.Dedup are semantically exact but interpreted (Catalyst HOFs
  * are CodegenFallback): a MinHash signature evaluates the per-character
  * lambda ~20k times per row. These expressions compute the SAME values
  * (bit-identical — the DuckDB oracle twins keep passing unchanged) in
  * one JIT-compiled pass per row, with `doGenCode` so the surrounding
  * stage stays inside whole-stage codegen. Measured effect: the MinHash
  * near-dup query dropped from 273 s to ~2 s at sf0.1.
  *
  * Character semantics match `ascii()` exactly: every fold walks UNICODE
  * CODE POINTS (an astral-plane char is one value, as in both HOF and
  * DuckDB twins) — an earlier code-unit walk diverged on emoji text,
  * caught by the fuzz-corpus oracle gate.
  */
object NativeHash {
  import PortableHash.{B, P}

  /** Polynomial rolling hash of s[from, until): (acc*B + code) % P.
    * Folds UNICODE CODE POINTS, not UTF-16 code units: Spark's
    * `ascii()`/`split(s, "")` and DuckDB's `string_split_regex`/`ascii`
    * both see code points, so an astral-plane char (one code point, two
    * JVM chars) must hash as ONE value here too — a code-unit fold
    * diverged from both twins on emoji text (found by the fuzz-corpus
    * gate). `from`/`until` are code-unit offsets at char boundaries
    * (token spans split on ' ' never cut a surrogate pair).
    */
  def polyRange(s: String, from: Int, until: Int): Long = {
    var acc = 0L
    var i = from
    while (i < until) {
      val ch = s.charAt(i)
      // fast path: every non-high-surrogate unit IS its code point —
      // one compare keeps the loop as tight as the old code-unit fold
      // for BMP text (measured ~1.25× on the fingerprint family when
      // every step went through codePointAt's checks)
      if (ch < 0xD800 || ch > 0xDBFF) {
        acc = (acc * B + ch.toLong) % P
        i += 1
      } else {
        val cp = s.codePointAt(i)
        acc = (acc * B + cp.toLong) % P
        i += Character.charCount(cp)
      }
    }
    acc
  }

  def poly(s: UTF8String): Long = {
    val str = s.toString
    polyRange(str, 0, str.length)
  }

  /** Hashes of all word n-gram shingles. A shingle of tokens i..i+n-1 is
    * exactly the substring from token i's start to token i+n-1's end
    * (single-space split ∘ single-space join is the identity on the
    * original span), so each hash is a direct range hash.
    */
  def shingles(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    // token start/end offsets under split(" ") semantics (empties kept)
    val starts = scala.collection.mutable.ArrayBuffer(0)
    val ends = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i < str.length) {
      if (str.charAt(i) == ' ') { ends += i; starts += i + 1 }
      i += 1
    }
    ends += str.length
    val nTok = starts.length
    val m = nTok - (n - 1)
    if (m < 1) new GenericArrayData(Array.empty[Long])
    else {
      val out = new Array[Long](m)
      var t = 0
      while (t < m) {
        out(t) = polyRange(str, starts(t), ends(t + n - 1))
        t += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Hashes of consecutive non-overlapping `seg`-token segments — the
    * stride-`seg` counterpart of [[shingles]] (same span identity:
    * single-space split ∘ single-space join ≡ the original char range,
    * so no segment string is ever materialized). Segment count is
    * `max(1, ceil(nTokens/seg))`, matching [[graft.ext.Text.chunkTokens]]
    * with `overlap = 0` — each hash is bit-equal to `poly` of that
    * chunk's `chunk_text`.
    */
  def segmentHashes(s: UTF8String, seg: Int): ArrayData = {
    val str = s.toString
    val starts = scala.collection.mutable.ArrayBuffer(0)
    val ends = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i < str.length) {
      if (str.charAt(i) == ' ') { ends += i; starts += i + 1 }
      i += 1
    }
    ends += str.length
    val nTok = starts.length
    val nSeg = math.max(1, (nTok + seg - 1) / seg)
    val out = new Array[Long](nSeg)
    var c = 0
    while (c < nSeg) {
      val t0 = c * seg
      val t1 = math.min(t0 + seg, nTok) - 1
      out(c) = polyRange(str, starts(t0), ends(t1))
      c += 1
    }
    new GenericArrayData(out)
  }

  /** Hashes of all character n-gram windows (stride 1) — the char-level
    * counterpart of [[shingles]], robust to intra-token edits. Windows
    * are n CODE POINTS (same unit as [[polyRange]]'s fold): offsets are
    * precomputed so astral-plane chars occupy one window slot, exactly
    * as the HOF/SQL twins' per-code-point char lists do.
    */
  def charShingles(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    if (NativeString.isBmp(str)) {
      // BMP fast path (round-11 tax trim): code points == code units,
      // so windows index the string directly — no offsets allocation
      val m = str.length - (n - 1)
      if (m < 1) new GenericArrayData(Array.empty[Long])
      else {
        val out = new Array[Long](m)
        var t = 0
        while (t < m) {
          out(t) = polyRange(str, t, t + n)
          t += 1
        }
        new GenericArrayData(out)
      }
    } else {
      val offs = NativeString.codePointOffsets(str)
      val m = offs.length - 1 - (n - 1)
      if (m < 1) new GenericArrayData(Array.empty[Long])
      else {
        val out = new Array[Long](m)
        var t = 0
        while (t < m) {
          out(t) = polyRange(str, offs(t), offs(t + n))
          t += 1
        }
        new GenericArrayData(out)
      }
    }
  }

  /** k-permutation MinHash minima over an array of hashes — same affine
    * family as [[PortableHash.affine]]: h_j(x) = (a_j·x % P + b_j) % P.
    */
  def minhash(hashes: ArrayData, k: Int): ArrayData = {
    val m = hashes.numElements()
    val out = new Array[Long](k)
    var j = 1
    while (j <= k) {
      val a = (j * 40503L + 17L) % P
      val b = (j * 97L + 1L) % P
      var best = Long.MaxValue
      var i = 0
      while (i < m) {
        val h = (a * hashes.getLong(i) % P + b) % P
        if (h < best) best = h
        i += 1
      }
      out(j - 1) = if (m == 0) 0L else best // callers filter empty docs
      j += 1
    }
    new GenericArrayData(out)
  }

  /** 32-bit SimHash from an array of hashes: one pass, 32 counters. */
  def simhash32(hashes: ArrayData): Long = {
    val counts = new Array[Int](32)
    val m = hashes.numElements()
    var i = 0
    while (i < m) {
      val h = hashes.getLong(i)
      var b = 0
      while (b < 32) {
        if (((h >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 32) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Normalized document fingerprint in one pass: lowercase, strip
    * `[.,!?;:]`, split on space runs, drop empties, sort tokens, join
    * with single spaces, rolling-hash. Exactly
    * `polyHash(Text.normalizedText(c))` (equality asserted in tests) —
    * code-point-exact like the rest of this file, full-mapping
    * lowercase included.
    */
  def normFingerprint(s: UTF8String): Long = {
    // full-STRING lowercase via the same function Spark's `lower()`
    // uses (UTF8String.toLowerCase) — per-code-point
    // Character.toLowerCase is the simple 1:1 mapping and diverges
    // from both twins on 1:N cases (U+0130 'İ' lowers to "i̇", TWO
    // code points, under full mapping). After lowering, the stripped
    // punctuation set is pure ASCII, so a char-level walk is safe
    // (surrogate halves never equal ASCII punctuation).
    val str = s.toLowerCase.toString
    val sb = new java.lang.StringBuilder(str.length)
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      c match {
        case '.' | ',' | '!' | '?' | ';' | ':' => ()
        case other => sb.append(other)
      }
      i += 1
    }
    // split(" +", -1) + drop empties ≡ Spark's split/filter pair
    val tokens = sb.toString.split(" +", -1).filter(_.nonEmpty)
    java.util.Arrays.sort(tokens, java.util.Comparator.naturalOrder[String]())
    val joined = tokens.mkString(" ")
    polyRange(joined, 0, joined.length)
  }

  // ------------------------------------------------------ Column fronts
  // Spark 4 Columns wrap ColumnNodes; ExpressionUtils bridges a raw
  // Catalyst Expression both ways.
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def polyHash(c: Column): Column = column(PolyHashExpr(expression(c)))
  def shingleHashes(c: Column, n: Int = 3): Column =
    column(ShingleHashesExpr(expression(c), n))
  def charShingleHashes(c: Column, n: Int = 5): Column =
    column(CharShingleHashesExpr(expression(c), n))
  def segmentHashes(c: Column, seg: Int): Column =
    column(SegmentHashesExpr(expression(c), seg))
  def minHashSig(hashes: Column, k: Int): Column =
    column(MinHashSigExpr(expression(hashes), k))
  def simHash32(hashes: Column): Column =
    column(SimHash32Expr(expression(hashes)))
  def normFingerprintCol(c: Column): Column =
    column(NormFingerprintExpr(expression(c)))
}

/** normFingerprint(string) → long (normalize + sort + rolling hash). */
case class NormFingerprintExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    NativeHash.normFingerprint(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NativeHash.normFingerprint($c)")
  override protected def withNewChildInternal(c: Expression): NormFingerprintExpr =
    copy(child = c)
}

/** polyHash(string) → long — codegen'd twin of [[PortableHash.polyHash]]. */
case class PolyHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    NativeHash.poly(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NativeHash.poly($c)")
  override protected def withNewChildInternal(c: Expression): PolyHashExpr =
    copy(child = c)
}

/** shingleHashes(string) → array<long> (word n-gram rolling hashes). */
case class ShingleHashesExpr(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    NativeHash.shingles(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NativeHash.shingles($c, $n)")
  override protected def withNewChildInternal(c: Expression): ShingleHashesExpr =
    copy(child = c)
}

/** segmentHashes(string) → array<long> (non-overlapping segment hashes). */
case class SegmentHashesExpr(child: Expression, seg: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    NativeHash.segmentHashes(v.asInstanceOf[UTF8String], seg)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NativeHash.segmentHashes($c, $seg)")
  override protected def withNewChildInternal(c: Expression): SegmentHashesExpr =
    copy(child = c)
}

/** charShingleHashes(string) → array<long> (char n-gram rolling hashes). */
case class CharShingleHashesExpr(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    NativeHash.charShingles(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NativeHash.charShingles($c, $n)")
  override protected def withNewChildInternal(c: Expression): CharShingleHashesExpr =
    copy(child = c)
}

/** minHashSig(array<long>) → array<long> of k affine-permutation minima. */
case class MinHashSigExpr(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    NativeHash.minhash(v.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NativeHash.minhash($c, $k)")
  override protected def withNewChildInternal(c: Expression): MinHashSigExpr =
    copy(child = c)
}

/** simHash32(array<long>) → long. */
case class SimHash32Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    NativeHash.simhash32(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NativeHash.simhash32($c)")
  override protected def withNewChildInternal(c: Expression): SimHash32Expr =
    copy(child = c)
}
