package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Distributed Misra–Gries frequency sketch:
  * `misra_gries(item, capacity)` summarizes a stream of items with at
  * most `capacity` counters and evaluates to
  * `array<struct<item, est>>` (est descending, item ascending on ties).
  *
  * The OTHER sketch half of the approximate-analytics pair: HLL
  * (q32 / `approx_count_distinct`) answers "how many DISTINCT", this
  * answers "which items are FREQUENT" — per-source token heavy hitters,
  * hot keys before a salted join, trending n-grams — without shuffling
  * a corpus-sized key set: partials are `capacity`-bounded maps built
  * map-side, and only those maps (≤ capacity entries each) cross the
  * wire, exactly like the bounded top-k heap.
  *
  * Guarantees (Misra–Gries 1982; merge per Agarwal et al., "Mergeable
  * Summaries", ACM TODS 2013 — counter-wise sum then subtract the
  * (capacity+1)-largest count and drop non-positives):
  *
  *  - `est(x) ≤ true_count(x)` for every item (never overcounts);
  *  - `true_count(x) − est(x) ≤ N / (capacity+1)` where N is the total
  *    item count (bounded undercount; absent ⇒ est 0);
  *  - every x with `true_count(x) > N/(capacity+1)` is IN the sketch.
  *
  * The bounds hold for ANY partitioning and merge order, but the exact
  * `est` values (and which sub-threshold items survive) do NOT — they
  * depend on input order. Downstream checks must therefore consume the
  * sketch through its guarantees (derived facts against exact counts),
  * never by comparing raw est values across runs; an oracle-checked
  * surface joins the sketch to the EXACT heavy-hitter set and emits the
  * guarantee booleans (see `ScaleQueries` q95).
  */
case class MisraGries(
    itemExpr: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Any, Long]]
  with UnaryLike[Expression] {

  override def child: Expression = itemExpr

  override def checkInputDataTypes(): TypeCheckResult =
    if (capacity <= 0)
      TypeCheckResult.TypeCheckFailure(
        s"capacity must be positive, got $capacity")
    else TypeUtils.checkForOrderingExpr(itemExpr.dataType, prettyName)

  private lazy val elemType = StructType(Seq(
    StructField("item", itemExpr.dataType),
    StructField("est", LongType, nullable = false)))

  override def dataType: DataType = ArrayType(elemType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  @transient private lazy val itemOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(itemExpr.dataType)

  override def createAggregationBuffer(): mutable.HashMap[Any, Long] =
    mutable.HashMap.empty[Any, Long]

  override def update(buf: mutable.HashMap[Any, Long],
      input: InternalRow): mutable.HashMap[Any, Long] = {
    val it = itemExpr.eval(input)
    if (it != null) {
      buf.get(it) match {
        case Some(c) => buf.update(it, c + 1L)
        case None =>
          if (buf.size < capacity)
            // copy: eval results may point into reused row buffers
            buf.update(InternalRow.copyValue(it), 1L)
          else {
            // textbook decrement-all; amortized O(1) (each decrement is
            // paid for by a previous increment)
            val dead = mutable.ArrayBuffer.empty[Any]
            buf.mapValuesInPlace((_, c) => c - 1L)
            buf.foreach { case (k, c) => if (c <= 0L) dead += k }
            dead.foreach(buf.remove)
          }
      }
    }
    buf
  }

  /** Counter-wise sum, then Misra–Gries trim back to `capacity`:
    * subtract the (capacity+1)-largest count from every counter and
    * drop non-positives — the guarantee-preserving merge.
    */
  override def merge(buf: mutable.HashMap[Any, Long],
      other: mutable.HashMap[Any, Long]): mutable.HashMap[Any, Long] = {
    other.foreach { case (k, c) =>
      buf.update(k, buf.getOrElse(k, 0L) + c)
    }
    if (buf.size > capacity) {
      val counts = buf.valuesIterator.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - capacity - 1) // (capacity+1)-largest
      val dead = mutable.ArrayBuffer.empty[Any]
      buf.mapValuesInPlace((_, c) => c - cut)
      buf.foreach { case (k, c) => if (c <= 0L) dead += k }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[Any, Long]): Any = {
    val sorted = buf.toArray.sortWith { case ((i1, c1), (i2, c2)) =>
      if (c1 != c2) c1 > c2 else itemOrdering.compare(i1, i2) < 0
    }
    new GenericArrayData(
      sorted.map { case (it, c) => InternalRow(it, c) }: Array[Any])
  }

  @transient private lazy val bufProjection =
    UnsafeProjection.create(Array[DataType](dataType))

  override def serialize(buf: mutable.HashMap[Any, Long]): Array[Byte] =
    bufProjection(InternalRow(eval(buf))).getBytes

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Any, Long] = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(0)
    val buf = createAggregationBuffer()
    var i = 0
    while (i < arr.numElements()) {
      val st = arr.getStruct(i, 2)
      buf.update(InternalRow.copyValue(st.get(0, itemExpr.dataType)),
        st.getLong(1))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): MisraGries = copy(itemExpr = newChild)
}

object FreqSketch {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Aggregate column: Misra–Gries summary of `item` with at most
    * `capacity` counters, as `array<struct<item, est>>` (est descending,
    * item ascending on ties).
    */
  def misraGries(item: Column, capacity: Int): Column =
    column(MisraGries(expression(item), capacity).toAggregateExpression())
}
