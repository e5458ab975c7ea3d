package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Distributed bounded top-k: `top_k_by_score(score, item, k)` keeps the k
  * `(score, item)` pairs with the highest score (ties broken by smallest
  * item) and evaluates to `array<struct<score, item>>` sorted best-first.
  *
  * This is the scale-safe replacement for the
  * `row_number().over(Window.partitionBy(key).orderBy(score.desc))` top-k
  * idiom: a global window funnels EVERY candidate row of one key onto a
  * single reducer before discarding all but k — at a 100 TB corpus that
  * is millions of rows through one task per probe. As a
  * TypedImperativeAggregate this instead runs as a two-phase
  * ObjectHashAggregate: each input partition maintains k-bounded heaps
  * (map-side partial), and only serialized heaps of ≤ k entries — never
  * the candidate set — cross the shuffle. Top-k is monotone under union,
  * so the result is identical to the window formulation row for row.
  */
case class TopKByScore(
    scoreExpr: Expression,
    itemExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Any)]]
  with BinaryLike[Expression] {

  override def left: Expression = scoreExpr
  override def right: Expression = itemExpr

  override def checkInputDataTypes(): TypeCheckResult =
    if (k <= 0) TypeCheckResult.TypeCheckFailure(s"k must be positive, got $k")
    else if (scoreExpr.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"score must be DOUBLE, got ${scoreExpr.dataType.sql}")
    else TypeUtils.checkForOrderingExpr(itemExpr.dataType, prettyName)

  // lazy: children are UnresolvedAttributes until analysis binds them
  private lazy val elemType = StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("item", itemExpr.dataType)))

  override def dataType: DataType = ArrayType(elemType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_by_score"

  @transient private lazy val itemOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(itemExpr.dataType)

  /** Heap ordering: head = the WORST retained pair (lowest score; on score
    * ties the largest item), matching `ORDER BY score DESC, item ASC`.
    */
  @transient private lazy val worstFirst: Ordering[(Double, Any)] =
    new Ordering[(Double, Any)] {
      def compare(x: (Double, Any), y: (Double, Any)): Int = {
        val c = java.lang.Double.compare(y._1, x._1) // lower score = "greater"
        if (c != 0) c else itemOrdering.compare(x._2, y._2)
      }
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Any)] =
    mutable.PriorityQueue.empty[(Double, Any)](worstFirst)

  /** Insert with eviction; `item` must already be safe to retain. */
  private def insert(buf: mutable.PriorityQueue[(Double, Any)],
      score: Double, item: Any): Unit =
    if (buf.size < k) buf.enqueue((score, item))
    else if (worstFirst.compare((score, item), buf.head) < 0) {
      buf.dequeue(); buf.enqueue((score, item))
    }

  override def update(buf: mutable.PriorityQueue[(Double, Any)],
      input: InternalRow): mutable.PriorityQueue[(Double, Any)] = {
    val s = scoreExpr.eval(input)
    val it = itemExpr.eval(input)
    if (s != null && it != null) {
      val score = s.asInstanceOf[Double]
      // copy only when the pair is actually retained (eval results may
      // point into reused row buffers)
      if (buf.size < k || worstFirst.compare((score, it), buf.head) < 0)
        insert(buf, score, InternalRow.copyValue(it))
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Any)],
      other: mutable.PriorityQueue[(Double, Any)])
      : mutable.PriorityQueue[(Double, Any)] = {
    other.foreach { case (s, it) => insert(buf, s, it) }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Any)]): Any = {
    // ascending by "worseness" = best first
    val bestFirst = buf.toArray.sorted(worstFirst)
    new GenericArrayData(
      bestFirst.map { case (s, it) => InternalRow(s, it) }: Array[Any])
  }

  // serialize the heap as one UnsafeRow holding the eval() array — a
  // self-contained byte image, no external serializer
  @transient private lazy val bufProjection =
    UnsafeProjection.create(Array[DataType](dataType))

  override def serialize(buf: mutable.PriorityQueue[(Double, Any)]): Array[Byte] =
    bufProjection(InternalRow(eval(buf))).getBytes

  override def deserialize(bytes: Array[Byte])
      : mutable.PriorityQueue[(Double, Any)] = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(0)
    val buf = createAggregationBuffer()
    var i = 0
    while (i < arr.numElements()) {
      val st = arr.getStruct(i, 2)
      buf.enqueue((st.getDouble(0),
        InternalRow.copyValue(st.get(1, itemExpr.dataType))))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKByScore =
    copy(scoreExpr = newLeft, itemExpr = newRight)
}

object TopK {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Aggregate column: top-k `(score, item)` pairs by score descending
    * (item ascending on ties) as `array<struct<score, item>>`, best first.
    */
  def topKByScore(score: Column, item: Column, k: Int): Column =
    column(TopKByScore(expression(score), expression(item), k)
      .toAggregateExpression())
}
