package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Distributed per-group Bloom filter: `bloom_sketch(item, n, fpp)`
  * aggregates a group's values into one serialized
  * [[org.apache.spark.util.sketch.BloomFilter]] (Spark's own sketch —
  * the same implementation `DataFrameStatFunctions.bloomFilter` builds,
  * exposed here as a GROUPED aggregate so one column-pruned pass can
  * build a filter PER FILE via `groupBy(input_file_name())`).
  *
  * This is the membership half of the file-skipping index family
  * ([[graft.lake.Versioned]]): min/max ranges prune RANGE predicates
  * but are useless for point lookups on high-cardinality or string
  * keys (every file's [min, max] spans the key space; strings have no
  * recorded range at all) — a per-file Bloom filter answers
  * `key = 'x'` with "definitely not in this file" at a configured
  * false-positive rate, which is what Parquet footers, Iceberg Puffin
  * files, and Delta's bloom index all record. One-sided by
  * construction: a Bloom filter has NO false negatives, so pruning on
  * `mightContain == false` is sound; a false positive only costs a
  * wasted scan.
  *
  * The sketch is mergeable (bitwise OR of equal-shaped filters), so
  * map-side partials combine exactly and only fixed-size bit arrays
  * cross the wire. NULLs are skipped (a NULL never equals a literal);
  * values hash by their logical type — strings as UTF-8 bytes,
  * integrals widened to long — and the probe side
  * ([[graft.lake.Versioned.statsCanMatch]]) must hash the same way.
  */
case class BloomSketch(
    itemExpr: Expression,
    expectedItems: Long,
    fpp: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter]
  with UnaryLike[Expression] {

  override def child: Expression = itemExpr

  override def checkInputDataTypes(): TypeCheckResult =
    if (expectedItems <= 0L)
      TypeCheckResult.TypeCheckFailure(
        s"expectedItems must be positive, got $expectedItems")
    else if (fpp <= 0.0 || fpp >= 1.0)
      TypeCheckResult.TypeCheckFailure(s"fpp must be in (0, 1), got $fpp")
    else itemExpr.dataType match {
      case StringType | ByteType | ShortType | IntegerType | LongType |
           DateType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"bloom_sketch supports string/integral/date items, got " +
          dt.simpleString)
    }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_sketch"

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buf: BloomFilter, input: InternalRow): BloomFilter = {
    val v = itemExpr.eval(input)
    if (v != null) itemExpr.dataType match {
      case StringType => buf.putString(v.asInstanceOf[UTF8String].toString)
      case ByteType => buf.putLong(v.asInstanceOf[Byte].toLong)
      case ShortType => buf.putLong(v.asInstanceOf[Short].toLong)
      case IntegerType | DateType => buf.putLong(v.asInstanceOf[Int].toLong)
      case LongType => buf.putLong(v.asInstanceOf[Long])
      case dt => throw new IllegalStateException(
        s"unreachable: checkInputDataTypes admitted $dt")
    }
    buf
  }

  override def merge(buf: BloomFilter, other: BloomFilter): BloomFilter = {
    buf.mergeInPlace(other) // equal-shaped by construction (same n, fpp)
    buf
  }

  override def eval(buf: BloomFilter): Any = serialize(buf)

  override def serialize(buf: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buf.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): BloomSketch = copy(itemExpr = newChild)
}

object BloomAgg {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Aggregate column: one serialized Bloom filter over the group's
    * non-NULL `item` values, sized for `expectedItems` at
    * false-positive rate `fpp`. Deserialize with
    * `BloomFilter.readFrom`; probe with `mightContainString` /
    * `mightContainLong` matching the item's logical type.
    */
  def bloomSketch(item: Column, expectedItems: Long, fpp: Double): Column =
    column(BloomSketch(expression(item), expectedItems, fpp)
      .toAggregateExpression())
}
