package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType}

/** Bloom-bitset aggregate: OR an input stream of probe-position arrays
  * (`array<int>`, one array per row — null = contribute nothing) into one
  * `bits`-wide bitset, returned as `java.util.BitSet.toByteArray` bytes.
  *
  * This is the EXECUTOR-SIDE half of the snapshot store's per-file Bloom
  * maintenance ([[graft.operators.SnapshotStore]]): the previous
  * formulation collected `collect_set(position)` arrays to the driver —
  * up to K×bits distinct Ints per (file, column) in a single collect(),
  * a multi-GB driver allocation when a backfill or large OPTIMIZE meets
  * the permitted bits = 2²⁴ — and folded them into a BitSet there. Here
  * the fold happens inside the aggregation buffer on the executors, so
  * the driver receives exactly `bits/8` bytes per (file, column): the
  * finished bitset, nothing else. Partial aggregation still applies
  * (merge = bitwise OR, associative and commutative), so shuffled bytes
  * are also bounded by bitset width, not by row count.
  *
  * Encoding contract: `toByteArray` (bit k = byte k/8, bit k%8, trailing
  * zero bytes trimmed) — byte-identical to the driver-side fold it
  * replaces, so existing `#bloom` manifest lines verify unchanged.
  */
case class BloomBitsetAgg(child: Expression, bits: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.BitSet]
  with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_bitset"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"bloom_bitset expects array<int> positions, got ${t.sql}")
    }

  override def createAggregationBuffer(): java.util.BitSet =
    new java.util.BitSet(bits)

  override def update(buffer: java.util.BitSet,
      input: InternalRow): java.util.BitSet = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        // positions are pmod(bits) by construction; a null element would
        // mean a null probe expression — impossible for non-null values,
        // but stay defensive rather than NPE inside an aggregate buffer
        if (!arr.isNullAt(i)) buffer.set(arr.getInt(i))
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: java.util.BitSet,
      other: java.util.BitSet): java.util.BitSet = {
    buffer.or(other)
    buffer
  }

  override def eval(buffer: java.util.BitSet): Any = buffer.toByteArray

  override def serialize(buffer: java.util.BitSet): Array[Byte] =
    buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): java.util.BitSet =
    java.util.BitSet.valueOf(bytes)

  override def withNewMutableAggBufferOffset(
      newOffset: Int): BloomBitsetAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(
      newOffset: Int): BloomBitsetAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(
      newChild: Expression): BloomBitsetAgg = copy(child = newChild)
}

object BloomBitsetAgg {
  /** Aggregate column: OR `positions` (array<int>, null rows skipped)
    * into a `bits`-wide bitset, returning its toByteArray bytes. */
  def bloom_bitset(positions: Column, bits: Int): Column =
    ColumnBridge.column(
      BloomBitsetAgg(ColumnBridge.expression(positions), bits)
        .toAggregateExpression())
}
