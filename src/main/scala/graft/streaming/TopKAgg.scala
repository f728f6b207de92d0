package graft.streaming

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded-state top-k aggregate FUNCTION — the streaming-safe form of
  * the [[graft.plans.TopKPerKey]] physical operator. Where the operator
  * rewrites a whole batch plan, this is an `Aggregator` usable anywhere
  * an aggregate goes: streaming `complete`-mode groupBy (state per key =
  * k elements, NOT the unbounded collect_list a sort-and-slice
  * formulation would buffer), rollups, or plain batch aggs.
  *
  * Mergeability is the scale property: reduce and merge both re-truncate
  * to k, so partial aggregation combines map-side and micro-batch state
  * never exceeds k·keys rows — the same partial/final contract the
  * TopKPerKeyExec heaps implement, expressed as an aggregate value.
  * Ordering is (value DESC, id ASC): ties break on the SMALLEST id, so
  * results are deterministic across partitionings and engines.
  *
  * The insert keeps the buffer sorted (k is small; an O(k) insert beats
  * re-sorting), so reduce/merge are both linear in k.
  */
class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)],
      Seq[(Double, Long)]] {
  require(k >= 1, s"k must be >= 1, got $k")

  private def ordered(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: Seq[(Double, Long)],
      x: (Double, Long)): Seq[(Double, Long)] = {
    if (buf.size == k && ordered(buf.last, x)) buf
    else {
      val i = buf.indexWhere(e => ordered(x, e)) match {
        case -1 => buf.size
        case n  => n
      }
      (buf.take(i) :+ x) ++ buf.drop(i).take(k - i - 1)
    }
  }

  override def zero: Seq[(Double, Long)] = Seq.empty

  override def reduce(buf: Seq[(Double, Long)],
      x: (Double, Long)): Seq[(Double, Long)] = insert(buf, x)

  override def merge(a: Seq[(Double, Long)],
      b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    b.foldLeft(a)(insert)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] = bufferEncoder
}

object TopKAgg {
  /** Column form: `top_k(value, id)` → array<struct<_1 value, _2 id>>,
    * best first. */
  def topK(k: Int)(value: Column, id: Column): Column = {
    val fn = udaf(new TopKAgg(k))
    fn(value, id)
  }
}
