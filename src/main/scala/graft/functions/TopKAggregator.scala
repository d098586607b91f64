package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Grouped top-k as a bounded-heap aggregate.
  *
  * `groupBy(key).agg(topk(ord, payload))` keeps only k candidates per
  * group per partition and merges buffers map-side, so the plan is a
  * hash aggregate with partial combine — no per-partition full sort, no
  * window shuffle of every row, and memory bounded at k per key. At
  * 100 TB this replaces the rank-window top-N (which sorts every row of
  * every key) for the common "top events per user" shape.
  *
  * Returns the top k (ord, payload) pairs, ordered descending by ord
  * with ascending payload id as the deterministic tie-break.
  */
class TopKAggregator(k: Int) extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {

  // descending value, ascending id on ties
  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def trim(xs: List[(Double, Long)]): List[(Double, Long)] =
    xs.sortWith(better).take(k)

  override def zero: List[(Double, Long)] = Nil

  override def reduce(buf: List[(Double, Long)], row: (Double, Long)): List[(Double, Long)] =
    if (buf.sizeIs >= k && !better(row, buf.last)) buf else trim(row :: buf)

  override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
    trim(a ::: b)

  override def finish(buf: List[(Double, Long)]): Seq[(Double, Long)] = trim(buf)

  override def bufferEncoder: Encoder[List[(Double, Long)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
}
