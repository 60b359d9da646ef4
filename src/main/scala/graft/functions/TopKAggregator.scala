package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate (the `Aggregator[IN, BUF, OUT]` tier of the
  * UDAF surface, SURVEY §2 non-oracle table): per-group top-k by a
  * sort value with a unique tiebreak id, keeping only k elements in
  * the buffer.
  *
  * This is the scale-friendly alternative to window `row_number` top-k:
  * a window sorts EVERY row of every partition; this aggregates with a
  * bounded k-element buffer per group, combines map-side, and shuffles
  * k rows per group instead of all of them.
  *
  * Ordering: descending by value, ascending id on ties — identical to
  * `ORDER BY v DESC, id` + `row_number() <= k` (asserted in
  * TopKAggregatorSpec).
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)], Array[(Double, Long)]] {

  private def lt(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2) // "better" ranks first

  private def trim(xs: List[(Double, Long)]): List[(Double, Long)] =
    xs.sortWith(lt).take(k)

  override def zero: List[(Double, Long)] = Nil
  override def reduce(buf: List[(Double, Long)], x: (Double, Long)): List[(Double, Long)] =
    trim(x :: buf)
  override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
    trim(a ++ b)
  override def finish(buf: List[(Double, Long)]): Array[(Double, Long)] =
    buf.sortWith(lt).toArray
  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Double, Long)]]()
  override def outputEncoder: Encoder[Array[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Double, Long)]]()
}
