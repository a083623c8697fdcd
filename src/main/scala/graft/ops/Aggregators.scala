package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed UDAF surface (SURVEY §2 Part C "UDF/UDAF/UDTF"): a
  * bounded top-k aggregator. Unlike the window row_number pattern,
  * the partial buffers are capped at k elements, so the shuffle for a
  * "top-k per group" carries O(groups × k) rows instead of the full
  * input — the right shape when groups are huge and k is small (the
  * map-side combine IS the top-k).
  *
  * Ordering: score descending, then id ascending — total, so results
  * are deterministic and oracle-comparable.
  */
object Aggregators {

  /** One ranked element: score + tiebreak id + carried payload. */
  final case class Scored(score: Double, id: Long, payload: String)

  private val ord: Ordering[Scored] =
    Ordering.by((s: Scored) => (-s.score, s.id))

  final class TopK(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    override def zero: Seq[Scored] = Vector.empty

    override def reduce(buf: Seq[Scored], a: Scored): Seq[Scored] =
      if (buf.size < k) (buf :+ a).sorted(ord)
      else if (ord.lt(a, buf.last)) (buf.init :+ a).sorted(ord)
      else buf

    override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] =
      (b1 ++ b2).sorted(ord).take(k)

    override def finish(reduction: Seq[Scored]): Seq[Scored] = reduction

    override def bufferEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()

    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }
}
