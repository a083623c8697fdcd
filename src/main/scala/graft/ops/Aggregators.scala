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

  /** Misra-Gries heavy-hitters sketch as a mergeable typed UDAF —
    * the deterministic counter-based complement to the Count-Min
    * sketch (q81): k counters, O(k) state per partial buffer, and a
    * hard error bound with NO hash-collision probability. For any
    * item, exact_count − estimate ∈ [0, n/(k+1)] where n is the
    * stream length — the bound survives arbitrary merge trees
    * (Agarwal et al., "Mergeable Summaries", PODS 2012), which is
    * exactly what Spark's partial/final aggregation performs. Items
    * with frequency above n/(k+1) are GUARANTEED to survive in the
    * sketch. Estimates depend on partition order (like any MG), but
    * the bound does not — q103 audits the bound, not the estimate. */
  final class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    override def zero: Map[String, Long] = Map.empty

    override def reduce(buf: Map[String, Long], x: String): Map[String, Long] =
      buf.get(x) match {
        case Some(c) => buf.updated(x, c + 1)
        case None if buf.size < k => buf.updated(x, 1L)
        case None => // decrement-all step: drop zeros
          buf.flatMap { case (key, c) =>
            if (c > 1) Some(key -> (c - 1)) else None }
      }

    override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
      val sum = b2.foldLeft(b1) { case (acc, (key, c)) =>
        acc.updated(key, acc.getOrElse(key, 0L) + c) }
      if (sum.size <= k) sum
      else {
        // subtract the (k+1)-th largest count from everything; at
        // most k survive and each item loses ≤ what a stream-order
        // decrement sequence would have cost it
        val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
        sum.flatMap { case (key, c) =>
          if (c > cut) Some(key -> (c - cut)) else None }
      }
    }

    override def finish(r: Map[String, Long]): Map[String, Long] = r

    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()

    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }
}
