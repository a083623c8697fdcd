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

  /** One (row-hash, integer measure) observation for [[BootstrapFold]]. */
  final case class HC(h0: Long, cents: Long)

  /** Poisson-bootstrap fold (q202): each input row folds its ENTIRE
    * B-resample weight vector into one long[2B] buffer — k·cents
    * partial sums in slots [0,B), k counts in [B,2B) — so the
    * shuffle for the whole bootstrap carries ONE 2B-long buffer per
    * map partition instead of rows×B exploded partials. Resample
    * weight k = inverse Poisson(1) CDF of an fmix32-style finalizer
    * over (h0, b) — the exact integer recurrence the SQL oracle
    * evaluates (xxhash32 PRIME32_4/PRIME32_5 multipliers, every
    * product < 2^62 in signed-64 arithmetic), so the two arms stay
    * bit-identical. This is the Chamandy et al. map-reduce bootstrap
    * with the resample matrix never materialized as rows: at 10^11
    * input rows the aggregation state is still 2B longs per
    * partition. */
  final class BootstrapFold(b: Int)
      extends Aggregator[HC, Array[Long], Seq[(Long, Long)]] {
    override def zero: Array[Long] = new Array[Long](2 * b)

    override def reduce(buf: Array[Long], a: HC): Array[Long] = {
      var i = 0
      while (i < b) {
        val x0 = (a.h0 ^ ((i + 1) * 2654435761L)) % 4294967296L
        val x2 = ((x0 ^ (x0 / 65536)) * 668265263L) % 4294967296L
        val x4 = ((x2 ^ (x2 / 8192)) * 374761393L) % 4294967296L
        val hh = (x4 ^ (x4 / 65536)) % 10000L
        val k =
          if (hh < 3679L) 0L
          else if (hh < 7358L) 1L
          else if (hh < 9197L) 2L
          else if (hh < 9810L) 3L
          else 4L
        if (k > 0L) { buf(i) += k * a.cents; buf(b + i) += k }
        i += 1
      }
      buf
    }

    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var i = 0
      while (i < 2 * b) { b1(i) += b2(i); i += 1 }
      b1
    }

    override def finish(r: Array[Long]): Seq[(Long, Long)] =
      (0 until b).map(i => (r(i), r(b + i)))

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

    override def outputEncoder: Encoder[Seq[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
  }
}
