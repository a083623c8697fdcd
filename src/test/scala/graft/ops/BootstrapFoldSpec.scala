package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => ScTest}

/** The BootstrapFold contract q202 rides: for ANY input and ANY
  * chunking into partial buffers merged in any left-fold tree
  * (Spark's partial/final aggregation shape), the folded resample
  * sums equal the reference per-(row, b) evaluation of the same fmix
  * recurrence — i.e. the fold is exactly the explicit rows×B
  * expansion, minus the rows. */
class BootstrapFoldSpec extends AnyFunSuite {

  private val B = 16 // small resample count keeps the property fast

  private def check(p: Prop): Unit = {
    val res =
      ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  /** The reference weight: the same integer recurrence as
    * Aggregators.BootstrapFold.reduce and the q202 oracle SQL. */
  private def weight(h0: Long, b: Int): Long = {
    val x0 = (h0 ^ ((b + 1) * 2654435761L)) % 4294967296L
    val x2 = ((x0 ^ (x0 / 65536)) * 668265263L) % 4294967296L
    val x4 = ((x2 ^ (x2 / 8192)) * 374761393L) % 4294967296L
    val hh = (x4 ^ (x4 / 65536)) % 10000L
    if (hh < 3679L) 0L
    else if (hh < 7358L) 1L
    else if (hh < 9197L) 2L
    else if (hh < 9810L) 3L
    else 4L
  }

  private val rowsGen = for {
    n <- Gen.chooseNum(0, 120)
    rows <- Gen.listOfN(n, for {
      h <- Gen.chooseNum(0L, 4294967295L) // md5_h32 range
      c <- Gen.chooseNum(-100000L, 100000L)
    } yield Aggregators.HC(h, c))
  } yield rows

  test("fold == explicit rows x B expansion under any merge tree") {
    check(Prop.forAll(rowsGen, Gen.chooseNum(1, 7)) {
      (rows: List[Aggregators.HC], chunks: Int) =>
        val agg = new Aggregators.BootstrapFold(B)
        val parts =
          if (chunks <= 1) Seq(rows)
          else rows.grouped(math.max(1, rows.size / chunks)).toSeq
        // fresh zero per partial: Spark never shares buffers
        val buffers = parts.map(_.foldLeft(agg.zero)(agg.reduce))
        val merged = buffers.reduceLeftOption(agg.merge).getOrElse(agg.zero)
        val out = agg.finish(merged)

        val expected = (0 until B).map { b =>
          val ws = rows.map(r => (weight(r.h0, b), r.cents))
          (ws.map { case (k, c) => k * c }.sum, ws.map(_._1).sum)
        }
        Prop(out == expected) :| s"fold=$out expected=$expected"
    })
  }

  test("weights hit every Poisson bucket over the hash range") {
    // sanity: the inverse-CDF thresholds actually produce 0..4 — a
    // regression here (e.g. a masked xor) would silently skew every CI
    val seen = (0 until 4096).map(i => weight(i * 1048583L, i % B)).toSet
    assert(Set(0L, 1L, 2L, 3L, 4L).subsetOf(seen), seen.toString)
  }
}
