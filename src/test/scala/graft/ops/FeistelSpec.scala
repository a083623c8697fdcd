package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** q165's epoch-shuffle permutation, exhaustively: the 4-round
  * add-mod Feistel over the full 2^20 domain must be a bijection
  * (any round function yields one — this pins the concrete
  * constants), and the inverse must reconstruct the input. */
class FeistelSpec extends AnyFunSuite {

  private val A = 2654435761L
  private val C = Array(101L, 211L, 307L, 401L)

  private def f(r: Long, c: Long): Long = ((r * A + c) / 64) % 1024

  private def perm(x: Long): Long = {
    var l = x / 1024
    var r = x % 1024
    var i = 0
    while (i < 4) {
      val nl = r
      r = (l + f(r, C(i))) % 1024
      l = nl
      i += 1
    }
    l * 1024 + r
  }

  private def inverse(y: Long): Long = {
    var l = y / 1024
    var r = y % 1024
    var i = 3
    while (i >= 0) {
      val pr = l
      l = (r - f(pr, C(i)) % 1024 + 1024 * 1024) % 1024
      r = pr
      i -= 1
    }
    l * 1024 + r
  }

  test("bijective over the full 2^20 domain") {
    val seen = new java.util.BitSet(1 << 20)
    var x = 0L
    while (x < (1 << 20)) {
      val p = perm(x)
      assert(p >= 0 && p < (1 << 20), s"perm($x) = $p out of range")
      assert(!seen.get(p.toInt), s"collision at perm($x) = $p")
      seen.set(p.toInt)
      x += 1
    }
  }

  test("the Feistel structure inverts exactly") {
    var x = 0L
    while (x < (1 << 20)) {
      assert(inverse(perm(x)) == x)
      x += 4097 // coprime stride samples the domain
    }
    assert(inverse(perm(1048575L)) == 1048575L)
  }
}
