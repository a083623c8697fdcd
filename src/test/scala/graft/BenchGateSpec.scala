package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench regression-gate decision ([[BenchGate.decide]]), pinned
  * scenario by scenario — this is the logic two rounds closed badly
  * on (r13 q03/q07, r14 q29: environmental windows reading as
  * regressions), so every rule gets a direct test: v1-vs-v2 pin
  * thresholds, min-of-passes immunity to one-pass bursts,
  * burst-shaped steal downgrades (and their refusal under uniform
  * background steal), task-flat downgrades budgeted on bench slots,
  * the pass-2-only suspect channel with its CPU-normalized excuse,
  * error/floor/unpinned exclusions. */
class BenchGateSpec extends AnyFunSuite {

  private val slots = 32
  private val ncpu = 32

  /** quint builder: (name, wall, gcMs, load, taskSec, stealMs) */
  private def q(n: String, sec: Double, task: Double = 1.0,
      steal: Long = 0L, load: Double = 1.0): BenchGate.Quint =
    (n, sec, 0L, load, task, steal)

  /** background queries so pass-median steal is realistic (near 0) */
  private def bg(tag: String): Seq[BenchGate.Quint] =
    (1 to 9).map(i => q(s"bg${tag}_$i", 0.3))

  /** v2-shaped pins: (pin, threshold), no task pin */
  private def pins(m: Map[String, (Double, Double)])
      : String => BenchGate.Pin =
    n => m.get(n).map { case (p, t) => (p, t, -1.0) }
      .getOrElse((-1.0, -1.0, -1.0))

  /** v3-shaped pins: (pin, threshold, task median) */
  private def pins3(m: Map[String, (Double, Double, Double)])
      : String => BenchGate.Pin =
    n => m.getOrElse(n, (-1.0, -1.0, -1.0))

  test("v2 pin gates at 2 x median; v1 scalar at 3 x min") {
    val pv = pins(Map("qa" -> (0.5, 1.0), "qb" -> (0.5, 1.5)))
    // qa at 1.1 s breaches its 2 x median(0.5)=1.0 threshold in both
    // passes with no excuse (task grew, no steal); qb at 1.4 s stays
    // under its v1 3 x 0.5 = 1.5 threshold
    val p = Seq(q("qa", 1.1, task = 30.0), q("qb", 1.4, task = 30.0)) ++
      bg("x")
    val v = BenchGate.decide(pv, p, p, Set.empty, slots, ncpu)
    assert(v.regressed.map(_._1) == Seq("qa"))
    assert(v.adjudication.isEmpty)
  }

  test("min-of-passes: a one-pass burst never regresses") {
    val pv = pins(Map("qa" -> (0.5, 1.0)))
    val slow = Seq(q("qa", 4.0, task = 50.0)) ++ bg("x")
    val fast = Seq(q("qa", 0.6, task = 10.0)) ++ bg("y")
    val v = BenchGate.decide(pv, slow, fast, Set.empty, slots, ncpu)
    assert(v.regressed.isEmpty)
  }

  test("burst-shaped steal downgrades a both-pass fail to suspect " +
      "with an adjudication entry") {
    val pv = pins(Map("qa" -> (0.5, 1.0)))
    // both passes 3 s (over 1.0 threshold), each carrying 2 s of
    // steal (>= 30% of wall, and pass median steal ~0) and grown task
    val p1 = Seq(q("qa", 3.0, task = 60.0, steal = 2000L)) ++ bg("x")
    val p2 = Seq(q("qa", 3.0, task = 60.0, steal = 2000L)) ++ bg("y")
    val v = BenchGate.decide(pv, p1, p2, Set.empty, slots, ncpu)
    assert(v.regressed.isEmpty)
    assert(v.suspect.map(_._1) == Seq("qa"))
    assert(v.adjudication.map(_._1) == Seq("qa"))
    assert(v.adjudication.head._2.contains("steal"))
  }

  test("uniform background steal excuses nothing: the 10x-median leg") {
    val pv = pins(Map("qa" -> (0.5, 1.0)))
    // every query carries ~1 s of ambient steal, so the pass median
    // is 1000 ms and qa's 2 s is under 10x it -> no steal excuse;
    // task grew past pin x slots -> no task excuse -> REGRESSED
    def noisy(tag: String) = Seq(q("qa", 3.0, task = 60.0,
      steal = 2000L)) ++
      (1 to 9).map(i => q(s"bg${tag}_$i", 3.0, steal = 1000L))
    val v = BenchGate.decide(pv, noisy("x"), noisy("y"),
      Set.empty, slots, ncpu)
    assert(v.regressed.map(_._1) == Seq("qa"))
    assert(v.adjudication.isEmpty)
  }

  test("task-flat + environmental co-witness downgrades: wall grew, " +
      "work didn't, and the machine was visibly busy") {
    val pv = pins(Map("qa" -> (0.5, 1.0)))
    // 3 s wall against a 0.5 s pin, task_sec 4 << pin x slots = 16
    // (pure waiting), AND a co-witness in each pass: pass 1 carries
    // 5%-of-wall steal, pass 2 an over-subscribed loadavg
    val p1 = Seq(q("qa", 3.0, task = 4.0, steal = 200L)) ++ bg("x")
    val p2 = Seq(q("qa", 3.0, task = 4.0, load = 40.0)) ++ bg("y")
    val v = BenchGate.decide(pv, p1, p2, Set.empty, slots, ncpu)
    assert(v.regressed.isEmpty)
    assert(v.adjudication.map(_._1) == Seq("qa"))
    assert(v.adjudication.head._2.contains("task_sec"))
    assert(v.adjudication.head._2.contains("co-witness"))
  }

  test("task-flat WITHOUT a co-witness stays failed (r15 advisor: " +
      "lost parallelism is task-flat on a quiet machine)") {
    val pv = pins(Map("qa" -> (0.5, 1.0)))
    // same task-flat shape, but zero steal and idle loadavg — a new
    // exchange barrier / driver-side blocking collect looks exactly
    // like this, so the static gate must NOT excuse it (the isolation
    // rerun is the only way out, and a real plan change fails that)
    val p1 = Seq(q("qa", 3.0, task = 4.0)) ++ bg("x")
    val p2 = Seq(q("qa", 3.0, task = 4.0)) ++ bg("y")
    val v = BenchGate.decide(pv, p1, p2, Set.empty, slots, ncpu)
    assert(v.regressed.map(_._1) == Seq("qa"))
    assert(v.adjudication.isEmpty)
  }

  test("task-flat budget uses bench slots, not host cores") {
    val pv = pins(Map("qa" -> (0.5, 1.0)))
    // at local[4], a real regression's task_sec (~4x wall = 12) must
    // NOT fit a pin x 32 host-core budget; with slots=4 the budget is
    // 2.0 and the fail stands even with a co-witness present
    val p1 = Seq(q("qa", 3.0, task = 12.0, steal = 200L)) ++ bg("x")
    val p2 = Seq(q("qa", 3.0, task = 12.0, steal = 200L)) ++ bg("y")
    val v = BenchGate.decide(pv, p1, p2, Set.empty, slots = 4,
      ncpu = 32)
    assert(v.regressed.map(_._1) == Seq("qa"))
  }

  test("v3 task pin tightens the task-flat bound to 1.5 x task median") {
    // wall over threshold in both passes with a co-witness; qa's
    // task_sec 5 fits 1.5 x taskPin(4) = 6 -> downgraded; qb's 10
    // does not (though it WOULD fit the v2 wall x slots budget of
    // 16) -> the work itself grew, fail stands
    val pv = pins3(Map("qa" -> (0.5, 1.0, 4.0), "qb" -> (0.5, 1.0, 4.0)))
    val p1 = Seq(q("qa", 3.0, task = 5.0, steal = 200L),
      q("qb", 3.0, task = 10.0, steal = 200L)) ++ bg("x")
    val v = BenchGate.decide(pv, p1, p1, Set.empty, slots, ncpu)
    assert(v.regressed.map(_._1) == Seq("qb"))
    assert(v.adjudication.map(_._1) == Seq("qa"))
    assert(v.adjudication.head._2.contains("task pin"))
  }

  test("a pass-1-only entry (bpe256_build) is graded on that pass") {
    // the one-time trainer line never appears in pass 2 (the memo is
    // warm); the union-steady rule must still gate it
    val pv = pins(Map("bpe256_build" -> (15.0, 30.0)))
    val p1 = Seq(q("bpe256_build", 90.0, task = 900.0)) ++ bg("x")
    val p2 = bg("y")
    val v = BenchGate.decide(pv, p1, p2, Set.empty, slots, ncpu)
    assert(v.regressed.map(_._1) == Seq("bpe256_build"))
  }

  test("pass-2-only slowdown lands in suspect; CPU-normalized steal " +
      "excuses it out") {
    val pv = pins(Map("qa" -> (0.5, 1.0), "qb" -> (0.5, 1.0)))
    // qa: pass 2 slow with NO steal -> suspect. qb: pass 2 slow with
    // steal >= 20% of wall x ncpu (3 s x 0.2 x 32 = 19.2 s of
    // machine-wide steal) -> excused out of the suspect list.
    val p1 = Seq(q("qa", 0.6), q("qb", 0.6)) ++ bg("x")
    val p2 = Seq(q("qa", 3.0), q("qb", 3.0, steal = 20000L)) ++ bg("y")
    val v = BenchGate.decide(pv, p1, p2, Set.empty, slots, ncpu)
    assert(v.regressed.isEmpty)
    assert(v.suspect.map(_._1) == Seq("qa"))
  }

  test("errored, unpinned, and sub-floor queries are not gradable") {
    val pv = pins(Map("qe" -> (0.5, 1.0), "qf" -> (0.01, 0.02)))
    val p = Seq(
      q("qe", 9.0, task = 90.0), // errored -> excluded here
      q("qn", 9.0, task = 90.0), // unpinned -> excluded
      q("qf", 0.1, task = 1.0)) ++ bg("x") // under the 0.15 s floor
    val v = BenchGate.decide(pv, p, p, Set("qe"), slots, ncpu)
    assert(v.regressed.isEmpty && v.suspect.isEmpty)
  }

  test("single-pass mode (no pass 2) still gates on pass 1") {
    val pv = pins(Map("qa" -> (0.5, 1.0)))
    val p1 = Seq(q("qa", 3.0, task = 60.0)) ++ bg("x")
    val v = BenchGate.decide(pv, p1, Seq.empty, Set.empty, slots, ncpu)
    assert(v.regressed.map(_._1) == Seq("qa"))
    assert(v.suspect.isEmpty) // the suspect channel needs a pass 2
  }

  test("isolation rerun under threshold downgrades a standing fail " +
      "with the rerun as evidence") {
    val pv = pins(Map("qa" -> (0.5, 1.0)))
    val v0 = BenchGate.Verdict(Seq(("qa", 0.5, 6.2)), Seq.empty, Seq.empty)
    val v = BenchGate.applyRerun(v0, pv, Map("qa" -> (0.7, 9.0)))
    assert(v.regressed.isEmpty)
    assert(v.suspect.map(_._1) == Seq("qa"))
    assert(v.adjudication.map(_._1) == Seq("qa"))
    assert(v.adjudication.head._2.contains("isolation rerun"))
    assert(v.adjudication.head._2.contains("environmental"))
  }

  test("isolation rerun still over threshold CONFIRMS the fail " +
      "in-artifact") {
    val pv = pins(Map("qa" -> (0.5, 1.0)))
    val v0 = BenchGate.Verdict(Seq(("qa", 0.5, 6.2)), Seq.empty, Seq.empty)
    val v = BenchGate.applyRerun(v0, pv, Map("qa" -> (5.8, 110.0)))
    assert(v.regressed.map(_._1) == Seq("qa"))
    assert(v.adjudication.map(_._1) == Seq("qa"))
    assert(v.adjudication.head._2.startsWith("confirmed"))
  }

  test("a fail with no rerun measurement stands unchanged") {
    val pv = pins(Map("qa" -> (0.5, 1.0), "qb" -> (0.5, 1.0)))
    val v0 = BenchGate.Verdict(
      Seq(("qa", 0.5, 6.2), ("qb", 0.5, 3.0)), Seq.empty, Seq.empty)
    // qb rerun cleared; qa has no rerun row (e.g. not a query — the
    // bpe256_build line) and must stay failed with no adjudication
    val v = BenchGate.applyRerun(v0, pv, Map("qb" -> (0.6, 8.0)))
    assert(v.regressed.map(_._1) == Seq("qa"))
    assert(v.suspect.map(_._1) == Seq("qb"))
    assert(v.adjudication.map(_._1) == Seq("qb"))
  }
}
