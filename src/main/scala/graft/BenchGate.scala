package graft

/** The bench regression-gate DECISION, extracted pure so it is
  * spec-pinned (BenchGateSpec) instead of living untestable inside
  * `Bench.main` — two rounds (r13 q03/q07, r14 q29) closed on driver
  * artifacts whose only fails were environmental windows, so the
  * gate's excuse/downgrade semantics are exactly the code that must
  * never regress silently.
  *
  * Inputs: the two passes' per-query quintuples
  * `(name, wallSec, gcMs, loadavg, taskSec, stealMs)`, the errored
  * query names, the pin lookup, the bench's local[N] slot count, and
  * the host CPU count. Rules (each documented at its site):
  *  - steady state = per-query MIN of the passes (a steal burst hits
  *    ONE pass; a plan regression inflates both);
  *  - pin schema v2: a [min, median] pin gates at 2 x MEDIAN, a bare
  *    v1 scalar at 3 x min; unpinned and sub-0.15 s queries and
  *    errored queries are not gradable here (errors fail the gate
  *    via their own channel);
  *  - a fail downgrades to `suspect` + an `adjudication` entry when
  *    EVERY over-threshold pass is excused: burst-shaped steal
  *    (>= 30% of the query's wall AND >= 10 x the pass's per-query
  *    median steal — uniform background steal excuses nothing) or
  *    task-flat work (taskSec <= pin x slots: the work didn't grow,
  *    only the waiting);
  *  - a pass-2-only slowdown whose min stayed under threshold is a
  *    `suspect` unless its steal clears the CPU-NORMALIZED bar
  *    (>= 20% of wall x ncpu — a fifth of the machine stolen).
  */
object BenchGate {
  /** (name, wallSec, gcMs, loadavg, taskSec, stealMs). */
  type Quint = (String, Double, Long, Double, Double, Long)

  final case class Verdict(
      regressed: Seq[(String, Double, Double)],
      suspect: Seq[(String, Double, Double)],
      adjudication: Seq[(String, String)])

  /** Minimum gradable wall time — below it scheduler noise dominates. */
  val FloorSec = 0.15

  def decide(
      /** name -> (reported pin sec, gate threshold sec); both -1 when
        * unpinned. Bench derives this from BASELINE_QUERIES.json
        * (v2 pair -> (median, 2 x median); v1 scalar -> (min, 3 x min)). */
      pinThr: String => (Double, Double),
      pass1: Seq[Quint], pass2: Seq[Quint],
      errors: Set[String], slots: Int, ncpu: Int): Verdict = {
    val adjudication =
      scala.collection.mutable.LinkedHashMap[String, String]()
    // steady state = the per-query MIN of the two passes: a
    // hypervisor steal burst (visible in the steal_ms column) hits
    // whatever queries run inside its window in ONE pass — measured
    // r14: q260 at 44.1 s wall carrying 28.7 s of steal in pass 2
    // while pass 1 ran 14.3 s — whereas a genuine plan regression
    // inflates BOTH passes.
    val p1m = pass1.map { case (n, sec, _, _, _, _) => n -> sec }.toMap
    val steady = (if (pass2.nonEmpty) pass2 else pass1)
      .map { case (n, sec, _, _, _, _) =>
        n -> math.min(sec, p1m.getOrElse(n, sec)) }
    // Steal-aware adjudication (r14 verdict ask 1) — see excuse().
    def medSteal(p: Seq[Quint]): Double = {
      val ss = p.map(_._6).filter(_ >= 0).sorted
      if (ss.isEmpty) 0.0 else ss(ss.length / 2).toDouble
    }
    val med1 = medSteal(pass1)
    val med2 = medSteal(pass2)
    // steal — machine-wide steal >= 30% of the query's wall AND
    //   >= 10x the pass's per-query MEDIAN steal: burst-shaped only
    //   (this host: near-zero background with episodic 1-28 s bursts
    //   that serialize stages on stalled stragglers); on a host with
    //   UNIFORM background steal the median is itself high, nothing
    //   clears 10x it, and a genuine regression cannot launder
    //   itself through ambient steal.
    // task-flat — executor task-seconds within the pinned
    //   wall x BENCH-PARALLELISM budget (local[N] slots, NOT host
    //   cores: at local[4] on a 32-core host a pin x 32 budget would
    //   excuse any real regression, since task_sec is bounded by
    //   ~4x wall anyway): the WORK didn't grow, only the waiting.
    def excuse(sec: Double, task: Double, st: Long,
        pinSec: Double, passMed: Double): Option[String] = {
      if (st >= 0 && st.toDouble >= 0.3 * sec * 1000.0 &&
          st.toDouble >= 10.0 * passMed)
        Some(f"steal ${st}ms >= 30%% of ${sec}%.2fs wall and >= " +
          f"10x pass median ${passMed}%.0fms")
      else if (task <= pinSec * slots)
        Some(f"task_sec $task%.1f flat vs pin $pinSec%.3f x " +
          f"$slots slots")
      else None
    }
    val overThr = steady.collect {
      case (n, sec)
          if !errors.contains(n) && sec >= FloorSec &&
            pinThr(n)._2 > 0 && sec > pinThr(n)._2 =>
        (n, pinThr(n)._1, sec)
    }
    // a fail downgrades ONLY when every over-threshold pass is
    // excused — and it stays visible in suspect + adjudication,
    // never silent
    val (excused, reg) = overThr.partition { case (n, pinSec, _) =>
      val thr = pinThr(n)._2
      def flagged(p: Seq[Quint], med: Double) = p.collect {
        case (`n`, sec, _, _, task, st) if sec > thr =>
          excuse(sec, task, st, pinSec, med)
      }
      val verdicts = flagged(pass1, med1) ++ flagged(pass2, med2)
      val ok = verdicts.nonEmpty && verdicts.forall(_.isDefined)
      if (ok) adjudication(n) =
        "downgraded: " + verdicts.flatten.mkString("; ")
      ok
    }
    // Non-fatal visibility: the min rule immunizes the gate against
    // single-window bursts but must not make an IN-JVM pass-2-only
    // degradation (code-cache recurrence, lost memo) invisible. A
    // query whose SLOWER pass exceeded the threshold while the min
    // stayed under is a `suspect` UNLESS that pass clears the
    // CPU-NORMALIZED steal bar (>= 20% of wall x ncpu — r14 advisor:
    // the un-normalized bar let modest background steal on a 32-core
    // host excuse genuine degradations out of BOTH lists).
    val regNames = overThr.map(_._1).toSet
    def quint(p: Seq[Quint], n: String) = p.find(_._1 == n)
    val sus = (if (pass2.nonEmpty) pass2 else Seq.empty).collect {
      case (n, sec, _, _, _, st)
          if !errors.contains(n) && !regNames.contains(n) &&
            sec >= FloorSec && pinThr(n)._2 > 0 && sec > pinThr(n)._2 &&
            (st < 0 || st.toDouble < 0.2 * sec * 1000.0 * ncpu) &&
            quint(pass1, n).exists(_._2 <= pinThr(n)._2) =>
        (n, pinThr(n)._1, sec)
    }
    Verdict(reg, excused ++ sus, adjudication.toSeq)
  }
}
