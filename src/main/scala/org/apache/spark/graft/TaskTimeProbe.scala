package org.apache.spark.graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerTaskEnd}

/** Executor-task-time accumulator for the bench (r13 verdict ask 2).
  *
  * A wall-clock-only bench number cannot distinguish "the tasks ran
  * longer" from "the tasks sat in the scheduler queue" — the exact
  * ambiguity behind r13's unattributed pass-1 heavy tail (q191 at
  * 38.8x its pin with zero GC). This listener sums
  * `TaskMetrics.executorRunTime` across all completed tasks; a
  * per-query delta next to the wall time settles the question
  * mechanically:
  *
  *   - task_sec >> pin x cores  => the work itself grew (plan change,
  *     codegen storm, cache loss);
  *   - task_sec ~= pin-level but wall inflated => tasks idle-waiting
  *     (scheduling / external load), the plan is innocent.
  *
  * Attribution: task ends are matched to the owning job's
  * `spark.jobGroup.id` via the job-start event's stage ids, so the
  * concurrent memo-prewarm chains (each chain step sets its memo name
  * as job group) get *per-memo* task-time deltas even though they
  * interleave on the bus. Ungrouped work (the timed query passes run
  * one query at a time) reads the global counter.
  *
  * Lives under `org.apache.spark` only to reach the `private[spark]`
  * `SparkContext.listenerBus` for `waitUntilEmpty` — the listener bus
  * is async, so a snapshot taken right after an action returns could
  * otherwise miss that action's final task-end events and smear them
  * into the next query's delta. Public API otherwise.
  */
class TaskTimeProbe extends SparkListener {
  private val totalRunMs = new AtomicLong(0L)
  private val groupRunMs = new ConcurrentHashMap[String, AtomicLong]()
  private val stageGroup = new ConcurrentHashMap[Int, String]()

  override def onJobStart(e: SparkListenerJobStart): Unit = {
    val group = Option(e.properties)
      .flatMap(p => Option(p.getProperty("spark.jobGroup.id"))).orNull
    if (group != null) {
      val ids = e.stageIds
      ids.foreach(id => stageGroup.put(id, group))
    }
  }

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    val m = e.taskMetrics
    if (m != null) {
      val ms = m.executorRunTime
      totalRunMs.addAndGet(ms)
      val g = stageGroup.get(e.stageId)
      if (g != null) {
        groupRunMs.computeIfAbsent(g, _ => new AtomicLong(0L)).addAndGet(ms)
      }
    }
  }

  /** Drain the listener bus (bounded wait — a wedged bus degrades to
    * a slightly-stale snapshot rather than hanging the bench), then
    * read the cumulative executor task seconds. */
  def taskSec(sc: SparkContext): Double = {
    flush(sc)
    totalRunMs.get / 1e3
  }

  /** Cumulative task seconds attributed to one job group (memo name).
    * Flush before reading a batch of groups via `taskSec`/`flush`. */
  def groupTaskSec(group: String): Double = {
    val v = groupRunMs.get(group)
    if (v == null) 0.0 else v.get / 1e3
  }

  def flush(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty(10000L)
    catch {
      case _: java.util.concurrent.TimeoutException =>
      case scala.util.control.NonFatal(_) =>
    }
}

object TaskTimeProbe {
  def install(sc: SparkContext): TaskTimeProbe = {
    val p = new TaskTimeProbe
    sc.addSparkListener(p)
    p
  }
}
