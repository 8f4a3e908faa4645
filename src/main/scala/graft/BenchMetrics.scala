package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Per-query execution-profile counters behind Bench's `[bench-gap]` line.
  *
  * Purpose (round 11): the round-10 driver bench ran 1.75× the builder's
  * fresh-JVM envelope with a flat +0.4-0.5 s on dozens of sub-second
  * queries, and the per-query wall-clock alone can't distinguish "the
  * driver box was loaded" (scheduler delay + GC inflate while task run
  * time holds) from "the harness or a plan grew" (task run time itself
  * moves). These counters split the wall-clock into the pieces that name
  * the culprit:
  *
  *  - `jobs/stages/tasks`: how many scheduling units the query issued —
  *    iterative operators (the CC fixpoint) pay ambient load once PER JOB,
  *    so this is the sensitivity knob the round-11 loop work targets.
  *  - `taskRunMs`: sum of executor run time — the actual compute.
  *  - `taskGcMs`: GC time attributed to tasks by Spark's own metric.
  *  - `schedMs`: per-task launch overhead (duration − run − deserialize −
  *    result-serialization) — pure scheduler/queueing delay; this is what
  *    ambient box load inflates.
  *
  * Listener events are delivered async; callers must drain the bus
  * (BlockHygiene.drainListenerBus) before `snapshot()` or the tail of a
  * query's tasks lands in the next query's counters. All counters are
  * LongAdders because task-end events arrive from the listener thread
  * while the driver thread resets/reads only at quiesced points. */
final class BenchMetrics extends SparkListener {
  private val jobs = new LongAdder
  private val stages = new LongAdder
  private val tasks = new LongAdder
  private val taskRunMs = new LongAdder
  private val taskGcMs = new LongAdder
  private val schedMs = new LongAdder

  override def onJobStart(jobStart: SparkListenerJobStart): Unit =
    jobs.increment()

  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
    stages.increment()

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    tasks.increment()
    val m = taskEnd.taskMetrics
    val info = taskEnd.taskInfo
    if (m != null && info != null) {
      taskRunMs.add(m.executorRunTime)
      taskGcMs.add(m.jvmGCTime)
      val delay = info.duration - m.executorRunTime -
        m.executorDeserializeTime - m.resultSerializationTime
      if (delay > 0) schedMs.add(delay)
    }
  }

  def reset(): Unit = {
    jobs.reset(); stages.reset(); tasks.reset()
    taskRunMs.reset(); taskGcMs.reset(); schedMs.reset()
  }

  /** (jobs, stages, tasks, taskRunMs, taskGcMs, schedMs) since reset. */
  def snapshot(): (Long, Long, Long, Long, Long, Long) =
    (jobs.sum, stages.sum, tasks.sum, taskRunMs.sum, taskGcMs.sum, schedMs.sum)
}

/** Driver-JVM GC totals (all collectors). In local mode driver == executor,
  * so the delta over a query interval is the whole JVM's GC bill — a
  * superset of the task-attributed `taskGcMs` (it also counts GC during
  * planning and the hygiene gap's System.gc()). */
object BenchMetrics {
  def jvmGcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
  }
}
