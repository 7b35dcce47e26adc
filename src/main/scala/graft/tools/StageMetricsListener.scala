package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Accumulates per-stage task metrics so the bench can attribute wall time
  * to stages per query — the instrument for diagnosing why a query is
  * slower inside the full suite than solo (GC pressure, spill, lingering
  * storage blocks all leave distinct signatures here).
  *
  * Thread-safe: Spark delivers listener events from its single listener-bus
  * thread, but `drain()` is called from the bench main thread, so the
  * queue is concurrent.
  */
final class StageMetricsListener extends SparkListener {

  /** One completed stage. Times in ms (cpu ns), sizes in bytes. */
  final case class StageRec(
      stageId: Int,
      name: String,
      tasks: Int,
      wallMs: Long, // submission→completion, includes scheduling
      runMs: Long, // sum of task executor run time
      cpuNs: Long,
      gcMs: Long,
      memSpill: Long,
      diskSpill: Long,
      shufRead: Long,
      shufWrite: Long,
      peakExecMem: Long) {
    def json: String = {
      val short = name.replace("\"", "'").linesIterator.next().take(80)
      s"""{"id":$stageId,"name":"$short","tasks":$tasks,"wall_ms":$wallMs,""" +
        s""""run_ms":$runMs,"cpu_ms":${cpuNs / 1000000},"gc_ms":$gcMs,""" +
        s""""mem_spill":$memSpill,"disk_spill":$diskSpill,""" +
        s""""shuf_read":$shufRead,"shuf_write":$shufWrite,"peak_exec_mem":$peakExecMem}"""
    }
  }

  private val recs = new ConcurrentLinkedQueue[StageRec]()

  override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
    val si = ev.stageInfo
    val m = si.taskMetrics
    if (m != null) {
      recs.add(StageRec(
        si.stageId,
        si.name,
        si.numTasks,
        (for { s <- si.submissionTime; c <- si.completionTime } yield c - s).getOrElse(-1L),
        m.executorRunTime,
        m.executorCpuTime,
        m.jvmGCTime,
        m.memoryBytesSpilled,
        m.diskBytesSpilled,
        m.shuffleReadMetrics.totalBytesRead,
        m.shuffleWriteMetrics.bytesWritten,
        m.peakExecutionMemory))
    }
  }

  /** Remove and return every stage completed since the last drain. The
    * listener bus is async — callers must quiesce the job (the timed
    * action has returned) before draining; stages of a completed job are
    * posted before the job-end event, but give the bus a beat. */
  def drain(): Seq[StageRec] = {
    val out = Iterator.continually(recs.poll()).takeWhile(_ != null).toSeq
    out
  }

  /** Aggregate + top-stage summary of one drained batch as a JSON object. */
  def summarize(stages: Seq[StageRec], topN: Int = 5): String = {
    val runMs = stages.map(_.runMs).sum
    val gcMs = stages.map(_.gcMs).sum
    val cpuMs = stages.map(_.cpuNs).sum / 1000000
    val memSpill = stages.map(_.memSpill).sum
    val diskSpill = stages.map(_.diskSpill).sum
    val top = stages.sortBy(-_.runMs).take(topN).map(_.json).mkString("[", ",", "]")
    s"""{"n_stages":${stages.length},"run_ms":$runMs,"cpu_ms":$cpuMs,""" +
      s""""gc_ms":$gcMs,"mem_spill":$memSpill,"disk_spill":$diskSpill,"top":$top}"""
  }
}

object StageMetricsListener {

  /** Driver-JVM GC totals (ms) across all collectors — in local mode the
    * driver IS the executor, so this catches GC that falls between tasks
    * (where jvmGCTime under-counts). */
  def jvmGcMs(): Long =
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime.max(0L)).sum

  def heapUsedMb(): Long = {
    val r = Runtime.getRuntime
    (r.totalMemory() - r.freeMemory()) / (1024 * 1024)
  }

  /** Code-cache occupancy (used MB summed over the CodeHeap pools). When
    * the reserved code cache (default 240 MB on JDK 17) fills,
    * UseCodeCacheFlushing evicts cold nmethods and the JIT may stop
    * compiling — hot generated code then runs interpreted/C1 at 3-10x
    * CPU, which is invisible to every other metric here. */
  def codeCacheUsedMb(): Long =
    java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getName.startsWith("CodeHeap"))
      .map(_.getUsage.getUsed).sum / (1024 * 1024)

  /** Cumulative JIT compilation time (ms) — a jump between shots means the
    * compiler was (re)compiling during the measurement. */
  def jitCompileMs(): Long = {
    val c = java.lang.management.ManagementFactory.getCompilationMXBean
    if (c != null && c.isCompilationTimeMonitoringSupported)
      c.getTotalCompilationTime
    else -1L
  }

  /** Cumulative count of Janino (whole-stage/expression codegen) class
    * compilations. A delta on a REPEATED shot of the same query means the
    * codegen cache missed and the class was recompiled — each fresh class
    * then also re-enters the JIT queue, multiplying compile churn. */
  def janinoCompiles(): Long =
    org.apache.spark.metrics.source.CodegenMetrics.METRIC_COMPILATION_TIME.getCount

  /** Count + total size of RDD blocks still in the block manager (persisted
    * caches AND localCheckpoint blocks — the latter are invisible to
    * `spark.catalog.clearCache`). */
  def storedRddBytes(sc: org.apache.spark.SparkContext): (Int, Long) = {
    val infos = sc.getRDDStorageInfo
    (infos.length, infos.map(_.memSize).sum + infos.map(_.diskSize).sum)
  }
}
