package graft.util

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Task-metric tap: accumulates shuffle bytes and spill across completed
  * tasks, plus the largest single-task shuffle read — the number that
  * exposes a skewed key regardless of wall clock. Snapshot/delta so
  * sequential phases sharing one session can attribute bytes to their own
  * jobs (concurrent phases cannot be attributed from global counters —
  * don't try). Used by the build/merge stage manifests (per-stage metrics
  * ride the snapshot lineage, north-rule observability) and by the bench.
  */
final class TaskMetricsTap extends SparkListener {
  val shufWrite = new AtomicLong; val shufRead = new AtomicLong
  val spillDisk = new AtomicLong; val spillMem = new AtomicLong
  val maxTaskShufRead = new AtomicLong

  override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
    val m = te.taskMetrics
    if (m != null) {
      shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      val r = m.shuffleReadMetrics.totalBytesRead
      shufRead.addAndGet(r)
      spillDisk.addAndGet(m.diskBytesSpilled)
      spillMem.addAndGet(m.memoryBytesSpilled)
      maxTaskShufRead.updateAndGet(v => math.max(v, r))
    }
  }

  def snap: Array[Long] = Array(shufWrite.get, shufRead.get,
    spillDisk.get, spillMem.get)

  /** Byte deltas since `before`, in MB (1e6), keyed for manifest/bench
    * JSON. The listener bus drains asynchronously and its flush API is
    * private[spark]; callers needing exactness should [[drain]] first. */
  def deltaMb(before: Array[Long]): Map[String, Double] = {
    val d = snap.zip(before).map { case (a, b) => (a - b) / 1e6 }
    Map("shuffle_write_mb" -> d(0), "shuffle_read_mb" -> d(1),
      "spill_disk_mb" -> d(2), "spill_mem_mb" -> d(3))
  }

  /** Absolute totals for a tap registered fresh for one phase, plus the
    * max-task skew figure — the manifest `extra` map. */
  def metricsMap: Map[String, Any] =
    deltaMb(Array(0L, 0L, 0L, 0L)) +
      ("max_task_shuffle_read_mb" -> maxTaskShufRead.get / 1e6)

  /** Wait for the async listener bus to settle: poll every 10 ms until
    * the counters are unchanged over TWO consecutive intervals (a single
    * agreeing pair can straddle a stalled bus thread — GC pause, bursty
    * backlog), bounded at ~2 s. Best-effort by construction: the flush
    * API is private[spark]. Typical cost ~30 ms — callers timing a phase
    * should measure wall BEFORE draining (instrumentedStage does). */
  def drain(): Unit = {
    var prev = snap.toSeq
    var stable = 0
    var i = 0
    while (i < 200) {
      Thread.sleep(10)
      val cur = snap.toSeq
      if (cur == prev) { stable += 1; if (stable >= 2) return }
      else stable = 0
      prev = cur
      i += 1
    }
  }
}
