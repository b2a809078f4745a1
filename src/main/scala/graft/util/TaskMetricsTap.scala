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

  /** Wait for the async listener bus to settle: poll until two reads of
    * the counters agree (20 ms steps, bounded at ~2 s — cheap enough to
    * run per build stage). */
  def drain(): Unit = {
    var prev = snap.toSeq
    var i = 0
    while (i < 100) {
      Thread.sleep(20)
      val cur = snap.toSeq
      if (cur == prev) return
      prev = cur
      i += 1
    }
  }
}
