package org.apache.spark.graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Per-run shuffle byte meter for the scale harness: accumulates
  * shuffle read/write bytes across every task that ends while attached.
  * Shuffle bytes are the unit a real cluster bills — unlike wall time
  * they are machine-independent, so SCALE.md's byte columns transfer
  * across boxes where its second columns need the VM-factor yardstick.
  *
  * Lives under org.apache.spark because draining the listener bus
  * (`waitUntilEmpty`) — required so a measurement reads its OWN final
  * task events, not a prefix — is `private[spark]`.
  */
final class ShuffleMeter extends SparkListener {
  private val read = new AtomicLong
  private val write = new AtomicLong

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val m = taskEnd.taskMetrics
    if (m != null) {
      read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
    }
  }

  def readBytes: Long = read.get()
  def writeBytes: Long = write.get()
}

object ShuffleMeter {
  /** Attach a fresh meter, run `f`, drain the listener bus, detach, and
    * return (result, shuffleReadBytes, shuffleWriteBytes) for exactly
    * the jobs `f` ran.
    */
  def measure[A](sc: SparkContext)(f: => A): (A, Long, Long) = {
    val meter = new ShuffleMeter
    sc.addSparkListener(meter)
    try {
      val r = f
      sc.listenerBus.waitUntilEmpty()
      (r, meter.readBytes, meter.writeBytes)
    } finally sc.removeSparkListener(meter)
  }

  /** Drain the listener bus so an attached meter's counters reflect
    * every task that has finished — the stage-mark variant of the
    * measure() drain, for callers that keep one meter across stages.
    */
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
