package graft.engine

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Job telemetry — A26/A29: the Spark equivalent of the reference's
  * `slot_millis` / `total_bytes_processed` accumulation
  * (`handler.py:1-15`, `main.py:23-40`) written as an xcom-style JSON
  * sidecar.
  *
  *  - `total_bytes_processed` ← task input bytes read
  *  - `slot_millis`           ← summed executor task run time (the
  *    closest Spark analogue of BigQuery slot-milliseconds)
  */
class MetricsCollector(spark: SparkSession) extends SparkListener {
  private val bytesRead = new LongAdder
  private val taskMillis = new LongAdder
  private val rowsWritten = new LongAdder

  spark.sparkContext.addSparkListener(this)

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val m = taskEnd.taskMetrics
    if (m != null) {
      bytesRead.add(m.inputMetrics.bytesRead)
      taskMillis.add(m.executorRunTime)
      rowsWritten.add(m.outputMetrics.recordsWritten)
    }
  }

  def totalBytesProcessed: Long = bytesRead.sum()
  def slotMillis: Long = taskMillis.sum()
  def recordsWritten: Long = rowsWritten.sum()

  /** xcom JSON contract of `main.py:14-40`. */
  def xcomJson(executionTime: String): String =
    s"""{"execution_time": "$executionTime", "monitoring": {"slot_millis": $slotMillis, "total_bytes_processed": $totalBytesProcessed}}"""

  def writeXcom(path: String, executionTime: String): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.writeString(p, xcomJson(executionTime))
  }

  def detach(): Unit = spark.sparkContext.removeSparkListener(this)
}
