package graft

import java.io.{File, FileWriter}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Query-metrics log sink — the rebuild's analog of the reference's
  * `.MapReduceFramework.log` (thread lifecycle + phase wall times,
  * reference MRFCore.cpp:469-497, timings :344-354,422-429), done the
  * Spark way: a [[QueryExecutionListener]] that appends one line per
  * completed query action with name, wall time, and outcome.
  *
  * The reference's per-phase map/shuffle/reduce timings have no direct
  * analog in a Catalyst plan (stages are fused and pipelined); the
  * per-query wall time plus the Spark UI / event log supersede them.
  * Unlike the reference's timing code, this one subtracts full
  * timestamps, not just the sub-second field (MRFCore.cpp:349-350 bug —
  * SURVEY.md §4 defect (a)). */
class MetricsLog(path: String) extends QueryExecutionListener {

  private def append(line: String): Unit = synchronized {
    val w = new FileWriter(path, true)
    try w.write(line + "\n") finally w.close()
  }

  override def onSuccess(funcName: String, qe: QueryExecution,
      durationNs: Long): Unit =
    append(s"${System.currentTimeMillis()} ok $funcName ${durationNs / 1000000} ms")

  override def onFailure(funcName: String, qe: QueryExecution,
      exception: Exception): Unit =
    append(s"${System.currentTimeMillis()} fail $funcName ${exception.getClass.getSimpleName}")
}

object MetricsLog {
  /** Install a metrics log on the session; returns the listener so
    * callers/tests can unregister it. */
  def install(spark: SparkSession, path: String): MetricsLog = {
    new File(path).getParentFile match {
      case null => ()
      case p => p.mkdirs()
    }
    val l = new MetricsLog(path)
    spark.listenerManager.register(l)
    l
  }
}
