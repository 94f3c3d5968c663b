package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** S21 observability: the reference wires per-stage progress logging
  * around every pipeline step (psx_data_automation/main.py:26-34,
  * config.py logging setup). The Spark-native counterpart is a
  * SparkListener — stages/jobs are the engine's own unit of progress,
  * so one listener observes every operator in the library without any
  * operator knowing about logging (the reference threads its logger
  * through each function instead).
  *
  * Scale notes: listener callbacks run on the driver's listener bus off
  * the execution path — zero executor overhead; the sink is pluggable
  * (log4j by default, any `String => Unit` for tests/metrics bridges).
  */
object Progress {

  /** Driver-side stage/job telemetry → pluggable sink. */
  class StageLogListener(sink: String => Unit) extends SparkListener {
    private val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()

    override def onJobStart(e: SparkListenerJobStart): Unit = {
      jobStart.put(e.jobId, e.time)
      sink(s"job ${e.jobId} started: ${e.stageInfos.size} stages")
    }

    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      val si = e.stageInfo
      val ms = for {
        c <- si.completionTime; s <- si.submissionTime
      } yield c - s
      sink(s"stage ${si.stageId} '${si.name.takeWhile(_ != '\n')}': " +
        s"${si.numTasks} tasks in ${ms.getOrElse(-1L)} ms" +
        si.failureReason.map(r => s" FAILED: $r").getOrElse(""))
    }

    override def onJobEnd(e: SparkListenerJobEnd): Unit = {
      val dur = Option(jobStart.remove(e.jobId)).map(t => e.time - t)
      sink(s"job ${e.jobId} finished (${e.jobResult}) in ${dur.getOrElse(-1L)} ms")
    }
  }

  /** Attach a stage logger for the duration of `body` — the library's
    * spelling of the reference's per-run logging context. The listener
    * bus is asynchronous: events may arrive shortly after an action
    * returns, so consumers that assert on the sink should poll (see
    * ProgressSpec). */
  def withStageLogging[T](spark: SparkSession, sink: String => Unit = defaultSink)(body: => T): T = {
    val l = new StageLogListener(sink)
    spark.sparkContext.addSparkListener(l)
    try body
    finally spark.sparkContext.removeSparkListener(l)
  }

  private lazy val log = org.slf4j.LoggerFactory.getLogger("graft.progress")
  private def defaultSink(msg: String): Unit = log.info(msg)
}
