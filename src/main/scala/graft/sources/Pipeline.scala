package graft.sources

/** S20: sequential stage orchestration with the reference's exact
  * control flow (main.py:55-115): ordered stages, abort-on-failure for
  * critical stages (sync — main.py:96-98), continue-past-failure for
  * the rest (update-info — main.py:102-104). Pure driver-side control
  * flow over engine jobs; scheduling stays external (cron /
  * Trigger.AvailableNow), as in the reference (README.md:93-102).
  */
object Pipeline {

  final case class Stage(name: String, critical: Boolean)(val run: () => Boolean)

  final case class StageResult(name: String, ran: Boolean, succeeded: Boolean)

  /** Run stages in order. A critical failure aborts the remainder
    * (reported as ran=false); non-critical failures are recorded and
    * execution continues. */
  def run(stages: Seq[Stage]): Seq[StageResult] = {
    val results = Seq.newBuilder[StageResult]
    var aborted = false
    stages.foreach { st =>
      if (aborted) results += StageResult(st.name, ran = false, succeeded = false)
      else {
        // NonFatal only: InterruptedException / fatal errors must
        // propagate — converting a cancellation into an ordinary stage
        // failure would clear the interrupt and keep the pipeline
        // running through the remaining stages
        val ok = try st.run() catch { case scala.util.control.NonFatal(_) => false }
        results += StageResult(st.name, ran = true, succeeded = ok)
        if (!ok && st.critical) aborted = true
      }
    }
    results.result()
  }
}
