package graft

/** The ONE spelling of every harness environment variable. Bench/Verify
  * (and any dev tool) must reference these constants instead of inline
  * string literals — a transposed-case typo in a literal (e.g.
  * "SPARK_GRAft_...") silently reads nothing and is invisible in review.
  */
object Env {
  val SfDir    = "SPARK_GRAFT_SF_DIR"
  val Cpus     = "SPARK_GRAFT_CPUS"
  val Reps     = "SPARK_GRAFT_REPS"
  val Only     = "SPARK_GRAFT_ONLY"
  val BenchOut = "SPARK_GRAFT_BENCH_OUT"
  val BenchCommit = "SPARK_GRAFT_BENCH_COMMIT" // =1: update committed BENCH_QUERIES.json
  val DataDir  = "SPARK_GRAFT_DATA_DIR" // graft.Main's pipeline data root
  val Stress   = "SPARK_GRAFT_STRESS"   // =1: run the opt-in scale-stress suite
  val Canary   = "SPARK_GRAFT_CANARY"   // =1: Bench launches the fixed-work host canary
  val Bypass   = "SPARK_GRAFT_BYPASS"   // shuffle bypassMergeThreshold override (default 1: sort writer)
}
