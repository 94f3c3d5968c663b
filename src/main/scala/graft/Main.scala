package graft

import org.apache.spark.sql.SparkSession
import graft.sources.{Ingest, Pipeline, TickerStore}

/** E1: the runnable pipeline entrypoint — the reference CLI's flag
  * surface and control flow (`psx_data_automation/main.py:45-50` flags,
  * `:90-115` full-run staging) bound onto [[graft.sources.Pipeline]]
  * and the engine's own stage implementations:
  *
  *  - `--sync-tickers`     ticker sync → dated snapshot (S18/S11/S22)
  *  - `--update-ticker-info` S16 sentinel-aware merge of the latest
  *    snapshot against the details source (mock-details first, live
  *    fetch injectable — update_ticker_info.py:151-209) → "updated"
  *    kind (S12/S15/S16 family)
  *  - `--download-historical` bulk tick → daily OHLC bars (P1,
  *    implemented here where the reference stubs it, main.py:76-81)
  *  - `--daily-update`     checkpointed incremental append (P2,
  *    implemented where the reference stubs it, main.py:83-88)
  *  - `--full-run` or NO flags: all four in order (main.py:90 — the
  *    `or not any([...])` contract), with the reference's exact
  *    failure algebra: sync failure ABORTS the pipeline
  *    (main.py:96-98), update-info failure logs and CONTINUES
  *    (main.py:102-104).
  *  - `--version` prints the engine version and exits 0.
  *
  * Individually-requested stages run FIRST in the reference's fixed
  * order and abort on the first failure (main.py:63-71 returns 1 on a
  * failed requested stage); when `--full-run` is combined with stage
  * flags, the full-run block runs AFTER the flagged blocks, exactly as
  * main.py does (sync executes twice under `--sync-tickers --full-run`,
  * and a failed flagged stage returns 1 before the full run starts).
  * Unknown flags exit 2 (argparse parity).
  *
  * Offline by design: the default sync source is the degradation
  * ladder's deterministic mock table ([[Ingest.loadTickersWithFallback]]
  * with no live attempts); a deployment passes real fetch attempts via
  * [[Main.Stages]] — the same injection seam SourcesSpec drives.
  */
object Main {

  val version = "0.12.0"

  /** The four stage bindings; injectable so tests (and deployments
    * with live connectors) swap implementations without touching the
    * control flow. */
  final case class Stages(sync: () => Boolean,
                          updateInfo: () => Boolean,
                          downloadHistorical: () => Boolean,
                          dailyUpdate: () => Boolean)

  /** Production bindings over a data-root directory layout:
    * `dataDir/tickers` snapshot store, `dataDir/landing` raw event
    * parquet drops, `dataDir/ohlc` bar table, `dataDir/store` the
    * day-partitioned dedup store, `dataDir/ckpt` stream checkpoints.
    * A missing landing dir makes the two data stages vacuous successes
    * (nothing to ingest is not a failure — the reference's stub stages
    * log and continue, main.py:78-88). */
  def defaultStages(spark: SparkSession, dataDir: String,
                    syncDate: String,
                    details: SparkSession => org.apache.spark.sql.DataFrame =
                      s => Ingest.mockTickerTable(s).toDF()): Stages = {
    val tickerRoot = s"$dataDir/tickers"
    val landing = s"$dataDir/landing"
    def landingExists: Boolean = {
      val p = new org.apache.hadoop.fs.Path(landing)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    }
    Stages(
      sync = () => {
        val t = Ingest.loadTickersWithFallback(spark, Seq.empty)
        // idempotent: a same-day re-run REPLACES the day's partition,
        // exactly like the reference overwriting tickers_YYYYMMDD.json
        TickerStore.writeSnapshotIdempotent(t, tickerRoot, syncDate, "raw")
        !t.isEmpty
      },
      updateInfo = () => {
        // THE S16 MERGE, not a pass-through re-kind (r11 verdict #2):
        // the reference's stage IS the sentinel-aware field-wise merge
        // against the details source, mock-details first
        // (update_ticker_info.py:151-209) — fresh name/sector/url win
        // only when present and meaningful, missing rows keep the
        // original. The details source is injectable (a deployment
        // passes the live per-ticker fetch); the default is the same
        // deterministic mock-details table the reference consults
        // first. PIN before the write: on a same-day re-run the latest
        // snapshot IS the (today, updated) partition the idempotent
        // write is about to replace — never read the partition being
        // overwritten (the q252 discipline)
        val latest = graft.Caches.pin(
          TickerStore.readLatestSnapshot(spark, tickerRoot))
        try {
          val merged = operators.Snapshots.mergeUpsert(latest, details(spark))
          TickerStore.writeSnapshotIdempotent(merged, tickerRoot, syncDate, "updated")
          !latest.isEmpty
        } finally graft.Caches.unpin(latest)
      },
      downloadHistorical = () => {
        if (!landingExists) true // nothing to ingest
        else {
          // landing is an at-least-once drop zone: a re-delivered file
          // must not double-count bar volume — dedup on the natural key
          // BEFORE aggregating (the incrementalAppend store does the
          // same for the persisted table)
          val ticks = spark.read.parquet(landing).dropDuplicates("event_id")
          operators.TimeSeries
            .ohlcDaily(ticks, "event_type", "ts", "value", "event_id")
            .write.mode("overwrite").parquet(s"$dataDir/ohlc")
          true
        }
      },
      dailyUpdate = () => {
        if (!landingExists) true // nothing to ingest
        else {
          val schema = spark.read.parquet(landing).schema
          streaming.Streaming.incrementalAppend(spark, landing,
            s"$dataDir/store", s"$dataDir/ckpt", schema)
          true
        }
      })
  }

  /** Flag-driven staging over [[Pipeline.run]]; returns the process
    * exit code (0 ok; 1 failed stage per the reference's contract; 2
    * bad usage). Pure control flow — testable without a process. */
  def run(args: Seq[String], stages: Stages,
          log: String => Unit = m => Console.err.println(s"[graft] $m")): Int = {
    val known = Set("--sync-tickers", "--download-historical",
      "--daily-update", "--update-ticker-info", "--full-run", "--version")
    args.find(!known.contains(_)) match {
      case Some(bad) => log(s"unknown argument: $bad"); return 2
      case None =>
    }
    if (args.contains("--version")) { println(s"graft v$version"); return 0 }
    val flags = args.toSet
    // the reference runs BOTH the individually-flagged stage blocks AND
    // the full-run block when --full-run is combined with stage flags
    // (main.py:63-88 then :90-115 — sync executes twice under
    // `--sync-tickers --full-run`, and a failed individually-requested
    // stage returns 1 BEFORE the full-run block starts). Replicated
    // exactly (r11 ADVICE): phase 1 = flagged stages in the fixed
    // order, each critical; phase 2 = the full-run sequence, where only
    // sync aborts (main.py:96-98) and update-info failure logs and
    // continues (main.py:102-104).
    val fullRun = flags.contains("--full-run") ||
      !flags.exists(Set("--sync-tickers", "--download-historical",
        "--daily-update", "--update-ticker-info")) // no flags => full run
    val table = Seq(
      ("sync-tickers", stages.sync, true),
      ("update-ticker-info", stages.updateInfo, false),
      ("download-historical", stages.downloadHistorical, false),
      ("daily-update", stages.dailyUpdate, false))
    def report(results: Seq[Pipeline.StageResult]): Unit = results.foreach { r =>
      log(s"stage ${r.name}: " +
        (if (!r.ran) "skipped (earlier critical failure)"
         else if (r.succeeded) "ok" else "FAILED"))
    }
    val requested =
      table.collect { case (n, f, _) if flags.contains(s"--$n") => (n, f) }
    val phase1 = Pipeline.run(requested.map { case (n, f) =>
      Pipeline.Stage(n, critical = true)(f)
    })
    report(phase1)
    if (phase1.exists(r => r.ran && !r.succeeded)) return 1
    if (!fullRun) return 0
    val phase2 = Pipeline.run(table.map { case (n, f, crit) =>
      Pipeline.Stage(n, critical = crit)(f)
    })
    report(phase2)
    // exit 1 iff full-run's CRITICAL stage (sync) failed — the run
    // completes with code 0 past an update-info failure (main.py:102-115)
    val criticalByName = table.map { case (n, _, c) => n -> c }.toMap
    if (phase2.exists(r => r.ran && !r.succeeded && criticalByName(r.name))) 1 else 0
  }

  def main(args: Array[String]): Unit = {
    if (args.contains("--version")) { println(s"graft v$version"); sys.exit(0) }
    val dataDir = sys.env.getOrElse(Env.DataDir, "./graft_data")
    val cpus = sys.env.getOrElse(Env.Cpus, "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val syncDate = java.time.LocalDate.now().toString.replace("-", "")
    val code =
      try run(args.toSeq, defaultStages(spark, dataDir, syncDate))
      finally spark.stop()
    sys.exit(code)
  }
}
