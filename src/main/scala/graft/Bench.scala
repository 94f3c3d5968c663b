package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * Hardened against host noise and silent failures:
  *  - one untimed warmup query absorbs JVM/codegen/parquet-footer warmup
  *    so the first timed query isn't charged for it;
  *  - each query runs SPARK_GRAFT_REPS times (default 2) and reports the
  *    per-query MIN — run-to-run variance on this host is multi-x;
  *  - a crashing query is recorded in "failed" (and excluded from
  *    "queries"/total) instead of logging a fake fast time;
  *  - the JSON line is also written to SPARK_GRAFT_BENCH_OUT (default
  *    BENCH_QUERIES.json — a COMMITTED artifact, because the driver's
  *    bounded stdout capture truncated the per-query map in two
  *    consecutive round artifacts; committing the file is the only
  *    truncation-proof per-query history);
  *  - a SHORT total-only JSON line follows the big one, so a bounded
  *    stdout capture that truncates the per-query map still carries the
  *    headline number (the r04 driver artifact lost its total that way).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse(Env.SfDir, "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse(Env.Cpus, "4")
    val reps = sys.env.getOrElse(Env.Reps, "2").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // a 238-query run leaves thousands of dereferenced shuffle
      // dependencies; ContextCleaner only reclaims their files after a
      // JVM GC notices the dead references, and the default periodic-GC
      // interval (30 min) outlives the whole run — so the back half of
      // a long run would otherwise accumulate every query's shuffle
      // files on disk (r10 verdict #1, the bench back-half drift)
      .config("spark.cleaner.periodicGC.interval", "1min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // releasing a localCheckpoint logs one WARN per RDD ("lineage has
    // been truncated...") — correct behavior under the Caches.pin
    // release discipline, but hundreds of them would drown the bench
    // output, so the rdd logger runs at ERROR here
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd", org.apache.logging.log4j.Level.ERROR)
    // optional debug filter: SPARK_GRAFT_ONLY=regex runs a subset.
    // Full runs skip the fixed-size semantics audits (benchExcluded) —
    // an explicit ONLY regex still selects them for dev timing.
    val selected = sys.env.get(Env.Only) match {
      case Some(re) => SparkEntry.queries.filter(_._1.matches(re))
      case None => SparkEntry.queries -- SparkEntry.benchExcluded
    }
    // Consume via the noop sink, NOT count(): Dataset.count() rewrites
    // to Aggregate(count(1)) and column pruning then deletes the very
    // projections being benchmarked (q69's whole quantization, q56's
    // scaled-long sums would time as scan+count). The noop write
    // forces every output column through the full plan and discards
    // rows executor-side — no driver collect, no disk.
    def consume(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // Untimed warmup: a DETERMINISTIC join+agg query (not HashMap head
    // order) exercises codegen, shuffle and the parquet reader once
    // before any measurement; under a subset filter fall back to the
    // first selected name alphabetically.
    val warmupFn = selected.get("q02_revenue_by_nation")
      .orElse(selected.toSeq.sortBy(_._1).headOption.map(_._2))
    warmupFn.foreach { fn =>
      try consume(fn(spark, sfDir))
      catch { case _: Throwable => () }
      finally Caches.releaseAll() // timed reps must not reuse warmup caches
    }
    // Untimed BUILD phase (r8 verdict #4): memoized per-process
    // fixtures — the media container encode and the persisted store/
    // index builds — are triggered here, so they are charged to setup
    // instead of whichever query the map iterates first (the builds run
    // EAGERLY at DataFrame-construction time inside Scratch.ensure /
    // the media memo; constructing the plan is enough, no consume).
    // Store/media query lines then time SERVING on every rep,
    // independent of map iteration order.
    SparkEntry.benchBuilds.filter(selected.contains).foreach { n =>
      try { selected(n)(spark, sfDir); () }
      catch { case t: Throwable =>
        System.err.println(s"BENCH SETUP $n: ${t.getClass.getSimpleName}: ${t.getMessage}")
      }
      finally Caches.releaseAll()
    }
    val failed = scala.collection.mutable.ListBuffer[String]()
    // per-process leak diagnostic (r10 verdict #1): every 50 queries,
    // one stderr line with heap, registered-pin count, live persistent
    // RDDs, and the scratch shuffle footprint — the drift signature
    // (any of these growing run-long) now has a committed trace.
    var qIndex = 0
    def leakLine(): Unit = {
      val rt = Runtime.getRuntime
      val heapMb = (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
      val nRdds = spark.sparkContext.getPersistentRDDs.size
      System.err.println(
        s"BENCH DIAG q#$qIndex heapMB=$heapMb persistentRDDs=$nRdds pinned=${Caches.pinnedCount}")
    }
    val results = selected.flatMap { case (name, fn) =>
      def runReps(n: Int): Seq[Double] = (1 to n).flatMap { _ =>
        val t0 = System.nanoTime()
        try { consume(fn(spark, sfDir)); Some((System.nanoTime() - t0) / 1e9) }
        catch { case t: Throwable =>
          System.err.println(s"BENCH FAIL $name: ${t.getClass.getSimpleName}: ${t.getMessage}")
          None
        }
        finally Caches.releaseAll() // each rep pays its own cache cost
      }
      qIndex += 1
      if (qIndex % 50 == 0) leakLine()
      // scale-shape pins (q86) time ONE rep: min-of-reps exists to cut
      // host noise on throughput queries, not to double a pin's cost
      val qReps = if (SparkEntry.singleRep(name)) 1 else reps
      var times = runReps(qReps)
      // Sub-second queries get extra reps (r8 verdict #5): min-of-2 on
      // a trivial line still carried 8–10× host-noise swings between
      // artifacts (q06/q15 in BENCH_r08, byte-identical code since r7).
      // Extra reps on a < 1 s line are cheap by definition; the target
      // is min-of-4 so the committed artifact's sub-second cohort stops
      // moving multi-x on identical code.
      if (!SparkEntry.singleRep(name) && times.nonEmpty && times.min < 1.0 && qReps < 4)
        times = times ++ runReps(4 - qReps)
      if (times.isEmpty) { failed += name; None } else {
        // stderr trace with the RUN POSITION — the drift diagnostic
        // (r10 #1): lets two runs be compared positionally, which the
        // order-free JSON map cannot support
        System.err.println(f"BENCH TIME #$qIndex $name ${times.min}%.3f")
        Some(name -> times.min)
      }
    }
    leakLine() // closing diagnostic: end-of-run process state
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"reps":$reps,"sf":"$sfDir"}"""
    println(line)
    // truncation-proof summary: a bounded stdout capture can lose the
    // head of the big line above; this one is < 120 bytes and LAST
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"n_failed":${failed.size}}""")
    // Default artifact path ONLY for full runs: a SPARK_GRAFT_ONLY
    // subset dev run must not clobber the committed per-query history
    // (it did, twice, before this guard) — subsets write only when
    // SPARK_GRAFT_BENCH_OUT is explicitly set.
    val out = sys.env.get(Env.BenchOut)
      .orElse(if (sys.env.contains(Env.Only)) None else Some("BENCH_QUERIES.json"))
    out.foreach { o =>
      try java.nio.file.Files.write(java.nio.file.Paths.get(o),
        (line + "\n").getBytes("UTF-8"))
      catch { case e: java.io.IOException =>
        System.err.println(s"BENCH: could not write $o: ${e.getMessage}")
      }
    }
    spark.stop()
    if (failed.nonEmpty) System.err.println(s"BENCH: ${failed.size} queries failed: ${failed.mkString(", ")}")
  }
}
