package graft

import graft.tools.PlanFingerprint
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The whole-surface plan-regression net (r11 verdict #7): every query's
  * physical-plan operator multiset is pinned in the committed
  * PLANS.json; a join-strategy flip, a new shuffle, or a lost pushdown
  * in ANY of the ~250 queries fails this suite the day it happens
  * instead of surfacing as a slow bench line two rounds later.
  * BenchPlanSpec still pins the exact load-bearing SHAPE of the top-10
  * timed queries; this spec pins everything else at multiset grain.
  *
  * Intended plan changes: add the query names to [[intendedChanges]]
  * while developing, then regenerate the artifact under the same
  * session config the check runs with —
  *   SPARK_GRAFT_PLANS_UPDATE=1 sbt "testOnly graft.PlanFingerprintSpec"
  * — review the PLANS.json git diff alongside the code change, commit
  * both, and EMPTY the whitelist again (it must be empty at rest so
  * the net stays whole).
  *
  * HERMETIC SESSION: the artifact pins the DRIVER's environment —
  * Verify/Bench run a plain session, no `spark.sql.extensions` — but
  * inside the full suite ExtensionsSpec leaves an extensions session
  * as the process default, under which DemoteOversizedBroadcasts
  * statically strips the IVF-serve family's hinted broadcasts (their
  * join-output ESTIMATES exceed the 512 MB fence even at fixture
  * scale; AQE would restore the broadcast at runtime) — 4 fingerprints
  * legitimately differ. This spec therefore stops any pre-existing
  * context and fingerprints under a fresh PLAIN session, making it
  * order-independent (the ExtensionsSpec convention, in reverse; the
  * media memo and scratch stores are restart-safe by design — the
  * memo is session-keyed with liveness checks, stores are plain
  * parquet on disk).
  */
class PlanFingerprintSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = {
    Caches.releaseAll() // before the stop: never unpersist dead handles
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(_.sparkContext.stop())
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  /** Queries whose fingerprints are intentionally changing THIS change;
    * empty at rest. */
  private val intendedChanges: Set[String] = Set.empty

  private val artifact = "PLANS.json"
  private val Entry = """"([^"]+)"\s*:\s*"([^"]*)"""".r

  private def readArtifact(): Map[String, String] = {
    val p = java.nio.file.Paths.get(artifact)
    if (!java.nio.file.Files.exists(p)) Map.empty
    else Entry.findAllMatchIn(
      new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
      .map(m => m.group(1) -> m.group(2)).toMap
  }

  test("every query's physical-plan operator multiset matches the committed PLANS.json") {
    // audit queries are skipped, not pinned: their construction RUNS a
    // full streaming/lifecycle replay and their returned plan is a
    // constant result scan — minutes of suite wall-time for zero
    // regression signal (see SparkEntry.auditQueries)
    val swept = SparkEntry.queries -- SparkEntry.auditQueries
    val current = swept.toSeq.sortBy(_._1).map { case (name, fn) =>
      val fp =
        try PlanFingerprint.fingerprint(
          fn(spark, sf).queryExecution.executedPlan.toString)
        finally Caches.releaseAll()
      name -> fp
    }
    if (sys.env.get("SPARK_GRAFT_PLANS_UPDATE").contains("1")) {
      val json = current
        .map { case (k, v) => s"""  "$k": "$v"""" }
        .mkString("{\n", ",\n", "\n}\n")
      java.nio.file.Files.write(java.nio.file.Paths.get(artifact),
        json.getBytes("UTF-8"))
      info(s"regenerated $artifact with ${current.size} fingerprints")
    } else {
      val pinned = readArtifact()
      assert(pinned.nonEmpty,
        s"$artifact missing or empty — regenerate: SPARK_GRAFT_PLANS_UPDATE=1 " +
          "sbt \"testOnly graft.PlanFingerprintSpec\"")
      val currentMap = current.toMap
      val drifted = current.collect {
        case (name, fp) if !intendedChanges(name) &&
          pinned.get(name).exists(_ != fp) =>
          s"$name:\n  pinned : ${pinned(name)}\n  current: $fp"
      }
      val missing = current.collect {
        case (name, _) if !pinned.contains(name) && !intendedChanges(name) => name
      }
      val stale = (pinned.keySet -- currentMap.keySet).toSeq.sorted
      assert(drifted.isEmpty,
        s"${drifted.size} quer${if (drifted.size == 1) "y" else "ies"} changed physical shape — " +
          "if intended, whitelist + regenerate (see scaladoc):\n" +
          drifted.mkString("\n"))
      assert(missing.isEmpty,
        s"new queries lack pinned fingerprints (regenerate $artifact): ${missing.mkString(", ")}")
      assert(stale.isEmpty,
        s"$artifact pins queries that no longer exist (regenerate): ${stale.mkString(", ")}")
    }
  }
}
