package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The config-driven extension path must expose the custom expression
  * to pure-SQL sessions (no library code in the query). */
class ExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions registers sorted_intersect_count for SQL") {
    // spark.sql.extensions is a STATIC conf: it only takes effect on
    // the first session of a SparkContext. Any suite running before
    // this one leaves a context without extensions, so getOrCreate
    // would silently hand back a session the conf can't reach — stop
    // that context and build a fresh one. The extensions session is
    // left as the process default afterwards (same end state as when
    // this suite runs first); later suites' getOrCreate reuses it and
    // their runtime confs still apply.
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(_.sparkContext.stop())
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val got = spark.sql(
        """SELECT sorted_intersect_count(array('a','b','c'), array('b','c','d')) AS n,
                  sorted_intersect_count(array(), array('x')) AS zero""").head()
      assert(got.getInt(0) == 2 && got.getInt(1) == 0)
      // dot_scaled: Σ floor(a·b·1e14) with float/double arrays
      val dot = spark.sql(
        """SELECT dot_scaled(array(CAST(0.5 AS FLOAT), CAST(2.0 AS FLOAT)),
                             array(CAST(2.0 AS FLOAT), CAST(0.25 AS FLOAT))) AS d,
                  dot_scaled(array(CAST(1.0 AS DOUBLE)), array(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE))) AS mism""").head()
      assert(dot.getLong(0) == 150000000000000L) // (1.0 + 0.5) * 1e14
      assert(dot.isNullAt(1)) // length mismatch poisons, like zip_with
      // simhash64 via pure SQL matches the library HOF spelling
      val sh = spark.sql("SELECT simhash64('hello world') AS h").head().getLong(0)
      val ref = spark.createDataset(Seq("hello world"))(org.apache.spark.sql.Encoders.STRING)
        .toDF("text").select(graft.dedup.Dedup.simhash64Hof("text")).head().getLong(0)
      assert(sh == ref)
  }
}
