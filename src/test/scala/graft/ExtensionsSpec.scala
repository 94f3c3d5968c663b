package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The config-driven extension path must expose the custom expression
  * to pure-SQL sessions (no library code in the query). */
class ExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions registers sorted_intersect_count for SQL") {
    // getOrCreate would hand back another suite's session (extensions
    // are per-session) — clear, build fresh, restore afterwards
    val previous = SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
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
    } finally previous.foreach { p =>
      SparkSession.setActiveSession(p); SparkSession.setDefaultSession(p)
    }
  }
}
