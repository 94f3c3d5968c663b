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
    } finally previous.foreach { p =>
      SparkSession.setActiveSession(p); SparkSession.setDefaultSession(p)
    }
  }
}
