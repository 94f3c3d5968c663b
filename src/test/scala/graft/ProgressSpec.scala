package graft

import graft.tools.Progress

class ProgressSpec extends SparkSpec {

  test("stage listener reports jobs and stages with task counts (S21)") {
    val seen = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    Progress.withStageLogging(spark, seen.add(_)) {
      spark.range(1000).selectExpr("sum(id)").collect()
      // the listener bus is async — poll for the tail events
      val deadline = System.currentTimeMillis() + 10000
      while (System.currentTimeMillis() < deadline &&
        !seen.toArray.exists(_.toString.startsWith("job") )) Thread.sleep(50)
      while (System.currentTimeMillis() < deadline &&
        !seen.toArray.exists(_.toString.contains("finished"))) Thread.sleep(50)
    }
    val msgs = seen.toArray.map(_.toString)
    assert(msgs.exists(_.matches("job \\d+ started: \\d+ stages")), msgs.mkString("\n"))
    assert(msgs.exists(_.matches("stage \\d+ .*: \\d+ tasks in \\d+ ms.*")), msgs.mkString("\n"))
    assert(msgs.exists(_.matches("job \\d+ finished .* in \\d+ ms")), msgs.mkString("\n"))
  }

  test("listener detaches after the scope (no leak into later actions)") {
    val seen = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    Progress.withStageLogging(spark, seen.add(_)) {
      spark.range(10).count()
    }
    Thread.sleep(200) // drain
    val before = seen.size()
    spark.range(10).count() // outside the scope — must not be observed
    Thread.sleep(500)
    assert(seen.size() == before)
  }
}
