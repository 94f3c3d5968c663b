package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print condensed final physical plans for a query subset —
  * the fast way to eyeball pushdown/pruning/joins/codegen after a plan
  * change.
  *
  *   sbt "runMain graft.tools.ExplainAudit q44.* /root/testdata/sf0.01"
  */
object ExplainAudit {
  private val Interesting =
    Seq("Scan", "Exchange", "HashAggregate", "SortMergeJoin", "ShuffledHashJoin",
      "BroadcastHashJoin", "BroadcastNestedLoopJoin", "CartesianProduct",
      "WholeStageCodegen", "PushedFilters", "Window", "Expand")

  def main(args: Array[String]): Unit = {
    val pattern = args.headOption.getOrElse(".*")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(_._1.matches(pattern))
      .foreach { case (name, fn) =>
        println(s"===== $name =====")
        val df = fn(spark, sfDir)
        df.collect() // finalize the adaptive plan
        df.queryExecution.executedPlan.toString.linesIterator
          .filter(l => Interesting.exists(l.contains))
          .map(_.replaceAll("^\\s+", "  ").take(200))
          .foreach(println)
        graft.Caches.releaseAll()
      }
    spark.stop()
  }
}
