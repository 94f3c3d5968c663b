package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Dev measurement for the [[graft.plans.ExpandSimilarityJoin]] default
  * (r11 verdict #5): the SAME `SimilarityJoin.of(docs, 3, 0.7)`
  * declaration at a given SF, A = default expansion (exact
  * inverted-index route, flag off), B = `spark.graft.simJoinRewrite
  * .enabled=true` with a 1-byte brute-force budget (MinHash+LSH
  * candidate route — the q37 pipeline). Prints one JSON line with both
  * wall times, both pair counts, and B's recall against A (precision
  * is 1 by construction — the LSH route exact-verifies candidates).
  * The numbers behind SURVEY §8's rewrite-default entry:
  *
  *   sbt "runMain graft.tools.SimJoinAb /root/testdata/sf0.1"
  */
object SimJoinAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse(graft.Env.Cpus, "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    def consume(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(reps: Int)(build: => org.apache.spark.sql.DataFrame): Double =
      (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try { consume(build); (System.nanoTime() - t0) / 1e9 }
        finally graft.Caches.releaseAll()
      }.min
    def declared = graft.plans.SimilarityJoin.of(docs, n = 3, threshold = 0.7)

    // warmup: parquet footers + codegen, charged to neither route
    docs.write.format("noop").mode("overwrite").save()

    val tExact = timed(reps)(declared) // flag unset -> exact route
    spark.conf.set("spark.graft.simJoinRewrite.enabled", "true")
    spark.conf.set("spark.graft.simJoinRewrite.maxBruteForceBytes", "1")
    val tLsh = timed(reps)(declared)

    // pair sets for recall (bounded: near-dup pairs at t=0.7, not the corpus)
    spark.conf.set("spark.graft.simJoinRewrite.enabled", "false")
    val exactPairs = graft.Caches.cached(
      declared.select("a_id", "b_id"))
    val nExact = exactPairs.count()
    spark.conf.set("spark.graft.simJoinRewrite.enabled", "true")
    val lshPairs = graft.Caches.cached(
      declared.select("a_id", "b_id"))
    val nLsh = lshPairs.count()
    val nBoth = lshPairs.join(exactPairs, Seq("a_id", "b_id"), "left_semi").count()
    graft.Caches.releaseAll()
    // empty reference sets yield vacuous 1.0, never NaN (NaN is not JSON)
    def ratio(num: Long, den: Long): Double = if (den == 0) 1.0 else num.toDouble / den
    println(
      s"""{"sf":"$sfDir","exact_sec":$tExact,"lsh_sec":$tLsh,""" +
        s""""exact_pairs":$nExact,"lsh_pairs":$nLsh,"lsh_recall":${ratio(nBoth, nExact)},""" +
        s""""lsh_precision":${ratio(nBoth, nLsh)}}""")
    spark.stop()
  }
}
