package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-skipping store: range-clustered parquet + a per-file min/max
  * MANIFEST — the data-skipping layer transactional table formats keep
  * in their log, built here over plain parquet (the reference's
  * latest-snapshot partition pruning generalized from "pick the newest
  * file" to "pick the files whose [min,max] intersects the predicate",
  * `update_ticker_info.py:47-54`).
  *
  * Why not partitionBy(key): a high-cardinality numeric key would
  * explode into one directory per value; range-clustering keeps file
  * count = nBuckets and lets ANY range predicate skip whole files.
  *
  * Scale shape: the write is one repartitionByRange exchange (the same
  * shuffle a sorted write pays anyway); the manifest is nBuckets rows —
  * reading it is a driver-side metadata lookup, exactly like a Delta
  * log replay, and the data scan then opens ONLY intersecting files.
  * At 100 TB the skipped cost is the whole point: a day's range over a
  * year of data opens ~1/365 of the files.
  */
object StatsStore {

  /** Write `df` range-clustered by `keyCol` into `nBuckets` files and
    * build the per-file min/max manifest (one extra metadata-cheap
    * aggregate over the written files — the price of not having a
    * transaction log to record stats at commit time). */
  def writeRangeStore(df: DataFrame, dir: String, keyCol: String, nBuckets: Int): Unit = {
    df.repartitionByRange(nBuckets, col(keyCol))
      .sortWithinPartitions(keyCol)
      .write.mode("overwrite").parquet(s"$dir/data")
    val spark = df.sparkSession
    spark.read.parquet(s"$dir/data")
      .groupBy(col("_metadata.file_path").as("file"))
      .agg(min(col(keyCol)).as("min_key"), max(col(keyCol)).as("max_key"),
        count(lit(1)).as("n_rows"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/manifest")
  }

  /** Files whose [min,max] intersects [lo,hi] — the skip decision,
    * exposed for specs. Bounded driver action: nBuckets rows. */
  def prunedFiles(spark: SparkSession, dir: String, lo: Long, hi: Long): Seq[String] =
    spark.read.parquet(s"$dir/manifest")
      .filter(col("max_key") >= lo && col("min_key") <= hi)
      .select("file").collect().map(_.getString(0)).toSeq

  /** Range read through the manifest: open ONLY intersecting files,
    * then apply the residual predicate (file-level skipping is coarse;
    * the filter stays for row-level exactness and parquet row-group
    * pushdown inside the opened files). An empty prune returns an
    * empty frame with the store's schema. */
  def readRange(spark: SparkSession, dir: String, keyCol: String, lo: Long, hi: Long): DataFrame = {
    val files = prunedFiles(spark, dir, lo, hi)
    val base = spark.read.parquet(s"$dir/data")
    if (files.isEmpty) base.limit(0)
    else spark.read.parquet(files: _*)
      .filter(col(keyCol) >= lo && col(keyCol) <= hi)
  }

  val queries: Map[String, graft.Q] = Map(
    // Range query SERVED THROUGH the file-skipping store: build the
    // store from events (range-clustered by user_id, 16 files), read
    // the middle user-id quintile via the manifest, aggregate. The
    // band is SF-relative ([2/5·max, 3/5·max], integer division —
    // bit-stable on both engines); the oracle runs the same range
    // directly over events — values hash-match because skipping only
    // changes WHICH FILES OPEN, never the result (SourcesSpec pins
    // that the prune actually skips files and that pruned == unpruned
    // row-for-row). The max(user_id) lookup is a 1-value bounded
    // driver action.
    "q106_stats_pruned_scan" -> ((s, dir) => {
      val store = s"${System.getProperty("java.io.tmpdir")}/graft_rstore_${dir.hashCode & Int.MaxValue}"
      val ev = graft.Tables.events(s, dir)
        .select("event_id", "user_id", "event_type", "value")
      writeRangeStore(ev, store, "user_id", nBuckets = 16)
      val maxU = ev.agg(max(col("user_id"))).head.getLong(0)
      readRange(s, store, "user_id", lo = maxU * 2 / 5, hi = maxU * 3 / 5)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          graft.functions.Exact.dsumd(col("value")).as("total_value"))
        .orderBy("event_type")
    })
  )

  val oracles: Map[String, String] = Map(
    "q106_stats_pruned_scan" ->
      """SELECT event_type, COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
         FROM events
         WHERE user_id BETWEEN (SELECT MAX(user_id) * 2 // 5 FROM events)
                           AND (SELECT MAX(user_id) * 3 // 5 FROM events)
         GROUP BY event_type ORDER BY event_type"""
  )
}
