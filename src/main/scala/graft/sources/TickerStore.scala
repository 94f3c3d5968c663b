package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Snapshot storage layer (SURVEY.md §2.1 S8-S12, §1.3): CSV and JSON
  * compat flavors of the ticker snapshot plus the canonical
  * date-partitioned parquet layout with latest-snapshot resolution.
  *
  * The reference's CSV sink declares 3 columns but feeds 4-field rows,
  * so the enriched snapshot never actually persists (the url-drop
  * defect, scrape_tickers.py:505-513, SURVEY.md §1.3) — here the
  * 3-column projection is EXPLICIT, realizing the intent and fixing the
  * defect. Snapshot versioning replaces filename mangling
  * (tickers_YYYYMMDD[_updated].json) with a `sync_date` partition
  * column, so "latest" is partition pruning, not an mtime glob
  * (update_ticker_info.py:38-60).
  */
object TickerStore {

  val tickerSchema: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("name", StringType), StructField("sector", StringType),
    StructField("url", StringType)))

  val csvSchema: StructType = StructType(tickerSchema.fields.take(3))

  /** S9 (defect fixed): 3-col CSV snapshot via explicit projection. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.select("symbol", "name", "sector")
      .write.option("header", "true").mode(SaveMode.Overwrite).csv(path)

  /** S8: header CSV scan with pinned schema. */
  def readCsv(s: SparkSession, path: String): DataFrame =
    s.read.option("header", "true").schema(csvSchema).csv(path)

  /** S11: JSON snapshot (all 4 fields, like the reference's JSON sinks). */
  def writeJson(df: DataFrame, path: String): Unit =
    df.select("symbol", "name", "sector", "url")
      .write.mode(SaveMode.Overwrite).json(path)

  /** S10: JSON scan with pinned schema. */
  def readJson(s: SparkSession, path: String): DataFrame =
    s.read.schema(tickerSchema).json(path)

  /** Canonical store: parquet partitioned by sync_date (+ kind, keeping
    * the reference's raw-vs-updated distinction queryable). */
  def writeSnapshot(df: DataFrame, root: String, syncDate: String, kind: String): Unit =
    df.select("symbol", "name", "sector", "url")
      .withColumn("sync_date", lit(syncDate))
      .withColumn("kind", lit(kind))
      .write.partitionBy("sync_date", "kind").mode(SaveMode.Append).parquet(root)

  /** Same-day IDEMPOTENT snapshot write — the reference's sync
    * OVERWRITES tickers_YYYYMMDD.json when re-run the same day
    * (scrape_tickers.py's dated filename), so a re-run must replace
    * that day's partition, never append duplicates into it. Spelled as
    * a dynamic partition overwrite: only the (sync_date, kind)
    * partitions present in `df`'s write are rewritten; history stays.
    * [[graft.Main]]'s sync/update stages use this; the plain
    * [[writeSnapshot]] append remains for distinct-date bulk loads. */
  def writeSnapshotIdempotent(df: DataFrame, root: String, syncDate: String, kind: String): Unit = {
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try df.select("symbol", "name", "sector", "url")
      .withColumn("sync_date", lit(syncDate))
      .withColumn("kind", lit(kind))
      .write.partitionBy("sync_date", "kind").mode(SaveMode.Overwrite).parquet(root)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** P5: delisted-ticker archive — rows leaving the universe move to an
    * append-only archive partitioned by delist date (filter + write;
    * README.md:166-172's "archive delisted tickers"). */
  def archiveDelisted(snapshot: DataFrame, delisted: DataFrame,
                      archiveRoot: String, delistDate: String): Unit =
    snapshot.join(delisted.select("symbol"), Seq("symbol"), "left_semi")
      .withColumn("delist_date", lit(delistDate))
      .write.partitionBy("delist_date").mode(SaveMode.Append).parquet(archiveRoot)

  /** S12: latest-snapshot resolution — max partition of EITHER kind
    * (mirroring the reference's glob matching both raw and _updated
    * files), via partition pruning instead of file mtimes. When BOTH
    * kinds exist for the latest date (the reference's normal daily
    * flow: raw sync then enrichment), only the "updated" rows are
    * returned — the reference's mtime max picks the later _updated
    * file; returning both would duplicate every symbol with stale raw
    * values interleaved. */
  def readLatestSnapshot(s: SparkSession, root: String): DataFrame = {
    val all = s.read.parquet(root)
    // partition values are type-inferred on read (yyyymmdd → int);
    // compare as string so the layout owns the format, not the reader
    val latestRow = all.groupBy()
      .agg(max(col("sync_date").cast("string")).as("d")).head
    val latest = latestRow.getString(0)
    val onDate = all.filter(col("sync_date").cast("string") === latest)
    val kinds = onDate.select(col("kind").cast("string")).distinct()
      .collect().map(_.getString(0)) // bounded: ≤ 2 partition values
    val preferred =
      if (kinds.length > 1 && kinds.contains("updated"))
        onDate.filter(col("kind").cast("string") === "updated")
      else onDate
    preferred.drop("sync_date", "kind")
  }
}
