package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Loaders for the driver-generated synthetic tables (TESTDATA.md,
  * FIXTURES.md §B). One parquet file per table under the sf dir.
  *
  * Scans stay plain `spark.read.parquet` so Catalyst's vectorized parquet
  * reader, predicate pushdown and column pruning all apply; callers
  * `select` only what they need so `ReadSchema` stays narrow.
  */
object Tables {
  def region(s: SparkSession, dir: String): DataFrame    = load(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame    = load(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame  = load(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame  = load(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame      = load(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame    = load(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame  = load(s, dir, "lineitem")
  /** events.parquet stores TIMESTAMP(NANOS) which Spark's vectorized
    * reader rejects; read nanos as long and truncate to micros — exactly
    * what DuckDB does on the same file, keeping oracle parity. */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, dir, "events")
      .withColumn("ts", expr("timestamp_micros(CAST(ts DIV 1000 AS LONG))"))
  }
  def documents(s: SparkSession, dir: String): DataFrame = load(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = load(s, dir, "embeddings")

  private def load(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Spread a small-file scan across all cores. A single parquet file
    * arrives as ONE partition; any CPU-heavy operator downstream (HOF
    * pipelines, per-row hashing) would serialize on one core. At real
    * scale inputs are many-filed and this becomes a no-op-ish shuffle
    * of pointers; locally it is the difference between 1 and 32 cores. */
  def fanOut(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
}
