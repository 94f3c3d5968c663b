package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import graft.functions.Exact._

/** Time-series / OHLC capability family (SURVEY.md §2.1 P1-P5, S19, S21):
  * calendar generation (utils.py:116-150), gap detection (README.md:64),
  * incremental daily append with dedup (README.md:66-71, main.py:83-88),
  * daily OHLC bars from tick events, window analytics (moving averages,
  * returns — README.md:13-17), and an as-of join (engine extension).
  *
  * Scale notes: the calendar is generated, never materialized beyond a
  * few-KB array per row group; gap detection joins a broadcastable
  * (keys × days) grid against the fact table's distinct (key, day)
  * pairs; incremental append is an anti-join on the natural key — the
  * canonical "append only what's new" pattern that replaces the
  * reference's per-file max(date) loop; all window analytics partition
  * by series key so they scale horizontally with key cardinality.
  */
object TimeSeries {

  /** S19: inclusive daily calendar [start..end] as a single-column DF. */
  def calendar(s: SparkSession, start: String, end: String): DataFrame =
    s.range(1).select(explode(sequence(
      to_date(lit(start)), to_date(lit(end)), expr("interval 1 day"))).as("day"))

  /** S19 string mode (utils.py:116-150 `as_string=True`/`fmt` parity):
    * the same inclusive calendar with days rendered through a Spark
    * datetime pattern (the engine-native spelling of strftime fmt). */
  def calendar(s: SparkSession, start: String, end: String, fmt: String): DataFrame =
    calendar(s, start, end).select(date_format(col("day"), fmt).as("day"))

  /** Daily OHLC bars from raw ticks: deterministic open/close via
    * (ts, id) ordering — min_by/max_by on the (ts, id) struct, so value
    * ties cannot flip bars. One hash aggregate with map-side partials
    * (same shape as Streaming.dailyBars): no window sort, no dedup
    * shuffle — the scale-correct plan for tick → bar compaction. */
  def ohlcDaily(ticks: DataFrame, key: String, ts: String, value: String, id: String): DataFrame =
    ticks
      .withColumn("day", to_date(col(ts)))
      .groupBy(col(key), col("day"))
      .agg(
        min_by(col(value), struct(col(ts), col(id))).as("open"),
        max(col(value)).as("high"),
        min(col(value)).as("low"),
        max_by(col(value), struct(col(ts), col(id))).as("close"),
        count(lit(1)).as("volume"))

  private def dailyClose(s: SparkSession, dir: String): DataFrame =
    ohlcDaily(Tables.events(s, dir), "event_type", "ts", "value", "event_id")

  /** Daily bars for other modules (Analytics split-adjustment). */
  def queriesDailyClose(s: SparkSession, dir: String): DataFrame = dailyClose(s, dir)

  val queries: Map[String, Q] = Map(
    // S19: calendar generation, rolled up to month lengths.
    "q16_calendar" -> ((s, dir) => {
      calendar(s, "1995-01-01", "1996-12-31")
        .groupBy(year(col("day")).as("y"), month(col("day")).as("m"))
        .agg(count(lit(1)).as("n_days"),
             min(col("day")).as("first_day"), max(col("day")).as("last_day"))
        .orderBy("y", "m")
    }),

    // P4: per-supplier shipping-gap detection over a fixed window.
    "q17_gap_detect" -> ((s, dir) => {
      val days = calendar(s, "1996-01-01", "1996-02-29")
      val sup = Tables.supplier(s, dir).select("s_suppkey")
      val grid = sup.crossJoin(broadcast(days))
      // filter to the grid's window BEFORE the distinct: rows outside
      // it can never match the anti-join key, and without the filter
      // the distinct shuffles the whole fact table (the filter reaches
      // the parquet scan as a min/max-prunable predicate)
      val shipped = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") <= lit("1996-02-29"))
        .select(col("l_suppkey").as("s_suppkey"), to_date(col("l_shipdate")).as("day"))
        .distinct()
      grid.join(shipped, Seq("s_suppkey", "day"), "left_anti")
        .groupBy("s_suppkey")
        .agg(count(lit(1)).as("n_missing"), min("day").as("first_gap"), max("day").as("last_gap"))
        .orderBy("s_suppkey")
    }),

    // P2: incremental append — store ∪ (landing ∖ store) on the natural
    // key, then a per-day rollup proving no duplicates and no losses.
    "q18_incremental_append" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select("event_id", "ts", "value")
      val stored = ev.filter(col("ts") < lit("2024-01-20 00:00:00").cast("timestamp"))
      val landing = ev.filter(col("ts") >= lit("2024-01-15 00:00:00").cast("timestamp"))
      val fresh = landing.join(stored.select("event_id"), Seq("event_id"), "left_anti")
      stored.unionByName(fresh)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_events"), dsumd(col("value")).as("sum_value"))
        .orderBy("day")
    }),

    // P1/S21: daily OHLC bars per event_type from tick events.
    "q19_ohlc_daily" -> ((s, dir) =>
      dailyClose(s, dir).orderBy("event_type", "day")),

    // Window analytics: 7-day moving average of daily close (exact).
    "q20_moving_avg" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(-6, Window.currentRow)
      dailyClose(s, dir)
        .select(col("event_type"), col("day"), col("close"),
          (sum(dec(col("close"))).over(w).cast(DoubleType) /
            count(lit(1)).over(w)).as("ma7"))
        .orderBy("event_type", "day")
    }),

    // Window analytics: daily return via lag.
    "q21_returns" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      dailyClose(s, dir)
        .select(col("event_type"), col("day"), col("close"),
          (col("close") / lag(col("close"), 1).over(w) - 1.0).as("ret"))
        .orderBy("event_type", "day")
    }),

    // P4-adjacent backfill: calendar resample + fill-forward (last
    // observation carried forward) — the README's missing-data
    // treatment for daily bars. Sparse bars (value > 200 keeps ~10% of
    // (type, day) cells at small SF) left-joined onto the full
    // type × calendar grid; one window pass fills gaps; days before the
    // first observation surface 0.0 (NULL doubles can't cross the
    // driver's canonicalization). One broadcast grid + one window
    // shuffle on the series key.
    "q59_fill_forward" -> ((s, dir) => {
      val bars = ohlcDaily(Tables.events(s, dir).filter(col("value") > 200),
          "event_type", "ts", "value", "event_id")
        .select(col("event_type"), col("day"), col("close"))
      val types = Tables.events(s, dir).select("event_type").distinct()
      val days = calendar(s, "2024-01-01", "2024-01-30")
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      types.crossJoin(broadcast(days))
        .join(bars, Seq("event_type", "day"), "left")
        .select(col("event_type"), col("day"),
          col("close").isNull.cast("int").as("filled"),
          coalesce(last(col("close"), ignoreNulls = true).over(w), lit(0.0)).as("close_ff"))
        .orderBy("event_type", "day")
    }),

    // Batch sessionization — the batch twin of Streaming.sessionize and
    // the classic lag/cumsum formulation: a session breaks where the
    // event-time gap to the previous event exceeds 30 min; session_id is
    // the running count of breaks; one window shuffle on user_id then a
    // P1 extension: weekly OHLC resample — coarser-grain bars from the
    // daily frame (ISO Monday weeks on both engines). min_by/max_by
    // pick open/close by day inside one hash aggregate — no window
    // pass, no second shuffle beyond the grain change; high/low/volume
    // are plain min/max/sum so every output is exact.
    "q71_weekly_bars" -> ((s, dir) => {
      dailyClose(s, dir)
        .groupBy(col("event_type"),
          date_trunc("week", col("day")).cast("date").as("week"))
        .agg(min_by(col("open"), col("day")).as("open"),
          max(col("high")).as("high"), min(col("low")).as("low"),
          max_by(col("close"), col("day")).as("close"),
          sum(col("volume")).as("volume"),
          count(lit(1)).as("n_days"))
        .orderBy("event_type", "week")
    }),

    // hash aggregate. TimeSeriesSpec cross-checks this against Spark's
    // built-in session_window aggregate on the same data.
    "q61_batch_sessionize" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .withColumn("gap_ms",
          unix_millis(col("ts")) - unix_millis(lag(col("ts"), 1).over(byUser)))
        .withColumn("new_sess",
          (col("gap_ms").isNull || col("gap_ms") > lit(30 * 60 * 1000L)).cast("int"))
        .withColumn("session_id", sum(col("new_sess")).over(run))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          dsumd(col("value")).as("total_value"))
        .orderBy("user_id", "session_id")
    }),

    // Engine extension: as-of join — for each purchase, the most recent
    // view at-or-before it by the same user (union + last ignore-nulls:
    // one shuffle on user, no range cross product).
    "q22_asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("ts"), col("user_id"), col("value"), lit(1).as("is_p"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id"), col("ts"), col("user_id"), col("value"), lit(0).as("is_p"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("is_p"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      purchases.unionByName(views)
        .withColumn("asof_view_id",
          last(when(col("is_p") === 0, col("event_id")), ignoreNulls = true).over(w))
        .withColumn("asof_view_value",
          last(when(col("is_p") === 0, col("value")), ignoreNulls = true).over(w))
        .filter(col("is_p") === 1)
        .select(col("event_id"), col("user_id"), col("ts"), col("value"),
          col("asof_view_id"), col("asof_view_value"))
        .orderBy("event_id")
    }),

    // The FULL as-of surface (pandas merge_asof's direction ×
    // tolerance matrix; q22 is the backward default): per purchase,
    // the nearest view BACKWARD and FORWARD within a 30-minute
    // tolerance, and the NEAREST of the two (ties → backward). Both
    // directions ride the q22 union trick — one window pass each over
    // the interleaved stream, so the whole matrix costs two exchanges
    // on user_id and never a range join. Tie discipline at equal ts
    // is explicit in the sort keys: views sort BEFORE purchases in
    // the backward pass (a same-instant view is visible) and AFTER
    // them in the forward pass (still visible forward) — the
    // inclusive ts <= / >= contract on both sides.
    "q129_asof_directions" -> ((s, dir) => {
      val tolMs = 30 * 60 * 1000L
      val ev = Tables.events(s, dir)
        .filter(col("event_type").isin("purchase", "view"))
        .select(col("event_id"), col("ts"), col("user_id"),
          (col("event_type") === "purchase").cast("int").as("is_p"))
      val wB = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("is_p"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wF = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("is_p").desc, col("event_id"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      def viewOnly(c: Column): Column = when(col("is_p") === 0, c)
      ev
        .withColumn("bwd_id0", last(viewOnly(col("event_id")), ignoreNulls = true).over(wB))
        .withColumn("bwd_ms", last(viewOnly(unix_millis(col("ts"))), ignoreNulls = true).over(wB))
        .withColumn("fwd_id0", first(viewOnly(col("event_id")), ignoreNulls = true).over(wF))
        .withColumn("fwd_ms", first(viewOnly(unix_millis(col("ts"))), ignoreNulls = true).over(wF))
        .filter(col("is_p") === 1)
        .withColumn("p_ms", unix_millis(col("ts")))
        .withColumn("bwd_delta", col("p_ms") - col("bwd_ms"))
        .withColumn("fwd_delta", col("fwd_ms") - col("p_ms"))
        .withColumn("bwd_id",
          when(col("bwd_delta") <= tolMs, col("bwd_id0")))
        .withColumn("fwd_id",
          when(col("fwd_delta") <= tolMs, col("fwd_id0")))
        .withColumn("nearest_id",
          when(col("bwd_id").isNotNull &&
              (col("fwd_id").isNull || col("bwd_delta") <= col("fwd_delta")),
            col("bwd_id")).otherwise(col("fwd_id")))
        .withColumn("nearest_delta_ms",
          when(col("nearest_id") === col("bwd_id"), col("bwd_delta"))
            .when(col("nearest_id") === col("fwd_id"), col("fwd_delta")))
        .select(col("event_id"), col("user_id"),
          col("bwd_id"), col("fwd_id"), col("nearest_id"),
          col("nearest_delta_ms"))
        .orderBy("event_id")
    }),

    // Exponential moving averages + MACD per series — the LINEAR
    // RECURRENCE family (ema_t = (1-α)·ema_{t-1} + α·x_t) that window
    // functions cannot express. Spelled as a LEFT FOLD over the
    // day-sorted close list (seed = first close), which is the SAME
    // IEEE operation sequence DuckDB's list_reduce performs — so a
    // floating-point recurrence hash-matches exactly, with dyadic
    // α (1/8, 1/32) keeping every coefficient representable. Scale
    // shape: the recurrence is sequential ONLY within a series, whose
    // length is bounded by the trading calendar (~250 rows/year —
    // thousands, not billions, at ANY corpus size); the symbol axis is
    // the scale axis and it parallelizes perfectly (one groupBy). The
    // collect_list is bounded by the same calendar — this is the
    // honest distributed shape for per-symbol recurrences, not a
    // limitation.
    "q196_ema_macd" -> ((s, dir) => {
      val ser = dailyClose(s, dir)
        .groupBy("event_type")
        .agg(array_sort(collect_list(struct(col("day"), col("close")))).as("xs"))
      def ema(alpha: Double): Column = aggregate(
        expr("slice(xs, 2, greatest(size(xs) - 1, 0))"),
        element_at(col("xs"), 1).getField("close"),
        (acc, x) => acc * lit(1.0 - alpha) + x.getField("close") * lit(alpha))
      ser.select(col("event_type"), size(col("xs")).cast("long").as("n_days"),
          ema(0.125).as("ema_fast"), ema(0.03125).as("ema_slow"))
        .withColumn("macd", col("ema_fast") - col("ema_slow"))
        .orderBy("event_type")
    }),

    // The PER-DAY EMA series at unbounded series length — q196's fold
    // caps out when a series no longer fits one task (tick-level or
    // century-deep series); this is the same recurrence routed through
    // [[Prefix.affineScanExc]], the distributed affine scan (every
    // task ≤ span rows at ANY series length, recursion depth
    // log_span(days)). The first row seeds with (a=0, b=close);
    // every later day contributes (a=0.875, b=0.125·close); the
    // inclusive value is one local step a·B_exc + b. span=8 is
    // deliberately ≪ the production default so the tested corpus
    // (30-day series) actually exercises the multi-block carry path —
    // the default would degenerate to the single-task fold here.
    "q198_ema_scan" -> ((s, dir) => {
      // cached: bars feed BOTH the per-series min-day aggregate and the
      // map construction join — uncached, the OHLC aggregate runs twice
      val bars = graft.Caches.cached(dailyClose(s, dir).select(col("event_type"),
        datediff(col("day"), lit("1970-01-01").cast("date")).cast("long").as("d"),
        col("close")))
      val firsts = bars.groupBy("event_type").agg(min(col("d")).as("d0"))
      // REBASE the order key to corpus-relative days: Prefix recursion
      // depth is log_span(maxKey), so raw epoch-day keys (~19.7k) cost
      // 4 wasted carry levels for a 30-day corpus; after rebasing the
      // domain is the actual calendar span (1-value bounded driver
      // action on the per-series aggregate, the q183 discipline)
      // empty-corpus guard: min over an empty aggregate is NULL, and
      // getLong would NPE — 0 keeps the rebase a no-op so the operator's
      // own empty-input contract (schema-preserving empty frame) holds
      val d0gRow = firsts.agg(min(col("d0"))).head
      val d0g = if (d0gRow.isNullAt(0)) 0L else d0gRow.getLong(0)
      val maps = bars.join(broadcast(firsts), "event_type")
        .select(col("event_type"), (col("d") - d0g).as("d"),
          when(col("d") === col("d0"), lit(0.0)).otherwise(lit(0.875)).as("a"),
          when(col("d") === col("d0"), col("close"))
            .otherwise(col("close") * lit(0.125)).as("b"))
      Prefix.affineScanExc(maps, Seq("event_type"), "d", "a", "b",
          "a_exc", "b_exc", span = 8)
        .select(col("event_type"),
          date_add(lit("1970-01-01").cast("date"), (col("d") + d0g).cast("int"))
            .as("day"),
          (col("a") * col("b_exc") + col("b")).as("ema"))
        .orderBy("event_type", "day")
    }),

    // Wilder RSI per series — the two-recurrence indicator: day-over-day
    // gains and losses each ride their own smoothed average (Wilder
    // smoothing IS the q196 recurrence with dyadic α = 1/16, seeded
    // with the first sample), then one deterministic ratio. The lag
    // runs in a per-series window (calendar-bounded partitions); the
    // folds are the q196 left-fold spelling, so both averages — and
    // therefore the RSI ratio — hash-match DuckDB exactly. The
    // avg_loss = 0 degenerate (monotone series) pins RSI to 100 on
    // both engines rather than dividing by zero.
    "q199_rsi" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val moves = dailyClose(s, dir)
        .withColumn("prev", lag(col("close"), 1).over(w))
        .filter(col("prev").isNotNull)
        .select(col("event_type"), col("day"),
          greatest(col("close") - col("prev"), lit(0.0)).as("gain"),
          greatest(col("prev") - col("close"), lit(0.0)).as("loss"))
      val ser = moves.groupBy("event_type")
        .agg(array_sort(collect_list(struct(col("day"), col("gain"), col("loss"))))
          .as("xs"))
      def wilder(field: String): Column = aggregate(
        expr("slice(xs, 2, greatest(size(xs) - 1, 0))"),
        element_at(col("xs"), 1).getField(field),
        (acc, x) => acc * lit(0.9375) + x.getField(field) * lit(0.0625))
      ser.select(col("event_type"), size(col("xs")).cast("long").as("n_moves"),
          wilder("gain").as("avg_gain"), wilder("loss").as("avg_loss"))
        .withColumn("rsi",
          when(col("avg_loss") === 0.0, lit(100.0))
            .otherwise(lit(100.0) - lit(100.0) /
              (lit(1.0) + col("avg_gain") / col("avg_loss"))))
        .orderBy("event_type")
    }),

    // Calendar-aware trailing mean: a RANGE frame over EPOCH DAYS
    // (7 calendar days inclusive), not a ROWS frame — on a series with
    // holes the two differ, and the weekday filter guarantees holes.
    // Spark needs the numeric order key (rangeBetween is value-based);
    // the sum is exact-decimal so the mean hash-matches. Per-series
    // window partitions — calendar-bounded, horizontally scalable.
    "q201_range_frame_mean" -> ((s, dir) => {
      val bars = dailyClose(s, dir)
        .filter(dayofweek(col("day")).between(2, 6)) // weekdays: real gaps
        .withColumn("d", datediff(col("day"), lit("1970-01-01").cast("date"))
          .cast("long"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
        .rangeBetween(-6, 0)
      bars.select(col("event_type"), col("day"), col("close"),
          (dsumOverD(col("close"), w) / count(lit(1)).over(w)).as("mean7d"),
          count(lit(1)).over(w).as("n_in_window"))
        .orderBy("event_type", "day")
    }),

    // ROLLING MEDIAN — an ORDER STATISTIC in a moving frame, which no
    // built-in window aggregate computes exactly (percentile_approx is
    // a sketch; there is no exact windowed median). Spelled as
    // collect-the-frame → sort → index: legal ONLY because the frame
    // is a small constant (7 rows) — the per-row array is bounded by
    // the frame, not the series, so the plan is one partitioned window
    // pass with O(frame·log frame) per row. Lower-median indexing
    // ((n+1) DIV 2) keeps the value an ACTUAL series element — picking
    // an element is exact, so the query hash-matches despite being a
    // double-valued order statistic. The robust twin of q20's moving
    // mean (one outlier day moves the mean, not the median).
    "q210_rolling_median" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(-6, 0)
      dailyClose(s, dir)
        .select(col("event_type"), col("day"), col("close"))
        .withColumn("xs", sort_array(collect_list(col("close")).over(w)))
        .select(col("event_type"), col("day"), col("close"),
          element_at(col("xs"), expr("(size(xs) + 1) DIV 2").cast("int"))
            .as("med7"),
          size(col("xs")).cast("long").as("n_in_window"))
        .orderBy("event_type", "day")
    }),

    // PER-SERIES OLS TREND FIT (least-squares slope/intercept per
    // (event_type, cohort) daily-revenue series) — the model-fit
    // operator a feature pipeline runs per key: is this series rising
    // or falling, and how fast? Everything that crosses an aggregation
    // is an EXACT INTEGER: x is the day index from the series' own
    // first day (window min — bounded by calendar), y is the daily
    // DECIMAL revenue scaled to 1e4 granules (exact), and the five
    // sufficient statistics (n, Σx, Σy, Σxy, Σx²) are long sums — so
    // the closed-form numerators/denominators (n·Σxy − Σx·Σy,
    // n·Σx² − (Σx)²) are exact BIGINTs on both engines, and the one
    // double division per output row is bit-identical IEEE. Scale
    // shape: one (key, day) reduce, one exchange on key for the
    // first-day window (rows/key ≤ calendar), one key-grain aggregate
    // — the same shape as q202; no joins, no corpus-grain window. The
    // sufficient-statistic form is WHY this scales: the model is a
    // mergeable aggregate, not a per-row optimizer loop (and q217
    // maintains the same statistics incrementally).
    "q216_trend_fit" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), (col("user_id") % 10).as("cohort"),
          to_date(col("ts")).as("day"))
        .agg((dsum(col("value")) * 10000).cast("long").as("y"))
      val wK = Window.partitionBy(col("event_type"), col("cohort"))
      val pts = daily
        .withColumn("x", datediff(col("day"), min(col("day")).over(wK)).cast("long"))
      pts.groupBy("event_type", "cohort")
        .agg(count(lit(1)).as("n_days"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .select(col("event_type"), col("cohort"), col("n_days"),
          (col("n_days") * col("sxy") - col("sx") * col("sy")).as("slope_num"),
          (col("n_days") * col("sxx") - col("sx") * col("sx")).as("slope_den"),
          ((col("n_days") * col("sxy") - col("sx") * col("sy")).cast("double") /
            // zero-variance guard (the q239/q221 cross-engine edge): a
            // one-day cohort has slope_den = 0 — explicitly NULL in
            // both spellings (NULLIF in the oracle)
            when(col("n_days") * col("sxx") - col("sx") * col("sx") =!= 0,
              (col("n_days") * col("sxx") - col("sx") * col("sx")).cast("double")) / 1e4)
            .as("slope_per_day"))
        .orderBy("event_type", "cohort")
    }),

    // INCREMENTAL TREND MAINTENANCE — the model-fit member of the
    // incremental family (q93 stats / q150 postings / q103 IVF /
    // q205 histograms): the persisted state is the DAY-GRAIN revenue
    // MV (key, day, y); tonight's batch reduces to day grain and
    // MERGES by (key, day) — y is additive, so same-day late rows
    // fold in exactly — and the model refit is a key-grain aggregate
    // over ≤ calendar rows per key. x anchors at the 1970 epoch:
    // the OLS numerator/denominator (n·Σxy − Σx·Σy, n·Σx² − (Σx)²)
    // are SHIFT-INVARIANT algebraic identities, exact in integers, so
    // slope_num/slope_den equal q216's per-series-anchored values —
    // a free cross-query consistency pin the gate hashes. The batch
    // split is event_id % 5 (day ranges OVERLAP, so the merge path is
    // actually exercised, not just appended). Incremental == full
    // recompute is proven by the correctness gate itself: the oracle
    // computes from ALL events while the engine serves from
    // base-then-merged state. Scale: nightly cost is batch reduce +
    // MV-sized merge; no corpus re-read.
    "q217_trend_maintenance" -> ((s, dir) => {
      def dailyOf(ev: DataFrame): DataFrame = ev
        .groupBy(col("event_type"), (col("user_id") % 10).as("cohort"),
          to_date(col("ts")).as("day"))
        .agg((dsum(col("value")) * 10000).cast("long").as("y"))
      val d = graft.Scratch.dirFor("trend", dir)
      graft.Scratch.ensure(d) {
        val ev = Tables.events(s, dir)
        // base state from 4/5 of events, then tonight's 1/5 merged in
        dailyOf(ev.filter(col("event_id") % 5 =!= 0))
          .write.mode("overwrite").parquet(s"$d/state_base")
        s.read.parquet(s"$d/state_base")
          .unionByName(dailyOf(ev.filter(col("event_id") % 5 === 0)))
          .groupBy("event_type", "cohort", "day")
          .agg(sum(col("y")).as("y"))
          .write.mode("overwrite").parquet(s"$d/state")
      }
      val pts = s.read.parquet(s"$d/state")
        .withColumn("x",
          datediff(col("day"), lit("1970-01-01").cast("date")).cast("long"))
      pts.groupBy("event_type", "cohort")
        .agg(count(lit(1)).as("n_days"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .select(col("event_type"), col("cohort"), col("n_days"),
          (col("n_days") * col("sxy") - col("sx") * col("sy")).as("slope_num"),
          (col("n_days") * col("sxx") - col("sx") * col("sx")).as("slope_den"),
          ((col("n_days") * col("sxy") - col("sx") * col("sy")).cast("double") /
            // zero-variance guard (the q239/q221 cross-engine edge): a
            // one-day cohort has slope_den = 0 — explicitly NULL in
            // both spellings (NULLIF in the oracle)
            when(col("n_days") * col("sxx") - col("sx") * col("sx") =!= 0,
              (col("n_days") * col("sxx") - col("sx") * col("sx")).cast("double")) / 1e4)
            .as("slope_per_day"))
        .orderBy("event_type", "cohort")
    }),

    // CUSUM CHANGEPOINT — where did this series' level shift? The
    // classic cumulative-sum statistic S_k = Σ_{i≤k}(y_i − ȳ) peaks at
    // the changepoint; multiplying through by n clears the mean's
    // division so EVERYTHING is an exact long: n·S_k = Σ_{i≤k}(n·y_i −
    // T) with T = Σy. The running sum is a per-series window (rows per
    // series ≤ calendar — bounded), the argmax is a WindowGroupLimit
    // rank with an earliest-day tie-break. Hash-matched tri-SF; the
    // windowed SUM(BIGINT) is CAST in the oracle (DuckDB widens window
    // sums to HUGEINT). Scale shape: one (type, day) reduce, one
    // exchange on type shared by all three windows.
    "q220_cusum_changepoint" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg((dsum(col("value")) * 10000).cast("long").as("y"))
      val wT = Window.partitionBy(col("event_type"))
      val wOrd = wT.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val c = daily
        .withColumn("n", count(lit(1)).over(wT))
        .withColumn("t", sum(col("y")).over(wT))
        .withColumn("cusum", sum(col("n") * col("y") - col("t")).over(wOrd))
      val wR = Window.partitionBy(col("event_type"))
        .orderBy(abs(col("cusum")).desc, col("day").asc)
      c.withColumn("rk", row_number().over(wR)).filter(col("rk") === 1)
        .select(col("event_type"), col("day").as("change_day"),
          col("n").as("n_days"), col("cusum").as("cusum_scaled"),
          (col("cusum").cast("double") / col("n") / lit(1e4)).as("max_dev"))
        .orderBy("event_type")
    }),

    // CROSS-SERIES CORRELATION MATRIX — Pearson correlation between
    // every pair of event types' daily-revenue series (the feature-
    // covariance pass behind factor models and redundancy pruning).
    // The q216 sufficient-statistic discipline applied to PAIRS: the
    // day equi-join aligns series, six long sums per pair, the
    // covariance numerator n·Σab − Σa·Σb is an exact BIGINT, and the
    // one sqrt+division runs on identical longs → identical doubles.
    // y uses 1e2 granules (products of two series must fit a long —
    // granule²·days·n; 1e4 would overflow past ~SF1). Scale shape:
    // the join key is day (bounded by calendar), pairs are |types|²
    // tiny; one reduce, one bounded join, one pair-grain aggregate.
    "q221_series_correlation" -> ((s, dir) => {
      val daily = graft.Caches.cached(Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg((dsum(col("value")) * 100).cast("long").as("y")))
      daily.as("a").join(daily.as("b"),
          col("a.day") === col("b.day") &&
            col("a.event_type") < col("b.event_type"))
        .select(col("a.event_type").as("type_a"),
          col("b.event_type").as("type_b"),
          col("a.y").as("ya"), col("b.y").as("yb"))
        .groupBy("type_a", "type_b")
        .agg(count(lit(1)).as("n"),
          sum(col("ya")).as("sa"), sum(col("yb")).as("sb"),
          sum(col("ya") * col("yb")).as("sab"),
          sum(col("ya") * col("ya")).as("saa"),
          sum(col("yb") * col("yb")).as("sbb"))
        // zero-variance guard: same cross-engine edge as q239 (see the
        // acf comment) — degenerate series are explicitly NULL
        .withColumn("den",
          sqrt((col("n") * col("saa") - col("sa") * col("sa")).cast("double") *
            (col("n") * col("sbb") - col("sb") * col("sb")).cast("double")))
        .select(col("type_a"), col("type_b"), col("n"),
          (col("n") * col("sab") - col("sa") * col("sb")).as("cov_num"),
          ((col("n") * col("sab") - col("sa") * col("sb")).cast("double") /
            when(col("den") > 0, col("den"))).as("pearson_r"))
        .orderBy("type_a", "type_b")
    }),

    // MAX DRAWDOWN — the risk metric the reference's OHLC plan exists
    // to feed (README.md:106-110 pandas analytics): per series, the
    // deepest peak-to-trough loss. All-integer: close in exact cents,
    // running peak = windowed MAX (per-series rows ≤ calendar —
    // bounded tasks), drawdown in basis points via (peak−close)·10⁴
    // DIV peak (floor division on non-negatives — identical in both
    // engines; close > 0 so peak > 0). The per-series argmax joins
    // back on the max with an earliest-day tie-break — two tiny
    // aggregates, no driver action.
    "q237_max_drawdown" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val dd = graft.Caches.cached(dailyClose(s, dir)
        .select(col("event_type"), col("day"),
          (dec(col("close")) * lit(100)).cast("long").as("cents"))
        // structural positivity (r10 ADVICE): DIV on a non-positive
        // peak diverges cross-engine (Spark NULLs, DuckDB // floors);
        // prices are positive by contract — enforce it in the PLAN (and
        // identically in the oracle) instead of a comment
        .filter(col("cents") > 0)
        .withColumn("peak", max(col("cents")).over(w))
        .withColumn("dd_bp",
          expr("((peak - cents) * 10000) DIV peak")))
      val worst = dd.groupBy(col("event_type").as("et"))
        .agg(max(col("dd_bp")).as("max_dd_bp"))
      dd.join(Tables.maybeBroadcast(worst),
          col("event_type") === col("et") && col("dd_bp") === col("max_dd_bp"))
        .groupBy("event_type", "max_dd_bp")
        .agg(min(col("day")).as("trough_day"))
        .select("event_type", "max_dd_bp", "trough_day")
        .orderBy("event_type")
    }),

    // ON-BALANCE VOLUME — the classic volume-flow accumulator: volume
    // signed by the close-to-close direction, running-summed per
    // series. Exact longs end to end (cents diff sign × volume); the
    // first bar contributes 0 (no prior close). The windowed
    // SUM(BIGINT) is CAST in the oracle (DuckDB widens window sums to
    // HUGEINT). Scale: one (type, day) bar reduce, one per-series
    // window — tasks bounded by series length.
    "q238_obv" -> ((s, dir) => {
      val wo = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val wr = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      dailyClose(s, dir)
        .select(col("event_type"), col("day"), col("volume"),
          (dec(col("close")) * lit(100)).cast("long").as("cents"))
        .withColumn("prev", lag(col("cents"), 1).over(wo))
        .withColumn("signed",
          when(col("prev").isNull || col("cents") === col("prev"), 0L)
            .when(col("cents") > col("prev"), col("volume"))
            .otherwise(-col("volume")))
        .withColumn("obv", sum(col("signed")).over(wr))
        .select("event_type", "day", "volume", "obv")
        .orderBy("event_type", "day")
    }),

    // RETURN AUTOCORRELATION (ACF lags 1–3) — does today's move predict
    // tomorrow's? q221's sufficient-statistic discipline applied to a
    // series and its OWN lagged self: returns are exact cent diffs,
    // each lag's (x, y) pairs come off ONE window pass (three lag
    // columns, unpivoted via explode — no self-join), and Pearson per
    // (series, lag) is six long sums + one sqrt/division on identical
    // longs. Magnitude: |ret| ≤ 5e4 cents, products ≤ 2.5e9, ×30 days
    // ≪ 2^63. Scale: one bar reduce + one per-series window + one
    // (type, lag)-grain aggregate.
    "q239_return_acf" -> ((s, dir) => {
      val wo = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val rets = dailyClose(s, dir)
        .select(col("event_type"), col("day"),
          (dec(col("close")) * lit(100)).cast("long").as("cents"))
        .withColumn("ret", col("cents") - lag(col("cents"), 1).over(wo))
        .filter(col("ret").isNotNull)
      val lagged = rets
        .withColumn("l1", lag(col("ret"), 1).over(wo))
        .withColumn("l2", lag(col("ret"), 2).over(wo))
        .withColumn("l3", lag(col("ret"), 3).over(wo))
        .select(col("event_type"), col("ret"),
          explode(array(
            struct(lit(1).as("k"), col("l1").as("y")),
            struct(lit(2).as("k"), col("l2").as("y")),
            struct(lit(3).as("k"), col("l3").as("y")))).as("p"))
        .select(col("event_type"), col("p.k").as("lag_k"),
          col("ret").as("x"), col("p.y").as("y"))
        .filter(col("y").isNotNull)
      lagged.groupBy("event_type", "lag_k")
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        // zero-variance guard (r10 ADVICE): a constant series at some
        // lag makes the denominator 0, where Spark double division
        // yields NULL but DuckDB yields inf/NaN — make the degenerate
        // case EXPLICITLY NULL in both spellings (when-without-
        // otherwise here, NULLIF in the oracle)
        .withColumn("den",
          sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
            (col("n") * col("syy") - col("sy") * col("sy")).cast("double")))
        .select(col("event_type"), col("lag_k"), col("n"),
          ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            when(col("den") > 0, col("den"))).as("acf"))
        .orderBy("event_type", "lag_k")
    }),

    // CANDLESTICK PATTERN SCAN (three white soldiers) — the bar-shape
    // sibling of q206's event-sequence patterns: three consecutive
    // bullish bars (close > open) with strictly rising closes. Pure
    // lag algebra on exact cents — no journey arrays, no regex; the
    // per-series window is calendar-bounded. Emits the completing day
    // of each match.
    "q240_candlestick_scan" -> ((s, dir) => {
      val wo = Window.partitionBy(col("event_type")).orderBy(col("day"))
      dailyClose(s, dir)
        .select(col("event_type"), col("day"),
          (dec(col("open")) * lit(100)).cast("long").as("oc"),
          (dec(col("close")) * lit(100)).cast("long").as("cc"))
        .withColumn("bull", col("cc") > col("oc"))
        .withColumn("bull1", lag(col("bull"), 1).over(wo))
        .withColumn("bull2", lag(col("bull"), 2).over(wo))
        .withColumn("cc1", lag(col("cc"), 1).over(wo))
        .withColumn("cc2", lag(col("cc"), 2).over(wo))
        .filter(col("bull") && col("bull1") && col("bull2") &&
          col("cc") > col("cc1") && col("cc1") > col("cc2"))
        .select(col("event_type"), col("day").as("pattern_day"),
          (col("cc") - col("cc2")).as("run_gain_cents"))
        .orderBy("event_type", "pattern_day")
    })
  )

  /** Shared oracle CTE: daily close bars (must mirror [[ohlcDaily]]). */
  val barsSql: String =
    """WITH bars AS (
         SELECT DISTINCT event_type, CAST(ts AS DATE) AS day,
           first_value(value) OVER (PARTITION BY event_type, CAST(ts AS DATE)
             ORDER BY ts, event_id) AS open,
           max(value) OVER (PARTITION BY event_type, CAST(ts AS DATE)) AS high,
           min(value) OVER (PARTITION BY event_type, CAST(ts AS DATE)) AS low,
           last_value(value) OVER (PARTITION BY event_type, CAST(ts AS DATE)
             ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS close,
           count(*) OVER (PARTITION BY event_type, CAST(ts AS DATE)) AS volume
         FROM events)
    """

  val oracles: Map[String, String] = Map(
    "q16_calendar" ->
      """SELECT CAST(EXTRACT(YEAR FROM day) AS INT) AS y,
                CAST(EXTRACT(MONTH FROM day) AS INT) AS m,
                COUNT(*) AS n_days, MIN(day) AS first_day, MAX(day) AS last_day
         FROM (SELECT CAST(d AS DATE) AS day
               FROM generate_series(DATE '1995-01-01', DATE '1996-12-31',
                                    INTERVAL '1 day') t(d))
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q17_gap_detect" ->
      """WITH days AS (SELECT CAST(d AS DATE) AS day
           FROM generate_series(DATE '1996-01-01', DATE '1996-02-29', INTERVAL '1 day') t(d)),
         grid AS (SELECT s_suppkey, day FROM supplier, days),
         shipped AS (SELECT DISTINCT l_suppkey AS s_suppkey, CAST(l_shipdate AS DATE) AS day
                     FROM lineitem)
         SELECT g.s_suppkey, COUNT(*) AS n_missing,
                MIN(g.day) AS first_gap, MAX(g.day) AS last_gap
         FROM grid g WHERE NOT EXISTS
           (SELECT 1 FROM shipped sh WHERE sh.s_suppkey = g.s_suppkey AND sh.day = g.day)
         GROUP BY g.s_suppkey ORDER BY g.s_suppkey""",
    "q18_incremental_append" ->
      """WITH stored AS (SELECT event_id, ts, value FROM events
                         WHERE ts < TIMESTAMP '2024-01-20 00:00:00'),
         landing AS (SELECT event_id, ts, value FROM events
                     WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'),
         fresh AS (SELECT * FROM landing
                   WHERE event_id NOT IN (SELECT event_id FROM stored)),
         appended AS (SELECT * FROM stored UNION ALL SELECT * FROM fresh)
         SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events,
                CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         FROM appended GROUP BY 1 ORDER BY 1""",
    "q19_ohlc_daily" -> (barsSql +
      """SELECT event_type, day, open, high, low, close, volume
         FROM bars ORDER BY event_type, day"""),
    "q20_moving_avg" -> (barsSql +
      """SELECT event_type, day, close,
           CAST(SUM(CAST(close AS DECIMAL(18,4))) OVER w AS DOUBLE)
             / COUNT(*) OVER w AS ma7
         FROM bars
         WINDOW w AS (PARTITION BY event_type ORDER BY day
                      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
         ORDER BY event_type, day"""),
    "q21_returns" -> (barsSql +
      """SELECT event_type, day, close,
           close / lag(close, 1) OVER (PARTITION BY event_type ORDER BY day) - 1.0 AS ret
         FROM bars ORDER BY event_type, day"""),
    "q71_weekly_bars" -> (barsSql +
      """SELECT event_type, date_trunc('week', day) AS week,
           min_by(open, day) AS open, max(high) AS high, min(low) AS low,
           max_by(close, day) AS close,
           CAST(SUM(volume) AS BIGINT) AS volume, COUNT(*) AS n_days
         FROM bars GROUP BY 1, 2 ORDER BY 1, 2"""),
    "q61_batch_sessionize" ->
      """WITH e AS (
           SELECT user_id, event_id, ts, value,
             epoch_ms(ts) - epoch_ms(lag(ts) OVER (PARTITION BY user_id
               ORDER BY ts, event_id)) AS gap_ms
           FROM events),
         sess AS (
           SELECT *, SUM(CASE WHEN gap_ms IS NULL OR gap_ms > 1800000
                              THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
           FROM e)
         SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events, MIN(ts) AS session_start, MAX(ts) AS session_end,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
         FROM sess GROUP BY user_id, session_id
         ORDER BY user_id, session_id""",
    "q59_fill_forward" ->
      """WITH bars AS (
           SELECT DISTINCT event_type, CAST(ts AS DATE) AS day,
             last_value(value) OVER (PARTITION BY event_type, CAST(ts AS DATE)
               ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS close
           FROM events WHERE value > 200),
         types AS (SELECT DISTINCT event_type FROM events),
         days AS (SELECT CAST(d AS DATE) AS day
                  FROM generate_series(DATE '2024-01-01', DATE '2024-01-30',
                                       INTERVAL '1 day') t(d)),
         j AS (
           SELECT g.event_type, g.day, b.close
           FROM (SELECT event_type, day FROM types, days) g
           LEFT JOIN bars b ON g.event_type = b.event_type AND g.day = b.day)
         SELECT event_type, day,
           CAST(close IS NULL AS INT) AS filled,
           COALESCE(last_value(close IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS close_ff
         FROM j ORDER BY event_type, day""",
    "q22_asof_join" ->
      """WITH u AS (
           SELECT event_id, ts, user_id, value,
                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
           FROM events WHERE event_type IN ('purchase', 'view')),
         marked AS (
           SELECT *,
             last_value(CASE WHEN is_p = 0 THEN event_id END IGNORE NULLS)
               OVER w AS asof_view_id,
             last_value(CASE WHEN is_p = 0 THEN value END IGNORE NULLS)
               OVER w AS asof_view_value
           FROM u
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, is_p, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT event_id, user_id, ts, value, asof_view_id, asof_view_value
         FROM marked WHERE is_p = 1 ORDER BY event_id""",
    // direction spellings mirror Spark frame for frame: views sort
    // BEFORE purchases backward, AFTER them forward (inclusive <=/>=
    // at equal ts on both sides); tolerance nulls, nearest ties to
    // backward
    "q129_asof_directions" ->
      """WITH u AS (
           SELECT event_id, ts, user_id,
                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
           FROM events WHERE event_type IN ('purchase', 'view')),
         b AS (
           SELECT *,
             last_value(CASE WHEN is_p = 0 THEN event_id END IGNORE NULLS)
               OVER wb AS bwd_id0,
             last_value(CASE WHEN is_p = 0 THEN epoch_ms(ts) END IGNORE NULLS)
               OVER wb AS bwd_ms,
             first_value(CASE WHEN is_p = 0 THEN event_id END IGNORE NULLS)
               OVER wf AS fwd_id0,
             first_value(CASE WHEN is_p = 0 THEN epoch_ms(ts) END IGNORE NULLS)
               OVER wf AS fwd_ms
           FROM u
           WINDOW
             wb AS (PARTITION BY user_id ORDER BY ts, is_p, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY user_id ORDER BY ts, is_p DESC, event_id
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
         p AS (
           SELECT event_id, user_id,
             epoch_ms(ts) - bwd_ms AS bwd_delta,
             fwd_ms - epoch_ms(ts) AS fwd_delta,
             CASE WHEN epoch_ms(ts) - bwd_ms <= 1800000 THEN bwd_id0 END
               AS bwd_id,
             CASE WHEN fwd_ms - epoch_ms(ts) <= 1800000 THEN fwd_id0 END
               AS fwd_id
           FROM b WHERE is_p = 1),
         n AS (
           SELECT event_id, user_id, bwd_id, fwd_id,
             CASE WHEN bwd_id IS NOT NULL
                   AND (fwd_id IS NULL OR bwd_delta <= fwd_delta)
                  THEN bwd_id ELSE fwd_id END AS nearest_id,
             bwd_delta, fwd_delta
           FROM p)
         SELECT event_id, user_id, bwd_id, fwd_id, nearest_id,
           CASE WHEN nearest_id = bwd_id THEN bwd_delta
                WHEN nearest_id = fwd_id THEN fwd_delta END AS nearest_delta_ms
         FROM n ORDER BY event_id""",
    "q196_ema_macd" -> (barsSql +
      """, ser AS (
           SELECT event_type, list(CAST(close AS DOUBLE) ORDER BY day) AS xs
           FROM bars GROUP BY event_type),
         ind AS (
           SELECT event_type, len(xs) AS n_days,
             list_reduce(xs, (acc, x) -> acc * 0.875 + x * 0.125) AS ema_fast,
             list_reduce(xs, (acc, x) -> acc * 0.96875 + x * 0.03125) AS ema_slow
           FROM ser)
         SELECT event_type, n_days, ema_fast, ema_slow,
           ema_fast - ema_slow AS macd
         FROM ind ORDER BY event_type"""),
    "q199_rsi" -> (barsSql +
      """, moves AS (
           SELECT event_type, day,
             GREATEST(close - prev, 0.0) AS gain,
             GREATEST(prev - close, 0.0) AS loss
           FROM (SELECT event_type, day, close,
                   lag(close, 1) OVER (PARTITION BY event_type ORDER BY day) AS prev
                 FROM bars)
           WHERE prev IS NOT NULL),
         ser AS (
           SELECT event_type,
             list(CAST(gain AS DOUBLE) ORDER BY day) AS gs,
             list(CAST(loss AS DOUBLE) ORDER BY day) AS ls
           FROM moves GROUP BY event_type),
         ind AS (
           SELECT event_type, len(gs) AS n_moves,
             list_reduce(gs, (acc, x) -> acc * 0.9375 + x * 0.0625) AS avg_gain,
             list_reduce(ls, (acc, x) -> acc * 0.9375 + x * 0.0625) AS avg_loss
           FROM ser)
         SELECT event_type, n_moves, avg_gain, avg_loss,
           CASE WHEN avg_loss = 0 THEN 100.0
                ELSE 100.0 - 100.0 / (1.0 + avg_gain / avg_loss) END AS rsi
         FROM ind ORDER BY event_type"""),
    "q201_range_frame_mean" -> (barsSql +
      """SELECT event_type, day, close,
           CAST(SUM(CAST(close AS DECIMAL(18,4))) OVER w AS DOUBLE)
             / COUNT(*) OVER w AS mean7d,
           COUNT(*) OVER w AS n_in_window
         FROM bars
         WHERE isodow(day) BETWEEN 1 AND 5
         WINDOW w AS (PARTITION BY event_type ORDER BY day
                      RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
         ORDER BY event_type, day"""),
    "q220_cusum_changepoint" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT) AS y
           FROM events GROUP BY 1, 2),
         c AS (
           SELECT event_type, day, y,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
             CAST(SUM(y) OVER (PARTITION BY event_type) AS BIGINT) AS t
           FROM daily),
         cc AS (
           SELECT event_type, day, n,
             CAST(SUM(n * y - t) OVER (PARTITION BY event_type
               ORDER BY day) AS BIGINT) AS cusum
           FROM c),
         r AS (
           SELECT event_type, day, n, cusum,
             row_number() OVER (PARTITION BY event_type
               ORDER BY abs(cusum) DESC, day ASC) AS rk
           FROM cc)
         SELECT event_type, day AS change_day, n AS n_days,
           cusum AS cusum_scaled,
           CAST(cusum AS DOUBLE) / n / 1e4 AS max_dev
         FROM r WHERE rk = 1 ORDER BY event_type""",
    "q221_series_correlation" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) * 100 AS BIGINT) AS y
           FROM events GROUP BY 1, 2),
         j AS (
           SELECT a.event_type AS type_a, b.event_type AS type_b,
             a.y AS ya, b.y AS yb
           FROM daily a JOIN daily b
             ON a.day = b.day AND a.event_type < b.event_type),
         sums AS (
           SELECT type_a, type_b, COUNT(*) AS n,
             CAST(SUM(ya) AS BIGINT) AS sa, CAST(SUM(yb) AS BIGINT) AS sb,
             CAST(SUM(ya * yb) AS BIGINT) AS sab,
             CAST(SUM(ya * ya) AS BIGINT) AS saa,
             CAST(SUM(yb * yb) AS BIGINT) AS sbb
           FROM j GROUP BY 1, 2)
         SELECT type_a, type_b, n,
           CAST(n * sab - sa * sb AS BIGINT) AS cov_num,
           CAST(n * sab - sa * sb AS DOUBLE) /
             NULLIF(sqrt(CAST(n * saa - sa * sa AS DOUBLE) *
                  CAST(n * sbb - sb * sb AS DOUBLE)), 0) AS pearson_r
         FROM sums ORDER BY type_a, type_b""",
    "q217_trend_maintenance" ->
      """WITH daily AS (
           SELECT event_type, user_id % 10 AS cohort, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT) AS y
           FROM events GROUP BY 1, 2, 3),
         pts AS (
           SELECT event_type, cohort, y,
             CAST(datediff('day', DATE '1970-01-01', day) AS BIGINT) AS x
           FROM daily),
         sums AS (
           SELECT event_type, cohort, COUNT(*) AS n_days,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
           FROM pts GROUP BY 1, 2)
         SELECT event_type, cohort, n_days,
           CAST(n_days * sxy - sx * sy AS BIGINT) AS slope_num,
           CAST(n_days * sxx - sx * sx AS BIGINT) AS slope_den,
           CAST(n_days * sxy - sx * sy AS DOUBLE) /
             NULLIF(CAST(n_days * sxx - sx * sx AS DOUBLE), 0) / 1e4 AS slope_per_day
         FROM sums ORDER BY event_type, cohort""",
    "q216_trend_fit" ->
      """WITH daily AS (
           SELECT event_type, user_id % 10 AS cohort, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT) AS y
           FROM events GROUP BY 1, 2, 3),
         pts AS (
           SELECT event_type, cohort, y,
             CAST(datediff('day',
               MIN(day) OVER (PARTITION BY event_type, cohort), day) AS BIGINT) AS x
           FROM daily),
         sums AS (
           SELECT event_type, cohort, COUNT(*) AS n_days,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
           FROM pts GROUP BY 1, 2)
         SELECT event_type, cohort, n_days,
           CAST(n_days * sxy - sx * sy AS BIGINT) AS slope_num,
           CAST(n_days * sxx - sx * sx AS BIGINT) AS slope_den,
           CAST(n_days * sxy - sx * sy AS DOUBLE) /
             NULLIF(CAST(n_days * sxx - sx * sx AS DOUBLE), 0) / 1e4 AS slope_per_day
         FROM sums ORDER BY event_type, cohort""",
    "q210_rolling_median" -> (barsSql +
      """SELECT event_type, day, close,
           list_sort(xs)[(len(xs) + 1) // 2] AS med7,
           CAST(len(xs) AS BIGINT) AS n_in_window
         FROM (SELECT event_type, day, close,
                 list(CAST(close AS DOUBLE)) OVER (
                   PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS xs
               FROM bars)
         ORDER BY event_type, day"""),
    "q237_max_drawdown" -> (barsSql +
      """, dd AS (
           SELECT event_type, day,
             ((peak - cents) * 10000) // peak AS dd_bp
           FROM (SELECT event_type, day, cents,
                   MAX(cents) OVER (
                     PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
                 FROM (SELECT event_type, day,
                         CAST(CAST(close AS DECIMAL(18,4)) * 100 AS BIGINT) AS cents
                       FROM bars)
                 WHERE cents > 0)),
         worst AS (
           SELECT event_type, CAST(MAX(dd_bp) AS BIGINT) AS max_dd_bp
           FROM dd GROUP BY 1)
         SELECT d.event_type, w.max_dd_bp, MIN(d.day) AS trough_day
         FROM dd d JOIN worst w
           ON d.event_type = w.event_type AND d.dd_bp = w.max_dd_bp
         GROUP BY d.event_type, w.max_dd_bp
         ORDER BY d.event_type"""),
    "q238_obv" -> (barsSql +
      """, c AS (
           SELECT event_type, day, volume,
             CAST(CAST(close AS DECIMAL(18,4)) * 100 AS BIGINT) AS cents
           FROM bars),
         s AS (
           SELECT event_type, day, volume,
             CASE WHEN prev IS NULL OR cents = prev THEN 0
                  WHEN cents > prev THEN volume
                  ELSE -volume END AS signed
           FROM (SELECT *, lag(cents) OVER (PARTITION BY event_type
                   ORDER BY day) AS prev FROM c))
         SELECT event_type, day, volume,
           CAST(SUM(signed) OVER (PARTITION BY event_type ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS obv
         FROM s ORDER BY event_type, day"""),
    "q239_return_acf" -> (barsSql +
      """, r AS (
           SELECT event_type, day,
             cents - lag(cents) OVER w AS ret
           FROM (SELECT event_type, day,
                   CAST(CAST(close AS DECIMAL(18,4)) * 100 AS BIGINT) AS cents
                 FROM bars)
           WINDOW w AS (PARTITION BY event_type ORDER BY day)
           QUALIFY ret IS NOT NULL),
         lagged AS (
           SELECT event_type, ret,
             lag(ret, 1) OVER w AS l1, lag(ret, 2) OVER w AS l2,
             lag(ret, 3) OVER w AS l3
           FROM r WINDOW w AS (PARTITION BY event_type ORDER BY day)),
         pairs AS (
           SELECT event_type, 1 AS lag_k, ret AS x, l1 AS y FROM lagged WHERE l1 IS NOT NULL
           UNION ALL
           SELECT event_type, 2, ret, l2 FROM lagged WHERE l2 IS NOT NULL
           UNION ALL
           SELECT event_type, 3, ret, l3 FROM lagged WHERE l3 IS NOT NULL),
         sums AS (
           SELECT event_type, lag_k, COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
           FROM pairs GROUP BY 1, 2)
         SELECT event_type, lag_k, n,
           CAST(n * sxy - sx * sy AS DOUBLE) /
             NULLIF(sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
                  CAST(n * syy - sy * sy AS DOUBLE)), 0) AS acf
         FROM sums ORDER BY event_type, lag_k"""),
    "q240_candlestick_scan" -> (barsSql +
      """, c AS (
           SELECT event_type, day,
             CAST(CAST(open  AS DECIMAL(18,4)) * 100 AS BIGINT) AS oc,
             CAST(CAST(close AS DECIMAL(18,4)) * 100 AS BIGINT) AS cc
           FROM bars),
         l AS (
           SELECT event_type, day, cc > oc AS bull,
             lag(cc > oc, 1) OVER w AS bull1, lag(cc > oc, 2) OVER w AS bull2,
             cc, lag(cc, 1) OVER w AS cc1, lag(cc, 2) OVER w AS cc2
           FROM c WINDOW w AS (PARTITION BY event_type ORDER BY day))
         SELECT event_type, day AS pattern_day,
           CAST(cc - cc2 AS BIGINT) AS run_gain_cents
         FROM l
         WHERE bull AND bull1 AND bull2 AND cc > cc1 AND cc1 > cc2
         ORDER BY event_type, pattern_day""")
  )
}
