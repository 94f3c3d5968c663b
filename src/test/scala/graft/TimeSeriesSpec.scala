package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.TimeSeries

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("calendar is inclusive on both ends (S19, utils.py:116-150)") {
    val c = TimeSeries.calendar(spark, "2024-02-27", "2024-03-02")
      .select($"day".cast("string")).as[String].collect().toSeq
    assert(c == Seq("2024-02-27", "2024-02-28", "2024-02-29", "2024-03-01", "2024-03-02"))
  }

  test("calendar string mode renders the fmt pattern (S19 as_string)") {
    val c = TimeSeries.calendar(spark, "2024-02-28", "2024-03-01", "dd/MM/yyyy")
      .as[String].collect().toSeq
    assert(c == Seq("28/02/2024", "29/02/2024", "01/03/2024"))
  }

  test("calendar length = day span + 1 (property)") {
    val n = TimeSeries.calendar(spark, "1995-01-01", "1995-12-31").count()
    assert(n == 365)
  }

  test("ohlcDaily: deterministic open/close by (ts, id), high/low/volume") {
    def t(s: String) = Timestamp.valueOf(s)
    val ticks = Seq(
      ("X", t("2024-01-01 09:00:00"), 10.0, 1L),
      ("X", t("2024-01-01 09:00:00"), 11.0, 2L), // same ts: id breaks tie
      ("X", t("2024-01-01 15:00:00"), 7.0, 3L),
      ("X", t("2024-01-02 10:00:00"), 20.0, 4L),
      ("Y", t("2024-01-01 12:00:00"), 5.0, 5L)
    ).toDF("sym", "ts", "value", "id")
    val bars = TimeSeries.ohlcDaily(ticks, "sym", "ts", "value", "id")
      .orderBy("sym", "day").collect()
    assert(bars.length == 3)
    val x1 = bars(0) // X, 2024-01-01
    assert(x1.getDouble(2) == 10.0 && x1.getDouble(3) == 11.0 &&
      x1.getDouble(4) == 7.0 && x1.getDouble(5) == 7.0 && x1.getLong(6) == 3L)
  }

  test("fill-forward carries the last close across gaps, zero before first (q59)") {
    val r = SparkEntry.queries("q59_fill_forward")(spark, sf).collect()
    // grid is complete: every (type, day) cell present
    val types = Tables.events(spark, sf).select("event_type").distinct().count()
    assert(r.length == types * 30)
    assert(r.exists(_.getAs[Int]("filled") == 1), "fixture must contain gaps")
    r.groupBy(_.getAs[String]("event_type")).values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[java.sql.Date]("day").toString)
      var lastObserved = 0.0
      sorted.foreach { row =>
        if (row.getAs[Int]("filled") == 1)
          assert(row.getAs[Double]("close_ff") == lastObserved,
            s"filled day must carry the previous close")
        else lastObserved = row.getAs[Double]("close_ff")
      }
    }
  }

  test("batch sessionize agrees with Spark's built-in session_window (q61 law)") {
    val got = SparkEntry.queries("q61_batch_sessionize")(spark, sf)
      .select($"user_id", $"session_start", $"n_events", $"total_value")
      .as[(Long, java.sql.Timestamp, Long, Double)].collect().toSet
    val builtin = Tables.events(spark, sf)
      .groupBy(session_window($"ts", "30 minutes").as("w"), $"user_id")
      .agg(count(lit(1)).as("n_events"),
        graft.functions.Exact.dsumd($"value").as("total_value"))
      .select($"user_id", $"w.start".as("session_start"), $"n_events", $"total_value")
      .as[(Long, java.sql.Timestamp, Long, Double)].collect().toSet
    assert(got == builtin, "lag/cumsum sessions must equal session_window sessions")
  }

  test("incremental append never duplicates and never loses (P2)") {
    val out = SparkEntry.queries("q18_incremental_append")(spark, sf)
      .agg(sum($"n_events")).as[Long].head()
    assert(out == Tables.events(spark, sf).count())
  }

  test("as-of join picks the latest view at-or-before each purchase") {
    val asof = SparkEntry.queries("q22_asof_join")(spark, sf)
    val row = asof.filter($"asof_view_id".isNotNull).orderBy("event_id").limit(1).collect()(0)
    val ev = Tables.events(spark, sf)
    val vTs = ev.filter($"event_id" === row.getAs[Long]("asof_view_id"))
      .select("ts").as[Timestamp].head()
    assert(!vTs.after(row.getAs[Timestamp]("ts")))
    // and no later view exists for that user before the purchase
    val later = ev.filter($"event_type" === "view" &&
      $"user_id" === row.getAs[Long]("user_id") &&
      $"ts" <= row.getAs[Timestamp]("ts") && $"ts" > vTs).count()
    assert(later == 0)
  }

  test("q129 directions agree with q22 backward and a brute-force nearest") {
    val dirs = SparkEntry.queries("q129_asof_directions")(spark, sf).collect()
      .map(r => r.getAs[Long]("event_id") -> r).toMap
    assert(dirs.nonEmpty)
    val tol = 30 * 60 * 1000L
    // backward leg == q22's unbounded backward view whenever that view
    // is inside the tolerance (q129 only adds the null-out)
    val ev = Tables.events(spark, sf)
    val ts = ev.select($"event_id", $"ts").as[(Long, Timestamp)].collect().toMap
    SparkEntry.queries("q22_asof_join")(spark, sf).collect().foreach { r =>
      val pid = r.getAs[Long]("event_id")
      val q22view = Option(r.getAs[java.lang.Long]("asof_view_id")).map(_.toLong)
      val expect = q22view.filter(v =>
        ts(pid).getTime - ts(v).getTime <= tol)
      val got = Option(dirs(pid).getAs[java.lang.Long]("bwd_id")).map(_.toLong)
      assert(got == expect, s"purchase $pid: bwd $got != q22∩tol $expect")
    }
    // nearest picks the smaller defined delta, ties backward
    val brute = ev.filter($"event_type" === "view")
      .select($"user_id", $"event_id", $"ts").as[(Long, Long, Timestamp)]
      .collect().groupBy(_._1)
    dirs.values.foreach { r =>
      val u = r.getAs[Long]("user_id"); val pid = r.getAs[Long]("event_id")
      val pMs = ts(pid).getTime
      val views = brute.getOrElse(u, Array.empty)
      val b = views.filter(v => v._3.getTime <= pMs && pMs - v._3.getTime <= tol)
        .sortBy(v => (-v._3.getTime, -v._2)).headOption
      val f = views.filter(v => v._3.getTime >= pMs && v._3.getTime - pMs <= tol)
        .sortBy(v => (v._3.getTime, v._2)).headOption
      val nearest = (b, f) match {
        case (Some(bv), Some(fv)) =>
          if (pMs - bv._3.getTime <= fv._3.getTime - pMs) Some(bv._2) else Some(fv._2)
        case (Some(bv), None) => Some(bv._2)
        case (None, Some(fv)) => Some(fv._2)
        case _ => None
      }
      val got = Option(r.getAs[java.lang.Long]("nearest_id")).map(_.toLong)
      assert(got == nearest, s"purchase $pid nearest $got != brute $nearest")
    }
  }

  test("q196 EMA fold is BIT-EQUAL to the sequential recurrence (and MACD = fast - slow)") {
    // the operator's whole claim is that a distributed-per-series left
    // fold reproduces the sequential linear recurrence exactly — pin it
    // against a driver-side fold over the same day-sorted closes
    val bars = TimeSeries.queriesDailyClose(spark, sf)
      .select($"event_type", $"day".cast("string"), $"close")
      .as[(String, String, Double)].collect()
      .groupBy(_._1).map { case (k, rows) =>
        k -> rows.sortBy(_._2).map(_._3).toSeq
      }
    val got = SparkEntry.queries("q196_ema_macd")(spark, sf).collect()
    assert(got.nonEmpty && got.length == bars.size)
    got.foreach { r =>
      val xs = bars(r.getAs[String]("event_type"))
      def seqEma(alpha: Double): Double =
        xs.tail.foldLeft(xs.head)((acc, x) => acc * (1.0 - alpha) + x * alpha)
      assert(r.getAs[Long]("n_days") == xs.length)
      // == on Double is bit-comparison for non-NaN; closes are real prices
      assert(r.getAs[Double]("ema_fast") == seqEma(0.125), s"fast ${r}")
      assert(r.getAs[Double]("ema_slow") == seqEma(0.03125), s"slow ${r}")
      assert(r.getAs[Double]("macd") ==
        r.getAs[Double]("ema_fast") - r.getAs[Double]("ema_slow"))
    }
  }

  test("q198 distributed per-day EMA converges to q196's folded EMA (cross-operator law)") {
    // same recurrence, two routes: q196 folds each series in one task
    // (bit-exact sequential), q198 distributes via the affine scan
    // (recomposed arithmetic) — the final day's value must agree to
    // 1e-12 relative, per series
    val folded = SparkEntry.queries("q196_ema_macd")(spark, sf)
      .select($"event_type", $"ema_fast").as[(String, Double)].collect().toMap
    val series = SparkEntry.queries("q198_ema_scan")(spark, sf)
      .orderBy($"event_type", $"day")
      .select($"event_type", $"ema").as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.last._2).toMap
    assert(series.keySet == folded.keySet && series.nonEmpty)
    series.foreach { case (k, got) =>
      val want = folded(k)
      assert(math.abs(got - want) <= 1e-12 * math.max(math.abs(want), 1.0),
        s"$k: scan EMA $got != folded EMA $want")
    }
  }

  test("q217 maintained state serves the SAME exact model as q216's one-shot fit (shift invariance)") {
    import spark.implicits._
    // n·Σxy−Σx·Σy and n·Σx²−(Σx)² are shift-invariant integer
    // identities: q216 anchors x at each series' own first day, q217
    // at the 1970 epoch over base-then-merged state — the exact
    // BIGINT numerators/denominators must agree anyway
    def m(q: String) = SparkEntry.queries(q)(spark, sf)
      .select($"event_type", $"cohort", $"n_days", $"slope_num", $"slope_den")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(m("q216_trend_fit") == m("q217_trend_maintenance"),
      "maintained-state model diverged from the one-shot fit")
  }
}
