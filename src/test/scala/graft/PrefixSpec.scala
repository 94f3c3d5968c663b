package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Prefix

/** Laws for the shared distributed prefix operator (r7 verdict #2):
  * multi-level recursion must be value-identical to the naive
  * single-partition window spelling it replaces, on domains large
  * enough that ONE level would overflow the per-task row budget. */
class PrefixSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random values; keys deliberately SPARSE (×7)
  // so block population << span and empty blocks exist
  private def table(n: Int) =
    (0 until n).map(i => (i.toLong * 7, ((i * 2654435761L) >>> 7) % 1000))
      .toDF("k", "v")

  test("exclusiveSum == single-window spelling across ≥3 recursion levels") {
    val df = table(4000) // keys up to 27993; span 16 ⇒ levels 16^3=4096 < 27993 ⇒ 4 levels
    val naive = df.withColumn("off",
      coalesce(sum($"v").over(Window.orderBy("k")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .orderBy("k").select("k", "off").as[(Long, Long)].collect().toSeq
    val dist = Prefix.exclusiveSum(df, Nil, "k", "v", "off", span = 16)
      .orderBy("k").select("k", "off").as[(Long, Long)].collect().toSeq
    assert(dist == naive)
    // first row's exclusive sum is 0 by contract
    assert(dist.head._2 == 0L)
  }

  test("exclusiveMax == single-window spelling, NULL on each first row") {
    val df = table(2000)
    val naive = df.withColumn("hwm",
      max($"v").over(Window.orderBy("k")
        .rowsBetween(Window.unboundedPreceding, -1)))
      .orderBy("k").select("k", "hwm").as[(Long, Option[Long])].collect().toSeq
    val dist = Prefix.exclusiveMax(df, Nil, "k", "v", "hwm", span = 16)
      .orderBy("k").select("k", "hwm").as[(Long, Option[Long])].collect().toSeq
    assert(dist == naive)
    assert(dist.head._2.isEmpty) // empty prefix has no max
  }

  test("partitioned prefix: per-group independence incl. a hot group") {
    // group "hot" holds 1500 keys, the rest 2 each — the shape the
    // operator exists for (a hot partition must not serialize)
    val rows = (0 until 1500).map(i => ("hot", i.toLong * 3, (i % 17).toLong)) ++
      (0 until 40).flatMap(g => Seq((s"g$g", 5L, 7L), (s"g$g", 900L, 9L)))
    val df = rows.toDF("p", "k", "v")
    val naive = df.withColumn("off",
      coalesce(sum($"v").over(Window.partitionBy("p").orderBy("k")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .orderBy("p", "k").select("p", "k", "off")
      .as[(String, Long, Long)].collect().toSeq
    val dist = Prefix.exclusiveSum(df, Seq("p"), "k", "v", "off", span = 64)
      .orderBy("p", "k").select("p", "k", "off")
      .as[(String, Long, Long)].collect().toSeq
    assert(dist == naive)
  }

  test("every window task is bounded by span (the 100 TB invariant)") {
    // span 16 over 4000 unique keys: a single level would put 250+
    // block totals — and without the operator, 4000 rows — into one
    // task. Count the max rows any (level-0) block holds directly.
    val df = table(4000)
    val maxBlockRows = df
      .groupBy(expr("k DIV 16")).agg(count(lit(1)).as("n"))
      .agg(max($"n")).head.getLong(0)
    assert(maxBlockRows <= 16)
    // and the operator still resolves the full domain correctly
    val out = Prefix.exclusiveSum(df, Nil, "k", "v", "off", span = 16)
    assert(out.count() == 4000)
  }

  test("recursion plan: exactly one span-bounded unpartitioned window") {
    // span 16 over keys ≤ 27993 ⇒ 3 levels: two partitioned windows
    // (per-block, ≤ span rows each) and ONE unpartitioned top window
    // whose input is ≤ span block totals — the only single-task sort
    // the operator ever schedules
    def windows(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
          w.partitionSpec
      }
    val global = windows(Prefix.exclusiveSum(table(4000), Nil, "k", "v", "off", span = 16))
    assert(global.size >= 3, s"expected >= 3 window levels, got ${global.size}")
    assert(global.count(_.isEmpty) == 1,
      s"exactly one (bounded) unpartitioned window allowed, got $global")
    // partitioned prefix: every window carries the group key — no
    // unpartitioned window anywhere in the plan
    val rows = (0 until 1500).map(i => ("hot", i.toLong * 3, (i % 17).toLong))
      .toDF("p", "k", "v")
    val grouped = windows(Prefix.exclusiveSum(rows, Seq("p"), "k", "v", "off", span = 64))
    assert(grouped.nonEmpty && grouped.forall(_.nonEmpty),
      s"partitioned prefix must never schedule an unpartitioned window: $grouped")
  }

  test("negative order keys fail loudly, never silently mis-prefix") {
    val df = Seq((-1L, 1L), (2L, 2L), (40L, 3L)).toDF("k", "v")
    val e = intercept[Exception](
      Prefix.exclusiveSum(df, Nil, "k", "v", "off", span = 16).collect())
    assert(e.getMessage.contains("non-negative"))
  }

  test("empty input returns empty with the out column present") {
    val df = Seq.empty[(Long, Long)].toDF("k", "v")
    val out = Prefix.exclusiveSum(df, Nil, "k", "v", "off", span = 16)
    assert(out.columns.contains("off") && out.count() == 0)
  }
}
