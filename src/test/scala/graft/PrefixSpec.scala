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

  // ---- affine linear-recurrence scan ----

  /** Driver-side sequential exclusive compositions — the semantic
    * reference for every affine law below. */
  private def seqExc(maps: Seq[(Double, Double)]): Seq[(Double, Double)] =
    maps.scanLeft((1.0, 0.0)) { case ((ca, cb), (a, b)) =>
      (a * ca, a * cb + b)
    }.dropRight(1)

  test("affine kernels: codegen == interpreted quadratic spelling + null semantics") {
    graft.plans.AffineScan.register(spark)
    val n = 37
    val as = (0 until n).map(i => 0.5 + ((i * 2654435761L) >>> 9) % 1000 / 2000.0)
    val bs = (0 until n).map(i => -5.0 + ((i * 40503L) >>> 3) % 700 / 70.0)
    val df = Seq((as, bs)).toDF("as", "bs")
      .selectExpr("affine_prod_a(as) AS pa", "affine_scan_b(as, bs) AS pb",
        // interpreted quadratic twin: position i folds the prefix slice
        """transform(sequence(1, size(as)), i ->
             aggregate(slice(as, 1, i - 1), CAST(1.0 AS DOUBLE), (acc, x) -> acc * x)) AS qa""",
        """transform(sequence(1, size(as)), i ->
             aggregate(slice(arrays_zip(as, bs), 1, i - 1),
               CAST(0.0 AS DOUBLE), (acc, m) -> m.as * acc + m.bs)) AS qb""")
    val r = df.head()
    def arr(i: Int) = r.getSeq[Double](i)
    assert(arr(0) == arr(2), "prod_a codegen != interpreted twin")
    assert(arr(1) == arr(3), "scan_b codegen != interpreted twin")
    // poison/null laws
    val nulls = spark.sql(
      """SELECT affine_prod_a(CAST(array(1.0, NULL) AS ARRAY<DOUBLE>)) AS p,
                affine_scan_b(array(1.0D), array(1.0D, 2.0D)) AS m""").head()
    assert(nulls.isNullAt(0), "null element must poison prod_a")
    assert(nulls.isNullAt(1), "length mismatch must null scan_b")
  }

  test("affineScanExc ≈ sequential recurrence across ≥3 recursion levels") {
    // 400 sparse keys (×7 ⇒ max 2793), span 8 ⇒ levels 8, 64, 512 —
    // three carry levels engage; values exercise general rounding
    val rows = (0 until 400).map { i =>
      ("s" + (i % 3), i.toLong * 7,
        0.8 + ((i * 2654435761L) >>> 9) % 100 / 500.0,
        -2.0 + ((i * 40503L) >>> 3) % 400 / 100.0)
    }
    val df = rows.toDF("p", "k", "a", "b")
    val got = Prefix.affineScanExc(df, Seq("p"), "k", "a", "b", "ea", "eb", span = 8)
      .orderBy("p", "k").select("p", "k", "ea", "eb")
      .as[(String, Long, Double, Double)].collect()
    val expect = rows.groupBy(_._1).view.mapValues { g =>
      val sorted = g.sortBy(_._2)
      sorted.map(_._2).zip(seqExc(sorted.map(t => (t._3, t._4)))).toMap
    }.toMap
    assert(got.nonEmpty && got.length == rows.length)
    got.foreach { case (p, k, ea, eb) =>
      val (xa, xb) = expect(p)(k)
      assert(math.abs(ea - xa) <= 1e-12 * math.max(math.abs(xa), 1.0) &&
        math.abs(eb - xb) <= 1e-12 * math.max(math.abs(xb), 1.0),
        s"($p,$k): got ($ea,$eb) expected ($xa,$xb)")
    }
  }

  test("affineScanExc is BIT-EXACT on rounding-free dyadic inputs") {
    // a = 0.5 (shift), b = small ints, ≤ 40 steps: every double op is
    // exact in ANY grouping, so distributed == sequential bitwise —
    // separating recomposition error from implementation error
    val rows = (0 until 40).map(i =>
      (i.toLong, 0.5, (1 + (i * 37) % 50).toDouble))
    val df = rows.toDF("k", "a", "b")
    val got = Prefix.affineScanExc(df, Nil, "k", "a", "b", "ea", "eb", span = 4)
      .orderBy("k").select("ea", "eb").as[(Double, Double)].collect().toSeq
    val expect = seqExc(rows.map(t => (t._2, t._3)))
    assert(got == expect, "dyadic affine scan must be bit-equal to sequential")
  }

  test("affineScanExc: empty input keeps schema; first row is identity") {
    val empty = Seq.empty[(Long, Double, Double)].toDF("k", "a", "b")
    val out = Prefix.affineScanExc(empty, Nil, "k", "a", "b", "ea", "eb", span = 4)
    assert(out.columns.toSeq == Seq("k", "a", "b", "ea", "eb") && out.count() == 0)
    val one = Prefix.affineScanExc(
        Seq((3L, 0.9, 1.5)).toDF("k", "a", "b"), Nil, "k", "a", "b", "ea", "eb")
      .select("ea", "eb").as[(Double, Double)].head()
    assert(one == ((1.0, 0.0)), "exclusive scan of the first row is the identity map")
  }
}
