package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXCLUSIVE running aggregates (prefix sum / prefix max)
  * over a keyed order — the shared library operator replacing the three
  * bespoke bounded-domain single-partition windows (q113 offsets, q126
  * score offsets, q128 block carry; r7 verdict #2 + ADVICE).
  *
  * Why a library operator: `Window.orderBy(...)` with no partitionBy
  * moves EVERYTHING into one task. Each former call site pre-reduced
  * the corpus (score histograms, 64Ki arrival blocks) so the windowed
  * table was corpus/K rows — fine at tested scale, but at 10^12-row
  * inputs a 4096-fold reduction still leaves 10^8 rows in one task, and
  * the reduction argument had to be re-made (and re-audited) per query.
  * This operator instead recurses two-phase until EVERY window task is
  * ≤ `span` rows, for any domain size:
  *
  *   level 0: rows block by `orderCol DIV span` — a DETERMINISTIC,
  *     order-monotone map (no range sampling, no pinned partition ids,
  *     nothing to checkpoint). Keys are unique per partition by
  *     contract, so a block holds ≤ span rows BY CONSTRUCTION, not by
  *     data luck;
  *   carry: per-block totals (≤ maxKey/span rows) get their own
  *     exclusive prefix — RECURSIVELY, so depth is
  *     ceil(log_span(maxKey)) ≤ 4 for any 63-bit key at the default
  *     span, and the top level always fits one task;
  *   combine: each row joins its block's carry-in and adds/maxes its
  *     within-block running value (Window partitioned by (partition
  *     cols, block) — bounded by span).
  *
  * The level count derives from the key domain's observed max (one
  * 2-value driver aggregate per level, levels ≤ 4) — stats, not a
  * guessed constant. Only level 0 touches the input; every deeper level
  * operates on block totals (input/span rows), so total cost is ONE
  * exchange of the input keyed on (partitions, block) — the same
  * exchange any partitioned window pays — plus vanishing rollups.
  *
  * Contract:
  *  - `orderCol` is integral, NON-NEGATIVE, and UNIQUE within each
  *    `partitionCols` group (every call site feeds a groupBy result or
  *    a unique-id scan; verified cheaply: min is checked, uniqueness is
  *    the caller's aggregate-key invariant). Exclusive semantics:
  *    prefix-sum of a group's first row is 0; prefix-max is NULL.
  *  - `valueCol` is numeric; sums must fit the input's integral type
  *    (call sites use LONG counts/millis).
  *  - column names starting with `__pfx` are reserved.
  *  - EAGER AT CONSTRUCTION (r8 ADVICE): each recursion level runs a
  *    2-value min/max driver aggregate when the RESULT DATAFRAME IS
  *    BUILT, not when it is consumed — merely constructing the plan
  *    (explain, plan specs, dry runs) executes ≤ 4 small Spark jobs.
  *    That is the design trade for stats-derived level counts; callers
  *    that need a job-free plan must not call Prefix at plan-assembly
  *    time.
  */
object Prefix {

  /** Exclusive running SUM of `valueCol` over `orderCol` within each
    * `partitionCols` group (0 for each group's first row). */
  def exclusiveSum(df: DataFrame, partitionCols: Seq[String], orderCol: String,
                   valueCol: String, outCol: String,
                   span: Long = DefaultSpan): DataFrame =
    prefix(df, partitionCols, orderCol, valueCol, outCol, isMax = false, span)

  /** Exclusive running MAX of `valueCol` over `orderCol` within each
    * `partitionCols` group (NULL for each group's first row). */
  def exclusiveMax(df: DataFrame, partitionCols: Seq[String], orderCol: String,
                   valueCol: String, outCol: String,
                   span: Long = DefaultSpan): DataFrame =
    prefix(df, partitionCols, orderCol, valueCol, outCol, isMax = true, span)

  /** Max rows any single window task may hold; also the per-level
    * domain divisor, so recursion depth is ceil(log_span(maxKey)). */
  val DefaultSpan: Long = 1L << 20

  private def prefix(df: DataFrame, parts: Seq[String], k: String, v: String,
                     out: String, isMax: Boolean, span: Long,
                     level: Int = 0): DataFrame = {
    require(span >= 2, s"span must be >= 2, got $span")
    def runOver(w: org.apache.spark.sql.expressions.WindowSpec): Column = {
      val ex = w.rowsBetween(Window.unboundedPreceding, -1)
      if (isMax) max(col(v)).over(ex)
      else coalesce(sum(col(v)).over(ex), lit(0L))
    }
    // 2-value driver action (per level, ≤ 4 levels): the key domain's
    // observed bounds pick the level count; a negative key would make
    // DIV-blocking non-monotone, so it fails loudly here instead of
    // returning silently wrong prefixes.
    val Array(row) = df.agg(min(col(k)).cast("long"), max(col(k)).cast("long"))
      .collect()
    if (row.isNullAt(1)) {
      // empty input: still honor partitionCols in the window (r8
      // ADVICE — the unpartitioned spelling violated the operator's
      // own "no unpartitioned window in partitioned mode" invariant;
      // harmless on zero rows, but plan audits see the shape)
      val w = if (parts.isEmpty) Window.orderBy(k)
              else Window.partitionBy(parts.map(col): _*).orderBy(k)
      return df.withColumn(out, runOver(w))
    }
    require(row.getLong(0) >= 0,
      s"Prefix: order column $k must be non-negative (min=${row.getLong(0)})")
    val maxK = row.getLong(1)
    if (maxK < span) {
      // every group's keys fit one block ⇒ one window task per group,
      // ≤ span rows each (keys unique and < span)
      val w = if (parts.isEmpty) Window.orderBy(k)
              else Window.partitionBy(parts.map(col): _*).orderBy(k)
      df.withColumn(out, runOver(w))
    } else {
      // level-suffixed working names: the recursive call's own block
      // column must not collide with the order column we hand it
      val blk = s"__pfxBlk$level"
      val tot = s"__pfxTot$level"
      val carry = s"__pfxCarry$level"
      val local = s"__pfxLocal$level"
      val blocked = df.withColumn(blk, expr(s"CAST($k AS BIGINT) DIV $span"))
      // per-(group, block) totals: map-side combined, ≤ maxK/span rows
      // per group reach the shuffle
      val totals = blocked.groupBy((parts :+ blk).map(col): _*)
        .agg((if (isMax) max(col(v)) else sum(col(v))).as(tot))
      // the carry table is its own (smaller) prefix problem — recurse;
      // block ids are unique per group and ≤ maxK/span, so each level
      // divides the domain by span and the top level fits one task
      val carries = prefix(totals, parts, blk, tot, carry, isMax, span, level + 1)
        .select((parts :+ blk :+ carry).map(col): _*)
      val wIn = Window.partitionBy((parts :+ blk).map(col): _*).orderBy(k)
      val combined = blocked
        .join(carries, parts :+ blk) // carry side: ≤ maxK/span rows/group
        .withColumn(local, runOver(wIn))
        .withColumn(out,
          if (isMax) greatest(col(carry), col(local)) // null = empty prefix
          else col(carry) + col(local))
      combined.drop(blk, local, carry)
    }
  }

  /** Max rows any single affine-scan block may collect (one array of
    * three doubles per row ≈ 1.5 MB per block at this span). */
  val DefaultAffineSpan: Long = 1L << 16

  /** Distributed EXCLUSIVE scan of an AFFINE LINEAR RECURRENCE
    * y_i = a_i·y_{i-1} + b_i over a keyed order — the operator class
    * (EMA / Wilder smoothing / decayed counters / amortization) that
    * window functions fundamentally cannot express: a running SUM is
    * the special case a ≡ 1, and no Spark window/HOF provides the
    * general scan.
    *
    * Affine maps compose associatively — (a₂,b₂)∘(a₁,b₁) =
    * (a₂a₁, a₂b₁ + b₂) — which is exactly what makes the recurrence
    * distributable by the [[prefix]] two-phase recursion: rows block by
    * `orderCol DIV span`, each block computes its internal exclusive
    * compositions in ONE codegen pass ([[graft.plans.AffineScan]]), the
    * per-block TOTAL compositions recurse as a (span×smaller) scan of
    * their own, and each row finally composes `local_exc ∘ carry`:
    *
    *   A_out = A_local·A_carry,   B_out = A_local·B_carry + B_local
    *
    * so `B_out` is the recurrence value folded from seed 0 over every
    * earlier row, and an inclusive value is one local step:
    * y_i = a_i·B_out + b_i. Callers encode a seeded series by giving
    * the first row (a=0, b=seed).
    *
    * Same contract as [[exclusiveSum]]: `orderCol` integral,
    * non-negative, unique per group; EAGER 2-value driver aggregate per
    * recursion level at construction; `__afs*` names reserved. Output
    * = partition cols + orderCol (as BIGINT) + a/b (as DOUBLE) +
    * `outACol`/`outBCol`; other payload columns are dropped (re-join on
    * (partitions, orderCol) if needed).
    *
    * FLOATING POINT: within a block the fold is bit-identical to the
    * sequential recurrence; across blocks the carry composition
    * REGROUPS the arithmetic, so results differ from sequential in the
    * last ulps (PrefixSpec pins a relative bound and bit-exactness on
    * rounding-free dyadic inputs). Exact sequential spellings exist
    * only single-threaded — this is the price of distributing a
    * recurrence, not an implementation artifact. */
  def affineScanExc(df: DataFrame, partitionCols: Seq[String], orderCol: String,
                    aCol: String, bCol: String, outACol: String, outBCol: String,
                    span: Long = DefaultAffineSpan): DataFrame =
    affineRec(df, partitionCols, orderCol, aCol, bCol, outACol, outBCol, span, 0)

  private def affineRec(df: DataFrame, parts: Seq[String], k: String,
                        aCol: String, bCol: String, outA: String, outB: String,
                        span: Long, level: Int): DataFrame = {
    require(span >= 2, s"span must be >= 2, got $span")
    graft.plans.AffineScan.register(df.sparkSession)
    val base = df.select((parts.map(col) :+ col(k) :+ col(aCol) :+ col(bCol)): _*)
    // 2-value driver action per level (≤ 4 levels), as in [[prefix]]
    val Array(row) = df.agg(min(col(k)).cast("long"), max(col(k)).cast("long"))
      .collect()
    if (row.isNullAt(1))
      // empty input: apply the SAME long/double casts the blocked path
      // applies, so the output schema honors the documented contract
      // (orderCol BIGINT, a/b DOUBLE) even when callers pass int/float
      // columns (r9 ADVICE — mirrors the exclusiveSum empty-path fix)
      return base
        .withColumn(k, col(k).cast("long"))
        .withColumn(aCol, col(aCol).cast("double"))
        .withColumn(bCol, col(bCol).cast("double"))
        .withColumn(outA, lit(1.0)).withColumn(outB, lit(0.0))
    require(row.getLong(0) >= 0,
      s"affineScanExc: order column $k must be non-negative (min=${row.getLong(0)})")
    val oneBlock = row.getLong(1) < span
    val blk = s"__afsBlk$level"
    val blocked =
      if (oneBlock) base.withColumn(blk, lit(0L))
      else base.withColumn(blk, expr(s"CAST($k AS BIGINT) DIV $span"))
    // per-(group, block) sorted collect — ≤ span rows BY CONSTRUCTION
    // (keys unique per group, block = key DIV span), then both
    // exclusive compositions in one codegen pass each
    val g = blocked.groupBy((parts :+ blk).map(col): _*)
      .agg(array_sort(collect_list(struct(
        col(k).cast("long").as("k"), col(aCol).cast("double").as("a"),
        col(bCol).cast("double").as("b")))).as("__afsXs"))
      .withColumn("__afsKs", expr("transform(__afsXs, x -> x.k)"))
      .withColumn("__afsAs", expr("transform(__afsXs, x -> x.a)"))
      .withColumn("__afsBs", expr("transform(__afsXs, x -> x.b)"))
      .withColumn("__afsAExc",
        call_function(graft.plans.AffineScan.PROD_NAME, col("__afsAs")))
      .withColumn("__afsBExc",
        call_function(graft.plans.AffineScan.SCAN_NAME, col("__afsAs"), col("__afsBs")))
      .drop("__afsXs")
    val withCarry =
      if (oneBlock)
        g.withColumn("__afsCA", lit(1.0)).withColumn("__afsCB", lit(0.0))
      else {
        // full-block composition = (last element) ∘ (its exclusive)
        val totals = g.select((parts.map(col) :+ col(blk) :+
          (element_at(col("__afsAs"), -1) * element_at(col("__afsAExc"), -1))
            .as("__afsTA") :+
          (element_at(col("__afsAs"), -1) * element_at(col("__afsBExc"), -1) +
            element_at(col("__afsBs"), -1)).as("__afsTB")): _*)
        val carries = affineRec(totals, parts, blk, "__afsTA", "__afsTB",
          "__afsCA", "__afsCB", span, level + 1)
          .select((parts :+ blk :+ "__afsCA" :+ "__afsCB").map(col): _*)
        g.join(carries, parts :+ blk) // carry side ≤ maxK/span rows/group
      }
    withCarry
      .withColumn("__afsZ", explode(arrays_zip(col("__afsKs"), col("__afsAs"),
        col("__afsBs"), col("__afsAExc"), col("__afsBExc"))))
      .select((parts.map(col) :+
        col("__afsZ.__afsKs").as(k) :+
        col("__afsZ.__afsAs").as(aCol) :+
        col("__afsZ.__afsBs").as(bCol) :+
        (col("__afsZ.__afsAExc") * col("__afsCA")).as(outA) :+
        (col("__afsZ.__afsAExc") * col("__afsCB") + col("__afsZ.__afsBExc"))
          .as(outB)): _*)
  }
}
