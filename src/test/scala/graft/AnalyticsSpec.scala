package graft

import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("rollup totals line up across grouping levels (q23)") {
    val r = SparkEntry.queries("q23_rollup")(spark, sf).collect()
    val grand = r.filter(x => x.getAs[Int]("g_y") == 1 && x.getAs[Int]("g_p") == 1)
    val perYear = r.filter(x => x.getAs[Int]("g_y") == 0 && x.getAs[Int]("g_p") == 1)
    val leaves = r.filter(x => x.getAs[Int]("g_y") == 0 && x.getAs[Int]("g_p") == 0)
    assert(grand.length == 1)
    assert(grand(0).getAs[Long]("n") == perYear.map(_.getAs[Long]("n")).sum)
    assert(grand(0).getAs[Long]("n") == leaves.map(_.getAs[Long]("n")).sum)
  }

  test("cube contains all four grouping combinations (q24)") {
    val r = SparkEntry.queries("q24_cube")(spark, sf).collect()
    val combos = r.map(x => (x.getAs[Int]("g_f"), x.getAs[Int]("g_s"))).toSet
    assert(combos == Set((0, 0), (0, 1), (1, 0), (1, 1)))
  }

  test("window suite: ranks consistent, running sum monotone per partition (q25)") {
    val r = SparkEntry.queries("q25_window_suite")(spark, sf).collect()
    r.groupBy(_.getAs[Int]("c_nationkey")).values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Int]("rn"))
      assert(sorted.head.getAs[Int]("rnk") == 1)
      val bals = sorted.map(_.getAs[Double]("c_acctbal"))
      assert(bals.sameElements(bals.sorted(Ordering[Double].reverse)))
    }
  }

  test("split adjustment halves close per planted split day (q26)") {
    val r = SparkEntry.queries("q26_split_adjust")(spark, sf).collect()
    r.foreach { row =>
      val expected = row.getAs[Double]("close") / math.pow(2.0, row.getAs[Long]("n_splits"))
      assert(math.abs(row.getAs[Double]("adj_close") - expected) < 1e-12)
    }
    assert(r.exists(_.getAs[Long]("n_splits") > 0))
  }

  test("intersect/except keeps only 1995∩1996 minus pending (q28)") {
    val keys = SparkEntry.queries("q28_intersect_except")(spark, sf)
      .as[Long].collect().toSet
    val o = Tables.orders(spark, sf)
    val y95 = o.filter(year($"o_orderdate") === 1995).select("o_custkey").as[Long].collect().toSet
    val y96 = o.filter(year($"o_orderdate") === 1996).select("o_custkey").as[Long].collect().toSet
    val p = o.filter($"o_orderstatus" === "P").select("o_custkey").as[Long].collect().toSet
    assert(keys == ((y95 & y96) -- p))
  }

  test("HLL approximate distinct lands within the configured error (q29)") {
    val r = SparkEntry.queries("q29_approx_distinct")(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach(row => assert(row.getAs[Boolean]("hll_within_10pct")))
    // the raw estimate (not part of the oracle surface) stays in bound
    val raw = Tables.orders(spark, sf).groupBy($"o_orderstatus")
      .agg(countDistinct($"o_custkey").as("exact"),
        approx_count_distinct($"o_custkey", 0.02).as("approx"))
      .collect()
    raw.foreach { row =>
      val (e, a) = (row.getAs[Long]("exact"), row.getAs[Long]("approx"))
      assert(math.abs(a - e).toDouble / e < 0.1, s"HLL err for ${row.get(0)}: $a vs $e")
    }
  }

  test("percentiles: exact interpolation on a known sequence (q50 mechanism)") {
    // 1..5: p25 = 2, p50 = 3, p75 = 4 (position p·(n-1) lands on elements)
    val r = Seq(1.0, 2.0, 3.0, 4.0, 5.0).toDF("x")
      .agg(percentile($"x", lit(0.25)).as("p25"), percentile($"x", lit(0.5)).as("p50"),
        percentile($"x", lit(0.75)).as("p75")).head()
    assert(r.getDouble(0) == 2.0 && r.getDouble(1) == 3.0 && r.getDouble(2) == 4.0)
    // even count interpolates exactly: median of 1..4 = 2.5
    val m = Seq(1.0, 2.0, 3.0, 4.0).toDF("x").agg(percentile($"x", lit(0.5))).head.getDouble(0)
    assert(m == 2.5)
    // ordered percentiles hold on the real query
    val q = SparkEntry.queries("q50_percentiles")(spark, sf).collect()
    q.foreach { row =>
      assert(row.getAs[Double]("p25") <= row.getAs[Double]("p50") &&
        row.getAs[Double]("p50") <= row.getAs[Double]("p75"))
    }
  }

  test("pivot cells sum back to the unpivoted total (q51 law)") {
    val piv = SparkEntry.queries("q51_pivot")(spark, sf).collect()
    val li = Tables.lineitem(spark, sf)
    piv.foreach { row =>
      val flag = row.getAs[String]("l_returnflag")
      val total = li.filter($"l_returnflag" === flag)
        .agg(graft.functions.Exact.dsumd($"l_quantity")).head.getDouble(0)
      // cells are exact decimals individually, but each is cast to
      // double before this re-addition — allow the one-ulp of that sum
      assert(math.abs(row.getAs[Double]("qty_f") + row.getAs[Double]("qty_o") - total)
        <= math.ulp(total) * 4, s"pivot cells for $flag must partition the group total")
    }
  }

  test("unpivot emits one (metric,value) row per wide column (q52 law)") {
    val long = SparkEntry.queries("q52_unpivot")(spark, sf).collect()
    val nNations = Tables.customer(spark, sf).select("c_nationkey").distinct().count()
    assert(long.length == 3 * nNations)
    assert(long.map(_.getAs[String]("metric")).toSet ==
      Set("n_cust", "total_bal", "avg_bal"))
  }

  test("histogram buckets partition the rows and bound their values (q53 law)") {
    val r = SparkEntry.queries("q53_histogram")(spark, sf).collect()
    assert(r.map(_.getAs[Long]("n")).sum == Tables.lineitem(spark, sf).count())
    r.foreach { row =>
      val b = row.getAs[Long]("bucket")
      assert(row.getAs[Double]("lo") >= b * 5000.0 &&
        row.getAs[Double]("hi") < (b + 1) * 5000.0)
    }
  }

  test("json extraction recovers the typed field (q54)") {
    val r = SparkEntry.queries("q54_json_extract")(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Long]("min_k") <= row.getAs[Long]("max_k"))
      assert(row.getAs[Long]("sum_k") >= row.getAs[Long]("n") * row.getAs[Long]("min_k"))
    }
  }

  test("q114 mass propagation conserves mass up to DIV truncation") {
    import org.apache.spark.sql.functions._
    // rebuild the round-1 frame with the query's own spelling and check
    // the conservation envelope: each customer emits cdeg fragments of
    // 1e6 DIV cdeg, so Σ m1 ∈ (1e6·nCust − Σ cdeg, 1e6·nCust] — DIV
    // truncation loses < 1 unit per edge, and nothing else may leak
    val edges = Tables.orders(spark, sf).select($"o_orderkey", $"o_custkey")
      .join(Tables.lineitem(spark, sf).select($"l_orderkey", $"l_suppkey"),
        $"o_orderkey" === $"l_orderkey")
      .select($"o_custkey".as("c"), $"l_suppkey".as("p")).distinct().cache()
    val nCust = edges.select("c").distinct().count()
    val nEdges = edges.count()
    val cdeg = edges.groupBy("c").agg(count(lit(1)).as("cdeg"))
    val m1tot = edges.join(cdeg, Seq("c"))
      .select(expr("CAST(1000000 AS BIGINT) DIV cdeg").as("frag"))
      .agg(sum($"frag")).collect()(0).getLong(0)
    assert(m1tot <= 1000000L * nCust, "mass must never be created")
    assert(m1tot > 1000000L * nCust - nEdges, "only DIV truncation may lose mass")
    // and the query's top-20 is well-formed: strictly ordered, positive
    val top = SparkEntry.queries("q114_graph_mass_rank")(spark, sf).collect()
    assert(top.length == 20)
    val masses = top.map(_.getAs[Long]("mass"))
    assert(masses.sameElements(masses.sorted.reverse) && masses.forall(_ > 0))
    edges.unpersist()
  }

  test("q116 transition rows are a probability matrix up to DIV truncation") {
    val rows = SparkEntry.queries("q116_session_markov")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("prev")).foreach { case (prev, ts) =>
      val total = ts.map(_.getAs[Long]("prob_milli")).sum
      // each row truncates < 1 millis-unit, so the row sums to
      // (1000 - |next states|, 1000]
      assert(total <= 1000 && total > 1000 - ts.length,
        s"row '$prev' sums to $total over ${ts.length} states")
      ts.foreach(r => assert(r.getAs[Long]("n") > 0))
    }
  }

  test("q172 co-purchase lift matches a direct basket recount") {
    val rows = SparkEntry.queries("q172_copurchase_lift")(spark, sf)
      .select("part_a", "part_b", "c_ab", "c_a", "c_b", "lift_ppm")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty, "support floor left no pairs; fixture too sparse")
    val baskets = Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_partkey").distinct()
      .as[(Long, Long)].collect().toSeq
    val nOrders = baskets.map(_._1).distinct.size.toLong
    val cPart = baskets.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val cPair = baskets.groupBy(_._1).values.flatMap { items =>
      val ps = items.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.size) yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = cPair.filter(_._2 >= 3).map { case ((a, b), cab) =>
      (a, b, cab, cPart(a), cPart(b),
        cab * nOrders * 1000000L / (cPart(a) * cPart(b)))
    }.toSet
    assert(rows.toSet == expected, "lift table must equal the local recount")
    rows.foreach { case (a, b, cab, ca, cb, _) =>
      assert(a < b && cab >= 3 && cab <= ca && cab <= cb)
    }
    // the statistic DISCRIMINATES: some pair must sit above and some
    // below independence (1e6 ppm), or the fixture is uninformative
    assert(rows.exists(_._6 > 1000000L) && rows.exists(_._6 < 1000000L * 8),
      "lift values degenerate")
  }

  test("q180 RFM codes partition customers at the exact quartile fences") {
    val rows = SparkEntry.queries("q180_rfm_segments")(spark, sf)
      .select("r_code", "f_code", "n_customers", "sum_freq", "min_rec",
        "max_rec")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    val orders = Tables.orders(spark, sf)
      .select($"o_custkey", $"o_orderdate".cast("date").cast("string"))
      .as[(Long, String)].collect().toSeq
    val refd = java.time.LocalDate.parse(orders.map(_._2).max)
    val cust = orders.groupBy(_._1).map { case (c, os) =>
      val rec = java.time.temporal.ChronoUnit.DAYS
        .between(java.time.LocalDate.parse(os.map(_._2).max), refd)
      (c, rec, os.size.toLong)
    }.toSeq
    // conservation: every customer lands in exactly one segment
    assert(rows.map(_._3).sum == cust.size.toLong)
    assert(rows.map(_._4).sum == orders.size.toLong)
    // exact fences: percentile_disc(p) over each metric
    def fences(vs: Seq[Long]): (Long, Long, Long) = {
      val s = vs.sorted
      def d(num: Long, den: Long) = s(((num * s.size + den - 1) / den - 1).toInt)
      (d(1, 4), d(1, 2), d(3, 4))
    }
    val (r25, r50, r75) = fences(cust.map(_._2))
    val (f25, f50, f75) = fences(cust.map(_._3))
    def code(v: Long, a: Long, b: Long, c: Long): Long =
      1L + (if (v > a) 1 else 0) + (if (v > b) 1 else 0) +
        (if (v > c) 1 else 0)
    val expected = cust.groupBy { case (_, r, f) =>
      (code(r, r25, r50, r75), code(f, f25, f50, f75))
    }.map { case (k, cs) =>
      (k._1, k._2, cs.size.toLong, cs.map(_._3).sum,
        cs.map(_._2).min, cs.map(_._2).max)
    }.toSet
    assert(rows.toSet == expected, "segments must equal the local recompute")
    // recency bands never interleave across r_codes
    val byR = rows.groupBy(_._1)
    byR.keys.toSeq.sorted.sliding(2).foreach {
      case Seq(a, b) =>
        assert(byR(a).map(_._6).max <= byR(b).map(_._5).min,
          s"r_code $a overlaps $b in recency")
      case _ =>
    }
  }

  test("q206 streamed DFA == collect_list spelling (r9 verdict #2 law)") {
    import spark.implicits._
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"first_ev", $"converts", $"n_users", $"total_events")
        .as[(String, Boolean, Long, Long)].collect().toSeq
    val dfa = rows(SparkEntry.queries("q206_sequence_pattern")(spark, sf))
    val collected = rows(graft.operators.Analytics.sequencePatternCollect(spark, sf))
    assert(dfa == collected,
      s"DFA diverged from the collect spelling:\n  dfa=$dfa\n  collect=$collected")
    // the DFA plan must not buffer journeys: no collect_list anywhere
    val plan = SparkEntry.queries("q206_sequence_pattern")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("collect_list"),
      s"q206 plan still materializes per-user arrays:\n$plan")
  }

  test("pageRank: closed-form star-graph ranks, mass conservation, loop == single-task (q214 laws)") {
    import spark.implicits._
    // undirected star: center 0, leaves 1..3, symmetrized edges
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 0L), (2L, 0L), (3L, 0L))
      .toDF("src", "dst")
    val d = 0.85; val n = 4; val k = 3
    // closed form: r_c = (1-d)(1+dk) / (n(1-d^2)); r_l = (1-r_c)/k
    val rc = (1 - d) * (1 + d * k) / (n * (1 - d * d))
    val tol = 1e-10
    def ranks(lb: Long) = graft.operators.Analytics
      .pageRank(star, d, tol, maxIter = 500, localBudget = lb)
      .as[(Long, Double)].collect().sortBy(_._1)
    val local = ranks(100L) // 6 edges < 100 -> single-task route
    val looped = ranks(0L)  // force the distributed fixpoint loop
    assert(math.abs(local(0)._2 - rc) < 1e-8,
      s"star center rank ${local(0)._2} != closed form $rc")
    (1 to 3).foreach(i => assert(math.abs(local(i)._2 - (1 - rc) / 3) < 1e-8))
    assert(math.abs(local.map(_._2).sum - 1.0) < 1e-9, "rank mass must sum to 1")
    // both routes converge to the same fixpoint (fp round-off only)
    local.zip(looped).foreach { case ((i1, r1), (i2, r2)) =>
      assert(i1 == i2 && math.abs(r1 - r2) < 1e-8, s"route divergence at node $i1")
    }
    // the corpus query converges within its maxIter (throws otherwise)
    assert(SparkEntry.queries("q214_pagerank")(spark, sf).count() == 20)
    // exhausted maxIter must THROW, never return a partial rank
    val ex = intercept[Exception] {
      graft.operators.Analytics.pageRank(star, d, tol = 1e-15, maxIter = 2,
        localBudget = 100L).collect()
    }
    assert(ex.getMessage != null || ex.getCause != null)
  }

  test("pageRank: dangling-mass redistribution — closed form on a sink graph, route parity (r10 verdict #6)") {
    import spark.implicits._
    // directed 2-node graph with a sink: 1 -> 2, node 2 dangling.
    // With uniform dangling redistribution the fixpoint solves to
    // r1 = 1/(2+d), r2 = (1+d)/(2+d)  (substitute r2 = 1 - r1 into
    // r1 = (1-d)/2 + d*r2/2 — mass is conserved each round by the
    // redistribution, so the 2x2 system collapses to one equation).
    val sink = Seq((1L, 2L)).toDF("src", "dst")
    val d = 0.85
    val r1 = 1.0 / (2 + d)
    def ranks(lb: Long) = graft.operators.Analytics
      .pageRank(sink, d, tol = 1e-12, maxIter = 500, localBudget = lb,
        redistributeDangling = true)
      .as[(Long, Double)].collect().sortBy(_._1)
    val local = ranks(100L) // 1 edge < 100 -> single-task route
    val looped = ranks(0L)  // force the distributed fixpoint loop
    assert(math.abs(local(0)._2 - r1) < 1e-8,
      s"sink-graph source rank ${local(0)._2} != closed form $r1")
    assert(math.abs(local(1)._2 - (1 - r1)) < 1e-8)
    assert(math.abs(local.map(_._2).sum - 1.0) < 1e-9,
      "redistribution must conserve rank mass")
    local.zip(looped).foreach { case ((i1, v1), (i2, v2)) =>
      assert(i1 == i2 && math.abs(v1 - v2) < 1e-8, s"route divergence at node $i1")
    }
    // without the opt-in, BOTH routes must refuse the sink graph
    Seq(100L, 0L).foreach { lb =>
      val ex = intercept[Exception] {
        graft.operators.Analytics
          .pageRank(sink, d, tol = 1e-6, maxIter = 50, localBudget = lb).collect()
      }
      assert(ex.getMessage != null || ex.getCause != null)
    }
    Caches.releaseAll()
  }

  test("q172 a-priori support prefilter: prunes the pair stage's input, never its output (r10 verdict #3)") {
    import spark.implicits._
    // the c_ab >= 3 floor implies both parts have TOTAL count >= 3, so
    // semi-joining baskets against the frequent-part set before the
    // self-join must not change a row. The fixture corpus has NO long
    // tail (every sf0.001 part is bought >= 3 times), so the PRUNING
    // half of the law runs on a synthetic basket set with a once-bought
    // part: the prefilter must drop it from the pair stage's input.
    val tail = Seq((1L, 10L), (1L, 20L), (1L, 99L), (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 20L)).toDF("ok", "pk")
    val tailCnt = tail.groupBy("pk").agg(count(lit(1)).as("c"))
    val tailFreq = tail.join(tailCnt.filter(col("c") >= 3).select("pk"),
      Seq("pk"), "left_semi")
    assert(tailFreq.count() < tail.count(),
      "prefilter failed to prune the once-bought part from the pair input")
    assert(!tailFreq.select("pk").as[Long].collect().contains(99L))
    // and on the REAL corpus: unfiltered spelling == the production
    // (prefiltered) query, row for row
    val it = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val cnt = it.groupBy("pk").agg(count(lit(1)).as("c"))
    val n = it.select(countDistinct(col("ok")).as("n_orders"))
    val a = it.select(col("ok"), col("pk").as("part_a"))
    val b = it.select(col("ok").as("ok2"), col("pk").as("part_b"))
    val unfiltered = a.join(b, col("ok") === col("ok2") && col("part_a") < col("part_b"))
      .groupBy("part_a", "part_b").agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= 3)
      .join(cnt.select(col("pk").as("part_a"), col("c").as("c_a")), "part_a")
      .join(cnt.select(col("pk").as("part_b"), col("c").as("c_b")), "part_b")
      .crossJoin(broadcast(n))
      .withColumn("lift_ppm", expr("(c_ab * n_orders * 1000000) DIV (c_a * c_b)"))
      .select("part_a", "part_b", "c_ab", "c_a", "c_b", "lift_ppm")
      .collect().map(_.toSeq).toSet
    val prod = SparkEntry.queries("q172_copurchase_lift")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(prod == unfiltered && prod.nonEmpty,
      "support prefilter changed the lift output")
    Caches.releaseAll()
  }

  test("trade edge store equals the inline derivation (build-once serving law)") {
    val inline = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("p")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val served = graft.operators.Analytics.tradeEdges(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(served == inline && served.nonEmpty,
      s"trade store diverged: only-store=${(served -- inline).take(3)} " +
        s"only-inline=${(inline -- served).take(3)}")
    // customer→part flavor, same law
    val inlineCP = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val servedCP = graft.operators.Analytics.custPartEdges(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(servedCP == inlineCP && servedCP.nonEmpty)
  }

  test("co-purchase edge store equals the inline derivation (build-once serving law)") {
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").distinct()
    val inline = li.as("x")
      .join(li.as("y"), col("x.l_orderkey") === col("y.l_orderkey") &&
        col("x.l_partkey") < col("y.l_partkey"))
      .groupBy(col("x.l_partkey").as("u"), col("y.l_partkey").as("v"))
      .agg(count(lit(1)).as("c")).filter(col("c") >= 2)
      .select("u", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val served = graft.operators.Analytics.copurchaseEdges(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(served == inline,
      s"store diverged: only-store=${(served -- inline).take(3)} " +
        s"only-inline=${(inline -- served).take(3)}")
    // second serve reads the SAME memoized store (no rebuild): content
    // identical and the call is pure serving by construction (Scratch
    // memoizes per path per process)
    val again = graft.operators.Analytics.copurchaseEdges(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == served)
  }
}
