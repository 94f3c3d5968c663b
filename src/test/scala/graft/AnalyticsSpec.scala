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
    r.foreach(row => assert(row.getAs[Double]("rel_err") < 0.1))
  }
}
