package graft

import org.apache.spark.sql.functions._
import graft.functions.Exact._
import graft.operators.Scale

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("salted two-phase aggregation is bit-identical to the plain plan (q44)") {
    val salted = SparkEntry.queries("q44_salted_agg")(spark, sf).collect().toSeq
    val plain = Tables.orders(spark, sf)
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), dsumd($"o_totalprice").as("sum_price"))
      .orderBy("o_orderpriority").collect().toSeq
    assert(salted == plain)
  }

  test("salted join is bit-identical to the plain join (q45)") {
    val salted = SparkEntry.queries("q45_skew_join")(spark, sf).collect().toSeq
    val li = Tables.lineitem(spark, sf)
      .select($"l_suppkey".as("s_suppkey"), $"l_quantity")
    val sup = Tables.supplier(spark, sf).select("s_suppkey", "s_nationkey")
    val plain = li.join(sup, "s_suppkey")
      .groupBy($"s_nationkey")
      .agg(count(lit(1)).as("n_items"), dsumd($"l_quantity").as("sum_qty"))
      .orderBy("s_nationkey").collect().toSeq
    assert(salted == plain)
  }

  test("salt spreads a hot key across all salt values") {
    val df = spark.range(10000).select(lit("HOT").as("k"), $"id")
    val spread = df.select(Scale.salt($"id", 16).as("s"))
      .distinct().count()
    assert(spread == 16, "every salt bucket must receive rows")
  }

  test("narrow+salted LSH survivors join emits exactly the wide pair set") {
    import graft.dedup.Dedup
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val sigs = Caches.cached(Dedup.minhashSignaturesTokens(docs, 5, 32))
    try {
      val wide = Dedup.lshSurvivorsWide(sigs, 8, 4, 0.7)
        .as[(Long, Long)].collect().toSet
      val narrow = Dedup.lshSurvivorsNarrow(sigs, 8, 4, 0.7)
        .as[(Long, Long)].collect().toSet
      assert(wide.nonEmpty, "fixture must produce survivors for the law to bite")
      assert(narrow == wide,
        s"cluster-shape survivors diverged: only-wide=${wide.diff(narrow)} " +
          s"only-narrow=${narrow.diff(wide)}")
      // the routed entry point picks the wide shape under the byte
      // budget and the narrow shape above it — both the same pair set
      val routedNarrow = Dedup.lshSurvivors(sigs, 8, 4, 0.7, narrowBudgetBytes = 0L)
        .as[(Long, Long)].collect().toSet
      assert(routedNarrow == wide)
    } finally Caches.releaseAll()
  }

  test("bucketed tables join with zero Exchange (co-located layout)") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Scale.writeBucketed(
        Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice"),
        "b_orders", "o_custkey", 8)
      Scale.writeBucketed(
        Tables.customer(spark, sf).select("c_custkey", "c_nationkey"),
        "b_customer", "c_custkey", 8)
      val j = spark.table("b_orders")
        .join(spark.table("b_customer"), $"o_custkey" === $"c_custkey")
      j.collect() // finalize the adaptive plan
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"bucketed join must not shuffle or broadcast either side:\n$p")
      // and the layout is real: same join result as the unbucketed plan
      assert(j.count() ==
        Tables.orders(spark, sf).join(Tables.customer(spark, sf),
          $"o_custkey" === $"c_custkey").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
