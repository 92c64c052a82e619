package graft

import org.apache.spark.sql.functions._

/** TPC-H suite (SURVEY §2.1a, reference test/sql/tpch/tpch.test): every
  * query runs, and the plans carry the scale properties the adaptations
  * were designed around — decorrelated windows, semi/anti joins, TopN,
  * exchange reuse, no cartesian products anywhere.
  */
class TpchSpec extends SparkSpec {

  private def finalPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  /** Pre-execution plan: AQE empty-relation propagation can prune nodes
    * whose input happens to be empty at this tiny SF (e.g. h21's window
    * when no NATION_1 supplier ran late), so shape audits that must hold
    * at EVERY scale read the plan as compiled, not as collapsed. */
  private def compiledPlan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString

  private val hKeys = operators.Tpch.queries.keys.toSeq.sorted

  test("all 22 TPC-H queries execute and never plan a cartesian product") {
    assert(hKeys.size == 22)
    for (k <- hKeys) {
      val p = finalPlan(k)
      assert(!p.contains("CartesianProduct"), s"$k planned a cartesian:\n$p")
    }
  }

  test("h01: the six flag/status groups with positive measures") {
    val rows = SparkEntry.queries("h01_pricing")(spark, sfDir).collect()
    assert(rows.length == 6)
    assert(rows.forall(r => r.getDouble(r.fieldIndex("sum_qty")) > 0))
  }

  test("h02/h17: correlated subqueries run as ONE window pass") {
    for (k <- Seq("h02_min_cost_supp", "h17_small_qty")) {
      val p = compiledPlan(k)
      assert("Window \\[".r.findAllIn(p).size == 1, s"$k:\n$p")
      // decorrelation's whole point: no semi/anti self-join of the facts
      assert(!p.contains("SortMergeJoin"), s"$k:\n$p")
    }
  }

  test("h21: double correlation runs as shrinking hash aggs, no self-join") {
    val p = compiledPlan("h21_waiting_supplier")
    assert(!p.contains("Window"), p) // q33 lesson: aggs beat set-windows
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("h03/h10: ORDER BY + LIMIT plans as TakeOrderedAndProject") {
    assert(finalPlan("h03_shipping_priority").contains("TakeOrderedAndProject"))
    assert(finalPlan("h10_returned_items").contains("TakeOrderedAndProject"))
  }

  test("h04 semi-joins, h16/h22 anti-join their exclusion sets") {
    assert(finalPlan("h04_order_priority").contains("LeftSemi"))
    assert(finalPlan("h16_parts_supplier").contains("LeftAnti"))
    assert(finalPlan("h22_global_sales").contains("LeftAnti"))
  }

  test("h06: every predicate pushes into the parquet scan, agg is partial") {
    val p = finalPlan("h06_forecast_revenue")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("l_shipdate") && p.contains("l_discount"), p)
    assert(p.contains("partial_sum"), p)
  }

  test("h15: revenue view computed once — max branch reuses the exchange") {
    assert(finalPlan("h15_top_supplier").contains("ReusedExchange"))
  }

  test("h09: pseudo-partsupp joins back to lineitem without re-scanning" +
      " more than the derivation requires") {
    // partsupp derives FROM lineitem: expect exactly two lineitem scans
    // (derivation + facts), not three or more
    // final AQE section only — the echoed Initial Plan would double-count
    val p = finalPlan("h09_profit").split("== Initial Plan ==").head
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans <= 6, s"h09 scan explosion ($scans scans):\n$p")
  }

  test("h12: derived shipmode/commit/receipt stay map-side (no extra" +
      " exchange beyond the orders join and final sort)") {
    val p = finalPlan("h12_shipmode").split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 3, s"h12 shuffles too much ($exchanges):\n$p")
  }

  test("date-window predicates push into the parquet scan across the suite") {
    for (k <- Seq("h01_pricing", "h03_shipping_priority", "h05_local_supplier",
        "h06_forecast_revenue", "h10_returned_items", "h14_promo_effect")) {
      val p = finalPlan(k)
      assert(p.contains("PushedFilters: [") &&
        (p.contains("l_shipdate") || p.contains("o_orderdate")),
        s"$k lost its date pushdown:\n$p")
    }
  }

  test("dimension lookups broadcast in the multi-join queries") {
    for (k <- Seq("h05_local_supplier", "h07_volume_shipping",
        "h08_market_share", "h09_profit")) {
      assert(finalPlan(k).contains("BroadcastHashJoin"),
        s"$k broadcasts nothing")
    }
  }
}
