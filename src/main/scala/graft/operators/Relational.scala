package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.Tables

/** Relational query surface (SURVEY.md §2.1).
  *
  * The reference proves its scan layer by running full SQL over document
  * collections (reference: test/sql/tpch/tpch.test:1, test/sql/query/
  * aggregations.test:1, benchmarks/pushdown_queries.sql:1). Here the same
  * query shapes are declared with the DataFrame API so Catalyst plans the
  * pushdowns the reference hand-implements (filter/projection/limit/TopN/
  * partial-agg into the scan).
  *
  * Oracle-parity rules (SURVEY.md §5):
  *   - money math in exact DECIMAL, cast to DOUBLE only at the end, so the
  *     result is bit-identical regardless of partition/summation order —
  *     at 100 TB the summation order is never reproducible, exactness is
  *     the only portable answer;
  *   - every query has a total deterministic ORDER BY;
  *   - aliases match the oracle SQL exactly.
  *
  * Scale notes per query inline; the recurring ones:
  *   - dimension joins (region/nation/supplier/part/customer) are
  *     broadcast — at 100 TB the fact tables dominate, dims stay ≤ GBs;
  *   - groupBy/agg is declarative → Catalyst plans partial (map-side)
  *     aggregation before the shuffle;
  *   - TopN (orderBy+limit) plans as TakeOrderedAndProject — no global
  *     sort shuffle.
  */
object Relational {

  /** Exact money: double column → DECIMAL(12,2) (testdata values carry ≤2
    * decimals; 12 digits holds single-item money at any SF).
    */
  private def dec(c: Column): Column = c.cast(DecimalType(12, 2))
  /** extendedprice * (1 - discount) in exact decimal. */
  private def discPrice(price: Column, disc: Column): Column =
    dec(price) * (lit(1).cast(DecimalType(3, 2)) - dec(disc))
  private def asDouble(c: Column): Column = c.cast(DoubleType)

  // ---------------------------------------------------------------- q01
  /** TPC-H Q1 shape: scan→filter→groupBy→rich agg→sort.
    * Scale: filter + 4-column projection pushed to parquet; partial agg on
    * 6 groups → shuffle carries 6 rows/partition.
    */
  def q01(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    li.filter(col("l_shipdate") <= lit("1998-09-01").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        asDouble(sum(dec(col("l_quantity")))).as("sum_qty"),
        asDouble(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
        // money sums ROUND TO 2dp before the one double cast, and the
        // charge factors compress to (18,4) × (4,2) — Tpch.h01's
        // round-13 full-sf1 findings apply identically here (precision
        // 40 per-row rounding + adjacent-double casts past 15.95 sig
        // digits)
        asDouble(round(
          sum(discPrice(col("l_extendedprice"), col("l_discount"))), 2))
          .as("sum_disc_price"),
        asDouble(round(sum(
          discPrice(col("l_extendedprice"), col("l_discount"))
            .cast(DecimalType(18, 4)) *
          (lit(1).cast(DecimalType(3, 2)) +
            col("l_tax").cast(DecimalType(3, 2)))), 2)).as("sum_charge"),
        (asDouble(sum(dec(col("l_quantity")))) / count(col("l_quantity")))
          .as("avg_qty"),
        (asDouble(sum(dec(col("l_extendedprice")))) / count(col("l_extendedprice")))
          .as("avg_price"),
        (asDouble(sum(dec(col("l_discount")))) / count(col("l_discount")))
          .as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS sum_disc_price,
      |  CAST(ROUND(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4)) * (1 + CAST(l_tax AS DECIMAL(3,2)))), 2) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q02
  /** Predicate + projection pushdown: the reference pushes WHERE and the
    * SELECT column set into the Mongo find (reference:
    * src/mongo_filter_pushdown.cpp:1). Here both reach the parquet scan —
    * `.explain` shows PushedFilters + a 4-column ReadSchema.
    */
  def q02(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "part")
      .filter(col("p_size") > 30 && col("p_type") === "PROMO")
      .select(col("p_partkey"), col("p_name"), col("p_brand"),
        asDouble(dec(col("p_retailprice"))).as("retail"))
      .orderBy(col("p_partkey"))

  val q02Sql: String =
    """SELECT p_partkey, p_name, p_brand,
      |  CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS DOUBLE) AS retail
      |FROM part WHERE p_size > 30 AND p_type = 'PROMO'
      |ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- q03
  /** TPC-H Q3 shape: join + agg + TopN. Scale: customer filter broadcast
    * into orders; orderBy+limit plans as TakeOrderedAndProject (per-
    * partition top-k, no global sort).
    */
  def q03(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") < lit("1998-01-01").cast(TimestampType))
    val li = Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1998-01-01").cast(TimestampType))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(asDouble(sum(discPrice(col("l_extendedprice"), col("l_discount"))))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q03Sql: String =
    """SELECT l_orderkey, o_orderdate,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q04
  /** EXISTS with a correlated non-equi condition → left-semi join.
    * Scale: semi join shuffles on orderkey only; no row multiplication.
    */
  def q04(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
        col("o_orderdate") < lit("1997-01-01").cast(TimestampType))
    val li = Tables(spark, dir, "lineitem")
    ord.join(li,
        ord("o_orderkey") === li("l_orderkey") &&
          li("l_shipdate") > ord("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  val q04Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q05
  /** TPC-H Q5 shape: 6-way join + agg. Scale: region→nation→supplier/
    * customer chain is all broadcast (dims); only orders⋈lineitem
    * shuffles, on orderkey.
    */
  def q05(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables(spark, dir, "region").filter(col("r_name") === "ASIA")
    val nation = Tables(spark, dir, "nation")
    val cust = Tables(spark, dir, "customer")
    val supp = Tables(spark, dir, "supplier")
    val ord = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
        col("o_orderdate") < lit("1998-01-01").cast(TimestampType))
    val li = Tables(spark, dir, "lineitem")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(asDouble(sum(discPrice(col("l_extendedprice"), col("l_discount"))))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q05Sql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  // ---------------------------------------------------------------- q06
  /** TPC-H Q6 shape: tight range filter + single global agg. Scale: all
    * three predicates push to parquet row-group stats; partial sums →
    * one-row shuffle.
    */
  def q06(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
        col("l_shipdate") < lit("1997-01-01").cast(TimestampType) &&
        col("l_discount") >= 0.02 && col("l_discount") <= 0.06 &&
        col("l_quantity") < 24)
      .agg(asDouble(sum(dec(col("l_extendedprice")) * dec(col("l_discount"))))
        .as("revenue"))

  val q06Sql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount >= 0.02 AND l_discount <= 0.06
      |  AND l_quantity < 24""".stripMargin

  // ---------------------------------------------------------------- q07
  /** COUNT(*) pushdown analog (reference: test/sql/query/count_pushdown
    * .test:1, benchmarks count_filtered). Catalyst answers COUNT over
    * parquet from row-group metadata when unfiltered; filtered count scans
    * only the filter column.
    */
  def q07(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    li.agg(
      count(lit(1)).as("n_all"),
      count(when(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType), 1))
        .as("n_since96"))
  }

  val q07Sql: String =
    """SELECT COUNT(*) AS n_all,
      |  COUNT(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' THEN 1 END) AS n_since96
      |FROM lineitem""".stripMargin

  // ---------------------------------------------------------------- q08
  /** GROUP BY + HAVING (reference: test/sql/query/groupby_pushdown.test:1
    * pushes the group+agg into a Mongo $group stage; Spark's partial agg
    * is the same idea distributed).
    */
  def q08(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        asDouble(sum(dec(col("o_totalprice")))).as("spend"))
      .filter(col("n_orders") >= 15)
      .orderBy(col("spend").desc, col("o_custkey"))

  val q08Sql: String =
    """SELECT o_custkey, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS spend
      |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15
      |ORDER BY spend DESC, o_custkey""".stripMargin

  // ---------------------------------------------------------------- q09
  def q09(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"))
      .distinct()
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q09Sql: String =
    """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q10
  /** IN-list filter — the reference pushes semi-join IN as Mongo `$in`
    * (reference: src/mongo_filter_pushdown.cpp:1).
    */
  def q10(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "customer")
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY", "AUTOMOBILE"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        asDouble(sum(dec(col("c_acctbal")))).as("bal"))
      .orderBy(col("c_mktsegment"))

  val q10Sql: String =
    """SELECT c_mktsegment, COUNT(*) AS n,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal
      |FROM customer
      |WHERE c_mktsegment IN ('BUILDING','MACHINERY','AUTOMOBILE')
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- q11
  /** Top-3 orders per customer — rank window. Scale: single shuffle on
    * o_custkey; rank filter applied streaming within each partition.
    */
  def q11(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables(spark, dir, "orders")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"),
        asDouble(dec(col("o_totalprice"))).as("price"),
        col("rk").cast(LongType).as("rk"))
      .orderBy(col("o_custkey"), col("rk"))
  }

  val q11Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price, rk
      |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
      |        ROW_NUMBER() OVER (PARTITION BY o_custkey
      |          ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |      FROM orders) t
      |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin

  // ---------------------------------------------------------------- q12
  /** Running-sum window with explicit ROWS frame (deterministic under
    * ties thanks to the unique o_orderkey sort key; exact decimal keeps
    * the running values order-independent).
    */
  def q12(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, dir, "orders")
      .filter(col("o_custkey") < 100)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        asDouble(sum(dec(col("o_totalprice"))).over(w)).as("running_spend"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  val q12Sql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
      |FROM orders WHERE o_custkey < 100
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q13
  /** TPC-H Q13 shape: LEFT OUTER join + two-level agg; counts on the
    * nullable side.
    */
  def q13(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables(spark, dir, "customer")
    val ord = Tables(spark, dir, "orders")
      .filter(col("o_orderstatus") =!= "P")
    cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q13Sql: String =
    """SELECT c_count, COUNT(*) AS custdist FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderstatus <> 'P'
      |  GROUP BY c_custkey) c
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  // ---------------------------------------------------------------- q14
  /** TPC-H Q14 shape: CASE inside aggregate (promo revenue share). */
  def q14(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast(TimestampType) &&
        col("l_shipdate") < lit("1997-02-01").cast(TimestampType))
    val part = Tables(spark, dir, "part")
    val rev = discPrice(col("l_extendedprice"), col("l_discount"))
    li.join(part, col("l_partkey") === col("p_partkey"))
      .agg((lit(100.0) *
        asDouble(sum(when(col("p_type") === "PROMO", rev)
          .otherwise(lit(0).cast(DecimalType(12, 2))))) /
        asDouble(sum(rev))).as("promo_revenue"))
  }

  val q14Sql: String =
    """SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
      |    THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))
      |    ELSE 0 END) AS DOUBLE)
      |  / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS promo_revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-02-01 00:00:00'""".stripMargin

  // ---------------------------------------------------------------- q15
  /** TPC-H Q15 shape: agg-of-agg via self-reference — suppliers whose
    * revenue equals the max. Exact decimals make the max comparison safe.
    */
  def q15(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
        col("l_shipdate") < lit("1996-04-01").cast(TimestampType) &&
        // explicit, so BOTH consumers of `rev` see the identical subtree:
        // without it the supplier join infers isnotnull(l_suppkey) on one
        // branch only, the exchanges stop being equal, and Spark loses
        // ReusedExchange — scanning lineitem twice instead of once
        col("l_suppkey").isNotNull)
    val rev = li.groupBy(col("l_suppkey"))
      .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
        .as("total_rev_dec"))
    val maxRev = rev.agg(max(col("total_rev_dec")).as("mx"))
    val supp = Tables(spark, dir, "supplier")
    rev.join(broadcast(maxRev), col("total_rev_dec") === col("mx"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        asDouble(col("total_rev_dec")).as("total_rev"))
      .orderBy(col("s_suppkey"))
  }

  val q15Sql: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS total_rev_dec
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, CAST(total_rev_dec AS DOUBLE) AS total_rev
      |FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |WHERE total_rev_dec = (SELECT MAX(total_rev_dec) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  // ---------------------------------------------------------------- q16
  /** substr/LIKE-prefix filter — the reference rewrites `substr(col,1,n) =
    * 'x'` and `LIKE 'x%'` into Mongo anchored $regex (reference:
    * test/sql/query/substr_filter_pushdown.test:1). Spark pushes
    * StringStartsWith to parquet.
    */
  def q16(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "part")
      .filter(substring(col("p_type"), 1, 4) === "PROM" &&
        col("p_brand").startsWith("Brand#1"))
      .groupBy(col("p_brand"), col("p_type"))
      .agg(count(lit(1)).as("n"), max(col("p_size")).as("max_size"))
      .orderBy(col("p_brand"), col("p_type"))

  val q16Sql: String =
    """SELECT p_brand, p_type, COUNT(*) AS n, MAX(p_size) AS max_size
      |FROM part
      |WHERE substr(p_type, 1, 4) = 'PROM' AND p_brand LIKE 'Brand#1%'
      |GROUP BY p_brand, p_type ORDER BY p_brand, p_type""".stripMargin

  // ---------------------------------------------------------------- q17
  /** TPC-H Q17 shape: correlated avg subquery, decorrelated as a window.
    *
    * Scale: the per-part avg only matters for parts that survive the
    * brand filter, so filter FIRST (one lineitem scan, ~1/25 of rows),
    * then one shuffle on l_partkey computes the window avg and the
    * correlated comparison in the same pass. The naive two-scan plan
    * (full-lineitem groupBy + join back) reads lineitem twice and
    * shuffles every partkey — 25× more rows moved at 100 TB.
    */
  def q17(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val part = Tables(spark, dir, "part").filter(col("p_brand") === "Brand#1")
    val w = Window.partitionBy(col("l_partkey"))
    li.join(part, col("l_partkey") === col("p_partkey"))
      .withColumn("avg_qty",
        asDouble(sum(dec(col("l_quantity"))).over(w)) /
          count(col("l_quantity")).over(w))
      .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
      .agg((asDouble(sum(dec(col("l_extendedprice")))) / lit(7.0))
        .as("avg_yearly"))
  }

  val q17Sql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand = 'Brand#1'
      |  AND l_quantity < 0.5 * (
      |    SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l2.l_quantity)
      |    FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)""".stripMargin

  // ---------------------------------------------------------------- q18
  /** TPC-H Q18 shape: group-agg feeding a semi-join back to the facts.
    * Scale: the "big orders" key set is selective; stats/AQE pick a
    * broadcast join when it fits, shuffle join when it doesn't — no
    * forced hint, since the set grows with the data.
    */
  def q18(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val big = li.groupBy(col("l_orderkey").as("bk"))
      .agg(sum(dec(col("l_quantity"))).as("sum_qty_dec"))
      .filter(col("sum_qty_dec") > 150)
    val ord = Tables(spark, dir, "orders")
    val cust = Tables(spark, dir, "customer")
    ord.join(big, col("o_orderkey") === col("bk"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), asDouble(dec(col("o_totalprice"))).as("price"),
        asDouble(col("sum_qty_dec")).as("sum_qty"))
      .orderBy(col("price").desc, col("o_orderkey"))
      .limit(100)
  }

  val q18Sql: String =
    """SELECT c_name, c_custkey, o_orderkey, o_orderdate,
      |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price,
      |  CAST(sum_qty_dec AS DOUBLE) AS sum_qty
      |FROM orders
      |JOIN (SELECT l_orderkey AS bk, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty_dec
      |      FROM lineitem GROUP BY l_orderkey
      |      HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150) big
      |  ON o_orderkey = bk
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY price DESC, o_orderkey LIMIT 100""".stripMargin

  // ---------------------------------------------------------------- q19
  /** OR-of-ANDs predicate (reference: test/sql/query/complex_filters
    * .test:1 pushes $or/$and trees). Catalyst splits the common
    * conjuncts and pushes the disjunction to the scan.
    */
  def q19(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val part = Tables(spark, dir, "part")
    li.join(part, col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("l_quantity") >= 1 &&
          col("l_quantity") <= 20 && col("p_size") <= 25) ||
        (col("p_brand") === "Brand#2" && col("l_quantity") >= 10 &&
          col("l_quantity") <= 30 && col("p_size") <= 40))
      .agg(asDouble(sum(discPrice(col("l_extendedprice"), col("l_discount"))))
        .as("revenue"), count(lit(1)).as("n"))
  }

  val q19Sql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 20 AND p_size <= 25)
      |   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 30 AND p_size <= 40)""".stripMargin

  // ---------------------------------------------------------------- q20
  /** NOT EXISTS → left-anti join: parts never shipped with discount ≥
    * 0.08. Scale: anti join shuffles keys only.
    */
  def q20(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem").filter(col("l_discount") >= 0.08)
    Tables(spark, dir, "part")
      .join(li, col("p_partkey") === col("l_partkey"), "left_anti")
      .select(col("p_partkey"), col("p_name"))
      .orderBy(col("p_partkey"))
  }

  val q20Sql: String =
    """SELECT p_partkey, p_name FROM part
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem
      |  WHERE l_partkey = p_partkey AND l_discount >= 0.08)
      |ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- q21
  /** CTE reused twice: national revenue vs the global average (the
    * reference gets WITH for free from DuckDB; Spark reuses the subplan
    * via exchange reuse).
    */
  def q21(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val supp = Tables(spark, dir, "supplier")
    val nation = Tables(spark, dir, "nation")
    val natRev = li
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
        .as("rev_dec"))
    // The CTE is referenced twice; the DataFrame API would recompute the
    // whole lineitem aggregation for the scalar average. A whole-frame
    // window over the ~|nations| aggregated rows computes it in the same
    // pass — one lineitem scan instead of two. (The single-partition
    // window is over post-agg rows only, never the facts.)
    val w = Window.partitionBy()
    natRev
      .withColumn("avg_rev",
        asDouble(sum(col("rev_dec")).over(w)) / count(lit(1)).over(w))
      .filter(asDouble(col("rev_dec")) > col("avg_rev"))
      .select(col("n_name"), asDouble(col("rev_dec")).as("revenue"),
        col("avg_rev"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q21Sql: String =
    """WITH nat_rev AS (
      |  SELECT n_name,
      |    SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS rev_dec
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  GROUP BY n_name),
      |avg_rev AS (
      |  SELECT CAST(SUM(rev_dec) AS DOUBLE) / COUNT(*) AS avg_rev FROM nat_rev)
      |SELECT n_name, CAST(rev_dec AS DOUBLE) AS revenue, avg_rev
      |FROM nat_rev, avg_rev
      |WHERE CAST(rev_dec AS DOUBLE) > avg_rev
      |ORDER BY revenue DESC, n_name""".stripMargin

  // ---------------------------------------------------------------- q22
  /** UNION ALL of two branches + agg on the union. */
  def q22(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables(spark, dir, "orders")
    val hi = ord.filter(col("o_totalprice") > 400000)
      .select(lit("high").as("bucket"), col("o_totalprice"))
    val lo = ord.filter(col("o_totalprice") < 50000)
      .select(lit("low").as("bucket"), col("o_totalprice"))
    hi.unionAll(lo)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        asDouble(sum(dec(col("o_totalprice")))).as("total"))
      .orderBy(col("bucket"))
  }

  val q22Sql: String =
    """SELECT bucket, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      |FROM (
      |  SELECT 'high' AS bucket, o_totalprice FROM orders WHERE o_totalprice > 400000
      |  UNION ALL
      |  SELECT 'low' AS bucket, o_totalprice FROM orders WHERE o_totalprice < 50000)
      |GROUP BY bucket ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------- q23
  /** Multi-key sort + limit → TakeOrderedAndProject (the TopN the
    * reference pushes as `ORDER BY _id LIMIT n`, reference:
    * test/sql/query/topn_pushdown.test:1, generalized to any key).
    */
  def q23(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_linestatus"), asDouble(dec(col("l_extendedprice"))).as("price"))
      .orderBy(col("l_returnflag").desc, col("l_linestatus"),
        col("price").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(100)

  val q23Sql: String =
    """SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus,
      |  CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DOUBLE) AS price
      |FROM lineitem
      |ORDER BY l_returnflag DESC, l_linestatus, price DESC, l_orderkey, l_linenumber
      |LIMIT 100""".stripMargin

  // ---------------------------------------------------------------- q24
  /** Date functions: monthly revenue roll-up (Date→TIMESTAMP mapping is
    * the reference's BSON Date rule, README "BSON Type Mapping").
    */
  def q24(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"),
        year(col("o_orderdate")).cast(LongType).as("yr"))
      .agg(count(lit(1)).as("n_orders"),
        asDouble(sum(dec(col("o_totalprice")))).as("revenue"))
      .orderBy(col("month"))

  val q24Sql: String =
    """SELECT date_trunc('month', o_orderdate) AS month,
      |  CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      |FROM orders
      |GROUP BY 1, 2 ORDER BY month""".stripMargin

  // --------------------------------------------------------------- q25
  /** ROLLUP hierarchy totals (flag → flag+status → grand total). Subtotal
    * rows are labeled 'ALL' so ordering is deterministic across engines
    * (Spark sorts NULLS FIRST, DuckDB NULLS LAST — sentinel sidesteps
    * both). Scale: rollup is a single pass — Spark expands grouping sets
    * map-side, one shuffle. */
  def q25(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        asDouble(sum(dec(col("l_quantity")))).as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("n"), col("sum_qty"))
      .orderBy(col("rf"), col("ls"))

  val q25Sql: String =
    """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
      |  COALESCE(l_linestatus, 'ALL') AS ls,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY rf, ls""".stripMargin

  // --------------------------------------------------------------- q26
  /** Set operators INTERSECT / EXCEPT (distinct semantics in both
    * engines): customers with both fulfilled and open orders, minus
    * those who ever placed an urgent order. Scale: both ops hash-shuffle
    * on the key only — never materialize the full rows. */
  def q26(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables(spark, dir, "orders")
    val f = orders.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    val o = orders.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
    val urgent = orders.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    f.intersect(o).except(urgent).orderBy(col("o_custkey"))
  }

  val q26Sql: String =
    """(SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      | INTERSECT
      | SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |ORDER BY o_custkey""".stripMargin

  // --------------------------------------------------------------- q27
  /** PIVOT: order counts per market segment × priority, priorities as
    * columns. Spark's relational pivot with an EXPLICIT value list — the
    * implicit form runs a distinct-values job first AND couldn't be
    * planned as one pass; explicit values keep it a single partial-agg
    * shuffle on c_mktsegment (the pivot is just a CASE fan-out map-side).
    */
  def q27(spark: SparkSession, dir: String): DataFrame = {
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val ord = Tables(spark, dir, "orders")
    val cust = Tables(spark, dir, "customer")
    ord.join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .pivot("o_orderpriority", prios)
      .agg(count(lit(1)))
      .select(col("c_mktsegment"),
        coalesce(col("`1-URGENT`"), lit(0L)).as("urgent"),
        coalesce(col("`2-HIGH`"), lit(0L)).as("high"),
        coalesce(col("`3-MEDIUM`"), lit(0L)).as("medium"),
        coalesce(col("`4-NOT SPECIFIED`"), lit(0L)).as("notspec"),
        coalesce(col("`5-LOW`"), lit(0L)).as("low"))
      .orderBy(col("c_mktsegment"))
  }

  val q27Sql: String =
    """SELECT c_mktsegment,
      |  COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS urgent,
      |  COUNT(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS high,
      |  COUNT(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS medium,
      |  COUNT(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS notspec,
      |  COUNT(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS low
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // --------------------------------------------------------------- q28
  /** Exact percentiles per group (linear interpolation — both engines use
    * the (n−1)·p convention, so values agree to the rounding).
    *
    * Scale: exact percentile buffers each group's values — fine for
    * bounded groups like these 5 priorities; for high-cardinality groups
    * at 100 TB switch to `approx_percentile` (t-digest sketch, mergeable
    * map-side, bounded memory) and accept the ε.
    */
  def q28(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        round(expr("percentile(o_totalprice, 0.25)"), 4).as("p25"),
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
        round(expr("percentile(o_totalprice, 0.99)"), 4).as("p99"))
      .orderBy(col("o_orderpriority"))

  val q28Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS n,
      |  ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
      |  ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
      |  ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90,
      |  ROUND(quantile_cont(o_totalprice, 0.99), 4) AS p99
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // --------------------------------------------------------------- q29
  /** CUBE over (returnflag, linestatus): all 4 grouping-set combinations
    * in ONE pass — Spark expands the sets map-side (×4 partial-agg rows),
    * single shuffle; same sentinel trick as q25 for cross-engine ordering.
    */
  def q29(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        asDouble(sum(dec(col("l_extendedprice")))).as("sum_price"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("n"), col("sum_price"))
      .orderBy(col("rf"), col("ls"))

  val q29Sql: String =
    """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
      |  COALESCE(l_linestatus, 'ALL') AS ls,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
      |FROM lineitem
      |GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY rf, ls""".stripMargin

  // --------------------------------------------------------------- q30
  /** Window navigation functions: lag/lead/first/nth over the per-customer
    * order timeline — one shuffle on the partition key, every function
    * evaluated in the same streaming window pass.
    */
  def q30(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables(spark, dir, "orders")
      .filter(col("o_custkey") < 100)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        lag(col("o_orderkey"), 1).over(w).as("prev_order"),
        lead(col("o_orderkey"), 1).over(w).as("next_order"),
        first(col("o_orderkey")).over(w).as("first_order"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_order"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  val q30Sql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  lag(o_orderkey, 1) OVER w AS prev_order,
      |  lead(o_orderkey, 1) OVER w AS next_order,
      |  first_value(o_orderkey) OVER w AS first_order,
      |  nth_value(o_orderkey, 2) OVER w AS second_order
      |FROM orders WHERE o_custkey < 100
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin

  // --------------------------------------------------------------- q31
  /** String-function surface: the scalar functions the reference gets
    * from DuckDB over its scans, all codegen'd map-side in Spark —
    * upper/lower/length/substr/reverse/pad/translate/replace/
    * split_part/instr/concat_ws, every value cross-checked.
    */
  def q31(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "customer")
      .filter(col("c_custkey") < 200)
      .select(col("c_custkey"),
        upper(col("c_mktsegment")).as("seg_up"),
        lower(col("c_name")).as("name_lo"),
        length(col("c_name")).cast(LongType).as("name_len"),
        reverse(col("c_name")).as("name_rev"),
        substring(col("c_name"), 10, 5).as("name_mid"),
        lpad(col("c_mktsegment"), 12, "*").as("seg_pad"),
        rpad(col("c_mktsegment"), 12, ".").as("seg_rpad"),
        translate(col("c_name"), "0123456789", "oizeasgtbq").as("name_tr"),
        regexp_replace(col("c_name"), "0+", "0").as("name_sq"),
        split(col("c_name"), "#").getItem(1).as("name_num"),
        instr(col("c_name"), "#").cast(LongType).as("hash_pos"),
        concat_ws("-", col("c_mktsegment"), col("c_name")).as("seg_name"))
      .orderBy(col("c_custkey"))

  val q31Sql: String =
    """SELECT c_custkey,
      |  upper(c_mktsegment) AS seg_up,
      |  lower(c_name) AS name_lo,
      |  CAST(length(c_name) AS BIGINT) AS name_len,
      |  reverse(c_name) AS name_rev,
      |  substr(c_name, 10, 5) AS name_mid,
      |  lpad(c_mktsegment, 12, '*') AS seg_pad,
      |  rpad(c_mktsegment, 12, '.') AS seg_rpad,
      |  translate(c_name, '0123456789', 'oizeasgtbq') AS name_tr,
      |  regexp_replace(c_name, '0+', '0', 'g') AS name_sq,
      |  split_part(c_name, '#', 2) AS name_num,
      |  CAST(strpos(c_name, '#') AS BIGINT) AS hash_pos,
      |  concat_ws('-', c_mktsegment, c_name) AS seg_name
      |FROM customer WHERE c_custkey < 200
      |ORDER BY c_custkey""".stripMargin

  // --------------------------------------------------------------- q32
  /** Date/time-function surface: extraction fields, arithmetic, and
    * boundary functions over the BSON-Date-mapped timestamps — all
    * map-side; cross-engine parity pins each function's semantics
    * (dayofweek is 1=Sunday in Spark = DuckDB dow+1).
    */
  def q32(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .filter(col("o_custkey") < 50)
      .select(col("o_orderkey"), col("o_orderdate"),
        year(col("o_orderdate")).cast(LongType).as("yr"),
        quarter(col("o_orderdate")).cast(LongType).as("qtr"),
        month(col("o_orderdate")).cast(LongType).as("mon"),
        dayofmonth(col("o_orderdate")).cast(LongType).as("dom"),
        dayofweek(col("o_orderdate")).cast(LongType).as("dow1"),
        date_add(col("o_orderdate"), 30).as("plus30"),
        add_months(col("o_orderdate"), 2).as("plus2mo"),
        last_day(col("o_orderdate")).as("month_end"),
        datediff(lit("2000-01-01").cast(DateType), col("o_orderdate"))
          .cast(LongType).as("days_to_y2k"),
        unix_timestamp(col("o_orderdate")).as("epoch_sec"))
      .orderBy(col("o_orderkey"))

  val q32Sql: String =
    """SELECT o_orderkey, o_orderdate,
      |  CAST(year(o_orderdate) AS BIGINT) AS yr,
      |  CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
      |  CAST(month(o_orderdate) AS BIGINT) AS mon,
      |  CAST(day(o_orderdate) AS BIGINT) AS dom,
      |  CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow1,
      |  CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus30,
      |  CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS plus2mo,
      |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
      |  date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
      |  CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_sec
      |FROM orders WHERE o_custkey < 50
      |ORDER BY o_orderkey""".stripMargin

  // --------------------------------------------------------------- q33
  /** TPC-H Q21 shape: doubly-correlated EXISTS + NOT EXISTS on the same
    * fact table — suppliers who were the SOLE returning supplier on
    * multi-supplier orders.
    *
    * Scale: the naive form is three lineitem scans and two key shuffles
    * (semi + anti). Both correlations only ask per-order facts, so they
    * decorrelate into ONE window pass: a single scan, a single shuffle
    * on l_orderkey computing the per-order supplier sets, filters
    * map-side after (the q17 trick, doubled). The oracle keeps the
    * EXISTS/NOT EXISTS formulation — two independently derived plans
    * must agree.
    */
  def q33(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
    val supp = Tables(spark, dir, "supplier")
    // Two-level hash aggregation instead of a collect_set window: the
    // window form sorts every partition and materializes per-order
    // supplier SETS as JVM objects outside codegen; aggregating
    // (order, supp) → order keeps the whole chain in codegen'd
    // HashAggregates with map-side partial combine, and each level
    // SHRINKS the data (pairs → orders → suppliers) instead of carrying
    // every lineitem row through a sort.
    val perSupp = li
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("r_rows"))
    val perOrder = perSupp
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_supps"),
        sum(when(col("r_rows") > 0, 1L).otherwise(0L)).as("n_ret_supps"),
        max(when(col("r_rows") > 0, col("l_suppkey"))).as("ret_supp"),
        sum(col("r_rows")).as("r_tot"))
    // sole returning supplier on a multi-supplier order: all R rows of
    // the order belong to ret_supp, so its l1-row count is r_tot
    perOrder
      .filter(col("n_supps") > 1 && col("n_ret_supps") === 1)
      .groupBy(col("ret_supp"))
      .agg(sum(col("r_tot")).as("numwait"))
      .join(supp, col("ret_supp") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey"))
      .limit(20)
  }

  val q33Sql: String =
    """SELECT s_suppkey, s_name, COUNT(*) AS numwait
      |FROM lineitem l1 JOIN supplier ON l1.l_suppkey = s_suppkey
      |WHERE l1.l_returnflag = 'R'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_returnflag = 'R')
      |GROUP BY s_suppkey, s_name
      |ORDER BY numwait DESC, s_suppkey LIMIT 20""".stripMargin

  // --------------------------------------------------------------- q34
  /** Explicit GROUPING SETS — the generalization q25's ROLLUP and q29's
    * CUBE are shorthands for, exercising a set mix NEITHER can express:
    * ((rf, ls), (linenumber), ()) — two different dimension branches plus
    * the grand total, skipping every other combination. Same one-pass
    * scale shape (map-side set expansion, single shuffle) and the same
    * 'ALL' sentinel for cross-engine NULL ordering.
    */
  def q34(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_linenumber")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"), col("l_linenumber"))
      .agg(count(lit(1)).as("n"),
        asDouble(sum(dec(col("l_quantity")))).as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        coalesce(col("l_linenumber").cast("long"), lit(-1L)).as("ln"),
        col("n"), col("sum_qty"))
      .orderBy(col("rf"), col("ls"), col("ln"))

  val q34Sql: String =
    """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
      |  COALESCE(l_linestatus, 'ALL') AS ls,
      |  COALESCE(CAST(l_linenumber AS BIGINT), -1) AS ln,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
      |  (l_linenumber), ())
      |ORDER BY rf, ls, ln""".stripMargin

  // --------------------------------------------------------------- q35
  /** WITH RECURSIVE — Spark 4's native recursion (SPARK-24497), the SQL
    * face of the reference's $graphLookup BFS (d13 hand-rolls the same
    * loop in DataFrame code; dd06's CC loop is its corpus-scale
    * sibling): minimum-hop reachability from nation 0 over a graph with
    * same-region cluster edges plus consecutive-key bridge edges, depth
    * ≤ 4. The engine runs the iterate-union-dedup loop the d13/dd06
    * implementations spell out manually.
    *
    * Scale: recursion over the bounded DIMENSION graph (|nation| rows
    * per level, joins broadcast); a corpus-sized graph stays on the
    * explicit-loop form (dd06) where per-iteration checkpointing is
    * under our control. Cross-engine: hop counts are integers, MIN is
    * exact, identical SQL runs on DuckDB.
    */
  def q35(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "nation").createOrReplaceTempView("q35_nation")
    spark.sql(
      """WITH RECURSIVE hops(n_nationkey, h) AS (
        |  SELECT n_nationkey, 0 FROM q35_nation WHERE n_nationkey = 0
        |  UNION ALL
        |  SELECT m.n_nationkey, hops.h + 1
        |  FROM hops
        |  JOIN q35_nation s ON s.n_nationkey = hops.n_nationkey
        |  JOIN q35_nation m ON (m.n_regionkey = s.n_regionkey
        |    OR m.n_nationkey = s.n_nationkey + 1
        |    OR m.n_nationkey = s.n_nationkey - 1)
        |  WHERE hops.h < 4
        |)
        |SELECT n_nationkey, CAST(MIN(h) AS BIGINT) AS hops
        |FROM hops GROUP BY n_nationkey ORDER BY n_nationkey""".stripMargin)
  }

  val q35Sql: String =
    """WITH RECURSIVE hops(n_nationkey, h) AS (
      |  SELECT n_nationkey, 0 FROM nation WHERE n_nationkey = 0
      |  UNION ALL
      |  SELECT m.n_nationkey, hops.h + 1
      |  FROM hops
      |  JOIN nation s ON s.n_nationkey = hops.n_nationkey
      |  JOIN nation m ON (m.n_regionkey = s.n_regionkey
      |    OR m.n_nationkey = s.n_nationkey + 1
      |    OR m.n_nationkey = s.n_nationkey - 1)
      |  WHERE hops.h < 4
      |)
      |SELECT n_nationkey, CAST(MIN(h) AS BIGINT) AS hops
      |FROM hops GROUP BY n_nationkey ORDER BY n_nationkey""".stripMargin

  // ---------------------------------------------------------------- q36
  /** Correlated LATERAL subquery — DuckDB's lateral-join surface
    * (reference engine feature; the classic top-N-per-group spelled the
    * way an interactive user writes it): for each nation, the top-2
    * customers by account balance, the subquery correlated on
    * n_nationkey with ORDER BY + LIMIT inside. Spark 4 decorrelates
    * this to a ranked window join (plan-checked: Window +
    * BroadcastHashJoin, no nested loop) — the same physical shape as
    * the manual rewrite, so the declarative form costs nothing here.
    * Scale note: the decorrelated window partitions by the correlation
    * key, a DIMENSION key (25 nations), so each cell holds
    * |customers|/|nations| — fine for dimension-correlated laterals; a
    * lateral correlated on a fact-sized key keeps this shape
    * (per-entity cells), and an extreme-skew top-N belongs on the
    * [[Similarity.topKPerQuery]] local-topk pre-agg instead.
    */
  def q36(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "nation").createOrReplaceTempView("q36_nation")
    Tables(spark, dir, "customer").createOrReplaceTempView("q36_customer")
    spark.sql(
      """SELECT n.n_name, c.c_name,
        |  CAST(c.c_acctbal AS DOUBLE) AS acctbal
        |FROM q36_nation n,
        |LATERAL (
        |  SELECT c_name, c_acctbal FROM q36_customer
        |  WHERE c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_name
        |  LIMIT 2
        |) c
        |ORDER BY n.n_name, acctbal DESC, c.c_name""".stripMargin)
  }

  val q36Sql: String =
    """SELECT n.n_name, c.c_name,
      |  CAST(c.c_acctbal AS DOUBLE) AS acctbal
      |FROM nation n,
      |LATERAL (
      |  SELECT c_name, c_acctbal FROM customer
      |  WHERE c_nationkey = n.n_nationkey
      |  ORDER BY c_acctbal DESC, c_name
      |  LIMIT 2
      |) c
      |ORDER BY n.n_name, acctbal DESC, c.c_name""".stripMargin

  // ---------------------------------------------------------------- q37
  /** QUALIFY — DuckDB's window-predicate clause (reference engine
    * surface; the sugar users reach for before they learn the subquery
    * spelling): latest order per customer, the window predicate written
    * directly in the oracle's QUALIFY. Spark has no QUALIFY, so the
    * library form IS the desugaring — row_number over the per-entity
    * window, filtered.
    *
    * Scale: the window partitions by o_custkey — a per-entity key, so
    * cells hold orders-per-customer (bounded by user behavior, not
    * corpus size); one hash exchange, no global sort. Scale note: the
    * rn=1 special case could drop the sort entirely via
    * groupBy(custkey).agg(max(struct(date, -key))) (map-side combine);
    * kept on the window form because that is the general QUALIFY
    * translation (rank ≤ k, arbitrary predicates) and the per-entity
    * cells already bound the sort. Determinism: date ties break on
    * o_orderkey, which is unique.
    */
  def q37(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey"))
    o.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"),
        asDouble(col("o_totalprice")).as("totalprice"))
      .orderBy(col("o_custkey"))
  }

  val q37Sql: String =
    """SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DOUBLE) AS totalprice
      |FROM orders
      |QUALIFY row_number() OVER (PARTITION BY o_custkey
      |  ORDER BY o_orderdate DESC, o_orderkey) = 1
      |ORDER BY o_custkey""".stripMargin

  // ---------------------------------------------------------------- q38
  /** ASOF JOIN — DuckDB's native temporal-join surface (the batch face
    * of st16's point-in-time join): each click matched to the user's
    * most recent view at-or-before it. The oracle uses the literal
    * `ASOF JOIN` keyword; Spark lacks the operator, so the library form
    * is the union + running last_value sweep — the SAME shape st16
    * proved out (Streaming.scala st16PitJoin): ONE exchange on user_id,
    * no interval BroadcastNestedLoop, no per-click window over an
    * unbounded match set.
    *
    * Determinism: views pre-aggregate to one row per (user_id, ts)
    * (max event_id), so the as-of match is unique even under timestamp
    * collisions — DuckDB's ASOF tie choice never gets a vote. The
    * inclusive bound (c.ts >= v.ts) is carried by the sort key
    * (ts, tag) with views tagged 0 before clicks tagged 1.
    *
    * Scale: per-entity window cells hold one user's events; the swept
    * union carries three narrow columns beyond the keys. At 100 TB this
    * is the join shape that works — the naive inequality join is
    * O(clicks × views) per user and plans as a nested loop.
    */
  def q38(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("view_id"))
      .select(col("user_id"), col("ts"), lit(0).as("tag"),
        struct(col("view_id"), col("ts").as("view_ts")).as("v"),
        lit(null).cast(LongType).as("click_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), lit(1).as("tag"),
        lit(null).cast(StructType(Seq(
          StructField("view_id", LongType),
          StructField("view_ts", TimestampType)))).as("v"),
        col("event_id").as("click_id"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    views.unionByName(clicks)
      .withColumn("m", last(col("v"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1 && col("m").isNotNull)
      .select(col("user_id"), col("click_id"), col("m.view_id").as("view_id"),
        (unix_micros(col("ts")) - unix_micros(col("m.view_ts")))
          .as("lag_us"))
      .orderBy(col("click_id"))
  }

  val q38Sql: String =
    """WITH clicks AS (
      |  SELECT user_id, ts, event_id AS click_id FROM events
      |  WHERE event_type = 'click'),
      |views AS (
      |  SELECT user_id, ts, MAX(event_id) AS view_id FROM events
      |  WHERE event_type = 'view' GROUP BY user_id, ts)
      |SELECT c.user_id, c.click_id, v.view_id,
      |  date_diff('microsecond', v.ts, c.ts) AS lag_us
      |FROM clicks c ASOF JOIN views v
      |  ON c.user_id = v.user_id AND c.ts >= v.ts
      |ORDER BY c.click_id""".stripMargin

  // ---------------------------------------------------------------- q39
  /** UNPIVOT — DuckDB's wide→long surface (q27's inverse): the
    * per-returnflag measure columns melted into (measure, value) rows.
    * Spark's Dataset.unpivot is the native operator (plans as a single
    * Expand — map-only, no shuffle beyond the tiny pre-aggregate);
    * the oracle uses DuckDB's UNPIVOT ... INTO NAME/VALUE form.
    *
    * §5 exactness: measures are exact DECIMAL(18,2) sums cast to DOUBLE
    * at the very end on both engines — partition order can never show.
    */
  def q39(spark: SparkSession, dir: String): DataFrame = {
    val d182 = (c: Column) => c.cast(DecimalType(18, 2))
    val a = Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag").as("rf"))
      .agg(asDouble(sum(d182(col("l_quantity")))).as("sum_qty"),
        asDouble(sum(d182(col("l_extendedprice")))).as("sum_base"),
        asDouble(sum(d182(col("l_discount")))).as("sum_disc"))
    a.unpivot(Array(col("rf")),
        Array(col("sum_qty"), col("sum_base"), col("sum_disc")),
        "measure", "value")
      .orderBy(col("rf"), col("measure"))
  }

  val q39Sql: String =
    """WITH a AS (
      |  SELECT l_returnflag AS rf,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      |      AS sum_base,
      |    CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT rf, measure, value
      |FROM (UNPIVOT a ON sum_qty, sum_base, sum_disc
      |      INTO NAME measure VALUE value)
      |ORDER BY rf, measure""".stripMargin

  // ---------------------------------------------------------------- q40
  /** RANGE window frame over event time — the rolling-interval surface
    * (DuckDB `RANGE BETWEEN INTERVAL .. PRECEDING`, reference engine
    * feature; the shape behind every "activity in the trailing hour"
    * feature column): per event, the count and exact-decimal value sum
    * of the SAME USER's events in the trailing hour, frame bounds
    * inclusive on both ends. Spark 4 supports the identical surface —
    * named WINDOW clause, interval RANGE frame — so the SAME SQL text
    * runs on both engines (the q36 discipline: declarative surface
    * parity, no desugaring needed).
    *
    * §5 exactness: the frame sum is DECIMAL(12,2) (exact in any
    * accumulation order) cast to DOUBLE at the end; ties in `ts` are
    * RANGE-peers, included in the frame together on both engines, so
    * tie order can never show in any row's aggregate.
    *
    * Scale: ONE hash exchange on user_id (a per-entity key — cells
    * hold one user's events, bounded by user behavior not corpus
    * size); the running frame is a sliding two-pointer over each
    * cell's sort, no per-row rescan. The q37/q38 per-entity-window
    * argument verbatim; nothing global anywhere.
    */
  def q40(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "events").createOrReplaceTempView("q40_events")
    spark.sql(q40Text("q40_events"))
  }

  private def q40Text(tbl: String): String =
    s"""SELECT event_id, user_id,
      |  COUNT(*) OVER w AS c_1h,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS v_1h
      |FROM $tbl
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts
      |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  val q40Sql: String = q40Text("events")

  // ---------------------------------------------------------------- q41
  /** GROUP BY ALL / ORDER BY ALL — DuckDB's friendly-SQL aggregation
    * sugar (reference engine surface; the spelling its docs lead
    * with): every non-aggregate SELECT expression becomes a group key,
    * and ORDER BY ALL sorts by all output columns left-to-right. Spark
    * 3.4+ ships the identical surface, so the SAME SQL text runs on
    * both engines (q36/q40 discipline) — including a COMPUTED group
    * expression (`year(o_orderdate)`), the case where the sugar saves
    * real duplication.
    *
    * §5: money in exact DECIMAL(18,2), DOUBLE only at the edge; the
    * group keys make every output row unique, so ORDER BY ALL is a
    * total deterministic order.
    *
    * Scale: plain declarative groupBy — Catalyst plans map-side
    * partial aggregation before the one hash exchange on the (yr,
    * status) key (bounded: years × statuses); identical to the q08
    * class at any corpus size.
    */
  def q41(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "orders").createOrReplaceTempView("q41_orders")
    spark.sql(q41Text("q41_orders"))
  }

  private def q41Text(tbl: String): String =
    s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, o_orderstatus,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM $tbl
      |GROUP BY ALL
      |ORDER BY ALL""".stripMargin

  val q41Sql: String = q41Text("orders")

  // ---------------------------------------------------------------- q42
  /** DISTINCT ON — DuckDB's Postgres-inherited first-row-per-key surface
    * (reference engine feature): the top event per (user_id, event_type)
    * by (value DESC, event_id DESC), spelled in the oracle as the
    * literal `DISTINCT ON (...) ... ORDER BY ...`. The Spark side is
    * NOT q37's window desugaring — it is the rn=1 special case done the
    * scale-preferred way q37's scaladoc records: ONE map-side-combinable
    * `max_by(struct(outputs), struct(order keys))` aggregate — partial
    * argmax per partition, no per-key sort, no window exchange beyond
    * the hash agg.
    *
    * §5: the order key is (value, event_id) — value is COMPARED, never
    * summed (double comparison is exact), and event_id makes the pick
    * total; the selected value passes through unchanged (identity, no
    * float arithmetic).
    */
  def q42(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    ev.groupBy(col("user_id"), col("event_type"))
      .agg(max_by(
        struct(col("event_id"), col("value")),
        struct(col("value"), col("event_id"))).as("best"))
      .select(col("user_id"), col("event_type"),
        col("best.event_id").as("best_event_id"),
        col("best.value").as("best_value"))
      .orderBy(col("user_id"), col("event_type"))
  }

  val q42Sql: String =
    """SELECT DISTINCT ON (user_id, event_type)
      |  user_id, event_type,
      |  event_id AS best_event_id, value AS best_value
      |FROM events
      |ORDER BY user_id, event_type, value DESC, event_id DESC""".stripMargin

  // ---------------------------------------------------------------- q43
  /** Window frame EXCLUDE — DuckDB's frame-exclusion surface (the SQL
    * standard's EXCLUDE CURRENT ROW, the leave-one-out peer baseline
    * every anomaly heuristic wants): per event, the count and exact
    * value sum of the user's ±3 neighboring events EXCLUDING the row
    * itself. The oracle uses the literal `EXCLUDE CURRENT ROW`; Spark
    * has no frame exclusion, so the library form is the identity
    * desugaring — full ±3 frame minus the current row's own
    * contribution (exact: the sum is DECIMAL, subtraction is exact;
    * the count is integers).
    *
    * The identity must hold at the SQL-semantics edges, not just the
    * common path (review r12): SUM over an EMPTY excluded frame is
    * NULL (a lone-event user), and SUM skips NULL values — so the
    * subtraction form guards on the count of NON-NULL values among
    * the peers (full-frame non-null count minus the row's own
    * non-nullness) and subtracts coalesce(v, 0) so a NULL current row
    * cannot poison its peers' sum. The shipped corpus never exercises
    * either edge (≥45 events/user, no NULL values); the plant spec
    * does.
    *
    * Scale: per-entity user_id window, one exchange; the ±3 ROWS frame
    * is a constant-width slide. Order key (ts, event_id) is total.
    */
  def q43(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id")).rowsBetween(-3, 3)
    val peerVals = count(col("v")).over(w) -
      when(col("v").isNotNull, 1L).otherwise(0L)
    Tables(spark, dir, "events")
      .withColumn("v", col("value").cast(DecimalType(12, 2)))
      .select(col("event_id"), col("user_id"),
        (count(lit(1)).over(w) - 1L).as("n_peers"),
        when(peerVals === 0L, lit(null).cast(DoubleType))
          .otherwise((sum(col("v")).over(w) -
            coalesce(col("v"), lit(0).cast(DecimalType(12, 2))))
            .cast(DoubleType))
          .as("peer_sum"))
      .orderBy(col("event_id"))
  }

  val q43Sql: String =
    """SELECT event_id, user_id,
      |  COUNT(*) OVER w AS n_peers,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE)
      |    AS peer_sum
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |  ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q44
  /** Distribution window functions — ntile / percent_rank / cume_dist,
    * the quartile-bucketing and empirical-CDF surface (DuckDB window
    * function set; the features a ranking pipeline exports). IDENTICAL
    * SQL runs on both engines (q36/q40 discipline).
    *
    * §5 note: percent_rank = (rank−1)/(n−1) and cume_dist = peers/n are
    * single IEEE divisions of identical integers — correctly-rounded in
    * any engine, hence bit-identical (probed); no decision rides them.
    * ntile is pure integer bucketing. Order key (value, event_id) is
    * total, so every rank is deterministic.
    *
    * Scale: one per-entity user_id exchange; all three functions ride
    * the same sorted cell pass.
    */
  def q44(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "events").createOrReplaceTempView("q44_events")
    spark.sql(q44Text("q44_events"))
  }

  private def q44Text(tbl: String): String =
    s"""SELECT event_id, user_id,
      |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      |  percent_rank() OVER w AS pr,
      |  cume_dist() OVER w AS cd
      |FROM $tbl
      |WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
      |ORDER BY event_id""".stripMargin

  val q44Sql: String = q44Text("events")

  // ---------------------------------------------------------------- q45
  /** GROUPS window frames (SQL:2011 GROUPS mode — NEITHER engine
    * implements it: Spark 4 can't parse `GROUPS BETWEEN`, DuckDB
    * parses and rejects it as unimplemented, so the operator supplies
    * semantics both engines lack) — the frame
    * counts PEER GROUPS (ties in the order key) rather than rows or
    * values: here each event sees its own sec-group plus one group
    * either side. Spark side is the exact desugaring: dense_rank gives
    * each peer group an integer index g, per-(user, g) partials
    * aggregate once (map-side combined), a RANGE frame of ±1 over the
    * INTEGER g reproduces the group frame on the group-level rows, and
    * the per-row answer joins back on (user, g) — the row never sees a
    * window wider than the bounded group frame. DECIMAL sums, double
    * only at the edge (§5).
    *
    * Scale: ONE user_id exchange feeds dense_rank; the group-level
    * frame runs on the per-(user, g) aggregate (≤ rows, typically ≪);
    * the join back is user_id-co-partitioned.
    */
  def q45(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("sec"),
        col("value").cast(DecimalType(12, 2)).as("v"))
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("sec"))
    val g = ev.withColumn("g", dense_rank().over(byUser))
    val grp = g.groupBy(col("user_id"), col("g"))
      .agg(sum(col("v")).as("gs"), count(lit(1)).as("gc"))
    val frame = Window.partitionBy(col("user_id")).orderBy(col("g"))
      .rangeBetween(-1, 1)
    val framed = grp
      .withColumn("grp_sum", sum(col("gs")).over(frame))
      .withColumn("grp_peers", sum(col("gc")).over(frame))
    g.join(framed.select(col("user_id"), col("g"), col("grp_sum"),
        col("grp_peers")), Seq("user_id", "g"))
      .select(col("event_id"), col("user_id"), col("sec"),
        col("grp_sum").cast(DoubleType).as("grp_sum"),
        col("grp_peers").cast(LongType).as("grp_peers"))
      .orderBy(col("event_id"))
  }

  /** Oracle is a CROSS-FORMULATION (stronger than a mirrored
    * desugaring): peer groups materialize once, and the ±1-group frame
    * is an interval SELF-JOIN over group indices rather than a range
    * window. */
  val q45Sql: String =
    """WITH ev AS (
      |  SELECT event_id, user_id,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS sec,
      |    CAST(value AS DECIMAL(12,2)) AS v
      |  FROM events),
      |g AS (
      |  SELECT *, dense_rank() OVER (PARTITION BY user_id ORDER BY sec)
      |    AS g
      |  FROM ev),
      |grp AS (
      |  SELECT user_id, g, SUM(v) AS gs, COUNT(*) AS gc
      |  FROM g GROUP BY 1, 2),
      |fr AS (
      |  SELECT a.user_id, a.g, SUM(b.gs) AS grp_sum,
      |    SUM(b.gc) AS grp_peers
      |  FROM grp a JOIN grp b ON b.user_id = a.user_id
      |    AND b.g BETWEEN a.g - 1 AND a.g + 1
      |  GROUP BY 1, 2)
      |SELECT e.event_id, e.user_id, e.sec,
      |  CAST(f.grp_sum AS DOUBLE) AS grp_sum,
      |  CAST(f.grp_peers AS BIGINT) AS grp_peers
      |FROM g e JOIN fr f USING (user_id, g)
      |ORDER BY event_id""".stripMargin

  // ------------------------------------------------------------ registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q45_groups_frame" -> (q45 _),
    "q44_window_dist" -> (q44 _),
    "q43_frame_exclude" -> (q43 _),
    "q42_distinct_on" -> (q42 _),
    "q41_group_by_all" -> (q41 _),
    "q40_range_frame" -> (q40 _),
    "q39_unpivot" -> (q39 _),
    "q38_asof_join" -> (q38 _),
    "q37_qualify" -> (q37 _),
    "q36_lateral" -> (q36 _),
    "q35_recursive_cte" -> (q35 _),
    "q34_grouping_sets" -> (q34 _),
    "q01_pricing_summary" -> (q01 _),
    "q02_filter_project" -> (q02 _),
    "q03_topn" -> (q03 _),
    "q04_semi_join" -> (q04 _),
    "q05_multi_join" -> (q05 _),
    "q06_filter_agg" -> (q06 _),
    "q07_count_star" -> (q07 _),
    "q08_group_having" -> (q08 _),
    "q09_distinct" -> (q09 _),
    "q10_in_list" -> (q10 _),
    "q11_window_rank" -> (q11 _),
    "q12_window_running" -> (q12 _),
    "q13_outer_join_agg" -> (q13 _),
    "q14_case_agg" -> (q14 _),
    "q15_max_subquery" -> (q15 _),
    "q16_string_funcs" -> (q16 _),
    "q17_avg_subquery" -> (q17 _),
    "q18_large_orders" -> (q18 _),
    "q19_or_filter" -> (q19 _),
    "q20_anti_join" -> (q20 _),
    "q21_cte" -> (q21 _),
    "q22_union" -> (q22 _),
    "q23_orderby_multi" -> (q23 _),
    "q24_date_funcs" -> (q24 _),
    "q25_rollup" -> (q25 _),
    "q26_set_ops" -> (q26 _),
    "q27_pivot" -> (q27 _),
    "q28_percentiles" -> (q28 _),
    "q29_cube" -> (q29 _),
    "q30_window_nav" -> (q30 _),
    "q31_string_zoo" -> (q31 _),
    "q32_date_zoo" -> (q32 _),
    "q33_multi_exists" -> (q33 _))

  val oracle: Map[String, String] = Map(
    "q45_groups_frame" -> q45Sql,
    "q44_window_dist" -> q44Sql,
    "q43_frame_exclude" -> q43Sql,
    "q42_distinct_on" -> q42Sql,
    "q41_group_by_all" -> q41Sql,
    "q40_range_frame" -> q40Sql,
    "q01_pricing_summary" -> q01Sql,
    "q02_filter_project" -> q02Sql,
    "q03_topn" -> q03Sql,
    "q04_semi_join" -> q04Sql,
    "q05_multi_join" -> q05Sql,
    "q06_filter_agg" -> q06Sql,
    "q07_count_star" -> q07Sql,
    "q08_group_having" -> q08Sql,
    "q09_distinct" -> q09Sql,
    "q10_in_list" -> q10Sql,
    "q11_window_rank" -> q11Sql,
    "q12_window_running" -> q12Sql,
    "q13_outer_join_agg" -> q13Sql,
    "q14_case_agg" -> q14Sql,
    "q15_max_subquery" -> q15Sql,
    "q16_string_funcs" -> q16Sql,
    "q17_avg_subquery" -> q17Sql,
    "q18_large_orders" -> q18Sql,
    "q19_or_filter" -> q19Sql,
    "q20_anti_join" -> q20Sql,
    "q21_cte" -> q21Sql,
    "q22_union" -> q22Sql,
    "q23_orderby_multi" -> q23Sql,
    "q24_date_funcs" -> q24Sql,
    "q39_unpivot" -> q39Sql,
    "q38_asof_join" -> q38Sql,
    "q37_qualify" -> q37Sql,
    "q36_lateral" -> q36Sql,
    "q35_recursive_cte" -> q35Sql,
    "q34_grouping_sets" -> q34Sql,
    "q25_rollup" -> q25Sql,
    "q26_set_ops" -> q26Sql,
    "q27_pivot" -> q27Sql,
    "q28_percentiles" -> q28Sql,
    "q29_cube" -> q29Sql,
    "q30_window_nav" -> q30Sql,
    "q31_string_zoo" -> q31Sql,
    "q32_date_zoo" -> q32Sql,
    "q33_multi_exists" -> q33Sql)
}
