package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational join/aggregate coverage over the TPC-H-ish corpus
  * (TESTDATA.md). The reference has exactly one join shape (J1, SURVEY.md
  * §2.5); a complete engine needs the standard equi/semi/anti/broadcast join
  * family and multi-way plans, so these queries exercise them with
  * deterministic, oracle-checkable output.
  *
  * Scale notes (100 TB): every join here either broadcasts a genuinely tiny
  * dimension (region/nation/supplier — explicitly hinted) or shuffles on the
  * natural key of fact tables (orderkey/custkey), which Catalyst plans as
  * sort-merge with both sides partitioned by the key. Aggregations are
  * partial (map-side combine) before the shuffle. No global windows, no
  * driver-side loops; top-k goes through TakeOrderedAndProject.
  */
object TpchLike {

  private def li(s: SparkSession, dir: String) = Tables.lineitem(s, dir)
  private def ord(s: SparkSession, dir: String) = Tables.orders(s, dir)
  private def cust(s: SparkSession, dir: String) = Tables.customer(s, dir)

  val all: Seq[QuerySpec] = Seq(

    // TPC-H Q1 shape: pricing summary. Pure map-side-combinable hash agg on
    // the biggest table — the canonical "does aggregation scale" probe.
    // Money sums ship CENT-QUANTIZED (r17, the q9 pattern applied to the
    // whole family): per-row floor(x·100) is the same IEEE double on both
    // engines, the BIGINT sum is summation-order-independent, and the
    // integer-div average divides bit-identical operands. sum_qty/avg_qty
    // stay float-form: quantities are INTEGRAL on this corpus (verified),
    // so their double sum is exact and the single avg division
    // deterministic.
    QuerySpec.sql("q1_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS base_price_cents,
        |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS disc_price_cents,
        |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS charge_cents,
        |       round(avg(l_quantity), 4) AS avg_qty,
        |       CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) // count(*) AS BIGINT) AS avg_price_cents,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2024-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""") {
      (s, dir) =>
        li(s, dir)
          .filter(col("l_shipdate") <= lit("2024-09-01").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            round(sum(col("l_quantity")), 2).as("sum_qty"),
            sum(floor(col("l_extendedprice") * lit(100)).cast("long"))
              .as("base_price_cents"),
            sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount"))
              * lit(100)).cast("long")).as("disc_price_cents"),
            sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount"))
              * (lit(1) + col("l_tax")) * lit(100)).cast("long"))
              .as("charge_cents"),
            round(avg(col("l_quantity")), 4).as("avg_qty"),
            count(lit(1)).as("count_order"))
          .withColumn("avg_price_cents",
            expr("base_price_cents div count_order"))
          .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty"),
            col("base_price_cents"), col("disc_price_cents"),
            col("charge_cents"), col("avg_qty"), col("avg_price_cents"),
            col("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // TPC-H Q3 shape: 3-way join + top-10 revenue. customer⋈orders shuffles
    // on custkey, then ⋈lineitem on orderkey; final top-k is
    // TakeOrderedAndProject (no global sort materialized).
    QuerySpec.sql("q3_shipping_priority",
      """SELECT l_orderkey,
        |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |       strftime(o_orderdate, '%Y-%m-%d') AS orderdate
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |              JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue_cents DESC, l_orderkey LIMIT 10""") {
      (s, dir) =>
        cust(s, dir).filter(col("c_mktsegment") === "BUILDING")
          .join(ord(s, dir), col("c_custkey") === col("o_custkey"))
          .join(li(s, dir), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"))
          .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * lit(100)).cast("long")).as("revenue_cents"))
          .select(col("l_orderkey"), col("revenue_cents"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"))
          .orderBy(col("revenue_cents").desc, col("l_orderkey"))
          .limit(10)
    },

    // TPC-H Q5 shape: 5-way join through the dimension chain with the tiny
    // side explicitly broadcast — region(5)⋈nation(25) never shuffles.
    QuerySpec.sql("q5_regional_revenue",
      """SELECT n_name,
        |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |       count(*) AS n_items
        |FROM region JOIN nation ON n_regionkey = r_regionkey
        |            JOIN customer ON c_nationkey = n_nationkey
        |            JOIN orders ON o_custkey = c_custkey
        |            JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE r_name IN ('AMERICA', 'ASIA')
        |GROUP BY n_name
        |ORDER BY revenue_cents DESC, n_name""") {
      (s, dir) =>
        broadcast(Tables.region(s, dir).filter(col("r_name").isin("AMERICA", "ASIA")))
          .join(broadcast(Tables.nation(s, dir)), col("n_regionkey") === col("r_regionkey"))
          .join(cust(s, dir), col("c_nationkey") === col("n_nationkey"))
          .join(ord(s, dir), col("o_custkey") === col("c_custkey"))
          .join(li(s, dir), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("n_name"))
          .agg(
            sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount"))
              * lit(100)).cast("long")).as("revenue_cents"),
            count(lit(1)).as("n_items"))
          .orderBy(col("revenue_cents").desc, col("n_name"))
    },

    // TPC-H Q4 shape: semi-join (EXISTS). Spark plans left_semi — only the
    // key column of lineitem crosses the shuffle.
    QuerySpec.sql("q4_order_priority",
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""") {
      (s, dir) =>
        ord(s, dir)
          .join(li(s, dir),
            col("l_orderkey") === col("o_orderkey") && col("l_shipdate") > col("o_orderdate"),
            "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy(col("o_orderpriority"))
    },

    // TPC-H Q12 shape: shipping-mode priority split — the deck's one
    // fact⋈fact join whose AGGREGATE is conditioned on an attribute of
    // the JOINED row (o_orderpriority), not the grouped one. Adapted:
    // the corpus lacks l_shipmode/l_commitdate/l_receiptdate, so the
    // mode class is l_returnflag and "late delivery" = shipped more than
    // 60 days after the order date (the q21 lateness convention), inside
    // a one-year shipdate window (Q12's receiptdate-year filter).
    //
    // Plan (the 100 TB story): the year window pushes into the lineitem
    // PARQUET SCAN (pinned in TpchPlanSpec — at 100 TB this is the
    // partition-pruning predicate); the join is keyed on orderkey (both
    // sides shuffle on their natural key; the lateness predicate is a
    // join residual, never a theta join), and the conditional counts are
    // partial (map-side) before the 3-group exchange.
    QuerySpec.sql("q12_priority_shipping",
      """SELECT l_returnflag AS flag_class,
        |       count(*) FILTER (o_orderpriority IN ('1-URGENT','2-HIGH')) AS high_line_count,
        |       count(*) FILTER (o_orderpriority NOT IN ('1-URGENT','2-HIGH')) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY 1""") {
      (s, dir) =>
        li(s, dir)
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
          .join(ord(s, dir).select(col("o_orderkey"), col("o_orderdate"),
              col("o_orderpriority")),
            col("o_orderkey") === col("l_orderkey") &&
              col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
          .groupBy(col("l_returnflag").as("flag_class"))
          .agg(
            count(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1))
              .as("high_line_count"),
            count(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1))
              .as("low_line_count"))
          .orderBy(col("flag_class"))
    },

    // Anti-join: customers with no HIGH-priority orders (NOT EXISTS ↔
    // left_anti). The subquery is filtered so the result is non-empty —
    // every customer has some order in this corpus, and an always-empty
    // result would make the oracle check vacuous.
    QuerySpec.sql("q_customers_no_orders",
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""") {
      (s, dir) =>
        cust(s, dir)
          .join(ord(s, dir).filter(col("o_orderpriority") === "1-URGENT"),
            col("o_custkey") === col("c_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
    },

    // Broadcast dim join + two-level agg: revenue per supplier nation.
    QuerySpec.sql("q_supplier_revenue",
      """SELECT s_name, n_name,
        |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |       count(*) AS n_items
        |FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
        |              JOIN nation ON n_nationkey = s_nationkey
        |GROUP BY s_name, n_name ORDER BY s_name, n_name""") {
      (s, dir) =>
        li(s, dir)
          .join(broadcast(Tables.supplier(s, dir)), col("s_suppkey") === col("l_suppkey"))
          .join(broadcast(Tables.nation(s, dir)), col("n_nationkey") === col("s_nationkey"))
          .groupBy(col("s_name"), col("n_name"))
          .agg(
            sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount"))
              * lit(100)).cast("long")).as("revenue_cents"),
            count(lit(1)).as("n_items"))
          // (s_name, n_name) tie-break: two suppliers may share a name, and
          // an order unique only up to ties is nondeterministic across runs.
          .orderBy(col("s_name"), col("n_name"))
    },

    // Analytic windows over a fact table: per-customer order sequencing with
    // rank + lag (capabilities the reference lacks; §2.6 notes no lag/rank).
    QuerySpec.sql("q_order_sequence",
      """SELECT o_custkey, o_orderkey,
        |       row_number() OVER w AS order_seq,
        |       round(o_totalprice - lag(o_totalprice) OVER w, 2) AS price_delta,
        |       round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, order_seq""") {
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
        ord(s, dir).select(
            col("o_custkey"), col("o_orderkey"),
            row_number().over(w).cast("long").as("order_seq"),
            round(col("o_totalprice") - lag(col("o_totalprice"), 1).over(w), 2).as("price_delta"),
            round(sum(col("o_totalprice")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
              .as("running_total"))
          .orderBy(col("o_custkey"), col("order_seq"))
      }
    },

    // Grouping sets / rollup — multi-granularity agg in one pass. GROUPING()
    // (not coalesce) labels subtotal rows, so a genuine NULL brand/type in
    // the data cannot collide with the 'ALL' subtotal label.
    QuerySpec.sql("q_rollup_parts",
      """SELECT CASE WHEN GROUPING(p_brand) = 1 THEN 'ALL' ELSE p_brand END AS brand,
        |       CASE WHEN GROUPING(p_type) = 1 THEN 'ALL' ELSE p_type END AS ptype,
        |       count(*) AS n_parts,
        |       CAST(sum(CAST(floor(p_retailprice * 100) AS BIGINT)) // count(*) AS BIGINT) AS avg_price_cents
        |FROM part
        |GROUP BY ROLLUP (p_brand, p_type)
        |ORDER BY brand, ptype""") {
      (s, dir) =>
        Tables.part(s, dir)
          .rollup(col("p_brand"), col("p_type"))
          .agg(count(lit(1)).as("n_parts"),
            sum(floor(col("p_retailprice") * lit(100)).cast("long"))
              .as("__price_cents"),
            grouping(col("p_brand")).as("__gb"), grouping(col("p_type")).as("__gt"))
          .select(
            when(col("__gb") === 1, lit("ALL")).otherwise(col("p_brand")).as("brand"),
            when(col("__gt") === 1, lit("ALL")).otherwise(col("p_type")).as("ptype"),
            col("n_parts"),
            expr("__price_cents div n_parts").as("avg_price_cents"))
          .orderBy(col("brand"), col("ptype"))
    },

    // Set ops: union/intersect/except over key sets (SURVEY §2.8 notes the
    // reference has none; the engine provides them).
    QuerySpec.sql("q_set_ops",
      """WITH building AS (SELECT DISTINCT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'),
        |     buyers AS (SELECT DISTINCT o_custkey AS k FROM orders)
        |SELECT 'building_buyers' AS tag, count(*) AS n FROM (SELECT k FROM building INTERSECT SELECT k FROM buyers)
        |UNION ALL
        |SELECT 'building_only', count(*) FROM (SELECT k FROM building EXCEPT SELECT k FROM buyers)
        |UNION ALL
        |SELECT 'either', count(*) FROM (SELECT k FROM building UNION SELECT k FROM buyers)
        |ORDER BY tag""") {
      (s, dir) => {
        val building = cust(s, dir).filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey").as("k")).distinct()
        val buyers = ord(s, dir).select(col("o_custkey").as("k")).distinct()
        building.intersect(buyers).agg(count(lit(1)).as("n")).select(lit("building_buyers").as("tag"), col("n"))
          .unionAll(building.except(buyers).agg(count(lit(1)).as("n")).select(lit("building_only").as("tag"), col("n")))
          .unionAll(building.union(buyers).distinct().agg(count(lit(1)).as("n")).select(lit("either").as("tag"), col("n")))
          .orderBy(col("tag"))
      }
    },

    // TPC-H Q17 shape: correlated scalar subquery (below 20% of the
    // per-part average). Expressed as a per-key window average — one
    // shuffle on l_partkey serving both the average and the filter, instead
    // of a subquery re-scan; Catalyst decorrelates the SQL form to the same
    // shape. Output is per-part so the hash check pins every group.
    QuerySpec.sql("q17_small_quantity",
      """WITH lq AS (
        |  SELECT *, CAST(floor(l_quantity * 100) AS BIGINT) AS q100,
        |         sum(CAST(floor(l_quantity * 100) AS BIGINT)) OVER (PARTITION BY l_partkey) AS sq,
        |         count(*) OVER (PARTITION BY l_partkey) AS cq
        |  FROM lineitem)
        |SELECT l_partkey, count(*) AS n_small,
        |       CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS small_revenue_cents
        |FROM lq JOIN part ON p_partkey = l_partkey
        |WHERE p_brand IN ('Brand#1', 'Brand#2') AND 2 * q100 * cq < sq
        |GROUP BY l_partkey ORDER BY l_partkey""") {
      (s, dir) => {
        // "quantity below half the per-part average" as integer arithmetic
        // (2·q·n < Σq over scaled longs): the float form 'q < 0.5·avg' can
        // flip at representation boundaries between engines.
        val w = Window.partitionBy(col("l_partkey"))
        val q100 = floor(col("l_quantity") * 100).cast("long")
        li(s, dir)
          .withColumn("__q100", q100)
          .withColumn("__sq", sum(q100).over(w))
          .withColumn("__cq", count(lit(1)).over(w))
          .join(broadcast(Tables.part(s, dir)
            .filter(col("p_brand").isin("Brand#1", "Brand#2"))),
            col("p_partkey") === col("l_partkey"))
          .filter(lit(2) * col("__q100") * col("__cq") < col("__sq"))
          .groupBy(col("l_partkey"))
          .agg(count(lit(1)).as("n_small"),
            sum(floor(col("l_extendedprice") * lit(100)).cast("long"))
              .as("small_revenue_cents"))
          .orderBy(col("l_partkey"))
      }
    },

    // Unpivot/melt: wide metric columns → long (metric, value) rows —
    // integer-quantized sums so the check is exact.
    QuerySpec.sql("q_unpivot_metrics",
      """WITH u AS (
        |  SELECT 'l_quantity' AS metric, l_quantity AS v FROM lineitem
        |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
        |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
        |SELECT metric, count(*) AS n,
        |       CAST(sum(CAST(floor(v * 100) AS BIGINT)) AS BIGINT) AS sum_v100
        |FROM u GROUP BY 1 ORDER BY 1""") {
      (s, dir) =>
        li(s, dir)
          .unpivot(Array(), Array(col("l_quantity"), col("l_discount"), col("l_tax")),
            "metric", "v")
          .groupBy(col("metric"))
          .agg(count(lit(1)).as("n"),
            sum(floor(col("v") * 100).cast("long")).as("sum_v100"))
          .orderBy(col("metric"))
    },

    // Approx + exact distinct cardinalities per month (HLL at scale; the
    // oracle checks the exact column, approx is sanity-bounded in tests).
    QuerySpec.sql("q_distinct_customers",
      """SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
        |       count(DISTINCT o_custkey) AS n_exact, count(*) AS n_orders
        |FROM orders GROUP BY 1 ORDER BY month""") {
      (s, dir) =>
        ord(s, dir)
          .groupBy(date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM").as("month"))
          .agg(countDistinct(col("o_custkey")).as("n_exact"), count(lit(1)).as("n_orders"))
          .orderBy(col("month"))
    },

    // FULL OUTER join coverage: per-customer order counts merged with the
    // customer dimension — right-only rows are the no-order customers,
    // left-only rows would be orphaned orders (none in consistent data, but
    // the join type handles them). Shuffles on custkey both sides; at scale
    // this is the standard sort-merge full-outer, never a broadcast (both
    // sides are corpus-sized).
    QuerySpec.sql("q_full_outer_customers",
      """SELECT coalesce(o.o_custkey, c.c_custkey) AS custkey,
        |       coalesce(o.n_orders, 0) AS n_orders,
        |       c.c_custkey IS NOT NULL AS has_customer,
        |       CAST(coalesce(floor(c.c_acctbal * 100), -1) AS BIGINT) AS acctbal_c
        |FROM (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
        |      FROM orders GROUP BY 1) o
        |FULL OUTER JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY custkey""") {
      (s, dir) => {
        val o = ord(s, dir).groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"))
        o.join(cust(s, dir), o("o_custkey") === col("c_custkey"), "full_outer")
          .select(coalesce(col("o_custkey"), col("c_custkey")).as("custkey"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"),
            col("c_custkey").isNotNull.as("has_customer"),
            coalesce(floor(col("c_acctbal") * 100), lit(-1)).cast("long").as("acctbal_c"))
          .orderBy(col("custkey"))
      }
    },

    // ntile + exact cent sums per quartile: equal-frequency banding inside
    // each priority class. The window partitions by priority (never
    // global); the unique (totalprice, orderkey) order makes tile edges
    // deterministic in both engines.
    QuerySpec.sql("q_order_quartiles",
      """WITH t AS (
        |  SELECT o_orderpriority AS priority,
        |         CAST(ntile(4) OVER (PARTITION BY o_orderpriority
        |                             ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS quartile,
        |         o_totalprice
        |  FROM orders)
        |SELECT priority, quartile, CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_c
        |FROM t GROUP BY 1, 2 ORDER BY priority, quartile""") {
      (s, dir) =>
        ord(s, dir)
          .withColumn("quartile", ntile(4).over(
              Window.partitionBy(col("o_orderpriority"))
                .orderBy(col("o_totalprice"), col("o_orderkey")))
            .cast("long"))
          .groupBy(col("o_orderpriority").as("priority"), col("quartile"))
          .agg(count(lit(1)).as("n_orders"),
            sum(floor(col("o_totalprice") * 100).cast("long")).as("revenue_c"))
          .orderBy(col("priority"), col("quartile"))
    },

    // TPC-H Q7 shape: cross-nation shipping volume — lineitem reaches BOTH
    // nation dimensions (via supplier and via orders→customer) in one
    // plan; both nation maps broadcast, the two fact joins shuffle on
    // their natural keys (suppkey, orderkey).
    QuerySpec.sql("q7_nation_volume",
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |       CAST(strftime(l_shipdate, '%Y') AS BIGINT) AS ship_year,
        |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS volume_c,
        |       CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation sn ON sn.n_nationkey = s_nationkey
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation cn ON cn.n_nationkey = c_nationkey
        |WHERE sn.n_name IN ('NATION_1', 'NATION_2') AND cn.n_name IN ('NATION_1', 'NATION_2')
        |  AND sn.n_name != cn.n_name
        |GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, ship_year""") {
      (s, dir) => {
        val nat = Tables.nation(s, dir)
        li(s, dir)
          .join(broadcast(Tables.supplier(s, dir)), col("s_suppkey") === col("l_suppkey"))
          .join(broadcast(nat.select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))),
            col("snk") === col("s_nationkey"))
          .join(ord(s, dir), col("o_orderkey") === col("l_orderkey"))
          .join(cust(s, dir), col("c_custkey") === col("o_custkey"))
          .join(broadcast(nat.select(col("n_nationkey").as("cnk"), col("n_name").as("cust_nation"))),
            col("cnk") === col("c_nationkey"))
          .filter(col("supp_nation").isin("NATION_1", "NATION_2") &&
            col("cust_nation").isin("NATION_1", "NATION_2") &&
            col("supp_nation") =!= col("cust_nation"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            date_format(col("l_shipdate"), "yyyy").cast("long").as("ship_year"))
          .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
              .cast("long")).as("volume_c"),
            count(lit(1)).as("n_items"))
          .orderBy(col("supp_nation"), col("cust_nation"), col("ship_year"))
      }
    },

    // TPC-H Q10 shape: top-20 customers by returned-item revenue — the
    // returns-quality report; TakeOrderedAndProject bounds the output.
    QuerySpec.sql("q10_returned_items",
      """SELECT c_custkey, c_name,
        |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_c,
        |       n_name
        |FROM customer
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON n_nationkey = c_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue_c DESC, c_custkey LIMIT 20""") {
      (s, dir) =>
        cust(s, dir)
          .join(ord(s, dir), col("o_custkey") === col("c_custkey"))
          .join(li(s, dir).filter(col("l_returnflag") === "R"),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.nation(s, dir)), col("n_nationkey") === col("c_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
          .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
            .cast("long")).as("revenue_c"))
          .select(col("c_custkey"), col("c_name"), col("revenue_c"), col("n_name"))
          .orderBy(col("revenue_c").desc, col("c_custkey"))
          .limit(20)
    },

    // TPC-H Q13 shape: distribution of customers by order count — LEFT
    // OUTER join (zero-order customers must appear at c_count 0) + two
    // stacked aggregates. The left outer shuffles on custkey; the
    // distribution aggregate is O(distinct counts).
    QuerySpec.sql("q13_custdist",
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        |      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |      GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""") {
      (s, dir) =>
        cust(s, dir)
          .join(ord(s, dir), col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // Frame-bounded window coverage: running extrema + nth_value +
    // cume_dist per priority, all over one (priority)-partitioned sort.
    // cume_dist is rank/n in exact IEEE (identical in both engines for
    // these row counts); the unique orderkey tie-break keeps frames stable.
    QuerySpec.sql("q_order_window_frames",
      """SELECT o_orderkey,
        |       o_orderpriority AS priority,
        |       CAST(floor(min(o_totalprice) OVER wrun * 100) AS BIGINT) AS run_min_c,
        |       CAST(floor(max(o_totalprice) OVER wrun * 100) AS BIGINT) AS run_max_c,
        |       CAST(floor(first_value(o_totalprice) OVER wfull * 100) AS BIGINT) AS p_min_c,
        |       CAST(floor(nth_value(o_totalprice, 2) OVER wfull * 100) AS BIGINT) AS p_second_c,
        |       round(cume_dist() OVER word, 6) AS cd
        |FROM orders
        |WINDOW wrun AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
        |                ROWS UNBOUNDED PRECEDING),
        |       wfull AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
        |       word AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        |ORDER BY priority, o_totalprice, o_orderkey
        |LIMIT 2000""") {
      (s, dir) => {
        val sort = Seq(col("o_totalprice").asc, col("o_orderkey").asc)
        val base = Window.partitionBy(col("o_orderpriority")).orderBy(sort: _*)
        val wrun = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wfull = base.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ord(s, dir).select(
            col("o_orderkey"),
            col("o_orderpriority").as("priority"),
            floor(min(col("o_totalprice")).over(wrun) * 100).cast("long").as("run_min_c"),
            floor(max(col("o_totalprice")).over(wrun) * 100).cast("long").as("run_max_c"),
            floor(first_value(col("o_totalprice")).over(wfull) * 100).cast("long").as("p_min_c"),
            floor(nth_value(col("o_totalprice"), 2).over(wfull) * 100).cast("long").as("p_second_c"),
            round(cume_dist().over(base), 6).as("cd"),
            col("o_totalprice"))
          .orderBy(col("priority").asc +: sort: _*)
          .limit(2000)
          .drop("o_totalprice")
      }
    },

    // Entity resolution on part names: contract-through-exact-names first
    // (the corpus pays ONE hash aggregate), then token-blocked levenshtein
    // verification over the vocabulary-sized distinct-name relation — see
    // Linkage.fuzzyNamePairs for the scale contract.
    QuerySpec.sql("q_fuzzy_part_names",
      """WITH nm AS (SELECT p_name AS nm, CAST(count(*) AS BIGINT) AS n,
        |                   CAST(min(p_partkey) AS BIGINT) AS ek
        |            FROM part GROUP BY 1),
        |bl AS (SELECT DISTINCT nm, n, ek,
        |         unnest([string_split(nm, ' ')[1], string_split(nm, ' ')[-1]]) AS bk
        |       FROM nm),
        |cand AS (SELECT DISTINCT a.nm AS name_a, b.nm AS name_b,
        |                a.n AS n_a, b.n AS n_b, a.ek AS key_a, b.ek AS key_b
        |         FROM bl a JOIN bl b ON a.bk = b.bk AND a.nm < b.nm)
        |SELECT name_a, name_b,
        |       CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist,
        |       n_a, n_b, key_a, key_b, n_a * n_b AS n_record_pairs
        |FROM cand WHERE levenshtein(name_a, name_b) <= 2
        |ORDER BY name_a, name_b""") {
      (s, dir) =>
        graft.ops.Linkage.fuzzyNamePairs(Tables.part(s, dir),
            "p_partkey", "p_name", maxDist = 2)
          .orderBy(col("name_a"), col("name_b"))
    },

    // One-pass table profiling (the data-quality summary a pipeline emits
    // per ingest): null/distinct/min/max per column in long format. The
    // Spark side is ONE aggregate over the scan — the multi-distinct plans
    // as a single Expand (×|cols|) + hash aggregate, not |cols| scans; at
    // extreme cardinality the distinct counts would swap to HLL sketches
    // (approx_count_distinct), same as q_distinct_customers' scale note.
    QuerySpec.sql("q_profile_lineitem",
      """SELECT 'l_discount' AS col_name, count(*) AS n_rows,
        |       count(*) - count(l_discount) AS n_nulls,
        |       count(DISTINCT l_discount) AS n_distinct,
        |       round(min(l_discount), 4) AS vmin, round(max(l_discount), 4) AS vmax
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_extendedprice', count(*), count(*) - count(l_extendedprice),
        |       count(DISTINCT l_extendedprice),
        |       round(min(l_extendedprice), 4), round(max(l_extendedprice), 4)
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_quantity', count(*), count(*) - count(l_quantity),
        |       count(DISTINCT l_quantity),
        |       round(min(l_quantity), 4), round(max(l_quantity), 4)
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_tax', count(*), count(*) - count(l_tax),
        |       count(DISTINCT l_tax), round(min(l_tax), 4), round(max(l_tax), 4)
        |FROM lineitem
        |ORDER BY col_name""") {
      (s, dir) => {
        val cols = Seq("l_discount", "l_extendedprice", "l_quantity", "l_tax")
        val aggs = cols.flatMap { c =>
          Seq(count(col(c)).as(s"cnt_$c"),
            countDistinct(col(c)).as(s"nd_$c"),
            round(min(col(c)), 4).as(s"min_$c"),
            round(max(col(c)), 4).as(s"max_$c"))
        } :+ count(lit(1)).as("n_rows")
        li(s, dir).agg(aggs.head, aggs.tail: _*)
          .select(explode(array(cols.map(c => struct(
              lit(c).as("col_name"), col("n_rows"),
              (col("n_rows") - col(s"cnt_$c")).as("n_nulls"),
              col(s"nd_$c").as("n_distinct"),
              col(s"min_$c").as("vmin"), col(s"max_$c").as("vmax"))): _*))
            .as("p"))
          .select(col("p.*"))
          .orderBy(col("col_name"))
      }
    },

    // TPC-H Q6 shape: single-table predicate + one global sum — the
    // canonical pushdown probe: all three filters reach the parquet scan
    // (PushedFilters), the agg is one partial+final pair, no shuffle of
    // data rows at all (only the 1-row partials).
    // Revenue ships CENT-QUANTIZED (the q9 pattern, applied family-wide in
    // r17 per ADVICE): per-row floor(x·100) is the same IEEE double on
    // both engines and the BIGINT sum is summation-order-independent —
    // round(sum(double), 2) was one .005 boundary away from a flaky hash.
    QuerySpec.sql("q6_revenue_delta",
      """SELECT CAST(sum(CAST(floor(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |       count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""") {
      (s, dir) =>
        li(s, dir)
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
            col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
          .agg(sum(floor(col("l_extendedprice") * col("l_discount") * lit(100))
            .cast("long")).as("revenue_cents"), count(lit(1)).as("n_items"))
    },

    // TPC-H Q8 shape: the widest join tree in the registry — lineitem at
    // the center with FIVE dimension legs (part, supplier→nation, orders→
    // customer→nation→region). Every dimension leg broadcasts (all are
    // key-bounded small relations); lineitem is touched once and never
    // shuffled on a non-key. The market-share ratio ships as its two
    // CENT-QUANTIZED operands (an IEEE division of two cross-engine float
    // sums is a hash hazard; the integer pair pins the same information
    // and the BIGINT sums are summation-order-independent — the q9 pattern).
    QuerySpec.sql("q8_market_share",
      """SELECT year(o_orderdate) AS o_year,
        |       CAST(sum(CASE WHEN sn.n_name = 'NATION_3'
        |                     THEN CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
        |                     ELSE 0 END) AS BIGINT) AS nation_revenue_cents,
        |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_revenue_cents
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey AND p_type = 'PROMO'
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation sn ON sn.n_nationkey = s_nationkey
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation cn ON cn.n_nationkey = c_nationkey
        |JOIN region ON r_regionkey = cn.n_regionkey AND r_name = 'ASIA'
        |GROUP BY o_year
        |ORDER BY o_year""") {
      (s, dir) => {
        val supNation = broadcast(Tables.supplier(s, dir)
          .join(broadcast(Tables.nation(s, dir)),
            col("n_nationkey") === col("s_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("supp_nation")))
        val custAsia = broadcast(Tables.customer(s, dir)
          .join(broadcast(Tables.nation(s, dir)
              .join(broadcast(Tables.region(s, dir)
                .filter(col("r_name") === "ASIA")),
                col("r_regionkey") === col("n_regionkey"))),
            col("n_nationkey") === col("c_nationkey"))
          .select(col("c_custkey")))
        li(s, dir)
          .join(broadcast(Tables.part(s, dir)
            .filter(col("p_type") === "PROMO").select(col("p_partkey"))),
            col("p_partkey") === col("l_partkey"))
          .join(supNation, col("s_suppkey") === col("l_suppkey"))
          .join(ord(s, dir), col("o_orderkey") === col("l_orderkey"))
          .join(custAsia, col("c_custkey") === col("o_custkey"))
          .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
          .agg(
            sum(when(col("supp_nation") === "NATION_3",
              floor(col("l_extendedprice") * (lit(1) - col("l_discount"))
                * lit(100)).cast("long"))
              .otherwise(lit(0L))).as("nation_revenue_cents"),
            sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount"))
              * lit(100)).cast("long")).as("total_revenue_cents"))
          .orderBy(col("o_year"))
      }
    },

    // TPC-H Q9 shape (adapted: the corpus has no partsupp, so revenue
    // stands in for profit): name-substring part filter × supplier nation
    // × order year. The LIKE filter prunes part BEFORE the broadcast; the
    // fact table shuffles only for the final (nation, year) agg. Revenue
    // is summed as CENT-QUANTIZED int64 (the linearTrend determinism
    // pattern): with ~150 (nation, year) groups a rounded float sum hit a
    // .005 boundary on this very corpus (…5425.43 vs .44 cross-engine);
    // per-row floor(x·100) is the same IEEE double both sides, and the
    // integer sum is order-independent.
    QuerySpec.sql("q9_profit_nations",
      """SELECT sn.n_name AS nation, year(o_orderdate) AS o_year,
        |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |       count(*) AS n_items
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey AND p_name LIKE '%widget%'
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation sn ON sn.n_nationkey = s_nationkey
        |JOIN orders ON o_orderkey = l_orderkey
        |GROUP BY nation, o_year
        |ORDER BY nation, o_year DESC""") {
      (s, dir) =>
        li(s, dir)
          .join(broadcast(Tables.part(s, dir)
            .filter(col("p_name").like("%widget%")).select(col("p_partkey"))),
            col("p_partkey") === col("l_partkey"))
          .join(broadcast(Tables.supplier(s, dir)
            .join(broadcast(Tables.nation(s, dir)),
              col("n_nationkey") === col("s_nationkey"))
            .select(col("s_suppkey"), col("n_name"))),
            col("s_suppkey") === col("l_suppkey"))
          .join(ord(s, dir), col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("n_name").as("nation"),
            year(col("o_orderdate")).cast("long").as("o_year"))
          .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount"))
              * lit(100)).cast("long")).as("revenue_cents"),
            count(lit(1)).as("n_items"))
          .orderBy(col("nation"), col("o_year").desc)
    },

    // TPC-H Q14 shape: promo revenue share in one month. The ratio IS
    // shipped here — as integer PARTS-PER-MILLION computed from the two
    // CENT-QUANTIZED sums (the q9 pattern): both engines divide
    // bit-identical BIGINT operands with integer `div`, so the quotient
    // is exact and summation-order-independent end to end.
    QuerySpec.sql("q14_promo_revenue",
      """WITH sums AS (
        |  SELECT CAST(sum(CASE WHEN p_type = 'PROMO'
        |                  THEN CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
        |                  ELSE 0 END) AS BIGINT) AS promo,
        |         CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS total
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-03-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01')
        |SELECT promo AS promo_cents, total AS total_cents,
        |       CASE WHEN total = 0 THEN 0
        |            ELSE (1000000 * promo) // total END AS promo_ppm
        |FROM sums""") {
      (s, dir) =>
        li(s, dir)
          .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
          .join(broadcast(Tables.part(s, dir)
            .select(col("p_partkey"), col("p_type"))),
            col("l_partkey") === col("p_partkey"))
          .agg(
            sum(when(col("p_type") === "PROMO",
              floor(col("l_extendedprice") * (lit(1) - col("l_discount"))
                * lit(100)).cast("long"))
              .otherwise(lit(0L))).as("promo_cents"),
            sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount"))
              * lit(100)).cast("long")).as("total_cents"))
          .select(col("promo_cents"), col("total_cents"),
            when(col("total_cents") === 0, lit(0L))
              .otherwise(expr("(1000000L * promo_cents) div total_cents"))
              .as("promo_ppm"))
    },

    // TPC-H Q15 shape: top supplier by quarterly revenue — the revenue
    // relation is computed ONCE, and the max is a 1-row broadcast fold
    // joined back (the A1 anchor-max pattern; no second scan, no window
    // over the full relation, ties kept as the spec requires).
    QuerySpec.sql("q15_top_supplier",
      """WITH rev AS (
        |  SELECT l_suppkey AS supplier_no,
        |         CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_revenue_cents
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue_cents
        |FROM supplier JOIN rev ON s_suppkey = supplier_no
        |WHERE total_revenue_cents = (SELECT max(total_revenue_cents) FROM rev)
        |ORDER BY s_suppkey""") {
      (s, dir) => {
        // cent-quantized revenue (the q9 pattern): the WHERE = max(...)
        // equality is now an exact BIGINT compare — a float-sum max
        // equality could drop or double the winner cross-engine.
        val rev = li(s, dir)
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
          .groupBy(col("l_suppkey"))
          .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * lit(100)).cast("long")).as("total_revenue_cents"))
        val top = rev.agg(max(col("total_revenue_cents")).as("max_rev"))
        rev.crossJoin(broadcast(top))
          .filter(col("total_revenue_cents") === col("max_rev"))
          .join(broadcast(Tables.supplier(s, dir)),
            col("s_suppkey") === col("l_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("total_revenue_cents"))
          .orderBy(col("s_suppkey"))
      }
    },

    // TPC-H Q18 shape: large-volume orders — HAVING over a fact-table
    // group-by, then the qualifying keys (a tiny relation) pull their
    // order/customer rows. The quantity agg shuffles lineitem ONCE on
    // orderkey; the join back to orders is key-on-key.
    QuerySpec.sql("q18_large_orders",
      """WITH big AS (
        |  SELECT l_orderkey, round(sum(l_quantity), 2) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING sum(l_quantity) > 250)
        |SELECT c_custkey, c_name, o_orderkey,
        |       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        |       round(o_totalprice, 2) AS totalprice, sum_qty
        |FROM big JOIN orders ON o_orderkey = l_orderkey
        |         JOIN customer ON c_custkey = o_custkey
        |ORDER BY totalprice DESC, o_orderkey""") {
      (s, dir) =>
        li(s, dir)
          .groupBy(col("l_orderkey"))
          .agg(sum(col("l_quantity")).as("raw_qty"))
          .filter(col("raw_qty") > 250)
          .select(col("l_orderkey"), round(col("raw_qty"), 2).as("sum_qty"))
          .join(ord(s, dir), col("o_orderkey") === col("l_orderkey"))
          .join(cust(s, dir), col("c_custkey") === col("o_custkey"))
          .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
            round(col("o_totalprice"), 2).as("totalprice"), col("sum_qty"))
          .orderBy(col("totalprice").desc, col("o_orderkey"))
    },

    // TPC-H Q19 shape: disjunctive multi-attribute predicates across the
    // join — each disjunct pairs part attributes with lineitem attributes,
    // so the filter can only apply POST-join; what pushes down is the
    // union-of-brands prune on the broadcast side.
    QuerySpec.sql("q19_brand_size_qty",
      """SELECT CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |       count(*) AS n_items
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity >= 1 AND l_quantity <= 21)
        |   OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 25
        |       AND l_quantity >= 10 AND l_quantity <= 30)
        |   OR (p_brand = 'Brand#16' AND p_size BETWEEN 1 AND 35
        |       AND l_quantity >= 20 AND l_quantity <= 40)""") {
      (s, dir) =>
        li(s, dir)
          .join(broadcast(Tables.part(s, dir)
            .filter(col("p_brand").isin("Brand#4", "Brand#19", "Brand#16"))
            .select(col("p_partkey"), col("p_brand"), col("p_size"))),
            col("p_partkey") === col("l_partkey"))
          .filter(
            (col("p_brand") === "Brand#4" && col("p_size").between(1, 15) &&
              col("l_quantity") >= 1 && col("l_quantity") <= 21) ||
            (col("p_brand") === "Brand#19" && col("p_size").between(1, 25) &&
              col("l_quantity") >= 10 && col("l_quantity") <= 30) ||
            (col("p_brand") === "Brand#16" && col("p_size").between(1, 35) &&
              col("l_quantity") >= 20 && col("l_quantity") <= 40))
          .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * lit(100)).cast("long")).as("revenue_cents"),
            count(lit(1)).as("n_items"))
    },

    // TPC-H Q22 shape (adapted: nation stands in for the phone country
    // code, and "no orders" becomes "no orders since 1999" — this corpus
    // gives every customer at least one order, which would make the pure
    // anti-join vacuously empty): above-average-balance customers gone
    // idle — a scalar 1-row broadcast threshold + a left-anti join on the
    // fact key with the recency predicate pushed into the anti side's scan.
    // The above-average threshold is computed EXACTLY in integer cents and
    // applied by cross-multiplication (cents·n_pos > sum_cents ⇔ bal >
    // avg): a raw float avg compared with > against row values could flip
    // a boundary customer on cross-engine summation order (ADVICE r16).
    QuerySpec.sql("q22_idle_customers",
      """WITH pos AS (
        |  SELECT CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
        |         CAST(count(*) AS BIGINT) AS n_pos
        |  FROM customer WHERE c_acctbal > 0.0)
        |SELECT n_name AS nation, count(*) AS numcust,
        |       CAST(sum(CAST(floor(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS totacctbal_cents
        |FROM customer JOIN nation ON n_nationkey = c_nationkey
        |WHERE CAST(floor(c_acctbal * 100) AS BIGINT) * (SELECT n_pos FROM pos)
        |        > (SELECT sum_cents FROM pos)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '1999-01-01')
        |GROUP BY n_name
        |ORDER BY n_name""") {
      (s, dir) => {
        val thresh = cust(s, dir).filter(col("c_acctbal") > 0.0)
          .agg(sum(floor(col("c_acctbal") * lit(100)).cast("long"))
            .as("sum_cents"), count(lit(1)).as("n_pos"))
        cust(s, dir)
          .crossJoin(broadcast(thresh))
          .filter(floor(col("c_acctbal") * lit(100)).cast("long")
            * col("n_pos") > col("sum_cents"))
          .join(ord(s, dir)
            .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp")),
            col("o_custkey") === col("c_custkey"), "left_anti")
          .join(broadcast(Tables.nation(s, dir)),
            col("n_nationkey") === col("c_nationkey"))
          .groupBy(col("n_name").as("nation"))
          .agg(count(lit(1)).as("numcust"),
            sum(floor(col("c_acctbal") * lit(100)).cast("long"))
              .as("totacctbal_cents"))
          .orderBy(col("nation"))
      }
    },

    // TPC-H Q21 shape: waiting suppliers — the hardest correlation in the
    // TPC-H deck: a correlated EXISTS (another supplier has a line on the
    // same order) AND a correlated NOT EXISTS (no OTHER supplier was also
    // late) double self-join on the fact table. Adapted: the corpus lacks
    // commit/receipt dates, so "late" = shipped more than 90 days after
    // the order date; every line of an order shares o_orderdate, so the
    // correlation legs stay pure lineitem self-joins keyed on l_orderkey —
    // exactly Q21's structure.
    //
    // Plan (the 100 TB story): lineitem⋈orders(F) is computed ONCE, for
    // the probe side only; the nation prune applies BEFORE the self-join
    // legs (shrinking the probe ~|nations|×, the planner-standard Q21
    // move). The EXISTS leg probes RAW lineitem (l1's order is F, so its
    // siblings' order is too — no second orders join), planned as a
    // LEFT-SEMI on orderkey with the supplier inequality as residual; the
    // NOT-EXISTS leg is a LEFT-ANTI on orderkey with the sibling's
    // lateness evaluated as a residual against l1's CARRIED o_orderdate —
    // the third orders join q21 implementations usually pay is gone.
    // Every join is keyed (orderkey or the broadcast dims): no cartesian,
    // no nested-loop — pinned in TpchPlanSpec.
    QuerySpec.sql("q21_suppliers_waiting",
      """WITH lo AS (
        |  SELECT l_orderkey, l_suppkey,
        |         l_shipdate > o_orderdate + INTERVAL 90 DAY AS late
        |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |  WHERE o_orderstatus = 'F')
        |SELECT s_name, count(*) AS numwait
        |FROM lo l1 JOIN supplier ON s_suppkey = l1.l_suppkey
        |           JOIN nation ON n_nationkey = s_nationkey
        |WHERE l1.late
        |  AND n_name = 'NATION_3'
        |  AND EXISTS (SELECT 1 FROM lo l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lo l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name""") {
      (s, dir) => {
        // suppliers of the target nation, broadcast (tiny dim leg)
        val sup = broadcast(Tables.supplier(s, dir)
          .join(broadcast(Tables.nation(s, dir)
            .filter(col("n_name") === "NATION_3")),
            col("n_nationkey") === col("s_nationkey"))
          .select(col("s_suppkey"), col("s_name")))
        // probe side: late lines of FINISHED orders, nation-pruned first;
        // o_orderdate rides along so the anti leg can evaluate sibling
        // lateness as a join residual (no second lineitem⋈orders join)
        val l1 = li(s, dir)
          .join(ord(s, dir).filter(col("o_orderstatus") === "F")
            .select(col("o_orderkey"), col("o_orderdate")),
            col("o_orderkey") === col("l_orderkey"))
          .filter(col("l_shipdate") >
            col("o_orderdate") + expr("INTERVAL 90 DAYS"))
          .join(sup, col("s_suppkey") === col("l_suppkey"))
          .select(col("l_orderkey"), col("l_suppkey"), col("o_orderdate"),
            col("s_name"))
        // EXISTS: some other supplier on the same order (status inherited
        // from l1's order — raw lineitem suffices)
        val siblings = li(s, dir)
          .select(col("l_orderkey").as("k2"), col("l_suppkey").as("s2"))
        // NOT EXISTS: no other supplier ALSO late on that order; lateness
        // of the sibling line = its own shipdate vs l1's carried orderdate
        val lateSiblings = li(s, dir)
          .select(col("l_orderkey").as("k3"), col("l_suppkey").as("s3"),
            col("l_shipdate").as("ship3"))
        l1.join(siblings,
            col("k2") === col("l_orderkey") && col("s2") =!= col("l_suppkey"),
            "left_semi")
          .join(lateSiblings,
            col("k3") === col("l_orderkey") && col("s3") =!= col("l_suppkey") &&
              col("ship3") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
            "left_anti")
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
      }
    },

    // TPC-H Q5 shape: local-supplier volume — the one join tree where a
    // NON-KEY equality crosses dimensions (customer's nation must equal
    // the supplier's). customer⋈orders and ⋈lineitem shuffle on their
    // natural keys; the region-pruned supplier-nation relation broadcasts
    // with BOTH conditions (suppkey + the nation equality) in the join,
    // so the cross-dimension predicate never forces a non-key shuffle.
    QuerySpec.sql("q5_local_supplier_volume",
      """SELECT n_name AS nation,
        |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |     JOIN lineitem ON l_orderkey = o_orderkey
        |     JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |     JOIN nation ON s_nationkey = n_nationkey
        |     JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name ORDER BY revenue_cents DESC, nation""") {
      (s, dir) => {
        val supAsia = broadcast(Tables.supplier(s, dir)
          .join(broadcast(Tables.nation(s, dir)
              .join(broadcast(Tables.region(s, dir)
                .filter(col("r_name") === "ASIA")),
                col("r_regionkey") === col("n_regionkey"))),
            col("n_nationkey") === col("s_nationkey"))
          .select(col("s_suppkey"), col("s_nationkey"), col("n_name")))
        cust(s, dir).select(col("c_custkey"), col("c_nationkey"))
          .join(ord(s, dir)
            .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
            col("o_custkey") === col("c_custkey"))
          .join(li(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(supAsia, col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .groupBy(col("n_name").as("nation"))
          .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * lit(100)).cast("long")).as("revenue_cents"))
          .orderBy(col("revenue_cents").desc, col("nation"))
      }
    },

    // TPC-H Q16 shape (adapted: the corpus has no partsupp, but lineitem
    // IS a part-supplier relationship — SELECT DISTINCT (l_partkey,
    // l_suppkey) reconstructs it; "customer complaints" becomes the
    // negative-balance supplier blacklist). Count suppliers per part
    // attribute triple, excluding blacklisted suppliers via NOT IN.
    //
    // Plan: the attribute-pruned part relation broadcasts FIRST (8 sizes +
    // brand/type prunes cut parts ~6×), the surviving (part attrs,
    // suppkey) pairs dedup in ONE hash aggregate (the only fact-shaped
    // exchange), and the NOT IN is a true LEFT-ANTI against a
    // handful-of-rows broadcast (suppkeys are non-null, so NOT IN ≡
    // anti-join — the NULL-poisoned NOT IN hazard cannot arise). The
    // count(DISTINCT suppkey) then runs over already-pair-deduped rows.
    QuerySpec.sql("q16_parts_supplier_cnt",
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        |SELECT p_brand, p_type, p_size,
        |       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM ps JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#3'
        |  AND p_type NOT LIKE 'PROMO%'
        |  AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""") {
      (s, dir) =>
        li(s, dir).select(col("l_partkey"), col("l_suppkey"))
          .join(broadcast(Tables.part(s, dir)
            .filter(col("p_brand") =!= "Brand#3" &&
              !col("p_type").like("PROMO%") &&
              col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34))
            .select(col("p_partkey"), col("p_brand"), col("p_type"),
              col("p_size"))),
            col("p_partkey") === col("l_partkey"))
          .select(col("p_brand"), col("p_type"), col("p_size"),
            col("l_partkey"), col("l_suppkey"))
          .distinct()
          .join(broadcast(Tables.supplier(s, dir)
            .filter(col("s_acctbal") < 0).select(col("s_suppkey"))),
            col("s_suppkey") === col("l_suppkey"), "left_anti")
          .groupBy(col("p_brand"), col("p_type"), col("p_size"))
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
            col("p_size"))
    },
  )
}
