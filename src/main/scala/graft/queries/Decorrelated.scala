package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** TPC-H-shaped decorrelation family, adapted to the driver testdata
  * schema (no partsupp; lineitem has no shipmode/commit/receipt dates).
  * These exercise the subquery shapes the reference's row-at-a-time
  * lookups (menu_items.py:219-274, employees.py:135-177) would become
  * at warehouse scale: correlated scalar subqueries decorrelated into
  * broadcast one-row aggregates, EXISTS → left-semi, NOT EXISTS →
  * left-anti, correlated MIN/AVG → window or grouped join.
  *
  * Every revenue aggregate uses the scaled-long trick (exact integer
  * accumulation, order-independent, identical in DuckDB) and every
  * computed integer is pinned to BIGINT on both sides; see Relational's
  * header for the full parity rules.
  */
object Decorrelated {
  private val D182 = DecimalType(18, 2)

  /** disc-price scaled to an exact long: trunc(x*10000 + 0.5). */
  private def disc10k = (col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    * 10000.0 + 0.5).cast("long")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q2 shape: correlated MIN subquery (cheapest supplier per part)
    // decorrelated into a grouped min + QUALIFY-style rank. One shuffle
    // on (partkey, suppkey); the window runs on the already-aggregated
    // (small) table. At 100 TB the pre-aggregation is the point: the
    // window never sees raw lineitems.
    "q2_min_price_supplier" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      val p = Tables.part(s, d).filter(col("p_size") === 15)
      val su = Tables.supplier(s, d)
      val perSupp = l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .groupBy(col("p_partkey"), col("l_suppkey"))
        .agg(min(col("l_extendedprice")).as("min_price"))
      val w = Window.partitionBy("p_partkey")
        .orderBy(col("min_price").asc, col("l_suppkey").asc)
      perSupp.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .join(broadcast(su), col("l_suppkey") === su("s_suppkey"))
        .select(col("p_partkey"), su("s_name"), col("min_price"))
        .orderBy("p_partkey")
    }),

    // Q4 shape: EXISTS(correlated, non-equi) → left-semi join with the
    // extra range predicate folded into the join condition. The semi
    // join shuffles both sides once on orderkey; no duplicate orders
    // ever materialize.
    "q4_late_order_priority" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= "1996-01-01" &&
          col("o_orderdate") < "1996-07-01")
      val l = Tables.lineitem(s, d)
      o.join(l,
          o("o_orderkey") === l("l_orderkey") &&
            l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // Q7 shape: bidirectional nation-pair volume. Two broadcast dim
    // chains hang off the one fact shuffle (orders⋈lineitem); the
    // nation pair filter prunes before the aggregate.
    "q7_volume_shipping" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val su = Tables.supplier(s, d)
      val n1 = Tables.nation(s, d).select(
        col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, d).select(
        col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(su), l("l_suppkey") === su("s_suppkey"))
        .join(broadcast(n1), su("s_nationkey") === col("sn_key"))
        .join(broadcast(n2), c("c_nationkey") === col("cn_key"))
        .filter(
          (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg((sum(disc10k).cast("double") / 10000.0).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // Q8 shape: market share = conditional sum / total sum per year —
    // the two-level aggregate collapses into ONE pass with a
    // when()-guarded numerator (no self-join, no second shuffle).
    "q8_market_share" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val su = Tables.supplier(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
      val cn = n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .select(col("n_nationkey").as("cn_key"))
      val sn = Tables.nation(s, d).select(
        col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(cn), c("c_nationkey") === col("cn_key"), "left_semi")
        .join(broadcast(su), l("l_suppkey") === su("s_suppkey"))
        .join(broadcast(sn), su("s_nationkey") === col("sn_key"))
        .groupBy(year(o("o_orderdate")).cast("long").as("o_year"))
        .agg(
          (sum(when(col("supp_nation") === "NATION_5", disc10k).otherwise(0L))
            .cast("double") / 10000.0).as("nation_revenue"),
          (sum(disc10k).cast("double") / 10000.0).as("total_revenue"))
        .select(col("o_year"),
          round(col("nation_revenue") / col("total_revenue"), 6)
            .as("mkt_share"),
          col("nation_revenue"), col("total_revenue"))
        .orderBy("o_year")
    }),

    // Q9 shape: profit by supplier nation × ship year for one product
    // line. Part filter broadcasts; fact shuffles once on the group key.
    "q9_product_profit" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      val p = Tables.part(s, d).filter(col("p_type") === "ECONOMY")
      val su = Tables.supplier(s, d)
      val n = Tables.nation(s, d)
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .join(broadcast(su), l("l_suppkey") === su("s_suppkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .groupBy(n("n_name").as("nation"),
          year(col("l_shipdate")).cast("long").as("o_year"))
        .agg((sum(disc10k).cast("double") / 10000.0).as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    // Q10 shape: top returned-revenue customers in a quarter. The
    // grouped fact is ranked with a full tiebreak; LIMIT after ORDER BY
    // is a TakeOrderedAndProject — no global sort materializes.
    "q10_returned_items" -> ((s, d) => {
      val l = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= "1996-01-01" &&
          col("o_orderdate") < "1996-04-01")
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(c("c_custkey"), c("c_name"), c("c_acctbal"), n("n_name"))
        .agg((sum(disc10k).cast("double") / 10000.0).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // Q11 shape: groups exceeding a fraction of a GLOBAL total — the
    // correlated scalar subquery decorrelates into a one-row aggregate
    // broadcast against the grouped table (two passes over the same
    // pre-aggregated input, never over raw facts twice).
    "q11_value_share" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      val su = Tables.supplier(s, d)
      val n = Tables.nation(s, d)
      val perNation = l
        .join(broadcast(su), l("l_suppkey") === su("s_suppkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .groupBy(n("n_name").as("nation"))
        .agg(sum((col("l_extendedprice") * 100.0 + 0.5).cast("long"))
          .as("value_c"))
      val total = perNation.agg(sum(col("value_c")).as("total_c"))
      perNation.crossJoin(broadcast(total))
        .filter(col("value_c").cast("double") > col("total_c").cast("double") * 0.04)
        .select(col("nation"),
          (col("value_c").cast("double") / 100.0).as("value"))
        .orderBy(col("value").desc, col("nation"))
    }),

    // Q12 shape: late-shipment severity buckets × priority urgency —
    // pure conditional aggregation after one equi-join, no subqueries
    // survive to the plan.
    "q12_late_shipments" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .filter(col("l_shipdate") >= "1996-01-01" &&
          col("l_shipdate") < "1997-01-01")
        .groupBy(when(
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
            lit("LATE")).otherwise(lit("ONTIME")).as("ship_bucket"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count"))
        .orderBy("ship_bucket")
    }),

    // Q13 shape: customer order-count distribution — LEFT OUTER join with
    // the filter folded into the join side (never after the outer join,
    // which would drop the zero-order customers), then a two-level
    // count-of-counts aggregate. Both groupBys shuffle on small keys.
    "q13_customer_distribution" -> ((s, d) => {
      val c = Tables.customer(s, d).select(col("c_custkey"))
      val o = Tables.orders(s, d)
        .filter(!col("o_orderpriority").startsWith("4"))
        .select(col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy(c("c_custkey"))
        .agg(count(col("o_custkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // Q15 shape: the "view + max over the view" pattern — revenue per
    // supplier, then keep the max-revenue row(s) via a broadcast one-row
    // max (exact scaled-long revenue makes the equality safe).
    "q15_top_supplier" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= "1996-01-01" &&
          col("l_shipdate") < "1996-04-01")
      val su = Tables.supplier(s, d)
      val rev = l.groupBy(col("l_suppkey"))
        .agg(sum(disc10k).as("rev_c"))
      val mx = rev.agg(max(col("rev_c")).as("max_c"))
      rev.crossJoin(broadcast(mx))
        .filter(col("rev_c") === col("max_c"))
        .join(broadcast(su), col("l_suppkey") === su("s_suppkey"))
        .select(su("s_suppkey"), su("s_name"),
          (col("rev_c").cast("double") / 10000.0).as("total_revenue"))
        .orderBy("s_suppkey")
    }),

    // Q16 shape: distinct-supplier counts per part attribute with an
    // excluded-supplier ANTI join (suppliers in bad standing). The anti
    // join prunes before the expensive distinct aggregation.
    "q16_supplier_counts" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      val p = Tables.part(s, d)
        .filter(col("p_brand") =!= "Brand#1" && col("p_size").isin(5, 15, 25))
      val bad = Tables.supplier(s, d).filter(col("s_acctbal") < 0.0)
        .select(col("s_suppkey"))
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .join(broadcast(bad), l("l_suppkey") === bad("s_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    }),

    // Q17 shape: correlated AVG threshold (qty < 0.5 * per-part avg)
    // decorrelated into a grouped aggregate joined back to the fact.
    // The per-part avg is exact (scaled-long sum / count) so both
    // engines compute bit-identical thresholds.
    "q17_small_qty_revenue" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      val p = Tables.part(s, d).filter(col("p_type") === "SMALL")
      val lp = l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      val avgQ = lp.groupBy(col("p_partkey").as("ap_key"))
        .agg((sum((col("l_quantity") * 100.0 + 0.5).cast("long"))
          .cast("double") / 100.0 / count(lit(1))).as("avg_qty"))
      lp.join(broadcast(avgQ), col("p_partkey") === col("ap_key"))
        .filter(col("l_quantity") < col("avg_qty") * 0.5)
        .agg(round((sum((col("l_extendedprice") * 100.0 + 0.5).cast("long"))
          .cast("double") / 100.0) / 7.0, 6).as("avg_yearly"))
    }),

    // Q19 shape: OR-of-ANDs predicate across a join — Catalyst extracts
    // the common l_partkey=p_partkey conjunct as the join key and leaves
    // the disjunction as a post-join filter; per-branch part filters
    // still prune the broadcast side.
    "q19_or_predicates" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      val p = Tables.part(s, d)
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30)))
        .agg((sum(disc10k).cast("double") / 10000.0).as("revenue"))
    }),

    // Q20 shape: nested IN subqueries with a correlated aggregate
    // threshold, fully decorrelated. (The testdata has no partsupp, so
    // "availability" is recast as shipped-quantity share: a supplier is
    // flagged when it shipped >50% of a filtered part's 1996 volume.)
    // part-filter → left-semi prune BEFORE the per-(part,supp) aggregate;
    // the per-part total reuses that aggregate (shuffle-once, then a
    // narrow re-agg); supplier membership → distinct + broadcast semi.
    "q20_potential_promotion" -> ((s, d) => {
      val p = Tables.part(s, d).filter(col("p_name").like("s%"))
        .select(col("p_partkey"))
      val perPS = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= "1996-01-01" &&
          col("l_shipdate") < "1997-01-01")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"),
          "left_semi")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum((col("l_quantity") * 100.0 + 0.5).cast("long")).as("qty_c"))
      val perP = perPS.groupBy(col("l_partkey").as("pp_key"))
        .agg(sum(col("qty_c")).as("tot_c"))
      val big = perPS.join(perP, col("l_partkey") === col("pp_key"))
        .filter(col("qty_c").cast("double") > col("tot_c").cast("double") * 0.5)
        .select(col("l_suppkey")).distinct()
      val n = Tables.nation(s, d)
        .filter(col("n_name").isin("NATION_1", "NATION_2", "NATION_3",
          "NATION_4", "NATION_5"))
      Tables.supplier(s, d)
        .join(broadcast(big), col("s_suppkey") === col("l_suppkey"),
          "left_semi")
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"),
          "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy("s_name")
    }),

    // Q21 shape: EXISTS + NOT EXISTS on self-joined facts — the late
    // supplier who was the ONLY late supplier on a multi-supplier order.
    // EXISTS → left-semi, NOT EXISTS → left-anti, both with the
    // inequality folded into the join condition; all three legs shuffle
    // on the same orderkey so AQE can reuse the exchange.
    "q21_waiting_supplier" -> ((s, d) => {
      val o = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate"))
      val l = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      val l1 = l.join(o, col("l_orderkey") === o("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .select(col("l_orderkey"), col("l_suppkey"), col("o_orderdate"))
      val l2 = l.select(col("l_orderkey").as("l2_ok"), col("l_suppkey").as("l2_sk"))
      val l3 = l.select(col("l_orderkey").as("l3_ok"), col("l_suppkey").as("l3_sk"),
        col("l_shipdate").as("l3_ship"))
      val su = Tables.supplier(s, d)
      l1.join(l2,
          col("l_orderkey") === col("l2_ok") && col("l_suppkey") =!= col("l2_sk"),
          "left_semi")
        .join(l3,
          col("l_orderkey") === col("l3_ok") && col("l_suppkey") =!= col("l3_sk") &&
            col("l3_ship") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_anti")
        .join(broadcast(su), col("l_suppkey") === su("s_suppkey"))
        .groupBy(su("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    }),

    // Q22 shape: global scalar threshold (avg positive balance) as a
    // broadcast one-row aggregate + NOT EXISTS(orders) as an anti join.
    "q22_idle_customers" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).select(col("o_custkey"))
      val avgBal = c.filter(col("c_acctbal") > 0.0)
        .agg((sum((col("c_acctbal") * 100.0 + 0.5).cast("long"))
          .cast("double") / 100.0 / count(lit(1))).as("avg_bal"))
      // Threshold at half the average balance so the anti-join branch is
      // non-vacuous at sf0.01 (full avg leaves zero survivors there,
      // which verified nothing).
      c.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal") * 0.5)
        .join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("numcust"),
          (sum(col("c_acctbal").cast(D182)).cast("double")).as("totacctbal"))
        .orderBy("c_mktsegment")
    })
  )

  val oracle: Map[String, String] = Map(
    "q2_min_price_supplier" ->
      """WITH per_supp AS (
        |  SELECT p.p_partkey, l.l_suppkey, min(l.l_extendedprice) AS min_price
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE p.p_size = 15
        |  GROUP BY p.p_partkey, l.l_suppkey)
        |SELECT p_partkey, s.s_name, min_price
        |FROM per_supp ps JOIN supplier s ON ps.l_suppkey = s.s_suppkey
        |QUALIFY row_number() OVER (PARTITION BY p_partkey
        |  ORDER BY min_price ASC, l_suppkey ASC) = 1
        |ORDER BY p_partkey""".stripMargin,
    "q4_late_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o.o_orderdate < TIMESTAMP '1996-07-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey
        |      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q7_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
        |  CAST(sum(CAST(trunc(l.l_extendedprice * (1.0 - l.l_discount)
        |    * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        |WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "q8_market_share" ->
      """WITH base AS (
        |  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
        |    n2.n_name AS supp_nation,
        |    CAST(trunc(l.l_extendedprice * (1.0 - l.l_discount) * 10000.0
        |      + 0.5) AS BIGINT) AS d10k
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
        |  WHERE c.c_nationkey IN (SELECT n.n_nationkey FROM nation n
        |    JOIN region r ON n.n_regionkey = r.r_regionkey
        |    WHERE r.r_name = 'ASIA')),
        |agg AS (SELECT o_year,
        |  CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN d10k ELSE 0 END)
        |    AS DOUBLE) / 10000.0 AS nation_revenue,
        |  CAST(sum(d10k) AS DOUBLE) / 10000.0 AS total_revenue
        |  FROM base GROUP BY o_year)
        |SELECT o_year, round(nation_revenue / total_revenue, 6) AS mkt_share,
        |  nation_revenue, total_revenue
        |FROM agg ORDER BY o_year""".stripMargin,
    "q9_product_profit" ->
      """SELECT n.n_name AS nation,
        |  CAST(year(l.l_shipdate) AS BIGINT) AS o_year,
        |  CAST(sum(CAST(trunc(l.l_extendedprice * (1.0 - l.l_discount)
        |    * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_profit
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |WHERE p.p_type = 'ECONOMY'
        |GROUP BY nation, o_year
        |ORDER BY nation, o_year DESC""".stripMargin,
    "q10_returned_items" ->
      """SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
        |  CAST(sum(CAST(trunc(l.l_extendedprice * (1.0 - l.l_discount)
        |    * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE l.l_returnflag = 'R'
        |  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o.o_orderdate < TIMESTAMP '1996-04-01'
        |GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
        |ORDER BY revenue DESC, c.c_custkey LIMIT 20""".stripMargin,
    "q11_value_share" ->
      """WITH per_nation AS (
        |  SELECT n.n_name AS nation,
        |    sum(CAST(trunc(l.l_extendedprice * 100.0 + 0.5) AS BIGINT))
        |      AS value_c
        |  FROM lineitem l
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  GROUP BY nation)
        |SELECT nation, CAST(value_c AS DOUBLE) / 100.0 AS value
        |FROM per_nation,
        |  (SELECT sum(value_c) AS total_c FROM per_nation) t
        |WHERE CAST(value_c AS DOUBLE) > CAST(total_c AS DOUBLE) * 0.04
        |ORDER BY value DESC, nation""".stripMargin,
    "q12_late_shipments" ->
      """SELECT CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
        |    THEN 'LATE' ELSE 'ONTIME' END AS ship_bucket,
        |  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l.l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY ship_bucket ORDER BY ship_bucket""".stripMargin,
    "q13_customer_distribution" ->
      """WITH c_orders AS (
        |  SELECT c.c_custkey, count(o.o_custkey) AS c_count
        |  FROM customer c LEFT OUTER JOIN orders o
        |    ON c.c_custkey = o.o_custkey
        |    AND o.o_orderpriority NOT LIKE '4%'
        |  GROUP BY c.c_custkey)
        |SELECT c_count, count(*) AS custdist
        |FROM c_orders GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q20_potential_promotion" ->
      """WITH p AS (SELECT p_partkey FROM part WHERE p_name LIKE 's%'),
        |l96 AS (
        |  SELECT l_partkey, l_suppkey,
        |    sum(CAST(trunc(l_quantity * 100.0 + 0.5) AS BIGINT)) AS qty_c
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-01-01'
        |    AND l_partkey IN (SELECT p_partkey FROM p)
        |  GROUP BY l_partkey, l_suppkey),
        |tot AS (SELECT l_partkey AS pp_key, sum(qty_c) AS tot_c
        |  FROM l96 GROUP BY l_partkey),
        |big AS (SELECT DISTINCT l_suppkey
        |  FROM l96 JOIN tot ON l96.l_partkey = tot.pp_key
        |  WHERE CAST(qty_c AS DOUBLE) > CAST(tot_c AS DOUBLE) * 0.5)
        |SELECT s.s_suppkey, s.s_name
        |FROM supplier s
        |WHERE s.s_suppkey IN (SELECT l_suppkey FROM big)
        |  AND s.s_nationkey IN (SELECT n_nationkey FROM nation
        |    WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3',
        |      'NATION_4', 'NATION_5'))
        |ORDER BY s_name""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    sum(CAST(trunc(l_extendedprice * (1.0 - l_discount) * 10000.0
        |      + 0.5) AS BIGINT)) AS rev_c
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s.s_suppkey, s.s_name,
        |  CAST(rev_c AS DOUBLE) / 10000.0 AS total_revenue
        |FROM rev
        |JOIN supplier s ON rev.l_suppkey = s.s_suppkey
        |CROSS JOIN (SELECT max(rev_c) AS max_c FROM rev) m
        |WHERE rev_c = max_c
        |ORDER BY s_suppkey""".stripMargin,
    "q16_supplier_counts" ->
      """SELECT p.p_brand, p.p_type, p.p_size,
        |  count(DISTINCT l.l_suppkey) AS supplier_cnt
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE p.p_brand <> 'Brand#1' AND p.p_size IN (5, 15, 25)
        |  AND NOT EXISTS (SELECT 1 FROM supplier s
        |    WHERE s.s_suppkey = l.l_suppkey AND s.s_acctbal < 0.0)
        |GROUP BY p.p_brand, p.p_type, p.p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q17_small_qty_revenue" ->
      """WITH lp AS (
        |  SELECT l.l_quantity, l.l_extendedprice, p.p_partkey
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE p.p_type = 'SMALL'),
        |avg_q AS (SELECT p_partkey AS ap_key,
        |  CAST(sum(CAST(trunc(l_quantity * 100.0 + 0.5) AS BIGINT))
        |    AS DOUBLE) / 100.0 / count(*) AS avg_qty
        |  FROM lp GROUP BY p_partkey)
        |SELECT round((CAST(sum(CAST(trunc(l_extendedprice * 100.0 + 0.5)
        |    AS BIGINT)) AS DOUBLE) / 100.0) / 7.0, 6)
        |  AS avg_yearly
        |FROM lp JOIN avg_q ON lp.p_partkey = avg_q.ap_key
        |WHERE lp.l_quantity < avg_q.avg_qty * 0.5""".stripMargin,
    "q19_or_predicates" ->
      """SELECT CAST(sum(CAST(trunc(l.l_extendedprice * (1.0 - l.l_discount)
        |    * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
        |    AND l.l_quantity BETWEEN 1 AND 11)
        |   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
        |    AND l.l_quantity BETWEEN 10 AND 20)
        |   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
        |    AND l.l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q21_waiting_supplier" ->
      """SELECT s.s_name, count(*) AS numwait
        |FROM lineitem l1
        |JOIN orders o ON l1.l_orderkey = o.o_orderkey
        |JOIN supplier s ON l1.l_suppkey = s.s_suppkey
        |WHERE o.o_orderstatus = 'F'
        |  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY s.s_name
        |ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin,
    "q22_idle_customers" ->
      """WITH avg_bal AS (
        |  SELECT CAST(sum(CAST(trunc(c_acctbal * 100.0 + 0.5) AS BIGINT))
        |    AS DOUBLE) / 100.0 / count(*) AS avg_bal
        |  FROM customer WHERE c_acctbal > 0.0)
        |SELECT c.c_mktsegment, count(*) AS numcust,
        |  CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |    AS totacctbal
        |FROM customer c, avg_bal
        |WHERE c.c_acctbal > avg_bal.avg_bal * 0.5
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey)
        |GROUP BY c.c_mktsegment ORDER BY c_mktsegment""".stripMargin
  )
}
