package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The classic analytic join/agg shapes (TPC-H Q4/Q7-Q10/Q12/Q14/Q16-Q21)
  * adapted to the driver star schema (no partsupp, no commit/receipt dates —
  * lateness is modeled as shipdate vs orderdate+interval). Together with
  * q1/q3/q5/q6/q11/q13/q15/q22 in the other files this completes the
  * standard join-shape battery: semi/anti joins, disjunctive predicates,
  * grouped HAVING probes, nested semi chains, and share-of-global gates.
  *
  * Numeric invariant (NOTES.md): money sums go through DECIMAL(18,4) casts
  * (exact, order-insensitive); ratios divide two identically-derived doubles
  * at the very end (correctly-rounded IEEE ÷ of identical inputs is
  * identical); quantities are exact integers.
  */
object QueriesJoins {

  private val revenue =
    sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .cast(DecimalType(18, 4))).cast("double")

  private val revenueSql =
    "CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)"

  def queries: Map[String, Q] = Map(

    // Q4 shape: EXISTS semi-join — orders in a quarter with at least one
    // late line (shipped >30 days after order). The semi-join keeps the
    // orders side's cardinality: no fan-out, one shuffle on orderkey.
    "q4_priority_exists" -> Q(
      fn = (s, dir) => {
        val o = Tables.orders(s, dir)
          .filter(col("o_orderdate") >= to_timestamp(lit("1996-07-01 00:00:00")) &&
            col("o_orderdate") < to_timestamp(lit("1996-10-01 00:00:00")))
        val l = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_shipdate"))
        o.join(l, col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
            "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"))
          .orderBy(col("o_orderpriority"))
      },
      oracle = Some(
        """WITH late AS (
          |  SELECT DISTINCT o_orderkey FROM orders JOIN lineitem ON l_orderkey = o_orderkey
          |  WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
          |    AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
          |SELECT o_orderpriority, count(*) AS n_orders
          |FROM orders JOIN late USING (o_orderkey)
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      doc = "Q4 shape: EXISTS semi-join, late-line predicate rides the join"),

    // Q7 shape: bilateral volume between two nations by ship year. Both
    // nation dims broadcast; the pair filter prunes before the group-by.
    "q7_volume_shipping" -> Q(
      fn = (s, dir) => {
        val n1 = Tables.nation(s, dir)
          .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
        val n2 = Tables.nation(s, dir)
          .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
        Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
            col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")))
          .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
          .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
            (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).cast("long").as("l_year"))
          .agg(revenue.as("volume"))
          .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      },
      oracle = Some(
        s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           |  CAST(year(l_shipdate) AS BIGINT) AS l_year, $revenueSql AS volume
           |FROM lineitem
           |JOIN supplier ON l_suppkey = s_suppkey
           |JOIN nation n1 ON s_nationkey = n1.n_nationkey
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation n2 ON c_nationkey = n2.n_nationkey
           |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
           |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
           |GROUP BY supp_nation, cust_nation, l_year
           |ORDER BY supp_nation, cust_nation, l_year""".stripMargin),
      doc = "Q7 shape: bilateral nation volume, broadcast dims, year rollup"),

    // Q8 shape: market share — one nation's slice of a region's PROMO
    // revenue by year. Numerator and denominator aggregate in the same
    // DECIMAL pass (conditional sum), share divides the two doubles last.
    "q8_market_share" -> Q(
      fn = (s, dir) => {
        val nr = Tables.nation(s, dir)
          .join(Tables.region(s, dir).filter(col("r_name") === "ASIA"),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey").as("c_nk"))
        val sn = Tables.nation(s, dir)
          .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
        Tables.lineitem(s, dir)
          .join(broadcast(Tables.part(s, dir).filter(col("p_type") === "PROMO")),
            col("l_partkey") === col("p_partkey"))
          .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(sn), col("s_nationkey") === col("s_nk"))
          .join(Tables.orders(s, dir)
            .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
              col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00"))),
            col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
          .join(broadcast(nr), col("c_nationkey") === col("c_nk"))
          .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
          .agg(
            sum(when(col("supp_nation") === "NATION_5",
              (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
                .cast(DecimalType(18, 4))).otherwise(lit(0).cast(DecimalType(18, 4))))
              .cast("double").as("nation_volume"),
            revenue.as("total_volume"))
          .withColumn("mkt_share", col("nation_volume") / col("total_volume"))
          .orderBy(col("o_year"))
      },
      oracle = Some(
        s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           |  CAST(sum(CASE WHEN n1.n_name = 'NATION_5'
           |    THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))
           |    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS nation_volume,
           |  $revenueSql AS total_volume,
           |  CAST(sum(CASE WHEN n1.n_name = 'NATION_5'
           |    THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))
           |    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
           |    / $revenueSql AS mkt_share
           |FROM lineitem
           |JOIN part ON l_partkey = p_partkey
           |JOIN supplier ON l_suppkey = s_suppkey
           |JOIN nation n1 ON s_nationkey = n1.n_nationkey
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation n2 ON c_nationkey = n2.n_nationkey
           |JOIN region ON n2.n_regionkey = r_regionkey
           |WHERE r_name = 'ASIA' AND p_type = 'PROMO'
           |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
           |GROUP BY o_year ORDER BY o_year""".stripMargin),
      doc = "Q8 shape: share of a region's category revenue, conditional DECIMAL sum"),

    // Q9 shape: product-line profit by supplier nation × year. No partsupp
    // in the schema, so cost is modeled as 60% of retail (exact DECIMAL:
    // 0.6 and p_retailprice are both dyadic-safe through the (18,4) cast).
    "q9_product_profit" -> Q(
      fn = (s, dir) => {
        val sn = Tables.nation(s, dir)
          .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
        Tables.lineitem(s, dir)
          .join(broadcast(Tables.part(s, dir).filter(col("p_name").contains("widget"))),
            col("l_partkey") === col("p_partkey"))
          .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(sn), col("s_nationkey") === col("s_nk"))
          .groupBy(col("supp_nation"), year(col("l_shipdate")).cast("long").as("l_year"))
          .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .cast(DecimalType(18, 4)) -
            (col("p_retailprice") * lit(0.6) * col("l_quantity"))
              .cast(DecimalType(18, 4))).cast("double").as("profit"),
            count(lit(1)).as("n_lines"))
          .orderBy(col("supp_nation"), col("l_year").desc)
      },
      oracle = Some(
        """SELECT n_name AS supp_nation, CAST(year(l_shipdate) AS BIGINT) AS l_year,
          |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))
          |    - CAST(p_retailprice * 0.6 * l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS profit,
          |  count(*) AS n_lines
          |FROM lineitem
          |JOIN part ON l_partkey = p_partkey
          |JOIN supplier ON l_suppkey = s_suppkey
          |JOIN nation ON s_nationkey = n_nationkey
          |WHERE p_name LIKE '%widget%'
          |GROUP BY supp_nation, l_year
          |ORDER BY supp_nation, l_year DESC""".stripMargin),
      doc = "Q9 shape: margin rollup by nation x year, name-contains part filter"),

    // Q10 shape: top-20 customers by returned-goods revenue in a quarter.
    // TakeOrderedAndProject keeps the top-k distributed.
    "q10_returned_items" -> Q(
      fn = (s, dir) => {
        val nn = Tables.nation(s, dir).select(col("n_nationkey"), col("n_name"))
        Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
          .join(Tables.orders(s, dir)
            .filter(col("o_orderdate") >= to_timestamp(lit("1996-10-01 00:00:00")) &&
              col("o_orderdate") < to_timestamp(lit("1997-01-01 00:00:00"))),
            col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
          .join(broadcast(nn), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
          .agg(revenue.as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      oracle = Some(
        s"""SELECT c_custkey, c_name, c_acctbal, n_name, $revenueSql AS revenue
           |FROM lineitem
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation ON c_nationkey = n_nationkey
           |WHERE l_returnflag = 'R'
           |  AND o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-01-01'
           |GROUP BY c_custkey, c_name, c_acctbal, n_name
           |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin),
      doc = "Q10 shape: returned-items top-k customers"),

    // Q12 shape: priority-class CASE counts for late shipments by line
    // status (shipmode isn't in the schema; linestatus is the 2-value
    // dimension playing its role).
    "q12_late_priority" -> Q(
      fn = (s, dir) => Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")))
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count"))
        .orderBy(col("l_linestatus")),
      oracle = Some(
        """SELECT l_linestatus,
          |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
          |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
          |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
          |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
          |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin),
      doc = "Q12 shape: late-shipment priority-class pivot"),

    // Q14 shape: promo revenue share in one month — two conditional DECIMAL
    // sums in one pass, double division last.
    "q14_promo_effect" -> Q(
      fn = (s, dir) => Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= to_timestamp(lit("1997-09-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1997-10-01 00:00:00")))
        .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO",
            (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .cast(DecimalType(18, 4))).otherwise(lit(0).cast(DecimalType(18, 4))))
            .cast("double").as("promo_revenue"),
          revenue.as("total_revenue"))
        .withColumn("promo_share", col("promo_revenue") / col("total_revenue")),
      oracle = Some(
        s"""SELECT
           |  CAST(sum(CASE WHEN p_type = 'PROMO'
           |    THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))
           |    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS promo_revenue,
           |  $revenueSql AS total_revenue,
           |  CAST(sum(CASE WHEN p_type = 'PROMO'
           |    THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))
           |    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) / $revenueSql AS promo_share
           |FROM lineitem JOIN part ON l_partkey = p_partkey
           |WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'""".stripMargin),
      doc = "Q14 shape: category share of a month's revenue"),

    // Q16 shape: distinct-supplier census per (brand, size) excluding a
    // "complaints" supplier set (NOT IN → broadcast anti-join; the excluded
    // set is tiny and the anti-join never shuffles the fact side).
    "q16_supplier_census" -> Q(
      fn = (s, dir) => {
        val complaints = Tables.supplier(s, dir).filter(col("s_acctbal") < 0)
          .select(col("s_suppkey"))
        Tables.lineitem(s, dir)
          .join(broadcast(Tables.part(s, dir)
            .filter(col("p_brand") =!= "Brand#13" &&
              col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))),
            col("l_partkey") === col("p_partkey"))
          .join(broadcast(complaints), col("l_suppkey") === col("s_suppkey"), "left_anti")
          .groupBy(col("p_brand"), col("p_size"))
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
      },
      oracle = Some(
        """SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
          |FROM lineitem JOIN part ON l_partkey = p_partkey
          |WHERE p_brand <> 'Brand#13' AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
          |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
          |GROUP BY p_brand, p_size
          |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin),
      doc = "Q16 shape: distinct-supplier census with NOT-IN anti-join"),

    // Q17 shape: small-quantity outliers vs a per-part mean. The correlated
    // scalar subquery decorrelates to a per-part aggregate joined back;
    // `qty < 0.2·avg` cross-multiplies to exact integers (5·n·qty < Σqty).
    "q17_small_quantity" -> Q(
      fn = (s, dir) => {
        val perPart = Tables.lineitem(s, dir)
          .groupBy(col("l_partkey").as("pp_partkey"))
          .agg(count(lit(1)).as("n_li"),
            sum(col("l_quantity").cast("long")).as("sum_qty"))
        Tables.lineitem(s, dir)
          .join(broadcast(Tables.part(s, dir).filter(col("p_brand") === "Brand#9")),
            col("l_partkey") === col("p_partkey"))
          .join(perPart, col("l_partkey") === col("pp_partkey"))
          .filter(col("l_quantity").cast("long") * 5 * col("n_li") < col("sum_qty"))
          .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2)))
            .cast("double").as("small_qty_revenue"),
            count(lit(1)).as("n_lines"))
      },
      oracle = Some(
        """WITH per_part AS (
          |  SELECT l_partkey AS pp_partkey, count(*) AS n_li,
          |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
          |  FROM lineitem GROUP BY l_partkey)
          |SELECT
          |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_qty_revenue,
          |  count(*) AS n_lines
          |FROM lineitem
          |JOIN part ON l_partkey = p_partkey
          |JOIN per_part ON l_partkey = pp_partkey
          |WHERE p_brand = 'Brand#9'
          |  AND CAST(l_quantity AS BIGINT) * 5 * n_li < sum_qty""".stripMargin),
      doc = "Q17 shape: decorrelated per-part mean probe, cross-multiplied int gate"),

    // Q18 shape: large orders (grouped HAVING probe joined back to the
    // detail). The HAVING side pre-aggregates to one row per order before
    // any join — the probe is a key-count sketch, not the fact table.
    "q18_large_orders" -> Q(
      fn = (s, dir) => {
        val big = Tables.lineitem(s, dir)
          .groupBy(col("l_orderkey"))
          .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
          .filter(col("sum_qty") > 180)
        Tables.orders(s, dir)
          .join(big, col("o_orderkey") === col("l_orderkey"))
          .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(100)
      },
      oracle = Some(
        """WITH big AS (
          |  SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
          |  FROM lineitem GROUP BY l_orderkey HAVING sum(CAST(l_quantity AS BIGINT)) > 180)
          |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
          |FROM orders JOIN big ON o_orderkey = l_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin),
      doc = "Q18 shape: grouped-HAVING probe joined back to detail"),

    // Q19 shape: disjunctive join predicate — three (brand × size × qty)
    // conjunction branches OR'd together. Catalyst extracts the common
    // l_partkey=p_partkey equi-condition; the residual OR evaluates
    // post-join inside codegen, and the part side broadcasts.
    "q19_disjunctive" -> Q(
      fn = (s, dir) => {
        val branch1 = col("p_brand") === "Brand#1" &&
          col("p_size").between(1, 10) && col("l_quantity").between(1, 15)
        val branch2 = col("p_brand") === "Brand#7" &&
          col("p_size").between(11, 25) && col("l_quantity").between(10, 25)
        val branch3 = col("p_brand") === "Brand#15" &&
          col("p_size").between(26, 50) && col("l_quantity").between(20, 35)
        Tables.lineitem(s, dir)
          .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
          .filter(branch1 || branch2 || branch3)
          .agg(revenue.as("revenue"), count(lit(1)).as("n_lines"))
      },
      oracle = Some(
        s"""SELECT $revenueSql AS revenue, count(*) AS n_lines
           |FROM lineitem JOIN part ON l_partkey = p_partkey
           |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 15)
           |   OR (p_brand = 'Brand#7' AND p_size BETWEEN 11 AND 25 AND l_quantity BETWEEN 10 AND 25)
           |   OR (p_brand = 'Brand#15' AND p_size BETWEEN 26 AND 50 AND l_quantity BETWEEN 20 AND 35)""".stripMargin),
      doc = "Q19 shape: OR-of-conjunctions join predicate"),

    // Q20 shape: nested semi chain — suppliers in one nation who moved
    // serious volume of a part family in a year. Aggregates first (per
    // part×supplier), gates on the exact integer sum, then semi-joins
    // upward to suppliers.
    "q20_excess_suppliers" -> Q(
      fn = (s, dir) => {
        val moved = Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
            col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")))
          .join(broadcast(Tables.part(s, dir).filter(col("p_name").contains("bolt"))),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(sum(col("l_quantity").cast("long")).as("qty"))
          .filter(col("qty") > 50)
          .select(col("l_suppkey")).distinct()
        val nat = Tables.nation(s, dir).filter(col("n_name") === "NATION_3")
        Tables.supplier(s, dir)
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"), "left_semi")
          .join(moved, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .select(col("s_suppkey"), col("s_name"))
          .orderBy(col("s_suppkey"))
      },
      oracle = Some(
        """WITH moved AS (
          |  SELECT l_partkey, l_suppkey, sum(CAST(l_quantity AS BIGINT)) AS qty
          |  FROM lineitem JOIN part ON l_partkey = p_partkey
          |  WHERE p_name LIKE '%bolt%'
          |    AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
          |  GROUP BY l_partkey, l_suppkey HAVING sum(CAST(l_quantity AS BIGINT)) > 50)
          |SELECT s_suppkey, s_name FROM supplier
          |JOIN nation ON s_nationkey = n_nationkey
          |WHERE n_name = 'NATION_3'
          |  AND s_suppkey IN (SELECT l_suppkey FROM moved)
          |ORDER BY s_suppkey""".stripMargin),
      doc = "Q20 shape: nested semi chain over pre-aggregated volume gate"),

    // Q21 shape: suppliers who kept multi-supplier orders waiting — the
    // sole late supplier on an order with other suppliers. The double
    // EXISTS/NOT-EXISTS decorrelates to one per-order census (distinct
    // suppliers, distinct late suppliers) joined back to the late lines.
    "q21_waiting_supplier" -> Q(
      fn = (s, dir) => {
        val ll = Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir).filter(col("o_orderstatus") === "F"),
            col("l_orderkey") === col("o_orderkey"))
          .withColumn("late",
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
          .select(col("l_orderkey"), col("l_suppkey"), col("late"))
        val perOrder = ll.groupBy(col("l_orderkey").as("po_orderkey"))
          .agg(countDistinct(col("l_suppkey")).as("n_supp"),
            countDistinct(when(col("late"), col("l_suppkey"))).as("n_late"))
        val qual = ll.filter(col("late"))
          .join(perOrder, col("l_orderkey") === col("po_orderkey"))
          .filter(col("n_supp") > 1 && col("n_late") === 1)
          .select(col("l_orderkey"), col("l_suppkey")).distinct()
        qual.join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(25)
      },
      oracle = Some(
        """WITH ll AS (
          |  SELECT l_orderkey, l_suppkey,
          |    (l_shipdate > o_orderdate + INTERVAL 60 DAY) AS late
          |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |  WHERE o_orderstatus = 'F'),
          |per_order AS (
          |  SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_supp,
          |    count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late
          |  FROM ll GROUP BY l_orderkey),
          |qual AS (
          |  SELECT DISTINCT ll.l_orderkey, ll.l_suppkey
          |  FROM ll JOIN per_order USING (l_orderkey)
          |  WHERE ll.late AND n_supp > 1 AND n_late = 1)
          |SELECT s_name, count(*) AS numwait
          |FROM qual JOIN supplier ON l_suppkey = s_suppkey
          |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 25""".stripMargin),
      doc = "Q21 shape: sole-late-supplier census, decorrelated EXISTS pair"),

    // Q2 shape: min-cost supplier per part — the correlated scalar-min
    // subquery decorrelated to a per-part min joined back with equality
    // (ties preserved, as TPC-H requires). Cost is the cheapest observed
    // line price per (part, supplier) in region EUROPE; pure MIN over
    // stored doubles — no arithmetic, so equality is exact.
    "q2_min_cost_supplier" -> Q(
      fn = (s, dir) => {
        val euroSupp = Tables.supplier(s, dir)
          .join(broadcast(Tables.nation(s, dir)
            .join(Tables.region(s, dir).filter(col("r_name") === "EUROPE"),
              col("n_regionkey") === col("r_regionkey"))
            .select(col("n_nationkey"), col("n_name"))),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
        val offers = Tables.lineitem(s, dir)
          .join(euroSupp, col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(min(col("l_extendedprice")).as("cost"))
        val minCost = offers.groupBy(col("l_partkey").as("mc_partkey"))
          .agg(min(col("cost")).as("min_cost"))
        // fresh aliased projection — offers derives from euroSupp, so a raw
        // re-join would carry duplicate attribute ids into the condition
        val suppInfo = euroSupp.select(col("s_suppkey").as("es_suppkey"),
          col("s_name"), col("s_acctbal"), col("n_name"))
        offers
          .join(minCost, col("l_partkey") === col("mc_partkey") &&
            col("cost") === col("min_cost"))
          .join(broadcast(Tables.part(s, dir)
            .filter(col("p_size") === 25 && col("p_type") === "LARGE")),
            col("l_partkey") === col("p_partkey"))
          .join(broadcast(suppInfo), col("l_suppkey") === col("es_suppkey"))
          .select(col("s_acctbal"), col("s_name"), col("n_name"),
            col("p_partkey"), col("p_name"), col("cost"))
          .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
          .limit(100)
      },
      oracle = Some(
        """WITH euro AS (
          |  SELECT s_suppkey, s_name, s_acctbal, n_name
          |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
          |  JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'),
          |offers AS (
          |  SELECT l_partkey, l_suppkey, min(l_extendedprice) AS cost
          |  FROM lineitem JOIN euro ON l_suppkey = s_suppkey
          |  GROUP BY l_partkey, l_suppkey),
          |mc AS (SELECT l_partkey, min(cost) AS min_cost FROM offers GROUP BY l_partkey)
          |SELECT s_acctbal, s_name, n_name, p_partkey, p_name, cost
          |FROM offers
          |JOIN mc USING (l_partkey)
          |JOIN part ON l_partkey = p_partkey
          |JOIN euro ON l_suppkey = s_suppkey
          |WHERE cost = min_cost AND p_size = 25 AND p_type = 'LARGE'
          |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin),
      doc = "Q2 shape: decorrelated min-cost-supplier argmin join-back with ties"))
}
