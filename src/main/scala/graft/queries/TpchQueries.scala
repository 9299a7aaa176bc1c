package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The remaining TPC-H shapes expressible over the driver's trimmed
  * star schema (no partsupp / shipmode / commit-receipt dates — those
  * queries' predicates are adapted to carried columns, keeping the PLAN
  * shape that makes each query a distinct optimizer exercise:
  * outer-join count distributions, correlated scalar subqueries,
  * disjunctive join predicates, double-correlated EXISTS/NOT EXISTS,
  * CTE-reuse with a scalar MAX).
  *
  * Reference anchor: cascading.hbase expresses relational pipelines by
  * composing Each/Every/CoGroup over taps (src/java/.../HBaseTap.java);
  * these queries are that compositional surface at full TPC-H
  * complexity, declared through Catalyst so subquery decorrelation,
  * join planning, and partial aggregation are automatic.
  *
  * Determinism: money sums ride DECIMAL and cast to DOUBLE last;
  * `l_quantity`/`c_acctbal` averages divide exactly-representable
  * sums, so correlated thresholds compare identically in Spark and
  * DuckDB; every multi-row result ends in a total ORDER BY.
  */
object TpchQueries {

  private val dec4 = DecimalType(18, 4)

  val defs: Map[String, Q] = checked(
    // Q10 returned-item reporting: two shuffle joins (fact-to-fact),
    // broadcast nation dim, partial agg on the composite customer key,
    // then TakeOrderedAndProject — no global sort for a top-20.
    "q_tpch_q10" -> { (s, dir) =>
      val c = table(s, dir, "customer")
      val o = table(s, dir, "orders")
      val l = table(s, dir, "lineitem")
      val n = table(s, dir, "nation")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .filter(col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_returnflag") === "R")
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("n_name"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(dec4)).cast("double").as("revenue"))
        .select(col("c_custkey"), col("c_name"), col("revenue"),
          col("c_acctbal"), col("n_name"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    // Q13 customer order-count distribution: LEFT OUTER join with a
    // FILTERED join condition (the filter rides the join, not a WHERE —
    // unmatched customers must survive with count 0), then a second
    // aggregation over the first's output. Two shuffles total; the
    // second groups ~50 distinct counts, so it collapses map-side.
    "q_tpch_q13" -> { (s, dir) =>
      val c = table(s, dir, "customer")
      val o = table(s, dir, "orders")
        .filter(col("o_orderpriority") =!= "1-URGENT")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // Q15 top supplier: the scalar MAX is a one-row tree-aggregate of
    // the per-supplier revenue, broadcast back via cross join. Both
    // branches (per-supplier agg, global max-of-agg) share the identical
    // shuffle-on-l_suppkey subtree, so ReuseExchange keeps lineitem to a
    // SINGLE scan (plan-pinned in PlanGuardSpec); unlike the earlier
    // `max().over(Window.partitionBy())` form, no stage ever funnels the
    // |suppliers| dimension (SF×10k — ~10^9 rows at 100 TB) through one
    // task. Equality compares the DECIMAL (exact); only the output casts
    // to double.
    "q_tpch_q15" -> { (s, dir) =>
      val sup = table(s, dir, "supplier")
      // the explicit isnotnull matches the join-side inferred filter, so
      // BOTH branches' shuffle subtrees canonicalize identically and
      // AQE's exchange reuse executes the lineitem scan+partial-agg ONCE
      val rev = table(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-07-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-10-01").cast("timestamp") &&
          col("l_suppkey").isNotNull)
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(dec4)).as("rev_dec"))
      val top = rev
        .crossJoin(broadcast(rev.agg(max(col("rev_dec")).as("max_rev"))))
        .filter(col("rev_dec") === col("max_rev"))
      sup.join(broadcast(top), col("s_suppkey") === col("supplier_no"))
        .select(col("s_suppkey"), col("s_name"),
          col("rev_dec").cast("double").as("total_revenue"))
        .orderBy(col("s_suppkey"))
    },

    // Q17 small-quantity-order revenue: correlated scalar subquery
    // (per-part average quantity) — Catalyst decorrelates it to an
    // aggregate-then-join, so the fact table is scanned twice but never
    // nested-looped. Adapted selection: p_brand + p_size (no container
    // column in the testdata).
    "q_tpch_q17" -> { (s, dir) =>
      table(s, dir, "lineitem").createOrReplaceTempView("lineitem_q17")
      table(s, dir, "part").createOrReplaceTempView("part_q17")
      s.sql(
        """SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
          |    AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
          |FROM lineitem_q17, part_q17
          |WHERE p_partkey = l_partkey
          |  AND p_brand = 'Brand#23' AND p_size < 15
          |  AND l_quantity < (SELECT CAST(0.2 AS DOUBLE) * AVG(l_quantity)
          |                    FROM lineitem_q17 l2
          |                    WHERE l2.l_partkey = p_partkey)""".stripMargin)
    },

    // Q19 disjunctive-predicate join: the common `p_partkey = l_partkey`
    // factors OUT of the OR, so this plans as ONE hash join with the
    // disjunction as a post-join filter — never a nested-loop over the
    // cross product (plan-audited in PLANS.md).
    "q_tpch_q19" -> { (s, dir) =>
      val l = table(s, dir, "lineitem")
      val p = table(s, dir, "part")
      l.join(broadcast(p), col("p_partkey") === col("l_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" &&
            col("l_quantity").between(1, 11) && col("p_size").between(1, 15)) ||
          (col("p_brand") === "Brand#23" &&
            col("l_quantity").between(10, 20) && col("p_size").between(1, 20)) ||
          (col("p_brand") === "Brand#34" &&
            col("l_quantity").between(20, 30) && col("p_size").between(1, 25)))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(dec4)).cast("double").as("revenue"))
    },

    // Q21 suppliers-who-kept-waiting: EXISTS + NOT EXISTS against the
    // same fact table, both correlated on the outer order AND (for the
    // anti side) the outer order DATE — a two-column correlation Spark
    // rewrites to a left-semi and a left-anti join with mixed
    // equi/range conditions. Lateness adapted to ship-vs-order date.
    "q_tpch_q21" -> { (s, dir) =>
      table(s, dir, "supplier").createOrReplaceTempView("supplier_q21")
      table(s, dir, "lineitem").createOrReplaceTempView("lineitem_q21")
      table(s, dir, "orders").createOrReplaceTempView("orders_q21")
      s.sql(
        """SELECT s_name, COUNT(*) AS numwait
          |FROM supplier_q21, lineitem_q21 l1, orders_q21
          |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
          |  AND o_orderstatus = 'F'
          |  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
          |  AND EXISTS (SELECT 1 FROM lineitem_q21 l2
          |              WHERE l2.l_orderkey = l1.l_orderkey
          |                AND l2.l_suppkey <> l1.l_suppkey)
          |  AND NOT EXISTS (SELECT 1 FROM lineitem_q21 l3
          |                  WHERE l3.l_orderkey = l1.l_orderkey
          |                    AND l3.l_suppkey <> l1.l_suppkey
          |                    AND l3.l_shipdate > o_orderdate
          |                        + INTERVAL 90 DAY)
          |GROUP BY s_name
          |ORDER BY numwait DESC, s_name""".stripMargin)
    },

    // Q22 global-sales opportunity: an uncorrelated scalar subquery
    // (broadcast 1-row threshold), a NOT EXISTS anti-join against
    // orders, and a derived grouping key. Country code adapted to the
    // customer-name suffix (no phone column); "no orders" windowed to
    // the last 20 months (every synthetic customer has lifetime orders).
    "q_tpch_q22" -> { (s, dir) =>
      table(s, dir, "customer").createOrReplaceTempView("customer_q22")
      table(s, dir, "orders").createOrReplaceTempView("orders_q22")
      s.sql(
        """SELECT cntrycode, COUNT(*) AS numcust,
          |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
          |    AS totacctbal
          |FROM (SELECT substring(c_name, 17, 2) AS cntrycode,
          |             c_acctbal, c_custkey
          |      FROM customer_q22
          |      WHERE c_acctbal >
          |          (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)))
          |             AS DOUBLE) / COUNT(*)
          |           FROM customer_q22 WHERE c_acctbal > 0.0)
          |        AND NOT EXISTS (SELECT 1 FROM orders_q22
          |                        WHERE o_custkey = c_custkey
          |                          AND o_orderdate >=
          |                              TIMESTAMP '2000-01-01'))
          |GROUP BY cntrycode
          |ORDER BY cntrycode""".stripMargin)
    },

    // Q7 volume shipping: the two-nation-pair disjunction. Both nation
    // dims pre-filter to the two names BEFORE broadcasting (the OR
    // implies each side is one of the pair — Catalyst doesn't derive
    // that IN from the disjunction on its own), so the broadcasts carry
    // 2 rows each and the pair predicate evaluates post-join on the
    // already-restricted stream. Fact tables shuffle-join on their
    // natural keys; at 100 TB the l/o join dominates and neither dim
    // touches an exchange.
    "q_tpch_q7" -> { (s, dir) =>
      val pair = Seq("NATION_3", "NATION_8")
      val n1 = table(s, dir, "nation").filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
      val n2 = table(s, dir, "nation").filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
      table(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(table(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(table(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(table(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
        .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
        .filter((col("supp_nation") === pair(0) && col("cust_nation") === pair(1)) ||
          (col("supp_nation") === pair(1) && col("cust_nation") === pair(0)))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(dec4)).cast("double").as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    },

    // Q8 national market share: conditional-aggregate ratio over an
    // 8-table join (two roles for nation). Numerator and denominator
    // sum the SAME decimal volume column (one CASE-gated), so one
    // aggregate computes both and the double division of two exact
    // decimals is engine-deterministic.
    "q_tpch_q8" -> { (s, dir) =>
      val n1 = table(s, dir, "nation")
        .select(col("n_nationkey").as("n1_key"), col("n_regionkey"))
      val n2 = table(s, dir, "nation")
        .select(col("n_nationkey").as("n2_key"), col("n_name").as("nat"))
      val vol = (col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(dec4)
      table(s, dir, "lineitem")
        .join(broadcast(table(s, dir, "part").filter(col("p_type") === "PROMO")),
          col("p_partkey") === col("l_partkey"))
        .join(table(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(table(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(table(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("c_nationkey") === col("n1_key"))
        .join(broadcast(table(s, dir, "region").filter(col("r_name") === "AMERICA")),
          col("n_regionkey") === col("r_regionkey"))
        .join(broadcast(n2), col("s_nationkey") === col("n2_key"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg((sum(when(col("nat") === "NATION_5", vol)
            .otherwise(lit(0).cast(dec4))).cast("double") /
          sum(vol).cast("double")).as("mkt_share"))
        .orderBy(col("o_year"))
    },

    // Q9 product-type profit (adapted: p_retailprice stands in for the
    // absent partsupp.ps_supplycost — same 6-table join shape, LIKE
    // part filter, two-level group key). Profit is a DIFFERENCE of two
    // separately-quantized positive products, so the decimal sum stays
    // exact even where a line's profit is negative.
    "q_tpch_q9" -> { (s, dir) =>
      val n = table(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name").as("nation"))
      table(s, dir, "lineitem")
        .join(broadcast(table(s, dir, "part")
          .filter(col("p_name").like("%red%"))),
          col("p_partkey") === col("l_partkey"))
        .join(table(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(table(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(dec4)
            - (col("p_retailprice") * col("l_quantity")).cast(dec4))
          .cast("double").as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },

    // Q12 shipping-priority audit (adapted: no shipmode/commit/receipt
    // columns — the late-line predicate becomes ship>order+30d and the
    // mode group becomes l_returnflag; the SHAPE is Q12's: one fact
    // join, a join-side range filter, two CASE-conditional counts).
    "q_tpch_q12" -> { (s, dir) =>
      table(s, dir, "orders").createOrReplaceTempView("orders_q12")
      table(s, dir, "lineitem").createOrReplaceTempView("lineitem_q12")
      s.sql(
        """SELECT l_returnflag,
          |  SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
          |      THEN 1 ELSE 0 END) AS high_line_count,
          |  SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
          |      THEN 1 ELSE 0 END) AS low_line_count
          |FROM orders_q12, lineitem_q12
          |WHERE o_orderkey = l_orderkey
          |  AND l_shipdate > o_orderdate + INTERVAL 30 DAY
          |  AND l_shipdate >= TIMESTAMP '1996-01-01'
          |  AND l_shipdate < TIMESTAMP '1997-01-01'
          |GROUP BY l_returnflag
          |ORDER BY l_returnflag""".stripMargin)
    },

    // Q16 supplier-count-by-part (adapted: lineitem is the part⇄supplier
    // relation — no partsupp; the complaints NOT IN becomes a negative-
    // balance exclusion). The shape survives intact: a null-aware anti
    // join feeding COUNT(DISTINCT) under a wide group key.
    "q_tpch_q16" -> { (s, dir) =>
      table(s, dir, "lineitem").createOrReplaceTempView("lineitem_q16")
      table(s, dir, "part").createOrReplaceTempView("part_q16")
      table(s, dir, "supplier").createOrReplaceTempView("supplier_q16")
      s.sql(
        """SELECT p_brand, p_type, p_size,
          |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
          |FROM lineitem_q16, part_q16
          |WHERE p_partkey = l_partkey
          |  AND p_brand <> 'Brand#5' AND p_type <> 'MEDIUM'
          |  AND p_size IN (1, 9, 19, 23, 36, 45)
          |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier_q16
          |                        WHERE s_acctbal < 0.0)
          |GROUP BY p_brand, p_type, p_size
          |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)
    },

    // Q20 excess-inventory suppliers (adapted: availqty-vs-half-of-
    // shipments becomes 1996-share-of-lifetime-shipments > 0.9 with a
    // volume floor — the nested IN chain and the correlated HAVING
    // threshold over the same fact are the Q20 plan shape: two
    // left-semi joins, the inner one against a grouped aggregate).
    // Quantities sum as DECIMAL (the column is DOUBLE-typed whole
    // numbers; decimal keeps the sums order-independent), and the
    // 0.9 threshold multiplies exactly in decimal.
    "q_tpch_q20" -> { (s, dir) =>
      table(s, dir, "lineitem").createOrReplaceTempView("lineitem_q20")
      table(s, dir, "part").createOrReplaceTempView("part_q20")
      table(s, dir, "supplier").createOrReplaceTempView("supplier_q20")
      s.sql(
        """SELECT s_suppkey, s_name FROM supplier_q20
          |WHERE s_suppkey IN (
          |  SELECT l_suppkey FROM lineitem_q20
          |  WHERE l_partkey IN (SELECT p_partkey FROM part_q20
          |                      WHERE p_name LIKE 'red%')
          |  GROUP BY l_suppkey, l_partkey
          |  HAVING SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
          |                   AND l_shipdate < TIMESTAMP '1997-01-01'
          |             THEN CAST(l_quantity AS DECIMAL(18,2))
          |             ELSE CAST(0 AS DECIMAL(18,2)) END)
          |       > CAST(0.9 AS DECIMAL(2,1))
          |         * SUM(CAST(l_quantity AS DECIMAL(18,2)))
          |     AND SUM(CAST(l_quantity AS DECIMAL(18,2))) >= 50)
          |ORDER BY s_suppkey""".stripMargin)
    },

    // Q2 minimum-cost supplier (adapted: lineitem unit price stands in
    // for partsupp.ps_supplycost — same shape: a correlated MIN
    // subquery over a 4-table join, which Catalyst decorrelates into a
    // per-part aggregate joined back on (partkey, price); DISTINCT
    // collapses the multiple lineitems that realize the same min).
    // Unit price is a per-row double DIVISION (deterministic IEEE, no
    // summation), so the min and the equality compare identically
    // across engines.
    "q_tpch_q2" -> { (s, dir) =>
      Seq("part", "supplier", "lineitem", "nation", "region")
        .foreach(t => table(s, dir, t).createOrReplaceTempView(s"${t}_q2"))
      s.sql(
        """SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_name
          |FROM part_q2, supplier_q2, lineitem_q2, nation_q2, region_q2
          |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
          |  AND p_size = 15
          |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          |  AND r_name = 'EUROPE'
          |  AND l_extendedprice / l_quantity =
          |    (SELECT MIN(l2.l_extendedprice / l2.l_quantity)
          |     FROM lineitem_q2 l2, supplier_q2 s2, nation_q2 n2,
          |          region_q2 r2
          |     WHERE l2.l_partkey = p_partkey
          |       AND l2.l_suppkey = s2.s_suppkey
          |       AND s2.s_nationkey = n2.n_nationkey
          |       AND n2.n_regionkey = r2.r_regionkey
          |       AND r2.r_name = 'EUROPE')
          |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
          |LIMIT 100""".stripMargin)
    },

    // Q11 important stock (adapted: per-part lineitem revenue within a
    // nation group stands in for partsupp value — the shape is Q11's:
    // a grouped aggregate filtered by an UNCORRELATED scalar subquery
    // computing the same aggregate globally, which plans as a 1-row
    // broadcast against the group-by output; the join+agg subtree runs
    // twice, like the decorrelated original).
    "q_tpch_q11" -> { (s, dir) =>
      Seq("lineitem", "supplier", "nation")
        .foreach(t => table(s, dir, t).createOrReplaceTempView(s"${t}_q11"))
      s.sql(
        """SELECT l_partkey, CAST(value_dec AS DOUBLE) AS value
          |FROM (SELECT l_partkey,
          |        SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS value_dec
          |      FROM lineitem_q11, supplier_q11, nation_q11
          |      WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
          |        AND n_name LIKE 'NATION_1%'
          |      GROUP BY l_partkey
          |      HAVING SUM(CAST(l_extendedprice AS DECIMAL(18,2))) >
          |        (SELECT CAST(0.0007 AS DECIMAL(7,5))
          |           * SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
          |         FROM lineitem_q11, supplier_q11, nation_q11
          |         WHERE l_suppkey = s_suppkey
          |           AND s_nationkey = n_nationkey
          |           AND n_name LIKE 'NATION_1%'))
          |ORDER BY value DESC, l_partkey""".stripMargin)
    }
  )

  val oracles: Map[String, String] = checked(
    "q_tpch_q10" ->
      """SELECT c_custkey, c_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  c_acctbal, n_name
        |FROM customer, orders, lineitem, nation
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND c_nationkey = n_nationkey
        |  AND o_orderdate >= TIMESTAMP '1996-10-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,
    "q_tpch_q13" ->
      """SELECT c_count, COUNT(*) AS custdist
        |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |      FROM customer LEFT OUTER JOIN orders
        |        ON c_custkey = o_custkey
        |        AND o_orderpriority <> '1-URGENT'
        |      GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q_tpch_q15" ->
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    SUM(CAST(l_extendedprice * (1 - l_discount)
        |      AS DECIMAL(18,4))) AS rev_dec
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-07-01'
        |    AND l_shipdate < TIMESTAMP '1996-10-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_revenue
        |FROM supplier, revenue
        |WHERE s_suppkey = supplier_no
        |  AND rev_dec = (SELECT MAX(rev_dec) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,
    "q_tpch_q17" ->
      """SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
        |    AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
        |FROM lineitem, part
        |WHERE p_partkey = l_partkey
        |  AND p_brand = 'Brand#23' AND p_size < 15
        |  AND l_quantity < (SELECT CAST(0.2 AS DOUBLE) * AVG(l_quantity)
        |                    FROM lineitem l2
        |                    WHERE l2.l_partkey = p_partkey)""".stripMargin,
    "q_tpch_q19" ->
      """SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#12'
        |       AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 15)
        |   OR (p_brand = 'Brand#23'
        |       AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#34'
        |       AND l_quantity BETWEEN 20 AND 30
        |       AND p_size BETWEEN 1 AND 25)""".stripMargin,
    "q_tpch_q21" ->
      """SELECT s_name, COUNT(*) AS numwait
        |FROM supplier, lineitem l1, orders
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o_orderdate
        |                        + INTERVAL 90 DAY)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name""".stripMargin,
    "q_tpch_q22" ->
      """SELECT cntrycode, COUNT(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |    AS totacctbal
        |FROM (SELECT substring(c_name, 17, 2) AS cntrycode,
        |             c_acctbal, c_custkey
        |      FROM customer
        |      WHERE c_acctbal >
        |          (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)))
        |             AS DOUBLE) / COUNT(*)
        |           FROM customer WHERE c_acctbal > 0.0)
        |        AND NOT EXISTS (SELECT 1 FROM orders
        |                        WHERE o_custkey = c_custkey
        |                          AND o_orderdate >=
        |                              TIMESTAMP '2000-01-01'))
        |GROUP BY cntrycode
        |ORDER BY cntrycode""".stripMargin,
    "q_tpch_q7" ->
      """SELECT supp_nation, cust_nation, l_year,
        |  CAST(SUM(volume) AS DOUBLE) AS revenue
        |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |        CAST(year(l_shipdate) AS INTEGER) AS l_year,
        |        CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
        |          AS volume
        |      FROM supplier, lineitem, orders, customer,
        |           nation n1, nation n2
        |      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        |        AND c_custkey = o_custkey
        |        AND s_nationkey = n1.n_nationkey
        |        AND c_nationkey = n2.n_nationkey
        |        AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
        |          OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
        |        AND l_shipdate >= TIMESTAMP '1996-01-01'
        |        AND l_shipdate < TIMESTAMP '1998-01-01')
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "q_tpch_q8" ->
      """SELECT o_year,
        |  CAST(SUM(CASE WHEN nat = 'NATION_5' THEN volume
        |           ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
        |    / CAST(SUM(volume) AS DOUBLE) AS mkt_share
        |FROM (SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |        CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
        |          AS volume,
        |        n2.n_name AS nat
        |      FROM part, lineitem, orders, customer, supplier,
        |           nation n1, region, nation n2
        |      WHERE p_partkey = l_partkey AND l_orderkey = o_orderkey
        |        AND o_custkey = c_custkey AND l_suppkey = s_suppkey
        |        AND c_nationkey = n1.n_nationkey
        |        AND n1.n_regionkey = r_regionkey
        |        AND s_nationkey = n2.n_nationkey
        |        AND r_name = 'AMERICA' AND p_type = 'PROMO'
        |        AND o_orderdate >= TIMESTAMP '1996-01-01'
        |        AND o_orderdate < TIMESTAMP '1998-01-01')
        |GROUP BY o_year
        |ORDER BY o_year""".stripMargin,
    "q_tpch_q9" ->
      """SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
        |FROM (SELECT n_name AS nation,
        |        CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |        CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
        |          - CAST(p_retailprice * l_quantity AS DECIMAL(18,4))
        |          AS amount
        |      FROM lineitem, part, orders, supplier, nation
        |      WHERE p_partkey = l_partkey AND l_orderkey = o_orderkey
        |        AND l_suppkey = s_suppkey
        |        AND s_nationkey = n_nationkey
        |        AND p_name LIKE '%red%')
        |GROUP BY nation, o_year
        |ORDER BY nation, o_year DESC""".stripMargin,
    "q_tpch_q12" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders, lineitem
        |WHERE o_orderkey = l_orderkey
        |  AND l_shipdate > o_orderdate + INTERVAL 30 DAY
        |  AND l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q_tpch_q16" ->
      """SELECT p_brand, p_type, p_size,
        |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem, part
        |WHERE p_partkey = l_partkey
        |  AND p_brand <> 'Brand#5' AND p_type <> 'MEDIUM'
        |  AND p_size IN (1, 9, 19, 23, 36, 45)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                        WHERE s_acctbal < 0.0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q_tpch_q20" ->
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part
        |                      WHERE p_name LIKE 'red%')
        |  GROUP BY l_suppkey, l_partkey
        |  HAVING SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
        |                   AND l_shipdate < TIMESTAMP '1997-01-01'
        |             THEN CAST(l_quantity AS DECIMAL(18,2))
        |             ELSE CAST(0 AS DECIMAL(18,2)) END)
        |       > CAST(0.9 AS DECIMAL(2,1))
        |         * SUM(CAST(l_quantity AS DECIMAL(18,2)))
        |     AND SUM(CAST(l_quantity AS DECIMAL(18,2))) >= 50)
        |ORDER BY s_suppkey""".stripMargin,
    "q_tpch_q2" ->
      """SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_name
        |FROM part, supplier, lineitem, nation, region
        |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        |  AND p_size = 15
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'EUROPE'
        |  AND l_extendedprice / l_quantity =
        |    (SELECT MIN(l2.l_extendedprice / l2.l_quantity)
        |     FROM lineitem l2, supplier s2, nation n2, region r2
        |     WHERE l2.l_partkey = p_partkey
        |       AND l2.l_suppkey = s2.s_suppkey
        |       AND s2.s_nationkey = n2.n_nationkey
        |       AND n2.n_regionkey = r2.r_regionkey
        |       AND r2.r_name = 'EUROPE')
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,
    "q_tpch_q11" ->
      """SELECT l_partkey, CAST(value_dec AS DOUBLE) AS value
        |FROM (SELECT l_partkey,
        |        SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS value_dec
        |      FROM lineitem, supplier, nation
        |      WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |        AND n_name LIKE 'NATION_1%'
        |      GROUP BY l_partkey
        |      HAVING SUM(CAST(l_extendedprice AS DECIMAL(18,2))) >
        |        (SELECT CAST(0.0007 AS DECIMAL(7,5))
        |           * SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
        |         FROM lineitem, supplier, nation
        |         WHERE l_suppkey = s_suppkey
        |           AND s_nationkey = n_nationkey
        |           AND n_name LIKE 'NATION_1%'))
        |ORDER BY value DESC, l_partkey""".stripMargin
  )
}
