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

  val defs: Map[String, Q] = Map(
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

    // Q15 top supplier: naively self-joining the revenue CTE against
    // its own MAX plans the lineitem aggregate TWICE (Catalyst inlines
    // the branch; no exchange reuse — verified in PLANS.md), so the
    // scalar MAX rides a single-partition window over the ALREADY
    // AGGREGATED per-supplier rows instead: lineitem is scanned once,
    // and the SinglePartition stage sees |suppliers| rows, not
    // |lineitem|. Equality compares the DECIMAL (exact); only the
    // output casts to double.
    "q_tpch_q15" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val sup = table(s, dir, "supplier")
      val rev = table(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-07-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(dec4)).as("rev_dec"))
      val top = rev
        .withColumn("max_rev", max(col("rev_dec")).over(Window.partitionBy()))
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
    }
  )

  val oracles: Map[String, String] = Map(
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
        |ORDER BY cntrycode""".stripMargin
  )
}
