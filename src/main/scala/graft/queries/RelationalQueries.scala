package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.ops.Ops

/** The relational surface (SURVEY.md §2b-§2h): filters, joins, aggs,
  * windows, sorts/top-k, set ops, scalar functions. The reference gets
  * these from Cascading; the engine exposes them as Catalyst built-ins —
  * declarative plans so pushdown/pruning/codegen are automatic.
  *
  * Determinism rules (for the DuckDB hash-compare): money/ratio
  * aggregates go through DECIMAL so sums are order-independent and only
  * cast to DOUBLE at the end; every query ends in a total ORDER BY;
  * column names/types are matched explicitly on both sides.
  */
object RelationalQueries {

  private val dec = DecimalType(18, 2)

  /** q_pagerank's all-pairs-vs-star regime threshold: a co-occurrence
    * group of up to this many members emits the full ordered-pair
    * clique (m·(m-1) ≤ ~4k pairs); past it, star pairs around the
    * group's min-member pivot (2·(m-1)). Shared with the oracle mirror
    * and the plan guard so all three stay in lockstep. */
  private[graft] val PrStarT = 64

  /** Distinct co-occurrence edges of (ok, sk) membership rows, with
    * GRADUATED per-group expansion (the NOTES r6 rule — any
    * O(m²)-under-a-cap pipeline needs a middle regime — applied to
    * edge derivation): groups up to `starT` members emit the full
    * ordered-pair clique; a group past it (a mega-order / a URL shared
    * by millions of docs — the one hot-group shape key-skew
    * replication never makes) emits STAR pairs around its
    * deterministic pivot (min sk), both directions, so the group stays
    * connected, every member keeps outdeg >= 1 (no dangling mass) and
    * the expansion is O(m) instead of O(m²). The regime switch is
    * observe-metered (`pagerank_expansion`: star_groups / max_group /
    * dropped_pairs — drops are REPORTED, never silent) and the oracle
    * mirrors the same graduation, so a hot-group replica stays
    * value-checkable. The final exchange is keyed by the PAIR so
    * distinct() elides its own exchange (the r7 spill fix — see the
    * q_pagerank comment). */
  private[graft] def coSupplyEdges(liRaw: org.apache.spark.sql.DataFrame,
                                     starT: Int)
      : org.apache.spark.sql.DataFrame = {
    // The membership table feeds FOUR consumers (group sizing, the
    // anti-join, both self-join sides); physical exchange reuse does
    // not dedupe across all the union legs, so materialize it once —
    // O(distinct memberships) skinny rows, the same budget the edges
    // checkpoint downstream already pays.
    val li = liRaw.localCheckpoint()
    val g = li.groupBy(col("ok"))
      .agg(count(lit(1)).as("m"), min(col("sk")).as("pivot"))
      .observe("pagerank_expansion",
        coalesce(sum(when(col("m") > starT, 1L)), lit(0L))
          .as("star_groups"),
        max(col("m")).as("max_group"),
        coalesce(sum(when(col("m") > starT,
          (col("m") - 1) * (col("m") - 2))), lit(0L)).as("dropped_pairs"))
    // Deterministic regime gate: one scalar aggregate over the
    // materialized membership decides the PLAN (results are identical
    // either way — the graduated plan with zero big groups degenerates
    // to the clique branch). When no group crosses the threshold (every
    // uniform and value-skew replica; TPC-H orders peak at 7) the
    // query keeps the exact self-join shape the r7 spill fix tuned —
    // measured 15.4s → ~12s at sf1 vs running the graduated plan's
    // probe joins against a provably-empty big set. The gate's agg
    // reads the checkpointed rows once and collapses map-side.
    val maxM = g.agg(max(col("m"))).head().getLong(0)
    if (maxM <= starT) {
      li.as("a").join(li.as("b"), Seq("ok"))
        .filter(col("a.sk") =!= col("b.sk"))
        .select(col("a.sk").as("src"), col("b.sk").as("dst"))
        .repartition(col("src"), col("dst"))
        .distinct()
    } else {
      // Only the RARE big groups materialize as a table (structurally
      // ≤ rows/(starT+1) entries), so the regime split costs the two
      // probe joins against that small set — AQE sees its runtime size
      // and broadcasts — while the dominant all-pairs branch keeps the
      // tuned self-join shape. Attaching m to every membership row
      // instead re-shuffles and re-sorts the full membership table and
      // measured 1.7× slower at sf1.
      val big = g.filter(col("m") > starT).select(col("ok"), col("pivot"))
      val small = li.join(big, Seq("ok"), "left_anti")
      val allPairs = small.as("a").join(small.as("b"), Seq("ok"))
        .filter(col("a.sk") =!= col("b.sk"))
        .select(col("a.sk").as("src"), col("b.sk").as("dst"))
      val starHalf = li.join(big, Seq("ok"))
        .filter(col("sk") =!= col("pivot"))
        .select(col("sk"), col("pivot"))
      allPairs
        .unionByName(starHalf
          .select(col("sk").as("src"), col("pivot").as("dst")))
        .unionByName(starHalf
          .select(col("pivot").as("src"), col("sk").as("dst")))
        .repartition(col("src"), col("dst"))
        .distinct()
    }
  }

  /** Two-phase chunked running window over `base` (o_custkey /
    * o_orderkey / o_orderdate / o_totalprice), engaged by q_window_funcs
    * when `hotKeys` is non-empty. Hot keys' order ranges are chunked by
    * calendar month so their window work parallelizes; cold keys keep a
    * single (sentinel) chunk. Bit-identical to the plain one-window
    * form: decimal addition is associative, (o_orderdate, o_orderkey)
    * is a total order, and lag(1) at a chunk head is exactly the
    * previous chunk's last row. */
  private[queries] def windowFuncsChunked(base: org.apache.spark.sql.DataFrame,
                                          hotKeys: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    // sentinel (not null) for cold keys: a null chunk would fall out
    // of the equi-join back to the carry rows
    val sentinel = to_timestamp(lit("1900-01-01"))
    val chunk = when(col("__hot").isNotNull,
      date_trunc("month", col("o_orderdate"))).otherwise(sentinel)
    val wc = Window.partitionBy(col("o_custkey"), col("__chunk"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val inChunk = base
      .join(broadcast(hotKeys), Seq("o_custkey"), "left")
      .withColumn("__chunk", chunk)
      .withColumn("rn0", row_number().over(wc))
      .withColumn("prev0", lag(col("o_totalprice"), 1).over(wc))
      .withColumn("rt0",
        sum(col("o_totalprice").cast(dec))
          .over(wc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // per-(custkey, chunk) carry — computed from the already-
    // partitioned rows, so the partial aggregate adds no exchange of
    // the fact; for a cold key it is a single row whose offsets are
    // null (no preceding chunk), restoring the plain-window result
    val carryOrd = Window.partitionBy(col("o_custkey")).orderBy(col("__chunk"))
    val carryW = carryOrd.rowsBetween(Window.unboundedPreceding, -1)
    val carry = inChunk
      .groupBy(col("o_custkey"), col("__chunk"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast(dec)).as("csum"),
        max_by(col("o_totalprice"),
          struct(col("o_orderdate"), col("o_orderkey"))).as("clast"))
      .select(col("o_custkey"), col("__chunk"),
        sum(col("cnt")).over(carryW).as("rn_off"),
        sum(col("csum")).over(carryW).as("rt_off"),
        lag(col("clast"), 1).over(carryOrd).as("prev_last"))
    // shuffle-hash, not sort-merge: the fact side is already hash
    // partitioned on the join keys but sorted by (date, key) for the
    // windows — SMJ would re-sort every fact partition
    inChunk.join(carry.hint("shuffle_hash"), Seq("o_custkey", "__chunk"))
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"),
        (col("rn0") + coalesce(col("rn_off"), lit(0L))).cast("int").as("rn"),
        coalesce(col("prev0"), col("prev_last")).as("prev_price"),
        (col("rt0") + coalesce(col("rt_off"), lit(0).cast(dec)))
          .cast("double").as("running_total"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  /** Scale-safe GLOBAL rank / running sum — the two-phase shard-prefix
    * form of `Window.orderBy(...)` for windows whose input cardinality
    * grows with the corpus (a single-partition global sort dies at
    * 100 TB; see q_rfm / q_pareto_abc, whose window input is a
    * linearly-growing DIMENSION).
    *
    * Phase 1: range-shard the rows on `order` (a TOTAL order — the
    * caller supplies a unique tiebreak) and materialize ONCE
    * (localCheckpoint: the per-row windows and the shard-level offset
    * pass below both consume the shard assignment, and the range
    * partitioner's sampled bounds must be the SAME on both paths — the
    * coSupplyEdges multi-consumer rule). Each shard then computes its
    * row_number and running sums locally, in parallel.
    *
    * Phase 2: per-shard row/sum TOTALS (one row per shard — a
    * cluster-sized table, not a data-sized one) get an exclusive
    * prefix pass in the only remaining unpartitioned window, ordered
    * by `__shard`, and broadcast back: global rank = local rank +
    * preceding shards' row count, global running sum = local running
    * sum + preceding shards' totals. Bit-identical to the one-window
    * form: the order is total and Long addition is associative.
    *
    * Adds `rankOut` (1-based global rank), each `sums` entry's
    * inclusive running sum as its output name, optionally the total
    * row count (`nOut`) and per-sum grand totals (`<name>_total`) so
    * NTILE/share math needs no second scan of the input. Shard count
    * follows spark.sql.shuffle.partitions (cluster-sized). */
  private[queries] def shardedPrefix(df: DataFrame, order: Seq[Column],
      rankOut: String, sums: Seq[(Column, String)] = Nil,
      nOut: Option[String] = None, totals: Boolean = false): DataFrame = {
    val shards = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val sharded = df.repartitionByRange(shards, order: _*)
      .withColumn("__shard", spark_partition_id())
      .localCheckpoint()
    val wLoc = Window.partitionBy(col("__shard")).orderBy(order: _*)
    val wRun = wLoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = sums.foldLeft(
      sharded.withColumn("__rn", row_number().over(wLoc).cast("long"))) {
      case (d, (c, nm)) => d.withColumn(s"__run_$nm", sum(c).over(wRun))
    }
    // exclusive prefix over the SHARD-level aggregate (≤ shards rows)
    val perShard = sharded.groupBy(col("__shard")).agg(
      count(lit(1)).as("__cnt"),
      sums.map { case (c, nm) => sum(c).as(s"__tot_$nm") }: _*)
    val wOff = Window.orderBy(col("__shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAllShards = Window.orderBy(col("__shard"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offCols =
      Seq(col("__shard"),
        coalesce(sum(col("__cnt")).over(wOff), lit(0L)).as("__off_rn")) ++
      nOut.map(nm => sum(col("__cnt")).over(wAllShards).as(nm)).toSeq ++
      sums.map { case (_, nm) =>
        coalesce(sum(col(s"__tot_$nm")).over(wOff), lit(0L))
          .as(s"__off_$nm") } ++
      (if (totals) sums.map { case (_, nm) =>
        sum(col(s"__tot_$nm")).over(wAllShards).as(s"${nm}_total") }
       else Nil)
    val joined = local.join(broadcast(perShard.select(offCols: _*)),
        Seq("__shard"))
      .withColumn(rankOut, col("__rn") + col("__off_rn"))
    sums.foldLeft(joined) { case (d, (_, nm)) =>
      d.withColumn(nm, col(s"__run_$nm") + col(s"__off_$nm")) }
      .drop(Seq("__shard", "__rn", "__off_rn") ++
        sums.flatMap { case (_, nm) => Seq(s"__run_$nm", s"__off_$nm") }: _*)
  }

  /** NTILE(k) of a precomputed 1-based global rank over n rows — the
    * map-side classification step after shardedPrefix. Standard NTILE:
    * the first n mod k buckets get one extra row. Matches Spark's and
    * DuckDB's ntile() exactly (property-pinned in ShardedPrefixSpec);
    * all operands non-negative so `div` agrees across engines, and the
    * base=0 branch (n < k) can't divide by zero — the CASE's first arm
    * always fires there since rank ≤ n = rem. */
  private[queries] def ntileOfRank(rank: String, n: String, k: Int): Column =
    expr(
      s"""CAST(CASE WHEN $rank <= ($n % $k) * (($n div $k) + 1)
         |  THEN ($rank - 1) div (($n div $k) + 1) + 1
         |  ELSE ($n % $k) + ($rank - 1 - ($n % $k) * (($n div $k) + 1))
         |       div ($n div $k) + 1
         |  END AS INT)""".stripMargin)

  val defs: Map[String, Q] = checked(
    // TPC-H Q1-shaped pricing summary: partial-agg shuffle on two
    // low-cardinality keys; the date filter is pushed to the parquet scan.
    "q1_agg" -> { (s, dir) =>
      val li = table(s, dir, "lineitem")
      li.filter(col("l_shipdate") < lit("1998-12-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast(dec)).cast("double").as("sum_base_price"),
          sum(col("l_extendedprice").cast(dec) *
            (lit(1).cast(dec) - col("l_discount").cast(dec)))
            .cast("double").as("sum_disc_price"),
          (sum(col("l_quantity").cast(dec)).cast("double") / count(lit(1)))
            .as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // θ/LIKE/IN/BETWEEN predicates — all pushed to the scan.
    "q_filter_pred" -> { (s, dir) =>
      table(s, dir, "part")
        .filter(col("p_type").isin("PROMO", "ECONOMY") &&
          col("p_size").between(10, 30) &&
          col("p_name").like("%e%") && col("p_retailprice").isNotNull)
        .select(col("p_partkey"), col("p_name"), col("p_type"),
          col("p_size"), col("p_retailprice"))
        .orderBy(col("p_partkey"))
    },

    // Star join: fact orders joins broadcast dims — at 100 TB the fact
    // table never shuffles for the dim joins; only the final 2-key agg does.
    "q_join_broadcast" -> { (s, dir) =>
      val o = table(s, dir, "orders")
      val c = broadcast(table(s, dir, "customer"))
      val n = broadcast(table(s, dir, "nation"))
      val r = broadcast(table(s, dir, "region"))
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(dec)).cast("double").as("revenue"))
        .orderBy(col("r_name"), col("n_name"))
    },

    // Left outer join preserving order-less customers.
    "q_join_left" -> { (s, dir) =>
      val c = table(s, dir, "customer")
      val o = table(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          coalesce(sum(col("o_totalprice").cast(dec)), lit(0).cast(dec))
            .cast("double").as("revenue"))
        .orderBy(col("c_custkey"))
    },

    // EXISTS -> left_semi.
    "q_join_semi" -> { (s, dir) =>
      val c = table(s, dir, "customer")
      val o = table(s, dir, "orders").filter(col("o_orderstatus") === "O")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    },

    // NOT EXISTS -> left_anti (customers with no pending order).
    "q_join_anti" -> { (s, dir) =>
      val c = table(s, dir, "customer")
      val o = table(s, dir, "orders").filter(col("o_orderstatus") === "P")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    },

    // Ranking / analytic / framed aggregate windows.
    // ADAPTIVELY CHUNKED running window (the q_skyline two-phase
    // pattern, engaged per key only where needed): a single hash
    // partition per o_custkey makes a hot key's whole history ONE
    // serial task (the skew campaign measured 3.0× under a 27%-hot
    // custkey). A cheap per-key count finds keys above
    // `HotWindowKeyRows`; ONLY those get their order key chunked by
    // calendar month — a prefix-respecting refinement of the
    // (o_orderdate, o_orderkey) total order — so a hot key's window
    // work spreads over its months while every cold key keeps the
    // plain one-partition window (skew-free data takes the plain-window
    // plan outright and pays only the key-count probe job).
    // The cross-chunk carry (row-count / decimal-sum offsets,
    // previous chunk's last price) is a window over the per-chunk
    // AGGREGATE — one row per cold key, #months rows per hot key —
    // joined back shuffle-hash on the keys the fact is already
    // partitioned by (SMJ would re-sort every fact partition).
    // Exactness: decimal addition is associative, the order is total
    // (o_orderkey is unique), and lag(1) at a chunk head is exactly the
    // previous chunk's last row — bit-identical to the one-window form
    // the oracle keeps.
    "q_window_funcs" -> { (s, dir) =>
      val base = table(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"))
      val hotKeys = base.groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("__n"))
        .filter(col("__n") > lit(Ops.HotWindowKeyRows))
        .select(col("o_custkey"), lit(true).as("__hot"))
      // Driver-side plan choice (the AQE pattern, one partial-agg job):
      // skew-free data keeps the single-exchange plain window and pays
      // only the key-count probe; the two-phase machinery below is
      // constructed only when a hot key actually exists.
      if (hotKeys.isEmpty) {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        base
          .withColumn("rn", row_number().over(w))
          .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
          .withColumn("running_total",
            sum(col("o_totalprice").cast(dec))
              .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
              .cast("double"))
          .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
      } else windowFuncsChunked(base, hotKeys)
    },

    // Top-k: planned as TakeOrderedAndProject (per-partition heaps, no
    // global sort).
    "q_topk" -> { (s, dir) =>
      table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },

    // INTERSECT / EXCEPT set algebra.
    "q_set_ops" -> { (s, dir) =>
      val o = table(s, dir, "orders")
      def custIn(from: String, until: String) =
        o.filter(col("o_orderdate") >= lit(from).cast("timestamp") &&
            col("o_orderdate") < lit(until).cast("timestamp"))
          .select(col("o_custkey"))
      val pending = o.filter(col("o_orderstatus") === "P").select(col("o_custkey"))
      custIn("1995-01-01", "1996-01-01")
        .intersect(custIn("1996-01-01", "1997-01-01"))
        .except(pending)
        .orderBy(col("o_custkey"))
    },

    // ROLLUP with grouping id.
    "q_rollup" -> { (s, dir) =>
      // Same pre-aggregate-before-EXPAND shape as q_cube (r11): the
      // rollup's 3 grouping sets expand over the (segment, nation)
      // domain instead of every customer row. Identical results
      // (associative count/DECIMAL sums; null-safe on dimension
      // values — CubePreAggSpec pins the null-bearing case).
      val pre = table(s, dir, "customer")
        .groupBy(col("c_mktsegment"), col("c_nationkey"))
        .agg(count(lit(1)).as("__n"),
          sum(col("c_acctbal").cast(dec)).as("__b"))
      pre.rollup(col("c_mktsegment"), col("c_nationkey"))
        .agg(sum(col("__n")).cast("long").as("n_cust"),
          sum(col("__b")).cast("double").as("total_bal"),
          grouping_id().cast("long").as("gid"))
        .orderBy(col("gid"), asc_nulls_first("c_mktsegment"),
          asc_nulls_first("c_nationkey"))
    },

    // Exact distinct aggregation (expand + two-phase agg in Spark).
    "q_distinct_agg" -> { (s, dir) =>
      table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"))
    },

    // Scalar function battery: date / string / math.
    "q_scalar_funcs" -> { (s, dir) =>
      table(s, dir, "orders")
        .filter(col("o_orderkey") < 1000)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mon"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
            .as("days_since"),
          floor(col("o_totalprice")).as("price_floor"),
          lower(col("o_orderpriority")).as("prio_low"),
          substring(col("o_orderpriority"), 1, 1).as("prio_code"),
          concat(col("o_orderstatus"), lit("-"),
            substring(col("o_orderpriority"), 1, 1)).as("tag"),
          length(col("o_orderpriority")).as("prio_len"))
        .orderBy(col("o_orderkey"))
    },

    // RegexSplitter analog (MultiFamilyHBaseTest.java:54-55) through the
    // engine's Ops surface.
    "q_regex_split" -> { (s, dir) =>
      val df = table(s, dir, "part").select(col("p_partkey"), col("p_name"))
      Ops.regexSplitter("p_name", " ", Seq("word1", "word2"))(df)
        .orderBy(col("p_partkey"))
    },

    // ExpressionFunction analog (MultiFamilyCascadeHBaseTest.java:62) —
    // deterministic synthetic key instead of the reference's random one.
    "q_expr_fn" -> { (s, dir) =>
      val df = table(s, dir, "orders").select(col("o_orderkey"))
      Ops.expressionFunction("synth_key",
        "((o_orderkey % 100003) * 31 + 7) % 1000")(df)
        .orderBy(col("o_orderkey"))
    },

    // JSON extraction from the events props column. `from_json` with an
    // explicit schema parses each document ONCE into a codegen-friendly
    // struct — `get_json_object` would re-parse the JSON per extracted
    // path, the difference between O(paths) and O(1) parses per row at
    // corpus scale. Extraction semantics match: a missing/malformed
    // document or field yields NULL either way.
    "q_json_extract" -> { (s, dir) =>
      table(s, dir, "events")
        .withColumn("k",
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k INT"))("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("k")).cast("long").as("k_sum"),
          (sum(col("k")).cast("double") / count(lit(1))).as("k_avg"),
          min(col("k")).as("k_min"), max(col("k")).as("k_max"))
        .orderBy(col("event_type"))
    },

    // TPC-H Q5 shape: 6-table join with region/date selection. The three
    // tiny dims broadcast (explicitly); lineitem-orders-customer are the
    // shuffle joins AQE sizes. Revenue accumulates in DECIMAL so the
    // result is partitioning-independent.
    "q_tpch_q5" -> { (s, dir) =>
      val l = table(s, dir, "lineitem")
      val o = table(s, dir, "orders")
      val c = table(s, dir, "customer")
      val sup = table(s, dir, "supplier")
      val n = table(s, dir, "nation")
      val r = table(s, dir, "region")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA" &&
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .groupBy(col("n_name"))
        .agg(expr("CAST(SUM(CAST(l_extendedprice * (1 - l_discount) " +
          "AS DECIMAL(18,4))) AS DOUBLE)").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // TPC-H Q6 forecast-revenue: the pure scan-side query — every
    // predicate (date range, discount band, quantity cap) pushes to the
    // parquet scan and the single DECIMAL sum is a map-side partial agg
    // feeding a 1-row final; at 100 TB the plan is scan-bandwidth-bound
    // with no data shuffle at all.
    "q_tpch_q6" -> { (s, dir) =>
      table(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(expr("CAST(SUM(CAST(l_extendedprice * l_discount " +
          "AS DECIMAL(18,4))) AS DOUBLE)").as("revenue"))
    },

    // TPC-H Q4 order-priority checking, adapted to the testdata's
    // columns (lateness = a lineitem shipped >90 days after the order
    // date; the reference Q4 uses commit/receipt dates the synthetic
    // tables don't carry). Expressed through SQL EXISTS — Catalyst
    // rewrites the correlated subquery to a left-semi hash join, so the
    // fact table streams through one semi-join + one small aggregation.
    "q_tpch_q4" -> { (s, dir) =>
      table(s, dir, "orders").createOrReplaceTempView("orders_q4")
      table(s, dir, "lineitem").createOrReplaceTempView("lineitem_q4")
      s.sql(
        """SELECT o_orderpriority, COUNT(*) AS order_count
          |FROM orders_q4
          |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          |  AND o_orderdate < TIMESTAMP '1996-04-01'
          |  AND EXISTS (SELECT 1 FROM lineitem_q4
          |              WHERE l_orderkey = o_orderkey
          |                AND l_shipdate > o_orderdate + INTERVAL 90 DAYS)
          |GROUP BY o_orderpriority
          |ORDER BY o_orderpriority""".stripMargin)
    },

    // TPC-H Q14 promo-revenue share: month of lineitems joined to the
    // (broadcast) part dim; both sums accumulate in exact DECIMAL and
    // only the final ratio converts to double, so the answer is
    // partitioning-independent.
    "q_tpch_q14" -> { (s, dir) =>
      val l = table(s, dir, "lineitem")
      val p = table(s, dir, "part")
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .filter(col("l_shipdate") >= lit("1996-09-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
        .agg(expr(
          """CAST(CAST(100 AS DOUBLE) *
            |  CAST(SUM(CASE WHEN p_type = 'PROMO'
            |    THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
            |    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) /
            |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
            |    AS DECIMAL(18,4))) AS DOUBLE) AS DOUBLE)""".stripMargin)
          .as("promo_revenue"))
    },

    // TPC-H Q18 large-volume customers: the HAVING-filtered semi-join
    // shape — a partial-agg over lineitem finds qualifying orders, the
    // fact joins against that (semi), the small customer dim broadcasts,
    // and TakeOrderedAndProject caps the result without a global sort.
    "q_tpch_q18" -> { (s, dir) =>
      val l = table(s, dir, "lineitem")
      val o = table(s, dir, "orders")
      val c = table(s, dir, "customer")
      val big = l.groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast(dec)).as("sq"))
        .filter(col("sq") > 220)
        .select(col("l_orderkey").as("big_orderkey"))
      o.join(big, col("o_orderkey") === col("big_orderkey"), "left_semi")
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"))
        .agg(sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderdate"), col("o_orderkey"))
        .limit(100)
    },

    // Exact percentiles (sort-based interpolated, Spark `percentile` ==
    // DuckDB `quantile_cont`: both linear-interpolate at (n-1)p, and the
    // inputs are small integers so the arithmetic is float-exact). For
    // 100 TB use approx_percentile (t-digest) — exact percentile sorts
    // each group; this query documents the exact baseline.
    "q_percentile" -> { (s, dir) =>
      table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_quantity, 0.5)").as("med_qty"),
          expr("percentile(l_quantity, 0.25)").as("q1_qty"),
          expr("percentile(l_quantity, 0.75)").as("q3_qty"))
        .orderBy(col("l_returnflag"))
    },

    // PIVOT: one row per priority, one revenue column per order status.
    // The value list is DECLARED (not discovered) — at scale an
    // unconstrained pivot runs an extra distinct pass over the fact
    // table just to learn the column set.
    "q_pivot" -> { (s, dir) =>
      table(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)"))
        .orderBy(col("o_orderpriority"))
    },

    // UNPIVOT/melt: wide numeric columns to (id, metric, value) rows —
    // a pure per-row Generate, no shuffle.
    "q_unpivot" -> { (s, dir) =>
      table(s, dir, "supplier")
        .select(col("s_suppkey"),
          col("s_acctbal").cast("double").as("acctbal"),
          col("s_nationkey").cast("double").as("nationkey"))
        .unpivot(Array(col("s_suppkey")),
          Array(col("acctbal"), col("nationkey")), "metric", "value")
        .orderBy(col("s_suppkey"), col("metric"))
    },

    // Map functions (§2h): build per-row maps (map_from_arrays /
    // map_concat), probe (element_at), filter entries by a lambda
    // (map_filter), and enumerate keys/values (map_keys / map_values,
    // sorted so the projection is deterministic). The map is PINNED
    // behind a generator barrier: the filter plus four projections
    // reference it, and CollapseProject would otherwise inline the
    // map_concat build into every reference — five map constructions
    // per row instead of one (measured 1.7× on the query at sf1).
    "q_map_funcs" -> { (s, dir) =>
      import graft.ops.Ops.materializedColumn
      val m = map_concat(
        map_from_arrays(array(lit("status"), lit("prio")),
          array(col("o_orderstatus"), col("o_orderpriority"))),
        map(lit("cust"), col("o_custkey").cast("string")))
      materializedColumn(
          table(s, dir, "orders").select(col("o_orderkey"), col("o_orderstatus"),
            col("o_orderpriority"), col("o_custkey")),
          "m", m)
        // Round 12 (guide §6): the filter used to be spelled
        // element_at(m, 'status') === 'O' — provably equal (the map's
        // 'status' entry IS o_orderstatus, null-for-null), but the
        // generator barrier hid it from pushdown so the scan read every
        // order row. The raw-column spelling reaches PushedFilters;
        // every map function above is untouched (MapFuncsProbe pins
        // row equality at sf0.1).
        .filter(col("o_orderstatus") === "O")
        // sort FIRST, derive after: the range partitioner's sample pass
        // re-executes the sort's child, so projecting the interpreted
        // map_filter + sorted-CSV work above the Sort keeps it out of
        // that second execution (order is preserved by the projection)
        .orderBy(col("o_orderkey"))
        .select(col("o_orderkey"),
          element_at(col("m"), "prio").as("prio"),
          size(map_filter(col("m"), (_, v) => length(v) > lit(9)))
            .cast("long").as("n_long_vals"),
          array_join(sort_array(map_keys(col("m"))), "|").as("keys_csv"),
          array_join(sort_array(map_values(col("m"))), "|").as("vals_csv"))
    },

    // Tumbling time window over the event stream (batch view).
    "q_time_window" -> { (s, dir) =>
      table(s, dir, "events")
        .withColumn("t", expr("cast(ts as timestamp)"))
        .groupBy(date_trunc("hour", col("t")).as("hour_ts"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(dec)).cast("double").as("total_value"))
        .orderBy(col("hour_ts"), col("event_type"))
    },

    // As-of join: latest view at-or-before each click, same user. Spark
    // has no asof operator; the scalable composite is union + one
    // partitioned sort + last(ignoreNulls) running window — a single
    // shuffle, no per-row subqueries.
    "q_asof_join" -> { (s, dir) =>
      val ev = table(s, dir, "events")
        .withColumn("t", expr("cast(ts as timestamp)"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("t"), lit(1).as("is_click"),
          col("event_id"), lit(null).cast("timestamp").as("view_ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("t"), lit(0).as("is_click"),
          lit(null).cast("long").as("event_id"), col("t").as("view_ts"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("t"), col("is_click"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      clicks.unionByName(views)
        .withColumn("last_view_ts", last(col("view_ts"), ignoreNulls = true).over(w))
        .filter(col("is_click") === 1)
        .select(col("event_id"), col("user_id"), col("t").as("click_ts"),
          col("last_view_ts"))
        .orderBy(col("event_id"))
    }
  )

  /** Hive-partitioned fact + tiny dim scratch for [[q_dpp]]: lineitem
    * laid out by `l_returnflag` (the date-partitioned 100 TB fact
    * pattern in miniature) and a parquet flag-decode dimension. */
  private def setupDpp(s: org.apache.spark.sql.SparkSession,
                       dir: String): (String, String) = {
    val fact = scratchDir("q_dpp_fact", dir)
    ensureSetup(fact) {
      table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
        .write.mode("overwrite").partitionBy("l_returnflag").parquet(fact)
    }
    val dim = scratchDir("q_dpp_dim", dir)
    ensureSetup(dim) {
      import s.implicits._
      Seq(("R", "returned"), ("A", "accepted"), ("N", "none"))
        .toDF("flag", "label")
        .coalesce(1).write.mode("overwrite").parquet(dim)
    }
    (fact, dim)
  }

  val prepares: Map[String, (org.apache.spark.sql.SparkSession, String) => Unit] =
    checked("q_dpp" -> ((s, d) => { setupDpp(s, d); () }))

  /** Second batch: join shapes + grouping analytics completing the §2
    * inventory (full outer, range/theta, cube, rank battery, multiset
    * set-ops, approx distinct, typed Dataset). */
  /** Degree-oriented exact triangle count over undirected edges
    * (columns src < dst, pre-deduped): every edge is directed toward
    * its higher-(degree, id) endpoint, so each triangle is generated
    * exactly once from its minimum node and the wedge fan-out per node
    * is bounded by OUT-degree ≤ O(sqrt(E)) even for hubs whose
    * undirected degree is O(N). Returns one row:
    * (n_triangles, n_edges, n_nodes). TrianglesProps pins it to a
    * driver-side brute-force count on random graphs. */
  private[queries] def orientedTriangles(undRaw: DataFrame): DataFrame = {
    // reused by degrees + orientation + the closing join —
    // materialize once (same budget q_pagerank pays for its edges);
    // LAZY (r11): folds into the first consuming job, saving a driver
    // barrier — same blocks, same reuse
    val und = undRaw.localCheckpoint(false)
    val deg = und.select(explode(array(col("src"), col("dst"))).as("u"))
      .groupBy(col("u")).agg(count(lit(1)).as("d"))
    val out = und
      .join(deg.select(col("u").as("src"), col("d").as("ds")), Seq("src"))
      .join(deg.select(col("u").as("dst"), col("d").as("dt")), Seq("dst"))
      .select(
        when(col("ds") < col("dt") ||
          (col("ds") === col("dt") && col("src") < col("dst")),
          struct(col("src").as("u"), col("dst").as("v"),
            col("dt").as("dv")))
          .otherwise(struct(col("dst").as("u"), col("src").as("v"),
            col("ds").as("dv"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"), col("e.dv").as("dv"))
      .localCheckpoint(false)
    val wedges = out.as("e1")
      .join(out.as("e2"), col("e1.u") === col("e2.u"))
      .filter(col("e1.dv") < col("e2.dv") ||
        (col("e1.dv") === col("e2.dv") && col("e1.v") < col("e2.v")))
      .select(col("e1.v").as("b"), col("e2.v").as("c"))
    wedges
      .join(out.select(col("u").as("b"), col("v").as("c")), Seq("b", "c"))
      .agg(count(lit(1)).as("n_triangles"))
      .crossJoin(und.agg(count(lit(1)).as("n_edges")))
      .crossJoin(deg.agg(count(lit(1)).as("n_nodes")))
  }

  val defs2: Map[String, Q] = checked(
    // Interchange-format fidelity: write the corpus out through the
    // three non-parquet formats an ingest pipeline meets (ORC — the
    // other columnar standard; CSV — quoted/escaped flat text; JSON
    // lines), read each back, and fingerprint the round-tripped text
    // order-independently (exact decimal sum of 60-bit hashes, one
    // row per format). A third of the docs get a planted suffix with
    // a comma, quotes and a NEWLINE, so CSV quoting/multiline and
    // JSON escaping are actually exercised, not just clean tokens —
    // the oracle computes the expected fingerprint from the parquet
    // source, so one mangled character in any format goes red. Scale
    // shape: per-format write+scan, embarrassingly parallel, one
    // 1-row aggregate each.
    "q_format_interop" -> { (s, dir) =>
      val planted = table(s, dir, "documents")
        .select(col("doc_id"),
          when(col("doc_id") % 3 === 0,
            concat(col("text"), lit(" x,\"y\"\nz")))
            .otherwise(col("text")).as("text"))
      def fingerprint(df: org.apache.spark.sql.DataFrame, fmt: String) =
        df.agg(
          count(lit(1)).as("n_docs"),
          sum(length(col("text")).cast("long")).as("sum_chars"),
          pmod(sum(graft.dedup.Dedup.hash60(col("text"))
            .cast("decimal(38,0)")), lit(1000000007L).cast("decimal(38,0)"))
            .cast("long").as("fp"))
          .select(lit(fmt).as("format"), col("n_docs"),
            col("sum_chars"), col("fp"))
      val base = scratchDir("q_format_interop", dir)
      planted.write.mode("overwrite").orc(s"$base/orc")
      planted.write.mode("overwrite").option("header", "true")
        .csv(s"$base/csv")
      planted.write.mode("overwrite").json(s"$base/json")
      val orc = s.read.orc(s"$base/orc").select(col("text"))
      val csv = s.read.option("header", "true").option("multiLine", "true")
        .csv(s"$base/csv").select(col("text"))
      // explicit schema: schemaless read would add a full inference
      // pass over the JSON directory inside the timed body
      val json = s.read.schema(planted.schema).json(s"$base/json")
        .select(col("text"))
      fingerprint(orc, "orc")
        .unionByName(fingerprint(csv, "csv"))
        .unionByName(fingerprint(json, "json"))
        .orderBy(col("format"))
    },

    // Table profiling — the ANALYZE pass a warehouse runs before
    // planning: one row per profiled column with count / nulls / ndv
    // / min / max / sum. Two passes, NEITHER of them the naive shape:
    // pass 1 evaluates every REGULAR aggregate (counts, min/max,
    // decimal sums, the price HLL) in one HashAggregate; pass 2
    // computes each EXACT ndv as its own single-column
    // scan → partial agg keyed by value (collapses map-side to the
    // column's DOMAIN) → 1-row count, unioned — the shuffle carries
    // one row per distinct value and nothing else. Two rejected
    // spellings, measured on this query: three countDistinct in one
    // agg plans as an EXPAND that multiplies every input row by the
    // distinct-aggregate count before the shuffle (10.9s at sf0.1,
    // 61s at sf2); one explode-to-(column,value) pass triples the
    // rows through the first partial agg (2.6s / 22.4s). Per-column
    // subplans run 2.6s / 18.8s — columnar scans make three 1-column
    // reads cost what one 3-column read does, and the remaining cost
    // IS the exact price ndv (its value-keyed shuffle carries the
    // full price domain — the reason production ANALYZE serves the
    // HLL instead). The gate-visible ndv is EXACT;
    // the high-cardinality price also carries the sketch-contract
    // boolean (HLL within 5% of exact — the q_approx_distinct
    // pattern: a sketch VALUE is engine-specific and can never sit
    // under a cross-engine hash, but its contract can). Sums run
    // through DECIMAL, doubles only at the edge. (The string/key
    // profiling sibling over customer is `q_profile`; this is the
    // NUMERIC ANALYZE.)
    "q_profile_numeric" -> { (s, dir) =>
      val li = table(s, dir, "lineitem")
      val dec = "decimal(38,4)"
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
      def prof(c: String) = {
        val x = col(c)
        struct(lit(c).as("col_name"), count(x).as("n"),
          (count(lit(1)) - count(x)).as("n_null"),
          min(x).cast("double").as("min_v"),
          max(x).cast("double").as("max_v"),
          sum(x.cast(dec)).cast("double").as("sum_v"))
      }
      val base = li
        .agg(prof(cols(0)).as("a"), prof(cols(1)).as("b"),
          prof(cols(2)).as("c"),
          approx_count_distinct(col("l_extendedprice"), 0.02).as("hll_price"))
        .select(explode(array(col("a"), col("b"), col("c"))).as("p"),
          col("hll_price"))
        .select(col("p.col_name"), col("p.n"), col("p.n_null"),
          col("p.min_v"), col("p.max_v"), col("p.sum_v"), col("hll_price"))
      // NULL is excluded: COUNT(DISTINCT c) semantics on both engines
      // (the NULL population is already reported as n_null)
      def ndvOf(c: String) = li.select(col(c).as("v"))
        .filter(col("v").isNotNull)
        .groupBy(col("v")).agg(count(lit(1)).as("__dup"))
        .agg(count(lit(1)).as("ndv"))
        .select(lit(c).as("col_name"), col("ndv"))
      val nd = cols.map(ndvOf).reduce(_ unionByName _)
      base.join(broadcast(nd), Seq("col_name"))
        .withColumn("ndv_in_band",
          when(col("col_name") === "l_extendedprice",
            abs(col("hll_price").cast("double") /
              col("ndv").cast("double") - 1.0) <= lit(0.05))
            .otherwise(lit(true)))
        .select(col("col_name"), col("n"), col("n_null"), col("ndv"),
          col("min_v"), col("max_v"), col("sum_v"), col("ndv_in_band"))
        .orderBy(col("col_name"))
    },

    // Equi-width histogram over a two-pass plan — the profiling
    // companion: pass 1 is a 1-row exact min/max aggregate broadcast
    // back (the bm25 stats shape), pass 2 buckets every row with
    // EXACT integer arithmetic on the decimal's cents so both engines
    // place boundary values identically (float width math would
    // disagree at bucket edges): bucket = min(9, (cents-lo)*10 DIV
    // (hi-lo+1)). At 100 TB: two scans of one column, one 10-row
    // result, no other exchange.
    "q_histogram" -> { (s, dir) =>
      val li = table(s, dir, "lineitem")
      // double → DECIMAL(12,2) → ×100 → long: exact cents on both
      // engines (a bare double*100 → long cast TRUNCATES in Spark but
      // ROUNDS in DuckDB — the 109998.99999… case diverges)
      val cents = (col("l_extendedprice").cast("decimal(12,2)") * 100)
        .cast("long")
      val mm = li.agg(min(cents).as("lo"), max(cents).as("hi"))
      li.select(cents.as("cents"))
        .crossJoin(broadcast(mm))
        .withColumn("bucket", least(lit(9),
          expr("(cents - lo) * 10 DIV (hi - lo + 1)")).cast("int"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("cnt"),
          min(col("cents")).as("min_cents"), max(col("cents")).as("max_cents"))
        .orderBy(col("bucket"))
    },

    // Dynamic partition pruning: the fact is partitioned on the join
    // column, the dim carries the selective filter, and Catalyst
    // injects a DynamicPruningSubquery into the fact scan's partition
    // filters (reusing the join's broadcast) — at 100 TB this is what
    // turns "join against this month's dim rows" into reading one
    // partition instead of the whole fact. Plan shape spec-asserted in
    // DppSpec; here the result must equal the plain join.
    "q_dpp" -> { (s, dir) =>
      val (factPath, dimPath) = setupDpp(s, dir)
      val fact = s.read.parquet(factPath)
      val dim = s.read.parquet(dimPath).filter(col("label") === "returned")
      fact.join(dim, col("l_returnflag") === col("flag"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast(dec)).as("qty"))
        .withColumn("qty", col("qty").cast("double"))
        .orderBy(col("label"))
    },

    // FULL OUTER join of two yearly activity aggregates.
    "q_join_full" -> { (s, dir) =>
      val o = table(s, dir, "orders")
      def yearAgg(from: String, until: String, out: String) =
        o.filter(col("o_orderdate") >= lit(from).cast("timestamp") &&
            col("o_orderdate") < lit(until).cast("timestamp"))
          .groupBy(col("o_custkey")).agg(count(lit(1)).as(out))
      yearAgg("1995-01-01", "1996-01-01", "n95")
        .join(yearAgg("1996-01-01", "1997-01-01", "n96"), Seq("o_custkey"), "full")
        .orderBy(col("o_custkey"))
    },

    // Range (theta) join against a tiny broadcast band table — planned
    // as BroadcastNestedLoopJoin, the right shape when one side is tiny.
    "q_join_range" -> { (s, dir) =>
      import s.implicits._
      val bands = Seq(
        ("A_low", 0.0, 150000.0), ("B_mid", 150000.0, 300000.0),
        ("C_high", 300000.0, 1e18)).toDF("band", "lo", "hi")
      table(s, dir, "orders")
        .join(broadcast(bands),
          col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(dec)).cast("double").as("total"))
        .orderBy(col("band"))
    },

    // RIGHT outer join (orders right-joined to customers preserves
    // order-less customers on the right side).
    "q_join_right" -> { (s, dir) =>
      val o = table(s, dir, "orders").filter(col("o_orderstatus") === "P")
      val c = table(s, dir, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"), "right")
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(count(col("o_orderkey")).as("n_pending"))
        .orderBy(col("c_custkey"))
    },

    // Multiset INTERSECT ALL.
    "q_intersect_all" -> { (s, dir) =>
      val o = table(s, dir, "orders")
      def keys(from: String, until: String) =
        o.filter(col("o_orderdate") >= lit(from).cast("timestamp") &&
            col("o_orderdate") < lit(until).cast("timestamp"))
          .select(col("o_custkey"))
      keys("1995-01-01", "1996-01-01")
        .intersectAll(keys("1996-01-01", "1997-01-01"))
        .orderBy(col("o_custkey"))
    },

    // CUBE over two dimensions with grouping id.
    "q_cube" -> { (s, dir) =>
      // Pre-aggregate to the dimension domain BEFORE the cube (r11):
      // Spark's cube EXPANDs every input row once per grouping set
      // (4× here) ahead of the partial aggregate, so the raw spelling
      // shuffles/aggregates 4×|lineitem| rows; grouping by the full
      // dimension tuple first collapses map-side to the ~8-row domain
      // and the EXPAND runs on that. Identical results: count is the
      // sum of per-tuple counts, DECIMAL addition is associative, and
      // the rewrite is null-safe for dimension values too — data nulls
      // survive the pre-groupBy as ordinary groups and EXPAND keys
      // include grouping_id, so they never conflate with subtotal
      // markers (CubePreAggSpec pins equality on null-bearing dims).
      // Guide §2.3 "aggregate before you shuffle".
      val pre = table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("__n"),
          sum(col("l_quantity").cast(dec)).as("__q"))
      pre.cube(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("__n")).cast("long").as("n"),
          sum(col("__q")).cast("double").as("qty"),
          grouping_id().cast("long").as("gid"))
        .orderBy(col("gid"), asc_nulls_first("l_returnflag"),
          asc_nulls_first("l_linestatus"))
    },

    // Ranking battery: rank, dense_rank, ntile, lead, first/last value.
    "q_window_rank" -> { (s, dir) =>
      val byPrice = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      table(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rnk", rank().over(byPrice))
        .withColumn("drnk", dense_rank().over(byPrice))
        .withColumn("nt", ntile(4).over(byPrice))
        .withColumn("next_key", lead(col("o_orderkey"), 1).over(byPrice))
        .withColumn("top_key", first(col("o_orderkey")).over(
          byPrice.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .orderBy(col("o_custkey"), col("rnk"))
    },

    // Multiset EXCEPT ALL / INTERSECT ALL.
    "q_set_ops_all" -> { (s, dir) =>
      val o = table(s, dir, "orders")
      def keys(from: String, until: String) =
        o.filter(col("o_orderdate") >= lit(from).cast("timestamp") &&
            col("o_orderdate") < lit(until).cast("timestamp"))
          .select(col("o_custkey"))
      keys("1995-01-01", "1996-01-01").exceptAll(keys("1996-01-01", "1997-01-01"))
        .orderBy(col("o_custkey"))
    },

    // Bloom-filter semi-join pre-filter — the sketch-based runtime-
    // filter pattern for 100 TB joins: build a small Bloom filter over
    // the build side's join keys (distributed, cell-OR merge), broadcast
    // it, and drop probe rows BEFORE the shuffle; the exact semi-join
    // afterwards removes the (bounded-rate) false positives, so the
    // result is value-identical to the plain semi-join and the oracle
    // checks it. The scale win: probe rows that cannot match never
    // enter the exchange — this is what Spark's own InjectRuntimeFilter
    // does, expressed as an explicit operator.
    // The probe is the codegen'd BloomMightContain expression over the
    // serialized sketch (a plan literal — tasks deserialize once and
    // probe unboxed longs inside whole-stage codegen), not a Scala UDF
    // (which boxes every key and fences codegen).
    "q_bloom_semijoin" -> { (s, dir) =>
      graft.functions.Native.register(s)
      val hot = table(s, dir, "orders").filter(col("o_totalprice") > 490000)
      val bf = hot.stat.bloomFilter("o_custkey", 2000, 0.03)
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      table(s, dir, "customer")
        .filter(graft.functions.Native.bloomMightContain(
          lit(bos.toByteArray), col("c_custkey")))
        .join(hot, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // Count-min-sketch frequency estimation — the heavy-hitters sketch
    // for frequency questions at 100 TB without exact per-key state:
    // distributed `count_min_sketch` aggregate (cell-wise-additive
    // merge, order-independent => deterministic), one ~1 MB binary to
    // the driver, point estimates for a fixed probe set. Engine-
    // specific sketch -> rows-only driver check; the CMS guarantee
    // (est >= exact, est <= exact + eps*N) is spec-asserted in
    // QueryDeterminismSpec.
    "q_sketch_freq" -> { (s, dir) =>
      import s.implicits._
      val li = table(s, dir, "lineitem")
      val bytes = li
        .agg(expr("count_min_sketch(l_partkey, 0.0001d, 0.99d, 42)"))
        .head.getAs[Array[Byte]](0)
      val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(bytes))
      // Sketch-contract gate: the hashed output carries the EXACT counts
      // (DuckDB-mirrorable) plus booleans asserting the CMS guarantee
      // (never under-counts; over-counts by a bounded slack). The raw
      // engine-specific estimates stay out of the hashed columns, so the
      // hard gate certifies the sketch's contract value-level.
      // Slack is 2*eps*N, not eps*N: CMS only promises the eps*N bound
      // at the sketch's 0.99 confidence, so the tight bound can
      // legitimately (and then deterministically, seed 42) fail on some
      // probe set at some SF without any engine bug. The strict eps*N
      // bound stays spec-level (QueryDeterminismSpec) where it is
      // observed to hold on the test data; the hashed gate asserts the
      // always-safe doubled bound.
      val slack = math.max(1L, (2.0 * 1e-4 * cms.totalCount()).toLong)
      val est = (1L to 20L).map(k => (k, cms.estimateCount(java.lang.Long.valueOf(k))))
        .toDF("l_partkey", "est_count")
      val exact = li.filter(col("l_partkey").between(1L, 20L))
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("xc"))
      est.join(exact, Seq("l_partkey"), "left")
        .select(col("l_partkey"),
          coalesce(col("xc"), lit(0L)).as("exact_count"),
          (col("est_count") >= coalesce(col("xc"), lit(0L)))
            .as("cms_no_undercount"),
          (col("est_count") <= coalesce(col("xc"), lit(0L)) + lit(slack))
            .as("cms_within_eps"))
        .orderBy(col("l_partkey"))
    },

    // HLL sketch cardinality. The 100 TB serving shape is the approx-only
    // aggregate (no exact-distinct shuffle); for the hard gate the query
    // ALSO computes the exact distinct count and emits it with a boolean
    // asserting the HLL estimate sits inside its error band (default
    // rsd 0.05 -> generous 5-sigma band, matching QueryDeterminismSpec),
    // so the DuckDB oracle certifies the sketch contract value-level.
    "q_approx_distinct" -> { (s, dir) =>
      table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"),
          count(lit(1)).as("n_rows"))
        .select(col("l_returnflag"), col("exact_parts"), col("n_rows"),
          (abs(col("approx_parts") - col("exact_parts")) <=
            greatest(lit(10L), (col("exact_parts") * 0.25).cast("long")))
            .as("hll_in_band"))
        .orderBy(col("l_returnflag"))
    },

    // Approximate percentiles — the 100 TB path the exact q_percentile
    // documents against: a mergeable quantile sketch (partial-aggregated
    // per partition, merged once) instead of sorting every group.
    // Engine-specific sketch -> rows-only driver check; the error bound
    // vs exact percentile is spec-asserted (QueryDeterminismSpec).
    // Accuracy 2500 (rank error ~4e-4): sketch update/compress cost is
    // LINEAR in the accuracy parameter (measured 2.1s @10000 vs 1.1s
    // @2500 on sf0.1) and 2500 already bounds the integer-quantity
    // median to the exact value and p99 well inside the spec's 2% band —
    // paying 2x runtime for rank precision below the data's own
    // granularity is waste at any scale.
    // Gate shape (round 4): the r3 driver comparator crashed on the
    // array-typed quartiles column; the output now carries the EXACT
    // percentiles as scalars (DuckDB quantile_cont mirror) plus booleans
    // asserting the sketch landed within its rank-error band — the same
    // sketch-contract pattern as q_approx_distinct / q_sketch_freq.
    "q_percentile_approx" -> { (s, dir) =>
      // Round-12 optimization (guide §1.2/§2.3): the one-aggregate form
      // fed every raw row through Spark's `percentile` ImperativeAggregate
      // TWICE (qty + floored price) — a boxed value->count OpenHashMap
      // update per row per column dominated the query (~0.8 s of 1.5 s at
      // sf0.1). The exact percentiles are now derived from frequency
      // domains instead, leaving only the mergeable sketches on the raw
      // scan:
      //  - qty: groupBy (rf, qty) count (50-value domain) -> Spark's own
      //    percentile(qty, array, cnt) over <=50 rows per group — the map
      //    build collapses from 600k boxed updates to 150.
      //  - price: groupBy (rf, floor(price)) count (price DOMAIN, ~100k
      //    entries — the same bound the old map relied on), then a window
      //    running-sum locates the two bounding values and the SAME
      //    interpolation formula as Percentile.getPercentile computes the
      //    result: position = (N-1)*p; lowerKey = first value whose
      //    cumulative count > floor(position); higherKey = first value
      //    whose cumulative count > ceil(position); result =
      //    (higher-pos)*lowerKey + (pos-lower)*higherKey (all-double IEEE
      //    ops in the same order — bit-identical, A/B-proven vs the old
      //    form at 3 SFs and oracle-gated).
      // Everything stays partial-aggregated/codegen; no per-row boxed map.
      // Exact-percentile gate companions stay BOUNDED-BUFFER: flooring to
      // whole currency units bounds distinct values by the price DOMAIN
      // (~100k entries) independent of scale; the <1-unit quantization
      // error is far inside the 2% sketch band gated below. `floor` is
      // bitwise-deterministic on the same stored doubles across engines.
      // l_quantity is 1..50 — already domain-bounded.
      val base = table(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_quantity"),
          col("l_extendedprice"))
      // sketches: unchanged single-pass GK aggregation over the raw rows
      val sketch = base.groupBy(col("l_returnflag"))
        .agg(
          expr("approx_percentile(l_quantity, array(0.25, 0.5, 0.75), 2500)")
            .as("aq"),
          expr("approx_percentile(l_extendedprice, 0.99, 2500)").as("ap99"))
      // Both exact pre-aggs read the raw scan (a round-robin spread of the
      // input was measured SLOWER at sf0.1: the keyless repartition pays a
      // sort + a raw-row shuffle and near-unique price keys defeat the
      // partial-agg collapse — guide §2.5's sortBeforeRepartition caveat).
      val freqIn = base
      // exact qty quartiles from the (rf, qty) frequency domain; Spark's
      // own percentile does the interpolation, so values are identical by
      // construction (same value->count map contents, 150 rows not 600k)
      val qtyEq = freqIn.filter(col("l_quantity").isNotNull)
        .groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_quantity, array(0.25, 0.5, 0.75), cnt)")
          .as("eq"))
      // exact price p99 from the (rf, floor(price)) frequency domain via
      // window running-sum + Percentile.getPercentile's exact arithmetic
      val priceF = freqIn.filter(col("l_extendedprice").isNotNull)
        .groupBy(col("l_returnflag"),
          expr("floor(l_extendedprice)").as("v"))
        .agg(count(lit(1)).as("cnt"))
      val wRun = Window.partitionBy("l_returnflag").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy("l_returnflag")
      val priceEp = priceF
        .withColumn("cum", sum("cnt").over(wRun))
        .withColumn("n", sum("cnt").over(wAll))
        .withColumn("pos", (col("n") - 1).cast("double") * lit(0.99))
        .withColumn("lo", floor(col("pos")))
        .withColumn("hi", ceil(col("pos")))
        // the <=2 rows whose index range [cum-cnt, cum) covers lo or hi
        .filter(col("cum") > col("lo") &&
          (col("cum") - col("cnt")) <= col("hi"))
        .groupBy(col("l_returnflag"))
        .agg(
          min(col("v")).cast("double").as("lowerKey"),
          max(col("v")).cast("double").as("higherKey"),
          min(col("pos")).as("pos"), // constant within the group
          min(col("lo")).as("lo"),
          min(col("hi")).as("hi"))
        .select(col("l_returnflag"),
          when(col("hi") === col("lo") ||
            col("lowerKey") === col("higherKey"), col("lowerKey"))
            .otherwise((col("hi") - col("pos")) * col("lowerKey") +
              (col("pos") - col("lo")) * col("higherKey")).as("ep99"))
      sketch.join(qtyEq, Seq("l_returnflag"))
        .join(priceEp, Seq("l_returnflag"))
        .select(col("l_returnflag"),
          element_at(col("eq"), 1).as("p25_qty"),
          element_at(col("eq"), 2).as("med_qty"),
          element_at(col("eq"), 3).as("p75_qty"),
          col("ep99").as("p99_price"),
          (abs(element_at(col("aq"), 2).cast("double") -
            element_at(col("eq"), 2)) <= lit(1.0)).as("med_in_band"),
          (abs(element_at(col("aq"), 1).cast("double") -
            element_at(col("eq"), 1)) <= lit(1.0) &&
           abs(element_at(col("aq"), 3).cast("double") -
            element_at(col("eq"), 3)) <= lit(1.0)).as("quartiles_in_band"),
          (abs(col("ap99").cast("double") - col("ep99")) <=
            greatest(lit(1.0), col("ep99") * 0.02)).as("p99_in_band"))
        .orderBy(col("l_returnflag"))
    },

    // Array function battery: collect_list normalized by sort_array (the
    // deterministic way to aggregate into arrays), size, element access.
    "q_array_funcs" -> { (s, dir) =>
      table(s, dir, "lineitem")
        .filter(col("l_orderkey") < 2000)
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_list(col("l_linenumber"))).as("line_numbers"))
        .select(col("l_orderkey"),
          // scalar rendering: array-typed result columns don't survive
          // every downstream comparator; the array ops still run
          concat_ws(",", col("line_numbers")).as("line_numbers_csv"),
          size(col("line_numbers")).as("n_lines"),
          element_at(col("line_numbers"), 1).as("first_line"),
          array_contains(col("line_numbers"), 3).as("has_line3"))
        .orderBy(col("l_orderkey"))
    },

    // TPC-H Q3-shaped shipping-priority pipeline: selective filters on
    // all three tables pushed to the scans, customer broadcast, one
    // shuffle join on orderkey, top-10 by revenue.
    "q_tpch_q3" -> { (s, dir) =>
      val cutoff = lit("1997-01-01").cast("timestamp")
      val c = broadcast(table(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING"))
      val o = table(s, dir, "orders").filter(col("o_orderdate") < cutoff)
      val l = table(s, dir, "lineitem").filter(col("l_shipdate") > cutoff)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(col("l_extendedprice").cast(dec) *
            (lit(1).cast(dec) - col("l_discount").cast(dec)))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // 2D skyline (Pareto front: minimize price, maximize date) via the
    // sort + running-max formulation — one sort, no O(N²) self-join
    // (cf. "Integration of Skyline Queries into Spark SQL", EDBT 2023).
    // A row is dominated iff an earlier row in (price ASC, date DESC)
    // order has a strictly later date.
    // 2D skyline (min price, max date), SCALE-SAFE: the naive form is one
    // global-order window = the whole table through one reducer. Instead:
    // fixed-width price buckets (deterministic, data-independent), a local
    // running-max window PER BUCKET (parallel), and a cross-bucket prefix
    // max computed on the tiny per-bucket aggregate (one window over
    // ~120 rows, broadcast back). best_prev(r) decomposes exactly as
    // max(local-prefix within bucket, max date of all lower buckets), so
    // the result is identical to the single-window formulation the oracle
    // uses. o_orderkey is the explicit total-order tiebreak: without it,
    // which of two equal-(price,date) rows survives is partition-order-
    // dependent.
    "q_skyline" -> { (s, dir) =>
      val base = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate"))
        .withColumn("b", floor(col("o_totalprice") / lit(5000.0)).cast("long"))
      val localW = Window.partitionBy(col("b"))
        .orderBy(col("o_totalprice"), col("o_orderdate").desc, col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val local = base.withColumn("local_prev", max(col("o_orderdate")).over(localW))
      val prefW = Window.orderBy(col("b"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val pref = base.groupBy(col("b"))
        .agg(max(col("o_orderdate")).as("bmax"))
        .withColumn("cross_prev", max(col("bmax")).over(prefW))
        .select(col("b"), col("cross_prev"))
      local.join(broadcast(pref), Seq("b"))
        .withColumn("best_prev", greatest(col("local_prev"), col("cross_prev")))
        .filter(col("best_prev").isNull ||
          col("o_orderdate") > col("best_prev"))
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate"))
        .orderBy(col("o_totalprice"))
    },

    // Gap-based sessionization over the event stream (batch view):
    // session boundary when the per-user gap exceeds 30 minutes; one
    // sort per user partition, then a running session counter.
    "q_sessionize" -> { (s, dir) =>
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("t"))
      val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      table(s, dir, "events")
        .withColumn("t", expr("cast(ts as timestamp)"))
        .withColumn("prev_t", lag(col("t"), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_t").isNull ||
            unix_micros(col("t")) - unix_micros(col("prev_t")) > 1800000000L, 1)
            .otherwise(0))
        .withColumn("sess_id", sum(col("new_sess")).over(run).cast("long"))
        .groupBy(col("user_id"), col("sess_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("t")).as("sess_start"), max(col("t")).as("sess_end"))
        .orderBy(col("user_id"), col("sess_id"))
    },

    // Skew-resistant salted aggregation (two-phase) — same answer as a
    // plain GROUP BY, verified by the oracle.
    "q_salted_agg" -> { (s, dir) =>
      graft.ops.Ops.saltedSum(
          table(s, dir, "lineitem"),
          col("l_returnflag"), col("l_quantity").cast(dec), "sum_qty")
        .withColumn("sum_qty", col("sum_qty").cast("double"))
        .orderBy(col("l_returnflag"))
    },

    // Single-pass column profiling (the ANALYZE TABLE / data-quality
    // shape): ALL columns' stats in one scan — one aggregate row fanned
    // out to a row per column by the stack() generator. Exact
    // COUNT(DISTINCT) keeps the oracle value-level (at 100 TB swap in
    // approx_count_distinct; the one-scan shape is the point).
    // Graph rank (PageRank, 3 unrolled iterations) — the host-quality
    // signal published corpus curation uses (Common-Crawl-style host
    // ranking feeding quality filters), over the co-supply graph:
    // suppliers sharing an order, symmetric distinct edges, so every
    // graph node has outdeg >= 1 and receives >= 1 in-edge (no
    // dangling-mass terms). INTEGER fixed-point throughout:
    // r_0 = 1e6, r_{t+1}(v) = 150000 + Σ_u (r_t(u)*850000) DIV
    // (1e6*deg(u)) — floor division and long sums are deterministic
    // and order-independent on both engines, which is what lets an
    // iterative float algorithm live under a hash gate (same move as
    // the LM's micro-nats). Scale shape: per iteration one shuffle
    // join of ranks against edges on the source key + one partial agg
    // by destination — the standard distributed PR step; deg and
    // ranks stay O(nodes), edges derive once and are checkpointed.
    // Mass bound: Σr ≈ N·1e6 stays < 2^63/850000 up to ~10^7 nodes;
    // larger graphs rescale r_0 down (documented, not hit here).
    // Join strategy: ranks and degrees are O(nodes) — BROADCAST them
    // against the O(edges) table, so an iteration is one broadcast
    // join + one partial agg by destination (collapses map-side to
    // node cardinality). The hints matter: edges sits behind a
    // localCheckpoint whose LogicalRDD has no stats, and the SMJ
    // fallback full-sorts the edge table in EVERY iteration — 4.9 GB
    // of sort spill at sf2 before the hint, zero after. (Web-scale
    // graphs where O(nodes) outgrows the broadcast budget switch the
    // rank side to a shuffle join keyed by src — the standard
    // distributed-PR tradeoff; at 1e6-rank fixed point that crossover
    // is ~1e8 nodes.)
    "q_pagerank" -> { (s, dir) =>
      val li = table(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
        .distinct()
      // Graduated pair expansion + pair-keyed dedup: see coSupplyEdges
      // (the star regime past PrStarT) and its scaladoc for the r7
      // spill story — the pair stream duplicates each edge once per
      // shared order (2.6x here); re-keying the exchange by the PAIR
      // before distinct() co-locates the copies so each task's hash
      // map holds only its own partition's distinct edges (~45 MB),
      // and distinct() elides its own exchange: one 0.7 GB shuffle
      // replaced 5.4 GB of spill at sf2. The sizing rule at cluster
      // scale: distinct-edge partitions must fit the per-core budget —
      // grow shuffle partitions with the graph.
      // LAZY checkpoints (r11): materialization folds into the first
      // consuming job instead of paying two extra synchronous driver
      // barriers — same blocks, same reuse, ~0.2 s less fixed cost
      // (same-JVM A/B; output proven equal).
      val edges = coSupplyEdges(li, PrStarT)
        .localCheckpoint(false) // used by deg + all 3 iterations
      val deg = edges.groupBy(col("src").as("u"))
        .agg(count(lit(1)).as("deg"))
        .localCheckpoint(false) // O(nodes); broadcast into every iteration
      val r0 = deg.select(col("u"), lit(1000000L).as("r"))
      val rFinal = (1 to 3).foldLeft(r0) { (r, _) =>
        edges.join(broadcast(r.join(broadcast(deg), Seq("u"))
            .withColumnRenamed("u", "src")), Seq("src"))
          .select(col("dst").as("u"),
            expr("(r * 850000) DIV (1000000 * deg)").as("c"))
          .groupBy(col("u"))
          .agg((lit(150000L) + sum(col("c"))).as("r"))
      }
      deg.join(rFinal, Seq("u"))
        .select(col("u").as("suppkey"), col("deg").cast("int").as("outdeg"),
          col("r").cast("bigint").as("rank_micro"))
        .orderBy(col("suppkey"))
    },

    "q_profile" -> { (s, dir) =>
      val c = table(s, dir, "customer")
      def stats(cl: String, p: String) = Seq(
        count(col(cl)).as(s"${p}_nn"),
        countDistinct(col(cl)).as(s"${p}_nd"),
        min(col(cl)).cast("string").as(s"${p}_min"),
        max(col(cl)).cast("string").as(s"${p}_max"))
      val all = stats("c_custkey", "k") ++ stats("c_name", "n") ++
        stats("c_mktsegment", "m")
      c.agg(all.head, all.tail: _*)
        .selectExpr(
          """stack(3,
            |  'c_custkey',    k_nn, k_nd, k_min, k_max,
            |  'c_name',       n_nn, n_nd, n_min, n_max,
            |  'c_mktsegment', m_nn, m_nd, m_min, m_max)
            |AS (col_name, n_nonnull, n_distinct, min_s, max_s)""".stripMargin)
        .orderBy(col("col_name"))
    },

    // Reproducible statistics: variance / stddev / correlation computed
    // from EXACT decimal sufficient statistics (n, Σx, Σx², Σxy — one
    // partial-agg pass, order-independent), with the closed-form float
    // arithmetic done identically on both engines only at the END.
    // Built-in var_samp/corr stream floating-point accumulators whose
    // result depends on partitioning — unusable under a hash-compare
    // oracle and irreproducible at 100 TB; exact-sums-then-formula is
    // both reproducible and the cheaper plan (one combine per group).
    "q_stats_agg" -> { (s, dir) =>
      val x = col("l_quantity").cast(dec)
      val y = col("l_extendedprice").cast(dec)
      val g = table(s, dir, "lineitem").groupBy(col("l_returnflag")).agg(
        count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * x).as("sxx"), sum(y * y).as("syy"),
        sum(x * y).as("sxy"))
      val nD = col("n").cast("double")
      def d(c: String) = col(c).cast("double")
      val varQty = (nD * d("sxx") - d("sx") * d("sx")) /
        (nD * (nD - lit(1.0)))
      // The co-moments are EXACT decimals both engines agree on; the
      // derived doubles are rounded to 9 places because the
      // decimal→double CAST itself can differ by an ulp across engines
      // once the scaled integers pass 2^53 (DuckDB double-rounds via
      // int→double then /10^scale; the JVM conversion rounds once) —
      // corr_qp value-mismatched at sf1 from exactly this.
      // Residual caveat (advisor r5): round-at-9-places narrows but does
      // not ELIMINATE divergence — Spark rounds via exact BigDecimal
      // HALF_UP, DuckDB via fp multiply/divide, so a value within an ulp
      // of a 9th-place half-way boundary could still round apart at some
      // SF. Green at sf0.01/1/2; a hash-only miss here with matching
      // rows/schema should be read as this boundary, not a logic bug
      // (exact co-moments n/sx/sxx/sxy remain the authoritative values).
      g.select(col("l_returnflag"), col("n"),
          round(d("sx") / nD, 9).as("mean_qty"),
          round(varQty, 9).as("var_qty"),
          round(sqrt(varQty), 9).as("sd_qty"),
          round((nD * d("sxy") - d("sx") * d("sy")) /
            sqrt((nD * d("sxx") - d("sx") * d("sx")) *
              (nD * d("syy") - d("sy") * d("sy"))), 9).as("corr_qp"))
        .orderBy(col("l_returnflag"))
    },

    // Distribution window battery: percent_rank / cume_dist / nth_value
    // over a per-segment total order (unique key tiebreak makes the
    // rational rank arithmetic bit-identical across engines).
    "q_window_dist" -> { (s, dir) =>
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      table(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          coalesce(nth_value(col("c_custkey"), 2).over(w), lit(-1L))
            .as("second_key"))
        .orderBy(col("c_custkey"))
    },

    // Conversion funnel over the event stream: earliest view, earliest
    // click AFTER it, earliest purchase AFTER that — three partial-agg
    // passes each joined on user_id (never a per-user sort), the shape
    // that holds when one user has a million events.
    "q_funnel" -> { (s, dir) =>
      val e = table(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"))
      val v = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("tv"))
      val c = e.filter(col("event_type") === "click")
        .join(v, Seq("user_id")).filter(col("ts") > col("tv"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("tc"))
      val p = e.filter(col("event_type") === "purchase")
        .join(c, Seq("user_id")).filter(col("ts") > col("tc"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("tp"))
      v.agg(count(lit(1)).as("n_view"))
        .crossJoin(c.agg(count(lit(1)).as("n_click")))
        .crossJoin(p.agg(count(lit(1)).as("n_purchase")))
        .select(col("n_view"), col("n_click"), col("n_purchase"),
          (col("n_click").cast("double") / col("n_view")).as("r_click"),
          (col("n_purchase").cast("double") / col("n_click")).as("r_purchase"))
    },

    // Skew-resistant JOIN (Ops.saltedJoin): lineitem salted row-locally,
    // supplier replicated per salt, matched on (suppkey, salt) — a hot
    // supplier's rows spread over 8 reducers. Result must equal the
    // plain join (the salts cancel by construction).
    "q_skew_join" -> { (s, dir) =>
      val sup = table(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))
      graft.ops.Ops.saltedJoin(table(s, dir, "lineitem"), sup,
          "l_suppkey", "s_suppkey", salts = 8)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast(dec)).as("qty"))
        .withColumn("qty", col("qty").cast("double"))
        .orderBy(col("s_nationkey"))
    },

    // GROUPING SETS through the SQL surface.
    "q_grouping_sets" -> { (s, dir) =>
      table(s, dir, "customer").createOrReplaceTempView("customer_gs")
      s.sql(
        """SELECT c_mktsegment, c_nationkey, COUNT(*) AS n_cust,
          |  CAST(grouping_id() AS BIGINT) AS gid
          |FROM customer_gs
          |GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
          |ORDER BY gid, c_mktsegment, c_nationkey""".stripMargin)
        .orderBy(col("gid"), asc_nulls_first("c_mktsegment"),
          asc_nulls_first("c_nationkey"))
    },

    // Typed Dataset surface: case-class Encoder, typed filter/map.
    "q_typed_ds" -> { (s, dir) =>
      import s.implicits._
      val ds = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .as[(Long, Long, Double)]
      ds.filter(_._3 > 400000.0)
        .map { case (ok, ck, tp) => (ok, ck, tp * 0.9) }
        .toDF("o_orderkey", "o_custkey", "discounted")
        .orderBy(col("o_orderkey"))
    },

    // Referential-integrity audit — the data-quality pass a warehouse
    // runs over its FK graph: for every edge, how many child rows,
    // how many distinct child keys, how many ORPHAN keys/rows (child
    // FK with no parent) and how many CHILDLESS parents (parent key
    // no child references — naturally nonzero here: customers without
    // orders, parts never ordered). Shape per edge: the child is
    // scanned ONCE (one FK column), collapsed map-side to (key, rows);
    // that keyed aggregate FULL-OUTER joins the parent keys and ONE
    // conditional aggregate reads off all five outputs (child-side
    // rows carry non-null `rows`, unmatched child keys have null pk =
    // orphans, unmatched parents have null `rows` = childless). Two
    // rejected spellings, both measured on the plan: a left_anti per
    // output gets pushed BELOW the groupBy (the join key is the
    // grouping key) and re-scans the child per output; split
    // left-outer legs don't reuse the keyed exchange because the
    // outer join infers isnotnull on its non-preserved side only.
    // At 100 TB each edge costs one 1-column scan per table and one
    // keyed exchange each into the full-outer SMJ (the child side
    // arrives pre-partitioned from its groupBy); orphan ROWS are
    // counted by summing the carried per-key counts, never by a
    // second child pass. (Parent keys are assumed unique — the PK
    // side of a declared FK edge.)
    "q_integrity" -> { (s, dir) =>
      def edge(name: String, child: DataFrame, ck: String,
               parent: DataFrame, pk: String) = {
        val keys = child.groupBy(col(ck).as("k"))
          .agg(count(lit(1)).as("rows"))
        val pkeys = parent.select(col(pk).as("pk"))
        // `rows` is non-null exactly on child-side rows, so a child
        // NULL FK group (never equi-matched, pk stays null) still
        // counts as a child key and as an orphan — same as the
        // oracle's NOT EXISTS.
        keys.join(pkeys, col("k") === col("pk"), "full")
          .agg(
            coalesce(sum(col("rows")), lit(0L)).cast("long")
              .as("n_child_rows"),
            count(when(col("rows").isNotNull, 1)).as("n_child_keys"),
            count(when(col("rows").isNotNull && col("pk").isNull, 1))
              .as("orphan_keys"),
            coalesce(sum(when(col("pk").isNull, col("rows"))), lit(0L))
              .cast("long").as("orphan_rows"),
            count(when(col("rows").isNull, 1)).as("childless_parents"))
          .select(lit(name).as("edge"), col("n_child_rows"),
            col("n_child_keys"), col("orphan_keys"), col("orphan_rows"),
            col("childless_parents"))
      }
      val li = table(s, dir, "lineitem"); val o = table(s, dir, "orders")
      val c = table(s, dir, "customer"); val su = table(s, dir, "supplier")
      val p = table(s, dir, "part"); val n = table(s, dir, "nation")
      val r = table(s, dir, "region")
      Seq(
        edge("customer.c_nationkey->nation", c, "c_nationkey", n, "n_nationkey"),
        edge("lineitem.l_orderkey->orders", li, "l_orderkey", o, "o_orderkey"),
        edge("lineitem.l_partkey->part", li, "l_partkey", p, "p_partkey"),
        edge("lineitem.l_suppkey->supplier", li, "l_suppkey", su, "s_suppkey"),
        edge("nation.n_regionkey->region", n, "n_regionkey", r, "r_regionkey"),
        edge("orders.o_custkey->customer", o, "o_custkey", c, "c_custkey"),
        edge("supplier.s_nationkey->nation", su, "s_nationkey", n, "n_nationkey"))
        .reduce(_ unionByName _)
        .orderBy(col("edge"))
    },

    // Snapshot-diff CDC — the incremental-refresh primitive: given two
    // snapshots of a table, classify every key as added / removed /
    // changed / unchanged. The "new" snapshot is derived
    // deterministically from orders (k%97=0 deleted, k%89=3 reprices
    // by +1.00, k%101=5 re-inserted under a fresh negative key), so
    // both engines construct identical snapshots and the classifier's
    // exact counts are value-checked. Shape: fingerprints (60-bit md5
    // over the compared attributes, price as exact cents) are computed
    // AT THE SCAN, so the full-outer sort-merge join's exchange
    // carries (key, fp) — never rows; classification is a projection
    // over the joined pair and the result is a 4-row aggregate. At
    // 100 TB this is the standard narrow-diff plan: two 1-pass scans,
    // one keyed exchange each, no row payload movement.
    "q_delta_detect" -> { (s, dir) =>
      val o = table(s, dir, "orders")
      val cents = (col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("long")
      def fp(centsCol: Column) = graft.dedup.Dedup.hash60(concat_ws("|",
        col("o_custkey"), col("o_orderstatus"), centsCol))
      val a = o.select(col("o_orderkey").as("k"), fp(cents).as("fp_a"))
      val bKept = o.filter(col("o_orderkey") % 97 =!= 0)
        .select(col("o_orderkey").as("k"),
          fp(when(col("o_orderkey") % 89 === 3, cents + 100)
            .otherwise(cents)).as("fp_b"))
      val bIns = o.filter(col("o_orderkey") % 101 === 5)
        .select((-col("o_orderkey") - 1).as("k"), fp(cents).as("fp_b"))
      a.join(bKept.unionByName(bIns), Seq("k"), "full")
        .select(col("k"),
          when(col("fp_b").isNull, "removed")
            .when(col("fp_a").isNull, "added")
            .when(col("fp_a") =!= col("fp_b"), "changed")
            .otherwise("unchanged").as("change_type"))
        .groupBy(col("change_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).cast("long").as("sum_keys"))
        .orderBy(col("change_type"))
    },

    // Slowly-changing-dimension TYPE 2 — rebuild a versioned dimension
    // from a change log and answer an as-of snapshot from it: each
    // user's events become half-open validity intervals
    // [ts, next_ts) via one lead() window (ties broken by event_id,
    // so the history is deterministic), and the snapshot at T picks
    // the single interval containing T per user. Output per
    // event_type: total versions ever, users in that state at T, and
    // their exact key sum. Shape: ONE hash exchange by user_id feeds
    // the window; the interval filter is a projection predicate; both
    // aggregates are partial→final over the window output. At 100 TB:
    // one keyed exchange over the change log, no self-join — the
    // classic lead()-interval SCD2 build.
    "q_scd2" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val hist = table(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          col("ts").cast("timestamp").as("ts"), col("event_id"))
        .withColumn("valid_to", lead(col("ts"), 1).over(w))
      val asOf = lit("2024-01-15 00:00:00").cast("timestamp")
      val snap = hist.filter(col("ts") <= asOf &&
        (col("valid_to").isNull || col("valid_to") > asOf))
      val byTypeHist = hist.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_versions"))
      val byTypeSnap = snap.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_users_asof"),
          sum(col("user_id")).cast("long").as("sum_users_asof"))
      byTypeHist.join(byTypeSnap, Seq("event_type"), "left")
        .na.fill(0L, Seq("n_users_asof", "sum_users_asof"))
        .orderBy(col("event_type"))
    },

    // Cohort retention — the product-analytics staple: bucket each user
    // by the week of their FIRST event (the cohort), then count how many
    // of them are still active at each later week offset, with the
    // retained fraction vs the cohort's own week-0 size. Shape: ONE hash
    // exchange by user_id feeds a window min (the cohort assignment);
    // the per-(cohort, offset, user) dedup needs NO new exchange because
    // hash-partitioning on user_id already co-locates every group whose
    // key CONTAINS user_id (partitioning-subset rule — the plan guard
    // pins it); the cohort size joins back as a window over the TINY
    // rollup, not a self-join (a self-join on the un-materialized agg
    // replans the whole subtree — measured as a second full scan +
    // second user_id exchange of the event log). At 100 TB: one keyed
    // exchange over the event log, everything after it is
    // width-of-weeks small.
    "q_retention_cohort" -> { (s, dir) =>
      val e = table(s, dir, "events")
        .select(col("user_id"), col("ts").cast("timestamp").as("ts"))
        .withColumn("wk", date_trunc("week", col("ts")))
        .withColumn("cohort",
          min(col("wk")).over(Window.partitionBy(col("user_id"))))
      val marked = e.select(col("user_id"),
        date_format(col("cohort"), "yyyy-MM-dd").as("cohort_week"),
        (datediff(to_date(col("wk")), to_date(col("cohort"))) / 7)
          .cast("int").as("week_offset"))
      marked
        .groupBy(col("cohort_week"), col("week_offset"), col("user_id"))
        .agg(count(lit(1)).as("dropme"))
        .groupBy(col("cohort_week"), col("week_offset"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("user_id")).cast("long").as("sum_users"))
        .withColumn("cohort_size",
          max(when(col("week_offset") === 0, col("n_users")))
            .over(Window.partitionBy(col("cohort_week"))))
        .select(col("cohort_week"), col("week_offset"), col("n_users"),
          col("sum_users"),
          (col("n_users") / col("cohort_size")).as("retained_frac"))
        .orderBy(col("cohort_week"), col("week_offset"))
    },

    // Time-series gap fill — densify the hourly per-type event series
    // over the corpus' global hour range, then repair the gaps three
    // ways at once: zero-fill for counts, last-observation-carried-
    // forward for the cents sum, and LINEAR INTERPOLATION emitted as an
    // exact integer numerator/denominator pair (never a divided double
    // — Spark and DuckDB round division differently; a rational in
    // micro-units is hash-comparable at any SF). The spine comes from
    // the bm25 two-pass stats shape: a 1-row min/max aggregate broadcast
    // back and exploded per type, so the fill join is keyed
    // (type, hour) and the LOCF/neighbor windows run per type — a
    // partition whose width is bounded by wall-clock hours, not rows,
    // so it cannot skew no matter how hot an hour gets.
    "q_gapfill" -> { (s, dir) =>
      val e = table(s, dir, "events")
        .select(col("event_type"),
          (unix_timestamp(date_trunc("hour", col("ts").cast("timestamp")))
            / 3600).cast("long").as("pos"),
          (col("value").cast(DecimalType(12, 2)) * 100)
            .cast("long").as("cents"))
      val hourly = e.groupBy(col("event_type"), col("pos"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
      val bounds = e.agg(min(col("pos")).as("lo"), max(col("pos")).as("hi"))
      val spine = hourly.select(col("event_type")).distinct()
        .crossJoin(broadcast(bounds))
        .select(col("event_type"),
          explode(sequence(col("lo"), col("hi"))).as("pos"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("pos"))
      val wPrev = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wNext = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val markedPos = when(col("cents").isNotNull, col("pos"))
      spine.join(hourly, Seq("event_type", "pos"), "left")
        .withColumn("n_filled", coalesce(col("n"), lit(0L)))
        .withColumn("locf_cents",
          last(col("cents"), ignoreNulls = true).over(wPrev))
        .withColumn("prev_pos",
          last(markedPos, ignoreNulls = true).over(wPrev))
        .withColumn("next_cents",
          first(col("cents"), ignoreNulls = true).over(wNext))
        .withColumn("next_pos",
          first(markedPos, ignoreNulls = true).over(wNext))
        .select(col("event_type"), col("pos"), col("n_filled"),
          col("locf_cents"),
          when(col("cents").isNotNull, col("cents"))
            .otherwise(col("locf_cents") * (col("next_pos") - col("pos")) +
              col("next_cents") * (col("pos") - col("prev_pos")))
            .as("interp_num"),
          when(col("cents").isNotNull, lit(1L))
            .otherwise(col("next_pos") - col("prev_pos")).as("interp_den"))
        .orderBy(col("event_type"), col("pos"))
    },

    // Expectation suite — Deequ-style declarative data-quality rules
    // evaluated against a snapshot with PLANTED violations (derived
    // deterministically from orders, the q_delta_detect discipline, so
    // both engines audit the identical dirty table and every violation
    // count is value-checked — a suite that only ever reports zero
    // proves nothing). Five row-local rules (completeness, range,
    // domain, regex pattern, date bounds) RIDE the uniqueness rule's
    // keyed shuffle as per-key conditional counts, so the whole suite is
    // one scan of the snapshot into one exchange by key into a 1-row
    // final aggregate — the alternative (a scan-side aggregate for the
    // row-local rules plus a separate groupBy for uniqueness) reads the
    // table twice, and at 100 TB the scan IS the cost. Adding a seventh
    // row-local rule costs one more counter on the same pass.
    "q_expectations" -> { (s, dir) =>
      val base = table(s, dir, "orders").select(
        col("o_orderkey").as("k"),
        when(col("o_orderkey") % 113 === 0, lit(null))
          .otherwise(col("o_custkey")).as("ck"),
        when(col("o_orderkey") % 127 === 1, -col("o_totalprice"))
          .otherwise(col("o_totalprice")).as("tp"),
        when(col("o_orderkey") % 131 === 2, lit("X"))
          .otherwise(col("o_orderstatus")).as("st"),
        col("o_orderpriority").as("pr"), col("o_orderdate").as("dt"))
      val dirty = base.unionByName(base.filter(col("k") % 139 === 3))
      dirty.groupBy(col("k")).agg(
        count(lit(1)).as("c"),
        count(when(col("ck").isNull, 1)).as("v1"),
        count(when(col("tp") <= 0, 1)).as("v2"),
        count(when(!col("st").isin("O", "F", "P"), 1)).as("v3"),
        count(when(!col("pr").rlike("^[1-5]-[A-Z ]+$"), 1)).as("v4"),
        count(when(col("dt") < lit("1990-01-01").cast("timestamp") ||
          col("dt") >= lit("2005-01-01").cast("timestamp"), 1)).as("v5"))
        .agg(sum(col("c")).as("n_rows"),
          sum(col("v1")).as("v1"), sum(col("v2")).as("v2"),
          sum(col("v3")).as("v3"), sum(col("v4")).as("v4"),
          sum(col("v5")).as("v5"),
          coalesce(sum(when(col("c") > 1, col("c"))), lit(0L)).as("v6"))
        .select(col("n_rows"), expr(
          """stack(6,
            |  'bounds_orderdate', v5,
            |  'completeness_custkey', v1,
            |  'domain_orderstatus', v3,
            |  'pattern_orderpriority', v4,
            |  'range_totalprice_positive', v2,
            |  'unique_orderkey', v6) as (rule, n_violations)
            |""".stripMargin))
        .select(col("rule"), col("n_rows").cast("long").as("n_rows"),
          col("n_violations").cast("long").as("n_violations"),
          (col("n_violations") === 0).as("pass"))
        .orderBy(col("rule"))
    },

    // Multi-touch attribution — credit each purchase to the user's
    // first and last preceding non-purchase touch (ties broken by
    // event_id; no prior touch credits '(direct)'). Both touch columns
    // come from ONE window pass (same partition/order/frame — a single
    // Window node, the plan guard pins it), conversions then explode
    // into (model, touch) pairs so both attribution models aggregate in
    // one partial→final pass instead of re-running the window per
    // model. At 100 TB: one keyed exchange over the event log by
    // user_id, then a 2×-fanout projection into a tiny keyed agg.
    "q_attribution" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val touch = when(col("event_type") =!= "purchase", col("event_type"))
      table(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("event_id"),
          col("ts").cast("timestamp").as("ts"),
          (col("value").cast(DecimalType(12, 2)) * 100)
            .cast("long").as("cents"))
        .select(col("event_type"), col("cents"),
          // both touch columns in ONE select over the same window spec
          // so they fuse into a single Window node (chained withColumn
          // interleaves a Project and plans two)
          last(touch, ignoreNulls = true).over(w).as("last_touch"),
          first(touch, ignoreNulls = true).over(w).as("first_touch"))
        .filter(col("event_type") === "purchase")
        .select(explode(array(
          struct(lit("first_touch").as("model"),
            coalesce(col("first_touch"), lit("(direct)")).as("touch_type"),
            col("cents")),
          struct(lit("last_touch").as("model"),
            coalesce(col("last_touch"), lit("(direct)")).as("touch_type"),
            col("cents")))).as("x"))
        .select(col("x.model").as("model"),
          col("x.touch_type").as("touch_type"), col("x.cents").as("cents"))
        .groupBy(col("model"), col("touch_type"))
        .agg(count(lit(1)).as("n_conversions"),
          sum(col("cents")).cast("long").as("cents"))
        .orderBy(col("model"), col("touch_type"))
    },

    // Time-RANGE window — the window-family member the ROWS queries
    // can't express: each order's trailing-7-day spend for its
    // customer, where the frame is defined by the ORDER-BY VALUE
    // (epoch seconds), not a row count, so same-day peer rows are all
    // in-frame regardless of their physical order (RANGE frames are
    // tie-stable — the reason this spelling is hash-comparable while a
    // ROWS spelling of the same idea would not be deterministic under
    // ties). One user-keyed exchange; count+sum share the frame so
    // they fuse into a single Window node.
    "q_rolling_range" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("sec"))
        .rangeBetween(-7L * 86400, 0)
      table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          unix_timestamp(col("o_orderdate").cast("timestamp")).as("sec"),
          (col("o_totalprice").cast(DecimalType(12, 2)) * 100)
            .cast("long").as("cents"))
        .select(col("o_orderkey"), col("o_custkey"), col("sec"),
          count(lit(1)).over(w).as("n_7d"),
          sum(col("cents")).over(w).cast("long").as("cents_7d"))
        .orderBy(col("o_orderkey"))
    },

    // First-order Markov transition matrix over per-user event
    // sequences (the sequence-mining primitive behind next-event
    // prediction and funnel discovery): lead() pairs each event with
    // its successor, the pair counts aggregate, and the per-source
    // normalizer comes from a window over the TINY transition table —
    // never a second pass over the log. The probability is an exact
    // integer pair divided once in IEEE double (deterministic on both
    // engines). One user-keyed exchange over the event log, total.
    "q_markov_transitions" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      table(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("ts").cast("timestamp").as("ts"))
        .withColumn("to_type", lead(col("event_type"), 1).over(w))
        .filter(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("from_total",
          sum(col("n")).over(Window.partitionBy(col("from_type")))
            .cast("long"))
        .select(col("from_type"), col("to_type"), col("n"),
          col("from_total"),
          (col("n") / col("from_total")).as("p"))
        .orderBy(col("from_type"), col("to_type"))
    },

    // Exact triangle counting over the co-PURCHASE graph (parts
    // appearing among the first three line items of the same order —
    // the market-basket projection) — the clustering-coefficient /
    // community primitive, on the same graduated edge derivation
    // q_pagerank uses (shared coSupplyEdges, so the hot-group regime
    // guard comes for free). The algorithm is the DEGREE-ORIENTED
    // wedge join: every edge is directed toward its higher-(degree,
    // id) endpoint, so each triangle is generated exactly once from
    // its minimum node and — the 100 TB property — the wedge fan-out
    // per node is bounded by its OUT-degree, which orientation caps at
    // O(sqrt(E)) even for a celebrity hub whose undirected degree is
    // O(N) (an unoriented wedge join explodes quadratically on exactly
    // those hubs). GRAPH CHOICE IS A SCALE DECISION: the supplier
    // projection saturates to a COMPLETE graph on this data (every
    // supplier pair co-occurs), where the triangle COUNT ITSELF is
    // Θ(n³) — 1.24e9 triangles at sf1, 412s, no algorithm fixes an
    // answer that big (measured; NOTES.md). The part projection's node
    // universe grows WITH the data while basket size stays bounded, so
    // density falls and the enumeration stays proportional to real
    // structure. The oracle counts the same triangles with the naive
    // 3-way join — same value, so the gate certifies the oriented
    // plan against the textbook spelling.
    "q_triangles" -> { (s, dir) =>
      val li = table(s, dir, "lineitem")
        .filter(col("l_linenumber") <= 3)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("sk"))
        .distinct()
      orientedTriangles(coSupplyEdges(li, PrStarT)
        .filter(col("src") < col("dst")))
    },

    // Changepoint detection — find the day the level of a daily count
    // series shifts, per event type, with a PLANTED +100% purchase
    // shift from Jan 20 so the detector has a true positive to find
    // (the q_expectations discipline: a detector that never fires
    // proves nothing). The statistic is the CUSUM split distance in
    // its MULTIPLIED-OUT form |n·S_i − i·S_n| — exact BIGINT, no mean,
    // no division, no floats — maximized per type with an explicit
    // (score DESC, day ASC) rank so ties are deterministic on both
    // engines. Shape: one scan into a (type, day) agg (one keyed
    // exchange); everything after runs on the tiny daily table whose
    // per-type partition is bounded by wall-clock days, not rows.
    "q_changepoint" -> { (s, dir) =>
      val shifted = lit("2024-01-20 00:00:00").cast("timestamp")
      val daily = table(s, dir, "events")
        .select(col("event_type"),
          date_trunc("day", col("ts").cast("timestamp")).as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("raw"))
        .withColumn("cnt", col("raw") *
          (lit(1) + when(col("event_type") === "purchase" &&
            col("day") >= shifted, 1).otherwise(0)))
      val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val wAll = Window.partitionBy(col("event_type"))
      val scored = daily
        .withColumn("i", row_number().over(wOrd).cast("long"))
        .withColumn("s_i", sum(col("cnt")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("n", count(lit(1)).over(wAll))
        .withColumn("s_n", sum(col("cnt")).over(wAll))
        .withColumn("score",
          abs(col("n") * col("s_i") - col("i") * col("s_n")))
      scored
        .withColumn("rk", row_number().over(Window
          .partitionBy(col("event_type"))
          .orderBy(col("score").desc, col("day"))))
        .filter(col("rk") === 1)
        .select(col("event_type"),
          date_format(col("day"), "yyyy-MM-dd").as("cp_day"),
          col("score").cast("long").as("max_score"),
          col("n").cast("long").as("n_days"),
          col("s_n").cast("long").as("total_cnt"))
        .orderBy(col("event_type"))
    },

    // A/B experiment analysis — deterministic arm assignment
    // (user_id parity; a hash would differ across engines), per-user
    // conversion (a HIGH-VALUE purchase, >= $150 — "any purchase"
    // saturates at rate 1.0 on this log and a saturated pooled
    // variance is 0, which ANSI mode correctly refuses to divide by),
    // then the two-proportion z-test in one row. Counts are exact;
    // rates/lift/z are IEEE doubles built from correctly-rounded ops
    // (div, sqrt) spelled identically on both engines, so even the
    // test statistic hash-compares; the degenerate p∈{0,1} case is
    // guarded to NULL on both sides. Shape: one scan into a per-user
    // agg (one keyed exchange — parity and conversion collapse
    // map-side), then a 1-row conditional aggregate; nothing after the
    // user reduce scales with the log.
    "q_abtest" -> { (s, dir) =>
      val users = table(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("value"))
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase" &&
          col("value") >= 150.0, 1).otherwise(0)).as("conv"))
        .withColumn("arm", (col("user_id") % 2).cast("int"))
      users.agg(
        count(when(col("arm") === 0, 1)).as("n_a"),
        sum(when(col("arm") === 0, col("conv"))).cast("long").as("conv_a"),
        count(when(col("arm") === 1, 1)).as("n_b"),
        sum(when(col("arm") === 1, col("conv"))).cast("long").as("conv_b"))
        .select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
          (col("conv_a") / col("n_a")).as("rate_a"),
          (col("conv_b") / col("n_b")).as("rate_b"),
          ((col("conv_a") + col("conv_b")) / (col("n_a") + col("n_b")))
            .as("p_pool"))
        .select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
          col("rate_a"), col("rate_b"),
          (col("rate_a") - col("rate_b")).as("lift"),
          when(col("p_pool") > 0 && col("p_pool") < 1,
            (col("rate_a") - col("rate_b")) /
              sqrt(col("p_pool") * (lit(1) - col("p_pool")) *
                (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))))
            .as("z_score"))
    },

    // Training-shard assignment — the write-side primitive of every
    // corpus build: route each document to one of 32 shards by a
    // CONTENT hash (the engine-neutral md5-60bit the dedup family
    // mirrors in SQL; an id-range shard would correlate with crawl
    // order and load-skew downstream readers), then audit the balance
    // each shard's reader will actually see. The balance ratio is an
    // exact integer pair divided once in IEEE double. Shape: one scan
    // into a 32-group agg (partial collapses map-side to 32 rows per
    // task); the global-total window runs on the 32-row result.
    "q_shard_assign" -> { (s, dir) =>
      val nShards = 32
      table(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"),
          (graft.dedup.Dedup.hash60(col("text")) % nShards).as("shard"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("sum_chars"),
          sum(col("doc_id")).cast("long").as("sum_ids"))
        .withColumn("balance",
          col("n_docs") * nShards /
            sum(col("n_docs")).over(Window.partitionBy()))
        .orderBy(col("shard"))
    },

    // Compaction planning — the table-maintenance primitive behind
    // OPTIMIZE/rewrite-small-files: model each (day, priority) slice of
    // orders as a data file, then bin consecutive files into
    // target-sized output groups per month with a cumulative-size
    // assignment (bin = prefix-bytes DIV target — the streaming
    // grouping real compactors use because it preserves sort order;
    // first-fit-decreasing would not). The target is DERIVED from the
    // manifest (8× the average file size, exact integer division) —
    // a fixed byte literal degenerates to one-file bins at whatever SF
    // first makes files outgrow it, the oracle-literal hazard the
    // verify recipe warns about, caught here by exactly that probe.
    // Shape: one keyed agg builds the file manifest, a 1-row aggregate
    // broadcasts the target back (the bm25 two-pass stats shape), the
    // prefix sum windows WITHIN month (partitions bounded by
    // days×priorities, never by row count), and the final
    // per-(month, bin) rollup rides the month partitioning via the
    // subset rule — one manifest-sized exchange after the scan, total.
    "q_compaction_bins" -> { (s, dir) =>
      val files = table(s, dir, "orders")
        .select(date_trunc("month", col("o_orderdate")).as("month"),
          date_trunc("day", col("o_orderdate")).as("day"),
          col("o_orderpriority").as("prio"),
          (col("o_totalprice").cast(DecimalType(12, 2)) * 100)
            .cast("long").as("cents"))
        .groupBy(col("month"), col("day"), col("prio"))
        .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("bytes"))
        // the manifest feeds both the target aggregate and the binning
        // pass — materialize it once (days×priorities rows) or the
        // target's 1-row agg re-scans the full orders table
        .localCheckpoint()
      val target = files.agg(
        expr("(sum(bytes) div count(1)) * 8L").as("target"))
      val w = Window.partitionBy(col("month"))
        .orderBy(col("day"), col("prio"))
        .rowsBetween(Window.unboundedPreceding, -1)
      files.crossJoin(broadcast(target))
        .withColumn("cum_before",
          coalesce(sum(col("bytes")).over(w), lit(0L)))
        .withColumn("bin", expr("cum_before div target"))
        .groupBy(col("month"), col("bin"))
        .agg(count(lit(1)).as("n_files"),
          sum(col("bytes")).cast("long").as("bytes"),
          sum(col("n_rows")).cast("long").as("n_rows"),
          date_format(min(col("day")), "yyyy-MM-dd").as("first_day"),
          date_format(max(col("day")), "yyyy-MM-dd").as("last_day"))
        .select(date_format(col("month"), "yyyy-MM").as("month"),
          col("bin").cast("long").as("bin"), col("n_files"),
          col("bytes"), col("n_rows"), col("first_day"), col("last_day"))
        .orderBy(col("month"), col("bin"))
    },

    // RFM segmentation — the classic customer-value model: per
    // customer, Recency (days since last order at the corpus horizon),
    // Frequency (orders) and Monetary (exact cents), each scored 1-4
    // by NTILE quartile. NTILE over ties is ORDER-dependent, so every
    // quartile ordering carries the customer key as an explicit
    // tiebreak — the same determinism rule as q_window_dist; without
    // it the gate would go red on the first tied frequency. Output is
    // the segment-level rollup (64 possible cells), not per-customer
    // rows. Shape: one scan into a per-customer agg (one keyed
    // exchange); the quartiles then come from three shardedPrefix
    // passes over the customers-sized aggregate — customers grow
    // LINEARLY with the corpus (TPC-H: SF×150k), so a global
    // `ntile(4).over(Window.orderBy(...))` would be a single-task sort
    // of billions of rows at 100 TB. Each pass computes a distributed
    // global rank (range-shard → local row_number → shard-offset
    // prefix over the shards-sized aggregate), and ntileOfRank turns
    // rank + n into the identical NTILE bucket map-side. The DuckDB
    // mirror keeps the plain NTILE windows — same semantics, different
    // plan — so the gate pins the rank math end to end.
    "q_rfm" -> { (s, dir) =>
      val horizon = lit("2002-01-01 00:00:00").cast("timestamp")
      val per = table(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(datediff(horizon, max(col("o_orderdate"))).as("recency"),
          count(lit(1)).as("frequency"),
          sum((col("o_totalprice").cast(DecimalType(12, 2)) * 100)
            .cast("long")).as("cents"))
      val p1 = shardedPrefix(per,
        Seq(col("recency"), col("o_custkey")), "__rk_r", nOut = Some("__n"))
      val p2 = shardedPrefix(p1,
        Seq(col("frequency"), col("o_custkey")), "__rk_f")
      val p3 = shardedPrefix(p2,
        Seq(col("cents"), col("o_custkey")), "__rk_m")
      p3
        .withColumn("r_score", ntileOfRank("__rk_r", "__n", 4))
        .withColumn("f_score", ntileOfRank("__rk_f", "__n", 4))
        .withColumn("m_score", ntileOfRank("__rk_m", "__n", 4))
        .groupBy(col("r_score"), col("f_score"), col("m_score"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("cents")).cast("long").as("cents"),
          sum(col("o_custkey")).cast("long").as("sum_custkeys"))
        .orderBy(col("r_score"), col("f_score"), col("m_score"))
    },

    // Pareto / ABC classification — "which parts carry 80% of the
    // revenue": parts ranked by exact revenue cents, running share
    // classified A (first 60% of cumulative revenue), B (next 25%),
    // C (tail). The share thresholds compare MULTIPLIED-OUT integers
    // (100·cum ≤ 60·total) — no percentage is ever computed in float,
    // so the class boundaries are exact on both engines; the products
    // go through DECIMAL(38,0) because total lineitem cents scales
    // with SF (~2.3e13 at sf1) and the ×100 product would leave BIGINT
    // around sf~4000 — DuckDB's SUM is already HUGEINT, so the decimal
    // bridge only touches the comparison, never an output column (the
    // lossy-float64 pandas trap). Shape: one scan into a per-part agg
    // (one keyed exchange); the revenue-ordered cumsum is a
    // shardedPrefix pass — parts grow linearly with the corpus (TPC-H:
    // SF×200k), so the previous single ordered window over the whole
    // dimension was a one-task sort at 100 TB; now each range shard
    // cumulates locally and only the shards-sized offset table sees an
    // unpartitioned window. Output is the 3-row class rollup.
    "q_pareto_abc" -> { (s, dir) =>
      val per = table(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(sum((col("l_extendedprice").cast(DecimalType(12, 2)) * 100)
          .cast("long")).as("cents"))
      val ranked = shardedPrefix(per,
        Seq(col("cents").desc, col("l_partkey")), "__rk",
        sums = Seq((col("cents"), "cum")), totals = true)
      val d38 = DecimalType(38, 0)
      ranked
        .withColumn("cls",
          when(col("cum").cast(d38) * 100 <=
              col("cum_total").cast(d38) * 60, "A")
            .when(col("cum").cast(d38) * 100 <=
              col("cum_total").cast(d38) * 85, "B")
            .otherwise("C"))
        .groupBy(col("cls"))
        .agg(count(lit(1)).as("n_parts"),
          sum(col("cents")).cast("long").as("cents"),
          min(col("cents")).cast("long").as("min_part_cents"),
          max(col("cents")).cast("long").as("max_part_cents"))
        .orderBy(col("cls"))
    },

    // Benford first-digit audit — the fraud/fabrication screen run on
    // financial columns: the distribution of leading digits of
    // o_totalprice vs Benford's law, with the chi-square statistic in
    // exact integer micro-units: expected counts are log10(1+1/d)
    // quantized driver-side to parts-per-million ONCE (both engines
    // receive the same nine integer constants — no engine evaluates a
    // log), and each digit's χ² term is pinned by its exact RATIONAL
    // pieces: the signed deviation dev = 1e6·obs − n·exp_ppm and the
    // scaled expectation n·exp_ppm, both BIGINT at any SF (χ² itself
    // is dev²/(1e6·n·exp_ppm), derivable — but the SQUARE overflows
    // BIGINT past ~sf0.1 and DECIMAL(38,0) round-trips as lossy
    // float64 through DuckDB's pandas bridge, both measured; the
    // un-squared pieces carry identical information exactly). First
    // digit comes from the EXACT cents value as a string — float
    // formatting differs across engines; integer digits don't. One
    // scan, one 9-group aggregate.
    "q_benford" -> { (s, dir) =>
      // log10(1+1/d) in ppm, d=1..9 — driver-side constants, same on
      // both sides (the LM micro-nat discipline)
      val expPpm = (1 to 9).map(d => math.round(
        math.log10(1.0 + 1.0 / d) * 1000000).toInt)
      val expMap = map((1 to 9).flatMap(d =>
        Seq(lit(d), lit(expPpm(d - 1)))): _*)
      val digits = table(s, dir, "orders")
        .select(substring((col("o_totalprice")
          .cast(DecimalType(12, 2)) * 100).cast("long").cast("string"),
          1, 1).cast("int").as("digit"))
        .groupBy(col("digit"))
        .agg(count(lit(1)).as("obs"))
      digits
        .withColumn("n", sum(col("obs")).over(Window.partitionBy()))
        .withColumn("exp_ppm", expMap(col("digit")))
        .select(col("digit"), col("obs"),
          col("exp_ppm").cast("long").as("exp_ppm"),
          expr("1000000L * obs - n * exp_ppm").cast("long")
            .as("dev_x1e6"),
          expr("n * exp_ppm").cast("long").as("exp_n"))
        .orderBy(col("digit"))
    }
  )

  val oracles2: Map[String, String] = checked(
    // One expected row tripled: the round trip must preserve the text
    // byte-for-byte in every format, so all three rows carry the
    // fingerprint computed from the parquet SOURCE.
    "q_format_interop" ->
      """WITH p AS (
        |  SELECT CASE WHEN doc_id % 3 = 0
        |    THEN text || ' x,"y"' || chr(10) || 'z' ELSE text END AS t
        |  FROM documents),
        |a AS (
        |  SELECT COUNT(*) AS n_docs,
        |    SUM(CAST(length(t) AS BIGINT)) AS sc,
        |    SUM(CAST('0x' || substr(md5(t), 1, 15) AS BIGINT) % 1000000007)
        |      % 1000000007 AS fp
        |  FROM p)
        |SELECT f AS format, CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(sc AS BIGINT) AS sum_chars, CAST(fp AS BIGINT) AS fp
        |FROM a, (VALUES ('orc'), ('csv'), ('json')) v(f)
        |ORDER BY format""".stripMargin,
    // Exact stats only (the HLL's value is engine-specific; its
    // contract boolean is asserted Spark-side and mirrored as TRUE).
    "q_profile_numeric" -> {
      def leg(c: String) =
        s"""SELECT '$c' AS col_name, COUNT($c) AS n,
           |  COUNT(*) - COUNT($c) AS n_null,
           |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS ndv,
           |  CAST(MIN($c) AS DOUBLE) AS min_v,
           |  CAST(MAX($c) AS DOUBLE) AS max_v,
           |  CAST(SUM(CAST($c AS DECIMAL(38,4))) AS DOUBLE) AS sum_v,
           |  TRUE AS ndv_in_band
           |FROM lineitem""".stripMargin
      s"""SELECT * FROM (
         |${leg("l_quantity")}
         |UNION ALL
         |${leg("l_extendedprice")}
         |UNION ALL
         |${leg("l_discount")})
         |ORDER BY col_name""".stripMargin
    },
    "q_histogram" ->
      """WITH c AS (
        |  SELECT CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
        |    AS cents FROM lineitem),
        |mm AS (SELECT MIN(cents) AS lo, MAX(cents) AS hi FROM c)
        |SELECT CAST(least(9, (cents - lo) * 10 // (hi - lo + 1)) AS INT)
        |    AS bucket,
        |  COUNT(*) AS cnt, MIN(cents) AS min_cents, MAX(cents) AS max_cents
        |FROM c, mm
        |GROUP BY 1 ORDER BY bucket""".stripMargin,
    // The Bloom pre-filter only prunes; the exact semi-join removes
    // false positives, so plain semi-join SQL is the exact oracle.
    "q_bloom_semijoin" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN
        |  (SELECT o_custkey FROM orders WHERE o_totalprice > 490000)
        |ORDER BY c_custkey""".stripMargin,
    // Sketch-contract oracle: exact probe-key counts + literal TRUE for
    // the CMS guarantee booleans the Spark side computes vs its sketch.
    "q_sketch_freq" ->
      """WITH ks AS (SELECT CAST(range AS BIGINT) AS l_partkey
        |            FROM range(1, 21)),
        |ex AS (SELECT l_partkey, COUNT(*) AS c FROM lineitem
        |       WHERE l_partkey BETWEEN 1 AND 20 GROUP BY l_partkey)
        |SELECT ks.l_partkey, COALESCE(ex.c, 0) AS exact_count,
        |  TRUE AS cms_no_undercount, TRUE AS cms_within_eps
        |FROM ks LEFT JOIN ex USING (l_partkey)
        |ORDER BY l_partkey""".stripMargin,
    "q_join_full" ->
      """SELECT o_custkey, n95, n96 FROM
        |  (SELECT o_custkey, COUNT(*) AS n95 FROM orders
        |   WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |     AND o_orderdate < TIMESTAMP '1996-01-01' GROUP BY o_custkey) a
        |FULL JOIN
        |  (SELECT o_custkey, COUNT(*) AS n96 FROM orders
        |   WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |     AND o_orderdate < TIMESTAMP '1997-01-01' GROUP BY o_custkey) b
        |USING (o_custkey)
        |ORDER BY o_custkey""".stripMargin,
    "q_join_range" ->
      """SELECT band, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |JOIN (VALUES ('A_low', 0.0, 150000.0), ('B_mid', 150000.0, 300000.0),
        |             ('C_high', 300000.0, 1e18)) bands(band, lo, hi)
        |  ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY band ORDER BY band""".stripMargin,
    "q_join_right" ->
      """SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_pending
        |FROM (SELECT * FROM orders WHERE o_orderstatus = 'P') o
        |RIGHT JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY c_custkey""".stripMargin,
    "q_intersect_all" ->
      """SELECT o_custkey FROM orders
        | WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |   AND o_orderdate < TIMESTAMP '1996-01-01'
        |INTERSECT ALL
        |SELECT o_custkey FROM orders
        | WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |   AND o_orderdate < TIMESTAMP '1997-01-01'
        |ORDER BY o_custkey""".stripMargin,
    "q_cube" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(rank() OVER w AS INT) AS rnk,
        |  CAST(dense_rank() OVER w AS INT) AS drnk,
        |  CAST(ntile(4) OVER w AS INT) AS nt,
        |  lead(o_orderkey, 1) OVER w AS next_key,
        |  first_value(o_orderkey) OVER
        |    (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS top_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_custkey, rnk""".stripMargin,
    "q_set_ops_all" ->
      """SELECT o_custkey FROM orders
        | WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |   AND o_orderdate < TIMESTAMP '1996-01-01'
        |EXCEPT ALL
        |SELECT o_custkey FROM orders
        | WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |   AND o_orderdate < TIMESTAMP '1997-01-01'
        |ORDER BY o_custkey""".stripMargin,
    "q_array_funcs" ->
      """SELECT l_orderkey,
        |  array_to_string(line_numbers, ',') AS line_numbers_csv,
        |  CAST(len(line_numbers) AS INT) AS n_lines,
        |  line_numbers[1] AS first_line,
        |  list_contains(line_numbers, 3) AS has_line3
        |FROM (SELECT l_orderkey,
        |        list_sort(list(l_linenumber)) AS line_numbers
        |      FROM lineitem WHERE l_orderkey < 2000
        |      GROUP BY l_orderkey)
        |ORDER BY l_orderkey""".stripMargin,
    "q_tpch_q3" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |    AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND l_shipdate > TIMESTAMP '1997-01-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q_skyline" ->
      """SELECT o_orderkey, o_totalprice, o_orderdate FROM (
        |  SELECT o_orderkey, o_totalprice, o_orderdate,
        |    max(o_orderdate) OVER (
        |      ORDER BY o_totalprice, o_orderdate DESC, o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_prev
        |  FROM orders)
        |WHERE best_prev IS NULL OR o_orderdate > best_prev
        |ORDER BY o_totalprice""".stripMargin,
    "q_sessionize" ->
      """SELECT user_id, sess_id, COUNT(*) AS n_events,
        |  MIN(t) AS sess_start, MAX(t) AS sess_end
        |FROM (
        |  SELECT user_id, t,
        |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS sess_id
        |  FROM (
        |    SELECT user_id, t,
        |      CASE WHEN prev_t IS NULL
        |             OR epoch_us(t) - epoch_us(prev_t) > 1800000000 THEN 1 ELSE 0 END
        |        AS new_sess
        |    FROM (
        |      SELECT user_id, CAST(ts AS TIMESTAMP) AS t,
        |        lag(CAST(ts AS TIMESTAMP), 1) OVER
        |          (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)) AS prev_t
        |      FROM events)))
        |GROUP BY user_id, sess_id
        |ORDER BY user_id, sess_id""".stripMargin,
    "q_salted_agg" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_pagerank" -> {
      // unrolled integer-PR step: rank table rt -> the next one
      def step(rt: String): String =
        s"""SELECT e.dst AS u,
           |    150000 + sum((r.r * 850000) // (1000000 * d.deg)) AS r
           |  FROM $rt r
           |  JOIN deg d ON d.u = r.u
           |  JOIN edges e ON e.src = r.u
           |  GROUP BY e.dst""".stripMargin
      // The multiply-referenced CTEs are MATERIALIZED: DuckDB inlines
      // plain CTEs per reference, and with edges referenced by deg +
      // all three unrolled iterations (each inlining the pair join and
      // its distinct), the evaluated tree grew combinatorially — at
      // sf2 the un-materialized form spilled past 75 GB of temp and
      // died. Materialization is a pure oracle-side evaluation hint;
      // values are unchanged.
      s"""WITH li AS MATERIALIZED (
         |  SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM lineitem),
         |grp AS MATERIALIZED (
         |  SELECT ok, count(*) AS m, min(sk) AS pivot FROM li GROUP BY ok),
         |pairs AS (
         |  SELECT a.sk AS src, b.sk AS dst
         |  FROM li a JOIN grp g ON g.ok = a.ok AND g.m <= $PrStarT
         |  JOIN li b ON a.ok = b.ok AND a.sk <> b.sk
         |  UNION ALL
         |  SELECT li.sk, g.pivot FROM li
         |  JOIN grp g ON g.ok = li.ok AND g.m > $PrStarT
         |  WHERE li.sk <> g.pivot
         |  UNION ALL
         |  SELECT g.pivot, li.sk FROM li
         |  JOIN grp g ON g.ok = li.ok AND g.m > $PrStarT
         |  WHERE li.sk <> g.pivot),
         |edges AS MATERIALIZED (SELECT DISTINCT src, dst FROM pairs),
         |deg AS MATERIALIZED (
         |  SELECT src AS u, count(*) AS deg FROM edges GROUP BY 1),
         |r0 AS (SELECT u, CAST(1000000 AS BIGINT) AS r FROM deg),
         |r1 AS (${step("r0")}),
         |r2 AS (${step("r1")}),
         |r3 AS (${step("r2")})
         |SELECT d.u AS suppkey, CAST(d.deg AS INT) AS outdeg,
         |  CAST(r3.r AS BIGINT) AS rank_micro
         |FROM deg d JOIN r3 ON r3.u = d.u
         |ORDER BY suppkey""".stripMargin
    },

    "q_profile" ->
      """SELECT col_name, n_nonnull, n_distinct, min_s, max_s FROM (
        |  SELECT 'c_custkey' AS col_name, COUNT(c_custkey) AS n_nonnull,
        |         COUNT(DISTINCT c_custkey) AS n_distinct,
        |         CAST(MIN(c_custkey) AS VARCHAR) AS min_s,
        |         CAST(MAX(c_custkey) AS VARCHAR) AS max_s
        |  FROM customer
        |  UNION ALL
        |  SELECT 'c_name', COUNT(c_name), COUNT(DISTINCT c_name),
        |         MIN(c_name), MAX(c_name) FROM customer
        |  UNION ALL
        |  SELECT 'c_mktsegment', COUNT(c_mktsegment),
        |         COUNT(DISTINCT c_mktsegment),
        |         MIN(c_mktsegment), MAX(c_mktsegment) FROM customer)
        |ORDER BY col_name""".stripMargin,
    "q_stats_agg" ->
      """WITH g AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))
        |        * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |        * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))
        |        * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 9) AS mean_qty,
        |  round((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)), 9) AS var_qty,
        |  round(sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))), 9) AS sd_qty,
        |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 9) AS corr_qp
        |FROM g ORDER BY l_returnflag""".stripMargin,
    "q_window_dist" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd,
        |  COALESCE(nth_value(c_custkey, 2) OVER w, -1) AS second_key
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_funnel" ->
      """WITH v AS (SELECT user_id, MIN(ts) AS tv FROM events
        |           WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, MIN(e.ts) AS tc FROM events e
        |      JOIN v USING (user_id)
        |      WHERE e.event_type = 'click' AND e.ts > v.tv
        |      GROUP BY e.user_id),
        |p AS (SELECT e.user_id, MIN(e.ts) AS tp FROM events e
        |      JOIN c USING (user_id)
        |      WHERE e.event_type = 'purchase' AND e.ts > c.tc
        |      GROUP BY e.user_id)
        |SELECT (SELECT COUNT(*) FROM v) AS n_view,
        |       (SELECT COUNT(*) FROM c) AS n_click,
        |       (SELECT COUNT(*) FROM p) AS n_purchase,
        |       CAST((SELECT COUNT(*) FROM c) AS DOUBLE)
        |         / (SELECT COUNT(*) FROM v) AS r_click,
        |       CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
        |         / (SELECT COUNT(*) FROM c) AS r_purchase""".stripMargin,
    "q_dpp" ->
      """SELECT label, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem
        |JOIN (VALUES ('R', 'returned'), ('A', 'accepted'), ('N', 'none'))
        |  AS d(flag, label) ON l_returnflag = flag
        |WHERE label = 'returned'
        |GROUP BY label ORDER BY label""".stripMargin,
    "q_skew_join" ->
      """SELECT s_nationkey, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "q_grouping_sets" ->
      """SELECT c_mktsegment, c_nationkey, COUNT(*) AS n_cust,
        |  CAST(GROUPING(c_mktsegment, c_nationkey) AS BIGINT) AS gid
        |FROM customer
        |GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        |ORDER BY gid, c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST""".stripMargin,
    "q_typed_ds" ->
      """SELECT o_orderkey, o_custkey, o_totalprice * 0.9 AS discounted
        |FROM orders WHERE o_totalprice > 400000.0
        |ORDER BY o_orderkey""".stripMargin,
    // Sketch-contract oracle: exact distinct counts + literal TRUE for
    // the HLL error-band boolean the Spark side computes vs its sketch.
    "q_approx_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts,
        |  COUNT(*) AS n_rows, TRUE AS hll_in_band
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    // Per FK edge: child totals from the keyed aggregate, orphans via
    // NOT EXISTS child→parent, childless via NOT EXISTS parent→child.
    // COUNT(*) GROUP BY mirrors the Spark keyed aggregate (NULL keys,
    // if any existed, group and stay orphaned on both engines).
    "q_integrity" ->
      """WITH
        |k1 AS (SELECT c_nationkey AS k, COUNT(*) AS r FROM customer GROUP BY 1),
        |k2 AS (SELECT l_orderkey AS k, COUNT(*) AS r FROM lineitem GROUP BY 1),
        |k3 AS (SELECT l_partkey AS k, COUNT(*) AS r FROM lineitem GROUP BY 1),
        |k4 AS (SELECT l_suppkey AS k, COUNT(*) AS r FROM lineitem GROUP BY 1),
        |k5 AS (SELECT n_regionkey AS k, COUNT(*) AS r FROM nation GROUP BY 1),
        |k6 AS (SELECT o_custkey AS k, COUNT(*) AS r FROM orders GROUP BY 1),
        |k7 AS (SELECT s_nationkey AS k, COUNT(*) AS r FROM supplier GROUP BY 1)
        |SELECT 'customer.c_nationkey->nation' AS edge,
        |  CAST((SELECT SUM(r) FROM k1) AS BIGINT) AS n_child_rows,
        |  (SELECT COUNT(*) FROM k1) AS n_child_keys,
        |  (SELECT COUNT(*) FROM k1 WHERE NOT EXISTS
        |     (SELECT 1 FROM nation WHERE n_nationkey = k1.k)) AS orphan_keys,
        |  CAST(COALESCE((SELECT SUM(r) FROM k1 WHERE NOT EXISTS
        |     (SELECT 1 FROM nation WHERE n_nationkey = k1.k)), 0) AS BIGINT)
        |    AS orphan_rows,
        |  (SELECT COUNT(*) FROM nation WHERE NOT EXISTS
        |     (SELECT 1 FROM k1 WHERE k1.k = n_nationkey)) AS childless_parents
        |UNION ALL SELECT 'lineitem.l_orderkey->orders',
        |  CAST((SELECT SUM(r) FROM k2) AS BIGINT),
        |  (SELECT COUNT(*) FROM k2),
        |  (SELECT COUNT(*) FROM k2 WHERE NOT EXISTS
        |     (SELECT 1 FROM orders WHERE o_orderkey = k2.k)),
        |  CAST(COALESCE((SELECT SUM(r) FROM k2 WHERE NOT EXISTS
        |     (SELECT 1 FROM orders WHERE o_orderkey = k2.k)), 0) AS BIGINT),
        |  (SELECT COUNT(*) FROM orders WHERE NOT EXISTS
        |     (SELECT 1 FROM k2 WHERE k2.k = o_orderkey))
        |UNION ALL SELECT 'lineitem.l_partkey->part',
        |  CAST((SELECT SUM(r) FROM k3) AS BIGINT),
        |  (SELECT COUNT(*) FROM k3),
        |  (SELECT COUNT(*) FROM k3 WHERE NOT EXISTS
        |     (SELECT 1 FROM part WHERE p_partkey = k3.k)),
        |  CAST(COALESCE((SELECT SUM(r) FROM k3 WHERE NOT EXISTS
        |     (SELECT 1 FROM part WHERE p_partkey = k3.k)), 0) AS BIGINT),
        |  (SELECT COUNT(*) FROM part WHERE NOT EXISTS
        |     (SELECT 1 FROM k3 WHERE k3.k = p_partkey))
        |UNION ALL SELECT 'lineitem.l_suppkey->supplier',
        |  CAST((SELECT SUM(r) FROM k4) AS BIGINT),
        |  (SELECT COUNT(*) FROM k4),
        |  (SELECT COUNT(*) FROM k4 WHERE NOT EXISTS
        |     (SELECT 1 FROM supplier WHERE s_suppkey = k4.k)),
        |  CAST(COALESCE((SELECT SUM(r) FROM k4 WHERE NOT EXISTS
        |     (SELECT 1 FROM supplier WHERE s_suppkey = k4.k)), 0) AS BIGINT),
        |  (SELECT COUNT(*) FROM supplier WHERE NOT EXISTS
        |     (SELECT 1 FROM k4 WHERE k4.k = s_suppkey))
        |UNION ALL SELECT 'nation.n_regionkey->region',
        |  CAST((SELECT SUM(r) FROM k5) AS BIGINT),
        |  (SELECT COUNT(*) FROM k5),
        |  (SELECT COUNT(*) FROM k5 WHERE NOT EXISTS
        |     (SELECT 1 FROM region WHERE r_regionkey = k5.k)),
        |  CAST(COALESCE((SELECT SUM(r) FROM k5 WHERE NOT EXISTS
        |     (SELECT 1 FROM region WHERE r_regionkey = k5.k)), 0) AS BIGINT),
        |  (SELECT COUNT(*) FROM region WHERE NOT EXISTS
        |     (SELECT 1 FROM k5 WHERE k5.k = r_regionkey))
        |UNION ALL SELECT 'orders.o_custkey->customer',
        |  CAST((SELECT SUM(r) FROM k6) AS BIGINT),
        |  (SELECT COUNT(*) FROM k6),
        |  (SELECT COUNT(*) FROM k6 WHERE NOT EXISTS
        |     (SELECT 1 FROM customer WHERE c_custkey = k6.k)),
        |  CAST(COALESCE((SELECT SUM(r) FROM k6 WHERE NOT EXISTS
        |     (SELECT 1 FROM customer WHERE c_custkey = k6.k)), 0) AS BIGINT),
        |  (SELECT COUNT(*) FROM customer WHERE NOT EXISTS
        |     (SELECT 1 FROM k6 WHERE k6.k = c_custkey))
        |UNION ALL SELECT 'supplier.s_nationkey->nation',
        |  CAST((SELECT SUM(r) FROM k7) AS BIGINT),
        |  (SELECT COUNT(*) FROM k7),
        |  (SELECT COUNT(*) FROM k7 WHERE NOT EXISTS
        |     (SELECT 1 FROM nation WHERE n_nationkey = k7.k)),
        |  CAST(COALESCE((SELECT SUM(r) FROM k7 WHERE NOT EXISTS
        |     (SELECT 1 FROM nation WHERE n_nationkey = k7.k)), 0) AS BIGINT),
        |  (SELECT COUNT(*) FROM nation WHERE NOT EXISTS
        |     (SELECT 1 FROM k7 WHERE k7.k = n_nationkey))
        |ORDER BY edge""".stripMargin,
    // The oracle constructs the SAME derived snapshot (delete k%97=0,
    // reprice k%89=3 by +100 cents, re-insert k%101=5 under -(k+1))
    // and classifies through the same 60-bit md5 fingerprint over
    // (custkey, status, exact cents) — hash60's mod-P mirror, so even
    // a collision (fp-equal, attrs differ) classifies identically.
    "q_delta_detect" ->
      """WITH src AS (
        |  SELECT o_orderkey AS k, o_custkey, o_orderstatus,
        |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        |  FROM orders),
        |a AS (
        |  SELECT k, CAST('0x' || substr(md5(o_custkey || '|' ||
        |    o_orderstatus || '|' || cents), 1, 15) AS BIGINT)
        |    % 1000000007 AS fp_a FROM src),
        |b AS (
        |  SELECT k, CAST('0x' || substr(md5(o_custkey || '|' ||
        |      o_orderstatus || '|' ||
        |      (CASE WHEN k % 89 = 3 THEN cents + 100 ELSE cents END)),
        |      1, 15) AS BIGINT) % 1000000007 AS fp_b
        |  FROM src WHERE k % 97 <> 0
        |  UNION ALL
        |  SELECT -k - 1, CAST('0x' || substr(md5(o_custkey || '|' ||
        |      o_orderstatus || '|' || cents), 1, 15) AS BIGINT)
        |    % 1000000007
        |  FROM src WHERE k % 101 = 5)
        |SELECT CASE WHEN fp_b IS NULL THEN 'removed'
        |  WHEN fp_a IS NULL THEN 'added'
        |  WHEN fp_a <> fp_b THEN 'changed'
        |  ELSE 'unchanged' END AS change_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(COALESCE(a.k, b.k)) AS BIGINT) AS sum_keys
        |FROM a FULL OUTER JOIN b ON a.k = b.k
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // Same lead()-interval SCD2 build; DuckDB's window semantics match
    // Spark's for LEAD over a fully-specified ORDER BY.
    "q_scd2" ->
      """WITH h AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
        |    LEAD(CAST(ts AS TIMESTAMP)) OVER
        |      (PARTITION BY user_id
        |       ORDER BY CAST(ts AS TIMESTAMP), event_id) AS valid_to
        |  FROM events),
        |s AS (
        |  SELECT * FROM h
        |  WHERE ts <= TIMESTAMP '2024-01-15 00:00:00'
        |    AND (valid_to IS NULL
        |         OR valid_to > TIMESTAMP '2024-01-15 00:00:00')),
        |hv AS (SELECT event_type, COUNT(*) AS n_versions
        |       FROM h GROUP BY 1),
        |sv AS (SELECT event_type, COUNT(*) AS n_users_asof,
        |         CAST(SUM(user_id) AS BIGINT) AS sum_users_asof
        |       FROM s GROUP BY 1)
        |SELECT hv.event_type, hv.n_versions,
        |  COALESCE(sv.n_users_asof, 0) AS n_users_asof,
        |  COALESCE(sv.sum_users_asof, 0) AS sum_users_asof
        |FROM hv LEFT JOIN sv ON hv.event_type = sv.event_type
        |ORDER BY hv.event_type""".stripMargin,
    // Same week-truncated cohort assignment (both engines' date_trunc
    // 'week' is Monday-start); the retained fraction is an exact
    // integer pair divided in IEEE double, identical on both.
    "q_retention_cohort" ->
      """WITH e AS (
        |  SELECT user_id, date_trunc('week', CAST(ts AS TIMESTAMP)) AS wk
        |  FROM events),
        |c AS (
        |  SELECT user_id, wk,
        |    MIN(wk) OVER (PARTITION BY user_id) AS cohort FROM e),
        |u AS (
        |  SELECT DISTINCT strftime(cohort, '%Y-%m-%d') AS cohort_week,
        |    CAST((CAST(wk AS DATE) - CAST(cohort AS DATE)) // 7 AS INT)
        |      AS week_offset,
        |    user_id FROM c),
        |a AS (
        |  SELECT cohort_week, week_offset, COUNT(*) AS n_users,
        |    CAST(SUM(user_id) AS BIGINT) AS sum_users
        |  FROM u GROUP BY 1, 2)
        |SELECT cohort_week, week_offset, n_users, sum_users,
        |  n_users / CAST(MAX(CASE WHEN week_offset = 0 THEN n_users END)
        |    OVER (PARTITION BY cohort_week) AS DOUBLE) AS retained_frac
        |FROM a
        |ORDER BY cohort_week, week_offset""".stripMargin,
    // Same spine/fill/window construction; the interpolation stays an
    // exact integer rational so no engine ever divides.
    "q_gapfill" ->
      """WITH e AS (
        |  SELECT event_type,
        |    CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP)))
        |      AS BIGINT) // 3600 AS pos,
        |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |h AS (SELECT event_type, pos, COUNT(*) AS n, SUM(cents) AS cents
        |      FROM e GROUP BY 1, 2),
        |b AS (SELECT MIN(pos) AS lo, MAX(pos) AS hi FROM e),
        |sp AS (SELECT t.event_type,
        |         unnest(generate_series(b.lo, b.hi)) AS pos
        |       FROM (SELECT DISTINCT event_type FROM e) t, b),
        |f AS (SELECT sp.event_type, sp.pos, h.n, h.cents
        |      FROM sp LEFT JOIN h USING (event_type, pos)),
        |x AS (SELECT event_type, pos, COALESCE(n, 0) AS n_filled, cents,
        |    last_value(cents IGNORE NULLS) OVER wp AS locf_cents,
        |    last_value(CASE WHEN cents IS NOT NULL THEN pos END
        |      IGNORE NULLS) OVER wp AS prev_pos,
        |    first_value(cents IGNORE NULLS) OVER wn AS next_cents,
        |    first_value(CASE WHEN cents IS NOT NULL THEN pos END
        |      IGNORE NULLS) OVER wn AS next_pos
        |  FROM f
        |  WINDOW wp AS (PARTITION BY event_type ORDER BY pos
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  wn AS (PARTITION BY event_type ORDER BY pos
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_type, CAST(pos AS BIGINT) AS pos,
        |  CAST(n_filled AS BIGINT) AS n_filled,
        |  CAST(locf_cents AS BIGINT) AS locf_cents,
        |  CAST(CASE WHEN cents IS NOT NULL THEN cents
        |    ELSE locf_cents * (next_pos - pos) +
        |         next_cents * (pos - prev_pos) END AS BIGINT) AS interp_num,
        |  CAST(CASE WHEN cents IS NOT NULL THEN 1
        |    ELSE next_pos - prev_pos END AS BIGINT) AS interp_den
        |FROM x ORDER BY event_type, pos""".stripMargin,
    // Same deterministic dirty-snapshot derivation, same six rules.
    "q_expectations" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k,
        |    CASE WHEN o_orderkey % 113 = 0 THEN NULL
        |         ELSE o_custkey END AS ck,
        |    CASE WHEN o_orderkey % 127 = 1 THEN -o_totalprice
        |         ELSE o_totalprice END AS tp,
        |    CASE WHEN o_orderkey % 131 = 2 THEN 'X'
        |         ELSE o_orderstatus END AS st,
        |    o_orderpriority AS pr, o_orderdate AS dt
        |  FROM orders),
        |d AS (SELECT * FROM base
        |      UNION ALL SELECT * FROM base WHERE k % 139 = 3),
        |m AS (SELECT COUNT(*) AS n_rows,
        |    COUNT(CASE WHEN ck IS NULL THEN 1 END) AS v1,
        |    COUNT(CASE WHEN tp <= 0 THEN 1 END) AS v2,
        |    COUNT(CASE WHEN st NOT IN ('O','F','P') THEN 1 END) AS v3,
        |    COUNT(CASE WHEN NOT regexp_matches(pr, '^[1-5]-[A-Z ]+$')
        |      THEN 1 END) AS v4,
        |    COUNT(CASE WHEN dt < TIMESTAMP '1990-01-01'
        |      OR dt >= TIMESTAMP '2005-01-01' THEN 1 END) AS v5
        |  FROM d),
        |u AS (SELECT CAST(SUM(c) AS BIGINT) AS n_rows,
        |    CAST(COALESCE(SUM(CASE WHEN c > 1 THEN c END), 0) AS BIGINT)
        |      AS nv
        |  FROM (SELECT COUNT(*) AS c FROM d GROUP BY k)),
        |r AS (
        |  SELECT 'bounds_orderdate' AS rule, n_rows, v5 AS nv FROM m
        |  UNION ALL SELECT 'completeness_custkey', n_rows, v1 FROM m
        |  UNION ALL SELECT 'domain_orderstatus', n_rows, v3 FROM m
        |  UNION ALL SELECT 'pattern_orderpriority', n_rows, v4 FROM m
        |  UNION ALL SELECT 'range_totalprice_positive', n_rows, v2 FROM m
        |  UNION ALL SELECT 'unique_orderkey', n_rows, nv FROM u)
        |SELECT rule, CAST(n_rows AS BIGINT) AS n_rows,
        |  CAST(nv AS BIGINT) AS n_violations, nv = 0 AS pass
        |FROM r ORDER BY rule""".stripMargin,
    // Same one-window two-model attribution; DuckDB's IGNORE NULLS over
    // the 1-PRECEDING frame matches Spark's last/first(ignoreNulls).
    "q_attribution" ->
      """WITH e AS (
        |  SELECT user_id, event_type, event_id,
        |    CAST(ts AS TIMESTAMP) AS ts,
        |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |t AS (SELECT *,
        |    last_value(CASE WHEN event_type <> 'purchase'
        |      THEN event_type END IGNORE NULLS) OVER w AS last_touch,
        |    first_value(CASE WHEN event_type <> 'purchase'
        |      THEN event_type END IGNORE NULLS) OVER w AS first_touch
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |p AS (SELECT * FROM t WHERE event_type = 'purchase'),
        |x AS (
        |  SELECT 'first_touch' AS model,
        |    COALESCE(first_touch, '(direct)') AS touch_type, cents FROM p
        |  UNION ALL
        |  SELECT 'last_touch',
        |    COALESCE(last_touch, '(direct)'), cents FROM p)
        |SELECT model, touch_type, COUNT(*) AS n_conversions,
        |  CAST(SUM(cents) AS BIGINT) AS cents
        |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // Same value-based RANGE frame over epoch seconds.
    "q_rolling_range" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey,
        |    CAST(epoch(o_orderdate) AS BIGINT) AS sec,
        |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders)
        |SELECT o_orderkey, o_custkey, sec,
        |  COUNT(*) OVER w AS n_7d,
        |  CAST(SUM(cents) OVER w AS BIGINT) AS cents_7d
        |FROM o
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY sec
        |  RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,
    // Same lead() pairing and tiny-table normalizer window.
    "q_markov_transitions" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    CAST(ts AS TIMESTAMP) AS ts FROM events),
        |t AS (
        |  SELECT event_type AS from_type,
        |    LEAD(event_type) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM e),
        |c AS (SELECT from_type, to_type, COUNT(*) AS n FROM t
        |      WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT)
        |    AS from_total,
        |  n / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
        |FROM c ORDER BY 1, 2""".stripMargin,
    // Same graduated edge derivation as q_pagerank's oracle (shared
    // CTE spelling, materialized for the same reason) over the
    // first-three-items part projection; the triangle count itself is
    // the naive 3-way join — the value the oriented Spark plan must
    // reproduce.
    "q_triangles" ->
      s"""WITH li AS MATERIALIZED (
         |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS sk
         |  FROM lineitem WHERE l_linenumber <= 3),
         |grp AS MATERIALIZED (
         |  SELECT ok, count(*) AS m, min(sk) AS pivot FROM li GROUP BY ok),
         |pairs AS (
         |  SELECT a.sk AS src, b.sk AS dst
         |  FROM li a JOIN grp g ON g.ok = a.ok AND g.m <= $PrStarT
         |  JOIN li b ON a.ok = b.ok AND a.sk <> b.sk
         |  UNION ALL
         |  SELECT li.sk, g.pivot FROM li
         |  JOIN grp g ON g.ok = li.ok AND g.m > $PrStarT
         |  WHERE li.sk <> g.pivot
         |  UNION ALL
         |  SELECT g.pivot, li.sk FROM li
         |  JOIN grp g ON g.ok = li.ok AND g.m > $PrStarT
         |  WHERE li.sk <> g.pivot),
         |edges AS MATERIALIZED (
         |  SELECT DISTINCT src AS s, dst AS t FROM pairs WHERE src < dst),
         |tri AS (
         |  SELECT COUNT(*) AS n FROM edges e1
         |  JOIN edges e2 ON e2.s = e1.s AND e2.t > e1.t
         |  JOIN edges e3 ON e3.s = e1.t AND e3.t = e2.t)
         |SELECT CAST(tri.n AS BIGINT) AS n_triangles,
         |  (SELECT COUNT(*) FROM edges) AS n_edges,
         |  (SELECT COUNT(DISTINCT u) FROM
         |    (SELECT s AS u FROM edges UNION ALL SELECT t FROM edges))
         |    AS n_nodes
         |FROM tri""".stripMargin,
    // Same multiplied-out CUSUM statistic and planted purchase shift.
    "q_changepoint" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
        |    COUNT(*) *
        |      (1 + CASE WHEN event_type = 'purchase'
        |        AND date_trunc('day', CAST(ts AS TIMESTAMP)) >=
        |          TIMESTAMP '2024-01-20 00:00:00'
        |        THEN 1 ELSE 0 END) AS cnt
        |  FROM events GROUP BY 1, 2),
        |scored AS (
        |  SELECT event_type, day, cnt,
        |    CAST(row_number() OVER wo AS BIGINT) AS i,
        |    SUM(cnt) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_i,
        |    COUNT(*) OVER wa AS n,
        |    SUM(cnt) OVER wa AS s_n
        |  FROM daily
        |  WINDOW wo AS (PARTITION BY event_type ORDER BY day),
        |         wa AS (PARTITION BY event_type)),
        |ranked AS (
        |  SELECT *, abs(n * s_i - i * s_n) AS score,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY abs(n * s_i - i * s_n) DESC, day) AS rk
        |  FROM scored)
        |SELECT event_type, strftime(day, '%Y-%m-%d') AS cp_day,
        |  CAST(score AS BIGINT) AS max_score,
        |  CAST(n AS BIGINT) AS n_days,
        |  CAST(s_n AS BIGINT) AS total_cnt
        |FROM ranked WHERE rk = 1 ORDER BY event_type""".stripMargin,
    // Same parity assignment, conversion predicate and
    // identically-spelled z statistic (guarded to NULL when the pooled
    // rate degenerates to 0 or 1).
    "q_abtest" ->
      """WITH u AS (
        |  SELECT user_id,
        |    MAX(CASE WHEN event_type = 'purchase' AND value >= 150.0
        |      THEN 1 ELSE 0 END) AS conv,
        |    CAST(user_id % 2 AS INT) AS arm
        |  FROM events GROUP BY user_id),
        |a AS (
        |  SELECT
        |    COUNT(CASE WHEN arm = 0 THEN 1 END) AS n_a,
        |    CAST(SUM(CASE WHEN arm = 0 THEN conv END) AS BIGINT)
        |      AS conv_a,
        |    COUNT(CASE WHEN arm = 1 THEN 1 END) AS n_b,
        |    CAST(SUM(CASE WHEN arm = 1 THEN conv END) AS BIGINT)
        |      AS conv_b
        |  FROM u),
        |r AS (
        |  SELECT n_a, conv_a, n_b, conv_b,
        |    conv_a / CAST(n_a AS DOUBLE) AS rate_a,
        |    conv_b / CAST(n_b AS DOUBLE) AS rate_b,
        |    (conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE) AS p_pool
        |  FROM a)
        |SELECT n_a, conv_a, n_b, conv_b, rate_a, rate_b,
        |  rate_a - rate_b AS lift,
        |  CASE WHEN p_pool > 0 AND p_pool < 1 THEN
        |    (rate_a - rate_b) /
        |    sqrt(p_pool * (1 - p_pool) * (1.0 / n_a + 1.0 / n_b))
        |  END AS z_score
        |FROM r""".stripMargin,
    // Same content-hash sharding (the dedup family md5-60bit mirror)
    // and balance arithmetic.
    "q_shard_assign" ->
      """WITH d AS (
        |  SELECT doc_id, n_chars,
        |    (CAST('0x' || substr(md5(text), 1, 15) AS BIGINT)
        |      % 1000000007) % 32 AS shard
        |  FROM documents),
        |a AS (
        |  SELECT shard, COUNT(*) AS n_docs,
        |    CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |    CAST(SUM(doc_id) AS BIGINT) AS sum_ids
        |  FROM d GROUP BY shard)
        |SELECT shard, n_docs, sum_chars, sum_ids,
        |  n_docs * 32 / CAST(SUM(n_docs) OVER () AS DOUBLE) AS balance
        |FROM a ORDER BY shard""".stripMargin,
    // Same manifest derivation and cumulative-size bin assignment.
    "q_compaction_bins" ->
      """WITH f AS (
        |  SELECT date_trunc('month', o_orderdate) AS month,
        |    date_trunc('day', o_orderdate) AS day,
        |    o_orderpriority AS prio,
        |    COUNT(*) AS n_rows,
        |    SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
        |      AS BIGINT)) AS bytes
        |  FROM orders GROUP BY 1, 2, 3),
        |t AS (SELECT (SUM(bytes) // COUNT(*)) * 8 AS target FROM f),
        |c AS (
        |  SELECT f.*,
        |    COALESCE(SUM(bytes) OVER (PARTITION BY month
        |      ORDER BY day, prio
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      // t.target AS bin
        |  FROM f, t)
        |SELECT strftime(month, '%Y-%m') AS month,
        |  CAST(bin AS BIGINT) AS bin, COUNT(*) AS n_files,
        |  CAST(SUM(bytes) AS BIGINT) AS bytes,
        |  CAST(SUM(n_rows) AS BIGINT) AS n_rows,
        |  strftime(MIN(day), '%Y-%m-%d') AS first_day,
        |  strftime(MAX(day), '%Y-%m-%d') AS last_day
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // Same horizon, same NTILE windows with the customer-key tiebreak.
    "q_rfm" ->
      """WITH per AS (
        |  SELECT o_custkey,
        |    CAST(DATE '2002-01-01' - CAST(MAX(o_orderdate) AS DATE)
        |      AS INT) AS recency,
        |    COUNT(*) AS frequency,
        |    SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
        |      AS BIGINT)) AS cents
        |  FROM orders GROUP BY o_custkey),
        |scored AS (
        |  SELECT o_custkey, cents,
        |    CAST(ntile(4) OVER (ORDER BY recency, o_custkey) AS INT)
        |      AS r_score,
        |    CAST(ntile(4) OVER (ORDER BY frequency, o_custkey) AS INT)
        |      AS f_score,
        |    CAST(ntile(4) OVER (ORDER BY cents, o_custkey) AS INT)
        |      AS m_score
        |  FROM per)
        |SELECT r_score, f_score, m_score, COUNT(*) AS n_customers,
        |  CAST(SUM(cents) AS BIGINT) AS cents,
        |  CAST(SUM(o_custkey) AS BIGINT) AS sum_custkeys
        |FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    // Same exact-cents ranking and multiplied-out share thresholds.
    "q_pareto_abc" ->
      """WITH per AS (
        |  SELECT l_partkey,
        |    SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
        |      AS BIGINT)) AS cents
        |  FROM lineitem GROUP BY l_partkey),
        |c AS (
        |  SELECT cents,
        |    SUM(cents) OVER (ORDER BY cents DESC, l_partkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    SUM(cents) OVER () AS total
        |  FROM per),
        |k AS (
        |  SELECT cents,
        |    CASE WHEN cum * 100 <= total * 60 THEN 'A'
        |         WHEN cum * 100 <= total * 85 THEN 'B'
        |         ELSE 'C' END AS cls
        |  FROM c)
        |SELECT cls, COUNT(*) AS n_parts,
        |  CAST(SUM(cents) AS BIGINT) AS cents,
        |  CAST(MIN(cents) AS BIGINT) AS min_part_cents,
        |  CAST(MAX(cents) AS BIGINT) AS max_part_cents
        |FROM k GROUP BY cls ORDER BY cls""".stripMargin,
    // Same nine driver-quantized ppm constants; the χ² pieces stay
    // exact BIGINTs (no square, no division).
    "q_benford" -> {
      val exp = (1 to 9).map(d => (d, math.round(
        math.log10(1.0 + 1.0 / d) * 1000000).toInt))
      val values = exp.map { case (d, p) => s"($d, $p)" }.mkString(", ")
      s"""WITH digits AS (
         |  SELECT CAST(substr(CAST(CAST(CAST(o_totalprice
         |      AS DECIMAL(12,2)) * 100 AS BIGINT) AS VARCHAR), 1, 1)
         |      AS INT) AS digit,
         |    COUNT(*) AS obs
         |  FROM orders GROUP BY 1),
         |e(digit, exp_ppm) AS (VALUES $values),
         |j AS (
         |  SELECT d.digit, d.obs, e.exp_ppm,
         |    SUM(d.obs) OVER () AS n
         |  FROM digits d JOIN e USING (digit))
         |SELECT digit, obs, CAST(exp_ppm AS BIGINT) AS exp_ppm,
         |  CAST(1000000 * obs - n * exp_ppm AS BIGINT) AS dev_x1e6,
         |  CAST(n * exp_ppm AS BIGINT) AS exp_n
         |FROM j ORDER BY digit""".stripMargin
    }
  )

  val oracles: Map[String, String] = checked(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1998-12-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_filter_pred" ->
      """SELECT p_partkey, p_name, p_type, p_size, p_retailprice
        |FROM part
        |WHERE p_type IN ('PROMO','ECONOMY') AND p_size BETWEEN 10 AND 30
        |  AND p_name LIKE '%e%' AND p_retailprice IS NOT NULL
        |ORDER BY p_partkey""".stripMargin,
    "q_join_broadcast" ->
      """SELECT r_name, n_name, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "q_join_left" ->
      """SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
        |  CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))),
        |       CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY c_custkey""".stripMargin,
    "q_join_semi" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin,
    "q_join_anti" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,
    "q_window_funcs" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(row_number() OVER w AS INT) AS rn,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "q_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q_set_ops" ->
      """(SELECT DISTINCT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |    AND o_orderdate < TIMESTAMP '1996-01-01'
        | INTERSECT
        | SELECT DISTINCT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1997-01-01')
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
        |ORDER BY o_custkey""".stripMargin,
    "q_rollup" ->
      """SELECT c_mktsegment, c_nationkey, COUNT(*) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
        |  CAST(GROUPING(c_mktsegment, c_nationkey) AS BIGINT) AS gid
        |FROM customer
        |GROUP BY ROLLUP(c_mktsegment, c_nationkey)
        |ORDER BY gid, c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST""".stripMargin,
    "q_distinct_agg" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_scalar_funcs" ->
      """SELECT o_orderkey,
        |  CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
        |  CAST(EXTRACT(month FROM o_orderdate) AS INT) AS mon,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS days_since,
        |  CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
        |  lower(o_orderpriority) AS prio_low,
        |  substring(o_orderpriority, 1, 1) AS prio_code,
        |  o_orderstatus || '-' || substring(o_orderpriority, 1, 1) AS tag,
        |  CAST(length(o_orderpriority) AS INT) AS prio_len
        |FROM orders WHERE o_orderkey < 1000
        |ORDER BY o_orderkey""".stripMargin,
    "q_regex_split" ->
      """SELECT p_partkey, string_split(p_name, ' ')[1] AS word1,
        |  string_split(p_name, ' ')[2] AS word2
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_expr_fn" ->
      """SELECT o_orderkey, ((o_orderkey % 100003) * 31 + 7) % 1000 AS synth_key
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_json_extract" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(k) AS BIGINT) AS k_sum,
        |  CAST(SUM(k) AS DOUBLE) / COUNT(*) AS k_avg,
        |  MIN(k) AS k_min, MAX(k) AS k_max
        |FROM (SELECT event_type,
        |        CAST(json_extract_string(props, '$.k') AS INT) AS k
        |      FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_tpch_q5" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
        |    AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q_tpch_q4" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q_tpch_q14" ->
      """SELECT CAST(CAST(100 AS DOUBLE) *
        |  CAST(SUM(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
        |    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) /
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,4))) AS DOUBLE) AS DOUBLE) AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-09-01'
        |  AND l_shipdate < TIMESTAMP '1996-10-01'""".stripMargin,
    "q_tpch_q18" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM customer, orders, lineitem
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
        |                     GROUP BY l_orderkey
        |                     HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 220)
        |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
        |LIMIT 100""".stripMargin,
    "q_tpch_q6" ->
      """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4)))
        |    AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q_percentile" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS med_qty,
        |  quantile_cont(l_quantity, 0.25) AS q1_qty,
        |  quantile_cont(l_quantity, 0.75) AS q3_qty
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    // Sketch-contract oracle: exact quantile_cont scalars + literal TRUE
    // for the rank-error booleans the Spark side computes vs its sketch.
    "q_percentile_approx" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS p25_qty,
        |  quantile_cont(l_quantity, 0.5) AS med_qty,
        |  quantile_cont(l_quantity, 0.75) AS p75_qty,
        |  quantile_cont(floor(l_extendedprice), 0.99) AS p99_price,
        |  TRUE AS med_in_band, TRUE AS quartiles_in_band,
        |  TRUE AS p99_in_band
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q_pivot" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F'
        |    THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS F,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'O'
        |    THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS O,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'P'
        |    THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS P
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q_unpivot" ->
      """SELECT s_suppkey, metric, value FROM (
        |  SELECT s_suppkey, 'acctbal' AS metric,
        |    CAST(s_acctbal AS DOUBLE) AS value FROM supplier
        |  UNION ALL
        |  SELECT s_suppkey, 'nationkey' AS metric,
        |    CAST(s_nationkey AS DOUBLE) AS value FROM supplier)
        |ORDER BY s_suppkey, metric""".stripMargin,
    "q_map_funcs" ->
      """SELECT o_orderkey, o_orderpriority AS prio,
        |  CAST(CASE WHEN length(o_orderpriority) > 9 THEN 1 ELSE 0 END
        |    AS BIGINT) AS n_long_vals,
        |  'cust|prio|status' AS keys_csv,
        |  array_to_string(list_sort([o_orderstatus, o_orderpriority,
        |    CAST(o_custkey AS VARCHAR)]), '|') AS vals_csv
        |FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_orderkey""".stripMargin,
    "q_time_window" ->
      """SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS hour_ts,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY 1, 2 ORDER BY hour_ts, event_type""".stripMargin,
    "q_asof_join" ->
      """SELECT c.event_id, c.user_id, CAST(c.ts AS TIMESTAMP) AS click_ts,
        |  CAST(v.ts AS TIMESTAMP) AS last_view_ts
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |  ON c.user_id = v.user_id AND c.ts >= v.ts
        |ORDER BY c.event_id""".stripMargin
  )
}
