package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Scale regression guard: mechanical assertions over the PHYSICAL
  * plans of every side-effect-free query (relational, TPC-H, text,
  * dedup, UDF). Correctness gates can't catch a plan that silently
  * degrades to a shape that dies at 100 TB — this spec pins the
  * properties the plan audits (PLANS.md) rely on:
  *
  *  - no CartesianProduct anywhere (an un-conditioned cross join of
  *    two facts is never survivable; the deliberate small-side
  *    all-pairs ops plan as BroadcastNestedLoopJoin, a different node);
  *  - dimension-join TPC-H queries actually broadcast (a silent
  *    regression to shuffling a 25-row nation dim would also shuffle
  *    the fact side of that join);
  *  - every lineitem scan is column-pruned (reading all 11 columns for
  *    a 4-column query is the canonical 100 TB bandwidth bug);
  *  - the pure-scan query (Q6) pushes its filters into the scan.
  *
  * Plans are inspected at sf0.001 — planning is data-size-independent
  * for these properties (broadcast choices anchor on the dims, which
  * are tiny at every SF).
  */
class PlanGuardSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Side-effect-free query sets (no KV scratch writes, no streams).
    * dedup_incremental is excluded like the KV family: its def builds
    * the persisted fingerprint index before planning. */
  private def audited: Map[String, Q] =
    RelationalQueries.defs ++ RelationalQueries.defs2 ++
      TpchQueries.defs ++ TextQueries.defs ++
      (DedupQueries.defs - "dedup_incremental") ++
      UdfQueries.defs

  private def plan(name: String): String =
    audited(name)(spark, dir).queryExecution.executedPlan.treeString

  test("no audited query plans a CartesianProduct") {
    val offenders = audited.keys.toSeq.sorted.filter { n =>
      plan(n).contains("CartesianProduct")
    }
    assert(offenders.isEmpty,
      s"CartesianProduct in: ${offenders.mkString(", ")}")
  }

  test("dimension-star TPC-H queries broadcast their dims") {
    val starQueries = Seq("q_tpch_q3", "q_tpch_q5", "q_tpch_q7",
      "q_tpch_q8", "q_tpch_q9", "q_tpch_q10", "q_tpch_q19")
    starQueries.foreach { n =>
      assert(plan(n).contains("BroadcastHashJoin"),
        s"$n lost its broadcast join")
    }
  }

  test("every TPC-H lineitem scan is column-pruned") {
    val lineitemWidth = 11
    val scanCols = "FileScan parquet \\[([^\\]]*)\\]".r
    TpchQueries.defs.keys.toSeq.sorted.foreach { n =>
      val p = plan(n)
      scanCols.findAllMatchIn(p).foreach { m =>
        val cols = m.group(1).split(",")
        if (cols.exists(_.startsWith("l_")))
          assert(cols.length < lineitemWidth,
            s"$n reads ALL lineitem columns: ${m.group(1)}")
      }
    }
  }

  test("the pure-scan query (Q6) pushes every predicate to the scan") {
    val p = plan("q_tpch_q6")
    assert(p.contains("PushedFilters: [IsNotNull"),
      "q_tpch_q6 scan lost its pushed filters")
    assert(!p.contains("PushedFilters: []"),
      "q_tpch_q6 has an unfiltered scan")
  }

  test("ivfAssign aggregates SKINNY rows: no vector column in any " +
      "aggregate (the wide-row shape spilled 11.6 GB at sf2)") {
    import org.apache.spark.sql.functions._
    val corpus = spark.range(50).toDF("id")
      .withColumn("vec", expr("transform(sequence(1, 8), j -> cast(id + j as double))"))
    val cents = spark.range(3)
      .select((col("id") * 20).as("cid"), expr(
        "transform(sequence(1, 8), j -> cast(cid * 2 + j as double))").as("cvec"))
    val assigned = graft.similarity.Similarity.ivfAssign(corpus, cents)
    val aggs = assigned.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(aggs.nonEmpty, "ivfAssign lost its aggregation")
    aggs.foreach { a =>
      // neither the grouping nor any aggregate buffer may carry the
      // quantized vector; it joins back AFTER the agg
      val refs = a.aggregateExpressions.flatMap(_.references).map(_.name)
      assert(!refs.exists(_.startsWith("vq")),
        s"ivfAssign aggregate carries the vector: $refs")
    }
    // and the result still matches the window formulation semantics
    val got = assigned.orderBy("id")
      .select("id", "cid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length === 50)
  }

  test("the sf2 AQE flip keeps its sides: fact-fact joins go shuffle, " +
      "hinted dims stay broadcast (q_tpch_q5/q4/q12)") {
    // At sf2 the r5 campaign saw these queries' fact-side joins flip
    // from broadcast to shuffle (the ~15,000x shuffle-write jump) while
    // the hint-broadcast dims stayed broadcast — correct, but until now
    // unpinned: a regression to broadcasting a FACT side (executor OOM
    // at 100 TB) or to shuffling the dims would hide inside "AQE chose
    // differently". Simulate the big-SF size relations by dropping the
    // broadcast thresholds below even sf0.001's facts: every unhinted
    // join must plan as a shuffle join, every hinted dim must still
    // broadcast (hints outrank thresholds), and nothing goes cartesian.
    val conf = spark.conf
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k))
    keys.foreach(k => conf.set(k, "1KB"))
    try {
      val shuffleJoin = "(SortMergeJoin|ShuffledHashJoin)".r
      Seq("q_tpch_q5", "q_tpch_q4", "q_tpch_q12").foreach { n =>
        val p = plan(n)
        assert(shuffleJoin.findFirstIn(p).isDefined,
          s"$n under big-SF thresholds lost its shuffle fact join:\n$p")
        assert(!p.contains("CartesianProduct"),
          s"$n under big-SF thresholds planned a CartesianProduct")
      }
      // q5's three hinted dims must survive the threshold drop as
      // broadcasts, and its two fact-side joins must both be shuffles.
      val p5 = plan("q_tpch_q5")
      val bhj = "BroadcastHashJoin".r.findAllIn(p5).size
      val smj = shuffleJoin.findAllIn(p5).size
      assert(bhj >= 3, s"q_tpch_q5 lost a hinted dim broadcast ($bhj):\n$p5")
      assert(smj >= 2, s"q_tpch_q5 broadcast a fact side ($smj):\n$p5")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("text_tfidf computes term frequencies map-side (r12): no " +
      "(doc, token) aggregate exchange on the join's streamed side") {
    val p = plan("text_tfidf")
    // the native per-doc counts expression replaced the explode ->
    // groupBy(doc, token) pre-aggregate; if that aggregate returns, so
    // does a full exchange of every distinct (doc, token) pair
    assert(p.contains("tokencountsexpr") ||
      p.contains("graft_token_counts") || p.contains("TokenCounts"),
      s"text_tfidf lost its native token-counts expression:\n$p")
    // (the window's hashpartitioning(doc_id) exchange is expected; the
    // banned shape is the aggregate keyed by (doc_id, token))
    val docTokenAggs = "HashAggregate\\(keys=\\[doc_id".r.findAllIn(p).size
    assert(docTokenAggs == 0,
      s"text_tfidf re-grew a (doc, token)-keyed aggregate:\n$p")
  }

  test("q_map_funcs filter reaches the scan (r12 pushdown)") {
    val p = plan("q_map_funcs")
    assert(p.contains("EqualTo(o_orderstatus,O)"),
      s"q_map_funcs status filter no longer pushed to the scan:\n$p")
  }

  test("q_map_funcs pins its map: exactly ONE map_concat evaluation " +
      "per row (five inlined builds regressed 1.7x at sf1)") {
    val p = plan("q_map_funcs")
    val builds = "map_concat".r.findAllIn(p).size
    // one build in the Generate barrier; references elsewhere must be
    // to the pinned attribute, not re-inlined constructions
    assert(builds <= 1, s"q_map_funcs inlines map_concat $builds times:\n$p")
    assert(p.contains("Generate"), "q_map_funcs lost its generator barrier")
  }

  test("codec queries repartition the id column to full parallelism " +
      "(byte-sized scan splits starve a CPU-bound per-row stage)") {
    Seq("mm_image_decode", "mm_image_jpeg", "mm_video_mjpeg",
        "mm_audio_decode").foreach { n =>
      val p = MmQueries.defs(n)(spark, dir).queryExecution
        .executedPlan.treeString
      assert(p.contains("RoundRobinPartitioning"),
        s"$n lost its codec repartition:\n$p")
    }
  }

  test("q_pagerank broadcasts the O(nodes) rank side and co-locates " +
      "the edge dedup (the r7 spill fix)") {
    // every iteration joins edges against a broadcast rank⋈deg side —
    // a regression to sort-merge here re-sorts the edge table three
    // times and spilled 4.9 GB at sf2 before the hints
    val p = plan("q_pagerank")
    assert(p.contains("BroadcastHashJoin"),
      s"q_pagerank lost its broadcast iterations:\n$p")
    // The edge-dedup shape hides behind the query's localCheckpoint
    // (the full plan only shows Scan ExistingRDD), so pin it on the
    // same sub-plan the query builds: the pair dedup must run on
    // pair-keyed partitions (dropping repartition(src, dst) re-creates
    // input-proportional partial-agg hash maps — the spill source) and
    // distinct() must ELIDE its own exchange (matching partitioning):
    // exactly one Exchange in the whole sub-plan.
    // the exact sub-plan the query builds (graduated star regime
    // included since r8), shared via coSupplyEdges
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      .distinct()
    val edges = RelationalQueries.coSupplyEdges(li, starT = 64)
    val ep = edges.queryExecution.executedPlan.treeString
    assert("hashpartitioning\\(src[^)]*dst".r.findFirstIn(ep).isDefined,
      s"edge dedup lost the pair-keyed exchange:\n$ep")
    val dedupExchanges = "Exchange hashpartitioning\\(src".r
      .findAllIn(ep).length
    assert(dedupExchanges === 1,
      s"edge distinct() stopped eliding its exchange:\n$ep")
  }

  test("semanticDedup plans broadcast centroid joins and no cartesian; " +
      "pair expansion shuffles ids only") {
    import spark.implicits._
    val corpus = (0L until 50L)
      .map(i => (i, Seq.tabulate(8)(d => math.sin(i * 8 + d))))
      .toDF("id", "vec")
    val cents = Seq(
      (0, Seq(1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)),
      (1, Seq(0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)))
      .toDF("cid", "cvec")
    val df = graft.similarity.Similarity.semanticDedup(corpus, cents, 0.99)
    df.collect() // finalize the adaptive plan before inspecting
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      s"semanticDedup planned a CartesianProduct:\n$p")
    // the centroid cross join must ride a broadcast (BNLJ or, post-AQE,
    // a broadcast hash join) — never a shuffle of the corpus per centroid
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"),
      s"semanticDedup lost its broadcast centroid join:\n$p")
  }

  test("q_integrity audits each FK edge in ONE pass pair: 14 scans " +
      "(child+parent per edge), 7 full-outer joins, no anti-join " +
      "(anti gets pushed below the groupBy and re-scans the child)") {
    val p = plan("q_integrity")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans === 14, s"q_integrity scan count drifted to $scans:\n$p")
    assert("FullOuter".r.findAllIn(p).length === 7,
      s"q_integrity lost a full-outer edge join:\n$p")
    assert(!p.contains("LeftAnti"),
      s"q_integrity regressed to pushed-down anti-joins:\n$p")
  }

  test("q_delta_detect computes fingerprints scan-side: exactly 3 md5 " +
      "projections, all below the full-outer join (the exchange " +
      "carries (key, fp), never row payloads)") {
    val p = plan("q_delta_detect")
    val lines = p.linesIterator.toVector
    val joinIdx = lines.indexWhere(_.contains("FullOuter"))
    val md5Idx = lines.zipWithIndex.filter(_._1.contains("md5")).map(_._2)
    assert(md5Idx.length === 3,
      s"q_delta_detect md5 projection count drifted (${md5Idx.length}):\n$p")
    assert(joinIdx >= 0 && md5Idx.forall(_ > joinIdx),
      s"q_delta_detect evaluates a fingerprint ABOVE the join:\n$p")
  }

  test("q_scd2 builds the SCD2 intervals over ONE user-keyed exchange " +
      "and one window") {
    val p = plan("q_scd2")
    assert("Window".r.findAllIn(p).length === 1,
      s"q_scd2 window count drifted:\n$p")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).length === 1,
      s"q_scd2 duplicated its user-keyed exchange:\n$p")
  }

  test("q_retention_cohort reads the event log ONCE (the cohort-size " +
      "side is a window over the tiny rollup, not a replanned self-join " +
      "that re-scans) and the per-user dedup rides the window's user_id " +
      "exchange via the partitioning-subset rule") {
    val p = plan("q_retention_cohort")
    assert("Scan parquet".r.findAllIn(p).length === 1,
      s"q_retention_cohort re-scans the event log:\n$p")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).length === 1,
      s"q_retention_cohort user_id exchange count drifted:\n$p")
  }

  test("q_attribution computes both touch models from ONE window node " +
      "over ONE user-keyed exchange and one scan") {
    val p = plan("q_attribution")
    assert("Window".r.findAllIn(p).length === 1,
      s"q_attribution split its touch columns into two window passes:\n$p")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).length === 1,
      s"q_attribution user_id exchange count drifted:\n$p")
    assert("Scan parquet".r.findAllIn(p).length === 1,
      s"q_attribution scan count drifted:\n$p")
  }

  test("q_gapfill builds its spine from 3 scans (types, bounds, hourly) " +
      "and fills over a broadcast of the bounded (type, hour) grid") {
    val p = plan("q_gapfill")
    assert("Scan parquet".r.findAllIn(p).length === 3,
      s"q_gapfill scan count drifted:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"q_gapfill shuffles the bounded grid join:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"q_gapfill planned a cartesian spine:\n$p")
  }

  test("q_rolling_range plans ONE RangeFrame window (count+sum fused) " +
      "over one customer-keyed exchange and one scan") {
    val p = plan("q_rolling_range")
    assert("Window".r.findAllIn(p).length === 1,
      s"q_rolling_range window count drifted:\n$p")
    assert(p.contains("RangeFrame"),
      s"q_rolling_range lost its value-based RANGE frame:\n$p")
    assert("Scan parquet".r.findAllIn(p).length === 1,
      s"q_rolling_range scan count drifted:\n$p")
  }

  test("q_markov_transitions reads the event log once over one " +
      "user-keyed exchange (the normalizer window runs on the tiny " +
      "transition table, never the log)") {
    val p = plan("q_markov_transitions")
    assert("Scan parquet".r.findAllIn(p).length === 1,
      s"q_markov_transitions re-scans the event log:\n$p")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).length === 1,
      s"q_markov_transitions user_id exchange count drifted:\n$p")
  }

  test("q_changepoint reduces the log in one (type, day) agg pass and " +
      "pushes the argmax as a WindowGroupLimit (top-1 per type, no " +
      "full-partition rank materialization)") {
    val p = plan("q_changepoint")
    assert("Scan parquet".r.findAllIn(p).length === 1,
      s"q_changepoint re-scans the event log:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"q_changepoint lost its top-1 group-limit pushdown:\n$p")
  }

  test("q_abtest reduces per-user over ONE keyed exchange and finishes " +
      "on a single-partition 1-row aggregate") {
    val p = plan("q_abtest")
    assert("Scan parquet".r.findAllIn(p).length === 1,
      s"q_abtest scan count drifted:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 1,
      s"q_abtest keyed exchange count drifted:\n$p")
  }

  test("q_shard_assign reduces to 32 shard rows over one keyed " +
      "exchange; the balance window runs on the 32-row result") {
    val p = plan("q_shard_assign")
    assert("Scan parquet".r.findAllIn(p).length === 1,
      s"q_shard_assign scan count drifted:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 1,
      s"q_shard_assign keyed exchange count drifted:\n$p")
  }

  test("q_compaction_bins reads the checkpointed manifest (no parquet " +
      "re-scan for the derived target) and its (month, bin) rollup " +
      "rides the month window exchange via the subset rule") {
    val p = plan("q_compaction_bins")
    assert(!p.contains("Scan parquet"),
      s"q_compaction_bins re-scans orders past the manifest:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 1,
      s"q_compaction_bins grew a second keyed exchange:\n$p")
  }

  /** Every WindowExec in a (possibly adaptive) physical plan. */
  private def windows(name: String)
      : Seq[org.apache.spark.sql.execution.window.WindowExec] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.WindowExec
    def walk(p: SparkPlan): Seq[WindowExec] = {
      val here = p match {
        case w: WindowExec => Seq(w)
        case _ => Nil
      }
      val below = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case _ => p.children.flatMap(walk)
      }
      here ++ below ++ p.subqueries.flatMap(walk)
    }
    walk(audited(name)(spark, dir).queryExecution.executedPlan)
  }

  test("q_rfm and q_pareto_abc keep NO data-sized global window: " +
      "their window input is a linearly-growing DIMENSION (customers/" +
      "parts), so every unpartitioned window must order by __shard — " +
      "the shards-sized offset table of the two-phase shardedPrefix — " +
      "and every row-level window must be __shard-partitioned") {
    Seq("q_rfm", "q_pareto_abc").foreach { n =>
      val ws = windows(n)
      assert(ws.nonEmpty, s"$n lost its windows entirely")
      val global = ws.filter(_.partitionSpec.isEmpty)
      assert(global.nonEmpty,
        s"$n lost the shard-offset prefix pass")
      global.foreach { w =>
        val ord = w.orderSpec.flatMap(_.child.references).map(_.name)
        assert(ord.nonEmpty && ord.forall(_.startsWith("__shard")),
          s"$n has a DATA-sized single-partition window ordered by " +
            s"${ord.mkString(",")} — dies at 100 TB")
      }
      ws.filterNot(_.partitionSpec.isEmpty).foreach { w =>
        val parts = w.partitionSpec.flatMap(_.references).map(_.name)
        assert(parts.exists(_.startsWith("__shard")),
          s"$n row-level window not shard-partitioned: $parts")
      }
    }
  }

  test("q_bloom_semijoin probes through the codegen'd BloomMightContain " +
      "expression (no per-row Scala UDF boxing keys / fencing codegen)") {
    val p = plan("q_bloom_semijoin")
    assert(p.toLowerCase.contains("bloommightcontain"),
      s"q_bloom_semijoin lost the native bloom probe:\n$p")
    assert(!p.contains("UDF("),
      s"q_bloom_semijoin regressed to a Scala UDF probe:\n$p")
  }

  test("q_benford cumulates over its 9-row digit AGGREGATE (bounded " +
      "input below the single-partition window), one scan") {
    val p = plan("q_benford")
    assert("Scan parquet".r.findAllIn(p).length === 1,
      s"q_benford scan count drifted:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 1,
      s"q_benford keyed exchange count drifted:\n$p")
    // the SinglePartition window must sit ABOVE the keyed aggregate
    val lines = p.linesIterator.toVector
    val winIdx = lines.indexWhere(_.contains("Window"))
    val aggIdx = lines.indexWhere(_.contains("Exchange hashpartitioning"))
    assert(winIdx >= 0 && aggIdx > winIdx,
      s"q_benford window below the reducing aggregate:\n$p")
  }

  test("q_expectations evaluates the whole rule suite on ONE keyed " +
      "exchange (row-local rules ride the uniqueness shuffle as per-key " +
      "counters) over the union's 2 scans") {
    val p = plan("q_expectations")
    assert("Scan parquet".r.findAllIn(p).length === 2,
      s"q_expectations scan count drifted:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 1,
      s"q_expectations grew a second keyed exchange:\n$p")
    assert(p.contains("stack"),
      s"q_expectations lost its stack pivot:\n$p")
  }

  test("text_pack's only SinglePartition exchange carries shard-level " +
      "aggregate rows (≤ shuffle partitions), never the per-document " +
      "stream — the shardedPrefix shape, not a corpus-sized funnel") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val df = audited("text_pack")(spark, dir)
    df.collect() // finalize the adaptive plan
    def walk(p: SparkPlan): Seq[SparkPlan] = {
      val below = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan)
        case _ => p.children.flatMap(walk)
      }
      p +: (below ++ p.subqueries.flatMap(walk))
    }
    val singles = walk(df.queryExecution.executedPlan).collect {
      case e: ShuffleExchangeLike
          if e.outputPartitioning.numPartitions == 1 => e
    }
    assert(singles.nonEmpty, "expected the shard-offset prefix exchange")
    singles.foreach { e =>
      assert(e.child.treeString.contains("__shard"),
        s"SinglePartition exchange over per-document rows (the funnel " +
          s"shardedPrefix exists to remove):\n${e.treeString}")
    }
  }

  test("q_tpch_q15 never funnels the supplier dimension through one " +
      "task: no window at all, ONE executed lineitem scan (the scalar " +
      "max rides AQE exchange reuse of the per-supplier shuffle), and " +
      "every SinglePartition exchange carries only partial-max rows " +
      "(≤ shuffle partitions), never per-supplier data") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    assert(windows("q_tpch_q15").isEmpty,
      "q_tpch_q15 regressed to a window-based scalar max")
    // execute so the ADAPTIVE plan is final — exchange reuse is a
    // runtime decision, invisible in the static plan
    val df = audited("q_tpch_q15")(spark, dir)
    df.collect()
    def walk(p: SparkPlan): Seq[SparkPlan] = {
      val below = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        // materialized AQE stages hang their plan off .plan, not
        // .children; a ReusedExchangeExec's referenced exchange is NOT
        // descended (that would double-count the reused scan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan)
        case _ => p.children.flatMap(walk)
      }
      p +: (below ++ p.subqueries.flatMap(walk))
    }
    val nodes = walk(df.queryExecution.executedPlan)
    val lineitemScans = nodes.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths.mkString(",")
            .contains("lineitem") => f
    }
    assert(lineitemScans.size === 1,
      s"q_tpch_q15 executed ${lineitemScans.size} lineitem scans")
    assert(nodes.exists(_.isInstanceOf[ReusedExchangeExec]),
      "q_tpch_q15 lost the per-supplier exchange reuse")
    nodes.collect {
      case e: ShuffleExchangeLike
          if e.outputPartitioning.numPartitions == 1 =>
        assert(e.child.treeString.contains("partial_max"),
          s"SinglePartition exchange over non-scalar rows:\n${e.treeString}")
    }
  }
}
