#!/bin/bash
# Round-8 third-batch scaling legs for the twelve operators added after
# the second-half close: the analytics family (q_retention_cohort,
# q_gapfill, q_expectations, q_attribution, q_rolling_range,
# q_markov_transitions, q_triangles, q_changepoint, q_abtest,
# q_shard_assign, q_compaction_bins) plus mm_image_png. Same recipe as
# tools/r08b_campaign.sh: three-point scale (sf0.1/sf1/sf2, 3-rep
# medians, local[32], SPLIT_MB 16 at sf0.1 / 1 at sf>=1), the
# value-skew replica, the hot-group replica (q_triangles shares
# q_pagerank's per-group expansion, so it gets the skeworder leg too),
# and the constrained-memory squeeze on sf2.
# Run on a QUIET host — no concurrent sbt/gate.
set -e
cd /root/repo
C=target/scala-2.13/classes
SET=q_retention_cohort,q_gapfill,q_expectations,q_attribution,q_rolling_range,q_markov_transitions,q_triangles,q_changepoint,q_abtest,q_shard_assign,q_compaction_bins,mm_image_png

run () { # run <sfdir> <split> <out>
  SPARK_GRAFT_ONLY=$SET SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_SPLIT_MB=$2 \
    bash tools/runbench.sh "$C" "$3"
  grep '"metric"' "$3.log" | head -1 > "$3"
  echo "$3: $(grep -o '"value":[0-9.]*' "$3" | head -1)"
}

run /root/testdata/sf0.1 16 evidence/r08f_ops_sf01.json
run /root/sfbig/sf1      1  evidence/r08f_ops_sf1.json
run /root/sfbig/sf2      1  evidence/r08f_ops_sf2.json
run /root/sfbig/sf1skew  1  evidence/r08f_ops_sf1skew.json
run /root/sfbig/sf1ord   1  evidence/r08f_ops_sf1ord.json

# subshell: var-prefixes on a bash FUNCTION call leak into the parent
# shell (unlike external commands) and would squeeze any later leg
( export SPARK_DRIVER_MEM=4g EXTRA_SPARK_OPTS="-Dspark.memory.fraction=0.2"
  run /root/sfbig/sf2 1 evidence/r08f_ops_sf2_lowmem.json )

echo R08F_CAMPAIGN_DONE
