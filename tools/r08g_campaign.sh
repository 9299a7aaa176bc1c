#!/bin/bash
# Round-8 fourth-batch scaling legs: q_rfm, q_pareto_abc, q_benford,
# ann_mmr. Same recipe as tools/r08f_campaign.sh.
set -e
cd /root/repo
C=target/scala-2.13/classes
SET=q_rfm,q_pareto_abc,q_benford,ann_mmr

run () {
  SPARK_GRAFT_ONLY=$SET SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_SPLIT_MB=$2 \
    bash tools/runbench.sh "$C" "$3"
  grep '"metric"' "$3.log" | head -1 > "$3"
  echo "$3: $(grep -o '"value":[0-9.]*' "$3" | head -1)"
}

run /root/testdata/sf0.1 16 evidence/r08g_ops_sf01.json
run /root/sfbig/sf1      1  evidence/r08g_ops_sf1.json
run /root/sfbig/sf2      1  evidence/r08g_ops_sf2.json
run /root/sfbig/sf1skew  1  evidence/r08g_ops_sf1skew.json

( export SPARK_DRIVER_MEM=4g EXTRA_SPARK_OPTS="-Dspark.memory.fraction=0.2"
  run /root/sfbig/sf2 1 evidence/r08g_ops_sf2_lowmem.json )

echo R08G_CAMPAIGN_DONE
