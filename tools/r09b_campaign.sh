#!/bin/bash
# Round-9 second-batch legs: the index-lifecycle pair (ann_ivf_rebalanced,
# ann_ivf_stream_ingest) and APNG. Recipe as tools/r09_campaign.sh.
set -e
cd /root/repo
C=target/scala-2.13/classes
SET=ann_ivf_rebalanced,ann_ivf_stream_ingest,mm_image_apng

run () {
  SPARK_GRAFT_ONLY=$SET SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_SPLIT_MB=$2 \
    bash tools/runbench.sh "$C" "$3"
  grep '"metric"' "$3.log" | head -1 > "$3"
  echo "$3: $(grep -o '"value":[0-9.]*' "$3" | head -1)"
}

run /root/testdata/sf0.1 16 evidence/r09b_ops_sf01.json
run /root/sfbig/sf1      1  evidence/r09b_ops_sf1.json
run /root/sfbig/sf2      1  evidence/r09b_ops_sf2.json
run /root/sfbig/sf1skew  1  evidence/r09b_ops_sf1skew.json

echo R09B_CAMPAIGN_DONE
