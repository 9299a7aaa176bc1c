#!/bin/bash
# Round-7 scaling campaign: the 10 operators added this round, measured
# at sf0.1 (1x), sf1 (10x) and sf2 (20x rows) with the SCALING_r05
# recipe (3-rep medians inside graft.Bench, local[32]; SPLIT_MB=16 at
# sf0.1 where coarse splits win, 1 at sf>=1 where row-group
# parallelism matters). Run on a QUIET host — no concurrent sbt/gate.
set -e
cd /root/repo
C=target/scala-2.13/classes
NEW=text_bpe_train,text_perplexity,text_classify,dedup_paragraph,dedup_exact_substr,ann_range_search,ann_ivf_range,mm_audio_alaw,mm_image_tiff,q_pagerank

SPARK_GRAFT_ONLY=$NEW SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_SPLIT_MB=16 \
  bash tools/runbench.sh "$C" evidence/r07_newops_sf01.json
grep '"metric"' evidence/r07_newops_sf01.json.log | head -1 \
  > evidence/r07_newops_sf01.json
echo "sf0.1 done"

SPARK_GRAFT_ONLY=$NEW SPARK_GRAFT_SF_DIR=/root/sfbig/sf1 \
  SPARK_GRAFT_SPLIT_MB=1 \
  bash tools/runbench.sh "$C" evidence/r07_newops_sf1.json
grep '"metric"' evidence/r07_newops_sf1.json.log | head -1 \
  > evidence/r07_newops_sf1.json
echo "sf1 done"

SPARK_GRAFT_ONLY=$NEW SPARK_GRAFT_SF_DIR=/root/sfbig/sf2 \
  SPARK_GRAFT_SPLIT_MB=1 \
  bash tools/runbench.sh "$C" evidence/r07_newops_sf2.json
grep '"metric"' evidence/r07_newops_sf2.json.log | head -1 \
  > evidence/r07_newops_sf2.json
echo "sf2 done"
echo R07_CAMPAIGN_DONE
