#!/bin/bash
# Round-8 scaling campaign over the operators this round added or
# reshaped: q_pagerank (graduated pair expansion + regime gate),
# dedup_paragraph (fingerprint-keyed winners), ann_ivf_served (new:
# persisted DPP-pruned IVF), mm_audio_flac (new codec),
# text_perplexity (bounded-history LM) and text_classify (empty-token
# fix). Legs: the SCALING_r05 three-point scale recipe (sf0.1/sf1/sf2,
# 3-rep medians, local[32], SPLIT_MB=16 at sf0.1 / 1 at sf>=1), the
# value-skew replica (sf1skew), the NEW group-size-skew replica
# (sf1ord: one mega-order with ~27% of lineitem — the shape ScaleGen
# only makes since r8), and the constrained-memory squeeze on sf2.
# Run on a QUIET host — no concurrent sbt/gate.
set -e
cd /root/repo
C=target/scala-2.13/classes
SET=q_pagerank,dedup_paragraph,ann_ivf_served,mm_audio_flac,text_perplexity,text_classify

run () { # run <sfdir> <split> <out>
  SPARK_GRAFT_ONLY=$SET SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_SPLIT_MB=$2 \
    bash tools/runbench.sh "$C" "$3"
  grep '"metric"' "$3.log" | head -1 > "$3"
  echo "$3: $(grep -o '"value":[0-9.]*' "$3" | head -1)"
}

run /root/testdata/sf0.1 16 evidence/r08_ops_sf01.json
run /root/sfbig/sf1      1  evidence/r08_ops_sf1.json
run /root/sfbig/sf2      1  evidence/r08_ops_sf2.json
run /root/sfbig/sf1skew  1  evidence/r08_ops_sf1skew.json
run /root/sfbig/sf1ord   1  evidence/r08_ops_sf1ord.json

SPARK_DRIVER_MEM=4g EXTRA_SPARK_OPTS="-Dspark.memory.fraction=0.2" \
  run /root/sfbig/sf2 1 evidence/r08_ops_sf2_lowmem.json

echo R08_CAMPAIGN_DONE
