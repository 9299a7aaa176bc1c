#!/bin/bash
# Round-9 scaling legs over the operators this round added or reshaped:
# q_rfm + q_pareto_abc (two-phase shardedPrefix windows),
# q_bloom_semijoin (native BloomMightContain probe), ann_ivf_appended
# (incremental IVF maintenance), text_bm25_sql + dedup_passage_sql
# (SQL table-function surface), mm_audio_flac_stereo (stereo FLAC).
# Recipe as tools/r08g_campaign.sh: 3-rep medians in graft.Bench,
# local[32], SPLIT_MB=16 at sf0.1 / 1 at sf>=1, quiet host. The dim50
# leg (NEW: 50x dimension cardinality, facts sparse per key) is the
# replica the r8 verdict prescribed for the de-serialized windows.
set -e
cd /root/repo
C=target/scala-2.13/classes
SET=q_rfm,q_pareto_abc,q_bloom_semijoin,ann_ivf_appended,text_bm25_sql,dedup_passage_sql,mm_audio_flac_stereo

run () {
  SPARK_GRAFT_ONLY=$SET SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_SPLIT_MB=$2 \
    bash tools/runbench.sh "$C" "$3"
  grep '"metric"' "$3.log" | head -1 > "$3"
  echo "$3: $(grep -o '"value":[0-9.]*' "$3" | head -1)"
}

run /root/testdata/sf0.1 16 evidence/r09_ops_sf01.json
run /root/sfbig/sf1      1  evidence/r09_ops_sf1.json
run /root/sfbig/sf2      1  evidence/r09_ops_sf2.json
run /root/sfbig/sf1skew  1  evidence/r09_ops_sf1skew.json
run /root/sfbig/sf1ord   1  evidence/r09_ops_sf1ord.json
run /root/sfbig/dim50    1  evidence/r09_ops_dim50.json

# ~6x memory squeeze at sf2 (degrade-by-spilling, never errors)
( export SPARK_DRIVER_MEM=4g EXTRA_SPARK_OPTS="-Dspark.memory.fraction=0.2"
  run /root/sfbig/sf2 1 evidence/r09_ops_sf2_lowmem.json )

echo R09_CAMPAIGN_DONE
