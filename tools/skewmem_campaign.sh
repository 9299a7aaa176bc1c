#!/bin/bash
# Round-6 combined-degradation campaign: the missing cell of the
# {uniform, skew} x {normal, constrained-memory} matrix. A real 100 TB
# cluster runs skewed AND memory-tight at once; this measures the 16
# shuffle-heavy/LSH queries of the skew campaign on the skewed sf1
# replica under the lowmem squeeze (4g heap, spark.memory.fraction=0.2),
# interleaved against the same squeeze on the uniform replica (the
# NOTES.md A/B protocol: cross-session totals carry ~15% host noise).
set -e
cd /root/repo
C=target/scala-2.13/classes
QS=ann_lsh_neardup,dedup_clusters,dedup_containment,dedup_embed_cosine,dedup_minhash,dedup_ngram_jaccard,dedup_simhash,q1_agg,q_sessionize,q_skew_join,q_tpch_q18,q_tpch_q21,q_tpch_q5,q_tpch_q9,q_window_funcs,text_tfidf
export SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SPLIT_MB=1 SPARK_GRAFT_REPS=3 \
       SPARK_GRAFT_ONLY="$QS" \
       SPARK_DRIVER_MEM=4g EXTRA_SPARK_OPTS="-Dspark.memory.fraction=0.2"
for p in 1 2; do
  SPARK_GRAFT_SF_DIR=/root/sfbig/sf1 \
    SPARK_GRAFT_BENCH_OUT=evidence/skewmem_uni_p${p}_r06.json \
    tools/runbench.sh "$C" evidence/skewmem_uni_p${p}_r06.json
  echo "pass $p uniform-lowmem done: $(grep -o '"value":[0-9.]*' evidence/skewmem_uni_p${p}_r06.json | head -1)"
  SPARK_GRAFT_SF_DIR=/root/sfbig/sf1skew \
    SPARK_GRAFT_BENCH_OUT=evidence/skewmem_skew_p${p}_r06.json \
    tools/runbench.sh "$C" evidence/skewmem_skew_p${p}_r06.json
  echo "pass $p skew-lowmem done: $(grep -o '"value":[0-9.]*' evidence/skewmem_skew_p${p}_r06.json | head -1)"
done
echo CAMPAIGN_DONE
