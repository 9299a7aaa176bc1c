#!/bin/bash
# Round-10 scaling legs:
#  A) new/reshaped ops, three-point + skew: q_tpch_q15 (reused-exchange
#     scalar max replacing the SinglePartition supplier window),
#     ann_topk_sql (SQL TVF serving), ann_ivf_rebalanced (crash-atomic
#     ROUTING manifest swap), mm_image_bmp, mm_image_ico.
#  B) dim50 dimension-inflation legs (the r9 verdict's item 6):
#     q_tpch_q15 (supplier dim), kv_index_lookup / kv_index_covered
#     (index tables ride the 50x orders), q_rfm / q_pareto_abc (carried
#     r9 evidence re-cut at this HEAD), plus dim50 VALUE gates.
#  C) corpus-variety legs for text_collocations / dedup_clusters: the
#     fact replicas rotate document text, so vocabulary / cluster count
#     (their dimension axis) grow with F — measured sf0.1 -> sf1 -> sf2.
# Recipe as tools/r09_campaign.sh: 3-rep medians in graft.Bench,
# local[32], SPLIT_MB=16 at sf0.1 / 1 at sf>=1, quiet host.
set -e
cd /root/repo
C=target/scala-2.13/classes

run () { # queries sfdir splitmb out
  SPARK_GRAFT_ONLY=$1 SPARK_GRAFT_SF_DIR=$2 SPARK_GRAFT_SPLIT_MB=$3 \
    bash tools/runbench.sh "$C" "$4"
  grep '"metric"' "$4.log" | head -1 > "$4"
  echo "$4: $(grep -o '"value":[0-9.]*' "$4" | head -1)"
}

NEW=q_tpch_q15,ann_topk_sql,ann_ivf_rebalanced,mm_image_bmp,mm_image_ico
run $NEW /root/testdata/sf0.1 16 evidence/r10_ops_sf01.json
run $NEW /root/sfbig/sf1      1  evidence/r10_ops_sf1.json
run $NEW /root/sfbig/sf2      1  evidence/r10_ops_sf2.json
run $NEW /root/sfbig/sf1skew  1  evidence/r10_ops_sf1skew.json

DIM=q_tpch_q15,kv_index_lookup,kv_index_covered,q_rfm,q_pareto_abc
run $DIM /root/testdata/sf0.1 16 evidence/r10_dim_base.json
run $DIM /root/sfbig/dim50    1  evidence/r10_dim50.json

CORP=text_collocations,dedup_clusters
run $CORP /root/testdata/sf0.1 16 evidence/r10_corp_sf01.json
run $CORP /root/sfbig/sf1      1  evidence/r10_corp_sf1.json
run $CORP /root/sfbig/sf2      1  evidence/r10_corp_sf2.json

# dim50 VALUE gates for the dim-shaped set
SPARK_GRAFT_ONLY=$DIM java -cp "$C:/opt/spark/jars/*" \
  graft.Verify /root/sfbig/dim50 target/verify_dim50 \
  > evidence/verify_dim50_r10.log 2>&1
python3 tools/check.py /root/sfbig/dim50 target/verify_dim50 2>/dev/null \
  | tail -6 > evidence/check_dim50_r10.txt
cat evidence/check_dim50_r10.txt

git checkout -- bench_out.json
echo R10_CAMPAIGN_DONE
