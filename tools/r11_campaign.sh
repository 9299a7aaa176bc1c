#!/bin/bash
# Round-11 scaling legs over the round's new/reshaped operators:
#   mm_audio_seek   — FLAC seek-table random access (new gate; per-row
#                     suffix decode, embarrassingly parallel)
#   ann_mmr_ivf     — MMR pooled from the served IVF index (new gate;
#                     serving exchange must stay ~KB at every SF)
#   mm_image_webp   — hand-rolled VP8L round trip (new gate; linear)
#   text_pack       — shardedPrefix rewrite (upper window now rides
#                     cluster-sized rows; was corpus/1000)
#   mm_image_ico    — re-measure after the zlib-state reuse (r10 item
#                     5 asked for <= ~2.0x at the sf1->sf2 step)
# Recipe as tools/r10_campaign.sh: 3-rep medians in graft.Bench,
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

NEW=mm_audio_seek,ann_mmr_ivf,mm_image_webp,text_pack,mm_image_ico
run $NEW /root/testdata/sf0.1 16 evidence/r11_ops_sf01.json
run $NEW /root/sfbig/sf1      1  evidence/r11_ops_sf1.json
run $NEW /root/sfbig/sf2      1  evidence/r11_ops_sf2.json
run $NEW /root/sfbig/sf1skew  1  evidence/r11_ops_sf1skew.json

# per-arm ICO attribution (single-threaded, Spark-free)
java -cp "$C:/opt/spark/jars/*" graft.tools.IcoArmProbe 50000 5 \
  > evidence/r11_ico_arm_probe.txt 2>/dev/null

echo R11_CAMPAIGN_DONE
