#!/bin/bash
# Round-11 FULL value gates at sf1 and sf2 — every SparkEntry query
# verified against the DuckDB oracle at 10x and 20x the bench scale,
# cut at the round's final HEAD. check.py stamps HEAD sha + UTC into
# each artifact's header (r10 verdict item 4), so the close records
# are self-identifying.
set -e
cd /root/repo
C=target/scala-2.13/classes

for sf in sf1 sf2; do
  java -cp "$C:/opt/spark/jars/*" graft.Verify /root/sfbig/$sf \
    target/verify_${sf}_full > evidence/verify_${sf}_full_r11.log 2>&1
  python3 tools/check.py /root/sfbig/$sf target/verify_${sf}_full \
    2>/dev/null > evidence/check_${sf}_full_r11.txt
  tail -1 evidence/check_${sf}_full_r11.txt
done
echo R11_FULLGATES_DONE
