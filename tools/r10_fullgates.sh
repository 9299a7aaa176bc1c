#!/bin/bash
# Round-10 FULL value gates at sf1 and sf2 — every SparkEntry query
# verified against the DuckDB oracle at 10x and 20x the bench scale,
# cut at the round's final HEAD (the r9 verdict's item 1: the close
# records must cite gates that exist at the gated HEAD).
set -e
cd /root/repo
C=target/scala-2.13/classes

for sf in sf1 sf2; do
  java -cp "$C:/opt/spark/jars/*" graft.Verify /root/sfbig/$sf \
    target/verify_${sf}_full > evidence/verify_${sf}_full_r10.log 2>&1
  python3 tools/check.py /root/sfbig/$sf target/verify_${sf}_full \
    2>/dev/null > evidence/check_${sf}_full_r10.txt
  tail -1 evidence/check_${sf}_full_r10.txt
done
echo R10_FULLGATES_DONE
