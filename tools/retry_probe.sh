#!/bin/bash
# Chaos probe for SURVEY §2 row 4 (fault-tolerant reader/writer): runs
# graft.RetryProbe in its own JVM under local[8, 4] — the shared test
# session is local[4] (task maxFailures 1), so retry semantics can only
# be exercised here. See RetryProbe.scala for the three claims.
set -e
cd /root/repo
C=target/scala-2.13/classes
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
java $ADD_OPENS -Xmx4g -cp "$C:/opt/spark/jars/*" graft.RetryProbe "$@" \
  2> >(grep -v "^SLF4J" >&2)
