#!/bin/bash
# Solo-run probe protocol (round 9): each 100x probe target runs in its own
# fresh JVM. Multi-op probe runs self-inflate 1.5-3x even with broadcast
# destroy + System.gc() in the untimed gaps (measured: minhash_lsh 100x =
# 20.9-26.1 s solo, 45.5 s in a 3-op run, 79.3 s in a 4-op run), so only
# solo numbers are citable. Usage: tools/probe_solo.sh <factor> <op>[,ops] ...
set -u
factor=$1; shift
for op in "$@"; do
  log="/tmp/probe_solo_${op//,/_}_$(date +%H%M).log"
  echo "=== probe $op (factor $factor) -> $log"
  SPARK_DRIVER_MEM=48g SPARK_GRAFT_PROBE_OPS="$op" \
    sbt -batch "runMain graft.ScaleProbe $factor" >"$log" 2>&1
  grep -E "corpus:|ratio|rows@N|^\[info\] [a-z_]+ +[0-9]" "$log" | tail -4
done
