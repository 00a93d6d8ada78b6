#!/bin/bash
# Quiet-window baseline-stamp catcher (round-13 punch-list #1).
#
# The bench box shares a physical host with a neighbor that is bursty on
# hour timescales (r12: dirty counts 14->4->15 across nine runs; nine
# manual stamp attempts all correctly refused by the contended guard).
# Polling by hand loses the window, so this loop delegates the catch to
# the in-bench watcher (SPARK_GRAFT_WAIT_QUIET_SECS, Bench.scala
# waitForQuietWindow): each attempt blocks until the membw+steal channels
# read quiet (or the per-attempt deadline passes), runs the full sf0.1
# registry with SPARK_GRAFT_WRITE_BASELINE=1, and exits as soon as a run
# lands with contended:false (the stamp guard then wrote the baseline).
#
# Usage: tools/quiet_stamp.sh [max_attempts]
#   env: WAIT (per-attempt quiet-wait budget, s; default 2400)
#        QUIET_REF (quiet membw reference MB/s; OPTIONAL — when unset
#                   the bench uses the committed _membw.mbps stamp in
#                   BENCH_BASELINE.json, which restamps keep current)
set -u
cd "$(dirname "$0")/.."
MAX=${1:-4}
for i in $(seq 1 "$MAX"); do
  echo "[quiet-stamp] attempt $i/$MAX $(date -u '+%F %T') UTC"
  # an empty ${VAR:+...} expansion would TERMINATE bash's assignment-prefix
  # parsing (the next VAR=x becomes the command, rc=127) — use env instead
  REF_OPT=()
  [ -n "${QUIET_REF:-}" ] && REF_OPT=(SPARK_GRAFT_QUIET_MEMBW_MBPS="$QUIET_REF")
  env "${REF_OPT[@]}" \
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_WAIT_QUIET_SECS=${WAIT:-2400} \
    SPARK_GRAFT_QUIET_POLL_SECS=120 \
    SPARK_GRAFT_WRITE_BASELINE=1 \
    SPARK_GRAFT_BENCH_DETAIL="bench_detail_${TAG:-r14}_try$i.json" \
    sbt -batch "runMain graft.Bench" \
    > "/tmp/quiet_stamp_$i.out" 2> "/tmp/quiet_stamp_$i.err"
  rc=$?
  line=$(grep -o '"contended":[a-z]*' "/tmp/quiet_stamp_$i.out" | head -1)
  dirty=$(grep -o '"dirty":[0-9]*' "/tmp/quiet_stamp_$i.out" | head -1)
  echo "[quiet-stamp] attempt $i done rc=$rc $line $dirty"
  # success = the guard actually WROTE the stamp (contended:false alone is
  # not enough: the strata guard can refuse a mechanically-clean run that
  # carries broad ambient inflation — the r13 try-1 case)
  if grep -q 'baseline stamped' "/tmp/quiet_stamp_$i.err"; then
    echo "[quiet-stamp] QUIET RUN LANDED on attempt $i — baseline stamped"
    exit 0
  fi
  grep -m1 'REFUSING' "/tmp/quiet_stamp_$i.err" || true
done
echo "[quiet-stamp] no quiet run in $MAX attempts"
exit 1
