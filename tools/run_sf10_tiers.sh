#!/bin/bash
# The F=10 replication scale tiers, 23 judged queries each (q146 joined
# the direct-replay family in round 12):
#   sf1   = 10x of sf0.1, algebra bases = the sf0.1 ENGINE dumps
#           (BASE_FROM_ENGINE=1 self-consistency; those dumps are
#           oracle-verified every round) -> CORRECTNESS_sf1.json
#   sf10x = 10x of sf0.01, algebra bases = an INDEPENDENT DuckDB replay
#           of the sf0.01 oracles -> CORRECTNESS_sf10x.json
# q145/q146 retrain on the scaled corpus, so both tiers replay their
# captured-centroid oracles directly in DuckDB (5th script argument).
# Resumable like run_sf100x.sh (see tools/scale_lib.sh).
set -eo pipefail
cd /root/repo
. tools/scale_lib.sh

SF1=/tmp/sf1             # 10x of sf0.1
SF10X=/tmp/sf10x         # 10x of sf0.01
BASE_SF01=/tmp/vo_sf01_base    # sf0.1 engine dumps (shared with sf100x)
BASE_SF001=/tmp/vo_0.01        # sf0.01 dump (full-run or q-subset)
SF1_OUT=/tmp/vo_sf1
SF10X_OUT=/tmp/vo_sf10x
LOGDIR=/tmp/sf10_logs
mkdir -p "$LOGDIR"

# 23 judged queries: the 21-query replication-algebra body + q145/q146
JUDGED=q22,q23,q61,q81,q82,q87,q91,q99,q103,q107,q109,q110,q117,q121,q122,q123,q134,q135,q136,q137,q144,q145,q146
# base tables the algebra reads (engine dumps at sf0.1 / oracles at sf0.01)
BASEQ=q22,q23,q61,q81,q82,q87,q91,q99,q103,q107,q109,q110,q117,q121,q122,q123,q134,q135,q136,q137,q144

if ! corpus_complete "$SF1"; then
  step "ScaleUp sf0.1 -> $SF1 x10"
  rm -rf "$SF1"
  sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.1 $SF1 10" \
    2>&1 | tee "$LOGDIR/scaleup_sf1.log"
fi
if ! corpus_complete "$SF10X"; then
  step "ScaleUp sf0.01 -> $SF10X x10"
  rm -rf "$SF10X"
  sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.01 $SF10X 10" \
    2>&1 | tee "$LOGDIR/scaleup_sf10x.log"
fi

run_verify /root/testdata/sf0.1 "$BASE_SF01" "$BASEQ" verify_base_sf01
run_verify /root/testdata/sf0.01 "$BASE_SF001" "$BASEQ" verify_base_sf001
run_verify "$SF1" "$SF1_OUT" "$JUDGED" verify_sf1
run_verify "$SF10X" "$SF10X_OUT" "$JUDGED" verify_sf10x

step "Oracle: sf1 tier (base = sf0.1 engine dumps, self-consistency)"
BASE_FROM_ENGINE=1 SCALE_QUERIES=$JUDGED \
  python3 tools/sf1_scale_oracle.py /root/testdata/sf0.1 $BASE_SF01 $SF1_OUT \
  CORRECTNESS_sf1.json $SF1 2>&1 | tee "$LOGDIR/oracle_sf1.log"

step "Oracle: sf10x tier (base = independent DuckDB at sf0.01)"
SCALE_QUERIES=$JUDGED \
  python3 tools/sf1_scale_oracle.py /root/testdata/sf0.01 $BASE_SF001 $SF10X_OUT \
  CORRECTNESS_sf10x.json $SF10X 2>&1 | tee "$LOGDIR/oracle_sf10x.log"

step "done"
