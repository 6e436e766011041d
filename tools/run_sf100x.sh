#!/bin/bash
# sf100x scale tier: 100x replication of sf0.1 for the linear/invariant
# body, plus 100x of sf0.01 for the graph family (the label-block cosine
# join is block-quadratic, so the graph corpus holds vertex count at the
# already-validated sf1-tier level while still exercising the F=100
# closed forms: TRI_EDGE=14850, TRI_OWN=4851, degree' = 100d+99).
# Excluded from the big tier: q22/q23 (expected-side self-pair volume is
# C(100,2) x docs ~ 25M rows -- a compare-harness cost, not an engine one;
# the pair family is already hash-exact at F=10 on two corpora). q61
# (the same pair volume INSIDE the engine) stays in: its clustering
# joins are MERGE-pinned, so the pair stream never rides a broadcast.
#
# Resumable: every step logs to $LOGDIR/<step>.log; corpus generation is
# keyed on per-table _SUCCESS markers; Verify steps re-run ONLY queries
# whose dump lacks _SUCCESS and merge the sidecar JSONs (oracle_sql /
# verify_times / plan_signatures) across passes, so a mid-run death
# resumes at the failed query, not the tier start.
# Serialized sbt invocations (project lock).
set -eo pipefail
cd /root/repo
. tools/scale_lib.sh

BIG=/tmp/sf100x          # 100x of sf0.1
GRAPH=/tmp/sf100xg       # 100x of sf0.01
BASE_OUT=/tmp/vo_sf01_base
GRAPH_BASE_OUT=/tmp/vo_0.01
BIG_OUT=/tmp/vo_sf100x
GRAPH_OUT=/tmp/vo_sf100xg
LOGDIR=/tmp/sf100x_logs
mkdir -p "$LOGDIR"

LINEAR=q61,q81,q82,q87,q91,q99,q103,q107,q109,q110,q117,q121,q122,q123,q134,q144,q145,q146
# base run also needs q22/q23/q135/q136/q137 dumps+oracles (the graph
# algebra reads base_q136; the pair family's F=10 artifacts come from here)
BASEQ=q22,q23,q61,q81,q82,q87,q91,q99,q103,q107,q109,q110,q117,q121,q122,q123,q134,q135,q136,q137,q144
GRAPHQ=q135,q136,q137

if ! corpus_complete "$BIG"; then
  step "ScaleUp sf0.1 -> $BIG x100"
  rm -rf "$BIG"
  sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.1 $BIG 100" \
    2>&1 | tee "$LOGDIR/scaleup_big.log"
fi
if ! corpus_complete "$GRAPH"; then
  step "ScaleUp sf0.01 -> $GRAPH x100"
  rm -rf "$GRAPH"
  sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.01 $GRAPH 100" \
    2>&1 | tee "$LOGDIR/scaleup_graph.log"
fi

# Base dumps (resumable; regenerated from scratch on a fresh machine —
# the graph algebra's base_q136 lives in the sf0.01 dump).
run_verify /root/testdata/sf0.1 "$BASE_OUT" "$BASEQ" verify_base_sf01
run_verify /root/testdata/sf0.01 "$GRAPH_BASE_OUT" "q136" verify_base_graph

# Scaled dumps.
run_verify "$BIG" "$BIG_OUT" "$LINEAR" verify_big
run_verify "$GRAPH" "$GRAPH_OUT" "$GRAPHQ" verify_graph

step "Oracle: linear body (base = sf0.1 ENGINE dumps — self-consistency
      of the 100x run vs the oracle-verified base, not an independent
      DuckDB replay; the independent replay runs at the F=10 tier)"
SCALE_FACTOR=100 BASE_FROM_ENGINE=1 SCALE_QUERIES=$LINEAR \
  python3 tools/sf1_scale_oracle.py /root/testdata/sf0.1 $BASE_OUT $BIG_OUT \
  /tmp/sf100x_linear.json $BIG 2>&1 | tee "$LOGDIR/oracle_linear.log"

step "Oracle: graph family (base = independent DuckDB at sf0.01)"
SCALE_FACTOR=100 SCALE_QUERIES=$GRAPHQ \
  python3 tools/sf1_scale_oracle.py /root/testdata/sf0.01 $GRAPH_BASE_OUT $GRAPH_OUT \
  /tmp/sf100x_graph.json 2>&1 | tee "$LOGDIR/oracle_graph.log"

step "Merge -> CORRECTNESS_sf100x.json + base-vs-100x wall-time ratios"
python3 - <<'EOF'
import json
lin = json.load(open("/tmp/sf100x_linear.json"))
gra = json.load(open("/tmp/sf100x_graph.json"))
# Honest provenance per family: graph bases ARE an independent DuckDB
# replay at sf0.01; linear bases are the engine's own oracle-verified
# sf0.1 dumps (BASE_FROM_ENGINE=1), so the algebra checks the 100x run
# against the base run (self-consistency), not an independent oracle.
for v in gra.values():
    v["oracle"] = "sf100x-replication-algebra(F=100, base=independent-duckdb@sf0.01)"
for v in lin.values():
    if v["oracle"].endswith("captured-centroids"):
        v["oracle"] = "sf100x-direct-replay-captured-centroids(independent-duckdb@100x)"
    else:
        v["oracle"] = "sf100x-replication-algebra(F=100, base=engine-dumps@sf0.1, self-consistency)"
merged = dict(lin); merged.update(gra)
json.dump(merged, open("CORRECTNESS_sf100x.json", "w"), indent=2)
npass = sum(1 for v in merged.values()
            if v["rows_match"] and v["schema_match"] and v["hash_match"])
print(f"== sf100x tier: {npass}/{len(merged)} hash-exact")

# Wall-time ratio table: 100x data on the same 32 cores vs the base run.
# Each family against ITS base corpus: linear = sf0.1, graph = sf0.01.
ratios = {}
for base_path, big_path, base_sf in (
        ("/tmp/vo_sf01_base/verify_times.json",
         "/tmp/vo_sf100x/verify_times.json", "sf0.1"),
        ("/tmp/vo_0.01/verify_times.json",
         "/tmp/vo_sf100xg/verify_times.json", "sf0.01")):
    base = json.load(open(base_path))
    big = json.load(open(big_path))
    for q in sorted(big):
        if q in base:
            ratios[q] = {"base_sf": base_sf, "base_s": base[q],
                         "sf100x_s": big[q],
                         "ratio": round(big[q] / base[q], 2)}
json.dump(ratios, open("SCALE_sf100x_ratios.json", "w"), indent=2)
print("== ratios ->", "SCALE_sf100x_ratios.json")
EOF
step "done"
