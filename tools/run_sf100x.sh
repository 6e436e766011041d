#!/bin/bash
# sf100x scale tier: 100x replication of sf0.1 for the linear/invariant
# body, plus 100x of sf0.01 for the graph family (the label-block cosine
# join is block-quadratic, so the graph corpus holds vertex count at the
# already-validated sf1-tier level while still exercising the F=100
# closed forms: TRI_EDGE=14850, TRI_OWN=4851, degree' = 100d+99).
# Excluded from the big tier: q22/q23 (expected-side self-pair volume is
# C(100,2) x docs ~ 25M rows -- a compare-harness cost, not an engine one;
# the pair family is already hash-exact at F=10 on two corpora).
# Serialized sbt invocations (project lock).
set -e
cd /root/repo

BIG=/tmp/sf100x          # 100x of sf0.1
GRAPH=/tmp/sf100xg       # 100x of sf0.01
BASE_OUT=/tmp/vo_sf01_base
BIG_OUT=/tmp/vo_sf100x
GRAPH_OUT=/tmp/vo_sf100xg

LINEAR=q61,q81,q82,q87,q91,q99,q103,q107,q109,q110,q117,q121,q122,q123,q134,q144,q145,q146
# base run also needs q22/q23/q135/q136/q137 dumps+oracles (the script
# creates every base table before filtering)
BASEQ=q22,q23,q61,q81,q82,q87,q91,q99,q103,q107,q109,q110,q117,q121,q122,q123,q134,q135,q136,q137,q144

step() { echo "=== [$(date +%H:%M:%S)] $1"; }

if [ ! -d "$BIG/documents.parquet" ]; then
  step "ScaleUp sf0.1 -> $BIG x100"
  sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.1 $BIG 100"
fi
if [ ! -d "$GRAPH/documents.parquet" ]; then
  step "ScaleUp sf0.01 -> $GRAPH x100"
  sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.01 $GRAPH 100"
fi

step "Verify base subset at sf0.1 -> $BASE_OUT"
rm -rf "$BASE_OUT"
SPARK_GRAFT_ONLY=$BASEQ SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Verify /root/testdata/sf0.1 $BASE_OUT"

step "Verify linear body at 100x -> $BIG_OUT"
rm -rf "$BIG_OUT"
SPARK_GRAFT_ONLY=$LINEAR SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Verify $BIG $BIG_OUT"

step "Verify graph family at 100x(sf0.01) -> $GRAPH_OUT"
rm -rf "$GRAPH_OUT"
SPARK_GRAFT_ONLY=q135,q136,q137 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Verify $GRAPH $GRAPH_OUT"

step "Oracle: linear body (base = sf0.1 engine dumps)"
SCALE_FACTOR=100 BASE_FROM_ENGINE=1 SCALE_QUERIES=$LINEAR \
  python3 tools/sf1_scale_oracle.py /root/testdata/sf0.1 $BASE_OUT $BIG_OUT \
  /tmp/sf100x_linear.json $BIG

step "Oracle: graph family (base = independent DuckDB at sf0.01)"
SCALE_FACTOR=100 SCALE_QUERIES=q135,q136,q137 \
  python3 tools/sf1_scale_oracle.py /root/testdata/sf0.01 /tmp/vo_0.01 $GRAPH_OUT \
  /tmp/sf100x_graph.json

step "Merge -> CORRECTNESS_sf100x.json"
python3 - <<'EOF'
import json
lin = json.load(open("/tmp/sf100x_linear.json"))
gra = json.load(open("/tmp/sf100x_graph.json"))
for v in gra.values():
    v["oracle"] = v["oracle"].replace("sf1-", "sf100x(sf0.01-base)-")
for v in lin.values():
    v["oracle"] = v["oracle"].replace("sf1-", "sf100x(sf0.1-base)-")
merged = dict(lin); merged.update(gra)
json.dump(merged, open("CORRECTNESS_sf100x.json", "w"), indent=2)
npass = sum(1 for v in merged.values()
            if v["rows_match"] and v["schema_match"] and v["hash_match"])
print(f"== sf100x tier: {npass}/{len(merged)} hash-exact")
EOF
step "done"
