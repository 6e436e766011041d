# Shared helpers for the scale-tier pipelines (run_sf10_tiers.sh /
# run_sf100x.sh). Source, don't execute.

step() { echo "=== [$(date +%H:%M:%S)] $1"; }

# Corpus is complete only when every table dir carries Spark's _SUCCESS
# (the dir appears as soon as the first write starts, and table order is
# a map's — "documents exists" proves nothing about the other nine).
corpus_complete() {
  local dir=$1
  for t in region nation customer supplier part orders lineitem events documents embeddings; do
    [ -f "$dir/$t.parquet/_SUCCESS" ] || return 1
  done
  return 0
}

# Queries from a comma-list still missing a _SUCCESS dump under outdir.
missing_queries() {
  local outdir=$1 qlist=$2
  python3 - "$outdir" "$qlist" <<'PYEOF'
import glob, sys
outdir, qlist = sys.argv[1], sys.argv[2]
missing = []
for q in qlist.split(","):
    hits = glob.glob(f"{outdir}/{q}_*/_SUCCESS") + glob.glob(f"{outdir}/{q}/_SUCCESS")
    if not hits:
        missing.append(q)
print(",".join(missing))
PYEOF
}

# Run Verify for the missing subset only, then merge the sidecar JSONs
# (a subset pass writes only its own entries — without the merge a
# resumed tier would lose the completed queries' oracles/times).
# Uses $LOGDIR for the step log.
run_verify() {
  local sfdir=$1 outdir=$2 qlist=$3 logname=$4
  local miss
  miss=$(missing_queries "$outdir" "$qlist")
  if [ -z "$miss" ]; then
    step "Verify $outdir already complete — skipped"
    return 0
  fi
  step "Verify $sfdir -> $outdir (running: $miss)"
  mkdir -p "$outdir"
  for f in oracle_sql.json verify_times.json plan_signatures.json; do
    [ -f "$outdir/$f" ] && cp "$outdir/$f" "$outdir/$f.prev" || true
  done
  SPARK_GRAFT_ONLY=$miss SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Verify $sfdir $outdir" \
    2>&1 | tee "$LOGDIR/$logname.log"
  for f in oracle_sql.json verify_times.json plan_signatures.json; do
    if [ -f "$outdir/$f.prev" ]; then
      python3 - "$outdir/$f" <<'PYEOF'
import json, sys
path = sys.argv[1]
prev = json.load(open(path + ".prev"))
new = json.load(open(path))
prev.update(new)  # this pass's entries win
json.dump(prev, open(path, "w"), indent=0)
PYEOF
      rm -f "$outdir/$f.prev"
    fi
  done
}
