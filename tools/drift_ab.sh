#!/bin/bash
# Interleaved pinned-tree bench A/B: the in-band drift control.
#
# Runs the CURRENT tree and the ROUND-1 ANCHOR tree (commit 9a376b3,
# the driver's 2x-rule anchor) as alternating solo-JVM Bench processes
# over the anchor's 41 queries, min over runs per side, and writes
# DRIFT_latest.json. Because the anchor's code never changes, its
# number moving between rounds measures the HOST; the current tree's
# delta beyond that measures the CODE. Alternation (A B A B...) makes
# both sides sample the same host weather instead of one side eating a
# slow band (the round-8 lesson: four after-the-fact re-runs were
# needed to prove a +11.6% "regression" was drift).
#
# Usage: tools/drift_ab.sh [runs-per-side]   (default 2)
set -euo pipefail
RUNS=${1:-2}
ANCHOR=9a376b3
SF=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
ROOT=$(git rev-parse --show-toplevel)
WT=/tmp/graft_anchor_wt

# the anchor's 41 query names, straight from the committed round-1 record
ONLY=$(python3 - <<'EOF'
import json, re
d = json.load(open('BENCH_r01.json'))
m = re.search(r'\{"metric".*', d['tail'])
print(','.join(sorted(json.loads(m.group(0))['queries'])))
EOF
)

if [ ! -d "$WT" ]; then
  git -C "$ROOT" worktree add "$WT" "$ANCHOR" >/dev/null
fi
echo "building anchor ($ANCHOR) and current trees..." >&2
(cd "$WT" && sbt -batch compile >/dev/null 2>&1)
(cd "$ROOT" && sbt -batch compile >/dev/null 2>&1)

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent \
         java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
MEM=${SPARK_DRIVER_MEM:-12g}

run_one() { # $1 = tree root; prints the bench total (sec)
  local tree=$1
  (cd /tmp && SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_ONLY="$ONLY" \
    java $ADD_OPENS -Xms"$MEM" -Xmx"$MEM" -XX:ReservedCodeCacheSize=2g \
      -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
      -cp "$tree/target/scala-2.13/classes:/opt/spark/jars/*" \
      graft.Bench 2>/dev/null) |
    grep -o '{"metric".*' | python3 -c \
      'import json,sys; print(json.load(sys.stdin)["value"])'
}

cur=() anc=()
for i in $(seq "$RUNS"); do
  echo "run $i/$RUNS: current..." >&2
  cur+=("$(run_one "$ROOT")")
  echo "run $i/$RUNS: anchor..." >&2
  anc+=("$(run_one "$WT")")
done

python3 - "$ANCHOR" "$RUNS" "$ONLY" "${cur[@]}" "${anc[@]}" <<'EOF'
import json, sys
anchor, runs, only = sys.argv[1], int(sys.argv[2]), sys.argv[3]
vals = [float(x) for x in sys.argv[4:]]
cur, anc = vals[:runs], vals[runs:]
rec = {
    "anchor_commit": anchor,
    "runs_per_side": runs,
    "common_query_count": len([q for q in only.split(",") if q]),
    "current_runs_sec": cur,
    "anchor_runs_sec": anc,
    "current_min_sec": min(cur),
    "anchor_min_sec": min(anc),
    "ratio_current_over_anchor": min(cur) / min(anc),
    "note": ("anchor tree is byte-fixed: its min moving between rounds "
             "measures the host; the ratio measures the code"),
}
with open("DRIFT_latest.json", "w") as f:
    json.dump(rec, f, indent=2)
print(json.dumps(rec, indent=2))
EOF
