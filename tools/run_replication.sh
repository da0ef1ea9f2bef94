#!/bin/bash
# Wait for a clean host window (multi-core steal gate), then run one
# gated replication pair and save its JSON.  Usage:
#   bash tools/run_replication.sh <out.json> [rounds] [pages]
# Pages must put BOTH legs inside the leg-time protocol window for the
# current engine (BENCH/BASELINE.md: lo ≤ 20 min, hi ≥ 4× the ~30 s
# serial floor) — for the r5 engine that is ≥ 120000.
# The box must stay otherwise idle while this runs — concurrent Spark
# jobs silently depress multi-core efficiency readings the single-core
# burn gate cannot see.
set -e
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/pair_rep.json}"
ROUNDS="${2:-4}"
PAGES="${3:-120000}"

python - <<'EOF'
import sys, time
sys.path.insert(0, "tools")
from bench_scaling import window_probe
for i in range(240):  # up to ~4h of patience
    pr = window_probe()
    clean = pr["mc_ratio"] >= 0.85 and pr["per_proc_mops_1"] >= 12.0
    print(f"probe {i}: {pr} clean={clean}", flush=True)
    if clean:
        sys.exit(0)
    time.sleep(50)
sys.exit(1)
EOF

# production shape: every page seeded up front (few giant rounds) — the
# only shape pair_prod.json pools.  --pair also forces this itself.
export SPARK_GRAFT_BENCH_SEED_EVERY=1
python tools/bench_scaling.py --pair 2 "$PAGES" "$ROUNDS" 2>/dev/null | tail -1 > "$OUT"
echo "pair done -> $OUT"
python - "$OUT" <<'EOF'
import json, sys
p = json.load(open(sys.argv[1]))
print("per-round:", p["per_round_efficiency"])
print("clean:", [r["clean"] for r in p["rounds"]])
print("best-of:", p["scaling_efficiency"], "median:", p["median_efficiency"])
EOF
