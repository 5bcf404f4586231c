#!/bin/bash
# Round-5 MFU experiment queue (round-4 VERDICT item 3). Runs on a clean
# chip AFTER queue10 — one experiment at a time, results appended as JSON
# lines to results/mfu_round5/log.jsonl (plus the raw profile_mfu output
# per experiment). Experiments:
#   base-256 / base-512 : re-measure the round-3 sampling baselines
#   lab4d-256 / lab4d-512: DMT_LAB_4D=1 — kernel consumes the conv-shaped
#       NHWC tensor directly (the ~0.3 ms/site boundary-relayout lever)
#   train-256 (+trace)  : train-step per-op breakdown to pick the next lever
#   train-lab4d-256     : the 4-D boundary through the analytic bwd kernel
set -x
cd "$(dirname "$0")/.."
OUT=results/mfu_round5
mkdir -p $OUT

run() {
  name=$1; shift
  timeout 1200 "$@" > $OUT/$name.json 2> $OUT/$name.err
  python - "$name" <<'EOF'
import json, sys
from pathlib import Path
name = sys.argv[1]
p = Path(f"results/mfu_round5/{name}.json")
try:
    rec = json.loads(p.read_text())
except Exception:
    rec = {"error": p.with_suffix(".err").read_text()[-500:]}
rec["experiment"] = name
with open("results/mfu_round5/log.jsonl", "a") as f:
    f.write(json.dumps(rec) + "\n")
print(name, "->", {k: rec.get(k) for k in ("throughput", "mfu_wall", "mfu_device", "error")})
EOF
}

run base-256        python scripts/profile_mfu.py --what sample --batch 256 --runs 3
run lab4d-256       env DMT_LAB_4D=1 python scripts/profile_mfu.py --what sample --batch 256 --runs 3
run base-512        python scripts/profile_mfu.py --what sample --batch 512 --runs 3
run lab4d-512       env DMT_LAB_4D=1 python scripts/profile_mfu.py --what sample --batch 512 --runs 3
run train-256       python scripts/profile_mfu.py --what train --batch 256 --runs 3 --trace --top 20
run train-lab4d-256 env DMT_LAB_4D=1 python scripts/profile_mfu.py --what train --batch 256 --runs 3
run sample-trace-256 python scripts/profile_mfu.py --what sample --batch 256 --runs 3 --trace --top 20

echo "MFU ROUND5 QUEUE DONE"
