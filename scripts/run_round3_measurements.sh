#!/bin/bash
# Round-3 measurement sequence — run with the machine otherwise QUIET
# (the tunnel multiplexes processes onto one chip and the single CPU core
# inflates dispatch; see memory notes). Each stage appends to results.json
# and re-renders RESULTS.md.
set -e
cd "$(dirname "$0")/.."
echo "=== 2D+t matrix + protocol + traces ==="
python scripts/experiments.py
echo "=== full-4D fits + 4D protocol ==="
python scripts/experiments.py --full4d
echo "=== two-phase + undersampling rows ==="
python scripts/experiments.py --aux
echo "=== LOO-stacked fusion (disk-cached; resumes a crashed run) ==="
python scripts/experiments.py --stacked
echo "=== 4D LOO-stacked fusion ==="
python scripts/experiments.py --stacked4d
echo "=== bench ==="
python bench.py | tail -1 | tee /tmp/bench_r3.json
echo "done"
