#!/bin/bash
# The round-3 TPU-return queue: run these IN ORDER once `jax.devices()`
# answers again, with the machine otherwise quiet (single CPU core — any
# concurrent process depresses measured steps/s; see memory notes).
#
#   bash scripts/tpu_queue.sh
#
# Steps:
#  1. stop the insurance CPU stacked4d run if still alive (pid recorded at
#     /tmp/stacked4d_cpu.pid by the session that started it),
#  2. finish the 4D stacked-fusion row on the TPU (cache-resumable; the
#     classical families and any warp entries the CPU run completed are
#     reused verbatim),
#  3. refresh the driver bench fields,
#  4. re-render RESULTS.md.
set -e
cd "$(dirname "$0")/.."

if [ -f /tmp/stacked4d_cpu.pid ] && kill -0 "$(cat /tmp/stacked4d_cpu.pid)" 2>/dev/null; then
  echo "stopping CPU stacked4d run ($(cat /tmp/stacked4d_cpu.pid))"
  kill "$(cat /tmp/stacked4d_cpu.pid)"
  sleep 5
fi

python -c "import jax; d = jax.devices(); assert d[0].platform != 'cpu', d; print('TPU ok:', d)"

python -u scripts/experiments.py --stacked4d
python -u bench.py | tee /tmp/bench_r03_smoke.json
#  5. (optional, ~1h) re-measure the warp sweep with the level-anneal rows —
#     the round-3 CPU A/B found +0.29 dB held-out from annealing the warp's
#     canonical encoder; the sweep's ensemble row now uses it:
# python -u scripts/warp_sweep.py
python -u scripts/experiments.py --render-only
echo "queue done — review RESULTS.md + /tmp/bench_r03_smoke.json, then commit"
