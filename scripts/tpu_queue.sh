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
#  6. (optional, ~2h) refresh the stacked row with ANNEALED warp families —
#     level_anneal_steps flows through default_interp_families' warp_kwargs;
#     use a fresh cache dir so the 26.16 row's provenance stays intact:
# python - <<'PY'
# import json
# from mri_interpolation_tpu.io import load_volume
# from mri_interpolation_tpu.train import TrainConfig
# from mri_interpolation_tpu.train.stacking import stacked_interp_eval
# img = load_volume('/root/reference/sample_ankle_dyn_mri.nii.gz',
#                   slice_axes=(slice(None), slice(None), 3, slice(None))).image()
# cfg = TrainConfig(batch_size=10000, epochs=100, lr=1e-2, optimizer="adam_tcnn",
#                   lr_schedule="cosine", cosine_t_max=100, weight_decay=1e-5)
# _, q = stacked_interp_eval(img, cfg, seeds=(1337, 7, 23, 99),
#                            level_anneal_steps=600,
#                            cache_dir="runs/stacked_cache_ep100_anneal")
# print(json.dumps({"odd": q["odd"], "weights": q["weights"]["global"]}))
# PY
python -u scripts/experiments.py --render-only
echo "queue done — review RESULTS.md + /tmp/bench_r03_smoke.json, then commit"
