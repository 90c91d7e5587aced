"""Warp-INR held-out interpolation sweep (VERDICT r2 Next #5).

Sweeps the motion-compensated model's levers on the 2D+t even-frame
protocol — temporal-acceleration and spatial-smoothness priors, residual
frequency/regularization, capacity, schedule length, coarse-to-fine, seed
ensembling and linear blending — and writes the measured rows into
results.json under "warp_sweep" (rendered in RESULTS.md).

Run on TPU with the machine quiet: python scripts/warp_sweep.py [--fast]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from mri_interpolation_tpu.utils import setup_compilation_cache

setup_compilation_cache()

from mri_interpolation_tpu.infer import linear_interpolate_volume
from mri_interpolation_tpu.io import load_volume
from mri_interpolation_tpu.metrics import evaluate_reconstruction
from mri_interpolation_tpu.models import make_warp_inr
from mri_interpolation_tpu.train import TrainConfig
from mri_interpolation_tpu.train.protocols import (
    ensembled_warp_fit_eval,
    even_frame_fit_eval,
)

SAMPLE = "/root/reference/sample_ankle_dyn_mri.nii.gz"
BASE = dict(dim_in=3, n_levels=4, n_features_per_level=4, log2_hashmap_size=23,
            base_resolution=(64, 64), finest_resolution=(352, 352),
            dim_hidden=64, n_layers=2, warp_hidden=64, warp_layers=3,
            warp_w0=5.0, warp_scale=0.05, residual_scale=0.05)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true")
    args = ap.parse_args()
    k = 0.1 if args.fast else 1.0

    img = load_volume(SAMPLE, slice_axes=(slice(None), slice(None), 3, slice(None))).image()
    rows = []

    def tc(ep, seed=1337):
        return TrainConfig(batch_size=10000, epochs=ep, lr=1e-2, optimizer="adam_tcnn",
                           lr_schedule="cosine", cosine_t_max=ep, weight_decay=1e-5, seed=seed)

    def run(name, ep=100, seed=1337, **kw):
        cfg = dict(BASE)
        cfg.update(kw)
        ep = int(ep * k) or 2
        t0 = time.time()
        _, q = even_frame_fit_eval(make_warp_inr(**cfg), img, tc(ep, seed))
        rows.append({"name": name, "epochs": ep,
                     "odd_psnr": round(q["odd"]["psnr"], 3),
                     "odd_ssim": round(q["odd"].get("ssim", float("nan")), 4),
                     "full_psnr": round(q["full"]["psnr"], 2),
                     "wall_s": round(time.time() - t0, 1)})
        print(json.dumps(rows[-1]), flush=True)

    run("base (residual 0.05)")
    run("base, 300 epochs", ep=300)
    run("+ warp_smooth 1e-2", warp_smooth=1e-2)
    run("+ warp_accel 1", warp_accel=1.0)
    run("+ warp_accel 3", warp_accel=3.0)
    run("+ warp_accel 1 + smooth 1e-2", warp_accel=1.0, warp_smooth=1e-2)
    run("F8 canonical", n_features_per_level=8)
    run("residual_w0 2", residual_w0=2.0)
    run("warp_hidden 128 + accel 1", warp_hidden=128, warp_accel=1.0)
    run("warp_scale 0.1 + accel + smooth", warp_scale=0.1, warp_accel=1.0, warp_smooth=1e-2)
    run("+ residual_accel 10 + accel 1", warp_accel=1.0, residual_accel=10.0)
    run("warp_t_scale 0.5 + accel 1", warp_t_scale=0.5, warp_accel=1.0)
    run("accel 1, 200 epochs", ep=200, warp_accel=1.0)
    run("base seed 7 (noise floor)", seed=7)
    # coarse-to-fine curriculum on the canonical encoder (+0.29 dB in the
    # round-3 CPU A/B at 60 epochs; CHANGES.md)
    run("+ anneal 600 + accel 1", warp_accel=1.0, level_anneal_steps=600)
    run("+ anneal 1800 + accel 1", warp_accel=1.0, level_anneal_steps=1800)

    # seed ensemble + linear blends of the best single config (accel 1)
    best = dict(BASE, warp_accel=1.0, level_anneal_steps=600)
    ep = int(100 * k) or 2
    for blend, name in ((0.0, "ENSEMBLE of 4 seeds (accel 1 + anneal 600)"),
                        (0.2, "ensemble + 0.2 linear blend")):
        t0 = time.time()
        q = ensembled_warp_fit_eval(lambda: make_warp_inr(**best), img, tc(ep),
                                    seeds=(1337, 7, 23, 99), linear_blend=blend)
        rows.append({"name": name, "epochs": ep,
                     "odd_psnr": round(q["odd"]["psnr"], 3),
                     "odd_ssim": round(q["odd"].get("ssim", float("nan")), 4),
                     "full_psnr": round(q["full"]["psnr"], 2),
                     "wall_s": round(time.time() - t0, 1)})
        print(json.dumps(rows[-1]), flush=True)

    lin = linear_interpolate_volume(img[..., ::2], img.shape)
    lq = evaluate_reconstruction(jnp.asarray(lin[..., 1::2]), jnp.asarray(img[..., 1::2]))
    rows.append({"name": "classical linear interpolation", "epochs": 0,
                 "odd_psnr": round(lq["psnr"], 3),
                 "odd_ssim": round(lq.get("ssim", float("nan")), 4),
                 "full_psnr": float("nan"), "wall_s": 0.0})

    # merge into results.json + re-render
    from experiments import load_results, write_results_md  # noqa: E402

    out = load_results()
    out["warp_sweep"] = rows
    with open("results.json", "w") as f:
        json.dump(out, f, indent=2)
    write_results_md(out)
    print("wrote warp_sweep into results.json / RESULTS.md")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
