"""Benchmark entry point — prints ONE JSON line for the driver.

Headline metric: training throughput in voxel-evaluations/sec for the
flagship HashMLP on the reference's canonical workload (the (352,352,15)
(x,y,t) slice of sample_ankle_dyn_mri.nii.gz with the default HashConfig:
4 levels x 1 feature, log2_hashmap 23, base (64,64,5) -> finest (352,352,15),
batch 10000, lr 5e-3 — reference config/base.py:57-89). Also measured and
reported in the side fields: steady train steps/sec, reconstruction PSNR, and
dense-grid inference voxels/sec.

vs_baseline: the reference publishes no numbers (BASELINE.md). The only
reference-derived per-iteration datum is the notebook's anecdote — a large
SIREN 2D+t fit, batch 90000, 150 epochs of 20 steps in ~30 min on the
author's GPU (ReprésentationsImplicites.ipynb cell 30) — i.e. ~1.72 steps/s
* 90000 = 154,800 voxel-evals/sec. We normalize by voxel-evals/sec to compare
across batch sizes. See BENCH_BASELINE.md.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_VOXELS_PER_SEC = 154_800.0  # reference GPU anecdote, see docstring


def main():
    import jax

    from mri_interpolation_tpu.utils import setup_compilation_cache

    setup_compilation_cache()

    from mri_interpolation_tpu.io import load_volume
    from mri_interpolation_tpu.infer import evaluate_grid
    from mri_interpolation_tpu.metrics import evaluate_reconstruction
    from mri_interpolation_tpu.models import make_hash_mlp
    from mri_interpolation_tpu.train import TrainConfig, Trainer

    ds = load_volume(
        "/root/reference/sample_ankle_dyn_mri.nii.gz",
        slice_axes=(slice(None), slice(None), 3, slice(None)),
    )

    model = make_hash_mlp(
        dim_in=3,
        n_levels=4,
        n_features_per_level=1,
        log2_hashmap_size=23,
        base_resolution=(64, 64, 5),
        finest_resolution=(352, 352, 15),
        dim_hidden=64,
        n_layers=2,
        lr=5e-3,
    )

    batch = 10000
    cfg = TrainConfig(batch_size=batch, epochs=30, lr=5e-3, seed=1337)
    result = Trainer(cfg).fit(model, ds.coords, ds.values)
    steps_per_sec = result.steady_steps_per_sec
    voxels_per_sec = steps_per_sec * batch

    # quality: full-volume reconstruction PSNR
    recon = evaluate_grid(model, result.params, result.state, ds.shape)
    t0 = time.perf_counter()
    recon = evaluate_grid(model, result.params, result.state, ds.shape)  # warm
    grid_vox_per_sec = np.prod(ds.shape) / (time.perf_counter() - t0)
    quality = evaluate_reconstruction(
        jax.numpy.asarray(recon), jax.numpy.asarray(ds.image()), data_range=1.0
    )

    # secondary row: the TPU-native Instant-NGP-class quality config (full-res
    # dense levels + batch-scaling gathered path; RESULTS.md) — the
    # high-quality regime the literal tcnn config (hashed, scatter-bound)
    # cannot reach on this chip.
    ngp = make_hash_mlp(
        dim_in=3,
        n_levels=3,
        n_features_per_level=2,
        log2_hashmap_size=23,
        base_resolution=(64, 64, 5),
        finest_resolution=(352, 352, 15),
        growth="paper",
        dim_hidden=64,
        n_layers=2,
        decoder="relu_plain",
    )
    ngp_epochs = 30
    ngp_cfg = TrainConfig(batch_size=batch, epochs=ngp_epochs, lr=1e-2, seed=1337,
                          optimizer="adam_tcnn", lr_schedule="cosine", cosine_t_max=ngp_epochs)
    ngp_result = Trainer(ngp_cfg).fit(ngp, ds.coords, ds.values)
    ngp_recon = evaluate_grid(ngp, ngp_result.params, ngp_result.state, ds.shape)
    ngp_quality = evaluate_reconstruction(
        jax.numpy.asarray(ngp_recon), jax.numpy.asarray(ds.image()), data_range=1.0
    )

    print(
        json.dumps(
            {
                "metric": "train_voxel_evals_per_sec",
                "value": round(float(voxels_per_sec), 1),
                "unit": "voxels/s",
                "vs_baseline": round(float(voxels_per_sec / BASELINE_VOXELS_PER_SEC), 2),
                "steady_steps_per_sec": round(float(steps_per_sec), 1),
                "recon_psnr_db": round(quality["psnr"], 2),
                "recon_ssim": round(quality.get("ssim", float("nan")), 4),
                "grid_eval_voxels_per_sec": round(float(grid_vox_per_sec), 1),
                "train_wall_s": round(result.wall_time_s, 2),
                "ngp_steps_per_sec": round(float(ngp_result.steady_steps_per_sec), 1),
                "ngp_psnr_db": round(ngp_quality["psnr"], 2),
                "ngp_epochs": ngp_epochs,
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
