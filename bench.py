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

import argparse
import json
import os
import time

import numpy as np

BASELINE_VOXELS_PER_SEC = 154_800.0  # reference GPU anecdote, see docstring


def _devices_nonblocking(timeout_s: float = 60.0) -> int:
    """Shared watchdog device enumeration (utils.device_count_nonblocking):
    a dead tunnel must yield 0 — the driver always gets its one JSON line."""
    from mri_interpolation_tpu.utils import device_count_nonblocking

    return device_count_nonblocking(timeout_s)


def _cpu_fallback() -> None:
    """Re-exec the bench in a CPU child with the axon plugin disabled.

    A dead tunnel at bench time must degrade to an honest, clearly-tagged
    CPU measurement (epochs reduced — the point is a valid record, not a
    20-minute CPU soak), never a hang. The child env drops
    PALLAS_AXON_POOL_IPS so sitecustomize skips plugin registration."""
    import os
    import subprocess
    import sys

    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    env["JAX_PLATFORMS"] = "cpu"
    env["_MRI_TPU_BENCH_CPU_FALLBACK"] = "1"
    repo = os.path.dirname(os.path.abspath(__file__))
    cmd = [sys.executable, os.path.join(repo, "bench.py"), "--headline-only"]
    proc = subprocess.run(cmd, cwd=repo, env=env, timeout=3000)
    sys.exit(proc.returncode)


def _cached_stacked_row(img, cache="runs/stacked_cache_ep100_anneal"):
    """Score the LOO-stacked fusion from the git-committed family caches.

    The stacked protocol itself costs ~100 warp-INR fits, far beyond a bench
    budget — but its family predictions (deploy + LOO folds) are committed
    under ``runs/stacked_cache_ep100_anneal``, and ``stacked_fuse`` never
    calls a family whose prediction is cached. Re-solving the honest LOO
    weights and fusing is therefore CPU-cheap here, which lets the
    driver-recorded bench carry the framework's actual held-out headline
    (RESULTS.md protocol table) instead of only the single-model rows.
    Returns None (row skipped) when the cache is absent or incomplete."""
    import glob

    from mri_interpolation_tpu.metrics import evaluate_reconstruction
    from mri_interpolation_tpu.train.stacking import stacked_fuse

    names = sorted(
        os.path.basename(p)[len("deploy_"):-len(".npy")]
        for p in glob.glob(os.path.join(cache, "deploy_*.npy")))
    n_even = (img.shape[-1] + 1) // 2
    if not names or any(
            not os.path.exists(os.path.join(cache, f"fold{k}_{n}.npy"))
            for n in names for k in range(1, n_even - 1)):
        return None

    def _missing(*_a, **_k):
        raise AssertionError("cache claimed complete but a family was called")

    even = img[..., ::2]
    t_full = img.shape[-1]
    t_keep = np.asarray([2 * j / (t_full - 1) for j in range(even.shape[-1])])
    t_odd = np.asarray([(2 * j + 1) / (t_full - 1) for j in range(t_full // 2)])
    fused, weights = stacked_fuse(even, t_keep, t_odd,
                                  {n: _missing for n in names},
                                  cache_dir=cache)
    weights.pop("_components", None)
    import jax.numpy as jnp

    q = evaluate_reconstruction(jnp.asarray(fused),
                                jnp.asarray(img[..., 1::2]), data_range=1.0)
    tag = "stacked4d" if img.ndim == 4 else "stacked"
    return {f"odd_psnr_db_{tag}": round(q["psnr"], 2),
            f"odd_ssim_{tag}": round(q.get("ssim", float("nan")), 4),
            f"{tag}_n_families": len(names),
            f"{tag}_source": cache}


def main(argv=None):
    import os

    ap = argparse.ArgumentParser()
    ap.add_argument("--headline-only", action="store_true",
                    help="skip the NGP and interpolation-protocol side rows "
                         "(roughly halves bench wall time)")
    args = ap.parse_args(argv)
    is_fallback = os.environ.get("_MRI_TPU_BENCH_CPU_FALLBACK") == "1"
    if not is_fallback and _devices_nonblocking() == 0:
        _cpu_fallback()
        return
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
    epochs = 5 if is_fallback else 30
    cfg = TrainConfig(batch_size=batch, epochs=epochs, lr=5e-3, seed=1337)
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

    # Inference decomposition (VERDICT r2 Next #2). The end-to-end number
    # above is pinned by this environment's ~35 MB/s TPU-tunnel D2H link
    # (measured raw; a production host moves GB/s over PCIe), so report the
    # pieces: device-side compute (apples-to-apples with the training
    # metric, which never ships volumes to host), the u16-transport
    # end-to-end (half the bytes at a ~107 dB quantization floor), and the
    # link bandwidth itself.
    from mri_interpolation_tpu.infer.grid import device_eval_seconds

    n_vox = float(np.prod(ds.shape))
    dev_s = device_eval_seconds(model, result.params, result.state, ds.shape)
    evaluate_grid(model, result.params, result.state, ds.shape, transport="u16")  # compile
    t0 = time.perf_counter()
    evaluate_grid(model, result.params, result.state, ds.shape, transport="u16")
    u16_s = time.perf_counter() - t0
    grid_dev_vox_per_sec = n_vox / dev_s
    transfer_s = max(n_vox / grid_vox_per_sec - dev_s, 1e-9)
    transfer_mb_s = n_vox * 4 / 2**20 / transfer_s

    # Steady-state wall (epochs x median epoch time): the headline
    # train_wall_s absorbs compile + tunnel contention and reads as a
    # regression whenever the chip is shared (VERDICT r2 Weak #8); this field
    # is the comparable number across rounds.
    med_epoch = float(np.median(result.epoch_times_s[1:])) if len(result.epoch_times_s) > 1 else float("nan")
    steady_wall = cfg.epochs * med_epoch

    record = {
        "metric": "train_voxel_evals_per_sec",
        "value": round(float(voxels_per_sec), 1),
        "unit": "voxels/s",
        "vs_baseline": round(float(voxels_per_sec / BASELINE_VOXELS_PER_SEC), 2),
        "steady_steps_per_sec": round(float(steps_per_sec), 1),
        "recon_psnr_db": round(quality["psnr"], 2),
        "recon_ssim": round(quality.get("ssim", float("nan")), 4),
        "grid_eval_voxels_per_sec": round(float(grid_vox_per_sec), 1),
        "grid_eval_device_voxels_per_sec": round(float(grid_dev_vox_per_sec), 1),
        "grid_eval_u16_voxels_per_sec": round(float(n_vox / u16_s), 1),
        "host_transfer_mb_per_sec": round(float(transfer_mb_s), 1),
        "train_wall_s": round(result.wall_time_s, 2),
        "steady_train_wall_s": round(steady_wall, 2),
        "device": str(jax.devices()[0]),
    }
    if is_fallback:
        # honest degradation: the TPU tunnel did not answer the watchdog, so
        # these are CPU numbers at a reduced epoch budget — comparable to
        # nothing, but a valid record instead of a hang.
        record["tpu_tunnel_unreachable"] = True
        record["epochs"] = epochs

    if not args.headline_only:
        # secondary row: the TPU-native Instant-NGP-class quality config
        # (full-res dense levels + batch-scaling gathered path; RESULTS.md) —
        # the high-quality regime the literal tcnn config (hashed,
        # scatter-bound) cannot reach on this chip.
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
        record.update({
            "ngp_steps_per_sec": round(float(ngp_result.steady_steps_per_sec), 1),
            "ngp_psnr_db": round(ngp_quality["psnr"], 2),
            "ngp_epochs": ngp_epochs,
        })

        # the capability the framework exists for: held-out temporal
        # interpolation (even-frame protocol) — motion-compensated warp INR
        # vs the classical linear resampler (VERDICT r2 Next #6).
        from mri_interpolation_tpu.infer import linear_interpolate_volume
        from mri_interpolation_tpu.models import make_warp_inr
        from mri_interpolation_tpu.train.protocols import even_frame_fit_eval

        img = ds.image()
        warp = make_warp_inr(
            dim_in=3, n_levels=4, n_features_per_level=4, log2_hashmap_size=23,
            base_resolution=(64, 64), finest_resolution=(352, 352),
            dim_hidden=64, n_layers=2, warp_hidden=64, warp_layers=3,
            warp_w0=5.0, warp_scale=0.05, residual_scale=0.05, warp_accel=1.0,
            # coarse-to-fine curriculum on the canonical encoder: +0.29 dB
            # held-out across seeds (CHANGES.md round-3 A/B)
            level_anneal_steps=600,
        )
        warp_epochs = 60
        warp_cfg = TrainConfig(batch_size=batch, epochs=warp_epochs, lr=1e-2, seed=1337,
                               optimizer="adam_tcnn", lr_schedule="cosine",
                               cosine_t_max=warp_epochs, weight_decay=1e-5)
        warp_result, warp_q = even_frame_fit_eval(warp, img, warp_cfg)
        lin = linear_interpolate_volume(img[..., ::2], img.shape)
        lin_q = evaluate_reconstruction(
            jax.numpy.asarray(lin[..., 1::2]), jax.numpy.asarray(img[..., 1::2])
        )
        # same trained fit, second deployment: motion transfer (the INR's
        # deformation applied to the OBSERVED frames' appearance —
        # infer/registration.py:motion_transfer_at; best SSIM of any single
        # family on the full protocol, RESULTS.md)
        from mri_interpolation_tpu.infer.registration import motion_transfer_at

        even = img[..., ::2]
        t_full = img.shape[-1]
        t_keep = np.asarray([2 * j / (t_full - 1) for j in range(even.shape[-1])])
        t_odd = np.asarray([(2 * j + 1) / (t_full - 1) for j in range(t_full // 2)])
        wf = warp.hparams["warp_field"]
        transfer = motion_transfer_at(
            even, t_keep, t_odd, lambda x: wf(warp_result.params, x))
        transfer_q = evaluate_reconstruction(
            jax.numpy.asarray(transfer), jax.numpy.asarray(img[..., 1::2])
        )
        record.update({
            "odd_psnr_db_warp": round(warp_q["odd"]["psnr"], 2),
            "odd_ssim_warp": round(warp_q["odd"].get("ssim", float("nan")), 4),
            "odd_psnr_db_warp_transfer": round(transfer_q["psnr"], 2),
            "odd_ssim_warp_transfer": round(transfer_q.get("ssim", float("nan")), 4),
            "odd_psnr_db_linear": round(lin_q["psnr"], 2),
            "odd_ssim_linear": round(lin_q.get("ssim", float("nan")), 4),
            "warp_epochs": warp_epochs,
        })

        # full stacked-fusion headlines from the committed family caches
        # (fit-free, CPU-cheap; None when the artifacts are absent)
        stacked_row = _cached_stacked_row(img)
        if stacked_row is not None:
            record.update(stacked_row)
        img4d = load_volume("/root/reference/sample_ankle_dyn_mri.nii.gz").image()
        stacked4d_row = _cached_stacked_row(
            img4d, cache="runs/stacked4d_cache_ep60_anneal")
        if stacked4d_row is not None:
            record.update(stacked4d_row)

    print(json.dumps(record))


if __name__ == "__main__":
    main()
