"""Benchmark entry point — prints ONE JSON line for the driver.

Headline metric: training throughput in voxel-evaluations/sec for the
flagship HashMLP on the reference's canonical workload (the (352,352,15)
(x,y,t) slice of sample_ankle_dyn_mri.nii.gz with the default HashConfig:
4 levels x 1 feature, log2_hashmap 23, base (64,64,5) -> finest (352,352,15),
batch 10000, lr 5e-3 — reference config/base.py:57-89). Also measured and
reported in the side fields: steady train steps/sec, reconstruction PSNR, and
dense-grid inference voxels/sec.

Deadline discipline (round-3 postmortem: the driver record timed out at
rc=124 because side rows grew unboundedly): the bench holds a global
wall-clock budget (``--budget-s`` / ``MRI_TPU_BENCH_BUDGET_S``, default 420 s).
Every side row carries a cost estimate and is skipped — recorded under
``skipped_rows`` — when the remaining budget cannot cover it; the JSON line
is printed from a ``finally`` block so even a crash mid-row emits a record.
Expensive quality rows (warp family, stacked fusion) are scored from the
git-committed prediction caches instead of live fits.

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

SAMPLE = "/root/reference/sample_ankle_dyn_mri.nii.gz"
CACHE_2DT = "runs/stacked_cache_ep100_anneal"
CACHE_4D = "runs/stacked4d_cache_ep60_anneal"


def _devices_nonblocking(timeout_s: float = 60.0) -> int:
    """Shared watchdog device enumeration (utils.device_count_nonblocking):
    a dead tunnel must yield 0 — the driver always gets its one JSON line."""
    from mri_interpolation_tpu.utils import device_count_nonblocking

    return device_count_nonblocking(timeout_s)


def _cpu_fallback(budget_s: float) -> None:
    """Re-exec the bench in a CPU child with the axon plugin disabled.

    A dead tunnel at bench time must degrade to an honest, clearly-tagged
    CPU measurement (epochs reduced — the point is a valid record, not a
    20-minute CPU soak), never a hang. The child env drops
    PALLAS_AXON_POOL_IPS so sitecustomize skips plugin registration."""
    import subprocess
    import sys

    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    env["JAX_PLATFORMS"] = "cpu"
    env["_MRI_TPU_BENCH_CPU_FALLBACK"] = "1"
    repo = os.path.dirname(os.path.abspath(__file__))
    cmd = [sys.executable, os.path.join(repo, "bench.py"), "--headline-only",
           "--budget-s", str(budget_s)]
    proc = subprocess.run(cmd, cwd=repo, env=env,
                          timeout=max(120.0, budget_s * 1.5))
    sys.exit(proc.returncode)


def _load_cached_family(cache: str, name: str) -> "np.ndarray | None":
    """Load a committed deploy-time family prediction (odd-frame prediction
    from the all-even-frames fit) from a stacked cache dir. Supports both the
    raw fp32 ``.npy`` layout and the fp16-compressed ``.npz`` layout
    (artifact-policy round 4)."""
    from mri_interpolation_tpu.train.stacking import load_cached_prediction

    return load_cached_prediction(cache, f"deploy_{name}")


def _cached_stacked_row(img, cache=CACHE_2DT):
    """Score the LOO-stacked fusion from the git-committed family caches.

    The stacked protocol itself costs ~100 warp-INR fits, far beyond a bench
    budget — but its family predictions (deploy + LOO folds) are committed,
    and ``stacked_fuse`` never calls a family whose prediction is cached.
    Re-solving the honest LOO weights and fusing is therefore fit-free here,
    which lets the driver-recorded bench carry the framework's actual
    held-out headline (RESULTS.md protocol table) instead of only the
    single-model rows. Returns None (row skipped) when the cache is absent
    or incomplete.

    The roster is the protocol's DEFAULT stack (round-5 pruning — the
    caches also hold the measured-and-pruned zero-weight families, which
    are not part of the shipped estimator); if any default member is
    missing from the cache, falls back to every cached family."""
    from mri_interpolation_tpu.metrics import evaluate_reconstruction
    from mri_interpolation_tpu.train.stacking import (DEFAULT_STACK_2DT,
                                                      DEFAULT_STACK_4D,
                                                      DEFAULT_STACK_Z4D,
                                                      cached_family_names,
                                                      has_cached_prediction,
                                                      stacked_fuse)

    if img.ndim == 4:
        default = list(DEFAULT_STACK_4D)
    else:
        default = list(DEFAULT_STACK_2DT) + [
            f"z4d_{n}" for n in DEFAULT_STACK_Z4D]
    if all(has_cached_prediction(cache, f"deploy_{n}") for n in default):
        names = default
    else:
        names = cached_family_names(cache)
    n_even = (img.shape[-1] + 1) // 2
    if not names or any(
            not has_cached_prediction(cache, f"fold{k}_{n}")
            for n in names for k in range(1, n_even - 1)):
        return None

    def _missing(*_a, **_k):
        raise AssertionError("cache claimed complete but a family was called")

    even = img[..., ::2]
    t_full = img.shape[-1]
    t_keep = np.asarray([2 * j / (t_full - 1) for j in range(even.shape[-1])])
    t_odd = np.asarray([(2 * j + 1) / (t_full - 1) for j in range(t_full // 2)])
    # Protocol matches the RESULTS.md headline rows: nested-LOO spatial field
    # + nested-LOO median shrink, each kept only when the folds say it
    # transfers. The selections are DETERMINISTIC given the committed cache,
    # so the bench replays the values the protocol run recorded in
    # results.json (the widened round-5 candidate grid made the 4D search
    # ~230 s — too slow for a bench row); a missing record falls back to the
    # live nested search.
    spatial, robust = "nested", "median_nested"
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "results.json")) as f:
            res = json.load(f)
        entry = (res.get("full4d", {}).get("stacked") if img.ndim == 4
                 else (res.get("stacked_z4d") or res.get("stacked")))
        sp = entry.get("spatial")
        if sp is not None:
            spatial = (sp["sigma"], sp["temp"], sp["spatial_shrink"])
        rb = entry.get("robust")
        if rb is not None:
            robust = float(rb["lam"])
    except (OSError, ValueError, KeyError, AttributeError, TypeError):
        pass
    fused, weights = stacked_fuse(even, t_keep, t_odd,
                                  {n: _missing for n in names},
                                  cache_dir=cache,
                                  spatial=spatial, robust=robust)
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--headline-only", action="store_true",
                    help="skip every side row (the NGP fit and the cached "
                         "interpolation-protocol scores)")
    ap.add_argument("--budget-s", type=float,
                    default=float(os.environ.get("MRI_TPU_BENCH_BUDGET_S",
                                                 "450")),
                    help="global wall-clock budget; side rows whose cost "
                         "estimate exceeds the remaining budget are skipped "
                         "and listed under skipped_rows")
    args = ap.parse_args(argv)
    deadline = time.monotonic() + args.budget_s

    def remaining() -> float:
        return deadline - time.monotonic()

    is_fallback = os.environ.get("_MRI_TPU_BENCH_CPU_FALLBACK") == "1"
    if not is_fallback and _devices_nonblocking() == 0:
        _cpu_fallback(args.budget_s)
        return

    record = {
        "metric": "train_voxel_evals_per_sec",
        "value": None,
        "unit": "voxels/s",
        "vs_baseline": None,
    }
    skipped: list = []

    # Deadline watchdog: the finally-print protects against exceptions, but
    # not against an OUTER timeout (the driver's) SIGKILLing the process
    # while a tunnel-degraded program load blocks the main thread for
    # minutes (measured 2026-08-20: 90-120 s per cache-HIT load; one such
    # run exceeded 590 s before the budget logic could even run). This
    # thread prints whatever the record holds 15 s before the budget
    # expires and exits the process — a partial record always beats a dead
    # one. The normal path sets done_flag before printing; the watchdog
    # never double-prints.
    import threading

    done_flag = threading.Event()

    def _watchdog():
        done_flag.wait(timeout=max(5.0, args.budget_s - 15.0))
        if done_flag.is_set():
            return
        record["watchdog_fired"] = True
        if skipped:
            record["skipped_rows"] = skipped
        record["budget_s"] = args.budget_s
        try:
            print(json.dumps(dict(record)), flush=True)
        except Exception:
            print(json.dumps({"metric": record["metric"], "value": None,
                              "watchdog_fired": True}), flush=True)
        os._exit(0)

    threading.Thread(target=_watchdog, daemon=True).start()
    try:
        import jax

        from mri_interpolation_tpu.utils import setup_compilation_cache

        setup_compilation_cache()

        from mri_interpolation_tpu.io import load_volume
        from mri_interpolation_tpu.infer import evaluate_grid
        from mri_interpolation_tpu.metrics import evaluate_reconstruction
        from mri_interpolation_tpu.models import make_hash_mlp
        from mri_interpolation_tpu.train import TrainConfig, Trainer

        ds = load_volume(
            SAMPLE, slice_axes=(slice(None), slice(None), 3, slice(None)))

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

        # Tunnel-slowness factor: program compile/LOAD latency on the
        # tunneled TPU varies 1-20x session to session (measured 2026-08-20:
        # a cache-HIT executable load took 90-120 s in the evening vs ~5 s
        # at midday — no recompile, the tunnel itself). Every remaining
        # device-program cost estimate scales by it, so a degraded tunnel
        # SKIPS rows instead of blowing through the budget into a driver
        # timeout that would kill the record before the finally-print.
        slowness = max(1.0, float(result.wall_time_s) / 15.0)

        # quality: full-volume reconstruction PSNR; the first call bears the
        # compile, the second is the timed warm end-to-end evaluation
        recon = evaluate_grid(model, result.params, result.state, ds.shape)
        t0 = time.perf_counter()
        recon = evaluate_grid(model, result.params, result.state, ds.shape)
        grid_vox_per_sec = np.prod(ds.shape) / (time.perf_counter() - t0)
        quality = evaluate_reconstruction(
            jax.numpy.asarray(recon), jax.numpy.asarray(ds.image()),
            data_range=1.0)

        # Steady-state wall (epochs x median epoch time): the headline
        # train_wall_s absorbs compile + tunnel contention and reads as a
        # regression whenever the chip is shared (VERDICT r2 Weak #8); this
        # field is the comparable number across rounds.
        med_epoch = (float(np.median(result.epoch_times_s[1:]))
                     if len(result.epoch_times_s) > 1 else float("nan"))
        steady_wall = cfg.epochs * med_epoch

        record.update({
            "value": round(float(voxels_per_sec), 1),
            "vs_baseline": round(
                float(voxels_per_sec / BASELINE_VOXELS_PER_SEC), 2),
            "steady_steps_per_sec": round(float(steps_per_sec), 1),
            "recon_psnr_db": round(quality["psnr"], 2),
            "recon_ssim": round(quality.get("ssim", float("nan")), 4),
            "grid_eval_voxels_per_sec": round(float(grid_vox_per_sec), 1),
            "train_wall_s": round(result.wall_time_s, 2),
            "steady_train_wall_s": round(steady_wall, 2),
            "tunnel_slowness": round(slowness, 1),
            "device": str(jax.devices()[0]),
        })

        def row_inference_decomposition():
            # Inference decomposition (VERDICT r2 Next #2). The end-to-end
            # number above is pinned by this environment's ~35 MB/s
            # TPU-tunnel D2H link (a production host moves GB/s over PCIe),
            # so report the pieces: device-side compute (apples-to-apples
            # with the training metric, which never ships volumes to host),
            # the u16-transport end-to-end (half the bytes at a ~107 dB
            # quantization floor), and the link bandwidth itself.
            from mri_interpolation_tpu.infer.grid import device_eval_seconds

            n_vox = float(np.prod(ds.shape))
            dev_s = device_eval_seconds(model, result.params, result.state,
                                        ds.shape)
            evaluate_grid(model, result.params, result.state, ds.shape,
                          transport="u16")  # compile
            t0 = time.perf_counter()
            evaluate_grid(model, result.params, result.state, ds.shape,
                          transport="u16")
            u16_s = time.perf_counter() - t0
            transfer_s = max(n_vox / grid_vox_per_sec - dev_s, 1e-9)
            return {
                "grid_eval_device_voxels_per_sec": round(n_vox / dev_s, 1),
                "grid_eval_u16_voxels_per_sec": round(n_vox / u16_s, 1),
                "host_transfer_mb_per_sec": round(
                    n_vox * 4 / 2**20 / transfer_s, 1),
            }
        if is_fallback:
            # honest degradation: the TPU tunnel did not answer the watchdog,
            # so these are CPU numbers at a reduced epoch budget — comparable
            # to nothing, but a valid record instead of a hang.
            record["tpu_tunnel_unreachable"] = True
            record["epochs"] = epochs

        if args.headline_only:
            return

        img = ds.image()

        # ---- side rows: (name, cost estimate in seconds, thunk) ---------
        def row_linear():
            from mri_interpolation_tpu.infer import linear_interpolate_volume

            lin = linear_interpolate_volume(img[..., ::2], img.shape)
            lin_q = evaluate_reconstruction(
                jax.numpy.asarray(lin[..., 1::2]),
                jax.numpy.asarray(img[..., 1::2]))
            return {
                "odd_psnr_db_linear": round(lin_q["psnr"], 2),
                "odd_ssim_linear": round(
                    lin_q.get("ssim", float("nan")), 4),
            }

        def row_warp_cached():
            # The motion-compensated warp INR and its motion-transfer
            # deployment, scored from the committed stacked-cache deploy
            # predictions (the ep100 annealed 2D+t generation — the same
            # fits RESULTS.md reports). A live 60-epoch fit costs ~150 s;
            # the committed prediction is the identical artifact.
            out = {}
            for fam, tag in (("warp", "warp"),
                             ("warp_transfer", "warp_transfer")):
                pred = _load_cached_family(CACHE_2DT, fam)
                if pred is None:
                    continue
                q = evaluate_reconstruction(
                    jax.numpy.asarray(pred),
                    jax.numpy.asarray(img[..., 1::2]))
                out[f"odd_psnr_db_{tag}"] = round(q["psnr"], 2)
                out[f"odd_ssim_{tag}"] = round(
                    q.get("ssim", float("nan")), 4)
            if out:
                out["warp_source"] = CACHE_2DT
            return out

        def row_ngp():
            # secondary throughput/quality row: the TPU-native
            # Instant-NGP-class config (full-res dense levels +
            # batch-scaling gathered path; RESULTS.md) — the high-quality
            # regime the literal tcnn config (hashed, scatter-bound) cannot
            # reach on this chip.
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
            ngp_cfg = TrainConfig(
                batch_size=batch, epochs=ngp_epochs, lr=1e-2, seed=1337,
                optimizer="adam_tcnn", lr_schedule="cosine",
                cosine_t_max=ngp_epochs)
            ngp_result = Trainer(ngp_cfg).fit(ngp, ds.coords, ds.values)
            ngp_recon = evaluate_grid(ngp, ngp_result.params,
                                      ngp_result.state, ds.shape)
            ngp_quality = evaluate_reconstruction(
                jax.numpy.asarray(ngp_recon), jax.numpy.asarray(img),
                data_range=1.0)
            return {
                "ngp_steps_per_sec": round(
                    float(ngp_result.steady_steps_per_sec), 1),
                "ngp_psnr_db": round(ngp_quality["psnr"], 2),
                "ngp_epochs": ngp_epochs,
            }

        def row_stacked():
            return _cached_stacked_row(img)

        def row_stacked4d():
            img4d = load_volume(SAMPLE).image()
            return _cached_stacked_row(img4d, cache=CACHE_4D)

        def row_peak_throughput():
            # The headline keeps the reference-parity batch (10k); this row
            # records the same flagship model at the throughput-optimal
            # batch from the roofline sweep (RESULTS.md: voxel-evals/s
            # saturates ~160k — per-voxel step time is flat, so larger
            # batches only amortize fixed overhead).
            peak_model = make_hash_mlp(
                dim_in=3, n_levels=4, n_features_per_level=1,
                log2_hashmap_size=23, base_resolution=(64, 64, 5),
                finest_resolution=(352, 352, 15), dim_hidden=64, n_layers=2)
            B = 160_000
            pk_cfg = TrainConfig(batch_size=B, epochs=8, lr=5e-3, seed=1337)
            pk = Trainer(pk_cfg).fit(peak_model, ds.coords, ds.values)
            return {
                "peak_batch": B,
                "peak_voxel_evals_per_sec": round(
                    float(pk.steady_steps_per_sec * B), 1),
            }

        def row_pallas_reprobe():
            # Self-maintaining retirement: re-runs the kernel exec probe
            # only when jax.__version__ differs from the committed record
            # (normally a file read, ~0 s). See ops/pallas.maybe_reprobe.
            from mri_interpolation_tpu.ops.pallas import maybe_reprobe

            # cap at the remaining budget (no 60 s floor: a probe that needs
            # more time than the deadline allows must not overrun it)
            ran = maybe_reprobe(timeout_s=min(300.0, max(1.0, remaining())))
            return {"pallas_reprobed": bool(ran)}

        def row_workarounds_reprobe():
            # Version-gated probes for the two remaining tracked environment
            # workarounds (jvp SIGILL, registration device pin) — a file
            # read unless jax.__version__ changed. See utils/workarounds.py.
            from mri_interpolation_tpu.utils import maybe_reprobe_workarounds

            ran = maybe_reprobe_workarounds(
                timeout_s=min(300.0, max(1.0, remaining())))
            return {"workarounds_reprobed": bool(ran)}

        # Rows that compile/load device programs scale their cost estimate
        # by the measured tunnel slowness; cache/CPU rows do not.
        rows = [
            ("inference_decomposition", 10.0 + 20.0 * slowness,
             row_inference_decomposition),
            ("linear", 20.0, row_linear),
            ("warp_cached", 15.0, row_warp_cached),
            ("ngp", 30.0 + 90.0 * slowness, row_ngp),
            ("stacked", 20.0, row_stacked),
            ("stacked4d", 40.0, row_stacked4d),
            ("peak_throughput", 20.0 + 50.0 * slowness,
             row_peak_throughput),
            ("pallas_reprobe", 5.0, row_pallas_reprobe),
            ("workarounds_reprobe", 5.0, row_workarounds_reprobe),
        ]
        for name, cost, thunk in rows:
            if remaining() < cost:
                skipped.append(name)
                continue
            try:
                out = thunk()
            except Exception as e:  # a side row must never kill the record
                record[f"{name}_error"] = repr(e)[:200]
                continue
            if out:
                record.update(out)
            else:
                skipped.append(name)
    except Exception as e:
        record["error"] = repr(e)[:300]
    finally:
        done_flag.set()
        if skipped:
            record["skipped_rows"] = skipped
        record["budget_s"] = args.budget_s
        print(json.dumps(record))


if __name__ == "__main__":
    main()
