"""Motion-compensated temporal interpolation demo (CPU-friendly).

Builds a synthetic moving-blob sequence, trains the `warp_inr` model on the
EVEN frames only, and compares held-out odd-frame reconstruction against
classical linear interpolation — the even-frame protocol from the reference
(hash_experimentation.py:313-317) on a workload where motion matters.

Run:  python examples/motion_interpolation.py [--cpu]
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np


def make_sequence(n=32, T=9):
    xs = np.linspace(0, 1, n, dtype=np.float32)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    centers = np.linspace(0.25, 0.75, T)
    frames = [np.exp(-(((X - c) ** 2 + (Y - 0.5) ** 2) / 0.02)).astype(np.float32) for c in centers]
    return np.stack(frames, axis=-1)  # (n, n, T)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--epochs", type=int, default=80)
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax

    from mri_interpolation_tpu.infer import linear_interpolate_volume
    from mri_interpolation_tpu.metrics import evaluate_reconstruction
    from mri_interpolation_tpu.models import make_warp_inr
    from mri_interpolation_tpu.train import TrainConfig
    from mri_interpolation_tpu.train.protocols import even_frame_fit_eval

    vol = make_sequence()
    model = make_warp_inr(dim_in=3, n_levels=3, n_features_per_level=4, log2_hashmap_size=14,
                          base_resolution=(8, 8), finest_resolution=(32, 32),
                          dim_hidden=32, n_layers=2, warp_hidden=32, warp_layers=3,
                          warp_scale=0.3)
    cfg = TrainConfig(batch_size=2048, epochs=args.epochs, lr=5e-3, optimizer="adam_tcnn",
                      lr_schedule="cosine", cosine_t_max=args.epochs, seed=0)
    _, q = even_frame_fit_eval(model, vol, cfg)

    lin = linear_interpolate_volume(vol[..., ::2], vol.shape)
    odd_lin = evaluate_reconstruction(jax.numpy.asarray(lin[..., 1::2]),
                                      jax.numpy.asarray(vol[..., 1::2]))
    print(f"warp_inr  held-out odd-frame PSNR: {q['odd']['psnr']:.2f} dB")
    print(f"linear    held-out odd-frame PSNR: {odd_lin['psnr']:.2f} dB")
    assert q["odd"]["psnr"] > odd_lin["psnr"], "warp model should beat linear on moving content"
    print("motion interpolation beats linear interpolation — OK")

    # the honest stacked fusion (registration + linear families; the warp
    # families join on real workloads — see RESULTS.md protocol table)
    from mri_interpolation_tpu.train.stacking import (
        _linear_family, _registration_family, stacked_interp_eval)

    fams = {"registration": _registration_family(ctrl_sizes=(4, 8), pyramid=(2, 1), steps=150),
            "linear": _linear_family()}
    recon, sq = stacked_interp_eval(vol, cfg, families=fams)
    print(f"stacked   held-out odd-frame PSNR: {sq['odd']['psnr']:.2f} dB "
          f"(weights {sq['weights']['global']})")
    # the fusion's confidence map (family disagreement; no ground truth
    # used) ranks the true error — see RESULTS.md for the real-data numbers
    cal = sq["uncertainty"]["calibration"]
    print(f"confidence map calibration: Spearman rho {cal['spearman_rho']:.3f} "
          f"(sigma_mean {sq['uncertainty']['sigma_mean']:.4f})")


if __name__ == "__main__":
    main()
