"""Offline analysis of the LOO-stacked fusion weights (CPU-only, cache-driven).

The stacked protocol's weight-selection signal — LOO folds over interior kept
frames — lives in a WIDER-gap regime than deployment: holding out even frame k
leaves a 4-original-step gap bridged at its midpoint, while deployment bridges
2-step gaps. Family error magnitudes (and with few folds, the lstsq-optimal
combination) do not transfer perfectly between the regimes; the round-2 row
(26.01 dB) in fact landed below the best single family (warp, 26.06 dB).

This script selects the solver's regularization HONESTLY — nested LOO over the
folds themselves (hold out each fold, solve weights on the rest, score the held
fold; no odd-frame ground truth anywhere in selection):

  * ridge strength lam on the simplex-constrained lstsq Gram (lam -> inf
    degenerates to weights proportional to per-family fold correlation),
  * shrink between the global solve and per-position solves.

Usage:  python scripts/stacking_analysis.py [--cache_dir runs/stacked_cache_ep100_anneal]

Prints the nested-score table, the nested-selected configuration, and (only as
the final diagnostic) each configuration's deployment score against the odd
frames. The nested-selected row is what `--stacked` reports in RESULTS.md.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, ".")

import jax

# CPU-only analysis: pin the platform BEFORE first device use (the
# environment's sitecustomize re-pins JAX_PLATFORMS to the TPU tunnel, and a
# numpy-stack script must not block on it — same pattern as tests/conftest.py).
jax.config.update("jax_platforms", "cpu")

from mri_interpolation_tpu.io import even_frame_split, load_volume
from mri_interpolation_tpu.metrics import evaluate_reconstruction

SAMPLE = "/root/reference/sample_ankle_dyn_mri.nii.gz"
SLICE = (slice(None), slice(None), 3, slice(None))


def simplex_lstsq_ridge(preds: np.ndarray, target: np.ndarray, lam: float,
                        iters: int = 500, lr: float = 0.5) -> np.ndarray:
    """simplex_lstsq with a ridge on the Gram: (G + lam*tr(G)/F I) w = b.
    lam=0 is the production solver; large lam shrinks toward the simplex
    projection of the per-family correlation vector b (robust to the Gram's
    ill-conditioning when the families are highly correlated and folds few)."""
    F = preds.shape[0]
    G = preds @ preds.T / preds.shape[1]
    b = preds @ target / preds.shape[1]
    G = G + lam * (np.trace(G) / F) * np.eye(F)
    w = np.full((F,), 1.0 / F)
    scale = max(np.trace(G) / F, 1e-12)
    for _ in range(iters):
        grad = (G @ w - b) / scale
        w = w - lr * grad
        u = np.sort(w)[::-1]
        css = np.cumsum(u) - 1.0
        rho = np.nonzero(u - css / (np.arange(F) + 1) > 0)[0][-1]
        w = np.maximum(w - css[rho] / (rho + 1.0), 0.0)
    return w


def affine_lstsq_ridge(preds: np.ndarray, target: np.ndarray, lam: float) -> np.ndarray:
    """Sum-to-one but SIGNED weights (affine combination): closed-form
    equality-constrained ridge. Signed weights can cancel correlated family
    errors — and can also overfit 6 folds; nested selection adjudicates."""
    F = preds.shape[0]
    G = preds @ preds.T / preds.shape[1]
    b = preds @ target / preds.shape[1]
    G = G + lam * (np.trace(G) / F) * np.eye(F)
    Gi = np.linalg.inv(G)
    one = np.ones(F)
    w = Gi @ b
    mu = (1.0 - one @ w) / (one @ Gi @ one)
    return w + mu * (Gi @ one)


def load_folds(cache_dir: str, img: np.ndarray):
    """(names, folds, deploy, t_odd): folds = [(t_held, preds (F,S), target (S))]."""
    train_img, _ = even_frame_split(img)
    t_full = img.shape[-1]
    n = train_img.shape[-1]
    t_keep = np.asarray([2 * j / (t_full - 1) for j in range(n)])
    t_odd = np.asarray([(2 * j + 1) / (t_full - 1) for j in range((t_full) // 2)])
    from mri_interpolation_tpu.train.stacking import (cached_family_names,
                                                      has_cached_prediction,
                                                      load_cached_prediction)

    # shared cache layer (reads both the legacy .npy and the fp16 .npz
    # layouts; filters crash leftovers)
    names = cached_family_names(cache_dir)
    if not names:
        raise SystemExit(f"no deploy predictions under {cache_dir!r} — pass "
                         "--cache_dir (e.g. runs/stacked_cache_ep100_anneal)")
    folds = []
    for k in range(1, n - 1):
        if not all(has_cached_prediction(cache_dir, f"fold{k}_{f}")
                   for f in names):
            continue
        preds = np.stack([load_cached_prediction(cache_dir, f"fold{k}_{f}")
                          for f in names])
        folds.append((t_keep[k], preds, train_img[..., k]))
    deploy = np.stack([load_cached_prediction(cache_dir, f"deploy_{f}")
                       for f in names])
    return names, folds, deploy, t_odd


def solve_weights(folds, names, t_new, lam: float, shrink: float,
                  solver=simplex_lstsq_ridge, clip: bool = True):
    """Global + per-position ridge solve -> (len(t_new), F) weights."""
    F = len(names)
    all_p = np.concatenate([p.reshape(F, -1) for _, p, _ in folds], axis=1)
    all_t = np.concatenate([t.reshape(-1) for _, _, t in folds])
    w_global = solver(all_p, all_t, lam)
    pos = np.asarray([t for t, _, _ in folds])
    w_pos = np.stack([
        shrink * w_global + (1.0 - shrink)
        * solver(p.reshape(F, -1), t.reshape(-1), lam)
        for _, p, t in folds
    ])
    w_new = np.stack([np.interp(t_new, pos, w_pos[:, f]) for f in range(F)], axis=-1)
    if clip:
        w_new = np.maximum(w_new, 0.0)
    w_new /= w_new.sum(axis=-1, keepdims=True)
    return w_new, w_global


def nested_score(folds, names, lam: float, shrink: float,
                 solver=simplex_lstsq_ridge, clip: bool = True) -> float:
    """Hold out each fold; solve on the rest; MSE on the held fold."""
    errs = []
    for j in range(len(folds)):
        rest = folds[:j] + folds[j + 1:]
        t_held, preds, target = folds[j]
        w, _ = solve_weights(rest, names, np.asarray([t_held]), lam, shrink,
                             solver=solver, clip=clip)
        fused = np.einsum("f...,f->...", preds, w[0])
        errs.append(float(np.mean((fused - target) ** 2)))
    return float(np.mean(errs))


def _box_blur(img: np.ndarray, rad: int) -> np.ndarray:
    """Separable box blur over the spatial axes (pure numpy, edge-clamped)."""
    out = img.astype(np.float32)
    for ax in range(img.ndim):
        if img.shape[ax] < 2 * rad + 1:
            continue
        pad = [(0, 0)] * img.ndim
        pad[ax] = (rad, rad)
        p = np.pad(out, pad, mode="edge")
        c = np.cumsum(p, axis=ax)
        lead = [slice(None)] * img.ndim
        lag = [slice(None)] * img.ndim
        lead[ax] = slice(2 * rad + 1, None)
        lag[ax] = slice(None, -(2 * rad + 1))
        first = [slice(None)] * img.ndim
        first[ax] = slice(2 * rad, 2 * rad + 1)
        head = c[tuple(first)]
        out = np.concatenate([head, c[tuple(lead)] - c[tuple(lag)]], axis=ax) / (2 * rad + 1)
    return out


def motion_feature(frame_lo: np.ndarray, frame_hi: np.ndarray, rad: int = 4) -> np.ndarray:
    """Target-free local motion magnitude between the two BRACKETING kept
    frames (available identically at fold positions and at deployment)."""
    return _box_blur(np.abs(frame_hi - frame_lo), rad)


def gated_solve(folds_feats, names, n_bins: int, lam: float):
    """Per-motion-bin global simplex weights. ``folds_feats``: list of
    (preds (F, S), target (S), feat (S)). Returns (thresholds, (B, F) weights):
    thresholds are pooled-fold quantiles, so deployment bins the same way."""
    F = len(names)
    all_feat = np.concatenate([f.reshape(-1) for _, _, f in folds_feats])
    qs = np.quantile(all_feat, [i / n_bins for i in range(1, n_bins)])
    W = np.zeros((n_bins, F))
    for b in range(n_bins):
        masks = []
        for _, _, feat in folds_feats:
            m = np.digitize(feat.reshape(-1), qs) == b
            masks.append(m)
        p = np.concatenate([pr.reshape(F, -1)[:, m]
                            for (pr, _, _), m in zip(folds_feats, masks)], axis=1)
        t = np.concatenate([tg.reshape(-1)[m]
                            for (_, tg, _), m in zip(folds_feats, masks)])
        W[b] = simplex_lstsq_ridge(p, t, lam) if t.size else 1.0 / F
    return qs, W


def gated_fuse(preds: np.ndarray, feat: np.ndarray, qs: np.ndarray,
               W: np.ndarray) -> np.ndarray:
    bins = np.digitize(feat.reshape(-1), qs)
    w_px = W[bins]                                  # (N, F)
    return np.einsum("fn,nf->n", preds.reshape(preds.shape[0], -1),
                     w_px).reshape(preds.shape[1:])


def run_gated(img, names, folds, deploy, t_odd, odd_img):
    """Motion-gated stacking prototype: nested-LOO selection over
    (n_bins, lam), then the deployment diagnostic."""
    train_img, _ = even_frame_split(img)
    t_full = img.shape[-1]
    n = train_img.shape[-1]
    t_keep = np.asarray([2 * j / (t_full - 1) for j in range(n)])
    # fold features: bracketing KEPT frames around held position k are k-1, k+1
    pos_to_idx = {t_keep[k]: k for k in range(n)}
    folds_feats = []
    for t_held, preds, target in folds:
        k = pos_to_idx[t_held]
        feat = motion_feature(train_img[..., k - 1], train_img[..., k + 1])
        folds_feats.append((preds, target, feat))
    # deployment features: odd position 2j+1 sits between kept frames j, j+1
    # (clamped for even-length series, whose final odd frame has no right
    # neighbor — its feature degrades to zero motion)
    T = train_img.shape[-1]
    dep_feats = np.stack([
        motion_feature(train_img[..., min(j, T - 1)],
                       train_img[..., min(j + 1, T - 1)])
        for j in range(len(t_odd))
    ], axis=-1)

    rows = []
    for n_bins in (1, 2, 3, 5):
        for lam in (0.0, 0.1, 0.3, 1.0):
            errs = []
            for j in range(len(folds_feats)):
                rest = folds_feats[:j] + folds_feats[j + 1:]
                qs, W = gated_solve(rest, names, n_bins, lam)
                preds, target, feat = folds_feats[j]
                fused = gated_fuse(preds, feat, qs, W)
                errs.append(float(np.mean((fused - target) ** 2)))
            rows.append({"bins": n_bins, "lam": lam,
                         "nested_mse": float(np.mean(errs))})
            print(json.dumps(rows[-1]), flush=True)
    rows.sort(key=lambda r: r["nested_mse"])
    best = rows[0]
    print("gated nested-selected:", json.dumps(best), flush=True)

    print("\n# gated deployment scores (diagnostic)", flush=True)
    for r in rows:
        qs, W = gated_solve(folds_feats, names, r["bins"], r["lam"])
        fused = np.stack([
            gated_fuse(deploy[:, ..., i], dep_feats[..., i], qs, W)
            for i in range(deploy.shape[-1])
        ], axis=-1)
        mse = float(np.mean((fused - odd_img) ** 2))
        rec = {"bins": r["bins"], "lam": r["lam"],
               "odd_psnr": round(-10.0 * np.log10(mse), 3)}
        if r is best:
            q = evaluate_reconstruction(jax.numpy.asarray(fused),
                                        jax.numpy.asarray(odd_img), data_range=1.0)
            rec["odd_ssim"] = round(q.get("ssim", float("nan")), 4)
            rec["selected"] = True
            rec["bin_weights"] = {f"bin{b}": {n: round(float(x), 3)
                                              for n, x in zip(names, W[b])}
                                  for b in range(W.shape[0])}
        print(json.dumps(rec), flush=True)


def run_uncertainty(names, folds, deploy, t_odd, odd_img,
                    out_png="runs/figures/uncertainty_panel.png"):
    """Calibration of the fusion's confidence map against the true held-out
    error, for the shipped solver's weights and for the ablation variants
    (pure-weighted eps=0, uniform). Renders a panel artifact: fused frame,
    sigma map, |error| map side by side for the middle odd frame."""
    from mri_interpolation_tpu.train.stacking import (
        fusion_uncertainty, uncertainty_calibration)

    w_new, w_global = solve_weights(folds, names, t_odd, lam=0.0, shrink=0.5)
    fused = np.einsum("f...t,tf->...t", deploy, w_new)
    err = fused - odd_img
    report = {}
    for label, sigma in [
        ("shipped (eps=0.1)", fusion_uncertainty(deploy, w_new)),
        ("pure-weighted (eps=0)", fusion_uncertainty(deploy, w_new, eps=0.0)),
        ("uniform", fusion_uncertainty(
            deploy, np.full_like(w_new, 1.0 / len(names)))),
    ]:
        cal = uncertainty_calibration(sigma, err)
        rc = cal["risk_coverage"]["rmse"]
        report[label] = {"pearson_r": round(cal["pearson_r"], 3),
                         "spearman_rho": round(cal["spearman_rho"], 3),
                         "rmse_keep50_over_full": round(rc[4] / rc[-1], 4)}
        print(json.dumps({label: report[label]}), flush=True)

    sigma = fusion_uncertainty(deploy, w_new)
    t_mid = fused.shape[-1] // 2
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(12, 4.2))
    for ax, (panel, title, cmap) in zip(axes, [
        (fused[..., t_mid], f"fused held-out frame {t_mid}", "gray"),
        (sigma[..., t_mid], "confidence map sigma (no ground truth)", "magma"),
        (np.abs(err[..., t_mid]), "|true error|", "magma"),
    ]):
        im = ax.imshow(panel.T, origin="lower", cmap=cmap)
        ax.set_title(title, fontsize=10)
        ax.axis("off")
        fig.colorbar(im, ax=ax, fraction=0.046)
    fig.tight_layout()
    os.makedirs(os.path.dirname(out_png), exist_ok=True)
    fig.savefig(out_png, dpi=110)
    print(json.dumps({"panel": out_png}))
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache_dir", default="runs/stacked_cache_ep100_anneal")
    ap.add_argument("--lams", default="0,0.1,0.3,1,3,10")
    ap.add_argument("--shrinks", default="0,0.25,0.5,0.75,1")
    ap.add_argument("--gated", action="store_true",
                    help="motion-gated per-bin weights instead of the "
                         "(lam, shrink) sweep")
    ap.add_argument("--uncertainty", action="store_true",
                    help="calibrate the confidence map variants against the "
                         "true held-out error + render the panel artifact")
    args = ap.parse_args()

    ds = load_volume(SAMPLE, slice_axes=SLICE)
    img = ds.image()
    _, odd_img = even_frame_split(img)
    names, folds, deploy, t_odd = load_folds(args.cache_dir, img)
    print(f"families: {names}; folds with complete predictions: {len(folds)}")

    if args.gated:
        run_gated(img, names, folds, deploy, t_odd, odd_img)
        return
    if args.uncertainty:
        run_uncertainty(names, folds, deploy, t_odd, odd_img)
        return

    lams = [float(x) for x in args.lams.split(",")]
    shrinks = [float(x) for x in args.shrinks.split(",")]
    solvers = {"simplex": (simplex_lstsq_ridge, True),
               "affine": (affine_lstsq_ridge, False)}
    rows = []
    for solver_name, (solver, clip) in solvers.items():
        for lam in lams:
            for shrink in shrinks:
                ns = nested_score(folds, names, lam, shrink, solver, clip)
                rows.append({"solver": solver_name, "lam": lam,
                             "shrink": shrink, "nested_mse": ns})
                print(json.dumps(rows[-1]), flush=True)
    rows.sort(key=lambda r: r["nested_mse"])
    best = rows[0]
    print("nested-selected:", json.dumps(best))

    # deployment scores (diagnostic; selection above never saw these).
    # PSNR via plain numpy — cheap enough to sweep; full metrics (SSIM) only
    # for the nested-selected configuration.
    print("\n# deployment scores (diagnostic)")
    for r in rows:
        solver, clip = solvers[r["solver"]]
        w_new, w_global = solve_weights(folds, names, t_odd, r["lam"], r["shrink"],
                                        solver=solver, clip=clip)
        fused = np.einsum("f...t,tf->...t", deploy, w_new)
        mse = float(np.mean((fused - odd_img) ** 2))
        rec = {"solver": r["solver"], "lam": r["lam"], "shrink": r["shrink"],
               "odd_psnr": round(-10.0 * np.log10(mse), 3),
               "weights": {n: round(float(x), 3)
                           for n, x in zip(names, w_global)}}
        if r is best:
            q = evaluate_reconstruction(jax.numpy.asarray(fused),
                                        jax.numpy.asarray(odd_img), data_range=1.0)
            rec["odd_ssim"] = round(q.get("ssim", float("nan")), 4)
            rec["selected"] = True
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
