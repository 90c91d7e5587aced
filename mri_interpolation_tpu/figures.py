"""Post-hoc reporting: frame grids and GIFs from saved predictions.

Parity target: ``figure_script.py`` — load a run's ``pred.nii.gz``, take the
mid-z slice of 4D volumes, write an n-col frame-grid PNG annotated with the
run's config, per-frame PNGs, and an animated GIF (figure_script.py:10-72).
"""

from __future__ import annotations

import os
import numpy as np

from .configs import parse_config_txt
from .io import nifti

__all__ = ["make_figures", "main"]


def make_figures(run_dir: str, pred_name: str = "pred.nii.gz", fps: int = 5,
                 keep_frame_pngs: bool = False) -> dict:
    """Generate report artifacts for a finished run directory.

    Returns paths of the written artifacts.
    """
    import matplotlib

    matplotlib.use("Agg")
    import imageio.v2 as imageio
    import matplotlib.pyplot as plt

    pred_path = os.path.join(run_dir, pred_name)
    img = nifti.load(pred_path)
    data = np.asarray(img.get_fdata(np.float32))
    if data.ndim == 4:
        data = data[:, :, data.shape[2] // 2, :]  # mid-z (figure_script.py:15-21 uses z=3)
    if data.ndim != 3:
        raise ValueError(f"expected a (x, y, t) or 4D prediction, got shape {data.shape}")

    config_txt = os.path.join(run_dir, "config.txt")
    title = ""
    if os.path.exists(config_txt):
        cfg = parse_config_txt(config_txt)
        title = f"{cfg.get('model_class', '?')} lr={cfg.get('lr', '?')} epochs={cfg.get('epochs', '?')}"

    out = {}

    # frame grid (3 rows x ceil(T/3) cols, figure_script.py:24-52)
    n_frames = data.shape[-1]
    ncols = -(-n_frames // 3)
    fig, axes = plt.subplots(3, ncols, figsize=(2 * ncols, 6))
    for i, ax in enumerate(np.atleast_1d(axes).ravel()):
        ax.axis("off")
        if i < n_frames:
            ax.imshow(data[..., i].T, cmap="gray", origin="lower")
            ax.set_title(f"t={i}", fontsize=7)
    fig.suptitle(title, fontsize=9)
    grid_path = os.path.join(run_dir, "frames_grid.png")
    fig.savefig(grid_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    out["grid"] = grid_path

    # per-frame PNGs -> GIF (figure_script.py:54-72)
    lo, hi = float(data.min()), float(data.max())
    frames = []
    frame_paths = []
    for i in range(n_frames):
        norm = (data[..., i].T - lo) / (hi - lo + 1e-12)
        frames.append((norm * 255).astype(np.uint8))
        if keep_frame_pngs:
            p = os.path.join(run_dir, f"frame_{i:03d}.png")
            imageio.imwrite(p, frames[-1])
            frame_paths.append(p)
    gif_path = os.path.join(run_dir, "frames.gif")
    imageio.mimsave(gif_path, frames, duration=int(1000 / fps))
    out["gif"] = gif_path
    if frame_paths:
        out["frames"] = frame_paths

    # encoder latent panel (parity: the reference's predict_step latent
    # capture, models.py:640-646,746-751; written by launcher --save_latents)
    latents_path = os.path.join(run_dir, "latents.nii.gz")
    if os.path.exists(latents_path):
        lat = np.asarray(nifti.load(latents_path).get_fdata(np.float32))
        while lat.ndim > 3:  # (x, y, [z,] t, D) -> mid-slice down to (x, y, D)
            lat = lat[..., lat.shape[-2] // 2, :]
        n_ch = lat.shape[-1]
        ncols = min(n_ch, 8)
        nrows = -(-n_ch // ncols)
        fig, axes = plt.subplots(nrows, ncols, figsize=(2 * ncols, 2 * nrows))
        for i, ax in enumerate(np.atleast_1d(axes).ravel()):
            ax.axis("off")
            if i < n_ch:
                ax.imshow(lat[..., i].T, cmap="viridis", origin="lower")
                ax.set_title(f"ch {i}", fontsize=7)
        fig.suptitle("encoder latents (mid frame)", fontsize=9)
        lat_path = os.path.join(run_dir, "latents_grid.png")
        fig.savefig(lat_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        out["latents"] = lat_path

    # convergence curves from the scalars stream (train_loss + eval psnr)
    scalars_path = os.path.join(run_dir, "scalars.jsonl")
    if os.path.exists(scalars_path):
        from .train.scalars import read_scalars

        losses = read_scalars(scalars_path, tag="train_loss")
        psnrs = read_scalars(scalars_path, tag="psnr")
        if losses:
            fig, ax = plt.subplots(figsize=(6, 3.5))
            ax.semilogy([r["step"] for r in losses], [r["value"] for r in losses],
                        lw=0.7, label="train_loss")
            ax.set_xlabel("step")
            ax.set_ylabel("train loss")
            if psnrs:
                ax2 = ax.twinx()
                ax2.plot([r["step"] for r in psnrs], [r["value"] for r in psnrs],
                         "o-", color="tab:orange", ms=3, label="psnr")
                ax2.set_ylabel("PSNR (dB)")
            fig.tight_layout()
            curve_path = os.path.join(run_dir, "convergence.png")
            fig.savefig(curve_path, dpi=120)
            plt.close(fig)
            out["convergence"] = curve_path
    return out


def main(argv=None):
    """CLI parity with the reference's runnable figure_script.py:
    ``python -m mri_interpolation_tpu.figures <run_dir>``."""
    import argparse

    p = argparse.ArgumentParser(description="frame-grid PNG + GIF from a finished run dir")
    p.add_argument("run_dir")
    p.add_argument("--pred_name", default="pred.nii.gz")
    p.add_argument("--fps", type=int, default=5)
    p.add_argument("--keep_frame_pngs", action="store_true")
    args = p.parse_args(argv)
    artifacts = make_figures(args.run_dir, pred_name=args.pred_name, fps=args.fps,
                             keep_frame_pngs=args.keep_frame_pngs)
    for k, v in artifacts.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
