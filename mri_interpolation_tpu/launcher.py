"""Training launcher — the framework's main CLI entry point.

Parity target: reference ``launcher.py`` end to end: argparse flags ->
config merge -> model construction (or checkpoint resume) -> fit -> full
reconstruction saved as ``pred.nii.gz`` (or ``pred.png`` for 2D) -> dense-grid
interpolation for each ``interp_shapes`` -> ``interpolation{shape}.nii.gz`` ->
``config.txt`` provenance (launcher.py:34-224), with versioned run dirs
(``runs/version_N`` mirroring lightning_logs).

Additions over the reference: live PSNR/SSIM metrics written to
``metrics.json`` (the reference's commented block, hash_experimentation.py:
445-459), even-frame training protocol, optional data-parallel fitting, orbax
checkpointing, persistent compile cache.

Usage:
    python -m mri_interpolation_tpu.launcher --image_path vol.nii.gz \
        --model_class hash_mlp --epochs 10 [--enco_config_path cfg.json]
"""

from __future__ import annotations

import argparse
import inspect
import json
import os
import time
from typing import Optional

import numpy as np

from . import configs
from .configs import RunConfig


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    # The reference's explicit flags (launcher.py:35-59) plus auto-generated
    # flags for every scalar config field.
    parser.add_argument("--enco_config_path", type=str, default=None,
                        help="path to a tcnn-style JSON encoding config")
    parser.add_argument("--config_yaml", type=str, default=None,
                        help="path to a hydra-style YAML run config (reference config/base.yaml schema)")
    parser.add_argument("--config_preset", type=str, default="hash",
                        choices=["hash", "siren"], help="base config preset")
    parser.add_argument("--plan", action="store_true",
                        help="don't run: print the capacity plan (per-level "
                             "table bytes, step residency, sharding layout, "
                             "scaling-path recommendations) for this config")
    parser.add_argument("--plan_devices", type=int, default=1,
                        help="device count the --plan sharding layout assumes")
    parser.add_argument("--plan_hbm_gb", type=float, default=16.0,
                        help="per-chip HBM budget --plan checks against (v5e: 16)")
    configs.add_config_flags(parser, RunConfig())
    return parser


def make_run_dir(root: str) -> str:
    """Versioned run dir: root/version_N (parity: lightning_logs versioning,
    launcher.py:173-176 — including fixing the reference's Windows-only
    path join)."""
    os.makedirs(root, exist_ok=True)
    existing = [int(d.split("_")[1]) for d in os.listdir(root)
                if d.startswith("version_") and d.split("_")[1].isdigit()]
    version = max(existing) + 1 if existing else 0
    path = os.path.join(root, f"version_{version}")
    os.makedirs(path)
    return path


def build_model(cfg: RunConfig, dim_in: int, coordinates_spacing=None):
    """Construct the configured model, passing each factory only the kwargs it
    accepts (the reference passes the union blindly, launcher.py:121-139)."""
    from .models import get_model_factory

    factory = get_model_factory(cfg.model_class)
    kwargs = dict(cfg.model_kwargs())
    kwargs["dim_in"] = dim_in
    if coordinates_spacing is not None:
        kwargs["coordinates_spacing"] = coordinates_spacing
    accepted = inspect.signature(factory).parameters
    kwargs = {k: v for k, v in kwargs.items() if k in accepted}
    return factory(**kwargs)


def run(cfg: RunConfig, run_dir: Optional[str] = None) -> dict:
    """Execute the full train -> reconstruct -> interpolate -> report pipeline.
    Returns a summary dict (also written to metrics.json in the run dir)."""
    import jax

    from .infer import evaluate_grid
    from .io import even_frame_split, load_volume, nifti
    from .metrics import evaluate_reconstruction, param_count
    from .models import get_model_factory  # noqa: F401 (validates early)
    from .train import TrainConfig, Trainer, restore_checkpoint, save_checkpoint
    from .utils import setup_compilation_cache

    setup_compilation_cache()

    run_dir = run_dir or make_run_dir(cfg.output_root)

    # ----- data (L1)
    slice_axes = None
    if cfg.slice_z is not None:
        slice_axes = (slice(None), slice(None), cfg.slice_z, slice(None))
    ds = load_volume(cfg.image_path, zero_centered=cfg.zero_centered, slice_axes=slice_axes)
    full_image = ds.image()
    if cfg.even_frames_only:
        # Even-frame protocol: train on data[..., ::2]; the time coordinate of
        # even frame k is remapped to frame 2k's position in the FULL volume,
        # so full-grid inference interpolates the held-out odd frames.
        train_img, _ = even_frame_split(full_image)
        from .io.volume import flat_coords

        lo_c = -1.0 if cfg.zero_centered else 0.0
        coords = flat_coords(train_img.shape, lo=lo_c)
        t_full = full_image.shape[-1]
        t_even = train_img.shape[-1]
        scale = 2.0 * (t_even - 1) / max(t_full - 1, 1)
        coords[:, -1] = lo_c + (coords[:, -1] - lo_c) * scale
        train_coords, train_values = coords, train_img.reshape(-1, 1)
    else:
        train_coords, train_values = ds.coords, ds.values

    if cfg.undersample_pct > 0.0:
        # Sparse-acquisition simulation: keep a random undersample_pct% of
        # the training voxels (create_rn_mask — the reference mask's stated
        # purpose, utils.py:91-104) and reconstruct the full grid from them.
        from .utils.imaging import create_rn_mask

        _, kept = create_rn_mask((len(train_values),), cfg.undersample_pct, key=cfg.seed)
        train_coords = np.ascontiguousarray(train_coords[kept])
        train_values = np.ascontiguousarray(train_values[kept])

    dim_in = ds.dim_in
    cfg.dim_in = dim_in

    # Hash-resolution sanity for arbitrary-rank volumes: the reference's
    # default config pairs a 3-axis resolution tuple with the 4D sample volume
    # (config/base.py:73 vs :79 — a latent crash in the reference). When the
    # configured tuples don't match the volume rank, derive them from the
    # volume shape with the reference's base:finest ratio (~1/5.5).
    if cfg.model_class in ("hash_mlp", "HashMLP", "hash_siren", "HashSirenNet", "TcnnHashMLP"):
        base = cfg.base_resolution
        if isinstance(base, (tuple, list)) and len(base) != dim_in:
            cfg.finest_resolution = tuple(int(s) for s in ds.shape)
            cfg.base_resolution = tuple(max(2, round(s / 5.5)) for s in ds.shape)
    elif cfg.model_class == "warp_inr":
        # warp model encodes SPATIAL coords only (time drives the deformation)
        base = cfg.base_resolution
        spatial = ds.shape[:-1]
        if isinstance(base, (tuple, list)) and len(base) != len(spatial):
            cfg.finest_resolution = tuple(int(s) for s in spatial)
            cfg.base_resolution = tuple(max(2, round(s / 5.5)) for s in spatial)

    # PSF spacing: half-voxel extents in normalized coordinates.
    spacing = tuple(0.5 / max(s - 1, 1) for s in ds.shape[:3])
    model = build_model(cfg, dim_in, coordinates_spacing=spacing)

    # ----- resume (parity: launcher.py:97-117)
    params = state = None
    if cfg.checkpoint_path:
        restored = restore_checkpoint(cfg.checkpoint_path)
        params = restored["params"]
        state = restored.get("state", {})

    # ----- fit (L4)
    tc = TrainConfig(
        batch_size=cfg.batch_size,
        epochs=cfg.epochs,
        lr=cfg.lr,
        weight_decay=cfg.weight_decay,
        seed=cfg.seed,
        optimizer=cfg.optimizer,
        lr_schedule=cfg.lr_schedule,
        cosine_t_max=cfg.cosine_t_max,
        accumulate_grad_batches=cfg.accumulate_grad_batches,
        loss=cfg.loss,
        # live train_loss stream + per-epoch checkpoints (Lightning parity)
        log_jsonl=os.path.join(run_dir, "scalars.jsonl"),
        checkpoint_dir=os.path.join(run_dir, "checkpoints") if cfg.save_checkpoint else None,
        checkpoint_every_epochs=cfg.checkpoint_every_epochs,
        eval_every_epochs=cfg.eval_every_epochs,
        remat=cfg.remat,
    )

    # Periodic eval PSNR on a fixed training-set subsample, streamed into
    # scalars.jsonl next to train_loss (convergence curves — e.g. "most
    # quality arrives in the cosine tail" — become plottable from artifacts).
    eval_fn = None
    if cfg.eval_every_epochs > 0:
        from .infer import predict_batched

        stride = max(1, len(train_coords) // 100_000)
        ev_c = np.ascontiguousarray(train_coords[::stride])
        ev_v = np.ascontiguousarray(train_values[::stride])
        data_range = 2.0 if cfg.zero_centered else 1.0

        def eval_fn(params, state):
            y = predict_batched(model, params, state, ev_c, chunk_size=len(ev_c))
            mse = float(np.mean((y - ev_v) ** 2))
            return {"psnr": 10.0 * np.log10(data_range**2 / max(mse, 1e-12))}
    if cfg.shard_tables and len(jax.devices()) > 1:
        # Tensor-shard the hash table over the mesh (tables that exceed one
        # chip's HBM — parallel/sharded_table.py). Composes the model's own
        # decoder semantics; requires a make_hash_mlp-family model.
        if cfg.stream_shard_voxels > 0:
            raise ValueError("--stream_shard_voxels does not compose with --shard_tables")
        if cfg.level_anneal_steps > 0:
            # the sharded trainer substitutes its distributed encode for the
            # model's apply, which is where the anneal weighting lives
            raise ValueError("--level_anneal_steps does not compose with --shard_tables")
        from .parallel import ShardedHashTrainer

        result = ShardedHashTrainer(tc).fit(model, train_coords, train_values,
                                            params=params, state=state, eval_fn=eval_fn)
    elif cfg.stream_shard_voxels > 0:
        # Out-of-core path: only one shard of (coords, values) is
        # device-resident at a time. The dataset's values are already
        # min-max normalized, so pass value_range=False. With
        # --data_parallel the shard is row-sharded over the mesh
        # (DataParallelTrainer.fit_streaming) instead of single-device.
        if cfg.even_frames_only or cfg.undersample_pct > 0:
            raise ValueError(
                "--stream_shard_voxels streams the FULL volume grid; it does "
                "not compose with --even_frames_only / --undersample_pct"
            )
        stream_kw = dict(shard_voxels=cfg.stream_shard_voxels,
                         lo=-1.0 if cfg.zero_centered else 0.0,
                         value_range=False, params=params, state=state)
        if cfg.data_parallel and len(jax.devices()) > 1:
            from .parallel import DataParallelTrainer

            result = DataParallelTrainer(tc).fit_streaming(model, ds.image(),
                                                           eval_fn=eval_fn, **stream_kw)
        else:
            result = Trainer(tc).fit_streaming(model, ds.image(), eval_fn=eval_fn, **stream_kw)
    elif cfg.data_parallel and len(jax.devices()) > 1:
        from .parallel import DataParallelTrainer

        result = DataParallelTrainer(tc).fit(model, train_coords, train_values,
                                             params=params, state=state, eval_fn=eval_fn)
    else:
        result = Trainer(tc).fit(model, train_coords, train_values, params=params, state=state,
                                 eval_fn=eval_fn)

    # ----- reconstruction (parity: launcher.py:179-189)
    lo = -1.0 if cfg.zero_centered else 0.0
    if cfg.save_latents and (model.hparams or {}).get("encode") is not None:
        # Encoder latent capture (parity: predict_step latent collection,
        # reference models.py:640-646,746-751).
        recon, latents = evaluate_grid(model, result.params, result.state, ds.shape,
                                       lo=lo, return_latents=True)
        nifti.save(latents.astype(np.float32), os.path.join(run_dir, "latents.nii.gz"),
                   pixdim=ds.pixdim)
    else:
        recon = evaluate_grid(model, result.params, result.state, ds.shape, lo=lo)
    if recon.ndim == 2:
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            plt.imshow(recon.T)
            plt.savefig(os.path.join(run_dir, "pred.png"))
            plt.close()
        except Exception:
            pass
    nifti.save(recon.astype(np.float32), os.path.join(run_dir, "pred.nii.gz"), pixdim=ds.pixdim)

    quality = evaluate_reconstruction(
        jax.numpy.asarray(recon), jax.numpy.asarray(full_image),
        data_range=2.0 if cfg.zero_centered else 1.0,
    )
    # held-out odd-frame quality under the even-frame protocol
    if cfg.even_frames_only:
        _, odd = even_frame_split(full_image)
        _, odd_pred = even_frame_split(recon)
        # odd frames of the reconstruction live between trained frames
        odd_q = evaluate_reconstruction(
            jax.numpy.asarray(odd_pred[..., : odd.shape[-1]]), jax.numpy.asarray(odd),
            data_range=2.0 if cfg.zero_centered else 1.0,
        )
        quality = {**quality, **{f"odd_{k}": v for k, v in odd_q.items()}}

    # ----- dense-grid interpolation (parity: launcher.py:191-222; fixes the
    # reference's interp_shape/interp_shapes iteration bug at :196)
    interp_shapes = list(cfg.interp_shapes)
    for i, shape in enumerate(interp_shapes):
        if len(shape) != dim_in:
            # Rank-adapt the default 3D interp shape to this volume: keep the
            # volume's grid, double the temporal axis (the reference's
            # (352,352,30) = full xy + 2x time intent, config/base.py:62).
            interp_shapes[i] = tuple(ds.shape[:-1]) + (2 * ds.shape[-1],)
    for shape in dict.fromkeys(interp_shapes):
        interp = evaluate_grid(model, result.params, result.state, shape, lo=lo)
        nifti.save(
            interp.astype(np.float32),
            os.path.join(run_dir, f"interpolation{tuple(shape)}.nii.gz"),
            pixdim=ds.pixdim,
        )

    # ----- provenance + metrics + checkpoint
    if cfg.tb_events:
        # TensorBoard-compatibility export of the scalar stream (parity with
        # Lightning's default TB logger, reference models.py:65) — the JSONL
        # stays the primary artifact, the event file is a view of it
        from .train.tb_events import export_scalars_jsonl

        export_scalars_jsonl(os.path.join(run_dir, "scalars.jsonl"),
                             os.path.join(run_dir, "tb"))
    configs.export_to_txt(cfg, run_dir + os.sep)
    summary = {
        "model": model.name,
        "param_count": param_count(result.params),
        "steps": result.steps,
        "final_loss": result.final_loss,
        "train_wall_s": result.wall_time_s,
        "steady_steps_per_sec": result.steady_steps_per_sec,
        **quality,
        "run_dir": run_dir,
    }
    with open(os.path.join(run_dir, "metrics.json"), "w") as f:
        json.dump(summary, f, indent=2)
    if cfg.save_checkpoint:
        save_checkpoint(os.path.join(run_dir, "checkpoints"), step=result.steps,
                        params=result.params, state=result.state)
    return summary


def main(argv=None):
    parser = build_parser()
    args = parser.parse_args(argv)
    cfg = configs.default_siren_config() if args.config_preset == "siren" else configs.default_hash_config()
    if args.config_yaml:
        cfg = configs.load_yaml_config(args.config_yaml, base=cfg)
    if args.enco_config_path:
        cfg = configs.apply_enco_config(cfg, configs.load_json_config(args.enco_config_path))
    cfg = configs.override_from_args(cfg, args)
    if args.plan:
        print(json.dumps(plan_from_config(cfg, n_devices=args.plan_devices,
                                          hbm_bytes=args.plan_hbm_gb * 1e9),
                         indent=2))
        return
    summary = run(cfg)
    print(json.dumps(summary, indent=2))


def plan_from_config(cfg: RunConfig, n_devices: int = 1,
                     hbm_bytes: float = 16e9) -> dict:
    """Capacity plan for a launcher config (plan.py over RunConfig fields;
    volume shape peeked from the NIfTI header — no voxel IO, no devices)."""
    from .io import nifti
    from .plan import plan_run

    vol_shape = None
    if cfg.image_path and os.path.exists(cfg.image_path):
        vol_shape = nifti.peek_shape(cfg.image_path)
    # Plan the shape run() actually fits, not the on-disk header shape: the
    # same slice_z / even-frame reductions run() applies (launcher.py:103-130)
    # change the dataset residency and dim_in the plan reasons about.
    if vol_shape and cfg.slice_z is not None and len(vol_shape) == 4:
        vol_shape = vol_shape[:2] + vol_shape[3:]
    if vol_shape and cfg.even_frames_only:
        vol_shape = vol_shape[:-1] + (-(-vol_shape[-1] // 2),)
    dim_in = cfg.dim_in or (len(vol_shape) if vol_shape else 3)
    # same rank-adaptation run() applies when the configured resolution
    # tuples don't match the volume rank
    base_res, finest_res = cfg.base_resolution, cfg.finest_resolution
    if (vol_shape and isinstance(base_res, (tuple, list))
            and len(base_res) != dim_in):
        finest_res = tuple(int(s) for s in vol_shape)
        base_res = tuple(max(2, round(s / 5.5)) for s in vol_shape)
    return plan_run(
        dim_in=dim_in, n_levels=cfg.n_levels,
        n_features_per_level=cfg.n_features_per_level,
        log2_hashmap_size=cfg.log2_hashmap_size,
        base_resolution=base_res,
        finest_resolution=finest_res,
        per_level_scale=cfg.per_level_scale, growth=cfg.growth,
        dim_hidden=cfg.dim_hidden, n_layers=cfg.n_layers,
        dim_out=cfg.dim_out, decoder=cfg.decoder,
        batch_size=cfg.batch_size, volume_shape=vol_shape,
        row_fraction=(cfg.undersample_pct / 100.0
                      if cfg.undersample_pct > 0 else 1.0),
        n_devices=n_devices, optimizer=cfg.optimizer, remat=cfg.remat,
        hbm_bytes=hbm_bytes,
    )


if __name__ == "__main__":
    main()
