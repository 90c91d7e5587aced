"""Data-parallel fitting and sharded inference over a device mesh.

Recipe (the scaling-book pattern): replicate parameters, shard each step's
voxel batch across the ``data`` axis, compute local gradients, ``pmean`` them
over ICI inside ``shard_map``, apply the identical optimizer update on every
device. The dataset itself is replicated (a whole 4D MRI volume is ~45 MB as
fp32 (coords, values) — far below HBM), so per-step batch selection stays a
local gather and the global-shuffle semantics match the single-device trainer
exactly: same seed => same permutation => same batches, just evaluated on
n_devices shards.

Also here: multi-volume batched fitting (one INR per volume, volumes sharded
across the mesh — BASELINE.json config #5) and the sharded dense-grid
evaluator.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..infer.grid import flat_index_to_coords
from ..models.core import Model
from ..train.losses import get_loss
from ..train.trainer import (
    EpochHooks,
    TrainConfig,
    TrainResult,
    flatten_volume_source,
    make_host_shard_fn,
    make_optimizer,
    resolve_value_range,
)


def _maybe_remat(loss_fn, cfg: TrainConfig):
    """Apply TrainConfig.remat to an inline per-batch loss (parity with
    Trainer._loss_fn — the flag must not be a silent no-op under DP)."""
    return jax.checkpoint(loss_fn) if cfg.remat else loss_fn

__all__ = ["DataParallelTrainer", "fit_multi_volume", "evaluate_grid_sharded"]

import optax


class DataParallelTrainer:
    """Data-parallel version of ``train.Trainer.fit``.

    Per-step batch is split across the mesh's ``data`` axis; gradients (and
    auxiliary state, e.g. BatchNorm batch statistics) are averaged with
    ``pmean`` over ICI before the replicated optimizer update.
    """

    def __init__(self, config: TrainConfig, mesh: Optional[Mesh] = None, axis_name: str = "data"):
        self.config = config
        self.axis = axis_name
        if mesh is None:
            from .mesh import make_mesh

            mesh = make_mesh(axis_name=axis_name)
        self.mesh = mesh
        self.n_devices = mesh.devices.size

    def fit(self, model: Model, coords: np.ndarray, values: np.ndarray,
            params=None, state=None, eval_fn=None) -> TrainResult:
        """``eval_fn(params, state) -> {tag: value}``: periodic eval metrics
        every ``cfg.eval_every_epochs`` epochs into the scalars JSONL —
        same semantics as ``Trainer.fit`` (params here are replicated jax
        arrays, usable directly by any inference path)."""
        cfg = self.config
        n = len(coords)
        ndev = self.n_devices
        # Global batch divisible by device count.
        batch = min(cfg.batch_size, n)
        batch -= batch % ndev
        if batch == 0:
            raise ValueError(f"batch_size {cfg.batch_size} < n_devices {ndev}")
        steps_per_epoch = n // batch
        if steps_per_epoch == 0:
            raise ValueError(f"batch {batch} exceeds dataset size {n}")
        local_batch = batch // ndev

        key = jax.random.key(cfg.seed)
        if params is None:
            key, k_init = jax.random.split(key)
            params, state = model.init(k_init)
        state = state if state is not None else {}

        tx = make_optimizer(cfg, steps_per_epoch)
        opt_state = tx.init(params)
        base_loss = get_loss(cfg.loss)
        axis = self.axis

        repl = NamedSharding(self.mesh, P())
        coords = jax.device_put(jnp.asarray(coords, jnp.float32), repl)
        values = jax.device_put(jnp.asarray(values, jnp.float32), repl)
        params = jax.device_put(params, repl)
        state = jax.device_put(state, repl)
        opt_state = jax.device_put(opt_state, repl)

        def epoch_shard(params, state, opt_state, epoch_key):
            """Runs on each device with its (steps, local_batch) index shard."""
            perm_key, k0 = jax.random.split(epoch_key)
            perm = jax.random.permutation(perm_key, n)  # same key -> same perm on all devices
            my = jax.lax.axis_index(axis)
            # global batch layout: (steps, ndev, local_batch); this device
            # takes column `my`.
            idx = perm[: steps_per_epoch * batch].reshape(steps_per_epoch, ndev, local_batch)[:, my]

            def body(carry, batch_idx):
                params, state, opt_state, k = carry
                k, k_step = jax.random.split(k)
                xb = jnp.take(coords, batch_idx, axis=0)
                yb = jnp.take(values, batch_idx, axis=0)

                def loss_fn(p, s):
                    if model.loss_fn is not None:
                        return model.loss_fn(p, s, (xb, yb), k_step, True)
                    y_pred, ns = model.apply(p, s, xb, train=True, rng=k_step)
                    return base_loss(y_pred, yb), ns

                (loss, new_state), grads = jax.value_and_grad(_maybe_remat(loss_fn, cfg), has_aux=True)(params, state)
                # ICI collectives: average grads/statistics across the mesh.
                grads = jax.lax.pmean(grads, axis)
                new_state = jax.lax.pmean(new_state, axis) if new_state else new_state
                loss = jax.lax.pmean(loss, axis)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, new_state, opt_state, k), loss

            (params, state, opt_state, _), losses = jax.lax.scan(
                body, (params, state, opt_state, k0), idx
            )
            return params, state, opt_state, losses

        smap = shard_map(
            epoch_shard,
            mesh=self.mesh,
            in_specs=(P(), P(), P(), P()),
            out_specs=(P(), P(), P(), P()),
            check_vma=False,
        )
        epoch_jit = jax.jit(smap, donate_argnums=(0, 1, 2))

        hooks = EpochHooks(cfg, steps_per_epoch, eval_fn)

        all_losses, epoch_times = [], []
        t0 = time.perf_counter()
        for e in range(cfg.epochs):
            key, ek = jax.random.split(key)
            te = time.perf_counter()
            params, state, opt_state, losses = epoch_jit(params, state, opt_state, ek)
            jax.block_until_ready(losses)
            epoch_times.append(time.perf_counter() - te)
            all_losses.append(losses)
            hooks.after_epoch(e, losses, lambda: params, state, opt_state)
        hooks.close()
        wall = time.perf_counter() - t0

        losses_np = np.concatenate([np.asarray(l) for l in all_losses])
        total_steps = cfg.epochs * steps_per_epoch
        return TrainResult(
            params=params,
            state=state,
            opt_state=opt_state,
            losses=losses_np,
            wall_time_s=wall,
            steps_per_sec=total_steps / wall if wall else float("inf"),
            steps=total_steps,
            epoch_times_s=np.asarray(epoch_times),
        )

    # ------------------------------------------------------------------
    def fit_streaming(
        self,
        model: Model,
        volume,
        shard_voxels: int = 1 << 22,
        lo: float = 0.0,
        hi: float = 1.0,
        value_range=None,
        params=None,
        state=None,
        eval_fn=None,
    ) -> TrainResult:
        """Out-of-core + data-parallel: ``Trainer.fit_streaming``'s shard
        rotation with each shard ROW-SHARDED over the mesh instead of
        replicated — device-local batches, pmean'd grads/statistics over ICI,
        replicated update. Unlike ``fit`` (whole dataset replicated per
        device), per-device HBM holds only ``shard_voxels / n_devices``
        voxels, so the reachable volume scales with BOTH the shard knob and
        the mesh size. ``volume`` may be an ``np.memmap``.
        """
        cfg = self.config
        shape = tuple(int(s) for s in volume.shape)
        n = int(np.prod(shape))
        if n >= 2**31:
            raise ValueError(f"grid {shape} exceeds int32 flat indexing")
        ndev = self.n_devices
        batch = min(cfg.batch_size, n)
        batch -= batch % ndev
        if batch == 0:
            raise ValueError(f"batch_size {cfg.batch_size} < n_devices {ndev}")
        local_batch = batch // ndev
        shard = min(max(shard_voxels, batch), n)
        steps_per_shard = shard // batch
        shard = steps_per_shard * batch
        n_shards = -(-n // shard)
        steps_per_epoch = n_shards * steps_per_shard

        key = jax.random.key(cfg.seed)
        if params is None:
            key, k_init = jax.random.split(key)
            params, state = model.init(k_init)
        state = state if state is not None else {}

        tx = make_optimizer(cfg, steps_per_epoch)
        opt_state = tx.init(params)
        base_loss = get_loss(cfg.loss)
        axis = self.axis

        repl = NamedSharding(self.mesh, P())
        rows = NamedSharding(self.mesh, P("data"))
        params = jax.device_put(params, repl)
        state = jax.device_put(state, repl)
        opt_state = jax.device_put(opt_state, repl)

        def shard_stream(params, state, opt_state, key0, coords_l, values_l):
            """Per-device: scan over this device's pre-shuffled batch rows."""
            xb = coords_l.reshape(steps_per_shard, local_batch, -1)
            yb = values_l.reshape(steps_per_shard, local_batch, -1)

            def body(carry, xy):
                params, state, opt_state, k = carry
                k, k_step = jax.random.split(k)
                x, y = xy

                def loss_fn(p, s):
                    if model.loss_fn is not None:
                        return model.loss_fn(p, s, (x, y), k_step, True)
                    y_pred, ns = model.apply(p, s, x, train=True, rng=k_step)
                    return base_loss(y_pred, y), ns

                (loss, new_state), grads = jax.value_and_grad(_maybe_remat(loss_fn, cfg), has_aux=True)(params, state)
                grads = jax.lax.pmean(grads, axis)
                new_state = jax.lax.pmean(new_state, axis) if new_state else new_state
                loss = jax.lax.pmean(loss, axis)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, new_state, opt_state, k), loss

            (params, state, opt_state, _), losses = jax.lax.scan(
                body, (params, state, opt_state, key0), (xb, yb)
            )
            return params, state, opt_state, losses

        smap = shard_map(
            shard_stream,
            mesh=self.mesh,
            in_specs=(P(), P(), P(), P(), P("data"), P("data")),
            out_specs=(P(), P(), P(), P()),
            check_vma=False,
        )
        shard_jit = jax.jit(smap, donate_argnums=(0, 1, 2))

        flat_values, vorder = flatten_volume_source(volume)
        vmin, vscale = resolve_value_range(flat_values, n, shard, value_range)
        synth = make_host_shard_fn(shape, lo, hi, flat_values, vmin, vscale, vorder)

        def host_shard(idx: np.ndarray):
            # device d must see rows usable as (steps, local_batch): global
            # batch layout (steps, ndev, local) -> row-shard layout
            # (ndev, steps, local) so P("data") hands each device its column.
            idx = idx.reshape(steps_per_shard, ndev, local_batch).transpose(1, 0, 2).reshape(-1)
            coords, vals = synth(idx)
            return jax.device_put(coords, rows), jax.device_put(vals, rows)

        hooks = EpochHooks(cfg, steps_per_epoch, eval_fn)

        rng = np.random.default_rng(cfg.seed)
        all_losses, epoch_times = [], []
        t0 = time.perf_counter()
        for e in range(cfg.epochs):
            te = time.perf_counter()
            perm = rng.permutation(n).astype(np.int64)
            pad = n_shards * shard - n
            if pad:
                perm = np.concatenate([perm, perm[:pad]])
            pending = host_shard(perm[:shard])
            epoch_losses = []
            for s in range(n_shards):
                key, ks = jax.random.split(key)
                coords_d, values_d = pending
                params, state, opt_state, losses = shard_jit(
                    params, state, opt_state, ks, coords_d, values_d
                )
                if s + 1 < n_shards:
                    pending = host_shard(perm[(s + 1) * shard:(s + 2) * shard])
                epoch_losses.append(losses)
            jax.block_until_ready(epoch_losses[-1])
            epoch_times.append(time.perf_counter() - te)
            all_losses.extend(epoch_losses)
            hooks.after_epoch(
                e, np.concatenate([np.asarray(l) for l in epoch_losses]),
                lambda: params, state, opt_state)
        hooks.close()
        jax.block_until_ready(params)
        wall = time.perf_counter() - t0

        losses_np = np.concatenate([np.asarray(l) for l in all_losses]) if all_losses else np.array([])
        total_steps = cfg.epochs * steps_per_epoch
        return TrainResult(
            params=params,
            state=state,
            opt_state=opt_state,
            losses=losses_np,
            wall_time_s=wall,
            steps_per_sec=total_steps / wall if wall else float("inf"),
            steps=total_steps,
            epoch_times_s=np.asarray(epoch_times),
        )


# ---------------------------------------------------------------------------


def fit_multi_volume(
    model: Model,
    coords: np.ndarray,       # (N, d) shared coordinate grid
    values: np.ndarray,       # (V, N, 1) one intensity set per volume
    config: TrainConfig,
    mesh: Optional[Mesh] = None,
) -> TrainResult:
    """Fit one INR per volume, volumes sharded across the mesh.

    BASELINE.json config "Multi-volume batched fitting": per-volume parameter
    pytrees are stacked on a leading axis and sharded over ``data``; the
    whole-epoch program is vmapped over that axis, so every device fits its
    own subset of volumes with zero cross-device traffic.
    """
    if mesh is None:
        from .mesh import make_mesh

        mesh = make_mesh()
    ndev = mesh.devices.size
    n_volumes = values.shape[0]
    if n_volumes % ndev != 0:
        raise ValueError(f"n_volumes {n_volumes} must be divisible by mesh size {ndev}")
    n = len(coords)
    batch = min(config.batch_size, n)
    steps_per_epoch = n // batch

    key = jax.random.key(config.seed)
    key, k_init = jax.random.split(key)
    init_keys = jax.random.split(k_init, n_volumes)
    params, state = jax.vmap(model.init)(init_keys)  # stacked pytrees

    tx = make_optimizer(config, steps_per_epoch)
    opt_state = jax.vmap(tx.init)(params)
    base_loss = get_loss(config.loss)

    vol_sharding = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    params = jax.device_put(params, jax.tree.map(lambda _: vol_sharding, params))
    coords_d = jax.device_put(jnp.asarray(coords, jnp.float32), repl)
    values_d = jax.device_put(jnp.asarray(values, jnp.float32), vol_sharding)

    def epoch_one_volume(params, state, opt_state, vol_values, epoch_key):
        perm_key, k0 = jax.random.split(epoch_key)
        perm = jax.random.permutation(perm_key, n)
        idx = perm[: steps_per_epoch * batch].reshape(steps_per_epoch, batch)

        def body(carry, batch_idx):
            params, state, opt_state, k = carry
            k, k_step = jax.random.split(k)
            xb = jnp.take(coords_d, batch_idx, axis=0)
            yb = jnp.take(vol_values, batch_idx, axis=0)

            def loss_fn(p, s):
                y_pred, ns = model.apply(p, s, xb, train=True, rng=k_step)
                return base_loss(y_pred, yb), ns

            (loss, new_state), grads = jax.value_and_grad(_maybe_remat(loss_fn, config), has_aux=True)(params, state)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), new_state, opt_state, k), loss

        (params, state, opt_state, _), losses = jax.lax.scan(body, (params, state, opt_state, k0), idx)
        return params, state, opt_state, losses

    vm = jax.vmap(epoch_one_volume, in_axes=(0, 0, 0, 0, 0))
    epoch_jit = jax.jit(vm, donate_argnums=(0, 1, 2))

    all_losses, epoch_times = [], []
    t0 = time.perf_counter()
    for _ in range(config.epochs):
        key, ek = jax.random.split(key)
        eks = jax.random.split(ek, n_volumes)
        te = time.perf_counter()
        params, state, opt_state, losses = epoch_jit(params, state, opt_state, values_d, eks)
        jax.block_until_ready(losses)
        epoch_times.append(time.perf_counter() - te)
        all_losses.append(losses)  # (V, steps)
    wall = time.perf_counter() - t0

    losses_np = np.concatenate([np.asarray(l) for l in all_losses], axis=-1)  # (V, total_steps)
    total_steps = config.epochs * steps_per_epoch
    return TrainResult(
        params=params,
        state=state,
        opt_state=opt_state,
        losses=losses_np,
        wall_time_s=wall,
        steps_per_sec=total_steps * n_volumes / wall if wall else float("inf"),
        steps=total_steps,
        epoch_times_s=np.asarray(epoch_times),
    )


# ---------------------------------------------------------------------------


def evaluate_grid_sharded(
    model: Model,
    params,
    state,
    shape: Sequence[int],
    mesh: Optional[Mesh] = None,
    lo: float = 0.0,
    hi: float = 1.0,
    chunk_size: int = 1 << 17,
) -> np.ndarray:
    """Dense-grid evaluation with chunks sharded across the mesh.

    The grid's flat index space is split into per-device stripes; each device
    synthesizes its own coordinates (no host grid, no transfers) and runs the
    chunked forward locally; results concatenate on the host. Parity surface:
    launcher.py:191-222's interp loop, at multi-chip scale.
    """
    if mesh is None:
        from .mesh import make_mesh

        mesh = make_mesh()
    ndev = mesh.devices.size
    shape = tuple(int(s) for s in shape)
    n = int(np.prod(shape))
    chunk_size = min(chunk_size, -(-n // ndev))
    chunks_per_dev = -(-n // (ndev * chunk_size))
    padded = ndev * chunks_per_dev * chunk_size

    starts = (jnp.arange(ndev * chunks_per_dev) * chunk_size).reshape(ndev, chunks_per_dev)
    starts = jax.device_put(starts, NamedSharding(mesh, P("data")))
    repl = NamedSharding(mesh, P())
    params = jax.device_put(params, repl)
    state = jax.device_put(state, repl)

    def eval_chunk(start):
        flat = start + jnp.arange(chunk_size)
        flat = jnp.minimum(flat, n - 1)
        x = flat_index_to_coords(flat, shape, lo, hi)
        y, _ = model.apply(params, state, x, train=False, rng=None)
        return y

    def device_fn(my_starts):  # (1, chunks_per_dev) shard
        return jax.lax.map(eval_chunk, my_starts.reshape(-1)).reshape(1, -1)

    smap = shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(P("data"),),
        out_specs=P("data"),
        check_vma=False,
    )
    out = jax.jit(smap)(starts)
    out = np.asarray(out).reshape(padded, -1)[:n]
    if out.shape[-1] == 1:
        return out.reshape(shape)
    return out.reshape(shape + (out.shape[-1],))
