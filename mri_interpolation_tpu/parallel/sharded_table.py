"""Hash-table tensor-sharding across the device mesh.

The multiresolution hash table is the ONE component whose memory can exceed a
single chip (SURVEY.md §2.7: log2_hashmap_size 23-24 x 16 levels x features;
table sizing at reference encoding.py:176,319-321 — a full-resolution 4D
dense level at F=8 is ~450 MB on its own). This module shards the fused table
the TPU way, over the mesh's ``data`` axis:

- the table is partitioned into per-device SLOTS. A level whose rows fit a
  device's fair share is assigned whole (greedy size-balanced bin-packing);
  a level LARGER than the fair share — the production case: big dense levels
  — is split into one contiguous vertex row-range per device. Dense-level
  split boundaries are aligned to whole time-lines (multiples of the last
  axis's vertex count) so the temporal-TV prior stays device-local;
- forward: every device computes the oracle corner geometry
  (``HashGridEncoding.corner_ids_and_weights`` — the exact ids/weights the
  single-table path uses), gathers ONLY from its local shard (out-of-range
  corners masked to weight 0), and contributes a partial (N, S*F) feature
  block; ONE ``all_gather`` rides ICI and a static (ndev*S, L) 0/1 matmul
  sums the partials back into logical level order. Whole-level slots have
  exactly one contributor; split slots sum across devices — one uniform
  reconstruction for both;
- backward: autodiff through ``all_gather`` (its transpose routes each
  device's feature-gradient slice back to the owner), so table-shard grads
  are computed and applied locally. Decoder compute is replicated with
  identical inputs, so its grads are identical on every device (no pmean).

Communication per step: one all_gather of N * S * F floats — independent of
table size. Per-lookup request/response routing (all_to_all of 2^d * L ids
per voxel) would move far more and serialize on ICI latency.

``ShardedHashTrainer`` COMPOSES with the standard model/`Trainer` semantics
rather than forking them: it consumes any ``make_hash_mlp`` model (norm /
norm_proper / relu_plain decoders, dropout), mirrors ``Trainer.fit``'s RNG
threading, shuffle/drop_last, freeze masks, grad accumulation, scalars
stream and epoch checkpoints, and supports the ``temporal_tv`` table prior
via an exactly-decomposed device-local formulation.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..encodings.hashgrid import HashGridEncoding
from ..models.core import Model
from ..train.losses import get_loss
from ..train.trainer import EpochHooks, TrainConfig, TrainResult, make_optimizer

__all__ = [
    "TableShardingPlan",
    "plan_table_sharding",
    "shard_table",
    "unshard_table",
    "make_sharded_encode",
    "sharded_encode_apply",
    "evaluate_grid_sharded_table",
    "ShardedHashTrainer",
]


@dataclass
class TableShardingPlan:
    """Static slot layout: device -> [(level, start, length)] row-ranges.

    ``start``/``length`` are LEVEL-RELATIVE rows; device arrays below are
    padded to ``n_slots`` slots (length 0 = inert slot) and carry GLOBAL row
    starts (level offset + start) so the encode path works off the oracle's
    global corner ids directly.
    """

    ndev: int
    n_slots: int
    local_rows: int
    slots: List[List[Tuple[int, int, int]]]
    slot_level: np.ndarray   # (ndev, S) int32; 0 pad
    slot_lo: np.ndarray     # (ndev, S) int64 global row start; 0 pad
    slot_len: np.ndarray    # (ndev, S) int64; 0 pad
    slot_off: np.ndarray    # (ndev, S) int64 local row offset; 0 pad
    scatter: np.ndarray     # (ndev*S, L) float32 gathered-slot -> level sum
    tv_mask: np.ndarray     # (ndev, local_rows) f32: rows (r, r+1) time-adjacent
    tv_pairs: int           # total time-adjacent row pairs (all devices)
    n_levels: int
    n_features: int
    dim: int


def plan_table_sharding(enc: HashGridEncoding, n_devices: int) -> TableShardingPlan:
    """Partition the fused table: big levels split by contiguous row-range
    across all devices, the rest greedily bin-packed by size."""
    L, F, d = enc.n_levels, enc.n_features_per_level, enc.input_dim
    sizes = enc.level_sizes.astype(np.int64)
    total = int(sizes.sum())
    fair = -(-total // n_devices)

    slots: List[List[Tuple[int, int, int]]] = [[] for _ in range(n_devices)]
    loads = np.zeros(n_devices, dtype=np.int64)
    big = [l for l in range(L) if int(sizes[l]) > fair]
    small = sorted((l for l in range(L) if int(sizes[l]) <= fair), key=lambda l: -int(sizes[l]))

    for l in big:
        size = int(sizes[l])
        # Dense levels: align split boundaries to whole time-lines (the last
        # axis is fastest-varying in the row-major vertex grid) so every
        # temporal-adjacent vertex pair lives on one device.
        align = int(enc.level_resolutions[l][-1]) + 1 if enc.level_dense[l] else 1
        bounds = [0]
        for i in range(1, n_devices):
            b = int(round(i * size / n_devices / align)) * align
            bounds.append(min(max(b, bounds[-1]), size))
        bounds.append(size)
        for dev in range(n_devices):
            length = bounds[dev + 1] - bounds[dev]
            slots[dev].append((l, bounds[dev], length))
            loads[dev] += length
    for l in small:
        dev = int(np.argmin(loads))
        slots[dev].append((l, 0, int(sizes[l])))
        loads[dev] += sizes[l]
    for s in slots:
        s.sort()

    S = max(1, max(len(s) for s in slots))
    local_rows = max(1, int(loads.max()))

    slot_level = np.zeros((n_devices, S), dtype=np.int32)
    slot_lo = np.zeros((n_devices, S), dtype=np.int64)
    slot_len = np.zeros((n_devices, S), dtype=np.int64)
    slot_off = np.zeros((n_devices, S), dtype=np.int64)
    scatter = np.zeros((n_devices * S, L), dtype=np.float32)
    tv_mask = np.zeros((n_devices, local_rows), dtype=np.float32)
    tv_pairs = 0
    for dev, dev_slots in enumerate(slots):
        cursor = 0
        for j, (l, start, length) in enumerate(dev_slots):
            slot_level[dev, j] = l
            slot_lo[dev, j] = int(enc.level_offsets[l]) + start
            slot_len[dev, j] = length
            slot_off[dev, j] = cursor
            if length > 0:
                scatter[dev * S + j, l] = 1.0
            if length > 1 and enc.level_dense[l]:
                # rows (r, r+1) within the slot are time-adjacent unless r is
                # the last vertex of its time-line.
                vt = int(enc.level_resolutions[l][-1]) + 1
                g = start + np.arange(length - 1)
                adj = (g % vt) != (vt - 1)
                tv_mask[dev, cursor : cursor + length - 1] = adj.astype(np.float32)
                tv_pairs += int(adj.sum())
            cursor += length

    # Alignment invariant: the sharded TV decomposition is exact — every
    # within-line adjacent pair is counted exactly once.
    expected = 0
    for l in range(L):
        if enc.level_dense[l]:
            verts = enc.level_resolutions[l].astype(np.int64) + 1
            if verts[-1] >= 2:
                expected += int(np.prod(verts[:-1]) * (verts[-1] - 1))
    assert tv_pairs == expected, (tv_pairs, expected)

    return TableShardingPlan(
        ndev=n_devices, n_slots=S, local_rows=local_rows, slots=slots,
        slot_level=slot_level, slot_lo=slot_lo, slot_len=slot_len,
        slot_off=slot_off, scatter=scatter, tv_mask=tv_mask, tv_pairs=tv_pairs,
        n_levels=L, n_features=F, dim=d,
    )


def shard_table(table: np.ndarray, enc: HashGridEncoding, plan: TableShardingPlan) -> np.ndarray:
    """Fused (total, F) table -> (ndev, local_rows, F) padded device shards."""
    table = np.asarray(table)
    out = np.zeros((plan.ndev, plan.local_rows, plan.n_features), dtype=table.dtype)
    for dev, dev_slots in enumerate(plan.slots):
        cursor = 0
        for l, start, length in dev_slots:
            lo = int(enc.level_offsets[l]) + start
            out[dev, cursor : cursor + length] = table[lo : lo + length]
            cursor += length
    return out


def unshard_table(shards: np.ndarray, enc: HashGridEncoding, plan: TableShardingPlan) -> np.ndarray:
    """Inverse of ``shard_table``."""
    shards = np.asarray(shards)
    out = np.zeros((enc.total_size, plan.n_features), dtype=shards.dtype)
    for dev, dev_slots in enumerate(plan.slots):
        cursor = 0
        for l, start, length in dev_slots:
            lo = int(enc.level_offsets[l]) + start
            out[lo : lo + length] = shards[dev, cursor : cursor + length]
            cursor += length
    return out


def make_sharded_encode(
    enc: HashGridEncoding, plan: TableShardingPlan, axis_name: str = "data"
) -> Callable:
    """Build ``encode(local_table, x) -> (N, L*F)`` for use INSIDE shard_map.

    Uses the oracle geometry (``corner_ids_and_weights``) so the sharded
    features equal ``HashGridEncoding.apply`` up to summation order
    (tests/test_sharded_table.py asserts allclose at 1e-6).
    """
    F, L, S = plan.n_features, plan.n_levels, plan.n_slots
    slot_level = jnp.asarray(plan.slot_level)
    slot_lo = jnp.asarray(plan.slot_lo.astype(np.int32))
    slot_len = jnp.asarray(plan.slot_len.astype(np.int32))
    slot_off = jnp.asarray(plan.slot_off.astype(np.int32))
    scatter = jnp.asarray(plan.scatter)

    def encode(local_table, x):
        my = jax.lax.axis_index(axis_name)
        n = x.shape[0]
        ids, w = enc.corner_ids_and_weights(x)          # (n, L, C) global rows
        ids_s = jnp.take(ids, slot_level[my], axis=-2)   # (n, S, C)
        w_s = jnp.take(w, slot_level[my], axis=-2)
        lo = slot_lo[my][None, :, None]
        ln = slot_len[my][None, :, None]
        off = slot_off[my][None, :, None]
        rel = ids_s - lo
        inb = (rel >= 0) & (rel < ln)
        lidx = jnp.where(inb, rel, 0) + off
        rows = jnp.take(local_table, lidx.reshape(-1), axis=0).reshape(n, S, 1 << plan.dim, F)
        partial = jnp.einsum("nscf,nsc->nsf", rows, w_s * inb.astype(w_s.dtype))
        gathered = jax.lax.all_gather(partial.reshape(n, S * F), axis_name)  # (ndev, n, S*F)
        gath = jnp.moveaxis(gathered, 0, 1).reshape(n, plan.ndev * S, F)
        feats = jnp.einsum("nkf,kl->nlf", gath, scatter)  # partial-sum + reorder
        return feats.reshape(n, L * F)

    return encode


def sharded_encode_apply(
    enc: HashGridEncoding,
    plan: TableShardingPlan,
    mesh: Mesh,
    shards: jnp.ndarray,
    x: jnp.ndarray,
    axis_name: str = "data",
) -> jnp.ndarray:
    """Run the sharded encode end-to-end (shard_map wrapper): the distributed
    equivalent of ``enc.apply({"table": t}, x)``."""
    encode = make_sharded_encode(enc, plan, axis_name)
    fn = shard_map(
        lambda shards3, x: encode(shards3[0], x),  # strip the per-device lead axis
        mesh=mesh, in_specs=(P(axis_name), P()), out_specs=P(), check_vma=False,
    )
    return jax.jit(fn)(shards, x)


def evaluate_grid_sharded_table(
    model: Model,
    plan: TableShardingPlan,
    mesh: Mesh,
    shards,
    dec_params,
    state,
    shape,
    lo: float = 0.0,
    hi: float = 1.0,
    chunk_size: int = 1 << 16,
    axis_name: str = "data",
) -> np.ndarray:
    """Dense-grid inference with the table STILL SHARDED: coordinates are
    synthesized on device, each chunk is encoded with the distributed encode
    (device-local gathers + one all_gather) and decoded with the replicated
    decoder — the full table never materializes on one chip, so models whose
    tables exceed single-chip HBM can run the super-resolution path too.

    ``shards``: (ndev, local_rows, F) as produced by ``shard_table`` /
    ``ShardedHashTrainer``; ``dec_params``: the non-encoder params dict.
    """
    from ..infer.grid import flat_index_to_coords

    enc: HashGridEncoding = model.hparams["encoder"]
    decode = model.hparams["decode"]
    encode = make_sharded_encode(enc, plan, axis_name)
    shape = tuple(int(s) for s in shape)
    n = int(np.prod(shape))
    chunk_size = min(chunk_size, n)
    n_chunks = -(-n // chunk_size)
    starts = jnp.arange(n_chunks) * chunk_size

    def run(shards3, dec_params, state):
        local = shards3[0]

        def eval_chunk(carry, start):
            flat = jnp.minimum(start + jnp.arange(chunk_size), n - 1)
            x = flat_index_to_coords(flat, shape, lo, hi)
            z = encode(local, x)
            y, _ = decode(dec_params, state, z, train=False, rng=None)
            return carry, y

        return jax.lax.scan(eval_chunk, 0, starts)[1]

    fn = shard_map(run, mesh=mesh, in_specs=(P(axis_name), P(), P()),
                   out_specs=P(), check_vma=False)
    out = np.asarray(jax.jit(fn)(shards, dec_params, state)).reshape(-1, 1)[:n]
    return out.reshape(shape)


class ShardedHashTrainer:
    """Fits a ``make_hash_mlp`` model with its hash table tensor-sharded over
    the mesh, composing the model's own init/decoder semantics.

    Mirrors ``Trainer.fit`` (same RNG threading, shuffle/drop_last, loss
    registry, freeze masks, grad accumulation, scalars stream, epoch
    checkpoints); only the encoder forward/backward is distributed. Returns a
    TrainResult whose ``params`` carry the UNSHARDED fused table in the
    standard layout, so ``infer.evaluate_grid`` applies directly.
    """

    def __init__(
        self,
        config: TrainConfig,
        mesh: Optional[Mesh] = None,
        axis_name: str = "data",
        freeze_mask_fn: Optional[Callable] = None,
    ):
        self.config = config
        self.axis = axis_name
        if mesh is None:
            from .mesh import make_mesh

            mesh = make_mesh(axis_name=axis_name)
        self.mesh = mesh
        self.ndev = mesh.devices.size
        self.freeze_mask_fn = freeze_mask_fn

    def fit(
        self,
        model: Model,
        coords: np.ndarray,
        values: np.ndarray,
        params=None,
        state=None,
        eval_fn=None,
    ) -> TrainResult:
        """``eval_fn(params, state) -> {tag: value}``: periodic eval metrics
        every ``cfg.eval_every_epochs`` epochs, streamed into the scalars
        JSONL (same semantics as ``Trainer.fit``; the table is un-sharded to
        full params only on firing epochs)."""
        cfg = self.config
        axis = self.axis
        enc: HashGridEncoding = model.hparams.get("encoder")
        decode = model.hparams.get("decode")
        if enc is None or decode is None:
            raise ValueError(
                "ShardedHashTrainer requires a make_hash_mlp-style model "
                "(hparams must expose 'encoder' and 'decode')"
            )
        if int(model.hparams.get("level_anneal_steps", 0) or 0) > 0:
            # The curriculum weighting lives in model.apply, which this
            # trainer REPLACES with its distributed encode + plain decode;
            # training would silently skip the anneal and leave anneal_step
            # at 0, making later model.apply zero every level but the first.
            raise ValueError(
                "level_anneal_steps does not compose with ShardedHashTrainer "
                "(the anneal weighting lives in model.apply, which the "
                "distributed encode path replaces)"
            )
        temporal_tv = float(model.hparams.get("temporal_tv", 0.0))
        plan = plan_table_sharding(enc, self.ndev)

        n = len(coords)
        batch = min(cfg.batch_size, n)
        steps_per_epoch = n // batch if cfg.drop_last else -(-n // batch)
        if steps_per_epoch == 0:
            raise ValueError(f"batch_size {batch} exceeds dataset size {n}")

        key = jax.random.key(cfg.seed)
        if params is None:
            key, k_init = jax.random.split(key)
            params, state = model.init(k_init)
        state = state if state is not None else {}
        # Defensive copy: epoch buffers are donated, and caller-provided
        # params must stay valid (two-phase protocol reuses phase-1 params).
        dec_params = jax.tree.map(jnp.array, {k: v for k, v in params.items() if k != "encoder"})
        state = jax.tree.map(jnp.array, state)
        shards = jnp.asarray(shard_table(np.asarray(params["encoder"]["table"]), enc, plan))

        tx_tab = make_optimizer(cfg, steps_per_epoch)
        tx_dec = make_optimizer(cfg, steps_per_epoch)
        if self.freeze_mask_fn is not None:
            mask = self.freeze_mask_fn(params)
            if not all(jax.tree.leaves(mask.get("encoder", True))):
                tx_tab = optax.chain(optax.set_to_zero(), tx_tab)
            dec_mask = {k: v for k, v in mask.items() if k != "encoder"}
            tx_dec = optax.chain(
                optax.masked(optax.set_to_zero(), jax.tree.map(lambda t: not t, dec_mask)),
                tx_dec,
            )
        base_loss = get_loss(cfg.loss)
        encode = make_sharded_encode(enc, plan, axis)
        tv_mask_c = jnp.asarray(plan.tv_mask)
        tv_count = max(plan.tv_pairs * plan.n_features, 1)

        coords_d = jnp.asarray(coords, jnp.float32)
        values_d = jnp.asarray(values, jnp.float32)

        def epoch_shard(shards3, dec_params, state, tab_opt3, dec_opt, epoch_key):
            local_table = shards3[0]
            tab_opt = jax.tree.map(lambda a: a[0], tab_opt3)
            my = jax.lax.axis_index(axis)
            # RNG threading mirrors Trainer.epoch_fn exactly, so a sharded fit
            # visits the same batches (and dropout masks) as the reference fit.
            if cfg.shuffle:
                perm_key, step_key0 = jax.random.split(epoch_key)
                perm = jax.random.permutation(perm_key, n)
            else:
                step_key0 = epoch_key
                perm = jnp.arange(n)
            pad = steps_per_epoch * batch - n
            if pad > 0:
                perm = jnp.concatenate([perm, perm[:pad]])
            idx = perm[: steps_per_epoch * batch].reshape(steps_per_epoch, batch)

            def body(carry, batch_idx):
                local_table, dec_params, state, tab_opt, dec_opt, k = carry
                k, k_step = jax.random.split(k)
                xb = jnp.take(coords_d, batch_idx, axis=0)
                yb = jnp.take(values_d, batch_idx, axis=0)

                def loss_fn(local_table, dec_params):
                    z = encode(local_table, xb)
                    y_pred, new_state = decode(dec_params, state, z, train=True, rng=k_step)
                    loss = base_loss(y_pred, yb)
                    if temporal_tv > 0.0:
                        # Device-local exact decomposition of
                        # encodings.temporal_table_tv: split boundaries are
                        # time-line aligned, so every adjacent pair is local.
                        diff2 = (local_table[1:] - local_table[:-1]) ** 2
                        tv_local = jnp.sum(diff2 * tv_mask_c[my][: local_table.shape[0] - 1, None])
                        loss = loss + temporal_tv * jax.lax.psum(tv_local, axis) / tv_count
                    return loss, new_state

                if cfg.remat:
                    # parity with Trainer._loss_fn: TrainConfig.remat must not
                    # be a silent no-op here (recompute includes the local TV
                    # psum — one extra cheap scalar collective in backward).
                    loss_fn = jax.checkpoint(loss_fn)
                (loss, new_state), (g_tab, g_dec) = jax.value_and_grad(
                    loss_fn, argnums=(0, 1), has_aux=True
                )(local_table, dec_params)
                # Decoder compute is replicated with identical inputs -> its
                # grads are already identical on every device (no pmean);
                # table grads are local (the all_gather transpose routed each
                # feature-grad slice back to its owner).
                u_tab, tab_opt = tx_tab.update(g_tab, tab_opt, local_table)
                u_dec, dec_opt = tx_dec.update(g_dec, dec_opt, dec_params)
                local_table = optax.apply_updates(local_table, u_tab)
                dec_params = optax.apply_updates(dec_params, u_dec)
                return (local_table, dec_params, new_state, tab_opt, dec_opt, k), loss

            (local_table, dec_params, state, tab_opt, dec_opt, _), losses = jax.lax.scan(
                body, (local_table, dec_params, state, tab_opt, dec_opt, step_key0), idx
            )
            return (
                local_table[None],
                dec_params,
                state,
                jax.tree.map(lambda a: a[None], tab_opt),
                dec_opt,
                losses,
            )

        tab_opt = jax.vmap(tx_tab.init)(shards)  # leading ndev axis, sharded
        dec_opt = tx_dec.init(dec_params)

        smap = shard_map(
            epoch_shard,
            mesh=self.mesh,
            in_specs=(P(axis), P(), P(), P(axis), P(), P()),
            out_specs=(P(axis), P(), P(), P(axis), P(), P()),
            check_vma=False,
        )
        epoch_jit = jax.jit(smap, donate_argnums=(0, 1, 2, 3, 4))

        shard_spec = NamedSharding(self.mesh, P(axis))
        repl = NamedSharding(self.mesh, P())
        shards = jax.device_put(shards, shard_spec)
        dec_params = jax.device_put(dec_params, repl)
        state = jax.device_put(state, repl)
        tab_opt = jax.device_put(tab_opt, jax.tree.map(lambda _: shard_spec, tab_opt))
        dec_opt = jax.device_put(dec_opt, repl)

        def _full_params(shards, dec_params):
            table = unshard_table(np.asarray(jax.device_get(shards)), enc, plan)
            return {"encoder": {"table": jnp.asarray(table)}, **jax.device_get(dec_params)}

        # Shared per-epoch housekeeping (scalars / periodic eval / epoch
        # checkpoints — train/trainer.py:EpochHooks). params_fn is lazy: the
        # table is un-sharded only on epochs where an eval or checkpoint
        # actually fires.
        hooks = EpochHooks(cfg, steps_per_epoch, eval_fn)

        all_losses, epoch_times = [], []
        t0 = time.perf_counter()
        for e in range(cfg.epochs):
            key, ek = jax.random.split(key)
            te = time.perf_counter()
            shards, dec_params, state, tab_opt, dec_opt, losses = epoch_jit(
                shards, dec_params, state, tab_opt, dec_opt, ek
            )
            jax.block_until_ready(losses)
            epoch_times.append(time.perf_counter() - te)
            all_losses.append(losses)
            hooks.after_epoch(
                e, losses, lambda: _full_params(shards, dec_params), state)
        hooks.close()
        wall = time.perf_counter() - t0

        losses_np = np.concatenate([np.asarray(l) for l in all_losses])
        total_steps = cfg.epochs * steps_per_epoch
        return TrainResult(
            params=_full_params(shards, dec_params),
            state=jax.device_get(state),
            opt_state=(tab_opt, dec_opt),
            losses=losses_np,
            wall_time_s=wall,
            steps_per_sec=total_steps / wall if wall else float("inf"),
            steps=total_steps,
            epoch_times_s=np.asarray(epoch_times),
        )
