"""Hash-table tensor-sharding across the device mesh.

The multiresolution hash table is the ONE component whose memory can exceed a
single chip (SURVEY.md §2.7: log2_hashmap_size 23-24 x 16 levels x features;
table sizing at reference encoding.py:176,319-321). This module shards it the
TPU way — by LEVEL over the mesh's ``data`` axis ("expert-parallel" style):

- each device owns a size-balanced subset of the levels' tables (greedy
  bin-packing, ``TableShardingPlan``), holding ~1/ndev of the rows at rest;
- forward: every device computes its own levels' features for the (replicated)
  batch — gathers stay DEVICE-LOCAL, no per-lookup communication — then ONE
  ``all_gather`` of the (N, maxL*F) feature block rides ICI and a static
  column permutation restores logical level order;
- backward: autodiff through ``all_gather`` (its transpose routes each
  device's feature-gradient slice back to the owner), so table-shard grads are
  computed and applied locally; the small decoder is replicated and its grads
  are identical on every device by construction (no pmean needed).

Communication per step: one all_gather of N * maxL * F floats — independent of
table size. This is what makes level sharding the right layout: requests/
responses per lookup (row-sharding + all_to_all) would move 2^d * L ids per
voxel instead.

Restricted to ``storage="hashed"`` encodings (reference-exact semantics; also
the only case whose tables are large — dense levels are small by definition).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..encodings.hashgrid import PRIMES, HashGridEncoding
from ..models.core import dense, dense_init
from ..train.losses import get_loss
from ..train.trainer import TrainConfig, TrainResult, make_optimizer

__all__ = ["TableShardingPlan", "shard_table", "unshard_table", "ShardedHashTrainer"]


@dataclass
class TableShardingPlan:
    """Static level->device assignment + device-indexed geometry arrays."""

    ndev: int
    max_levels: int
    local_rows: int
    assign: List[List[int]]          # device -> level indices (logical order)
    res: np.ndarray                  # (ndev, maxL, d) float32; 1.0 pad
    sizes: np.ndarray                # (ndev, maxL) int64; 1 pad
    local_offsets: np.ndarray        # (ndev, maxL) int64; 0 pad
    valid: np.ndarray                # (ndev, maxL) float32 {0, 1}
    col_perm: np.ndarray             # (L*F,) dev-major gathered col -> logical
    n_levels: int
    n_features: int
    dim: int


def plan_level_sharding(enc: HashGridEncoding, n_devices: int) -> TableShardingPlan:
    if enc.level_dense.any():
        raise ValueError("table sharding requires storage='hashed' (dense levels are small)")
    L, F, d = enc.n_levels, enc.n_features_per_level, enc.input_dim
    sizes = enc.level_sizes.astype(np.int64)
    # Greedy size-balanced assignment: biggest level to least-loaded device.
    order = np.argsort(-sizes)
    loads = np.zeros(n_devices, dtype=np.int64)
    assign: List[List[int]] = [[] for _ in range(n_devices)]
    for l in order:
        dev = int(np.argmin(loads))
        assign[dev].append(int(l))
        loads[dev] += sizes[l]
    for a in assign:
        a.sort()
    max_levels = max(len(a) for a in assign)
    local_rows = int(max(loads))

    res = np.ones((n_devices, max_levels, d), dtype=np.float32)
    sz = np.ones((n_devices, max_levels), dtype=np.int64)
    off = np.zeros((n_devices, max_levels), dtype=np.int64)
    valid = np.zeros((n_devices, max_levels), dtype=np.float32)
    col_perm = np.zeros(L * F, dtype=np.int64)
    for dev, levels in enumerate(assign):
        cursor = 0
        for j, l in enumerate(levels):
            res[dev, j] = enc.level_resolutions[l]
            sz[dev, j] = sizes[l]
            off[dev, j] = cursor
            valid[dev, j] = 1.0
            # gathered layout: (ndev, N, maxL*F) -> (N, ndev*maxL*F) dev-major
            gcol = (dev * max_levels + j) * F
            col_perm[l * F : (l + 1) * F] = np.arange(gcol, gcol + F)
            cursor += int(sizes[l])
    return TableShardingPlan(
        ndev=n_devices, max_levels=max_levels, local_rows=local_rows, assign=assign,
        res=res, sizes=sz, local_offsets=off, valid=valid, col_perm=col_perm,
        n_levels=L, n_features=F, dim=d,
    )


def shard_table(table: np.ndarray, enc: HashGridEncoding, plan: TableShardingPlan) -> np.ndarray:
    """Fused (total, F) table -> (ndev, local_rows, F) padded device shards."""
    table = np.asarray(table)
    out = np.zeros((plan.ndev, plan.local_rows, plan.n_features), dtype=table.dtype)
    for dev, levels in enumerate(plan.assign):
        cursor = 0
        for l in levels:
            n = int(enc.level_sizes[l])
            lo = int(enc.level_offsets[l])
            out[dev, cursor : cursor + n] = table[lo : lo + n]
            cursor += n
    return out


def unshard_table(shards: np.ndarray, enc: HashGridEncoding, plan: TableShardingPlan) -> np.ndarray:
    """Inverse of ``shard_table``."""
    shards = np.asarray(shards)
    out = np.zeros((enc.total_size, plan.n_features), dtype=shards.dtype)
    for dev, levels in enumerate(plan.assign):
        cursor = 0
        for l in levels:
            n = int(enc.level_sizes[l])
            lo = int(enc.level_offsets[l])
            out[lo : lo + n] = shards[dev, cursor : cursor + n]
            cursor += n
    return out


def _local_level_features(plan: TableShardingPlan, consts, local_table, x, my):
    """This device's (N, maxL*F) feature block. ``local_table``: (local_rows, F).

    Geometry is data (indexed by ``my`` = axis_index), so one traced program
    serves every device — the shard_map uniformity requirement.
    """
    d, C = plan.dim, 1 << plan.dim
    res_c, sizes_c, off_c, valid_c = consts
    my_res = res_c[my]          # (maxL, d)
    my_sizes = sizes_c[my]      # (maxL,) uint32
    my_off = off_c[my]          # (maxL,) int32
    my_valid = valid_c[my]      # (maxL,)
    primes = [np.uint32(p) for p in PRIMES[:d]]
    feats = []
    for j in range(plan.max_levels):
        scaled = [x[:, k] * my_res[j, k] for k in range(d)]
        xi = [s.astype(jnp.int32) for s in scaled]
        xf = [s - i.astype(jnp.float32) for s, i in zip(scaled, xi)]
        acc = None
        for c in range(C):
            h = None
            w = None
            for k in range(d):
                t = (xi[k] + ((c >> k) & 1)).astype(jnp.uint32) * primes[k]
                h = t if h is None else h ^ t
                f = xf[k] if (c >> k) & 1 else 1.0 - xf[k]
                w = f if w is None else w * f
            idx = (h % my_sizes[j]).astype(jnp.int32) + my_off[j]
            contrib = jnp.take(local_table, idx, axis=0) * w[:, None]
            acc = contrib if acc is None else acc + contrib
        feats.append(acc * my_valid[j])
    return jnp.concatenate(feats, axis=-1)  # (N, maxL*F)


class ShardedHashTrainer:
    """Fits a hashed-storage HashGrid encoder + plain ReLU decoder with the
    table tensor-sharded over the mesh.

    The decoder mirrors ``make_hash_mlp(decoder="relu_plain")`` (the tcnn
    FullyFusedMLP shape). Returns a TrainResult whose ``params`` carry the
    UNSHARDED fused table, so standard single-device evaluation
    (``infer.evaluate_grid`` on a ``make_hash_mlp`` model) applies directly.
    """

    def __init__(self, config: TrainConfig, mesh: Optional[Mesh] = None, axis_name: str = "data"):
        self.config = config
        self.axis = axis_name
        if mesh is None:
            from .mesh import make_mesh

            mesh = make_mesh(axis_name=axis_name)
        self.mesh = mesh
        self.ndev = mesh.devices.size

    def fit(
        self,
        enc: HashGridEncoding,
        coords: np.ndarray,
        values: np.ndarray,
        dim_hidden: int = 64,
        n_layers: int = 2,
        dim_out: int = 1,
    ):
        cfg = self.config
        axis = self.axis
        plan = plan_level_sharding(enc, self.ndev)
        n = len(coords)
        batch = min(cfg.batch_size, n)
        steps_per_epoch = n // batch
        if steps_per_epoch == 0:
            raise ValueError(f"batch {batch} exceeds dataset size {n}")

        key = jax.random.key(cfg.seed)
        key, k_enc, k_dec = jax.random.split(key, 3)
        table = enc.init(k_enc)["table"]
        shards = jnp.asarray(shard_table(np.asarray(table), enc, plan))
        widths = [enc.output_dim] + [dim_hidden] * (n_layers - 1) + [dim_out]
        dkeys = jax.random.split(k_dec, n_layers)
        dec = [dense_init(dkeys[i], widths[i], widths[i + 1]) for i in range(n_layers)]

        # Separate transforms so optimizer state shards like its parameters:
        # table moments live with the table shard (P(axis)), decoder moments
        # are replicated.
        tx_tab = make_optimizer(cfg, steps_per_epoch)
        tx_dec = make_optimizer(cfg, steps_per_epoch)
        base_loss = get_loss(cfg.loss)

        consts = (
            jnp.asarray(plan.res),
            jnp.asarray(plan.sizes.astype(np.uint32)),
            jnp.asarray(plan.local_offsets.astype(np.int32)),
            jnp.asarray(plan.valid),
        )
        col_perm = jnp.asarray(plan.col_perm)
        maxLF = plan.max_levels * plan.n_features

        coords_d = jnp.asarray(coords, jnp.float32)
        values_d = jnp.asarray(values, jnp.float32)

        def decoder_apply(dec_params, z):
            for i in range(n_layers):
                z = dense(dec_params[i], z)
                if i < n_layers - 1:
                    z = jax.nn.relu(z)
            return z

        def encode(local_table, x, my):
            mine = _local_level_features(plan, consts, local_table, x, my)  # (N, maxL*F)
            allf = jax.lax.all_gather(mine, axis)                            # (ndev, N, maxL*F)
            allf = jnp.moveaxis(allf, 0, 1).reshape(x.shape[0], plan.ndev * maxLF)
            return jnp.take(allf, col_perm, axis=-1)                         # logical level order

        def epoch_shard(local_table3, dec_params, tab_opt3, dec_opt, epoch_key):
            # local_table3: this device's (1, local_rows, F) shard
            local_table = local_table3[0]
            tab_opt = jax.tree.map(lambda a: a[0], tab_opt3)
            my = jax.lax.axis_index(axis)
            perm_key, _ = jax.random.split(epoch_key)
            perm = jax.random.permutation(perm_key, n)  # same on all devices
            idx = perm[: steps_per_epoch * batch].reshape(steps_per_epoch, batch)

            def body(carry, batch_idx):
                local_table, dec_params, tab_opt, dec_opt = carry
                xb = jnp.take(coords_d, batch_idx, axis=0)
                yb = jnp.take(values_d, batch_idx, axis=0)

                def loss_fn(local_table, dec_params):
                    z = encode(local_table, xb, my)
                    return base_loss(decoder_apply(dec_params, z), yb)

                loss, (g_tab, g_dec) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
                    local_table, dec_params
                )
                # Decoder compute is replicated with identical inputs -> its
                # grads are already identical on every device (no pmean);
                # table grads are local by construction (the all_gather
                # transpose routed each feature-grad slice to its owner).
                u_tab, tab_opt = tx_tab.update(g_tab, tab_opt, local_table)
                u_dec, dec_opt = tx_dec.update(g_dec, dec_opt, dec_params)
                local_table = optax.apply_updates(local_table, u_tab)
                dec_params = optax.apply_updates(dec_params, u_dec)
                return (local_table, dec_params, tab_opt, dec_opt), loss

            (local_table, dec_params, tab_opt, dec_opt), losses = jax.lax.scan(
                body, (local_table, dec_params, tab_opt, dec_opt), idx
            )
            return (local_table[None], dec_params,
                    jax.tree.map(lambda a: a[None], tab_opt), dec_opt, losses)

        tab_opt = jax.vmap(tx_tab.init)(shards)  # leading ndev axis, sharded
        dec_opt = tx_dec.init(dec)

        smap = shard_map(
            epoch_shard,
            mesh=self.mesh,
            in_specs=(P(axis), P(), P(axis), P(), P()),
            out_specs=(P(axis), P(), P(axis), P(), P()),
            check_vma=False,
        )
        epoch_jit = jax.jit(smap, donate_argnums=(0, 1, 2, 3))

        shard_spec = NamedSharding(self.mesh, P(axis))
        repl = NamedSharding(self.mesh, P())
        shards = jax.device_put(shards, shard_spec)
        dec = jax.device_put(dec, repl)
        tab_opt = jax.device_put(tab_opt, jax.tree.map(lambda _: shard_spec, tab_opt))
        dec_opt = jax.device_put(dec_opt, repl)

        all_losses, epoch_times = [], []
        t0 = time.perf_counter()
        for _ in range(cfg.epochs):
            key, ek = jax.random.split(key)
            te = time.perf_counter()
            shards, dec, tab_opt, dec_opt, losses = epoch_jit(shards, dec, tab_opt, dec_opt, ek)
            jax.block_until_ready(losses)
            epoch_times.append(time.perf_counter() - te)
            all_losses.append(losses)
        wall = time.perf_counter() - t0

        table_full = unshard_table(np.asarray(jax.device_get(shards)), enc, plan)
        params = {"encoder": {"table": jnp.asarray(table_full)}, "layers": jax.device_get(dec)}
        losses_np = np.concatenate([np.asarray(l) for l in all_losses])
        total_steps = cfg.epochs * steps_per_epoch
        return TrainResult(
            params=params,
            state={},
            opt_state=(tab_opt, dec_opt),
            losses=losses_np,
            wall_time_s=wall,
            steps_per_sec=total_steps / wall if wall else float("inf"),
            steps=total_steps,
            epoch_times_s=np.asarray(epoch_times),
        )
