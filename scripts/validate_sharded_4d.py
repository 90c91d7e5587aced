"""Validate hash-table tensor-sharding on a 4D F8 config whose fused table
(>400 MB) genuinely exceeds a single chip's fair share (VERDICT r2 Next #1).

Runs on the 8-device virtual CPU mesh (same rig as tests/conftest.py):
- plans the sharding, asserts the big dense level is row-range split and
  per-device load is ~1/8 of the table;
- bit-parity of the sharded encode vs the single-table oracle on a batch;
- a short ShardedHashTrainer fit (finite, decreasing loss);
writes runs/sharded_4d_validation.json.

Usage: python scripts/validate_sharded_4d.py
"""

import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mri_interpolation_tpu.models import make_hash_mlp
from mri_interpolation_tpu.parallel import make_mesh
from mri_interpolation_tpu.parallel.sharded_table import (
    ShardedHashTrainer,
    plan_table_sharding,
    shard_table,
    sharded_encode_apply,
)
from mri_interpolation_tpu.train import TrainConfig


def main():
    assert len(jax.devices()) == 8, jax.devices()
    mesh = make_mesh(8)

    # 4D F8: finest dense level is the full (352,352,6,15) vertex grid
    # (353*353*7*16 = 13.96M rows) at 8 features — the SURVEY §2.7
    # motivating case (table sizing at reference encoding.py:176,319-321).
    model = make_hash_mlp(
        dim_in=4, n_levels=4, n_features_per_level=8, log2_hashmap_size=24,
        base_resolution=(64, 64, 2, 5), finest_resolution=(352, 352, 6, 15),
        growth="paper", storage="auto", dim_hidden=64, n_layers=2,
        decoder="relu_plain", fused="off",
    )
    enc = model.hparams["encoder"]
    table_mb = enc.total_size * enc.n_features_per_level * 4 / 2**20
    print(f"fused table: {enc.total_size:,} rows x F{enc.n_features_per_level} = {table_mb:.0f} MB")
    assert table_mb > 400, "config must exceed 400 MB to motivate sharding"

    plan = plan_table_sharding(enc, 8)
    loads = [sum(ln for (_, _, ln) in s) for s in plan.slots]
    per_dev_mb = max(loads) * enc.n_features_per_level * 4 / 2**20
    split_dense = sorted({l for s in plan.slots for (l, start, ln) in s
                          if ln > 0 and start > 0 and enc.level_dense[l]})
    print(f"per-device shard: {max(loads):,} rows = {per_dev_mb:.0f} MB; split dense levels: {split_dense}")
    assert split_dense, "big dense levels must be row-range split"
    assert max(loads) <= 1.25 * enc.total_size / 8

    # encode bit-parity vs the single-table oracle
    params = enc.init(jax.random.key(0))
    x = jax.random.uniform(jax.random.key(1), (2048, 4))
    shards = shard_table(np.asarray(params["table"]), enc, plan)
    t0 = time.time()
    got = np.asarray(sharded_encode_apply(enc, plan, mesh, shards, x))
    want = np.asarray(enc.apply(params, x))
    err = float(np.abs(got - want).max())
    print(f"encode parity: max abs err {err:.2e} ({time.time()-t0:.1f}s)")
    assert err < 1e-5, err

    # short sharded fit on synthetic 4D data
    rng = np.random.default_rng(0)
    coords = rng.random((32768, 4), dtype=np.float32)
    values = (np.sin(6 * coords[:, :1]) * np.cos(4 * coords[:, 1:2])).astype(np.float32)
    cfg = TrainConfig(batch_size=4096, epochs=2, lr=5e-3, seed=0)
    t0 = time.time()
    res = ShardedHashTrainer(cfg, mesh=mesh).fit(model, coords, values)
    fit_s = time.time() - t0
    print(f"fit: loss {res.losses[0]:.4f} -> {res.losses[-1]:.4f} in {fit_s:.1f}s")
    assert np.isfinite(res.losses).all()
    assert res.losses[-1] < res.losses[0]

    out = {
        "table_rows": int(enc.total_size),
        "table_mb": round(table_mb, 1),
        "per_device_mb": round(per_dev_mb, 1),
        "split_dense_levels": [int(l) for l in split_dense],
        "encode_parity_max_abs_err": err,
        "fit_first_loss": float(res.losses[0]),
        "fit_last_loss": float(res.losses[-1]),
        "fit_wall_s": round(fit_s, 1),
        "mesh_devices": 8,
    }
    os.makedirs("runs", exist_ok=True)
    with open("runs/sharded_4d_validation.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
