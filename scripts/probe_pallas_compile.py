"""Probe which Pallas kernels LOWER AND COMPILE for the real TPU backend.

The axon tunnel does not EXECUTE Mosaic kernels (pallas_supported() gates
them off at runtime), but compilation runs in the backend compiler and does
work — so "does this kernel lower on current Mosaic?" is answerable today.
Records the per-kernel status to runs/pallas_compile_status.json
(VERDICT r2 Next #4: a Pallas path that compiles today).

Usage: python scripts/probe_pallas_compile.py
"""

import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def try_compile(name, fn, *args):
    try:
        jax.jit(fn).lower(*args).compile()
        print(f"{name}: COMPILES")
        return {"kernel": name, "compiles": True, "error": None}
    except Exception as e:
        msg = f"{type(e).__name__}: {str(e)[:300]}"
        print(f"{name}: FAILS — {msg}")
        return {"kernel": name, "compiles": False, "error": msg}


def main():
    dev = jax.devices()[0]
    print("backend:", dev)
    results = {"device": str(dev), "jax": jax.__version__, "kernels": []}

    from mri_interpolation_tpu.encodings import HashGridEncoding
    from mri_interpolation_tpu.models.siren import _siren_init
    from mri_interpolation_tpu.ops.pallas.fused_mlp import fused_siren_forward
    from mri_interpolation_tpu.ops.pallas.hash_encode import (
        hash_encode_forward,
        pallas_hash_encode,
        pallas_hash_encode_coarse,
    )

    x = jnp.zeros((512, 3), jnp.float32)

    # 1. fused SIREN MLP (matmul + sine only)
    sp = _siren_init(jax.random.key(0), 3, 64, 1, 3, 30.0, 30.0, 6.0)
    results["kernels"].append(try_compile(
        "fused_siren_forward",
        lambda p, xx: fused_siren_forward(p, xx, 3, 30.0, 30.0, tile=256), sp, x))

    # 2. one-hot coarse hash encode, forward (iota/compare/dot only)
    enc = HashGridEncoding(dim=3, n_levels=3, n_features_per_level=2,
                           log2_hashmap_size=11, base_resolution=(3, 3, 2),
                           finest_resolution=(11, 11, 6), storage="auto", growth="paper")
    params = enc.init(jax.random.key(1))
    results["kernels"].append(try_compile(
        "onehot_coarse_forward",
        lambda t, xx: pallas_hash_encode_coarse(enc, {"table": t}, xx, tile=256),
        params["table"], x))

    # 3. one-hot coarse hash encode, backward (dot_general transpose + block +=)
    def loss(t, xx):
        z = pallas_hash_encode_coarse(enc, {"table": t}, xx, tile=256)
        return jnp.sum(z * z)

    results["kernels"].append(try_compile(
        "onehot_coarse_backward", jax.grad(loss), params["table"], x))

    # 4. gather-based fused encode (expected to FAIL until Mosaic lowers
    #    vector gather — recorded so the flip is visible after a jax upgrade)
    results["kernels"].append(try_compile(
        "gather_hash_encode_forward",
        lambda t, xx: hash_encode_forward(enc, {"table": t}, xx, tile=256),
        params["table"], x))
    results["kernels"].append(try_compile(
        "gather_hash_encode_backward",
        jax.grad(lambda t, xx: jnp.sum(pallas_hash_encode(enc, {"table": t}, xx, tile=256) ** 2)),
        params["table"], x))

    os.makedirs("runs", exist_ok=True)
    with open("runs/pallas_compile_status.json", "w") as f:
        json.dump(results, f, indent=2)
    print("wrote runs/pallas_compile_status.json")


if __name__ == "__main__":
    main()
