"""Pallas TPU kernels.

Every kernel here is gated on equivalence with a plain-JAX oracle
(tests/test_pallas.py runs them in interpreter mode on CPU; TPU runs use the
compiled path). Current kernels:

- fused_mlp: fused MLP stack (sine/relu/gelu activations) — weights
  VMEM-resident, activations never leave the chip between layers; custom VJP
  with sequential-grid weight-gradient accumulation. The FullyFusedMLP
  equivalent (SURVEY.md §2.6).
- hash_encode: fused multiresolution hash encoding — per-level hash + corner
  gathers from a VMEM-resident table + multilinear reduce; custom VJP with
  in-kernel scatter-add table gradients. The tcnn HashGrid equivalent.

``resolve_fused`` maps a model factory's ``fused`` knob ("auto" | "on" |
"off" | "interpret") to the execution mode for the current backend.
"""

from .fused_mlp import (
    fused_mlp_apply,
    fused_mlp_forward,
    fused_siren_apply,
    fused_siren_forward,
    pallas_supported,
)
from .hash_encode import (
    coarse_onehot_levels,
    hash_encode_forward,
    pallas_hash_encode,
    pallas_hash_encode_coarse,
    table_fits_vmem,
)

__all__ = [
    "fused_siren_apply",
    "fused_siren_forward",
    "fused_mlp_apply",
    "fused_mlp_forward",
    "pallas_hash_encode",
    "pallas_hash_encode_coarse",
    "coarse_onehot_levels",
    "hash_encode_forward",
    "table_fits_vmem",
    "pallas_supported",
    "resolve_fused",
    "maybe_reprobe",
]


def resolve_fused(fused: str) -> str:
    """Resolve a factory's ``fused`` knob: returns "off", "on" (compiled) or
    "interpret" (interpreter mode, test/debug). "auto" enables the compiled
    path only on backends that execute Mosaic kernels."""
    if fused == "auto":
        return "on" if pallas_supported() else "off"
    if fused not in ("off", "on", "interpret"):
        raise ValueError(f"unknown fused mode {fused!r}")
    return fused


def maybe_reprobe(status_path: str = "runs/pallas_exec_status.json",
                  timeout_s: float = 600.0) -> bool:
    """Re-run the hardware kernel probe when the JAX stack has changed.

    Status quo (measured, ``runs/pallas_exec_status.json``): the hand
    kernels LOSE to XLA everywhere they execute on this stack (fused SIREN
    forward 0.61-0.96x, backward 0.39x, one-hot coarse encode ~0.9x), and
    the general hashed-gather kernel cannot compile (Mosaic has no vector
    gather). The transaction-roofline measurement (RESULTS.md) explains
    why: the train step is bound by random-access transactions that XLA's
    fused packed gather already pipelines to within ~2x of the measured
    per-access floor — there is no headroom for a scalar-loop Mosaic
    kernel to claim. The kernels are therefore RETIRED to oracle-checked
    prototypes (``fused="auto"`` keeps selecting XLA).

    This hook keeps the retirement honest across toolchain upgrades: when
    ``jax.__version__`` differs from the recorded probe, the exec benchmark
    re-runs (subprocess, bounded) and rewrites the record — if a future
    Mosaic gains vector gather or faster small-matmul lowering, the new
    numbers surface without anyone remembering to look. Returns True when
    a reprobe ran."""
    import json
    import os
    import subprocess
    import sys

    import jax

    # Gate on the device platform, not pallas_supported(): on the axon
    # tunnel the latter is False by design (auto->off), but the exec probe
    # is exactly the thing that measures whether that should change.
    if jax.devices()[0].platform != "tpu":
        return False
    try:
        with open(status_path) as f:
            recorded = json.load(f).get("jax")
    except (OSError, ValueError):
        recorded = None
    if recorded == jax.__version__:
        return False
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    script = os.path.join(repo, "scripts", "bench_pallas_exec.py")
    if not os.path.exists(script):
        return False
    try:
        proc = subprocess.run([sys.executable, script], cwd=repo,
                              timeout=timeout_s, check=False)
    except subprocess.TimeoutExpired:
        # a Mosaic launch hang (the pre-2026-08-19 tunnel behavior) — leave
        # the stale record in place rather than lose it
        return False
    if proc.returncode != 0:
        # a crashed probe must not read as "reprobed" while the stale record
        # still carries the old jax version (advisor round 4)
        return False
    try:
        with open(status_path) as f:
            return json.load(f).get("jax") == jax.__version__
    except (OSError, ValueError):
        return False
