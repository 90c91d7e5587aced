"""Runtime utilities: compilation cache, profiling, debug helpers."""

from __future__ import annotations

import os

import jax

__all__ = ["setup_compilation_cache", "enable_nan_debugging", "capture_trace",
           "time_fn", "device_count_nonblocking",
           "maybe_reprobe_workarounds", "workaround_active"]

from .workarounds import maybe_reprobe_workarounds, workaround_active  # noqa: E402


def device_count_nonblocking(timeout_s: float = 60.0) -> int:
    """``len(jax.devices())`` behind a watchdog thread.

    Enumerating the axon TPU tunnel BLOCKS indefinitely when the tunnel is
    down (observed in this environment), and the driver-facing entry points
    (bench.py, __graft_entry__.dryrun_multichip) must degrade instead of
    hanging. Returns 0 when enumeration hangs past ``timeout_s`` or raises —
    callers treat that as "no usable devices" and take their CPU-fallback
    path, which pins the CPU platform and never touches the tunnel. The one
    shared implementation of this workaround: tune timeouts or add failure
    modes HERE, not in the entry points.
    """
    import threading

    out: list = []

    def probe():
        try:
            out.append(len(jax.devices()))
        except Exception:
            out.append(0)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return out[0] if out else 0


def setup_compilation_cache(cache_dir: str = "/root/.cache/jax_comp", min_compile_secs: float = 1.0) -> None:
    """Enable JAX's persistent compilation cache.

    First XLA compile through this environment's TPU tunnel costs minutes;
    the persistent cache makes every subsequent process start warm. Called by
    the launcher and bench entry points.
    """
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)


def enable_nan_debugging() -> None:
    """NaN checking for every jitted computation — the framework's analogue of
    a sanitizer mode (SURVEY.md §5: the reference has none; JAX gives us one
    flag)."""
    jax.config.update("jax_debug_nans", True)


def capture_trace(fn, outdir: str, *args, iters: int = 3, **kwargs):
    """Run ``fn(*args, **kwargs)`` ``iters`` times under a ``jax.profiler``
    trace and write the artifact to ``outdir`` (view with TensorBoard or
    Perfetto). First-class profiling — the reference's only instrumentation
    is wall-clock ``time.time()`` (launcher.py:90,167). Returns fn's last
    result.

    The result is synced to HOST between iterations (this environment's TPU
    tunnel makes ``block_until_ready`` a no-op, so a plain block would record
    dispatch, not execution).
    """
    import numpy as np

    os.makedirs(outdir, exist_ok=True)
    out = None
    with jax.profiler.trace(outdir):
        for _ in range(iters):
            out = fn(*args, **kwargs)
            jax.tree.map(lambda a: np.asarray(a) if hasattr(a, "dtype") else a, out)
    return out


def time_fn(fn, *args, iters: int = 10, **kwargs) -> float:
    """Milliseconds per call, host-sync-forced (see ``capture_trace`` note).
    For device-bound microbenchmarks prefer scan-amortized in-program timing;
    this helper times whole dispatch+execute round trips."""
    import time as _time

    import numpy as np

    def run():
        out = fn(*args, **kwargs)
        return jax.tree.map(lambda a: np.asarray(a) if hasattr(a, "dtype") else a, out)

    run()  # compile
    best = float("inf")
    for _ in range(max(iters, 1)):
        t0 = _time.perf_counter()
        run()
        best = min(best, (_time.perf_counter() - t0) * 1000)
    return best
