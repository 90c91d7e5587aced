"""The bench's cached-stacked capability row (bench._cached_stacked_row):
fuses the git-committed family predictions with honest LOO weights, fit-free.
Synthetic cache here — the real one (runs/stacked_cache_ep100_anneal) is
exercised implicitly whenever bench.py runs on a full checkout."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _mk_cache(tmp_path, img, names, n_even, skip=()):
    """Write deploy + fold predictions for ``names`` (linear-family values so
    the fusion is exact on a temporally linear volume)."""
    even = img[..., ::2]
    t_odd = img.shape[-1] // 2
    cache = tmp_path / "cache"
    cache.mkdir()
    for n in names:
        # deploy: predictions at the odd times (linear cross-fade)
        dep = 0.5 * (even[..., :-1] + even[..., 1:])[..., :t_odd]
        np.save(cache / f"deploy_{n}.npy", dep.astype(np.float32))
        for k in range(1, n_even - 1):
            if (n, k) in skip:
                continue
            keep = [j for j in range(n_even) if j != k]
            sub = even[..., keep]
            pred = 0.5 * (sub[..., k - 1] + sub[..., k])
            np.save(cache / f"fold{k}_{n}.npy", pred.astype(np.float32))
    return str(cache)


def test_cached_stacked_row_scores_complete_cache(tmp_path):
    rng = np.random.default_rng(0)
    base = rng.random((6, 6), dtype=np.float32)
    ramp = np.linspace(0, 1, 9, dtype=np.float32)
    img = base[..., None] * ramp        # temporally linear: fusion is exact
    cache = _mk_cache(tmp_path, img, ["a", "b"], n_even=5)
    row = bench._cached_stacked_row(img, cache=cache)
    assert row is not None
    assert row["stacked_n_families"] == 2
    assert row["odd_psnr_db_stacked"] > 40.0     # exact up to float noise
    assert row["stacked_source"] == cache


def test_cached_stacked_row_skips_incomplete_cache(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.random((6, 6, 9), dtype=np.float32)
    cache = _mk_cache(tmp_path, img, ["a", "b"], n_even=5, skip=[("b", 2)])
    assert bench._cached_stacked_row(img, cache=cache) is None
    assert bench._cached_stacked_row(img, cache=str(tmp_path / "nope")) is None
