"""Tests for scripts/cache_manifest.py — the artifact-policy manifests."""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def _write_npz(path, arr):
    with open(path, "wb") as f:
        np.savez_compressed(f, pred=arr.astype(np.float16))


def test_manifest_completeness_and_filtering(tmp_path):
    from cache_manifest import write_manifest

    cache = str(tmp_path / "cache")
    os.makedirs(cache)
    a = np.zeros((4, 4, 2), np.float32)
    # family 'x': legacy npy deploy + both folds; family 'y': npz layout
    np.save(os.path.join(cache, "deploy_x.npy"), a)
    np.save(os.path.join(cache, "fold1_x.npy"), a[..., :1])
    np.save(os.path.join(cache, "fold2_x.npy"), a[..., :1])
    _write_npz(os.path.join(cache, "deploy_y.npz"), a)
    _write_npz(os.path.join(cache, "fold1_y.npz"), a[..., :1])
    _write_npz(os.path.join(cache, "fold2_y.npz"), a[..., :1])
    # crash leftover must be ignored, not treated as family 'z.tmp'
    np.save(os.path.join(cache, "deploy_z.tmp.npy"), a)

    m = write_manifest(cache)
    assert m["families"] == ["x", "y"]
    assert m["fold_indices"] == [1, 2]
    assert m["complete"] is True
    assert "deploy_z.tmp.npy" not in m["files"]
    assert m["files"]["deploy_x.npy"]["format"] == "npy"
    assert m["files"]["deploy_y.npz"]["format"] == "npz-f16"
    assert m["files"]["deploy_y.npz"]["shape"] == [4, 4, 2]
    on_disk = json.load(open(os.path.join(cache, "manifest.json")))
    assert on_disk["complete"] is True

    # removing one fold file flips completeness
    os.remove(os.path.join(cache, "fold2_y.npz"))
    m2 = write_manifest(cache)
    assert m2["complete"] is False
