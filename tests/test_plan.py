import pytest
"""Tests for plan.py — the capacity planner."""

import json

import jax
import numpy as np

from mri_interpolation_tpu.plan import _decoder_param_count, main, plan_run


def _leaf_count(tree):
    return sum(int(np.prod(np.shape(x))) for x in jax.tree_util.tree_leaves(tree))


def test_decoder_param_count_matches_init():
    # the analytic count must equal the real model's non-table parameters
    from mri_interpolation_tpu.models import make_hash_mlp

    for decoder in ("norm", "norm_proper", "relu_plain"):
        model = make_hash_mlp(dim_in=3, n_levels=2, n_features_per_level=2,
                              log2_hashmap_size=8, base_resolution=(4, 4, 2),
                              finest_resolution=(8, 8, 4), dim_hidden=16,
                              n_layers=3, decoder=decoder)
        params, _ = model.init(jax.random.key(0))
        got = sum(_leaf_count(v) for k, v in params.items() if k != "encoder")
        want = _decoder_param_count(4, 16, 3, 1, decoder)
        assert got == want, (decoder, got, want)


def test_flagship_fits_single_chip():
    out = plan_run(dim_in=3)  # defaults == the flagship config
    assert out["recommendations"][0]["constraint"] == "none"
    assert out["bytes"]["total"] < out["bytes"]["hbm_budget"]
    assert len(out["levels"]) == 4
    # flagship: all four levels fit their hashmap budget -> dense
    assert all(l["storage"] == "dense" for l in out["levels"])
    assert out["sharding"] is None


@pytest.mark.slow


def test_big_dense_table_recommends_sharding():
    # force-dense 4D F8 at full anatomical resolution: the motivating
    # >400 MB table (VERDICT r2 Missing #2); with adam that's >1.2 GB of
    # param+opt state — over a deliberately small budget
    out = plan_run(dim_in=4, n_levels=1, n_features_per_level=8,
                   log2_hashmap_size=24, base_resolution=(352, 352, 6, 15),
                   finest_resolution=(352, 352, 6, 15), storage="dense",
                   batch_size=50000, n_devices=8, hbm_bytes=1.5e9)
    table = out["bytes"]["table"]
    assert table > 400e6
    paths = " ".join(r["path"] for r in out["recommendations"])
    assert "--shard_tables" in paths
    sh = out["sharding"]
    assert sum(sh["per_device_table_bytes"]) == table
    assert sh["max_device_table_bytes"] < table / 4  # split, not replicated


def test_dataset_residency_recommends_streaming():
    out = plan_run(dim_in=4, base_resolution=(64, 64, 8, 2),
                   finest_resolution=(352, 352, 120, 60),
                   volume_shape=(352, 352, 120, 60),
                   batch_size=10000, hbm_bytes=2e9)
    paths = " ".join(r["path"] for r in out["recommendations"])
    assert "--stream_shard_voxels" in paths
    assert out["bytes"]["dataset"] == 352 * 352 * 120 * 60 * 5 * 4


def test_remat_reduces_activations():
    a = plan_run(dim_in=3, batch_size=100000, remat=False)
    b = plan_run(dim_in=3, batch_size=100000, remat=True)
    assert b["bytes"]["activations_per_step"] < a["bytes"]["activations_per_step"]


def test_cli_prints_json(capsys):
    main(["--n_levels", "2", "--base_resolution", "8,8,4",
          "--finest_resolution", "16,16,8", "--volume_shape", "16,16,8"])
    out = json.loads(capsys.readouterr().out)
    assert out["bytes"]["table"] > 0
    assert out["recommendations"]

def test_peek_shape_matches_load(tmp_path):
    from mri_interpolation_tpu.io import nifti, synthetic_volume

    vol = synthetic_volume((9, 7, 5, 3), seed=2)
    for name in ("v.nii", "v.nii.gz"):
        p = str(tmp_path / name)
        nifti.save(vol, p)
        assert nifti.peek_shape(p) == (9, 7, 5, 3)


def test_launcher_plan_flag(tmp_path, capsys):
    from mri_interpolation_tpu.io import nifti, synthetic_volume
    from mri_interpolation_tpu.launcher import main

    p = str(tmp_path / "vol.nii.gz")
    nifti.save(synthetic_volume((16, 16, 4, 5), seed=1), p)
    main(["--image_path", p, "--model_class", "hash_mlp", "--plan",
          "--plan_devices", "4"])
    out = json.loads(capsys.readouterr().out)
    # rank-adapted: 4 axes in every level resolution
    assert all(len(l["resolution"]) == 4 for l in out["levels"])
    assert out["bytes"]["dataset"] == 16 * 16 * 4 * 5 * 5 * 4
    assert out["sharding"]["n_devices"] == 4
    assert out["recommendations"]


def test_launcher_plan_respects_slice_and_protocol_flags(tmp_path, capsys):
    """--plan must size the run the SAME flags execute: slice_z drops the z
    axis, even_frames_only halves the t axis, undersample_pct scales the
    dataset rows (the planner previously sized the on-disk header shape)."""
    from mri_interpolation_tpu.io import nifti, synthetic_volume
    from mri_interpolation_tpu.launcher import main

    p = str(tmp_path / "vol.nii.gz")
    nifti.save(synthetic_volume((16, 16, 4, 6), seed=1), p)
    main(["--image_path", p, "--model_class", "hash_mlp", "--plan",
          "--slice_z", "2", "--even_frames_only", "true"])
    out = json.loads(capsys.readouterr().out)
    # (16,16,6) slice, even frames -> (16,16,3); dim_in 3, coords+value = 4 f32
    assert all(len(l["resolution"]) == 3 for l in out["levels"])
    assert out["bytes"]["dataset"] == 16 * 16 * 3 * 4 * 4

    main(["--image_path", p, "--model_class", "hash_mlp", "--plan",
          "--slice_z", "2", "--undersample_pct", "50"])
    out = json.loads(capsys.readouterr().out)
    assert out["bytes"]["dataset"] == int(16 * 16 * 6 * 0.5) * 4 * 4


# ---------------------------------------------------------------------------
# step_roofline scatter pricing (round-5 reconciliation: the backward scatter
# is priced at its MEASURED cost, not the gather cost)

_SCATTER = {"narrow_ns": 12.0, "wide_below_ns": 17.8, "wide_above_ns": 81.0,
            "cliff_rows": 1 << 18, "flat_crossover_ids": 1 << 18}


def _roofline(**kw):
    from mri_interpolation_tpu.plan import step_roofline

    base = dict(dim_in=3, n_levels=3, n_features_per_level=2,
                log2_hashmap_size=23, base_resolution=(64, 64, 5),
                finest_resolution=(352, 352, 15), growth="paper",
                dim_hidden=64, n_layers=2, decoder="relu_plain",
                measured_gather_ns=9.1, measured_scatter=_SCATTER)
    base.update(kw)
    return base, step_roofline(**base)


def test_scatter_pricing_layouts_follow_the_implementation():
    # F=1 -> narrow everywhere
    _, rl = _roofline(n_features_per_level=1, batch_size=10_000)
    assert rl["scatter_pricing"]["layout"] == "narrow"
    # F=2, big fused table, few ids -> wide (the flat expansion loses there)
    _, rl = _roofline(batch_size=10_000)
    assert rl["scatter_pricing"]["layout"] == "wide"
    # F=2, big fused table, many ids -> flat
    _, rl = _roofline(batch_size=160_000)
    assert rl["scatter_pricing"]["layout"] == "flat"
    # F=8 -> wide (flat measured slower at F=8)
    _, rl = _roofline(n_features_per_level=8, batch_size=160_000)
    assert rl["scatter_pricing"]["layout"] == "wide"


def test_wide_cliff_prices_higher_than_flat():
    # identical config/batch: the wide-above-cliff price must exceed the
    # flat narrow-element price (that gap is the measured 1.30x lever)
    _, rl_flat = _roofline(batch_size=160_000)
    kw, _ = _roofline(batch_size=160_000)
    kw["measured_scatter"] = dict(_SCATTER, flat_crossover_ids=1 << 60)
    from mri_interpolation_tpu.plan import step_roofline

    rl_wide = step_roofline(**kw)
    assert rl_wide["scatter_pricing"]["layout"] == "wide"
    assert (rl_wide["scatter_pricing"]["packed_scatter_s"]
            > rl_flat["scatter_pricing"]["packed_scatter_s"])
    assert (rl_wide["floor_s"]["transaction"]
            > rl_flat["floor_s"]["transaction"])


def test_transaction_floor_without_scatter_dict_is_legacy():
    kw, rl = _roofline(batch_size=10_000)
    kw["measured_scatter"] = None
    from mri_interpolation_tpu.plan import step_roofline

    legacy = step_roofline(**kw)
    assert "scatter_pricing" not in legacy
    assert "transaction" in legacy["floor_s"]
    # the reconciled floor differs from the legacy gather-priced one
    assert rl["floor_s"]["transaction"] != legacy["floor_s"]["transaction"]


def test_scatter_floor_scales_with_batch():
    _, a = _roofline(batch_size=160_000)
    _, b = _roofline(batch_size=640_000)
    assert (b["scatter_pricing"]["packed_scatter_s"]
            == pytest.approx(4 * a["scatter_pricing"]["packed_scatter_s"]))
    assert b["floor_s"]["transaction"] > a["floor_s"]["transaction"]
