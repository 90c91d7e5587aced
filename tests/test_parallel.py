"""Parallel-layer tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mri_interpolation_tpu.io import dataset_from_array, synthetic_volume
from mri_interpolation_tpu.models import make_hash_mlp, make_siren
from mri_interpolation_tpu.parallel import (
    DataParallelTrainer,
    evaluate_grid_sharded,
    fit_multi_volume,
    make_mesh,
)
from mri_interpolation_tpu.train import TrainConfig, Trainer

pytestmark = pytest.mark.slow  # full-pipeline/protocol layer (run with -m slow; excluded from the fast unit run)


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


@pytest.fixture(scope="module")
def ds():
    return dataset_from_array(synthetic_volume((12, 12, 12), seed=5), zero_centered=True)


class TestMesh:
    def test_make_mesh(self, mesh8):
        assert mesh8.devices.size == 8
        assert mesh8.axis_names == ("data",)

    def test_too_many_devices_raises(self):
        with pytest.raises(ValueError, match="devices"):
            make_mesh(1000)


class TestDataParallelFit:
    def test_converges(self, mesh8, ds):
        model = make_siren(dim_in=3, dim_hidden=32, n_layers=3)
        cfg = TrainConfig(batch_size=512, epochs=25, lr=1e-3, seed=0)
        res = DataParallelTrainer(cfg, mesh=mesh8).fit(model, ds.coords, ds.values)
        assert res.losses[-1] < res.losses[0] * 0.5

    def test_matches_single_device_semantics(self, mesh8, ds):
        # Same seed, same steps: DP loss curve should track single-device
        # closely (identical batches; only reduction order differs).
        model = make_siren(dim_in=3, dim_hidden=16, n_layers=2)
        cfg = TrainConfig(batch_size=512, epochs=2, lr=1e-3, seed=3)
        r_single = Trainer(cfg).fit(model, ds.coords, ds.values)
        r_dp = DataParallelTrainer(cfg, mesh=mesh8).fit(model, ds.coords, ds.values)
        assert r_single.losses.shape == r_dp.losses.shape
        np.testing.assert_allclose(r_single.losses, r_dp.losses, rtol=2e-2, atol=1e-4)

    def test_batchnorm_state_pmeaned(self, mesh8, ds):
        model = make_hash_mlp(dim_in=3, n_levels=2, base_resolution=4, finest_resolution=12,
                              log2_hashmap_size=10, dim_hidden=16, n_layers=2)
        cfg = TrainConfig(batch_size=512, epochs=2, lr=5e-3)
        res = DataParallelTrainer(cfg, mesh=mesh8).fit(model, ds.coords, ds.values)
        assert np.isfinite(np.asarray(res.state["bn"][0]["mean"])).all()

    def test_batch_smaller_than_mesh_raises(self, mesh8):
        model = make_siren(dim_in=2, dim_hidden=8, n_layers=2)
        cfg = TrainConfig(batch_size=4, epochs=1)
        with pytest.raises(ValueError):
            DataParallelTrainer(cfg, mesh=mesh8).fit(
                model, np.zeros((3, 2), np.float32), np.zeros((3, 1), np.float32)
            )


class TestMultiVolume:
    def test_fits_independent_volumes(self, mesh8):
        vols = np.stack([synthetic_volume((8, 8, 8), seed=s) for s in range(8)])
        base = dataset_from_array(vols[0], zero_centered=True)
        values = np.stack([
            dataset_from_array(v, zero_centered=True).values for v in vols
        ])
        model = make_siren(dim_in=3, dim_hidden=16, n_layers=2)
        cfg = TrainConfig(batch_size=512, epochs=30, lr=1e-3)
        res = fit_multi_volume(model, base.coords, values, cfg, mesh=mesh8)
        # stacked params: leading axis = 8 volumes
        assert jax.tree.leaves(res.params)[0].shape[0] == 8
        assert res.losses.shape[0] == 8
        # every volume's loss decreased (first-3 mean vs last-3 mean)
        assert (res.losses[:, -3:].mean(axis=1) < res.losses[:, :3].mean(axis=1)).all()

    def test_indivisible_volumes_raises(self, mesh8):
        model = make_siren(dim_in=3, dim_hidden=8, n_layers=2)
        with pytest.raises(ValueError, match="divisible"):
            fit_multi_volume(model, np.zeros((10, 3), np.float32),
                             np.zeros((3, 10, 1), np.float32), TrainConfig(batch_size=4), mesh=mesh8)


class TestShardedInference:
    def test_matches_unsharded(self, mesh8):
        from mri_interpolation_tpu.infer import evaluate_grid

        model = make_siren(dim_in=3, dim_hidden=16, n_layers=2)
        params, state = model.init(jax.random.key(0))
        shape = (10, 11, 12)
        ref = evaluate_grid(model, params, state, shape, chunk_size=256)
        shd = evaluate_grid_sharded(model, params, state, shape, mesh=mesh8, chunk_size=64)
        np.testing.assert_allclose(shd, ref, atol=1e-5)

    def test_odd_shape_padding(self, mesh8):
        model = make_siren(dim_in=2, dim_hidden=8, n_layers=2)
        params, state = model.init(jax.random.key(1))
        out = evaluate_grid_sharded(model, params, state, (7, 9), mesh=mesh8, chunk_size=8)
        assert out.shape == (7, 9)
        assert np.isfinite(out).all()


class TestDataParallelStreaming:
    def test_streaming_converges_on_mesh(self, mesh8):
        vol = synthetic_volume((12, 12, 8), seed=0)
        model = make_siren(dim_in=3, dim_hidden=16, n_layers=2)
        cfg = TrainConfig(batch_size=192, epochs=8, lr=2e-3, seed=0)
        r = DataParallelTrainer(cfg, mesh=mesh8).fit_streaming(
            model, vol, shard_voxels=400)
        # shard=384 (2 steps x 8 dev x 24 local), n=1152 -> 3 shards/epoch
        assert r.steps == 8 * 3 * 2
        assert np.isfinite(r.losses).all()
        assert r.losses[-1] < 0.5 * r.losses[0]

    def test_streaming_matches_single_device_streaming(self, mesh8):
        """Same host permutation (same np seed) + same per-step RNG => the
        DP-streamed loss curve tracks Trainer.fit_streaming closely (the
        global batch is the same rows; only the reduction layout differs)."""
        vol = synthetic_volume((10, 10, 6), seed=1)
        cfg = TrainConfig(batch_size=200, epochs=3, lr=1e-3, seed=4)

        def make():
            return make_siren(dim_in=3, dim_hidden=16, n_layers=2)

        r1 = Trainer(cfg).fit_streaming(make(), vol, shard_voxels=400)
        r8 = DataParallelTrainer(cfg, mesh=mesh8).fit_streaming(
            make(), vol, shard_voxels=400)
        assert r1.losses.shape == r8.losses.shape
        np.testing.assert_allclose(r1.losses, r8.losses, rtol=2e-2, atol=1e-4)


class TestDataParallelHooks:
    def test_eval_fn_streams_psnr(self, mesh8, ds, tmp_path):
        """--eval_every_epochs parity on the data-parallel path (it was a
        silent no-op before the shared EpochHooks): psnr records land in
        scalars.jsonl exactly as under the single-device Trainer."""
        from mri_interpolation_tpu.train import read_scalars

        log = str(tmp_path / "scalars.jsonl")
        cfg = TrainConfig(batch_size=512, epochs=3, lr=1e-3, seed=0,
                          log_jsonl=log, eval_every_epochs=2)
        model = make_siren(dim_in=3, dim_hidden=8, n_layers=2)
        calls = []

        def eval_fn(params, state):
            # replicated params must drive plain apply directly
            y, _ = model.apply(params, state, jnp.asarray(ds.coords[:64]),
                               train=False, rng=None)
            calls.append(1)
            return {"psnr": float(np.mean(np.asarray(y)))}

        DataParallelTrainer(cfg, mesh=mesh8).fit(model, ds.coords, ds.values,
                                                 eval_fn=eval_fn)
        recs = read_scalars(log, tag="psnr")
        assert len(recs) == 1 == len(calls)
        assert np.isfinite(recs[0]["value"])
