"""Trainer tests: convergence, determinism, schedules, freezing, checkpoints."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mri_interpolation_tpu.io import dataset_from_array, synthetic_volume
from mri_interpolation_tpu.metrics import psnr
from mri_interpolation_tpu.models import (
    make_hash_mlp,
    make_multi_siren,
    make_psf_siren,
    make_siren,
)
from mri_interpolation_tpu.train import (
    TrainConfig,
    Trainer,
    make_optimizer,
    restore_checkpoint,
    save_checkpoint,
)


@pytest.fixture(scope="module")
def small_dataset():
    vol = synthetic_volume((12, 12, 12), seed=7)
    ds = dataset_from_array(vol, zero_centered=True)
    return ds


class TestFit:
    def test_siren_converges(self, small_dataset):
        model = make_siren(dim_in=3, dim_hidden=32, n_layers=3, lr=1e-4)
        cfg = TrainConfig(batch_size=512, epochs=40, lr=1e-3, seed=0)
        result = Trainer(cfg).fit(model, small_dataset.coords, small_dataset.values)
        assert result.losses[-1] < result.losses[0] * 0.3
        assert result.steps == 40 * (len(small_dataset) // 512)

    def test_deterministic_given_seed(self, small_dataset):
        model = make_siren(dim_in=3, dim_hidden=16, n_layers=2)
        cfg = TrainConfig(batch_size=512, epochs=2, lr=1e-3, seed=42)
        r1 = Trainer(cfg).fit(model, small_dataset.coords, small_dataset.values)
        r2 = Trainer(cfg).fit(model, small_dataset.coords, small_dataset.values)
        np.testing.assert_array_equal(r1.losses, r2.losses)

    def test_hash_mlp_with_state(self, small_dataset):
        model = make_hash_mlp(dim_in=3, n_levels=2, base_resolution=4, finest_resolution=12,
                              log2_hashmap_size=10, dim_hidden=16, n_layers=2)
        cfg = TrainConfig(batch_size=512, epochs=3, lr=5e-3)
        result = Trainer(cfg).fit(model, small_dataset.coords, small_dataset.values)
        # BatchNorm running stats must have moved
        assert np.abs(np.asarray(result.state["bn"][0]["mean"])).sum() > 0

    def test_psf_model_custom_loss(self, small_dataset):
        model = make_psf_siren(dim_in=3, dim_hidden=16, n_layers=2,
                               coordinates_spacing=(0.02, 0.02, 0.02), n_sample=3)
        cfg = TrainConfig(batch_size=256, epochs=2, lr=1e-4)
        result = Trainer(cfg).fit(model, small_dataset.coords, small_dataset.values)
        assert np.isfinite(result.losses).all()

    def test_batch_clamped_to_dataset(self):
        # batch_size > N clamps to full-batch training rather than erroring.
        model = make_siren(dim_in=2, dim_hidden=8, n_layers=2)
        cfg = TrainConfig(batch_size=10, epochs=2)
        r = Trainer(cfg).fit(model, np.zeros((5, 2), np.float32), np.zeros((5, 1), np.float32))
        assert r.steps == 2  # one full-batch step per epoch

    def test_relative_l2_loss(self, small_dataset):
        model = make_siren(dim_in=3, dim_hidden=16, n_layers=2)
        cfg = TrainConfig(batch_size=512, epochs=1, loss="relative_l2")
        result = Trainer(cfg).fit(model, small_dataset.coords, small_dataset.values)
        assert np.isfinite(result.losses).all()

    def test_grad_accumulation(self, small_dataset):
        model = make_siren(dim_in=3, dim_hidden=16, n_layers=2)
        cfg = TrainConfig(batch_size=256, epochs=2, accumulate_grad_batches=2)
        result = Trainer(cfg).fit(model, small_dataset.coords, small_dataset.values)
        assert np.isfinite(result.losses).all()


class TestOptimizer:
    def test_unknown_optimizer_raises(self):
        with pytest.raises(KeyError):
            make_optimizer(TrainConfig(optimizer="sgd"))

    def test_cosine_schedule_builds(self):
        tx = make_optimizer(TrainConfig(lr_schedule="cosine"), n_steps_per_epoch=10)
        params = {"w": jnp.ones(3)}
        state = tx.init(params)
        u, _ = tx.update({"w": jnp.ones(3)}, state, params)
        assert np.isfinite(np.asarray(u["w"])).all()

    def test_weight_decay_changes_updates(self):
        params = {"w": jnp.full((3,), 10.0)}
        g = {"w": jnp.zeros(3)}
        tx_wd = make_optimizer(TrainConfig(weight_decay=0.1))
        u, _ = tx_wd.update(g, tx_wd.init(params), params)
        # zero grad + wd -> nonzero update pulling toward 0
        assert np.abs(np.asarray(u["w"])).max() > 0


class TestFreeze:
    def test_frozen_leaves_unchanged(self, small_dataset):
        model = make_hash_mlp(dim_in=3, n_levels=2, base_resolution=4, finest_resolution=12,
                              log2_hashmap_size=10, dim_hidden=16, n_layers=2)

        def freeze_decoder(params):
            # True = trainable. Freeze every decoder layer (the two-phase
            # protocol: freeze decoder, keep training the hash tables).
            return jax.tree.map(lambda _: True, params) | {
                "layers": jax.tree.map(lambda _: False, params["layers"])
            }

        cfg = TrainConfig(batch_size=512, epochs=2, lr=5e-3)
        trainer = Trainer(cfg, freeze_mask_fn=freeze_decoder)
        key = jax.random.key(0)
        params0, state0 = model.init(key)
        result = trainer.fit(model, small_dataset.coords, small_dataset.values,
                             params=jax.tree.map(jnp.copy, params0), state=state0, donate=False)
        for a, b in zip(jax.tree.leaves(params0["layers"]), jax.tree.leaves(result.params["layers"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # encoder must still have trained
        assert np.abs(np.asarray(result.params["encoder"]["table"]) - np.asarray(params0["encoder"]["table"])).max() > 0


class TestFitFrames:
    def test_multi_siren_frames(self):
        frames = synthetic_volume((8, 8, 4), seed=3)  # (x, y, t=4)
        coords = dataset_from_array(frames[..., 0]).coords  # shared (x,y) grid
        values = np.stack([frames[..., t].reshape(-1, 1) for t in range(4)])
        model = make_multi_siren(dim_in=2, dim_hidden=16, n_layers=2, n_frames=4)
        cfg = TrainConfig(epochs=3, lr=1e-4, weight_decay=1e-5)
        result = Trainer(cfg).fit_frames(model, coords, values)
        assert result.losses.shape == (12,)
        assert np.isfinite(result.losses).all()


class TestCheckpoint:
    def test_roundtrip(self, tmp_path, small_dataset):
        model = make_siren(dim_in=3, dim_hidden=16, n_layers=2)
        cfg = TrainConfig(batch_size=512, epochs=1)
        result = Trainer(cfg).fit(model, small_dataset.coords, small_dataset.values)
        path = save_checkpoint(str(tmp_path / "ckpt"), step=result.steps, params=result.params)
        restored = restore_checkpoint(str(tmp_path / "ckpt"))
        for a, b in zip(jax.tree.leaves(result.params), jax.tree.leaves(restored["params"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_resume_continues_training(self, tmp_path, small_dataset):
        model = make_siren(dim_in=3, dim_hidden=16, n_layers=2)
        cfg = TrainConfig(batch_size=512, epochs=2, lr=1e-3)
        r1 = Trainer(cfg).fit(model, small_dataset.coords, small_dataset.values)
        save_checkpoint(str(tmp_path / "c"), step=r1.steps, params=r1.params)
        restored = restore_checkpoint(str(tmp_path / "c"))
        r2 = Trainer(cfg).fit(model, small_dataset.coords, small_dataset.values,
                              params=restored["params"], state={})
        assert r2.losses.mean() <= r1.losses.mean()

    def test_missing_dir_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            restore_checkpoint(str(tmp_path / "nope"))


class TestDropLastAndLogging:
    def test_drop_last_false_covers_all_samples(self, small_dataset):
        n = len(small_dataset)
        batch = 500  # n=1728 -> 3 full batches + 228 tail
        model = make_siren(dim_in=3, dim_hidden=8, n_layers=2)
        cfg = TrainConfig(batch_size=batch, epochs=2, lr=1e-3, seed=0, drop_last=False)
        result = Trainer(cfg).fit(model, small_dataset.coords, small_dataset.values)
        assert result.steps == 2 * (-(-n // batch))
        cfg_drop = TrainConfig(batch_size=batch, epochs=2, lr=1e-3, seed=0, drop_last=True)
        result_drop = Trainer(cfg_drop).fit(model, small_dataset.coords, small_dataset.values)
        assert result_drop.steps == 2 * (n // batch)

    def test_scalar_stream_jsonl(self, tmp_path, small_dataset):
        from mri_interpolation_tpu.train import read_scalars

        log = str(tmp_path / "scalars.jsonl")
        model = make_siren(dim_in=3, dim_hidden=8, n_layers=2)
        cfg = TrainConfig(batch_size=512, epochs=3, lr=1e-3, seed=0, log_jsonl=log)
        result = Trainer(cfg).fit(model, small_dataset.coords, small_dataset.values)
        recs = read_scalars(log, tag="train_loss")
        assert len(recs) == result.steps
        assert [r["step"] for r in recs] == list(range(result.steps))
        np.testing.assert_allclose([r["value"] for r in recs], result.losses, rtol=1e-6)

    def test_per_epoch_checkpoints(self, tmp_path, small_dataset):
        from mri_interpolation_tpu.train import latest_step

        ckdir = str(tmp_path / "ck")
        model = make_siren(dim_in=3, dim_hidden=8, n_layers=2)
        cfg = TrainConfig(batch_size=512, epochs=4, lr=1e-3, seed=0,
                          checkpoint_dir=ckdir, checkpoint_every_epochs=2)
        result = Trainer(cfg).fit(model, small_dataset.coords, small_dataset.values)
        steps_per_epoch = result.steps // 4
        import os
        saved = sorted((d for d in os.listdir(ckdir) if d.startswith("step_")),
                       key=lambda s: int(s.split("_")[1]))
        assert saved == [f"step_{2 * steps_per_epoch}", f"step_{4 * steps_per_epoch}"]
        restored = restore_checkpoint(ckdir)  # latest
        assert latest_step(ckdir) == 4 * steps_per_epoch
        flat_r = jax.tree.leaves(restored["params"])
        flat_p = jax.tree.leaves(jax.device_get(result.params))
        for a, b in zip(flat_r, flat_p):
            np.testing.assert_allclose(a, b)


class TestTemporalTV:
    def test_tv_reduces_time_roughness(self):
        from mri_interpolation_tpu.encodings.hashgrid import temporal_table_tv

        ds = dataset_from_array(synthetic_volume((10, 10, 8), seed=2))
        kw = dict(dim_in=3, n_levels=2, n_features_per_level=2, log2_hashmap_size=12,
                  base_resolution=(4, 4, 4), finest_resolution=(10, 10, 8),
                  dim_hidden=16, n_layers=2, decoder="relu_plain")
        m_plain = make_hash_mlp(**kw)
        m_tv = make_hash_mlp(temporal_tv=1.0, **kw)
        cfg = TrainConfig(batch_size=400, epochs=15, lr=5e-3, seed=0)
        r_plain = Trainer(cfg).fit(m_plain, ds.coords, ds.values)
        r_tv = Trainer(cfg).fit(m_tv, ds.coords, ds.values)
        enc = m_plain.hparams["encoder"]
        tv_plain = float(temporal_table_tv(enc, r_plain.params["encoder"]["table"]))
        tv_reg = float(temporal_table_tv(enc, r_tv.params["encoder"]["table"]))
        assert tv_reg < tv_plain
        assert np.isfinite(r_tv.losses).all()


class TestEvalScalars:
    def test_eval_fn_streams_psnr(self, tmp_path, small_dataset):
        """Per-epoch eval metrics land in scalars.jsonl next to train_loss
        (VERDICT r2 Next #9)."""
        from mri_interpolation_tpu.train import read_scalars

        log = str(tmp_path / "scalars.jsonl")
        model = make_siren(dim_in=3, dim_hidden=8, n_layers=2)
        cfg = TrainConfig(batch_size=512, epochs=3, lr=1e-3, seed=0,
                          log_jsonl=log, eval_every_epochs=2)
        calls = []

        def eval_fn(params, state):
            calls.append(1)
            return {"psnr": 30.0 + len(calls)}

        Trainer(cfg).fit(model, small_dataset.coords, small_dataset.values, eval_fn=eval_fn)
        recs = read_scalars(log, tag="psnr")
        assert len(recs) == 1 == len(calls)  # epochs=3, every 2 -> after epoch 2
        assert recs[0]["value"] == 31.0


class TestRemat:
    def test_loss_curve_identical(self, small_dataset):
        """jax.checkpoint trades memory for recompute without changing values:
        the remat'd fit reproduces the plain fit's loss curve."""
        def fit(remat):
            model = make_siren(dim_in=3, dim_hidden=8, n_layers=2)
            cfg = TrainConfig(batch_size=512, epochs=2, lr=1e-3, seed=0, remat=remat)
            return Trainer(cfg).fit(model, small_dataset.coords, small_dataset.values)

        plain, remat = fit(False), fit(True)
        np.testing.assert_allclose(remat.losses, plain.losses, rtol=1e-6, atol=0)

    def test_remat_with_state_and_custom_loss(self, small_dataset):
        """Both loss paths under remat: BatchNorm state threading (hash norm
        decoder) and a model-supplied loss_fn (psf_siren)."""
        from mri_interpolation_tpu.models import make_hash_mlp, make_psf_siren

        hm = make_hash_mlp(dim_in=3, n_levels=2, n_features_per_level=1,
                           log2_hashmap_size=8, base_resolution=4,
                           finest_resolution=8, dim_hidden=8, n_layers=2)
        cfg = TrainConfig(batch_size=256, epochs=1, lr=1e-3, seed=0, remat=True)
        r = Trainer(cfg).fit(hm, small_dataset.coords, small_dataset.values)
        assert np.isfinite(r.losses).all()

        ps = make_psf_siren(dim_in=3, dim_hidden=8, n_layers=2, n_sample=3,
                            coordinates_spacing=(0.05, 0.05, 0.05))
        r2 = Trainer(cfg).fit(ps, small_dataset.coords, small_dataset.values)
        assert np.isfinite(r2.losses).all()


class TestStreamingFit:
    def test_host_coord_synthesis_matches_grid(self):
        from mri_interpolation_tpu.infer import flat_index_to_coords

        shape = (7, 5, 9)
        idx = np.random.default_rng(0).integers(0, np.prod(shape), 64)
        strides = np.concatenate([np.cumprod(shape[::-1])[::-1][1:], [1]]).astype(np.int64)
        coords = np.empty((idx.size, 3), np.float32)
        for k in range(3):
            coords[:, k] = ((idx // strides[k]) % shape[k]) / (shape[k] - 1)
        want = np.asarray(flat_index_to_coords(jnp.asarray(idx), shape))
        np.testing.assert_allclose(coords, want, atol=1e-7)

    def test_streaming_converges_like_fit(self, small_dataset):
        """Multi-shard streaming covers every voxel per epoch and reaches the
        same loss regime as the device-resident fit."""
        from mri_interpolation_tpu.io import synthetic_volume

        vol = synthetic_volume((12, 12, 8), seed=0)
        cfg = TrainConfig(batch_size=192, epochs=8, lr=2e-3, seed=0)

        def make():
            return make_siren(dim_in=3, dim_hidden=16, n_layers=2)

        r_stream = Trainer(cfg).fit_streaming(make(), vol, shard_voxels=400)
        n = vol.size
        assert r_stream.steps == cfg.epochs * ((n // (384)) + (1 if n % 384 else 0)) * 2
        from mri_interpolation_tpu.io import dataset_from_array

        ds = dataset_from_array(vol)
        r_fit = Trainer(cfg).fit(make(), ds.coords, ds.values)
        # same regime: within 2x of the resident fit's final loss and decreasing
        assert r_stream.losses[-1] < 2.0 * max(r_fit.losses[-1], 1e-5)
        assert r_stream.losses[-1] < 0.5 * r_stream.losses[0]

    def test_streaming_from_memmap(self, tmp_path):
        from mri_interpolation_tpu.io import synthetic_volume

        vol = synthetic_volume((10, 10, 6), seed=1)
        path = str(tmp_path / "vol.dat")
        mm = np.memmap(path, dtype=np.float32, mode="w+", shape=vol.shape)
        mm[:] = vol
        mm.flush()
        ro = np.memmap(path, dtype=np.float32, mode="r", shape=vol.shape)
        cfg = TrainConfig(batch_size=150, epochs=2, lr=1e-3, seed=0)
        r = Trainer(cfg).fit_streaming(make_siren(dim_in=3, dim_hidden=8, n_layers=2),
                                       ro, shard_voxels=300)
        assert np.isfinite(r.losses).all() and r.losses[-1] < r.losses[0]


class TestSteadyRateReconciliation:
    """steady_steps_per_sec must survive broken tunnel clocks (round 4):
    when every epoch times near-zero (block_until_ready returning early),
    the derived rate is reconciled against the total wall instead of
    reporting a physically impossible number."""

    def _result(self, epoch_times, wall, steps, hook_s=0.0):
        from mri_interpolation_tpu.train.trainer import TrainResult

        return TrainResult(params=None, state=None, opt_state=None,
                           losses=np.zeros(steps), wall_time_s=wall,
                           steps_per_sec=steps / wall, steps=steps,
                           epoch_times_s=np.asarray(epoch_times),
                           hook_time_s=hook_s)

    def test_healthy_epochs_use_median(self):
        # 10 epochs x 10 steps; first epoch bears 5s compile, rest 0.1s
        r = self._result([5.0] + [0.1] * 9, wall=5.9, steps=100)
        assert r.steady_steps_per_sec == pytest.approx(100.0, rel=0.01)

    def test_broken_clock_falls_back_to_wall(self):
        # every epoch timed ~0 while the wall absorbed the real 10s:
        # the naive median rate would be ~10^7 steps/s; the reconciled
        # rate must stay within 2x of the honest wall rate
        r = self._result([1e-4] * 10, wall=10.0, steps=100)
        assert r.steady_steps_per_sec <= 2.0 * (100 / 10.0)

    def test_single_epoch_uses_total_rate(self):
        r = self._result([2.0], wall=2.0, steps=20)
        assert r.steady_steps_per_sec == pytest.approx(10.0)

    def test_expensive_hooks_do_not_trip_the_clamp(self):
        # healthy 0.1s epochs but 9s of per-epoch eval/checkpoint hook work
        # inside the wall: the floor-rate guard must subtract hook seconds,
        # not silently replace the true steady rate with a hook-inclusive
        # number (advisor round 4)
        r = self._result([5.0] + [0.1] * 9, wall=5.9 + 9.0, steps=100,
                         hook_s=9.0)
        assert r.steady_steps_per_sec == pytest.approx(100.0, rel=0.01)

    def test_hooks_plus_broken_clock_still_reconciles(self):
        # broken clocks AND hook time: the fallback rate uses the
        # hook-excluded wall
        r = self._result([1e-4] * 10, wall=14.0, steps=100, hook_s=4.0)
        assert r.steady_steps_per_sec <= 2.0 * (100 / 10.0)
