"""Hash-table tensor-sharding over the virtual 8-device mesh.

The load-bearing test is ``test_sharded_encode_bitparity``: the distributed
encode (device-local masked gathers + one all_gather + scatter-matmul) must
reproduce the single-table ``HashGridEncoding.apply`` oracle to float
round-off, for hashed, mixed dense/hashed, AND split-big-dense layouts.
"""

import jax
import numpy as np
import pytest

from mri_interpolation_tpu.encodings import HashGridEncoding
from mri_interpolation_tpu.io import dataset_from_array, synthetic_volume
from mri_interpolation_tpu.models import make_hash_mlp
from mri_interpolation_tpu.parallel import make_mesh
from mri_interpolation_tpu.parallel.sharded_table import (
    ShardedHashTrainer,
    plan_table_sharding,
    shard_table,
    sharded_encode_apply,
    unshard_table,
)
from mri_interpolation_tpu.train import TrainConfig, Trainer

pytestmark = pytest.mark.slow  # parallel/protocol layer (run with -m slow; excluded from the fast unit run)


def _enc_hashed(n_levels=8, log2=8, f=2):
    return HashGridEncoding(
        dim=3, n_levels=n_levels, n_features_per_level=f, log2_hashmap_size=log2,
        base_resolution=(4, 4, 2), finest_resolution=(24, 24, 12), storage="hashed",
    )


def _enc_mixed():
    # auto storage: coarse levels dense, fine levels hashed
    return HashGridEncoding(
        dim=3, n_levels=6, n_features_per_level=2, log2_hashmap_size=9,
        base_resolution=(4, 4, 2), finest_resolution=(40, 40, 12), storage="auto",
    )


def _enc_big_dense():
    # finest dense level (33*33*13 = 14157 vertices) dwarfs the per-device
    # fair share -> exercises the contiguous row-range split path
    return HashGridEncoding(
        dim=3, n_levels=4, n_features_per_level=2, log2_hashmap_size=16,
        base_resolution=(4, 4, 2), finest_resolution=(32, 32, 12), storage="auto",
    )


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(8)


class TestPlan:
    @pytest.mark.parametrize("make", [_enc_hashed, _enc_mixed, _enc_big_dense])
    def test_shard_roundtrip_covers_every_row_once(self, make):
        enc = make()
        plan = plan_table_sharding(enc, 8)
        assert sum(ln for s in plan.slots for (_, _, ln) in s) == enc.total_size
        table = np.asarray(enc.init(jax.random.key(0))["table"])
        shards = shard_table(table, enc, plan)
        assert shards.shape[0] == 8
        np.testing.assert_array_equal(unshard_table(shards, enc, plan), table)

    def test_big_dense_level_is_split_across_devices(self):
        enc = _enc_big_dense()
        plan = plan_table_sharding(enc, 8)
        holders = {l: [] for l in range(enc.n_levels)}
        for dev, s in enumerate(plan.slots):
            for (l, _, ln) in s:
                if ln > 0:
                    holders[l].append(dev)
        split_dense = [l for l in range(enc.n_levels)
                       if enc.level_dense[l] and len(holders[l]) > 1]
        assert split_dense, "a big dense level must be row-split over the mesh"
        # dense split boundaries aligned to whole time-lines (Vt | start)
        for s in plan.slots:
            for (l, start, ln) in s:
                if l in split_dense:
                    vt = int(enc.level_resolutions[l][-1]) + 1
                    assert start % vt == 0

    def test_balanced_loads(self):
        enc = _enc_big_dense()
        plan = plan_table_sharding(enc, 8)
        loads = [sum(ln for (_, _, ln) in s) for s in plan.slots]
        assert max(loads) <= 1.5 * (enc.total_size / 8) + 64


class TestShardedEncode:
    @pytest.mark.parametrize("make", [_enc_hashed, _enc_mixed, _enc_big_dense])
    def test_sharded_encode_bitparity(self, make, mesh8):
        """Distributed encode == single-table oracle (float round-off only)."""
        enc = make()
        plan = plan_table_sharding(enc, 8)
        params = enc.init(jax.random.key(2))
        x = jax.random.uniform(jax.random.key(3), (257, enc.input_dim))
        shards = shard_table(np.asarray(params["table"]), enc, plan)
        got = sharded_encode_apply(enc, plan, mesh8, shards, x)
        want = enc.apply(params, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6, rtol=1e-6)

    def test_bitparity_at_domain_edges(self, mesh8):
        enc = _enc_mixed()
        plan = plan_table_sharding(enc, 8)
        params = enc.init(jax.random.key(4))
        x = np.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0], [0.5, 0.0, 1.0]], np.float32)
        shards = shard_table(np.asarray(params["table"]), enc, plan)
        got = sharded_encode_apply(enc, plan, mesh8, shards, x)
        want = enc.apply(params, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


class TestShardedFit:
    def _model(self, **kw):
        base = dict(dim_in=3, n_levels=4, n_features_per_level=2,
                    log2_hashmap_size=16, base_resolution=(4, 4, 2),
                    finest_resolution=(32, 32, 12), storage="auto",
                    dim_hidden=16, n_layers=2, decoder="relu_plain", fused="off")
        base.update(kw)
        return make_hash_mlp(**base)

    def test_loss_curve_matches_single_device_trainer(self, mesh8):
        """Same model/seed: the sharded fit must track Trainer.fit's loss
        curve (same permutations + init; only float summation order differs)."""
        vol = synthetic_volume((14, 14, 10), seed=5)
        ds = dataset_from_array(vol)
        cfg = TrainConfig(batch_size=490, epochs=2, lr=2e-3, seed=0)
        model = self._model()
        sh = ShardedHashTrainer(cfg, mesh=mesh8).fit(model, ds.coords, ds.values)
        ref = Trainer(cfg).fit(model, ds.coords, ds.values)
        assert sh.losses.shape == ref.losses.shape
        np.testing.assert_allclose(sh.losses, ref.losses, rtol=2e-3, atol=1e-6)

    def test_remat_value_parity(self, mesh8):
        """TrainConfig.remat under the sharded trainer is value-identical."""
        vol = synthetic_volume((12, 12, 8), seed=3)
        ds = dataset_from_array(vol)
        model = self._model()
        r0 = ShardedHashTrainer(TrainConfig(batch_size=320, epochs=1, lr=2e-3, seed=0),
                                mesh=mesh8).fit(model, ds.coords, ds.values)
        r1 = ShardedHashTrainer(TrainConfig(batch_size=320, epochs=1, lr=2e-3, seed=0,
                                            remat=True),
                                mesh=mesh8).fit(model, ds.coords, ds.values)
        np.testing.assert_allclose(r1.losses, r0.losses, rtol=1e-6, atol=0)

    def test_temporal_tv_matches_trainer(self, mesh8):
        """The device-local TV decomposition must equal the full-table prior."""
        vol = synthetic_volume((12, 12, 8), seed=7)
        ds = dataset_from_array(vol)
        cfg = TrainConfig(batch_size=384, epochs=2, lr=2e-3, seed=3)
        model = self._model(temporal_tv=0.05)
        sh = ShardedHashTrainer(cfg, mesh=mesh8).fit(model, ds.coords, ds.values)
        ref = Trainer(cfg).fit(model, ds.coords, ds.values)
        np.testing.assert_allclose(sh.losses, ref.losses, rtol=2e-3, atol=1e-6)

    def test_norm_decoder_and_state_thread(self, mesh8):
        """BatchNorm decoders (the reference default stack) work sharded."""
        vol = synthetic_volume((10, 10, 6), seed=1)
        ds = dataset_from_array(vol)
        cfg = TrainConfig(batch_size=300, epochs=2, lr=2e-3, seed=0)
        model = self._model(decoder="norm")
        sh = ShardedHashTrainer(cfg, mesh=mesh8).fit(model, ds.coords, ds.values)
        ref = Trainer(cfg).fit(model, ds.coords, ds.values)
        np.testing.assert_allclose(sh.losses, ref.losses, rtol=5e-3, atol=1e-6)
        assert sh.state["bn"], "BN state must thread through the sharded scan"

    def test_decoder_freeze_mask(self, mesh8):
        """Two-phase protocol semantics: frozen decoder stays bit-identical
        while the sharded table trains."""
        vol = synthetic_volume((10, 10, 6), seed=2)
        ds = dataset_from_array(vol)
        cfg = TrainConfig(batch_size=300, epochs=1, lr=5e-3, seed=0)
        model = self._model()
        key = jax.random.key(99)
        params0, state0 = model.init(key)

        def freeze_decoder(params):
            return {k: jax.tree.map(lambda _: (k == "encoder"), v) for k, v in params.items()}

        res = ShardedHashTrainer(cfg, mesh=mesh8, freeze_mask_fn=freeze_decoder).fit(
            model, ds.coords, ds.values, params=params0, state=state0)
        for a, b in zip(jax.tree.leaves(res.params["layers"]), jax.tree.leaves(params0["layers"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert not np.array_equal(np.asarray(res.params["encoder"]["table"]),
                                  np.asarray(params0["encoder"]["table"]))

    def test_unsharded_params_usable_by_standard_model(self, mesh8):
        """Returned params drop into the standard model for evaluation."""
        vol = synthetic_volume((10, 10, 6), seed=1)
        ds = dataset_from_array(vol)
        cfg = TrainConfig(batch_size=300, epochs=1, lr=5e-3, seed=0)
        model = self._model()
        res = ShardedHashTrainer(cfg, mesh=mesh8).fit(model, ds.coords, ds.values)
        y, _ = model.apply(res.params, res.state, ds.coords[:64], train=False, rng=None)
        assert y.shape == (64, 1)
        assert np.isfinite(np.asarray(y)).all()

    def test_requires_hash_model(self, mesh8):
        from mri_interpolation_tpu.models import make_siren

        cfg = TrainConfig(batch_size=10, epochs=1)
        with pytest.raises(ValueError, match="encoder"):
            ShardedHashTrainer(cfg, mesh=mesh8).fit(
                make_siren(dim_in=3), np.zeros((10, 3), np.float32), np.zeros((10, 1), np.float32))


class TestShardedTableInference:
    def test_grid_eval_matches_unsharded(self, mesh8):
        """Dense-grid inference with the table still sharded must equal the
        standard evaluate_grid on the unsharded params."""
        from mri_interpolation_tpu.infer import evaluate_grid
        from mri_interpolation_tpu.parallel.sharded_table import (
            evaluate_grid_sharded_table,
        )

        vol = synthetic_volume((12, 12, 8), seed=9)
        ds = dataset_from_array(vol)
        model = make_hash_mlp(
            dim_in=3, n_levels=4, n_features_per_level=2, log2_hashmap_size=16,
            base_resolution=(4, 4, 2), finest_resolution=(32, 32, 12), storage="auto",
            dim_hidden=16, n_layers=2, decoder="relu_plain", fused="off")
        cfg = TrainConfig(batch_size=384, epochs=1, lr=5e-3, seed=0)
        res = ShardedHashTrainer(cfg, mesh=mesh8).fit(model, ds.coords, ds.values)

        enc = model.hparams["encoder"]
        plan = plan_table_sharding(enc, 8)
        shards = shard_table(np.asarray(res.params["encoder"]["table"]), enc, plan)
        dec_params = {k: v for k, v in res.params.items() if k != "encoder"}
        shape = (10, 11, 9)
        got = evaluate_grid_sharded_table(model, plan, mesh8, shards, dec_params,
                                          res.state, shape, chunk_size=128)
        want = evaluate_grid(model, res.params, res.state, shape, chunk_size=128)
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestHooksAndGuards:
    def test_rejects_level_annealed_model(self, mesh8):
        """The anneal weighting lives in model.apply, which the distributed
        encode replaces — training must refuse, not silently skip the
        curriculum and leave anneal_step at 0 (which would zero every level
        but the first in later model.apply calls)."""
        from mri_interpolation_tpu.models import make_hash_mlp

        model = make_hash_mlp(
            dim_in=3, n_levels=2, n_features_per_level=2, log2_hashmap_size=10,
            base_resolution=(4, 4, 2), finest_resolution=(16, 16, 8),
            dim_hidden=16, n_layers=2, decoder="relu_plain", fused="off",
            level_anneal_steps=50)
        ds = dataset_from_array(synthetic_volume((10, 10, 6), seed=1))
        with pytest.raises(ValueError, match="level_anneal"):
            ShardedHashTrainer(TrainConfig(batch_size=120, epochs=1),
                               mesh=mesh8).fit(model, ds.coords, ds.values)

    def test_eval_fn_streams_psnr(self, mesh8, tmp_path):
        """--eval_every_epochs parity on the sharded path: the hook fires on
        un-sharded full params usable by any inference path."""
        from mri_interpolation_tpu.infer import predict_batched
        from mri_interpolation_tpu.train import read_scalars

        ds = dataset_from_array(synthetic_volume((12, 12, 8), seed=2))
        log = str(tmp_path / "scalars.jsonl")
        cfg = TrainConfig(batch_size=288, epochs=2, lr=2e-3, seed=0,
                          log_jsonl=log, eval_every_epochs=1)
        model = make_hash_mlp(
            dim_in=3, n_levels=2, n_features_per_level=2, log2_hashmap_size=10,
            base_resolution=(4, 4, 2), finest_resolution=(16, 16, 8),
            dim_hidden=16, n_layers=2, decoder="relu_plain", fused="off")
        calls = []

        def eval_fn(params, state):
            # full (un-sharded) params must drive the standard inference path
            y = predict_batched(model, params, state, ds.coords[:128],
                                chunk_size=128)
            calls.append(1)
            mse = float(np.mean((y - np.asarray(ds.values[:128])) ** 2))
            return {"psnr": 10.0 * np.log10(1.0 / max(mse, 1e-12))}

        ShardedHashTrainer(cfg, mesh=mesh8).fit(model, ds.coords, ds.values,
                                                eval_fn=eval_fn)
        recs = read_scalars(log, tag="psnr")
        assert len(recs) == 2 == len(calls)
        assert all(np.isfinite(r["value"]) for r in recs)
