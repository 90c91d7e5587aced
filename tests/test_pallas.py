"""Pallas kernel oracle tests (interpreter mode — CPU-safe).

Each kernel must match its plain-JAX oracle to float tolerance; the compiled
TPU path shares the exact same kernel body.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mri_interpolation_tpu.models.siren import _siren_forward, _siren_init
from mri_interpolation_tpu.ops.pallas.fused_mlp import (
    fused_siren_apply,
    fused_siren_forward,
)

KEY = jax.random.key(0)


def _setup(n_layers=3, hidden=64, dim_in=3, n=1000):
    params = _siren_init(KEY, dim_in, hidden, 1, n_layers, 30.0, 30.0, 6.0)
    x = jax.random.uniform(jax.random.key(1), (n, dim_in))
    return params, x


class TestFusedSirenForward:
    def test_matches_oracle(self):
        params, x = _setup()
        ref = _siren_forward(params, x, 3, 30.0, 30.0)
        out = fused_siren_forward(params, x, 3, 30.0, 30.0, tile=256, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    def test_nondivisible_batch_padding(self):
        params, x = _setup(n=777)  # 777 % 256 != 0
        ref = _siren_forward(params, x, 3, 30.0, 30.0)
        out = fused_siren_forward(params, x, 3, 30.0, 30.0, tile=256, interpret=True)
        assert out.shape == (777, 1)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    def test_different_w0_initial(self):
        params, x = _setup(n_layers=2)
        ref = _siren_forward(params, x, 2, 25.0, 50.0)
        out = fused_siren_forward(params, x, 2, 25.0, 50.0, tile=256, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    def test_single_layer(self):
        params, x = _setup(n_layers=1, n=256)
        ref = _siren_forward(params, x, 1, 30.0, 30.0)
        out = fused_siren_forward(params, x, 1, 30.0, 30.0, tile=256, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


class TestFusedSirenVjp:
    def test_grads_match_oracle(self):
        params, x = _setup()
        y = jax.random.normal(jax.random.key(2), (1000, 1))
        g_ref = jax.grad(lambda p: jnp.mean((_siren_forward(p, x, 3, 30.0, 30.0) - y) ** 2))(params)
        g_fused = jax.grad(
            lambda p: jnp.mean((fused_siren_apply(p, x, 3, 30.0, 30.0, tile=256, interpret=True) - y) ** 2)
        )(params)
        max_diff = jax.tree.reduce(
            max, jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), g_ref, g_fused)
        )
        assert max_diff < 1e-5

    def test_grad_accumulation_across_tiles(self):
        # multiple grid steps must accumulate, not overwrite
        params, x = _setup(n=512)
        y = jnp.zeros((512, 1))

        def loss(p, tile):
            return jnp.mean((fused_siren_apply(p, x, 3, 30.0, 30.0, tile=tile, interpret=True) - y) ** 2)

        g_one_tile = jax.grad(lambda p: loss(p, 512))(params)
        g_four_tiles = jax.grad(lambda p: loss(p, 128))(params)
        max_diff = jax.tree.reduce(
            max, jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), g_one_tile, g_four_tiles)
        )
        assert max_diff < 1e-5

    def test_value_matches_under_jit(self):
        params, x = _setup(n=512)

        @jax.jit
        def f(p):
            return fused_siren_apply(p, x, 3, 30.0, 30.0, tile=256, interpret=True)

        ref = _siren_forward(params, x, 3, 30.0, 30.0)
        np.testing.assert_allclose(np.asarray(f(params)), np.asarray(ref), atol=1e-6)


# ---------------------------------------------------------------------------
# hash-encode kernel


from mri_interpolation_tpu.encodings import HashGridEncoding
from mri_interpolation_tpu.ops.pallas.hash_encode import (

    hash_encode_forward,
    pallas_hash_encode,
    table_fits_vmem,
)

pytestmark = pytest.mark.slow  # full-pipeline/protocol layer (run with -m slow; excluded from the fast unit run)


def _enc_setup(storage="auto", dim=3, n=1000, **kw):
    enc = HashGridEncoding(
        dim=dim,
        n_levels=kw.pop("n_levels", 4),
        n_features_per_level=kw.pop("n_features_per_level", 2),
        log2_hashmap_size=kw.pop("log2_hashmap_size", 12),
        base_resolution=kw.pop("base_resolution", (8, 8, 4)[:dim]),
        finest_resolution=kw.pop("finest_resolution", (33, 33, 17)[:dim]),
        storage=storage,
        **kw,
    )
    params = enc.init(jax.random.key(3))
    x = jax.random.uniform(jax.random.key(4), (n, dim))
    return enc, params, x


class TestHashEncodeForward:
    @pytest.mark.parametrize("storage", ["auto", "hashed"])
    def test_matches_oracle(self, storage):
        enc, params, x = _enc_setup(storage)
        ref = enc.apply(params, x)
        out = hash_encode_forward(enc, params, x, tile=256, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    def test_mixed_dense_hashed_levels(self):
        # auto storage with a tight budget: coarse levels dense, fine hashed
        enc, params, x = _enc_setup("auto", log2_hashmap_size=10, n=513)
        assert enc.level_dense.any() and not enc.level_dense.all()
        ref = enc.apply(params, x)
        out = hash_encode_forward(enc, params, x, tile=256, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    def test_2d(self):
        enc, params, x = _enc_setup("auto", dim=2, n=300)
        ref = enc.apply(params, x)
        out = hash_encode_forward(enc, params, x, tile=128, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    def test_vmem_gate(self):
        enc = HashGridEncoding(dim=3, n_levels=16, n_features_per_level=2,
                               log2_hashmap_size=19, base_resolution=16,
                               finest_resolution=None, per_level_scale=1.4)
        assert not table_fits_vmem(enc)
        params = enc.init(jax.random.key(0))
        with pytest.raises(ValueError, match="VMEM"):
            pallas_hash_encode(enc, params, jnp.zeros((4, 3)), interpret=True)


class TestHashEncodeVjp:
    @pytest.mark.parametrize("storage", ["auto", "hashed"])
    def test_table_grads_match_oracle(self, storage):
        enc, params, x = _enc_setup(storage, n=700)
        y = jax.random.normal(jax.random.key(5), (700, enc.output_dim))

        def loss_ref(p):
            return jnp.mean((enc.apply(p, x) - y) ** 2)

        def loss_kernel(p):
            return jnp.mean((pallas_hash_encode(enc, p, x, tile=256, interpret=True) - y) ** 2)

        g_ref = jax.grad(loss_ref)(params)["table"]
        g_k = jax.grad(loss_kernel)(params)["table"]
        np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_ref), atol=1e-6)

    def test_grad_accumulation_across_tiles(self):
        enc, params, x = _enc_setup("auto", n=512)
        y = jnp.zeros((512, enc.output_dim))

        def loss(p, tile):
            return jnp.mean((pallas_hash_encode(enc, p, x, tile=tile, interpret=True) - y) ** 2)

        g1 = jax.grad(lambda p: loss(p, 512))(params)["table"]
        g4 = jax.grad(lambda p: loss(p, 128))(params)["table"]
        np.testing.assert_allclose(np.asarray(g4), np.asarray(g1), atol=1e-6)

    def test_value_under_jit(self):
        enc, params, x = _enc_setup("auto", n=512)

        @jax.jit
        def f(p):
            return pallas_hash_encode(enc, p, x, tile=256, interpret=True)

        ref = enc.apply(params, x)
        np.testing.assert_allclose(np.asarray(f(params)), np.asarray(ref), atol=1e-6)


class TestOneHotCoarseEncode:
    """One-hot x table matmul kernels (no gather/scatter primitives — the
    compiled-Mosaic slice of the encoder; VERDICT r2 Next #4)."""

    def _enc(self):
        from mri_interpolation_tpu.encodings import HashGridEncoding

        # all levels dense and small -> every level qualifies
        return HashGridEncoding(dim=3, n_levels=3, n_features_per_level=2,
                                log2_hashmap_size=11, base_resolution=(3, 3, 2),
                                finest_resolution=(11, 11, 6), storage="auto",
                                growth="paper")

    def _oracle_coarse(self, enc, params, x, levels):
        full = enc.apply(params, x)  # (n, L*F)
        F = enc.n_features_per_level
        cols = [full[:, l * F : (l + 1) * F] for l in levels]
        return jnp.concatenate(cols, axis=-1)

    def test_forward_matches_oracle(self):
        from mri_interpolation_tpu.ops.pallas import (
            coarse_onehot_levels,
            pallas_hash_encode_coarse,
        )

        enc = self._enc()
        levels = coarse_onehot_levels(enc)
        assert levels == [0, 1, 2]
        params = enc.init(jax.random.key(3))
        x = jax.random.uniform(jax.random.key(4), (517, 3))
        got = pallas_hash_encode_coarse(enc, params, x, tile=256, interpret=True)
        want = self._oracle_coarse(enc, params, x, levels)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_partial_level_subset(self):
        """Mixed config: only the coarse dense levels qualify."""
        from mri_interpolation_tpu.encodings import HashGridEncoding
        from mri_interpolation_tpu.ops.pallas import (
            coarse_onehot_levels,
            pallas_hash_encode_coarse,
        )

        enc = HashGridEncoding(dim=3, n_levels=4, n_features_per_level=1,
                               log2_hashmap_size=14, base_resolution=(4, 4, 2),
                               finest_resolution=(40, 40, 12), storage="auto")
        levels = coarse_onehot_levels(enc)
        assert 0 < len(levels) < enc.n_levels
        params = enc.init(jax.random.key(5))
        x = jax.random.uniform(jax.random.key(6), (256, 3))
        got = pallas_hash_encode_coarse(enc, params, x, tile=256, interpret=True)
        want = self._oracle_coarse(enc, params, x, levels)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_table_gradients_match_oracle(self):
        from mri_interpolation_tpu.ops.pallas import (
            coarse_onehot_levels,
            pallas_hash_encode_coarse,
        )

        enc = self._enc()
        levels = coarse_onehot_levels(enc)
        params = enc.init(jax.random.key(7))
        x = jax.random.uniform(jax.random.key(8), (300, 3))
        tgt = jax.random.normal(jax.random.key(9), (300, len(levels) * enc.n_features_per_level))

        def loss_kernel(table):
            z = pallas_hash_encode_coarse(enc, {"table": table}, x, tile=256, interpret=True)
            return jnp.mean((z - tgt) ** 2)

        def loss_oracle(table):
            z = self._oracle_coarse(enc, {"table": table}, x, levels)
            return jnp.mean((z - tgt) ** 2)

        g_k = jax.grad(loss_kernel)(params["table"])
        g_o = jax.grad(loss_oracle)(params["table"])
        np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_o), atol=1e-6)
