"""Fused Pallas estimator-chain kernel vs the XLA 6-conv chain.

The kernel (`ops/pallas/estimator_conv.py`) computes one flow-estimator
level — 5x (conv 3x3 + LeakyReLU(0.1)) + linear flow conv, reference
`modules.py:227-285` — in a single VMEM pass. These tests run it in
interpreter mode on CPU and assert parity with the XLA formulation it
replaces, plus gradient parity through the native Pallas backward and
model-level equivalence of `fused_estimator_levels`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pwcnet_tpu.ops.pallas.estimator_conv import (
    _xla_chain,
    estimator_chain_fused,
)


def _chain_params(rng, cin, filters=(16, 16, 8, 8, 8, 2),
                  dtype=jnp.float32):
    """Fan-in-scaled random conv params (glorot-like) keeping the 6-conv
    chain's activations O(1)."""

    def t(*shape):
        v = rng.standard_normal(shape).astype(np.float32)
        if len(shape) == 4:
            v /= np.sqrt(9.0 * shape[2])
        else:
            v *= 0.1
        return jnp.asarray(v, dtype=dtype)

    kbs = []
    c = cin
    for f in filters:
        kbs.extend([t(3, 3, c, f), t(f)])
        c = f
    return tuple(kbs)


class TestEstimatorChainFused:
    @pytest.mark.parametrize(
        "shape",
        [
            (1, 8, 8, 12),
            (2, 12, 16, 25),  # odd cin exercises the sublane padding
        ],
    )
    def test_matches_xla_chain(self, rng, shape):
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        kbs = _chain_params(rng, shape[-1])
        want_f, want_feat = _xla_chain(x, *kbs)
        got_f, got_feat = estimator_chain_fused(x, *kbs, interpret=True)
        assert got_f.shape == want_f.shape
        assert got_feat.shape == want_feat.shape
        np.testing.assert_allclose(
            np.asarray(got_f), np.asarray(want_f), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(got_feat), np.asarray(want_feat),
            rtol=1e-5, atol=1e-5,
        )

    def test_bfloat16_matches_xla_chain(self, rng):
        x = jnp.asarray(
            rng.standard_normal((1, 8, 8, 12)).astype(np.float32),
            dtype=jnp.bfloat16,
        )
        kbs = _chain_params(rng, 12, dtype=jnp.bfloat16)
        want_f, _ = _xla_chain(x, *kbs)
        got_f, _ = estimator_chain_fused(x, *kbs, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got_f, dtype=np.float32),
            np.asarray(want_f, dtype=np.float32),
            rtol=3e-2, atol=3e-2,
        )

    def test_tiled_matches_untiled(self, rng):
        x = jnp.asarray(
            rng.standard_normal((1, 8, 8, 12)).astype(np.float32)
        )
        kbs = _chain_params(rng, 12)
        whole = estimator_chain_fused(x, *kbs, tile_h=8, interpret=True)
        tiled = estimator_chain_fused(x, *kbs, tile_h=2, interpret=True)
        for a, b in zip(tiled, whole):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6
            )

    def test_non_dividing_tile_h_is_auto_planned(self, rng):
        """Regression: tile_h=3 with h=8 must auto-plan (grid = 8 // 3
        would leave rows 6-7 unwritten — NaN), matching the cost-volume
        planner's policy."""
        x = jnp.asarray(
            rng.standard_normal((1, 8, 8, 12)).astype(np.float32)
        )
        kbs = _chain_params(rng, 12)
        want = estimator_chain_fused(x, *kbs, tile_h=8, interpret=True)
        got = estimator_chain_fused(x, *kbs, tile_h=3, interpret=True)
        for a, b in zip(got, want):
            assert np.isfinite(np.asarray(a)).all()
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6
            )

    @pytest.mark.parametrize("tile_h,bwd_tile", [(8, 8), (2, 8), (2, 4)])
    def test_grads_match_xla_chain(self, rng, tile_h, bwd_tile,
                                   monkeypatch):
        """Both cotangents (flow AND features) through the Pallas gz
        chain. The backward tile must be forced to cover the multi-tile
        backward (bwd_tile=4 -> nt=2): _pick_tile_bwd at h=8 always
        returns 8, and per-tile gz chains that miss neighbor-tile
        cotangent contributions corrupt dk1-dk5/db1-db5 at exactly the
        seams this hides (the round-3 exact-row redesign's regression
        case: 19-65%% wrong before the fix)."""
        from pwcnet_tpu.ops.pallas import estimator_conv as ecp

        monkeypatch.setattr(
            ecp, "_pick_tile_bwd", lambda *a, **k: bwd_tile
        )
        x = jnp.asarray(
            rng.standard_normal((1, 8, 8, 12)).astype(np.float32)
        )
        kbs = _chain_params(rng, 12)
        gf = jnp.asarray(
            rng.standard_normal((1, 8, 8, 2)).astype(np.float32)
        )
        gt = jnp.asarray(
            rng.standard_normal((1, 8, 8, 8)).astype(np.float32)
        )

        def loss_fused(x, *p):
            f, feat = estimator_chain_fused(
                x, *p, tile_h=tile_h, interpret=True
            )
            return jnp.sum(f * gf) + jnp.sum(feat * gt)

        def loss_xla(x, *p):
            f, feat = _xla_chain(x, *p)
            return jnp.sum(f * gf) + jnp.sum(feat * gt)

        n = 1 + len(kbs)
        got = jax.grad(loss_fused, argnums=tuple(range(n)))(x, *kbs)
        want = jax.grad(loss_xla, argnums=tuple(range(n)))(x, *kbs)
        for a, b in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
            )

    def test_vmem_fallback_grads_match(self, rng, monkeypatch):
        from pwcnet_tpu.ops.pallas import estimator_conv as ecp

        monkeypatch.setattr(ecp, "_pick_tile_bwd", lambda *a, **k: 4)
        x = jnp.asarray(
            rng.standard_normal((1, 8, 8, 12)).astype(np.float32)
        )
        kbs = _chain_params(rng, 12)
        gf = jnp.asarray(
            rng.standard_normal((1, 8, 8, 2)).astype(np.float32)
        )

        def loss(x, *p):
            f, _ = estimator_chain_fused(x, *p, interpret=True)
            return jnp.sum(f * gf)

        got = jax.grad(loss)(x, *kbs)
        monkeypatch.setattr(ecp, "_est_bwd_pallas", lambda *a: None)
        want = jax.grad(loss)(x, *kbs)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )


class TestModelFusedEstimator:
    def test_model_output_and_param_tree_unchanged(self, rng):
        """PWCDCNet(fused_estimator_levels=2) == default model: identical
        parameter tree (checkpoint compatibility) and identical flows."""
        from pwcnet_tpu.models import PWCDCNet

        kw = dict(num_levels=3, output_level=1, search_range=2)
        base = PWCDCNet(**kw)
        fused = PWCDCNet(fused_estimator_levels=2, **kw)
        x0 = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
        x1 = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
        pb = base.init(jax.random.PRNGKey(0), x0, x1)
        pf = fused.init(jax.random.PRNGKey(0), x0, x1)
        assert jax.tree_util.tree_structure(pb) == (
            jax.tree_util.tree_structure(pf)
        )
        for a, b in zip(jax.tree_util.tree_leaves(pb),
                        jax.tree_util.tree_leaves(pf)):
            assert a.shape == b.shape
        flows_b, pyr_b = base.apply(pb, x0, x1)
        flows_f, pyr_f = fused.apply(pb, x0, x1)
        np.testing.assert_allclose(
            np.asarray(flows_f), np.asarray(flows_b), rtol=1e-4, atol=1e-4
        )
        for a, b in zip(pyr_f, pyr_b):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
            )
