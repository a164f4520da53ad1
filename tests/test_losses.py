"""Loss/metric tests vs NumPy oracles (reference losses.py semantics)."""

import jax.numpy as jnp
import numpy as np

import oracles
from pwcnet_tpu import losses


def _pyramid(rng, b=2, base=4, levels=5):
    return [
        (rng.standard_normal((b, base * 2**l, base * 2**l, 2)) * 2).astype(
            np.float32
        )
        for l in range(levels)
    ]


class TestPointwiseLosses:
    def test_l1(self, rng):
        x = rng.standard_normal((2, 5, 6, 2)).astype(np.float32)
        y = rng.standard_normal((2, 5, 6, 2)).astype(np.float32)
        got = float(losses.l1_loss(jnp.asarray(x), jnp.asarray(y)))
        np.testing.assert_allclose(got, oracles.l1_loss(x, y), rtol=1e-5)

    def test_l2(self, rng):
        x = rng.standard_normal((2, 5, 6, 2)).astype(np.float32)
        y = rng.standard_normal((2, 5, 6, 2)).astype(np.float32)
        got = float(losses.l2_loss(jnp.asarray(x), jnp.asarray(y)))
        np.testing.assert_allclose(got, oracles.l2_loss(x, y), rtol=1e-5)

    def test_epe(self, rng):
        x = rng.standard_normal((2, 5, 6, 2)).astype(np.float32)
        y = rng.standard_normal((2, 5, 6, 2)).astype(np.float32)
        got = float(losses.epe(jnp.asarray(x), jnp.asarray(y)))
        np.testing.assert_allclose(got, oracles.epe(x, y), rtol=1e-5)

    def test_epe_zero_for_identical(self, rng):
        x = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)
        assert float(losses.epe(jnp.asarray(x), jnp.asarray(x))) == 0.0


class TestPyramidLosses:
    def test_multiscale(self, rng):
        pyr = _pyramid(rng)
        gt = (rng.standard_normal((2, 64, 64, 2)) * 10).astype(np.float32)
        weights = (0.32, 0.08, 0.02, 0.01, 0.005)
        got = float(
            losses.multiscale_loss(
                jnp.asarray(gt), [jnp.asarray(f) for f in pyr], weights
            )
        )
        want = oracles.multiscale_loss(gt, pyr, weights)
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_multirobust(self, rng):
        pyr = _pyramid(rng)
        gt = (rng.standard_normal((2, 64, 64, 2)) * 10).astype(np.float32)
        weights = (0.32, 0.08, 0.02, 0.01, 0.005)
        got = float(
            losses.multirobust_loss(
                jnp.asarray(gt),
                [jnp.asarray(f) for f in pyr],
                weights,
                epsilon=0.02,
                q=0.4,
            )
        )
        want = oracles.multirobust_loss(gt, pyr, weights, epsilon=0.02, q=0.4)
        np.testing.assert_allclose(got, want, rtol=1e-4)


class TestWeightDecay:
    def test_matches_tf_l2_loss_sum(self, rng):
        params = {
            "a": {"kernel": rng.standard_normal((3, 3, 2, 4)).astype(np.float32)},
            "b": {"bias": rng.standard_normal((4,)).astype(np.float32)},
        }
        got = float(losses.weight_decay(params))
        want = 0.5 * sum(
            (v**2).sum()
            for v in [params["a"]["kernel"], params["b"]["bias"]]
        )
        np.testing.assert_allclose(got, want, rtol=1e-6)
