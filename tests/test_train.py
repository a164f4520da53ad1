"""Training-step, schedule, checkpoint, and sharded-gradient tests.

Uses a tiny PWCDCNet config (3 levels, 16x16 inputs) so CPU compiles stay
fast; the sharding tests run on the 8-device virtual CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from pwcnet_tpu.models import PWCDCNet
from pwcnet_tpu.parallel import batch_sharding, make_mesh, shard_batch
from pwcnet_tpu.train_lib import (
    create_train_state,
    latest_checkpoint,
    make_eval_step,
    make_lr,
    make_train_step,
    restore_checkpoint,
    save_checkpoint,
)

TINY = dict(num_levels=3, output_level=1, search_range=2)
HW = 16


def _tiny_state(lr=1e-3, scheduling=False):
    model = PWCDCNet(**TINY)
    state = create_train_state(
        model,
        jax.random.PRNGKey(0),
        (1, HW, HW, 3),
        learning_rate=lr,
        lr_scheduling=scheduling,
    )
    return model, state


def _batch(rng, b=4):
    images = rng.random((b, 2, HW, HW, 3)).astype(np.float32)
    flows = (rng.standard_normal((b, HW, HW, 2)) * 2).astype(np.float32)
    return jnp.asarray(images), jnp.asarray(flows)


class TestSchedule:
    def test_piecewise_halving(self):
        lr = make_lr(1e-4, scheduling=True)
        assert lr(0) == pytest.approx(1e-4)
        assert lr(200_000) == pytest.approx(5e-5)
        assert lr(250_000) == pytest.approx(2.5e-5)
        assert lr(400_000) == pytest.approx(1e-4 / 32)
        assert lr(4_000_000) == pytest.approx(1e-4 / 32)  # no 4M boundary

    def test_constant(self):
        assert make_lr(1e-4, scheduling=False) == 1e-4


class TestTrainStep:
    def test_loss_decreases_on_repeated_batch(self, rng):
        model, state = _tiny_state()
        step = make_train_step(model, donate=False)
        images, flows = _batch(rng)
        first = None
        for _ in range(8):
            state, metrics = step(state, images, flows)
            if first is None:
                first = float(metrics["loss"])
        assert float(metrics["loss"]) < first
        assert int(state.step) == 8

    @pytest.mark.slow
    def test_metrics_keys_and_finiteness(self, rng):
        model, state = _tiny_state()
        step = make_train_step(model, donate=False)
        images, flows = _batch(rng)
        _, metrics = step(state, images, flows)
        assert set(metrics) == {"loss", "data_loss", "epe"}
        assert all(np.isfinite(float(v)) for v in metrics.values())

    @pytest.mark.slow
    def test_robust_loss_variant(self, rng):
        model, state = _tiny_state()
        step = make_train_step(model, donate=False, loss_name="robust")
        images, flows = _batch(rng)
        _, metrics = step(state, images, flows)
        assert np.isfinite(float(metrics["loss"]))

    def test_eval_step_does_not_update(self, rng):
        model, state = _tiny_state()
        estep = make_eval_step(model)
        images, flows = _batch(rng)
        metrics = estep(state, images, flows)
        assert int(state.step) == 0
        assert np.isfinite(float(metrics["epe"]))

    def test_plain_init_twin_is_bit_identical(self):
        """create_train_state inits on a plain twin of the model (the
        kernel/sharding overrides carry no parameters), which avoids
        eagerly dispatching shard_mapped interpret kernels at init —
        the source of the XLA:CPU algebraic-simplifier circular-loop
        errors in the r4 multichip dryrun (scripts/bisect_algsimp.py).
        The fix is only sound if the plain twin's init tree is
        BIT-IDENTICAL to the overridden model's; assert exactly that."""
        import functools

        import jax

        from pwcnet_tpu.models import PWCDCNet
        from pwcnet_tpu.ops.pallas import (
            cost_volume_pallas,
            pyramid_level_fused,
        )
        from pwcnet_tpu.train_lib import create_train_state

        kw = dict(num_levels=3, output_level=1, search_range=2)
        fused = PWCDCNet(
            cost_volume_fn=functools.partial(
                cost_volume_pallas, interpret=True
            ),
            pyramid_level_fn=functools.partial(
                pyramid_level_fused, banded=False, interpret=True
            ),
            fused_pyramid_levels=2,
            fused_estimator_levels=1,
            **kw,
        )
        x = jnp.zeros((1, 16, 16, 3), jnp.float32)
        direct = fused.init(jax.random.PRNGKey(3), x, x)["params"]
        state = create_train_state(
            fused, jax.random.PRNGKey(3), (1, 16, 16, 3)
        )
        assert jax.tree_util.tree_all(
            jax.tree_util.tree_map(
                lambda a, b: bool((a == b).all()), direct, state.params
            )
        )


class TestShardedTraining:
    @pytest.mark.slow
    def test_dp_grads_match_single_device(self, rng):
        """Sharded-batch training must produce the same update as
        single-device training (the psum-correctness invariant)."""
        model, state_a = _tiny_state()
        _, state_b = _tiny_state()
        step = make_train_step(model, donate=False)
        images, flows = _batch(rng, b=8)

        mesh = make_mesh(data=8, spatial=1)
        sh_img = batch_sharding(mesh)
        sh_flo = batch_sharding(mesh)
        state_a, m_a = step(state_a, images, flows)
        state_b, m_b = step(
            state_b,
            jax.device_put(images, sh_img),
            jax.device_put(flows, sh_flo),
        )
        np.testing.assert_allclose(
            float(m_a["loss"]), float(m_b["loss"]), rtol=1e-5
        )
        pa = jax.tree_util.tree_leaves(state_a.params)
        pb = jax.tree_util.tree_leaves(state_b.params)
        for a, b in zip(pa, pb):
            # reduction order differs between psum shards and one device
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
            )

    def test_spatial_sharding_forward(self, rng):
        """H-sharded forward == replicated forward (halo handled by XLA)."""
        model, state = _tiny_state()
        mesh = make_mesh(data=2, spatial=4)
        images, flows = _batch(rng, b=2)
        imgs_sh, flo_sh = shard_batch((images, flows), mesh, spatial=True)
        fwd = jax.jit(
            lambda p, a, b: model.apply({"params": p}, a, b)[0]
        )
        out_ref = fwd(state.params, images[:, 0], images[:, 1])
        out_sh = fwd(state.params, imgs_sh[:, 0], imgs_sh[:, 1])
        np.testing.assert_allclose(
            np.asarray(out_ref), np.asarray(out_sh), rtol=1e-4, atol=1e-5
        )

    def test_mesh_validation(self):
        with pytest.raises(ValueError):
            make_mesh(data=3, spatial=3)  # 9 != 8 devices


class TestCheckpoint:
    def test_roundtrip_full_state(self, rng, tmp_path):
        model, state = _tiny_state()
        step = make_train_step(model, donate=False)
        images, flows = _batch(rng)
        state, _ = step(state, images, flows)

        path = tmp_path / "ckpt" / "model_1.msgpack"
        save_checkpoint(path, state)

        _, fresh = _tiny_state()
        restored = restore_checkpoint(path, fresh)
        assert int(restored.step) == 1
        for a, b in zip(
            jax.tree_util.tree_leaves(state.params),
            jax.tree_util.tree_leaves(restored.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # optimizer state (Adam mu/nu) restored too
        for a, b in zip(
            jax.tree_util.tree_leaves(state.opt_state),
            jax.tree_util.tree_leaves(restored.opt_state),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    @pytest.mark.slow
    def test_resume_training_continues(self, rng, tmp_path):
        model, state = _tiny_state()
        step = make_train_step(model, donate=False)
        images, flows = _batch(rng)
        state, _ = step(state, images, flows)
        save_checkpoint(tmp_path / "model_1.msgpack", state)
        _, fresh = _tiny_state()
        restored = restore_checkpoint(tmp_path / "model_1.msgpack", fresh)
        restored, metrics = step(restored, images, flows)
        assert int(restored.step) == 2

    def test_latest_checkpoint(self, tmp_path):
        (tmp_path / "model_2.msgpack").write_bytes(b"x")
        (tmp_path / "model_10.msgpack").write_bytes(b"x")
        (tmp_path / "junk.txt").write_bytes(b"x")
        assert latest_checkpoint(tmp_path).endswith("model_10.msgpack")
        assert latest_checkpoint(tmp_path / "none") is None


class TestMixedPrecision:
    @pytest.mark.slow
    def test_bf16_model_f32_loss_and_params(self, rng):
        model = PWCDCNet(dtype=jnp.bfloat16, **TINY)
        state = create_train_state(model, jax.random.PRNGKey(0), (1, HW, HW, 3))
        # master params stay f32
        for p in jax.tree_util.tree_leaves(state.params):
            assert p.dtype == jnp.float32
        step = make_train_step(model, donate=False)
        images, flows = _batch(rng)
        state, metrics = step(state, images, flows)
        assert metrics["loss"].dtype == jnp.float32
        assert np.isfinite(float(metrics["loss"]))
        for p in jax.tree_util.tree_leaves(state.params):
            assert p.dtype == jnp.float32


class TestOrbaxBackend:
    @pytest.mark.slow
    def test_orbax_roundtrip(self, rng, tmp_path):
        from pwcnet_tpu.train_lib import (
            restore_checkpoint_orbax,
            save_checkpoint_orbax,
        )

        model, state = _tiny_state()
        step = make_train_step(model, donate=False)
        images, flows = _batch(rng)
        state, _ = step(state, images, flows)
        path = save_checkpoint_orbax(tmp_path / "orbax_1", state)
        _, fresh = _tiny_state()
        restored = restore_checkpoint_orbax(path, fresh)
        assert int(restored.step) == 1
        for a, b in zip(
            jax.tree_util.tree_leaves(state.params),
            jax.tree_util.tree_leaves(restored.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    @pytest.mark.slow
    def test_async_save_overlaps_training(self, rng, tmp_path):
        """wait=False returns before the write commits; training continues
        meanwhile, and the checkpoint read back (after the implicit flush
        in restore) is the exact state that was passed to save — not the
        steps taken during the write."""
        from pwcnet_tpu.train_lib import (
            restore_checkpoint_orbax,
            save_checkpoint_orbax,
        )
        from pwcnet_tpu.train_lib.checkpoint import wait_for_orbax_saves

        model, state = _tiny_state()
        step = make_train_step(model, donate=False)
        images, flows = _batch(rng)
        state, _ = step(state, images, flows)
        saved_params = jax.tree_util.tree_map(np.asarray, state.params)
        save_checkpoint_orbax(tmp_path / "orbax_async", state, wait=False)
        # training continues while the write is in flight
        for _ in range(3):
            state, _ = step(state, images, flows)
        assert int(state.step) == 4
        wait_for_orbax_saves()
        _, fresh = _tiny_state()
        restored = restore_checkpoint_orbax(tmp_path / "orbax_async", fresh)
        assert int(restored.step) == 1  # the snapshot, not the live state
        for a, b in zip(
            jax.tree_util.tree_leaves(saved_params),
            jax.tree_util.tree_leaves(restored.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
