"""End-to-end convergence proofs on the deterministic SyntheticFlow task.

The reference never demonstrates convergence beyond TensorBoard curves
(SURVEY.md §4); here PWCDCNet must actually drive EPE below 0.5 px on a
16-sample synthetic set (32x32, constant integer flows up to ±2 px)
within a bounded, calibrated step count — deterministic on the CPU
backend (fixed PRNG seeds everywhere).

Calibration (CPU, lr 1e-3, batch 8): multiscale f32 reaches ~0.21 px by
step 275; remat ~0.14 by 300; robust and bf16 do not converge from
scratch at any tested lr (the robust loss's q=0.4 exponent flattens
early gradients; bf16 activation noise stalls symmetry breaking) — they
are *fine-tuning* configurations, matching the paper's protocol (robust
loss is introduced for fine-tuning, arXiv:1709.02371 §4), and both drive
EPE further down from a 300-step multiscale-f32 warm start (robust:
0.13 @ +150 steps; bf16 @ lr 1e-4: 0.04 @ +120).

The recorded loss/EPE curve artifact lives in docs/convergence_synthetic.*
(regenerate with scripts/record_convergence.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pwcnet_tpu.data import DataLoader, get_dataset
from pwcnet_tpu.models import PWCDCNet
from pwcnet_tpu.train_lib import create_train_state, make_train_step
from pwcnet_tpu.train_lib.step import make_eval_step

CFG = dict(num_levels=3, output_level=1, search_range=2)
EPE_TARGET = 0.5


def _dataset():
    return get_dataset("Synthetic")(
        train_or_val="train",
        dataset_dir=".",
        num_samples=16,
        image_shape=(32, 32),
        max_disp=2,
    )


def _batches(dset):
    loader = DataLoader(
        dset, batch_size=8, shuffle=True, drop_last=True, seed=1
    )
    while True:
        yield from loader


def _train(model, state, gen, steps, dtype, loss_name="multiscale"):
    step = make_train_step(model, donate=False, loss_name=loss_name)
    for _ in range(steps):
        images, flows = next(gen)
        state, metrics = step(
            state, jnp.asarray(images, dtype), jnp.asarray(flows)
        )
    return state, metrics


def _full_set_epe(model, state, dset, dtype):
    """Mean EPE over every sample (not just the last batch)."""
    eval_step = make_eval_step(model)
    loader = DataLoader(dset, batch_size=8, shuffle=False, drop_last=False)
    epes = []
    for images, flows in loader:
        m = eval_step(state, jnp.asarray(images, dtype), jnp.asarray(flows))
        epes.append(float(m["epe"]))
    return float(np.mean(epes))


def _warm_start(gen):
    model = PWCDCNet(dtype=jnp.float32, **CFG)
    state = create_train_state(
        model,
        jax.random.PRNGKey(0),
        (1, 32, 32, 3),
        learning_rate=1e-3,
        lr_scheduling=False,
    )
    return _train(model, state, gen, 300, jnp.float32)[0]


class TestConvergence:
    @pytest.mark.slow
    def test_multiscale_f32_converges(self):
        dset = _dataset()
        gen = _batches(dset)
        model = PWCDCNet(dtype=jnp.float32, **CFG)
        state = create_train_state(
            model, jax.random.PRNGKey(0), (1, 32, 32, 3),
            learning_rate=1e-3, lr_scheduling=False,
        )
        state, _ = _train(model, state, gen, 400, jnp.float32)
        epe = _full_set_epe(model, state, dset, jnp.float32)
        assert epe < EPE_TARGET, f"EPE {epe:.3f} after 400 steps"

    @pytest.mark.slow
    def test_remat_converges(self):
        """jax.checkpoint rematerialization must not change optimization."""
        dset = _dataset()
        gen = _batches(dset)
        model = PWCDCNet(dtype=jnp.float32, remat=True, **CFG)
        state = create_train_state(
            model, jax.random.PRNGKey(0), (1, 32, 32, 3),
            learning_rate=1e-3, lr_scheduling=False,
        )
        state, _ = _train(model, state, gen, 400, jnp.float32)
        epe = _full_set_epe(model, state, dset, jnp.float32)
        assert epe < EPE_TARGET, f"EPE {epe:.3f} after 400 remat steps"

    @pytest.mark.slow
    def test_robust_loss_finetune_converges(self):
        """Paper protocol: robust loss fine-tunes a multiscale-trained
        model (reference --loss robust, fixed NameError)."""
        dset = _dataset()
        gen = _batches(dset)
        state = _warm_start(gen)
        model = PWCDCNet(dtype=jnp.float32, **CFG)
        state, _ = _train(
            model, state, gen, 150, jnp.float32, loss_name="robust"
        )
        epe = _full_set_epe(model, state, dset, jnp.float32)
        assert epe < EPE_TARGET, f"EPE {epe:.3f} after robust fine-tune"

    @pytest.mark.slow
    def test_bf16_finetune_converges(self):
        """bf16 mixed-precision training continues improving a converged
        f32 model (from-scratch bf16 stalls — documented above)."""
        dset = _dataset()
        gen = _batches(dset)
        warm = _warm_start(gen)
        model = PWCDCNet(dtype=jnp.bfloat16, **CFG)
        state = create_train_state(
            model, jax.random.PRNGKey(0), (1, 32, 32, 3),
            learning_rate=1e-4, lr_scheduling=False,
        )
        state = state.replace(params=warm.params)
        state, _ = _train(model, state, gen, 120, jnp.bfloat16)
        epe = _full_set_epe(model, state, dset, jnp.bfloat16)
        assert epe < EPE_TARGET, f"EPE {epe:.3f} after bf16 fine-tune"
