"""Jit-compiled train/eval steps with mesh sharding.

Replaces the reference's per-step ``sess.run`` fwd/bwd (train.py:125-127)
with a donated, jit-compiled functional step:

- loss = pyramid loss (multiscale or robust) + gamma * sum ||v||^2 / 2
  (train.py:66-75 semantics);
- Adam with TF defaults (b1=0.9, b2=0.999, eps=1e-8) under the
  piecewise-halving LR schedule;
- data parallelism by construction: batches arrive sharded over the mesh
  'data' axis (optionally H over 'spatial'), params replicated; XLA inserts
  the psum gradient all-reduce over ICI.
"""

from __future__ import annotations

import functools
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from pwcnet_tpu import losses
from pwcnet_tpu.train_lib.schedule import make_lr

__all__ = ["TrainState", "create_train_state", "make_train_step", "make_eval_step"]


class TrainState(train_state.TrainState):
    """Params + Adam state + step (improves on the reference's resume,
    which silently dropped Adam beta powers and the global step —
    SURVEY.md §5 checkpoint row)."""


def create_train_state(
    model,
    rng: jax.Array,
    input_shape: Sequence[int],
    learning_rate: float = 1e-4,
    lr_scheduling: bool = True,
) -> TrainState:
    # Initialize on a PLAIN twin of the model: the kernel/sharding
    # overrides (cost_volume_fn, warp_cv_fn, pyramid_level_fn,
    # spatial_guard_fn, fused_* levels) carry no parameters and produce a
    # bit-identical init tree (same module paths, names, initializers —
    # verified in tests), so eager `init` never dispatches the fused
    # Pallas / shard_map paths. Besides being pointless work at init,
    # those eager dispatches compile each shard_mapped interpret-mode
    # kernel as its own tiny XLA module, whose 81-tap
    # dynamic-update-slice chain drives XLA:CPU's algebraic simplifier
    # into its 50-run circular-loop guard (the MULTICHIP_r04 tail
    # errors — diagnosed with scripts/bisect_algsimp.py; the train-step
    # module itself never triggered it). Same trick as
    # FlowPredictor._init_params.
    import dataclasses

    init_model = model
    if hasattr(model, "cost_volume_fn"):  # PWCDCNet (not legacy PWCNet)
        init_model = dataclasses.replace(
            model,
            cost_volume_fn=None,
            warp_cv_fn=None,
            pyramid_level_fn=None,
            spatial_guard_fn=None,
            fused_pyramid_levels=0,
            fused_estimator_levels=0,
        )
    images = jnp.zeros(input_shape, model.dtype)
    variables = init_model.init(rng, images, images)
    tx = optax.adam(
        make_lr(learning_rate, lr_scheduling), b1=0.9, b2=0.999, eps=1e-8
    )
    return TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx
    )


def make_loss_fn(
    model,
    loss_name: str = "multiscale",
    weights: Sequence[float] = losses.DEFAULT_WEIGHTS,
    gamma: float = 4e-4,
    epsilon: float = 0.02,
    q: float = 0.4,
    decoupled_wd: bool = False,
) -> Callable:
    """(params, images(B,2,H,W,3), flows_gt) -> (loss, metrics).

    ``decoupled_wd``: report the weight-decay term in the loss value but
    exclude it from the gradient (the caller adds the analytically
    identical ``gamma * p`` per leaf instead — see make_train_step)."""

    if loss_name == "multiscale":
        criterion = functools.partial(losses.multiscale_loss, weights=weights)
    elif loss_name == "robust":
        criterion = functools.partial(
            losses.multirobust_loss, weights=weights, epsilon=epsilon, q=q
        )
    else:
        raise ValueError(f"loss must be 'multiscale' or 'robust': {loss_name!r}")

    def loss_fn(params, images, flows_gt):
        images_0 = images[:, 0].astype(model.dtype)
        images_1 = images[:, 1].astype(model.dtype)
        flows_final, pyramid = model.apply(
            {"params": params}, images_0, images_1
        )
        # losses in float32 regardless of the compute dtype (mixed
        # precision: bf16 activations, f32 loss/grads-accumulation)
        flows_final = flows_final.astype(jnp.float32)
        pyramid = [f.astype(jnp.float32) for f in pyramid]
        flows_gt = flows_gt.astype(jnp.float32)
        data_loss = criterion(flows_gt, pyramid)
        wd_params = (
            jax.lax.stop_gradient(params) if decoupled_wd else params
        )
        total = data_loss + gamma * losses.weight_decay(wd_params)
        metrics = {
            "loss": total,
            "data_loss": data_loss,
            "epe": losses.epe(flows_gt, flows_final),
        }
        return total, metrics

    return loss_fn


def make_train_step(
    model, donate: bool = True, mesh=None, **loss_kwargs
) -> Callable:
    """Jitted (state, images, flows_gt) -> (state, metrics).

    The weight-decay gradient is applied analytically (``gamma * p`` per
    leaf) rather than by differentiating the 110 per-tensor l2
    reductions — the same update (d/dp of gamma*sum(p^2)/2 is exactly
    gamma*p), minus ~1 ms/step of serialized scalar-reduction backward
    ops measured on TPU. The reported loss still includes the term.

    ``mesh``: when given, params and grads are pinned replicated over the
    mesh with sharding constraints. Without the pin, GSPMD propagates
    batch shardings into the tiny broadcast-shaped bias-grad
    accumulators (f32[1,1,1,C]) and then reshards them with
    "Involuntary full rematerialization" on (data x spatial) meshes —
    wasted collectives on a real pod (VERDICT r3 #2)."""
    gamma = loss_kwargs.get("gamma", 4e-4)
    loss_fn = make_loss_fn(model, decoupled_wd=True, **loss_kwargs)
    rep = (
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
        if mesh is not None
        else None
    )

    def train_step(state: TrainState, images, flows_gt):
        params = state.params
        if rep is not None:
            params = jax.lax.with_sharding_constraint(params, rep)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, metrics), grads = grad_fn(params, images, flows_gt)
        if rep is not None:
            grads = jax.lax.with_sharding_constraint(grads, rep)
        grads = jax.tree_util.tree_map(
            lambda g, p: g + gamma * p.astype(g.dtype), grads, state.params
        )
        state = state.apply_gradients(grads=grads)
        return state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(model, **loss_kwargs) -> Callable:
    """Jitted (state, images, flows_gt) -> metrics."""
    loss_fn = make_loss_fn(model, **loss_kwargs)

    def eval_step(state: TrainState, images, flows_gt):
        _, metrics = loss_fn(state.params, images, flows_gt)
        return metrics

    return jax.jit(eval_step)


def make_forward(model, with_pyramid: bool = True) -> Callable:
    """Jitted inference: (params, images_0, images_1) -> flow outputs."""

    def forward(params, images_0, images_1):
        return model.apply({"params": params}, images_0, images_1)

    return jax.jit(forward)
