"""Optical-flow training losses and metrics (reference losses.py).

Conventions preserved from the reference:

- `l1_loss`/`l2_loss` reduce per-pixel flow-vector norms by *sum over
  pixels*, mean over batch (losses.py:4-8) — so the loss scales with crop
  area, exactly as upstream.
- `epe` is the mean per-pixel L2 norm on *unscaled* full-resolution flow
  (losses.py:11-13) — the headline metric.
- The pyramid losses scale ground truth by 1/20 (PWC-Net paper §4) and
  downsample it to each level with TF1 nearest-neighbor resize *without*
  magnitude rescale (losses.py:20,27).
- `multirobust_loss` implements the intended per-level robust penalty
  ``weight * (L1 + epsilon)**q``; the reference's version crashes on an
  undefined variable (losses.py:45, SURVEY.md §2.4) — fixed here.
- `weight_decay` is ``sum_v ||v||^2 / 2`` over all parameters (TF
  ``tf.nn.l2_loss`` summed over vars, train.py:74), biases included.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from pwcnet_tpu.ops.resize import resize_nearest

DEFAULT_WEIGHTS = (0.32, 0.08, 0.02, 0.01, 0.005)


def l1_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.sum(jnp.sum(jnp.abs(x - y), axis=3), axis=(1, 2)))


def l2_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum((x - y) ** 2, axis=3))
    return jnp.mean(jnp.sum(norm, axis=(1, 2)))


def epe(flows_gt: jnp.ndarray, flows: jnp.ndarray) -> jnp.ndarray:
    """End-point error: mean per-pixel L2 distance (unscaled flows)."""
    return jnp.mean(jnp.sqrt(jnp.sum((flows_gt - flows) ** 2, axis=3)))


def multiscale_loss(
    flows_gt: jnp.ndarray,
    flows_pyramid: Sequence[jnp.ndarray],
    weights: Sequence[float] = DEFAULT_WEIGHTS,
) -> jnp.ndarray:
    """Weighted multi-level L2 loss on 1/20-scaled ground truth."""
    gt_scaled = flows_gt / 20.0
    total = jnp.asarray(0.0, dtype=flows_gt.dtype)
    for weight, flows in zip(weights, flows_pyramid):
        h, w = flows.shape[1], flows.shape[2]
        gt_down = resize_nearest(gt_scaled, (h, w))
        total = total + weight * l2_loss(gt_down, flows)
    return total


def multirobust_loss(
    flows_gt: jnp.ndarray,
    flows_pyramid: Sequence[jnp.ndarray],
    weights: Sequence[float] = DEFAULT_WEIGHTS,
    epsilon: float = 0.01,
    q: float = 0.4,
) -> jnp.ndarray:
    """Robust multi-level loss: sum_l weight_l * (L1_l + eps)**q."""
    gt_scaled = flows_gt / 20.0
    total = jnp.asarray(0.0, dtype=flows_gt.dtype)
    for weight, flows in zip(weights, flows_pyramid):
        h, w = flows.shape[1], flows.shape[2]
        gt_down = resize_nearest(gt_scaled, (h, w))
        level = l1_loss(gt_down, flows)
        total = total + weight * (level + epsilon) ** q
    return total


def weight_decay(params) -> jnp.ndarray:
    """0.5 * sum of squared parameter values over the whole pytree
    (TF ``tf.nn.l2_loss`` semantics, reference train.py:74-75).

    Computed as one reduction over the concatenated raveled leaves: the
    per-leaf formulation compiled to ~110 serialized scalar reductions on
    TPU (~0.1 ms each of pure dispatch overhead in the train step)."""
    leaves = jax.tree_util.tree_leaves(params)
    flat = jnp.concatenate([p.ravel().astype(jnp.float32) for p in leaves])
    return 0.5 * jnp.sum(jnp.square(flat))
