"""Local cost-volume correlation (max displacement d), TPU-first.

Semantics (identical to the reference's pad/multiply/crop construction,
/root/reference/modules.py:158-204):

    cv[b, y, x, (v+d)*(2d+1) + (h+d)] =
        leaky_relu( mean_c f0[b, y, x, c] * f1[b, y+v, x+h, c], 0.1 )

with ``f1`` treated as zero outside its bounds, ``v``/``h`` in [-d, d]
(vertical-major channel order) and the mean taken over the true channel
count (zero-padded products still divide by C). Note the reference applies
LeakyReLU(0.1) to the cost volume itself (modules.py:203).

TPU design: instead of 81 pad+crop+reduce graphs over HBM, we pad ``f1``
once and take 81 *static* slices of the padded array; XLA fuses the
multiply-reduce chain into a small number of VMEM-resident loops. A fully
fused single-pass Pallas kernel (shared f0/f1 tiles in VMEM across all 81
taps) lives in `pwcnet_tpu.ops.pallas.cost_volume`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["cost_volume"]


def cost_volume(
    f0: jnp.ndarray,
    f1: jnp.ndarray,
    search_range: int = 4,
    activate: bool = True,
) -> jnp.ndarray:
    """Correlation volume of ``f0`` against shifted ``f1`` (both NHWC).

    Returns (B, H, W, (2*search_range+1)**2) with vertical-major taps.
    """
    b, h, w, c = f0.shape
    d = int(search_range)
    f1p = jnp.pad(f1, ((0, 0), (d, d), (d, d), (0, 0)))
    inv_c = jnp.asarray(1.0 / c, dtype=f0.dtype)

    costs = []
    for v in range(-d, d + 1):
        for u in range(-d, d + 1):
            win = jax.lax.slice(
                f1p, (0, v + d, u + d, 0), (b, v + d + h, u + d + w, c)
            )
            costs.append(jnp.sum(f0 * win, axis=3) * inv_c)
    cv = jnp.stack(costs, axis=3)
    if activate:
        cv = jax.nn.leaky_relu(cv, 0.1)
    return cv
