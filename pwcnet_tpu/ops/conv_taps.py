"""3x3 SAME convolution as nine shifted [B*H*W, Cin] @ [Cin, Cout] matmuls.

Why this exists: XLA lowers every NHWC conv at PWC-Net's estimator shapes
to an MXU pass whose cost is set by the 128-lane padding of the channel
dims — a 32->2 "flow head" conv (reference modules.py:278-280, the final
`conv2d_5`/`conv2d_6` of each estimator/context block) costs exactly as
much as a 128->128 conv (measured 0.49 ms at b8 112x256 bf16, ~0.5% MXU
utilization). Expressing the same conv as nine tap-shifted full-pixel
matmuls puts all B*H*W pixels in the matmul M dimension instead; at
Cout=2 that measured 0.21 ms for the same op in isolation (round-4
profile).

**Measured NEGATIVE result e2e — kept unwired.** Substituting this for
the estimator/context flow-head convs regressed the full model on TPU
(round-4 A/B, bench.py, warm cache, same session): serving 448x1024 bf16
b4 539 -> 491 pairs/s, b8 531 -> 416; train 384x448 b4 250 -> 242. The
isolated win does not survive composition: XLA fuses the original
flow-head conv into the surrounding elementwise/concat chain, while the
taps formulation materializes the padded operand plus nine slice reads
as real HBM traffic the fusion previously avoided. Same lesson as the
fused estimator chain (docs/DESIGN.md round-3): at these shapes the
graph-level fusion XLA already performs beats locally-optimal
restructuring. Keep the XLA conv in the model; this op stays as the
documented record with a bit-parity test (tests/test_ops.py).

Numerics: each tap is a jnp.dot with f32 accumulation
(preferred_element_type), taps summed in f32, cast back once —
numerically equivalent to lax.conv within the test tolerances
(tests/test_ops.py::TestConv3x3Taps: atol/rtol 1e-5 at f32, 5e-2 at
bf16; exact bit-equality is not asserted — summation order differs
from XLA's conv lowering).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def conv3x3_taps(
    x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray | None = None
) -> jnp.ndarray:
    """3x3 stride-1 SAME conv of NHWC ``x`` with HWIO ``kernel``.

    Same math as ``lax.conv_general_dilated(x, kernel, (1, 1), "SAME")``
    (+ bias), restructured as 9 shifted matmuls for tiny output-channel
    heads — see module docstring.
    """
    b, h, w, cin = x.shape
    kh, kw, kcin, cout = kernel.shape
    assert (kh, kw) == (3, 3) and kcin == cin, (kernel.shape, x.shape)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for dy in range(3):
        for dx in range(3):
            win = lax.dynamic_slice(xp, (0, dy, dx, 0), (b, h, w, cin))
            tap = jnp.dot(
                win.reshape(b * h * w, cin),
                kernel[dy, dx],
                preferred_element_type=jnp.float32,
            )
            acc = tap if acc is None else acc + tap
    y = acc.reshape(b, h, w, cout)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)
