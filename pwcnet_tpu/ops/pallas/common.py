"""Shared constants/helpers for the Pallas TPU kernel families.

One definition of the per-kernel VMEM budget keeps the planners of
composed kernels in sync: ``warped_cost_volume`` falls back to
``cost_volume_pallas``, and the fused pyramid/estimator kernels fall
back to XLA — a budget retune (e.g. for a different TPU generation) must
move all of them together or one family plans against stale limits.
"""

from __future__ import annotations

import jax

# Per-pallas_call VMEM envelope the planners size tiles against. v5e has
# 128 MiB VMEM per core; 12 MiB leaves room for Pallas double-buffering
# of the tiled blocks, Mosaic scoped-vmem temporaries (see
# cost_volume._bwd_temp_bytes — the measured dominant term for the
# backward kernels), and XLA's own concurrent buffers.
VMEM_BUDGET = 12 * 1024 * 1024


def round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def resolve_interpret(interpret: bool) -> bool:
    """No Mosaic on CPU — run kernels in interpreter mode there so tests
    exercise the same code path the TPU compiles."""
    return interpret or jax.default_backend() == "cpu"
