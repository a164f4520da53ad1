"""Learning-rate schedules.

The reference trains with Adam at lr=1e-4 under a piecewise-constant
halving schedule with boundaries [200k, 250k, 300k, 350k, 400k]
(train.py:83-85; the reference writes the last boundary as 4,000,000 — an
evident typo for 400,000 that we fix while keeping the same flag surface).
"""

from __future__ import annotations

from typing import Sequence

import optax

DEFAULT_BOUNDARIES = (200_000, 250_000, 300_000, 350_000, 400_000)

__all__ = ["piecewise_halving", "make_lr", "DEFAULT_BOUNDARIES"]


def piecewise_halving(
    base_lr: float, boundaries: Sequence[int] = DEFAULT_BOUNDARIES
):
    """lr / 2**i after the i-th boundary step."""
    return optax.piecewise_constant_schedule(
        init_value=base_lr,
        boundaries_and_scales={int(b): 0.5 for b in boundaries},
    )


def make_lr(base_lr: float, scheduling: bool = True):
    if scheduling:
        return piecewise_halving(base_lr)
    return base_lr
