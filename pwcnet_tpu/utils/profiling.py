"""Profiling and timing harnesses.

The reference's only performance tooling is a 1000-iteration wall-clock
loop (test.py:48-53). This module provides:

- `device_timeit`: trustworthy device timing — iterations are chained
  inside one jitted lax.scan (XLA cannot elide or overlap them) and the
  scalar result is fetched, which is the only reliable synchronization on
  remote-tunneled TPU runtimes where `block_until_ready` can return early
  and repeated identical dispatches may be memoized;
- `trace`: context manager around jax.profiler for capturing XLA/TPU
  traces viewable in TensorBoard/Perfetto;
- `op_profile`: per-op device-time table straight from a captured trace's
  xplane proto (no TensorBoard needed) — the tool behind the per-op
  breakdown in docs/DESIGN.md;
- `flops_estimate`: XLA cost analysis (FLOPs / bytes) of a jitted fn.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["device_timeit", "trace", "op_profile", "flops_estimate"]


def device_timeit(
    fn: Callable,
    *args,
    iters: int = 50,
    warmup: bool = True,
) -> float:
    """Mean seconds per call of ``fn(*args)`` on device.

    ``fn`` must return an array (or pytree with a first leaf) whose value
    depends on its first argument; the first argument must be a float
    array. Each scan iteration perturbs that argument by a tiny
    data-dependent carry so XLA executes all ``iters`` sequentially.
    """
    first = args[0]
    dtype = first.dtype

    @jax.jit
    def run(*a):
        def body(carry, _):
            out = fn(a[0] + carry, *a[1:])
            leaf = jax.tree_util.tree_leaves(out)[0]
            return (leaf.mean() * 1e-12).astype(dtype), ()

        carry, _ = lax.scan(
            body, jnp.zeros((), dtype), None, length=iters
        )
        return carry

    if warmup:
        float(run(*args))
    start = time.perf_counter()
    float(run(*args))  # value fetch == device sync
    return (time.perf_counter() - start) / iters


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace"):
    """Capture a jax.profiler trace of the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def op_profile(fn: Callable, *args, iters: int = 3, logdir: str | None = None):
    """Per-op device-time table for ``jit(fn)(*args)``.

    Captures a jax.profiler trace, parses the xplane proto directly, and
    aggregates the synchronous op timeline of the first device plane
    (TPU when present, host otherwise). Returns rows sorted by total
    time: ``{"name", "ms_per_iter", "count"}``. The reference has no
    analogue (its only tool is the --time wall-clock loop, test.py:48-53).
    """
    import tempfile
    from collections import defaultdict
    from pathlib import Path

    logdir = logdir or tempfile.mkdtemp(prefix="pwc-op-profile-")
    jitted = jax.jit(fn)
    first = jax.tree_util.tree_leaves(jitted(*args))[0]
    float(jnp.mean(first.astype(jnp.float32)))  # compile + sync (fetch)
    jax.profiler.start_trace(logdir)
    for _ in range(iters):
        out = jitted(*args)
    first = jax.tree_util.tree_leaves(out)[0]
    float(jnp.mean(first.astype(jnp.float32)))
    jax.profiler.stop_trace()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    agg: dict = defaultdict(lambda: [0.0, 0])
    for pb in Path(logdir).rglob("*.xplane.pb"):
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(pb.read_bytes())
        device = [p for p in xs.planes if p.name.startswith("/device:")]
        planes = device or [p for p in xs.planes if p.lines]
        for plane in planes[:1]:
            md = plane.event_metadata
            lines = [
                ln
                for ln in plane.lines
                if ln.name == "XLA Ops" or not device
            ] or plane.lines
            for line in lines:
                for ev in line.events:
                    name = md[ev.metadata_id].name
                    agg[name][0] += ev.duration_ps / 1e9
                    agg[name][1] += 1
    rows = [
        {"name": k, "ms_per_iter": v[0] / iters, "count": v[1]}
        for k, v in agg.items()
    ]
    rows.sort(key=lambda r: -r["ms_per_iter"])
    return rows


def flops_estimate(fn: Callable, *args) -> dict:
    """XLA cost analysis of ``jit(fn)(*args)``: flops, bytes accessed."""
    compiled = jax.jit(fn).lower(*args).compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    return {
        "flops": analysis.get("flops"),
        "bytes_accessed": analysis.get("bytes accessed"),
    }
