"""Multi-host (multi-process) training bring-up.

The reference is strictly single-process (SURVEY.md §2.5); this framework
scopes DCN/multi-process via jax.distributed.initialize (SURVEY.md §5
distributed-communication row). Verified here without real hardware by
launching two OS processes with 2 virtual CPU devices each, training the
same deterministic global batch, and asserting the parameter updates match
a single-process run (gradient all-reduce crosses the process boundary).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

WORKER = Path(__file__).parent / "_multihost_worker.py"
REPO = str(Path(__file__).parent.parent)


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(n, outfile, tmp_path, spatial=1):
    port = _free_port()
    env = dict(os.environ, PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(pid), str(n), str(port),
             outfile, str(spatial)],
            cwd=tmp_path,
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for pid in range(n)
    ]
    logs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"


@pytest.mark.slow
def test_two_process_updates_match_single_process(tmp_path):
    single = str(tmp_path / "params_1.msgpack")
    multi = str(tmp_path / "params_2.msgpack")
    _run_workers(1, single, tmp_path)
    _run_workers(2, multi, tmp_path)

    from flax import serialization

    p1 = serialization.msgpack_restore(Path(single).read_bytes())
    p2 = serialization.msgpack_restore(Path(multi).read_bytes())
    flat1 = jax_flatten(p1)
    flat2 = jax_flatten(p2)
    assert flat1.keys() == flat2.keys()
    for k in flat1:
        np.testing.assert_allclose(
            flat2[k], flat1[k], rtol=2e-4, atol=2e-6, err_msg=k
        )


@pytest.mark.slow
def test_two_process_spatial_mesh_matches_single_process(tmp_path):
    """DCN + shard_map composition (VERDICT r3 #8): 2 processes x 2
    virtual devices on a (data 2 x spatial 2) mesh — images H-sharded,
    cost volume through the explicit shard_map halo-exchange path, grads
    psum'd over the process boundary — must produce the same parameter
    updates as a single-process run over the SAME spatial formulation
    (1 process x 2 devices, data 1 x spatial 2). Both runs use the
    shard_map cost volume: its hpad tap order differs from the unsharded
    op at the f32-noise level, and Adam's normalized updates amplify
    that to ~1e-3 after a few steps — sharded-vs-unsharded VALUE
    equivalence is asserted at the op/model level in test_spatial.py;
    this test isolates the process-boundary (DCN) composition."""
    single = str(tmp_path / "params_sp1.msgpack")
    multi = str(tmp_path / "params_sp2.msgpack")
    _run_workers(1, single, tmp_path, spatial=2)
    _run_workers(2, multi, tmp_path, spatial=2)

    from flax import serialization

    p1 = serialization.msgpack_restore(Path(single).read_bytes())
    p2 = serialization.msgpack_restore(Path(multi).read_bytes())
    flat1 = jax_flatten(p1)
    flat2 = jax_flatten(p2)
    assert flat1.keys() == flat2.keys()
    for k in flat1:
        np.testing.assert_allclose(
            flat2[k], flat1[k], rtol=2e-4, atol=2e-6, err_msg=k
        )


def jax_flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(jax_flatten(v, prefix + "/" + str(k)))
    else:
        out[prefix] = np.asarray(tree)
    return out
