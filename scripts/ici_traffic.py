#!/usr/bin/env python
"""ICI-traffic census of the (data x spatial) mesh training step.

One physical chip is available in this environment, so the honest
multi-chip performance statement is analytic: count every collective's
on-wire bytes in the *compiled* SPMD HLO of the exact train step the
driver dry-runs (`__graft_entry__.dryrun_multichip`), verify how each
category scales with the frame size, and predict weak-scaling
efficiency for v5e-8 / v5e-16 at the production shape (VERDICT r4 #7).
Results are published in docs/DESIGN.md ("ICI traffic & predicted
weak scaling").

Method:

- compile the mesh train step on N virtual CPU devices
  (`--xla_force_host_platform_device_count`, the same mechanism the
  driver's dryrun uses) at one or more small frame sizes;
- walk the optimized HLO for `all-reduce` / `all-gather` /
  `collective-permute` / `reduce-scatter` / `all-to-all` (sync and
  async `-start` forms), summing payload bytes and converting to
  on-wire bytes per chip with the standard ring/bucket costs:
  all-reduce 2(G-1)/G x payload, all-gather / reduce-scatter
  (G-1)/G x output/input, collective-permute 1 x payload
  (G = group size parsed from `replica_groups`);
- bucket by purpose: gradient psum (all-reduce over the data axis with
  >=1 MB payload), halo exchange (collective-permute), spatial
  all-gathers (the warped-CV wrapper gathers frame-1 rows across
  spatial shards), scalar/metric reductions (small all-reduces);
- scale to a target shape/batch with the categories' closed-form laws
  (grads: constant; halos: ∝ per-chip batch x W — the halo is a fixed
  row count per op; all-gathers: ∝ per-chip batch x H x W / spatial)
  and compare against the measured single-chip step time.

Collectives ride one torus axis per mesh axis on a v5e pod slice;
the per-axis ICI budget used below is 45 GB/s per link per direction
(public v5e spec: 1600 Gbps aggregate per chip over 4 links), ring
algorithms using both directions of one axis = 90 GB/s effective.

Run (CPU, no TPU needed):

    python scripts/ici_traffic.py                 # 8 devices, 64 + 128
    python scripts/ici_traffic.py --devices 16 --spatial 2
"""

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "f8e4m3fn": 1, "f8e5m2": 1,
    "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4,
    "s64": 8, "u64": 8, "f64": 8,
}

# one HLO instruction: "%name = <shape(s)> <op>(...)", with shape either
# a single "dtype[dims]{layout}" or a tuple "(dtype[..], dtype[..])"
_INSTR = re.compile(
    r"=\s*(\([^)]*\)|[a-z0-9_]+\[[^\]]*\](?:\{[^}]*\})?)\s+"
    r"(all-reduce|all-gather|collective-permute|reduce-scatter|all-to-all)"
    r"(-start)?\("
)
_SHAPE = re.compile(r"([a-z0-9_]+)\[([0-9,]*)\]")
_GROUPS_EXPLICIT = re.compile(r"replica_groups=\{\{([0-9,]+)\}")
_GROUPS_IOTA = re.compile(r"replica_groups=\[(\d+),(\d+)\]<=")


def _shape_bytes(shape_str: str) -> int:
    total = 0
    for dtype, dims in _SHAPE.findall(shape_str):
        if dtype not in DTYPE_BYTES:
            continue  # token or opaque types carry no payload
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dtype]
    return total


def _group_size(line: str, n_devices: int) -> int:
    m = _GROUPS_EXPLICIT.search(line)
    if m:
        return len(m.group(1).split(","))
    m = _GROUPS_IOTA.search(line)
    if m:
        # [num_groups, group_size]<=[N]
        return int(m.group(2))
    return n_devices


def census(hlo_text: str, n_devices: int) -> list:
    """All collectives in the module: (op, payload_bytes, wire_bytes, G)."""
    out = []
    for line in hlo_text.splitlines():
        m = _INSTR.search(line)
        if not m:
            continue
        shape_str, op = m.group(1), m.group(2)
        payload = _shape_bytes(shape_str)
        g = _group_size(line, n_devices)
        if g <= 1 or payload == 0:
            continue
        if op == "all-reduce":
            wire = 2 * (g - 1) / g * payload
        elif op in ("all-gather", "reduce-scatter", "all-to-all"):
            # payload here is the large (gathered/input) buffer
            wire = (g - 1) / g * payload
        else:  # collective-permute: each chip sends its shard once
            wire = payload
        out.append({"op": op, "payload": payload, "wire": wire, "group": g})
    return out


BUCKETS = ("grad_psum_data", "grad_psum_spatial", "grad_psum_global",
           "halo_permute", "all_gather", "scalar_psum", "other")


def bucket(colls: list, data: int, spatial: int) -> dict:
    """Bucket collectives by purpose.

    Weight gradients reduce in two hops on a (data x spatial) mesh: the
    spatial shards each hold a partial dk over their H rows (all-reduce
    over the spatial axis), and the data shards hold per-subbatch sums
    (all-reduce over the data axis) — XLA emits these as separate
    fused-tuple all-reduces, distinguished here by group size. Small
    (<1 MB) all-reduces are loss/metric scalars and GSPMD bookkeeping.
    """
    b = {k: 0.0 for k in BUCKETS}
    b["counts"] = {k: 0 for k in BUCKETS}
    for c in colls:
        if c["op"] == "all-reduce":
            if c["payload"] < 1 << 20:
                key = "scalar_psum"
            elif c["group"] == data:
                key = "grad_psum_data"
            elif c["group"] == spatial:
                key = "grad_psum_spatial"
            else:
                key = "grad_psum_global"
        elif c["op"] == "collective-permute":
            key = "halo_permute"
        elif c["op"] == "all-gather":
            key = "all_gather"
        else:
            key = "other"
        b[key] += c["wire"]
        b["counts"][key] += 1
    return b


def compile_step(n_devices: int, spatial: int, h: int, w: int):
    """Build and compile the dryrun's exact mesh train step; return HLO."""
    import numpy as np
    import jax

    from pwcnet_tpu.models import PWCDCNet
    from pwcnet_tpu.parallel import (
        batch_sharding,
        make_mesh,
        make_spatial_cost_volume,
        make_spatial_guard,
        make_spatial_pyramid_level,
        make_spatial_warped_cv,
        replicate,
    )
    from pwcnet_tpu.train_lib import create_train_state, make_train_step

    devices = jax.devices()[:n_devices]
    mesh = make_mesh(devices, data=n_devices // spatial, spatial=spatial)

    cv_fn = warp_cv_fn = plevel_fn = guard_fn = None
    fused_levels = 0
    if spatial > 1:
        cv_fn = make_spatial_cost_volume(mesh, use_pallas=True)
        warp_cv_fn = make_spatial_warped_cv(mesh, use_pallas=True)
        plevel_fn = make_spatial_pyramid_level(mesh)
        guard_fn = make_spatial_guard(mesh)
        fused_levels = 2
    model = PWCDCNet(
        cost_volume_fn=cv_fn,
        warp_cv_fn=warp_cv_fn,
        pyramid_level_fn=plevel_fn,
        spatial_guard_fn=guard_fn,
        fused_pyramid_levels=fused_levels,
    )
    batch = mesh.shape["data"]
    state = create_train_state(
        model, jax.random.PRNGKey(0), (1, h, w, 3), learning_rate=1e-4
    )
    state = replicate(state, mesh)
    step = make_train_step(model, donate=False, mesh=mesh)
    rng = np.random.default_rng(0)
    images = jax.device_put(
        rng.random((batch, 2, h, w, 3)).astype(np.float32),
        batch_sharding(mesh, spatial_dim=2),
    )
    flows = jax.device_put(
        rng.standard_normal((batch, h, w, 2)).astype(np.float32),
        batch_sharding(mesh, spatial_dim=1),
    )
    compiled = step.lower(state, images, flows).compile()
    return compiled.as_text()


def predict(buckets: dict, meas_w: int, meas_data: int, meas_spatial: int,
            data: int, spatial: int, target_w: int, target_b_per_chip: int,
            t_step_ms: float, axis_bw: float) -> dict:
    """Closed-form scale-up of the measured per-chip wire bytes.

    The census compiles at 1 sample/chip on a (meas_data x meas_spatial)
    mesh; scaling laws per category:

    - halo exchange: each op moves a fixed halo row count x W x C per
      sample, so bytes scale with per-chip batch x W and are independent
      of both H (it only changes rows *per shard*) and the axis sizes
      (each shard talks to its neighbors). Zero when spatial == 1.
    - spatial all-gathers (warped-CV frame-1 rows): ∝ per-chip batch x
      H x W per level; sub-MB at the census shapes, kept with the same
      batch x W x (H growth folded into W ratio squared is NOT applied —
      see the scaling check: the tiny-level guard moves levels in and
      out of this bucket, so we take the conservative batch x frame-area
      growth from the larger census shape).
    - gradient psum over the data axis: the full parameter tree, payload
      constant; wire = 2(D-1)/D x payload (bidirectional ring).
    - dk partial-sums over the spatial axis: only params whose convs ran
      spatially sharded reduce here, and at production frames the
      tiny-level guard unshards almost nothing — so we bound it by the
      FULL tree: wire = 2(S-1)/S x payload. Zero when spatial == 1.
    """
    halo = (buckets["halo_permute"] * target_b_per_chip
            * (target_w / meas_w) if spatial > 1 else 0.0)
    ag = (buckets["all_gather"] * target_b_per_chip
          * (target_w / meas_w) ** 2 if spatial > 1 else 0.0)
    payload_full = buckets["grad_psum_data"] / (
        2 * (meas_data - 1) / meas_data
    )
    grads = payload_full * 2 * (data - 1) / data
    if spatial > 1:
        grads += payload_full * 2 * (spatial - 1) / spatial
    t_ici_ms = (halo + ag + grads) / axis_bw * 1e3
    # worst case: nothing overlaps; best case: grad psum hides under bwd
    eff_no_overlap = t_step_ms / (t_step_ms + t_ici_ms)
    t_ici_overlap_ms = (halo + ag) / axis_bw * 1e3
    eff_overlap = t_step_ms / (t_step_ms + t_ici_overlap_ms)
    return {
        "halo_bytes": halo, "all_gather_bytes": ag, "grad_bytes": grads,
        "t_ici_ms": t_ici_ms, "t_ici_overlap_ms": t_ici_overlap_ms,
        "efficiency_no_overlap": eff_no_overlap,
        "efficiency_grad_overlap": eff_overlap,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--spatial", type=int, default=2)
    ap.add_argument("--shapes", type=str, default="64,128",
                    help="comma-separated square frame sizes to compile")
    ap.add_argument("--target", type=str, default="384x448",
                    help="production frame HxW for the prediction")
    ap.add_argument("--target-batch", type=int, default=8,
                    help="per-chip batch at the target")
    ap.add_argument("--predict-meshes", type=str,
                    default="8x1,4x2,16x1,8x2",
                    help="comma-separated data x spatial meshes to "
                    "predict (v5e-8: 8x1/4x2; v5e-16: 16x1/8x2)")
    ap.add_argument("--t-step-ms", type=float, default=23.79,
                    help="measured single-chip step time at the target "
                    "(PARITY §6: 384x448 b8 bf16 = 23.79 ms)")
    ap.add_argument("--axis-bw", type=float, default=90e9,
                    help="effective ICI bytes/s per mesh axis (v5e: two "
                    "45 GB/s directions of one torus axis)")
    ap.add_argument("--json", action="store_true",
                    help="emit a single JSON line instead of the table")
    args = ap.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    th, tw = (int(x) for x in args.target.split("x"))
    shapes = [int(s) for s in args.shapes.split(",")]
    results = {}
    for s in shapes:
        hlo = compile_step(args.devices, args.spatial, s, s)
        colls = census(hlo, args.devices)
        results[s] = bucket(colls, args.devices // args.spatial,
                            args.spatial)

    out = {"devices": args.devices, "spatial": args.spatial,
           "per_shape": {}, "prediction": {}}
    for s, b in results.items():
        out["per_shape"][s] = {
            k: (v if k == "counts" else round(v))
            for k, v in b.items()
        }
    largest = max(shapes)
    meshes = [
        tuple(int(x) for x in m.split("x"))
        for m in args.predict_meshes.split(",")
    ]
    preds = {
        f"{d}x{s}": predict(
            results[largest], largest, args.devices // args.spatial,
            args.spatial, d, s, tw, args.target_batch, args.t_step_ms,
            args.axis_bw,
        )
        for d, s in meshes
    }
    out["prediction"] = {
        "target": f"{th}x{tw} b{args.target_batch}/chip",
        "meshes": {
            k: {kk: round(vv, 4) if "eff" in kk else round(vv, 3)
                for kk, vv in p.items()}
            for k, p in preds.items()
        },
    }

    if args.json:
        print(json.dumps(out))
        return
    print(f"mesh: data {args.devices // args.spatial} x spatial "
          f"{args.spatial} ({args.devices} virtual devices)")
    for s, b in results.items():
        c = b["counts"]
        print(f"\n== frame {s}x{s}, 1 sample/chip ==")
        for key in BUCKETS:
            print(f"  {key:17s}: {c[key]:4d} ops, "
                  f"{b[key] / 1e6:9.3f} MB wire/chip/step")
    # scaling check across shapes (halo ∝ W, all-gather ∝ H*W)
    if len(shapes) >= 2:
        s0, s1 = shapes[0], shapes[-1]
        h0, h1 = results[s0]["halo_permute"], results[s1]["halo_permute"]
        a0, a1 = results[s0]["all_gather"], results[s1]["all_gather"]
        print(f"\nscaling check {s0} -> {s1} (x{s1 / s0:.0f} frame):")
        if h0:
            print(f"  halo bytes   x{h1 / h0:5.2f}   (law: ∝W predicts "
                  f"x{s1 / s0:.2f}; excess = levels newly past the "
                  "tiny-level unshard guard)")
        if a0:
            print(f"  gather bytes x{a1 / a0:5.2f}   (per-level law ∝H·W; "
                  "the guard moves levels between the gather and "
                  "replicated paths as the frame grows, so the bucket "
                  "total is not a clean power law — it is sub-MB either "
                  "way)")
    print(f"\n== predictions @ {th}x{tw} b{args.target_batch}/chip, "
          f"axis BW {args.axis_bw / 1e9:.0f} GB/s, t_step "
          f"{args.t_step_ms:.2f} ms ==")
    for name, pred in preds.items():
        d, s = name.split("x")
        print(f"  data {d} x spatial {s}: halo "
              f"{pred['halo_bytes'] / 1e6:6.1f} MB + gathers "
              f"{pred['all_gather_bytes'] / 1e6:5.1f} MB + grads "
              f"{pred['grad_bytes'] / 1e6:5.1f} MB /chip/step -> t_ICI "
              f"{pred['t_ici_ms']:5.2f} ms; efficiency "
              f"{pred['efficiency_no_overlap']:.1%} (no overlap) / "
              f"{pred['efficiency_grad_overlap']:.1%} (grad psum "
              "overlapped)")


if __name__ == "__main__":
    main()
