#!/usr/bin/env python
"""Weak-scaling + collective-traffic report for the sharded trainer.

Runs the full sharded train step on 1/2/4/8 virtual CPU devices
(`--xla_force_host_platform_device_count`) with the per-device workload held
CONSTANT (weak scaling: Gaussians and image rows scale with the mesh),
measures step wall-clock, and parses the compiled HLO for the collective
operations GSPMD inserted (op counts + bytes moved per step).

CPU timings are NOT TPU timings — the point of this artifact is (a) the
collective schedule is real (same GSPMD/HLO structure a TPU mesh compiles
to), and (b) the step time scaling trend exposes any serialization bug in
the sharded path. Run with real chips for roofline numbers.

Usage:  python tools/scaling_report.py [--devices 1 2 4 8] [--md out.md]
"""

import argparse
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_collectives(hlo_text: str):
    """Count collective ops and estimate bytes from their output shapes.

    HLO line shape: `%name = f32[8192,3]{1,0} all-gather(...)` — dtype and
    shape come AFTER the `=`, followed by an optional layout annotation.
    """
    out = {}
    pat = re.compile(
        r"= (f32|s32|u32|bf16|pred)\[([\d,]*)\](?:\{[^}]*\})?\s+"
        r"(all-gather|all-reduce|reduce-scatter|collective-permute|"
        r"all-to-all)(?:-start)?\(")
    dsize = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "pred": 1}
    for m in pat.finditer(hlo_text):
        dtype, shape, op = m.group(1), m.group(2), m.group(3)
        n = 1
        for s in shape.split(","):
            if s:
                n *= int(s)
        cnt, byt = out.get(op, (0, 0))
        out[op] = (cnt + 1, byt + n * dsize[dtype])
    return out


def run_one(n_devices: int, base_gauss=4096, base_rows=4, fixed=False):
    """One scaling point. fixed=False: weak scaling (per-device workload
    constant, total = n_devices x base). fixed=True: the ICI-budget view —
    TOTAL workload constant (8x base), so the per-device collective bytes
    vs D measure how the communication term scales at a fixed scene."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bags_tpu.core.camera import CameraParams, CameraStatic
    from bags_tpu.dist.mesh import make_mesh
    from bags_tpu.dist.trainer import ShardedTrainer
    from bags_tpu.model.gaussians import create_from_points
    from bags_tpu.raster import RenderConfig
    from bags_tpu.train.config import CalibConfig, TrainConfig

    mesh = make_mesh(n_devices)
    scale = 8 if fixed else n_devices
    height = 16 * base_rows * scale
    width = 256
    static = CameraStatic(width=width, height=height)
    capacity = base_gauss * scale
    rng = np.random.default_rng(0)
    n_pts = capacity // 2
    pts = np.stack([rng.uniform(-1, 1, n_pts), rng.uniform(-1, 1, n_pts),
                    rng.uniform(4, 8, n_pts)], -1).astype(np.float32)
    cols = rng.uniform(0, 1, (n_pts, 3)).astype(np.float32)
    g, alive = create_from_points(pts, cols, capacity, sh_degree=2)
    cams = jax.tree_util.tree_map(
        lambda *x: jnp.stack(x),
        *[CameraParams.create(np.eye(3, dtype=np.float32),
                              np.zeros(3, np.float32), 0.8, 0.8)
          for _ in range(2)])
    cfg = TrainConfig(max_instances=16384 * scale, mesh=n_devices,
                      calib=CalibConfig(opt_cam=True))
    cfg.model.sh_degree = 2
    gt = jnp.full((2, 3, height, width), 0.5, jnp.float32)
    rcfg = RenderConfig(sh_degree=2, backend="jnp",
                        max_instances=cfg.max_instances, max_per_tile=1024)
    tr = ShardedTrainer(g, alive, cams, static, cfg, scene_extent=10.0,
                        gt_images=gt, rcfg=rcfg, mesh=mesh)

    # compile + collect HLO
    step = tr._train_step_fn()
    gt0 = tr._pad_gt(gt[0])
    lowered = step.lower(tr.state, gt0, jnp.asarray(0), tr.bg)
    hlo = lowered.compile().as_text()
    colls = parse_collectives(hlo)

    # timed steps: per-step medians with warmup discard (the r4 table's
    # efficiency column was oversubscription noise — 45/73/40% at 2/4/8;
    # median-of-k + IQR makes the noise visible instead of presented)
    import numpy as np
    warmup, reps = 3, 12
    times = []
    for i in range(warmup + reps):
        t0 = time.perf_counter()
        tr.run(iterations=1)
        jax.block_until_ready(tr.state.g.xyz)
        times.append(time.perf_counter() - t0)
    ts = np.asarray(sorted(times[warmup:]))
    dt = float(np.median(ts))
    iqr = float(ts[int(len(ts) * 0.75)] - ts[int(len(ts) * 0.25)])
    pixels = width * height
    return dict(n=n_devices, step_ms=dt * 1e3, iqr_ms=iqr * 1e3,
                pixels=pixels, pix_per_s=pixels / dt, collectives=colls)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--devices", nargs="+", type=int, default=[1, 2, 4, 8])
    p.add_argument("--md", default=None)
    p.add_argument("--fixed", action="store_true",
                   help="hold the TOTAL workload fixed across mesh sizes "
                        "(ICI-bytes budget view) instead of weak scaling")
    p.add_argument("--tpu", action="store_true",
                   help="run on the real TPU backend instead of forcing a "
                        "virtual CPU mesh (needs >= max(--devices) chips)")
    args = p.parse_args(argv)

    os.environ.setdefault(
        "XLA_FLAGS",
        f"--xla_force_host_platform_device_count={max(args.devices)}")
    os.environ.setdefault("BAGS_TPU_PALLAS_INTERPRET", "1")
    import jax
    if not args.tpu:
        # The image's experimental 'axon' TPU platform ignores JAX_PLATFORMS;
        # force CPU via jax.config so the virtual device count takes effect
        # (same trick as tests/conftest.py). Pass --tpu for real-chip runs.
        jax.config.update("jax_platforms", "cpu")

    rows = [run_one(n, fixed=args.fixed) for n in args.devices]
    base = rows[0]
    # Efficiency is only meaningful on real chips: a virtual CPU mesh runs
    # devices x base work on ONE host's fixed cores, so an "efficiency"
    # column there measures oversubscription, not the framework. On CPU,
    # report the measured step time + spread and the collective schedule.
    eff_name = ("strong-scaling eff." if args.fixed
                else "weak-scaling eff.") if args.tpu else None
    head = "| devices | pixels/step | step ms (median, IQR) | pix/s | "
    head += (f"{eff_name} | " if eff_name else "")
    head += "collectives (op: count, MB/step) |"
    lines = [head, "|---|---|---|---|" + ("--|" if eff_name else "") + "--|"]
    for r in rows:
        if args.fixed:
            eff = r["pix_per_s"] / (base["pix_per_s"] * r["n"])
        else:
            eff = (r["pix_per_s"] / r["n"]) / base["pix_per_s"]
        cols = "; ".join(
            f"{op}: {cnt}x, {byt / 1e6:.2f}"
            for op, (cnt, byt) in sorted(r["collectives"].items()))
        cells = [f"{r['n']}", f"{r['pixels']}",
                 f"{r['step_ms']:.1f} ± {r['iqr_ms']:.1f}",
                 f"{r['pix_per_s'] / 1e6:.2f}M"]
        if eff_name:
            cells.append(f"{eff * 100:.0f}%")
        cells.append(cols)
        lines.append("| " + " | ".join(cells) + " |")
    table = "\n".join(lines)
    if not args.tpu:
        table += (
            "\n\nNote: virtual CPU mesh — all devices share one host's "
            "cores (total compute grows with the mesh on fixed silicon), "
            "so no efficiency column is printed: the CPU step-time trend "
            "only exposes serialization bugs. The collective schedule "
            "(op counts, bytes) is the real GSPMD output a TPU mesh "
            "compiles to; tests/test_overlap.py asserts its async overlap "
            "on the chipless-compiled TPU schedule.")
    print(table)
    if args.md:
        with open(args.md, "w") as f:
            f.write(table + "\n")


if __name__ == "__main__":
    main()
