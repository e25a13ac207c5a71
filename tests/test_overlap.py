"""Collective/compute overlap evidence from the compiled TPU schedule
(VERDICT r4 #3a).

The sharded step's scaling story rests on its collectives hiding under
compute. This test produces the artifact: it AOT-compiles the sharded
render+grad step against a CHIPLESS v5e:2x4 TPU topology (libtpu's AOT
compiler — no hardware needed) and asserts, on the final scheduled HLO
module:

  * the Gaussian-packet all-gathers are issued EARLY: compute fusions are
    scheduled between each gather's issue point and its first consumer
    (TPU collectives execute on dedicated async queues; the scheduler's
    issue-to-consume distance is the hidden latency), and XLA tagged them
    `async_collective_name=all-gather-start` (async-capable);
  * the backward's halo-exchange ppermutes appear as EXPLICIT
    collective-permute-start/done pairs with compute scheduled between
    start and done.

tools/scaling_report.py carries the wall-clock side; SCALING.md the
byte-budget analysis.
"""

import re

import numpy as np
import pytest


def _topology():
    try:
        import jax
        from jax.experimental import topologies
        return topologies.get_topology_desc(platform="tpu",
                                            topology_name="v5e:2x4x1")
    except Exception:
        return None


_TOPO = _topology()


def _entry_instructions(txt):
    m = re.search(r"\nENTRY [^\{]+\{\n(.*?)\n\}", txt, re.S)
    assert m, "no ENTRY computation in compiled HLO"
    return [l.strip() for l in m.group(1).split("\n")
            if l.strip().startswith(("%", "ROOT"))]


def _first_use(lines, name, start):
    pat = re.compile(r"%" + re.escape(name) + r"[,)\s]")
    for j in range(start + 1, len(lines)):
        if pat.search(lines[j]):
            return j
    return None


@pytest.mark.skipif(_TOPO is None,
                    reason="libtpu AOT topology compiler unavailable")
def test_sharded_step_schedule_overlaps_collectives():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from bags_tpu.core.camera import (CameraParams, CameraStatic,
                                      GlobalAlignment)
    from bags_tpu.dist.sharded import sharded_render_loss
    from bags_tpu.model.gaussians import Gaussians
    from bags_tpu.raster import RenderConfig

    mesh = Mesh(np.array(_TOPO.devices).reshape(8), ("dev",))
    wh, n = 256, 4096
    static = CameraStatic(width=wh, height=wh)
    rcfg = RenderConfig(sh_degree=2, backend="jnp", max_instances=2 ** 16,
                        max_per_tile=2048)
    rep = NamedSharding(mesh, P())
    row = NamedSharding(mesh, P("dev"))

    def sd(shape, dtype=jnp.float32, sh=rep):
        return jax.ShapeDtypeStruct(shape, dtype, sharding=sh)

    g = Gaussians(xyz=sd((n, 3), sh=row), sh_dc=sd((n, 1, 3), sh=row),
                  sh_rest=sd((n, 8, 3), sh=row),
                  scales_log=sd((n, 3), sh=row), quats=sd((n, 4), sh=row),
                  opacity_raw=sd((n,), sh=row))
    alive = sd((n,), jnp.bool_, row)
    cam = CameraParams(q_init=sd((4,)), t_init=sd((3,)), dq=sd((4,)),
                       dt=sd((3,)), fovx=sd(()), fovy=sd(()))
    align = GlobalAlignment(sd((4,)), sd(()))
    gt, bg, probe = sd((3, wh, wh)), sd((3,)), sd((n, 2), sh=row)

    loss_fn = sharded_render_loss(mesh, static, rcfg)

    def full(g, alive, cam, align, probe, gt, bg):
        return loss_fn(g, alive, cam, align, probe, probe, gt, bg)[0]

    compiled = jax.jit(jax.value_and_grad(full)).lower(
        g, alive, cam, align, probe, gt, bg).compile()
    txt = compiled.as_text()
    assert "is_scheduled=true" in txt, "module is not scheduled"
    lines = _entry_instructions(txt)

    # -- packet all-gathers: async-capable + issued ahead of consumption --
    gathers = []
    for i, l in enumerate(lines):
        m = re.match(r"(?:ROOT )?%(\S+) = .* all-gather\(", l)
        if m:
            gathers.append((m.group(1), i, l))
    assert gathers, "no all-gather in the sharded step schedule"
    assert all('async_collective_name="all-gather-start' in l
               for _, _, l in gathers), \
        "all-gathers not classified async by XLA"
    overlapped = []
    for name, i, _ in gathers:
        j = _first_use(lines, name, i)
        assert j is not None
        fus = sum(1 for k in range(i + 1, j) if "fusion(" in lines[k])
        overlapped.append((name, j - i, fus))
    best = max(overlapped, key=lambda t: t[2])
    assert best[2] >= 2, \
        f"no gather has compute scheduled under it: {overlapped}"
    assert sum(1 for _, _, f in overlapped if f >= 1) >= 4, \
        f"too few gathers overlap compute: {overlapped}"

    # -- halo ppermutes: explicit async start/done pairs with compute
    #    between start and done --
    starts = [(re.match(r"(?:ROOT )?%(\S+) =", l).group(1), i)
              for i, l in enumerate(lines)
              if "collective-permute-start(" in l]
    assert len(starts) >= 2, "no async collective-permute pairs"
    hidden = 0
    for name, i in starts:
        j = _first_use(lines, name, i)   # the matching -done consumes it
        assert j is not None and "collective-permute-done" in lines[j]
        if any("fusion(" in lines[k] or "collective-permute-start(" in
               lines[k] for k in range(i + 1, j)):
            hidden += 1
    assert hidden >= 2, "ppermute start/done pairs have nothing between"
