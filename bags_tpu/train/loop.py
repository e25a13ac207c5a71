"""Training loop: jitted train step + host-side cadence orchestration.

Capability parity with the reference's canonical `training()` loop
(`/root/reference/train.py:86-494`): per-iteration random camera, render,
(1-λ)L1 + λ(1-SSIM) loss, backward through the rasterizer to Gaussians AND
camera pose/intrinsics, per-group Adam steps, SH-degree ramp every 1000
iters, densify/prune every 100 in (500, 15000), opacity reset every 3000,
periodic eval/checkpoint.

TPU-first architecture: one pure jitted `train_step` (render -> loss ->
grads -> all optimizer updates -> densify-stats accumulation) with static
shapes; densification / opacity reset are separate jitted functions invoked
at host-side cadence boundaries. Per-camera Adam moments are batched in one
(n_cams, ...) state with per-row step counts, exactly emulating the
reference's one-optimizer-per-camera scheme (`scene/__init__.py:164-198`)
under a single compiled update.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.camera import CameraParams, CameraStatic, GlobalAlignment
from ..model.densify import (DensifyStats, densify_and_prune, reset_opacity,
                             update_stats, zero_moments_at)
from ..model.gaussians import Gaussians
from ..raster import RenderConfig, render
from .config import TrainConfig
from .losses import photometric_loss
from .optim import (ADAM_EPS, expon_lr_schedule, make_alignment_optimizer,
                    make_gaussian_optimizer, multistep_schedule)


# ---------------------------------------------------------------------------
# Batched per-row Adam for cameras
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RowAdamState:
    """Adam moments batched over cameras with per-row step counts, so that
    stepping only the sampled camera each iteration reproduces the
    reference's per-camera optimizers."""

    mu: CameraParams
    nu: CameraParams
    count: jnp.ndarray  # (n_cams,) int32


def row_adam_init(params: CameraParams) -> RowAdamState:
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    n = params.fovx.shape[0]
    return RowAdamState(mu=zeros, nu=jax.tree_util.tree_map(jnp.zeros_like, params),
                        count=jnp.zeros((n,), jnp.int32))


def _camera_lr_tree(calib, global_step) -> CameraParams:
    """Per-field learning rates at GLOBAL iteration `global_step` (scalar).

    The reference steps `scene.scheduler_rotation/translation` once per
    global iteration (train.py:473-478), so the MultiStepLR milestones
    [7000, 30000] are global-iteration counts — NOT per-camera Adam step
    counts (with N cameras a single camera only sees ~iters/N updates)."""
    rot_lr, trans_lr = calib.r_t_lr
    rot = multistep_schedule(rot_lr if calib.opt_cam else 0.0,
                             calib.pose_lr_milestones,
                             calib.pose_lr_gamma)(global_step)
    trans = multistep_schedule(trans_lr if calib.opt_cam else 0.0,
                               calib.pose_lr_milestones,
                               calib.pose_lr_gamma)(global_step)
    fov = jnp.asarray(calib.fov_lr if calib.opt_intrinsic else 0.0)
    zero = jnp.zeros(())
    return CameraParams(q_init=zero, t_init=zero, dq=rot, dt=trans,
                        fovx=fov, fovy=fov)


def row_adam_update(params: CameraParams, st: RowAdamState,
                    row_grads: CameraParams, idx, calib, global_step,
                    b1=0.9, b2=0.999) -> tuple[CameraParams, RowAdamState]:
    t = st.count[idx] + 1  # per-row count: Adam bias correction only
    lr = _camera_lr_tree(calib, global_step)
    tf = t.astype(jnp.float32)
    bc1 = 1.0 - b1 ** tf
    bc2 = 1.0 - b2 ** tf

    def upd(p, mu, nu, g, lr_leaf):
        mu_row = b1 * mu[idx] + (1 - b1) * g
        nu_row = b2 * nu[idx] + (1 - b2) * g * g
        # idx may be a (K,) vector (batch_cams > 1): align the per-row bias
        # corrections against each leaf's trailing dims.
        sh = bc1.shape + (1,) * (g.ndim - bc1.ndim)
        b1c, b2c = bc1.reshape(sh), bc2.reshape(sh)
        step = lr_leaf * (mu_row / b1c) / (jnp.sqrt(nu_row / b2c) + ADAM_EPS)
        return (p.at[idx].add(-step), mu.at[idx].set(mu_row),
                nu.at[idx].set(nu_row))

    out = jax.tree_util.tree_map(upd, params, st.mu, st.nu, row_grads, lr)
    new_p = jax.tree_util.tree_map(lambda o: o[0], out,
                                   is_leaf=lambda x: isinstance(x, tuple))
    new_mu = jax.tree_util.tree_map(lambda o: o[1], out,
                                    is_leaf=lambda x: isinstance(x, tuple))
    new_nu = jax.tree_util.tree_map(lambda o: o[2], out,
                                    is_leaf=lambda x: isinstance(x, tuple))
    return new_p, RowAdamState(mu=new_mu, nu=new_nu,
                               count=st.count.at[idx].set(t))


# ---------------------------------------------------------------------------
# Train state & step
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    g: Gaussians
    alive: jnp.ndarray
    g_opt: optax.OptState
    cams: CameraParams               # batched (n_cams, ...)
    cam_opt: RowAdamState
    align: GlobalAlignment
    align_opt: optax.OptState
    stats: DensifyStats
    step: jnp.ndarray
    key: jnp.ndarray
    # --hybrid specular MLP (None when off; None collapses out of the tree)
    spec: Optional[object] = None          # calib.specular.SpecularParams
    spec_opt: Optional[optax.OptState] = None


class StepMetrics(NamedTuple):
    loss: jnp.ndarray
    l1: jnp.ndarray
    n_alive: jnp.ndarray
    n_dropped: jnp.ndarray
    # banded lens-warp window overflow (calibrated fast mode only): > 0
    # means warp_ky was too small for the current lens field; the trainer
    # re-traces with a larger window (warp-ky ladder)
    warp_overflow: int = 0


def make_train_step(static: CameraStatic, rcfg: RenderConfig,
                    cfg: TrainConfig, g_tx: optax.GradientTransformation,
                    align_tx: optax.GradientTransformation,
                    sh_degree: int,
                    spec_tx: optax.GradientTransformation | None = None):
    """Build the jitted train step for a fixed active SH degree."""
    rcfg = dataclasses.replace(rcfg, sh_degree=sh_degree)
    lam = cfg.opt.lambda_dssim
    hybrid = cfg.calib.hybrid

    K = cfg.opt.batch_cams

    @jax.jit
    def train_step(state: TrainState, gt: jnp.ndarray, cam_idx: jnp.ndarray,
                   bg: jnp.ndarray):
        cam_i = jax.tree_util.tree_map(lambda x: x[cam_idx], state.cams)
        alive = state.alive
        n_cap = state.g.capacity
        lead = (K,) if K > 1 else ()
        probe = jnp.zeros(lead + (n_cap, 2), jnp.float32)
        absp = jnp.zeros(lead + (n_cap, 2), jnp.float32)

        def one_view(g: Gaussians, cam, align, probe2d, abs_probe, spec,
                     gt_one):
            extra = None
            if hybrid:
                from ..calib.specular import specular_extra_color
                extra = specular_extra_color(spec, g.xyz, g.asg, cam, align)
            out = render(g.xyz, g.scaling(), g.quats, g.opacity(alive),
                         g.sh_coeffs(), cam, static, rcfg, bg=bg,
                         align=align, probe2d=probe2d, abs_probe=abs_probe,
                         extra_color=extra)
            return photometric_loss(out.render, gt_one, lam), out

        def regs(g):
            loss = 0.0
            if cfg.mcmc:
                # Reference means over the N *actual* Gaussians
                # (train.py:328-329), not the fixed capacity — dividing by
                # capacity would scale the reg strength by the fill factor.
                n_alive = jnp.maximum(jnp.sum(alive), 1.0)
                loss = loss + cfg.opt.opacity_reg * jnp.sum(
                    jnp.abs(g.opacity(alive))) / n_alive
                loss = loss + cfg.opt.scale_reg * jnp.sum(
                    jnp.abs(g.scaling() * alive[:, None])) / (3.0 * n_alive)
            return loss

        if K > 1:
            # K views per step: mean photometric loss over the batch (the
            # view-render vmap maps the Pallas grid), per-view probes so the
            # densify stats accumulate exactly like K reference iterations.
            def loss_fn(g, cams_k, align, probes, absps, spec):
                losses, outs = jax.vmap(
                    lambda c, pr, ap, g1: one_view(g, c, align, pr, ap,
                                                   spec, g1))(
                        cams_k, probes, absps, gt)
                return jnp.mean(losses) + regs(g), outs
        else:
            def loss_fn(g, cam, align, probe2d, abs_probe, spec):
                loss, out = one_view(g, cam, align, probe2d, abs_probe,
                                     spec, gt)
                return loss + regs(g), out

        argnums = (0, 1, 2, 3, 4, 5) if hybrid else (0, 1, 2, 3, 4)
        (loss, out), grads = jax.value_and_grad(
            loss_fn, argnums=argnums, has_aux=True)(
                state.g, cam_i, state.align, probe, absp, state.spec)
        g_grads, cam_grads, align_grads, signed_stat, abs_stat = grads[:5]

        # --- Gaussian update ------------------------------------------------
        updates, g_opt = g_tx.update(g_grads, state.g_opt, state.g)
        new_g = optax.apply_updates(state.g, updates)

        # --- specular MLP update (--hybrid) ---------------------------------
        if hybrid:
            s_upd, spec_opt = spec_tx.update(grads[5], state.spec_opt,
                                             state.spec)
            new_spec = optax.apply_updates(state.spec, s_upd)
        else:
            new_spec, spec_opt = state.spec, state.spec_opt

        # --- camera update (only the sampled row) ---------------------------
        new_cams, cam_opt = row_adam_update(
            state.cams, state.cam_opt, cam_grads, cam_idx, cfg.calib,
            state.step)

        # --- global alignment (opt-in; the reference never steps it in the
        # canonical loop) ----------------------------------------------------
        if getattr(cfg.calib, "opt_global_alignment", False):
            a_upd, align_opt = align_tx.update(align_grads, state.align_opt,
                                               state.align)
            new_align = optax.apply_updates(state.align, a_upd)
        else:
            new_align, align_opt = state.align, state.align_opt

        # --- densification statistics ---------------------------------------
        # signed channel = grad of the per-Gaussian screen probe; abs channel
        # harvested inside the rasterizer's gradient reduction (render.py) —
        # no instance-level segment sums in the train step.
        if K > 1:
            # mean-over-views scales every probe cotangent by 1/K; densify
            # thresholds are absolute reference magnitudes for a SINGLE-view
            # loss, so scale the stats back to per-view scale.
            stats = state.stats
            for k in range(K):
                stats = update_stats(
                    stats, signed_stat[k] * K, abs_stat[k] * K,
                    out.radii[k], out.visibility[k])
        else:
            stats = update_stats(state.stats, signed_stat, abs_stat,
                                 out.radii, out.visibility)

        l1 = jnp.mean(jnp.abs(out.render - gt))
        new_state = dataclasses.replace(
            state, g=new_g, g_opt=g_opt, cams=new_cams, cam_opt=cam_opt,
            align=new_align, align_opt=align_opt, stats=stats,
            step=state.step + 1, spec=new_spec, spec_opt=spec_opt)
        metrics = StepMetrics(loss=loss, l1=l1,
                              n_alive=jnp.sum(alive),
                              n_dropped=jnp.max(out.n_dropped))
        return new_state, metrics

    return train_step


def make_mcmc_step(cfg: TrainConfig, cap_max: int | None):
    """Jitted MCMC relocation step (`--mcmc`, train.py:363-372): relocate
    dead Gaussians, grow toward cap_max, zero touched Adam moments."""
    from ..model import mcmc

    @jax.jit
    def mcmc_step(state: TrainState):
        key, k1, k2 = jax.random.split(state.key, 3)
        r1 = mcmc.relocate_dead(state.g, state.alive, k1,
                                min_opacity=cfg.opacity_threshold)
        r2 = mcmc.add_new_gaussians(r1.gaussians, r1.alive, k2,
                                    cap_max=cap_max)
        g_opt = zero_moments_at(state.g_opt, r1.reset_mask | r2.reset_mask)
        return dataclasses.replace(
            state, g=r2.gaussians, alive=r2.alive, g_opt=g_opt, key=key), \
            (r1.n_relocated, r2.n_relocated)

    return mcmc_step


def make_mcmc_noise_step(cfg: TrainConfig, spatial_lr_scale: float):
    """Jitted SGLD position-noise step (train.py:434-441), applied after
    each optimizer update when --mcmc."""
    from ..model import mcmc
    from .optim import expon_lr_schedule

    xyz_sched = expon_lr_schedule(
        cfg.opt.position_lr_init * spatial_lr_scale,
        cfg.opt.position_lr_final * spatial_lr_scale,
        cfg.opt.position_lr_max_steps,
        lr_delay_mult=cfg.opt.position_lr_delay_mult)

    @jax.jit
    def noise_step(state: TrainState):
        key, sub = jax.random.split(state.key)
        xyz = mcmc.position_noise(state.g, state.alive, sub,
                                  xyz_lr=xyz_sched(state.step),
                                  noise_lr=cfg.opt.noise_lr)
        return dataclasses.replace(
            state, g=dataclasses.replace(state.g, xyz=xyz), key=key)

    return noise_step


def make_densify_step(cfg: TrainConfig, scene_extent: float):
    """Jitted densify+prune, including Adam-moment zeroing and stat reset."""

    @functools.partial(jax.jit, static_argnames=("max_screen_size",))
    def densify_step(state: TrainState, max_screen_size: float):
        key, sub = jax.random.split(state.key)
        thr = (cfg.opt.abs_densify_grad_threshold if cfg.abs_grad
               else cfg.opt.densify_grad_threshold)
        res = densify_and_prune(
            state.g, state.alive, state.stats, sub,
            grad_threshold=thr,
            min_opacity=cfg.opacity_threshold,
            scene_extent=scene_extent,
            max_screen_size=max_screen_size,
            percent_dense=cfg.opt.percent_dense,
            use_abs_grad=cfg.abs_grad)
        g_opt = zero_moments_at(state.g_opt, res.reset_mask)
        stats = DensifyStats.zeros(state.g.capacity)
        return dataclasses.replace(
            state, g=res.gaussians, alive=res.alive, g_opt=g_opt,
            stats=stats, key=key), (res.n_cloned, res.n_split, res.n_pruned)

    return densify_step


@jax.jit
def opacity_reset_step(state: TrainState):
    """Opacity clamp + zeroing of the opacity Adam moments
    (`reset_opacity` + `replace_tensor_to_optimizer`,
    gaussian_model.py:253-256,301-314). Within the multi_transform state,
    opacity_raw's (C,) shape is unique (all other fields are (C, k)), so a
    shape match identifies exactly the opacity mu/nu leaves."""
    g, _ = reset_opacity(state.g)
    shape = g.opacity_raw.shape

    def zero_matching(leaf):
        if hasattr(leaf, "shape") and leaf.shape == shape and \
                jnp.issubdtype(leaf.dtype, jnp.floating):
            return jnp.zeros_like(leaf)
        return leaf

    g_opt = jax.tree_util.tree_map(zero_matching, state.g_opt)
    return dataclasses.replace(state, g=g, g_opt=g_opt)


def snap_capacity(needed: int, headroom: float = 1.3) -> int:
    """Instance-budget ladder: needed x headroom, >= 2^17, snapped up to a
    65536 multiple. THE single source of the sizing policy (estimate_capacity,
    Trainer._grow_capacity, and bench.py all call this)."""
    cap = max(int(needed * headroom), 2 ** 17)
    return -(-cap // 65536) * 65536


def estimate_capacity(g: Gaussians, alive, cams: CameraParams,
                      static: CameraStatic, sample: int = 8,
                      headroom: float = 1.3, seed: int = 0) -> int:
    """Initial instance budget: max tile-coverage over sampled training views
    x headroom, snapped up to a 65536 ladder. Densification growth beyond the
    headroom is handled by `Trainer._grow_capacity` (recompile on overflow) —
    together they replace the CUDA reference's per-frame dynamic buffer
    resizing under XLA's static shapes."""
    from ..core.projection import project_gaussians
    from ..raster import binning

    n_cams = int(cams.fovx.shape[0])
    rng = np.random.default_rng(seed)
    idxs = (np.arange(n_cams) if n_cams <= sample
            else rng.choice(n_cams, size=sample, replace=False))
    tiles_x, tiles_y = binning.tile_grid(static.width, static.height)

    @jax.jit
    def one(cam):
        proj = project_gaussians(g.xyz, g.scaling(), g.quats,
                                 g.opacity(alive), g.sh_coeffs(), cam,
                                 static, 0)
        return binning.count_instances(proj, tiles_x, tiles_y)

    worst = max(int(one(jax.tree_util.tree_map(lambda x: x[i], cams)))
                for i in idxs)
    return snap_capacity(worst, headroom)


def init_train_state(g: Gaussians, alive, cams: CameraParams,
                     cfg: TrainConfig, spatial_lr_scale: float,
                     seed: int = 0):
    hybrid = cfg.calib.hybrid
    if hybrid and g.asg is None:
        g = g.with_asg()
    g_tx = make_gaussian_optimizer(cfg.opt, spatial_lr_scale, hybrid=hybrid)
    align_tx = make_alignment_optimizer(cfg.calib)
    align = GlobalAlignment.identity()
    spec = spec_opt = spec_tx = None
    if hybrid:
        from ..calib.specular import init_specular_params
        from .optim import make_specular_optimizer
        spec = init_specular_params(seed)
        spec_tx = make_specular_optimizer(cfg.opt)
        spec_opt = spec_tx.init(spec)
    state = TrainState(
        g=g, alive=alive,
        g_opt=g_tx.init(g),
        cams=cams,
        cam_opt=row_adam_init(cams),
        align=align,
        align_opt=align_tx.init(align),
        stats=DensifyStats.zeros(g.capacity),
        step=jnp.zeros((), jnp.int32),
        key=jax.random.PRNGKey(seed),
        spec=spec,
        spec_opt=spec_opt,
    )
    return state, g_tx, align_tx, spec_tx


class Trainer:
    """Host-side orchestration (cadences, SH ramp, eval hooks).

    gt_images: (n_cams, 3, H, W) array (or host callable idx -> image).
    """

    def __init__(self, g, alive, cams, static: CameraStatic,
                 cfg: TrainConfig, scene_extent: float,
                 gt_images, bg=None, rcfg: Optional[RenderConfig] = None,
                 seed: int = 0):
        self.cfg = cfg
        self.static = static
        self.scene_extent = scene_extent
        self.gt_images = gt_images
        self.bg = bg if bg is not None else (
            jnp.ones(3) if cfg.model.white_background else jnp.zeros(3))
        self.rcfg = rcfg or RenderConfig(max_instances=cfg.max_instances)
        self.state, self.g_tx, self.align_tx, self.spec_tx = init_train_state(
            g, alive, cams, cfg, scene_extent, seed)
        self._steps = {}
        self.densify_step = make_densify_step(cfg, scene_extent)
        if cfg.mcmc:
            cap = cfg.model.cap_max if cfg.model.cap_max > 0 else None
            self.mcmc_step = make_mcmc_step(cfg, cap)
            self.mcmc_noise_step = make_mcmc_noise_step(cfg, scene_extent)
        self.active_sh_degree = 0
        self.max_sh_degree = cfg.model.sh_degree
        self._rng = np.random.default_rng(seed)
        self._camera_stack: list[int] = []
        self._io = None
        self._prefetched: Optional[tuple] = None

    def _train_step_fn(self):
        d = self.active_sh_degree
        if d not in self._steps:
            self._steps[d] = make_train_step(
                self.static, self.rcfg, self.cfg, self.g_tx, self.align_tx, d,
                spec_tx=self.spec_tx)
        return self._steps[d]

    # -- hooks subclasses (CalibTrainer) override -------------------------

    def _invoke_step(self, it: int, idx: int, gt) -> StepMetrics:
        self.state, metrics = self._train_step_fn()(
            self.state, gt, jnp.asarray(idx), self.bg)
        return metrics

    def _base_transform(self, fn) -> None:
        """Apply a TrainState -> TrainState transform (densify etc.)."""
        self.state = fn(self.state)

    def _refill_camera_stack(self) -> None:
        if not self._camera_stack:
            base = getattr(self.state, "base", self.state)
            n = int(base.cams.fovx.shape[0])
            self._camera_stack = list(self._rng.permutation(n))

    def _next_camera(self) -> int:
        """Random camera from a reshuffled stack (train.py:206-208)."""
        self._refill_camera_stack()
        return int(self._camera_stack.pop())

    def _peek_camera(self) -> int:
        """The camera the NEXT iteration will draw (for IO prefetch)."""
        self._refill_camera_stack()
        return int(self._camera_stack[-1])

    def _next_cameras(self, k: int) -> list:
        """k DISTINCT cameras (batch_cams > 1); the row-Adam scatter drops
        duplicate indices, so distinctness is required."""
        base = getattr(self.state, "base", self.state)
        n = int(base.cams.fovx.shape[0])
        if k > n:
            raise ValueError(
                f"batch_cams={k} exceeds the {n} training cameras")
        out: list = []
        while len(out) < k:
            i = self._next_camera()
            if i not in out:
                out.append(i)
        return out

    def _fetch_gt(self, idx: int):
        """Ground truth for camera idx, overlapping disk IO with compute:
        while step i runs on device, a single IO thread loads step i+1's
        image (the reference preloads the whole set to GPU memory,
        scene/cameras.py; here large scenes stream through data/scene.py's
        LRU cache instead, so the load must be hidden)."""
        if not callable(self.gt_images):
            return self.gt_images[idx]
        pre = self._prefetched
        gt = (pre[1].result() if pre is not None and pre[0] == idx
              else self.gt_images(idx))
        if self._io is None:
            import concurrent.futures
            self._io = concurrent.futures.ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="bags-gt-io")
        nidx = self._peek_camera()
        self._prefetched = (nidx, self._io.submit(self.gt_images, nidx))
        return gt

    def _grow_warp_ky(self, overflow: int) -> None:
        # only calibrated steps report warp overflow (CalibTrainer overrides)
        raise RuntimeError(
            f"warp overflow {overflow} from a non-calibrated train step")

    def _grow_capacity(self, n_dropped: int) -> None:
        """Instance-budget overflow: grow `max_instances` one ladder step and
        re-jit. The CUDA reference resizes its instance buffers dynamically
        every frame (dynamic allocation); under XLA static shapes the
        TPU-native equivalent is a recompile at a bigger static budget —
        amortized over the 30k-iteration run by the persistent compile
        cache."""
        import dataclasses as _dc

        old = self.rcfg.max_instances
        new = snap_capacity(old + n_dropped)
        self.rcfg = _dc.replace(self.rcfg, max_instances=new)
        # keep the config in sync: eval/gui renderers and the cfg.json
        # persisted at checkpoints read cfg.max_instances.
        self.cfg.max_instances = new
        self._steps = {}
        print(f"[capacity] {n_dropped} instances dropped: growing "
              f"max_instances {old} -> {new} (recompiling)", flush=True)

    def run(self, iterations: Optional[int] = None, log_every: int = 0,
            callback=None):
        opt = self.cfg.opt
        iterations = iterations or opt.iterations
        history = []
        for it in range(1, iterations + 1):
            # SH degree ramp every 1000 iters (train.py:202).
            if it % 1000 == 0 and self.active_sh_degree < self.max_sh_degree:
                self.active_sh_degree += 1
            K = self.cfg.opt.batch_cams
            if K > 1:
                # no 1-deep prefetch here: jax dispatch is async, so these
                # host loads already overlap the previous step's device time
                idx = self._next_cameras(K)
                load = (self.gt_images if callable(self.gt_images)
                        else self.gt_images.__getitem__)
                gt = jnp.stack([load(i) for i in idx])
                idx = jnp.asarray(idx, jnp.int32)
            else:
                idx = self._next_camera()
                gt = self._fetch_gt(idx)
            metrics = self._invoke_step(it, idx, gt)

            if self.cfg.mcmc:
                # MCMC cadence (train.py:363-372,434-441): relocation at the
                # densify interval, SGLD position noise every step.
                if opt.densify_from_iter < it < opt.densify_until_iter and \
                        it % opt.densification_interval == 0:
                    self._base_transform(lambda s: self.mcmc_step(s)[0])
                self._base_transform(self.mcmc_noise_step)
            elif it < opt.densify_until_iter:
                # Densification cadence (train.py:374-389).
                if it > opt.densify_from_iter and \
                        it % opt.densification_interval == 0:
                    max_screen = 20.0 if it > opt.opacity_reset_interval else 0.0
                    self._base_transform(
                        lambda s: self.densify_step(s, max_screen)[0])
                if it % opt.opacity_reset_interval == 0 or (
                        self.cfg.model.white_background
                        and it == opt.densify_from_iter):
                    self._base_transform(opacity_reset_step)

            # Auto-grow the instance budget on overflow. Checked at a 100-it
            # cadence: reading n_dropped is a host sync (expensive over the
            # axon tunnel), and a transient overflow self-heals anyway.
            if self.cfg.auto_capacity and it % 100 == 0:
                nd = int(metrics.n_dropped)
                if nd > 0:
                    self._grow_capacity(nd)
                wo = int(metrics.warp_overflow)
                if wo > 0:
                    self._grow_warp_ky(wo)

            if log_every and it % log_every == 0:
                history.append((it, float(metrics.loss),
                                int(metrics.n_alive)))
            if callback is not None:
                callback(it, self.state, metrics)
        return history
