"""Gaussian splat parameters as a static-capacity pytree.

Capability parity with the reference's `GaussianModel`
(`/root/reference/scene/gaussian_model.py:25-299`): the six trainable fields
with the same activations (exp scales, sigmoid opacity, normalized quats,
covariance = (RS)(RS)^T), SfM/random initialization with knn-derived scales,
and PLY import/export in the standard 3DGS layout.

TPU-first redesign (SURVEY.md §7.1 "the single biggest design divergence"):
instead of reallocating tensors and performing Adam-state surgery on every
densify/prune (`gaussian_model.py:316-370`), the population lives in a FIXED
capacity-C buffer with an `alive` mask. Densification (model/densify.py)
writes into dead slots with static-shape scatters, so every training step
compiles once and shards cleanly over a mesh.

The `alive` mask is NOT part of this pytree — it is non-differentiable state
carried alongside (see train/loop.py), keeping `jax.grad` over `Gaussians`
clean.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import sh as sh_lib


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Gaussians:
    """Trainable splat parameters, all shaped (C, ...) with C = capacity."""

    xyz: jnp.ndarray          # (C, 3)
    sh_dc: jnp.ndarray        # (C, 1, 3)
    sh_rest: jnp.ndarray      # (C, K-1, 3)
    scales_log: jnp.ndarray   # (C, 3)
    quats: jnp.ndarray        # (C, 4)
    opacity_raw: jnp.ndarray  # (C,)
    # Per-Gaussian ASG specular features for the --hybrid path (C, 24);
    # None when hybrid is off (the None collapses out of the pytree, so
    # non-hybrid training is untouched). The reference *intends* these on
    # the splats (GaussianModel(..., asg_degree), render.py:136
    # `gaussians.get_asg_features`) but the snapshot never stores them —
    # this implements the intended design (like MCMC, SURVEY.md §2.4).
    asg: jnp.ndarray | None = None

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def max_sh_degree(self) -> int:
        k = 1 + self.sh_rest.shape[1]
        return int(np.sqrt(k)) - 1

    def scaling(self) -> jnp.ndarray:
        return jnp.exp(self.scales_log)

    def opacity(self, alive: jnp.ndarray) -> jnp.ndarray:
        return jax.nn.sigmoid(self.opacity_raw) * alive.astype(self.opacity_raw.dtype)

    def sh_coeffs(self) -> jnp.ndarray:
        return jnp.concatenate([self.sh_dc, self.sh_rest], axis=1)  # (C, K, 3)

    def with_asg(self, dim: int = 24) -> "Gaussians":
        """Attach zero-initialized ASG specular features (--hybrid)."""
        return dataclasses.replace(
            self, asg=jnp.zeros((self.capacity, dim), jnp.float32))


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


def create_from_points(points: np.ndarray, colors: np.ndarray, capacity: int,
                       sh_degree: int = 3) -> Tuple[Gaussians, jnp.ndarray]:
    """Initialize from an SfM point cloud (`create_from_pcd`,
    gaussian_model.py:161-190): SH-DC from RGB, opacity sigma^-1(0.1), scales
    log(sqrt(mean 3-NN squared distance)), identity quaternions.

    Returns (gaussians, alive_mask). `capacity` rows are allocated; rows
    beyond len(points) are dead.
    """
    n = points.shape[0]
    assert n <= capacity, f"{n} points > capacity {capacity}"
    k = (sh_degree + 1) ** 2

    dist2 = np.maximum(mean_sq_dist_knn3(points.astype(np.float32)), 1e-7)
    scales = np.log(np.sqrt(dist2))[:, None].repeat(3, axis=1)

    def pad(x, fill=0.0):
        shape = (capacity - n,) + x.shape[1:]
        return np.concatenate([x, np.full(shape, fill, np.float32)], axis=0)

    quats = np.zeros((n, 4), np.float32)
    quats[:, 0] = 1.0
    sh_dc = np.asarray(sh_lib.rgb_to_sh_dc(colors.astype(np.float32)))[:, None, :]

    g = Gaussians(
        xyz=jnp.asarray(pad(points.astype(np.float32))),
        sh_dc=jnp.asarray(pad(sh_dc)),
        sh_rest=jnp.asarray(pad(np.zeros((n, k - 1, 3), np.float32))),
        scales_log=jnp.asarray(pad(scales.astype(np.float32), fill=-10.0)),
        quats=jnp.asarray(pad(quats, fill=0.0).astype(np.float32)
                          + np.array([1e-8, 0, 0, 0], np.float32)),
        opacity_raw=jnp.asarray(pad(
            np.full((n,), float(inverse_sigmoid(jnp.float32(0.1))), np.float32),
            fill=-10.0)),
    )
    alive = jnp.asarray(np.arange(capacity) < n)
    return g, alive


def random_init_points(n: int, center: np.ndarray, std: np.ndarray,
                       seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Random point/color init (`gaussian_model.py:151-175` semantics:
    uniform in mean±std box, random colors)."""
    rng = np.random.default_rng(seed)
    pts = rng.uniform(center - std, center + std, size=(n, 3)).astype(np.float32)
    cols = rng.uniform(0.0, 1.0, size=(n, 3)).astype(np.float32)
    return pts, cols


def mean_sq_dist_knn3(points: np.ndarray) -> np.ndarray:
    """Mean squared distance to the 3 nearest neighbors — the TPU-side
    replacement for the `simple-knn` CUDA extension (`distCUDA2`,
    gaussian_model.py:20,177). Host-side, init-time only.

    Prefers scipy's cKDTree (fastest on skewed SfM distributions); falls
    back to the native C++ grid-knn extension (native/knn.cpp, exact,
    dependency-free), then blocked numpy.
    """
    try:
        from scipy.spatial import cKDTree
        tree = cKDTree(points)
        d, _ = tree.query(points, k=4)  # self + 3 neighbors
        return (d[:, 1:] ** 2).mean(axis=1).astype(np.float32)
    except ImportError:
        pass
    try:
        from ..utils import native_knn
        return native_knn.mean_sq_dist_knn3(points)
    except Exception:
        n = points.shape[0]
        out = np.empty(n, np.float32)
        block = 2048
        for i in range(0, n, block):
            d2 = ((points[i:i + block, None, :] - points[None, :, :]) ** 2).sum(-1)
            d2.partition(3, axis=1)
            out[i:i + block] = d2[:, 1:4].mean(axis=1)
        return out


# ---------------------------------------------------------------------------
# PLY interop (standard 3DGS layout; `save_ply`/`load_ply`,
# gaussian_model.py:234-299). Self-contained binary-little-endian writer.
# ---------------------------------------------------------------------------

def save_ply(path: str, g: Gaussians, alive: np.ndarray) -> None:
    alive = np.asarray(alive)
    xyz = np.asarray(g.xyz)[alive]
    n = xyz.shape[0]
    f_dc = np.asarray(g.sh_dc)[alive].transpose(0, 2, 1).reshape(n, -1)
    f_rest = np.asarray(g.sh_rest)[alive].transpose(0, 2, 1).reshape(n, -1)
    opac = np.asarray(g.opacity_raw)[alive][:, None]
    scale = np.asarray(g.scales_log)[alive]
    rot = np.asarray(g.quats)[alive]

    names = (["x", "y", "z", "nx", "ny", "nz"]
             + [f"f_dc_{i}" for i in range(f_dc.shape[1])]
             + [f"f_rest_{i}" for i in range(f_rest.shape[1])]
             + ["opacity"]
             + [f"scale_{i}" for i in range(3)]
             + [f"rot_{i}" for i in range(4)])
    data = np.concatenate(
        [xyz, np.zeros_like(xyz), f_dc, f_rest, opac, scale, rot],
        axis=1).astype("<f4")

    header = ["ply", "format binary_little_endian 1.0",
              f"element vertex {n}"]
    header += [f"property float {nm}" for nm in names]
    header += ["end_header", ""]
    with open(path, "wb") as f:
        f.write("\n".join(header).encode("ascii"))
        f.write(data.tobytes())


def load_ply(path: str, capacity: int | None = None
             ) -> Tuple[Gaussians, jnp.ndarray]:
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii").strip()
            header.append(line)
            if line == "end_header":
                break
        n = next(int(l.split()[-1]) for l in header if l.startswith("element vertex"))
        names = [l.split()[-1] for l in header if l.startswith("property float")]
        raw = np.frombuffer(f.read(n * len(names) * 4), dtype="<f4")
    arr = raw.reshape(n, len(names))
    col = {nm: i for i, nm in enumerate(names)}

    def grab(prefix, count):
        idx = [col[f"{prefix}_{i}"] for i in range(count)]
        return arr[:, idx]

    xyz = arr[:, [col["x"], col["y"], col["z"]]]
    n_rest = sum(1 for nm in names if nm.startswith("f_rest_"))
    f_dc = grab("f_dc", 3).reshape(n, 3, 1).transpose(0, 2, 1)
    f_rest = grab("f_rest", n_rest).reshape(n, 3, n_rest // 3).transpose(0, 2, 1)
    cap = capacity or n

    def pad(x, fill=0.0):
        return np.concatenate(
            [x, np.full((cap - n,) + x.shape[1:], fill, np.float32)], axis=0)

    g = Gaussians(
        xyz=jnp.asarray(pad(xyz)),
        sh_dc=jnp.asarray(pad(f_dc)),
        sh_rest=jnp.asarray(pad(f_rest)),
        scales_log=jnp.asarray(pad(grab("scale", 3), fill=-10.0)),
        quats=jnp.asarray(pad(grab("rot", 4))),
        opacity_raw=jnp.asarray(pad(arr[:, col["opacity"]][:, None], fill=-10.0)[:, 0]),
    )
    alive = jnp.asarray(np.arange(cap) < n)
    return g, alive
