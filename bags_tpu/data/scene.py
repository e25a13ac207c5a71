"""Scene: camera batches, GT image cache, pose/FoV noise injection.

Capability parity with the reference `Scene` (`/root/reference/scene/
__init__.py:58-210`): dataset dispatch, seeded noise injection over
rotations/translations/FoVs with noise-free copies retained for pose
evaluation, camera lists at resolution scales with the -1 -> cap-1.6k-width
policy (`utils/camera_utils.py:24-48`), scene extent from NeRF++
normalization, and PLY/point-cloud Gaussian init.

TPU-first: instead of per-camera nn.Modules, cameras become ONE batched
`CameraParams` pytree (n_cams leading dim) paired with a single
`CameraStatic` (uniform image size is asserted; resolution bucketing hooks
exist for mixed-size captures), and GT images are loaded host-side into a
pinned numpy cache feeding `jax.device_put` per step.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.camera import CameraParams, CameraStatic
from ..core.lie import so3_exp
from ..model.gaussians import create_from_points
from .readers import CameraInfo, SceneInfo, load_scene_info


def resolve_resolution(width: int, height: int, resolution: int = -1,
                       scale: float = 1.0) -> Tuple[int, int]:
    """`loadCam` resolution policy (camera_utils.py:24-48): explicit
    downscale factor, or -1 -> cap width at 1600 px."""
    if resolution in (1, -1):
        if resolution == -1 and width > 1600:
            global_down = width / 1600
        else:
            global_down = 1.0
    else:
        global_down = float(resolution)
    factor = global_down * scale
    return int(round(width / factor)), int(round(height / factor))


def load_image(path: str, wh: Tuple[int, int],
               white_background: bool = False) -> np.ndarray:
    """PIL -> (3, H, W) float32 in [0,1], resized; alpha composited over the
    background (readCamerasFromTransforms:417-421 / PILtoTorch)."""
    from PIL import Image

    with Image.open(path) as img:
        img = img.resize(wh, Image.LANCZOS)
        arr = np.asarray(img).astype(np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[..., None].repeat(3, -1)
    if arr.shape[-1] == 4:
        bg = 1.0 if white_background else 0.0
        arr = arr[..., :3] * arr[..., 3:4] + bg * (1 - arr[..., 3:4])
    return np.clip(arr.transpose(2, 0, 1), 0.0, 1.0)


def batch_cameras(infos: List[CameraInfo]) -> CameraParams:
    """List of CameraInfo -> one batched CameraParams (q_init from R^T, the
    w2c rotation; cameras.py:101)."""
    cams = [CameraParams.create(np.asarray(c.R, np.float32).T,
                                np.asarray(c.T, np.float32),
                                c.fovx, c.fovy) for c in infos]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cams)


def inject_noise(infos: List[CameraInfo], r_t_noise=(0.0, 0.0, 1.0),
                 seed: int = 55) -> List[CameraInfo]:
    """Seeded pose/FoV perturbation (`scene/__init__.py:121-148`):
    R <- exp(so3 noise) R, T <- T + eps, FoV <- FoV * exp(N(0, ln sigma))."""
    rng = np.random.default_rng(seed)
    n = len(infos)
    so3_noise = rng.normal(0.0, 1.0, (n, 3)).astype(np.float32) * r_t_noise[0]
    t_noise = rng.normal(0.0, 1.0, (n, 3)).astype(np.float32) * r_t_noise[1]
    if len(r_t_noise) > 2 and r_t_noise[2] != 1.0:
        fov_noise = np.exp(rng.normal(0.0, np.log(r_t_noise[2]), n))
    else:
        fov_noise = np.ones(n)
    rots = np.asarray(so3_exp(jnp.asarray(so3_noise)))
    out = []
    for i, c in enumerate(infos):
        out.append(dataclasses.replace(
            c, R=rots[i] @ c.R, T=c.T + t_noise[i],
            fovx=c.fovx * fov_noise[i], fovy=c.fovy * fov_noise[i]))
    return out


class Scene:
    """Loads a dataset directory into batched cameras + Gaussian init."""

    def __init__(self, source_path: str, eval_split: bool = False,
                 resolution: int = -1, r_t_noise=(0.0, 0.0, 1.0),
                 white_background: bool = False, capacity: Optional[int] = None,
                 sh_degree: int = 3, images_dir: str = "images",
                 init_type: str = "sfm", noise_seed: int = 55,
                 max_image_cache: int = 512, num_pts: int = 100_000):
        self.info: SceneInfo = load_scene_info(
            source_path, eval_split=eval_split, images_dir=images_dir,
            white_background=white_background, init_type=init_type,
            num_pts=num_pts)
        self.cameras_extent = float(self.info.nerf_normalization["radius"])
        self.white_background = white_background
        self.resolution = resolution

        # noise-free copies retained for pose eval (scene/__init__.py:123-124)
        self.train_infos_clean = list(self.info.train_cameras)
        self.train_infos = inject_noise(self.info.train_cameras, r_t_noise,
                                        noise_seed)
        self.test_infos = list(self.info.test_cameras) or \
            [self.train_infos[0]]

        sizes = {resolve_resolution(c.width, c.height, resolution)
                 for c in self.train_infos}
        assert len(sizes) == 1, (
            f"mixed image sizes {sizes}: resolution bucketing not yet wired")
        w, h = next(iter(sizes))
        self.static = CameraStatic(width=w, height=h)

        self.train_cams = batch_cameras(self.train_infos)
        self.train_cams_clean = batch_cameras(self.train_infos_clean)
        self.test_cams = batch_cameras(self.test_infos)

        pcd = self.info.point_cloud
        n_pts = len(pcd.points)
        cap = capacity or max(2 ** int(np.ceil(np.log2(max(n_pts, 1) * 4))),
                              1024)
        self.gaussians, self.alive = create_from_points(
            pcd.points, pcd.colors, cap, sh_degree)
        self._cache: Dict[Tuple[str, int], np.ndarray] = {}
        self._max_cache = max_image_cache
        import threading
        # The trainer prefetches the next image on an IO thread while the
        # main thread may load eval views; the eviction path iterates the
        # dict, so cache access must be serialized.
        self._cache_lock = threading.Lock()

    # -- image access -------------------------------------------------------

    def _load(self, infos, idx: int, fish: bool = False) -> jnp.ndarray:
        info = infos[idx]
        path = info.fish_image_path if fish else info.image_path
        key = (path, id(infos))
        with self._cache_lock:
            img = self._cache.get(key)
        if img is None:
            img = load_image(
                path, (self.static.width, self.static.height),
                info.white_background or self.white_background)
            with self._cache_lock:
                if len(self._cache) >= self._max_cache:
                    self._cache.pop(next(iter(self._cache)))
                self._cache[key] = img
        return jnp.asarray(img)

    def train_image(self, idx: int) -> jnp.ndarray:
        return self._load(self.train_infos, idx)

    def test_image(self, idx: int) -> jnp.ndarray:
        return self._load(self.test_infos, idx)

    def fish_image(self, idx: int) -> jnp.ndarray:
        return self._load(self.train_infos, idx, fish=True)

    def test_fish_image(self, idx: int) -> jnp.ndarray:
        return self._load(self.test_infos, idx, fish=True)

    @property
    def n_train(self) -> int:
        return len(self.train_infos)

    @property
    def n_test(self) -> int:
        return len(self.test_infos)
