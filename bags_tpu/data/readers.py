"""Scene readers: COLMAP / Blender (NeRF-Synthetic) / Metashape (VR-NeRF KRT).

Capability parity with `/root/reference/scene/dataset_readers.py`:
  * `CameraInfo`/`SceneInfo` records (dataset_readers.py:60-81)
  * NeRF++ normalization -> scene radius (`getNerfppNorm`, :83-104)
  * COLMAP reader with camera-model-specific intrinsics
    (`readColmapCameras`, :106-215): SIMPLE_PINHOLE/RADIAL share one focal,
    PINHOLE/OPENCV_FISHEYE carry fx/fy, FULL_OPENCV handled like PINHOLE
  * train/test split every `llffhold=8` sorted camera (:273-275)
  * SfM-points or random init (:282-307)
  * Blender `transforms_train.json` reader (:381-436) incl. the mitsuba
    axis convention (`c2w[:3,0:2] *= -1` when type == "mitsuba")
  * VR-NeRF/Eyeful `cameras.json` KRT reader (:332-379) and Metashape
    dispatch (:439-485)
  * directory-sniffing dispatch (`scene/__init__.py:84-93`).
"""

from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from .colmap import (qvec2rotmat, read_cameras_binary, read_cameras_text,
                     read_images_binary, read_images_text,
                     read_points3d_binary, read_points3d_text)


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2 * np.tan(fov / 2))


def focal2fov(focal: float, pixels: float) -> float:
    return 2 * np.arctan(pixels / (2 * focal))


@dataclasses.dataclass
class CameraInfo:
    uid: int
    R: np.ndarray              # c2w rotation (stored transposed, glm-style)
    T: np.ndarray              # w2c translation
    fovx: float
    fovy: float
    focal_x: float
    focal_y: float
    image_path: str
    image_name: str
    width: int
    height: int
    camera_model: str = "PINHOLE"
    distortion_params: Optional[np.ndarray] = None  # raw COLMAP params
    fish_image_path: Optional[str] = None           # paired raw fisheye GT
    white_background: bool = False


@dataclasses.dataclass
class PointCloud:
    points: np.ndarray  # (N, 3)
    colors: np.ndarray  # (N, 3) in [0, 1]


@dataclasses.dataclass
class SceneInfo:
    point_cloud: Optional[PointCloud]
    train_cameras: List[CameraInfo]
    test_cameras: List[CameraInfo]
    nerf_normalization: Dict[str, np.ndarray]
    ply_path: str


def get_nerfpp_norm(cam_infos: List[CameraInfo]) -> Dict[str, np.ndarray]:
    """Scene center/radius from camera centers (`getNerfppNorm`)."""
    centers = []
    for cam in cam_infos:
        # W2C = [R^T | T]  (R stored in the transposed/c2w form), so the
        # camera center is C = -(R^T)^-1 T = -R @ T.
        centers.append(cam.R @ -cam.T.reshape(3))
    centers = np.stack(centers)
    avg = centers.mean(axis=0)
    diag = np.linalg.norm(centers - avg, axis=-1).max()
    return {"translate": -avg, "radius": diag * 1.1}


def _find_fisheye_pair(image_path: str) -> Optional[str]:
    """Locate the paired raw fisheye GT under `fish/images`
    (`utils/camera_utils.py:55-67` convention)."""
    parts = Path(image_path)
    for up in [2, 3]:
        if len(parts.parts) < up:
            break
        root = Path(*parts.parts[:-up])
        cand = root / "fish" / "images" / parts.name
        if cand.exists():
            return str(cand)
        for ext in (".jpg", ".png", ".JPG", ".PNG"):
            cand2 = cand.with_suffix(ext)
            if cand2.exists():
                return str(cand2)
    return None


def read_colmap_scene(path: str, images_dir: str = "images",
                      eval_split: bool = False, llffhold: int = 8,
                      init_type: str = "sfm", num_pts: int = 100_000,
                      seed: int = 0) -> SceneInfo:
    sparse = os.path.join(path, "sparse", "0")
    try:
        extr = read_images_binary(os.path.join(sparse, "images.bin"))
        intr = read_cameras_binary(os.path.join(sparse, "cameras.bin"))
    except FileNotFoundError:
        extr = read_images_text(os.path.join(sparse, "images.txt"))
        intr = read_cameras_text(os.path.join(sparse, "cameras.txt"))

    infos = []
    for key in extr:
        im = extr[key]
        cam = intr[im.camera_id]
        R = qvec2rotmat(im.qvec).T
        T = np.array(im.tvec)
        w, h = cam.width, cam.height
        if cam.model in ("SIMPLE_PINHOLE", "RADIAL", "SIMPLE_RADIAL",
                         "SIMPLE_RADIAL_FISHEYE", "RADIAL_FISHEYE"):
            fx = fy = cam.params[0]
        elif cam.model in ("PINHOLE", "OPENCV", "OPENCV_FISHEYE",
                           "FULL_OPENCV", "THIN_PRISM_FISHEYE"):
            fx, fy = cam.params[0], cam.params[1]
        else:
            raise ValueError(f"unhandled COLMAP camera model {cam.model}")
        image_path = os.path.join(path, images_dir, os.path.basename(im.name))
        if not os.path.exists(image_path):
            alt = image_path.replace(".png", ".jpg")
            image_path = alt if os.path.exists(alt) else image_path
        infos.append(CameraInfo(
            uid=cam.id, R=R, T=T,
            fovx=focal2fov(fx, w), fovy=focal2fov(fy, h),
            focal_x=fx, focal_y=fy,
            image_path=image_path,
            image_name=Path(image_path).stem,
            width=w, height=h, camera_model=cam.model,
            distortion_params=cam.params,
            fish_image_path=_find_fisheye_pair(image_path)))
    infos.sort(key=lambda c: c.image_name)

    if eval_split:
        train = [c for i, c in enumerate(infos) if i % llffhold != 0]
        test = [c for i, c in enumerate(infos) if i % llffhold == 0]
    else:
        train, test = infos, infos[:5]

    norm = get_nerfpp_norm(train)
    pcd, ply_path = _init_points(path, sparse, init_type, num_pts,
                                 norm["radius"], seed)
    return SceneInfo(pcd, train, test, norm, ply_path)


def _init_points(path, sparse, init_type, num_pts, radius, seed):
    if init_type == "sfm":
        ply_path = os.path.join(sparse, "points3D.ply")
        try:
            xyz, rgb, _ = read_points3d_binary(
                os.path.join(sparse, "points3D.bin"))
        except FileNotFoundError:
            xyz, rgb, _ = read_points3d_text(
                os.path.join(sparse, "points3D.txt"))
        return PointCloud(points=xyz.astype(np.float32),
                          colors=(rgb / 255.0).astype(np.float32)), ply_path
    # random init inside a 3*radius box (dataset_readers.py:296-300)
    rng = np.random.default_rng(seed)
    xyz = rng.random((num_pts, 3)) * radius * 6 - radius * 3
    cols = rng.random((num_pts, 3)).astype(np.float32)
    return PointCloud(points=xyz.astype(np.float32), colors=cols), \
        os.path.join(path, "random.ply")


def read_blender_scene(path: str, white_background: bool = False,
                       eval_split: bool = False, extension: str = ".png",
                       init_type: str = "sfm", num_pts: int = 100_000,
                       seed: int = 0) -> SceneInfo:
    """NeRF-Synthetic `transforms_{train,test}.json`
    (`readNerfSyntheticInfo` + `readCamerasFromTransforms`)."""

    def read_split(fname) -> List[CameraInfo]:
        with open(os.path.join(path, fname)) as f:
            contents = json.load(f)
        fovx = contents["camera_angle_x"]
        mitsuba = contents.get("type") == "mitsuba"
        infos = []
        for idx, frame in enumerate(contents["frames"]):
            fp = frame["file_path"]
            if not (fp.endswith(".png") or fp.endswith(".jpg")):
                fp = fp + extension
            image_path = os.path.join(path, fp)
            c2w = np.array(frame["transform_matrix"])
            if mitsuba:
                c2w[:3, 0:2] *= -1   # mitsuba axis convention
            else:
                c2w[:3, 1:3] *= -1   # OpenGL/Blender -> COLMAP
            w2c = np.linalg.inv(c2w)
            R = w2c[:3, :3].T
            T = w2c[:3, 3]
            from PIL import Image
            with Image.open(image_path) as img:
                w, h = img.size
            fovy = focal2fov(fov2focal(fovx, w), h)
            infos.append(CameraInfo(
                uid=idx, R=R, T=T, fovx=fovx, fovy=fovy,
                focal_x=fov2focal(fovx, w), focal_y=fov2focal(fovy, h),
                image_path=image_path, image_name=Path(fp).stem,
                width=w, height=h, white_background=white_background))
        return infos

    train = read_split("transforms_train.json")
    test_file = os.path.join(path, "transforms_test.json")
    test = read_split("transforms_test.json") if os.path.exists(test_file) \
        else []
    if not eval_split:
        train = train + test
        test = []
    norm = get_nerfpp_norm(train)

    ply_path = os.path.join(path, "points3d.ply")
    rng = np.random.default_rng(seed)
    # Blender scenes have no SfM points: random init in a 2.6^3 box
    # (readNerfSyntheticInfo semantics: 100k points, nerf-synthetic bounds).
    xyz = (rng.random((num_pts, 3)).astype(np.float32) * 2.6 - 1.3)
    cols = rng.random((num_pts, 3)).astype(np.float32)
    return SceneInfo(PointCloud(points=xyz, colors=cols), train, test, norm,
                     ply_path)


def load_mesh_points(obj_path: str, texture_path: str | None = None):
    """Mesh-surface init points for Metashape scenes (`load_mesh`,
    dataset_readers.py:29-58): mesh VERTICES with per-vertex colors sampled
    from the texture at each vertex's UV. Self-contained OBJ parser
    (v/vt/f records) — the reference needs trimesh for the same data.

    Returns (xyz (V, 3) f32, rgb (V, 3) f32 in [0, 1]).
    """
    verts: list = []
    uvs: list = []
    vert_uv: dict = {}
    with open(obj_path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "v":
                verts.append([float(x) for x in parts[1:4]])
            elif parts[0] == "vt":
                uvs.append([float(parts[1]), float(parts[2])])
            elif parts[0] == "f":
                for corner in parts[1:]:
                    ids = corner.split("/")
                    if len(ids) >= 2 and ids[1]:
                        vert_uv[int(ids[0]) - 1] = int(ids[1]) - 1
    xyz = np.asarray(verts, np.float32)
    n = xyz.shape[0]
    rgb = np.full((n, 3), 0.5, np.float32)
    if texture_path and os.path.exists(texture_path) and uvs:
        from PIL import Image
        Image.MAX_IMAGE_PIXELS = None
        with Image.open(texture_path) as im:
            tex = np.asarray(im.convert("RGB"), np.float32) / 255.0
        h, w = tex.shape[:2]
        uv = np.asarray(uvs, np.float32)
        vid = np.fromiter(vert_uv.keys(), np.int64, len(vert_uv))
        tid = np.fromiter(vert_uv.values(), np.int64, len(vert_uv))
        u = np.clip((uv[tid, 0] * (w - 1)).astype(np.int64), 0, w - 1)
        v = np.clip(((1.0 - uv[tid, 1]) * (h - 1)).astype(np.int64), 0, h - 1)
        rgb[vid] = tex[v, u]
    return xyz, rgb


def read_metashape_scene(path: str, white_background: bool = False,
                         eval_split: bool = False, init_type: str = "sfm",
                         num_pts: int = 100_000, seed: int = 0) -> SceneInfo:
    """VR-NeRF/Eyeful `cameras.json` KRT reader (`readCamerasFromVRNeRF`)."""
    with open(os.path.join(path, "cameras.json")) as f:
        contents = json.load(f)
    infos = []
    for idx, frame in enumerate(contents["KRT"]):
        K = np.array(frame["K"]).T
        fovx = focal2fov(K[0, 0], K[0, 2] * 2)
        fovy = focal2fov(K[1, 1], K[1, 2] * 2)
        w2c = np.array(frame["T"]).T
        R = w2c[:3, :3].T
        T = w2c[:3, 3]
        image_path = os.path.join(path, frame["cameraId"] + ".jpg")
        w, h = int(K[0, 2] * 2), int(K[1, 2] * 2)
        infos.append(CameraInfo(
            uid=idx, R=R, T=T, fovx=fovx, fovy=fovy,
            focal_x=K[0, 0], focal_y=K[1, 1],
            image_path=image_path, image_name=frame["cameraId"],
            width=w, height=h, white_background=white_background))

    rng = np.random.default_rng(seed)
    test = list(infos)
    rng.shuffle(test)
    test = test[:5]
    train = infos if eval_split else infos + test
    if not eval_split:
        test = []
    norm = get_nerfpp_norm(infos)
    radius = norm["radius"]
    mesh_obj = os.path.join(path, "mesh.obj")
    if init_type == "sfm" and os.path.exists(mesh_obj):
        # Mesh-surface init (readMetashapeInfo, dataset_readers.py:454-459).
        xyz, cols = load_mesh_points(mesh_obj,
                                     os.path.join(path, "mesh.jpg"))
    else:
        xyz = (rng.random((num_pts, 3)) * radius * 6
               - radius * 3).astype(np.float32)
        cols = rng.random((num_pts, 3)).astype(np.float32)
    return SceneInfo(PointCloud(points=xyz, colors=cols), train, test, norm,
                     os.path.join(path, "points3d.ply"))


def load_scene_info(path: str, **kwargs) -> SceneInfo:
    """Dispatch by directory contents (`scene/__init__.py:84-93`)."""
    if os.path.exists(os.path.join(path, "sparse")):
        allowed = {"images_dir", "eval_split", "llffhold", "init_type",
                   "num_pts", "seed"}
        return read_colmap_scene(path, **{k: v for k, v in kwargs.items()
                                          if k in allowed})
    if os.path.exists(os.path.join(path, "cameras.json")):
        allowed = {"white_background", "eval_split", "init_type", "num_pts",
                   "seed"}
        return read_metashape_scene(path, **{k: v for k, v in kwargs.items()
                                             if k in allowed})
    if os.path.exists(os.path.join(path, "transforms_train.json")):
        allowed = {"white_background", "eval_split", "extension", "init_type",
                   "num_pts", "seed"}
        return read_blender_scene(path, **{k: v for k, v in kwargs.items()
                                           if k in allowed})
    raise ValueError(f"could not recognize scene type at {path}")
