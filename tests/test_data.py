"""Data layer: COLMAP binary roundtrip, Blender reader, Scene assembly."""

import json
import os

import numpy as np
import pytest

from bags_tpu.data import colmap
from bags_tpu.data.readers import (get_nerfpp_norm, load_scene_info,
                                   read_blender_scene, read_colmap_scene)
from bags_tpu.data.scene import Scene, inject_noise, resolve_resolution


def _write_colmap_scene(root, n_cams=6, n_pts=100, rng=None):
    rng = rng or np.random.default_rng(0)
    sparse = os.path.join(root, "sparse", "0")
    imgdir = os.path.join(root, "images")
    os.makedirs(sparse)
    os.makedirs(imgdir)

    cams = {1: colmap.ColmapCamera(1, "PINHOLE", 64, 48,
                                   np.array([70.0, 70.0, 32.0, 24.0]))}
    colmap.write_cameras_binary(os.path.join(sparse, "cameras.bin"), cams)

    images = {}
    from PIL import Image
    for i in range(1, n_cams + 1):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        t = rng.normal(size=3)
        name = f"img_{i:03d}.png"
        images[i] = colmap.ColmapImage(i, q, t, 1, name,
                                       np.zeros((0, 2)), np.zeros(0, int))
        Image.fromarray(
            (rng.random((48, 64, 3)) * 255).astype(np.uint8)).save(
            os.path.join(imgdir, name))
    colmap.write_images_binary(os.path.join(sparse, "images.bin"), images)

    xyz = rng.normal(size=(n_pts, 3))
    rgb = (rng.random((n_pts, 3)) * 255).astype(np.uint8)
    colmap.write_points3d_binary(os.path.join(sparse, "points3D.bin"),
                                 xyz, rgb)
    return cams, images, xyz, rgb


def test_colmap_binary_roundtrip(tmp_path, rng):
    root = str(tmp_path / "scene")
    os.makedirs(root)
    cams, images, xyz, rgb = _write_colmap_scene(root, rng=rng)

    sparse = os.path.join(root, "sparse", "0")
    cams2 = colmap.read_cameras_binary(os.path.join(sparse, "cameras.bin"))
    assert cams2[1].model == "PINHOLE"
    np.testing.assert_allclose(cams2[1].params, cams[1].params)

    images2 = colmap.read_images_binary(os.path.join(sparse, "images.bin"))
    for k in images:
        np.testing.assert_allclose(images2[k].qvec, images[k].qvec)
        np.testing.assert_allclose(images2[k].tvec, images[k].tvec)
        assert images2[k].name == images[k].name

    xyz2, rgb2, _ = colmap.read_points3d_binary(
        os.path.join(sparse, "points3D.bin"))
    np.testing.assert_allclose(xyz2, xyz)
    np.testing.assert_allclose(rgb2, rgb)


def test_qvec_rotmat_roundtrip(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    if q[0] < 0:
        q = -q
    R = colmap.qvec2rotmat(q)
    q2 = colmap.rotmat2qvec(R)
    np.testing.assert_allclose(q2, q, atol=1e-6)


def test_read_colmap_scene_split(tmp_path, rng):
    root = str(tmp_path / "scene")
    os.makedirs(root)
    _write_colmap_scene(root, n_cams=16, rng=rng)
    info = read_colmap_scene(root, eval_split=True, llffhold=8)
    assert len(info.test_cameras) == 2      # every 8th of 16
    assert len(info.train_cameras) == 14
    assert info.point_cloud.points.shape == (100, 3)
    assert info.nerf_normalization["radius"] > 0


def test_blender_reader(tmp_path, rng):
    from PIL import Image
    root = str(tmp_path / "blender")
    os.makedirs(root)
    frames = []
    for i in range(4):
        c2w = np.eye(4)
        c2w[2, 3] = -4.0
        fname = f"r_{i}"
        Image.fromarray((rng.random((32, 32, 4)) * 255).astype(np.uint8)
                        ).save(os.path.join(root, fname + ".png"))
        frames.append({"file_path": fname,
                       "transform_matrix": c2w.tolist()})
    with open(os.path.join(root, "transforms_train.json"), "w") as f:
        json.dump({"camera_angle_x": 0.7, "frames": frames}, f)
    info = load_scene_info(root, white_background=True)
    assert len(info.train_cameras) == 4
    cam = info.train_cameras[0]
    assert abs(cam.fovx - 0.7) < 1e-6
    assert cam.width == 32
    # OpenGL->COLMAP flip: camera at z=-4 looking toward origin along +z
    center = cam.R @ -cam.T
    np.testing.assert_allclose(center, [0, 0, -4], atol=1e-6)


def test_scene_assembly_and_noise(tmp_path, rng):
    root = str(tmp_path / "scene")
    os.makedirs(root)
    _write_colmap_scene(root, n_cams=8, rng=rng)
    scene = Scene(root, eval_split=True, r_t_noise=(0.01, 0.01, 1.0))
    assert scene.n_train == 7
    assert scene.static.width == 64 and scene.static.height == 48
    img = scene.train_image(0)
    assert img.shape == (3, 48, 64)
    # noise applied: noisy vs clean batched params differ
    dq = np.abs(np.asarray(scene.train_cams.q_init)
                - np.asarray(scene.train_cams_clean.q_init)).max()
    assert dq > 1e-4
    # gaussians initialized from the point cloud
    assert int(np.asarray(scene.alive).sum()) == 100


def test_noise_injection_seeded():
    infos = [  # two identical dummy cameras
        __import__("bags_tpu.data.readers", fromlist=["CameraInfo"]).CameraInfo(
            uid=i, R=np.eye(3), T=np.zeros(3), fovx=0.8, fovy=0.8,
            focal_x=100.0, focal_y=100.0, image_path="", image_name=str(i),
            width=64, height=64)
        for i in range(2)]
    a = inject_noise(infos, (0.1, 0.1, 1.0), seed=55)
    b = inject_noise(infos, (0.1, 0.1, 1.0), seed=55)
    np.testing.assert_allclose(a[0].R, b[0].R)
    np.testing.assert_allclose(a[0].T, b[0].T)
    assert not np.allclose(a[0].R, np.eye(3))


def test_resolve_resolution():
    assert resolve_resolution(3200, 2400, -1) == (1600, 1200)
    assert resolve_resolution(800, 600, -1) == (800, 600)
    assert resolve_resolution(800, 600, 2) == (400, 300)


def test_metashape_mesh_init(tmp_path, rng):
    """Metashape scenes initialize Gaussians from mesh.obj vertices with
    texture-sampled colors (readMetashapeInfo + load_mesh,
    dataset_readers.py:29-58,454-459)."""
    import json as json_mod

    from PIL import Image

    from bags_tpu.data.readers import load_mesh_points, read_metashape_scene

    root = str(tmp_path / "ms")
    os.makedirs(root)
    # cameras.json with two KRT entries (column-major T like the reference)
    K = np.array([[50.0, 0, 0], [0, 50.0, 0], [32.0, 24.0, 1]])
    T = np.eye(4).T
    cams = {"KRT": [
        {"cameraId": f"cam{i}", "K": K.tolist(), "T": T.tolist()}
        for i in range(2)]}
    with open(os.path.join(root, "cameras.json"), "w") as f:
        json_mod.dump(cams, f)

    # a 2-triangle quad with UVs mapping to a 2x2 texture
    obj = """
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vt 0.25 0.25
vt 0.75 0.25
vt 0.75 0.75
vt 0.25 0.75
f 1/1 2/2 3/3
f 1/1 3/3 4/4
"""
    with open(os.path.join(root, "mesh.obj"), "w") as f:
        f.write(obj)
    tex = np.zeros((16, 16, 3), np.uint8)
    tex[8:, :8] = [255, 0, 0]    # uv (0.25,0.25) -> bottom-left quadrant
    tex[8:, 8:] = [0, 255, 0]    # uv (0.75,0.25)
    tex[:8, 8:] = [0, 0, 255]    # uv (0.75,0.75)
    tex[:8, :8] = [255, 255, 0]  # uv (0.25,0.75)
    Image.fromarray(tex).save(os.path.join(root, "mesh.jpg"), quality=95)

    xyz, rgb = load_mesh_points(os.path.join(root, "mesh.obj"),
                                os.path.join(root, "mesh.jpg"))
    assert xyz.shape == (4, 3)
    # jpeg compression wiggles values; check dominant channels
    assert rgb[0].argmax() == 0 and rgb[1].argmax() == 1
    assert rgb[2].argmax() == 2

    info = read_metashape_scene(root, init_type="sfm", eval_split=True)
    assert info.point_cloud.points.shape == (4, 3)
    assert len(info.train_cameras) == 2 and len(info.test_cameras) == 2

    info_r = read_metashape_scene(root, init_type="random", num_pts=64)
    assert info_r.point_cloud.points.shape == (64, 3)
