#!/usr/bin/env python
"""COLMAP preprocessing CLI.

Capability parity with `/root/reference/convert.py:1-124`: drives the
`colmap` binary through feature extraction, exhaustive matching, mapping,
and image undistortion; with `--camera OPENCV_FISHEYE` it produces the
paired trees the fisheye pipeline expects — `images/` (undistorted
perspective) next to `fish/images` (raw fisheye) plus `fish/sparse`
(README.md:150-186).
"""

import argparse
import os
import shutil
import subprocess
import sys


def run(cmd):
    print("+", " ".join(cmd), flush=True)
    result = subprocess.run(cmd)
    if result.returncode != 0:
        print(f"command failed with code {result.returncode}")
        sys.exit(result.returncode)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--source_path", "-s", required=True)
    p.add_argument("--camera", default="OPENCV",
                   help="COLMAP camera model (OPENCV, OPENCV_FISHEYE, ...)")
    p.add_argument("--colmap_executable", default="colmap")
    p.add_argument("--no_gpu", action="store_true")
    p.add_argument("--skip_matching", action="store_true")
    p.add_argument("--resize", action="store_true")
    args = p.parse_args(argv)

    colmap = args.colmap_executable
    if shutil.which(colmap) is None:
        print(f"error: '{colmap}' not found on PATH — install COLMAP or "
              "pass --colmap_executable")
        sys.exit(1)
    src = args.source_path
    use_gpu = "0" if args.no_gpu else "1"

    if not args.skip_matching:
        os.makedirs(os.path.join(src, "distorted", "sparse"), exist_ok=True)
        run([colmap, "feature_extractor",
             "--database_path", os.path.join(src, "distorted", "database.db"),
             "--image_path", os.path.join(src, "input"),
             "--ImageReader.single_camera", "1",
             "--ImageReader.camera_model", args.camera,
             "--SiftExtraction.use_gpu", use_gpu])
        run([colmap, "exhaustive_matcher",
             "--database_path", os.path.join(src, "distorted", "database.db"),
             "--SiftMatching.use_gpu", use_gpu])
        run([colmap, "mapper",
             "--database_path", os.path.join(src, "distorted", "database.db"),
             "--image_path", os.path.join(src, "input"),
             "--output_path", os.path.join(src, "distorted", "sparse"),
             "--Mapper.ba_global_function_tolerance=0.000001"])

    # Undistort into the canonical images/ + sparse/0 layout.
    run([colmap, "image_undistorter",
         "--image_path", os.path.join(src, "input"),
         "--input_path", os.path.join(src, "distorted", "sparse", "0"),
         "--output_path", src,
         "--output_type", "COLMAP"])
    sparse = os.path.join(src, "sparse")
    os.makedirs(os.path.join(sparse, "0"), exist_ok=True)
    for f in os.listdir(sparse):
        if f == "0":
            continue
        shutil.move(os.path.join(sparse, f), os.path.join(sparse, "0", f))

    if "FISHEYE" in args.camera:
        # Preserve the raw fisheye captures + their reconstruction under
        # fish/ so training can pair each undistorted image with its raw GT
        # (utils/camera_utils.py:55-67 lookup convention).
        fish = os.path.join(src, "fish")
        os.makedirs(os.path.join(fish), exist_ok=True)
        if not os.path.exists(os.path.join(fish, "images")):
            shutil.copytree(os.path.join(src, "input"),
                            os.path.join(fish, "images"))
        if not os.path.exists(os.path.join(fish, "sparse")):
            shutil.copytree(os.path.join(src, "distorted", "sparse"),
                            os.path.join(fish, "sparse"))
    print("Done.")


if __name__ == "__main__":
    main()
