#!/usr/bin/env python
"""Offline COLMAP pose preprocessing (replaces the reference's in-loader
subprocess pipeline, mono_dataset.py:217-264).

For every sample of a split, runs COLMAP (feature_extractor ->
exhaustive_matcher -> mapper -> model_converter) on the stereo pair +
temporal neighbors, rectifies the recovered poses relative to the left
camera, rescales the baseline to 0.1 model units, and caches
``poses.npy`` / ``poses_flip.npy`` per frame — exactly the files the
data loader consumes (data/kitti.py).

Running this OFFLINE (instead of inside DataLoader workers) removes the
reference's data-dependent trainer stalls and its None-batch handling.

Usage:
    python scripts/colmap_preprocess.py --data_path ... --split eigen_zhou \
        --colmap_path ./kitti_colmap --novel_frame_ids -1 1
"""
from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from planedepth_tpu.data.kitti import (  # noqa: E402
    KITTIRAWDataset,
    readlines,
    split_path,
)


def qvec2rotmat(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * w * z,
         2 * z * x + 2 * w * y],
        [2 * x * y + 2 * w * z, 1 - 2 * x * x - 2 * z * z,
         2 * y * z - 2 * w * x],
        [2 * z * x - 2 * w * y, 2 * y * z + 2 * w * x,
         1 - 2 * x * x - 2 * y * y],
    ], dtype=np.float32)


def rectify_poses(images_txt: str, novel_frame_ids, img_ext: str):
    """COLMAP images.txt -> pose dicts relative to the left/right camera,
    baseline-rescaled to 0.1 (reference mono_dataset.py:284-320)."""
    poses = {}
    for line in readlines(images_txt):
        parts = line.split()
        if len(parts) == 10 and parts[-1].endswith(img_ext):
            R = qvec2rotmat(list(map(float, parts[1:5])))
            t = np.array(list(map(float, parts[5:8])), dtype=np.float32)
            stem = parts[-1][: -len(img_ext)]
            frame_id, side = int(stem[:-1]), stem[-1]
            Rt = np.eye(4, dtype=np.float32)
            Rt[:3, :3] = R
            Rt[:3, 3] = t
            poses[(frame_id, side)] = Rt

    def relative(ref_key, other_side):
        ref_inv = np.linalg.inv(poses[ref_key])
        Rt_pair = poses[(0, other_side)] @ ref_inv
        scale = np.linalg.norm(Rt_pair[:3, 3]) / 0.1
        out = {}
        for f in novel_frame_ids:
            Rt = poses[(f, ref_key[1])] @ ref_inv
            Rt[:3, 3] /= scale
            out[("Rt", f)] = Rt
        return out

    original = relative((0, "l"), "r")
    flipped = relative((0, "r"), "l")
    for f in novel_frame_ids:
        M = flipped[("Rt", f)]
        M[0, 1:] *= -1.0
        M[1:, 0] *= -1.0
    return original, flipped


def run_colmap(workdir: str, image_dir: str):
    db = os.path.join(workdir, "database.db")
    subprocess.run(
        f"colmap feature_extractor --database_path {db} --image_path "
        f"{image_dir} --ImageReader.camera_model PINHOLE "
        f"--ImageReader.camera_params 720.36,720,621,187.5 "
        f"--SiftExtraction.max_image_size 4096 --ImageReader.single_camera 1",
        shell=True, check=True, stdout=subprocess.DEVNULL,
    )
    subprocess.run(
        f"colmap exhaustive_matcher --database_path {db} "
        f"--SiftMatching.confidence 0.85 --SiftMatching.min_num_inliers 5",
        shell=True, check=True, stdout=subprocess.DEVNULL,
    )
    os.makedirs(os.path.join(workdir, "sparse"), exist_ok=True)
    subprocess.run(
        f"colmap mapper --database_path {db} --image_path {image_dir} "
        f"--output_path {workdir} --Mapper.init_max_forward_motion 1 "
        f"--Mapper.init_min_tri_angle 0.25",
        shell=True, check=True, stdout=subprocess.DEVNULL,
    )
    subprocess.run(
        f"colmap model_converter --input_path {os.path.join(workdir, '0')} "
        f"--output_path {workdir} --output_type TXT",
        shell=True, check=True, stdout=subprocess.DEVNULL,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_path", required=True)
    ap.add_argument("--split", default="eigen_zhou")
    ap.add_argument("--colmap_path", default="./kitti_colmap")
    ap.add_argument("--novel_frame_ids", nargs="+", type=int, default=[-1, 1])
    ap.add_argument("--img_ext", default=".jpg")
    args = ap.parse_args()

    files = readlines(split_path(args.split, "train"))
    ds = KITTIRAWDataset(args.data_path, files, 192, 640,
                         args.novel_frame_ids, img_ext=args.img_ext)
    done = failed = 0
    for line in files:
        parts = line.split()
        folder = parts[0]
        fidx = int(parts[1]) if len(parts) == 3 else 0
        out_dir = os.path.join(args.colmap_path, folder, f"{fidx:010d}")
        if os.path.exists(os.path.join(out_dir, "poses.npy")):
            done += 1
            continue
        try:
            img_dir = os.path.join(out_dir, "images")
            os.makedirs(img_dir, exist_ok=True)
            for f in [0] + list(args.novel_frame_ids):
                for side in ("l", "r"):
                    src = ds.get_image_path(folder, fidx + f, side)
                    shutil.copyfile(
                        src, os.path.join(img_dir, f"{f}{side}{args.img_ext}")
                    )
            run_colmap(out_dir, img_dir)
            orig, flip = rectify_poses(
                os.path.join(out_dir, "images.txt"),
                args.novel_frame_ids, args.img_ext,
            )
            np.save(os.path.join(out_dir, "poses.npy"), orig)
            np.save(os.path.join(out_dir, "poses_flip.npy"), flip)
            shutil.rmtree(img_dir)
            done += 1
        except Exception as e:
            failed += 1
            print(f"FAILED {line}: {e}")
    print(f"done {done}, failed {failed}")


if __name__ == "__main__":
    main()
