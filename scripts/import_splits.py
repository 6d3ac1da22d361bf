#!/usr/bin/env python
"""Import KITTI split file-lists into ./splits from an existing PlaneDepth/
monodepth2-style checkout.

The split lists (eigen_full, eigen_full_left, eigen_zhou, odom, benchmark,
eigen_raw/improved/benchmark test lists, eigen_to_benchmark_ids.npy) are
curated data artifacts, not code.  The repository now VENDORS them in
./splits, so this tool is only needed to refresh or replace them from
another checkout.

Usage:
    python scripts/import_splits.py /path/to/PlaneDepth/splits
"""
import os
import shutil
import sys


def main():
    if len(sys.argv) != 2:
        print(__doc__)
        sys.exit(1)
    src = sys.argv[1]
    dst = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "splits")
    n = 0
    for root, _, files in os.walk(src):
        rel = os.path.relpath(root, src)
        for f in files:
            if f.endswith((".txt", ".npy")):
                os.makedirs(os.path.join(dst, rel), exist_ok=True)
                shutil.copyfile(
                    os.path.join(root, f), os.path.join(dst, rel, f)
                )
                n += 1
    print(f"imported {n} split files into {dst}")


if __name__ == "__main__":
    main()
