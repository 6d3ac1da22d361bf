#!/usr/bin/env python
"""Build native/pdnative.cpp -> native/libpdnative.so with g++.

The loader (planedepth_tpu/data/native.py) falls back to pure numpy when
the shared object is missing, so this build is optional but recommended —
the bicubic resample is ~10x faster native.
"""
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "native", "pdnative.cpp")
OUT = os.path.join(ROOT, "native", "libpdnative.so")


def main():
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        "-ffast-math", "-fno-finite-math-only",
        SRC, "-o", OUT,
    ]
    print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    print(f"built {OUT}")


if __name__ == "__main__":
    main()
