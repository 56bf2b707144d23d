"""Build the native data-plane library with g++.

Usage: python -m ihmr_tpu.native.build  (or it is invoked lazily on first
import of ihmr_tpu.native). Produces _data_kernels.so next to the sources.
"""

from __future__ import annotations

import os.path as osp
import subprocess
import sys

HERE = osp.dirname(osp.abspath(__file__))
SRC = osp.join(HERE, "data_kernels.cpp")
LIB = osp.join(HERE, "_data_kernels.so")


def build(force: bool = False) -> str:
    if not force and osp.exists(LIB) and osp.getmtime(LIB) >= osp.getmtime(SRC):
        return LIB
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-std=c++17",
        "-pthread",
        SRC,
        "-o",
        LIB,
    ]
    subprocess.run(cmd, check=True)
    return LIB


if __name__ == "__main__":
    print(build(force="--force" in sys.argv))
