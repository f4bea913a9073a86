"""Build the native helper library: python -m avatar_tpu.native.build"""

from __future__ import annotations

import os
import subprocess


def build(verbose: bool = True) -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "src", "avatar_native.cpp")
    out = os.path.join(here, "libavatar_native.so")
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-pthread", src, "-o", out]
    if verbose:
        print(" ".join(cmd))
    subprocess.check_call(cmd)
    return out


if __name__ == "__main__":
    path = build()
    print(f"built {path}")
