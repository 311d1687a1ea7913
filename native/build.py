"""Build the native audio ingestion library: native/libaudiodec.so.

Usage: python native/build.py [--debug]
Plain g++; no external dependencies.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

HERE = Path(__file__).parent


def build(debug: bool = False) -> Path:
    src = HERE / "audiodec.cpp"
    out = HERE / "libaudiodec.so"
    flags = ["-O0", "-g"] if debug else ["-O3", "-funroll-loops"]
    cmd = [
        "g++", "-std=c++17", "-shared", "-fPIC", *flags,
        "-Wall", "-Wextra", "-o", str(out), str(src), "-lpthread",
    ]
    print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    print(f"built {out}")
    return out


if __name__ == "__main__":
    build(debug="--debug" in sys.argv)
