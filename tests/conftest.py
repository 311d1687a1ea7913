"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the platform flags before jax is imported anywhere, so this executes
at conftest import time (pytest imports conftest before test modules).
"""

import os

# Force CPU: the session may pre-set JAX_PLATFORMS to a TPU platform.
os.environ["JAX_PLATFORMS"] = "cpu"
_prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _prev:
    os.environ["XLA_FLAGS"] = (
        _prev + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# A TPU plugin may have been registered by a sitecustomize hook before this
# file runs, in which case the env var alone is ignored — force via config.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

# Build the native audio library if it is missing or older than its source
# (the .so is gitignored): ~5 s of g++ once makes the whole suite
# self-contained — without it, the native decoder/pipeline tests skip.
try:
    from pathlib import Path as _Path

    _so = _Path(__file__).parent.parent / "native" / "libaudiodec.so"
    _src = _so.with_name("audiodec.cpp")
    if _src.exists() and (
            not _so.exists() or _so.stat().st_mtime < _src.stat().st_mtime):
        import subprocess
        import sys as _sys

        subprocess.run(
            [_sys.executable, str(_so.parent / "build.py")],
            check=True, capture_output=True, timeout=300,
        )
except Exception as _e:  # no toolchain: the gated tests skip as before
    print(f"conftest: native build skipped ({_e})")


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def tmp_workspace(tmp_path, monkeypatch):
    """A temp artifact root with tiny synthetic AudioSet-style metadata."""
    from tests.fixtures import make_workspace

    monkeypatch.setenv("AUDIO_TOKENS_HOME", str(tmp_path))
    make_workspace(tmp_path)
    return tmp_path
