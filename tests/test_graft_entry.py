"""Driver-contract regression tests for ``__graft_entry__``.

Round-1 post-mortem: the driver's multichip dryrun crashed because eager
array creation landed on the machine's default (broken) TPU backend. These
tests pin the hermeticity contract: the dryrun must only ever touch the CPU
backend, and must self-repair (subprocess re-exec) when the CPU client has
too few virtual devices.
"""

import os
import subprocess
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import __graft_entry__ as graft  # noqa: E402


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


def test_dryrun_never_touches_default_backend(monkeypatch):
    """Simulate an evil default platform: any jax.devices() call that is not
    explicitly for the CPU backend raises, standing in for a TPU plugin that
    dies at initialization. The dryrun must still pass."""
    real_devices = jax.devices

    def guarded(backend=None):
        if backend != "cpu":
            raise RuntimeError(
                "default backend touched — dryrun is not hermetic"
            )
        return real_devices("cpu")

    monkeypatch.setattr(jax, "devices", guarded)
    graft.dryrun_multichip(8)


def test_dryrun_multiprocess_two_procs():
    """The driver-facing multi-host hook: two real jax.distributed processes
    run DP training + sharded streaming K-means and must agree bit-exactly
    (replicated outputs compared inside the hook)."""
    graft.dryrun_multiprocess(2)


def test_entry_forward_finite():
    fn, (params, tokens) = graft.entry()
    logits = jax.jit(fn)(params, tokens)
    assert logits.shape == (tokens.shape[0], 543)
    assert bool(np.isfinite(np.asarray(logits)).all())


@pytest.mark.slow
def test_dryrun_reexec_from_starved_cpu_client():
    """Run the dryrun in a child whose CPU backend has only 1 device; it must
    detect the shortfall and re-exec a grandchild with 8 virtual devices."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import __graft_entry__ as g; g.dryrun_multichip(8)"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "dryrun_multichip OK" in proc.stdout
