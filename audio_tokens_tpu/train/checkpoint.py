"""Orbax checkpointing: params (+ optimizer state + step) with a best-metric
policy.

The reference saved bare ``state_dict`` weights on val-mAP improvement and
could not resume training (SURVEY.md §5 checkpoint/resume).  Here checkpoints
carry params, optimizer state, step and the metric, so training resumes
exactly; ``load_params`` serves inference.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Any, Tuple

import jax
import orbax.checkpoint as ocp

logger = logging.getLogger(__name__)

# Orbax floods INFO with internal save-thread chatter; keep stage logs readable.
for _name in ("orbax", "absl", "orbax.checkpoint"):
    logging.getLogger(_name).setLevel(logging.WARNING)


def save_checkpoint(
    directory: str | Path,
    name: str,
    params: Any,
    opt_state: Any = None,
    step: int = 0,
    metric: float = 0.0,
    epoch: int = 0,
    extra: dict | None = None,
) -> Path:
    """Write a checkpoint ATOMICALLY: build under a temp name, then rename
    over the previous best.  Deleting first and saving in place would leave
    no loadable checkpoint if the process dies mid-save (preemptible TPU
    VMs make that window real); meta.json is written inside the temp dir so
    a visible checkpoint always has complete metadata."""
    import os
    import shutil

    path = (Path(directory) / name).absolute()
    path.parent.mkdir(parents=True, exist_ok=True)
    # reap scratch dirs from ANY pid — a preempted run leaves its
    # checkpoint-sized `.tmp.<pid>` / `.old.<pid>` behind, and a new
    # process (new pid) would otherwise leak one per preemption until the
    # disk fills.  Only this writer's name-prefix is touched, and the
    # single-writer discipline (process 0 owns checkpoints) makes the
    # sweep race-free.
    for stale in path.parent.glob(f"{name}.tmp.*"):
        shutil.rmtree(stale, ignore_errors=True)
    for stale in path.parent.glob(f"{name}.old.*"):
        shutil.rmtree(stale, ignore_errors=True)
    tmp = path.parent / f"{name}.tmp.{os.getpid()}"
    try:
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(tmp / "params", jax.device_get(params))
            if opt_state is not None:
                ckptr.save(tmp / "opt_state", jax.device_get(opt_state))
        meta = {"step": step, "metric": metric, "epoch": epoch}
        if extra:
            meta.update(extra)  # JSON-serializable run state (e.g. the
            # ensemble's per-member bests/history for exact resume)
        (tmp / "meta.json").write_text(json.dumps(meta))
        old = path.parent / f"{name}.old.{os.getpid()}"
        if path.exists():
            os.replace(path, old)   # rename, not rmtree: O(1) swap window
        os.replace(tmp, path)
        shutil.rmtree(old, ignore_errors=True)
    finally:
        if tmp.exists():
            shutil.rmtree(tmp, ignore_errors=True)
    logger.info("checkpoint saved: %s (step=%d metric=%.4f)", path, step, metric)
    return path


def load_meta(directory: str | Path, name: str) -> dict:
    """The checkpoint's full meta.json (step/metric/epoch + any extras)."""
    path = (Path(directory) / name).absolute()
    return json.loads((path / "meta.json").read_text())


def load_params(directory: str | Path, name: str, template: Any) -> Any:
    path = (Path(directory) / name).absolute() / "params"
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, template)


def load_checkpoint(
    directory: str | Path, name: str, params_template: Any, opt_template: Any
) -> Tuple[Any, Any, int, float, int]:
    path = (Path(directory) / name).absolute()
    meta = json.loads((path / "meta.json").read_text())
    with ocp.StandardCheckpointer() as ckptr:
        params = ckptr.restore(path / "params", params_template)
        opt_state = (
            ckptr.restore(path / "opt_state", opt_template)
            if (path / "opt_state").exists()
            else None
        )
    # "epoch" absent in pre-round-4 checkpoints: resume from epoch 0 as before
    return (params, opt_state, meta["step"], meta["metric"],
            int(meta.get("epoch", 0)))
