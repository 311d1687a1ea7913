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
) -> Path:
    path = (Path(directory) / name).absolute()
    if path.exists():
        import shutil

        shutil.rmtree(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path / "params", jax.device_get(params))
        if opt_state is not None:
            ckptr.save(path / "opt_state", jax.device_get(opt_state))
    (path / "meta.json").write_text(json.dumps({"step": step, "metric": metric}))
    logger.info("checkpoint saved: %s (step=%d metric=%.4f)", path, step, metric)
    return path


def load_params(directory: str | Path, name: str, template: Any) -> Any:
    path = (Path(directory) / name).absolute() / "params"
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, template)


def load_checkpoint(
    directory: str | Path, name: str, params_template: Any, opt_template: Any
) -> Tuple[Any, Any, int, float]:
    path = (Path(directory) / name).absolute()
    meta = json.loads((path / "meta.json").read_text())
    with ocp.StandardCheckpointer() as ckptr:
        params = ckptr.restore(path / "params", params_template)
        opt_state = (
            ckptr.restore(path / "opt_state", opt_template)
            if (path / "opt_state").exists()
            else None
        )
    return params, opt_state, meta["step"], meta["metric"]
