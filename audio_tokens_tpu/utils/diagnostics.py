"""Model diagnostics: gradient-flow report + loss-landscape plot.

Equivalent of the reference's ModelDiagnostics (model_diagnostics.py:8-99),
which was wired in but disabled and crashed on the current batch format
(SURVEY.md §2.7.6).  Here both diagnostics work against the trainer's actual
batch dict and are pure functions of (params, batch):

  * ``gradient_flow``     — per-layer mean/max |grad| table (+ optional bar
    chart), computed in one backward pass;
  * ``loss_landscape``    — val loss on a grid spanned by two random
    filter-normalized directions in parameter space (Li et al. 2018 style,
    which the reference approximated with raw random directions).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

logger = logging.getLogger(__name__)


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def gradient_flow(
    loss_fn: Callable, params, plot_path: Optional[Path] = None
) -> Dict[str, Dict[str, float]]:
    """Per-parameter mean/max absolute gradient (reference :52-99).

    One jitted program computes every stat and ONE device_get fetches the
    whole tree — per-scalar fetches cost ~25 ms each on remote TPU setups.
    """

    @jax.jit
    def stats(params):
        grads = jax.grad(loss_fn)(params)
        return jax.tree_util.tree_map(
            lambda g: (jnp.abs(g).mean(), jnp.abs(g).max()), grads
        )

    host_stats = jax.device_get(stats(params))
    report: Dict[str, Dict[str, float]] = {}
    for path, (mean_g, max_g) in jax.tree_util.tree_flatten_with_path(
        host_stats, is_leaf=lambda x: isinstance(x, tuple)
    )[0]:
        name = _path_str(path)
        report[name] = {
            "mean_abs_grad": float(mean_g),
            "max_abs_grad": float(max_g),
        }
    for name, r in report.items():
        logger.info("grad %-50s mean=%.3e max=%.3e",
                    name, r["mean_abs_grad"], r["max_abs_grad"])
    if plot_path is not None:
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            names = list(report)
            means = [report[n]["mean_abs_grad"] for n in names]
            maxes = [report[n]["max_abs_grad"] for n in names]
            fig, ax = plt.subplots(figsize=(max(8, len(names) * 0.5), 6))
            xs = np.arange(len(names))
            ax.bar(xs - 0.2, means, 0.4, label="mean |grad|")
            ax.bar(xs + 0.2, maxes, 0.4, label="max |grad|")
            ax.set_yscale("log")
            ax.set_xticks(xs)
            ax.set_xticklabels(names, rotation=90, fontsize=6)
            ax.legend()
            fig.tight_layout()
            Path(plot_path).parent.mkdir(parents=True, exist_ok=True)
            fig.savefig(plot_path)
            plt.close(fig)
        except Exception as e:
            logger.warning("gradient flow plot failed: %s", e)
    return report


def loss_landscape(
    loss_fn: Callable,
    params,
    key: jax.Array,
    span: float = 1.0,
    steps: int = 20,
    plot_path: Optional[Path] = None,
) -> np.ndarray:
    """(steps, steps) loss grid over two filter-normalized random directions."""
    k1, k2 = jax.random.split(key)

    def rand_dir(k):
        leaves, treedef = jax.tree_util.tree_flatten(params)
        ks = jax.random.split(k, len(leaves))
        dirs = []
        for leaf, kk in zip(leaves, ks):
            d = jax.random.normal(kk, leaf.shape, leaf.dtype)
            # filter-normalize: match the parameter's norm so scale is comparable
            d = d * (jnp.linalg.norm(leaf.ravel()) /
                     (jnp.linalg.norm(d.ravel()) + 1e-10))
            dirs.append(d)
        return jax.tree_util.tree_unflatten(treedef, dirs)

    d1, d2 = rand_dir(k1), rand_dir(k2)
    alphas = np.linspace(-span, span, steps)

    @jax.jit
    def loss_at(a, b):
        p = jax.tree_util.tree_map(lambda w, x, y: w + a * x + b * y, params, d1, d2)
        return loss_fn(p)

    # queue all steps^2 evaluations, then fetch once: a float() per point
    # would cost a synchronous device round-trip each (~25 ms on remote
    # setups -> ~10 s of pure link latency for the default 20x20 grid)
    rows = [[loss_at(a, b) for b in alphas] for a in alphas]
    grid = np.asarray(jax.device_get(rows), np.float32)
    if plot_path is not None:
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, ax = plt.subplots(figsize=(8, 7))
            c = ax.contourf(alphas, alphas, grid.T, levels=30)
            fig.colorbar(c)
            ax.set_title("Loss landscape")
            Path(plot_path).parent.mkdir(parents=True, exist_ok=True)
            fig.savefig(plot_path)
            plt.close(fig)
        except Exception as e:
            logger.warning("loss landscape plot failed: %s", e)
    return grid


def make_batch_loss(model, batch, use_lengths: bool):
    """Build loss_fn(params) over one fixed batch for the diagnostics above."""
    inputs = jnp.asarray(batch["inputs"])
    labels = jnp.asarray(batch["labels"])
    lengths = jnp.asarray(batch["lengths"]) if use_lengths else None
    row_w = jnp.asarray(
        (np.arange(len(batch["lengths"])) < batch["n_valid"]).astype(np.float32)
    )

    def loss_fn(params):
        logits = model.apply({"params": params}, inputs, lengths=lengths,
                             deterministic=True)
        bce = optax.sigmoid_binary_cross_entropy(logits, labels)
        return (bce * row_w[:, None]).sum() / jnp.maximum(
            row_w.sum() * labels.shape[1], 1.0
        )

    return loss_fn
