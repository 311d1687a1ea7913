"""Device mesh + sharding helpers.

The communication layer of the framework: everything multi-chip goes through
a ``jax.sharding.Mesh`` with named axes and XLA collectives — the TPU-native
replacement for the NCCL/DDP layer the reference never had (SURVEY.md §2.6).

Axes:
  * ``data``     — batch / point sharding (DP training, sharded K-means);
  * ``sequence`` — sequence (frame-axis) sharding of transformer activations
                   (optional; full-clip attention — SURVEY.md §5 reserves
                   this axis);
  * ``model``    — tensor-parallel sharding of transformer weights (optional).

Collectives ride ICI within a slice; lay DCN-spanning meshes out so ``data``
is the outer (DCN) axis — ``make_mesh`` orders axes (data, sequence, model)
so the chattiest axis (model) is innermost.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = -1, model: int = 1, seq: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Mesh with ('data', 'model') axes — plus a 'sequence' axis between them
    when ``seq > 1`` (activation sequence parallelism; the 2-axis shape is
    kept when seq == 1 so existing DP/TP programs are unchanged).
    data=-1 uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        if n % (model * seq):
            raise ValueError(
                f"{n} devices not divisible by model={model} x seq={seq}")
        data = n // (model * seq)
    if data * model * seq > n:
        raise ValueError(f"mesh {data}x{seq}x{model} exceeds {n} devices")
    if seq > 1:
        grid = np.array(devices[: data * seq * model]).reshape(data, seq, model)
        return Mesh(grid, axis_names=("data", "sequence", "model"))
    grid = np.array(devices[: data * model]).reshape(data, model)
    return Mesh(grid, axis_names=("data", "model"))


def data_mesh(config=None, min_devices: int = 2, local: bool = False,
              devices: Optional[Sequence] = None) -> Optional[Mesh]:
    """1-D data mesh over all devices, or None when a single device suffices
    (single-device programs skip shard_map entirely).

    ``local=True`` builds the mesh from THIS process's devices only — for
    embarrassingly-parallel stage work (e.g. tokenizing a per-process file
    shard) where each process runs an independent program.  Global meshes
    (the default) span every process; ``jax.devices()`` orders devices
    process-major, so the ``data`` axis is the DCN-outer axis, exactly the
    layout SURVEY.md §5 asks for (collectives ride ICI within a process's
    slice, DCN only between processes)."""
    if devices is None:
        devices = jax.local_devices() if local else jax.devices()
    devices = list(devices)
    want = getattr(config, "data_parallel", -1) if config is not None else -1
    if want == -1:
        want = len(devices)
    want = min(want, len(devices))
    if want < min_devices:
        return None
    return Mesh(np.array(devices[:want]), axis_names=("data",))


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Device-put a host batch with its leading dim sharded over ``axis``."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def replicated(mesh: Mesh, tree):
    """Device-put a pytree fully replicated over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def tp_param_specs(params, rules) -> dict:
    """PartitionSpec tree for a params pytree from (path-substring, axes)
    rules; unmatched params are replicated.

    ``rules`` come from the model (e.g. ``models.transformer.TP_RULES``);
    paths are '/'-joined flax param paths.
    """

    def spec_for(path, leaf):
        path_str = "/".join(str(getattr(k, "key", k)) for k in path)
        for substr, axes in rules:
            if substr in path_str:
                if len(axes) != leaf.ndim:
                    raise ValueError(
                        f"rule {substr}: {len(axes)} axes vs {leaf.ndim}-d param {path_str}"
                    )
                return P(*axes)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def tp_shardings(mesh: Mesh, params, rules):
    """NamedSharding tree for params under TP rules."""
    specs = tp_param_specs(params, rules)
    return jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs,
                                  is_leaf=lambda x: isinstance(x, P))
