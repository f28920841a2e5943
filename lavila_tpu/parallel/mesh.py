"""Device mesh construction and data/param placement.

Replaces the reference's NCCL process-group bootstrap
(reference: lavila/utils/distributed.py:76-102) with the JAX SPMD model:
one process per host, a global ``Mesh`` over all chips, and sharding
annotations instead of DDP wrappers. Gradient reduction, optimizer-state
sharding (the reference's ZeroRedundancyOptimizer,
reference main_pretrain.py:216-219) and the contrastive all-gather all
fall out of GSPMD partitioning — no custom communication code.

Axes:
  data  — batch parallelism (DDP + ZeRO-1 equivalent)
  model — tensor parallelism for wide layers (optional; size 1 = off)
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(data: int = -1, model: int = 1,
                devices: Optional[list] = None) -> Mesh:
    """Build a (data, model) mesh. ``data=-1`` → use all remaining chips."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        if n % model != 0:
            raise ValueError(
                f"create_mesh: {n} visible device(s) not divisible by "
                f"model={model}. Pass an explicit `devices=` list or a "
                f"model-axis size that divides the device count.")
        data = n // model
    if data * model != n:
        raise ValueError(
            f"create_mesh: requested data={data} × model={model} = "
            f"{data * model} devices but {n} are visible "
            f"({[d.platform for d in devices[:4]]}...). On a single chip "
            f"use data=1, model=1; for a virtual multi-device CPU mesh set "
            f"jax.config jax_platforms='cpu' and jax_num_cpu_devices=N "
            f"(or XLA_FLAGS=--xla_force_host_platform_device_count=N) "
            f"BEFORE the first device query.")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params, mesh: Mesh, rules=None):
    """Place a param pytree on the mesh. ``rules(path, shape) -> P`` maps
    each leaf to a PartitionSpec (default: fully replicated)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def place(path, leaf):
        spec = rules(path, leaf.shape) if rules is not None else P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    placed = {jax.tree_util.keystr(p): place(p, l) for p, l in flat}
    treedef = jax.tree_util.tree_structure(params)
    leaves = [placed[jax.tree_util.keystr(p)] for p, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def shard_batch(batch, mesh: Mesh):
    """Place a host batch on the mesh with the leading dim over 'data'.

    Single-process: a plain sharded ``device_put``. Multi-process (pod):
    each host passes only its OWN loader shard (global_batch /
    process_count rows) and the global array is assembled from the
    process-local pieces — the JAX analogue of the reference's per-rank
    DistributedSampler batches (reference main_pretrain.py:229-235)."""
    sh = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        batch)
