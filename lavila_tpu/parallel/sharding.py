"""Parameter sharding rules (tensor parallelism).

Megatron-style TP over the 'model' mesh axis for the wide transformer
layers: column-parallel for the fused QKV / MLP-in projections,
row-parallel for the attention-out / MLP-out projections. Everything
else (LayerNorms, embeddings, small projections) is replicated.

The reference has no TP (SURVEY.md §2.5); this is the TPU-native upgrade
path for GPT-2 XL narrator decode — annotate the specs, let GSPMD insert
the reduce-scatters over ICI.
"""

from __future__ import annotations

from typing import Tuple

import jax
from jax.sharding import PartitionSpec as P

# names of Dense submodules whose kernel output dim is sharded (column
# parallel) vs input dim (row parallel). 'c_attn' covers GPT-2's packed
# qkv and the cross-attention packed kv.
_COL_PARALLEL = ("qkv", "in_proj", "fc1", "c_fc", "q_lin", "k_lin", "v_lin",
                 "to_q", "to_kv", "q_attn", "c_attn")
_ROW_PARALLEL = ("proj", "out_proj", "fc2", "c_proj", "out_lin", "to_out")


def _path_names(path) -> list[str]:
    names = []
    for k in path:
        if hasattr(k, "key"):
            names.append(str(k.key))
        elif hasattr(k, "name"):
            names.append(str(k.name))
    return names


def param_sharding_rules(path: Tuple, shape: Tuple[int, ...]) -> P:
    """Map a flax param path to a PartitionSpec over ('data', 'model')."""
    names = _path_names(path)
    leaf = names[-1] if names else ""
    parent = names[-2] if len(names) >= 2 else ""
    # 'patch_embed' convs, norms, scalars: replicate
    if len(shape) < 2 and leaf != "bias":
        return P()
    if parent in _COL_PARALLEL:
        if leaf == "kernel" and len(shape) == 2:
            return P(None, "model")
        if leaf == "bias":
            return P("model")
    if parent in _ROW_PARALLEL:
        if leaf == "kernel" and len(shape) == 2:
            return P("model", None)
        if leaf == "bias":
            return P()  # row-parallel bias added after the psum
    return P()


def replicated_rules(path, shape) -> P:  # noqa: ARG001
    return P()
