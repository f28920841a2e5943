"""Inference-precision helpers (the reference's --use-half analogue)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_params_bf16(params):
    """Cast every fp32 leaf to bf16, leaving ints and other dtypes
    untouched — the TPU counterpart of the reference's model.half()
    inference mode (reference eval_zeroshot.py:142 etc.). Halves the
    per-step weight stream of HBM-bound decode (docs/PERF.md). Used by
    the --bf16 / --bf16-params flags of the eval/infer CLIs and
    bench.py; keep the rule identical everywhere."""
    return jax.tree.map(
        lambda p: p.astype(jnp.bfloat16)
        if p.dtype == jnp.float32 else p, params)
