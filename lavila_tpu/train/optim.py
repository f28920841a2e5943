"""Optimizer, LR schedule and weight-decay masking.

Mirrors the reference training recipe (reference: main_pretrain.py:199-222,
lavila/utils/scheduler.py:10-21) with optax:

  * AdamW with two param groups — weight decay only on matrices; biases,
    norms, embeddings-like 1-D params and scalar gates get wd=0
    (reference groups on p.ndim < 2 / name heuristics).
  * cosine schedule with linear warmup, stepped per OPTIMIZER iteration.
  * gradient accumulation via optax.MultiSteps (reference --update-freq).
  * optional global-norm or value clipping (reference --clip-grad-*).
  * logit_scale clamped to [0, 4.6052] post-update
    (reference main_pretrain.py:527-529).

Optimizer-state ZeRO sharding falls out of pjit: optax states mirror the
param pytree, so sharding rules applied to params apply to the opt state.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lavila_tpu.losses import LOGIT_SCALE_MAX


def cosine_schedule(base_lr: float, final_lr: float, epochs: int,
                    steps_per_epoch: int, warmup_epochs: int = 0,
                    start_warmup_lr: float = 0.0) -> optax.Schedule:
    """Linear warmup + cosine decay, same curve as the reference's
    precomputed numpy schedule (reference scheduler.py:10-21)."""
    warmup_steps = warmup_epochs * steps_per_epoch
    total = epochs * steps_per_epoch
    decay_steps = max(total - warmup_steps, 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = start_warmup_lr + (base_lr - start_warmup_lr) * (
            step / jnp.maximum(warmup_steps, 1))
        t = (step - warmup_steps) / decay_steps
        cos = final_lr + 0.5 * (base_lr - final_lr) * (
            1.0 + jnp.cos(jnp.pi * t))
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


def _no_decay(path, leaf) -> bool:
    """Reference grouping (main_pretrain.py:199-206): exempt only
    ndim < 2 params and bias / ln / bn names. Token embeddings, the
    patch-embed conv kernel and ndim>=2 positional/cls embeds DO receive
    weight decay, exactly like the reference recipe."""
    names = [str(getattr(k, "key", getattr(k, "name", ""))) for k in path]
    joined = "/".join(names).lower()
    if leaf.ndim < 2:
        return True  # biases, LN scales, gates, logit_scale ...
    for tag in ("bias", "ln", "bn"):
        if tag in joined:
            return True
    return False


def wd_mask(params):
    """True where weight decay applies."""
    return jax.tree_util.tree_map_with_path(
        lambda p, l: not _no_decay(p, l), params)


def make_optimizer(
    lr: float | optax.Schedule,
    weight_decay: float = 0.01,
    betas: tuple[float, float] = (0.9, 0.999),
    eps: float = 1e-8,
    clip_grad_value: Optional[float] = None,
    clip_grad_type: str = "norm",
    update_freq: int = 1,
    use_sgd: bool = False,
    momentum: float = 0.9,
) -> optax.GradientTransformation:
    chain = []
    if clip_grad_value is not None:
        if clip_grad_type == "norm":
            chain.append(optax.clip_by_global_norm(clip_grad_value))
        elif clip_grad_type == "value":
            chain.append(optax.clip(clip_grad_value))
        else:
            raise ValueError(clip_grad_type)
    if use_sgd:
        chain.append(optax.sgd(lr, momentum=momentum))
        if weight_decay:
            chain.insert(-1, optax.add_decayed_weights(
                weight_decay, mask=wd_mask))
    else:
        chain.append(optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps,
                                 weight_decay=weight_decay, mask=wd_mask))
    tx = optax.chain(*chain)
    if update_freq > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=update_freq)
    return tx


def clamp_logit_scale(params):
    """Clamp any 'logit_scale' leaves into [0, log 100]."""

    def clamp(path, leaf):
        names = [str(getattr(k, "key", getattr(k, "name", ""))) for k in path]
        if names and "logit_scale" in names[-1]:
            return jnp.clip(leaf, 0.0, LOGIT_SCALE_MAX)
        return leaf

    return jax.tree_util.tree_map_with_path(clamp, params)


def lr_multiplier_labels(params, backbone_prefixes=("vision_model",
                                                    "visual")):
    """Label tree for optax.multi_transform: 'backbone' vs 'head' — used by
    fine-tune classification's --lr-multiplier-on-backbone
    (reference main_finetune_classification.py:189-209)."""

    def label(path, leaf):  # noqa: ARG001
        names = [str(getattr(k, "key", getattr(k, "name", ""))) for k in path]
        return "backbone" if any(n in backbone_prefixes for n in names) \
            else "head"

    return jax.tree_util.tree_map_with_path(label, params)
