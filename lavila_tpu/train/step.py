"""Sharded training step for dual-encoder pretraining.

One jitted SPMD program replaces the reference's DDP + AMP + GradScaler +
ZeRO trio (reference main_pretrain.py:179-223, 470-530):

  * data parallel: the batch is sharded over the 'data' mesh axis; grads
    come out reduced because the loss is a function of global arrays.
  * ZeRO-1: optimizer state inherits the param shardings.
  * bf16: the model computes in bf16 (dtype arg), master params fp32 —
    no loss scaling needed on TPU.
  * global-batch InfoNCE: see lavila_tpu.losses.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from lavila_tpu import losses
from lavila_tpu.train.optim import clamp_logit_scale


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    # criterion-owned learnables (e.g. SSLCLIPLoss's logit_scale_pseudo)
    criterion_params: Any = None

    @classmethod
    def create(cls, params, tx, criterion_params=None):
        all_params = {"model": params}
        if criterion_params is not None:
            all_params["criterion"] = criterion_params
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(
                       params if criterion_params is None
                       else {"model": params, "criterion": criterion_params}),
                   criterion_params=criterion_params, tx=tx)


def make_clip_train_step(model, norm_embed: bool = False,
                         loss_fn: Callable = losses.clip_loss,
                         use_ssl: bool = False,
                         local_loss_mesh=None):
    """Returns train_step(state, batch) -> (state, metrics).

    batch: dict with 'frames' (B,T,H,W,C), 'text' (B,L) [, 'mask' (B,L)]
    [, 'gt_indicators' (B,) when use_ssl].

    ``local_loss_mesh``: a Mesh with a 'data' axis — the contrastive loss
    then runs under shard_map with each device computing only its own
    B_local × B_global logit rows (reference --contrastive-use-vissl /
    open_clip local_loss semantics, reference loss.py:85-100). Loss and
    gradients match the global path to numerical precision; only the
    logits memory footprint changes (B_global²/n per chip instead of
    B_global²).
    """
    if local_loss_mesh is not None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        def _local_clip(img, txt, scale):
            return losses.clip_loss_local(img, txt, scale,
                                          axis_name="data")

        def _local_ssl(img, txt, scale, scale_pseudo, ind):
            return losses.ssl_clip_loss_local(img, txt, scale, scale_pseudo,
                                              ind, axis_name="data")

        shmap_clip = shard_map(
            _local_clip, mesh=local_loss_mesh,
            in_specs=(P("data"), P("data"), P()), out_specs=P())
        shmap_ssl = shard_map(
            _local_ssl, mesh=local_loss_mesh,
            in_specs=(P("data"), P("data"), P(), P(), P("data")),
            out_specs=P())

    def compute_loss(packed, batch):
        params = packed["model"]
        kwargs = {}
        if "mask" in batch:
            kwargs["mask"] = batch["mask"]
        out = model.apply({"params": params}, batch["frames"], batch["text"],
                          norm_embed=norm_embed, **kwargs)
        if use_ssl:
            crit = packed["criterion"]
            scale_pseudo = jnp.exp(crit["logit_scale_pseudo"])
            if local_loss_mesh is not None:
                metrics = shmap_ssl(
                    out["image_embed"], out["text_embed"],
                    out["logit_scale"], scale_pseudo,
                    batch["gt_indicators"])
            else:
                metrics = losses.ssl_clip_loss(
                    out["image_embed"], out["text_embed"],
                    out["logit_scale"], scale_pseudo,
                    batch["gt_indicators"])
        elif local_loss_mesh is not None:
            metrics = shmap_clip(out["image_embed"], out["text_embed"],
                                 out["logit_scale"])
        else:
            metrics = loss_fn(out["image_embed"], out["text_embed"],
                              out["logit_scale"])
        return metrics["loss"], metrics

    def train_step(state: TrainState, batch):
        packed = {"model": state.params}
        if state.criterion_params is not None:
            packed["criterion"] = state.criterion_params
        grads, metrics = jax.grad(compute_loss, has_aux=True)(packed, batch)
        if state.criterion_params is None:
            grads = grads["model"]
            updates, opt_state = state.tx.update(grads, state.opt_state,
                                                 state.params)
            params = clamp_logit_scale(
                optax.apply_updates(state.params, updates))
            crit = None
        else:
            updates, opt_state = state.tx.update(grads, state.opt_state,
                                                 packed)
            new_packed = optax.apply_updates(packed, updates)
            params = clamp_logit_scale(new_packed["model"])
            crit = new_packed["criterion"]
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state, criterion_params=crit)
        return new_state, metrics

    return train_step


def make_caption_train_step(model, pad_id: int = 0):
    """Train step for the VCLM narrator (teacher-forced caption loss,
    reference CaptionLoss loss.py:220-253)."""

    def compute_loss(params, batch):
        out = model.apply({"params": params}, batch["frames"], batch["text"])
        metrics = losses.caption_loss(out["logits"], out["labels"],
                                      pad_id=pad_id)
        return metrics["loss"], metrics

    def train_step(state: TrainState, batch):
        grads, metrics = jax.grad(compute_loss, has_aux=True)(
            state.params, batch)
        updates, opt_state = state.tx.update(grads, state.opt_state,
                                             state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state), metrics

    return train_step


def make_retrieval_train_step(model, loss_type: str = "adaptive_max_margin",
                              margin: float = 0.4,
                              norm_embed: bool = False,
                              freeze_logit_scale: bool = True):
    """Fine-tune retrieval step: (Adaptive)MaxMargin over the global batch
    with EK-100 relevancy weights, or CLIPLoss for CharadesEgo
    (reference main_finetune_retrieval.py:131-160). ``freeze_logit_scale``
    zeroes the logit_scale gradient (reference line 142)."""

    def compute_loss(params, batch):
        kwargs = {}
        if "mask" in batch:
            kwargs["mask"] = batch["mask"]
        out = model.apply({"params": params}, batch["frames"], batch["text"],
                          norm_embed=norm_embed, **kwargs)
        if loss_type == "clip":
            metrics = losses.clip_loss(out["image_embed"],
                                       out["text_embed"],
                                       out["logit_scale"])
        else:
            weights = batch.get("relevancy") \
                if loss_type == "adaptive_max_margin" else None
            metrics = losses.max_margin_loss(
                out["image_embed"], out["text_embed"], margin=margin,
                weights=weights)
        return metrics["loss"], metrics

    def train_step(state: TrainState, batch):
        grads, metrics = jax.grad(compute_loss, has_aux=True)(
            state.params, batch)
        if freeze_logit_scale and "logit_scale" in grads:
            grads = dict(grads)
            grads["logit_scale"] = jnp.zeros_like(grads["logit_scale"])
        updates, opt_state = state.tx.update(grads, state.opt_state,
                                             state.params)
        params = clamp_logit_scale(
            optax.apply_updates(state.params, updates))
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state), metrics

    return train_step


def make_classifier_train_step(model, multihead: bool = False,
                               label_smoothing: float = 0.0):
    """Fine-tune classification step: CE (+ label smoothing); multihead =
    verb + noun + action CE sum (reference
    main_finetune_classification.py:453-464)."""

    def one_loss(logits, labels):
        n_cls = logits.shape[-1]
        if labels.ndim == 1:
            onehot = jax.nn.one_hot(labels, n_cls)
        else:
            onehot = labels
        if label_smoothing > 0:
            onehot = (onehot * (1 - label_smoothing)
                      + label_smoothing / n_cls)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return -jnp.mean(jnp.sum(onehot * logp, axis=-1))

    def compute_loss(params, batch, rng):
        outs = model.apply({"params": params}, batch["frames"], train=True,
                           rngs={"dropout": rng})
        if multihead:
            loss = sum(one_loss(o, l) for o, l in zip(outs, batch["labels"]))
            top1 = 100.0 * jnp.mean(
                jnp.argmax(outs[-1], -1) == batch["labels"][-1])
        else:
            loss = one_loss(outs, batch["label"])
            lab = batch["label"]
            if lab.ndim > 1:  # multi-label (charades): report loss only
                top1 = jnp.zeros(())
            else:
                top1 = 100.0 * jnp.mean(jnp.argmax(outs, -1) == lab)
        return loss, {"loss": loss, "acc1": top1}

    def train_step(state: TrainState, batch, rng):
        grads, metrics = jax.grad(compute_loss, has_aux=True)(
            state.params, batch, rng)
        updates, opt_state = state.tx.update(grads, state.opt_state,
                                             state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state), metrics

    return train_step
