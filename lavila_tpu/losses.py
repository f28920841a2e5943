"""Training losses, designed for SPMD meshes.

Rebuilds the reference loss zoo (reference: lavila/models/loss.py) the
TPU-native way. The reference needs a custom autograd all-gather
("GatherLayer", reference distributed_utils.py:51-89) to get gradients
through the global-batch negatives; under jit/shard_map JAX collectives
are differentiable by construction, so that machinery disappears:

  * global formulation — loss functions take GLOBAL (sharded) embedding
    arrays; the logits matmul between batch-sharded operands makes XLA's
    GSPMD partitioner insert the all-gathers over ICI automatically.
  * local formulation (`*_local`) — explicit shard_map path: all_gather
    the (tiny, D≈256) embeddings over the 'data' axis and compute only the
    local B_local × B_global logit rows per device. This is the
    memory-scalable equivalent of open_clip's `local_loss=True`
    (reference loss.py:85-100) and avoids materializing the full
    B_global² matrix on every chip.

All cross-entropy/softmax math accumulates in float32.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _xent(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Per-row softmax cross entropy, fp32. logits (N, C), labels (N,)."""
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    return logz - picked


def clip_loss(image_embed: jax.Array, text_embed: jax.Array,
              logit_scale: jax.Array) -> dict:
    """Symmetric InfoNCE over the (global) batch with diagonal labels
    (reference loss.py:46-118). Inputs may be sharded over 'data'; the
    matmul gathers negatives globally via GSPMD."""
    n = image_embed.shape[0]
    logits_i = logit_scale * (image_embed.astype(jnp.float32)
                              @ text_embed.astype(jnp.float32).T)
    labels = jnp.arange(n)
    loss = 0.5 * (jnp.mean(_xent(logits_i, labels))
                  + jnp.mean(_xent(logits_i.T, labels)))
    acc = 100.0 * jnp.mean(jnp.argmax(logits_i, axis=-1) == labels)
    return {"loss": loss, "clip_loss": loss, "clip_acc": acc}


def clip_loss_local(local_image: jax.Array, local_text: jax.Array,
                    logit_scale: jax.Array, axis_name: str = "data") -> dict:
    """shard_map body: per-device loss rows against globally gathered
    negatives. Must run inside shard_map/pmap with `axis_name` bound.

    Every device holds (B_local, D) shards; embeddings are all-gathered
    (D is small), logits stay (B_local, B_global)."""
    idx = jax.lax.axis_index(axis_name)
    b = local_image.shape[0]
    all_image = jax.lax.all_gather(local_image, axis_name, tiled=True)
    all_text = jax.lax.all_gather(local_text, axis_name, tiled=True)
    labels = idx * b + jnp.arange(b)

    logits_i = logit_scale * (local_image.astype(jnp.float32)
                              @ all_text.astype(jnp.float32).T)
    logits_t = logit_scale * (local_text.astype(jnp.float32)
                              @ all_image.astype(jnp.float32).T)
    loss = 0.5 * (jnp.mean(_xent(logits_i, labels))
                  + jnp.mean(_xent(logits_t, labels)))
    loss = jax.lax.pmean(loss, axis_name)
    acc = 100.0 * jnp.mean(jnp.argmax(logits_i, axis=-1) == labels)
    acc = jax.lax.pmean(acc, axis_name)
    return {"loss": loss, "clip_loss": loss, "clip_acc": acc}


def ssl_clip_loss(image_embed: jax.Array, text_embed: jax.Array,
                  logit_scale: jax.Array, logit_scale_pseudo: jax.Array,
                  gt_indicators: jax.Array) -> dict:
    """Two-temperature InfoNCE for mixed human/pseudo narrations
    (reference loss.py:121-217). Pair temperature by gt indicator sum:
    0 (pseudo·pseudo) → pseudo scale, 2 (gt·gt) → scale,
    1 (mixed) → geometric mean."""
    n = image_embed.shape[0]
    ind = gt_indicators.astype(jnp.float32)
    mask = ind[None, :] + ind[:, None]          # (n, n) in {0, 1, 2}
    scale_mat = jnp.where(
        mask == 0, logit_scale_pseudo,
        jnp.where(mask == 2, logit_scale,
                  jnp.sqrt(logit_scale * logit_scale_pseudo)))
    sims = (image_embed.astype(jnp.float32)
            @ text_embed.astype(jnp.float32).T)
    logits_i = scale_mat * sims
    logits_t = logits_i.T
    labels = jnp.arange(n)
    loss = 0.5 * (jnp.mean(_xent(logits_i, labels))
                  + jnp.mean(_xent(logits_t, labels)))

    pred = jnp.argmax(logits_i, axis=-1)
    correct = (pred == labels).astype(jnp.float32)
    num_gt = jnp.sum(ind)
    num_pseudo = jnp.sum(1.0 - ind)
    acc = 100.0 * jnp.mean(correct)
    acc_gt = 100.0 * jnp.sum(correct * ind) / jnp.maximum(num_gt, 1.0)
    acc_pseudo = (100.0 * jnp.sum(correct * (1.0 - ind))
                  / jnp.maximum(num_pseudo, 1.0))
    return {"loss": loss, "clip_loss": loss, "clip_acc": acc,
            "num_gt": num_gt, "num_pseudo": num_pseudo,
            "clip_acc_gt": acc_gt, "clip_acc_pseudo": acc_pseudo}


def ssl_clip_loss_local(local_image: jax.Array, local_text: jax.Array,
                        logit_scale: jax.Array,
                        logit_scale_pseudo: jax.Array,
                        local_gt_indicators: jax.Array,
                        axis_name: str = "data") -> dict:
    """shard_map body of :func:`ssl_clip_loss` — the memory-scalable
    variant that runs at batch 1024: each device holds (B_local, D) shards
    and computes only its own B_local × B_global logit rows against
    globally gathered negatives (reference loss.py:121-217 semantics with
    open_clip local_loss memory behavior). Metrics match the global
    formulation exactly (loss AND gradients, see tests)."""
    idx = jax.lax.axis_index(axis_name)
    b = local_image.shape[0]
    all_image = jax.lax.all_gather(local_image, axis_name, tiled=True)
    all_text = jax.lax.all_gather(local_text, axis_name, tiled=True)
    ind_l = local_gt_indicators.astype(jnp.float32)
    ind_g = jax.lax.all_gather(ind_l, axis_name, tiled=True)
    labels = idx * b + jnp.arange(b)

    mask = ind_l[:, None] + ind_g[None, :]      # (b, n) in {0, 1, 2}
    scale_mat = jnp.where(
        mask == 0, logit_scale_pseudo,
        jnp.where(mask == 2, logit_scale,
                  jnp.sqrt(logit_scale * logit_scale_pseudo)))
    logits_i = scale_mat * (local_image.astype(jnp.float32)
                            @ all_text.astype(jnp.float32).T)
    logits_t = scale_mat * (local_text.astype(jnp.float32)
                            @ all_image.astype(jnp.float32).T)
    loss = 0.5 * (jnp.mean(_xent(logits_i, labels))
                  + jnp.mean(_xent(logits_t, labels)))
    loss = jax.lax.pmean(loss, axis_name)

    pred = jnp.argmax(logits_i, axis=-1)
    correct = (pred == labels).astype(jnp.float32)
    num_gt = jax.lax.psum(jnp.sum(ind_l), axis_name)
    num_pseudo = jax.lax.psum(jnp.sum(1.0 - ind_l), axis_name)
    n_correct = jax.lax.psum(jnp.sum(correct), axis_name)
    corr_gt = jax.lax.psum(jnp.sum(correct * ind_l), axis_name)
    corr_pseudo = jax.lax.psum(jnp.sum(correct * (1.0 - ind_l)), axis_name)
    acc = 100.0 * n_correct / (num_gt + num_pseudo)
    acc_gt = 100.0 * corr_gt / jnp.maximum(num_gt, 1.0)
    acc_pseudo = 100.0 * corr_pseudo / jnp.maximum(num_pseudo, 1.0)
    return {"loss": loss, "clip_loss": loss, "clip_acc": acc,
            "num_gt": num_gt, "num_pseudo": num_pseudo,
            "clip_acc_gt": acc_gt, "clip_acc_pseudo": acc_pseudo}


def caption_loss(logits: jax.Array, labels: jax.Array,
                 pad_id: int = 0) -> dict:
    """Teacher-forced next-token CE, padded positions masked out;
    reports token accuracy and mean per-sample perplexity
    (reference loss.py:220-253). logits (B, L, V), labels (B, L)."""
    B, L, V = logits.shape
    per_tok = _xent(logits.reshape(B * L, V),
                    labels.reshape(B * L)).reshape(B, L)
    keep = (labels != pad_id).astype(jnp.float32)
    tok_counts = jnp.maximum(jnp.sum(keep, axis=1), 1.0)
    per_sample = jnp.sum(per_tok * keep, axis=1)
    loss = jnp.sum(per_sample) / jnp.maximum(jnp.sum(keep), 1.0)
    pred = jnp.argmax(logits, axis=-1)
    correct = jnp.sum((pred == labels).astype(jnp.float32) * keep)
    acc = 100.0 * correct / jnp.maximum(jnp.sum(keep), 1e-8)
    ppl = jnp.mean(jnp.exp(per_sample / tok_counts))
    return {"loss": loss, "caption_loss": loss, "caption_acc": acc,
            "ppl": ppl}


def _cosine_sim_matrix(a: jax.Array, b: jax.Array,
                       eps: float = 1e-8) -> jax.Array:
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    a = a / jnp.maximum(jnp.linalg.norm(a, axis=1, keepdims=True), eps)
    b = b / jnp.maximum(jnp.linalg.norm(b, axis=1, keepdims=True), eps)
    return a @ b.T


def max_margin_loss(image_embed: jax.Array, text_embed: jax.Array,
                    margin: float = 0.2,
                    weights: Optional[jax.Array] = None) -> dict:
    """Bidirectional hinge ranking loss over the cosine sim matrix, the
    diagonal (positive pairs) excluded from the mean — reference
    MaxMarginRankingLoss / AdaptiveMaxMarginRankingLoss with fix_norm=True
    (reference loss.py:267-367). ``weights`` (per text row, from the
    EK-100 relevancy) scales the margin (adaptive variant)."""
    x = _cosine_sim_matrix(text_embed, image_embed)   # (n, n), rows = text
    n = x.shape[0]
    diag = jnp.diag(x)
    w = jnp.ones((n,), jnp.float32) if weights is None else (
        weights.astype(jnp.float32))
    m = w[:, None] * margin
    # text→video: row i's positive vs all columns; video→text: column j's
    # positive vs all rows (equivalent to the transposed pass)
    h1 = jax.nn.relu(m - (diag[:, None] - x))
    h2 = jax.nn.relu(m - (diag[:, None] - x.T))
    off = 1.0 - jnp.eye(n, dtype=jnp.float32)
    denom = jnp.maximum(2.0 * n * (n - 1), 1.0)
    loss = (jnp.sum(h1 * off) + jnp.sum(h2 * off)) / denom
    return {"loss": loss, "max_margin_loss": loss}


LOGIT_SCALE_MAX = 4.6052  # clamp: exp(4.6052) ≈ 100 (reference main_pretrain.py:529)


def get_loss(model_name: str):
    """Loss selector keyed by model family (reference models.py:293-304):
    CLIP_* → InfoNCE, VCLM_* → caption loss."""
    if model_name.startswith("CLIP"):
        return clip_loss
    if model_name.startswith("VCLM"):
        return caption_loss
    raise NotImplementedError(model_name)


def get_metric_names(model_name: str) -> list[str]:
    """Metric keys per model family (reference models.py:307-313)."""
    if model_name.startswith("CLIP"):
        return ["loss", "clip_loss", "clip_acc"]
    if model_name.startswith("VCLM"):
        return ["loss", "caption_loss", "caption_acc", "ppl"]
    raise NotImplementedError(model_name)
