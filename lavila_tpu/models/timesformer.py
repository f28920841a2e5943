"""SpaceTimeTransformer (TimeSformer / frozen-in-time style) video tower.

TPU-native rebuild of the reference video encoder
(reference: lavila/models/timesformer.py:201-390). Differences by design:

  * channel-last input ``(B, T, H, W, C)`` — native layout for TPU convs;
  * divided space-time attention is the static batched formulation of
    :func:`lavila_tpu.ops.attention.divided_attention_split` — the tower
    carries (cls, patches) as SEPARATE arrays so the CLS row never forces
    a relayout of the patch tensor — instead of einops reshapes over a
    merged (b h) axis (``divided_attention`` remains as a compatibility
    wrapper over the split form);
  * activation checkpointing via ``jax.checkpoint`` policies at block
    granularity (see ``remat`` flag), not torch.utils.checkpoint;
  * compute dtype is a parameter (bf16 on TPU), params stay fp32.

Semantics kept bit-compatible with the reference:
  * per-block order: time-attn (pre-LN norm3, optional tanh gate) with
    residual from x; spatial attn (pre-LN norm1) applied to the time
    residual but its own residual ALSO taken from x ("frozen-in-time"
    style, reference timesformer.py:173-198); then MLP (pre-LN norm2).
  * positional embedding: spatial PE tiled across frames + temporal PE
    repeated within each frame, CLS PE kept separate
    (reference timesformer.py:355-364).
  * zero-init time attention: qkv zeros, proj weight ones — block starts
    as a pure ViT (reference timesformer.py:97-103).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from lavila_tpu.ops.attention import divided_attention_split
from lavila_tpu.ops.basic import (ACTIVATIONS, LayerNorm, Mlp, drop_path,
                                  trunc_normal_init)

Dtype = Any

# The tower carries the token sequence CLS-SEPARATE: a (cls (B, 1, D),
# patches (B, F, N, D)) pair instead of one (B, 1+F·N, D) tensor. The
# Pallas phase kernels consume the patch tensor's natural layout
# directly, so no x[:, 1:] slice or CLS concatenate is ever materialized
# around them (each such copy pair measured ~1 ms/block fwd+bwd on v5e —
# XLA cannot fuse copies into a custom call). Parameter shapes and names
# are identical to the joint layout; dense/LN modules are created once
# and applied to both halves.


class DividedAttentionBlock(nn.Module):
    """QKV projection + divided attention + output projection."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    zero_init: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, cls: jax.Array, patches: jax.Array,
                 axis: str) -> tuple:
        B, F, N, D = patches.shape
        H = self.num_heads
        d = D // H
        if self.zero_init:
            kernel_init = nn.initializers.zeros
            proj_init = nn.initializers.ones
        else:
            kernel_init = nn.initializers.lecun_normal()
            proj_init = nn.initializers.lecun_normal()
        qkv = nn.Dense(3 * D, use_bias=self.qkv_bias, dtype=self.dtype,
                       kernel_init=kernel_init, name="qkv")
        qc, kc, vc = (t.reshape(B, 1, H, d)
                      for t in jnp.split(qkv(cls), 3, axis=-1))
        qp, kp, vp = (t.reshape(B, F, N, H, d)
                      for t in jnp.split(qkv(patches), 3, axis=-1))
        cls_out, p_out = divided_attention_split(qc, kc, vc, qp, kp, vp,
                                                 axis)
        # names for remat_policy='save_attn'/'dots_attn': saving the
        # attention-phase outputs means the backward pass re-runs the
        # cheap elementwise/LN ops but NOT the fused attention kernels
        # (which 'dots' misses — Pallas custom calls aren't dots)
        cls_out = checkpoint_name(cls_out, "attn_out")
        p_out = checkpoint_name(p_out, "attn_out")
        proj = nn.Dense(D, dtype=self.dtype, kernel_init=proj_init,
                        name="proj")
        return proj(cls_out.reshape(B, 1, D)), proj(p_out.reshape(B, F, N,
                                                                   D))


class SpaceTimeBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    act: str = "gelu"
    is_tanh_gating: bool = False
    drop_path_rate: float = 0.0   # stochastic depth (reference :165)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, cls: jax.Array, patches: jax.Array,
                 train: bool = False) -> tuple:
        norm3 = LayerNorm(epsilon=1e-6, name="norm3")
        time_out = DividedAttentionBlock(
            self.dim, self.num_heads, self.qkv_bias, zero_init=True,
            dtype=self.dtype, name="timeattn",
        )(norm3(cls), norm3(patches), "time")
        if self.is_tanh_gating:
            alpha = self.param("alpha_timeattn", nn.initializers.zeros, ())
            gate = jnp.tanh(alpha).astype(cls.dtype)
            time_out = (gate * time_out[0], gate * time_out[1])
        norm1 = LayerNorm(epsilon=1e-6, name="norm1")
        # frozen-in-time: the time residual feeds ONLY norm1 (the spatial
        # residual below reconnects to the block input), so the patch-half
        # sum is fused into the norm and never materialized
        # (reference timesformer.py:186-193)
        y1_cls = norm1(cls + time_out[0])
        y1_pat = norm1(time_out[1], residual=patches, return_sum=False)
        space_out = DividedAttentionBlock(
            self.dim, self.num_heads, self.qkv_bias,
            dtype=self.dtype, name="attn",
        )(y1_cls, y1_pat, "space")

        def dp(pair):
            if self.drop_path_rate == 0.0 or not train:
                return pair
            # ONE rng for both halves: stochastic depth drops the whole
            # residual per sample — the CLS row and the patches must share
            # the mask (same key + same leading dim → identical draws).
            rng = self.make_rng("drop_path")
            return tuple(drop_path(y, self.drop_path_rate,
                                   deterministic=False, rng=rng)
                         for y in pair)

        # frozen-in-time: the spatial residual reconnects to the block input
        # (reference timesformer.py:191-193)
        space_out = dp(space_out)
        norm2 = LayerNorm(epsilon=1e-6, name="norm2")
        space_res0 = cls + space_out[0]
        y2_cls = norm2(space_res0)
        # patch half: the sum is the residual carry AND the norm input —
        # fused add+LN keeps it to one HBM round trip
        y2_pat, space_res1 = norm2(space_out[1], residual=patches)

        mlp = Mlp(int(self.dim * self.mlp_ratio), act=self.act,
                  dtype=self.dtype, name="mlp")
        mlp_out = dp((mlp(y2_cls), mlp(y2_pat)))
        return space_res0 + mlp_out[0], space_res1 + mlp_out[1]


class SpaceTimeTransformer(nn.Module):
    """Video tower.

    Call with frames of shape ``(B, T, H, W, C)`` (values already
    normalized). Returns the CLS feature ``(B, D)`` when ``cls_at_last``
    (default), else the full normalized token sequence ``(B, 1+T*N, D)``
    (used by the narrator's attention pooler,
    reference narrator.py:71-75).
    """

    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    num_frames: int = 8
    ln_pre: bool = False
    act: str = "gelu"
    is_tanh_gating: bool = False
    drop_path_rate: float = 0.0
    remat: bool = False
    # remat policy: 'full' recomputes everything; 'dots' saves matmul
    # outputs and recomputes elementwise (cheap memory relief that keeps
    # the MXU work single-pass)
    remat_policy: str = "full"
    dtype: Dtype = jnp.float32

    @property
    def patches_per_frame(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    @nn.compact
    def __call__(self, x: jax.Array, cls_at_last: bool = True,
                 train: bool = False) -> jax.Array:
        B, T, H, W, C = x.shape
        assert T <= self.num_frames, (T, self.num_frames)
        D = self.embed_dim
        N = self.patches_per_frame

        # patch embedding: conv per frame, NHWC (CLIP-compatible: no bias
        # when ln_pre, reference timesformer.py:77)
        x = x.reshape(B * T, H, W, C).astype(self.dtype)
        x = nn.Conv(D, kernel_size=(self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    use_bias=not self.ln_pre, dtype=self.dtype,
                    name="patch_embed")(x)
        patches = x.reshape(B, T, N, D)

        cls_token = self.param("cls_token", nn.initializers.zeros, (1, 1, D))
        pos_embed = self.param("pos_embed", trunc_normal_init(0.02),
                               (1, N + 1, D))
        temporal_embed = self.param("temporal_embed", nn.initializers.zeros,
                                    (1, self.num_frames, D))

        cls = jnp.broadcast_to(cls_token.astype(self.dtype), (B, 1, D))

        # spatial PE broadcast over frames; temporal PE over positions
        pe = (pos_embed[:, None, 1:] + temporal_embed[:, :T, None])
        patches = patches + pe.astype(self.dtype)      # (B, T, N, D)
        cls = cls + pos_embed[:, :1].astype(self.dtype)

        if self.ln_pre:
            ln_pre = LayerNorm(name="ln_pre")
            cls, patches = ln_pre(cls), ln_pre(patches)

        block_cls = SpaceTimeBlock
        if self.remat:
            cp = jax.checkpoint_policies
            policies = {
                "full": None,
                "dots": cp.dots_with_no_batch_dims_saveable,
                # save only the attention-phase outputs: the backward
                # re-runs LN/elementwise (the 336px ledger's ~61 ms of
                # LN stats) but never the fused attention kernels
                "save_attn": cp.save_only_these_names("attn_out"),
                # dots + attention outputs: single-pass MXU everywhere
                "dots_attn": cp.save_from_both_policies(
                    cp.dots_with_no_batch_dims_saveable,
                    cp.save_only_these_names("attn_out")),
            }
            if self.remat_policy not in policies:
                # config files reach here unvalidated (the CLIs have
                # argparse choices) — fail with the options, not a
                # KeyError from deep inside setup
                raise ValueError(
                    f"remat_policy={self.remat_policy!r} unknown; one of "
                    f"{sorted(policies)}")
            block_cls = nn.remat(SpaceTimeBlock, static_argnums=(3,),
                                 policy=policies[self.remat_policy])
        # stochastic depth decay rule: linear 0 → drop_path_rate
        dprs = [self.drop_path_rate * i / max(self.depth - 1, 1)
                for i in range(self.depth)]
        for i in range(self.depth):
            blk = block_cls(
                dim=D, num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias, act=self.act,
                is_tanh_gating=self.is_tanh_gating,
                drop_path_rate=dprs[i], dtype=self.dtype,
                name=f"blocks_{i}",
            )
            cls, patches = blk(cls, patches, train)

        norm = LayerNorm(epsilon=1e-6, name="norm")
        if cls_at_last:
            return norm(cls)[:, 0]
        # joint sequence for consumers that pool over all tokens
        # (narrator attention pooler, reference narrator.py:71-75)
        return norm(jnp.concatenate(
            [cls, patches.reshape(B, T * N, D)], axis=1))
