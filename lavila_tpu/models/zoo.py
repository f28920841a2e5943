"""Model zoo: named constructors matching the reference factory surface.

The reference exposes 19 factory functions selected by
``getattr(models, args.model)`` (reference: lavila/models/models.py:316-1218).
Here each name maps to a :class:`ModelSpec` that builds the flax module
tree. Weight loading from released PyTorch checkpoints is decoupled into
:mod:`lavila_tpu.models.import_torch` (no network access is assumed).

Naming convention (same as reference):
  CLIP_OPENAI_TIMESFORMER_{BASE,LARGE,LARGE_336PX}[_DISTILBERT_BASE]
  CLIP_HF_{EGOVLP,TIMESFORMER}_DISTILBERT_BASE
  VCLM_OPENAI_{VITB16,VITL14,VITL14_336PX}_GPT2_{LARGE,XL}
  VCLM_OPENAI_TIMESFORMER_{BASE,LARGE,LARGE_336PX}_GPT2{,_XL}
  CLIP_OPENAI_VIT{B32,B16,L14,L14_336PX}
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax.numpy as jnp
from flax import linen as nn

from lavila_tpu.models.dual_encoder import VideoCLIP, VideoCLIPHF
from lavila_tpu.models.distilbert import DistilBertModel
from lavila_tpu.models.gpt2 import (GPT2Config, GPT2LMHead, PRESETS,
                                    augment_config)
from lavila_tpu.models.narrator import VCLM
from lavila_tpu.models.openai_clip import TextTransformer, VisionTransformer
from lavila_tpu.models.timesformer import SpaceTimeTransformer

_REGISTRY: dict[str, Callable[..., nn.Module]] = {}


def register(fn):
    _REGISTRY[fn.__name__] = fn
    return fn


def available_models() -> list[str]:
    return sorted(_REGISTRY)


def build_model(name: str, **kwargs) -> nn.Module:
    if name not in _REGISTRY:
        raise KeyError(f"unknown model {name!r}; known: {available_models()}")
    return _REGISTRY[name](**kwargs)


# --------------------------------------------------------------------------
# vision tower presets (CLIP ViT-B/16 and ViT-L/14 geometry)
# --------------------------------------------------------------------------

def _timesformer(size: str, num_frames: int, img_size: int = 224,
                 gated_xattn: bool = False, remat: bool = False,
                 drop_path_rate: float = 0.0,
                 dtype=jnp.float32,
                 remat_policy: str = "full") -> SpaceTimeTransformer:
    if size == "base":
        dims = dict(patch_size=16, embed_dim=768, depth=12, num_heads=12)
    elif size == "large":
        dims = dict(patch_size=14, embed_dim=1024, depth=24, num_heads=16)
    else:
        raise ValueError(size)
    return SpaceTimeTransformer(
        img_size=img_size, num_frames=num_frames, ln_pre=True,
        act="quick_gelu", is_tanh_gating=gated_xattn, remat=remat,
        remat_policy=remat_policy, drop_path_rate=drop_path_rate,
        dtype=dtype, **dims)


def _clip_text(width: int, heads: int, embed_dim: int, remat: bool,
               dtype) -> TextTransformer:
    return TextTransformer(width=width, heads=heads, layers=12,
                           embed_dim=embed_dim, remat=remat, dtype=dtype)


# --------------------------------------------------------------------------
# dual encoders — CLIP text tower
# --------------------------------------------------------------------------

def _clip_timesformer(size: str, img_size: int, num_frames: int,
                      timesformer_gated_xattn: bool = False,
                      temperature_init: float = 0.07,
                      project_embed_dim: int = 256,
                      drop_path_rate: float = 0.0,
                      remat: bool = False, dtype=jnp.float32,
                      remat_policy: str = "full",
                      **_unused) -> VideoCLIP:
    vision = _timesformer(size, num_frames, img_size,
                          timesformer_gated_xattn, remat, drop_path_rate,
                          dtype, remat_policy)
    text_width = 512 if size == "base" else 768
    text_heads = 8 if size == "base" else 12
    return VideoCLIP(
        vision_model=vision,
        text_model=_clip_text(text_width, text_heads, project_embed_dim,
                              remat, dtype),
        vision_width=vision.embed_dim,
        embed_dim=project_embed_dim,
        temperature_init=temperature_init,
        dtype=dtype)


@register
def CLIP_OPENAI_TIMESFORMER_MINI(num_frames=4, project_embed_dim=64,
                                 remat=False, dtype=jnp.float32, **kw):
    """Tiny debug/CI configuration (not in the reference zoo): 64px /
    2-layer towers — lets every entry point run end-to-end on CPU."""
    vision = SpaceTimeTransformer(
        img_size=64, patch_size=16, embed_dim=64, depth=2, num_heads=4,
        num_frames=num_frames, ln_pre=True, act="quick_gelu", remat=remat,
        remat_policy=kw.get("remat_policy", "full"), dtype=dtype)
    return VideoCLIP(
        vision_model=vision,
        text_model=TextTransformer(width=64, heads=4, layers=2,
                                   embed_dim=project_embed_dim,
                                   remat=remat, dtype=dtype),
        vision_width=64, embed_dim=project_embed_dim, dtype=dtype)


@register
def VCLM_OPENAI_TIMESFORMER_MINI_GPT2_MINI(num_frames=4, gated_xattn=False,
                                           remat=False, dtype=jnp.float32,
                                           **kw):
    """Tiny debug/CI narrator (not in the reference zoo)."""
    vision = SpaceTimeTransformer(
        img_size=64, patch_size=16, embed_dim=64, depth=2, num_heads=4,
        num_frames=num_frames, ln_pre=True, act="quick_gelu", remat=remat,
        remat_policy=kw.get("remat_policy", "full"), dtype=dtype)
    cfg = augment_config(
        GPT2Config(vocab_size=50257, n_positions=128, n_embd=64, n_layer=2,
                   n_head=4), cross_attn_freq=1, gated_xattn=gated_xattn,
        remat=remat)
    return VCLM(vision_model=vision, text_decoder=GPT2LMHead(cfg,
                                                             dtype=dtype),
                vision_width=64, text_width=64, num_img_queries=16,
                dim_head=16, heads=4, dtype=dtype)


@register
def CLIP_OPENAI_TIMESFORMER_BASE(num_frames=4, **kw):
    return _clip_timesformer("base", 224, num_frames, **kw)


@register
def CLIP_OPENAI_TIMESFORMER_LARGE(num_frames=4, **kw):
    return _clip_timesformer("large", 224, num_frames, **kw)


@register
def CLIP_OPENAI_TIMESFORMER_LARGE_336PX(num_frames=4, **kw):
    return _clip_timesformer("large", 336, num_frames, **kw)


# --------------------------------------------------------------------------
# dual encoders — DistilBERT text tower
# --------------------------------------------------------------------------

def _clip_hf_timesformer(size: str, img_size: int, num_frames: int,
                         timesformer_gated_xattn: bool = False,
                         temperature_init: float = 0.07,
                         project_embed_dim: int = 256,
                         projection: str = "default",
                         drop_path_rate: float = 0.0,
                         remat: bool = False, dtype=jnp.float32,
                         remat_policy: str = "full",
                         **_unused) -> VideoCLIPHF:
    vision = _timesformer(size, num_frames, img_size,
                          timesformer_gated_xattn, remat, drop_path_rate,
                          dtype, remat_policy)
    return VideoCLIPHF(
        vision_model=vision,
        text_model=DistilBertModel(dtype=dtype),
        vision_width=vision.embed_dim,
        text_width=768,
        embed_dim=project_embed_dim,
        text_use_cls_token=True,
        text_is_regressive=False,
        projection=projection,
        temperature_init=temperature_init,
        dtype=dtype)


@register
def CLIP_OPENAI_TIMESFORMER_BASE_DISTILBERT_BASE(num_frames=4, **kw):
    return _clip_hf_timesformer("base", 224, num_frames, **kw)


@register
def CLIP_OPENAI_TIMESFORMER_LARGE_DISTILBERT_BASE(num_frames=4, **kw):
    return _clip_hf_timesformer("large", 224, num_frames, **kw)


@register
def CLIP_OPENAI_TIMESFORMER_LARGE_336PX_DISTILBERT_BASE(num_frames=4, **kw):
    return _clip_hf_timesformer("large", 336, num_frames, **kw)


@register
def CLIP_HF_EGOVLP_DISTILBERT_BASE(num_frames=4, **kw):
    # EgoVLP variant: timm ViT init (no ln_pre / plain GELU) + MLP projection
    kw.setdefault("projection", "frozen_in_time")
    vision = SpaceTimeTransformer(
        num_frames=num_frames, ln_pre=False, act="gelu",
        remat=kw.get("remat", False),
        remat_policy=kw.get("remat_policy", "full"),
        dtype=kw.get("dtype", jnp.float32))
    return VideoCLIPHF(
        vision_model=vision,
        text_model=DistilBertModel(dtype=kw.get("dtype", jnp.float32)),
        vision_width=768, text_width=768,
        embed_dim=kw.get("project_embed_dim", 256),
        text_use_cls_token=True, text_is_regressive=False,
        projection=kw["projection"],
        temperature_init=kw.get("temperature_init", 0.07),
        dtype=kw.get("dtype", jnp.float32))


@register
def CLIP_HF_TIMESFORMER_DISTILBERT_BASE(num_frames=4, **kw):
    vision = SpaceTimeTransformer(
        num_frames=num_frames, ln_pre=False, act="gelu",
        remat=kw.get("remat", False),
        remat_policy=kw.get("remat_policy", "full"),
        dtype=kw.get("dtype", jnp.float32))
    return VideoCLIPHF(
        vision_model=vision,
        text_model=DistilBertModel(dtype=kw.get("dtype", jnp.float32)),
        vision_width=768, text_width=768,
        embed_dim=kw.get("project_embed_dim", 256),
        text_use_cls_token=True, text_is_regressive=False,
        projection="default",
        temperature_init=kw.get("temperature_init", 0.07),
        dtype=kw.get("dtype", jnp.float32))


# --------------------------------------------------------------------------
# VCLM narrators: vision tower + attention pooler + gated GPT-2
# --------------------------------------------------------------------------

_GPT2_HEADS = {"gpt2": 12, "gpt2-large": 20, "gpt2-xl": 25}


def _vclm(vision, vision_width: int, gpt2_name: str, cross_attn_freq: int,
          gated_xattn: bool = False, remat: bool = False,
          dtype=jnp.float32, **_unused) -> VCLM:
    cfg = augment_config(PRESETS[gpt2_name],
                         cross_attn_freq=cross_attn_freq,
                         gated_xattn=gated_xattn, remat=remat)
    return VCLM(
        vision_model=vision,
        text_decoder=GPT2LMHead(cfg, dtype=dtype),
        vision_width=vision_width,
        text_width=cfg.n_embd,
        num_img_queries=256,
        dim_head=64,
        heads=_GPT2_HEADS[gpt2_name],
        dtype=dtype)


class _FrameTokensViT(nn.Module):
    """CLIP ViT applied per frame; per-frame patch tokens concatenated —
    the narrator conditioning path for raw CLIP towers
    (reference narrator.py:63-70)."""
    vit: VisionTransformer

    @nn.compact
    def __call__(self, x, cls_at_last=False):
        B, T = x.shape[:2]
        toks = self.vit(x.reshape((B * T,) + x.shape[2:]), cls_at_last=False)
        return toks.reshape(B, T * toks.shape[1], toks.shape[2])


@register
def VCLM_OPENAI_VITB16_GPT2_LARGE(gated_xattn=False, **kw):
    vit = VisionTransformer(dtype=kw.get("dtype", jnp.float32), **_VIT_GEOM["B16"])
    return _vclm(_FrameTokensViT(vit), 768, "gpt2-large", 2, gated_xattn,
                 **kw)


@register
def VCLM_OPENAI_VITB16_GPT2_XL(gated_xattn=False, **kw):
    vit = VisionTransformer(dtype=kw.get("dtype", jnp.float32), **_VIT_GEOM["B16"])
    return _vclm(_FrameTokensViT(vit), 768, "gpt2-xl", 2, gated_xattn, **kw)


@register
def VCLM_OPENAI_VITL14_GPT2_XL(gated_xattn=False, **kw):
    vit = VisionTransformer(dtype=kw.get("dtype", jnp.float32), **_VIT_GEOM["L14"])
    return _vclm(_FrameTokensViT(vit), 1024, "gpt2-xl", 2, gated_xattn, **kw)


@register
def VCLM_OPENAI_VITL14_336PX_GPT2_XL(gated_xattn=False, **kw):
    vit = VisionTransformer(dtype=kw.get("dtype", jnp.float32),
                            **_VIT_GEOM["L14_336PX"])
    return _vclm(_FrameTokensViT(vit), 1024, "gpt2-xl", 2, gated_xattn, **kw)


@register
def VCLM_OPENAI_TIMESFORMER_BASE_GPT2(gated_xattn=False, num_frames=4,
                                      timesformer_gated_xattn=False, **kw):
    vision = _timesformer("base", num_frames, 224, timesformer_gated_xattn,
                          remat=kw.get("remat", False),
                          dtype=kw.get("dtype", jnp.float32),
                          remat_policy=kw.get("remat_policy", "full"))
    return _vclm(vision, 768, "gpt2", 1, gated_xattn, **kw)


@register
def VCLM_OPENAI_TIMESFORMER_BASE_GPT2_XL(gated_xattn=False, num_frames=4,
                                         timesformer_gated_xattn=False, **kw):
    vision = _timesformer("base", num_frames, 224, timesformer_gated_xattn,
                          remat=kw.get("remat", False),
                          dtype=kw.get("dtype", jnp.float32),
                          remat_policy=kw.get("remat_policy", "full"))
    return _vclm(vision, 768, "gpt2-xl", 2, gated_xattn, **kw)


@register
def VCLM_OPENAI_TIMESFORMER_LARGE_GPT2(gated_xattn=False, num_frames=4,
                                       timesformer_gated_xattn=False, **kw):
    vision = _timesformer("large", num_frames, 224, timesformer_gated_xattn,
                          remat=kw.get("remat", False),
                          dtype=kw.get("dtype", jnp.float32),
                          remat_policy=kw.get("remat_policy", "full"))
    return _vclm(vision, 1024, "gpt2", 1, gated_xattn, **kw)


@register
def VCLM_OPENAI_TIMESFORMER_LARGE_GPT2_XL(gated_xattn=False, num_frames=4,
                                          timesformer_gated_xattn=False,
                                          **kw):
    vision = _timesformer("large", num_frames, 224, timesformer_gated_xattn,
                          remat=kw.get("remat", False),
                          dtype=kw.get("dtype", jnp.float32),
                          remat_policy=kw.get("remat_policy", "full"))
    return _vclm(vision, 1024, "gpt2-xl", 2, gated_xattn, **kw)


@register
def VCLM_OPENAI_TIMESFORMER_LARGE_336PX_GPT2_XL(
        gated_xattn=False, num_frames=4, timesformer_gated_xattn=False,
        **kw):
    vision = _timesformer("large", num_frames, 336, timesformer_gated_xattn,
                          remat=kw.get("remat", False),
                          dtype=kw.get("dtype", jnp.float32),
                          remat_policy=kw.get("remat_policy", "full"))
    return _vclm(vision, 1024, "gpt2-xl", 3, gated_xattn, **kw)


# --------------------------------------------------------------------------
# raw OpenAI CLIP (image, not video) — kept for zero-shot image baselines
# --------------------------------------------------------------------------

_VIT_GEOM = {
    "B32": dict(patch_size=32, width=768, layers=12, heads=12,
                output_dim=512, input_resolution=224),
    "B16": dict(patch_size=16, width=768, layers=12, heads=12,
                output_dim=512, input_resolution=224),
    "L14": dict(patch_size=14, width=1024, layers=24, heads=16,
                output_dim=768, input_resolution=224),
    "L14_336PX": dict(patch_size=14, width=1024, layers=24, heads=16,
                      output_dim=768, input_resolution=336),
}


def _clip_vit(geom_key: str, dtype=jnp.float32, **_unused) -> VideoCLIP:
    g = _VIT_GEOM[geom_key]
    text_width = 512 if g["output_dim"] == 512 else 768
    text_heads = 8 if text_width == 512 else 12

    class FrameMeanViT(nn.Module):
        """ViT applied per frame, mean-pooled over time
        (reference openai_model.py:372-382)."""
        vit: VisionTransformer

        @nn.compact
        def __call__(self, x):
            if x.ndim == 4:  # single image (B, H, W, C)
                return self.vit(x)
            B, T = x.shape[:2]
            feats = self.vit(x.reshape((B * T,) + x.shape[2:]))
            return feats.reshape(B, T, -1).mean(axis=1)

    vit = VisionTransformer(dtype=dtype, **g)
    return VideoCLIP(
        vision_model=FrameMeanViT(vit),
        text_model=_clip_text(text_width, text_heads, g["output_dim"],
                              False, dtype),
        vision_width=g["output_dim"],  # the ViT applies its own projection
        embed_dim=g["output_dim"],
        use_image_projection=False,
        dtype=dtype)


@register
def CLIP_OPENAI_VITB32(**kw):
    return _clip_vit("B32", **kw)


@register
def CLIP_OPENAI_VITB16(**kw):
    return _clip_vit("B16", **kw)


@register
def CLIP_OPENAI_VITL14(**kw):
    return _clip_vit("L14", **kw)


@register
def CLIP_OPENAI_VITL14_336PX(**kw):
    return _clip_vit("L14_336PX", **kw)
