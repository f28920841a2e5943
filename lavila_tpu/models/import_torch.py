"""PyTorch → flax weight import for released checkpoints.

Covers the three naming schemes the reference juggles
(reference: lavila/models/utils.py:74-108, models.py:316-1218):

  * OpenAI CLIP visual towers → TimeSformer layout (the reference's
    ``remap_keys``): ln_1→spatial-attn norm1, ln_2→MLP norm2; the
    temporal branch (timeattn/norm3/temporal_embed) keeps its zero/unit
    init so the loaded model starts as a pure ViT;
  * HF GPT-2 (Conv1D weights are (in, out) — direct copy, no transpose)
    including the gated cross-attention extension;
  * HF DistilBERT.

Also: temporal positional-embedding inflation for loading checkpoints
trained with a different frame count (reference models/utils.py:13-59).

All functions take plain ``{name: np.ndarray}`` dicts (call
``load_torch_state_dict`` to read a .pt file) and return flax param
pytrees.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

import numpy as np


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    out = {}
    for k, v in ckpt.items():
        k = k.removeprefix("module.")
        out[k] = v.float().numpy() if hasattr(v, "numpy") else np.asarray(v)
    return out


class _TrackedDict(dict):
    """State dict that records which keys the importer actually read —
    the strict=True analogue (reference eval_zeroshot.py:97 loads released
    checkpoints with strict=True to catch naming drift)."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.consumed: set = set()

    def __getitem__(self, key):
        self.consumed.add(key)
        return super().__getitem__(key)


# torch buffers with no flax counterpart — never considered "missed"
_IGNORED_KEY_PARTS = ("num_batches_tracked", "position_ids", "attn_mask",
                      "masked_bias", ".bias_mask")


def unconsumed_keys(sd: "_TrackedDict") -> list[str]:
    return sorted(
        k for k in sd
        if k not in sd.consumed
        and not any(part in k for part in _IGNORED_KEY_PARTS))


def _finish_import(sd: "_TrackedDict", strict: bool, what: str):
    missed = unconsumed_keys(sd)
    if not missed:
        return
    msg = (f"{what}: {len(missed)} checkpoint key(s) were NOT consumed "
           f"by the importer (naming drift?): {missed[:8]}"
           f"{' ...' if len(missed) > 8 else ''}")
    if strict:
        raise KeyError(msg)
    print(f"WARNING: {msg}")


def _dense(sd, name) -> dict:
    """torch Linear (out,in) → flax Dense {kernel (in,out), bias}."""
    p = {"kernel": sd[f"{name}.weight"].T}
    if f"{name}.bias" in sd:
        p["bias"] = sd[f"{name}.bias"]
    return p


def _conv1d(sd, name) -> dict:
    """HF Conv1D stores (in,out) already."""
    p = {"kernel": sd[f"{name}.weight"]}
    if f"{name}.bias" in sd:
        p["bias"] = sd[f"{name}.bias"]
    return p


def _ln(sd, name) -> dict:
    out = {}
    if f"{name}.weight" in sd:
        out["scale"] = sd[f"{name}.weight"]
    if f"{name}.gamma" in sd:  # CoCa bias-free LayerNorm
        out["scale"] = sd[f"{name}.gamma"]
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"]
    return out


def _conv2d(sd, name) -> dict:
    """torch Conv2d (O,I,kh,kw) → flax (kh,kw,I,O)."""
    p = {"kernel": sd[f"{name}.weight"].transpose(2, 3, 1, 0)}
    if f"{name}.bias" in sd:
        p["bias"] = sd[f"{name}.bias"]
    return p


# --------------------------------------------------------------------------
# TimeSformer (reference lavila naming: visual.*)
# --------------------------------------------------------------------------

def import_timesformer(sd: Mapping[str, np.ndarray], depth: int,
                       prefix: str = "") -> dict:
    """Missing keys are skipped (strict=False semantics, like loading
    remapped CLIP weights over a fresh TimeSformer init —
    reference models.py:332)."""
    p = lambda n: prefix + n  # noqa: E731

    def put(dst, key, value):
        if value:
            dst[key] = value

    def maybe_dense(name):
        return _dense(sd, name) if f"{name}.weight" in sd else {}

    out = {}
    for name in ("cls_token", "pos_embed", "temporal_embed"):
        if p(name) in sd:
            out[name] = sd[p(name)]
    if p("patch_embed.proj.weight") in sd:
        out["patch_embed"] = _conv2d(sd, p("patch_embed.proj"))
    put(out, "norm", _ln(sd, p("norm")))
    put(out, "ln_pre", _ln(sd, p("ln_pre")))
    for i in range(depth):
        b = f"blocks.{i}"
        blk = {}
        put(blk, "norm1", _ln(sd, p(f"{b}.norm1")))
        put(blk, "norm2", _ln(sd, p(f"{b}.norm2")))
        put(blk, "norm3", _ln(sd, p(f"{b}.norm3")))
        attn = {}
        put(attn, "qkv", maybe_dense(p(f"{b}.attn.qkv")))
        put(attn, "proj", maybe_dense(p(f"{b}.attn.proj")))
        put(blk, "attn", attn)
        tattn = {}
        put(tattn, "qkv", maybe_dense(p(f"{b}.timeattn.qkv")))
        put(tattn, "proj", maybe_dense(p(f"{b}.timeattn.proj")))
        put(blk, "timeattn", tattn)
        mlp = {}
        put(mlp, "fc1", maybe_dense(p(f"{b}.mlp.fc1")))
        put(mlp, "fc2", maybe_dense(p(f"{b}.mlp.fc2")))
        put(blk, "mlp", mlp)
        if p(f"{b}.alpha_timeattn") in sd:
            blk["alpha_timeattn"] = sd[p(f"{b}.alpha_timeattn")]
        if blk:
            out[f"blocks_{i}"] = blk
    return out


def remap_clip_visual_to_timesformer(sd: Mapping[str, np.ndarray],
                                     layers: int,
                                     prefix: str = "visual.") -> dict:
    """OpenAI-CLIP ViT state dict → TimeSformer-layout torch names
    (numpy, still torch conventions) — equivalent of the reference's
    remap_keys (reference models/utils.py:74-108). Feed the result to
    :func:`import_timesformer` merged over a fresh init."""
    p = lambda n: prefix + n  # noqa: E731
    out = {
        "cls_token": sd[p("class_embedding")].reshape(1, 1, -1),
        "pos_embed": sd[p("positional_embedding")][None],
        "patch_embed.proj.weight": sd[p("conv1.weight")],
        "ln_pre.weight": sd[p("ln_pre.weight")],
        "ln_pre.bias": sd[p("ln_pre.bias")],
        "norm.weight": sd[p("ln_post.weight")],
        "norm.bias": sd[p("ln_post.bias")],
    }
    for i in range(layers):
        src = f"transformer.resblocks.{i}"
        for a, b in [
            (f"{src}.attn.in_proj_weight", f"blocks.{i}.attn.qkv.weight"),
            (f"{src}.attn.in_proj_bias", f"blocks.{i}.attn.qkv.bias"),
            (f"{src}.attn.out_proj.weight", f"blocks.{i}.attn.proj.weight"),
            (f"{src}.attn.out_proj.bias", f"blocks.{i}.attn.proj.bias"),
            (f"{src}.ln_1.weight", f"blocks.{i}.norm1.weight"),
            (f"{src}.ln_1.bias", f"blocks.{i}.norm1.bias"),
            (f"{src}.mlp.c_fc.weight", f"blocks.{i}.mlp.fc1.weight"),
            (f"{src}.mlp.c_fc.bias", f"blocks.{i}.mlp.fc1.bias"),
            (f"{src}.mlp.c_proj.weight", f"blocks.{i}.mlp.fc2.weight"),
            (f"{src}.mlp.c_proj.bias", f"blocks.{i}.mlp.fc2.bias"),
            (f"{src}.ln_2.weight", f"blocks.{i}.norm2.weight"),
            (f"{src}.ln_2.bias", f"blocks.{i}.norm2.bias"),
        ]:
            out[b] = sd[p(a)]
    return out


def inflate_temporal_embed(te: np.ndarray, num_frames: int,
                           mode: str = "bilinear") -> np.ndarray:
    """(1, F_ckpt, D) → (1, num_frames, D): truncate when shrinking; pad
    with zeros or linearly interpolate when growing
    (reference models/utils.py:13-48)."""
    f = te.shape[1]
    if f == num_frames:
        return te
    if f > num_frames:
        return te[:, :num_frames]
    if mode == "zeros":
        out = np.zeros((te.shape[0], num_frames, te.shape[2]), te.dtype)
        out[:, :f] = te
        return out
    if mode in ("interp", "bilinear", "nearest"):
        src = np.arange(f)
        # align_corners=False resample grid (matches F.interpolate)
        pos = (np.arange(num_frames) + 0.5) * (f / num_frames) - 0.5
        if mode == "nearest":
            idx = np.clip(np.round(pos), 0, f - 1).astype(int)
            return te[:, idx]
        lo = np.clip(np.floor(pos).astype(int), 0, f - 1)
        hi = np.clip(lo + 1, 0, f - 1)
        w = np.clip(pos - lo, 0.0, 1.0)[None, :, None]
        return te[:, lo] * (1 - w) + te[:, hi] * w
    raise ValueError(mode)


# --------------------------------------------------------------------------
# CLIP text tower
# --------------------------------------------------------------------------

def import_clip_text(sd: Mapping[str, np.ndarray], layers: int,
                     prefix: str = "") -> dict:
    p = lambda n: prefix + n  # noqa: E731
    tr = {}
    for i in range(layers):
        src = f"transformer.resblocks.{i}"
        tr[f"resblocks_{i}"] = {
            "ln_1": _ln(sd, p(f"{src}.ln_1")),
            "ln_2": _ln(sd, p(f"{src}.ln_2")),
            "attn": {
                "in_proj": {"kernel": sd[p(f"{src}.attn.in_proj_weight")].T,
                            "bias": sd[p(f"{src}.attn.in_proj_bias")]},
                "out_proj": _dense(sd, p(f"{src}.attn.out_proj")),
            },
            "mlp": {"fc1": _dense(sd, p(f"{src}.mlp.c_fc")),
                    "fc2": _dense(sd, p(f"{src}.mlp.c_proj"))},
        }
    return {
        "token_embedding": {"embedding": sd[p("token_embedding.weight")]},
        "positional_embedding": sd[p("positional_embedding")],
        "ln_final": _ln(sd, p("ln_final")),
        "text_projection": sd[p("text_projection")],
        "transformer": tr,
    }


def import_clip_vit(sd: Mapping[str, np.ndarray], layers: int,
                    prefix: str = "visual.") -> dict:
    p = lambda n: prefix + n  # noqa: E731
    tr = {}
    for i in range(layers):
        src = f"transformer.resblocks.{i}"
        tr[f"resblocks_{i}"] = {
            "ln_1": _ln(sd, p(f"{src}.ln_1")),
            "ln_2": _ln(sd, p(f"{src}.ln_2")),
            "attn": {
                "in_proj": {"kernel": sd[p(f"{src}.attn.in_proj_weight")].T,
                            "bias": sd[p(f"{src}.attn.in_proj_bias")]},
                "out_proj": _dense(sd, p(f"{src}.attn.out_proj")),
            },
            "mlp": {"fc1": _dense(sd, p(f"{src}.mlp.c_fc")),
                    "fc2": _dense(sd, p(f"{src}.mlp.c_proj"))},
        }
    return {
        "class_embedding": sd[p("class_embedding")],
        "positional_embedding": sd[p("positional_embedding")],
        "conv1": {"kernel": sd[p("conv1.weight")].transpose(2, 3, 1, 0)},
        "ln_pre": _ln(sd, p("ln_pre")),
        "ln_post": _ln(sd, p("ln_post")),
        "proj": sd[p("proj")],
        "transformer": tr,
    }


def import_resnet_clip(sd: Mapping[str, np.ndarray],
                       layers: Sequence[int] = (3, 4, 6, 3),
                       prefix: str = "visual.") -> tuple:
    """OpenAI CLIP ModifiedResNet (openai_model.py:105-165) →
    (params, batch_stats) for :class:`lavila_tpu.models.resnet_clip.
    ModifiedResNet`. BatchNorm running stats live in flax's
    ``batch_stats`` collection (the RN towers run frozen/eval in the
    reference), hence the pair return."""
    p = lambda n: prefix + n  # noqa: E731
    params: dict = {}
    stats: dict = {}

    def bn(name, dst_name):
        params[dst_name] = {"scale": sd[p(f"{name}.weight")],
                            "bias": sd[p(f"{name}.bias")]}
        stats[dst_name] = {"mean": sd[p(f"{name}.running_mean")],
                           "var": sd[p(f"{name}.running_var")]}

    for i in (1, 2, 3):
        params[f"conv{i}"] = _conv2d(sd, p(f"conv{i}"))
        bn(f"bn{i}", f"bn{i}")
    for stage, blocks in enumerate(layers):
        for b in range(blocks):
            src = f"layer{stage + 1}.{b}"
            dst = f"layer{stage + 1}_{b}"
            blk = {f"conv{i}": _conv2d(sd, p(f"{src}.conv{i}"))
                   for i in (1, 2, 3)}
            blk_stats = {}
            for i in (1, 2, 3):
                blk[f"bn{i}"] = {"scale": sd[p(f"{src}.bn{i}.weight")],
                                 "bias": sd[p(f"{src}.bn{i}.bias")]}
                blk_stats[f"bn{i}"] = {
                    "mean": sd[p(f"{src}.bn{i}.running_mean")],
                    "var": sd[p(f"{src}.bn{i}.running_var")]}
            if p(f"{src}.downsample.0.weight") in sd:
                blk["downsample_conv"] = _conv2d(sd, p(f"{src}.downsample.0"))
                blk["downsample_bn"] = {
                    "scale": sd[p(f"{src}.downsample.1.weight")],
                    "bias": sd[p(f"{src}.downsample.1.bias")]}
                blk_stats["downsample_bn"] = {
                    "mean": sd[p(f"{src}.downsample.1.running_mean")],
                    "var": sd[p(f"{src}.downsample.1.running_var")]}
            params[dst] = blk
            stats[dst] = blk_stats
    params["attnpool"] = {
        "positional_embedding": sd[p("attnpool.positional_embedding")],
        "q_proj": _dense(sd, p("attnpool.q_proj")),
        "k_proj": _dense(sd, p("attnpool.k_proj")),
        "v_proj": _dense(sd, p("attnpool.v_proj")),
        "c_proj": _dense(sd, p("attnpool.c_proj")),
    }
    return params, stats


# --------------------------------------------------------------------------
# HF GPT-2 (incl. gated cross-attention extension)
# --------------------------------------------------------------------------

def import_gpt2(sd: Mapping[str, np.ndarray], n_layer: int,
                prefix: str = "transformer.") -> dict:
    p = lambda n: prefix + n  # noqa: E731
    out = {
        "wte": {"embedding": sd[p("wte.weight")]},
        "wpe": {"embedding": sd[p("wpe.weight")]},
        "ln_f": _ln(sd, p("ln_f")),
    }
    for i in range(n_layer):
        b = f"h.{i}"
        blk = {
            "ln_1": _ln(sd, p(f"{b}.ln_1")),
            "ln_2": _ln(sd, p(f"{b}.ln_2")),
            "attn": {"c_attn": _conv1d(sd, p(f"{b}.attn.c_attn")),
                     "c_proj": _conv1d(sd, p(f"{b}.attn.c_proj"))},
            "mlp": {"c_fc": _conv1d(sd, p(f"{b}.mlp.c_fc")),
                    "c_proj": _conv1d(sd, p(f"{b}.mlp.c_proj"))},
        }
        if p(f"{b}.crossattention.q_attn.weight") in sd:
            blk["crossattention"] = {
                "q_attn": _conv1d(sd, p(f"{b}.crossattention.q_attn")),
                "c_attn": _conv1d(sd, p(f"{b}.crossattention.c_attn")),
                "c_proj": _conv1d(sd, p(f"{b}.crossattention.c_proj")),
            }
            blk["ln_cross_attn"] = _ln(sd, p(f"{b}.ln_cross_attn"))
            blk["ln_2_crossattention"] = _ln(
                sd, p(f"{b}.ln_2_crossattention"))
            blk["mlp_crossattention"] = {
                "c_fc": _conv1d(sd, p(f"{b}.mlp_crossattention.c_fc")),
                "c_proj": _conv1d(sd, p(f"{b}.mlp_crossattention.c_proj")),
            }
            if p(f"{b}.alpha_cattn") in sd:
                blk["alpha_cattn"] = sd[p(f"{b}.alpha_cattn")]
                blk["alpha_dense"] = sd[p(f"{b}.alpha_dense")]
        out[f"h_{i}"] = blk
    return out


# --------------------------------------------------------------------------
# HF DistilBERT
# --------------------------------------------------------------------------

def import_distilbert(sd: Mapping[str, np.ndarray], n_layers: int = 6,
                      prefix: str = "") -> dict:
    p = lambda n: prefix + n  # noqa: E731
    out = {
        "word_embeddings": {
            "embedding": sd[p("embeddings.word_embeddings.weight")]},
        "position_embeddings": {
            "embedding": sd[p("embeddings.position_embeddings.weight")]},
        "emb_layer_norm": _ln(sd, p("embeddings.LayerNorm")),
    }
    for i in range(n_layers):
        b = f"transformer.layer.{i}"
        out[f"layer_{i}"] = {
            "attention": {
                "q_lin": _dense(sd, p(f"{b}.attention.q_lin")),
                "k_lin": _dense(sd, p(f"{b}.attention.k_lin")),
                "v_lin": _dense(sd, p(f"{b}.attention.v_lin")),
                "out_lin": _dense(sd, p(f"{b}.attention.out_lin")),
            },
            "sa_layer_norm": _ln(sd, p(f"{b}.sa_layer_norm")),
            "ffn_lin1": _dense(sd, p(f"{b}.ffn.lin1")),
            "ffn_lin2": _dense(sd, p(f"{b}.ffn.lin2")),
            "output_layer_norm": _ln(sd, p(f"{b}.output_layer_norm")),
        }
    return out


# --------------------------------------------------------------------------
# full dual-encoder / narrator checkpoints (lavila naming)
# --------------------------------------------------------------------------

def count_layers(sd: Mapping[str, np.ndarray], pattern: str) -> int:
    """Number of distinct layer indices for keys like '<pattern>{i}.'."""
    idx = set()
    for k in sd:
        if k.startswith(pattern):
            rest = k[len(pattern):]
            num = rest.split(".")[0]
            if num.isdigit():
                idx.add(int(num))
    return len(idx)


def import_video_clip(sd: Mapping[str, np.ndarray],
                      depth: Optional[int] = None,
                      text_layers: Optional[int] = None,
                      num_frames: Optional[int] = None,
                      load_temporal_fix: str = "bilinear",
                      strict: bool = False) -> dict:
    """Released dual-encoder checkpoint (CLIP text tower variant) →
    VideoCLIP params. Depths are auto-detected from the state dict when
    not given. ``strict=True`` raises if any checkpoint key went
    unconsumed (reference eval_zeroshot.py:97 strict-load analogue);
    strict=False prints a warning instead."""
    sd = _TrackedDict(sd)
    depth = depth or count_layers(sd, "visual.blocks.")
    text_layers = text_layers or count_layers(sd, "transformer.resblocks.")
    if num_frames is not None and "visual.temporal_embed" in sd:
        sd["visual.temporal_embed"] = inflate_temporal_embed(
            sd["visual.temporal_embed"], num_frames, load_temporal_fix)
    out = {
        "vision_model": import_timesformer(sd, depth, prefix="visual."),
        "text_model": import_clip_text(sd, text_layers),
        "image_projection": sd["image_projection"],
        "logit_scale": np.asarray(sd["logit_scale"]).reshape(()),
    }
    _finish_import(sd, strict, "import_video_clip")
    return out


def import_video_clip_hf(sd: Mapping[str, np.ndarray], depth: int,
                         num_frames: Optional[int] = None,
                         load_temporal_fix: str = "bilinear",
                         projection: str = "default",
                         strict: bool = False) -> dict:
    """Released CLIP_HF (DistilBERT text tower) checkpoint →
    VideoCLIPHF params. See import_video_clip for ``strict``."""
    sd = _TrackedDict(sd)
    if num_frames is not None and "visual.temporal_embed" in sd:
        sd["visual.temporal_embed"] = inflate_temporal_embed(
            sd["visual.temporal_embed"], num_frames, load_temporal_fix)
    out = {
        "vision_model": import_timesformer(sd, depth, prefix="visual."),
        "text_model": import_distilbert(
            sd, n_layers=count_layers(sd, "textual.transformer.layer."),
            prefix="textual."),
        "logit_scale": np.asarray(sd["logit_scale"]).reshape(()),
    }
    if projection == "default":
        out["image_projection"] = sd["image_projection"]
        out["text_projection"] = sd["text_projection"]
    else:
        out["image_projection_fc"] = _dense(sd, "image_projection.0")
        out["text_projection_fc"] = _dense(sd, "text_projection.1")
    _finish_import(sd, strict, "import_video_clip_hf")
    return out


def import_vclm(sd: Mapping[str, np.ndarray], vis_depth: int,
                gpt2_layers: int, num_frames: Optional[int] = None,
                load_temporal_fix: str = "bilinear",
                strict: bool = False) -> dict:
    """Released narrator (VCLM_*TIMESFORMER*) checkpoint → VCLM params.
    See import_video_clip for ``strict``."""
    sd = _TrackedDict(sd)
    if num_frames is not None and "visual.temporal_embed" in sd:
        sd["visual.temporal_embed"] = inflate_temporal_embed(
            sd["visual.temporal_embed"], num_frames, load_temporal_fix)
    out = {
        "vision_model": import_timesformer(sd, vis_depth, prefix="visual."),
        "text_decoder": import_gpt2(sd, gpt2_layers,
                                    prefix="text_decoder.transformer."),
        "img_queries": sd["img_queries"],
        "img_attn_pool": {
            "norm": {"scale": sd["img_attn_pool.norm.gamma"]},
            "context_norm": {
                "scale": sd["img_attn_pool.context_norm.gamma"]},
            "to_q": {"kernel": sd["img_attn_pool.to_q.weight"].T},
            "to_kv": {"kernel": sd["img_attn_pool.to_kv.weight"].T},
            "to_out": {"kernel": sd["img_attn_pool.to_out.weight"].T},
        },
        "img_attn_pool_norm": {"scale": sd["img_attn_pool_norm.gamma"]},
    }
    _finish_import(sd, strict, "import_vclm")
    return out
