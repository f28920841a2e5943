"""OpenAI CLIP released-checkpoint access.

Equivalent of the reference's openai_clip loader
(reference: lavila/models/openai_clip.py:40-198): the official URL map
with sha256 verification, a local cache, and a ``load()`` that builds the
flax tower pair with imported weights. Downloads are attempted only when
the file is absent AND the environment has network access — otherwise a
clear error points at the cache path to pre-populate.
"""

from __future__ import annotations

import hashlib
import os
import os.path as osp
import urllib.request
from typing import Optional

# sha256 is the first path component of each official URL
MODELS = {
    "RN50": "https://openaipublic.azureedge.net/clip/models/afeb0e10f9e5a86da6080e35cf09123aca3b358a0c3e3b6c78a7b63bc04b6762/RN50.pt",  # noqa: E501
    "RN101": "https://openaipublic.azureedge.net/clip/models/8fa8567bab74a42d41c5915025a8e4538c3bdbe8804a470a72f30b0d94fab599/RN101.pt",  # noqa: E501
    "ViT-B/32": "https://openaipublic.azureedge.net/clip/models/40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af/ViT-B-32.pt",  # noqa: E501
    "ViT-B/16": "https://openaipublic.azureedge.net/clip/models/5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61988df416f/ViT-B-16.pt",  # noqa: E501
    "ViT-L/14": "https://openaipublic.azureedge.net/clip/models/b8cca3fd41ae0c99ba7e8951adf17d267cdb84cd88be6f7c2e0eca1737a03836/ViT-L-14.pt",  # noqa: E501
    "ViT-L/14@336px": "https://openaipublic.azureedge.net/clip/models/3035c92b350959924f9f00213499208652fc7ea050643e8b385c2dac08641f02/ViT-L-14-336px.pt",  # noqa: E501
}

CACHE_DIR = os.environ.get(
    "LAVILA_CLIP_CACHE", osp.expanduser("~/.cache/lavila_tpu/clip"))


def checkpoint_path(name: str, download: bool = True) -> str:
    """Local path of the checkpoint; verifies sha256; downloads when
    allowed and missing."""
    url = MODELS[name]
    expected_sha = url.split("/")[-2]
    fname = url.split("/")[-1]
    path = osp.join(CACHE_DIR, fname)
    if not osp.exists(path):
        if not download:
            raise FileNotFoundError(
                f"{name} checkpoint not cached at {path}; place the file "
                f"there (sha256 {expected_sha}) or allow download")
        os.makedirs(CACHE_DIR, exist_ok=True)
        try:
            urllib.request.urlretrieve(url, path)
        except Exception as e:
            raise FileNotFoundError(
                f"cannot download {url} (no network?): {e}; pre-populate "
                f"{path}") from e
    digest = hashlib.sha256(open(path, "rb").read()).hexdigest()
    if digest != expected_sha:
        raise RuntimeError(
            f"sha256 mismatch for {path}: got {digest}, "
            f"expected {expected_sha}")
    return path


def load_state_dict(name: str, download: bool = True) -> dict:
    """Load the released TorchScript archive's state dict as numpy."""
    import torch
    path = checkpoint_path(name, download)
    try:
        model = torch.jit.load(path, map_location="cpu")
        sd = model.state_dict()
    except Exception:
        sd = torch.load(path, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
    return {k: v.float().numpy() for k, v in sd.items()}


def load_into_timesformer_dual_encoder(name: str, model_params: dict,
                                       layers: int, text_layers: int,
                                       download: bool = True) -> dict:
    """Initialize a VideoCLIP param tree from a released CLIP checkpoint:
    visual weights remapped into the TimeSformer (temporal branch keeps
    its zero init), text tower copied, projections/logit_scale copied when
    dims match — the reference factory behaviour (models.py:316-371)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from lavila_tpu.models import import_torch as imp

    sd = load_state_dict(name, download)
    remapped = imp.remap_clip_visual_to_timesformer(sd, layers)
    vis = imp.import_timesformer(remapped, layers)
    txt = imp.import_clip_text(sd, text_layers)

    out = jax.tree.map(lambda x: x, model_params)  # copy

    def deep_update(dst, src):
        for k, v in src.items():
            if isinstance(v, dict) and k in dst and isinstance(dst[k], dict):
                deep_update(dst[k], v)
            elif k in dst:
                if np.shape(dst[k]) == np.shape(v):
                    dst[k] = jnp.asarray(v)

    deep_update(out["vision_model"], vis)
    deep_update(out["text_model"], txt)
    if np.shape(out.get("image_projection")) == np.shape(sd["visual.proj"]):
        out["image_projection"] = jnp.asarray(sd["visual.proj"])
        out["text_model"]["text_projection"] = jnp.asarray(
            sd["text_projection"])
        out["logit_scale"] = jnp.asarray(sd["logit_scale"]).reshape(())
    return out
