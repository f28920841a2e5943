"""Dual-encoder wrappers and video classifier heads.

TPU rebuilds of the reference wrappers
(reference: lavila/models/models.py:24-290):

  * :class:`VideoCLIP` — vision tower + CLIP text tower, matrix
    projections, learnable logit scale (init log(1/temperature)).
  * :class:`VideoCLIPHF` — vision tower + HF-style text encoder
    (DistilBERT), 'default' matrix projection or 'frozen_in_time' MLP
    projection.
  * :class:`VideoClassifier` / :class:`VideoClassifierMultiHead` — linear
    probe heads over the vision tower for fine-tune classification.

All expose ``encode_image`` / ``encode_text`` methods usable with
``module.apply(vars, ..., method='encode_image')`` so eval pipelines can
embed the two modalities independently.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from lavila_tpu.ops.basic import normal_init

Dtype = Any


def l2_normalize(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    n = jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True)
    return (x.astype(jnp.float32) / jnp.maximum(n, eps)).astype(x.dtype)


class VideoCLIP(nn.Module):
    """CLIP-style dual encoder with a video tower and the OpenAI CLIP text
    transformer (reference models.py:75-173)."""

    vision_model: nn.Module
    text_model: nn.Module          # TextTransformer WITHOUT projection use
    vision_width: int
    embed_dim: int = 256
    temperature_init: float = 0.07
    use_image_projection: bool = True  # False for raw OpenAI CLIP variants
    dtype: Dtype = jnp.float32

    def setup(self):
        self.visual = self.vision_model
        self.textual = self.text_model
        if self.use_image_projection:
            self.image_projection = self.param(
                "image_projection", normal_init(self.vision_width ** -0.5),
                (self.vision_width, self.embed_dim))
        init_scale = float(np.log(1.0 / self.temperature_init))
        self.logit_scale = self.param(
            "logit_scale", lambda key, shape: jnp.full(shape, init_scale), ())

    def encode_image(self, image: jax.Array,
                     apply_project: bool = True) -> jax.Array:
        x = self.visual(image)
        if not apply_project or not self.use_image_projection:
            return x
        return x @ self.image_projection.astype(x.dtype)

    def encode_text(self, text: jax.Array) -> jax.Array:
        return self.textual(text)  # projection lives inside TextTransformer

    def __call__(self, image: jax.Array, text: jax.Array,
                 norm_embed: bool = False) -> dict:
        image_embed = self.encode_image(image)
        text_embed = self.encode_text(text)
        if norm_embed:
            image_embed = l2_normalize(image_embed)
            text_embed = l2_normalize(text_embed)
        return {
            "image_embed": image_embed,
            "text_embed": text_embed,
            "logit_scale": jnp.exp(self.logit_scale),
        }


class VideoCLIPHF(nn.Module):
    """Dual encoder with an HF-style text model (reference
    models.py:176-290). ``projection``: 'default' (matrices) or
    'frozen_in_time' (image: Linear; text: ReLU→Linear)."""

    vision_model: nn.Module
    text_model: nn.Module
    vision_width: int
    text_width: int
    embed_dim: int = 256
    text_use_cls_token: bool = True
    text_is_regressive: bool = False
    projection: str = "default"
    temperature_init: float = 0.07
    dtype: Dtype = jnp.float32

    def setup(self):
        self.visual = self.vision_model
        self.textual = self.text_model
        if self.projection == "default":
            self.image_projection = self.param(
                "image_projection", normal_init(self.vision_width ** -0.5),
                (self.vision_width, self.embed_dim))
            self.text_projection = self.param(
                "text_projection", normal_init(self.text_width ** -0.5),
                (self.text_width, self.embed_dim))
        elif self.projection == "frozen_in_time":
            self.image_projection_fc = nn.Dense(
                self.embed_dim, dtype=self.dtype, name="image_projection_fc")
            self.text_projection_fc = nn.Dense(
                self.embed_dim, dtype=self.dtype,
                kernel_init=normal_init(self.text_width ** -0.5),
                name="text_projection_fc")
        else:
            raise ValueError(self.projection)
        init_scale = float(np.log(1.0 / self.temperature_init))
        self.logit_scale = self.param(
            "logit_scale", lambda key, shape: jnp.full(shape, init_scale), ())

    def encode_image(self, image: jax.Array,
                     apply_project: bool = True) -> jax.Array:
        x = self.visual(image)
        if not apply_project:
            return x
        if self.projection == "default":
            return x @ self.image_projection.astype(x.dtype)
        return self.image_projection_fc(x)

    def encode_text(self, text: jax.Array,
                    attention_mask: Optional[jax.Array] = None) -> jax.Array:
        x = self.textual(text, attention_mask)
        if self.text_is_regressive:
            # gpt-style: feature at EOT (largest token id)
            x = x[jnp.arange(x.shape[0]), jnp.argmax(text, axis=-1)]
        else:
            # bert-style CLS pooling (DistilBERT has no pooler)
            x = x[:, 0]
        if self.projection == "default":
            return x @ self.text_projection.astype(x.dtype)
        return self.text_projection_fc(jax.nn.relu(x))

    def __call__(self, image: jax.Array, text: jax.Array,
                 mask: Optional[jax.Array] = None,
                 norm_embed: bool = False) -> dict:
        image_embed = self.encode_image(image)
        text_embed = self.encode_text(text, mask)
        if norm_embed:
            image_embed = l2_normalize(image_embed)
            text_embed = l2_normalize(text_embed)
        return {
            "image_embed": image_embed,
            "text_embed": text_embed,
            "logit_scale": jnp.exp(self.logit_scale),
        }


class VideoClassifier(nn.Module):
    """Linear-probe classifier over the vision tower
    (reference models.py:24-45). Dropout applied at call time when
    ``train`` with the 'dropout' rng."""

    vision_model: nn.Module
    num_classes: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image: jax.Array, train: bool = False) -> jax.Array:
        kwargs = {}
        if getattr(self.vision_model, "drop_path_rate", 0.0) > 0:
            kwargs["train"] = train
        x = self.vision_model(image, **kwargs)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        kernel_init=normal_init(0.01), name="fc_cls")(x)


class VideoClassifierMultiHead(nn.Module):
    """Verb/noun/action multi-head classifier (reference models.py:48-72)."""

    vision_model: nn.Module
    num_classes_list: Sequence[int]
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image: jax.Array, train: bool = False) -> list:
        kwargs = {}
        if getattr(self.vision_model, "drop_path_rate", 0.0) > 0:
            kwargs["train"] = train
        x = self.vision_model(image, **kwargs)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return [
            nn.Dense(n, dtype=self.dtype, kernel_init=normal_init(0.01),
                     name=f"fc_cls_{i}")(x)
            for i, n in enumerate(self.num_classes_list)
        ]
